"""Measure untile (rows -> image) strategies at 1080p.

Anti-DCE: every variant pins the materialized image with
lax.optimization_barrier before the fold (a bare sum() is permutation
invariant, so XLA deletes transposes feeding it).

Run ON TPU: PYTHONPATH=/root/.axon_site:/root/repo python scripts/profile_untile.py
"""

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from gsvc_tpu.ops import rasterize_pallas as rp
    from gsvc_tpu.utils.profiling import device_loop_time

    H, W = 1080, 1920
    bw = bh = 16
    tb_x, tb_y = (W + 15) // 16, (H + 15) // 16
    r_out = rp._round8(3 * tb_x)
    pix = bw * bh
    rng = np.random.default_rng(0)
    out = jnp.asarray(
        rng.uniform(0, 1, (tb_y * r_out, pix)).astype(np.float32)
    )

    n_o = out.size

    def pin(o, img):
        # real data dependence on EVERY image element: reshape the image
        # into o's shape and add a tiny nonzero multiple (x*0 folds; x*eps
        # cannot). The loop stays numerically stable at eps=1e-30.
        flat = jnp.pad(img.reshape(-1), (0, n_o - img.size))
        return o + flat.reshape(o.shape) * 1e-30

    def xla_chw(o):
        return pin(o, rp._rows_to_image_chw(o, tb_y, tb_x, bw, bh, H, W))

    def xla_hwc(o):
        return pin(o, rp._rows_to_image(o, tb_y, tb_x, bw, bh, H, W))

    def xla_perchan(o):
        t = o.reshape(tb_y, r_out, pix)[:, : 3 * tb_x, :]
        t = t.reshape(tb_y, tb_x, 3, bh, bw)
        chans = [
            t[:, :, c].transpose(0, 2, 1, 3).reshape(tb_y * bh, tb_x * bw)
            for c in range(3)
        ]
        img = jnp.stack(chans)[:, :H, :W]
        return pin(o, img)

    def xla_2step(o):
        # split the 5D transpose into two simpler ones
        t = o.reshape(tb_y, r_out, pix)[:, : 3 * tb_x, :]
        t = t.reshape(tb_y, tb_x, 3, bh, bw)
        t = t.transpose(2, 0, 1, 3, 4)  # [3, R, tbx, bh, bw] (c out first)
        img = t.transpose(0, 1, 3, 2, 4).reshape(
            3, tb_y * bh, tb_x * bw
        )[:, :H, :W]
        return pin(o, img)

    def xla_bf16(o):
        # transpose in bf16 (half the bytes), cast back
        t = o.astype(jnp.bfloat16)
        img = rp._rows_to_image_chw(t, tb_y, tb_x, bw, bh, H, W)
        return pin(o, img.astype(jnp.float32))

    for name, f in (
        ("xla_chw", xla_chw),
        ("xla_hwc", xla_hwc),
        ("xla_perchan", xla_perchan),
        ("xla_2step", xla_2step),
        ("xla_bf16", xla_bf16),
    ):
        try:
            t = device_loop_time(f, out, reps=50, outer=3)
            print(f"{name:12s} {t*1e3:7.3f} ms")
        except Exception as e:  # noqa: BLE001
            print(f"{name:12s} FAILED: {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
