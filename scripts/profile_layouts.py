"""Quick chained timings: forward fps by output layout + pack variants.

Run ON TPU: PYTHONPATH=/root/.axon_site:/root/repo python scripts/profile_layouts.py
"""

import argparse

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num-points", type=int, default=10000)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--iters", type=int, default=50)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from gsvc_tpu.ops import rasterize_pallas as rp
    from gsvc_tpu.ops.binning import bin_gaussians, default_max_intersects
    from gsvc_tpu.ops.projection import project_gaussians_2d
    from gsvc_tpu.ops.rasterize import rasterize_gaussians_sum
    from gsvc_tpu.utils.profiling import device_loop_time

    H, W, n = args.height, args.width, args.num_points
    tb = ((W + 15) // 16, (H + 15) // 16, 1)
    tb_x, tb_y = tb[0], tb[1]
    mi = default_max_intersects(n, tb_x * tb_y)
    rng = np.random.default_rng(0)
    means = jnp.asarray(rng.uniform(-0.999, 0.999, (n, 2)), jnp.float32)
    L = jnp.asarray(
        np.stack(
            [rng.uniform(1, 6, n), rng.normal(0, 1, n), rng.uniform(1, 6, n)], 1
        ),
        jnp.float32,
    )
    colors = jnp.asarray(rng.uniform(0, 1, (n, 3)), jnp.float32)
    opacity = jnp.ones((n, 1), jnp.float32)

    def fwd(m, layout):
        xys, d, r_, c, nth = project_gaussians_2d(m, L, H, W, tb)
        img = rasterize_gaussians_sum(
            xys, d, r_, c, nth, colors, opacity, H, W,
            backend="pallas", layout=layout,
        )
        return m + jnp.sum(jnp.clip(img, 0.0, 1.0)) * 0.0

    for layout in ("image", "chw", "rows"):
        t = device_loop_time(
            lambda m, lo=layout: fwd(m, lo), means, reps=args.iters, outer=3
        )
        print(f"layout={layout:6s} {t*1e3:7.3f} ms  {1.0/t:8.1f} fps")

    # pack variants: row-gather+transpose (current) vs column gather
    binned = jax.jit(
        lambda m: bin_gaussians(
            *(lambda pr: (pr[0], pr[2], pr[4]))(
                project_gaussians_2d(m, L, H, W, tb)
            ),
            tb, 16, 16, mi,
        )
    )(means)
    xys, _, radii, conics, nth = jax.jit(
        lambda m: project_gaussians_2d(m, L, H, W, tb)
    )(means)

    def pack_row(m):
        d = rp._pack_lanes(binned, xys + m[0, 0] * 0, conics, colors, opacity,
                           tb_x, 16, 16)
        return m + jnp.sum(d) * 0.0

    def pack_col(m):
        ids, tiles = binned.sorted_gauss_ids, binned.sorted_tile_ids
        cat = jnp.concatenate(
            [xys + m[0, 0] * 0, conics, opacity.reshape(-1, 1),
             colors[:, :3]], axis=1
        )
        cat = jnp.concatenate([cat, jnp.zeros((1, 9), cat.dtype)])
        catT = cat.T  # [9, N+1]
        rowsT = catT[:, ids]  # [9, S] gather along minor dim
        tx = (tiles % tb_x).astype(jnp.float32) * 16
        ty = (tiles // tb_x).astype(jnp.float32) * 16
        d = jnp.concatenate(
            [rowsT, tx[None], ty[None], tiles.astype(jnp.float32)[None],
             jnp.zeros((rp.DATA_ROWS - 12, ids.shape[0]), jnp.float32)],
            axis=0,
        )
        return m + jnp.sum(d) * 0.0

    for name, f in (("pack_row", pack_row), ("pack_col", pack_col)):
        t = device_loop_time(f, means, reps=args.iters, outer=3)
        print(f"{name}  {t*1e3:7.3f} ms")


if __name__ == "__main__":
    main()
