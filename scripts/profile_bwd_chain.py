"""Chained (relay-honest) decomposition of the TRAIN step at 1080p.

Cumulative:
  fwd+loss   render + L2 loss (current model path, incl. HWC->CHW transposes)
  vag        + full backward (value_and_grad)
  vag_notr   value_and_grad with the loss computed directly on HWC
             (quantifies the loss-side transpose pair fwd+bwd)
  train      + adan update

Isolated pieces of the custom-vjp backward (fixed residuals, chained):
  vrows      _image_to_vrows (image-grad -> tile-row blocks)
  bwdkern    backward pallas_call only
  segsum     segment_sum lane grads -> splat grads

Run ON TPU: PYTHONPATH=/root/.axon_site:/root/repo python scripts/profile_bwd_chain.py
"""

import argparse
import functools

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num-points", type=int, default=10000)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from gsvc_tpu.ops import rasterize_pallas as rp
    from gsvc_tpu.ops.binning import bin_gaussians, default_max_intersects
    from gsvc_tpu.ops.projection import project_gaussians_2d
    from gsvc_tpu.ops.rasterize import rasterize_gaussians_sum
    from gsvc_tpu.optim.adan import adan_init, adan_step
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
    gt = jnp.zeros((H, W, 3), jnp.float32)
    it = args.iters

    def fold(x, *outs):
        tot = jnp.float32(0)
        for leaf in outs:
            for a in jax.tree.leaves(leaf):
                if a.dtype == jax.dtypes.float0:
                    continue
                tot = tot + jnp.sum(a.astype(jnp.float32))
        return x + tot * 0.0

    def forward(m, l, c):
        xys, d, radii, conics, nth = project_gaussians_2d(m, l, H, W, tb)
        img = rasterize_gaussians_sum(
            xys, d, radii, conics, nth, c, opacity, H, W, backend="pallas"
        )
        return jnp.clip(img, 0.0, 1.0)

    def loss_tr(p):
        img = forward(p["m"], p["l"], p["c"])
        return jnp.mean(
            (img.transpose(2, 0, 1) - gt.transpose(2, 0, 1)) ** 2
        )

    def loss_notr(p):
        img = forward(p["m"], p["l"], p["c"])
        return jnp.mean((img - gt) ** 2)

    params = {"m": means, "l": L, "c": colors}

    # fwd+loss chained on params
    def f_fwdloss(p):
        v = loss_tr(p)
        return jax.tree.map(lambda a: a + v * 0.0, p)

    def f_vag2(p):
        v, g = jax.value_and_grad(loss_tr)(p)
        s = v
        for leaf in jax.tree.leaves(g):
            s = s + jnp.sum(leaf)
        return jax.tree.map(lambda a: a + s * 0.0, p)

    def f_vag_notr(p):
        v, g = jax.value_and_grad(loss_notr)(p)
        s = v
        for leaf in jax.tree.leaves(g):
            s = s + jnp.sum(leaf)
        return jax.tree.map(lambda a: a + s * 0.0, p)

    state = adan_init(params)

    def f_train(carry):
        p, st = carry
        v, g = jax.value_and_grad(loss_tr)(p)
        p2, st2 = adan_step(p, g, st, 1e-3)
        return p2, st2

    t_fwd = device_loop_time(f_fwdloss, params, reps=it, outer=3) * 1e3
    print(f"fwd+loss  {t_fwd:8.3f} ms")
    t_vag = device_loop_time(f_vag2, params, reps=it, outer=3) * 1e3
    print(f"vag       {t_vag:8.3f} ms   (bwd ~ {t_vag - t_fwd:+.3f})")
    t_vagn = device_loop_time(f_vag_notr, params, reps=it, outer=3) * 1e3
    print(f"vag_notr  {t_vagn:8.3f} ms   (transpose pair ~ {t_vag - t_vagn:+.3f})")
    t_train = device_loop_time(f_train, (params, state), reps=it, outer=3) * 1e3
    print(f"train     {t_train:8.3f} ms   (adan ~ {t_train - t_vag:+.3f})")

    # ---- isolated custom-vjp backward pieces (fixed residuals) ----
    xys, d_, radii, conics, nth = jax.jit(
        lambda m, l: project_gaussians_2d(m, l, H, W, tb)
    )(means, L)
    binned = jax.jit(
        lambda: bin_gaussians(xys, radii, nth, tb, 16, 16, mi)
    )()
    data = jax.jit(
        lambda: rp._pack_lanes(binned, xys, conics, colors, opacity, tb_x, 16, 16)
    )()
    g_img = jnp.ones((H, W, 3), jnp.float32) / (H * W * 3)
    r_out = rp._round8(3 * tb_x)

    def f_vrows(g):
        vr = rp._image_to_vrows(g, tb_y, r_out, tb_x, 16, 16)
        return g + jnp.sum(vr) * 0.0

    t_vr = device_loop_time(f_vrows, g_img, reps=it, outer=3) * 1e3
    print(f"vrows     {t_vr:8.3f} ms")

    vrows0 = jax.jit(
        lambda g: rp._image_to_vrows(g, tb_y, r_out, tb_x, 16, 16)
    )(g_img)

    kernel = functools.partial(
        rp._backward_kernel, tb_x=tb_x, block_w=16, block_h=16
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(tb_y,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(
                (r_out, 256), lambda s, r0, rls: (s, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, rp.DATA_ROWS, rp.CHUNK), jnp.float32),
            pltpu.VMEM((2, rp.DATA_ROWS, rp.CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    def f_bwdkern(vr):
        vdata = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct(data.shape, jnp.float32),
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(jnp.zeros(1, jnp.int32), binned.row_lane_start, data, vr)
        return vr + jnp.sum(vdata) * 0.0

    t_bk = device_loop_time(f_bwdkern, vrows0, reps=it, outer=3) * 1e3
    print(f"bwdkern   {t_bk:8.3f} ms")

    vdata0 = jnp.ones(data.shape, jnp.float32)
    ids = binned.sorted_gauss_ids

    def f_segsum(vd):
        seg = jax.ops.segment_sum(vd.T, ids, num_segments=n + 1)[:n]
        return vd + jnp.sum(seg) * 0.0

    t_ss = device_loop_time(f_segsum, vdata0, reps=it, outer=3) * 1e3
    print(f"segsum    {t_ss:8.3f} ms")


if __name__ == "__main__":
    main()
