"""Chained (relay-honest) decomposition of the 1080p eval forward.

Each stage is a CUMULATIVE PREFIX of the forward pipeline, timed with a
data-dependency-chained in-jit fori_loop (the only method trustworthy
through the axon relay — per-call dispatch amortizes over device-side
iterations). Every stage folds the FULL SUM of its outputs into the chain
so XLA cannot dead-code-eliminate any upstream op (folding a single output
element lets XLA slice whole stages away — e.g. tile_counts no longer
depends on the sort, so a counts-fold measured binning without sorting).

Stage deltas therefore give honest per-stage costs:
  proj                       projection
  +bin                       + full binning (expansion, sort, starts, cap)
  +pack                      + lane gather/pack
  +kernel                    + Pallas forward kernel
  +image                     + rows->image + background select (= full API)
  train                      full train step (fwd+bwd+loss+adan)

Run ON TPU: PYTHONPATH=/root/.axon_site:/root/repo python scripts/profile_fwd_chain.py
"""

import argparse
import functools
import time

import numpy as np


def chained(fn, x0, iters=50):
    """ms/iter via in-jit fori_loop chaining (relay-dispatch-immune)."""
    from gsvc_tpu.utils.profiling import device_loop_time

    return device_loop_time(fn, x0, reps=iters, outer=3) * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num-points", type=int, default=10000)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--skip-check", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from gsvc_tpu.ops import rasterize_pallas as rp
    from gsvc_tpu.ops.binning import (
        bin_gaussians,
        default_max_intersects,
        static_capacity,
    )
    from gsvc_tpu.ops.projection import project_gaussians_2d
    from gsvc_tpu.ops.rasterize import rasterize_gaussians_sum
    from gsvc_tpu.optim.adan import adan_init, adan_step

    H, W, n = args.height, args.width, args.num_points
    tb = ((W + 15) // 16, (H + 15) // 16, 1)
    tb_x, tb_y = tb[0], tb[1]
    num_tiles = tb_x * tb_y
    mi = default_max_intersects(n, num_tiles)
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
    it = args.iters

    def fullsum(tree) -> jax.Array:
        """Scalar f32 depending on EVERY element of every leaf (DCE-proof)."""
        tot = jnp.float32(0)
        for leaf in jax.tree.leaves(tree):
            tot = tot + jnp.sum(leaf.astype(jnp.float32))
        return tot

    def fold(x, tree):
        return x + fullsum(tree) * 0.0

    if not args.skip_check:
        imgs = {}
        for backend in ("pallas", "binned"):
            def fwd(m, be=backend):
                xys, d, r_, c, nth = project_gaussians_2d(m, L, H, W, tb)
                return rasterize_gaussians_sum(
                    xys, d, r_, c, nth, colors, opacity, H, W, backend=be
                )
            imgs[backend] = np.asarray(jax.jit(fwd)(means))
        err = np.abs(imgs["pallas"] - imgs["binned"]).max()
        print(f"pallas vs binned on device: max abs err {err:.3e}")
        assert err < 1e-4, err

    # ---- cumulative prefixes -------------------------------------------
    def p_proj(m):
        out = project_gaussians_2d(m, L, H, W, tb)
        return out, fullsum(out)

    def p_bin(m):
        (xys, d, radii, conics, nth), acc = p_proj(m)
        binned = bin_gaussians(xys, radii, nth, tb, 16, 16, mi)
        return (binned, xys, conics), acc + fullsum(binned)

    def p_pack(m):
        (binned, xys, conics), acc = p_bin(m)
        data = rp._pack_lanes(binned, xys, conics, colors, opacity, tb_x, 16, 16)
        return (binned, data), acc + fullsum(data)

    r_out = rp._round8(3 * tb_x)
    pix = 256
    kernel = functools.partial(
        rp._forward_kernel, tb_x=tb_x, block_w=16, block_h=16
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(tb_y,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (r_out, pix), lambda s, r0, rls: (s, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, rp.DATA_ROWS, rp.CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    row0 = jnp.zeros((1,), jnp.int32)

    def p_kernel(m):
        (binned, data), acc = p_pack(m)
        out = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((tb_y * r_out, pix), jnp.float32),
        )(row0, binned.row_lane_start, data)
        return out, acc + fullsum(out)

    def p_image(m):
        xys, d, radii, conics, nth = project_gaussians_2d(m, L, H, W, tb)
        img = rasterize_gaussians_sum(
            xys, d, radii, conics, nth, colors, opacity, H, W,
            backend="pallas",
        )
        return img, fullsum(img)

    stages = [
        ("proj", p_proj),
        ("+bin", p_bin),
        ("+pack", p_pack),
        ("+kernel", p_kernel),
        ("+image", p_image),
    ]
    prev = 0.0
    results = {}
    for name, fn in stages:
        t = chained(lambda m, f=fn: m + f(m)[1] * 0.0, means, it)
        results[name] = t
        print(f"{name:8s} {t:8.3f} ms   (delta {t - prev:+7.3f})")
        prev = t

    t_full = results["+image"]
    print(f"full -> {1000.0 / t_full:.1f} fps")

    # ---- train step -----------------------------------------------------
    target = jnp.zeros((H, W, 3), jnp.float32)

    def forward(m, l, c):
        xys_, d_, r_, co_, nth_ = project_gaussians_2d(m, l, H, W, tb)
        return rasterize_gaussians_sum(
            xys_, d_, r_, co_, nth_, c, opacity, H, W, backend="pallas"
        )

    def train_step(carry):
        params, state = carry

        def loss_fn(p):
            img = jnp.clip(forward(p["m"], p["l"], p["c"]), 0.0, 1.0)
            return jnp.mean((img - target) ** 2)

        loss, g = jax.value_and_grad(loss_fn)(params)
        params, state = adan_step(params, g, state, 1e-3)
        return params, state

    params = {"m": means, "l": L, "c": colors}
    state = adan_init(params)
    t_train = chained(train_step, (params, state), max(it // 2, 10))
    print(f"train    {t_train:8.3f} ms -> {1000.0 / t_train:.1f} it/s")

    binned = jax.jit(
        lambda m: bin_gaussians(
            *(lambda pr: (pr[0], pr[2], pr[4]))(
                project_gaussians_2d(m, L, H, W, tb)
            ),
            tb, 16, 16, mi,
        )
    )(means)
    print(
        f"n={n} isect={int(binned.num_intersects)} budget={mi} "
        f"S={static_capacity(mi, tb)} rows={tb_y}"
    )


if __name__ == "__main__":
    main()
