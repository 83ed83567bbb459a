"""Chained (relay-honest) decomposition of the 1080p eval forward.

Each stage is timed with a data-dependency-chained loop (iteration i+1's
input folds in a scalar from iteration i's output; one sync at the end), the
only timing method that is trustworthy through the axon relay. Stages:

  proj       projection only
  bin        bin_gaussians (includes the lax.sort)
  sort       the uint32 combined-key sort alone at the binning's length
  pack       _pack_lanes gather
  kernel     the Pallas forward kernel alone on pre-packed data
  full       the whole forward (projection+binning+rasterize)
  fwd+bwd    forward + rasterizer VJP (prebinned)
  train      full train step (fwd+bwd+loss+adan)

Also verifies pallas == binned on the device before timing.

Run ON TPU: PYTHONPATH=/root/.axon_site:/root/repo python scripts/profile_fwd_chain.py
"""

import argparse
import functools
import time

import numpy as np


def chained(fn, x0, iters=50, warmup=2):
    import jax

    x = x0
    for _ in range(warmup):
        x = fn(x)
    jax.block_until_ready(x)
    t0 = time.perf_counter()
    for _ in range(iters):
        x = fn(x)
    jax.block_until_ready(x)
    return (time.perf_counter() - t0) / iters * 1e3


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

    def fold(x, out):  # chain: fold a zero derived from out into x
        leaf = jax.tree.leaves(out)[0]
        return x + leaf.reshape(-1)[0].astype(x.dtype) * 0

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

    # --- proj
    @jax.jit
    def f_proj(m):
        out = project_gaussians_2d(m, L, H, W, tb)
        return fold(m, out[0])

    t_proj = chained(f_proj, means, it)

    xys, d, radii, conics, nth = jax.jit(
        lambda m: project_gaussians_2d(m, L, H, W, tb)
    )(means)

    # --- bin
    @jax.jit
    def f_bin(x):
        b = bin_gaussians(x, radii, nth, tb, 16, 16, mi)
        return fold(x, b.tile_counts.astype(jnp.float32))

    t_bin = chained(f_bin, xys, it)

    # --- u32 single-array sort at the binning's length
    sort_len = mi + (rp.CHUNK - 1) * tb_y
    comb0 = jnp.asarray(rng.integers(0, 2**31 - 1, sort_len), jnp.uint32)

    @jax.jit
    def f_sortu32(k):
        return k + jax.lax.sort(k, is_stable=False)[0] * 0

    t_sort32 = chained(f_sortu32, comb0, it)

    binned = jax.jit(
        lambda x: bin_gaussians(x, radii, nth, tb, 16, 16, mi)
    )(xys)

    # --- pack
    @jax.jit
    def f_pack(x):
        data = rp._pack_lanes(binned, x, conics, colors, opacity, tb_x, 16, 16)
        return fold(x, data)

    t_pack = chained(f_pack, xys, it)

    data0 = jax.jit(
        lambda: rp._pack_lanes(binned, xys, conics, colors, opacity, tb_x, 16, 16)
    )()

    # --- kernel alone
    pix = 256
    r_out = rp._round8(3 * tb_x)
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

    @jax.jit
    def f_kernel(dd):
        out = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((tb_y * r_out, pix), jnp.float32),
        )(row0, binned.row_lane_start, dd)
        return fold(dd, out)

    t_kernel = chained(f_kernel, data0, it)

    # --- full forward
    def forward(m, l, c):
        xys_, d_, r_, co_, nth_ = project_gaussians_2d(m, l, H, W, tb)
        return rasterize_gaussians_sum(
            xys_, d_, r_, co_, nth_, c, opacity, H, W, backend="pallas"
        )

    @jax.jit
    def f_full(m):
        return fold(m, forward(m, L, colors))

    t_full = chained(f_full, means, it)

    # --- rasterizer fwd+bwd via vjp (prebinned)
    from gsvc_tpu.ops.rasterize_pallas import rasterize_pallas

    @jax.jit
    def f_fwdbwd(x):
        out, vjp = jax.vjp(
            lambda xx, co, c: rasterize_pallas(
                binned, xx, co, c, opacity, H, W, tb
            ),
            x, conics, colors,
        )
        vx, _, _ = vjp(jnp.ones((H, W, 3), jnp.float32))
        return fold(x, vx)

    t_fwdbwd = chained(f_fwdbwd, xys, max(it // 2, 10))

    # --- full train step
    target = jnp.zeros((H, W, 3), jnp.float32)

    @jax.jit
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
    t_train = chained(train_step, (params, state), max(it // 2, 10), warmup=1)

    print(
        f"n={n} isect={int(binned.num_intersects)} budget={mi} "
        f"S={static_capacity(mi, tb)} rows={tb_y} sort_len={sort_len}"
    )
    print(f"proj     {t_proj:8.3f} ms")
    print(f"bin      {t_bin:8.3f} ms")
    print(f"sortu32  {t_sort32:8.3f} ms   (len {sort_len})")
    print(f"pack     {t_pack:8.3f} ms")
    print(f"kernel   {t_kernel:8.3f} ms")
    print(f"full     {t_full:8.3f} ms -> {1000.0 / t_full:.1f} fps "
          f"(stage sum {t_proj + t_bin + t_pack + t_kernel:.3f})")
    print(f"fwd+bwd  {t_fwdbwd:8.3f} ms  (rasterizer vjp, prebinned)")
    print(f"train    {t_train:8.3f} ms -> {1000.0 / t_train:.1f} it/s")


if __name__ == "__main__":
    main()
