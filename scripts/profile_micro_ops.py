"""Isolated per-op microbenchmarks of the forward pipeline's pieces.

Unlike the cumulative-prefix profiles (profile_fwd_chain.py), each op here
is timed ALONE in its own chained device loop (output folded back into a
small carried perturbation so iterations serialize), which avoids the
cumulative method's stage interference. Costs do not necessarily add up to
the end-to-end forward (XLA fuses across ops there), but they rank the
levers honestly.

Run ON TPU: PYTHONPATH=/root/.axon_site:/root/repo python scripts/profile_micro_ops.py
"""

import argparse

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num-points", type=int, default=10000)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--iters", type=int, default=100)
    ap.add_argument("--budget-factor", type=int, default=16)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from gsvc_tpu.ops import rasterize_pallas as rp
    from gsvc_tpu.ops.binning import (
        bin_gaussians,
        default_max_intersects,
        static_capacity,
    )
    from gsvc_tpu.ops.fill_pallas import (
        fill_decode_keys,
        rank_cap_decode,
        segmented_cumsum,
    )
    from gsvc_tpu.ops.projection import project_gaussians_2d
    from gsvc_tpu.utils.profiling import device_loop_time

    H, W, n = args.height, args.width, args.num_points
    tb = ((W + 15) // 16, (H + 15) // 16, 1)
    tb_x, tb_y = tb[0], tb[1]
    num_tiles = tb_x * tb_y
    mi = default_max_intersects(n, num_tiles, factor=args.budget_factor)
    s_cap = static_capacity(mi, tb)
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

    proj = jax.jit(lambda m: project_gaussians_2d(m, L, H, W, tb))
    xys, d, radii, conics, nth = proj(means)
    binned = jax.jit(
        lambda x, r, t: bin_gaussians(x, r, t, tb, 16, 16, mi)
    )(xys, radii, nth)
    data = jax.jit(
        lambda b, x, c: rp._pack_lanes(b, x, c, colors, opacity, tb_x, 16, 16)
    )(binned, xys, conics)
    jax.block_until_ready(data)
    print(
        f"n={n} isect={int(binned.num_intersects)} budget={mi} S={s_cap} "
        f"(budget_factor={args.budget_factor})"
    )

    def t(name, fn, x0):
        ms = device_loop_time(fn, x0, reps=args.iters, outer=3) * 1e3
        print(f"{name:24s} {ms:8.3f} ms")
        return ms

    # --- primitives ------------------------------------------------------
    keys_u32 = binned.sorted_keys
    t("sort u32 [S]",
      lambda k: jax.lax.sort(k ^ (k >> 1), is_stable=False), keys_u32)

    slot = (keys_u32 >> 14).astype(jnp.uint32)
    t("2x sort u32 [S]",
      lambda k: (
          jax.lax.sort(k ^ 1, is_stable=False)
          ^ jax.lax.sort(k ^ 2, is_stable=False)
      ),
      keys_u32)

    seedv = jnp.zeros(mi, jnp.int32)
    idx = jnp.minimum(jnp.cumsum(nth) - nth, mi)
    payload = jnp.arange(n, dtype=jnp.int32)

    def one_scatter(s):
        return s.at[idx].max(payload + s[0], mode="drop")

    t("1 seed scatter [N->I]", one_scatter, seedv)

    seeds = jnp.stack([seedv, seedv])

    def fill(s):
        k = fill_decode_keys(
            s + jnp.int32(0), binned.num_intersects, tb_x, num_tiles, n
        )
        return s + (k[:2].astype(jnp.int32) & 1)[None, :2].sum() * 0

    t("fill_decode_keys [I]", fill, seeds)

    skey = jnp.sort(keys_u32)

    def rank(k):
        tile, gauss = rank_cap_decode(k, 256, n)
        return k + (tile[0] + gauss[0]).astype(jnp.uint32) * 0

    t("rank_cap_decode [S]", rank, skey)

    vals16 = jnp.asarray(rng.normal(size=(16, s_cap)), jnp.float32)
    flags = (jnp.arange(s_cap, dtype=jnp.int32) % 8 == 0).astype(jnp.int32)

    def segsum(v):
        return segmented_cumsum(v, flags) * 0.999

    t("segmented_cumsum [16,S]", segsum, vals16)

    # pack gather: [N+1, 11] table rows gathered by [S] indices
    cat = jnp.concatenate(
        [xys, conics, opacity, colors,
         binned.bbox_pack[:, None].astype(jnp.float32),
         binned.gauss_slot_start[:-1, None].astype(jnp.float32)],
        axis=1,
    )
    cat = jnp.concatenate([cat, jnp.zeros((1, 11), jnp.float32)])
    gidx = jnp.minimum(
        (binned.sorted_keys & 0xFFFF).astype(jnp.int32), n
    )

    t("row gather [S,11]",
      lambda c: c + c[gidx].sum(0)[None, :] * 0.0, cat)

    def pack(x):
        dd = rp._pack_lanes(binned, x, conics, colors, opacity, tb_x, 16, 16)
        return x + dd[0, 0] * 0

    t("_pack_lanes full", pack, xys)

    def bin_full(x):
        b = bin_gaussians(x, radii, nth, tb, 16, 16, mi)
        return x + b.sorted_gauss_ids[0].astype(jnp.float32) * 0

    t("bin_gaussians full", bin_full, xys)

    # counts matmul inside binning (isolate)
    from gsvc_tpu.ops.projection import _tile_bbox

    def counts(x):
        tmin_x, tmin_y, tmax_x, tmax_y = _tile_bbox(
            x, radii.astype(x.dtype), tb, 16, 16
        )
        rr = jnp.arange(tb_y, dtype=jnp.int32)
        cc = jnp.arange(tb_x, dtype=jnp.int32)
        rowind = (
            (rr[None, :] >= tmin_y[:, None]) & (rr[None, :] < tmax_y[:, None])
        ).astype(jnp.float32)
        colind = (
            (cc[None, :] >= tmin_x[:, None]) & (cc[None, :] < tmax_x[:, None])
        ).astype(jnp.float32)
        c = jax.lax.dot_general(
            rowind, colind, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return x + c[0, 0] * 0

    t("counts matmul", counts, xys)

    def projection(m):
        out = project_gaussians_2d(m, L, H, W, tb)
        return m + out[0][0] * 0

    t("projection", projection, means)

    # forward kernel alone (data + row starts fixed)
    import functools

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    r_out = rp._round8(3 * tb_x)
    kernel = functools.partial(
        rp._forward_kernel, tb_x=tb_x, block_w=16, block_h=16
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(tb_y,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (r_out, 256), lambda s, r0, rls: (s, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, rp.DATA_ROWS, rp.CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    row0 = jnp.zeros((1,), jnp.int32)

    def fwd_kernel(dd):
        out = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((tb_y * r_out, 256), jnp.float32),
        )(row0, binned.row_lane_start, dd)
        return dd + out[0, 0] * 0

    t("forward kernel", fwd_kernel, data)

    # chw kernel
    cs = rp._round8(tb_x)
    kernel_chw = functools.partial(
        rp._forward_kernel_chw, tb_x=tb_x, cs=cs, block_w=16, block_h=16
    )
    grid_chw = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(tb_y,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (3, 1, 16, tb_x, 16), lambda s, r0, rls: (0, s, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((3 * cs, 256), jnp.float32),
            pltpu.VMEM((2, rp.DATA_ROWS, rp.CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    def fwd_kernel_chw(dd):
        out = pl.pallas_call(
            kernel_chw,
            grid_spec=grid_chw,
            out_shape=jax.ShapeDtypeStruct(
                (3, tb_y, 16, tb_x, 16), jnp.float32
            ),
        )(row0, binned.row_lane_start, dd)
        return dd + out[0, 0, 0, 0, 0] * 0

    t("forward kernel chw", fwd_kernel_chw, data)


if __name__ == "__main__":
    main()
