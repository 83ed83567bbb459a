"""Cumulative chained microprofile of the REAL bin_gaussians internals.

Each stage replicates bin_gaussians (ops/binning.py) up to a cut point and
folds the full sum of everything computed so far into the chain, so stage
DELTAS attribute cost to individual ops:

  prep    bbox + cumsum + kept/total
  seeds   + 4 scatter-max seed arrays
  scan    + associative_scan maximum over the stacked [4, I] seeds
  decode  + per-lane tile/gauss decode math
  counts  + separable-indicator counts matmul
  sort    + row-pad candidates + combined-key sort
  full    whole bin_gaussians (adds starts, rank scan, cap mask)

Run ON TPU: PYTHONPATH=/root/.axon_site:/root/repo python scripts/profile_bin_micro.py
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

    from gsvc_tpu.ops.binning import (
        LANE_ALIGN,
        _sort_by_tile_gauss,
        bin_gaussians,
        default_max_intersects,
    )
    from gsvc_tpu.ops.projection import _tile_bbox, project_gaussians_2d
    from gsvc_tpu.utils.profiling import device_loop_time

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
    xys0, d, radii, conics, nth0 = jax.jit(
        lambda m: project_gaussians_2d(m, L, H, W, tb)
    )(means)

    def fold(x, *outs):
        tot = jnp.float32(0)
        for leaf in outs:
            for a in jax.tree.leaves(leaf):
                tot = tot + jnp.sum(a.astype(jnp.float32))
        return x + tot * 0.0

    # stage bodies exactly mirror bin_gaussians
    def upto(cut):
        def run(x):
            acc = []
            radius_f = radii.astype(x.dtype)
            tmin_x, tmin_y, tmax_x, tmax_y = _tile_bbox(x, radius_f, tb, 16, 16)
            bbox_w = jnp.maximum(tmax_x - tmin_x, 1)
            nth = nth0.astype(jnp.int32)
            cum = jnp.cumsum(nth)
            total = cum[-1]
            starts_g = cum - nth
            kept = (cum <= mi) & (nth > 0)
            total_kept = jnp.sum(jnp.where(kept, nth, 0))
            acc += [starts_g, total_kept, bbox_w, tmin_x, tmin_y]
            if cut == "prep":
                return fold(x, *acc)

            i = jnp.arange(mi, dtype=jnp.int32)
            gid = jnp.arange(n, dtype=jnp.int32)
            scatter_idx = jnp.where(kept, starts_g, mi)

            def seed_fill(payload, empty):
                return (
                    jnp.full(mi, empty, jnp.int32)
                    .at[scatter_idx]
                    .max(payload.astype(jnp.int32), mode="drop")
                )

            seeds = jnp.stack(
                [
                    seed_fill(starts_g, -1),
                    seed_fill((gid << 8) | bbox_w, -1),
                    seed_fill((gid << 8) | tmin_x, -1),
                    seed_fill((gid << 8) | tmin_y, -1),
                ]
            )
            acc.append(seeds)
            if cut == "seeds":
                return fold(x, *acc)

            filled = jax.lax.associative_scan(jnp.maximum, seeds, axis=1)
            acc.append(filled)
            if cut == "scan":
                return fold(x, *acc)

            start_of_g = filled[0]
            g = filled[1] >> 8
            valid = (i < total_kept) & (g >= 0)
            g_safe = jnp.maximum(g, 0)
            slot = i - start_of_g
            bw = jnp.maximum(filled[1] & 0xFF, 1)
            tx0 = filled[2] & 0xFF
            ty0 = filled[3] & 0xFF
            q = jnp.floor(
                (slot.astype(jnp.float32) + 0.5) / bw.astype(jnp.float32)
            ).astype(jnp.int32)
            ty = ty0 + q
            tx = tx0 + (slot - q * bw)
            tile_id = jnp.where(valid, ty * tb_x + tx, num_tiles).astype(
                jnp.int32
            )
            gauss_id = jnp.where(valid, g_safe, n).astype(jnp.int32)
            acc += [tile_id, gauss_id]
            if cut == "decode":
                return fold(x, *acc)

            rr = jnp.arange(tb_y, dtype=jnp.int32)
            cc = jnp.arange(tb_x, dtype=jnp.int32)
            rowind = (
                (rr[None, :] >= tmin_y[:, None])
                & (rr[None, :] < tmax_y[:, None])
                & kept[:, None]
            ).astype(jnp.float32)
            colind = (
                (cc[None, :] >= tmin_x[:, None])
                & (cc[None, :] < tmax_x[:, None])
            ).astype(jnp.float32)
            counts_rc = jax.lax.dot_general(
                rowind, colind, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            tile_counts = (
                jnp.round(counts_rc).astype(jnp.int32).reshape(num_tiles)
            )
            acc.append(tile_counts)
            if cut == "counts":
                return fold(x, *acc)

            row_counts = tile_counts.reshape(tb_y, tb_x).sum(axis=1)
            p_need = (-row_counts) % LANE_ALIGN
            r_ = jnp.arange(LANE_ALIGN - 1, dtype=jnp.int32)
            row_last_tile = (
                jnp.arange(tb_y, dtype=jnp.int32) * tb_x + (tb_x - 1)
            )
            pad_tile = jnp.where(
                r_[None, :] < p_need[:, None], row_last_tile[:, None], num_tiles
            ).reshape(-1)
            pad_gauss = jnp.full(pad_tile.shape, n, jnp.int32)
            st, sg = _sort_by_tile_gauss(
                jnp.concatenate([tile_id, pad_tile]),
                jnp.concatenate([gauss_id, pad_gauss]),
                n, num_tiles,
            )
            acc += [st, sg]
            if cut == "sort":
                return fold(x, *acc)

            raise ValueError(cut)

        return run

    stages = ["prep", "seeds", "scan", "decode", "counts", "sort"]
    prev = 0.0
    for cut in stages:
        t = device_loop_time(
            jax.jit(upto(cut)), xys0, reps=args.iters, outer=3
        ) * 1e3
        print(f"{cut:8s} {t:8.3f} ms   (delta {t - prev:+8.3f})")
        prev = t

    def full(x):
        b = bin_gaussians(x, radii, nth0, tb, 16, 16, mi)
        return fold(x, b)

    t = device_loop_time(jax.jit(full), xys0, reps=args.iters, outer=3) * 1e3
    print(f"{'full':8s} {t:8.3f} ms   (delta {t - prev:+8.3f})")


if __name__ == "__main__":
    main()
