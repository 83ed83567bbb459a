"""Chained decomposition of bin_gaussians on the TPU: where does the
non-sort time go?

Stages (cumulative pipeline prefixes, chained timing):
  prep     bbox + cumsum + starts
  seed     + scatter-max of gaussian ids at start slots
  fill     + associative_scan forward fill (g, start_of_g)
  decode   + packed gather + tile decode math -> tile_id/gauss_id
  counts   + per-tile histogram scatter-add
  sort     + pad candidates + combined-key sort
  full     whole bin_gaussians (adds starts/rank/cap post-processing)

Run ON TPU: PYTHONPATH=/root/.axon_site:/root/repo python scripts/profile_binning.py
"""

import argparse
import time

import numpy as np


def chained(fn, x0, iters=50, warmup=None):
    """ms/iter via in-jit fori_loop chaining (relay-dispatch-immune)."""
    del warmup
    from gsvc_tpu.utils.profiling import device_loop_time

    return device_loop_time(fn, x0, reps=iters, outer=3) * 1e3


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
        bin_gaussians,
        default_max_intersects,
        _sort_by_tile_gauss,
    )
    from gsvc_tpu.ops.projection import _tile_bbox, project_gaussians_2d

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
    xys, d, radii, conics, nth = jax.jit(
        lambda m: project_gaussians_2d(m, L, H, W, tb)
    )(means)
    it = args.iters

    def fold(x, out):
        tot = jnp.float32(0)
        for leaf in jax.tree.leaves(out):
            tot = tot + jnp.sum(leaf.astype(jnp.float32))
        return x + tot * 0.0

    def prep(x):
        radius_f = radii.astype(x.dtype)
        tmin_x, tmin_y, tmax_x, _t = _tile_bbox(x, radius_f, tb, 16, 16)
        bbox_w = jnp.maximum(tmax_x - tmin_x, 1)
        nth_ = nth.astype(jnp.int32)
        cum = jnp.cumsum(nth_)
        total = cum[-1]
        starts_g = cum - nth_
        return tmin_x, tmin_y, bbox_w, nth_, starts_g, total

    def seed_of(x):
        tmin_x, tmin_y, bbox_w, nth_, starts_g, total = prep(x)
        gid = jnp.arange(n, dtype=jnp.int32)
        scatter_idx = jnp.where(nth_ > 0, starts_g, mi)
        seed = (
            jnp.full(mi, -1, jnp.int32).at[scatter_idx].max(gid, mode="drop")
        )
        return seed, (tmin_x, tmin_y, bbox_w, total)

    def fill_of(x):
        seed, aux = seed_of(x)
        i = jnp.arange(mi, dtype=jnp.int32)
        filled = jax.lax.associative_scan(
            jnp.maximum, jnp.stack([seed, jnp.where(seed >= 0, i, -1)]), axis=1
        )
        return filled, aux, i

    def decode_of(x):
        filled, (tmin_x, tmin_y, bbox_w, total), i = fill_of(x)
        g, start_of_g = filled[0], filled[1]
        valid = (i < total) & (g >= 0)
        g_safe = jnp.maximum(g, 0)
        slot = i - start_of_g
        packed = (bbox_w | (tmin_x << 8) | (tmin_y << 16)).astype(jnp.int32)
        pk = packed[g_safe]
        bw = pk & 0xFF
        tx0 = (pk >> 8) & 0xFF
        ty0 = (pk >> 16) & 0xFF
        q = jnp.floor(
            (slot.astype(jnp.float32) + 0.5) / bw.astype(jnp.float32)
        ).astype(jnp.int32)
        ty = ty0 + q
        tx = tx0 + (slot - q * bw)
        tile_id = jnp.where(valid, ty * tb_x + tx, num_tiles).astype(jnp.int32)
        gauss_id = jnp.where(valid, g_safe, n).astype(jnp.int32)
        return tile_id, gauss_id

    def counts_of(x):
        tile_id, gauss_id = decode_of(x)
        tile_counts = (
            jnp.zeros(num_tiles + 1, jnp.int32)
            .at[tile_id]
            .add(1, mode="drop")[:num_tiles]
        )
        return tile_id, gauss_id, tile_counts

    def sort_of(x):
        tile_id, gauss_id, tile_counts = counts_of(x)
        row_counts = tile_counts.reshape(tb_y, tb_x).sum(axis=1)
        p_need = (-row_counts) % LANE_ALIGN
        r_ = jnp.arange(LANE_ALIGN - 1, dtype=jnp.int32)
        row_last_tile = jnp.arange(tb_y, dtype=jnp.int32) * tb_x + (tb_x - 1)
        pad_tile = jnp.where(
            r_[None, :] < p_need[:, None], row_last_tile[:, None], num_tiles
        ).reshape(-1)
        pad_gauss = jnp.full(pad_tile.shape, n, jnp.int32)
        st, sg = _sort_by_tile_gauss(
            jnp.concatenate([tile_id, pad_tile]),
            jnp.concatenate([gauss_id, pad_gauss]),
            n, num_tiles,
        )
        return st, sg, tile_counts

    stages = {
        "prep": lambda x: fold(x, prep(x)),
        "seed": lambda x: fold(x, seed_of(x)),
        "fill": lambda x: fold(x, fill_of(x)),
        "decode": lambda x: fold(x, decode_of(x)),
        "counts": lambda x: fold(x, counts_of(x)),
        "sort": lambda x: fold(x, sort_of(x)),
        "full": lambda x: fold(
            x, bin_gaussians(x, radii, nth, tb, 16, 16, mi)
        ),
    }
    for name, f in stages.items():
        t = chained(jax.jit(f), xys, it)
        print(f"{name:8s} {t:8.3f} ms")


if __name__ == "__main__":
    main()
