"""Pallas TPU kernels for the sequential scans inside tile binning.

Tile binning (ops/binning.py) needs two forward-fill scans over the
intersection lanes:

1. EXPAND: forward-fill the scattered per-gaussian seeds so every lane
   learns its owning gaussian + tile-decode data, then decode each lane's
   (tile, gauss) sort key. XLA's `associative_scan` does log2(I) ~ 17 full
   passes over HBM (measured +0.83 ms at I=160k on v5e); a TPU grid is
   sequential, so ONE Pallas pass with a carried running max does the same
   in ~2 passes of traffic.

2. RANK: after the (tile, gauss) sort, each lane's rank inside its tile run
   applies the per-tile cap (reference forward.cu:613 semantics). Same
   sequential-scan structure over the sorted keys.

Both kernels use the same in-block scan: a log-shift running max along
lanes (pltpu.roll + iota mask), with the cross-block carry in a VMEM
scratch row — the classic single-pass Blelloch replacement for a
hardware-sequential grid.

The kernels are shape-generic over the lane count (padded to BLK) and run
in interpreter mode for CPU tests (ops/rasterize_pallas.py INTERPRET flag
convention).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Lanes per grid step. 16384 int32 lanes x <=4 payload rows = 256 KiB VMEM
# per buffered block; larger blocks amortize the per-grid-step overhead
# (~2-4 us/step measured on v5e — at 4096 lanes the 40 steps of a 160k-lane
# fill cost more than the scan itself).
BLK = 16384

# Run in the Pallas interpreter (CPU tests). Toggled by tests.
INTERPRET = False


def _lane_scan_max(x, blk):
    """Inclusive running max along the lane axis of [rows, blk]."""
    lanes = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    s = 1
    while s < blk:
        shifted = pltpu.roll(x, shift=s, axis=1)
        x = jnp.maximum(x, jnp.where(lanes < s, jnp.int32(-1), shifted))
        s *= 2
    return x


def _fill_kernel(
    total_ref,  # [1] SMEM scalar prefetch: total kept intersections
    seeds_ref,  # [R, BLK] VMEM block of scattered seeds (-1 = empty)
    keys_ref,  # [1, BLK] uint32 output: (tile << 16 | gauss) sort keys
    carry,  # [8, 128] VMEM scratch: running max per payload row (col 0)
    *,
    blk: int,
    tb_x: int,
    num_tiles: int,
    n: int,
    rows: int,
):
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _init():
        carry[...] = jnp.full_like(carry, -1)

    x = seeds_ref[...]  # [rows, blk]
    x = _lane_scan_max(x, blk)
    x = jnp.maximum(x, carry[0:rows, 0:1])
    carry[0:rows, 0:1] = x[:, blk - 1 : blk]

    # decode (mirrors ops/binning.py): lane's rank inside its gaussian's
    # tile bbox -> row-major tile id; invalid lanes get sentinel ids.
    # Seed formats (all rows monotone in gaussian id, so the running max
    # forward-fills each lane with its owning gaussian's values):
    #   rows=2: [(start << 8) | bbox_w, ((g+1) << 16) | (tmin_x << 8) | tmin_y]
    #   rows=3: [(start << 8) | bbox_w, (g << 8) | tmin_x, (g << 8) | tmin_y]
    #   rows=4: [start, (g << 8) | bbox_w, (g << 8) | tmin_x, (g << 8) | tmin_y]
    i = b * blk + jax.lax.broadcasted_iota(jnp.int32, (1, blk), 1)
    if rows == 2:
        start_of_g = x[0:1, :] >> 8
        bw = jnp.maximum(x[0:1, :] & 0xFF, 1)
        g = (x[1:2, :] >> 16) - 1
        tx0 = (x[1:2, :] >> 8) & 0xFF
        ty0 = x[1:2, :] & 0xFF
    elif rows == 3:
        start_of_g = x[0:1, :] >> 8
        bw = jnp.maximum(x[0:1, :] & 0xFF, 1)
        g = x[1:2, :] >> 8
        tx0 = x[1:2, :] & 0xFF
        ty0 = x[2:3, :] & 0xFF
    else:
        start_of_g = x[0:1, :]
        g = x[1:2, :] >> 8
        bw = jnp.maximum(x[1:2, :] & 0xFF, 1)
        tx0 = x[2:3, :] & 0xFF
        ty0 = x[3:4, :] & 0xFF
    valid = (i < total_ref[0]) & (g >= 0)
    g_safe = jnp.maximum(g, 0)
    slot = i - start_of_g
    q = jnp.floor(
        (slot.astype(jnp.float32) + 0.5) / bw.astype(jnp.float32)
    ).astype(jnp.int32)
    ty = ty0 + q
    tx = tx0 + (slot - q * bw)
    tile = jnp.where(valid, ty * tb_x + tx, num_tiles)
    gauss = jnp.where(valid, g_safe, 0xFFFF)
    keys_ref[...] = (
        tile.astype(jnp.uint32) << 16
    ) | gauss.astype(jnp.uint32)


def fill_decode_keys(
    seeds: jax.Array,
    total_kept: jax.Array,
    tb_x: int,
    num_tiles: int,
    n: int,
) -> jax.Array:
    """[R, I] scattered seeds -> [I] uint32 (tile << 16 | gauss) sort keys.

    R in {2, 3, 4} selects the packed seed format (see _fill_kernel);
    seeds are scattered at each kept gaussian's exclusive start slot, -1
    elsewhere. Fewer rows = fewer XLA scatters upstream (each is a serial
    ~7-cycles-per-update loop on TPU, ~70 us at N=10k). Sentinel lanes
    (beyond total_kept or before the first seed) key as
    (num_tiles << 16 | 0xFFFF).
    """
    rows = seeds.shape[0]
    i_total = seeds.shape[1]
    pad = (-i_total) % BLK
    if pad:
        seeds = jnp.pad(seeds, ((0, 0), (0, pad)), constant_values=-1)
    nb = seeds.shape[1] // BLK
    # Blocks slice the LANE dim of the 2D array directly — the previous
    # [nb, R, BLK] repack transposed the whole seed array through HBM
    # (0.036 ms/step at I=98k, profiled via scripts/profile_xplane.py).

    kernel = functools.partial(
        _fill_kernel, blk=BLK, tb_x=tb_x, num_tiles=num_tiles, n=n,
        rows=rows,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((rows, BLK), lambda b, t: (0, b)),
        ],
        out_specs=pl.BlockSpec((1, BLK), lambda b, t: (0, b)),
        scratch_shapes=[pltpu.VMEM((8, 128), jnp.int32)],
    )
    keys = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((1, nb * BLK), jnp.uint32),
        interpret=INTERPRET,
    )(total_kept.reshape(1), seeds)
    return keys.reshape(nb * BLK)[:i_total]


def _segsum_kernel(
    vals_ref,  # [R, BLK] f32 values in segment-contiguous (slot) order
    flags_ref,  # [1, BLK] int32: 1 at each segment's FIRST slot
    out_ref,  # [R, BLK] f32 inclusive segmented cumsum
    carry,  # [16, 128] f32 scratch: running sum per row (col 0)
    *,
    blk: int,
    rows: int,
):
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _init():
        carry[...] = jnp.zeros_like(carry)

    s = vals_ref[...]  # [rows, blk]
    # int32 flags throughout: Mosaic's roll has no non-32-bit lowering
    fb = jnp.where(flags_ref[...] != 0, jnp.int32(1), jnp.int32(0))  # [1, blk]
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, blk), 1)
    k = 1
    while k < blk:
        s_sh = pltpu.roll(s, shift=k, axis=1)
        f_sh = pltpu.roll(fb, shift=k, axis=1)
        in_range = lanes >= k
        # s_i += (no segment start in (i-k, i]) ? s_{i-k} : 0
        s = s + jnp.where((fb != 0) | jnp.logical_not(in_range), 0.0, s_sh)
        fb = jnp.maximum(fb, jnp.where(in_range, f_sh, 0))
        k *= 2
    # cross-block: lanes whose segment began before this block get the carry
    s = s + jnp.where(fb != 0, 0.0, carry[0:rows, 0:1])
    carry[0:rows, 0:1] = s[:, blk - 1 : blk]
    out_ref[...] = s


def segmented_cumsum(vals: jax.Array, flags: jax.Array) -> jax.Array:
    """Inclusive segmented cumsum along the last axis of [R, S] values.

    flags [S] int32 marks each segment's first element. One sequential
    Pallas pass (log-shift scan per block + carried running sum), replacing
    jnp.cumsum's log2(S) full HBM passes AND enabling the rasterizer
    backward's gradient reduction to avoid jax.ops.segment_sum, whose TPU
    lowering is a serial scatter-add (~7 cycles/update: 1.4 ms at S=178k —
    nearly half the train step).
    """
    rows, s_total = vals.shape
    assert rows <= 16, rows
    pad = (-s_total) % BLK
    if pad:
        vals = jnp.pad(vals, ((0, 0), (0, pad)))
        flags = jnp.pad(flags, (0, pad), constant_values=1)
    nb = vals.shape[1] // BLK
    # Blocks slice the LANE dim directly (no [nb, R, BLK] repack: the two
    # transposes cost 0.08 ms/step at S=107k — scripts/profile_xplane.py).
    kernel = functools.partial(_segsum_kernel, blk=BLK, rows=rows)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((rows, BLK), lambda b: (0, b)),
            pl.BlockSpec((1, BLK), lambda b: (0, b)),
        ],
        out_specs=pl.BlockSpec((rows, BLK), lambda b: (0, b)),
        scratch_shapes=[pltpu.VMEM((16, 128), jnp.float32)],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((rows, nb * BLK), jnp.float32),
        interpret=INTERPRET,
    )(vals, flags.reshape(1, -1))
    return out[:, :s_total]


def _rank_kernel(
    keys_ref,  # [1, BLK] sorted uint32 keys
    tile_ref,  # [1, BLK] int32 tile ids out
    gauss_ref,  # [1, BLK] int32 gauss ids out (cap applied)
    carry,  # [8, 128] VMEM scratch: [prev last tile, prev run start]
    *,
    blk: int,
    cap: int,
    n: int,
):
    b = pl.program_id(0)
    keys = keys_ref[...]  # [1, blk]
    tile = (keys >> 16).astype(jnp.int32)
    gauss = (keys & 0xFFFF).astype(jnp.int32)

    @pl.when(b == 0)
    def _init():
        carry[0:1, 0:1] = jnp.full((1, 1), -1, jnp.int32)  # prev tile
        carry[1:2, 0:1] = jnp.zeros((1, 1), jnp.int32)  # prev run start

    lane = b * blk + jax.lax.broadcasted_iota(jnp.int32, (1, blk), 1)
    prev_tile = jnp.concatenate(
        [carry[0:1, 0:1], tile[:, : blk - 1]], axis=1
    )
    change = tile != prev_tile
    # run start = last lane where the tile changed (carried across blocks)
    seed = jnp.where(change, lane, -1)
    run_start = _lane_scan_max(seed, blk)
    run_start = jnp.maximum(run_start, carry[1:2, 0:1])
    rank = lane - run_start
    tile_ref[...] = tile
    gauss_ref[...] = jnp.where((rank < cap) & (gauss != 0xFFFF), gauss, n)
    carry[0:1, 0:1] = tile[:, blk - 1 : blk]
    carry[1:2, 0:1] = run_start[:, blk - 1 : blk]


def rank_cap_decode(
    sorted_keys: jax.Array, cap: int, n: int
) -> tuple[jax.Array, jax.Array]:
    """Sorted uint32 keys -> (tile_ids [S], gauss_ids [S]) with the per-tile
    cap applied (lanes ranked >= cap within their tile run get sentinel n,
    like the reference's first-256-batch early exit, forward.cu:613)."""
    s_total = sorted_keys.shape[0]
    pad = (-s_total) % BLK
    if pad:
        sorted_keys = jnp.pad(
            sorted_keys, (0, pad), constant_values=jnp.uint32(0xFFFFFFFF)
        )
    nb = sorted_keys.shape[0] // BLK
    keys2 = sorted_keys.reshape(1, nb * BLK)

    kernel = functools.partial(_rank_kernel, blk=BLK, cap=cap, n=n)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(nb,),
        in_specs=[pl.BlockSpec((1, BLK), lambda b: (0, b))],
        out_specs=[
            pl.BlockSpec((1, BLK), lambda b: (0, b)),
            pl.BlockSpec((1, BLK), lambda b: (0, b)),
        ],
        scratch_shapes=[pltpu.VMEM((8, 128), jnp.int32)],
    )
    tile, gauss = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((1, nb * BLK), jnp.int32),
            jax.ShapeDtypeStruct((1, nb * BLK), jnp.int32),
        ],
        interpret=INTERPRET,
    )(keys2)
    return (
        tile.reshape(nb * BLK)[:s_total],
        gauss.reshape(nb * BLK)[:s_total],
    )
