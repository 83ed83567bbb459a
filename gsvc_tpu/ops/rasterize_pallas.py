"""Pallas TPU kernels for the differentiable sum-rasterizer.

TPU-native replacement for the reference CUDA hot kernels
`rasterize_forward_sum` (gsplat/gsplat/cuda/csrc/forward.cu:512-627) and
`rasterize_backward_sum_kernel` (backward.cu:696-862).

Design (see SURVEY.md §7.1) — the ROW-STREAMING layout:

- The render is an order-independent accumulation, so each tile needs only
  its *member* splats, already grouped contiguously by the binning sort
  (ops/binning.py), whose layout pads every tile ROW of the grid to a
  CHUNK-lane boundary. Per-lane splat data is gathered once into a
  param-major array (`data[16, S]`: x, y, c1, c2, c3, opac, r, g, b, ox,
  oy, tile — ox/oy are the lane's OWN tile origin and `tile` its global
  tile id, so a chunk can mix tiles freely).

- Forward: ONE grid step per tile row (68 steps at 1080p). Each step
  double-buffer-DMAs its row's CHUNK-lane slices from HBM with a DYNAMIC
  trip count (work scales with the row's real intersections, not a static
  worst case) and accumulates all of the row's tiles directly into a
  [3*tb_x, pix] accumulator: sigma for all 256 tile-local pixels is one
  [pix, 6] x [6, CHUNK] MXU matmul (quadratic-feature factorization), and
  the per-tile color accumulation is one [3*tb_x, CHUNK] x [CHUNK, pix]
  MXU matmul against a tile-masked color matrix:
  acc[(t, c), p] += sum_{k in tile t} rgb[c, k] * alpha[p, k].
  The output IS the tiled image — no segment reduction afterwards (the
  previous group-streamed design's XLA segment_sum cost 2.6 ms at 1080p,
  more than the kernel itself; measured in scripts/profile_fwd_chain.py).

- Backward is atomics-free (vs. backward.cu:843-858's atomicAdd) and uses
  the same streamed layout: per chunk it recomputes sigma/alpha against the
  step's [3*tb_x, pix] image-gradient block, emits per-lane parameter
  gradients, and DMAs them back out chunk-by-chunk; v_alpha and v_rgb are
  the transposed MXU matmuls of the forward. A segment_sum over gaussian
  ids then reduces lane grads to per-splat grads. Deterministic by
  construction.

- The per-tile cap (first 256 binned splats, forward.cu:613) is applied by
  the binning (beyond-cap lanes carry the sentinel gaussian id).

Numerics match the reference: sigma/alpha in f32, alpha = min(1, opac*vis)
with the min applied forward-only in the VJP (backward.cu:824-837), cutoff
sigma >= 0 and alpha >= 1/255 gating both passes (forward.cu:600,
backward.cu:802-805). The off-diagonal conic grad is emitted *unhalved*
(unlike backward.cu:834) because it composes with plain autodiff through
conic = inv(cov) rather than the reference's symmetrized VJP
(helpers.cuh:71-82); the end-to-end parameter gradients are identical.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gsvc_tpu.ops.binning import LANE_ALIGN, BinnedSplats
from gsvc_tpu.ops.rasterize_dense import ALPHA_CUTOFF

# Lanes per in-kernel DMA chunk. May exceed LANE_ALIGN (the binning
# layout's row-superblock alignment): a row's last chunk then overruns
# into the next row's lanes, which is harmless — overrun lanes' tiles
# belong to the next row, so the tile masks zero their contribution
# (window path falls back to full width via the span check), their zeroed
# backward lanes are rewritten by the next row's own sequential grid step,
# and the static capacity is MAX_CHUNK-aligned so no DMA reads out of
# bounds. The chunk size is picked PER CALL by density (_pick_chunk):
# at low densities a 512-lane chunk spans too many tiles for the
# WINDOW_TILES fast path (measured 2x kernel regression at 10k/1080p);
# at high densities (many lanes per tile) 512 halves the per-chunk loop
# and DMA overheads while windows still hit.
CHUNK = 256  # default / low-density chunk
MAX_CHUNK = 512  # largest selectable chunk (binning capacity slack)
# pick 512 when the average 512-lane chunk spans <= this many tiles
DENSE_CHUNK_SPAN = 20
# force a specific chunk size (profiling sweeps); None = auto
FORCE_CHUNK = None

DATA_ROWS = 16  # packed rows: x y c1 c2 c3 opac r g b ox oy tile (4 pad)


def _pick_chunk(s_cap: int, num_tiles: int) -> int:
    """Static per-call DMA chunk size from the average lane density.

    512 auto-selection is DISABLED: compiling any 512-lane-chunk kernel
    hard-crashes the TPU toolchain's LLO lowering on v5e
    ("lower_to_llo.cc:1093 Check failed: d >> 32 == 0 (-1 vs. 0)",
    SIGABRT — reproduced with a minimal kernel on 2026-08-21). The
    machinery (chunk kwargs, MAX_CHUNK capacity slack, FORCE_CHUNK)
    stays so the lever is one line when the toolchain accepts it."""
    if FORCE_CHUNK is not None:
        return int(FORCE_CHUNK)
    if 512 * num_tiles <= s_cap * DENSE_CHUNK_SPAN:
        return CHUNK  # would be 512 — see the LLO crash note above
    return CHUNK

# Dynamic tile window: chunk lanes are tile-sorted, so one chunk usually
# spans far fewer tiles than the whole row (~20 at converged densities).
# Each chunk anchors a WINDOW_TILES-wide window at its first lane's tile
# and runs the color/grad matmuls at 3*WINDOW_TILES rows instead of
# 3*tb_x (360 at 1080p), falling back to the full-width path for the rare
# sparse chunk that spans more. 3*WINDOW_TILES must be a multiple of 8
# (sublane-aligned dynamic output slices). 32 measured best at 1080p/10k
# (vs 40: +10 fps eval; 24 loses — too many full-width fallbacks).
WINDOW_TILES = 32

# Run kernels in the Pallas interpreter (for CPU tests). Toggled by tests.
INTERPRET = False

# Profiling-only hook (scripts/profile_kernel_variants.py): replace the CHW
# kernel's planar epilogue to isolate its cost. "none" skips the output
# store entirely, "raw" stores a trivial acc-dependent block (real store
# traffic, no relayout). NEVER set in production — output is garbage.
EPILOGUE_MODE = None


def _zero_cotangent(x):
    if jnp.issubdtype(x.dtype, jnp.integer) or x.dtype == jnp.bool_:
        return np.zeros(x.shape, dtype=jax.dtypes.float0)
    return jnp.zeros_like(x)


def _round8(x: int) -> int:
    return ((x + 7) // 8) * 8


def _rls_for_span(row_lane_start: jax.Array, partial_shard: bool) -> jax.Array:
    """row_lane_start for the kernels' scalar prefetch.

    A partial tile-row shard of a RAGGED-height image may span past the
    real grid (parallel/sharded.py pads the sharded row count to a
    multiple of the shard count; rows >= tb_y hold no splats). The kernels
    clamp their row index to the last rls interval; edge-padding by one
    entry makes that interval zero-width, so clamped rows do zero chunk
    DMAs and write a zero block."""
    if not partial_shard:
        return row_lane_start
    return jnp.pad(row_lane_start, (0, 1), mode="edge")


def _pack_lanes(
    binned: BinnedSplats,
    xys: jax.Array,
    conics: jax.Array,
    colors: jax.Array,
    opacity: jax.Array,
    tb_x: int,
    block_w: int,
    block_h: int,
) -> jax.Array:
    """Gather per-lane splat params + tile origins/ids, [16, S] param-major.

    Rows: 0:x 1:y 2:c1 3:c2 4:c3 5:opac 6:r 7:g 8:b 9:ox 10:oy 11:tile
    12:bbox_pack 13:gauss_slot_start (rows 12-13 are exact small ints in
    f32; the backward's gradient reduction uses them to recover each lane's
    expansion slot elementwise — see _reduce_lane_grads. They ride the
    same gather because TPU gather cost is WIDTH-INDEPENDENT at these
    shapes — [2,S], [9,S] and [11,S] gathers all profile at 0.136 ms; a
    separate backward-side gather would add a full 0.136, and a slimmer
    forward gather saves nothing).

    Layout discipline (measured on v5e at S=178k): the whole pack is built
    PARAM-major — one [11, N+1] x [S]-index gather along the minor axis,
    the per-lane ox/oy/tile rows as [1, S] vector math, and one concat
    along the MAJOR axis (0.43 ms). The previous row-major assembly
    (gather [S, 11], minor-dim-1 column concats, then a [S,16] -> [16,S]
    transpose) ran 3x slower (1.25 ms): minor-dim slivers and the
    16-wide-minor transpose are far off HBM bandwidth on TPU.

    Beyond-cap, row-pad, and tail lanes must contribute nothing. On the
    fast key path the gather indexes with the RAW gaussian ids
    (`sorted_keys & 0xFFFF`) and zeroes beyond-cap lanes' OPACITY instead:
    alpha = 0 then falls below the 1/255 cutoff, which gates both passes
    exactly like the reference kernel's first-256-per-tile batch
    (forward.cu:613), while rows 12-13 keep the lane's REAL bbox/slot data
    — _reduce_lane_grads needs every raw-real lane (capped included) to
    occupy its own expansion slot so real slots stay unique AND DENSE
    (capped lanes summing exact zeros into their gaussian is a no-op;
    routing them to in-range bogus slots corrupts the permutation
    inversion, and sentinel-routing them leaves holes that shift every
    later slot). Without raw keys (slow path) the capped ids (sentinel N)
    fetch the zero column as before — segment_sum doesn't care.
    """
    ids, tiles = binned.sorted_gauss_ids, binned.sorted_tile_ids
    n = xys.shape[0]
    # ONE [N, 11] concat + transpose (not per-param .T): transposing the
    # individual [N, 2/3] parameters made XLA flip the layout of the
    # train loop's carried params/optimizer state to amortize it —
    # ~0.04 ms async layout copies per param per step (profiled,
    # scripts/profile_xplane.py). One small [N, 11] transpose instead.
    cat_pm = jnp.concatenate(
        [
            xys, conics, opacity.reshape(-1, 1), colors[:, :3],
            binned.bbox_pack.reshape(-1, 1).astype(jnp.float32),
            binned.gauss_slot_start[:-1].reshape(-1, 1).astype(jnp.float32),
        ],
        axis=1,
    ).T  # [11, N] param-major
    cat_pm = jnp.pad(cat_pm, ((0, 0), (0, 1)))  # zero column at index N
    if binned.sorted_keys is not None:
        raw = (binned.sorted_keys & jnp.uint32(0xFFFF)).astype(jnp.int32)
        gidx = jnp.minimum(raw, n)  # 0xFFFF sentinels -> zero column
        g = cat_pm[:, gidx]  # [11, S] — THE gather (minor-axis indexed)
        capped = (ids != gidx).reshape(1, -1)  # rank_cap_decode sentinels
        opac = jnp.where(capped, 0.0, g[5:6])
    else:
        g = cat_pm[:, ids]
        opac = g[5:6]
    tf = tiles.astype(jnp.float32).reshape(1, -1)
    ty = jnp.floor((tf + 0.5) / float(tb_x))  # exact: tile < 2^16 (binning)
    tx = tf - ty * float(tb_x)
    return jnp.concatenate(
        [
            g[:5],
            opac,
            g[6:9],
            tx * block_w,
            ty * block_h,
            tf,
            g[9:11],
            jnp.zeros((DATA_ROWS - 14, tf.shape[1]), jnp.float32),
        ],
        axis=0,
    )  # [16, S]


def _pixel_features(block_w: int, block_h: int):
    """A[pix, 6] = [px^2, py^2, px*py, px, py, 1] in tile-LOCAL coordinates.

    Tile-local coords keep every A*B product O(sigma)-bounded, so the f32
    matmul loses no precision to cancellation (global pixel coords would
    put ~1e4-magnitude intermediate terms against an O(1) result).
    """
    pix = block_w * block_h
    p = jax.lax.broadcasted_iota(jnp.int32, (pix, 1), 0)
    px = (p % block_w).astype(jnp.float32)
    py = (p // block_w).astype(jnp.float32)
    one = jnp.ones((pix, 1), jnp.float32)
    return jnp.concatenate([px * px, py * py, px * py, px, py, one], axis=1)


def _splat_features(d):
    """B[6, C]: per-splat quadratic coefficients in tile-local coords.

    sigma[p, k] = A[p] . B[k] with A from `_pixel_features`:
      sigma = 0.5*c1*(gx-px)^2 + 0.5*c3*(gy-py)^2 + c2*(gx-px)*(gy-py)
    expanded around each lane's OWN tile origin (rows 9, 10). Turns the
    per-pixel-per-splat quadratic into one MXU matmul instead of ~10 VPU
    ops on [pix, C].
    """
    gx = d[0:1, :] - d[9:10, :]
    gy = d[1:2, :] - d[10:11, :]
    c1 = d[2:3, :]
    c2 = d[3:4, :]
    c3 = d[4:5, :]
    b3 = -(c1 * gx + c2 * gy)
    b4 = -(c3 * gy + c2 * gx)
    b5 = -0.5 * (b3 * gx + b4 * gy)  # = 0.5*c1*gx^2 + 0.5*c3*gy^2 + c2*gx*gy
    return gx, gy, c1, c2, c3, jnp.concatenate(
        [0.5 * c1, 0.5 * c3, c2, b3, b4, b5], axis=0
    )


# Split-bf16 kernel matmuls. Mosaic lowers an f32 dot_general to a
# multi-pass MXU emulation regardless of the `precision` flag (measured:
# HIGHEST/HIGH/DEFAULT are bit-identical AND time-identical in-kernel), so
# the only real lever is operand dtype. The pixel-feature matrix A is
# integer-valued <= 225, hence EXACT in bf16; the other operands get
# explicit hi/lo (or hi/mid/lo) bf16 splits CONCATENATED into the
# contraction dim, so each logical matmul stays a single dot at ~1e-5
# absolute error (vs the reference CUDA's fast-math f32; validated on-chip,
# saves ~0.2 ms/frame at 1080p). False = exact f32 (slow, for debugging).
SPLIT_MM = True

# Fast color mode: single bf16 products for the color/grad matmuls
# (k=CHUNK instead of 3*CHUNK) AND a bf16 CHW relayout epilogue —
# max ~6.5e-3 absolute output delta (1.65 of 255 levels; validated
# on-chip at 1080p/10k), the same class of tradeoff as the reference's
# --use_fast_math build (gsplat/setup.py:76). Off by default (the
# f32-split path is what the parity tests pin); enable for
# throughput-first serving via `bench.py --color-bf16` or by setting
# this flag before tracing.
COLOR_BF16 = False

_HIGHEST = jax.lax.Precision.HIGHEST


def _dot(a, b, dims):
    return jax.lax.dot_general(
        a, b, dimension_numbers=(dims, ((), ())),
        preferred_element_type=jnp.float32, precision=_HIGHEST,
    )


def _bf16_split2(x):
    """x ~= hi + lo with bf16 parts (16 mantissa bits, ~2^-16 residual)."""
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _bf16_split3(x):
    """x ~= hi + mid + lo with bf16 parts (~2^-24 residual)."""
    hi = x.astype(jnp.bfloat16)
    r = x - hi.astype(jnp.float32)
    mid = r.astype(jnp.bfloat16)
    lo = (r - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, mid, lo


def _eye_f32(n):
    ii = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    return (ii == jj).astype(jnp.float32)


def _mxu_transpose(x):
    """[r, c] -> [c, r] on the MXU: contract x's ROW axis with an f32
    identity. BIT-EXACT (every output element is 1.0*x + 0.0*rest — exact
    under any MXU pass scheme; validated maxerr 0 on v5e,
    scripts/probe_mxu_transpose.py). Replaces Mosaic's VPU transpose,
    which costs ~0.08 ms per [360, 256] block at 1080p while the MXU sits
    idle. Mosaic accepts transposed-contraction matmuls only with f32
    operands ("Bad lhs type" for bf16), which is exactly what exactness
    wants anyway."""
    return _dot(x, _eye_f32(x.shape[0]), ((0,), (0,)))


def _mxu_transpose_minor(x3d):
    """[b, m, n] -> [b, n, m] on the MXU (batched minor-dims transpose):
    contract the MIDDLE axis with an f32 identity. Bit-exact (see
    _mxu_transpose). Replaces the minor-16 VPU transpose of the CHW
    epilogue."""
    return _dot(x3d, _eye_f32(x3d.shape[1]), ((1,), (0,)))


def _dot_exact_a(a_bf16, b, dims):
    """dot(a, b) where `a` is exactly representable in bf16.

    b splits 3-way along the contraction dim (the sigma matmul's k is 6, so
    3x still fits one 128-deep MXU pass; the vB matmul's k grows 256->768).
    """
    if not SPLIT_MM:
        return _dot(a_bf16.astype(jnp.float32), b, dims)
    (ca,), (cb,) = dims
    bh, bm, bl = _bf16_split3(b)
    a3 = jnp.concatenate([a_bf16] * 3, axis=ca)
    b3 = jnp.concatenate([bh, bm, bl], axis=cb)
    return jax.lax.dot_general(
        a3, b3, dimension_numbers=(((ca,), (cb,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _dot_split(a, b, dims):
    """dot(a, b) with both operands split hi/lo; drops only the lo*lo term
    (~2^-16 relative), one 3x-contraction bf16 dot."""
    if not SPLIT_MM:
        return _dot(a, b, dims)
    if COLOR_BF16:
        (ca,), (cb,) = dims
        return jax.lax.dot_general(
            a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
            dimension_numbers=(((ca,), (cb,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    (ca,), (cb,) = dims
    ah, al = _bf16_split2(a)
    bh, bl = _bf16_split2(b)
    a3 = jnp.concatenate([ah, al, ah], axis=ca)
    b3 = jnp.concatenate([bh, bh, bl], axis=cb)
    return jax.lax.dot_general(
        a3, b3, dimension_numbers=(((ca,), (cb,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _row_selectors(r_out: int):
    """Static [R_OUT, 1] helpers: row's tile index and channel one-hots."""
    idx = jax.lax.broadcasted_iota(jnp.int32, (r_out, 1), 0)
    row_t = idx // 3
    row_c = idx % 3
    s0 = (row_c == 0).astype(jnp.float32)
    s1 = (row_c == 1).astype(jnp.float32)
    s2 = (row_c == 2).astype(jnp.float32)
    return row_t, s0, s1, s2


def _window_anchor(d, tile0, tb_x: int):
    """(anchor, span_ok) for the chunk's dynamic tile window.

    Lanes are tile-sorted, so the chunk's tiles lie in [first, last]. The
    window anchors at the first lane's tile rounded down to a multiple of
    8 (sublane-aligned output rows) and clamped to keep WINDOW_TILES
    columns inside the row; span_ok says every lane fits the window.
    Tile ids are exact in f32 (< 2^16)."""
    t_first = d[11, 0].astype(jnp.int32) - tile0
    t_last = d[11, d.shape[1] - 1].astype(jnp.int32) - tile0
    anchor = jnp.clip(t_first & ~7, 0, tb_x - WINDOW_TILES)
    span_ok = t_last - anchor < WINDOW_TILES
    return anchor, span_ok


def _chunk_eval(d, A, block_w: int, block_h: int):
    """Shared forward math on one [16, CHUNK] data block."""
    gx, gy, c1, c2, c3, B = _splat_features(d)
    # A is integer-valued (exact in bf16); B splits 3-way -> one k=18 dot.
    sigma = _dot_exact_a(A.astype(jnp.bfloat16), B, ((1,), (0,)))  # [pix, C]
    vis = jnp.exp(-sigma)
    alpha_u = d[5:6, :] * vis
    alpha = jnp.minimum(1.0, alpha_u)
    valid = (sigma >= 0.0) & (alpha >= ALPHA_CUTOFF)
    return gx, gy, c1, c2, c3, sigma, vis, alpha_u, alpha, valid


def _tile_mask_and_rgb(d, row_t, s0, s1, s2, tile0):
    """[R_OUT, CHUNK] lane-tile mask and tile-masked color matrix."""
    lt = d[11:12, :].astype(jnp.int32) - tile0  # [1, C] local tile
    mask = row_t == lt
    rgb_sel = s0 * d[6:7, :] + s1 * d[7:8, :] + s2 * d[8:9, :]
    return mask, jnp.where(mask, rgb_sel, 0.0)


def _forward_kernel(
    row0_ref, rls_ref,  # scalar prefetch
    data_ref,  # [16, S] in ANY (HBM), manually chunk-DMA'd
    out_ref,  # [R_OUT, pix] VMEM block for this tile row
    buf, sem,  # scratch: [2, 16, chunk] VMEM, DMA sems (2,)
    *, tb_x: int, block_w: int, block_h: int, chunk: int = CHUNK,
):
    s = pl.program_id(0)
    # clamp to the last rls interval: a partial tile-row shard of a
    # ragged-height image may span PAST the real grid (its row count is
    # padded to a multiple of the shard count — parallel/sharded.py); the
    # entry edge-pads rls by one entry, so clamped out-of-grid rows read a
    # zero-width interval (0 chunks) and emit a zero block.
    r = jnp.minimum(row0_ref[0] + s, rls_ref.shape[0] - 2)
    base = pl.multiple_of(rls_ref[r], LANE_ALIGN)
    n_chunks = (rls_ref[r + 1] - rls_ref[r] + chunk - 1) // chunk
    tile0 = r * tb_x
    A = _pixel_features(block_w, block_h)
    row_t, s0, s1, s2 = _row_selectors(out_ref.shape[0])
    windowed = tb_x > WINDOW_TILES
    if windowed:
        r_win = 3 * WINDOW_TILES
        row_tw, w0, w1, w2 = _row_selectors(r_win)

    def in_dma(slot, c):
        return pltpu.make_async_copy(
            data_ref.at[:, pl.ds(base + c * chunk, chunk)],
            buf.at[slot],
            sem.at[slot],
        )

    @pl.when(n_chunks > 0)
    def _start():
        in_dma(0, 0).start()

    out_ref[...] = jnp.zeros_like(out_ref)

    def body(c, carry):
        slot = jax.lax.rem(c, 2)

        @pl.when(c + 1 < n_chunks)
        def _prefetch():
            in_dma(1 - slot, c + 1).start()

        in_dma(slot, c).wait()
        d = buf[slot]
        _gx, _gy, _c1, _c2, _c3, _sig, _vis, _au, alpha, valid = _chunk_eval(
            d, A, block_w, block_h
        )
        w = jnp.where(valid, alpha, 0.0)  # [pix, C]

        def full_acc():
            _mask, rexp = _tile_mask_and_rgb(d, row_t, s0, s1, s2, tile0)
            # acc[(t, ch), p] += sum_k rexp[(t,ch), k] * w[p, k]  (MXU)
            out_ref[...] += _dot_split(rexp, w, ((1,), (1,)))

        if not windowed:
            full_acc()
            return carry

        anchor, span_ok = _window_anchor(d, tile0, tb_x)

        @pl.when(span_ok)
        def _windowed():
            _m, rexp = _tile_mask_and_rgb(
                d, row_tw, w0, w1, w2, tile0 + anchor
            )
            roff = pl.multiple_of(3 * anchor, 8)
            out_ref[pl.ds(roff, r_win), :] += _dot_split(rexp, w, ((1,), (1,)))

        @pl.when(jnp.logical_not(span_ok))
        def _full():
            full_acc()

        return carry

    jax.lax.fori_loop(0, n_chunks, body, 0)


def _row_selectors_cmajor(rows: int, cs: int, t0: int | jax.Array = 0):
    """[rows, 1] selectors for CHANNEL-MAJOR accumulator rows.

    Row (c * cs + t) holds channel c of tile (t0 + t); cs (the channel
    stride) is 8-aligned so per-channel dynamic-slice writes stay
    sublane-aligned. Rows with t >= tb_x (stride padding) never match a
    lane tile because real local tiles are < tb_x <= cs."""
    idx = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
    row_c = idx // cs
    row_t = idx % cs + t0
    s0 = (row_c == 0).astype(jnp.float32)
    s1 = (row_c == 1).astype(jnp.float32)
    s2 = (row_c == 2).astype(jnp.float32)
    return row_t, s0, s1, s2


def _forward_kernel_chw(
    row0_ref, rls_ref,  # scalar prefetch
    data_ref,  # [16, S] in ANY (HBM), manually chunk-DMA'd
    out_ref,  # VMEM block: [3, bh, W/128, 128] (aligned) or [3,1,bh,tb_x,bw]
    acc, buf, sem,  # scratch: [3*cs, pix] f32 acc, [2, 16, chunk], DMA sems
    *, tb_x: int, cs: int, block_w: int, block_h: int, aligned_out: bool,
    chunk: int = CHUNK,
):
    """Forward kernel with a direct planar-CHW output.

    Same streaming loop as `_forward_kernel`, but the accumulator is a
    CHANNEL-MAJOR VMEM scratch (row c*cs + t), and an epilogue relayouts it
    to the [3, block_h, tb_x, block_w] = (c, py, t, px) block whose HBM
    layout IS the planar image slab for this tile row. This deletes the
    XLA untile transpose (measured 1.06 ms at 1080p on v5e: its 64-byte
    pixel runs read HBM at ~1/20 bandwidth); the one lane-crossing
    relayout now happens per ROW in VMEM instead of per image in HBM.
    """
    s = pl.program_id(0)
    # clamp to the last rls interval: a partial tile-row shard of a
    # ragged-height image may span PAST the real grid (its row count is
    # padded to a multiple of the shard count — parallel/sharded.py); the
    # entry edge-pads rls by one entry, so clamped out-of-grid rows read a
    # zero-width interval (0 chunks) and emit a zero block.
    r = jnp.minimum(row0_ref[0] + s, rls_ref.shape[0] - 2)
    base = pl.multiple_of(rls_ref[r], LANE_ALIGN)
    n_chunks = (rls_ref[r + 1] - rls_ref[r] + chunk - 1) // chunk
    tile0 = r * tb_x
    A = _pixel_features(block_w, block_h)
    row_t, s0, s1, s2 = _row_selectors_cmajor(3 * cs, cs)
    windowed = tb_x > WINDOW_TILES

    def in_dma(slot, c):
        return pltpu.make_async_copy(
            data_ref.at[:, pl.ds(base + c * chunk, chunk)],
            buf.at[slot],
            sem.at[slot],
        )

    @pl.when(n_chunks > 0)
    def _start():
        in_dma(0, 0).start()

    acc[...] = jnp.zeros_like(acc)

    def body(c, carry):
        slot = jax.lax.rem(c, 2)

        @pl.when(c + 1 < n_chunks)
        def _prefetch():
            in_dma(1 - slot, c + 1).start()

        in_dma(slot, c).wait()
        d = buf[slot]
        _gx, _gy, _c1, _c2, _c3, _sig, _vis, _au, alpha, valid = _chunk_eval(
            d, A, block_w, block_h
        )
        w = jnp.where(valid, alpha, 0.0)  # [pix, C]

        def full_acc():
            _mask, rexp = _tile_mask_and_rgb(d, row_t, s0, s1, s2, tile0)
            acc[...] += _dot_split(rexp, w, ((1,), (1,)))

        if not windowed:
            full_acc()
            return carry

        anchor, span_ok = _window_anchor(d, tile0, tb_x)

        @pl.when(span_ok)
        def _windowed():
            rtw, w0, w1, w2 = _row_selectors_cmajor(
                3 * WINDOW_TILES, WINDOW_TILES, anchor
            )
            _m, rexp = _tile_mask_and_rgb(d, rtw, w0, w1, w2, tile0)
            res = _dot_split(rexp, w, ((1,), (1,)))  # [3*WT, pix] c-major
            for ch in range(3):
                off = pl.multiple_of(ch * cs + anchor, 8)
                acc[pl.ds(off, WINDOW_TILES), :] += res[
                    ch * WINDOW_TILES : (ch + 1) * WINDOW_TILES, :
                ]

        @pl.when(jnp.logical_not(span_ok))
        def _full():
            full_acc()

        return carry

    jax.lax.fori_loop(0, n_chunks, body, 0)

    if EPILOGUE_MODE == "none":  # profiling only: no output store
        return
    if EPILOGUE_MODE == "raw":  # profiling only: store without relayout
        s0 = acc[0:1, 0:1]
        out_ref[...] = s0[0, 0] + jnp.zeros(out_ref.shape, jnp.float32)
        return
    # epilogue: c-major rows -> (c, py, t, px). Only sublane-safe reshapes
    # plus two Mosaic 2D/3D transposes (validated exact on-chip).
    av = acc[...]
    if cs == tb_x:
        X = av
    else:
        X = jnp.concatenate(
            [av[ch * cs : ch * cs + tb_x, :] for ch in range(3)], axis=0
        )  # [3*tb_x, pix]
    if EPILOGUE_MODE == "mxu":
        # MXU identity-contraction transposes: bit-exact but MEASURED
        # SLOWER (1.48 vs 1.13 ms/frame at 1080p) — Mosaic only accepts
        # transposed-contraction matmuls with f32 operands, whose
        # multi-pass MXU emulation costs more than the VPU shuffle it
        # replaces; the bf16 form that would be fast is rejected ("Bad
        # lhs type", scripts/probe_mxu_transpose.py). Kept for evidence.
        T = _mxu_transpose(X)
        T3 = T.reshape(block_h, block_w, 3 * tb_x)
        T4 = _mxu_transpose_minor(T3)
        T5 = T4.reshape(block_h, 3, tb_x, block_w)
        P = jnp.transpose(T5, (1, 0, 2, 3))
    elif EPILOGUE_MODE == "hybrid":
        # VPU big transpose + MXU minor-16 transpose (the minor one is
        # the worse VPU op; its identity-matmul form is only ~1.5M MACs)
        T = X.T
        T3 = T.reshape(block_h, block_w, 3 * tb_x)
        T4 = _mxu_transpose_minor(T3)
        T5 = T4.reshape(block_h, 3, tb_x, block_w)
        P = jnp.transpose(T5, (1, 0, 2, 3))
    else:
        if COLOR_BF16:
            # fast mode: relayout in bf16 — half the vreg traffic through
            # the two transposes, ~2^-9 absolute rounding on clipped [0,1]
            # outputs (the same precision class as the mode's single-pass
            # color matmuls); stores cast back to the f32 output.
            X = X.astype(jnp.bfloat16)
        T = X.T  # [pix, 3*tb_x] rows (py, px)
        T3 = T.reshape(block_h, block_w, 3 * tb_x)
        T4 = jnp.transpose(T3, (0, 2, 1))  # [py, (c, t), px]
        T5 = T4.reshape(block_h, 3, tb_x, block_w)
        P = jnp.transpose(T5, (1, 0, 2, 3)).astype(jnp.float32)
    if not aligned_out:
        out_ref[...] = P[:, None]
        return
    # Aligned form [3, py, g, 128] where lane = a*block_w + px and
    # t = g*(128/bw) + a: Mosaic rejects the minor-dims merge as a shape
    # cast, but lane-OFFSET slice stores are supported — 128/bw stores
    # place the pieces. A full-lane minor dim makes the downstream
    # [3, H, W] reshape a dense copy instead of one reading 8x lane
    # padding (0.27 ms/frame at 1080p, profiled).
    per = 128 // block_w
    g = tb_x * block_w // 128
    P5 = P.reshape(3, block_h, g, per, block_w)
    for a in range(per):
        out_ref[:, :, :, a * block_w:(a + 1) * block_w] = P5[:, :, :, a, :]


def _backward_kernel(
    row0_ref, rls_ref,  # scalar prefetch
    data_ref,  # [16, S] ANY
    vout_ref,  # [R_OUT, pix] VMEM block: this tile row's image gradient
    vdata_ref,  # [16, S] ANY output, chunk-DMA'd back
    buf, vbuf, sem_in, sem_out,
    *, tb_x: int, block_w: int, block_h: int, chunk: int = CHUNK,
):
    s = pl.program_id(0)
    # clamp to the last rls interval: a partial tile-row shard of a
    # ragged-height image may span PAST the real grid (its row count is
    # padded to a multiple of the shard count — parallel/sharded.py); the
    # entry edge-pads rls by one entry, so clamped out-of-grid rows read a
    # zero-width interval (0 chunks) and emit a zero block.
    r = jnp.minimum(row0_ref[0] + s, rls_ref.shape[0] - 2)
    base = pl.multiple_of(rls_ref[r], LANE_ALIGN)
    n_chunks = (rls_ref[r + 1] - rls_ref[r] + chunk - 1) // chunk
    tile0 = r * tb_x
    A = _pixel_features(block_w, block_h)
    row_t, s0, s1, s2 = _row_selectors(vout_ref.shape[0])
    vout = vout_ref[...]
    windowed = tb_x > WINDOW_TILES
    if windowed:
        r_win = 3 * WINDOW_TILES
        row_tw, w0_, w1_, w2_ = _row_selectors(r_win)

    def in_dma(slot, c):
        return pltpu.make_async_copy(
            data_ref.at[:, pl.ds(base + c * chunk, chunk)],
            buf.at[slot],
            sem_in.at[slot],
        )

    def out_dma(slot, c):
        return pltpu.make_async_copy(
            vbuf.at[slot],
            vdata_ref.at[:, pl.ds(base + c * chunk, chunk)],
            sem_out.at[slot],
        )

    @pl.when(n_chunks > 0)
    def _start():
        in_dma(0, 0).start()

    def body(c, carry):
        slot = jax.lax.rem(c, 2)

        @pl.when(c + 1 < n_chunks)
        def _prefetch():
            in_dma(1 - slot, c + 1).start()

        in_dma(slot, c).wait()
        # the vbuf slot must be free before overwriting (its DMA from two
        # chunks ago has to have drained)
        @pl.when(c >= 2)
        def _drain():
            out_dma(slot, c - 2).wait()

        d = buf[slot]
        gx, gy, c1, c2, c3, sigma, vis, alpha_u, alpha, valid = _chunk_eval(
            d, A, block_w, block_h
        )
        w = jnp.where(valid, alpha, 0.0)

        def grad_math(vout_x, row_tx, sx0, sx1, sx2, t0):
            mask, rexp = _tile_mask_and_rgb(d, row_tx, sx0, sx1, sx2, t0)
            # v_alpha[p, k] = sum_ch rgb[ch, k] * v_out_{tile(k)}[ch, p]
            # (backward.cu:826-829), via the tile-blocked matmul.
            v_alpha = jnp.where(
                valid, _dot_split(vout_x, rexp, ((0,), (0,))), 0.0
            )  # [pix, C]
            v_sigma = -alpha_u * v_alpha  # min(1,.) clamp is forward-only
            vB = _dot_exact_a(
                A.astype(jnp.bfloat16), v_sigma, ((0,), (0,))
            )  # [6, C] MXU
            vB3, vB4, vB5 = vB[3:4, :], vB[4:5, :], vB[5:6, :]
            v_c1 = 0.5 * (vB[0:1, :] + gx * (gx * vB5 - 2.0 * vB3))
            v_c3 = 0.5 * (vB[1:2, :] + gy * (gy * vB5 - 2.0 * vB4))
            v_c2 = vB[2:3, :] - gy * vB3 - gx * vB4 + gx * gy * vB5
            v_x = -c1 * vB3 - c2 * vB4 + (c1 * gx + c2 * gy) * vB5
            v_y = -c2 * vB3 - c3 * vB4 + (c3 * gy + c2 * gx) * vB5
            v_opac = jnp.sum(vis * v_alpha, axis=0, keepdims=True)  # [1, C]
            # M[(t, ch), k] = sum_p vout[(t,ch), p] * w[p, k]; lane k keeps
            # only its own tile's rows -> mask, fold rows by one-hots.
            M = jnp.where(mask, _dot_split(vout_x, w, ((1,), (0,))), 0.0)
            v_r = jnp.sum(M * sx0, axis=0, keepdims=True)
            v_g = jnp.sum(M * sx1, axis=0, keepdims=True)
            v_b = jnp.sum(M * sx2, axis=0, keepdims=True)
            pad = jnp.zeros((DATA_ROWS - 9, chunk), jnp.float32)
            vbuf[slot] = jnp.concatenate(
                [v_x, v_y, v_c1, v_c2, v_c3, v_opac, v_r, v_g, v_b, pad],
                axis=0,
            )

        if not windowed:
            grad_math(vout, row_t, s0, s1, s2, tile0)
        else:
            anchor, span_ok = _window_anchor(d, tile0, tb_x)

            @pl.when(span_ok)
            def _windowed():
                roff = pl.multiple_of(3 * anchor, 8)
                grad_math(
                    vout_ref[pl.ds(roff, r_win), :],
                    row_tw, w0_, w1_, w2_, tile0 + anchor,
                )

            @pl.when(jnp.logical_not(span_ok))
            def _full():
                grad_math(vout, row_t, s0, s1, s2, tile0)

        out_dma(slot, c).start()
        return carry

    jax.lax.fori_loop(0, n_chunks, body, 0)

    @pl.when(n_chunks >= 1)
    def _final1():
        out_dma(jax.lax.rem(n_chunks - 1, 2), n_chunks - 1).wait()

    @pl.when(n_chunks >= 2)
    def _final2():
        out_dma(jax.lax.rem(n_chunks - 2, 2), n_chunks - 2).wait()


def _rows_to_image_chw(out, num_rows, tb_x, block_w, block_h, img_h, img_w):
    """[num_rows * R_OUT, pix] row blocks -> [3, img_h, img_w] planar image.

    The planar untile keeps the block_w-wide pixel runs contiguous (the
    HWC untile's minor dim is 3, which XLA transposes ~70x off bandwidth);
    CHW is also the reference model's native output layout
    (GaussianSplats_Represent.py forward returns [1, 3, H, W])."""
    r_out = out.shape[0] // num_rows
    pix = block_w * block_h
    t = out.reshape(num_rows, r_out, pix)[:, : 3 * tb_x, :]
    t = t.reshape(num_rows, tb_x, 3, block_h, block_w)
    img = t.transpose(2, 0, 3, 1, 4).reshape(
        3, num_rows * block_h, tb_x * block_w
    )
    return img[:, :img_h, :img_w]


def _chw_to_vrows(g, num_rows, r_out, tb_x, block_w, block_h):
    """[3, h, w] grad -> [num_rows * R_OUT, pix] tile-row blocks."""
    h_pad = num_rows * block_h - g.shape[1]
    w_pad = tb_x * block_w - g.shape[2]
    gp = jnp.pad(g, ((0, 0), (0, h_pad), (0, w_pad)))
    gp = gp.reshape(3, num_rows, block_h, tb_x, block_w)
    gp = gp.transpose(1, 3, 0, 2, 4).reshape(
        num_rows, 3 * tb_x, block_h * block_w
    )
    gp = jnp.pad(gp, ((0, 0), (0, r_out - 3 * tb_x), (0, 0)))
    return gp.reshape(num_rows * r_out, block_h * block_w)


def _rows_to_image(out, num_rows, tb_x, block_w, block_h, img_h, img_w):
    """[num_rows * R_OUT, pix] row blocks -> [img_h, img_w, 3] image."""
    r_out = out.shape[0] // num_rows
    pix = block_w * block_h
    t = out.reshape(num_rows, r_out, pix)[:, : 3 * tb_x, :]
    t = t.reshape(num_rows, tb_x, 3, block_h, block_w)
    img = t.transpose(0, 3, 1, 4, 2).reshape(
        num_rows * block_h, tb_x * block_w, 3
    )
    return img[:img_h, :img_w, :]


def _image_to_vrows(g, num_rows, r_out, tb_x, block_w, block_h):
    """[h, w, 3] grad -> [num_rows * R_OUT, pix] tile-row blocks."""
    h_pad = num_rows * block_h - g.shape[0]
    w_pad = tb_x * block_w - g.shape[1]
    gp = jnp.pad(g, ((0, h_pad), (0, w_pad), (0, 0)))
    gp = gp.reshape(num_rows, block_h, tb_x, block_w, 3)
    gp = gp.transpose(0, 2, 4, 1, 3).reshape(
        num_rows, 3 * tb_x, block_h * block_w
    )
    gp = jnp.pad(gp, ((0, 0), (0, r_out - 3 * tb_x), (0, 0)))
    return gp.reshape(num_rows * r_out, block_h * block_w)


def rasterize_pallas(
    binned: BinnedSplats,
    xys: jax.Array,
    conics: jax.Array,
    colors: jax.Array,
    opacity: jax.Array,
    img_height: int,
    img_width: int,
    tile_bounds: Tuple[int, int, int],
    block_w: int = 16,
    block_h: int = 16,
    cap: int = 256,
    tile_rows=None,
    layout: str = "image",
) -> jax.Array:
    """Render with the Pallas TPU kernel. Differentiable w.r.t. xys,
    conics, colors, opacity (reference backward semantics).

    tile_rows: optional (row_offset (traced ok), num_rows (static)) — render
    only that tile-row span in global coordinates (image sharding).

    layout: "image" -> [H, W, 3]; "chw" -> [3, H, W] planar (the untile
    transpose keeps 16-wide pixel runs contiguous instead of minor-dim-3 —
    much faster on TPU — and matches the reference model's native output);
    "rows" -> the kernel's native [num_rows * round8(3*tb_x),
    block_h*block_w] tile-row blocks (row (t, c) of a block holds channel
    c of tile t; see _rows_to_image). Training losses that reduce
    pointwise (L1/L2) can consume "rows" directly and skip the untile
    transpose forward AND backward (~1.4 ms/step at 1080p on v5e)."""
    tb_y = int(tile_bounds[1])
    if tile_rows is None:
        row0, num_rows = jnp.int32(0), tb_y
    else:
        row0, num_rows = jnp.asarray(tile_rows[0], jnp.int32), int(tile_rows[1])
    return _rasterize_pallas_vjp(
        binned, xys, conics, colors, opacity, row0,
        img_height, img_width, tile_bounds, block_w, block_h, cap, num_rows,
        layout,
    )


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10, 11, 12, 13)
)
def _rasterize_pallas_vjp(
    binned, xys, conics, colors, opacity, row0,
    img_height, img_width, tile_bounds, block_w, block_h, cap, num_rows,
    layout,
):
    out, _ = _forward_impl(
        binned, xys, conics, colors, opacity, row0,
        img_height, img_width, tile_bounds, block_w, block_h, cap, num_rows,
        layout,
    )
    return out


def _forward_impl(
    binned, xys, conics, colors, opacity, row0,
    img_height, img_width, tile_bounds, block_w, block_h, cap, num_rows,
    layout,
):
    tb_x = int(tile_bounds[0])
    pix = block_w * block_h
    r_out = _round8(3 * tb_x)
    data = _pack_lanes(
        binned, xys, conics, colors, opacity, tb_x, block_w, block_h
    )  # [16, S]
    data = jax.lax.optimization_barrier(data)
    partial_shard = num_rows != int(tile_bounds[1])
    out_h = num_rows * block_h if partial_shard else img_height
    rls = _rls_for_span(binned.row_lane_start, partial_shard)
    chunk = _pick_chunk(
        data.shape[1], tb_x * int(tile_bounds[1])
    )

    if layout == "chw":
        # direct planar output from the kernel — no XLA untile transpose
        cs = _round8(tb_x)
        aligned = (tb_x * block_w) % 128 == 0 and block_w <= 128
        kernel = functools.partial(
            _forward_kernel_chw, tb_x=tb_x, cs=cs,
            block_w=block_w, block_h=block_h, aligned_out=aligned,
            chunk=chunk,
        )
        if aligned:
            # full-128-lane minor dim: the downstream reshape to [3,H,W]
            # is a dense copy (the 5D px=16-minor form stores 8x lane
            # padding, making it a 0.27 ms sparse copy — profiled)
            g = tb_x * block_w // 128
            out_spec = pl.BlockSpec(
                (3, block_h, g, 128), lambda s, r0, rls: (0, s, 0, 0),
                memory_space=pltpu.VMEM,
            )
            out_shape = jax.ShapeDtypeStruct(
                (3, num_rows * block_h, g, 128), jnp.float32
            )
        else:
            out_spec = pl.BlockSpec(
                (3, 1, block_h, tb_x, block_w),
                lambda s, r0, rls: (0, s, 0, 0, 0),
                memory_space=pltpu.VMEM,
            )
            out_shape = jax.ShapeDtypeStruct(
                (3, num_rows, block_h, tb_x, block_w), jnp.float32
            )
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(num_rows,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=out_spec,
            scratch_shapes=[
                pltpu.VMEM((3 * cs, pix), jnp.float32),
                pltpu.VMEM((2, DATA_ROWS, chunk), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )
        out = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=out_shape,
            interpret=INTERPRET,
        )(row0.reshape(1), rls, data)
        img = out.reshape(3, num_rows * block_h, tb_x * block_w)[
            :, :out_h, :img_width
        ]
        return img, data

    kernel = functools.partial(
        _forward_kernel, tb_x=tb_x, block_w=block_w, block_h=block_h,
        chunk=chunk,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_rows,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (r_out, pix), lambda s, r0, rls: (s, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, DATA_ROWS, chunk), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_rows * r_out, pix), jnp.float32),
        interpret=INTERPRET,
    )(row0.reshape(1), rls, data)

    if layout == "rows":
        return out, data
    img = _rows_to_image(out, num_rows, tb_x, block_w, block_h, out_h, img_width)
    return img, data


def _rasterize_fwd(
    binned, xys, conics, colors, opacity, row0,
    img_height, img_width, tile_bounds, block_w, block_h, cap, num_rows,
    layout,
):
    img, data = _forward_impl(
        binned, xys, conics, colors, opacity, row0,
        img_height, img_width, tile_bounds, block_w, block_h, cap, num_rows,
        layout,
    )
    return img, (binned, data, xys.shape[0], row0)


def _rasterize_bwd(
    img_height, img_width, tile_bounds, block_w, block_h, cap, num_rows,
    layout, residuals, g,
):
    binned, data, n, row0 = residuals
    tb_x = int(tile_bounds[0])
    pix = block_w * block_h
    r_out = _round8(3 * tb_x)
    rls = _rls_for_span(
        binned.row_lane_start, num_rows != int(tile_bounds[1])
    )
    if layout == "rows":
        vrows = g  # already in the kernel's native tile-row block layout
    elif layout == "chw":
        vrows = _chw_to_vrows(g, num_rows, r_out, tb_x, block_w, block_h)
    else:
        vrows = _image_to_vrows(g, num_rows, r_out, tb_x, block_w, block_h)

    chunk = _pick_chunk(data.shape[1], tb_x * int(tile_bounds[1]))
    kernel = functools.partial(
        _backward_kernel, tb_x=tb_x, block_w=block_w, block_h=block_h,
        chunk=chunk,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_rows,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(
                (r_out, pix), lambda s, r0, rls: (s, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, DATA_ROWS, chunk), jnp.float32),
            pltpu.VMEM((2, DATA_ROWS, chunk), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    vdata = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(data.shape, jnp.float32),
        interpret=INTERPRET,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(row0.reshape(1), rls, data, vrows)

    v_xys, v_conics, v_colors, v_opacity = _reduce_lane_grads(
        vdata, binned, n, row0, num_rows, data, tb_x
    )
    zero_binned = jax.tree.map(_zero_cotangent, binned)
    return (zero_binned, v_xys, v_conics, v_colors, v_opacity,
            _zero_cotangent(row0))


def _reduce_lane_grads(vdata, binned, n, row0, num_rows, data=None, tb_x=None):
    """Per-lane [16, S] grads -> per-splat grads (xys, conics, colors, opac).

    vdata is an uninitialized HBM output and the kernel only writes lanes
    of rows [row0, row0 + num_rows), so when this shard renders a partial
    tile-row span (parallel/sharded.py) every lane outside the span is
    masked out before reducing.

    Fast path (raw sorted keys available): jax.ops.segment_sum lowers to a
    serial scatter-add on TPU (~7 cycles/update — 1.4 ms at S=178k, nearly
    half the train step), so the reduction instead
    1. recovers each lane's EXPANSION SLOT elementwise (per-gaussian slot
       spans are contiguous: slot = gauss_slot_start[g] + row-major rank of
       the lane's tile inside g's bbox, from data rows 12-13);
    2. inverts the lane->slot permutation with TWO single-u32 sorts of
       (slot << 14 | lane_lo14) and (slot << 14 | lane_hi) — real slots are
       unique and dense in [0, total_kept), so sorted position == slot and
       the halves recombine to lane-of-slot (a (key, value) pair sort
       would do this in one pass, but lax.sort with a payload operand
       compiles pathologically on the current toolchain);
    3. gathers vdata into slot order and runs one sequential-Pallas
       segmented cumsum (fill_pallas.segmented_cumsum); each gaussian's
       total sits at its span's last slot.
    Beyond-cap and pad lanes carry zero grads (opacity-masked in
    _pack_lanes) and slot 2^18-1, past every real slot. Deterministic: all
    sort keys of real lanes are unique, and the scan order is fixed.
    """
    ids = binned.sorted_gauss_ids
    s_cap = ids.shape[0]
    lane = jnp.arange(s_cap, dtype=jnp.int32)
    lo = binned.row_lane_start[row0]
    hi = binned.row_lane_start[row0 + num_rows]
    span = (lane >= lo) & (lane < hi)

    # Slot/lane bit budget for the two-sort permutation inversion: slots
    # and lanes both live in [0, s_cap], packed as (slot << B | lane_part)
    # in u32, lane split across the two sorts as B low + (slot_bits - B)
    # high bits. Feasible iff slot_bits <= 2 * (32 - slot_bits), i.e.
    # s_cap < 2^21 (~2M lanes — factor-32 budgets at 50k splats).
    slot_bits = max(int(s_cap).bit_length(), 15)
    lane_b = 32 - slot_bits
    fast = (
        binned.sorted_keys is not None
        and data is not None
        and tb_x is not None
        and slot_bits <= 2 * lane_b
    )
    if binned.sorted_keys is not None and not fast:
        # static condition -> warn once at trace time, not silently: the
        # serial segment_sum fallback costs ~1.4 ms at S=178k on v5e
        import warnings

        warnings.warn(
            f"rasterize backward: lane capacity S={s_cap} exceeds the "
            "2^21 slot-packing limit of the sort-based gradient "
            "reduction; falling back to the serial segment_sum path "
            "(slow). Lower max_intersects below ~2M lanes to restore "
            "the fast path.",
            stacklevel=2,
        )
    if not fast:
        ids = jnp.where(span, ids, n)
        seg = jax.ops.segment_sum(vdata.T, ids, num_segments=n + 1)[:n]
        return seg[:, 0:2], seg[:, 2:5], seg[:, 6:9], seg[:, 5:6]

    key = binned.sorted_keys  # [S] u32 (tile << 16 | gauss), pre-cap
    g = (key & jnp.uint32(0xFFFF)).astype(jnp.int32)
    tile = (key >> 16).astype(jnp.int32)
    # Raw-key realness is REQUIRED here (not the capped ids): beyond-cap
    # lanes must occupy their real expansion slot — with exactly-zero
    # grads, since _pack_lanes zeroed their opacity and alpha = 0 fell
    # below the 1/255 cutoff in both passes — or real slots stop being
    # DENSE in [0, total_kept) and every slot after the first hole shifts,
    # corrupting the sorted-position == slot permutation inversion. (The
    # matching invariant: _pack_lanes gathers rows 12-13 with the RAW ids
    # so capped lanes carry their real gaussian's bbox/slot data.)
    real = g < n
    bbox = data[12, :].astype(jnp.int32)  # (bw << 16 | ty0 << 8 | tx0)
    gss = data[13, :].astype(jnp.int32)
    bw = bbox >> 16
    ty0 = (bbox >> 8) & 0xFF
    tx0 = bbox & 0xFF
    ty = tile // tb_x
    tx = tile - ty * tb_x
    j = (ty - ty0) * bw + (tx - tx0)
    slot = jnp.where(real, gss + j, (1 << slot_bits) - 1).astype(jnp.uint32)

    lane_u = lane.astype(jnp.uint32)
    lo_mask = jnp.uint32((1 << lane_b) - 1)
    c1 = (slot << lane_b) | (lane_u & lo_mask)
    c2 = (slot << lane_b) | (lane_u >> lane_b)
    s1 = jax.lax.sort(c1, is_stable=False)
    s2 = jax.lax.sort(c2, is_stable=False)
    lane_of = (
        ((s2 & lo_mask) << lane_b) | (s1 & lo_mask)
    ).astype(jnp.int32)

    vmask = jnp.where(span, 1.0, 0.0)
    # only rows 0-8 carry gradients (x y c1 c2 c3 opac r g b); dropping
    # the pad rows cuts the gather + segmented-scan traffic by 44%.
    # Row 9 is the lane's raw gaussian id (exact in f32: id < 2^16),
    # riding the SAME multi-row f32 gather — a standalone s32 g[lane_of]
    # gather lowered to a serial emitter costing 0.71 ms at S=107k
    # (xplane-profiled), 5x the whole 10-row vector gather.
    gf = g.astype(jnp.float32).reshape(1, -1)
    vg10 = jnp.concatenate(
        [vdata[:9] * vmask[None, :], gf], axis=0
    )[:, lane_of]  # [10, S] slot order
    vg = vg10[:9]

    from gsvc_tpu.ops.fill_pallas import segmented_cumsum

    gss_all = binned.gauss_slot_start  # [N+1]
    # Segment-start flags WITHOUT a scatter (an S-capacity scatter of N
    # ones cost 0.089 ms at 10k splats, ~5x that at 50k): slot p's owning
    # gaussian is row 9 of the gathered block — slots are gauss-major, so
    # non-empty segments start exactly where the owner changes. Tail
    # positions (sentinel lanes) are garbage but the per-gaussian totals
    # are read at in-range `ends` only, as before.
    g_slot = vg10[9]  # f32 gaussian id of slot p (exact)
    flags = jnp.concatenate(
        [
            jnp.ones(1, jnp.int32),
            (g_slot[1:] != g_slot[:-1]).astype(jnp.int32),
        ]
    )
    seg = segmented_cumsum(vg, flags)  # [9, S] inclusive within segments
    ends = jnp.maximum(gss_all[1:] - 1, 0)  # [N]
    width = (gss_all[1:] - gss_all[:-1]) > 0
    tot = jnp.where(width[None, :], seg[:, ends], 0.0).T  # [N, 9]
    return tot[:, 0:2], tot[:, 2:5], tot[:, 6:9], tot[:, 5:6]


_rasterize_pallas_vjp.defvjp(_rasterize_fwd, _rasterize_bwd)
