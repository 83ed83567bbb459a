"""Pallas TPU kernels for the differentiable sum-rasterizer.

TPU-native replacement for the reference CUDA hot kernels
`rasterize_forward_sum` (gsplat/gsplat/cuda/csrc/forward.cu:512-627) and
`rasterize_backward_sum_kernel` (backward.cu:696-862).

Design (see SURVEY.md §7.1):
- The render is an order-independent accumulation, so each tile needs only
  its *member* splats, already grouped contiguously by the CSR binning
  (ops/binning.py). Per-splat data is gathered once into intersection order
  and stored param-major (`data_s[16, I_pad]`, one row per packed channel:
  x, y, c1, c2, c3, opac, r, g, b). Each tile's working set is a contiguous
  lane range; the kernel DMAs 128-lane-aligned windows covering it from HBM
  into VMEM — the TPU analog of the CUDA kernel's cooperative shared-memory
  staging (forward.cu:561-586). Window alignment satisfies Mosaic's
  lane-tiling constraint without padding the CSR itself; out-of-bin lanes
  are masked.
- Geometry: one grid step per 16x16 tile. Each 128-splat window evaluates
  against all 256 tile pixels as [256, 128] VPU ops (pixels on sublanes,
  splats on lanes); color accumulation and the backward v_alpha/v_rgb terms
  are MXU matmuls against the [3, 256] channel block.
- Backward is atomics-free (vs. backward.cu:843-858's atomicAdd) and also
  DMA-wait-free: the grid iterates over (tile, window) *jobs* — one job per
  128-lane window a tile's bin touches, built host-free from the CSR by
  vector ops (`_build_jobs`). Job tables are scalar-prefetched and drive the
  Block index maps, so the splat-data window, the tile's image-gradient
  block, and the output-gradient window are all block-pipelined by Pallas.
  Jobs hitting the same output window are consecutive (bins are sorted by
  tile), so window grads accumulate in VMEM via output-block revisiting and
  are written back exactly once. A segment_sum over gaussian ids then
  reduces intersection grads to per-splat grads outside the kernel.
  Deterministic by construction. (A first version instead did blocking
  read-modify-write DMAs per tile, which cost ~3 us of DMA latency per tile
  — 24 ms at 1080p vs 0.1 ms forward; the job grid removes every in-kernel
  DMA wait.)
- The per-tile cap (first 256 binned splats, forward.cu:613) falls out of
  clamping the processed lane count.

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

from gsvc_tpu.ops.binning import BinnedSplats
from gsvc_tpu.ops.rasterize_dense import ALPHA_CUTOFF

WINDOW = 128  # splat lanes per DMA window (lane-tiling aligned)
DATA_ROWS = 16  # packed channels: x, y, c1, c2, c3, opac, r, g, b, pad...

# Run kernels in the Pallas interpreter (for CPU tests). Toggled by tests.
INTERPRET = False


def _zero_cotangent(x):
    if jnp.issubdtype(x.dtype, jnp.integer) or x.dtype == jnp.bool_:
        return np.zeros(x.shape, dtype=jax.dtypes.float0)
    return jnp.zeros_like(x)


def _pack_intersections(
    binned: BinnedSplats,
    xys: jax.Array,
    conics: jax.Array,
    colors: jax.Array,
    opacity: jax.Array,
    cap: int,
) -> jax.Array:
    """Gather per-splat params into sorted intersection order, [16, I_pad].

    Row layout: 0:x 1:y 2:c1 3:c2 4:c3 5:opac 6:r 7:g 8:b (rest zero).
    Sentinel ids (== N) gather a zero row, whose opac=0 keeps it below the
    alpha cutoff. Lanes are padded so the last tile's aligned windows stay
    in bounds.
    """
    ids = binned.sorted_gauss_ids
    zrow = lambda a: jnp.concatenate([a, jnp.zeros((1,) + a.shape[1:], a.dtype)])
    rows = jnp.concatenate(
        [
            zrow(xys)[ids],
            zrow(conics)[ids],
            zrow(opacity.reshape(-1, 1))[ids],
            zrow(colors)[ids],
        ],
        axis=1,
    )  # [I, 9]
    pad_lanes = cap + 2 * WINDOW
    rows = jnp.pad(rows, ((0, pad_lanes), (0, DATA_ROWS - rows.shape[1])))
    return rows.T  # [16, I_pad]


def _tile_pixel_coords(t, tb_x, block_w, block_h):
    pix = block_w * block_h
    tile_x = (t % tb_x).astype(jnp.float32)
    tile_y = (t // tb_x).astype(jnp.float32)
    p = jax.lax.broadcasted_iota(jnp.int32, (pix, 1), 0)
    px = tile_x * block_w + (p % block_w).astype(jnp.float32)  # [pix, 1]
    py = tile_y * block_h + (p // block_w).astype(jnp.float32)
    return px, py


def _window_geometry(starts_ref, counts_ref, t, cap):
    start = starts_ref[t]
    count = jnp.minimum(counts_ref[t], cap)
    wstart = (start // WINDOW) * WINDOW
    nwin = (start - wstart + count + WINDOW - 1) // WINDOW
    return start, count, wstart, nwin


def _load_window(data_ref, buf, sem, wstart, c):
    dma = pltpu.make_async_copy(
        data_ref.at[:, pl.ds(pl.multiple_of(wstart + c * WINDOW, WINDOW), WINDOW)],
        buf,
        sem,
    )
    dma.start()
    dma.wait()


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


def _splat_features(buf, ox, oy):
    """B[6, WINDOW]: per-splat quadratic coefficients in tile-local coords.

    sigma[p, k] = A[p] . B[k] with A from `_pixel_features`:
      sigma = 0.5*c1*(gx-px)^2 + 0.5*c3*(gy-py)^2 + c2*(gx-px)*(gy-py)
    expanded around the tile origin (ox, oy). Turns the per-pixel-per-splat
    quadratic into one MXU matmul instead of ~10 VPU ops on [pix, WINDOW].
    """
    gx = buf[0:1, :] - ox
    gy = buf[1:2, :] - oy
    c1 = buf[2:3, :]
    c2 = buf[3:4, :]
    c3 = buf[4:5, :]
    b3 = -(c1 * gx + c2 * gy)
    b4 = -(c3 * gy + c2 * gx)
    b5 = -0.5 * (b3 * gx + b4 * gy)  # = 0.5*c1*gx^2 + 0.5*c3*gy^2 + c2*gx*gy
    return gx, gy, c1, c2, c3, jnp.concatenate(
        [0.5 * c1, 0.5 * c3, c2, b3, b4, b5], axis=0
    )


_HIGHEST = jax.lax.Precision.HIGHEST


def _dot(a, b, dims):
    return jax.lax.dot_general(
        a, b, dimension_numbers=(dims, ((), ())),
        preferred_element_type=jnp.float32, precision=_HIGHEST,
    )


def _window_mask(sigma, alpha, start, count, wstart, c):
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, WINDOW), 1)
    idx = wstart + c * WINDOW + lane
    in_bin = (idx >= start) & (idx < start + count)
    return (sigma >= 0.0) & (alpha >= ALPHA_CUTOFF) & in_bin


def _forward_kernel(
    tile0_ref, starts_ref, counts_ref,  # scalar prefetch [1], [T], [T]
    data_ref,  # [16, I_pad] HBM
    out_ref,  # [1, 8, pix] VMEM block
    buf, sem,  # scratch
    *, tb_x: int, block_w: int, block_h: int, cap: int,
):
    t = pl.program_id(0) + tile0_ref[0]
    start, count, wstart, nwin = _window_geometry(starts_ref, counts_ref, t, cap)
    ox = ((t % tb_x) * block_w).astype(jnp.float32)
    oy = ((t // tb_x) * block_h).astype(jnp.float32)
    pix = block_w * block_h
    A = _pixel_features(block_w, block_h)  # [pix, 6]

    def body(c, acc):
        _load_window(data_ref, buf, sem, wstart, c)
        d = buf[...]
        _gx, _gy, _c1, _c2, _c3, B = _splat_features(d, ox, oy)
        sigma = _dot(A, B, ((1,), (0,)))  # [pix, WINDOW] MXU
        alpha = jnp.minimum(1.0, d[5:6, :] * jnp.exp(-sigma))
        valid = _window_mask(sigma, alpha, start, count, wstart, c)
        w = jnp.where(valid, alpha, 0.0)  # [pix, WINDOW]
        rgb = d[6:9, :]  # [3, WINDOW]
        # acc[c, p] += sum_k rgb[c, k] * w[p, k]  (MXU)
        return acc + _dot(rgb, w, ((1,), (1,)))

    acc = jax.lax.fori_loop(0, nwin, body, jnp.zeros((3, pix), jnp.float32))
    out_ref[0, 0:3, :] = acc
    out_ref[0, 3:8, :] = jnp.zeros((5, pix), jnp.float32)


def _build_jobs(starts, counts, cap: int, n_windows: int, num_jobs: int):
    """Expand the local CSR into a static job table, one job per (tile,
    128-lane window) incidence, ordered by tile (=> windows nondecreasing).

    All vector ops, no host sync. Padded jobs (j >= total) get count 0 and a
    window clamped into the sentinel tail, so they accumulate nothing.

    Returns int32 arrays [num_jobs]: tile (local index), window, first (1 on
    the first job of each distinct window), jstart, jcount (global lane range
    of the owning tile's bin, cap applied).
    """
    t_local = starts.shape[0]
    count_c = jnp.minimum(counts, cap)
    has = count_c > 0
    ws = starts // WINDOW
    we = (starts + count_c - 1) // WINDOW
    njobs = jnp.where(has, we - ws + 1, 0)
    off = jnp.cumsum(njobs) - njobs  # exclusive job offset per tile
    total = jnp.sum(njobs)

    j = jnp.arange(num_jobs, dtype=jnp.int32)
    tid = jnp.arange(t_local, dtype=jnp.int32)
    # scatter each tile's index at its first job slot, forward-fill (cummax)
    seed = (
        jnp.full(num_jobs, -1, jnp.int32)
        .at[jnp.where(has, off, num_jobs)]
        .max(tid, mode="drop")
    )
    tile = jax.lax.cummax(seed)
    joff = jax.lax.cummax(jnp.where(seed >= 0, j, -1))
    tile_safe = jnp.maximum(tile, 0)
    live = (j < total) & (tile >= 0)
    window = jnp.clip(ws[tile_safe] + (j - joff), 0, n_windows - 1)
    first = jnp.concatenate(
        [jnp.ones(1, jnp.int32), (window[1:] != window[:-1]).astype(jnp.int32)]
    )
    jstart = starts[tile_safe]
    jcount = jnp.where(live, count_c[tile_safe], 0)
    return tile_safe, window, first, jstart, jcount


def _backward_kernel(
    tile0_ref, tileof_ref, windowof_ref, first_ref, jstart_ref, jcount_ref,
    data_ref,  # [16, WINDOW] block: splat data of this job's window
    vout_ref,  # [1, 8, pix] block: d(loss)/d(out) of this job's tile
    zeros_ref,  # aliased zero-init of the output (unvisited windows stay 0)
    vdata_ref,  # [16, WINDOW] block: grads of this window (revisit-accumulated)
    *, tb_x: int, block_w: int, block_h: int, cap: int,
):
    del zeros_ref
    j = pl.program_id(0)
    t = tileof_ref[j] + tile0_ref[0]
    start, count = jstart_ref[j], jcount_ref[j]
    wstart = windowof_ref[j] * WINDOW
    ox = ((t % tb_x) * block_w).astype(jnp.float32)
    oy = ((t // tb_x) * block_h).astype(jnp.float32)
    A = _pixel_features(block_w, block_h)  # [pix, 6]
    v_out = vout_ref[0, 0:3, :]  # [3, pix]

    d = data_ref[...]
    gx, gy, c1, c2, c3, B = _splat_features(d, ox, oy)
    sigma = _dot(A, B, ((1,), (0,)))  # [pix, WINDOW] MXU
    vis = jnp.exp(-sigma)
    alpha_u = d[5:6, :] * vis
    alpha = jnp.minimum(1.0, alpha_u)
    valid = _window_mask(sigma, alpha, start, count, wstart, 0)
    rgb = d[6:9, :]
    # v_alpha[p, k] = sum_c rgb[c, k] * v_out[c, p]  (backward.cu:826-829)
    v_alpha = jnp.where(
        valid, _dot(v_out, rgb, ((0,), (0,))), 0.0
    )  # [pix, WINDOW]
    v_sigma = -alpha_u * v_alpha  # min(1,.) clamp is forward-only
    # v_B[j, k] = sum_p A[p, j] * v_sigma[p, k]  (MXU), then chain back
    # to the raw per-splat params elementwise on [1, WINDOW].
    vB = _dot(A, v_sigma, ((0,), (0,)))  # [6, WINDOW]
    vB0, vB1, vB2 = vB[0:1, :], vB[1:2, :], vB[2:3, :]
    vB3, vB4, vB5 = vB[3:4, :], vB[4:5, :], vB[5:6, :]
    v_c1 = 0.5 * (vB0 + gx * (gx * vB5 - 2.0 * vB3))
    v_c3 = 0.5 * (vB1 + gy * (gy * vB5 - 2.0 * vB4))
    v_c2 = vB2 - gy * vB3 - gx * vB4 + gx * gy * vB5
    v_x = -c1 * vB3 - c2 * vB4 + (c1 * gx + c2 * gy) * vB5
    v_y = -c2 * vB3 - c3 * vB4 + (c3 * gy + c2 * gx) * vB5
    v_opac = jnp.sum(vis * v_alpha, axis=0, keepdims=True)
    w = jnp.where(valid, alpha, 0.0)
    # v_rgb[c, k] = sum_p v_out[c, p] * w[p, k]  (MXU)
    v_rgb = _dot(v_out, w, ((1,), (0,)))  # [3, WINDOW]
    pad = jnp.zeros((DATA_ROWS - 9, WINDOW), jnp.float32)
    grads = jnp.concatenate(
        [v_x, v_y, v_c1, v_c2, v_c3, v_opac, v_rgb, pad], axis=0
    )  # [16, WINDOW]

    # Jobs sharing a window are consecutive: the first initializes the VMEM
    # block, the rest accumulate; Pallas writes it back once on index change.
    @pl.when(first_ref[j] == 1)
    def _init():
        vdata_ref[...] = grads

    @pl.when(first_ref[j] == 0)
    def _acc():
        vdata_ref[...] += grads


def _tiles_to_image(out_tiles, img_height, img_width, tb_x, tb_y, block_w, block_h):
    img = out_tiles[:, 0:3, :].reshape(tb_y, tb_x, 3, block_h, block_w)
    img = img.transpose(2, 0, 3, 1, 4).reshape(3, tb_y * block_h, tb_x * block_w)
    return img[:, :img_height, :img_width].transpose(1, 2, 0)


def _image_to_vtiles(g, tb_x, tb_y, block_w, block_h):
    h_pad = tb_y * block_h - g.shape[0]
    w_pad = tb_x * block_w - g.shape[1]
    gp = jnp.pad(g, ((0, h_pad), (0, w_pad), (0, 0))).transpose(2, 0, 1)
    gp = gp.reshape(3, tb_y, block_h, tb_x, block_w).transpose(1, 3, 0, 2, 4)
    gp = gp.reshape(tb_y * tb_x, 3, block_h * block_w)
    return jnp.pad(gp, ((0, 0), (0, 5), (0, 0)))  # channel pad 3 -> 8


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
) -> jax.Array:
    """Render [H, W, 3] with the Pallas TPU kernel. Differentiable w.r.t.
    xys, conics, colors, opacity (reference backward semantics).

    tile_rows: optional (row_offset (traced ok), num_rows (static)) — render
    only that tile-row span in global coordinates (image sharding)."""
    tb_y = int(tile_bounds[1])
    if tile_rows is None:
        row0, num_rows = jnp.int32(0), tb_y
    else:
        row0, num_rows = jnp.asarray(tile_rows[0], jnp.int32), int(tile_rows[1])
    return _rasterize_pallas_vjp(
        binned, xys, conics, colors, opacity, row0,
        img_height, img_width, tile_bounds, block_w, block_h, cap, num_rows,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10, 11, 12))
def _rasterize_pallas_vjp(
    binned, xys, conics, colors, opacity, row0,
    img_height, img_width, tile_bounds, block_w, block_h, cap, num_rows,
):
    out, _ = _forward_impl(
        binned, xys, conics, colors, opacity, row0,
        img_height, img_width, tile_bounds, block_w, block_h, cap, num_rows,
    )
    return out


def _forward_impl(
    binned, xys, conics, colors, opacity, row0,
    img_height, img_width, tile_bounds, block_w, block_h, cap, num_rows,
):
    tb_x, tb_y = int(tile_bounds[0]), int(tile_bounds[1])
    num_tiles = tb_x * num_rows
    pix = block_w * block_h
    data_s = _pack_intersections(binned, xys, conics, colors, opacity, cap)
    tile0 = (row0 * tb_x).reshape(1).astype(jnp.int32)

    kernel = functools.partial(
        _forward_kernel, tb_x=tb_x, block_w=block_w, block_h=block_h, cap=cap
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(num_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)],
        out_specs=pl.BlockSpec(
            (1, 8, pix), lambda t, tile0, starts, counts: (t, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((DATA_ROWS, WINDOW), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    out_tiles = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_tiles, 8, pix), jnp.float32),
        interpret=INTERPRET,
    )(tile0, binned.tile_bin_start, binned.tile_counts, data_s)
    out_h = num_rows * block_h if num_rows != tb_y else img_height
    img = _tiles_to_image(
        out_tiles, out_h, img_width, tb_x, num_rows, block_w, block_h
    )
    return img, data_s


def _rasterize_fwd(
    binned, xys, conics, colors, opacity, row0,
    img_height, img_width, tile_bounds, block_w, block_h, cap, num_rows,
):
    img, data_s = _forward_impl(
        binned, xys, conics, colors, opacity, row0,
        img_height, img_width, tile_bounds, block_w, block_h, cap, num_rows,
    )
    return img, (binned, data_s, xys.shape[0], row0)


def _rasterize_bwd(
    img_height, img_width, tile_bounds, block_w, block_h, cap, num_rows,
    residuals, g,
):
    binned, data_s, n, row0 = residuals
    tb_x, tb_y = int(tile_bounds[0]), int(tile_bounds[1])
    num_tiles = tb_x * num_rows
    pix = block_w * block_h
    tile0_scalar = (row0 * tb_x).astype(jnp.int32)
    tile0 = tile0_scalar.reshape(1)
    vtiles = _image_to_vtiles(g, tb_x, num_rows, block_w, block_h)

    n_windows = data_s.shape[1] // WINDOW
    num_jobs = num_tiles + n_windows  # static bound on (tile, window) pairs
    starts_local = jax.lax.dynamic_slice(
        binned.tile_bin_start, (tile0_scalar,), (num_tiles,)
    )
    counts_local = jax.lax.dynamic_slice(
        binned.tile_counts, (tile0_scalar,), (num_tiles,)
    )
    tileof, windowof, first, jstart, jcount = _build_jobs(
        starts_local, counts_local, cap, n_windows, num_jobs
    )

    kernel = functools.partial(
        _backward_kernel, tb_x=tb_x, block_w=block_w, block_h=block_h, cap=cap
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(num_jobs,),
        in_specs=[
            pl.BlockSpec(
                (DATA_ROWS, WINDOW),
                lambda j, tile0, tileof, windowof, first, jstart, jcount: (
                    0, windowof[j],
                ),
                memory_space=pltpu.MemorySpace.VMEM,
            ),
            pl.BlockSpec(
                (1, 8, pix),
                lambda j, tile0, tileof, windowof, first, jstart, jcount: (
                    tileof[j], 0, 0,
                ),
                memory_space=pltpu.MemorySpace.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        ],
        out_specs=pl.BlockSpec(
            (DATA_ROWS, WINDOW),
            lambda j, tile0, tileof, windowof, first, jstart, jcount: (
                0, windowof[j],
            ),
            memory_space=pltpu.MemorySpace.VMEM,
        ),
    )
    vdata = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(data_s.shape, jnp.float32),
        input_output_aliases={8: 0},  # zeros input (after 6 prefetch + 2) -> out
        interpret=INTERPRET,
    )(
        tile0, tileof, windowof, first, jstart, jcount,
        data_s, vtiles, jnp.zeros_like(data_s),
    )

    # Reduce per-intersection grads to per-splat grads. Lanes beyond each
    # tile's cap were never touched (zeros from the aliased init), so no
    # masking is needed beyond the sentinel gaussian id.
    i_real = binned.sorted_gauss_ids.shape[0]
    vrows = vdata.T[:i_real]  # [I, 16]
    seg = jax.ops.segment_sum(
        vrows, binned.sorted_gauss_ids, num_segments=n + 1
    )[:n]
    v_xys = seg[:, 0:2]
    v_conics = seg[:, 2:5]
    v_opacity = seg[:, 5:6]
    v_colors = seg[:, 6:9]
    zero_binned = jax.tree.map(_zero_cotangent, binned)
    return (zero_binned, v_xys, v_conics, v_colors, v_opacity,
            _zero_cotangent(row0))


_rasterize_pallas_vjp.defvjp(_rasterize_fwd, _rasterize_bwd)
