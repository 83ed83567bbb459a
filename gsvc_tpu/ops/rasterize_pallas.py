"""Pallas TPU kernels for the differentiable sum-rasterizer.

TPU-native replacement for the reference CUDA hot kernels
`rasterize_forward_sum` (gsplat/gsplat/cuda/csrc/forward.cu:512-627) and
`rasterize_backward_sum_kernel` (backward.cu:696-862).

Design (see SURVEY.md §7.1) — the GROUP-STREAMING layout:

- The render is an order-independent accumulation, so each tile needs only
  its *member* splats, already grouped contiguously by the CSR binning
  (ops/binning.py). Each tile's (capped) member list is padded to GROUP=16
  lane slots ("groups"); groups from all tiles are laid out consecutively.
  Per-lane splat data is gathered once into a param-major array
  (`data[16, L]`: x, y, c1, c2, c3, opac, r, g, b, ox, oy — the last two
  are the lane's OWN tile origin, so a 128-lane window can mix tiles).

- Forward: the grid streams 128-lane windows (= NG=8 groups); the data
  block (j -> j) and the output block (j -> j) are both sequential, so
  Pallas's automatic pipelining fully hides HBM latency — no manual DMAs,
  no per-tile grid. Per window, sigma for all 256 tile-local pixels is ONE
  [256, 6] x [6, 128] MXU matmul (quadratic-feature factorization), and the
  per-group color accumulation is one [NG*4, 128] x [128, 256] MXU matmul
  against a group-masked color matrix: out[(g, c), p] = sum_{k in g}
  rgb[c, k] * alpha[p, k]. A segment-sum over group -> tile (~1.1 groups per
  tile) assembles the image outside the kernel.

  (The previous design iterated one grid step per tile with manual
  128-lane window DMAs; at 1080p that was 8160 tiny grid steps whose
  fixed overhead + blocking DMA waits cost ~15 ms — 30x the useful
  compute. Group streaming brings the same math to ~2900 uniform,
  fully-pipelined steps.)

- Backward is atomics-free (vs. backward.cu:843-858's atomicAdd) and uses
  the same streamed layout: per window it recomputes sigma/alpha, pulls the
  NG group tiles' image-gradient blocks via scalar-prefetched index maps,
  and emits per-lane parameter gradients to a (j -> j) streamed output.
  v_alpha and v_rgb are the transposed MXU matmuls of the forward. A
  segment_sum over gaussian ids then reduces lane grads to per-splat grads.
  Deterministic by construction.

- The per-tile cap (first 256 binned splats, forward.cu:613) is applied
  when building the group layout.

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

from gsvc_tpu.ops.binning import GROUP, BinnedSplats
from gsvc_tpu.ops.rasterize_dense import ALPHA_CUTOFF

WINDOW = 128  # lanes per grid step (lane-tiling aligned)
NG = WINDOW // GROUP  # groups per window
DATA_ROWS = 16  # packed rows: x y c1 c2 c3 opac r g b ox oy (5 pad)
OUT_CH = 4  # channels emitted per group by the forward kernel (r g b pad)

# Run kernels in the Pallas interpreter (for CPU tests). Toggled by tests.
INTERPRET = False


def _zero_cotangent(x):
    if jnp.issubdtype(x.dtype, jnp.integer) or x.dtype == jnp.bool_:
        return np.zeros(x.shape, dtype=jax.dtypes.float0)
    return jnp.zeros_like(x)


def default_max_groups(max_intersects: int, num_tiles: int) -> int:
    """Static bound on tile-groups: every intersection could open a lane and
    every tile wastes at most one partial group. Rounded to whole windows."""
    g = max_intersects // GROUP + num_tiles
    return ((g + NG - 1) // NG) * NG


def _local_groups(
    binned: BinnedSplats,
    tile0: jax.Array,
    num_tiles: int,
    n: int,
    max_groups: int,
) -> Tuple[jax.Array, jax.Array]:
    """Slice the sort-integrated group layout for tiles [tile0, tile0+T).

    The binning sort already emitted every tile's bin padded to GROUP-lane
    multiples (ops/binning.py), so the group layout is a plain GROUP-aligned
    dynamic slice — no gather. Returns (lane ids [max_groups*GROUP] with
    sentinel n, LOCAL group tile ids [max_groups] with sentinel num_tiles).
    """
    lanes = max_groups * GROUP
    src_ids, src_tiles = binned.sorted_gauss_ids, binned.sorted_tile_ids
    start = binned.tile_bin_start[tile0]
    if src_ids.shape[0] != lanes:
        # tiny grids (src < lanes) or a sharded partial slice whose dynamic
        # offset could run past the tail (src > lanes): append sentinel
        # slack so dynamic_slice never clamps into misalignment.
        pad = lanes if src_ids.shape[0] > lanes else lanes - src_ids.shape[0]
        src_ids = jnp.pad(src_ids, (0, pad), constant_values=n)
        src_tiles = jnp.pad(src_tiles, (0, pad), constant_values=-1)
    ids = jax.lax.dynamic_slice(src_ids, (start,), (lanes,))
    tiles = jax.lax.dynamic_slice(src_tiles, (start,), (lanes,))
    gtile_global = tiles.reshape(max_groups, GROUP)[:, 0]
    gtile = gtile_global - tile0
    in_shard = (gtile >= 0) & (gtile < num_tiles)
    gtile = jnp.where(in_shard, gtile, num_tiles).astype(jnp.int32)
    # lanes of out-of-shard groups must not emit gradients for real splats
    ids = jnp.where(jnp.repeat(in_shard, GROUP), ids, n).astype(jnp.int32)
    return ids, gtile


def _pack_grouped(
    ids: jax.Array,  # [L] lane gaussian ids (sentinel N)
    gtile: jax.Array,  # [G] local tile per group
    tile0: jax.Array,  # [] global tile offset of the local grid
    xys: jax.Array,
    conics: jax.Array,
    colors: jax.Array,
    opacity: jax.Array,
    tb_x: int,
    block_w: int,
    block_h: int,
) -> jax.Array:
    """Gather per-lane splat params + per-lane tile origins, [16, L].

    Rows: 0:x 1:y 2:c1 3:c2 4:c3 5:opac 6:r 7:g 8:b 9:ox 10:oy (rest 0).
    Sentinel ids (== N) gather a zero row whose opac=0 keeps the lane below
    the alpha cutoff.
    """
    zrow = lambda a: jnp.concatenate([a, jnp.zeros((1,) + a.shape[1:], a.dtype)])
    rows = jnp.concatenate(
        [
            zrow(xys)[ids],
            zrow(conics)[ids],
            zrow(opacity.reshape(-1, 1))[ids],
            zrow(colors[:, :3])[ids],
        ],
        axis=1,
    )  # [L, 9]
    gt_global = gtile + tile0
    ox = ((gt_global % tb_x) * block_w).astype(jnp.float32)
    oy = ((gt_global // tb_x) * block_h).astype(jnp.float32)
    ox_l = jnp.repeat(ox, GROUP)[:, None]
    oy_l = jnp.repeat(oy, GROUP)[:, None]
    rows = jnp.concatenate([rows, ox_l, oy_l], axis=1)  # [L, 11]
    rows = jnp.pad(rows, ((0, 0), (0, DATA_ROWS - rows.shape[1])))
    return rows.T  # [16, L]


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
    """B[6, W]: per-splat quadratic coefficients in tile-local coords.

    sigma[p, k] = A[p] . B[k] with A from `_pixel_features`:
      sigma = 0.5*c1*(gx-px)^2 + 0.5*c3*(gy-py)^2 + c2*(gx-px)*(gy-py)
    expanded around each lane's OWN tile origin (rows 9, 10). Turns the
    per-pixel-per-splat quadratic into one MXU matmul instead of ~10 VPU
    ops on [pix, W].
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


_HIGHEST = jax.lax.Precision.HIGHEST


def _dot(a, b, dims):
    return jax.lax.dot_general(
        a, b, dimension_numbers=(dims, ((), ())),
        preferred_element_type=jnp.float32, precision=_HIGHEST,
    )


def _group_mask():
    """Static [NG*OUT_CH, WINDOW] mask: row (g, c) selects lanes of group g."""
    row_g = jax.lax.broadcasted_iota(
        jnp.int32, (NG * OUT_CH, WINDOW), 0
    ) // OUT_CH
    lane_g = jax.lax.broadcasted_iota(
        jnp.int32, (NG * OUT_CH, WINDOW), 1
    ) // GROUP
    return (row_g == lane_g).astype(jnp.float32)


def _window_eval(d, block_w: int, block_h: int):
    """Shared forward math on one [16, WINDOW] data block."""
    A = _pixel_features(block_w, block_h)
    gx, gy, c1, c2, c3, B = _splat_features(d)
    sigma = _dot(A, B, ((1,), (0,)))  # [pix, W] MXU
    vis = jnp.exp(-sigma)
    alpha_u = d[5:6, :] * vis
    alpha = jnp.minimum(1.0, alpha_u)
    valid = (sigma >= 0.0) & (alpha >= ALPHA_CUTOFF)
    return gx, gy, c1, c2, c3, sigma, vis, alpha_u, alpha, valid


def _rexp(d, mask):
    """[NG*OUT_CH, W] group-masked color matrix: row (g,c) = rgb[c] on g."""
    rgb4 = jnp.concatenate(
        [d[6:9, :], jnp.zeros((1, WINDOW), jnp.float32)], axis=0
    )
    return jnp.concatenate([rgb4] * NG, axis=0) * mask


def _forward_kernel(
    wlive_ref, d_ref, out_ref, *, block_w: int, block_h: int
):
    j = pl.program_id(0)
    # windows holding only sentinel groups skip their math entirely
    live = wlive_ref[j] > 0

    @pl.when(live)
    def _compute():
        d = d_ref[...]
        _gx, _gy, _c1, _c2, _c3, _sig, _vis, _au, alpha, valid = _window_eval(
            d, block_w, block_h
        )
        w = jnp.where(valid, alpha, 0.0)  # [pix, W]
        Rexp = _rexp(d, _group_mask())  # [NG*4, W]
        # out[(g, c), p] = sum_k Rexp[(g,c), k] * w[p, k]  (MXU)
        out_ref[...] = _dot(Rexp, w, ((1,), (1,)))  # [NG*4, pix]

    @pl.when(jnp.logical_not(live))
    def _skip():
        out_ref[...] = jnp.zeros_like(out_ref)


def _backward_kernel(
    gtile_ref,  # scalar prefetch [G] (drives the vout index maps)
    wlive_ref,  # scalar prefetch [n_windows]
    d_ref,  # [16, W] data block (streamed j -> j)
    *refs,  # NG vout blocks [1, OUT_CH, pix] then vdata_ref [16, W]
    block_w: int,
    block_h: int,
):
    vout_refs, vdata_ref = refs[:NG], refs[NG]
    j = pl.program_id(0)
    live = wlive_ref[j] > 0

    @pl.when(live)
    def _compute():
        d = d_ref[...]
        A = _pixel_features(block_w, block_h)
        gx, gy, c1, c2, c3, sigma, vis, alpha_u, alpha, valid = _window_eval(
            d, block_w, block_h
        )
        pix = block_w * block_h
        # Vexp[(g, c), p]: the NG group tiles' output gradients, stacked in
        # the same row order as Rexp.
        Vexp = jnp.concatenate(
            [r[...].reshape(OUT_CH, pix) for r in vout_refs], axis=0
        )  # [NG*4, pix]
        mask = _group_mask()
        Rexp = _rexp(d, mask)
        # v_alpha[p, k] = sum_c rgb[c, k] * v_out_{tile(k)}[c, p]
        # (backward.cu:826-829), via the group-blocked matmul.
        v_alpha = jnp.where(
            valid, _dot(Vexp, Rexp, ((0,), (0,))), 0.0
        )  # [pix, W]
        v_sigma = -alpha_u * v_alpha  # min(1,.) clamp is forward-only
        vB = _dot(A, v_sigma, ((0,), (0,)))  # [6, W] MXU
        vB0, vB1, vB2 = vB[0:1, :], vB[1:2, :], vB[2:3, :]
        vB3, vB4, vB5 = vB[3:4, :], vB[4:5, :], vB[5:6, :]
        v_c1 = 0.5 * (vB0 + gx * (gx * vB5 - 2.0 * vB3))
        v_c3 = 0.5 * (vB1 + gy * (gy * vB5 - 2.0 * vB4))
        v_c2 = vB2 - gy * vB3 - gx * vB4 + gx * gy * vB5
        v_x = -c1 * vB3 - c2 * vB4 + (c1 * gx + c2 * gy) * vB5
        v_y = -c2 * vB3 - c3 * vB4 + (c3 * gy + c2 * gx) * vB5
        v_opac = jnp.sum(vis * v_alpha, axis=0, keepdims=True)  # [1, W]
        w = jnp.where(valid, alpha, 0.0)
        # M[(g, c), k] = sum_p Vexp[(g,c), p] * w[p, k]; lane k only needs
        # its own group's rows -> group-mask, fold rows by static selector.
        M = _dot(Vexp, w, ((1,), (0,))) * mask  # [NG*4, W]
        sel_c = jax.lax.broadcasted_iota(jnp.int32, (3, NG * OUT_CH), 0)
        sel_r = jax.lax.broadcasted_iota(
            jnp.int32, (3, NG * OUT_CH), 1
        ) % OUT_CH
        S = (sel_c == sel_r).astype(jnp.float32)  # [3, NG*4]
        v_rgb = _dot(S, M, ((1,), (0,)))  # [3, W]
        pad = jnp.zeros((DATA_ROWS - 9, WINDOW), jnp.float32)
        vdata_ref[...] = jnp.concatenate(
            [v_x, v_y, v_c1, v_c2, v_c3, v_opac, v_rgb, pad], axis=0
        )

    @pl.when(jnp.logical_not(live))
    def _skip():
        vdata_ref[...] = jnp.zeros_like(vdata_ref)


def _tiles_to_image(tiles, img_height, img_width, tb_x, tb_y, block_w, block_h):
    """[T, 3, pix] tile blocks -> [h, W, 3] image crop."""
    img = tiles.reshape(tb_y, tb_x, 3, block_h, block_w)
    img = img.transpose(2, 0, 3, 1, 4).reshape(3, tb_y * block_h, tb_x * block_w)
    return img[:, :img_height, :img_width].transpose(1, 2, 0)


def _image_to_vtiles(g, tb_x, tb_y, block_w, block_h):
    """[h, W, 3] grad -> [T + 1, OUT_CH, pix] with a zero sentinel block."""
    h_pad = tb_y * block_h - g.shape[0]
    w_pad = tb_x * block_w - g.shape[1]
    gp = jnp.pad(g, ((0, h_pad), (0, w_pad), (0, 0))).transpose(2, 0, 1)
    gp = gp.reshape(3, tb_y, block_h, tb_x, block_w).transpose(1, 3, 0, 2, 4)
    gp = gp.reshape(tb_y * tb_x, 3, block_h * block_w)
    gp = jnp.pad(gp, ((0, 1), (0, OUT_CH - 3), (0, 0)))  # sentinel + ch pad
    return gp


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
    max_intersects = binned.sorted_gauss_ids.shape[0]
    max_groups = default_max_groups(max_intersects, num_tiles)
    n_windows = max_groups // NG
    n = xys.shape[0]

    tile0_scalar = (row0 * tb_x).astype(jnp.int32)
    ids, gtile = _local_groups(binned, tile0_scalar, num_tiles, n, max_groups)
    wlive = (
        (gtile.reshape(n_windows, NG) < num_tiles).any(axis=1)
    ).astype(jnp.int32)
    data = _pack_grouped(
        ids, gtile, tile0_scalar, xys, conics, colors, opacity,
        tb_x, block_w, block_h,
    )  # [16, G*GROUP]

    kernel = functools.partial(
        _forward_kernel, block_w=block_w, block_h=block_h
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_windows,),
        in_specs=[
            pl.BlockSpec(
                (DATA_ROWS, WINDOW), lambda j, wl: (0, j),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=pl.BlockSpec(
            (NG * OUT_CH, pix), lambda j, wl: (j, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (n_windows * NG * OUT_CH, pix), jnp.float32
        ),
        interpret=INTERPRET,
    )(wlive, data)

    # group -> tile reduction (sorted segments, ~1.1 groups per tile), then
    # tile blocks -> image.
    out_g = out.reshape(max_groups, OUT_CH, pix)[:, :3, :]
    tiles = jax.ops.segment_sum(
        out_g.reshape(max_groups, 3 * pix), gtile,
        num_segments=num_tiles + 1, indices_are_sorted=True,
    )[:num_tiles].reshape(num_tiles, 3, pix)
    out_h = num_rows * block_h if num_rows != tb_y else img_height
    img = _tiles_to_image(
        tiles, out_h, img_width, tb_x, num_rows, block_w, block_h
    )
    return img, (ids, gtile, data)


def _rasterize_fwd(
    binned, xys, conics, colors, opacity, row0,
    img_height, img_width, tile_bounds, block_w, block_h, cap, num_rows,
):
    img, (ids, gtile, data) = _forward_impl(
        binned, xys, conics, colors, opacity, row0,
        img_height, img_width, tile_bounds, block_w, block_h, cap, num_rows,
    )
    return img, (binned, ids, gtile, data, xys.shape[0], row0)


def _rasterize_bwd(
    img_height, img_width, tile_bounds, block_w, block_h, cap, num_rows,
    residuals, g,
):
    binned, ids, gtile, data, n, row0 = residuals
    tb_x = int(tile_bounds[0])
    num_tiles = tb_x * num_rows
    pix = block_w * block_h
    max_groups = gtile.shape[0]
    n_windows = max_groups // NG
    wlive = (
        (gtile.reshape(n_windows, NG) < num_tiles).any(axis=1)
    ).astype(jnp.int32)
    vtiles = _image_to_vtiles(g, tb_x, num_rows, block_w, block_h)

    kernel = functools.partial(
        _backward_kernel, block_w=block_w, block_h=block_h
    )
    # NG gradient blocks per window, indexed by the groups' tile ids
    # (sentinel groups hit the zero block at num_tiles).
    def _vout_map(i):
        def index_map(j, gt, wl):
            return (gt[j * NG + i], 0, 0)

        return index_map

    vout_specs = [
        pl.BlockSpec((1, OUT_CH, pix), _vout_map(i), memory_space=pltpu.VMEM)
        for i in range(NG)
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_windows,),
        in_specs=[
            pl.BlockSpec(
                (DATA_ROWS, WINDOW), lambda j, gt, wl: (0, j),
                memory_space=pltpu.VMEM,
            ),
            *vout_specs,
        ],
        out_specs=pl.BlockSpec(
            (DATA_ROWS, WINDOW), lambda j, gt, wl: (0, j),
            memory_space=pltpu.VMEM,
        ),
    )
    vdata = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(data.shape, jnp.float32),
        interpret=INTERPRET,
    )(gtile, wlive, data, *([vtiles] * NG))

    # Reduce per-lane grads to per-splat grads (sentinel id n drops).
    seg = jax.ops.segment_sum(vdata.T, ids, num_segments=n + 1)[:n]
    v_xys = seg[:, 0:2]
    v_conics = seg[:, 2:5]
    v_opacity = seg[:, 5:6]
    v_colors = seg[:, 6:9]
    zero_binned = jax.tree.map(_zero_cotangent, binned)
    return (zero_binned, v_xys, v_conics, v_colors, v_opacity,
            _zero_cotangent(row0))


_rasterize_pallas_vjp.defvjp(_rasterize_fwd, _rasterize_bwd)
