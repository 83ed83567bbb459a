"""Pallas binning-scan kernels vs the XLA associative-scan path.

The sequential fill/rank kernels (ops/fill_pallas.py) must produce exactly
the same BinnedSplats as the plain-XLA path, for random scenes including
budget overflow and per-tile cap saturation. Runs in interpreter mode on
CPU (SURVEY.md §4 oracle-comparison strategy).
"""

import jax.numpy as jnp
import numpy as np
import pytest

import gsvc_tpu.ops.binning as binning
import gsvc_tpu.ops.fill_pallas as fp
from gsvc_tpu.ops.binning import bin_gaussians, default_max_intersects
from gsvc_tpu.ops.projection import project_gaussians_2d


@pytest.fixture
def _pallas_interpret():
    fp.INTERPRET = True
    yield
    fp.INTERPRET = False


def _bin_both(n, H, W, seed, max_intersects=None, cap=256):
    tb = ((W + 15) // 16, (H + 15) // 16, 1)
    rng = np.random.default_rng(seed)
    means = jnp.asarray(rng.uniform(-1.1, 1.1, (n, 2)), jnp.float32)
    L = jnp.asarray(
        rng.uniform(0, 2, (n, 3)) + np.array([0.5, 0.0, 0.5]), jnp.float32
    )
    xys, d, radii, conics, nth = project_gaussians_2d(means, L, H, W, tb)
    if max_intersects is None:
        max_intersects = default_max_intersects(n, tb[0] * tb[1])
    out = {}
    for use_pallas in (False, True):
        binning.PALLAS_FILL = use_pallas
        try:
            out[use_pallas] = bin_gaussians(
                xys, radii, nth, tb, 16, 16, max_intersects, cap=cap
            )
        finally:
            binning.PALLAS_FILL = None
    return out[False], out[True]


@pytest.mark.parametrize(
    "n,hw,seed", [(50, (48, 64), 0), (200, (64, 96), 1), (500, (32, 128), 2)]
)
def test_pallas_fill_matches_xla(_pallas_interpret, n, hw, seed):
    ref, pal = _bin_both(n, hw[0], hw[1], seed)
    for name in ref._fields:
        a, b = getattr(ref, name), getattr(pal, name)
        if a is None or b is None:
            # sorted_keys exists only on the fast (pallas) key path
            assert name == "sorted_keys", name
            continue
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b), err_msg=name
        )


def test_pallas_fill_budget_overflow(_pallas_interpret):
    # tiny budget forces the whole-gaussian drop path
    ref, pal = _bin_both(100, 48, 64, seed=3, max_intersects=64)
    assert int(ref.overflow) > 0
    for name in ref._fields:
        a, b = getattr(ref, name), getattr(pal, name)
        if a is None or b is None:
            # sorted_keys exists only on the fast (pallas) key path
            assert name == "sorted_keys", name
            continue
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b), err_msg=name
        )


def test_fill_seed_formats_agree(_pallas_interpret):
    """The 2/3/4-row packed seed formats decode to identical sort keys.

    bin_gaussians picks the narrowest format that fits the gaussian-id
    width (fewer XLA scatters); the fill kernel must decode all three the
    same way.
    """
    rng = np.random.default_rng(7)
    n, tb_x, num_tiles, mi = 40, 8, 48, 256
    nth = rng.integers(0, 6, n).astype(np.int32)
    cum = np.cumsum(nth)
    starts = (cum - nth).astype(np.int32)
    kept = (cum <= mi) & (nth > 0)
    bbox_w = rng.integers(1, 4, n).astype(np.int32)
    tmin_x = rng.integers(0, 5, n).astype(np.int32)
    tmin_y = rng.integers(0, 5, n).astype(np.int32)
    gid = np.arange(n, dtype=np.int32)
    total_kept = jnp.int32(int(np.where(kept, nth, 0).sum()))

    def scatter(payload):
        s = np.full(mi, -1, np.int64)
        for g in range(n):
            if kept[g]:
                s[starts[g]] = max(s[starts[g]], payload[g])
        return jnp.asarray(s.astype(np.int32))

    seeds2 = jnp.stack(
        [
            scatter((starts.astype(np.int64) << 8) | bbox_w),
            scatter(((gid.astype(np.int64) + 1) << 16) | (tmin_x << 8) | tmin_y),
        ]
    )
    seeds3 = jnp.stack(
        [
            scatter((starts.astype(np.int64) << 8) | bbox_w),
            scatter((gid.astype(np.int64) << 8) | tmin_x),
            scatter((gid.astype(np.int64) << 8) | tmin_y),
        ]
    )
    seeds4 = jnp.stack(
        [
            scatter(starts.astype(np.int64)),
            scatter((gid.astype(np.int64) << 8) | bbox_w),
            scatter((gid.astype(np.int64) << 8) | tmin_x),
            scatter((gid.astype(np.int64) << 8) | tmin_y),
        ]
    )
    outs = [
        np.asarray(fp.fill_decode_keys(s, total_kept, tb_x, num_tiles, n))
        for s in (seeds2, seeds3, seeds4)
    ]
    np.testing.assert_array_equal(outs[0], outs[1])
    np.testing.assert_array_equal(outs[0], outs[2])


def test_pallas_fill_tile_cap(_pallas_interpret):
    # tiny cap saturates tile runs -> beyond-cap sentinels must match
    ref, pal = _bin_both(120, 32, 32, seed=4, cap=4)
    n = 120
    assert (np.asarray(ref.sorted_gauss_ids) == n).any()
    for name in ref._fields:
        a, b = getattr(ref, name), getattr(pal, name)
        if a is None or b is None:
            # sorted_keys exists only on the fast (pallas) key path
            assert name == "sorted_keys", name
            continue
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b), err_msg=name
        )


def test_static_capacity_covers_chunk_overrun():
    """The rasterizer DMAs CHUNK-lane slices from LANE_ALIGN-aligned row
    starts, so the final chunk may overrun the last row's end by up to
    CHUNK - LANE_ALIGN lanes; static_capacity must bound that (reading
    past the buffer faulted the TPU at 20k splats / default budget)."""
    from gsvc_tpu.ops.binning import LANE_ALIGN, static_capacity
    from gsvc_tpu.ops.rasterize_pallas import CHUNK

    for mi in (1024, 81920, 160768, 321536, 500000):
        for tb in ((120, 68, 1), (60, 34, 1), (16, 16, 1)):
            s_cap = static_capacity(mi, tb)
            worst_end = mi + (LANE_ALIGN - 1) * tb[1]
            assert s_cap >= worst_end + (CHUNK - LANE_ALIGN), (mi, tb)
            assert s_cap % max(LANE_ALIGN, CHUNK) == 0
