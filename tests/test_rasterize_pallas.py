"""Pallas kernel vs oracle tests (interpreter mode on CPU).

The same kernels run compiled on TPU; these tests validate the kernel logic
against the dense oracle and the binned-XLA path using the Pallas
interpreter, so no TPU is needed (SURVEY.md §4 rebuild strategy).

Tolerances: the kernels run their matmuls as split-bf16 dots
(rasterize_pallas.SPLIT_MM), which carries ~2^-16-relative rounding — image
atol 1e-4 and gradient atol 1e-4 cover it. That bound is far tighter than
the reference's own deviation from exact f32 (fast-math __expf,
--use_fast_math, gsplat/setup.py:76) and two decades below the 8-bit output
quantum.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gsvc_tpu.ops.rasterize_pallas as rp
from gsvc_tpu.ops.projection import project_gaussians_2d
from gsvc_tpu.ops.rasterize import rasterize_gaussians_sum

# heavyweight tier: interpret-mode Pallas / long fits / full drivers
pytestmark = pytest.mark.slow


@pytest.fixture(autouse=True)
def _interpret_mode():
    rp.INTERPRET = True
    yield
    rp.INTERPRET = False


def _scene(n, seed=0, opacity_max=1.0):
    rng = np.random.default_rng(seed)
    means = rng.uniform(-1.1, 1.1, (n, 2)).astype(np.float32)
    L = (rng.uniform(0, 1, (n, 3)) + np.array([0.5, 0.0, 0.5])).astype(np.float32)
    colors = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    opacity = rng.uniform(0.2, opacity_max, (n, 1)).astype(np.float32)
    return means, L, colors, opacity


def _render(backend, H, W, m, l, c, o):
    tb = ((W + 15) // 16, (H + 15) // 16, 1)

    def f(m, l, c, o):
        xys, d, radii, conics, nth = project_gaussians_2d(m, l, H, W, tb)
        return rasterize_gaussians_sum(
            xys, d, radii, conics, nth, c, o, H, W, backend=backend
        )

    return jax.jit(f)(m, l, c, o)


@pytest.mark.parametrize("hw", [(32, 48), (37, 51)])
def test_pallas_forward_matches_binned(hw):
    H, W = hw
    means, L, colors, opacity = _scene(150, seed=2)
    img_p = _render("pallas", H, W, means, L, colors, opacity)
    img_b = _render("binned", H, W, means, L, colors, opacity)
    np.testing.assert_allclose(
        np.asarray(img_p), np.asarray(img_b), rtol=1e-4, atol=1e-4
    )


def test_pallas_gradients_match_binned():
    H, W = 32, 32
    means, L, colors, opacity = _scene(80, seed=4)
    tb = ((W + 15) // 16, (H + 15) // 16, 1)
    target = jnp.full((H, W, 3), 0.4)

    def loss(backend, m, l, c, o):
        xys, d, radii, conics, nth = project_gaussians_2d(m, l, H, W, tb)
        img = rasterize_gaussians_sum(
            xys, d, radii, conics, nth, c, o, H, W, backend=backend
        )
        return jnp.mean((img - target) ** 2)

    args = tuple(map(jnp.asarray, (means, L, colors, opacity)))
    g_p = jax.jit(jax.grad(lambda *a: loss("pallas", *a), argnums=(0, 1, 2, 3)))(*args)
    g_b = jax.jit(jax.grad(lambda *a: loss("binned", *a), argnums=(0, 1, 2, 3)))(*args)
    for gp, gb, name in zip(g_p, g_b, ["means", "L", "colors", "opacity"]):
        np.testing.assert_allclose(
            np.asarray(gp), np.asarray(gb), rtol=1e-3, atol=1e-4, err_msg=name
        )


def test_pallas_tile_cap():
    H = W = 16
    n = 300
    means = np.zeros((n, 2), np.float32)
    L = np.tile(np.array([[1.0, 0.0, 1.0]], np.float32), (n, 1))
    colors = np.ones((n, 3), np.float32) / n
    opacity = np.ones((n, 1), np.float32)
    img_p = _render("pallas", H, W, means, L, colors, opacity)
    img_b = _render("binned", H, W, means, L, colors, opacity)
    np.testing.assert_allclose(
        np.asarray(img_p), np.asarray(img_b), rtol=1e-4, atol=1e-4
    )


def test_reduce_lane_grads_masks_out_of_shard_lanes():
    """ADVICE r2 (high): with tile_rows sharding, lanes outside the shard's
    row span are never written by the backward kernel (uninitialized HBM)
    but still carry REAL gaussian ids — the reduction must not fold them
    into per-splat grads. Poison those lanes and check invariance."""
    from gsvc_tpu.ops.binning import bin_gaussians, default_max_intersects
    from gsvc_tpu.ops.rasterize_pallas import _reduce_lane_grads

    H, W = 64, 48
    tb = ((W + 15) // 16, (H + 15) // 16, 1)
    means, L, colors, opacity = _scene(60, seed=7)
    xys, d, radii, conics, nth = project_gaussians_2d(means, L, H, W, tb)
    n = means.shape[0]
    mi = default_max_intersects(n, tb[0] * tb[1])
    binned = bin_gaussians(xys, radii, nth, tb, 16, 16, mi)

    s = binned.sorted_gauss_ids.shape[0]
    rng = np.random.default_rng(0)
    vdata = jnp.asarray(rng.normal(size=(16, s)), jnp.float32)

    row0, num_rows = jnp.int32(1), 2  # middle shard of the 4 tile rows
    lo = int(binned.row_lane_start[1])
    hi = int(binned.row_lane_start[3])
    lane = np.arange(s)
    outside = (lane < lo) | (lane >= hi)
    poisoned = jnp.where(
        jnp.asarray(outside)[None, :], jnp.float32(np.nan), vdata
    )

    clean = _reduce_lane_grads(vdata, binned, n, row0, num_rows)
    dirty = _reduce_lane_grads(poisoned, binned, n, row0, num_rows)
    for a, b in zip(clean, dirty):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
        assert np.isfinite(np.asarray(b)).all()


def test_rows_layout_matches_image_loss():
    """layout='rows' + masked tile-space L2 must equal image-space L2
    (the tiling is a permutation; padding is masked)."""
    from gsvc_tpu.ops.rasterize import image_to_rows, rows_to_image

    H, W = 37, 51  # non-multiple of 16 -> real padding
    means, L, colors, opacity = _scene(120, seed=11)
    tb = ((W + 15) // 16, (H + 15) // 16, 1)
    rng = np.random.default_rng(1)
    gt = jnp.asarray(rng.uniform(0, 1, (H, W, 3)), jnp.float32)

    def fwd(layout):
        xys, d, radii, conics, nth = project_gaussians_2d(
            means, L, H, W, tb
        )
        return rasterize_gaussians_sum(
            xys, d, radii, conics, nth, colors, opacity, H, W,
            backend="pallas", layout=layout,
        )

    img = jnp.clip(fwd("image"), 0, 1)
    rows = jnp.clip(fwd("rows"), 0, 1)
    # rows -> image roundtrip
    np.testing.assert_allclose(
        np.asarray(rows_to_image(rows, H, W)), np.asarray(img), atol=1e-6
    )
    # masked tile-space L2 == image-space L2
    gt_rows = image_to_rows(gt, H, W)
    mask = image_to_rows(jnp.ones_like(gt), H, W)
    diff = (rows - gt_rows) * mask
    mse_rows = float(jnp.sum(diff * diff) / (H * W * 3))
    mse_img = float(jnp.mean((img - gt) ** 2))
    np.testing.assert_allclose(mse_rows, mse_img, rtol=1e-6)

    # gradients through the rows layout match image-space gradients
    def loss_rows(c):
        xys, d, radii, conics, nth = project_gaussians_2d(means, L, H, W, tb)
        r = rasterize_gaussians_sum(
            xys, d, radii, conics, nth, c, opacity, H, W,
            backend="pallas", layout="rows",
        )
        dd = (jnp.clip(r, 0, 1) - gt_rows) * mask
        return jnp.sum(dd * dd) / (H * W * 3)

    def loss_img(c):
        xys, d, radii, conics, nth = project_gaussians_2d(means, L, H, W, tb)
        im = rasterize_gaussians_sum(
            xys, d, radii, conics, nth, c, opacity, H, W, backend="pallas"
        )
        return jnp.mean((jnp.clip(im, 0, 1) - gt) ** 2)

    g_rows = jax.grad(loss_rows)(colors)
    g_img = jax.grad(loss_img)(colors)
    np.testing.assert_allclose(
        np.asarray(g_rows), np.asarray(g_img), rtol=1e-4, atol=1e-6
    )


@pytest.mark.parametrize("hw", [(32, 48), (37, 51), (37, 1000)])
def test_chw_layout_matches_image(hw):
    """The direct planar-CHW kernel (c-major accumulator + in-VMEM relayout
    epilogue) must match the HWC path exactly — including non-multiple-of-16
    dims, the cs != tb_x channel-stride padding, and the windowed path
    (W=1000 -> tb_x=63 > WINDOW_TILES)."""
    H, W = hw
    m, l, c, o = _scene(150, seed=11)
    tb = ((W + 15) // 16, (H + 15) // 16, 1)

    def f(layout):
        def g(m, l, c, o):
            xys, d, radii, conics, nth = project_gaussians_2d(m, l, H, W, tb)
            return rasterize_gaussians_sum(
                xys, d, radii, conics, nth, c, o, H, W,
                backend="pallas", layout=layout,
            )
        return jax.jit(g)(m, l, c, o)

    img_chw = np.asarray(f("chw"))
    img_hwc = np.asarray(f("image"))
    assert img_chw.shape == (3, H, W)
    np.testing.assert_array_equal(img_chw.transpose(1, 2, 0), img_hwc)


def test_chw_layout_gradients_match_image():
    """Autodiff through the chw path (XLA vrows backward) == image path."""
    H, W = 37, 51
    m, l, c, o = _scene(120, seed=12)
    tb = ((W + 15) // 16, (H + 15) // 16, 1)
    wgt = np.random.default_rng(3).uniform(0.5, 1.5, (3, H, W)).astype(np.float32)

    def loss(layout):
        def g(m, l, c, o):
            xys, d, radii, conics, nth = project_gaussians_2d(m, l, H, W, tb)
            img = rasterize_gaussians_sum(
                xys, d, radii, conics, nth, c, o, H, W,
                backend="pallas", layout=layout,
            )
            if layout == "image":
                img = jnp.transpose(img, (2, 0, 1))
            return jnp.mean((img - 0.3) ** 2 * wgt)
        return jax.jit(jax.grad(g, argnums=(0, 1, 2, 3)))(m, l, c, o)

    g_chw = loss("chw")
    g_img = loss("image")
    for name, a, b in zip("m l c o".split(), g_chw, g_img):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6, err_msg=name
        )


@pytest.mark.parametrize("cap", [256, 24])
def test_fast_grad_reduction_matches_segment_sum(cap):
    """The sort+segmented-scan gradient reduction (active when binning
    provides raw sorted keys) must equal the segment_sum path exactly-ish.

    Exercises the full fast path: RAW-id pack with opacity cap-masking,
    elementwise slot recovery, the two-u32-sort permutation inverse, and
    the Pallas segmented cumsum. cap=24 forces beyond-cap lanes (200
    splats over a 48x64 canvas routinely exceed 24 per tile) — the
    regression guard for the capped-lane slot-collision bug: beyond-cap
    lanes must occupy their REAL expansion slot (with exactly-zero grads
    via the zeroed opacity) so real slots stay unique AND dense; a
    capped-id pack zeroed their rows 12-13 and routed them to colliding
    in-range slots, corrupting per-splat gradients broadly.
    """
    import gsvc_tpu.ops.binning as binning
    import gsvc_tpu.ops.fill_pallas as fp
    import gsvc_tpu.ops.rasterize as rz

    H, W = 48, 64
    m, l, c, o = _scene(200, seed=13)
    tb = ((W + 15) // 16, (H + 15) // 16, 1)
    wgt = np.random.default_rng(5).uniform(0.5, 1.5, (H, W, 3)).astype(np.float32)

    def grads(pallas_fill):
        binning.PALLAS_FILL = pallas_fill
        fp.INTERPRET = True
        old_cap = rz.TILE_CAP
        rz.TILE_CAP = cap
        try:
            def g(m, l, c, o):
                xys, d, radii, conics, nth = project_gaussians_2d(
                    m, l, H, W, tb
                )
                img = rasterize_gaussians_sum(
                    xys, d, radii, conics, nth, c, o, H, W,
                    backend="pallas",
                )
                return jnp.mean((img - 0.3) ** 2 * wgt)
            return jax.jit(jax.grad(g, argnums=(0, 1, 2, 3)))(m, l, c, o)
        finally:
            binning.PALLAS_FILL = None
            fp.INTERPRET = False
            rz.TILE_CAP = old_cap

    g_fast = grads(True)   # sorted_keys present -> fast reduction
    g_slow = grads(False)  # XLA binning path -> segment_sum reduction
    for name, a, b in zip("m l c o".split(), g_fast, g_slow):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6, err_msg=name
        )


def test_segmented_cumsum_kernel():
    """fill_pallas.segmented_cumsum vs a numpy segmented scan."""
    import gsvc_tpu.ops.fill_pallas as fp

    fp.INTERPRET = True
    try:
        rng = np.random.default_rng(9)
        S, R = 1000, 16
        vals = rng.normal(size=(R, S)).astype(np.float32)
        flags = (rng.uniform(size=S) < 0.05).astype(np.int32)
        flags[0] = 1
        got = np.asarray(
            fp.segmented_cumsum(jnp.asarray(vals), jnp.asarray(flags))
        )
        ref = vals.copy()
        for i in range(1, S):
            if not flags[i]:
                ref[:, i] += ref[:, i - 1]
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)
    finally:
        fp.INTERPRET = False


def test_windowed_kernel_matches_binned():
    """Wide image (tb_x > WINDOW_TILES) exercises the dynamic-window fast
    path AND the sparse full-width fallback in the same scene: a dense
    cluster (narrow chunk spans) plus isolated far-apart splats (a chunk
    spanning more than WINDOW_TILES tiles)."""
    H, W = 32, 704  # tb_x = 44 > 40
    rng = np.random.default_rng(5)
    n = 60
    means = np.zeros((n, 2), np.float32)
    means[:40, 0] = rng.uniform(-0.1, 0.1, 40)   # dense cluster mid-row
    means[:40, 1] = rng.uniform(-0.9, 0.9, 40)
    means[40:, 0] = np.linspace(-0.98, 0.98, 20)  # sparse spread
    means[40:, 1] = rng.uniform(-0.9, 0.9, 20)
    L = (rng.uniform(0.5, 2, (n, 3)) + np.array([0.5, 0.0, 0.5])).astype(
        np.float32
    )
    colors = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    opacity = rng.uniform(0.2, 1.0, (n, 1)).astype(np.float32)
    m, l, c, o = map(jnp.asarray, (means, L, colors, opacity))

    img_p = _render("pallas", H, W, m, l, c, o)
    img_b = _render("binned", H, W, m, l, c, o)
    np.testing.assert_allclose(
        np.asarray(img_p), np.asarray(img_b), rtol=1e-4, atol=1e-4
    )

    # gradients through both branches
    tb = ((W + 15) // 16, (H + 15) // 16, 1)
    gt = jnp.asarray(rng.uniform(0, 1, (H, W, 3)), jnp.float32)

    def loss(be):
        def f(m, l, c, o):
            xys, d, radii, conics, nth = project_gaussians_2d(m, l, H, W, tb)
            img = rasterize_gaussians_sum(
                xys, d, radii, conics, nth, c, o, H, W, backend=be
            )
            return jnp.mean((img - gt) ** 2)
        return f

    gp = jax.grad(loss("pallas"), argnums=(0, 1, 2, 3))(m, l, c, o)
    gb = jax.grad(loss("binned"), argnums=(0, 1, 2, 3))(m, l, c, o)
    for a, b in zip(gp, gb):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-4
        )
