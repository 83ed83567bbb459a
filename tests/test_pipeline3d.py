"""Tests for the inherited 3DGS pipeline: EWA projection, spherical
harmonics, and the depth-sorted alpha-compositing rasterizer.

Follows the reference test strategy (SURVEY.md §4: kernel vs independent
oracle, plus gradient checks the reference lacks). Oracles: closed-form SH
identities, rotation-matrix algebra, and a loop-style numpy compositor
re-derived from forward.cu:252-374.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsvc_tpu.ops.projection3d import (
    project_cov3d_ewa,
    project_gaussians,
    quat_to_rotmat,
    scale_rot_to_cov3d,
)
from gsvc_tpu.ops.rasterize_alpha import (
    rasterize_gaussians_alpha,
    rasterize_gaussians_alpha_np_oracle,
)
from gsvc_tpu.ops.sh import (
    deg_from_sh,
    eval_sh_bases,
    num_sh_bases,
    spherical_harmonics,
)

# heavyweight tier: Python-loop alpha oracle comparisons
pytestmark = pytest.mark.slow


# ---------------------------------------------------------------- SH


def test_num_sh_bases():
    assert [num_sh_bases(d) for d in range(5)] == [1, 4, 9, 16, 25]
    assert deg_from_sh(16) == 3
    with pytest.raises(ValueError):
        num_sh_bases(5)
    with pytest.raises(ValueError):
        deg_from_sh(7)


def test_sh_orthonormality():
    """Monte-Carlo check: the 25 bases are orthonormal on the unit sphere
    (integral of b_i * b_j over S^2 / (4 pi) == delta_ij / (4 pi))."""
    rng = np.random.default_rng(0)
    d = rng.normal(size=(200_000, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    b = np.asarray(eval_sh_bases(25, jnp.asarray(d, jnp.float32)), np.float64)
    gram = (b.T @ b) / d.shape[0] * 4 * np.pi
    np.testing.assert_allclose(gram, np.eye(25), atol=0.15)


def test_sh_degree0_is_constant_color():
    coeffs = jnp.asarray(np.random.default_rng(1).normal(size=(7, 1, 3)), jnp.float32)
    dirs = jnp.asarray(np.random.default_rng(2).normal(size=(7, 3)), jnp.float32)
    colors = spherical_harmonics(0, dirs, coeffs)
    np.testing.assert_allclose(
        np.asarray(colors), np.asarray(coeffs[:, 0, :]) * 0.28209479177387814,
        rtol=1e-6,
    )


def test_sh_gradients_finite_diff():
    rng = np.random.default_rng(3)
    coeffs = jnp.asarray(rng.normal(size=(4, 9, 3)), jnp.float32)
    dirs = jnp.asarray(rng.normal(size=(4, 3)), jnp.float32)

    def f(c):
        return jnp.sum(spherical_harmonics(2, dirs, c) ** 2)

    g = np.asarray(jax.grad(f)(coeffs))
    eps = 1e-3
    for idx in [(0, 0, 0), (1, 4, 2), (3, 8, 1)]:
        e = np.zeros(coeffs.shape, np.float32)
        e[idx] = eps
        fd = (f(coeffs + e) - f(coeffs - e)) / (2 * eps)
        np.testing.assert_allclose(g[idx], fd, rtol=2e-2, atol=1e-3)


# ---------------------------------------------------------------- projection


def test_quat_to_rotmat_properties():
    rng = np.random.default_rng(4)
    q = jnp.asarray(rng.normal(size=(32, 4)), jnp.float32)
    R = np.asarray(quat_to_rotmat(q))
    eye = np.einsum("nij,nkj->nik", R, R)
    np.testing.assert_allclose(eye, np.tile(np.eye(3), (32, 1, 1)), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)
    # identity quat
    Rid = np.asarray(quat_to_rotmat(jnp.asarray([[1.0, 0, 0, 0]])))
    np.testing.assert_allclose(Rid[0], np.eye(3), atol=1e-7)


def test_scale_rot_to_cov3d_eigenvalues():
    """cov = R S^2 R^T: eigenvalues == squared (global * scale)."""
    rng = np.random.default_rng(5)
    scale = jnp.asarray(rng.uniform(0.5, 2.0, (16, 3)), jnp.float32)
    quat = jnp.asarray(rng.normal(size=(16, 4)), jnp.float32)
    cov = np.asarray(scale_rot_to_cov3d(scale, 1.5, quat), np.float64)
    ev = np.sort(np.linalg.eigvalsh(cov), axis=1)
    expect = np.sort((1.5 * np.asarray(scale)) ** 2, axis=1)
    np.testing.assert_allclose(ev, expect, rtol=1e-4)


def test_project_cov3d_ewa_centered_isotropic():
    """An isotropic gaussian on the optical axis at depth z projects to an
    isotropic 2D gaussian with variance (f * s / z)^2 + blur."""
    s, z, f = 0.2, 4.0, 100.0
    mean = jnp.asarray([[0.0, 0.0, z]])
    cov3d = jnp.tile(jnp.eye(3) * s * s, (1, 1, 1))
    viewmat = jnp.eye(4)
    cov2d = np.asarray(
        project_cov3d_ewa(mean, cov3d, viewmat, f, f, 1.0, 1.0)
    )[0]
    expect = (f * s / z) ** 2 + 0.3
    np.testing.assert_allclose(cov2d[0], expect, rtol=1e-5)
    np.testing.assert_allclose(cov2d[2], expect, rtol=1e-5)
    np.testing.assert_allclose(cov2d[1], 0.0, atol=1e-5)


def test_project_gaussians_culling_and_geometry():
    H, W = 64, 64
    fx = fy = 50.0
    cx, cy = W / 2, H / 2
    tb = ((W + 15) // 16, (H + 15) // 16, 1)
    means = jnp.asarray(
        [[0.0, 0.0, 5.0],  # on-axis, visible
         [0.5, -0.25, 5.0],  # offset, visible
         [0.0, 0.0, -2.0]],  # behind camera -> culled
        jnp.float32,
    )
    scales = jnp.full((3, 3), 0.05, jnp.float32)
    quats = jnp.tile(jnp.asarray([1.0, 0, 0, 0], jnp.float32), (3, 1))
    xys, depths, radii, conics, nth, cov3d = project_gaussians(
        means, scales, 1.0, quats, jnp.eye(4), fx, fy, cx, cy, H, W, tb
    )
    xys, depths, radii, nth = map(np.asarray, (xys, depths, radii, nth))
    # pixel centers: fx*x/z + cx - 0.5
    np.testing.assert_allclose(xys[0], [cx - 0.5, cy - 0.5], atol=1e-4)
    np.testing.assert_allclose(
        xys[1], [fx * 0.1 + cx - 0.5, fy * -0.05 + cy - 0.5], atol=1e-4
    )
    np.testing.assert_allclose(depths[:2], [5.0, 5.0])
    assert radii[0] > 0 and radii[1] > 0 and nth[0] > 0
    assert radii[2] == 0 and nth[2] == 0 and depths[2] == 0.0
    assert np.all(np.isfinite(np.asarray(conics)))


def test_project_gaussians_gradients_finite():
    """Autodiff through the full projection is finite (the reference needs
    hand-written VJPs, backward.cu:1159-1344; here autodiff suffices)."""
    rng = np.random.default_rng(6)
    means = jnp.asarray(rng.uniform(-0.5, 0.5, (8, 3)) + [0, 0, 3.0], jnp.float32)
    scales = jnp.asarray(rng.uniform(0.02, 0.1, (8, 3)), jnp.float32)
    quats = jnp.asarray(rng.normal(size=(8, 4)), jnp.float32)

    def f(m, s, q):
        xys, depths, radii, conics, nth, _ = project_gaussians(
            m, s, 1.0, q, jnp.eye(4), 50.0, 50.0, 32.0, 32.0, 64, 64, (4, 4, 1)
        )
        return jnp.sum(xys) + jnp.sum(conics) + jnp.sum(depths)

    grads = jax.grad(f, argnums=(0, 1, 2))(means, scales, quats)
    for g in grads:
        assert np.all(np.isfinite(np.asarray(g)))


# ---------------------------------------------------------------- alpha rasterizer


def _random_scene(rng, n, H, W, c_dim=3):
    xys = rng.uniform(0, [W, H], (n, 2)).astype(np.float32)
    depths = rng.uniform(1.0, 10.0, n).astype(np.float32)
    L = np.stack(
        [rng.uniform(1.0, 4.0, n), rng.normal(0, 0.5, n), rng.uniform(1.0, 4.0, n)],
        axis=1,
    )
    cov = np.stack(
        [L[:, 0] ** 2, L[:, 0] * L[:, 1], L[:, 1] ** 2 + L[:, 2] ** 2], axis=1
    )
    det = cov[:, 0] * cov[:, 2] - cov[:, 1] ** 2
    conics = np.stack(
        [cov[:, 2] / det, -cov[:, 1] / det, cov[:, 0] / det], axis=1
    ).astype(np.float32)
    tr = 0.5 * (cov[:, 0] + cov[:, 2])
    radii = np.ceil(
        3 * np.sqrt(tr + np.sqrt(np.maximum(0.1, tr**2 - det)))
    ).astype(np.int32)
    colors = rng.uniform(0, 1, (n, c_dim)).astype(np.float32)
    opacity = rng.uniform(0.3, 1.0, (n, 1)).astype(np.float32)
    return xys, depths, radii, conics, colors, opacity


@pytest.mark.parametrize("c_dim", [3, 5])
def test_alpha_rasterize_matches_oracle(c_dim):
    rng = np.random.default_rng(7)
    H, W, n = 33, 47, 60  # non-multiple-of-16 sizes
    xys, depths, radii, conics, colors, opacity = _random_scene(rng, n, H, W, c_dim)
    bg = rng.uniform(0, 1, c_dim).astype(np.float32)
    img, alpha = rasterize_gaussians_alpha(
        jnp.asarray(xys), jnp.asarray(depths), jnp.asarray(radii),
        jnp.asarray(conics), None, jnp.asarray(colors), jnp.asarray(opacity),
        H, W, background=jnp.asarray(bg), return_alpha=True, chunk=16,
    )
    oracle = rasterize_gaussians_alpha_np_oracle(
        xys, depths, radii, conics, colors, opacity, H, W, background=bg
    )
    np.testing.assert_allclose(np.asarray(img), oracle, rtol=1e-4, atol=1e-4)
    a = np.asarray(alpha)
    assert a.shape == (H, W) and np.all(a >= -1e-6) and np.all(a <= 1 + 1e-6)


def test_alpha_rasterize_occlusion_order():
    """A near-opaque front splat occludes a back splat regardless of index
    order (depth sorting), and background shows where nothing renders."""
    H = W = 32
    xys = jnp.asarray([[16.0, 16.0], [16.0, 16.0]], jnp.float32)
    conics = jnp.tile(jnp.asarray([[0.5, 0.0, 0.5]], jnp.float32), (2, 1))
    radii = jnp.asarray([10, 10], jnp.int32)
    colors = jnp.asarray([[1.0, 0, 0], [0, 1.0, 0]], jnp.float32)
    opacity = jnp.asarray([[50.0], [50.0]], jnp.float32)  # alpha -> 0.999
    bg = jnp.asarray([0.0, 0.0, 1.0], jnp.float32)
    # index 0 = red is FAR (depth 5), index 1 = green is NEAR (depth 1)
    img = rasterize_gaussians_alpha(
        xys, jnp.asarray([5.0, 1.0]), radii, conics, None, colors, opacity,
        H, W, background=bg,
    )
    center = np.asarray(img)[16, 16]
    assert center[1] > 0.99 and center[0] < 0.01  # green wins
    corner = np.asarray(img)[0, 0]
    np.testing.assert_allclose(corner, [0, 0, 1.0], atol=1e-3)  # pure bg


def test_alpha_rasterize_gradients_match_oracle_fd():
    """Gradient of the jitted compositor vs central finite differences."""
    rng = np.random.default_rng(8)
    H, W, n = 16, 16, 12
    xys, depths, radii, conics, colors, opacity = _random_scene(rng, n, H, W)
    args = (jnp.asarray(xys), jnp.asarray(conics), jnp.asarray(colors),
            jnp.asarray(opacity))

    def f(xys_, conics_, colors_, opacity_):
        img = rasterize_gaussians_alpha(
            xys_, jnp.asarray(depths), jnp.asarray(radii), conics_, None,
            colors_, opacity_, H, W, chunk=8,
        )
        return jnp.sum(img * img)

    grads = jax.grad(f, argnums=(0, 1, 2, 3))(*args)
    eps = 1e-3
    g_col = np.asarray(grads[2])
    for idx in [(0, 0), (5, 2), (11, 1)]:
        e = np.zeros(colors.shape, np.float32)
        e[idx] = eps
        fd = (f(args[0], args[1], jnp.asarray(colors + e), args[3])
              - f(args[0], args[1], jnp.asarray(colors - e), args[3])) / (2 * eps)
        np.testing.assert_allclose(g_col[idx], float(fd), rtol=5e-2, atol=1e-3)
    for g in grads:
        assert np.all(np.isfinite(np.asarray(g)))


def test_alpha_rasterize_early_termination_freezes_pixel():
    """Once T <= 1e-4 the pixel stops compositing: a splat stacked behind an
    opaque wall contributes nothing (forward.cu:295-300 break)."""
    H = W = 16
    # 5 fully-opaque stacked splats drive T below 1e-4; a 6th behind them
    # must not contribute.
    n = 6
    xys = jnp.tile(jnp.asarray([[8.0, 8.0]], jnp.float32), (n, 1))
    conics = jnp.tile(jnp.asarray([[0.02, 0.0, 0.02]], jnp.float32), (n, 1))
    radii = jnp.full((n,), 30, jnp.int32)
    colors = jnp.zeros((n, 3), jnp.float32).at[5].set(jnp.asarray([1e6] * 3))
    opacity = jnp.full((n, 1), 10.0, jnp.float32)
    depths = jnp.asarray([1, 2, 3, 4, 5, 6], jnp.float32)
    img = rasterize_gaussians_alpha(
        xys, depths, radii, conics, None, colors, opacity, H, W, chunk=2
    )
    assert float(jnp.max(jnp.abs(img))) < 1e-3
