"""Geometry builder helpers vs analytic expectations (reference utils.py:44-131)."""

import numpy as np
import jax.numpy as jnp

from gsvc_tpu.utils.geometry import (
    build_covariance_from_cholesky,
    build_covariance_from_scaling_rotation_2d,
    build_rotation,
    build_rotation_2d,
    build_scaling_rotation,
    build_triangular,
    strip_lowerdiag,
    strip_symmetric,
)


def test_build_rotation_identity_and_orthonormal():
    q = jnp.asarray([[1.0, 0.0, 0.0, 0.0], [0.3, -0.5, 0.7, 0.2]])
    R = np.asarray(build_rotation(q))
    np.testing.assert_allclose(R[0], np.eye(3), atol=1e-6)
    for r in R:
        np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-5)
        assert np.linalg.det(r) > 0.99


def test_build_rotation_2d_matches_angle():
    theta = jnp.asarray([[0.0], [np.pi / 2], [1.2345]])
    R = np.asarray(build_rotation_2d(theta))
    for t, r in zip(np.asarray(theta)[:, 0], R):
        expect = np.array(
            [[np.cos(t), -np.sin(t)], [np.sin(t), np.cos(t)]]
        )
        np.testing.assert_allclose(r, expect, atol=1e-6)


def test_build_scaling_rotation():
    q = jnp.asarray([[1.0, 0.0, 0.0, 0.0]])
    s = jnp.asarray([[2.0, 3.0, 4.0]])
    L = np.asarray(build_scaling_rotation(s, q))[0]
    np.testing.assert_allclose(L, np.diag([2.0, 3.0, 4.0]), atol=1e-6)


def test_build_triangular_and_covariance():
    r = jnp.asarray([[1.5, -0.5, 2.0]])
    L = np.asarray(build_triangular(r))[0]
    np.testing.assert_allclose(L, [[1.5, 0.0], [-0.5, 2.0]], atol=1e-7)
    cov = np.asarray(build_covariance_from_cholesky(r))[0]
    np.testing.assert_allclose(cov, L @ L.T, atol=1e-6)
    # matches the packed cov used by projection: (l11^2, l11 l21, l21^2+l22^2)
    np.testing.assert_allclose(
        [cov[0, 0], cov[0, 1], cov[1, 1]],
        [1.5 * 1.5, 1.5 * -0.5, 0.25 + 4.0],
        atol=1e-6,
    )


def test_cov_from_scale_rot_2d_psd_and_strip():
    s = jnp.asarray([[2.0, 0.5], [1.0, 3.0]])
    theta = jnp.asarray([[0.3], [-1.1]])
    cov = np.asarray(build_covariance_from_scaling_rotation_2d(s, 1.0, theta))
    for c in cov:
        np.testing.assert_allclose(c, c.T, atol=1e-6)
        assert np.all(np.linalg.eigvalsh(c) > 0)
    packed = np.asarray(strip_symmetric(jnp.asarray(cov)))
    np.testing.assert_allclose(packed[:, 0], cov[:, 0, 0], atol=1e-7)
    np.testing.assert_allclose(packed[:, 1], cov[:, 0, 1], atol=1e-7)
    np.testing.assert_allclose(packed[:, 2], cov[:, 1, 1], atol=1e-7)


def test_strip_lowerdiag_3x3():
    m = jnp.arange(9.0).reshape(1, 3, 3)
    out = np.asarray(strip_lowerdiag(m))[0]
    np.testing.assert_allclose(out, [0.0, 1.0, 2.0, 4.0, 5.0, 8.0])
