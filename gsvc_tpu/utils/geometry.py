"""Rotation / scaling / covariance builder helpers.

JAX ports of the reference geometry helpers (utils.py:44-131): quaternion
and 2D rotation matrices, scaling-rotation factors, covariance assembly, and
the lower-triangular builder used by the Cholesky parameterization. These are
small batched constructions; XLA fuses them into the surrounding graph, so
unlike the reference there is no device= plumbing or preallocated zeros.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def strip_lowerdiag(L: jax.Array) -> jax.Array:
    """[N,3,3] -> [N,6] or [N,2,2] -> [N,3] upper-triangular packing
    (reference utils.py:44-59)."""
    if L.shape[1] == 3:
        return jnp.stack(
            [L[:, 0, 0], L[:, 0, 1], L[:, 0, 2],
             L[:, 1, 1], L[:, 1, 2], L[:, 2, 2]],
            axis=1,
        )
    if L.shape[1] == 2:
        return jnp.stack([L[:, 0, 0], L[:, 0, 1], L[:, 1, 1]], axis=1)
    raise ValueError(f"unsupported matrix size {L.shape[1]}")


def strip_symmetric(sym: jax.Array) -> jax.Array:
    """Alias of strip_lowerdiag (reference utils.py:61-62)."""
    return strip_lowerdiag(sym)


def build_rotation(r: jax.Array) -> jax.Array:
    """[N,4] quaternions (w,x,y,z) -> [N,3,3] rotation matrices
    (reference utils.py:64-85)."""
    q = r / jnp.linalg.norm(r, axis=1, keepdims=True)
    w, x, y, z = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z),
                       2 * (x * z + w * y)], axis=1),
            jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z),
                       2 * (y * z - w * x)], axis=1),
            jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x),
                       1 - 2 * (x * x + y * y)], axis=1),
        ],
        axis=1,
    )


def build_scaling_rotation(s: jax.Array, r: jax.Array) -> jax.Array:
    """L = R @ diag(s), [N,3,3] (reference utils.py:87-96)."""
    R = build_rotation(r)
    return R * s[:, None, :]


def build_rotation_2d(r: jax.Array) -> jax.Array:
    """[N,1] angles -> [N,2,2] rotations (reference utils.py:98-106)."""
    t = r[:, 0]
    c, s = jnp.cos(t), jnp.sin(t)
    return jnp.stack(
        [jnp.stack([c, -s], axis=1), jnp.stack([s, c], axis=1)], axis=1
    )


def build_scaling_rotation_2d(s: jax.Array, r: jax.Array) -> jax.Array:
    """L = R @ diag(s), [N,2,2] (reference utils.py:109-115)."""
    R = build_rotation_2d(r)
    return R * s[:, None, :]


def build_covariance_from_scaling_rotation_2d(
    scaling: jax.Array, scaling_modifier: float, rotation: jax.Array
) -> jax.Array:
    """Sigma = L L^T from per-axis scale + rotation (reference utils.py:117-123)."""
    L = build_scaling_rotation_2d(scaling_modifier * scaling, rotation)
    return L @ L.transpose(0, 2, 1)


def build_triangular(r: jax.Array) -> jax.Array:
    """[N,3] (l11,l21,l22) -> [N,2,2] lower-triangular L
    (reference utils.py:125-130)."""
    zeros = jnp.zeros_like(r[:, 0])
    return jnp.stack(
        [
            jnp.stack([r[:, 0], zeros], axis=1),
            jnp.stack([r[:, 1], r[:, 2]], axis=1),
        ],
        axis=1,
    )


def build_covariance_from_cholesky(r: jax.Array) -> jax.Array:
    """Sigma = L L^T from packed Cholesky elements, [N,2,2]."""
    L = build_triangular(r)
    return L @ L.transpose(0, 2, 1)
