"""Training loss zoo — JAX port of the reference `loss_fn` (utils.py:21-41).

Same loss-type names and lambda semantics so driver flags stay compatible.
Inputs may be [C,H,W] or [N,C,H,W]; SSIM-based losses reshape to NCHW.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gsvc_tpu.utils.metrics import ms_ssim, ssim


def _as_nchw(x: jax.Array) -> jax.Array:
    return x[None] if x.ndim == 3 else x


def loss_fn(
    pred: jax.Array,
    target: jax.Array,
    loss_type: str = "L2",
    lambda_value: float = 0.7,
) -> jax.Array:
    target = jax.lax.stop_gradient(target).astype(jnp.float32)
    pred = pred.astype(jnp.float32)
    if loss_type == "L2":
        return jnp.mean((pred - target) ** 2)
    if loss_type == "L1":
        return jnp.mean(jnp.abs(pred - target))
    if loss_type == "SSIM":
        return 1.0 - ssim(_as_nchw(pred), _as_nchw(target), data_range=1.0)
    if loss_type == "Fusion1":
        return lambda_value * jnp.mean((pred - target) ** 2) + (
            1 - lambda_value
        ) * (1.0 - ssim(_as_nchw(pred), _as_nchw(target), data_range=1.0))
    if loss_type == "Fusion2":
        return lambda_value * jnp.mean(jnp.abs(pred - target)) + (
            1 - lambda_value
        ) * (1.0 - ssim(_as_nchw(pred), _as_nchw(target), data_range=1.0))
    if loss_type == "Fusion3":
        return lambda_value * jnp.mean((pred - target) ** 2) + (
            1 - lambda_value
        ) * jnp.mean(jnp.abs(pred - target))
    if loss_type == "Fusion4":
        return lambda_value * jnp.mean(jnp.abs(pred - target)) + (
            1 - lambda_value
        ) * (1.0 - ms_ssim(_as_nchw(pred), _as_nchw(target), data_range=1.0))
    if loss_type == "Fusion_hinerv":
        return lambda_value * jnp.mean(jnp.abs(pred - target)) + (
            1 - lambda_value
        ) * (
            1.0
            - ms_ssim(
                _as_nchw(pred), _as_nchw(target), data_range=1.0, win_size=5
            )
        )
    raise ValueError(f"unknown loss_type {loss_type!r}")
