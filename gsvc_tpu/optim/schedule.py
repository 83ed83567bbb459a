"""Learning-rate schedules.

The reference uses torch StepLR(step_size=20000, gamma=0.5) everywhere
(GaussianSplats_Represent.py:52). StepLR multiplies the base lr by
gamma^(floor(step / step_size)); scheduler.step() is called once per
training iteration.
"""

from __future__ import annotations

import jax.numpy as jnp


def step_lr(base_lr: float, step, step_size: int = 20000, gamma: float = 0.5):
    """lr at a given 0-based completed-step count (torch StepLR semantics:
    the lr used for iteration i (1-based) is base*gamma^((i-1)//step_size))."""
    k = (step // step_size).astype(jnp.float32)
    return base_lr * gamma**k
