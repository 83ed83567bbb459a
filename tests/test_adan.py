import jax
import jax.numpy as jnp
import numpy as np

from gsvc_tpu.optim.adan import adan_init, adan_reset_moments, adan_step
from gsvc_tpu.optim.schedule import step_lr


def _adan_numpy(params, grad_seq, lr, betas=(0.98, 0.92, 0.99), eps=1e-8):
    """Independent numpy Adan (from the Adan paper update rule, arXiv
    2208.06677 Alg.1, with torch-impl bias corrections)."""
    b1, b2, b3 = betas
    p = params.copy()
    m = np.zeros_like(p)
    d = np.zeros_like(p)
    n = np.zeros_like(p)
    g_prev = None
    for t, g in enumerate(grad_seq, start=1):
        if g_prev is None:
            g_prev = g  # first step: diff term = 0
        diff = g - g_prev
        m = b1 * m + (1 - b1) * g
        d = b2 * d + (1 - b2) * diff
        u = g + b2 * diff
        n = b3 * n + (1 - b3) * u * u
        bc1 = 1 - b1**t
        bc2 = 1 - b2**t
        bc3 = 1 - b3**t
        denom = np.sqrt(n) / np.sqrt(bc3) + eps
        p = p - lr / bc1 * m / denom - lr * b2 / bc2 * d / denom
        g_prev = g
    return p


def test_adan_matches_independent_numpy():
    rng = np.random.default_rng(0)
    p0 = rng.normal(size=(5, 3)).astype(np.float32)
    grads = [rng.normal(size=(5, 3)).astype(np.float32) for _ in range(7)]
    lr = 1e-2

    params = {"w": jnp.asarray(p0)}
    state = adan_init(params)
    for g in grads:
        params, state = jax.jit(adan_step)(params, {"w": jnp.asarray(g)}, state, lr)
    want = _adan_numpy(p0, grads, lr)
    np.testing.assert_allclose(np.asarray(params["w"]), want, rtol=1e-5, atol=1e-6)


def test_adan_moment_reset_keeps_step():
    rng = np.random.default_rng(1)
    params = {"w": jnp.asarray(rng.normal(size=(4,)).astype(np.float32))}
    state = adan_init(params)
    g = {"w": jnp.asarray(rng.normal(size=(4,)).astype(np.float32))}
    params, state = adan_step(params, g, state, 1e-3)
    params, state = adan_step(params, g, state, 1e-3)
    assert int(state.step) == 2
    state2 = adan_reset_moments(state)
    assert int(state2.step) == 2
    assert float(jnp.sum(jnp.abs(state2.exp_avg["w"]))) == 0.0
    assert bool(state2.fresh["w"])
    # next step must not blow up (diff term re-seeded)
    p3, s3 = adan_step(params, g, state2, 1e-3)
    assert np.all(np.isfinite(np.asarray(p3["w"])))


def test_adan_converges_on_quadratic():
    target = jnp.asarray([1.0, -2.0, 3.0])
    params = {"w": jnp.zeros(3)}
    state = adan_init(params)

    @jax.jit
    def step(params, state):
        g = jax.grad(lambda p: jnp.sum((p["w"] - target) ** 2))(params)
        return adan_step(params, g, state, 0.05)

    for _ in range(600):
        params, state = step(params, state)
    np.testing.assert_allclose(np.asarray(params["w"]), np.asarray(target), atol=2e-2)


def test_step_lr():
    np.testing.assert_allclose(float(step_lr(1e-3, jnp.int32(0))), 1e-3, rtol=1e-6)
    np.testing.assert_allclose(float(step_lr(1e-3, jnp.int32(19999))), 1e-3, rtol=1e-6)
    np.testing.assert_allclose(float(step_lr(1e-3, jnp.int32(20000))), 5e-4, rtol=1e-6)
    np.testing.assert_allclose(float(step_lr(1e-3, jnp.int32(40001))), 2.5e-4, rtol=1e-6)
