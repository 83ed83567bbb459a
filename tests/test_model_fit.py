"""End-to-end model tests: per-frame fit improves PSNR, splat control works."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsvc_tpu.config import FrameConfig
from gsvc_tpu.models.represent import (
    fit_frame,
    init_train_state,
    pre_train_frame,
    render_frame,
)

# heavyweight tier: interpret-mode Pallas / long fits / full drivers
pytestmark = pytest.mark.slow


def _target_image(H, W, seed=0):
    """Smooth synthetic target (mixture of blobs + gradient)."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    img = np.zeros((H, W, 3), np.float32)
    img[..., 0] = xx / W
    img[..., 1] = yy / H
    for _ in range(6):
        cx, cy = rng.uniform(0, W), rng.uniform(0, H)
        s = rng.uniform(4, 12)
        blob = np.exp(-(((xx - cx) ** 2 + (yy - cy) ** 2) / (2 * s * s)))
        img[..., rng.integers(0, 3)] += blob
    return np.clip(img, 0, 1)


def test_fit_frame_improves_psnr():
    H = W = 64
    cfg = FrameConfig(
        H=H, W=W, num_points=256, max_num_points=256, iterations=600,
        backend="binned",
    )
    gt = jnp.asarray(_target_image(H, W))
    state = init_train_state(jax.random.key(0), cfg)
    res = fit_frame(state, gt, cfg)
    assert int(res.state.it) == 600
    psnr = float(res.state.psnr)
    assert psnr > 18.0, f"psnr after fit too low: {psnr}"
    # a fresh render must agree with the training-loop psnr
    img = render_frame(res.state.params, res.state.alive, cfg)
    mse = float(jnp.mean((img - gt) ** 2))
    assert abs(10 * np.log10(1 / mse) - psnr) < 0.5


def test_fit_frame_removal_control():
    H = W = 48
    cfg = FrameConfig(
        H=H, W=W, num_points=200, max_num_points=200, iterations=450,
        isremoval=True, removal_rate=0.2, densification_interval=100,
        backend="binned",
    )
    gt = jnp.asarray(_target_image(H, W, seed=1))
    state = init_train_state(jax.random.key(1), cfg)
    res = fit_frame(state, gt, cfg)
    # 4 control events at 100..400, each removing int(0.2/40*200)=1 splat
    alive = int(jnp.sum(res.state.alive))
    assert alive == 200 - 4, alive


def test_fit_frame_adaptive_control():
    H = W = 48
    # P-frame style: start below max, add max*rate at iter 1, prune later
    cfg = FrameConfig(
        H=H, W=W, num_points=160, max_num_points=200, iterations=1100,
        isdensity=True, removal_rate=0.2, densification_interval=100,
        backend="binned",
    )
    gt = jnp.asarray(_target_image(H, W, seed=2))
    state = init_train_state(jax.random.key(2), cfg)
    res = fit_frame(state, gt, cfg)
    # adds 40 at iter 1 (160 -> 200); prunes int(40/5)=8 at each of
    # 500,600,700,800,900 (-> 160); at 1000 prunes down to 160 (no-op)
    alive = int(jnp.sum(res.state.alive))
    assert alive == 160, alive
    assert bool(res.state.lr_frozen)


def test_early_stopping_on_plateau():
    H = W = 32
    # constant-zero target with zero-ish colors: loss plateaus immediately
    cfg = FrameConfig(
        H=H, W=W, num_points=16, max_num_points=16, iterations=5000,
        backend="binned", early_stop_patience=50, early_stop_min_delta=1e-2,
    )
    gt = jnp.zeros((H, W, 3))
    state = init_train_state(jax.random.key(3), cfg)
    res = fit_frame(state, gt, cfg)
    assert int(res.state.it) < 5000  # stopped early


def test_pre_train_frame_runs():
    H = W = 32
    cfg = FrameConfig(
        H=H, W=W, num_points=64, max_num_points=64, iterations=30,
        backend="binned",
    )
    gt = jnp.asarray(_target_image(H, W, seed=3))
    state = init_train_state(jax.random.key(4), cfg)
    res = pre_train_frame(state, gt, cfg)
    assert int(res.state.it) == 30
    assert np.isfinite(float(res.state.loss))


def test_warm_start_from_previous_frame():
    H = W = 48
    cfg = FrameConfig(
        H=H, W=W, num_points=128, max_num_points=128, iterations=400,
        backend="binned",
    )
    gt = jnp.asarray(_target_image(H, W, seed=4))
    s0 = init_train_state(jax.random.key(5), cfg)
    r0 = fit_frame(s0, gt, cfg)
    # warm start on a slightly different frame: initial loss must be far
    # below a cold start's
    gt2 = jnp.clip(gt + 0.02, 0, 1)
    warm_params = r0.state.params
    # premultiply colors like the saved Gmodel (train_video_Represent.py:113)
    import dataclasses as dc

    warm_params = dc.replace(
        warm_params, features_dc=warm_params.get_features,
        rgb_w=jnp.ones_like(warm_params.rgb_w),
    )
    s_warm = init_train_state(jax.random.key(6), cfg, warm=warm_params,
                              warm_count=128)
    r_warm = fit_frame(s_warm, gt2, FrameConfig(**{
        **{f.name: getattr(cfg, f.name) for f in dc.fields(cfg)},
        "iterations": 1,
    }))
    s_cold = init_train_state(jax.random.key(7), cfg)
    r_cold = fit_frame(s_cold, gt2, FrameConfig(**{
        **{f.name: getattr(cfg, f.name) for f in dc.fields(cfg)},
        "iterations": 1,
    }))
    assert float(r_warm.state.loss) < 0.5 * float(r_cold.state.loss)


def test_fit_frame_trace_matches_fit():
    """fit_frame_trace (reference train_iter_trace,
    GaussianSplats_Represent.py:175-188): returns the pre-update render of
    every Nth iteration; the final state matches an equivalent fit run
    without early stopping."""
    from gsvc_tpu.models.represent import fit_frame_trace, make_train_step

    H = W = 48
    cfg = FrameConfig(
        H=H, W=W, num_points=64, max_num_points=64, iterations=6,
        backend="binned",
    )
    gt = jnp.asarray(_target_image(H, W, seed=4))
    state = init_train_state(jax.random.key(3), cfg)
    final, images = fit_frame_trace(state, gt, cfg, trace_every=2)
    assert images.shape == (3, H, W, 3)
    assert int(final.it) == 6
    # trace image k is the render at iteration 2k+2 PRE-update: re-derive
    # iteration 2 by stepping the same state twice and rendering before
    # the second update... i.e. after exactly 1 step.
    step = jax.jit(make_train_step(cfg))
    s1 = step(state, gt)
    img_it2 = render_frame(s1.params, s1.alive, cfg)
    # (atol covers f32 fusion-order differences between compilations)
    np.testing.assert_allclose(
        np.asarray(images[0]), np.asarray(img_it2), rtol=0, atol=1e-5
    )
    # tracing must not change the training trajectory
    s = state
    for _ in range(6):
        s = step(s, gt)
    np.testing.assert_allclose(
        np.asarray(final.params.xyz), np.asarray(s.params.xyz),
        rtol=0, atol=1e-4,
    )


def test_fit_frame_partial_chunks_equal_full_fit():
    """Chaining fit_frame_partial chunks must reproduce fit_frame exactly
    (same compiled step; the chunk boundary only pauses the while_loop)."""
    from gsvc_tpu.models.represent import fit_frame_partial

    H = W = 48
    cfg = FrameConfig(
        H=H, W=W, num_points=64, max_num_points=64, iterations=90,
        backend="binned", isremoval=True, densification_interval=40,
    )
    gt = jnp.asarray(_target_image(H, W, seed=6))
    state = init_train_state(jax.random.key(8), cfg)
    full = fit_frame(state, gt, cfg)
    s = state
    for lo in range(0, 90, 40):
        s = fit_frame_partial(s, gt, min(lo + 40, 90), cfg)
    assert int(s.it) == int(full.state.it) == 90
    np.testing.assert_array_equal(
        np.asarray(s.params.xyz), np.asarray(full.state.params.xyz)
    )
    np.testing.assert_array_equal(
        np.asarray(s.alive), np.asarray(full.state.alive)
    )
    np.testing.assert_array_equal(
        np.asarray(s.loss), np.asarray(full.state.loss)
    )
