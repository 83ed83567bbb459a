import jax.numpy as jnp
import numpy as np

from gsvc_tpu.utils.losses import loss_fn
from gsvc_tpu.utils.metrics import ms_ssim, psnr, ssim


def _pair(seed=0, shape=(1, 3, 180, 200), noise=0.05):
    rng = np.random.default_rng(seed)
    x = rng.uniform(0, 1, shape).astype(np.float32)
    y = np.clip(x + rng.normal(0, noise, shape), 0, 1).astype(np.float32)
    return jnp.asarray(x), jnp.asarray(y)


def _ssim_numpy(x, y, data_range=1.0, win_size=11, sigma=1.5):
    """Independent scipy-free SSIM (valid mode, gaussian window)."""
    coords = np.arange(win_size) - (win_size - 1) / 2.0
    g = np.exp(-(coords**2) / (2 * sigma**2))
    g /= g.sum()

    def filt(im):
        # separable valid-mode convolution over H, W for each N, C
        from numpy.lib.stride_tricks import sliding_window_view

        v = sliding_window_view(im, win_size, axis=2)  # N,C,H-,W,win
        v = np.einsum("nchwk,k->nchw", v, g)
        v = sliding_window_view(v, win_size, axis=3)
        return np.einsum("nchwk,k->nchw", v, g)

    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    mu1, mu2 = filt(x), filt(y)
    s1 = filt(x * x) - mu1**2
    s2 = filt(y * y) - mu2**2
    s12 = filt(x * y) - mu1 * mu2
    cs = (2 * s12 + c2) / (s1 + s2 + c2)
    sm = ((2 * mu1 * mu2 + c1) / (mu1**2 + mu2**2 + c1)) * cs
    return sm.mean()


def test_psnr_known_value():
    x = jnp.zeros((1, 3, 8, 8))
    y = jnp.full((1, 3, 8, 8), 0.1)
    np.testing.assert_allclose(float(psnr(x, y)), 20.0, rtol=1e-5)


def test_ssim_matches_independent_numpy():
    x, y = _pair()
    got = float(ssim(x, y, data_range=1.0))
    want = float(_ssim_numpy(np.asarray(x), np.asarray(y)))
    # f32 device accumulation vs f64 numpy: allow a few ulps of drift
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=1e-5)


def test_ssim_identity_is_one():
    x, _ = _pair(1)
    assert abs(float(ssim(x, x)) - 1.0) < 1e-6
    assert abs(float(ms_ssim(x, x)) - 1.0) < 1e-6


def test_ms_ssim_ordering_and_range():
    x, y_close = _pair(2, noise=0.02)
    _, y_far = _pair(2, noise=0.2)
    v_close = float(ms_ssim(x, y_close))
    v_far = float(ms_ssim(x, y_far))
    assert 0.0 <= v_far < v_close <= 1.0


def test_loss_zoo_runs_and_orders():
    x, y = _pair(3, shape=(1, 3, 170, 190))
    for lt in ["L2", "L1", "SSIM", "Fusion1", "Fusion2", "Fusion3", "Fusion4", "Fusion_hinerv"]:
        v = float(loss_fn(x[0], y[0], lt, lambda_value=0.7))
        assert np.isfinite(v) and v >= 0.0, lt
    assert float(loss_fn(x, x, "L2")) == 0.0
