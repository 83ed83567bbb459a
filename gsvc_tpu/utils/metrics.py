"""Image quality metrics in JAX: PSNR, SSIM, MS-SSIM.

The reference relies on the external `pytorch_msssim` package
(utils.py:3, train_video_Represent.py:145). This module reimplements the
same math natively in JAX so metrics run on-device inside jitted eval steps:

- SSIM: 11-tap Gaussian window (sigma 1.5), valid-mode separable filtering,
  K1=0.01, K2=0.03 — the pytorch_msssim defaults.
- MS-SSIM: 5 scales, weights (0.0448, 0.2856, 0.3001, 0.2363, 0.1333),
  2x average-pool downsampling with odd-size padding, relu'd per-scale
  contrast terms — matching pytorch_msssim's `ms_ssim`.

Images are NCHW float in [0, data_range], as in the reference call sites.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

MS_SSIM_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


def psnr(pred: jax.Array, target: jax.Array, data_range: float = 1.0) -> jax.Array:
    """10*log10(data_range^2 / mse) (reference GaussianSplats_Represent.py:196-198)."""
    mse = jnp.mean((pred.astype(jnp.float32) - target.astype(jnp.float32)) ** 2)
    return 10.0 * jnp.log10(data_range**2 / mse)


def _gaussian_window(win_size: int, sigma: float) -> jax.Array:
    coords = jnp.arange(win_size, dtype=jnp.float32) - (win_size - 1) / 2.0
    g = jnp.exp(-(coords**2) / (2.0 * sigma**2))
    return g / jnp.sum(g)


def _filter2d_separable(x: jax.Array, win: jax.Array) -> jax.Array:
    """Depthwise valid-mode separable Gaussian filter over NCHW."""
    n, c, h, w = x.shape
    k = win.shape[0]
    win_h = win.reshape(1, 1, k, 1).astype(x.dtype)
    win_w = win.reshape(1, 1, 1, k).astype(x.dtype)
    dn = jax.lax.conv_dimension_numbers(x.shape, (1, 1, k, 1), ("NCHW", "OIHW", "NCHW"))
    hp = jax.lax.Precision.HIGHEST
    y = jax.lax.conv_general_dilated(
        x.reshape(n * c, 1, h, w), win_h, (1, 1), "VALID",
        dimension_numbers=dn, precision=hp,
    )
    y = jax.lax.conv_general_dilated(
        y, win_w, (1, 1), "VALID", dimension_numbers=dn, precision=hp,
    )
    return y.reshape(n, c, y.shape[-2], y.shape[-1])


def _ssim_maps(x, y, win, data_range, k1=0.01, k2=0.03):
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    # Center by the joint global mean before filtering. Filtering is linear,
    # so this is exact algebra (mu = mu_centered + c), but it avoids the f32
    # catastrophic cancellation of filter(x^2) - mu^2 on low-variance scales
    # (which can push SSIM above 1 on heavily pooled images).
    c = jax.lax.stop_gradient(0.5 * (jnp.mean(x) + jnp.mean(y)))
    xc = x - c
    yc = y - c
    mu1c = _filter2d_separable(xc, win)
    mu2c = _filter2d_separable(yc, win)
    mu1 = mu1c + c
    mu2 = mu2c + c
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = _filter2d_separable(xc * xc, win) - mu1c * mu1c
    sigma2_sq = _filter2d_separable(yc * yc, win) - mu2c * mu2c
    sigma12 = _filter2d_separable(xc * yc, win) - mu1c * mu2c
    cs_map = (2.0 * sigma12 + c2) / (sigma1_sq + sigma2_sq + c2)
    ssim_map = ((2.0 * mu1_mu2 + c1) / (mu1_sq + mu2_sq + c1)) * cs_map
    return ssim_map, cs_map


@partial(jax.jit, static_argnames=("data_range", "win_size", "win_sigma", "size_average"))
def ssim(
    pred: jax.Array,
    target: jax.Array,
    data_range: float = 1.0,
    win_size: int = 11,
    win_sigma: float = 1.5,
    size_average: bool = True,
) -> jax.Array:
    """SSIM over NCHW images (pytorch_msssim-compatible)."""
    win = _gaussian_window(win_size, win_sigma)
    ssim_map, _ = _ssim_maps(
        pred.astype(jnp.float32), target.astype(jnp.float32), win, data_range
    )
    per_channel = jnp.mean(ssim_map, axis=(-2, -1))
    return jnp.mean(per_channel) if size_average else jnp.mean(per_channel, axis=1)


def _avg_pool2_padded(x: jax.Array) -> jax.Array:
    """2x2 avg-pool, stride 2, padding odd dims by one (pytorch_msssim style)."""
    pad_h = x.shape[-2] % 2
    pad_w = x.shape[-1] % 2
    # torch avg_pool2d with padding pads symmetrically with zeros and divides
    # by the full kernel area; pytorch_msssim passes padding=(h%2, w%2) which
    # pads both sides — output size (h+2*pad-2)//2+1.
    x = jnp.pad(
        x, ((0, 0), (0, 0), (pad_h, pad_h), (pad_w, pad_w)), mode="constant"
    )
    y = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 1, 2, 2), (1, 1, 2, 2), "VALID"
    )
    return y / 4.0


@partial(jax.jit, static_argnames=("data_range", "win_size", "win_sigma", "size_average"))
def ms_ssim(
    pred: jax.Array,
    target: jax.Array,
    data_range: float = 1.0,
    win_size: int = 11,
    win_sigma: float = 1.5,
    size_average: bool = True,
) -> jax.Array:
    """Multi-scale SSIM over NCHW images (pytorch_msssim-compatible).

    pytorch_msssim *asserts* min side > (win_size-1)*2^4; instead of
    erroring we drop scales until the smallest one still fits the window
    (weights renormalized), so tiny test images get a sane value.
    """
    x = pred.astype(jnp.float32)
    y = target.astype(jnp.float32)
    win = _gaussian_window(win_size, win_sigma)
    min_side = min(pred.shape[-2], pred.shape[-1])
    levels = len(MS_SSIM_WEIGHTS)
    while levels > 1 and (min_side >> (levels - 1)) < win_size:
        levels -= 1
    weights = jnp.asarray(MS_SSIM_WEIGHTS[:levels], jnp.float32)
    weights = weights / jnp.sum(weights)
    mcs = []
    ssim_pc = None
    for lvl in range(levels):
        ssim_map, cs_map = _ssim_maps(x, y, win, data_range)
        ssim_pc = jnp.mean(ssim_map, axis=(-2, -1))
        if lvl < levels - 1:
            mcs.append(jax.nn.relu(jnp.mean(cs_map, axis=(-2, -1))))
            x = _avg_pool2_padded(x)
            y = _avg_pool2_padded(y)
    ssim_pc = jax.nn.relu(ssim_pc)
    stack = jnp.stack(mcs + [ssim_pc], axis=0)  # [levels, N, C]
    val = jnp.prod(stack ** weights[:, None, None], axis=0)
    return jnp.mean(val) if size_average else jnp.mean(val, axis=1)
