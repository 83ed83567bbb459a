"""Tests for quantizers, entropy coding, and the QAT compress loop."""

import jax
import jax.numpy as jnp
import numpy as np

from gsvc_tpu.compress.entropy import (
    compress_matrix_flatten_categorical,
    decompress_matrix_flatten_categorical,
    get_np_size,
)
from gsvc_tpu.compress.quantizers import (
    UniformQuantParams,
    fake_quantize_half,
    residual_vq_decompress,
    residual_vq_forward,
    residual_vq_init,
    uniform_quantize,
    uniform_quantizer_init,
)


def test_rans_roundtrip():
    rng = np.random.default_rng(0)
    for _ in range(3):
        msg = rng.integers(0, 40, size=rng.integers(10, 5000))
        comp, counts, unique = compress_matrix_flatten_categorical(msg)
        dec = decompress_matrix_flatten_categorical(
            comp, counts, unique, len(msg), msg.shape
        )
        np.testing.assert_array_equal(dec, msg)


def test_rans_compression_near_entropy():
    rng = np.random.default_rng(1)
    # skewed distribution: entropy well below log2(64)
    p = np.array([0.6, 0.2, 0.1, 0.05, 0.03, 0.02])
    msg = rng.choice(len(p), size=20000, p=p)
    comp, counts, unique = compress_matrix_flatten_categorical(msg)
    bits = get_np_size(comp) * 8
    entropy = -(p * np.log2(p)).sum() * len(msg)
    assert bits < entropy * 1.02 + 64 * 8, (bits, entropy)


def test_fake_quantize_half():
    x = jnp.asarray([0.1234567, -3.14159, 1e-5])
    y = fake_quantize_half(x)
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(x, np.float16).astype(np.float32)
    )
    g = jax.grad(lambda v: jnp.sum(fake_quantize_half(v) * 3.0))(x)
    np.testing.assert_allclose(np.asarray(g), 3.0)  # identity backward


def test_uniform_quantizer_values_and_grads():
    qp = uniform_quantizer_init(3, bits=6)
    x = jnp.asarray(np.random.default_rng(2).uniform(0, 1, (50, 3)), jnp.float32)
    deq, codes = uniform_quantize(x, qp, bits=6)
    assert codes.min() >= 0 and codes.max() <= 63
    # dequant error bounded by scale/2 within the clamp range
    inside = (codes > 0) & (codes < 63)
    err = np.abs(np.asarray(deq - x))
    assert err[np.asarray(inside)].max() <= float(qp.scale[0]) / 2 + 1e-6
    # gradients flow to x, scale, beta
    g = jax.grad(
        lambda x_, s, b: jnp.sum(
            uniform_quantize(x_, UniformQuantParams(s, b), 6)[0] ** 2
        ),
        argnums=(0, 1, 2),
    )(x, qp.scale, qp.beta)
    assert all(np.any(np.asarray(gi) != 0) for gi in g)


def test_residual_vq_reduces_error_and_roundtrips():
    rng = np.random.default_rng(3)
    x = jnp.asarray(
        np.concatenate(
            [rng.normal(c, 0.05, (100, 3)) for c in (0.1, 0.4, 0.8)]
        ).astype(np.float32)
    )
    state = residual_vq_init(2, 8, 3)
    key = jax.random.key(0)
    q, idx, loss, state = jax.jit(
        lambda x, s: residual_vq_forward(x, s, key, True)
    )(x, state)
    assert bool(state.initted)
    err1 = float(jnp.mean((q - x) ** 2))
    # stage-2 residual coding must beat stage-1 alone
    q1 = np.asarray(state.embed[0])[np.asarray(idx)[:, 0]]
    err_stage1 = float(np.mean((q1 - np.asarray(x)) ** 2))
    assert err1 < err_stage1
    # decompress from indices reproduces the eval-mode quantized values
    q_eval, idx_eval, _, _ = jax.jit(
        lambda x, s: residual_vq_forward(x, s, key, False)
    )(x, state)
    rec = residual_vq_decompress(state, np.asarray(idx_eval))
    np.testing.assert_allclose(rec, np.asarray(q_eval), rtol=1e-5, atol=1e-6)


def test_vq_ema_improves_codebook():
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.uniform(0, 1, (300, 3)).astype(np.float32))
    state = residual_vq_init(2, 8, 3)
    key = jax.random.key(1)
    step = jax.jit(lambda x, s, k: residual_vq_forward(x, s, k, True))
    errs = []
    for i in range(30):
        q, _, _, state = step(x, state, jax.random.fold_in(key, i))
        errs.append(float(jnp.mean((q - x) ** 2)))
    assert errs[-1] <= errs[0] * 1.05


def test_fit_compress_improves_quantized_psnr():
    from gsvc_tpu.config import FrameConfig
    from gsvc_tpu.models.compress import (
        fit_compress,
        init_compress_state,
        measure_bits,
    )

    H = W = 48
    rng = np.random.default_rng(5)
    n = 100
    gmodel = {
        "_xyz": np.arctanh(rng.uniform(-0.9, 0.9, (n, 2))).astype(np.float32),
        "_cholesky": rng.uniform(0, 1, (n, 3)).astype(np.float32),
        "_features_dc": rng.uniform(0, 1, (n, 3)).astype(np.float32),
    }
    cfg = FrameConfig(
        H=H, W=W, num_points=n, max_num_points=n, iterations=120,
        backend="binned",
    )
    # target: the un-quantized render of the same splats
    from gsvc_tpu.core import SplatParams
    from gsvc_tpu.models.represent import render_frame

    params = SplatParams(
        xyz=jnp.asarray(gmodel["_xyz"]),
        cholesky=jnp.asarray(gmodel["_cholesky"]),
        features_dc=jnp.asarray(gmodel["_features_dc"]),
        rgb_w=jnp.ones((n, 1)),
    )
    gt = render_frame(params, jnp.ones(n, bool), cfg)

    state = init_compress_state(jax.random.key(0), gmodel)
    state = fit_compress(state, gt, cfg)
    bits, img = measure_bits(state, cfg)
    mse = float(jnp.mean((img - gt) ** 2))
    psnr = 10 * np.log10(1 / mse)
    assert psnr > 20, psnr
    assert bits["bpp"] > 0
    assert bits["m_bit"] == 16 * n * 2
    assert int(state.it) == 120


def test_fit_compress_delta_mode():
    from gsvc_tpu.config import FrameConfig
    from gsvc_tpu.models.compress import (
        fit_compress,
        init_compress_state,
        measure_bits,
    )
    from gsvc_tpu.core import SplatParams
    from gsvc_tpu.models.represent import render_frame

    H = W = 48
    rng = np.random.default_rng(6)
    n = 80
    p_gmodel = {
        "_xyz": np.arctanh(rng.uniform(-0.9, 0.9, (n, 2))).astype(np.float32),
        "_cholesky": rng.uniform(0, 1, (n, 3)).astype(np.float32),
        "_features_dc": rng.uniform(0, 1, (n, 3)).astype(np.float32),
    }
    gmodel = {
        k: (v + rng.normal(0, 0.02, v.shape)).astype(np.float32)
        for k, v in p_gmodel.items()
    }
    cfg = FrameConfig(
        H=H, W=W, num_points=n, max_num_points=n, iterations=80,
        backend="binned",
    )
    params = SplatParams(
        xyz=jnp.asarray(gmodel["_xyz"]),
        cholesky=jnp.asarray(gmodel["_cholesky"]),
        features_dc=jnp.asarray(gmodel["_features_dc"]),
        rgb_w=jnp.ones((n, 1)),
    )
    gt = render_frame(params, jnp.ones(n, bool), cfg)
    state = init_compress_state(jax.random.key(1), gmodel, p_gmodel)
    state = fit_compress(state, gt, cfg)
    bits, img = measure_bits(state, cfg)
    mse = float(jnp.mean((img - gt) ** 2))
    assert 10 * np.log10(1 / mse) > 20


def test_fit_compress_chunked_equals_full():
    """fit_compress_chunked must reproduce fit_compress exactly (step
    counter rides the state; best snapshot reloaded once at the end)."""
    import dataclasses

    from gsvc_tpu.models.compress import (
        fit_compress,
        fit_compress_chunked,
        init_compress_state,
    )

    rng = np.random.default_rng(7)
    n = 48
    gmodel = {
        "_xyz": rng.normal(0, 0.5, (n, 2)).astype(np.float32),
        "_cholesky": rng.uniform(0, 1, (n, 3)).astype(np.float32),
        "_features_dc": rng.uniform(0, 1, (n, 3)).astype(np.float32),
    }
    from gsvc_tpu.config import FrameConfig

    cfg = FrameConfig(
        H=48, W=48, num_points=n, max_num_points=n, iterations=10,
        backend="binned",
    )
    gt = jnp.asarray(rng.uniform(0, 1, (48, 48, 3)), jnp.float32)
    state = init_compress_state(jax.random.key(3), gmodel)
    full = fit_compress(state, gt, cfg)
    chunked = fit_compress_chunked(state, gt, cfg, chunk=4)
    for a, b in zip(jax.tree.leaves(full.params), jax.tree.leaves(chunked.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(
        np.asarray(full.vq.embed), np.asarray(chunked.vq.embed)
    )
