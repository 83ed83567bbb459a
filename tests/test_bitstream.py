"""Frame bitstream round-trip: encode -> bytes -> decode -> render.

Closes the loop the reference never does (its `.compress/.decompress`
exist per-tensor but nothing reconstructs a frame from coded artifacts):
a frame decoded purely from the byte stream must reproduce the encoder's
eval-mode render.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsvc_tpu.compress.bitstream import (
    decode_frame,
    encode_frame,
    render_decoded,
)
from gsvc_tpu.config import FrameConfig
from gsvc_tpu.models.compress import (
    fit_compress,
    forward_quantize,
    init_compress_state,
    measure_bits,
)


def _fit_tiny(delta: bool, H=48, W=64, n=64, iters=25):
    rng = np.random.default_rng(0)
    gmodel = {
        "_xyz": rng.normal(0, 0.5, (n, 2)).astype(np.float32),
        "_cholesky": rng.uniform(0, 1, (n, 3)).astype(np.float32),
        "_features_dc": rng.uniform(0, 1, (n, 3)).astype(np.float32),
    }
    p_gmodel = None
    if delta:
        p_gmodel = {
            k: (v + rng.normal(0, 0.05, v.shape)).astype(np.float32)
            for k, v in gmodel.items()
        }
    cfg = FrameConfig(
        H=H, W=W, num_points=n, max_num_points=n, iterations=iters,
        backend="binned",
    )
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    gt = jnp.asarray(
        np.stack([xx / W, yy / H, 0.5 + 0 * xx], -1), jnp.float32
    )
    state = init_compress_state(jax.random.key(0), gmodel, p_gmodel)
    state = fit_compress(state, gt, cfg)
    return state, cfg


@pytest.mark.parametrize("delta", [False, True])
def test_bitstream_roundtrip_matches_eval_render(delta):
    state, cfg = _fit_tiny(delta)
    # encoder-side eval render (what measure_bits reports bits for)
    bits, img_enc = measure_bits(state, cfg)
    blob = encode_frame(state, cfg)
    # the stream's payload is within framing overhead of the bpp accounting
    payload_bits = len(blob) * 8
    counted = bits["m_bit"] + bits["s_bit"] + bits["c_bit"]
    assert counted <= payload_bits <= counted + 2048, (payload_bits, counted)

    kwargs = {}
    if delta:
        kwargs = dict(
            p_xyz=np.asarray(state.p_xyz),
            p_cholesky=np.asarray(state.p_cholesky),
            p_features_dc=np.asarray(state.p_features_dc),
        )
    means, chol, colors = decode_frame(blob, **kwargs)
    img_dec = render_decoded(means, chol, colors, cfg)
    np.testing.assert_allclose(
        np.asarray(img_dec), np.asarray(img_enc), rtol=0, atol=2e-6
    )


def test_decoded_components_match_encoder_exactly():
    """Codes, indices, and quantized params survive the byte stream
    bit-for-bit (only the renders may differ in the last float ulp)."""
    state, cfg = _fit_tiny(False)
    from gsvc_tpu.compress.quantizers import (
        UniformQuantParams,
        residual_vq_forward,
        uniform_quantize,
    )

    blob = encode_frame(state, cfg)
    means, chol, colors = decode_frame(blob)

    from gsvc_tpu.core import CHOLESKY_BOUND
    from gsvc_tpu.compress.quantizers import fake_quantize_half

    deq, _codes = uniform_quantize(
        state.params.cholesky,
        UniformQuantParams(state.params.q_scale, state.params.q_beta),
    )
    chol_ref = np.asarray(deq) + np.asarray(CHOLESKY_BOUND, np.float32)
    np.testing.assert_allclose(chol, chol_ref, rtol=0, atol=1e-7)

    # eval forward emits the straight-through form x + (q - x), which can
    # differ from the decoder's plain codebook sum q by one f32 rounding
    colors_ref, _i, _l, _ = residual_vq_forward(
        state.params.features_dc, state.vq, jax.random.key(0), False
    )
    np.testing.assert_allclose(
        colors, np.asarray(colors_ref), rtol=0, atol=1e-6
    )

    means_ref = jnp.tanh(
        fake_quantize_half(jnp.asarray(state.params.xyz))
    )
    np.testing.assert_array_equal(means, np.asarray(means_ref))
