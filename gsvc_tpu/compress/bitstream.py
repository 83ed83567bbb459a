"""Frame bitstream: serialize the quantized splat model to bytes and decode
it back to a rendered frame.

The reference measures bits (quantize.py:72-80,:116-140) but never decodes
a frame from its own bitstream — `.compress/.decompress` exist per-tensor
yet no path reconstructs an image purely from coded artifacts. This module
closes that loop: `encode_frame` emits exactly the byte streams the bpp
accounting counts (fp16 means, ANS-coded 6-bit cholesky codes + f32
scale/beta, VQ codebook + ANS-coded stage indices), and `decode_frame` +
`render_decoded` reconstruct the frame equal to the encoder's eval-mode
render to float-ulp tolerance (codes/indices round-trip exactly; the only
slack is XLA's freedom to fuse the dequant mul+add — tests/test_bitstream.py).

Delta frames: the reference's P-frame model adds frozen `p_*` buffers
taken from the PREVIOUS frame's representation checkpoint
(train_video_Compress.py:51-72) and does NOT count them in bpp — its
implied decoder carries them as side information. `decode_frame` takes the
same side info explicitly, documenting (not hiding) that accounting quirk.
"""

from __future__ import annotations

import functools
import io
from typing import Optional

import numpy as np

from gsvc_tpu.compress.entropy import (
    compress_matrix_flatten_categorical,
    decompress_matrix_flatten_categorical,
)

CHOL_BITS = 6


def encode_frame(state, cfg) -> bytes:
    """CompressState (post fit_compress) -> self-contained byte stream.

    Streams exactly what `measure_bits` counts; the container adds a few
    fixed-size lengths (uint32 framing) so the payload is parseable.
    """
    import jax
    import jax.numpy as jnp

    from gsvc_tpu.compress.quantizers import (
        UniformQuantParams,
        residual_vq_forward,
        uniform_quantize,
    )

    p = state.params
    n = int(p.xyz.shape[0])
    xyz16 = np.asarray(p.xyz, np.float32).astype(np.float16)  # fp16 means

    _deq, chol_codes = jax.jit(
        lambda x, s, b: uniform_quantize(
            x, UniformQuantParams(scale=s, beta=b), CHOL_BITS
        )
    )(p.cholesky, p.q_scale, p.q_beta)
    codes = np.asarray(chol_codes, np.int32).flatten()
    c_comp, c_counts, c_unique = compress_matrix_flatten_categorical(codes)

    _colors, idx, _l, _ = jax.jit(
        lambda f, vq: residual_vq_forward(
            f, vq, jax.random.key(0), training=False
        )
    )(p.features_dc, state.vq)
    idx_np = np.asarray(idx, np.int32)  # [N, Q] (stage axis last)
    i_comp, i_counts, i_unique = compress_matrix_flatten_categorical(
        idx_np.flatten()
    )
    embed = np.asarray(state.vq.embed, np.float32)  # [Q, K, D]

    out = io.BytesIO()

    def put(arr: np.ndarray):
        arr = np.asarray(arr)
        dt = arr.dtype.str.encode()  # e.g. b'<i8', b'<f4', b'|i1'
        out.write(np.uint8(len(dt)).tobytes())
        out.write(dt)
        raw = arr.tobytes()
        out.write(np.uint32(len(raw)).tobytes())
        out.write(raw)

    out.write(np.uint32(n).tobytes())
    out.write(np.uint32(embed.shape[0]).tobytes())  # Q
    out.write(np.uint32(embed.shape[1]).tobytes())  # K
    put(xyz16)
    put(np.asarray(p.q_scale, np.float32))
    put(np.asarray(p.q_beta, np.float32))
    put(np.asarray(c_comp))
    put(np.asarray(c_counts))
    put(np.asarray(c_unique))
    put(embed)
    put(np.asarray(i_comp))
    put(np.asarray(i_counts))
    put(np.asarray(i_unique))
    # self-describing frame-type TRAILER (backward compatible: legacy
    # parsers read exact lengths from the front and never see it): 'K' =
    # standalone frame, 'P' = delta frame needing previous-frame side
    # info. Lets the decoder detect a wrong/missing K-frame schedule
    # instead of silently adding bogus side info.
    is_delta = bool(np.any(np.asarray(state.p_xyz) != 0)) or bool(
        np.any(np.asarray(state.p_cholesky) != 0)
    ) or bool(np.any(np.asarray(state.p_features_dc) != 0))
    out.write(b"GSV1" + (b"P" if is_delta else b"K"))
    return out.getvalue()


def frame_type(blob: bytes) -> Optional[str]:
    """'K' or 'P' from the self-describing trailer; None for legacy
    streams written before the trailer existed."""
    if len(blob) >= 5 and blob[-5:-1] == b"GSV1":
        return chr(blob[-1])
    return None


def decode_frame(
    blob: bytes,
    p_xyz: Optional[np.ndarray] = None,
    p_cholesky: Optional[np.ndarray] = None,
    p_features_dc: Optional[np.ndarray] = None,
):
    """Bytes -> decoded raw render inputs (means, cholesky+bound, colors).

    p_* are the delta-frame side-information buffers (None for K-frames);
    see the module docstring.
    """
    from gsvc_tpu.core import CHOLESKY_BOUND

    buf = memoryview(blob)
    off = 0

    def take(nbytes):
        nonlocal off
        v = buf[off:off + nbytes]
        off += nbytes
        return v

    def get():
        dl = int(np.frombuffer(take(1), np.uint8)[0])
        dt = np.dtype(bytes(take(dl)).decode())
        ln = int(np.frombuffer(take(4), np.uint32)[0])
        return np.frombuffer(take(ln), dt).copy()

    n = int(np.frombuffer(take(4), np.uint32)[0])
    q = int(np.frombuffer(take(4), np.uint32)[0])
    k = int(np.frombuffer(take(4), np.uint32)[0])
    xyz16 = get().reshape(n, 2)
    q_scale = get()
    q_beta = get()
    c_comp, c_counts, c_unique = get(), get(), get()
    embed = get().reshape(q, k, 3)
    i_comp, i_counts, i_unique = get(), get(), get()

    codes = decompress_matrix_flatten_categorical(
        c_comp, c_counts, c_unique, n * 3, (n, 3)
    ).astype(np.float32)
    chol_deq = codes * q_scale[None, :] + q_beta[None, :]
    idx = decompress_matrix_flatten_categorical(
        i_comp, i_counts, i_unique, q * n, (n, q)
    )
    colors = np.zeros((n, 3), np.float32)
    for s in range(q):
        colors += embed[s][idx[:, s]]

    zeros2 = np.zeros((n, 2), np.float32)
    zeros3 = np.zeros((n, 3), np.float32)
    p_xyz = zeros2 if p_xyz is None else np.asarray(p_xyz, np.float32)
    p_chol = zeros3 if p_cholesky is None else np.asarray(p_cholesky, np.float32)
    p_feat = zeros3 if p_features_dc is None else np.asarray(
        p_features_dc, np.float32
    )
    # tanh via jnp so the decode is BIT-exact vs the encoder's eval render
    # (np.tanh and XLA tanh differ in the last ulp)
    import jax.numpy as jnp

    means = np.asarray(jnp.tanh(jnp.asarray(xyz16.astype(np.float32) + p_xyz)))
    chol = chol_deq + np.asarray(CHOLESKY_BOUND, np.float32) + p_chol
    return means, chol, colors + p_feat


@functools.lru_cache(maxsize=8)
def _render_fn(cfg):
    """One jitted render per FrameConfig (lru-cached): a fresh jit per
    call would retrace every frame of a decode run."""
    import jax
    import jax.numpy as jnp

    from gsvc_tpu.ops.projection import project_gaussians_2d
    from gsvc_tpu.ops.rasterize import rasterize_gaussians_sum

    @jax.jit
    def go(means, chol, colors):
        xys, depths, radii, conics, nth = project_gaussians_2d(
            means, chol, cfg.H, cfg.W, cfg.tile_bounds,
            cfg.block_w, cfg.block_h,
        )
        opacity = jnp.ones((means.shape[0], 1), jnp.float32)
        img = rasterize_gaussians_sum(
            xys, depths, radii, conics, nth, colors, opacity,
            cfg.H, cfg.W, cfg.block_h, cfg.block_w,
            backend=cfg.backend, max_intersects=cfg.max_intersects,
        )
        return jnp.clip(img, 0.0, 1.0)

    return go


def render_decoded(means, chol, colors, cfg):
    """Render the decoded splats — the plain (quantizer-free) pipeline."""
    import jax.numpy as jnp

    return _render_fn(cfg)(
        jnp.asarray(means), jnp.asarray(chol), jnp.asarray(colors)
    )
