"""Quantizers for the compression stage, in functional JAX.

Replaces the reference quantize.py stack:
- `fake_quantize_half`: FakeQuantizationHalf (quantize.py:15-24) — fp16
  forward, identity backward.
- `uniform_quantize` + `UniformQuantParams`: learned-scale uniform quantizer
  (quantize.py:26-87). NOTE reference quirk: the grad_scale calls at
  quantize.py:54-55 are immediately overwritten at :56, so scale/beta get
  plain gradients — reproduced here by simply using them directly. The
  trainer also never calls `_init_data` (train_video_Compress.py), so
  scale/beta start at 1/qmax and learn by gradient — reproduced by
  `uniform_quantizer_init`.
- `residual_vq_*`: a 2-stage residual vector quantizer with EMA codebooks
  and k-means init, equivalent to vector_quantize_pytorch's ResidualVQ as
  configured at GaussianSplats_Compress.py:36 (dim=3, codebook_size=8,
  num_quantizers=2, decay=0.8, commitment_weight=1.0, kmeans_iters=5).
  Codebooks update by EMA during training (not by gradient); quantized
  outputs pass gradients straight through; the commitment loss
  mse(x, stop_grad(q)) is returned per stage and summed by the caller
  (GaussianSplats_Compress.py:105-107).

Bit accounting (eval): ANS-compressed index streams + raw codebook/scale
payloads, mirroring quantize.py:72-80 and :116-140.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _ste_round(x: jax.Array) -> jax.Array:
    """round with straight-through gradient (quantize.py:12-13)."""
    return x + jax.lax.stop_gradient(jnp.round(x) - x)


def fake_quantize_half(x: jax.Array) -> jax.Array:
    """fp16 forward / identity backward (quantize.py:15-24)."""
    return x + jax.lax.stop_gradient(
        x.astype(jnp.float16).astype(jnp.float32) - x
    )


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class UniformQuantParams:
    """Trainable per-channel scale and offset (quantize.py:39-40)."""

    scale: jax.Array  # [C]
    beta: jax.Array  # [C]


def uniform_quantizer_init(
    num_channels: int, bits: int = 6, signed: bool = False
) -> UniformQuantParams:
    qmax = (2 ** (bits - 1) - 1) if signed else (2**bits - 1)
    return UniformQuantParams(
        scale=jnp.full((num_channels,), 1.0 / qmax, jnp.float32),
        beta=jnp.full((num_channels,), 1.0 / qmax, jnp.float32),
    )


def uniform_quantize(
    x: jax.Array, qp: UniformQuantParams, bits: int = 6, signed: bool = False
) -> Tuple[jax.Array, jax.Array]:
    """Learned uniform quantization. Returns (dequant, integer codes).

    Mirrors quantize.py:51-59: code = clamp((x-beta)/scale, qmin, qmax);
    quant = ste_round(code); dequant = quant*scale + beta. Gradients flow to
    x, scale, beta through the dequant expression.
    """
    qmin = -(2 ** (bits - 1)) if signed else 0
    qmax = (2 ** (bits - 1) - 1) if signed else (2**bits - 1)
    code = jnp.clip((x - qp.beta) / qp.scale, qmin, qmax)
    quant = _ste_round(code)
    dequant = quant * qp.scale + qp.beta
    return dequant, jax.lax.stop_gradient(jnp.round(code)).astype(jnp.int32)


# ---------------------------------------------------------------------------
# Residual VQ with EMA codebooks
# ---------------------------------------------------------------------------


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class VQState:
    """EMA codebook state for all residual stages.

    embed: [Q, K, D] codebooks; cluster_size/embed_avg: EMA stats
    (vector_quantize_pytorch EuclideanCodebook); initted: k-means done.
    """

    embed: jax.Array
    cluster_size: jax.Array
    embed_avg: jax.Array
    initted: jax.Array  # [] bool


def residual_vq_init(
    num_quantizers: int = 2, codebook_size: int = 8, dim: int = 3
) -> VQState:
    return VQState(
        embed=jnp.zeros((num_quantizers, codebook_size, dim), jnp.float32),
        cluster_size=jnp.zeros((num_quantizers, codebook_size), jnp.float32),
        embed_avg=jnp.zeros((num_quantizers, codebook_size, dim), jnp.float32),
        initted=jnp.bool_(False),
    )


def _kmeans(key, x, k, iters):
    """Lloyd's k-means matching vector_quantize_pytorch's kmeans init
    (random sample init, `iters` refinement steps)."""
    n = x.shape[0]
    idx = jax.random.permutation(key, n)[:k]
    means = x[idx]

    def step(means, _):
        d = jnp.sum((x[:, None, :] - means[None, :, :]) ** 2, -1)
        assign = jnp.argmin(d, -1)
        one_hot = jax.nn.one_hot(assign, k, dtype=x.dtype)
        counts = one_hot.sum(0)
        sums = one_hot.T @ x
        new = jnp.where(counts[:, None] > 0, sums / jnp.maximum(counts[:, None], 1), means)
        return new, None

    means, _ = jax.lax.scan(step, means, None, length=iters)
    d = jnp.sum((x[:, None, :] - means[None, :, :]) ** 2, -1)
    assign = jnp.argmin(d, -1)
    one_hot = jax.nn.one_hot(assign, k, dtype=x.dtype)
    counts = one_hot.sum(0)
    sums = one_hot.T @ x
    return means, counts, sums


def _stage_forward(x, embed, cluster_size, embed_avg, training, decay, eps=1e-5):
    """One EuclideanCodebook forward + EMA update."""
    d = jnp.sum((x[:, None, :] - embed[None, :, :]) ** 2, -1)
    idx = jnp.argmin(d, -1)
    q = embed[idx]
    k = embed.shape[0]

    def update():
        one_hot = jax.nn.one_hot(idx, k, dtype=x.dtype)
        counts = one_hot.sum(0)
        sums = one_hot.T @ x
        new_cs = cluster_size * decay + counts * (1 - decay)
        new_ea = embed_avg * decay + sums * (1 - decay)
        # laplace-smoothed normalization (vector_quantize_pytorch)
        n = jnp.sum(new_cs)
        smoothed = (new_cs + eps) / (n + k * eps) * n
        new_embed = new_ea / smoothed[:, None]
        return new_embed, new_cs, new_ea

    if training:
        new_embed, new_cs, new_ea = update()
    else:
        new_embed, new_cs, new_ea = embed, cluster_size, embed_avg
    return q, idx, new_embed, new_cs, new_ea


def residual_vq_forward(
    x: jax.Array,
    state: VQState,
    key: jax.Array,
    training: bool,  # static
    decay: float = 0.8,
    kmeans_iters: int = 5,
) -> Tuple[jax.Array, jax.Array, jax.Array, VQState]:
    """Residual VQ over [N, D]. Returns (quantized, indices [N, Q],
    commit_loss_sum, new_state).

    Quantized output carries straight-through gradients to x; commitment
    loss is sum over stages of mse(x_stage, stop_grad(q_stage)).
    """
    nq, k, dim = state.embed.shape

    def do_init(state):
        keys = jax.random.split(key, nq)
        embeds, css, eas = [], [], []
        residual = jax.lax.stop_gradient(x)
        for qi in range(nq):
            means, counts, sums = _kmeans(keys[qi], residual, k, kmeans_iters)
            embeds.append(means)
            css.append(counts)
            eas.append(sums)
            d = jnp.sum((residual[:, None, :] - means[None, :, :]) ** 2, -1)
            residual = residual - means[jnp.argmin(d, -1)]
        return VQState(
            embed=jnp.stack(embeds),
            cluster_size=jnp.stack(css),
            embed_avg=jnp.stack(eas),
            initted=jnp.bool_(True),
        )

    if training:
        state = jax.lax.cond(
            jnp.logical_not(state.initted), do_init, lambda s: s, state
        )

    residual = x
    quant_total = jnp.zeros_like(x)
    losses = []
    indices = []
    new_embed, new_cs, new_ea = [], [], []
    for qi in range(nq):
        q, idx, e, cs, ea = _stage_forward(
            jax.lax.stop_gradient(residual),
            state.embed[qi], state.cluster_size[qi], state.embed_avg[qi],
            training, decay,
        )
        losses.append(jnp.mean((jax.lax.stop_gradient(q) - residual) ** 2))
        indices.append(idx)
        new_embed.append(e)
        new_cs.append(cs)
        new_ea.append(ea)
        quant_total = quant_total + q
        residual = residual - q
    # straight-through: gradients of the summed quantization flow to x
    quant_st = x + jax.lax.stop_gradient(quant_total - x)
    new_state = VQState(
        embed=jnp.stack(new_embed),
        cluster_size=jnp.stack(new_cs),
        embed_avg=jnp.stack(new_ea),
        initted=state.initted | jnp.bool_(training),
    )
    commit = jnp.sum(jnp.stack(losses))
    return quant_st, jnp.stack(indices, -1), commit, new_state


def residual_vq_decompress(state: VQState, indices: np.ndarray) -> np.ndarray:
    """Reconstruct from per-stage indices (reference quantize.py:146-150)."""
    embed = np.asarray(state.embed)
    recon = np.zeros((indices.shape[0], embed.shape[-1]), np.float32)
    for qi in range(embed.shape[0]):
        recon += embed[qi][np.asarray(indices)[:, qi]]
    return recon
