"""Probe which in-kernel dot_general orientations Mosaic accepts for an
MXU-based transpose, and validate numerics. Small kernel -> fast compiles.

Run ON TPU: PYTHONPATH=/root/.axon_site:/root/repo python scripts/probe_mxu_transpose.py
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R, C = 360, 256


def eye_bf16(n):
    ii = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    return (ii == jj).astype(jnp.bfloat16)


def split3(x):
    hi = x.astype(jnp.bfloat16)
    r = x - hi.astype(jnp.float32)
    mid = r.astype(jnp.bfloat16)
    lo = (r - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, mid, lo


def variant_kernel(x_ref, o_ref, *, mode):
    x = x_ref[...]
    if mode == "lhs0":  # contract lhs dim0 with eye dim0 -> [C, R]
        h, m, l = split3(x)
        x3 = jnp.concatenate([h, m, l], axis=0)
        e3 = jnp.concatenate([eye_bf16(R)] * 3, axis=0)
        o_ref[...] = jax.lax.dot_general(
            x3, e3, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
    elif mode == "rhs1":  # lhs=eye standard, contract rhs dim1 -> [C, R]
        h, m, l = split3(x)
        x3 = jnp.concatenate([h, m, l], axis=1)
        e3 = jnp.concatenate([eye_bf16(C)] * 3, axis=1)
        o_ref[...] = jax.lax.dot_general(
            e3, x3, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
    elif mode == "f32lhs0":  # plain f32, contract lhs dim0
        o_ref[...] = jax.lax.dot_general(
            x, eye_bf16(R).astype(jnp.float32),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
    elif mode == "f32rhs1":  # plain f32 eye-lhs standard, rhs transposed
        o_ref[...] = jax.lax.dot_general(
            eye_bf16(C).astype(jnp.float32), x,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
    elif mode == "minor3d":  # batched: [16,16,R] contract middle -> [16,R,16]
        t3 = x[:256, :].reshape(16, 16, C)[..., :R] if False else None
    else:
        raise ValueError(mode)


def run2d(mode):
    x = jnp.asarray(
        np.random.default_rng(0).uniform(0, 1, (R, C)), jnp.float32)
    out = pl.pallas_call(
        functools.partial(variant_kernel, mode=mode),
        out_shape=jax.ShapeDtypeStruct((C, R), jnp.float32),
    )(x)
    err = float(jnp.max(jnp.abs(out - x.T)))
    return err


def minor_kernel(x_ref, o_ref, *, mode):
    x = x_ref[...]  # [16, 16, R]
    e = eye_bf16(16)
    if mode == "m_lhs1":
        h, m, l = split3(x)
        x3 = jnp.concatenate([h, m, l], axis=1)
        e3 = jnp.concatenate([e] * 3, axis=0)
        o_ref[...] = jax.lax.dot_general(
            x3, e3, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
    else:
        raise ValueError(mode)


def run3d(mode):
    x = jnp.asarray(
        np.random.default_rng(1).uniform(0, 1, (16, 16, R)), jnp.float32)
    out = pl.pallas_call(
        functools.partial(minor_kernel, mode=mode),
        out_shape=jax.ShapeDtypeStruct((16, R, 16), jnp.float32),
    )(x)
    ref = jnp.transpose(x, (0, 2, 1))
    err = float(jnp.max(jnp.abs(out - ref)))
    return err


if __name__ == "__main__":
    for mode in ("lhs0", "rhs1", "f32lhs0", "f32rhs1"):
        try:
            err = run2d(mode)
            print(f"2d {mode:10s} OK  maxerr {err:.2e}", flush=True)
        except Exception as e:
            msg = str(e).split("\n")[0][:120]
            print(f"2d {mode:10s} FAIL {msg}", flush=True)
    for mode in ("m_lhs1",):
        try:
            err = run3d(mode)
            print(f"3d {mode:10s} OK  maxerr {err:.2e}", flush=True)
        except Exception as e:
            msg = str(e).split("\n")[0][:120]
            print(f"3d {mode:10s} FAIL {msg}", flush=True)
