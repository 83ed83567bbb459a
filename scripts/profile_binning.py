"""Microbenchmark binning sub-ops on the real chip."""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

rng = np.random.default_rng(0)


def timeit(name, f, *a):
    jax.block_until_ready(f(*a))
    t0 = time.perf_counter()
    N = 30
    for _ in range(N):
        out = f(*a)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / N * 1e3
    print(f"{name:44s} {dt:8.3f} ms")


for I in (30720, 61440, 122880, 245760):
    keys = jnp.asarray(rng.integers(0, 8160, I), jnp.int32)
    vals = jnp.asarray(rng.integers(0, 10000, I), jnp.int32)
    f = jax.jit(lambda k, v: jax.lax.sort((k, v), num_keys=2))
    timeit(f"lax.sort 2key I={I}", f, keys, vals)
    f1 = jax.jit(lambda k: jax.lax.sort((k,), num_keys=1))
    timeit(f"lax.sort 1key I={I}", f1, keys)

I = 245760
n = 10000
cum = jnp.asarray(np.sort(rng.integers(0, 77000, n)), jnp.int32)
i = jnp.arange(I, dtype=jnp.int32)
f2 = jax.jit(lambda c: jnp.searchsorted(c, i, side="right"))
timeit("searchsorted I=245k over n=10k", f2, cum)

g = jnp.asarray(rng.integers(0, n, I), jnp.int32)
bw = jnp.asarray(rng.integers(1, 8, n), jnp.int32)
slot = jnp.asarray(rng.integers(0, 60, I), jnp.int32)


def divmod_dyn(slot, bw, g):
    b = bw[g]
    return slot // b + slot % b


timeit("dyn int div+mod I=245k", jax.jit(divmod_dyn), slot, bw, g)


def divmod_f32(slot, bw, g):
    b = bw[g].astype(jnp.float32)
    s = slot.astype(jnp.float32)
    d = jnp.floor(s / b)
    return (d + (s - d * b)).astype(jnp.int32)


timeit("f32 div+mod I=245k", jax.jit(divmod_f32), slot, bw, g)

tile_range = jnp.arange(8160, dtype=jnp.int32)
sk = jnp.sort(keys)
f3 = jax.jit(lambda s: jnp.searchsorted(s, tile_range, side="left"))
timeit("bin edges searchsorted T=8160 over 245k", f3, sk)

data = jnp.asarray(rng.standard_normal((I, 16)), jnp.float32)
f4 = jax.jit(lambda d, g: jax.ops.segment_sum(d, g, num_segments=n + 1))
timeit("segment_sum [245k,16] -> 10k", f4, data, g)

ids = jnp.asarray(rng.integers(0, n, I), jnp.int32)
rows = jnp.asarray(rng.standard_normal((n, 16)), jnp.float32)
f5 = jax.jit(lambda r, k: r[k])
timeit("gather [245k,16] from 10k", f5, rows, ids)

# transpose cost (pack_intersections tail)
big = jnp.asarray(rng.standard_normal((I, 16)), jnp.float32)
f6 = jax.jit(lambda b: b.T + 0.0)
timeit("transpose [245k,16]->[16,245k]", f6, big)
