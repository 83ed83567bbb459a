"""Component-level timing of the 1080p forward path on the real chip."""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from gsvc_tpu.ops.projection import project_gaussians_2d
from gsvc_tpu.ops.binning import bin_gaussians, default_max_intersects
from gsvc_tpu.ops.rasterize_pallas import rasterize_pallas, _pack_intersections

H, W, n = 1080, 1920, 10000
tb = ((W + 15) // 16, (H + 15) // 16, 1)
rng = np.random.default_rng(0)
means = jnp.asarray(rng.uniform(-0.999, 0.999, (n, 2)), jnp.float32)
L = jnp.asarray(
    np.stack([rng.uniform(1.0, 6.0, n), rng.normal(0.0, 1.0, n),
              rng.uniform(1.0, 6.0, n)], 1), jnp.float32)
colors = jnp.asarray(rng.uniform(0, 1, (n, 3)), jnp.float32)
opacity = jnp.ones((n, 1), jnp.float32)
max_i = default_max_intersects(n, tb[0] * tb[1])
print("max_intersects:", max_i)


def timeit(name, f, *a):
    f(*a)  # compile
    jax.block_until_ready(f(*a))
    t0 = time.perf_counter()
    N = 50
    for _ in range(N):
        out = f(*a)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / N * 1e3
    print(f"{name:28s} {dt:8.3f} ms")
    return dt


proj = jax.jit(lambda m, l: project_gaussians_2d(m, l, H, W, tb))
xys, d, radii, conics, nth = proj(means, L)

timeit("project", lambda m, l: proj(m, l)[0], means, L)

binf = jax.jit(lambda: bin_gaussians(xys, radii, nth, tb, 16, 16, max_i))
binned = binf()
print("num_intersections:", int(binned.num_intersects))
timeit("bin (expand+sort+edges)", lambda: binf().sorted_gauss_ids)

packf = jax.jit(lambda b: _pack_intersections(b, xys, conics, colors, opacity, 256))
timeit("pack_intersections", lambda b: packf(b), binned)

rast = jax.jit(lambda b: rasterize_pallas(b, xys, conics, colors, opacity, H, W, tb))
timeit("pallas fwd kernel(+pack)", lambda b: rast(b), binned)


def full(m, l, c, o):
    xys, d, radii, conics, nth = project_gaussians_2d(m, l, H, W, tb)
    b = bin_gaussians(xys, radii, nth, tb, 16, 16, max_i)
    return rasterize_pallas(b, xys, conics, c, o, H, W, tb)


fullj = jax.jit(full)
timeit("FULL forward", fullj, means, L, colors, opacity)


def train_fwd_bwd(m, l, c, o, gt):
    def loss(m, l, c, o):
        img = full(m, l, c, o)
        return jnp.mean((img - gt) ** 2)
    return jax.grad(loss, argnums=(0, 1, 2, 3))(m, l, c, o)


gt = jnp.zeros((H, W, 3), jnp.float32)
gj = jax.jit(train_fwd_bwd)
timeit("FULL fwd+bwd (grad)", lambda *a: gj(*a)[0], means, L, colors, opacity, gt)
