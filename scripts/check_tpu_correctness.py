#!/usr/bin/env python
"""Verify Pallas fwd/bwd vs the plain-XLA binned backend ON THE REAL CHIP."""
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from gsvc_tpu.ops.projection import project_gaussians_2d
from gsvc_tpu.ops.rasterize import rasterize_gaussians_sum

H, W, n = 1080, 1920, 3000
tb = ((W + 15) // 16, (H + 15) // 16, 1)
rng = np.random.default_rng(0)
means = jnp.asarray(rng.uniform(-0.999, 0.999, (n, 2)), jnp.float32)
L = jnp.asarray(
    np.stack(
        [rng.uniform(1.0, 6.0, n), rng.normal(0.0, 1.0, n), rng.uniform(1.0, 6.0, n)],
        axis=1,
    ),
    jnp.float32,
)
colors = jnp.asarray(rng.uniform(0, 1, (n, 3)), jnp.float32)
opacity = jnp.ones((n, 1), jnp.float32)


def make(backend):
    @jax.jit
    def f(means, L, colors, opacity):
        xys, d, radii, conics, nth = project_gaussians_2d(means, L, H, W, tb)

        def img_of(c, o, x, co):
            return rasterize_gaussians_sum(
                x, d, radii, conics, nth, c, o, H, W, backend=backend
            )

        img = img_of(colors, opacity, xys, conics)
        loss = jnp.mean((jnp.clip(img, 0, 1) - 0.25) ** 2)
        return img, loss

    @jax.jit
    def g(means, L, colors, opacity):
        def loss_fn(means, L, colors, opacity):
            xys, d, radii, conics, nth = project_gaussians_2d(means, L, H, W, tb)
            img = rasterize_gaussians_sum(
                xys, d, radii, conics, nth, colors, opacity, H, W,
                backend=backend,
            )
            return jnp.mean((jnp.clip(img, 0, 1) - 0.25) ** 2)

        return jax.grad(loss_fn, argnums=(0, 1, 2, 3))(means, L, colors, opacity)

    return f, g


fp, gp = make("pallas")
fb, gb = make("binned")
img_p, loss_p = jax.tree.map(np.asarray, fp(means, L, colors, opacity))
img_b, loss_b = jax.tree.map(np.asarray, fb(means, L, colors, opacity))
print("fwd img max|diff|:", np.abs(img_p - img_b).max(),
      "mean img_p:", img_p.mean(), "mean img_b:", img_b.mean())
print("loss:", loss_p, loss_b)

gr_p = jax.tree.map(np.asarray, gp(means, L, colors, opacity))
gr_b = jax.tree.map(np.asarray, gb(means, L, colors, opacity))
for name, a, b in zip(["means", "L", "colors", "opacity"], gr_p, gr_b):
    denom = np.abs(b).max() + 1e-12
    print(f"bwd {name}: max|diff|={np.abs(a - b).max():.3e} "
          f"rel={np.abs(a - b).max() / denom:.3e} |ref|max={np.abs(b).max():.3e}")
