"""Decompose train-step time on the real TPU: where do the 52 ms go?

Measures (all jitted, blocked each call):
  1. forward render only
  2. forward + loss
  3. value_and_grad of loss (full backward)
  4. value_and_grad + adan
  5. isolated pieces: binning only, pallas fwd only (prebinned),
     pallas bwd via vjp (prebinned), segment_sum

Run: python scripts/profile_train_decomp.py [--num-points 10000]
"""

import argparse
import time

import numpy as np


def timeit(f, *args, iters=30, warmup=2):
    import jax

    for _ in range(warmup):
        out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
        jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num-points", type=int, default=10000)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--width", type=int, default=1920)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from gsvc_tpu.ops.binning import bin_gaussians, default_max_intersects
    from gsvc_tpu.ops.projection import project_gaussians_2d
    from gsvc_tpu.ops.rasterize import rasterize_gaussians_sum
    from gsvc_tpu.ops.rasterize_pallas import rasterize_pallas
    from gsvc_tpu.optim.adan import adan_init, adan_step

    H, W, n = args.height, args.width, args.num_points
    tb = ((W + 15) // 16, (H + 15) // 16, 1)
    num_tiles = tb[0] * tb[1]
    mi = default_max_intersects(n, num_tiles)
    rng = np.random.default_rng(0)
    means = jnp.asarray(rng.uniform(-0.999, 0.999, (n, 2)), jnp.float32)
    L = jnp.asarray(
        np.stack(
            [rng.uniform(1, 6, n), rng.normal(0, 1, n), rng.uniform(1, 6, n)],
            1,
        ),
        jnp.float32,
    )
    colors = jnp.asarray(rng.uniform(0, 1, (n, 3)), jnp.float32)
    opacity = jnp.ones((n, 1), jnp.float32)
    target = jnp.zeros((H, W, 3), jnp.float32)

    def forward(m, l, c):
        xys, d, radii, conics, nth = project_gaussians_2d(m, l, H, W, tb)
        img = rasterize_gaussians_sum(
            xys, d, radii, conics, nth, c, opacity, H, W, backend="pallas"
        )
        return jnp.clip(img, 0.0, 1.0)

    t_fwd = timeit(jax.jit(forward), means, L, colors)

    def loss_of(m, l, c):
        return jnp.mean((forward(m, l, c) - target) ** 2)

    t_loss = timeit(jax.jit(loss_of), means, L, colors)
    t_grad = timeit(jax.jit(jax.value_and_grad(loss_of, argnums=(0, 1, 2))),
                    means, L, colors)

    @jax.jit
    def train_step(params, state):
        loss, g = jax.value_and_grad(
            lambda p: loss_of(p["m"], p["l"], p["c"])
        )(params)
        params, state = adan_step(params, g, state, 1e-3)
        return params, state, loss

    params = {"m": means, "l": L, "c": colors}
    state = adan_init(params)

    def ts(params, state):
        return train_step(params, state)

    t_train = timeit(ts, params, state)

    # isolated pieces
    @jax.jit
    def proj(m, l):
        return project_gaussians_2d(m, l, H, W, tb)

    xys, d, radii, conics, nth = proj(means, L)
    t_proj = timeit(proj, means, L)

    @jax.jit
    def binonly(xys, radii, nth):
        return bin_gaussians(xys, radii, nth, tb, 16, 16, mi)

    binned = binonly(xys, radii, nth)
    t_bin = timeit(binonly, xys, radii, nth)

    @jax.jit
    def pfwd(binned, xys, conics, colors):
        return rasterize_pallas(
            binned, xys, conics, colors, opacity, H, W, tb
        )

    t_pfwd = timeit(pfwd, binned, xys, conics, colors)

    g_img = jnp.ones((H, W, 3), jnp.float32)

    @jax.jit
    def pbwd(binned, xys, conics, colors):
        _, vjp = jax.vjp(
            lambda x, co, c: rasterize_pallas(
                binned, x, co, c, opacity, H, W, tb
            ),
            xys, conics, colors,
        )
        return vjp(g_img)

    t_pbwd = timeit(pbwd, binned, xys, conics, colors)

    print(f"num_intersections={int(binned.num_intersects)} budget={mi}")
    print(f"forward            {t_fwd:8.3f} ms")
    print(f"forward+loss       {t_loss:8.3f} ms")
    print(f"value_and_grad     {t_grad:8.3f} ms")
    print(f"train step (+adan) {t_train:8.3f} ms")
    print(f"  projection only  {t_proj:8.3f} ms")
    print(f"  binning only     {t_bin:8.3f} ms")
    print(f"  pallas fwd only  {t_pfwd:8.3f} ms")
    print(f"  pallas fwd+bwd   {t_pbwd:8.3f} ms")


if __name__ == "__main__":
    main()
