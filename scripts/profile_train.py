#!/usr/bin/env python
"""Break down the per-iteration training-step cost on TPU.

Times: forward render only; value_and_grad of L2 loss through the full
render; projection+binning alone; grad of rasterize only (fixed binning);
Adan step alone; full make_train_step.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from gsvc_tpu.config import FrameConfig
from gsvc_tpu.core import init_splats
from gsvc_tpu.models.represent import (
    TrainState,
    _loss_and_psnr,
    _trainable,
    _from_trainable,
    init_train_state,
    make_train_step,
    render_frame,
)
from gsvc_tpu.ops.binning import bin_gaussians, default_max_intersects
from gsvc_tpu.ops.projection import project_gaussians_2d
from gsvc_tpu.ops.rasterize_pallas import rasterize_pallas
from gsvc_tpu.optim.adan import adan_init, adan_step


def bench(fn, *args, iters=30, name=""):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:40s} {dt*1e3:9.3f} ms")
    return dt


def main():
    H, W, n = 1080, 1920, 10000
    cfg = FrameConfig(H=H, W=W, num_points=n, max_num_points=n, iterations=10)
    params, alive = init_splats(jax.random.key(0), n)
    gt = jnp.asarray(
        np.random.default_rng(0).uniform(0, 1, (H, W, 3)), jnp.float32
    )
    mi = cfg.max_intersects or default_max_intersects(
        n, cfg.tile_bounds[0] * cfg.tile_bounds[1]
    )

    render = jax.jit(lambda p, a: render_frame(p, a, cfg))
    bench(render, params, alive, name="forward render (full)")

    @jax.jit
    def proj_bin(p, a):
        xys, depths, radii, conics, nth = project_gaussians_2d(
            p.get_xyz, p.get_cholesky_elements, H, W, cfg.tile_bounds,
            16, 16, alive=a,
        )
        return bin_gaussians(xys, radii, nth, cfg.tile_bounds, 16, 16, mi)

    binned = proj_bin(params, alive)
    bench(proj_bin, params, alive, name="projection + binning")

    xys, depths, radii, conics, nth = jax.jit(
        lambda p, a: project_gaussians_2d(
            p.get_xyz, p.get_cholesky_elements, H, W, cfg.tile_bounds, 16, 16,
            alive=a,
        )
    )(params, alive)
    colors = params.get_features
    opacity = jnp.ones((n, 1), jnp.float32)

    @jax.jit
    def rast_fwd(binned, xys, conics, colors, opacity):
        return rasterize_pallas(
            binned, xys, conics, colors, opacity, H, W, cfg.tile_bounds
        )

    bench(rast_fwd, binned, xys, conics, colors, opacity,
          name="rasterize fwd (kernel only)")

    @jax.jit
    def rast_grad(binned, xys, conics, colors, opacity):
        def f(xys, conics, colors, opacity):
            img = rasterize_pallas(
                binned, xys, conics, colors, opacity, H, W, cfg.tile_bounds
            )
            return jnp.mean((jnp.clip(img, 0, 1) - gt) ** 2)
        return jax.grad(f, argnums=(0, 1, 2, 3))(xys, conics, colors, opacity)

    bench(rast_grad, binned, xys, conics, colors, opacity,
          name="rasterize fwd+bwd (fixed binning)")

    @jax.jit
    def loss_grad(p, a):
        tr = _trainable(p)
        (loss, _), grads = jax.value_and_grad(
            lambda q: _loss_and_psnr(_from_trainable(q), a, gt, cfg, 0.0),
            has_aux=True,
        )(tr)
        return loss, grads

    bench(loss_grad, params, alive, name="full value_and_grad")

    opt = adan_init(_trainable(params))
    loss, grads = loss_grad(params, alive)

    @jax.jit
    def opt_step(tr, grads, opt):
        return adan_step(tr, grads, opt, 1e-3)

    bench(opt_step, _trainable(params), grads, opt, name="adan step")

    step = make_train_step(cfg)
    state = init_train_state(jax.random.key(1), cfg)
    jstep = jax.jit(lambda s: step(s, gt))
    bench(jstep, state, iters=10, name="full train step")


if __name__ == "__main__":
    main()
