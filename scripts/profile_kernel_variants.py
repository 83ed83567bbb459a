"""Kernel-variant sweep for the 1080p eval forward (one process, chained
timing, so numbers are directly comparable):

  base                current flags
  epi=raw / epi=none  isolate the CHW planar epilogue cost (store without
                      relayout / no store) — EPILOGUE_MODE debug hook
  wt=N                WINDOW_TILES sweep (color-matmul row count 3N)
  chunk=C,wt=N        DMA chunk-size sweep (smaller chunks span fewer
                      tiles -> narrower windows viable)

Run ON TPU:
  PYTHONPATH=/root/.axon_site:/root/repo JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache \
    python scripts/profile_kernel_variants.py
"""

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num-points", type=int, default=10000)
    ap.add_argument("--iters", type=int, default=100)
    ap.add_argument("--train", action="store_true",
                    help="also time the train step per variant")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import gsvc_tpu.ops.rasterize_pallas as rp
    from gsvc_tpu.ops.projection import project_gaussians_2d
    from gsvc_tpu.ops.rasterize import image_to_rows, rasterize_gaussians_sum
    from gsvc_tpu.optim.adan import adan_init, adan_step
    from gsvc_tpu.utils.profiling import device_loop_time

    H, W, n = 1080, 1920, args.num_points
    tb = ((W + 15) // 16, (H + 15) // 16, 1)
    rng = np.random.default_rng(0)
    means = jnp.asarray(rng.uniform(-0.999, 0.999, (n, 2)), jnp.float32)
    L = jnp.asarray(
        np.stack([rng.uniform(1.0, 6.0, n), rng.normal(0.0, 1.0, n),
                  rng.uniform(1.0, 6.0, n)], axis=1), jnp.float32)
    colors = jnp.asarray(rng.uniform(0, 1, (n, 3)), jnp.float32)
    opacity = jnp.ones((n, 1), jnp.float32)

    n_isect = int(np.asarray(jax.jit(
        lambda m, l: jnp.sum(project_gaussians_2d(m, l, H, W, tb)[4])
    )(means, L)))
    budget = int(np.ceil(n_isect * 1.25 / 8192)) * 8192
    print(f"intersections {n_isect}, budget {budget}", flush=True)

    def forward(m, l, c):
        xys, d, radii, conics, nth = project_gaussians_2d(m, l, H, W, tb)
        img = rasterize_gaussians_sum(
            xys, d, radii, conics, nth, c, opacity, H, W,
            backend="pallas", layout="chw", max_intersects=budget)
        return jnp.clip(img, 0.0, 1.0)

    def render_chained(m):
        return m + jnp.sum(forward(m, L, colors)) * 0.0

    target_rows = image_to_rows(jnp.zeros((H, W, 3), jnp.float32), H, W)
    mask_rows = image_to_rows(jnp.ones((H, W, 3), jnp.float32), H, W)

    def train_step(carry):
        params, state = carry

        def loss_fn(p):
            xys, d, radii, conics, nth = project_gaussians_2d(
                p["m"], p["l"], H, W, tb)
            rows = rasterize_gaussians_sum(
                xys, d, radii, conics, nth, p["c"], opacity, H, W,
                backend="pallas", layout="rows", max_intersects=budget)
            diff = (jnp.clip(rows, 0.0, 1.0) - target_rows) * mask_rows
            return jnp.sum(diff * diff) / (H * W * 3)

        loss, g = jax.value_and_grad(loss_fn)(params)
        params, state = adan_step(params, g, state, 1e-3)
        return params, state

    params = {"m": means, "l": L, "c": colors}
    opt = adan_init(params)

    def run(tag):
        t0 = time.time()
        dt = device_loop_time(render_chained, means, reps=args.iters, outer=3)
        line = f"{tag:24s} eval {dt*1e3:7.3f} ms ({1/dt:7.1f} fps)"
        if args.train:
            dtt = device_loop_time(train_step, (params, opt), reps=50, outer=2)
            line += f"   train {dtt*1e3:7.3f} ms"
        print(line + f"   [wall {time.time()-t0:.0f}s]", flush=True)

    import os

    sweep = os.environ.get("VARIANT_SWEEP", "full")
    base = (rp.WINDOW_TILES, rp.CHUNK, rp.EPILOGUE_MODE)
    try:
        if sweep == "epi":
            run("base(vpu)")
            for mode in ("hybrid", "mxu", "raw"):
                rp.EPILOGUE_MODE = mode
                run(f"epi={mode}")
            rp.EPILOGUE_MODE = None
            run("base(vpu) again")
            return
        if sweep == "eval2":
            # drift-controlled WT A/B (alternate) + budget-slack variant +
            # loop-carried params variant
            nonlocal_budget = {}

            def forward_b(m, l, c, bud):
                xys, d, radii, conics, nth = project_gaussians_2d(
                    m, l, H, W, tb)
                img = rasterize_gaussians_sum(
                    xys, d, radii, conics, nth, c, opacity, H, W,
                    backend="pallas", layout="chw", max_intersects=bud)
                return jnp.clip(img, 0.0, 1.0)

            def carried(carry):
                m, l, c = carry
                s = jnp.sum(forward_b(m, l, c, budget)) * 0.0
                return (m + s, l + s, c + s)

            tight = int(np.ceil(n_isect * 1.02 / 8192)) * 8192

            def chained_tight(m):
                return m + jnp.sum(forward_b(m, L, colors, tight)) * 0.0

            for rep in range(2):
                for wt in (40, 32):
                    rp.WINDOW_TILES = wt
                    run(f"AB{rep} wt={wt}")
            rp.WINDOW_TILES = base[0]
            dt = device_loop_time(chained_tight, means, reps=args.iters,
                                  outer=3)
            print(f"{'slack=1.02':24s} eval {dt*1e3:7.3f} ms "
                  f"({1/dt:7.1f} fps)  budget {tight}", flush=True)
            dt = device_loop_time(carried, (means, L, colors),
                                  reps=args.iters, outer=3)
            print(f"{'carried-lc':24s} eval {dt*1e3:7.3f} ms "
                  f"({1/dt:7.1f} fps)", flush=True)
            return
        run("base(wt=40,chunk=256)")
        for mode in ("raw", "none"):
            rp.EPILOGUE_MODE = mode
            run(f"epi={mode}")
        rp.EPILOGUE_MODE = None
        for wt in (48, 32, 24):
            rp.WINDOW_TILES = wt
            run(f"wt={wt}")
        rp.WINDOW_TILES = base[0]
        for chunk, wt in ((128, 40), (128, 24), (128, 16)):
            rp.CHUNK = chunk
            rp.WINDOW_TILES = wt
            run(f"chunk={chunk},wt={wt}")
    finally:
        rp.WINDOW_TILES, rp.CHUNK, rp.EPILOGUE_MODE = base


if __name__ == "__main__":
    main()
