#!/usr/bin/env python
"""Benchmark: 1080p render fps per chip (the reference's headline number).

Mirrors the reference measurement: mean per-frame time of `--iters` no-grad
forward renders of a trained-size splat model at 1920x1080
(train_video_Represent.py:101-106, eval_fps = 1/avg_time; README.md:19
claims 1500 fps on GPU). The forward here is the FULL model forward —
projection, tile binning, and the Pallas rasterizer — not just the kernel.

Measurement method: a CHAINED loop INSIDE one jitted lax.fori_loop — each
iteration's input depends on the previous iteration's output, so the device
serializes them, and per-call dispatch overhead (which the axon relay
inflates to ~1 ms/call and which varies run to run) amortizes over the whole
loop. The chain perturbation is `m + pixel * 0.0`, which XLA preserves
(f32 x*0 is not folded, NaN semantics) and adds exactly zero, so every
iteration renders the identical scene. Timed as total/N over several outer
calls with one final sync.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
Run on the real TPU (default env). Options: --num-points, --iters, --backend.
"""

import argparse
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num-points", type=int, default=10000)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--iters", type=int, default=100)
    ap.add_argument("--outer", type=int, default=3)
    ap.add_argument("--train-iters", type=int, default=50)
    ap.add_argument("--backend", type=str, default="pallas")
    ap.add_argument(
        "--budget-slack", type=float, default=1.05,
        help="intersection-budget headroom over the measured count "
             "(0 = use the static default_max_intersects heuristic). The "
             "bench scene is static, so the measured count is exact and "
             "slack only covers the 8192-bucket rounding; every S-sized "
             "stage (pack gather, sorts, scans) scales with it — 1.25 "
             "cost ~0.08 ms/frame at 1080p/10k vs 1.05.",
    )
    ap.add_argument(
        "--color-bf16", action="store_true",
        help="fast color mode: single bf16 color/grad matmuls (~2e-3 "
             "output delta, the reference's --use_fast_math class of "
             "tradeoff)",
    )
    args = ap.parse_args()

    if args.color_bf16:
        import gsvc_tpu.ops.rasterize_pallas as _rp

        _rp.COLOR_BF16 = True

    import jax
    import jax.numpy as jnp
    import numpy as np

    from gsvc_tpu.ops.projection import project_gaussians_2d
    from gsvc_tpu.ops.rasterize import rasterize_gaussians_sum
    from gsvc_tpu.optim.adan import adan_init, adan_step
    from gsvc_tpu.utils.profiling import device_loop_time

    H, W, n = args.height, args.width, args.num_points
    tb = ((W + 15) // 16, (H + 15) // 16, 1)
    rng = np.random.default_rng(0)
    # trained-model-like scene: splat scales spread so the tile working set
    # resembles a converged fit (avg ~8 intersections per splat at 1080p)
    means = jnp.asarray(rng.uniform(-0.999, 0.999, (n, 2)), jnp.float32)
    L = jnp.asarray(
        np.stack(
            [rng.uniform(1.0, 6.0, n), rng.normal(0.0, 1.0, n),
             rng.uniform(1.0, 6.0, n)],
            axis=1,
        ),
        jnp.float32,
    )
    colors = jnp.asarray(rng.uniform(0, 1, (n, 3)), jnp.float32)
    opacity = jnp.ones((n, 1), jnp.float32)

    # Eval forward renders the planar [3, H, W] image — the reference
    # model's own forward layout (GaussianSplats_Represent.py returns
    # [1, 3, H, W]); the pallas backend emits it directly from the kernel
    # (rasterize_pallas._forward_kernel_chw), no untile transpose.
    eval_layout = "chw" if args.backend == "pallas" else "image"

    # Size the static intersection budget from the measured count (one
    # projection pass + host sync, once per scene). This mirrors the
    # reference, which allocates the intersection buffer to the EXACT
    # dynamic count every forward (cum_tiles_hit .item() sync,
    # gsplat/utils.py:117); a measured budget with slack, bucketed to 8192
    # to stabilize compiled shapes, is the static-shape equivalent.
    n_isect = int(
        np.asarray(
            jax.jit(
                lambda m, l: jnp.sum(project_gaussians_2d(m, l, H, W, tb)[4])
            )(means, L)
        )
    )
    if args.budget_slack > 0:
        budget = int(np.ceil(n_isect * args.budget_slack / 8192)) * 8192
    else:
        from gsvc_tpu.ops.binning import default_max_intersects

        budget = default_max_intersects(n, tb[0] * tb[1])

    def forward(m, l, c):
        xys, d, radii, conics, nth = project_gaussians_2d(m, l, H, W, tb)
        img = rasterize_gaussians_sum(
            xys, d, radii, conics, nth, c, opacity, H, W,
            backend=args.backend, layout=eval_layout,
            max_intersects=budget,
        )
        return jnp.clip(img, 0.0, 1.0)

    def render_chained(m):
        img = forward(m, L, colors)
        # Fold the FULL image sum into the chain: folding one pixel lets XLA
        # slice away the untile/clip stages entirely (DCE through reshapes),
        # under-measuring the forward. f32 * 0.0 is preserved (NaN
        # semantics) and adds exactly zero.
        return m + jnp.sum(img) * 0.0

    dt = device_loop_time(
        render_chained, means, reps=args.iters, outer=args.outer
    )
    fps = 1.0 / dt

    # Fast-color-mode fps (single bf16 color matmuls, ~2e-3 output delta)
    # unless already benching that mode: the reference's 1500 fps headline
    # is itself a --use_fast_math build (gsplat/setup.py:76), so this is
    # the apples-to-apples companion number to the full-precision one.
    import gsvc_tpu.ops.rasterize_pallas as _rp

    fps_fast = None
    if args.backend == "pallas" and not _rp.COLOR_BF16:
        _rp.COLOR_BF16 = True
        try:
            dt_fast = device_loop_time(
                render_chained, means, reps=args.iters, outer=args.outer
            )
            fps_fast = 1.0 / dt_fast
        finally:
            _rp.COLOR_BF16 = False

    # full training step (fwd + bwd + Adan), chained naturally via params.
    # The loss runs in the rasterizer's native tile-row layout with a
    # pre-tiled target, exactly like the model's L2 train path
    # (models/represent.py _use_rows_loss) — the target tiling is paid once
    # per frame, not per iteration.
    from gsvc_tpu.ops.rasterize import image_to_rows

    target = jnp.zeros((H, W, 3), jnp.float32)
    target_rows = image_to_rows(target, H, W)
    mask_rows = image_to_rows(jnp.ones_like(target), H, W)

    rows_loss = args.backend == "pallas"

    def train_step(carry):
        params, state = carry

        def loss_fn(p):
            if not rows_loss:
                return jnp.mean(
                    (forward(p["m"], p["l"], p["c"]) - target) ** 2
                )
            xys, d, radii, conics, nth = project_gaussians_2d(
                p["m"], p["l"], H, W, tb
            )
            rows = rasterize_gaussians_sum(
                xys, d, radii, conics, nth, p["c"], opacity, H, W,
                backend=args.backend, layout="rows",
                max_intersects=budget,
            )
            diff = (jnp.clip(rows, 0.0, 1.0) - target_rows) * mask_rows
            return jnp.sum(diff * diff) / (H * W * 3)

        loss, g = jax.value_and_grad(loss_fn)(params)
        params, state = adan_step(params, g, state, 1e-3)
        return params, state

    params = {"m": means, "l": L, "c": colors}
    state = adan_init(params)
    dt_train = device_loop_time(
        train_step, (params, state), reps=args.train_iters, outer=2
    )

    print(
        json.dumps(
            {
                "metric": "render_fps_1080p",
                "value": round(fps, 2),
                "unit": "fps/chip",
                "vs_baseline": round(fps / 1500.0, 4),
                # companion number at the reference's own fast-math
                # precision class (COLOR_BF16; ~2e-3 output delta)
                "fast_color_fps": round(fps_fast, 2) if fps_fast else None,
                "train_step_ms": round(dt_train * 1e3, 3),
                "train_iters_per_s": round(1.0 / dt_train, 2),
                "num_points": n,
                "num_intersections": n_isect,
                "backend": args.backend,
                "device": str(jax.devices()[0]),
            }
        )
    )


if __name__ == "__main__":
    main()
