#!/usr/bin/env python
"""Micro-profile the rasterize backward internals on TPU."""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from gsvc_tpu.config import FrameConfig
from gsvc_tpu.core import init_splats
from gsvc_tpu.ops.binning import bin_gaussians, default_max_intersects
from gsvc_tpu.ops.projection import project_gaussians_2d
from gsvc_tpu.ops import rasterize_pallas as rp


def bench(fn, *args, iters=30, name=""):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:40s} {dt*1e3:9.3f} ms")
    return out


def main():
    H, W, n = 1080, 1920, 10000
    cfg = FrameConfig(H=H, W=W, num_points=n, max_num_points=n, iterations=10)
    tb = cfg.tile_bounds
    params, alive = init_splats(jax.random.key(0), n)
    mi = default_max_intersects(n, tb[0] * tb[1])
    xys, depths, radii, conics, nth = jax.jit(
        lambda p, a: project_gaussians_2d(
            p.get_xyz, p.get_cholesky_elements, H, W, tb, 16, 16, alive=a
        )
    )(params, alive)
    colors = params.get_features
    opacity = jnp.ones((n, 1), jnp.float32)
    binned = jax.jit(
        lambda: bin_gaussians(xys, radii, nth, tb, 16, 16, mi)
    )()
    g = jnp.ones((H, W, 3), jnp.float32) / (H * W * 3)

    pack = jax.jit(
        lambda: rp._pack_intersections(binned, xys, conics, colors, opacity, 256)
    )
    data_s = bench(pack, name="pack_intersections")

    vt = jax.jit(lambda: rp._image_to_vtiles(g, tb[0], tb[1], 16, 16))
    bench(vt, name="image_to_vtiles")

    n_windows = data_s.shape[1] // rp.WINDOW
    num_jobs = tb[0] * tb[1] + n_windows
    jobs = jax.jit(
        lambda: rp._build_jobs(
            binned.tile_bin_start, binned.tile_counts, 256, n_windows, num_jobs
        )
    )
    bench(jobs, name="build_jobs")

    # full custom-vjp backward
    @jax.jit
    def full_bwd():
        res = (binned, data_s, n, jnp.int32(0))
        return rp._rasterize_bwd(H, W, tb, 16, 16, 256, tb[1], res, g)

    bench(full_bwd, name="rasterize_bwd (kernel+reduce)")

    # segment_sum alone
    vdata = jnp.ones_like(data_s)

    @jax.jit
    def seg():
        vrows = vdata.T[: binned.sorted_gauss_ids.shape[0]]
        return jax.ops.segment_sum(
            vrows, binned.sorted_gauss_ids, num_segments=n + 1
        )[:n]

    bench(seg, name="segment_sum")

    print("max_intersects:", mi, "num_jobs:", num_jobs)


if __name__ == "__main__":
    main()
