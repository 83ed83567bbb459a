#!/usr/bin/env python
"""Isolate the slow part of the job-based backward kernel on TPU."""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gsvc_tpu.config import FrameConfig
from gsvc_tpu.core import init_splats
from gsvc_tpu.ops.binning import bin_gaussians, default_max_intersects
from gsvc_tpu.ops.projection import project_gaussians_2d
from gsvc_tpu.ops import rasterize_pallas as rp

W = rp.WINDOW
DR = rp.DATA_ROWS


def bench(fn, *args, iters=30, name=""):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:44s} {dt*1e3:9.3f} ms")


def main():
    H, Wd, n = 1080, 1920, 10000
    cfg = FrameConfig(H=H, W=Wd, num_points=n, max_num_points=n, iterations=1)
    tb = cfg.tile_bounds
    tb_x = tb[0]
    params, alive = init_splats(jax.random.key(0), n)
    mi = default_max_intersects(n, tb[0] * tb[1])
    xys, d_, radii, conics, nth = jax.jit(
        lambda p, a: project_gaussians_2d(
            p.get_xyz, p.get_cholesky_elements, H, Wd, tb, 16, 16, alive=a
        )
    )(params, alive)
    colors = params.get_features
    opacity = jnp.ones((n, 1), jnp.float32)
    binned = jax.jit(lambda: bin_gaussians(xys, radii, nth, tb, 16, 16, mi))()
    data_s = jax.jit(
        lambda: rp._pack_intersections(binned, xys, conics, colors, opacity, 256)
    )()
    g = jnp.ones((H, Wd, 3), jnp.float32)
    vtiles = jax.jit(lambda: rp._image_to_vtiles(g, tb[0], tb[1], 16, 16))()
    n_windows = data_s.shape[1] // W
    num_jobs = tb[0] * tb[1] + n_windows
    tileof, windowof, first, jstart, jcount = jax.jit(
        lambda: rp._build_jobs(
            binned.tile_bin_start, binned.tile_counts, 256, n_windows, num_jobs
        )
    )()
    tile0 = jnp.zeros(1, jnp.int32)
    pix = 256

    def run(kernel, with_vout=True, out_per_job=False, alias=True):
        in_specs = [
            pl.BlockSpec(
                (DR, W),
                lambda j, t0, tf, wf, fr, js, jc: (0, wf[j]),
                memory_space=pltpu.MemorySpace.VMEM,
            ),
        ]
        args = [data_s]
        if with_vout:
            in_specs.append(
                pl.BlockSpec(
                    (1, 8, pix),
                    lambda j, t0, tf, wf, fr, js, jc: (tf[j], 0, 0),
                    memory_space=pltpu.MemorySpace.VMEM,
                )
            )
            args.append(vtiles)
        if out_per_job:
            out_spec = pl.BlockSpec(
                (1, DR, W),
                lambda j, t0, tf, wf, fr, js, jc: (j, 0, 0),
                memory_space=pltpu.MemorySpace.VMEM,
            )
            out_shape = jax.ShapeDtypeStruct((num_jobs, DR, W), jnp.float32)
            io_alias = {}
        else:
            out_spec = pl.BlockSpec(
                (DR, W),
                lambda j, t0, tf, wf, fr, js, jc: (0, wf[j]),
                memory_space=pltpu.MemorySpace.VMEM,
            )
            out_shape = jax.ShapeDtypeStruct(data_s.shape, jnp.float32)
            nargs = 6 + len(args)
            io_alias = {nargs: 0} if alias else {}
        if alias and not out_per_job:
            in_specs.append(pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM))

        @jax.jit
        def go():
            a = list(args)
            if alias and not out_per_job:
                a.append(jnp.zeros(data_s.shape, jnp.float32))
            return pl.pallas_call(
                kernel,
                grid_spec=pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=6,
                    grid=(num_jobs,),
                    in_specs=in_specs,
                    out_specs=out_spec,
                ),
                out_shape=out_shape,
                input_output_aliases=io_alias,
            )(tile0, tileof, windowof, first, jstart, jcount, *a)

        return go

    # A: trivial body — copy data to output, revisit-accumulate pattern
    def k_trivial(t0, tf, wf, fr, js, jc, dref, zref, oref):
        del zref
        j = pl.program_id(0)

        @pl.when(fr[j] == 1)
        def _():
            oref[...] = dref[...]

        @pl.when(fr[j] == 0)
        def _():
            oref[...] += dref[...]

    bench(run(k_trivial, with_vout=False), name="A trivial body, no vout, revisit out")

    # B: trivial body + vout fetched
    def k_trivial_v(t0, tf, wf, fr, js, jc, dref, vref, zref, oref):
        del zref
        j = pl.program_id(0)
        s = jnp.sum(vref[0, 0:3, :])

        @pl.when(fr[j] == 1)
        def _():
            oref[...] = dref[...] + s

        @pl.when(fr[j] == 0)
        def _():
            oref[...] += dref[...] + s

    bench(run(k_trivial_v), name="B trivial body + vout block, revisit out")

    # C: full compute, revisit out, with vout
    def k_full(t0, tf, wf, fr, js, jc, dref, vref, zref, oref):
        del zref
        j = pl.program_id(0)
        t = tf[j] + t0[0]
        start, count = js[j], jc[j]
        wstart = wf[j] * W
        ox = ((t % tb_x) * 16).astype(jnp.float32)
        oy = ((t // tb_x) * 16).astype(jnp.float32)
        A = rp._pixel_features(16, 16)
        v_out = vref[0, 0:3, :]
        d = dref[...]
        gx, gy, c1, c2, c3, B = rp._splat_features(d, ox, oy)
        sigma = rp._dot(A, B, ((1,), (0,)))
        vis = jnp.exp(-sigma)
        alpha_u = d[5:6, :] * vis
        alpha = jnp.minimum(1.0, alpha_u)
        valid = rp._window_mask(sigma, alpha, start, count, wstart, 0)
        rgb = d[6:9, :]
        v_alpha = jnp.where(valid, rp._dot(v_out, rgb, ((0,), (0,))), 0.0)
        v_sigma = -alpha_u * v_alpha
        vB = rp._dot(A, v_sigma, ((0,), (0,)))
        grads = jnp.concatenate(
            [vB[0:1], vB[1:2], vB[2:3], vB[3:4], vB[4:5],
             jnp.sum(vis * v_alpha, axis=0, keepdims=True),
             rp._dot(v_out, jnp.where(valid, alpha, 0.0), ((1,), (0,))),
             jnp.zeros((DR - 9, W), jnp.float32)],
            axis=0,
        )
        _ = (gx, gy, c1, c2, c3)

        @pl.when(fr[j] == 1)
        def _():
            oref[...] = grads

        @pl.when(fr[j] == 0)
        def _():
            oref[...] += grads

    bench(run(k_full), name="C full-ish compute, revisit out")

    # D: full compute, per-job output (no revisit)
    def k_full_pj(t0, tf, wf, fr, js, jc, dref, vref, oref):
        j = pl.program_id(0)
        t = tf[j] + t0[0]
        start, count = js[j], jc[j]
        wstart = wf[j] * W
        ox = ((t % tb_x) * 16).astype(jnp.float32)
        oy = ((t // tb_x) * 16).astype(jnp.float32)
        A = rp._pixel_features(16, 16)
        v_out = vref[0, 0:3, :]
        d = dref[...]
        gx, gy, c1, c2, c3, B = rp._splat_features(d, ox, oy)
        sigma = rp._dot(A, B, ((1,), (0,)))
        vis = jnp.exp(-sigma)
        alpha_u = d[5:6, :] * vis
        alpha = jnp.minimum(1.0, alpha_u)
        valid = rp._window_mask(sigma, alpha, start, count, wstart, 0)
        rgb = d[6:9, :]
        v_alpha = jnp.where(valid, rp._dot(v_out, rgb, ((0,), (0,))), 0.0)
        v_sigma = -alpha_u * v_alpha
        vB = rp._dot(A, v_sigma, ((0,), (0,)))
        oref[0, 0:6, :] = vB
        oref[0, 6:7, :] = jnp.sum(vis * v_alpha, axis=0, keepdims=True)
        oref[0, 7:16, :] = jnp.zeros((9, W), jnp.float32)
        _ = (gx, gy, c1, c2, c3)

    bench(run(k_full_pj, out_per_job=True), name="D full-ish compute, per-job out")

    # E: exp only — measure transcendental cost
    def k_exp(t0, tf, wf, fr, js, jc, dref, zref, oref):
        del zref
        j = pl.program_id(0)
        A = rp._pixel_features(16, 16)
        d = dref[...]
        ox = 0.0
        gx, gy, c1, c2, c3, B = rp._splat_features(d, ox, ox)
        sigma = rp._dot(A, B, ((1,), (0,)))
        vis = jnp.exp(-sigma)
        r = jnp.sum(vis, axis=0, keepdims=True)

        @pl.when(fr[j] == 1)
        def _():
            oref[...] = r * jnp.ones((DR, W), jnp.float32)

        @pl.when(fr[j] == 0)
        def _():
            oref[...] += r

    bench(run(k_exp, with_vout=False), name="E matmul+exp only, revisit out")


if __name__ == "__main__":
    main()
