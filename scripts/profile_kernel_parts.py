"""Attribute forward-kernel time to its parts by ablation.

Variants of the row-streaming forward kernel (rasterize_pallas._forward_kernel)
with pieces disabled or re-typed:

  full        the real kernel (baseline)
  no_sigmamm  sigma matmul replaced by a constant [pix, C] broadcast
  no_exp      exp replaced by identity
  no_accmm    accumulation matmul replaced by a cheap sum
  sig_bf16x3  sigma matmul as ONE bf16 pass with 3-way split-B (k=18)
  acc_bf16x3  acc matmul as 3-way bf16 split (contraction 768)

Run ON TPU: PYTHONPATH=/root/.axon_site:/root/repo python scripts/profile_kernel_parts.py
"""

import functools

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from gsvc_tpu.ops import rasterize_pallas as rp
    from gsvc_tpu.ops.binning import bin_gaussians, default_max_intersects
    from gsvc_tpu.ops.projection import project_gaussians_2d
    from gsvc_tpu.utils.profiling import device_loop_time

    H, W, n = 1080, 1920, 10000
    tb = ((W + 15) // 16, (H + 15) // 16, 1)
    tb_x, tb_y = tb[0], tb[1]
    mi = default_max_intersects(n, tb_x * tb_y)
    rng = np.random.default_rng(0)
    means = jnp.asarray(rng.uniform(-0.999, 0.999, (n, 2)), jnp.float32)
    L = jnp.asarray(
        np.stack(
            [rng.uniform(1, 6, n), rng.normal(0, 1, n), rng.uniform(1, 6, n)], 1
        ),
        jnp.float32,
    )
    colors = jnp.asarray(rng.uniform(0, 1, (n, 3)), jnp.float32)
    opacity = jnp.ones((n, 1), jnp.float32)

    CHUNK, DATA_ROWS, WT = rp.CHUNK, rp.DATA_ROWS, rp.WINDOW_TILES
    ALPHA_CUTOFF = 1.0 / 255.0
    r_out = rp._round8(3 * tb_x)
    pix = 256

    def make_kernel(variant):
        def kern(row0_ref, rls_ref, data_ref, out_ref, buf, sem):
            s = pl.program_id(0)
            r = row0_ref[0] + s
            base = pl.multiple_of(rls_ref[r], 256)
            n_chunks = (rls_ref[r + 1] - rls_ref[r] + CHUNK - 1) // CHUNK
            tile0 = r * tb_x
            A = rp._pixel_features(16, 16)
            A_bf = A.astype(jnp.bfloat16)
            row_tw, w0, w1, w2 = rp._row_selectors(3 * WT)
            row_t, s0, s1, s2 = rp._row_selectors(r_out)

            def in_dma(slot, c):
                return pltpu.make_async_copy(
                    data_ref.at[:, pl.ds(base + c * CHUNK, CHUNK)],
                    buf.at[slot], sem.at[slot],
                )

            @pl.when(n_chunks > 0)
            def _start():
                in_dma(0, 0).start()

            out_ref[...] = jnp.zeros_like(out_ref)

            def body(c, carry):
                slot = jax.lax.rem(c, 2)

                @pl.when(c + 1 < n_chunks)
                def _pf():
                    in_dma(1 - slot, c + 1).start()

                in_dma(slot, c).wait()
                d = buf[slot]
                gx, gy, c1, c2, c3, B = rp._splat_features(d)
                if variant == "no_sigmamm":
                    sigma = jnp.broadcast_to(B[5:6, :], (pix, CHUNK)) * 0.01
                elif variant == "sig_bf16x3":
                    B_hi = B.astype(jnp.bfloat16)
                    r1 = B - B_hi.astype(jnp.float32)
                    B_mid = r1.astype(jnp.bfloat16)
                    B_lo = (r1 - B_mid.astype(jnp.float32)).astype(jnp.bfloat16)
                    A3 = jnp.concatenate([A_bf, A_bf, A_bf], axis=1)
                    B3 = jnp.concatenate([B_hi, B_mid, B_lo], axis=0)
                    sigma = jax.lax.dot_general(
                        A3, B3, ((((1,), (0,))), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                else:
                    sigma = rp._dot(A, B, ((1,), (0,)))
                if variant == "no_exp":
                    vis = sigma
                else:
                    vis = jnp.exp(-sigma)
                alpha_u = d[5:6, :] * vis
                alpha = jnp.minimum(1.0, alpha_u)
                valid = (sigma >= 0.0) & (alpha >= ALPHA_CUTOFF)
                w = jnp.where(valid, alpha, 0.0)

                anchor, span_ok = rp._window_anchor(d, tile0, tb_x)

                @pl.when(span_ok)
                def _win():
                    _m, rexp = rp._tile_mask_and_rgb(
                        d, row_tw, w0, w1, w2, tile0 + anchor
                    )
                    roff = pl.multiple_of(3 * anchor, 8)
                    if variant == "no_accmm":
                        out_ref[pl.ds(roff, 3 * WT), :] += (
                            jnp.sum(w, axis=1)[None, :]
                            * jnp.sum(rexp, axis=1)[:, None] * 1e-6
                        )
                    elif variant == "acc_bf16x3":
                        r_hi = rexp.astype(jnp.bfloat16)
                        r_lo = (rexp - r_hi.astype(jnp.float32)).astype(jnp.bfloat16)
                        w_hi = w.astype(jnp.bfloat16)
                        w_lo = (w - w_hi.astype(jnp.float32)).astype(jnp.bfloat16)
                        rr = jnp.concatenate([r_hi, r_lo, r_hi], axis=1)
                        ww = jnp.concatenate([w_hi, w_hi, w_lo], axis=1)
                        out_ref[pl.ds(roff, 3 * WT), :] += jax.lax.dot_general(
                            rr, ww, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        )
                    else:
                        out_ref[pl.ds(roff, 3 * WT), :] += rp._dot(
                            rexp, w, ((1,), (1,))
                        )

                @pl.when(jnp.logical_not(span_ok))
                def _full():
                    _m, rexp = rp._tile_mask_and_rgb(d, row_t, s0, s1, s2, tile0)
                    out_ref[...] += rp._dot(rexp, w, ((1,), (1,)))

                return carry

            jax.lax.fori_loop(0, n_chunks, body, 0)

        return kern

    row0 = jnp.zeros((1,), jnp.int32)

    def make_fwd(variant):
        kernel = make_kernel(variant)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(tb_y,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(
                (r_out, pix), lambda s, r0, rls: (s, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((2, DATA_ROWS, CHUNK), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )

        def fwd(m):
            xys, dpt, radii, conics, nth = project_gaussians_2d(m, L, H, W, tb)
            binned = bin_gaussians(xys, radii, nth, tb, 16, 16, mi)
            data = rp._pack_lanes(
                binned, xys, conics, colors, opacity, tb_x, 16, 16
            )
            out = pl.pallas_call(
                kernel,
                grid_spec=grid_spec,
                out_shape=jax.ShapeDtypeStruct(
                    (tb_y * r_out, pix), jnp.float32
                ),
            )(row0, binned.row_lane_start, data)
            return out

        return fwd

    base_out = None
    for variant in ("full", "no_sigmamm", "no_exp", "no_accmm",
                    "sig_bf16x3", "acc_bf16x3"):
        fwd = make_fwd(variant)

        def chain(m, f=fwd):
            return m + jnp.sum(f(m)) * 0.0

        try:
            t = device_loop_time(chain, means, reps=40, outer=2)
            msg = f"{variant:12s} {t*1e3:7.3f} ms"
            if variant in ("sig_bf16x3", "acc_bf16x3"):
                got = np.asarray(jax.jit(fwd)(means))
                err = np.abs(got - base_out).max()
                msg += f"   max abs err vs full: {err:.2e}"
            elif variant == "full":
                base_out = np.asarray(jax.jit(fwd)(means))
            print(msg)
        except Exception as e:  # noqa: BLE001
            print(f"{variant:12s} FAILED {type(e).__name__}: {str(e)[:160]}")


if __name__ == "__main__":
    main()
