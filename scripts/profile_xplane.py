"""Op-level TPU profiling: capture a jax.profiler trace of the eval
forward (or train step) and print per-op device time, parsed straight
from the xplane protobuf.

This is the ground-truth profile: unlike the chained differential timers
(device_loop_time), every XLA op's device duration is attributed exactly.
Round-4 findings from this tool at 1080p/10k (eval forward 1.27 ms):

    0.423  pallas chw forward kernel
    0.266  5D->3D output layout copy (the "free" reshape — the 5D
           out_shape's 16-wide minor dim stores 8x lane padding; a direct
           planar out_shape needs an in-kernel minor-dims merge Mosaic
           rejects: "infer-vector-layout: unsupported shape cast")
    0.136  pack gather [S,11] + 0.039 layout copy + 0.030 concat
    0.113  fused [2,I] seed scatter        0.060  u32 key sort
    0.038  1088->1080 slice                0.035  clip+sum fold
    0.029  fill kernel   0.021  rank kernel   ~0.05 misc cumsums/proj

No python xplane_pb2 ships in this env; the message classes are built at
runtime from tensorflow's bundled descriptor set.

Run ON TPU: PYTHONPATH=/root/.axon_site:/root/repo python scripts/profile_xplane.py [--train]
"""

import argparse
import collections
import glob
import os


def load_xspace_class():
    from google.protobuf import (
        descriptor_pb2,
        descriptor_pool,
        message_factory,
    )

    dset = (
        "/opt/venv/lib/python3.12/site-packages/tensorflow/include/tsl/"
        "profiler/protobuf/xplane_proto-descriptor-set.proto.bin"
    )
    ds = descriptor_pb2.FileDescriptorSet()
    ds.ParseFromString(open(dset, "rb").read())
    pool = descriptor_pool.DescriptorPool()
    for f in ds.file:
        pool.Add(f)
    return message_factory.GetMessageClass(
        pool.FindMessageTypeByName("tensorflow.profiler.XSpace")
    )


def print_top_ops(trace_dir: str, iters: int, top: int = 25):
    XSpace = load_xspace_class()
    files = sorted(
        glob.glob(os.path.join(trace_dir, "**/*.xplane.pb"), recursive=True)
    )
    xs = XSpace()
    xs.ParseFromString(open(files[-1], "rb").read())
    for plane in xs.planes:
        if "TPU" not in plane.name:
            continue
        evmeta = {m.id: m.name for m in plane.event_metadata.values()}
        tot = collections.Counter()
        cnt = collections.Counter()
        for line in plane.lines:
            if "XLA Ops" not in line.name:
                continue
            for ev in line.events:
                name = evmeta.get(ev.metadata_id, "?")
                if name.startswith("%while"):
                    continue  # wrapper op double-counts its children
                tot[name] += ev.duration_ps / 1e9
                cnt[name] += 1
        if not tot:
            continue
        print(f"== {plane.name}: {sum(tot.values())/iters:.3f} ms/iter "
              f"device op time")
        for name, ms in tot.most_common(top):
            print(f"{ms/iters:9.4f} ms/it x{cnt[name]/iters:6.1f}  {name[:84]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num-points", type=int, default=10000)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--train", action="store_true")
    ap.add_argument("--trace-dir", type=str, default="/tmp/jtrace")
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    from gsvc_tpu.ops.projection import project_gaussians_2d
    from gsvc_tpu.ops.rasterize import rasterize_gaussians_sum
    from gsvc_tpu.optim.adan import adan_init, adan_step

    H, W, n = 1080, 1920, args.num_points
    tb = ((W + 15) // 16, (H + 15) // 16, 1)
    rng = np.random.default_rng(0)
    means = jnp.asarray(rng.uniform(-0.999, 0.999, (n, 2)), jnp.float32)
    L = jnp.asarray(
        np.stack([rng.uniform(1, 6, n), rng.normal(0, 1, n),
                  rng.uniform(1, 6, n)], 1), jnp.float32)
    colors = jnp.asarray(rng.uniform(0, 1, (n, 3)), jnp.float32)
    opacity = jnp.ones((n, 1), jnp.float32)
    budget = int(np.ceil(1.25 * float(jnp.sum(project_gaussians_2d(
        means, L, H, W, tb)[4])) / 8192)) * 8192

    if not args.train:
        @jax.jit
        def run(m):
            def body(i, mm):
                xys, d, r_, c, nth = project_gaussians_2d(mm, L, H, W, tb)
                img = rasterize_gaussians_sum(
                    xys, d, r_, c, nth, colors, opacity, H, W,
                    backend="pallas", layout="chw", max_intersects=budget)
                return mm + jnp.sum(jnp.clip(img, 0, 1)) * 0.0
            return jax.lax.fori_loop(0, args.iters, body, m)

        arg = means
    else:
        from gsvc_tpu.ops.rasterize import image_to_rows

        target_rows = image_to_rows(jnp.zeros((H, W, 3)), H, W)
        mask_rows = image_to_rows(jnp.ones((H, W, 3)), H, W)
        params = {"m": means, "l": L, "c": colors}
        state = adan_init(params)

        @jax.jit
        def run(carry):
            def body(i, c):
                p, s = c

                def loss_fn(pp):
                    xys, d, r_, co, nth = project_gaussians_2d(
                        pp["m"], pp["l"], H, W, tb)
                    rows = rasterize_gaussians_sum(
                        xys, d, r_, co, nth, pp["c"], opacity, H, W,
                        backend="pallas", layout="rows",
                        max_intersects=budget)
                    diff = (jnp.clip(rows, 0, 1) - target_rows) * mask_rows
                    return jnp.sum(diff * diff) / (H * W * 3)

                loss, g = jax.value_and_grad(loss_fn)(p)
                return adan_step(p, g, s, 1e-3)
            return jax.lax.fori_loop(0, args.iters, body, carry)

        arg = (params, state)

    out = run(arg)
    jax.block_until_ready(out)
    os.makedirs(args.trace_dir, exist_ok=True)
    jax.profiler.start_trace(args.trace_dir)
    out = run(arg)
    jax.block_until_ready(out)
    jax.profiler.stop_trace()
    print_top_ops(args.trace_dir, args.iters)


if __name__ == "__main__":
    main()
