"""Multi-host GOP-parallel scaling measurement (CPU, 2 processes).

The ≥85%-scaling BASELINE target needs real multi-chip hardware; this
script demonstrates the speedup MECHANISM end-to-end on what exists: the
same clip trained (a) sequentially and (b) as a 2-process GOP split
(`parallel/multihost.py`, the real `train_video_Represent.py` driver),
each process pinned to its own core so the comparison is 1 worker vs 2.
Artifacts are asserted bit-identical to the sequential run — the same
guarantee `tests/test_multihost.py` pins.

All runs share a warm JAX compilation cache (a throwaway warmup run
populates it) so wall times measure training, not XLA compiles.

Run (CPU-only, writes SCALING numbers to stdout):
  env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
      JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache \
      python scripts/measure_multihost_scaling.py
"""

import json
import os
import socket
import subprocess
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent


def write_clip(path, W=96, H=64, F=8, seed=3):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    objs = [
        dict(cx=rng.uniform(10, W - 10), cy=rng.uniform(10, H - 10),
             s=rng.uniform(4, 10), col=rng.uniform(0.3, 1.0, 3),
             vx=rng.uniform(-2, 2), vy=rng.uniform(-1, 1))
        for _ in range(6)
    ]
    with open(path, "wb") as fo:
        for f in range(F):
            img = np.zeros((H, W, 3), np.float32)
            for o in objs:
                cx, cy = o["cx"] + o["vx"] * f, o["cy"] + o["vy"] * f
                g = np.exp(-(((xx - cx) ** 2 + (yy - cy) ** 2)
                             / (2 * o["s"] ** 2)))
                img += g[..., None] * o["col"]
            rgb = (np.clip(img, 0, 1) * 255).astype(np.uint8)
            r, g_, b_ = (rgb[..., i].astype(np.float32) for i in range(3))
            y = 0.299 * r + 0.587 * g_ + 0.114 * b_
            u = -0.169 * r - 0.331 * g_ + 0.5 * b_ + 128
            v = 0.5 * r - 0.419 * g_ - 0.081 * b_ + 128
            fo.write(np.clip(y, 0, 255).astype(np.uint8).tobytes())
            fo.write(np.clip(u[::2, ::2], 0, 255).astype(np.uint8).tobytes())
            fo.write(np.clip(v[::2, ::2], 0, 255).astype(np.uint8).tobytes())


def argv(yuv, ckpt, frames, iters, n_pts):
    return [
        "-d", str(yuv), "--data_name", "scal",
        "--width", "96", "--height", "64", "--image_length", str(frames),
        "--num_points", str(n_pts), "--iterations", str(iters),
        "--kdetect_points", "24", "--kdetect_iterations", "5",
        "--backend", "binned", "--checkpoint_dir", str(ckpt),
    ]


def pin_k_frames(ckpt):
    kdir = ckpt / "result" / "scal"
    kdir.mkdir(parents=True, exist_ok=True)
    (kdir / "K_frames.txt").write_text("1\n5\n")  # two 4-frame GOPs


def run_host(yuv, ckpt, frames, iters, n_pts, host, nprocs, port, core):
    env = dict(os.environ)
    env.update(
        JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="",
        GSVC_NUM_PROCS=str(nprocs), GSVC_PROC_ID=str(host),
        GSVC_RUN_NONCE=str(port),
        JAX_COMPILATION_CACHE_DIR=os.environ.get(
            "JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache"),
    )
    if nprocs > 1:
        env["GSVC_COORDINATOR"] = f"127.0.0.1:{port}"
    cmd = [sys.executable, str(REPO / "train_video_Represent.py")]
    cmd = ["taskset", "-c", str(core)] + cmd
    return subprocess.Popen(
        cmd + argv(yuv, ckpt, frames, iters, n_pts), env=env, cwd=str(REPO),
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
    )


def main():
    frames, iters, n_pts = 8, 1200, 128
    work = Path("/tmp/mh_scaling")
    work.mkdir(exist_ok=True)
    yuv = work / "clip.yuv"
    write_clip(yuv)

    # warmup: populate the persistent compile cache (same shapes)
    warm = work / "warm"
    pin_k_frames(warm)
    p = run_host(yuv, warm, frames, iters, n_pts, 0, 1, 0, 0)
    out = p.communicate(timeout=1800)[0].decode()
    assert p.returncode == 0, out[-2000:]
    print("warmup done", flush=True)

    # (a) sequential, one core
    seq = work / "seq"
    pin_k_frames(seq)
    t0 = time.time()
    p = run_host(yuv, seq, frames, iters, n_pts, 0, 1, 0, 0)
    out = p.communicate(timeout=1800)[0].decode()
    assert p.returncode == 0, out[-2000:]
    t_seq = time.time() - t0

    # (b) 2-process GOP split, one core each
    s = socket.socket(); s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]; s.close()
    mh = work / "mh"
    pin_k_frames(mh)
    t0 = time.time()
    procs = [
        run_host(yuv, mh, frames, iters, n_pts, h, 2, port, h)
        for h in range(2)
    ]
    outs = [q.communicate(timeout=1800)[0].decode() for q in procs]
    for h, q in enumerate(procs):
        assert q.returncode == 0, f"host {h}:\n{outs[h][-2000:]}"
    t_mh = time.time() - t0

    run = f"GaussianVideo_{iters}_{n_pts}"
    a = np.load(seq / "models" / "scal" / run / "gmodels_state_dict.npz")
    b = np.load(mh / "models" / "scal" / run / "gmodels_state_dict.npz")
    assert sorted(a.files) == sorted(b.files)
    for k in a.files:
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)

    speedup = t_seq / t_mh
    print(json.dumps({
        "frames": frames, "iterations": iters, "num_points": n_pts,
        "t_sequential_s": round(t_seq, 1), "t_2host_s": round(t_mh, 1),
        "speedup": round(speedup, 3), "scaling_pct": round(50 * speedup, 1),
        "artifacts": "bit-identical",
    }))


if __name__ == "__main__":
    main()
