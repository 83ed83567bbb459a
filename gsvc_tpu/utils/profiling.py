"""Tracing & timing harness.

The reference's observability is wall-clock `time.time()` around the train
loop plus a 100-forward render-timing loop (train_video_Represent.py:82-106).
This module keeps that timing harness (device-synchronized, relay-aware) and
adds what the reference lacks: `jax.profiler` trace capture for XLA/TPU
op-level analysis (SURVEY.md §5 tracing row).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str, create_perfetto_link: bool = False):
    """Capture a jax.profiler trace of the enclosed block.

    View with TensorBoard (`tensorboard --logdir <log_dir>`) or the
    generated perfetto link.
    """
    jax.profiler.start_trace(log_dir, create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def time_fn(
    fn: Callable,
    *args,
    iters: int = 100,
    warmup: int = 2,
    block_every_call: bool = True,
) -> float:
    """Mean wall-clock seconds per call of a (jitted) function.

    block_every_call=True blocks on each call's output — required for honest
    numbers on tunneled/relayed backends where async dispatch otherwise
    hides per-call latency (the measurement style behind BENCH numbers).
    """
    out = None
    for _ in range(max(warmup, 1)):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    if block_every_call:
        for _ in range(iters):
            jax.block_until_ready(fn(*args))
    else:
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def device_loop_time(
    fn: Callable,
    x0,
    reps: int = 100,
    outer: int = 3,
) -> float:
    """Mean seconds per iteration of the type-preserving chain x -> fn(x),
    measured with the repetition INSIDE one jitted lax.fori_loop.

    This is the only honest per-op timing through a relayed/tunneled
    backend: per-call dispatch (which the relay inflates to ~1 ms and which
    varies run to run) amortizes over `reps` device-side iterations, and the
    data dependency serializes them. `fn` must keep NaN-safe float semantics
    in its chain fold (XLA does not fold f32 x*0 -> 0, so `x + leaf * 0.0`
    survives; integer folds would be eliminated).
    """
    import jax.numpy as jnp  # noqa: F401 (kept for parity with callers)

    @jax.jit
    def run(x):
        return jax.lax.fori_loop(0, reps, lambda i, xx: fn(xx), x)

    x = run(x0)
    jax.block_until_ready(x)
    t0 = time.perf_counter()
    for _ in range(outer):
        x = run(x)
    jax.block_until_ready(x)
    return (time.perf_counter() - t0) / (reps * outer)


class StepTimer:
    """Per-phase wall-clock accumulator for driver-level observability.

    Usage:
        timer = StepTimer()
        with timer("fit"):   ...
        with timer("eval"):  ...
        print(timer.report())
    """

    def __init__(self):
        self.totals: dict = {}
        self.counts: dict = {}

    @contextlib.contextmanager
    def __call__(self, name: str, sync: Optional[jax.Array] = None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync is not None:
                jax.block_until_ready(sync)
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> str:
        lines = []
        for name, total in sorted(self.totals.items()):
            n = self.counts[name]
            lines.append(
                f"{name}: total {total:.3f}s over {n} calls"
                f" ({total / n * 1e3:.2f} ms/call)"
            )
        return "\n".join(lines)
