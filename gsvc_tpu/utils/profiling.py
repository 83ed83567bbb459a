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


def _sync(out) -> None:
    """True device sync: transfer one element of the first array leaf.

    On the tunneled/relayed TPU backend `jax.block_until_ready` can return
    before execution finishes (measured: a 50-iteration matmul loop
    "blocked" in 0.2 ms, then took 36 s at transfer). A host transfer is
    the only reliable barrier, so every timing helper here syncs by
    fetching one element (the transfer itself costs a relay round-trip,
    which the differential method in `device_loop_time` cancels).
    """
    import numpy as np

    leaves = jax.tree.leaves(out)
    if not leaves:
        return
    np.asarray(jax.device_get(leaves[0].ravel()[:1]))


def time_fn(
    fn: Callable,
    *args,
    iters: int = 100,
    warmup: int = 2,
    block_every_call: bool = True,
) -> float:
    """Mean wall-clock seconds per call of a (jitted) function.

    block_every_call=True syncs each call's output — required for honest
    numbers on tunneled/relayed backends where async dispatch otherwise
    hides per-call latency. NOTE: each sync pays a relay round-trip, so
    per-call numbers include dispatch overhead; prefer `device_loop_time`
    for kernel-level costs.
    """
    out = None
    for _ in range(max(warmup, 1)):
        out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    if block_every_call:
        for _ in range(iters):
            _sync(fn(*args))
    else:
        for _ in range(iters):
            out = fn(*args)
        _sync(out)
    return (time.perf_counter() - t0) / iters


def device_loop_time(
    fn: Callable,
    x0,
    reps: int = 100,
    outer: int = 3,
    ratio: int = 4,
) -> float:
    """Mean seconds per iteration of the type-preserving chain x -> fn(x),
    measured DIFFERENTIALLY with the repetition INSIDE jitted lax.fori_loops.

    Honest through a relayed/tunneled backend on two counts:
    - per-call dispatch amortizes over device-side iterations, and the data
      dependency serializes them;
    - the relay's unreliable `block_until_ready` (see `_sync`) is replaced
      by a transfer sync, and the transfer's round-trip cost cancels in the
      difference: per-iter = (t(ratio*reps) - t(reps)) / ((ratio-1)*reps).

    `fn` must keep its chain fold data-dependent (fold outputs with
    `x + leaf_sum * 0.0`; XLA does not fold f32 x*0 through pallas_call
    boundaries, but pure-XLA permutations DO get folded — pin those with
    an optimization_barrier inside fn if needed).
    """

    def make(r):
        @jax.jit
        def run(x):
            return jax.lax.fori_loop(0, r, lambda i, xx: fn(xx), x)

        return run

    r1, r2 = reps, reps * ratio
    run1, run2 = make(r1), make(r2)
    # compile + warm both
    x = run1(x0)
    _sync(x)
    x = run2(x)
    _sync(x)

    total = 0.0
    for _ in range(outer):
        t0 = time.perf_counter()
        x = run1(x)
        _sync(x)
        t1 = time.perf_counter()
        x = run2(x)
        _sync(x)
        t2 = time.perf_counter()
        total += (t2 - t1) - (t1 - t0)
    return total / ((r2 - r1) * outer)


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
                _sync(sync)
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
