"""Tracing / profiling utilities.

The reference instruments its hot paths with module-level wall-clock
accumulators t1..t9 / t6_1..t6_6 printed every 100 steps
(nerf_triplane/renderer.py:65-83,404, TrainerUtil.py:538-539). The TPU-native
equivalent: the production render is ONE fused XLA program (per-phase timers
inside it would break fusion), so profiling is done by (a) a staged profiler
that jits cumulative prefixes of the pipeline and reports per-phase deltas,
and (b) `jax.profiler` traces when a TensorBoard-compatible consumer exists.
"""

from __future__ import annotations

import time
from typing import Callable, Dict, List, Sequence, Tuple

import jax


class PhaseAccumulator:
    """Host-side accumulator in the spirit of the reference's t1..t9: wrap
    blocking phases (e.g. dataloader fetch, device_get, sink push) that are
    NOT inside jit."""

    def __init__(self):
        self.totals: Dict[str, float] = {}

    def phase(self, name: str):
        acc = self

        class _Ctx:
            def __enter__(self):
                self.t0 = time.perf_counter()

            def __exit__(self, *a):
                acc.totals[name] = acc.totals.get(name, 0.0) + (
                    time.perf_counter() - self.t0)

        return _Ctx()

    def report(self) -> str:
        return " ".join(f"{k}={v:.3f}s" for k, v in self.totals.items())


def staged_profile(
    stages: Sequence[Tuple[str, Callable]],
    args_list: Sequence[tuple],
    iters: int = 4,
) -> List[Tuple[str, float, float]]:
    """Time cumulative pipeline prefixes and report per-phase deltas.

    stages: [(name, jitted_fn)] where stage i computes phases 0..i and
    returns something blockable. args_list: a few distinct argument tuples
    (cycled, to defeat any result caching). Returns
    [(name, cumulative_ms, delta_ms)]."""
    out = []
    prev = 0.0
    for name, fn in stages:
        jax.block_until_ready(fn(*args_list[0]))  # compile
        t0 = time.perf_counter()
        for i in range(iters):
            r = fn(*args_list[i % len(args_list)])
        jax.block_until_ready(r)
        ms = (time.perf_counter() - t0) / iters * 1000
        out.append((name, ms, ms - prev))
        prev = ms
    return out


def trace(log_dir: str):
    """jax.profiler trace context (viewable in TensorBoard/XProf)."""
    return jax.profiler.trace(log_dir)
