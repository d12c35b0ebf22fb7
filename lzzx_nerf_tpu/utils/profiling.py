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


def chain_time(fn, args, iters=30, label=""):
    """Trustworthy device timing on the tunneled axon platform, where
    block_until_ready can return BEFORE compute finishes (naive dispatch
    loops read absurd sub-dispatch times — see PERF.md).

    Chains `iters` evaluations of fn(*args) through a lax.scan carry (each
    iteration's first float argument is perturbed by a negligible function
    of the previous output, forcing sequential device execution inside ONE
    program), fetches one scalar, and subtracts a measured no-op fetch RTT.
    Returns ms per iteration. Used by scripts/{gather,fused,phase}bench."""
    import time

    import jax
    import jax.numpy as jnp

    float_idx = next(i for i, a in enumerate(args)
                     if hasattr(a, "dtype")
                     and jnp.issubdtype(a.dtype, jnp.floating))

    @jax.jit
    def chained(*args):
        def body(c, _):
            a = list(args)
            a[float_idx] = a[float_idx] + c.astype(a[float_idx].dtype)
            out = fn(*a)
            s = sum(jnp.sum(jnp.abs(x).astype(jnp.float32))
                    for x in jax.tree.leaves(out)
                    if jnp.issubdtype(x.dtype, jnp.inexact))
            return s * 1e-30, None

        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return c

    @jax.jit
    def nop(*args):
        return args[float_idx].reshape(-1)[0]

    float(nop(*args))
    t0 = time.perf_counter()
    float(nop(*args))
    rtt = time.perf_counter() - t0

    float(chained(*args))  # compile
    t0 = time.perf_counter()
    float(chained(*args))
    ms = (time.perf_counter() - t0 - rtt) / iters * 1e3
    if label:
        print(f"{label:28s}: {ms:8.2f} ms")
    return ms
