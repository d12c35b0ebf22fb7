"""Scatter-add strategy microbenchmark for the packed-table backward.

The training step's dominant cost (scripts/trainphase.py round-3: ~70 of
153 ms) is the VJP of the packed-triplane gather: scatter-ADD of ~2.36M
cotangent rows (58 floats) into three [65536, 58] tables. Unlike
scatter-SET (measured ≈ gather rate), scatter-add must combine colliding
rows (~12 samples/row on average, far worse on coarse cells), and the TPU
has no atomics — XLA's lowering serializes collisions.

Variants (chained timing; same trick as gatherbench):
  base    — zeros.at[idx].add(g)
  shard8  — 8-way sharded accumulator, shard = arange % 8, then sum over
            shards: collisions per (shard, row) drop 8x for 8x accumulator
            memory (122 MB)
  sorted  — argsort(idx) + take + segment_sum(indices_are_sorted=True)
  bf16    — base with a bf16 accumulator (half the bytes)

Usage: python scripts/scatterbench.py [--rows 2359296] [--width 58]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=2_359_296)  # 786k x 3 planes
    ap.add_argument("--width", type=int, default=58)
    ap.add_argument("--table", type=int, default=65536)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--shards", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_lzzx_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    M, D, T, K = args.rows, args.width, args.table, args.shards
    key = jax.random.PRNGKey(0)
    g = jax.random.normal(key, (M, D), jnp.float32)
    idx = jax.random.randint(jax.random.PRNGKey(1), (M,), 0, T)

    def base(g, idx):
        return jnp.zeros((T, D)).at[idx].add(g)

    shard_ids = (jnp.arange(M, dtype=jnp.int32) % K)

    def shard8(g, idx):
        acc = jnp.zeros((K, T, D)).at[shard_ids, idx].add(g)
        return jnp.sum(acc, axis=0)

    def sorted_seg(g, idx):
        o = jnp.argsort(idx)
        return jax.ops.segment_sum(jnp.take(g, o, axis=0),
                                   jnp.take(idx, o), num_segments=T,
                                   indices_are_sorted=True)

    def bf16(g, idx):
        return jnp.zeros((T, D), jnp.bfloat16).at[idx].add(
            g.astype(jnp.bfloat16)).astype(jnp.float32)

    def bench(name, fn):
        def chained(carry, g, idx):
            out = fn(g + carry * 0, idx)
            # sum(out**2): sum(scatter_add(zeros, g)) algebraically equals
            # sum(g) and XLA performs that rewrite — the first version of
            # this bench measured a 17,000 M rows/s "scatter" that never ran
            return jnp.sum(out * out) * 1e-9

        jf = jax.jit(chained)
        c = jf(jnp.float32(0), g, idx)
        float(c)  # block_until_ready LIES on axon (PERF.md) — fetch instead
        t0 = time.perf_counter()
        for _ in range(args.steps):
            c = jf(c, g, idx)
        float(c)  # the chain forces every step before this value can exist
        ms = (time.perf_counter() - t0) / args.steps * 1e3
        rate = M / ms * 1e3 / 1e6
        print(f"{name:>8}: {ms:7.2f} ms  ({rate:6.1f} M rows/s)", flush=True)

    def half_dropped(g, idx):
        # every other row's index pushed out of bounds (mode="drop"): if
        # dropped rows are ~free, a custom VJP can skip masked samples'
        # zero rows WITHOUT any compaction barrier
        idx2 = jnp.where(jnp.arange(M) % 2 == 0, idx, T)
        return jnp.zeros((T, D)).at[idx2].add(g, mode="drop")

    bench("base", base)
    bench("shard8", shard8)
    bench("sorted", sorted_seg)
    bench("bf16", bf16)
    bench("halfdrop", half_dropped)


if __name__ == "__main__":
    main()
