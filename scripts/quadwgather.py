"""Pin down the quadw-table gather anomaly (minimal decisive set).

marchselbench measured the quadw fetch at 75M rows/s (540k rows/frame,
262144x32-u32 table) while gatherbench recorded a ~400M rows/s floor.
Isolate: width (32 vs 4 u32) and table rows (262k vs 16k vs 2M) with
precomputed random indices on the production row count.

Usage: python scripts/quadwgather.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from lzzx_nerf_tpu.utils.profiling import chain_time


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_lzzx_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    key = jax.random.PRNGKey(0)
    N = 540672             # production rows/frame (Bb*G, K2=44)
    f0 = jnp.zeros((), jnp.float32)

    def g(f, idx, tbl):
        # f chains iterations (chain_time perturbs the first float arg)
        idx = idx + f.astype(jnp.int32)
        rows = jnp.take(tbl, idx, axis=0)
        return jnp.sum(rows.astype(jnp.float32))

    # (16384, 100) = nb5 table 6.5 MB; (65536, 64) = quad table 16.8 MB;
    # (262144, 32) = quadw table 33.5 MB; (16384, 32) = 2 MB reference
    for ntab, w in [(262144, 32), (262144, 4), (16384, 32), (2097152, 4),
                    (16384, 100), (65536, 64), (65536, 32), (131072, 32),
                    # round-3 session 2: the cliff is ROW COUNT (<=131072
                    # fast at ~400M rows/s regardless of width; >=262144
                    # slow at ~95M even at 4.2 MB total). Candidate
                    # re-shapes for the quadw table: fold quadrant and/or
                    # z-word into WIDTH. Plus threshold bisection.
                    (65536, 128), (65536, 50), (131072, 64), (147456, 32),
                    (196608, 32), (163840, 32)]:
        tbl = jax.random.randint(key, (ntab, w), 0, 2**31 - 1, jnp.int32
                                 ).astype(jnp.uint32)
        idx = jax.random.randint(key, (N,), 0, ntab, jnp.int32)
        ms = chain_time(g, (f0, idx, tbl))
        print(f"table {ntab:8d} x {w:2d} u32: {ms:7.2f} ms "
              f"({N/ms*1e3/1e6:4.0f}M rows/s)", flush=True)


if __name__ == "__main__":
    main()
