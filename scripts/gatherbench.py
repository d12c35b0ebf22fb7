"""Honest gather-rate measurement on the axon TPU (chained timing).

Everything in the serving frame is gather-bound (phasebench2), so the
row-width and table-size dependence of XLA's gather decides every layout
choice. The round-1 numbers ("width-independent, 3x faster when the table
fits VMEM") were taken with block_until_ready timing, which on this
platform can return before compute finishes — this script re-measures with
lax.scan-chained iterations.

Usage: python scripts/gatherbench.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


from lzzx_nerf_tpu.utils.profiling import chain_time


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_lzzx_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    key = jax.random.PRNGKey(0)
    NROWS = 2 * 1024 * 1024  # gathered rows per call

    print(f"{NROWS/1e6:.1f}M rows gathered per call; rate in Mrows/s")
    print(f"{'table':>22} {'width':>12} {'ms':>8} {'Mrows/s':>9} {'GB/s':>7}")

    for n_table, width, dtype in [
        (16384, 4, jnp.uint32),      # march col_bitmask today
        (16384, 25, jnp.uint32),     # 5x5 column neighborhood row
        (16384, 100, jnp.uint32),    # 5x5 neighborhood x 4 words
        (65536, 58, jnp.bfloat16),   # packed triplane today
        (65536, 58, jnp.float32),    # fp32 variant
        (65536, 116, jnp.bfloat16),  # 2x wider row
        (65536, 210, jnp.bfloat16),  # block-shared neighborhood row
        (65536, 420, jnp.bfloat16),  # 2x that
        (262144, 58, jnp.bfloat16),  # 4x more rows (pack_shift=0 scale)
        (4096, 58, jnp.bfloat16),    # tiny table
    ]:
        if jnp.issubdtype(dtype, jnp.floating) or dtype == jnp.bfloat16:
            table = jax.random.normal(key, (n_table, width), jnp.float32
                                      ).astype(dtype)
        else:
            table = jax.random.randint(key, (n_table, width), 0, 2**31 - 1,
                                       jnp.int32).astype(dtype)
        idxf = jax.random.uniform(key, (NROWS,), jnp.float32, 0, n_table)

        def g(table, idxf):
            idx = jnp.clip(idxf.astype(jnp.int32), 0, n_table - 1)
            rows = jnp.take(table, idx, axis=0)
            return jnp.sum(rows.astype(jnp.float32))

        ms = chain_time(g, (table, idxf))
        rate = NROWS / ms * 1e3 / 1e6
        byt = np.dtype(dtype).itemsize if dtype != jnp.bfloat16 else 2
        gbs = NROWS * width * byt / ms * 1e3 / 1e9
        mb = n_table * width * byt / 1e6
        print(f"{n_table:>9} ({mb:6.1f} MB) {width:>5} x{byt}B "
              f"{ms:8.2f} {rate:9.0f} {gbs:7.1f}")


if __name__ == "__main__":
    main()
