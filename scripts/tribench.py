"""Triplane packed-table variant timing (pack_shift x dtype) at 512² shapes."""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=131072 * 16)
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--shifts", type=int, nargs="*", default=[1, 2])
    ap.add_argument("--dtypes", nargs="*", default=["f32", "bf16"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_lzzx_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    from lzzx_nerf_tpu.ops.packed_triplane import (DenseTriplaneSpec,
                                                   bake_packed,
                                                   init_dense_planes,
                                                   packed_lookup)

    M = args.points
    u = jnp.asarray(np.random.default_rng(1).uniform(0, 1, (M, 2)),
                    jnp.float32)

    for shift in args.shifts:
        spec = DenseTriplaneSpec(pack_shift=shift)
        levels = init_dense_planes(jax.random.PRNGKey(0), spec)
        for dt_ in args.dtypes:
            dtype = jnp.float32 if dt_ == "f32" else jnp.bfloat16
            tbl = jax.jit(lambda: bake_packed(levels, spec, dtype=dtype))()
            tbls = [tbl + 0, tbl + 0, tbl + 0]

            @jax.jit
            def tri(tbls, u):
                return sum(packed_lookup(t, u, spec) for t in tbls)

            try:
                out = tri(tbls, u)
                jax.block_until_ready(out)
                t0 = time.perf_counter()
                for _ in range(args.reps):
                    out = tri(tbls, u)
                jax.block_until_ready(out)
                t = (time.perf_counter() - t0) / args.reps * 1000
                mb = tbl.size * tbl.dtype.itemsize / 1e6
                rate = 3 * M / (t / 1000) / 1e6
                print(f"shift={shift} {dt_:4s}: {t:8.2f} ms  "
                      f"({tbl.shape[0]} rows x {tbl.shape[1]}, "
                      f"{mb:.1f} MB/plane, {rate:.0f}M rows/s)", flush=True)
            except Exception as e:
                print(f"shift={shift} {dt_:4s}: FAILED {type(e).__name__}: "
                      f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
