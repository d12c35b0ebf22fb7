"""Microbenchmark: fused Pallas field kernel vs the XLA matmul chain.

Measures the field-MLP phase in isolation on representative serving shapes
(N ~ the per-frame compacted sample count at 512²). Usage:

    python scripts/fusedbench.py [--n 2097152] [--tiles 1024 2048 4096 8192]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from lzzx_nerf_tpu.models.nerf import NeRFField
from lzzx_nerf_tpu.ops.fused_field import (extract_field_weights,
                                           fold_frame_weights,
                                           fused_field_eval,
                                           fused_field_eval_reference)


from lzzx_nerf_tpu.utils.profiling import chain_time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2 * 1024 * 1024)
    ap.add_argument("--tiles", type=int, nargs="+",
                    default=[1024, 2048, 4096, 8192])
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_lzzx_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    field = NeRFField(bound=1.0, encoder="dense")
    key = jax.random.PRNGKey(0)
    params = field.init(key, jnp.zeros((4, 3)), jnp.ones((4, 3)),
                        jnp.zeros((8, 2, 1024)), jnp.zeros((4,)),
                        jnp.zeros((1,)), method="init_all")
    w = extract_field_weights(params)

    N = args.n
    k1, k2 = jax.random.split(key)
    enc_x = jax.random.normal(k1, (N, 36), jnp.float32) * 0.1
    d = jax.random.normal(k2, (N, 3), jnp.float32)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    enc_a = jnp.ones((1, 32)) * 0.3
    ind = jnp.ones((4,)) * 0.1
    eye = jnp.asarray([0.25])

    fw = fold_frame_weights(w, enc_a, ind, eye)
    fw = jax.tree.map(jax.device_put, fw)
    enc_x, d = jax.device_put(enc_x), jax.device_put(d)

    for cdt, tag in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        def xla_eval(fw, e, d, c=cdt):
            return fused_field_eval_reference(fw, e, d, compute_dtype=c)

        ms = chain_time(xla_eval, (fw, enc_x, d), iters=args.iters)
        print(f"XLA chain       {tag:>5}: {ms:8.2f} ms  "
              f"({N/ms*1e3/1e6:.0f} Msamples/s)")

        for tile in args.tiles:
            if N % tile:
                continue

            def eval_tile(fw, e, d, t=tile, c=cdt):
                return fused_field_eval(fw, e, d, tile=t, interpret=False,
                                        compute_dtype=c)

            try:
                ms = chain_time(eval_tile, (fw, enc_x, d), iters=args.iters)
                print(f"pallas {tag:>4} T={tile:5d}: {ms:8.2f} ms  "
                      f"({N/ms*1e3/1e6:.0f} Msamples/s)")
            except Exception as exc:  # noqa: BLE001 — report, try next tile
                print(f"pallas {tag:>4} T={tile:5d}: FAILED "
                      f"{type(exc).__name__}: {str(exc)[:200]}")


if __name__ == "__main__":
    main()
