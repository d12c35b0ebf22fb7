"""Isolated march-phase A/B: XLA nb5w select vs the Pallas select kernel
(nb5wp) at the production 512² serving shapes (chained device timing).

For kernel-internal iteration only (tile size, padding strategy) — accept/
reject decisions come from full-frame bench.py A/Bs (isolation lies,
PERF.md).

Usage: python scripts/marchp_ab.py [--k2 44] [--iters 30]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lzzx_nerf_tpu.utils.profiling import chain_time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=512)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--k2", type=int, default=44)
    ap.add_argument("--samples", type=int, default=16)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_lzzx_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    from __graft_entry__ import _build
    from lzzx_nerf_tpu.ops.march2 import (build_inference_tables,
                                          compact_rays,
                                          march_rays_window_bitmask_nb_block,
                                          ray_windows)
    from lzzx_nerf_tpu.ops.ray import near_far_from_aabb
    from lzzx_nerf_tpu.utils import get_rays

    res, S, K2 = args.res, args.samples, args.k2
    settings, occ, field, params = _build(res=res, grid=128, max_steps=S)
    budget = max(1024, int(0.375 * res * res) // 1024 * 1024)
    budget_b = budget // 4
    N = res * res
    NB = N // 4
    H = W = res
    aabb = jnp.asarray(settings.aabb, jnp.float32)

    pose = jnp.asarray(np.array(
        [[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, -2.5], [0, 0, 0, 1]],
        np.float32))[None]
    intr = (res / 0.6, res / 0.6, res / 2, res / 2)
    rays = get_rays(pose, intr, res, res, N=-1)
    rays_o0, rays_d = rays["rays_o"][0][0], rays["rays_d"][0]
    tables = jax.jit(lambda o: build_inference_tables(
        o, settings.bound, variants=("nb5w",)))(occ.occ)

    d_blocks = rays_d.reshape(H // 2, 2, W // 2, 2, 3).transpose(
        0, 2, 1, 3, 4).reshape(NB, 4, 3)
    d_center = d_blocks.mean(axis=1)
    d_center = d_center / jnp.linalg.norm(d_center, axis=-1, keepdims=True)
    o_center = jnp.broadcast_to(rays_o0, d_center.shape)
    nears_b, fars_b = near_far_from_aabb(o_center, d_center, aabb,
                                         settings.min_near)
    win = ray_windows(o_center, d_center, nears_b, fars_b, tables.z_lo,
                      tables.z_hi, settings.bound, settings.dt, pad_steps=3.0)
    cs = compact_rays(win.active, budget_b)
    cols = jnp.concatenate(
        [d_blocks.reshape(NB, 12), win.t_start[:, None], win.t_end[:, None],
         d_center], axis=-1)
    rows = jnp.take(cols, cs.ray_idx, axis=0)
    rd = rows[:, :12].reshape(budget_b * 4, 3)
    t0_blk = rows[:, 12]
    t1b = jnp.repeat(rows[:, 13], 4)
    dc = rows[:, 14:17]
    ro = jnp.broadcast_to(rays_o0, rd.shape)
    slot_valid = jnp.repeat(cs.slot_valid, 4)
    nears_r, fars_r = near_far_from_aabb(ro, rd, aabb, settings.min_near)
    t_start = jnp.maximum(nears_r, jnp.repeat(t0_blk, 4))
    k0 = jnp.ceil(jnp.maximum(t_start - nears_r, 0.0) / settings.dt - 1e-4)
    t_start = nears_r + k0 * settings.dt
    t_end = jnp.minimum(fars_r, t1b)
    bound, dt = settings.bound, settings.dt
    print(f"res={res} budget={budget} blocks={budget_b} K2={K2} S={S}")

    def f_nb5w(t_start, *a):
        return march_rays_window_bitmask_nb_block(
            ro, rd, t_start, t_end, slot_valid, t0_blk, dc,
            tables.col_nb5wmask, bound, dt, K2, S, variant="nb5w")

    def f_nb5wp(t_start, *a):
        return march_rays_window_bitmask_nb_block(
            ro, rd, t_start, t_end, slot_valid, t0_blk, dc,
            tables.col_nb5wmask, bound, dt, K2, S, variant="nb5wp")

    for name, f in (("march nb5w (XLA select)", f_nb5w),
                    ("march nb5wp (Pallas)", f_nb5wp)):
        chain_time(f, (t_start,), args.iters, name)


if __name__ == "__main__":
    main()
