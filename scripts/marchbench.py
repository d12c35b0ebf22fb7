"""March-phase variant comparison at the 512² serving shapes (chained
device timing — block_until_ready lies on the axon tunnel, PERF.md).

Variants:
  dilated   march_rays_window_bitmask (g2, single dilated column row/group)
  nb        march_rays_window_bitmask_nb (per-ray exact 3x3 row/group)
  nb5-ws    march_rays_window_bitmask_nb_block, wslice select (block-shared
            5x5 row per (2x2 block, group) — 4x fewer fetch rows)
  nb5-nf    same, nb_first select
  fetch-*   the raw row gathers alone (separates gather vs select cost)

Usage: python scripts/marchbench.py [--res 512] [--iters 30] [--k2 40]
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
    ap.add_argument("--k2", type=int, default=40)
    ap.add_argument("--samples", type=int, default=16)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_lzzx_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    from __graft_entry__ import _build
    from lzzx_nerf_tpu.ops.march2 import (build_inference_tables,
                                          compact_rays,
                                          march_rays_window_bitmask,
                                          march_rays_window_bitmask_nb,
                                          march_rays_window_bitmask_nb_block,
                                          ray_windows)
    from lzzx_nerf_tpu.ops.ray import near_far_from_aabb
    from lzzx_nerf_tpu.utils import get_rays

    res, S, K2 = args.res, args.samples, args.k2
    settings, occ, field, params = _build(res=res, grid=128, max_steps=S)
    budget = max(1024, int(0.5 * res * res) // 1024 * 1024)
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
    tables = jax.jit(
        lambda o: build_inference_tables(o, settings.bound))(occ.occ)

    # block windows + compaction (once; same prep as the renderer)
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
    t0b = jnp.repeat(t0_blk, 4)
    t1b = jnp.repeat(rows[:, 13], 4)
    dc = rows[:, 14:17]
    ro = jnp.broadcast_to(rays_o0, rd.shape)
    slot_valid = jnp.repeat(cs.slot_valid, 4)
    nears_r, fars_r = near_far_from_aabb(ro, rd, aabb, settings.min_near)
    t_start = jnp.maximum(nears_r, t0b)
    k0 = jnp.ceil(jnp.maximum(t_start - nears_r, 0.0) / settings.dt - 1e-4)
    t_start = nears_r + k0 * settings.dt
    t_end = jnp.minimum(fars_r, t1b)
    B = budget_b * 4
    G = (K2 + 1) // 2
    print(f"res={res} budget={budget} (blocks {budget_b}) K2={K2} G={G} S={S}"
          f" | rows/frame: per-ray {B * G / 1e6:.2f}M x36B,"
          f" block {budget_b * G / 1e6:.2f}M x100B")

    bound, dt = settings.bound, settings.dt

    def f_dilated(t_start, *a):
        return march_rays_window_bitmask(
            ro, rd, t_start, t_end, slot_valid, tables.col_bitmask,
            bound, dt, K2, S, group=2)

    def f_nb(t_start, *a):
        return march_rays_window_bitmask_nb(
            ro, rd, t_start, t_end, slot_valid, tables.col_nbmask,
            bound, dt, K2, S)

    def f_nb5_ws(t_start, *a):
        return march_rays_window_bitmask_nb_block(
            ro, rd, t_start, t_end, slot_valid, t0_blk, dc,
            tables.col_nb5mask, bound, dt, K2, S, variant="wslice")

    def f_nb5_nf(t_start, *a):
        return march_rays_window_bitmask_nb_block(
            ro, rd, t_start, t_end, slot_valid, t0_blk, dc,
            tables.col_nb5mask, bound, dt, K2, S, variant="nb_first")

    def f_nb5_zb(t_start, *a):
        return march_rays_window_bitmask_nb_block(
            ro, rd, t_start, t_end, slot_valid, t0_blk, dc,
            tables.col_nb5mask, bound, dt, K2, S, variant="zband")

    def f_nb5_zb4(t_start, *a):
        return march_rays_window_bitmask_nb_block(
            ro, rd, t_start, t_end, slot_valid, t0_blk, dc,
            tables.col_nb5mask, bound, dt, K2, S, variant="zband4")

    # raw fetches only (gather cost floor of each scheme)
    gk = jnp.arange(G, dtype=jnp.float32) * 2 + 0.5

    def f_fetch_ray(t_start, *a):
        t_g = t_start[:, None] + gk[None] * dt
        pg = ro[:, None, :] + t_g[..., None] * rd[:, None, :]
        pg = jnp.clip(pg, -bound, bound)
        cx = jnp.clip((pg[..., 0] / bound + 1.0) * 0.5 * 128, 0, 127)
        cy = jnp.clip((pg[..., 1] / bound + 1.0) * 0.5 * 128, 0, 127)
        idx = (cx.astype(jnp.int32) * 128 + cy.astype(jnp.int32))
        return jnp.take(tables.col_nbmask, idx.reshape(-1), axis=0).sum(
            dtype=jnp.uint32)

    def f_fetch_blk(t0_blk, *a):
        t_g = t0_blk[:, None] + gk[None] * dt
        pg = o_center[:budget_b, None, :] + t_g[..., None] * dc[:, None, :]
        pg = jnp.clip(pg, -bound, bound)
        cx = jnp.clip((pg[..., 0] / bound + 1.0) * 0.5 * 128, 0, 127)
        cy = jnp.clip((pg[..., 1] / bound + 1.0) * 0.5 * 128, 0, 127)
        idx = (cx.astype(jnp.int32) * 128 + cy.astype(jnp.int32))
        return jnp.take(tables.col_nb5mask, idx.reshape(-1), axis=0).sum(
            dtype=jnp.uint32)

    for name, f, a in (
            ("fetch per-ray 3x3", f_fetch_ray, (t_start,)),
            ("fetch block 5x5", f_fetch_blk, (t0_blk,)),
            ("march dilated g2", f_dilated, (t_start,)),
            ("march nb per-ray", f_nb, (t_start,)),
            ("march nb5 block wslice", f_nb5_ws, (t_start,)),
            ("march nb5 block nb_first", f_nb5_nf, (t_start,)),
            ("march nb5 block zband", f_nb5_zb, (t_start,)),
            ("march nb5 block zband4", f_nb5_zb4, (t_start,)),
    ):
        chain_time(f, a, args.iters, name)


if __name__ == "__main__":
    main()
