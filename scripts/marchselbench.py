"""Isolated A/B of the quadw march-select subgraph (chained timing).

profile_frame.py showed the quadw march fetch-fusion at 6.65 ms/frame
(18%, ~81M rows/s — 5x below gatherbench's 400M rows/s floor) plus ~5 ms
of downstream layout churn. This bench reproduces the EXACT production
march inputs (same camera/grid/K2 as the 512² operating point, real
compaction-ordered indices) and times the march alone plus structural
variants of the word-select, to find where the time actually goes.

CAVEAT (PERF.md): isolated programs fuse differently from the full frame;
any winner must be confirmed with a full-frame bench.py A/B.

Usage: python scripts/marchselbench.py
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from lzzx_nerf_tpu.utils.profiling import chain_time


def build_inputs(res=512, grid=128, samples=16, budget_frac=0.375):
    from __graft_entry__ import _build
    from lzzx_nerf_tpu.ops.march2 import (build_inference_tables,
                                          compact_rays, ray_windows,
                                          resolve_march_plan)
    from lzzx_nerf_tpu.ops.ray import near_far_from_aabb
    from lzzx_nerf_tpu.utils import get_rays

    settings, occ, field, params = _build(res=res, grid=grid,
                                          max_steps=samples)
    budget = max(1024, int(budget_frac * res * res) // 1024 * 1024)
    pose = jnp.asarray(np.array(
        [[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, -2.5], [0, 0, 0, 1]],
        np.float32))[None]
    intr = (res / 0.6, res / 0.6, res / 2, res / 2)
    rays = get_rays(pose, intr, res, res, N=-1)
    rays_o_origin = rays["rays_o"][0][0]
    rays_d = rays["rays_d"][0]
    tables = jax.jit(lambda o: build_inference_tables(
        o, settings.bound,
        variants=("quadw", "quad", "nb5", "quadwx", "nb5w")))(occ.occ)
    k2, group, variant = resolve_march_plan(
        settings, tables.z_lo, tables.z_hi, np.asarray(pose), intr, res, res,
        march_group=2, march_variant="quadw", measure="block",
        log=lambda m: print(f"# {m}", file=sys.stderr))
    assert variant == "quadw" and group == 2

    H, W = res, res
    NB = (H * W) // 4
    budget_b = budget // 4
    aabb = jnp.asarray(settings.aabb, jnp.float32)

    @jax.jit
    def prep(rays_d, z_lo, z_hi):
        d_blocks = rays_d.reshape(H // 2, 2, W // 2, 2, 3).transpose(
            0, 2, 1, 3, 4).reshape(NB, 4, 3)
        d_center = d_blocks.mean(axis=1)
        d_center = d_center / jnp.linalg.norm(d_center, axis=-1,
                                              keepdims=True)
        o_center = jnp.broadcast_to(rays_o_origin, d_center.shape)
        nears_b, fars_b = near_far_from_aabb(o_center, d_center, aabb,
                                             settings.min_near)
        win = ray_windows(o_center, d_center, nears_b, fars_b, z_lo, z_hi,
                          settings.bound, settings.dt, pad_steps=3.0)
        cs = compact_rays(win.active, budget_b)
        cols = jnp.concatenate(
            [d_blocks.reshape(NB, 12), win.t_start[:, None],
             win.t_end[:, None], d_center], axis=-1)
        rows = jnp.take(cols, cs.ray_idx, axis=0)
        rd = rows[:, :12].reshape(budget_b * 4, 3)
        t0_blk = rows[:, 12]
        t0b = jnp.repeat(t0_blk, 4)
        t1b = jnp.repeat(rows[:, 13], 4)
        dc = rows[:, 14:17]
        ro = jnp.broadcast_to(rays_o_origin, rd.shape)
        slot_valid = jnp.repeat(cs.slot_valid, 4)
        nears_r, fars_r = near_far_from_aabb(ro, rd, aabb, settings.min_near)
        t_start = jnp.maximum(nears_r, t0b)
        k0 = jnp.ceil(jnp.maximum(t_start - nears_r, 0.0)
                      / settings.dt - 1e-4)
        t_start = nears_r + k0 * settings.dt
        t_end = jnp.minimum(fars_r, t1b)
        return ro, rd, t_start, t_end, slot_valid, t0_blk, dc

    ro, rd, t_start, t_end, slot_valid, t0_blk, dc = jax.block_until_ready(
        prep(rays_d, tables.z_lo, tables.z_hi))
    return (settings, tables, k2,
            (ro, rd, t_start, t_end, slot_valid, t0_blk, dc))


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_lzzx_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    from lzzx_nerf_tpu.ops.march2 import march_rays_window_bitmask_nb_block

    settings, tables, K2, inp = build_inputs()
    ro, rd, t_start, t_end, slot_valid, t0_blk, dc = inp
    S = settings.max_steps
    bound, dt = settings.bound, settings.dt
    tqw = tables.col_quadwmask
    tq = tables.col_quadmask
    B = ro.shape[0]
    Bb = B // 4
    G = (K2 + 1) // 2
    print(f"# B={B} Bb={Bb} K2={K2} G={G} rows/frame={Bb*G}")

    def march_q(variant):
        tbl = tqw if variant == "quadw" else tq

        def f(ro, rd, t_start, t_end, slot_valid, t0_blk, dc, tbl):
            m = march_rays_window_bitmask_nb_block(
                ro, rd, t_start, t_end, slot_valid, t0_blk, dc, tbl,
                bound, dt, K2, S, variant=variant)
            return m.xyzs, m.deltas, m.ts, m.mask
        return f

    args = (ro, rd, t_start, t_end, slot_valid, t0_blk, dc)

    # ---- baseline marches + the row-count-cliff fixes (quadwx: sy folded
    # into row width, [2H²W32, 64]; nb5w: symmetric word-baked,
    # [H²W32, 50] — both inside the gather full-rate zone)
    for v in ("quadw", "quad", "wslice", "quadwx", "nb5w", "nb5wz",
              "nb5wz4"):
        tbl = (tqw if v == "quadw" else tq if v == "quad"
               else tables.col_quadwxmask if v == "quadwx"
               else tables.col_nb5wmask if v.startswith("nb5w")
               else tables.col_nb5mask)
        ms = chain_time(march_q(v), args + (tbl,))
        print(f"march {v:8s}: {ms:7.2f} ms", flush=True)

    # ---- components: the quadw fetch index + gather alone (fused reduce:
    # gatherbench-style floor) and gather->materialized-ish consumer
    H = settings.grid_size
    W32 = H // 32

    def quadw_idx(t0_blk, dc):
        o_blk = ro.reshape(Bb, 4, 3).mean(axis=1)
        gk = jnp.arange(G, dtype=jnp.float32) * 2 + 0.5
        t_g = t0_blk[:, None] + gk[None] * dt
        pg = jnp.clip(o_blk[:, None, :] + t_g[..., None] * dc[:, None, :],
                      -bound, bound)
        gx = jnp.clip((pg[..., 0] / bound + 1.0) * 0.5 * H, 0, H - 1
                      ).astype(jnp.int32)
        gy = jnp.clip((pg[..., 1] / bound + 1.0) * 0.5 * H, 0, H - 1
                      ).astype(jnp.int32)
        gz = jnp.clip((pg[..., 2] / bound + 1.0) * 0.5 * H, 0, H - 1
                      ).astype(jnp.int32)
        w0 = jnp.clip(jnp.maximum(gz - 3, 0) >> 5, 0, W32 - 1)
        sx = jnp.where(dc[:, 0] < 0, -1, 1).astype(jnp.int32)
        sy = jnp.where(dc[:, 1] < 0, -1, 1).astype(jnp.int32)
        q = ((sx < 0).astype(jnp.int32) * 2 + (sy < 0).astype(jnp.int32))
        idx = (q[:, None] * (H * H) + gx * H + gy) * W32 + w0
        return idx

    def g_reduce(t0_blk, dc, tbl):
        idx = quadw_idx(t0_blk, dc)
        rows = jnp.take(tbl, idx.reshape(-1), axis=0)
        return jnp.sum(rows.astype(jnp.float32))

    ms = chain_time(g_reduce, (t0_blk, dc, tqw))
    print(f"fetch+reduce (floor check): {ms:7.2f} ms "
          f"({Bb*G/ms*1e3/1e6:.0f}M rows/s)")

    def g_mat(t0_blk, dc, tbl):
        idx = quadw_idx(t0_blk, dc)
        rows = jnp.take(tbl, idx.reshape(-1), axis=0)
        # per-column reduce forces materialization-like consumption along
        # the minor axis without a trivially-fusable full reduce
        return jnp.sum(rows.astype(jnp.float32), axis=0)

    ms = chain_time(g_mat, (t0_blk, dc, tqw))
    print(f"fetch+colreduce:            {ms:7.2f} ms")

    def g_f32(t0_blk, dc, tbl):
        idx = quadw_idx(t0_blk, dc)
        rows = jnp.take(jax.lax.bitcast_convert_type(tbl, jnp.float32),
                        idx.reshape(-1), axis=0)
        return jnp.sum(jax.lax.bitcast_convert_type(
            rows, jnp.uint32).astype(jnp.float32))

    ms = chain_time(g_f32, (t0_blk, dc, tqw))
    print(f"fetch(f32 bitcast)+reduce:  {ms:7.2f} ms")

    # sorted indices: locality effect on the same row count
    def g_sorted(t0_blk, dc, tbl):
        idx = jnp.sort(quadw_idx(t0_blk, dc).reshape(-1))
        rows = jnp.take(tbl, idx, axis=0)
        return jnp.sum(rows.astype(jnp.float32))

    ms = chain_time(g_sorted, (t0_blk, dc, tqw))
    print(f"fetch(sorted)+reduce:       {ms:7.2f} ms")

    # transposed table: gather along axis=1 -> [32, N] lanes-major output
    # (the downstream [B, K2] layout is rays-minor {0,1}; a lanes-major
    # select chain may avoid every physical transpose the profiler saw)
    tqw_T = jax.jit(lambda t: t.T.copy())(tqw)

    def g_T_reduce(t0_blk, dc, tbl_T):
        idx = quadw_idx(t0_blk, dc)
        rows = jnp.take(tbl_T, idx.reshape(-1), axis=1)   # [32, N]
        return jnp.sum(rows.astype(jnp.float32))

    ms = chain_time(g_T_reduce, (t0_blk, dc, tqw_T))
    print(f"fetchT+reduce:              {ms:7.2f} ms")

    def g_T_colreduce(t0_blk, dc, tbl_T):
        idx = quadw_idx(t0_blk, dc)
        rows = jnp.take(tbl_T, idx.reshape(-1), axis=1)   # [32, N]
        return jnp.sum(rows.astype(jnp.float32), axis=0)  # [N] lanes-major

    ms = chain_time(g_T_colreduce, (t0_blk, dc, tqw_T))
    print(f"fetchT+colreduce:           {ms:7.2f} ms")

    # 2-D gather: fetch the exact WORD per candidate (8x the rows, width 1)
    def g_word(t0_blk, dc, tbl):
        idx = quadw_idx(t0_blk, dc)                       # [Bb, G]
        j2 = jnp.broadcast_to(
            jnp.arange(8, dtype=jnp.int32)[None, :, None] % 2,
            (Bb, 8, G))                                   # stand-in select
        flat = idx[:, None, :] * 32 + j2                  # [Bb, 8, G]
        words = jnp.take(tbl.reshape(-1), flat.reshape(-1), axis=0)
        return jnp.sum(words.astype(jnp.float32))

    ms = chain_time(g_word, (t0_blk, dc, tqw))
    print(f"word-gather(8x rows, w1):   {ms:7.2f} ms")

    # full quadw select on the transposed fetch: same math as the march's
    # select stage, all tensors [*, N]-lanes-major end to end
    def march_T(ro, rd, t_start, t_end, slot_valid, t0_blk, dc, tbl_T):
        o_blk = ro.reshape(Bb, 4, 3).mean(axis=1)
        gk = jnp.arange(G, dtype=jnp.float32) * 2 + 0.5
        t_g = t0_blk[:, None] + gk[None] * dt
        pg = jnp.clip(o_blk[:, None, :] + t_g[..., None] * dc[:, None, :],
                      -bound, bound)
        gx = jnp.clip((pg[..., 0] / bound + 1.0) * 0.5 * H, 0, H - 1
                      ).astype(jnp.int32)
        gy = jnp.clip((pg[..., 1] / bound + 1.0) * 0.5 * H, 0, H - 1
                      ).astype(jnp.int32)
        gz = jnp.clip((pg[..., 2] / bound + 1.0) * 0.5 * H, 0, H - 1
                      ).astype(jnp.int32)
        w0 = jnp.clip(jnp.maximum(gz - 3, 0) >> 5, 0, W32 - 1)
        sx = jnp.where(dc[:, 0] < 0, -1, 1).astype(jnp.int32)
        sy = jnp.where(dc[:, 1] < 0, -1, 1).astype(jnp.int32)
        q = (sx < 0).astype(jnp.int32) * 2 + (sy < 0).astype(jnp.int32)
        idx = (q[:, None] * (H * H) + gx * H + gy) * W32 + w0
        rowsT = jnp.take(tbl_T, idx.reshape(-1), axis=1)  # [32, Bb*G]

        kg = (jnp.arange(G, dtype=jnp.float32)[:, None] * 2
              + jnp.arange(2, dtype=jnp.float32)[None, :])
        t_cand = t_start[:, None, None] + kg[None] * dt   # [B, G, 2]
        pos = (ro[:, None, None, :]
               + t_cand[..., None] * rd[:, None, None, :])
        pos = jnp.clip(pos, -bound, bound)
        gp = jnp.clip(0.5 * (pos / bound + 1.0) * H, 0, H - 1
                      ).astype(jnp.int32)
        cx, cy, cz = gp[..., 0], gp[..., 1], gp[..., 2]
        cxb = cx.reshape(Bb, 4, G, 2)
        cyb = cy.reshape(Bb, 4, G, 2)
        czb = cz.reshape(Bb, 4, G, 2)
        ix = jnp.clip(sx[:, None, None, None]
                      * (cxb - gx[:, None, :, None]) + 1, 0, 3)
        iy = jnp.clip(sy[:, None, None, None]
                      * (cyb - gy[:, None, :, None]) + 1, 0, 3)
        nb = ix * 4 + iy
        word = czb >> 5
        bit = (czb & 31).astype(jnp.uint32)
        widx = jnp.clip(word - w0[:, None, :, None], 0, 1)
        j2 = nb * 2 + widx                                # [Bb, 4, G, 2]
        # candidate-major [8, Bb*G]: one compare+select+add per word j,
        # lanes carry Bb*G throughout
        j2T = j2.transpose(1, 3, 0, 2).reshape(8, Bb * G)
        bitT = bit.transpose(1, 3, 0, 2).reshape(8, Bb * G)
        fmask = (j2T[None] == jnp.arange(32, dtype=jnp.int32)[:, None, None])
        wsel = jnp.sum(
            jnp.where(fmask, rowsT[:, None, :], jnp.uint32(0)),
            axis=0, dtype=jnp.uint32)                     # [8, Bb*G]
        occT = ((wsel >> bitT) & jnp.uint32(1)) > 0       # [8, Bb*G]
        return occT.astype(jnp.float32)

    ms = chain_time(march_T, args + (tqw_T,))
    print(f"quadw select, lanes-major:  {ms:7.2f} ms (fetch+select+bit)")

    # sanity only: the lanes-major occupancy bits are a SUPERSET of the
    # production march's selected-sample mask (occ before the t_end /
    # slot_valid / first-S filters) — printed for eyeballing, not asserted
    occT = jax.jit(march_T)(*args, tqw_T)
    occT = np.asarray(occT).reshape(4, 2, Bb, G)

    def march_occ_ref(ro, rd, t_start, t_end, slot_valid, t0_blk, dc, tbl):
        m = march_rays_window_bitmask_nb_block(
            ro, rd, t_start, t_end, slot_valid, t0_blk, dc, tbl,
            bound, dt, K2, S, variant="quadw")
        return m
    # occupancy isn't directly returned by the march; compare via the mask
    # of selected samples instead (same inputs, same K2/S)
    m_ref = jax.jit(march_occ_ref)(*args, tqw)
    print(f"# ref march mask sum {np.asarray(m_ref.mask).sum()}, "
          f"occT bits {occT.sum():.0f} (occ superset of mask; sanity only)")



if __name__ == "__main__":
    main()
