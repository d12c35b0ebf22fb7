"""Per-phase timing of the CURRENT serving operating point (block windows,
bitmask march, bf16 tables, staged eval, folded MLPs) with trustworthy
device timing.

block_until_ready on the tunneled axon platform can return before compute
finishes (see PERF.md), so every phase here is timed by chaining `iters`
evaluations through a lax.scan carry — each iteration's input depends on
the previous output, forcing sequential device execution inside one
program — and fetching one scalar at the end.

Usage: python scripts/phasebench2.py [--res 512] [--iters 30]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


from lzzx_nerf_tpu.utils.profiling import chain_time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=512)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--k2", type=int, default=48,
                    help="48 = the bench scene's adaptive K2 at grid 128")
    ap.add_argument("--budget-frac", type=float, default=0.375,
                    help="match Config.budget_frac (round-3 default)")
    ap.add_argument("--samples", type=int, default=16)
    ap.add_argument("--stage-split", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_lzzx_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    from __graft_entry__ import _build
    from lzzx_nerf_tpu.models.nerf import make_fused_apply
    from lzzx_nerf_tpu.ops.march2 import (build_inference_tables,
                                          compact_rays,
                                          march_rays_window_bitmask,
                                          ray_windows)
    from lzzx_nerf_tpu.ops.ray import near_far_from_aabb
    from lzzx_nerf_tpu.render.renderer import _staged_eval_composite
    from lzzx_nerf_tpu.utils import get_rays, rgb_to_yuv420

    res = args.res
    S = args.samples
    S1 = args.stage_split
    settings, occ, field, params = _build(res=res, grid=128, max_steps=S)
    budget = max(1024, int(args.budget_frac * res * res) // 1024 * 1024)
    budget_b = budget // 4
    b2 = max(1024, int(budget * 0.375) // 1024 * 1024)
    K2 = args.k2
    N = res * res
    print(f"res={res} budget={budget} S={S} split={S1} K2={K2} b2={b2}")

    pose = jnp.asarray(np.array(
        [[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, -2.5], [0, 0, 0, 1]],
        np.float32))[None]
    intr = (res / 0.6, res / 0.6, res / 2, res / 2)
    rays = get_rays(pose, intr, res, res, N=-1)
    rays_o0, rays_d = rays["rays_o"][0][0], rays["rays_d"][0]
    bg = jnp.ones((N, 3))
    packed = jax.jit(lambda p: field.apply(p, method="bake_tables",
                                           dtype=jnp.bfloat16))(params)
    tables = jax.jit(
        lambda o: build_inference_tables(o, settings.bound))(occ.occ)
    enc_a = jax.jit(lambda p, a: field.apply(p, a, method="encode_audio"))(
        params, jnp.zeros((8, 16, 1024)))
    eye = jnp.asarray([0.25])
    ccode = params["params"]["individual_codes"][0]
    aabb = jnp.asarray(settings.aabb, jnp.float32)
    H, W = res, res
    NB = N // 4

    # ---- A: block windows + compaction (renderer.py block path)
    def phase_windows(rays_d, z_lo, z_hi):
        d_blocks = rays_d.reshape(H // 2, 2, W // 2, 2, 3).transpose(
            0, 2, 1, 3, 4).reshape(NB, 4, 3)
        d_center = d_blocks.mean(axis=1)
        d_center = d_center / jnp.linalg.norm(d_center, axis=-1,
                                              keepdims=True)
        o_center = jnp.broadcast_to(rays_o0, d_center.shape)
        nears_b, fars_b = near_far_from_aabb(o_center, d_center, aabb,
                                             settings.min_near)
        win = ray_windows(o_center, d_center, nears_b, fars_b, z_lo, z_hi,
                          settings.bound, settings.dt, pad_steps=3.0)
        cs = compact_rays(win.active, budget_b)
        cols = jnp.concatenate(
            [d_blocks.reshape(NB, 12), win.t_start[:, None],
             win.t_end[:, None]], axis=-1)
        rows = jnp.take(cols, cs.ray_idx, axis=0)
        return rows, cs.slot_valid, cs.ray_idx

    chain_time(phase_windows, (rays_d, tables.z_lo, tables.z_hi),
               args.iters, "A windows+compact (blocks)")

    rows, slot_valid_b, ray_idx = jax.jit(phase_windows)(
        rays_d, tables.z_lo, tables.z_hi)
    rd = rows[:, :12].reshape(budget_b * 4, 3)
    t0b = jnp.repeat(rows[:, 12], 4)
    t1b = jnp.repeat(rows[:, 13], 4)
    ro = jnp.broadcast_to(rays_o0, rd.shape)
    slot_valid = jnp.repeat(slot_valid_b, 4)

    # ---- B: per-ray re-anchor + bitmask march
    def phase_march(ro, rd, t0b, t1b, slot_valid, col_bitmask):
        nears_r, fars_r = near_far_from_aabb(ro, rd, aabb, settings.min_near)
        t_start = jnp.maximum(nears_r, t0b)
        k0 = jnp.ceil(jnp.maximum(t_start - nears_r, 0.0)
                      / settings.dt - 1e-4)
        t_start = nears_r + k0 * settings.dt
        t_end = jnp.minimum(fars_r, t1b)
        return march_rays_window_bitmask(
            ro, rd, t_start, t_end, slot_valid, col_bitmask,
            settings.bound, settings.dt, K2, S)

    chain_time(phase_march, (ro, rd, t0b, t1b, slot_valid,
                             tables.col_bitmask), args.iters,
               "B march (bitmask)")
    m = jax.jit(phase_march)(ro, rd, t0b, t1b, slot_valid,
                             tables.col_bitmask)

    # ---- C: stage-1 triplane lookup only
    B = budget_b * 4
    pts1 = m.xyzs[:, :S1].reshape(B * S1, 3)
    dirs1 = jnp.repeat(rd, S1, axis=0)

    def phase_lookup(pts):
        return field.apply(params, pts, packed=packed, method="encode_x")

    chain_time(phase_lookup, (pts1,), args.iters,
               f"C lookup stage1 ({B * S1} pts)")

    # ---- D: folded MLP on stage-1 samples (lookup excluded)
    from lzzx_nerf_tpu.ops.fused_field import (extract_field_weights,
                                               fold_frame_weights,
                                               fused_field_eval_reference)
    enc_x1 = jax.jit(phase_lookup)(pts1)
    fw = jax.jit(lambda p, a: fold_frame_weights(
        extract_field_weights(p), a, ccode, eye))(params, enc_a)

    def phase_mlp(enc_x, dirs):
        return fused_field_eval_reference(fw, enc_x, dirs)

    chain_time(phase_mlp, (enc_x1, dirs1), args.iters,
               f"D folded MLPs stage1 ({B * S1})")

    # ---- E: staged eval + composite (both stages, incl. lookups/MLPs)
    apply_f = make_fused_apply(field, packed)

    def phase_staged(xyzs, deltas, ts, mask, rd):
        mm = type(m)(xyzs=xyzs, deltas=deltas, ts=ts, mask=mask)
        return _staged_eval_composite(apply_f, params, settings, mm, rd,
                                      enc_a, ccode, eye, B, S, S1, b2)

    chain_time(phase_staged, (m.xyzs, m.deltas, m.ts, m.mask, rd),
               args.iters, "E staged eval+composite")

    # ---- F: scatter back + yuv420 pack
    img_c, wsum_c, _, _ = jax.jit(phase_staged)(m.xyzs, m.deltas, m.ts,
                                                m.mask, rd)

    def phase_scatter(image_c, wsum_c, bg):
        tgt = jnp.where(slot_valid_b, ray_idx, NB)
        payload = jnp.concatenate(
            [image_c.reshape(budget_b, 12), wsum_c.reshape(budget_b, 4)],
            axis=-1)
        acc = jnp.zeros((NB, 16)).at[tgt].set(payload, mode="drop")
        img_acc = acc[:, :12].reshape(H // 2, W // 2, 2, 2, 3).transpose(
            0, 2, 1, 3, 4).reshape(N, 3)
        wsum = acc[:, 12:16].reshape(H // 2, W // 2, 2, 2).transpose(
            0, 2, 1, 3).reshape(N)
        image = jnp.clip(img_acc + (1.0 - wsum)[:, None] * bg, 0.0, 1.0)
        return rgb_to_yuv420(image.reshape(H, W, 3))

    chain_time(phase_scatter, (img_c, wsum_c, bg), args.iters,
               "F scatter+yuv420")

    # ---- audio encode (per frame)
    def phase_audio(auds):
        return field.apply(params, auds, method="encode_audio")

    chain_time(phase_audio, (jnp.zeros((8, 16, 1024)),), args.iters,
               "G audio encode")


if __name__ == "__main__":
    main()
