"""Per-phase timing of the 512² compact render on the real chip.

Times each phase of render_rays_compact in isolation (own jit, realistic
shapes) so perf levers can be evaluated without recompiling the full frame
program (512² full-frame compiles take 10+ min on the remote service).

Usage: python scripts/phasebench.py [--res 512] [--budget-frac 0.5]
       [--samples 16] [--k2 0] [--reps 20]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, reps=20, warmup=2):
    import jax
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1000.0  # ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=512)
    ap.add_argument("--budget-frac", type=float, default=0.5)
    ap.add_argument("--samples", type=int, default=16)
    ap.add_argument("--k2", type=int, default=0)
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--bf16", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_lzzx_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    from __graft_entry__ import _build
    from lzzx_nerf_tpu.ops.march2 import (column_intervals, compact_rays,
                                          default_window_candidates,
                                          march_rays_window, ray_windows)
    from lzzx_nerf_tpu.ops.ray import near_far_from_aabb
    from lzzx_nerf_tpu.ops.composite import composite_rays
    from lzzx_nerf_tpu.utils import get_rays

    res = args.res
    S = args.samples
    settings, occ, field, params = _build(res=res, grid=128, max_steps=S,
                                          bf16=args.bf16)
    budget = max(1024, int(args.budget_frac * res * res) // 1024 * 1024)
    K2 = args.k2 or default_window_candidates(settings.bound,
                                              settings.grid_size, settings.dt)
    N = res * res
    print(f"res={res} N={N} budget={budget} S={S} K2={K2} bf16={args.bf16}")

    pose = jnp.asarray(np.array(
        [[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, -2.5], [0, 0, 0, 1]],
        np.float32))[None]
    intr = (res / 0.6, res / 0.6, res / 2, res / 2)
    rays = get_rays(pose, intr, res, res, N=-1)
    rays_o, rays_d = rays["rays_o"][0], rays["rays_d"][0]
    bg = jnp.ones((N, 3))
    packed = jax.jit(lambda p: field.apply(p, method="bake_tables"))(params)
    enc_a = jax.jit(
        lambda p, a: field.apply(p, a, method="encode_audio"))(
            params, jnp.zeros((8, 16, 1024)))
    eye = jnp.asarray([0.25])
    ccode = params["params"]["individual_codes"][0]

    # ---- phase 1: windows (near/far + column intervals + ray windows +
    # compaction)
    @jax.jit
    def phase_windows(occ, rays_o, rays_d):
        aabb = jnp.asarray(settings.aabb, jnp.float32)
        nears, fars = near_far_from_aabb(rays_o, rays_d, aabb,
                                         settings.min_near)
        z_lo, z_hi = column_intervals(occ.occ, settings.bound)
        win = ray_windows(rays_o, rays_d, nears, fars, z_lo, z_hi,
                          settings.bound, settings.dt)
        cs = compact_rays(win.active, budget)
        return (jnp.take(rays_o, cs.ray_idx, axis=0),
                jnp.take(rays_d, cs.ray_idx, axis=0),
                jnp.take(win.t_start, cs.ray_idx),
                jnp.take(win.t_end, cs.ray_idx),
                cs.slot_valid, cs.ray_idx, cs.n_active,
                jnp.take(nears, cs.ray_idx), jnp.take(fars, cs.ray_idx),
                jnp.take(bg, cs.ray_idx, axis=0))

    w = phase_windows(occ, rays_o, rays_d)
    ro, rd, t0c, t1c, slot_valid, ray_idx, n_active, nears_c, fars_c, bg_c = w
    print(f"n_active = {int(n_active)} / budget {budget}")
    t = timeit(phase_windows, occ, rays_o, rays_d, reps=args.reps)
    print(f"windows+compact      : {t:8.2f} ms")

    # ---- phase 2: march (current: per-candidate occ gathers)
    @jax.jit
    def phase_march(ro, rd, t0c, t1c, slot_valid, occ):
        return march_rays_window(ro, rd, t0c, t1c, slot_valid, occ.occ,
                                 settings.bound, settings.dt, K2, S)

    m = phase_march(ro, rd, t0c, t1c, slot_valid, occ)
    t = timeit(phase_march, ro, rd, t0c, t1c, slot_valid, occ,
               reps=args.reps)
    print(f"march (v2 gathers)   : {t:8.2f} ms")

    # ---- phase 3: triplane encode (packed lookup only)
    pts = m.xyzs.reshape(budget * S, 3)
    dirs = jnp.repeat(rd, S, axis=0)

    @jax.jit
    def phase_triplane(packed, pts):
        return field.apply(params, pts, packed=packed, method="encode_x")

    enc_x = phase_triplane(packed, pts)
    t = timeit(phase_triplane, packed, pts, reps=args.reps)
    print(f"triplane lookup      : {t:8.2f} ms   ({budget*S} pts)")

    # ---- phase 4: field MLPs (full apply, pts passed as a real argument)
    @jax.jit
    def phase_field(params, packed, pts, dirs, enc_a, eye):
        return field.apply(params, pts, dirs, enc_a, ccode, eye,
                           compute_uncertainty=False, packed=packed)

    out = phase_field(params, packed, pts, dirs, enc_a, eye)
    t = timeit(phase_field, params, packed, pts, dirs, enc_a, eye,
               reps=args.reps)
    print(f"field (gather+MLPs)  : {t:8.2f} ms   (subtract triplane for MLPs)")

    # ---- phase 5: composite + scatter back
    sigmas = out.sigma.reshape(budget, S)
    rgbs = out.color.reshape(budget, S, 3)
    amb_a = jnp.abs(out.ambient_aud).reshape(budget, S)
    amb_e = jnp.abs(out.ambient_eye).reshape(budget, S)
    unc = out.uncertainty.reshape(budget, S)

    @jax.jit
    def phase_composite(sigmas, rgbs, amb_a, amb_e, unc, m, bg_c, slot_valid,
                        ray_idx):
        comp = composite_rays(sigmas, rgbs, amb_a, amb_e, unc, m.deltas, m.ts,
                              m.mask, T_thresh=settings.T_thresh)
        image_c = jnp.clip(
            comp.image + (1.0 - comp.weights_sum)[:, None] * bg_c, 0.0, 1.0)
        tgt = jnp.where(slot_valid, ray_idx, N)
        image = jnp.clip(bg, 0, 1).at[tgt].set(image_c, mode="drop")
        return (image * 255).astype(jnp.uint8)

    img = phase_composite(sigmas, rgbs, amb_a, amb_e, unc, m, bg_c,
                          slot_valid, ray_idx)
    t = timeit(phase_composite, sigmas, rgbs, amb_a, amb_e, unc, m, bg_c,
               slot_valid, ray_idx, reps=args.reps)
    print(f"composite+scatter    : {t:8.2f} ms")

    # ---- prototype: march v3 (column-bitmask occupancy, one gather per
    # 8-candidate group)
    H = settings.grid_size
    occ3 = occ.occ[0].astype(jnp.bool_)  # [H, H, H] z-last

    @jax.jit
    def make_colmasks(o):
        # 3x3 xy dilation (reference's own morton dilation is 3x3x3)
        od = jax.lax.reduce_window(o.astype(jnp.float32), 0.0, jax.lax.max,
                                   (3, 3, 1), (1, 1, 1), "SAME") > 0
        bits = od.reshape(H, H, H // 32, 32)
        w = (bits.astype(jnp.uint32)
             << jnp.arange(32, dtype=jnp.uint32)[None, None, None]).sum(-1,
             dtype=jnp.uint32)
        return w.reshape(H * H, H // 32)  # [16384, 4] uint32

    colmasks = make_colmasks(occ3)
    GRP = 8
    G = (K2 + GRP - 1) // GRP

    @jax.jit
    def phase_march3(ro, rd, t0c, t1c, slot_valid, colmasks):
        B = ro.shape[0]
        k = jnp.arange(K2, dtype=jnp.float32)
        t_cand = t0c[:, None] + k[None] * settings.dt          # [B, K2]
        # group-midpoint positions -> column index per group
        gk = (jnp.arange(G, dtype=jnp.float32) * GRP + (GRP - 1) / 2)
        t_g = t0c[:, None] + gk[None] * settings.dt            # [B, G]
        pg = ro[:, None, :] + t_g[..., None] * rd[:, None, :]
        pg = jnp.clip(pg, -settings.bound, settings.bound)
        cx = jnp.clip((pg[..., 0] / settings.bound + 1) * 0.5 * H,
                      0, H - 1).astype(jnp.int32)
        cy = jnp.clip((pg[..., 1] / settings.bound + 1) * 0.5 * H,
                      0, H - 1).astype(jnp.int32)
        rows = jnp.take(colmasks, (cx * H + cy).reshape(-1),
                        axis=0).reshape(B, G, H // 32)         # [B, G, 4]
        # per-candidate z cell
        pz = ro[:, 2:3] + t_cand * rd[:, 2:3]
        pz = jnp.clip(pz, -settings.bound, settings.bound)
        cz = jnp.clip((pz / settings.bound + 1) * 0.5 * H,
                      0, H - 1).astype(jnp.int32)              # [B, K2]
        word = cz >> 5
        bit = (cz & 31).astype(jnp.uint32)
        # expand group rows to candidates DENSELY (repeat, not gather) and
        # select the word with a 4-way masked sum (VPU) — no per-element
        # gathers anywhere past the G column fetches
        rows_k = jnp.repeat(rows, GRP, axis=1)[:, :K2]          # [B, K2, 4]
        wmask = (word[..., None] ==
                 jnp.arange(H // 32, dtype=jnp.int32)[None, None])
        wsel = jnp.sum(jnp.where(wmask, rows_k, jnp.uint32(0)), axis=-1,
                       dtype=jnp.uint32)
        occ_bit = (wsel >> bit) & jnp.uint32(1)
        valid = (occ_bit > 0) & (t_cand < t1c[:, None]) & slot_valid[:, None]
        score = jnp.where(valid, k[None], jnp.float32(K2))
        neg_topk, _ = jax.lax.top_k(-score, S)
        sel_k = -neg_topk
        mask = sel_k < K2
        sel_k = jnp.where(mask, sel_k, 0.0)
        t_sel = t0c[:, None] + sel_k * settings.dt
        xyzs = jnp.clip(ro[:, None, :] + t_sel[..., None] * rd[:, None, :],
                        -settings.bound, settings.bound)
        return xyzs, jnp.where(mask, settings.dt, 0.0), t_sel + settings.dt, mask

    m3 = phase_march3(ro, rd, t0c, t1c, slot_valid, colmasks)
    t = timeit(phase_march3, ro, rd, t0c, t1c, slot_valid, colmasks,
               reps=args.reps)
    print(f"march v3 (colmask)   : {t:8.2f} ms   (G={G} groups)")

    # sanity: how close are v2 and v3 sample sets? (v3 uses dilated grid so
    # it's a superset-ish; count matching mask rows)
    mm = np.asarray(m.mask)
    mm3 = np.asarray(m3[3])
    print(f"mask agreement: {(mm == mm3).mean():.4f} "
          f"(v2 kept {mm.mean():.4f}, v3 kept {mm3.mean():.4f})")

    # ---- triplane table variants: pack_shift x dtype (3 planes like the
    # real encoder; per-plane gather of budget*S points)
    from lzzx_nerf_tpu.ops.packed_triplane import (DenseTriplaneSpec,
                                                   bake_packed,
                                                   init_dense_planes,
                                                   packed_lookup)

    M = budget * S
    u = jnp.asarray(np.random.default_rng(1).uniform(0, 1, (M, 2)),
                    jnp.float32)

    for shift in (1, 2):
        spec = DenseTriplaneSpec(pack_shift=shift)
        levels = init_dense_planes(jax.random.PRNGKey(0), spec)
        for dt_ in ("f32", "bf16"):
            dtype = jnp.float32 if dt_ == "f32" else jnp.bfloat16
            tbl = jax.jit(lambda: bake_packed(levels, spec, dtype=dtype))()
            tbls = [tbl, tbl, tbl]

            @jax.jit
            def tri(tbls, u):
                # returned (not reduced away) so XLA cannot eliminate it
                return sum(packed_lookup(t, u, spec) for t in tbls)

            tri(tbls, u)
            t = timeit(tri, tbls, u, reps=args.reps)
            rows = tbl.shape[0]
            mb = tbl.size * tbl.dtype.itemsize / 1e6
            print(f"triplane shift={shift} {dt_:4s}: {t:8.2f} ms   "
                  f"({rows} rows x {tbl.shape[1]}, {mb:.1f} MB/plane)")


if __name__ == "__main__":
    main()
