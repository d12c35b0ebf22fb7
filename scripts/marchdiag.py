"""Diagnose window-path quality deltas on a quality_check --save-state dump.

Renders one frame through the exhaustive path (A) and the windowed compact
path (B) with identical apply/tables, maps WHERE they diverge, then
compares the march sample sets for the worst rays — separating
active-bit false negatives, window-range truncation, and budget effects.

Usage: python scripts/marchdiag.py --state /tmp/qc_state.pkl --res 256 \
           [--grid 128] [--frame 3] [--k2 48]
"""

from __future__ import annotations

import argparse
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--state", required=True)
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--grid", type=int, default=128)
    ap.add_argument("--frame", type=int, default=3)
    ap.add_argument("--k2", type=int, default=48)
    ap.add_argument("--samples", type=int, default=16)
    ap.add_argument("--worst", type=int, default=12)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_lzzx_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    from lzzx_nerf_tpu.data import SyntheticTalkingHead
    from lzzx_nerf_tpu.models import NeRFField
    from lzzx_nerf_tpu.models.nerf import make_fused_apply
    from lzzx_nerf_tpu.ops.march import (march_rays_uniform, marching_dt,
                                         num_candidates)
    from lzzx_nerf_tpu.ops.march2 import (build_inference_tables,
                                          column_intervals, compact_rays,
                                          march_rays_window, ray_windows)
    from lzzx_nerf_tpu.ops.ray import near_far_from_aabb
    from lzzx_nerf_tpu.render import (RenderSettings, init_occupancy_state,
                                      render_rays, render_rays_compact)
    from lzzx_nerf_tpu.utils import get_rays

    res, grid = args.res, args.grid
    ds = SyntheticTalkingHead(num_frames=16, H=res, W=res)
    dt = marching_dt(1.0, grid, 16, 1)
    aabb = (-1.0, -0.5, -1.0, 1.0, 0.5, 1.0)
    settings = RenderSettings(bound=1.0, cascade=1, grid_size=grid,
                              max_steps=args.samples, dt=dt,
                              num_cand=num_candidates(aabb, 0.05, dt),
                              aabb=aabb)
    with open(args.state, "rb") as f:
        st = pickle.load(f)
    params = jax.tree_util.tree_unflatten(
        st["treedef"], [jnp.asarray(x) for x in st["leaves"]])
    occ = init_occupancy_state(settings)._replace(
        occ=jnp.asarray(st["occ"]),
        density_grid=jnp.asarray(st["density_grid"]),
        mean_density=jnp.asarray(st["mean_density"], jnp.float32))

    field = NeRFField(audio_in_dim=ds.audio_dim, ind_num=64)
    packed = jax.jit(lambda p: field.apply(p, method="bake_tables",
                                           dtype=jnp.bfloat16))(params)
    tables = jax.jit(
        lambda o: build_inference_tables(o, settings.bound))(occ.occ)
    ap16 = make_fused_apply(field, packed)

    b = ds.frame(args.frame)
    pose = jnp.asarray(b["pose"])
    enc_a = field.apply(params, jnp.asarray(b["auds"]),
                        method="encode_audio")
    eye = jnp.asarray(b["eye"])
    bg = jnp.asarray(b["bg_color"]).reshape(-1, 3)
    rays = get_rays(pose[None], ds.intrinsics, res, res, N=-1)
    ro_full, rd_full = rays["rays_o"][0], rays["rays_d"][0]
    c = params["params"]["individual_codes"][0]

    imgA = np.asarray(jax.jit(lambda: render_rays(
        ap16, params, settings, occ, ro_full, rd_full, enc_a, c, eye, bg,
        compute_uncertainty=False)["image"])())
    outB = jax.jit(lambda: render_rays_compact(
        ap16, params, settings, occ, ro_full, rd_full, enc_a, c, eye, bg,
        budget=res * res, window_candidates=args.k2, tables=tables,
        minimal=True, stage_split=8,
        stage2_budget=max(1024, int(res * res * 0.375) // 1024 * 1024)))()
    imgB = np.asarray(outB["image"])

    err = np.abs(imgA - imgB).max(-1)
    print(f"frame {args.frame}: n_active={int(outB['n_active'])} "
          f"/ {res * res}")
    print(f"pixels with |diff| > 0.02: {(err > 0.02).sum()} "
          f"({(err > 0.02).mean() * 100:.2f}%), > 0.1: {(err > 0.1).sum()}")
    psnr = -10 * np.log10(max(np.mean((imgA - imgB) ** 2), 1e-10))
    print(f"B vs A PSNR: {psnr:.2f} dB")

    # where: distance of divergent pixels from the analytic silhouette
    mask = np.asarray(b["face_mask"]).reshape(res, res)
    from scipy.ndimage import binary_dilation, binary_erosion

    edge = binary_dilation(mask, iterations=3) & ~binary_erosion(
        mask, iterations=3)
    div = err.reshape(res, res) > 0.02
    print(f"divergent pixels: {div.sum()} total — "
          f"{(div & edge).sum()} on the ±3px silhouette band, "
          f"{(div & mask & ~edge).sum()} interior, "
          f"{(div & ~mask & ~edge).sum()} background")

    # march-level compare on the worst rays
    worst = np.argsort(err.reshape(-1))[::-1][:args.worst]
    ro = jnp.take(ro_full, jnp.asarray(worst), axis=0)
    rd = jnp.take(rd_full, jnp.asarray(worst), axis=0)
    nears, fars = near_far_from_aabb(ro, rd, jnp.asarray(settings.aabb),
                                     settings.min_near)
    vA = march_rays_uniform(ro, rd, nears, fars, occ.occ, settings.bound,
                            dt, settings.num_cand, args.samples)
    z_lo, z_hi = tables.z_lo, tables.z_hi
    win = ray_windows(ro, rd, nears, fars, z_lo, z_hi, settings.bound, dt)
    cs = compact_rays(win.active, args.worst)
    roc = jnp.take(ro, cs.ray_idx, axis=0)
    rdc = jnp.take(rd, cs.ray_idx, axis=0)
    t0 = jnp.take(win.t_start, cs.ray_idx)
    t1 = jnp.take(win.t_end, cs.ray_idx)
    vB = march_rays_window(roc, rdc, t0, t1, cs.slot_valid, occ.occ,
                           settings.bound, dt, args.k2, args.samples)
    slot_of = {int(r): s for s, r in enumerate(np.asarray(cs.ray_idx))
               if np.asarray(cs.slot_valid)[s]}
    for k, ray in enumerate(worst):
        nA = int(np.asarray(vA.mask)[k].sum())
        act = bool(np.asarray(win.active)[k])
        ts_A = np.asarray(vA.ts)[k][np.asarray(vA.mask)[k]]
        line = (f"ray {int(ray)} err={err.reshape(-1)[ray]:.3f} "
                f"A:{nA} samples"
                f" [{ts_A.min():.3f},{ts_A.max():.3f}]" if nA else
                f"ray {int(ray)} err={err.reshape(-1)[ray]:.3f} A:0 samples")
        if not act:
            print(line + "  B:INACTIVE (window false negative)"
                  + f"  near={float(nears[k]):.3f}")
            continue
        s = slot_of.get(k)
        if s is None:
            print(line + "  B:no slot")
            continue
        mB = np.asarray(vB.mask)[s]
        nB = int(mB.sum())
        ts_B = np.asarray(vB.ts)[s][mB]
        extra = f" win=[{float(t0[s]):.3f},{float(t1[s]):.3f}]"
        if nB:
            extra += f" B:[{ts_B.min():.3f},{ts_B.max():.3f}]"
        print(line + f"  B:{nB} samples{extra}")


if __name__ == "__main__":
    main()
