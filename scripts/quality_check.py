"""Quality guard for the serving operating point, with TRAINED weights.

Trains the field on the synthetic talking-head oracle (on the current
platform — TPU by default) and renders held-out frames through:
  A. reference-parity path: render_rays, S=16, fp32 in-graph bake
  B. serving point:         render_rays_compact, S=16 with the two-stage
                            early-termination eval (split 8), adaptive K2
                            (the serving session's derivation), bf16
                            prebaked tables, bitmask march (dilate=1,
                            group=2), minimal outputs
  C. serving point with 2x2-block window analysis

Reports PSNR vs ground truth for each and the A->B/C deltas. History this
guard caught: the original S=8 serving point measured -16 dB on a trained
model (the learned density crust needs all 16 samples; the round-1 claim
that 8 suffice was only ever validated against hand-drawn occupancy), and
bitmask dilation=2 cost another -2.3 dB by crowding the sample budget with
dilated empty cells. Quality claims need TRAINED weights.

Usage: python scripts/quality_check.py [--steps 3000] [--res 128] [--cpu]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def psnr(a, b):
    mse = float(np.mean((np.asarray(a) - np.asarray(b)) ** 2))
    return -10.0 * np.log10(max(mse, 1e-10))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--res", type=int, default=128)
    ap.add_argument("--grid", type=int, default=64)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--k2", type=int, default=0,
                    help="window candidates; 0 (default) derives it from "
                         "occupancy + camera obliquity exactly like the "
                         "serving session does — a fixed value here once "
                         "made the guard measure a K2-truncation artifact "
                         "(-11.8 dB at grid 128) instead of the production "
                         "operating point")
    ap.add_argument("--warmup", type=int, default=1000)
    ap.add_argument("--samples", type=int, default=16,
                    help="serving-path S (parity path A stays 16)")
    ap.add_argument("--save-state", default="",
                    help="npz path: dump trained params + occupancy for "
                         "offline probes (scripts/marchdiag.py)")
    ap.add_argument("--log-every", type=int, default=500)
    ap.add_argument("--sample-frac", type=float, default=0.5,
                    help="stage-1 sample-compaction budget fraction for "
                         "variant J (0 disables J). Compaction is bit-exact "
                         "while the masked points fit the slots; J verifies "
                         "that end-to-end on the trained oracle")
    ap.add_argument("--prepass", action="store_true",
                    help="variant J additionally runs the pre-march "
                         "occupancy-true activity prepass "
                         "(Config.infer_march_prepass) — bit-exact by "
                         "construction; this guards it end-to-end on a "
                         "trained crust")
    ap.add_argument("--march-variant", default="nb5w",
                    choices=["wslice", "nb_first", "zband", "zband4",
                             "quad", "quadw", "quadwx", "nb5w", "nb5wz",
                             "nb5wz4", "nb5wp"],
                    help="block-march select variant for J (the candidate "
                         "production point; B/C keep wslice)")
    ap.add_argument("--load-state", default="",
                    help="production_state.pkl from "
                         "scripts/train_production.py: SKIP the in-script "
                         "training and guard the serving paths on the "
                         "production-trained params (EMA, like serving) + "
                         "occupancy instead — the oracle regenerates "
                         "consistent GT at --res from the state's "
                         "frames/audio meta")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/jax_cache_lzzx_tpu" if not args.cpu
                      else "/tmp/jax_cache_lzzx")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    import dataclasses

    from lzzx_nerf_tpu.data import SyntheticTalkingHead
    from lzzx_nerf_tpu.models import NeRFField
    from lzzx_nerf_tpu.ops.march import marching_dt, num_candidates
    from lzzx_nerf_tpu.ops.march2 import build_inference_tables
    from lzzx_nerf_tpu.render import (RenderSettings, init_occupancy_state,
                                      render_rays, render_rays_compact,
                                      render_rays_compact_blocks)
    from lzzx_nerf_tpu.train import TrainState, build_optimizer, make_train_step

    res = args.res
    if args.load_state:
        import pickle

        from lzzx_nerf_tpu.render.state import OccupancyState

        with open(args.load_state, "rb") as f:
            stpkl = pickle.load(f)
        meta = stpkl["meta"]
        grid = int(meta["grid"])
        dt = float(meta["dt"])
        aabb = tuple(float(x) for x in meta["aabb"])
        settings = RenderSettings(bound=1.0, cascade=1, grid_size=grid,
                                  max_steps=16, dt=dt,
                                  num_cand=num_candidates(aabb, 0.05, dt),
                                  aabb=aabb)
        occ = OccupancyState(**{k: jnp.asarray(v)
                                for k, v in stpkl["occ"].items()})
        # the oracle regenerates consistent GT at any res; same frame
        # count/audio stream as training (train_production.py)
        ds = SyntheticTalkingHead(num_frames=int(meta["frames"]),
                                  H=res, W=res, torso=True)
        field = NeRFField(audio_in_dim=ds.audio_dim,
                          ind_num=max(64, int(meta["frames"])))
        # the serving session consumes the EMA params — guard those
        params = {"params": jax.tree.map(jnp.asarray, stpkl["head_ema"])}
        print(f"loaded trained state {args.load_state} "
              f"(head_iters={meta.get('head_iters')}, "
              f"final_psnr={meta.get('final_psnr')})")
    else:
        grid = args.grid
        ds = SyntheticTalkingHead(num_frames=16, H=res, W=res)
        dt = marching_dt(1.0, grid, 16, 1)
        aabb = (-1.0, -0.5, -1.0, 1.0, 0.5, 1.0)
        settings = RenderSettings(bound=1.0, cascade=1, grid_size=grid,
                                  max_steps=16, dt=dt,
                                  num_cand=num_candidates(aabb, 0.05, dt),
                                  aabb=aabb)
        occ = init_occupancy_state(settings)
        occ = occ._replace(occ=jnp.ones_like(occ.occ))

        field = NeRFField(audio_in_dim=ds.audio_dim, ind_num=64)
        b0 = ds.frame(0)
        params = field.init(jax.random.PRNGKey(0), jnp.zeros((4, 3)),
                            jnp.ones((4, 3)) / 3 ** 0.5,
                            jnp.asarray(b0["auds"]),
                            jnp.zeros(4), jnp.asarray([0.25]),
                            method="init_all")
        tx = build_optimizer(1e-2, 1e-3, args.steps)
        state = TrainState.create(params, tx)
        # train through the production policy: full path during the grid
        # warmup, ray-compacted after (Config.train_budget_frac /
        # train_compact_warmup defaults)
        common = dict(H=res, W=res, intrinsics=ds.intrinsics, num_rays=4096,
                      iters=args.steps, ind_dim=4, ema_interval=500)
        step_full = jax.jit(make_train_step(field, settings, tx, **common))
        step_compact = jax.jit(make_train_step(field, settings, tx,
                                               train_budget=3072, **common))
        warmup = args.warmup

        from lzzx_nerf_tpu.render import make_density_grid_update

        grid_refresh = make_density_grid_update(field, settings)

        rng = jax.random.PRNGKey(0)
        t0 = time.time()
        # device-resident frames: a per-step host upload costs more than the
        # step itself on the tunneled chip
        frames_dev = [jax.device_put({k: jnp.asarray(v)
                                      for k, v in ds.frame(i).items()})
                      for i in range(ds.num_frames)]
        for it in range(args.steps):
            batch = frames_dev[it % ds.num_frames]
            if it % 16 == 0:
                occ = grid_refresh(state.params, occ, batch["auds"],
                                   batch.get("eye"), rng, state.step)
            step = step_full if it < warmup else step_compact
            state, metrics = step(state, occ, batch, rng)
            if it % args.log_every == 0:
                print(f"step {it}: loss={float(metrics['loss']):.5f} "
                      f"({it / max(time.time() - t0, 1e-9):.1f} it/s)",
                      flush=True)
        params = state.params

    # ---- render the three paths on held-out-ish frames
    from lzzx_nerf_tpu.utils import get_rays
    if args.save_state:
        import pickle

        flat, treedef = jax.tree_util.tree_flatten(params)
        with open(args.save_state, "wb") as f:
            pickle.dump({"leaves": [np.asarray(x) for x in flat],
                         "treedef": treedef,
                         "occ": np.asarray(occ.occ),
                         "density_grid": np.asarray(occ.density_grid),
                         "mean_density": float(occ.mean_density)}, f)
        print(f"state saved to {args.save_state}")
    packed16 = jax.jit(lambda p: field.apply(p, method="bake_tables",
                                             dtype=jnp.bfloat16))(params)
    tables = jax.jit(lambda o: build_inference_tables(o, settings.bound))(
        occ.occ)
    # variant J marches with --march-variant; default tables carry only
    # nb5 + quad — build the one J needs (e.g. quadw's z-word table)
    from lzzx_nerf_tpu.ops.march2 import (ensure_variant_tables,
                                          needed_variant_tables)

    tables = ensure_variant_tables(
        tables, occ.occ, needed_variant_tables(2, args.march_variant,
                                               prepass=args.prepass))
    # full budget: quality isolation (overflow is a separate, warned-about
    # failure mode); stage-2 budget at the serving fraction
    budget = res * res
    K2 = args.k2
    if not K2:
        from lzzx_nerf_tpu.ops.march2 import (measured_window_candidates,
                                              window_candidates_for_scene)
        from lzzx_nerf_tpu.utils.rays import min_corner_dz

        poses = np.stack([ds.pose(i) for i in range(ds.num_frames)])
        K2_geo = window_candidates_for_scene(
            np.asarray(tables.z_lo), np.asarray(tables.z_hi), dt,
            min_dz=min_corner_dz(poses, ds.intrinsics, res, res))
        # the guard runs BOTH the block and per-ray serving paths at one
        # K2 — take the larger of the two trajectory measurements (serving
        # itself uses its path's own measurement, session.py)
        isettings_k = dataclasses.replace(settings, max_steps=args.samples)
        K2 = min(K2_geo, max(
            measured_window_candidates(
                isettings_k, tables.z_lo, tables.z_hi, poses,
                ds.intrinsics, res, res, block=True),
            measured_window_candidates(
                isettings_k, tables.z_lo, tables.z_hi, poses,
                ds.intrinsics, res, res, block=False)))
        print(f"adaptive K2={K2} (grid {grid}, dt {dt:.4f}, "
              f"geometric bound {K2_geo})")
    staged = dict(stage_split=8,
                  stage2_budget=max(1024, int(budget * 0.375) // 1024 * 1024))

    # the serving paths use the production apply: the folded-weight
    # decomposition (Config.fused_field default; models/nerf.py) and may
    # run a reduced sample count (--samples); parity path A stays S=16
    isettings = dataclasses.replace(settings, max_steps=args.samples)
    from lzzx_nerf_tpu.models.nerf import make_fused_apply

    ap16 = make_fused_apply(field, packed16)
    # D isolates the table dtype: same serving path with fp32 tables (the
    # bf16 default was motivated by a VMEM-residency model the honest
    # gather timing debunked — if D ≈ A-delta-free and bench speed holds,
    # bf16 tables are pure quality loss)
    packed32 = jax.jit(lambda p: field.apply(p, method="bake_tables"))(
        params)
    ap32 = make_fused_apply(field, packed32)

    @jax.jit
    def render_A(params, occ, pose, enc_a, eye, bg):
        rays = get_rays(pose[None], ds.intrinsics, res, res, N=-1)
        c = params["params"]["individual_codes"][0]
        return render_rays(field.apply, params, settings, occ,
                           rays["rays_o"][0], rays["rays_d"][0], enc_a, c,
                           eye, bg)["image"]

    @jax.jit
    def render_B(params, occ, tables, pose, enc_a, eye, bg):
        rays = get_rays(pose[None], ds.intrinsics, res, res, N=-1)
        c = params["params"]["individual_codes"][0]
        return render_rays_compact(
            ap16, params, isettings, occ, rays["rays_o"][0],
            rays["rays_d"][0], enc_a, c, eye, bg, budget=budget,
            window_candidates=K2, tables=tables, minimal=True,
            **staged)["image"]

    @jax.jit
    def render_D(params, occ, tables, pose, enc_a, eye, bg):
        rays = get_rays(pose[None], ds.intrinsics, res, res, N=-1)
        c = params["params"]["individual_codes"][0]
        return render_rays_compact_blocks(
            ap32, params, isettings, occ, rays["rays_o"][0][0],
            rays["rays_d"][0], res, res, enc_a, c, eye, bg, budget=budget,
            window_candidates=K2, tables=tables, **staged)["image"]

    @jax.jit
    def render_E(params, occ, tables, pose, enc_a, eye, bg):
        # C without the two-stage early termination: isolates stage-2
        # truncation (single-pass full-S eval)
        rays = get_rays(pose[None], ds.intrinsics, res, res, N=-1)
        c = params["params"]["individual_codes"][0]
        return render_rays_compact_blocks(
            ap16, params, isettings, occ, rays["rays_o"][0][0],
            rays["rays_d"][0], res, res, enc_a, c, eye, bg, budget=budget,
            window_candidates=K2, tables=tables)["image"]

    @jax.jit
    def render_F(params, occ, tables, pose, enc_a, eye, bg):
        # B with the EXACT per-candidate march (no bitmask dilation):
        # isolates dilated-cell crowding of the S budget
        rays = get_rays(pose[None], ds.intrinsics, res, res, N=-1)
        c = params["params"]["individual_codes"][0]
        return render_rays_compact(
            ap16, params, isettings, occ, rays["rays_o"][0],
            rays["rays_d"][0], enc_a, c, eye, bg, budget=budget,
            window_candidates=K2, tables=tables, minimal=True,
            use_bitmask=False, **staged)["image"]

    @jax.jit
    def render_G(params, occ, tables, pose, enc_a, eye, bg):
        # A's exhaustive march but with the SERVING apply (folded weights +
        # bf16 packed tables): isolates the apply/table math from the
        # window/compaction machinery
        rays = get_rays(pose[None], ds.intrinsics, res, res, N=-1)
        c = params["params"]["individual_codes"][0]
        return render_rays(ap16, params, settings, occ,
                           rays["rays_o"][0], rays["rays_d"][0], enc_a, c,
                           eye, bg, compute_uncertainty=False)["image"]

    @jax.jit
    def render_H(params, occ, tables, pose, enc_a, eye, bg):
        # B with a much larger window budget: isolates residual window
        # truncation/coverage from everything else
        rays = get_rays(pose[None], ds.intrinsics, res, res, N=-1)
        c = params["params"]["individual_codes"][0]
        return render_rays_compact(
            ap16, params, isettings, occ, rays["rays_o"][0],
            rays["rays_d"][0], enc_a, c, eye, bg, budget=budget,
            window_candidates=K2 + 32, tables=tables, minimal=True,
            **staged)["image"]

    @jax.jit
    def render_C(params, occ, tables, pose, enc_a, eye, bg):
        rays = get_rays(pose[None], ds.intrinsics, res, res, N=-1)
        c = params["params"]["individual_codes"][0]
        return render_rays_compact_blocks(
            ap16, params, isettings, occ, rays["rays_o"][0][0],
            rays["rays_d"][0], res, res, enc_a, c, eye, bg, budget=budget,
            window_candidates=K2, tables=tables, **staged)["image"]

    @jax.jit
    def render_I(params, occ, tables, pose, enc_a, eye, bg):
        # C with the block-LATTICE 3x3 march (march_group=3): isolates the
        # dt-bounded lattice-phase shift the shared block lattice
        # introduces (the occupancy test itself is exact — the only
        # quality degree of freedom vs C is sample placement)
        rays = get_rays(pose[None], ds.intrinsics, res, res, N=-1)
        c = params["params"]["individual_codes"][0]
        return render_rays_compact_blocks(
            ap16, params, isettings, occ, rays["rays_o"][0][0],
            rays["rays_d"][0], res, res, enc_a, c, eye, bg, budget=budget,
            window_candidates=K2, tables=tables, march_group=3,
            **staged)["image"]

    sample_budget = (max(1024, int(budget * 8 * args.sample_frac)
                         // 1024 * 1024) if args.sample_frac > 0 else 0)

    @jax.jit
    def render_J(params, occ, tables, pose, enc_a, eye, bg):
        # C at the CANDIDATE PRODUCTION POINT: stage-1 sample compaction
        # (--sample-frac slots; bit-exact while the masked points fit) and
        # the --march-variant select (sample-exact by construction,
        # tests/test_march2.py) — the end-to-end check that both hold on a
        # trained density crust
        rays = get_rays(pose[None], ds.intrinsics, res, res, N=-1)
        c = params["params"]["individual_codes"][0]
        return render_rays_compact_blocks(
            ap16, params, isettings, occ, rays["rays_o"][0][0],
            rays["rays_d"][0], res, res, enc_a, c, eye, bg, budget=budget,
            window_candidates=K2, tables=tables,
            sample_budget=sample_budget,
            march_variant=args.march_variant,
            march_prepass=args.prepass, **staged)["image"]

    scores = {"A_parity_S16": [], "B_serving_S8": [], "C_serving_block": [],
              "D_block_f32tab": [], "E_no_staging": [], "F_exact_march": [],
              "G_folded_apply": [], "H_wide_window": [], "I_block_lattice": [],
              "J_sample_compact": []}
    for fi in range(0, ds.num_frames, 3):
        b = ds.frame(fi)
        pose = jnp.asarray(b["pose"])
        enc_a = field.apply(params, jnp.asarray(b["auds"]),
                            method="encode_audio")
        eye = jnp.asarray(b["eye"])
        bg = jnp.asarray(b["bg_color"]).reshape(-1, 3)
        gt = np.asarray(b["image"]).reshape(-1, 3)
        scores["A_parity_S16"].append(
            psnr(render_A(params, occ, pose, enc_a, eye, bg), gt))
        scores["B_serving_S8"].append(
            psnr(render_B(params, occ, tables, pose, enc_a, eye, bg), gt))
        scores["C_serving_block"].append(
            psnr(render_C(params, occ, tables, pose, enc_a, eye, bg), gt))
        scores["D_block_f32tab"].append(
            psnr(render_D(params, occ, tables, pose, enc_a, eye, bg), gt))
        scores["E_no_staging"].append(
            psnr(render_E(params, occ, tables, pose, enc_a, eye, bg), gt))
        scores["G_folded_apply"].append(
            psnr(render_G(params, occ, tables, pose, enc_a, eye, bg), gt))
        scores["H_wide_window"].append(
            psnr(render_H(params, occ, tables, pose, enc_a, eye, bg), gt))
        scores["F_exact_march"].append(
            psnr(render_F(params, occ, tables, pose, enc_a, eye, bg), gt))
        scores["I_block_lattice"].append(
            psnr(render_I(params, occ, tables, pose, enc_a, eye, bg), gt))
        # J runs when it differs from C: sample compaction on, or a
        # non-default march variant (e.g. --sample-frac 0 --march-variant
        # quad guards the quad march alone at the production point)
        if sample_budget or args.march_variant != "wslice" or args.prepass:
            scores["J_sample_compact"].append(
                psnr(render_J(params, occ, tables, pose, enc_a, eye, bg), gt))

    a = float(np.mean(scores["A_parity_S16"]))
    bsepts = float(np.mean(scores["B_serving_S8"]))
    cpts = float(np.mean(scores["C_serving_block"]))
    dpts = float(np.mean(scores["D_block_f32tab"]))
    provenance = (f"trained state {args.load_state}" if args.load_state
                  else f"after {args.steps} steps")
    print(f"\nPSNR vs GT {provenance} @{res}²:")
    print(f"  A parity  (S=16, fp32, exhaustive)          : {a:6.2f} dB")
    print(f"  B serving (S=16 staged, bf16, bitmask)      : {bsepts:6.2f} dB "
          f"(delta {bsepts - a:+.2f})")
    print(f"  C serving (2x2-block windows, staged)       : {cpts:6.2f} dB "
          f"(delta {cpts - a:+.2f})")
    print(f"  D = C with fp32 tables (dtype isolation)    : {dpts:6.2f} dB "
          f"(delta {dpts - a:+.2f})")
    epts = float(np.mean(scores["E_no_staging"]))
    fpts = float(np.mean(scores["F_exact_march"]))
    print(f"  E = C without staged eval (single pass)     : {epts:6.2f} dB "
          f"(delta {epts - a:+.2f})")
    print(f"  F = B with exact march (no bitmask dilation): {fpts:6.2f} dB "
          f"(delta {fpts - a:+.2f})")
    gpts = float(np.mean(scores["G_folded_apply"]))
    hpts = float(np.mean(scores["H_wide_window"]))
    print(f"  G = A with the serving apply (folded, bf16) : {gpts:6.2f} dB "
          f"(delta {gpts - a:+.2f})")
    print(f"  H = B with K2+32 window candidates          : {hpts:6.2f} dB "
          f"(delta {hpts - a:+.2f})")
    ipts = float(np.mean(scores["I_block_lattice"]))
    print(f"  I = C with the block-lattice 3x3 march      : {ipts:6.2f} dB "
          f"(delta {ipts - a:+.2f})")
    if scores["J_sample_compact"]:
        jpts = float(np.mean(scores["J_sample_compact"]))
        print(f"  J = C + sample compaction ({args.march_variant:>7s} march)"
              f" : {jpts:6.2f} dB (delta {jpts - a:+.2f})")


if __name__ == "__main__":
    main()
