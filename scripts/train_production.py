"""Production-recipe training run on the synthetic oracle, at full scale.

Runs the reference's three-stage recipe (test.ipynb §4 / train.py:28-44 —
head, then lips finetune, then torso) at the PRODUCTION operating point
(512², grid 128, num_rays 65536/step, ray-compacted step after the grid
warmup) on the real chip, to completion, with an eval-epoch metric trend —
the round-4 evidence item: every prior FPS/quality number derived from a
hand-built ellipsoid occupancy or a 3k-step res-128 toy train.

Outputs (under --workspace, default /root/repo/trained):
  metrics.jsonl         one line per log/eval event (loss + PSNR trend)
  production_state.pkl  head params (+EMA) + occupancy grids + torso params
                        + torso grid + dataset meta — consumed by
                        `bench.py --state` and `quality_check --load-state`
  ckpt_head.pkl / ckpt_torso.pkl   periodic crash-resume checkpoints

The lips stage runs the REAL LPIPS criterion (train/lpips.py) with whatever
weights get_params resolves ($LZZX_LPIPS_NPZ / ~/.cache/lzzx/lpips_alex.npz,
e.g. the checksummed test fixture); absent any npz it uses the documented
fixed-seed random backbone, loudly labeled — this zero-egress image cannot
produce official LPIPS-alex weights (VERDICT r3 items 2 and 5).

Usage: python scripts/train_production.py [--head-iters 30000]
       [--torso-iters 100000] [--lips-iters 2000] [--res 512] [--grid 128]
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def psnr(a, b):
    mse = float(np.mean((np.asarray(a, np.float32)
                         - np.asarray(b, np.float32)) ** 2))
    return -10.0 * np.log10(max(mse, 1e-10))


def save_pickle(path, obj):
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(obj, f)
    os.replace(tmp, path)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workspace", default="/root/repo/trained")
    ap.add_argument("--res", type=int, default=512)
    ap.add_argument("--grid", type=int, default=128)
    ap.add_argument("--frames", type=int, default=32)
    ap.add_argument("--num-rays", type=int, default=65536)
    ap.add_argument("--head-iters", type=int, default=30000)
    ap.add_argument("--torso-iters", type=int, default=100000)
    ap.add_argument("--lips-iters", type=int, default=2000)
    ap.add_argument("--warmup", type=int, default=1000,
                    help="full-path steps before the compacted step takes "
                         "over (Config.train_compact_warmup)")
    ap.add_argument("--budget-frac", type=float, default=0.75)
    ap.add_argument("--eval-every", type=int, default=2500)
    ap.add_argument("--eval-res", type=int, default=256,
                    help="PSNR-trend eval resolution (one smaller compile; "
                         "the oracle is analytic so GT at any res is "
                         "consistent). Final eval runs at --res.")
    ap.add_argument("--ckpt-every", type=int, default=5000)
    ap.add_argument("--log-every", type=int, default=100)
    ap.add_argument("--lips-pad", type=int, default=64)
    ap.add_argument("--cpu", action="store_true",
                    help="tiny smoke run on CPU")
    ap.add_argument("--resume", action="store_true",
                    help="resume head stage from ckpt_head.pkl if present")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/jax_cache_lzzx" if args.cpu
                      else "/tmp/jax_cache_lzzx_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    from lzzx_nerf_tpu.data import SyntheticTalkingHead
    from lzzx_nerf_tpu.models import NeRFField, TorsoField
    from lzzx_nerf_tpu.ops.march import marching_dt, num_candidates
    from lzzx_nerf_tpu.render import (RenderSettings, init_occupancy_state,
                                      make_density_grid_update,
                                      make_torso_grid_update,
                                      mark_untrained_grid, render_rays,
                                      run_torso)
    from lzzx_nerf_tpu.train import TrainState, build_optimizer, make_train_step
    from lzzx_nerf_tpu.train import lpips as lpips_mod
    from lzzx_nerf_tpu.train.trainer import make_torso_train_step
    from lzzx_nerf_tpu.utils import get_rays

    os.makedirs(args.workspace, exist_ok=True)
    metrics_path = os.path.join(args.workspace, "metrics.jsonl")
    mlog = open(metrics_path, "a", buffering=1)

    def emit(**kw):
        kw["t"] = round(time.time() - T0, 1)
        mlog.write(json.dumps(kw) + "\n")
        print(json.dumps(kw), flush=True)

    T0 = time.time()
    res, grid = args.res, args.grid
    ds = SyntheticTalkingHead(num_frames=args.frames, H=res, W=res,
                              torso=True)
    dt = marching_dt(1.0, grid, 16, 1)
    aabb = (-1.0, -0.5, -1.0, 1.0, 0.5, 1.0)
    settings = RenderSettings(bound=1.0, cascade=1, grid_size=grid,
                              max_steps=16, dt=dt,
                              num_cand=num_candidates(aabb, 0.05, dt),
                              aabb=aabb)
    occ = init_occupancy_state(settings)
    poses = np.stack([ds.pose(i) for i in range(ds.num_frames)])
    occ = mark_untrained_grid(settings, occ, jnp.asarray(poses),
                              ds.intrinsics)

    field = NeRFField(audio_in_dim=ds.audio_dim, ind_num=max(64, args.frames))
    b0 = ds.frame(0)
    params = field.init(jax.random.PRNGKey(0), jnp.zeros((4, 3)),
                        jnp.ones((4, 3)) / 3 ** 0.5, jnp.asarray(b0["auds"]),
                        jnp.zeros(4), jnp.asarray([0.25]), method="init_all")
    n_params = sum(int(np.prod(x.shape))
                   for x in jax.tree_util.tree_leaves(params))
    emit(event="start", stage="head", res=res, grid=grid,
         frames=args.frames, num_rays=args.num_rays,
         head_iters=args.head_iters, n_params=n_params,
         platform=jax.devices()[0].platform)

    tx = build_optimizer(1e-2, 1e-3, args.head_iters)
    state = TrainState.create(params, tx)

    train_budget = int(args.num_rays * args.budget_frac) // 1024 * 1024
    common = dict(H=res, W=res, intrinsics=ds.intrinsics,
                  num_rays=args.num_rays, iters=args.head_iters, ind_dim=4)
    step_full = jax.jit(make_train_step(field, settings, tx, **common))
    step_compact = jax.jit(make_train_step(field, settings, tx,
                                           train_budget=train_budget,
                                           **common))
    grid_refresh = make_density_grid_update(field, settings)

    # device-resident frames (per-step host uploads cost more than the step)
    frames_dev = [jax.device_put({k: jnp.asarray(v)
                                  for k, v in ds.frame(i).items()})
                  for i in range(ds.num_frames)]

    # ---- eval: exhaustive parity render (S=16, fp32) at eval-res ----
    eres = args.eval_res
    ds_eval = SyntheticTalkingHead(num_frames=args.frames, H=eres, W=eres,
                                   torso=True)
    eval_frames = list(range(1, args.frames, max(1, args.frames // 4)))[:4]

    @jax.jit
    def eval_render(params, occ, pose, auds, eye, bg):
        rays = get_rays(pose[None], ds_eval.intrinsics, eres, eres, N=-1)
        enc_a = field.apply(params, auds, method="encode_audio")
        c = params["params"]["individual_codes"][0]
        return render_rays(field.apply, params, settings, occ,
                           rays["rays_o"][0], rays["rays_d"][0], enc_a, c,
                           eye, bg)["image"]

    def eval_psnr(params, occ, at_res_ds=None, render=None):
        d = at_res_ds or ds_eval
        r = render or eval_render
        vals = []
        for fi in eval_frames:
            b = d.frame(fi)
            img = r(params, occ, jnp.asarray(b["pose"]),
                    jnp.asarray(b["auds"]), jnp.asarray(b["eye"]),
                    jnp.asarray(b["bg_color"]).reshape(-1, 3))
            vals.append(psnr(img, b["image"].reshape(-1, 3)))
        return float(np.mean(vals)), [round(v, 2) for v in vals]

    # ---- head stage ----
    ckpt_head = os.path.join(args.workspace, "ckpt_head.pkl")
    start_it = 0
    if args.resume and os.path.exists(ckpt_head):
        with open(ckpt_head, "rb") as f:
            ck = pickle.load(f)
        state = jax.tree.map(jnp.asarray, ck["state"],
                             is_leaf=lambda x: isinstance(x, np.ndarray))
        occ = jax.tree.map(jnp.asarray, ck["occ"])
        start_it = ck["it"]
        if not hasattr(state.opt_state, "notfinite_count"):
            # checkpoint from before the non-finite-skip wrapper
            # (optim.build_optimizer apply_if_finite): wrap the restored
            # inner state so --resume keeps working across the change
            import optax

            state = state.replace(opt_state=optax.ApplyIfFiniteState(
                notfinite_count=jnp.zeros([], jnp.int32),
                last_finite=jnp.asarray(True),
                total_notfinite=jnp.zeros([], jnp.int32),
                inner_state=state.opt_state))
            emit(event="resume_migrate",
                 note="wrapped pre-skip opt_state in ApplyIfFiniteState")
        emit(event="resume", stage="head", it=start_it)

    rng = jax.random.PRNGKey(0)
    t_stage = time.time()
    last_t, last_it = t_stage, start_it
    for it in range(start_it, args.head_iters):
        batch = frames_dev[it % ds.num_frames]
        if it % 16 == 0:
            occ = grid_refresh(state.params, occ, batch["auds"],
                               batch.get("eye"), rng, state.step)
        step = step_full if it < args.warmup else step_compact
        state, m = step(state, occ, batch, rng)
        if (it + 1) % args.log_every == 0:
            now = time.time()
            its = (it + 1 - last_it) / max(now - last_t, 1e-9)
            last_t, last_it = now, it + 1
            emit(event="log", stage="head", it=it + 1,
                 loss=round(float(m["loss"]), 6),
                 mse=round(float(m["mse"]), 6),
                 n_active=int(m.get("n_active", 0)),
                 n_active_over=int(m.get("n_active_over", 0)),
                 grad_notfinite=int(m.get("grad_notfinite", 0)),
                 it_s=round(its, 2))
        if (it + 1) % args.eval_every == 0 or it + 1 == args.head_iters:
            mean_db, per = eval_psnr(state.params, occ)
            emit(event="eval", stage="head", it=it + 1,
                 psnr=round(mean_db, 2), per_frame=per, res=eres)
        if (it + 1) % args.ckpt_every == 0:
            save_pickle(ckpt_head, {
                "state": jax.tree.map(np.asarray, state),
                "occ": jax.tree.map(np.asarray, occ), "it": it + 1})
    emit(event="stage_done", stage="head",
         minutes=round((time.time() - t_stage) / 60, 1))

    # ---- lips finetune stage (reference test.ipynb §4: --finetune_lips,
    # +25k iters on the lips rect with the LPIPS criterion) ----
    lips_state = None
    if args.lips_iters > 0:
        lp_path = lpips_mod.default_weights_path()
        if lp_path:
            lpips_params = lpips_mod.load_weights(lp_path)
            prov = f"npz:{lp_path}"
        else:
            lpips_params = lpips_mod.random_params()
            prov = "rand-feat (fixed seed; no pretrained npz in this image)"
        emit(event="start", stage="lips", iters=args.lips_iters,
             lpips=prov, lips_pad=args.lips_pad)
        tx_l = build_optimizer(1e-2, 1e-3, args.lips_iters,
                               finetune_lips=True)
        lips_state = TrainState.create(state.params, tx_l)
        lips_state = lips_state.replace(ema_params=state.ema_params)
        step_lips = jax.jit(make_train_step(
            field, settings, tx_l, finetune_lips=True,
            lips_pad=args.lips_pad, lpips_params=lpips_params, **common))
        # oracle "lips": the lower-center of the projected head sphere
        fx = ds.intrinsics[0]
        t_stage = time.time()
        lips_dev = []
        for i in range(ds.num_frames):
            r_pix = fx * ds.radius(i) / ds.cam_dist
            oy = int(min(res - args.lips_pad,
                         res / 2 + 0.25 * r_pix))
            ox = int(res / 2 - args.lips_pad / 2)
            b = dict(frames_dev[i])
            b["rect_origin"] = jnp.asarray([oy, ox], jnp.int32)
            lips_dev.append(b)
        for it in range(args.lips_iters):
            lips_state, m = step_lips(lips_state, occ,
                                      lips_dev[it % ds.num_frames], rng)
            if (it + 1) % args.log_every == 0:
                emit(event="log", stage="lips", it=it + 1,
                     loss=round(float(m["loss"]), 6),
                     mse=round(float(m["mse"]), 6))
        mean_db, per = eval_psnr(lips_state.params, occ)
        emit(event="eval", stage="lips", it=args.lips_iters,
             psnr=round(mean_db, 2), per_frame=per, res=eres)
        emit(event="stage_done", stage="lips",
             minutes=round((time.time() - t_stage) / 60, 1))
        state = state.replace(params=lips_state.params,
                              ema_params=lips_state.ema_params)

    # ---- torso stage (head frozen; reference train.py torso run) ----
    torso = TorsoField(ind_dim_torso=8, ind_num=max(64, args.frames))
    tparams = torso.init(jax.random.PRNGKey(1), jnp.zeros((4, 2)),
                         jnp.eye(4), jnp.zeros(8))
    tx_t = build_optimizer(1e-2, 1e-3, args.torso_iters)
    tstate = TrainState.create(tparams, tx_t)
    tstep = jax.jit(make_torso_train_step(
        torso, settings, tx_t, H=res, W=res, num_rays=args.num_rays,
        ind_dim_torso=8))
    trefresh = make_torso_grid_update(torso, settings, 8)

    # torso-stage batch layout: plain background + composite target
    # (provider.py:339-345)
    ones_bg = jnp.ones((res, res, 3), jnp.float32)
    torso_dev = [dict(frames_dev[i], bg_color=ones_bg)
                 for i in range(ds.num_frames)]
    emit(event="start", stage="torso", iters=args.torso_iters)

    from lzzx_nerf_tpu.utils.rays import get_bg_coords
    bg_coords_e = get_bg_coords(eres, eres)[0]

    @jax.jit
    def eval_torso(tparams, occ, pose, index, bg):
        c = tparams["params"]["individual_codes_torso"][index]
        out = run_torso(torso.apply, tparams, settings, occ,
                        bg_coords_e, pose, c, bg)
        return out["bg_color"]

    ckpt_torso = os.path.join(args.workspace, "ckpt_torso.pkl")
    t_stage = time.time()
    last_t, last_it = t_stage, 0
    # best-eval torso selection (VERDICT r4 item 5): the round-4 run's
    # torso eval trend DECLINED past 30k (27.13 @30k -> 24.95 @50k) and
    # the shipped state used the worst endpoint. The reference keeps a
    # "best" checkpoint for exactly this (TrainerUtil.py:1262-1279); ship
    # the best eval's params + the torso grid they were evaluated with.
    best_torso = None   # (psnr, it, params, grid, mean_density)
    for it in range(args.torso_iters):
        batch = torso_dev[it % ds.num_frames]
        if it % 16 == 0:
            occ = trefresh(tstate.params, occ, batch["pose"], rng,
                           tstate.step)
        tstate, m = tstep(tstate, occ, batch, rng)
        if (it + 1) % (args.log_every * 10) == 0:
            now = time.time()
            its = (it + 1 - last_it) / max(now - last_t, 1e-9)
            last_t, last_it = now, it + 1
            emit(event="log", stage="torso", it=it + 1,
                 loss=round(float(m["loss"]), 6), it_s=round(its, 2))
        if (it + 1) % (args.eval_every * 4) == 0 or it + 1 == args.torso_iters:
            vals = []
            for fi in eval_frames:
                b = ds_eval.frame(fi)
                img = eval_torso(tstate.params, occ, jnp.asarray(b["pose"]),
                                 jnp.int32(fi),
                                 jnp.ones((eres * eres, 3)))
                vals.append(psnr(img, b["bg_torso_color"].reshape(-1, 3)))
            mdb = float(np.mean(vals))
            emit(event="eval", stage="torso", it=it + 1,
                 psnr=round(mdb, 2),
                 per_frame=[round(v, 2) for v in vals], res=eres)
            if best_torso is None or mdb > best_torso[0]:
                best_torso = (mdb, it + 1,
                              jax.tree.map(np.asarray, tstate.params),
                              np.asarray(occ.density_grid_torso),
                              np.asarray(occ.mean_density_torso))
        if (it + 1) % (args.ckpt_every * 4) == 0:
            save_pickle(ckpt_torso, {
                "state": jax.tree.map(np.asarray, tstate),
                "occ": jax.tree.map(np.asarray, occ), "it": it + 1})
    emit(event="stage_done", stage="torso",
         minutes=round((time.time() - t_stage) / 60, 1))
    tparams_ship = tstate.params
    if best_torso is not None:
        mdb, bit, bp, bgrid, bmean = best_torso
        emit(event="best_torso", it=bit, psnr=round(mdb, 2))
        tparams_ship = jax.tree.map(jnp.asarray, bp)
        occ = occ._replace(density_grid_torso=jnp.asarray(bgrid),
                           mean_density_torso=jnp.asarray(bmean))

    # ---- final full-res eval (one compile at --res) ----
    @jax.jit
    def eval_render_full(params, occ, pose, auds, eye, bg):
        rays = get_rays(pose[None], ds.intrinsics, res, res, N=-1)
        enc_a = field.apply(params, auds, method="encode_audio")
        c = params["params"]["individual_codes"][0]
        return render_rays(field.apply, params, settings, occ,
                           rays["rays_o"][0], rays["rays_d"][0], enc_a, c,
                           eye, bg)["image"]

    # final PSNR + LPIPS from ONE render pass per eval frame (VERDICT r4
    # item 8); LPIPS weights carry the same provenance as the lips stage
    # (fixture npz or the loudly-labeled fixed-seed backbone)
    lp_path2 = lpips_mod.default_weights_path()
    lp2 = (lpips_mod.load_weights(lp_path2) if lp_path2
           else lpips_mod.random_params())
    lpips_fn = jax.jit(lambda a, b: lpips_mod.lpips(lp2, a, b))
    pvals, lvals = [], []
    for fi in eval_frames:
        b = ds.frame(fi)
        img = eval_render_full(state.params, occ, jnp.asarray(b["pose"]),
                               jnp.asarray(b["auds"]),
                               jnp.asarray(b["eye"]),
                               jnp.asarray(b["bg_color"]).reshape(-1, 3))
        pvals.append(psnr(img, b["image"].reshape(-1, 3)))
        lvals.append(float(jnp.mean(lpips_fn(
            jnp.asarray(img).reshape(1, res, res, 3) * 2.0 - 1.0,
            jnp.asarray(b["image"]).reshape(1, res, res, 3) * 2.0 - 1.0))))
    mean_db = float(np.mean(pvals))
    emit(event="eval_final", stage="head", psnr=round(mean_db, 2),
         per_frame=[round(v, 2) for v in pvals], res=res,
         lpips=round(float(np.mean(lvals)), 4),
         lpips_weights=("npz" if lp_path2 else "rand-feat"))

    # ---- persist the production state ----
    out = os.path.join(args.workspace, "production_state.pkl")
    flat, treedef = jax.tree_util.tree_flatten(state.params)
    tflat, ttreedef = jax.tree_util.tree_flatten(tparams_ship)
    save_pickle(out, {
        "head_leaves": [np.asarray(x) for x in flat],
        "head_treedef": treedef,
        "head_ema": jax.tree.map(np.asarray, state.ema_params),
        "torso_leaves": [np.asarray(x) for x in tflat],
        "torso_treedef": ttreedef,
        "occ": {k: np.asarray(v) for k, v in occ._asdict().items()},
        "meta": {"res": res, "grid": grid, "frames": args.frames,
                 "audio_dim": ds.audio_dim, "aabb": aabb, "dt": dt,
                 "intrinsics": ds.intrinsics, "poses": poses,
                 "head_iters": args.head_iters,
                 "torso_iters": args.torso_iters,
                 "lips_iters": args.lips_iters,
                 "final_psnr": mean_db},
    })
    emit(event="done", state=out,
         minutes=round((time.time() - T0) / 60, 1))


if __name__ == "__main__":
    main()
