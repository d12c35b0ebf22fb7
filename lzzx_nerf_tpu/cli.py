"""CLI entry point (reference train.py): train / finetune / torso / test.

Usage:
  python -m lzzx_nerf_tpu.cli data/<id>/ -O --iters 100000 --asr_model hubert
  python -m lzzx_nerf_tpu.cli data/<id>/ -O --test --test_train --aud X_hu.npy
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import time
from typing import Optional

import numpy as np


def build_config(argv=None):
    from .config import Config

    ap = argparse.ArgumentParser()
    ap.add_argument("path", type=str)
    ap.add_argument("-O", action="store_true",
                    help="equals --fp16 --exp_eye (reference train.py:143-145)")
    # drop-in compatibility: the reference's --cuda_ray selects its CUDA
    # marcher over the pure-pytorch fallback (train.py:34); here the
    # TPU marcher IS the only path, so the flag is accepted and ignored.
    # The reference declares it store_true, so it must never consume a
    # following token ("--cuda_ray data/obama" has to parse) — normalize
    # the "--cuda_ray 0/1" and "--cuda_ray=0/1" spellings by hand instead
    # of nargs="?", which greedily swallows the next positional.
    if argv is None:
        import sys
        argv = sys.argv[1:]
    # argparse allows unambiguous prefix abbreviations, so "--cuda_r 1"
    # must normalize too: a token is treated as --cuda_ray iff it is a
    # prefix of it and of no other declared flag
    _flags = {f"--{f.name}" for f in dataclasses.fields(Config)
              if f.name != "path"} | {"--cuda_ray"}

    def _is_cuda_ray(tok: str) -> bool:
        base = tok.split("=", 1)[0]
        if not base.startswith("--") or len(base) < 4:
            return False
        return [n for n in _flags if n.startswith(base)] == ["--cuda_ray"]

    norm, i = [], 0
    argv = list(argv)
    while i < len(argv):
        tok = argv[i]
        base, eq, val = tok.partition("=")
        if _is_cuda_ray(tok) and eq and val in ("0", "1"):
            if val == "1":
                norm.append("--cuda_ray")
            i += 1
        elif _is_cuda_ray(tok) and not eq and i + 1 < len(argv) \
                and argv[i + 1] in ("0", "1"):
            if argv[i + 1] == "1":
                norm.append("--cuda_ray")
            i += 2
        else:
            norm.append(tok)
            i += 1
    argv = norm
    ap.add_argument("--cuda_ray", action="store_true",
                    help="accepted for reference CLI compatibility; the "
                         "TPU ray marcher is always used")
    defaults = Config()
    for f in dataclasses.fields(Config):
        if f.name == "path":
            continue
        arg = f"--{f.name}"
        default = getattr(defaults, f.name)
        if f.type == "bool" or isinstance(default, bool):
            ap.add_argument(arg, type=int, choices=[0, 1], default=None)
        elif isinstance(default, tuple):
            ap.add_argument(arg, type=float, nargs="*", default=None)
        elif isinstance(default, float):
            ap.add_argument(arg, type=float, default=None)
        elif isinstance(default, int):
            ap.add_argument(arg, type=int, default=None)
        else:
            ap.add_argument(arg, type=str, default=None)
    ns = ap.parse_args(argv)

    overrides = {}
    for f in dataclasses.fields(Config):
        v = getattr(ns, f.name, None)
        if v is None:
            continue
        default = getattr(defaults, f.name)
        if isinstance(default, bool):
            v = bool(v)
        elif isinstance(default, tuple):
            v = tuple(int(x) if isinstance(default[0], int) else x for x in v)
        overrides[f.name] = v
    overrides["path"] = ns.path
    if ns.O:
        overrides.setdefault("fp16", True)
        overrides.setdefault("exp_eye", True)
    return Config(**overrides)


def _build_world(cfg, ds):
    import jax
    import jax.numpy as jnp

    from .models import NeRFField
    from .render import (RenderSettings, init_occupancy_state,
                         mark_untrained_grid)

    settings = RenderSettings.from_config(cfg)
    occ = init_occupancy_state(settings)
    occ = mark_untrained_grid(settings, occ, jnp.asarray(ds.poses),
                              ds.intrinsics)

    field = NeRFField(
        bound=cfg.bound, audio_in_dim=cfg.audio_in_dim, att=cfg.att,
        exp_eye=cfg.exp_eye, emb=cfg.emb, ind_dim=cfg.ind_dim,
        ind_num=cfg.ind_num, encoder=cfg.encoder,
        dtype=jnp.bfloat16 if cfg.fp16 else jnp.float32)
    b0 = ds.frame(0)
    params = field.init(
        jax.random.PRNGKey(cfg.seed), jnp.zeros((4, 3)),
        jnp.ones((4, 3)) / 3 ** 0.5, jnp.asarray(b0["auds"]),
        jnp.zeros(max(cfg.ind_dim, 1)), jnp.asarray([0.25]),
        method="init_all")
    if cfg.train_camera:
        # per-frame pose refinement params (reference renderer.py:129-132)
        params = dict(params)
        params["params"] = dict(params["params"])
        params["params"]["camera_dR"] = jnp.zeros((cfg.ind_num, 3))
        params["params"]["camera_dT"] = jnp.zeros((cfg.ind_num, 3))
    return settings, occ, field, params


def run_train(cfg) -> None:
    import jax
    import jax.numpy as jnp

    from .data.provider import NeRFDataset
    from .models import TorsoField
    from .render import make_density_grid_update
    from .train import (TrainState, Trainer, build_optimizer, make_eval_step,
                        make_train_step)
    from .train.trainer import make_torso_train_step
    from .train.metrics import PSNRMeter, LPIPSMeter

    from .parallel import data_sharding, make_mesh
    from .parallel.distributed import init_distributed, is_coordinator

    # multi-host: no-op unless the JAX_COORDINATOR_* env is present
    distributed = init_distributed()

    ds = NeRFDataset(cfg, type="train")
    val = NeRFDataset(cfg, type="val")
    settings, occ, field, params = _build_world(cfg, ds)
    trainer = Trainer(cfg.workspace, max_keep_ckpt=cfg.max_keep_ckpt)
    if distributed and not is_coordinator():
        # rank-0-only IO (reference local_rank==0 gates,
        # TrainerUtil.py:177-184): concurrent log/opt.txt appends interleave
        # and concurrent orbax saves on a shared workspace corrupt
        trainer.log = lambda *a, **kw: None
        trainer.scalar = lambda *a, **kw: None
        trainer.save_checkpoint = lambda *a, **kw: None

    # data-parallel mesh over the ray batch (--data_parallel N). Params stay
    # replicated; with_sharding_constraint in the train step shards the
    # sampled rays and XLA inserts the gradient psum over ICI.
    dp_sharding = None
    if cfg.data_parallel > 0:
        devs = jax.devices()
        if len(devs) < cfg.data_parallel:
            raise SystemExit(
                f"--data_parallel {cfg.data_parallel} but only "
                f"{len(devs)} devices visible")
        mesh = make_mesh("data", devs[:cfg.data_parallel])
        dp_sharding = data_sharding(mesh)
        trainer.log(f"[INFO] data-parallel over {cfg.data_parallel} devices"
                    + (f" ({jax.process_count()} hosts)" if distributed else ""))

    trainer.log(f"[INFO] {len(ds.poses)} train frames, res {ds.H}x{ds.W}, "
                f"encoder={cfg.encoder}, iters={cfg.iters}")
    # one JSON document per line (appended per run); the serving session
    # adopts the last line when loading this workspace (rank-0 writes only)
    if not distributed or is_coordinator():
        with open(os.path.join(cfg.workspace, "opt.txt"), "a") as f:
            f.write(cfg.to_json(indent=None) + "\n")

    tx = build_optimizer(cfg.lr, cfg.lr_net, cfg.iters, cfg.finetune_lips)
    state = TrainState.create(params, tx)
    state, occ, resumed = trainer.load_checkpoint(state, occ)
    if resumed:
        trainer.log(f"[INFO] resumed at step {int(state.step)}")

    if cfg.torso:
        run_train_torso(cfg, ds, settings, occ, trainer)
        return

    common = dict(
        H=ds.H, W=ds.W, intrinsics=ds.intrinsics,
        num_rays=cfg.num_rays, iters=cfg.iters, patch_size=cfg.patch_size,
        unc_loss=cfg.unc_loss, amb_aud_loss=cfg.amb_aud_loss,
        amb_eye_loss=cfg.amb_eye_loss, lambda_amb=cfg.lambda_amb,
        ind_dim=cfg.ind_dim, exp_eye=cfg.exp_eye,
        ema_decay=cfg.ema_decay, ema_interval=cfg.ema_update_interval,
        update_extra_interval=cfg.update_extra_interval,
        train_camera=cfg.train_camera,
        data_sharding=dp_sharding)
    def lpips_params_or_die(why):
        """LPIPS provenance must be LOUD (round-2 review item 4): training
        against the fixed-seed random backbone silently diverges from the
        reference's pretrained LPIPS-alex (TrainerUtil.py:106-109)."""
        from .train import lpips as lpips_mod

        lpips_path = lpips_mod.default_weights_path()
        if lpips_path is None and not cfg.allow_rand_lpips:
            raise SystemExit(
                f"[ERROR] {why} needs pretrained LPIPS weights "
                "(none found at $LZZX_LPIPS_NPZ or "
                f"{lpips_mod.DEFAULT_WEIGHTS}).\n"
                "Export them once with scripts/export_lpips.py (any machine "
                "with the `lpips` pip package), or pass --allow_rand_lpips "
                "to knowingly train against the fixed-seed RANDOM "
                "backbone (quality diverges from the reference).")
        provenance = (f"pretrained ({lpips_path})" if lpips_path
                      else "RANDOM fixed-seed backbone (--allow_rand_lpips)")
        trainer.log(f"[INFO] {why} LPIPS weights: {provenance}")
        trainer.scalar("train/lpips_pretrained",
                       0.0 if lpips_path is None else 1.0, 0)
        return lpips_mod.get_params()

    # patch-sampled training carries the reference's 0.1·LPIPS patch term
    # whenever patch_size > 1, independent of the lips finetune
    # (TrainerUtil.py:274-284)
    patch_lpips = (lpips_params_or_die("--patch_size > 1")
                   if cfg.patch_size > 1 and not cfg.finetune_lips else None)
    train_budget = (int(cfg.num_rays * cfg.train_budget_frac) // 1024 * 1024
                    if cfg.train_budget_frac > 0 else 0)
    step_fn = jax.jit(make_train_step(field, settings, tx,
                                      finetune_lips=False,
                                      lpips_params=patch_lpips, **common))
    # ray-compacted step used after the density grid has refined
    # (cfg.train_compact_warmup; see Config.train_budget_frac). Under
    # --data_parallel the compaction runs per shard (trainer.py vmaps the
    # compact renderer over the mesh axis — no cross-shard collectives)
    compact_step_fn = None
    if train_budget > 0:
        stage2 = (max(1024, int(train_budget * cfg.train_stage2_frac)
                      // 1024 * 1024)
                  if cfg.train_stage_split > 0 else 0)
        compact_step_fn = jax.jit(make_train_step(
            field, settings, tx, finetune_lips=False,
            lpips_params=patch_lpips,
            train_budget=train_budget,
            train_stage_split=cfg.train_stage_split,
            train_stage2_budget=stage2, **common))
    # lips finetune alternates the lips-crop LPIPS step with the normal step
    # every other iteration (reference flip_finetune_lips,
    # TrainerUtil.py:70,311-313)
    lips_step_fn = None
    if cfg.finetune_lips:
        lips_step_fn = jax.jit(make_train_step(
            field, settings, tx, finetune_lips=True,
            lips_pad=cfg.lips_crop,
            lpips_params=lpips_params_or_die("--finetune_lips"),
            **common))
    eval_fn = jax.jit(make_eval_step(
        field, settings, H=ds.H, W=ds.W, intrinsics=ds.intrinsics,
        ind_dim=cfg.ind_dim, exp_eye=cfg.exp_eye, use_ema=cfg.use_ema))

    grid_refresh = make_density_grid_update(field, settings)

    rng = jax.random.PRNGKey(cfg.seed)
    t_start = time.time()
    it = int(state.step)
    eval_interval = cfg.eval_interval or max(
        1, int(5000 / max(len(ds.poses), 1)))  # auto: train.py:296
    epoch = 0
    psnr_meter, lpips_meter = PSNRMeter(), LPIPSMeter()

    # --preload: keep every frame's arrays resident on device (the
    # reference's preload tiers, provider.py:453-473). On the tunneled chip
    # a per-step host->device frame upload costs tens of ms — more than the
    # step itself — so preloading is the training-throughput lever here.
    device_frames = None
    if cfg.preload:
        # estimate before committing: a real multi-minute dataset can be
        # tens of GB of frame arrays — fail softly into streaming instead
        # of an opaque device OOM mid-preload (the reference's preload
        # tiers gate the same way, provider.py:453-473)
        probe = {k: np.asarray(v) for k, v in ds.frame(0).items()}
        per_frame = sum(v.nbytes for v in probe.values()
                        if hasattr(v, "nbytes"))
        total = per_frame * len(ds)
        limit = float(os.environ.get("LZZX_PRELOAD_BYTES", 10e9))
        if total > limit:
            trainer.log(f"[WARN] --preload skipped: {len(ds)} frames x "
                        f"{per_frame/1e6:.1f} MB = {total/1e9:.1f} GB > "
                        f"{limit/1e9:.1f} GB budget (LZZX_PRELOAD_BYTES); "
                        f"streaming from host instead")
        else:
            trainer.log(f"[INFO] preloading {len(ds)} frames to device "
                        f"({total/1e9:.2f} GB)")
            device_frames = [
                jax.device_put({k: jnp.asarray(v)
                                for k, v in ds.frame(i).items()})
                for i in range(len(ds))
            ]
            # frame() host-cached every decoded frame while building the
            # device copies — drop the duplicate (multi-GB on real data)
            ds._cache.clear()
    order_rng = np.random.default_rng(cfg.seed)

    def epoch_batches():
        if device_frames is None:
            yield from ds.frames()
        else:
            order = order_rng.permutation(len(device_frames))
            for i in order:
                yield device_frames[int(i)]

    while it < cfg.iters:
        epoch += 1
        for batch in epoch_batches():
            if it >= cfg.iters:
                break
            if device_frames is None:
                batch = {k: jnp.asarray(v) for k, v in batch.items()}
            if it % cfg.update_extra_interval == 0:
                # one jitted program; rng is the constant base key (folded
                # with the step inside) — the old eager refresh dispatched
                # dozens of ops at ~10 ms each over the remote link and
                # dominated wall-clock (render/grid_update.py rationale)
                occ = grid_refresh(state.params, occ, batch["auds"],
                                   batch.get("eye"), rng, state.step)
            if lips_step_fn is not None and it % 2 == 1:
                fn = lips_step_fn
            elif (compact_step_fn is not None
                  and it >= cfg.train_compact_warmup):
                fn = compact_step_fn
            else:
                fn = step_fn
            state, metrics = fn(state, occ, batch, rng)
            it += 1
            if it % 100 == 0:
                loss_v, mse_v = float(metrics["loss"]), float(metrics["mse"])
                trainer.log(f"step {it}: loss={loss_v:.5f} mse={mse_v:.5f} "
                            f"({it / (time.time() - t_start):.2f} it/s)")
                trainer.scalar("train/loss", loss_v, it)
                trainer.scalar("train/mse", mse_v, it)
                if "n_active" in metrics:
                    # compact-step budget demand: persistent overflow means
                    # rays are excluded from the loss every step — raise
                    # train_budget_frac (Config comment has the quality
                    # data). n_active_over is the worst SHARD's excess over
                    # its per-shard slots under --data_parallel (the summed
                    # demand can sit under the global budget while one
                    # shard overflows), trainer.py.
                    n_act = int(metrics["n_active"])
                    trainer.scalar("train/n_active", n_act, it)
                    # "worst shard" only means something under
                    # --data_parallel; single-device overflow should not
                    # send the user hunting for a sharding misconfig
                    who = ("worst shard exceeds its slots"
                           if dp_sharding is not None
                           else "demand exceeds the budget")
                    if int(metrics["n_active_over"]) > 0:
                        trainer.log(
                            f"[WARN] train-ray budget overflow: {who} by "
                            f"{int(metrics['n_active_over'])} rays (demand "
                            f"{n_act}, budget {train_budget}); overflow "
                            f"rays are dropped from the loss (unbiased but "
                            f"noisy) — consider raising "
                            f"--train_budget_frac")
                if "n_stage2" in metrics:
                    n_s2 = int(metrics["n_stage2"])
                    trainer.scalar("train/n_stage2", n_s2, it)
                    who2 = ("worst shard exceeds its stage-2 slots"
                            if dp_sharding is not None
                            else "demand exceeds the stage-2 budget")
                    if int(metrics["n_stage2_over"]) > 0:
                        trainer.log(
                            f"[WARN] staged-eval survivor overflow: {who2} "
                            f"by {int(metrics['n_stage2_over'])} (demand "
                            f"{n_s2}, budget {stage2}); overflowing "
                            f"rays truncate at sample "
                            f"{cfg.train_stage_split} (biased) — raise "
                            f"--train_stage2_frac or set "
                            f"--train_stage_split 0")
        trainer.save_checkpoint(state, occ)
        if epoch % eval_interval == 0 and (not distributed
                                           or is_coordinator()):
            psnr_meter.clear(); lpips_meter.clear()
            # full val split by default (reference TrainerUtil.py:1107-1220);
            # --eval_frames N caps it for quick runs
            for vi, vb in enumerate(val.frames(shuffle=False)):
                if cfg.eval_frames and vi >= cfg.eval_frames:
                    break
                out = eval_fn(state, occ,
                              {k: jnp.asarray(v) for k, v in vb.items()})
                psnr_meter.update(out["image"], vb["image"])
                lpips_meter.update(out["image"], vb["image"])
                _save_image(out["image"],
                            os.path.join(cfg.workspace, "validation",
                                         f"ep{epoch:04d}_{vi}.png"))
            trainer.log(f"[eval] epoch {epoch}: {psnr_meter.report()} | "
                        f"{lpips_meter.report()}")
            trainer.scalar("eval/psnr", psnr_meter.measure(), it)
            trainer.scalar("eval/lpips", lpips_meter.measure(), it)
    trainer.save_checkpoint(state, occ)
    trainer.log("[INFO] training done")


def run_train_torso(cfg, ds, settings, occ, trainer) -> None:
    import jax
    import jax.numpy as jnp

    from .models import TorsoField
    from .render import make_torso_grid_update
    from .train import TrainState, build_optimizer
    from .train.trainer import make_torso_train_step

    torso = TorsoField(torso_shrink=cfg.torso_shrink,
                       ind_dim_torso=cfg.ind_dim_torso, ind_num=cfg.ind_num,
                       encoder="dense" if cfg.encoder == "dense" else "tiled")
    b0 = ds.frame(0)
    tparams = torso.init(jax.random.PRNGKey(cfg.seed),
                         jnp.zeros((4, 2)), jnp.asarray(b0["pose"]),
                         jnp.zeros(max(cfg.ind_dim_torso, 1)))
    tx = build_optimizer(cfg.lr, cfg.lr_net, cfg.iters)
    state = TrainState.create(tparams, tx)
    step_fn = jax.jit(make_torso_train_step(
        torso, settings, tx, H=ds.H, W=ds.W, num_rays=cfg.num_rays,
        ind_dim_torso=cfg.ind_dim_torso))

    grid_refresh = make_torso_grid_update(torso, settings,
                                          cfg.ind_dim_torso)

    rng = jax.random.PRNGKey(cfg.seed)
    it = int(state.step)
    t0 = time.time()
    while it < cfg.iters:
        for batch_np in ds.frames():
            if it >= cfg.iters:
                break
            batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
            if it % cfg.update_extra_interval == 0:
                occ = grid_refresh(state.params, occ, batch["pose"],
                                   rng, state.step)
            state, metrics = step_fn(state, occ, batch, rng)
            it += 1
            if it % 100 == 0:
                trainer.log(f"[torso] step {it}: "
                            f"loss={float(metrics['loss']):.5f} "
                            f"({it / (time.time() - t0):.2f} it/s)")
        trainer.save_checkpoint(state, occ)
    trainer.log("[INFO] torso training done")


def run_save_mesh(cfg) -> None:
    """Density iso-surface -> .ply (reference TrainerUtil.save_mesh,
    TrainerUtil.py:444-465)."""
    import jax
    import jax.numpy as jnp

    from .data.provider import NeRFDataset
    from .ops.mesh import extract_geometry, save_ply
    from .train import TrainState, Trainer, build_optimizer

    ds = NeRFDataset(cfg, type="train")
    settings, occ, field, params = _build_world(cfg, ds)
    trainer = Trainer(cfg.workspace)
    tx = build_optimizer(cfg.lr, cfg.lr_net, cfg.iters)
    state = TrainState.create(params, tx)
    state, occ, _ = trainer.load_checkpoint(state, occ)

    b0 = ds.frame(0)
    enc_a = field.apply(state.params, jnp.asarray(b0["auds"]),
                        method="encode_audio")
    eye = jnp.asarray(b0["eye"])

    @jax.jit
    def density(pts):
        return field.apply(state.params, pts, enc_a, eye,
                           method="density").sigma

    aabb = settings.aabb
    verts, faces = extract_geometry(
        aabb[:3], aabb[3:], resolution=cfg.mesh_resolution,
        threshold=cfg.mesh_threshold,
        query_func=lambda p: density(jnp.asarray(p, jnp.float32)))
    out = os.path.join(cfg.workspace, "meshes")
    os.makedirs(out, exist_ok=True)
    path = os.path.join(out, f"mesh_{int(state.step)}.ply")
    save_ply(path, verts, faces)
    trainer.log(f"[INFO] saved mesh: {path} "
                f"({len(verts)} verts, {len(faces)} faces)")


def run_asr_live(cfg) -> None:
    """--asr: live audio -> streamed render (the reference's test-time
    asr=True loop, train.py:210-236, with the standalone streaming tool's
    (l, m, r) contract, asr.py:185-250). Features stream from --asr_wav
    (a wav replayed at the 20 ms mic cadence) or the microphone
    (sounddevice), per-frame rows unfold incrementally
    (StreamingASR.feature_rows), and frames render as soon as their
    attention context arrives (session.run_live) into an mp4 next to the
    workspace (raw frames when ffmpeg is absent)."""
    import shutil as _shutil

    from .serving.asr import (StreamingASR, mic_chunk_stream,
                              wav_chunk_stream)
    from .serving.session import InferenceSession
    from .serving.streaming import make_sink

    # build the session with asr=False: cfg.asr makes the PROVIDER skip
    # dataset audio (live features replace it), but the session's program
    # build needs an audio template; run_live then feeds the real stream.
    # --head_ckpt overrides the head workspace like run_test.
    session = InferenceSession(cfg.replace(asr=False))
    session.load_model(cfg.path, cfg.head_ckpt or cfg.workspace)
    if not session.resumed:
        raise SystemExit(
            f"no head checkpoint in {cfg.head_ckpt or cfg.workspace!r} — "
            "--asr renders from trained weights only")
    ds = session.ds

    chunks = (wav_chunk_stream(cfg.asr_wav) if cfg.asr_wav
              else mic_chunk_stream())
    if cfg.asr_play:
        from .serving.asr import play_through

        chunks = play_through(chunks)
    asr = None   # CTC object (None on the hubert path)
    if cfg.asr_model == "hubert":
        # hubert-trained models stream through the HuBERT lattice carry
        # (same path as webapi /api/audio_chunk)
        from .audio import HubertFeatureExtractor, HubertStreamer

        feature_stream = HubertStreamer(
            HubertFeatureExtractor()).feature_stream(chunks)
    else:
        # wav2vec-CTC families stream through the (l, m, r) unfold.
        # reference family -> checkpoint mapping (train.py:127-129 comments
        # + asr.py:396); a name with '/' passes through as a HF id
        model_ids = {
            "esperanto": "cpierse/wav2vec2-large-xlsr-53-esperanto",
        }
        name = (cfg.asr_model if "/" in cfg.asr_model
                else model_ids.get(cfg.asr_model))
        if name is None:
            raise RuntimeError(
                f"--asr has no streaming CTC for "
                f"asr_model={cfg.asr_model!r} (deepspeech features come "
                "from the offline tool; use --asr_model esperanto, hubert, "
                "or a HuggingFace CTC id)")
        dim = (44 if "esperanto" in name
               else 29 if "deepspeech" in name else 32)
        asr = StreamingASR(dim, asr_model=name, save_feats=True,
                           left=cfg.l, mid=cfg.m, right=cfg.r)
        feature_stream = asr.feature_rows(chunks)
    out = os.path.join(cfg.workspace, "results")
    os.makedirs(out, exist_ok=True)
    if _shutil.which("ffmpeg"):
        sink = make_sink("mp4", ds.W, ds.H, fps=25,
                         path=os.path.join(out, "asr_live.mp4"),
                         audio_path=cfg.asr_wav)
    else:
        sink = make_sink("raw", ds.W, ds.H,
                         path=os.path.join(out, "asr_live.raw"))
    collected = []
    if cfg.asr_save_feats and asr is None:
        # hubert path lacks the CTC object's all_feats accumulator — tee
        # the stream; the CTC path reuses asr.unfolded_features() below
        def tee(stream):
            for f in stream:
                collected.append(np.asarray(f, np.float32))
                yield f

        feature_stream = tee(feature_stream)
    n, dt = session.run_live(feature_stream, sink)
    if cfg.asr_save_feats:
        # reference --asr_save_feats writes the training-layout unfold
        # next to the wav (asr.py:236-250, <wav>.npy)
        if asr is not None and asr.all_feats:
            feats = asr.unfolded_features()
        elif collected:
            feats = np.concatenate(collected, axis=0)
        else:
            feats = None
        if feats is None:
            print("[WARN] --asr_save_feats: stream produced no features "
                  "(audio shorter than the ASR warm-up?) — nothing saved")
        else:
            feats_path = (os.path.splitext(cfg.asr_wav)[0] + ".npy"
                          if cfg.asr_wav
                          else os.path.join(out, "asr_feats.npy"))
            np.save(feats_path, feats)
            print(f"[INFO] asr features saved to {feats_path}")
    print(f"[INFO] asr live: {n} frames in {dt:.2f}s "
          f"({n / max(dt, 1e-9):.1f} FPS) -> {out}")


def run_test(cfg) -> None:
    """Offline batch inference: render every frame, write PNGs (+ mp4 when
    ffmpeg is present), report PSNR/LPIPS/LMD when ground truth exists
    (reference train.py:210-262 + TrainerUtil.test)."""
    import jax
    import jax.numpy as jnp

    from .data.provider import NeRFDataset
    from .render import render_rays_compact
    from .train import TrainState, Trainer, build_optimizer
    from .train.metrics import LMDMeter, LPIPSMeter, PSNRMeter
    from .utils import get_rays

    from .utils.rays import get_bg_coords

    # torso-composited inference uses the head config for rendering
    head_cfg = cfg.replace(torso=False) if cfg.torso else cfg
    ds = NeRFDataset(head_cfg, type="train" if cfg.test_train else "test")
    ds.training = False
    if ds.aud_features is None:
        # cfg.asr makes the provider skip dataset audio — a direct
        # run_test(cfg) call with it set would KeyError deep in the frame
        # loop instead of saying what is wrong (main() dispatches --asr to
        # run_asr_live before ever reaching here)
        raise SystemExit(
            "run_test has no audio features (asr mode?): use --asr for "
            "live streaming or pass --aud <features.npy>")
    settings, occ, field, params = _build_world(head_cfg, ds)
    trainer = Trainer(cfg.workspace)
    tx = build_optimizer(cfg.lr, cfg.lr_net, cfg.iters)
    state = TrainState.create(params, tx)
    if cfg.head_ckpt:
        # explicit head weights (reference train.py:188-203 loads
        # --head_ckpt into the model before the torso stage/inference);
        # head checkpoints live in their own workspace here, so the flag
        # names that workspace directory. Check BEFORE constructing a
        # Trainer: its ctor mkdirs the workspace + checkpoints/, so a
        # typo'd path would leave junk directories behind
        if not os.path.isdir(os.path.join(cfg.head_ckpt, "checkpoints")):
            raise SystemExit(
                f"--head_ckpt {cfg.head_ckpt!r}: no checkpoints/ dir")
        state, occ, resumed = Trainer(cfg.head_ckpt).load_checkpoint(
            state, occ)
        if not resumed:
            raise SystemExit(
                f"--head_ckpt {cfg.head_ckpt!r}: no checkpoint found")
    else:
        state, occ, resumed = trainer.load_checkpoint(state, occ)
    trainer.log(f"[INFO] test: {len(ds)} frames, ckpt resumed={resumed}")

    # optional torso stage: looks for the torso workspace's checkpoint
    # (reference inference runs run_torso before blending, renderer.py:553)
    torso_state = None
    torso = None
    if cfg.torso:
        from .models import TorsoField
        from .render import run_torso  # noqa: F401 (used below)

        torso_ws = cfg.workspace.rstrip("/")
        torso_ws = torso_ws if torso_ws.endswith("_torso") else torso_ws + "_torso"
        torso = TorsoField(torso_shrink=cfg.torso_shrink,
                           ind_dim_torso=cfg.ind_dim_torso,
                           ind_num=cfg.ind_num,
                           encoder="dense" if cfg.encoder == "dense"
                           else "tiled")
        tparams = torso.init(jax.random.PRNGKey(0), jnp.zeros((4, 2)),
                             jnp.eye(4), jnp.zeros(max(cfg.ind_dim_torso, 1)))
        t_state = TrainState.create(tparams, tx)
        t_trainer = Trainer(torso_ws)
        torso_state, occ_t, t_ok = t_trainer.load_checkpoint(t_state, occ)
        # adopt ONLY the torso grid fields: the torso stage's checkpoint has
        # a fresh (empty) head occupancy
        occ = occ._replace(density_grid_torso=occ_t.density_grid_torso,
                           mean_density_torso=occ_t.mean_density_torso)
        # torso renders from EMA weights too, like the head and like the
        # serving session (session.py:119-120) — run_test's metrics must
        # measure the combination serving actually streams
        if cfg.use_ema and torso_state is not None:
            tp_ema = dict(torso_state.params)
            tp_ema["params"] = torso_state.ema_params
            torso_state = torso_state.replace(params=tp_ema)
        trainer.log(f"[INFO] torso ckpt ({torso_ws}) resumed={t_ok}")

    budget = max(1024, int(cfg.budget_frac * ds.H * ds.W) // 1024 * 1024)
    bg_coords_full = get_bg_coords(ds.H, ds.W)[0]

    # the window/bitmask fast path assumes cascade == 1 (bound <= 1 — true
    # for every talking-head production config); multi-cascade scenes fall
    # back to the exhaustive marcher EXPLICITLY instead of tripping the
    # renderer assertion (reference marches any cascade count,
    # raymarching.cu:42-54,409)
    use_compact = settings.cascade == 1
    if not use_compact:
        trainer.log(
            f"[INFO] bound={cfg.bound} -> cascade={settings.cascade} > 1: "
            "the compact/block fast path supports cascade == 1 only; "
            "rendering through the exhaustive marcher (render_rays) — "
            "slower, sample-identical")

    # inference runs from the EMA weights (the reference's "best" checkpoint
    # saves EMA params and infers from them, TrainerUtil.py:1262-1279)
    infer_params = dict(state.params)
    if cfg.use_ema:
        infer_params["params"] = state.ema_params

    # serving operating point: fewer samples/ray + window cap (guarded by
    # tests/test_render.py PSNR checks); prebake the triplane tables once —
    # params are static at test time (same as serving/session.py)
    isettings = dataclasses.replace(
        settings, max_steps=cfg.infer_samples or settings.max_steps)
    tdtype = jnp.bfloat16 if cfg.infer_table_bf16 else None
    packed = jax.jit(
        lambda p: field.apply(p, method="bake_tables", dtype=tdtype))(
            infer_params)
    from .ops.march2 import build_inference_tables

    # defer the block-variant tables until the march plan is resolved —
    # only the one the plan uses gets materialized (march2.py docstring)
    tables = jax.jit(
        lambda o: build_inference_tables(o, settings.bound, variants=()))(
            occ.occ)
    # adaptive K2 + block-march envelope step-down, shared with serving
    # (ops.march2.resolve_march_plan) so --test and session.py always
    # choose the same marcher for a given geometry
    k2 = cfg.infer_window_candidates
    march_group = cfg.infer_march_group
    march_variant = cfg.infer_march_variant
    # the block marcher only runs when render_frame below actually takes
    # the block path — resolving a group-2/quad plan otherwise would
    # materialize MB-scale variant tables (col_quadmask / col_nb5mask)
    # that the per-ray render never reads, and log a plan describing a
    # marcher that is never used (mirror of session.py's use_blocks gate)
    use_blocks = (use_compact and cfg.infer_block == 2 and ds.H % 2 == 0
                  and ds.W % 2 == 0 and budget % 4 == 0)
    # the K2 trajectory measurement must see the SAME rays render_frame
    # casts: fold the learned per-frame camera refinement into the measured
    # poses (rays_o += dT, rays_d @= dR  <=>  R' = dR^T R, t' = t + dT) —
    # the fixed margin inside the measurement need not absorb a large
    # learned shift (round-3 advisor finding)
    measure_poses = ds.poses
    if cfg.train_camera and "camera_dT" in infer_params["params"]:
        from .utils.pose import euler_angles_to_matrix

        dT = np.asarray(infer_params["params"]["camera_dT"])
        dR = np.asarray(euler_angles_to_matrix(
            jnp.asarray(infer_params["params"]["camera_dR"])
            / 180.0 * jnp.pi + 1e-8))
        measure_poses = np.array(ds.poses, copy=True)
        n = len(measure_poses)
        measure_poses[:, :3, :3] = np.einsum(
            "nij,nik->njk", dR[:n], measure_poses[:, :3, :3])
        measure_poses[:, :3, 3] += dT[:n]
    if use_compact:
        from .ops.march2 import resolve_march_plan

        k2, march_group, march_variant = resolve_march_plan(
            isettings, tables.z_lo, tables.z_hi, measure_poses,
            ds.intrinsics, ds.H, ds.W, k2_override=k2,
            march_group=march_group if use_blocks else 1,
            march_variant=march_variant, log=trainer.log,
            measure="block" if use_blocks else "ray")
        from .ops.march2 import ensure_variant_tables, needed_variant_tables

        tables = ensure_variant_tables(
            tables, occ.occ, needed_variant_tables(
                march_group, march_variant,
                prepass=(use_blocks and march_group == 2
                         and cfg.infer_march_prepass)))
    k2 = k2 or None
    use_prepass = (use_compact and use_blocks and march_group == 2
                   and cfg.infer_march_prepass)
    # SHORT/LONG bucket march (Config.infer_march_bucket): same
    # trajectory-measured plan as serving; run_test has no rebuild loop,
    # so long-bucket overflow only warns (n_long) like the eval budget
    march_bucket = None
    if use_prepass and cfg.infer_march_bucket and k2:
        from .ops.march2 import measure_bucket_plan

        k2s_m, ns_m, nl_m, _ = measure_bucket_plan(
            isettings, tables.z_lo, tables.z_hi, tables.col_dilwords,
            measure_poses, ds.intrinsics, ds.H, ds.W, k2, log=trainer.log)
        if k2s_m:
            from .ops.march2 import bucket_short_budget

            bs = bucket_short_budget(ns_m, budget, 1024)
            if bs:
                march_bucket = (k2s_m, bs)
    long_budget = budget - march_bucket[1] if march_bucket else 0
    s2_budget = max(1024, int(budget * cfg.infer_stage2_frac) // 1024 * 1024)
    # post-march field-eval re-compaction (Config.infer_eval_frac): exact
    # while real blocks fit; run_test has no rebuild loop, so overflow only
    # warns (n_real) like the ray budget above
    eval_budget = 0
    if use_compact and use_blocks and cfg.infer_eval_frac > 0:
        eval_budget = min(budget, max(
            1024, int(budget * cfg.infer_eval_frac) // 1024 * 1024))

    @jax.jit
    def render_frame(params, packed, torso_params, occ, pose, auds, eye,
                     index):
        rays = get_rays(pose[None], ds.intrinsics, ds.H, ds.W, N=-1)
        ray_o_origin = rays["rays_o"][0][0]
        rays_d = rays["rays_d"][0]
        if cfg.train_camera and "camera_dT" in params["params"]:
            # apply the learned per-frame pose refinement exactly as the
            # train step does (train/trainer.py train_camera; reference
            # renderer.py:224-231) — without this, camera-trained models
            # render systematically mis-posed at test time
            from .utils.pose import euler_angles_to_matrix

            dT = params["params"]["camera_dT"][index]
            dR = euler_angles_to_matrix(
                params["params"]["camera_dR"][index] / 180.0 * jnp.pi + 1e-8)
            ray_o_origin = ray_o_origin + dT
            rays_d = rays_d @ dR
        enc_a = field.apply(params, auds, method="encode_audio")
        c = (params["params"]["individual_codes"][0]
             if cfg.ind_dim > 0 else None)
        bg = jnp.asarray(ds.bg_img.reshape(-1, 3))
        if torso is not None:
            from .render import run_torso

            ct = (torso_params["params"]["individual_codes_torso"][0]
                  if cfg.ind_dim_torso > 0 else None)
            tres = run_torso(torso.apply, torso_params, settings, occ,
                             bg_coords_full, pose, ct, bg)
            bg = tres["bg_color"]

        if cfg.fused_field != 0:
            from .models.nerf import make_fused_apply

            apply_packed = make_fused_apply(
                field, packed, use_kernel=cfg.fused_field == 2)
        else:
            def apply_packed(p, *a, **kw):
                return field.apply(p, *a, packed=packed, **kw)

        staged = dict(stage_split=cfg.infer_stage_split,
                      stage2_budget=s2_budget)
        if not use_compact:
            from .render import render_rays

            out = render_rays(
                apply_packed, params, isettings, occ,
                jnp.broadcast_to(ray_o_origin, rays_d.shape), rays_d,
                enc_a, c, eye, bg, compute_uncertainty=False)
            out = {**out, "n_active": jnp.int32(0)}
        elif use_blocks:
            from .render import render_rays_compact_blocks

            out = render_rays_compact_blocks(
                apply_packed, params, isettings, occ, ray_o_origin,
                rays_d, ds.H, ds.W, enc_a, c, eye, bg,
                budget=budget, window_candidates=k2, tables=tables,
                march_group=march_group, march_variant=march_variant,
                eval_budget=eval_budget, march_prepass=use_prepass,
                march_bucket=march_bucket, **staged)
        else:
            out = render_rays_compact(
                apply_packed, params, isettings, occ,
                jnp.broadcast_to(ray_o_origin, rays_d.shape),
                rays_d, enc_a, c, eye, bg, budget=budget,
                window_candidates=k2, tables=tables, minimal=True, **staged)
        return (out["image"].reshape(ds.H, ds.W, 3), out["n_active"],
                out.get("n_stage2", 0), out.get("n_winmax", 0),
                out.get("n_real", 0), out.get("n_long", 0))

    out_dir = os.path.join(cfg.workspace, "results")
    os.makedirs(out_dir, exist_ok=True)
    meters = [PSNRMeter(), LPIPSMeter(), LMDMeter()] if ds.has_gt else []
    t0 = time.time()
    tp = torso_state.params if torso_state is not None else None
    overflow_warned = s2_warned = win_warned = eval_warned = False

    long_warned = False

    def consume(i, img_dev, n_active_dev, n_s2_dev, n_wm_dev, n_rl_dev,
                n_lg_dev, gt):
        nonlocal overflow_warned, s2_warned, win_warned, eval_warned
        nonlocal long_warned
        if (not long_warned and march_bucket
                and int(n_lg_dev) > long_budget):
            trainer.log(f"[WARN] frame {i}: {int(n_lg_dev)} long-bucket "
                        f"rays exceed the long budget {long_budget}; "
                        f"overflow rendered as background (raise "
                        f"--budget_frac)")
            long_warned = True
        img_np = np.asarray(img_dev)
        if not overflow_warned and int(n_active_dev) > budget:
            trainer.log(f"[WARN] frame {i}: {int(n_active_dev)} active rays "
                        f"exceed budget {budget}; overflow rendered as "
                        f"background (raise --budget_frac)")
            overflow_warned = True
        if not s2_warned and int(n_s2_dev) > s2_budget:
            trainer.log(f"[WARN] frame {i}: {int(n_s2_dev)} stage-2 "
                        f"survivors exceed budget {s2_budget}; overflow "
                        f"rays truncate at the split (raise "
                        f"--infer_stage2_frac)")
            s2_warned = True
        if not win_warned and k2 and int(n_wm_dev) > k2:
            # cannot happen with the trajectory-measured K2 (run_test
            # renders exactly the measured poses) — guards an explicit
            # --infer_window_candidates that is too small for this scene
            trainer.log(f"[WARN] frame {i}: a window needs {int(n_wm_dev)} "
                        f"march candidates > K2={k2}; truncated rays lose "
                        f"far-side samples (raise "
                        f"--infer_window_candidates or use 0 = measured)")
            win_warned = True
        if not eval_warned and eval_budget and int(n_rl_dev) > eval_budget:
            trainer.log(f"[WARN] frame {i}: {int(n_rl_dev)} real-sample "
                        f"rays exceed eval budget {eval_budget}; overflow "
                        f"rendered as background (raise --infer_eval_frac)")
            eval_warned = True
        _save_image(img_np, os.path.join(out_dir, f"{i:05d}.png"))
        for m in meters:
            m.update(img_np, gt)

    # double-buffered loop: frame i+1 is enqueued before frame i's pixels are
    # fetched (same overlap as serving/session.py run)
    pending = None
    # --fix_eye replaces the per-frame blink at test time (reference
    # test_step, TrainerUtil.py:422-423) — the serving session already
    # honors it; run_test must match or the two inference paths diverge
    fixed_eye = (jnp.asarray([cfg.fix_eye], jnp.float32)
                 if cfg.exp_eye and cfg.fix_eye >= 0 else None)
    for i in range(len(ds)):
        b = ds.frame(i)
        img, n_act, n_s2, n_wm, n_rl, n_lg = render_frame(
            infer_params, packed, tp, occ,
            jnp.asarray(b["pose"]), jnp.asarray(b["auds"]),
            fixed_eye if fixed_eye is not None else jnp.asarray(b["eye"]),
            jnp.asarray(b["index"], jnp.int32))
        if pending is not None:
            consume(*pending)
        pending = (i, img, n_act, n_s2, n_wm, n_rl, n_lg,
                   b["image"] if ds.has_gt else None)
    if pending is not None:
        consume(*pending)
    fps = len(ds) / (time.time() - t0)
    trainer.log(f"[INFO] rendered {len(ds)} frames at {fps:.2f} FPS")
    for m in meters:
        trainer.log("[metric] " + m.report())
    _frames_to_video(out_dir, os.path.join(cfg.workspace, "result.mp4"),
                     fps=25, log=trainer.log)


def _save_image(img, path: str) -> None:
    from PIL import Image

    os.makedirs(os.path.dirname(path), exist_ok=True)
    arr = np.asarray(img)
    Image.fromarray((np.clip(arr, 0, 1) * 255).astype(np.uint8)).save(path)


def _frames_to_video(frame_dir: str, out_path: str, fps: int = 25,
                     log=print) -> None:
    import shutil
    import subprocess

    if shutil.which("ffmpeg") is None:
        log(f"[WARN] ffmpeg not found; frames left in {frame_dir}")
        return
    cmd = ["ffmpeg", "-y", "-framerate", str(fps), "-i",
           os.path.join(frame_dir, "%05d.png"), "-c:v", "libx264",
           "-pix_fmt", "yuv420p", out_path]
    subprocess.run(cmd, check=True, capture_output=True)
    log(f"[INFO] wrote {out_path}")


def main(argv=None):
    # this environment's sitecustomize overrides JAX_PLATFORMS; honour an
    # explicit LZZX_PLATFORM=cpu|tpu request reliably
    plat = os.environ.get("LZZX_PLATFORM")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)
    cfg = build_config(argv)
    os.makedirs(cfg.workspace, exist_ok=True)
    if cfg.gui:
        # the reference's dearpygui desktop viewer (TrainerUtil.py:835-994)
        # maps to the browser UI here: live rendering is a serving concern
        # on a TPU host, not a local-GL window
        print("[INFO] --gui: the TPU-native equivalent is the browser UI — "
              "run `python -m lzzx_nerf_tpu.serving.webapi --port 7860` "
              "and open http://127.0.0.1:7860/")
    if cfg.save_mesh:
        run_save_mesh(cfg)
    elif cfg.asr:
        run_asr_live(cfg)
    elif cfg.test:
        run_test(cfg)
    else:
        run_train(cfg)


if __name__ == "__main__":
    main()
