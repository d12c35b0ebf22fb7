"""Per-identity inference session: model + dataset + streaming render loop.

Re-design of reference HubertInferenceMQ.py + GradioSession.py +
TrainerUtil.test_with_2 (the async batch-32 streaming loop,
TrainerUtil.py:638-711). The reference's asyncio gather over 32 per-frame
tasks is cooperative only — frames serialise on the GPU (SURVEY.md §3c note).
The TPU-native equivalent is JAX async dispatch double-buffering: the render
for frame i+1 is enqueued before frame i's pixels are fetched to the host, so
device compute and host→ffmpeg handoff overlap with no threads.
"""

from __future__ import annotations

import time
from typing import Callable, Optional

import numpy as np

from ..config import Config
from .streaming import FrameSink, NullSink


class InferenceSession:
    """Load once per identity; feed audio features; stream frames."""

    def __init__(self, cfg: Config):
        # serving parameter overrides (reference HubertInferenceMQ.py:25-96)
        self.cfg = cfg.replace(test=True, test_train=True, smooth_lips=True,
                               smooth_path=True, smooth_path_window=cfg.smooth_path_window or 14)
        self._built = False
        self.enc_a_smooth = None  # smooth_lips EMA state (renderer.py:254-258)

    # -- model/data ----------------------------------------------------------

    def load_model(self, data_path: str, workspace: str) -> None:
        """Switch identity: re-point dataset + checkpoint (reference
        webapi.py:147-191 /api/model_select). Adopts the architecture-
        relevant fields of the training config saved in the workspace's
        opt.txt so the checkpoint shapes match."""
        import json
        import os

        import jax
        import jax.numpy as jnp

        from ..cli import _build_world
        from ..data.provider import NeRFDataset
        from ..train import TrainState, Trainer, build_optimizer

        self.cfg = self.cfg.replace(path=data_path, workspace=workspace)
        opt_path = os.path.join(workspace, "opt.txt")
        if os.path.exists(opt_path):
            try:
                text = open(opt_path).read()
                lines = [ln for ln in text.splitlines() if ln.strip()]
                try:
                    # current format: one JSON document per line, last wins
                    trained = json.loads(lines[-1])
                except json.JSONDecodeError:
                    # legacy multi-line appended dumps: last flat object
                    trained = json.loads("{" + text.rsplit("{", 1)[-1])
                keep = ("grid_size", "max_steps", "bound", "asr_model",
                        "exp_eye", "ind_dim", "ind_num", "att", "emb",
                        "encoder", "min_near", "density_thresh", "scale",
                        "offset")
                self.cfg = self.cfg.replace(
                    **{k: tuple(trained[k]) if isinstance(trained.get(k), list)
                       else trained[k] for k in keep if k in trained})
            except Exception:
                pass  # malformed opt.txt: keep the server defaults
        self.ds = NeRFDataset(self.cfg, type="train")
        self.ds.training = False
        self.settings, self.occ, self.field, params = _build_world(
            self.cfg, self.ds)
        tx = build_optimizer(self.cfg.lr, self.cfg.lr_net, self.cfg.iters)
        state = TrainState.create(params, tx)
        trainer = Trainer(workspace)
        self.state, self.occ, self.resumed = trainer.load_checkpoint(
            state, self.occ)
        self.enc_a_smooth = None
        # serve from the EMA weights (the reference's "best" checkpoint saves
        # EMA params and infers from them, TrainerUtil.py:1262-1279)
        self.infer_params = dict(self.state.params)
        if self.cfg.use_ema:
            self.infer_params["params"] = self.state.ema_params
        # bake the triplane lookup tables once — params are static while
        # serving, so the per-frame render skips the in-graph bake. bf16
        # tables keep the gather VMEM-resident (3x rate on v5e).
        tdtype = jnp.bfloat16 if self.cfg.infer_table_bf16 else None
        self.packed = jax.jit(
            lambda p: self.field.apply(p, method="bake_tables",
                                       dtype=tdtype))(self.infer_params)
        # the occupancy grid is equally static: derive the window + bitmask
        # tables once instead of in-graph per frame. The block-march
        # variant tables (6.6/16.8 MB @128) are deferred: _compile_render
        # fills only the one the resolved march plan uses
        from ..ops.march2 import build_inference_tables

        self.tables = jax.jit(
            lambda o: build_inference_tables(o, self.settings.bound,
                                             variants=()))(self.occ.occ)
        # torso stage: composite under the head every frame when the torso
        # workspace has a checkpoint (reference renderer.py:553-561)
        self.torso = self.torso_params = self.torso_packed = None
        torso_ws = workspace.rstrip("/") + "_torso"
        if os.path.isdir(os.path.join(torso_ws, "checkpoints")):
            from ..models import TorsoField

            torso = TorsoField(
                torso_shrink=self.cfg.torso_shrink,
                ind_dim_torso=self.cfg.ind_dim_torso,
                ind_num=self.cfg.ind_num,
                encoder="dense" if self.cfg.encoder == "dense" else "tiled")
            tp = torso.init(jax.random.PRNGKey(0), jnp.zeros((4, 2)),
                            jnp.eye(4),
                            jnp.zeros(max(self.cfg.ind_dim_torso, 1)))
            t_state = TrainState.create(tp, tx)
            t_state, occ_t, t_ok = Trainer(torso_ws).load_checkpoint(
                t_state, self.occ)
            if t_ok:
                self.torso = torso
                self.torso_params = dict(t_state.params)
                if self.cfg.use_ema:
                    self.torso_params["params"] = t_state.ema_params
                # f32 torso table: the bf16 torso program faults the axon
                # compiler, and the torso gather volume is tiny
                self.torso_packed = jax.jit(
                    lambda p: torso.apply(p, method="bake_table"))(
                        self.torso_params)
                self.occ = self.occ._replace(
                    density_grid_torso=occ_t.density_grid_torso,
                    mean_density_torso=occ_t.mean_density_torso)
        self._overflow_warned = self._s2_warned = False
        self._long_warned = False
        self._pending_budget = self._pending_sample = None
        self._budget_override = self._sample_override = None
        self._pending_k2 = self._k2_override = None
        self._pending_eval = self._eval_override = None
        self._bucket_plan = None
        self._compile_render()
        self._built = True

    def _compile_render(self) -> None:
        import dataclasses

        import jax
        import jax.numpy as jnp

        from ..render import render_rays_compact
        from ..utils import get_rays

        ds, cfg = self.ds, self.cfg
        # budget slot granularity: 1024 at production frame sizes, finer for
        # tiny frames so the adaptive cap can actually reach the demand
        gran = 1024 if ds.H * ds.W >= 65536 else 256
        self._budget_gran = gran
        frame_cap = max(gran, ds.H * ds.W // gran * gran)
        budget = getattr(self, "_budget_override", None) or max(
            gran, int(cfg.budget_frac * ds.H * ds.W) // gran * gran)
        budget = min(budget, frame_cap)
        self.budget = budget
        # serving operating point: S=infer_samples, capped window candidates
        # (guarded by tests/test_render.py PSNR checks)
        isettings = dataclasses.replace(
            self.settings,
            max_steps=cfg.infer_samples or self.settings.max_steps)
        stage_split = cfg.infer_stage_split
        stage2_budget = max(1024, int(budget * cfg.infer_stage2_frac)
                            // 1024 * 1024)
        self.stage2_budget = stage2_budget
        # stage-1 sample compaction (Config.infer_sample_frac): slots for
        # the march-masked points only; cap at the full lattice (at which
        # point compaction is a no-op but still exact)
        # stage-1 lattice size: the renderer clamps the split to S, so a
        # configured split beyond infer_samples must not inflate the cap
        sp_cap = budget * max(1, min(stage_split, isettings.max_steps))
        sample_budget = 0
        if cfg.infer_sample_frac > 0 and stage_split > 0:
            sample_budget = getattr(self, "_sample_override", None) or max(
                gran, int(sp_cap * cfg.infer_sample_frac) // gran * gran)
            sample_budget = min(sample_budget, sp_cap)
        self.sample_budget = sample_budget
        self._sample_cap = sp_cap
        # post-march field-eval budget (Config.infer_eval_frac): blocks with
        # zero occupied march samples compose to exactly background, so the
        # field eval runs only on blocks with >= 1 real sample — the window
        # analysis's z-slab activity over-admits ~2.6x on a trained crust
        # (renderer.render_rays_compact_blocks docstring); overflow is
        # caught by the n_real escape below and rebuilds like the ray budget
        eval_budget = 0
        if cfg.infer_eval_frac > 0:
            eval_budget = getattr(self, "_eval_override", None) or max(
                gran, int(budget * cfg.infer_eval_frac) // gran * gran)
            eval_budget = min(eval_budget, budget)
        self.eval_budget = eval_budget
        bg = jnp.asarray(ds.bg_img.reshape(-1, 3))
        # multi-cascade scenes (bound > 1) fall back to the exhaustive
        # marcher with an explicit notice — the window/bitmask fast path
        # assumes cascade == 1 (reference marches any cascade,
        # raymarching.cu:42-54; every talking-head config uses bound <= 1)
        use_compact = self.settings.cascade == 1
        if not use_compact:
            print(f"[INFO] bound={cfg.bound} -> cascade="
                  f"{self.settings.cascade} > 1: serving through the "
                  "exhaustive marcher (render_rays) — slower, "
                  "sample-identical; the fast path needs cascade == 1")
        use_blocks = (use_compact and cfg.infer_block == 2 and ds.H % 2 == 0
                      and ds.W % 2 == 0 and budget % 4 == 0)
        if not use_blocks:
            # the re-compaction lives in the block renderer only; the n_real
            # escape is inert on other paths (n_real reads 0)
            eval_budget = self.eval_budget = 0
        # adaptive K2 + block-march envelope step-down, shared with
        # cli.run_test (ops.march2.resolve_march_plan) so serving and
        # --test always choose the same marcher for a given geometry
        from ..ops.march2 import resolve_march_plan

        # measure="block"/"ray": K2 sized from the trajectory's actual max
        # window (exact — serving renders only ds.poses against the frozen
        # grid), not the geometric band bound; the n_winmax escape below
        # catches anything that still exceeds it (march2.py docstring)
        k2, march_group, march_variant = resolve_march_plan(
            isettings, self.tables.z_lo, self.tables.z_hi,
            ds.poses, ds.intrinsics, ds.H, ds.W,
            k2_override=(getattr(self, "_k2_override", None)
                         or cfg.infer_window_candidates),
            march_group=cfg.infer_march_group if use_blocks else 1,
            march_variant=cfg.infer_march_variant,
            measure=(("block" if use_blocks else "ray")
                     if use_compact else None))
        self.k2 = k2
        from ..ops.march2 import ensure_variant_tables, needed_variant_tables

        # occupancy-true pre-march activity (Config.infer_march_prepass):
        # group-2 block path only — the prepass envelope is the block-
        # shared one; n_active then reports the prepass admission and the
        # existing budget escape adapts to it
        use_prepass = (use_blocks and march_group == 2
                       and cfg.infer_march_prepass)
        self.tables = ensure_variant_tables(
            self.tables, self.occ.occ,
            needed_variant_tables(march_group, march_variant,
                                  prepass=use_prepass))
        # SHORT/LONG bucket march plan (Config.infer_march_bucket):
        # measured once per (model, K2) over the dataset trajectory; the
        # short budget is carved from the total, shorts overflowing it
        # spill to the long bucket (bit-exact), and long-bucket overflow
        # rebuilds via the n_long escape in the run loop
        march_bucket = None
        if use_prepass and cfg.infer_march_bucket:
            plan = getattr(self, "_bucket_plan", None)
            if plan is None or plan[0] != k2:
                from ..ops.march2 import measure_bucket_plan

                k2s_m, ns_m, nl_m, _ = measure_bucket_plan(
                    isettings, self.tables.z_lo, self.tables.z_hi,
                    self.tables.col_dilwords, ds.poses, ds.intrinsics,
                    ds.H, ds.W, k2)
                plan = (k2, k2s_m, ns_m, nl_m)
                self._bucket_plan = plan
            _, k2s_m, ns_m, nl_m = plan
            if k2s_m:
                from ..ops.march2 import bucket_short_budget

                bs = bucket_short_budget(ns_m, budget, gran)
                if bs:
                    march_bucket = (k2s_m, bs)
        self._bucket = march_bucket
        self.long_budget = budget - march_bucket[1] if march_bucket else 0
        # observability: the resolved serving march plan (group, variant,
        # prepass) — consumed by the multichip dryrun's production-path
        # assertion and handy in bug reports
        self.march_plan = (march_group, march_variant, use_prepass)
        field = self.field
        torso = self.torso
        if torso is not None:
            from ..render import build_torso_plan, run_torso_compact
            from ..utils.rays import get_bg_coords

            bg_coords = get_bg_coords(ds.H, ds.W)[0]
            # the torso mask is frame-invariant while serving (static grid,
            # static screen coords): precompute the active-pixel plan once
            torso_plan = build_torso_plan(self.settings, self.occ, bg_coords)

        # smooth_lips EMA (reference renderer.py:456-460), fused into the
        # frame program; `infer_chunk` frames render per dispatch via
        # lax.scan (the tunnel charges ~12 ms per dispatch+sync — PERF.md)
        lam = 0.35 if cfg.smooth_lips else 0.0

        def smooth_enc(auds, prev_enc, has_prev, params):
            """Audio encode + smooth-lips EMA step (the ONLY cross-frame
            dependency in the frame program — reference renderer.py:456-460)."""
            enc_new = field.apply(params, auds, method="encode_audio")
            if lam:
                return jnp.where(has_prev > 0,
                                 lam * prev_enc + (1 - lam) * enc_new,
                                 enc_new)
            return enc_new

        def render_frame(params, packed, tables, occ, pose, enc_a, eye,
                         index, torso_params, torso_packed, fmt):
            rays = get_rays(pose[None], ds.intrinsics, ds.H, ds.W, N=-1)
            ray_o_origin = rays["rays_o"][0][0]
            rays_d = rays["rays_d"][0]
            if cfg.train_camera and "camera_dT" in params["params"]:
                # apply the learned per-frame pose refinement exactly as
                # the train step and run_test do (train/trainer.py)
                from ..utils.pose import euler_angles_to_matrix

                dT = params["params"]["camera_dT"][index]
                dR = euler_angles_to_matrix(
                    params["params"]["camera_dR"][index] / 180.0 * jnp.pi
                    + 1e-8)
                ray_o_origin = ray_o_origin + dT
                rays_d = rays_d @ dR
            c = (params["params"]["individual_codes"][0]
                 if cfg.ind_dim > 0 else None)

            if cfg.fused_field != 0:
                from ..models.nerf import make_fused_apply

                apply_packed = make_fused_apply(
                    field, packed, use_kernel=cfg.fused_field == 2)
            else:
                def apply_packed(p, *a, **kw):
                    return field.apply(p, *a, packed=packed, **kw)

            frame_bg = bg
            if torso is not None:
                ct = (torso_params["params"]["individual_codes_torso"][0]
                      if cfg.ind_dim_torso > 0 else None)

                def torso_apply(p, *a, **kw):
                    return torso.apply(p, *a, packed=torso_packed, **kw)

                frame_bg = run_torso_compact(torso_apply, torso_params,
                                             torso_plan, pose, ct, bg)

            if use_blocks:
                from ..render import render_rays_compact_blocks

                out = render_rays_compact_blocks(
                    apply_packed, params, isettings, occ,
                    ray_o_origin, rays_d, ds.H, ds.W,
                    enc_a, c, eye, frame_bg, budget=budget,
                    window_candidates=k2, tables=tables,
                    stage_split=stage_split, stage2_budget=stage2_budget,
                    march_group=march_group, sample_budget=sample_budget,
                    march_variant=march_variant, eval_budget=eval_budget,
                    march_prepass=use_prepass, march_bucket=march_bucket)
            elif use_compact:
                out = render_rays_compact(
                    apply_packed, params, isettings, occ,
                    jnp.broadcast_to(ray_o_origin, rays_d.shape), rays_d,
                    enc_a, c, eye,
                    frame_bg, budget=budget, window_candidates=k2,
                    tables=tables, minimal=True,
                    stage_split=stage_split, stage2_budget=stage2_budget,
                    sample_budget=sample_budget)
            else:
                from ..render import render_rays

                out = render_rays(
                    apply_packed, params, isettings, occ,
                    jnp.broadcast_to(ray_o_origin, rays_d.shape), rays_d,
                    enc_a, c, eye, frame_bg, compute_uncertainty=False)
                out = {**out, "n_active": jnp.int32(0)}
            img = jnp.clip(out["image"].reshape(ds.H, ds.W, 3), 0, 1)
            if fmt == "yuv420p":
                from ..utils import rgb_to_yuv420

                buf = rgb_to_yuv420(img)
            else:
                buf = (img * 255).astype(jnp.uint8).reshape(-1)
            return (buf, out["n_active"], out.get("n_stage2", 0),
                    out.get("n_spts", 0), out.get("n_winmax", 0),
                    out.get("n_real", 0), out.get("n_long", 0))

        def make_render(fmt: str):
            @jax.jit
            def render_chunk(params, packed, tables, occ, poses, auds_c,
                             prev_enc, has_prev, eyes_c, idxs_c, valid_c,
                             torso_params, torso_packed):
                def body(carry, inp):
                    prev_enc, has_prev = carry
                    pose, auds, eye, idx, valid = inp
                    enc_a = smooth_enc(auds, prev_enc, has_prev, params)
                    buf, n_act, n_s2, n_sp, n_wm, n_rl, n_lg = render_frame(
                        params, packed, tables, occ, pose, enc_a, eye, idx,
                        torso_params, torso_packed, fmt)
                    # padded tail slots (valid == 0) must NOT advance the
                    # carried smooth-lips EMA: the padding repeats the last
                    # real frame only to fill the static chunk shape, and
                    # letting it step the EMA made the carried state depend
                    # on the chunk size (round-2 review, weak item 6)
                    carry_enc = jnp.where(valid > 0, enc_a, prev_enc)
                    carry_has = jnp.maximum(has_prev, valid)
                    return (carry_enc, carry_has), (buf, n_act, n_s2, n_sp,
                                                    n_wm, n_rl, n_lg)

                (enc_final, _), (bufs, n_acts, n_s2s, n_sps, n_wms,
                                 n_rls, n_lgs) = jax.lax.scan(
                    body, (prev_enc, has_prev),
                    (poses, auds_c, eyes_c, idxs_c, valid_c))
                return (bufs, n_acts, jnp.max(n_s2s), jnp.max(n_sps),
                        jnp.max(n_wms), jnp.max(n_rls), jnp.max(n_lgs),
                        enc_final)

            return render_chunk

        def make_render_dp(fmt: str, n_dev: int):
            """Frame-parallel chunk program (Config.infer_data_parallel):
            the smooth-lips EMA chain — the only cross-frame dependency —
            is precomputed by a serial scan over the (tiny) audio encoder,
            then shard_map fans the chunk's frames over a 1-D mesh, each
            device rendering chunk/N whole frames with zero collectives in
            the render body. Bitwise-identical frames to the serial chunk
            program (tests/test_serving.py)."""
            from jax.experimental.shard_map import shard_map
            from jax.sharding import PartitionSpec as P

            from ..parallel.mesh import make_mesh

            mesh = make_mesh("dp", jax.devices()[:n_dev])

            @jax.jit
            def render_chunk(params, packed, tables, occ, poses, auds_c,
                             prev_enc, has_prev, eyes_c, idxs_c, valid_c,
                             torso_params, torso_packed):
                # serial (but negligible) part: encode + EMA for all frames
                def ema_body(carry, inp):
                    prev_enc, has_prev = carry
                    auds, valid = inp
                    enc_a = smooth_enc(auds, prev_enc, has_prev, params)
                    carry_enc = jnp.where(valid > 0, enc_a, prev_enc)
                    carry_has = jnp.maximum(has_prev, valid)
                    return (carry_enc, carry_has), enc_a

                (enc_final, _), enc_all = jax.lax.scan(
                    ema_body, (prev_enc, has_prev), (auds_c, valid_c))

                # parallel part: every device renders chunk/N whole frames
                def shard_fn(params, packed, tables, occ, torso_params,
                             torso_packed, poses_s, enc_s, eyes_s, idxs_s):
                    def body(carry, inp):
                        pose, enc_a, eye, idx = inp
                        (buf, n_act, n_s2, n_sp, n_wm, n_rl,
                         n_lg) = render_frame(
                            params, packed, tables, occ, pose, enc_a, eye,
                            idx, torso_params, torso_packed, fmt)
                        return carry, (buf, n_act, n_s2, n_sp, n_wm, n_rl,
                                       n_lg)

                    _, outs = jax.lax.scan(
                        body, 0, (poses_s, enc_s, eyes_s, idxs_s))
                    return outs

                rep = (P(),) * 6
                (bufs, n_acts, n_s2s, n_sps, n_wms, n_rls,
                 n_lgs) = shard_map(
                    shard_fn, mesh=mesh,
                    in_specs=rep + (P("dp"), P("dp"), P("dp"), P("dp")),
                    out_specs=(P("dp"),) * 7,
                    check_rep=False,
                )(params, packed, tables, occ, torso_params, torso_packed,
                  poses, enc_all, eyes_c, idxs_c)
                return (bufs, n_acts, jnp.max(n_s2s), jnp.max(n_sps),
                        jnp.max(n_wms), jnp.max(n_rls), jnp.max(n_lgs),
                        enc_final)

            return render_chunk

        self._render_cache = {}
        n_dp = int(getattr(cfg, "infer_data_parallel", 0) or 0)
        if n_dp >= 2:
            n_dp = min(n_dp, jax.device_count())
        if n_dp >= 2:
            # the frame-invariant model state must live ON the mesh
            # (replicated): arrays committed to device 0 alone are
            # incompatible with the shard_map program
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ..parallel.mesh import make_mesh

            rep = NamedSharding(make_mesh("dp", jax.devices()[:n_dp]), P())
            (self.infer_params, self.packed, self.tables, self.occ,
             self.torso_params, self.torso_packed) = jax.device_put(
                (self.infer_params, self.packed, self.tables, self.occ,
                 self.torso_params, self.torso_packed), rep)
            self._make_render = lambda fmt: make_render_dp(fmt, n_dp)
            # the chunk must split evenly over the mesh
            self._chunk_multiple = n_dp
        else:
            self._make_render = make_render
            self._chunk_multiple = 1

    def _get_render(self, fmt: str):
        if fmt not in self._render_cache:
            self._render_cache[fmt] = self._make_render(fmt)
        return self._render_cache[fmt]

    # -- audio ---------------------------------------------------------------

    def set_audio_features(self, feats: np.ndarray) -> int:
        """Inject novel audio features directly (reference
        provider_for_inference.init_aud_features / audFromNdarray mode).
        Returns the number of video frames they drive."""
        assert self._built, "load_model first"
        self.ds.aud_features = np.asarray(feats, np.float32)
        self.ds.aud_offset = 0
        self.enc_a_smooth = None
        return len(self.ds.aud_features)

    # -- streaming loop ------------------------------------------------------

    def run(self, sink: Optional[FrameSink] = None,
            max_frames: Optional[int] = None,
            on_frame: Optional[Callable[[int, np.ndarray], None]] = None,
            profile: bool = False,
            start: int = 0, close_sink: bool = True):
        """Render all frames driven by the current audio features, pushing
        rgb24 bytes into `sink` (reference do_inference -> test_with_2).
        Returns (num_frames, wall_seconds). profile=True prints per-phase
        wall-time accumulators every 100 frames (the reference's t4/t6/t7
        counters, renderer.py:199-208,409-414).

        start/close_sink are the incremental hooks run_live builds on:
        frames [start, max_frames) render with the chunk lattice anchored
        at `start`, and the sink is left open for the next segment."""
        import jax
        import jax.numpy as jnp

        from ..utils.profiling import PhaseAccumulator

        acc = PhaseAccumulator() if profile else None
        assert self._built, "load_model first"
        sink = sink or NullSink()
        ds, cfg = self.ds, self.cfg
        # absolute frame count: a live-trimmed feature buffer carries its
        # start index in ds.aud_offset (provider.audio_window)
        n = (ds.aud_offset + len(ds.aud_features)
             if ds.aud_features is not None else 2 * ds.num_frames)
        if max_frames is not None:
            n = min(n, max_frames)

        t0 = time.time()
        # depth-3 pipeline with async host copies: the tunnel's device->host
        # round trip (~60 ms on the remote v5e) rides under ~2 frames of
        # device compute; frames still reach the sink strictly in order
        from collections import deque

        queue: deque = deque()

        def consume():
            (base, count, bufs_dev, acts_dev, s2_dev, sp_dev,
             wm_dev, chunk_k2, rl_dev, chunk_eb, lg_dev, chunk_lb,
             chunk_bucket) = queue.popleft()
            bufs = np.asarray(bufs_dev)
            acts = np.asarray(acts_dev)
            if chunk_bucket and int(lg_dev) > chunk_lb:
                # LONG-BUCKET escape: long blocks beyond (budget - short
                # budget) rendered as background this chunk. The short
                # budget is fixed by the measured plan, so growing the
                # TOTAL budget grows the long side — reuse the ray-budget
                # rebuild machinery with bs + 1.25x the observed demand
                gran_l = self._budget_gran
                want_t = min(max(gran_l, ds.H * ds.W // gran_l * gran_l),
                             chunk_bucket[1]
                             + max(gran_l,
                                   -(-int(int(lg_dev) * 1.25) // gran_l)
                                   * gran_l))
                if want_t > self.budget:
                    print(f"[WARN] chunk at frame {base}: {int(lg_dev)} "
                          f"long-bucket rays exceed the long budget "
                          f"{chunk_lb}; rebuilding with total budget "
                          f"{want_t} at the next chunk boundary")
                    self._pending_budget = max(self._pending_budget or 0,
                                               want_t)
                elif not self._long_warned:
                    # total budget already at the frame cap: nothing to
                    # grow — say so instead of dropping long blocks to
                    # background silently forever (mirror of the
                    # saturated-ray-budget warning below)
                    print(f"[WARN] chunk at frame {base}: {int(lg_dev)} "
                          f"long-bucket rays exceed the long budget "
                          f"{chunk_lb} with the total budget at the frame "
                          f"cap; overflow rendered as background")
                    self._long_warned = True
            if int(wm_dev) > chunk_k2:
                # WINDOW-TRUNCATION ESCAPE: a frame needed more march
                # candidates than K2 — those rays lost their far-side
                # samples (the silent −11 dB class of the round-3 K2 find,
                # ops/march2.py). Rebuild with the observed demand + margin
                # at the next chunk boundary, overriding even an explicit
                # infer_window_candidates (quality first; the reference's
                # alive-ray marcher never truncates, renderer.py:503-548).
                want_k2 = int(wm_dev) + 4
                want_k2 += want_k2 % 2
                if want_k2 > max(self.k2, self._pending_k2 or 0):
                    print(f"[WARN] chunk at frame {base}: a window needs "
                          f"{int(wm_dev)} march candidates > K2={chunk_k2} "
                          f"(truncated rays lose far-side samples); "
                          f"rebuilding with K2={want_k2} at the next chunk "
                          f"boundary")
                    self._pending_k2 = want_k2
                else:
                    # a later chunk already triggered (or completed) the
                    # rebuild; this earlier-compiled chunk still STREAMED
                    # truncated frames — say so instead of passing silently
                    print(f"[WARN] chunk at frame {base}: {count} frame(s) "
                          f"streamed truncated (compiled at K2={chunk_k2}, "
                          f"needed {int(wm_dev)}) before the K2 rebuild "
                          f"takes effect")
            if (not self._s2_warned
                    and int(s2_dev) > self.stage2_budget):
                print(f"[WARN] chunk at frame {base}: {int(s2_dev)} stage-2 "
                      f"survivors exceed budget {self.stage2_budget}; "
                      f"overflow rays truncate at the split (raise "
                      f"infer_stage2_frac)")
                self._s2_warned = True
            if self.sample_budget and int(sp_dev) > self.sample_budget:
                # stage-1 sample-compaction overflow: marched points beyond
                # the slots were skipped (rendered as empty space) — rebuild
                # with ~1.25x the observed demand, like the ray budget below
                gran_s = self._budget_gran
                want_s = min(self._sample_cap,
                             max(gran_s,
                                 -(-int(int(sp_dev) * 1.25) // gran_s)
                                 * gran_s))
                if want_s > self.sample_budget:
                    print(f"[WARN] chunk at frame {base}: {int(sp_dev)} "
                          f"marched stage-1 points exceed the sample "
                          f"budget {self.sample_budget}; rebuilding with "
                          f"{want_s} at the next chunk boundary")
                    self._pending_sample = max(self._pending_sample or 0,
                                               want_s)
            if chunk_eb and int(rl_dev) > chunk_eb:
                # eval-budget escape: blocks beyond the eval budget rendered
                # as background this chunk — rebuild with ~1.25x the
                # observed real-block demand (compare against the budget
                # the chunk was COMPILED with, like the K2 escape above)
                gran_e = self._budget_gran
                want_e = min(self.budget,
                             max(gran_e,
                                 -(-int(int(rl_dev) * 1.25) // gran_e)
                                 * gran_e))
                if want_e > self.eval_budget:
                    print(f"[WARN] chunk at frame {base}: {int(rl_dev)} "
                          f"real-sample rays exceed eval budget "
                          f"{chunk_eb}; rebuilding with {want_e} at the "
                          f"next chunk boundary")
                    self._pending_eval = max(self._pending_eval or 0,
                                             want_e)
            max_act = int(acts[:count].max()) if count else 0
            gran = self._budget_gran
            frame_cap = max(gran, ds.H * ds.W // gran * gran)
            if max_act > self.budget and self.budget < frame_cap:
                # ADAPTIVE BUDGET (round-2 review item 6): a model whose
                # silhouette outgrows the initial budget must not clip rays
                # to background for the rest of the session — rebuild the
                # render program with ~1.25x the observed demand at the
                # next chunk boundary (compile once per budget value, then
                # cached; frames already queued keep streaming meanwhile)
                # ceil to granularity: budget is itself a gran multiple, so
                # max_act > budget guarantees want > budget and the rebuild
                # (and its warning) always fires — rounding DOWN left a band
                # budget < max_act < 0.8*(budget+gran) that never rebuilt
                # and, with the frame_cap gate below, never even warned
                want = min(frame_cap,
                           max(gran, -(-int(max_act * 1.25) // gran) * gran))
                if want > self.budget:
                    print(f"[WARN] frame {base}: {max_act} active rays "
                          f"exceed budget {self.budget}; rebuilding the "
                          f"render program with budget {want} at the next "
                          f"chunk boundary")
                    # max(): a later, smaller overflow must not shrink an
                    # already-pending rebuild target (mirrors the sample
                    # path above) — otherwise the first rebuild can come up
                    # short and force a second recompile plus another
                    # background-clipped chunk
                    self._pending_budget = max(self._pending_budget or 0,
                                               want)
            for j in range(count):
                # only-once gate applies only when the warning actually
                # prints: overflow during adaptive growth (budget <
                # frame_cap) already logs the rebuild notice above, and
                # consuming the flag there would permanently silence this
                # saturated-budget warning afterwards
                if (not self._overflow_warned and self.budget >= frame_cap
                        and int(acts[j]) > self.budget):
                    print(f"[WARN] frame {base + j}: {int(acts[j])} "
                          f"active rays exceed the whole-frame budget "
                          f"{self.budget}; overflow rendered as "
                          f"background")
                    self._overflow_warned = True
                sink.push(bufs[j].tobytes())
                if on_frame:
                    on_frame(base + j, bufs[j])

        from contextlib import nullcontext

        import jax.numpy as jnp  # noqa: F811 (explicit for clarity)

        ph = acc.phase if acc else (lambda name: nullcontext())
        # sink pixel format: yuv420p halves the device->host bytes (the
        # encoder wants 4:2:0 anyway); rgb24 for raw/callback consumers
        fmt = getattr(sink, "pix_fmt", "rgb24")
        if fmt == "yuv420p" and (ds.H % 2 or ds.W % 2):
            # 4:2:0 needs even dimensions. The SINK must follow too: it
            # declared yuv420p to ffmpeg and sizes frames at H*W*3/2 — a
            # one-sided fallback pushes H*W*3 rgb24 bytes into a pipe
            # expecting half that (FramePump rejects; bare ffmpeg scrambles)
            fmt = "rgb24"
            # walk wrapper sinks (FilteredSink.inner) so the ffmpeg-facing
            # sink flips too — today FilteredSink's constructor already
            # requires an rgb24 inner (streaming.py), so this loop only
            # ever touches one level, but a future wrapper must not be
            # left declaring yuv420p to ffmpeg while receiving rgb24
            s = sink
            while s is not None:
                if hasattr(s, "pix_fmt"):
                    if getattr(s, "proc", None) is not None:
                        raise RuntimeError(
                            f"sink already opened as yuv420p but frame "
                            f"size {ds.W}x{ds.H} is odd — construct the "
                            "sink with pix_fmt='rgb24'")
                    s.pix_fmt = "rgb24"
                s = getattr(s, "inner", None)
        render = self._get_render(fmt)

        C = self._chunk_size()
        prev_enc = (self.enc_a_smooth if self.enc_a_smooth is not None
                    else jnp.zeros((1, 32)))  # audio_dim after AudioNet
        has_prev = jnp.float32(0.0 if self.enc_a_smooth is None else 1.0)

        def frame_inputs(i):
            fi = ds.mirror_index(i)
            if cfg.exp_eye and cfg.fix_eye >= 0:
                eye = [cfg.fix_eye]
            else:
                eye = [ds.eye_area[fi] if cfg.exp_eye else 0.0]
            return ds.poses[fi], ds.audio_window(i), eye, fi

        try:
            for base in range(start, n, C):
                if (self._pending_budget or self._pending_sample
                        or self._pending_k2 or self._pending_eval):
                    if ((self._pending_budget or 0) > self.budget
                            or (self._pending_sample or 0)
                            > self.sample_budget
                            or (self._pending_k2 or 0) > self.k2
                            or (self._pending_eval or 0)
                            > self.eval_budget):
                        # adaptive rebuild at the chunk boundary: drain the
                        # queued chunks (their program is being replaced),
                        # then recompile with the larger budget(s) — once
                        # per value, persistent-cache-backed
                        while queue:
                            consume()
                        if (self._pending_budget or 0) > self.budget:
                            self._budget_override = self._pending_budget
                        if (self._pending_sample or 0) > self.sample_budget:
                            self._sample_override = self._pending_sample
                        if (self._pending_k2 or 0) > self.k2:
                            self._k2_override = self._pending_k2
                        if (self._pending_eval or 0) > self.eval_budget:
                            self._eval_override = self._pending_eval
                        self._compile_render()
                        render = self._get_render(fmt)
                    self._pending_budget = self._pending_sample = None
                    self._pending_k2 = self._pending_eval = None
                count = min(C, n - base)
                # pad the tail chunk by repeating its last frame; padded
                # slots carry valid=0 so they render (static chunk shape)
                # but do not advance the smooth-lips EMA — the streamed
                # frames are chunk-size invariant (tests/test_serving.py)
                idxs = [base + min(j, count - 1) for j in range(C)]
                with ph("stack-inputs"):
                    ins = [frame_inputs(i) for i in idxs]
                    poses = jnp.asarray(np.stack([p for p, _, _, _ in ins]))
                    auds_c = jnp.asarray(
                        np.stack([a for _, a, _, _ in ins]), jnp.float32)
                    eyes_c = jnp.asarray([e for _, _, e, _ in ins],
                                         jnp.float32)
                    idxs_c = jnp.asarray([fi for _, _, _, fi in ins],
                                         jnp.int32)
                    valid_c = jnp.asarray([1.0 if j < count else 0.0
                                           for j in range(C)], jnp.float32)
                with ph("dispatch"):
                    (bufs, n_acts, n_s2, n_sp, n_wm, n_rl, n_lg,
                     prev_enc) = render(
                        self.infer_params, self.packed, self.tables,
                        self.occ, poses, auds_c, prev_enc, has_prev,
                        eyes_c, idxs_c, valid_c, self.torso_params,
                        self.torso_packed)
                    has_prev = jnp.float32(1.0)
                    if hasattr(bufs, "copy_to_host_async"):
                        bufs.copy_to_host_async()
                # carry the K2 this chunk's program was COMPILED with: a
                # rebuild between enqueue and consume raises self.k2, and
                # comparing wm against the new value would let a chunk that
                # rendered truncated under the old K2 pass silently
                # (round-3 advisor finding)
                queue.append((base, count, bufs, n_acts, n_s2, n_sp, n_wm,
                              self.k2, n_rl, self.eval_budget, n_lg,
                              self.long_budget, self._bucket))
                if len(queue) >= 2:
                    with ph("fetch+sink"):
                        consume()
                if acc and base and (base // C) % 25 == 0:
                    print(f"[profile] frame {base}: {acc.report()}")
            while queue:
                consume()
        except BaseException:
            # the sink must not outlive a failed run: an abandoned ffmpeg
            # leaks its pump fd and leaves an 'event' playlist without
            # EXT-X-ENDLIST that players stall on forever. run_live owns
            # the sink when close_sink=False and closes it in ITS handler.
            if close_sink:
                try:
                    sink.close()
                except Exception:
                    pass
            raise
        self.enc_a_smooth = prev_enc if cfg.smooth_lips else None
        dt = time.time() - t0
        if close_sink:
            sink.close()
        if acc:
            print(f"[profile] total {n - start} frames, {dt:.2f}s: "
                  f"{acc.report()}")
        return n - start, dt

    def _chunk_size(self) -> int:
        """The render chunk size: infer_chunk rounded up to the
        frame-parallel mesh multiple. ONE definition — run() and run_live()
        must agree or run_live's mid-stream segments leave the chunk
        lattice and void its bit-identical-to-offline guarantee."""
        mult = getattr(self, "_chunk_multiple", 1)
        C = max(1, self.cfg.infer_chunk)
        return ((C + mult - 1) // mult) * mult

    def run_live(self, feature_stream, sink: Optional[FrameSink] = None,
                 on_frame: Optional[Callable[[int, np.ndarray], None]] = None):
        """LIVE serving loop: consume audio features as they arrive
        (mic/ASR chunks — the TPU counterpart of the reference's streaming
        ASR render loop, asr.py:185-250) and render incrementally.

        `feature_stream` yields [k, ...] arrays of per-video-frame features
        (any k >= 1; e.g. each StreamingASR step's new frames, or
        HubertFeatureExtractor outputs of a live call). A frame is rendered
        as soon as its attention window's RIGHT context is buffered
        (att mode 2 looks 3 frames ahead -> ~120 ms of audio lookahead at
        25 fps, matching the reference's r-context delay); the stream tail
        is flushed with the same end-of-sequence zero padding as the
        offline path, so the emitted frames are BIT-IDENTICAL to a single
        run() over the concatenated features
        (tests/test_serving.py::test_run_live_matches_offline).

        The smooth-lips EMA carries across segments through the same
        enc_a_smooth state run() uses, and the chunk lattice stays anchored
        at frame 0, so drip sizes never change the output. Features are
        managed internally — do NOT call set_audio_features around this
        (it would reset the carried EMA). Returns (frames, wall_seconds)."""
        assert self._built, "load_model first"
        cfg = self.cfg
        sink = sink or NullSink()
        # a live stream is a fresh utterance: drop any EMA carried from a
        # previous run()/run_live on this session, exactly like
        # set_audio_features does for an offline upload — otherwise the
        # first frames would be smoothed against the PREVIOUS stream's
        # audio and diverge from the offline oracle
        self.enc_a_smooth = None
        # right context of the attention window (utils/audio.py offsets)
        lookahead = 3 if cfg.att == 2 else 0
        lookbehind = 8   # widest left reach across att modes 1/2
        C = self._chunk_size()
        buf = None
        offset = 0       # absolute frame index of buf[0] (buffer trimming)
        next_i = 0
        t0 = time.time()

        def set_window(b, off):
            self.ds.aud_features = b
            self.ds.aud_offset = off

        try:
            for feats in feature_stream:
                feats = np.asarray(feats, np.float32)
                if len(feats) == 0:
                    continue
                buf = (feats if buf is None
                       else np.concatenate([buf, feats], 0))
                set_window(buf, offset)
                ready = offset + len(buf) - lookahead
                if ready - next_i >= C:
                    # whole chunks only: keeps the chunk lattice aligned
                    # with the offline run()'s [0,C),[C,2C),... so no tail
                    # padding (and no EMA mask interplay) mid-stream
                    end = next_i + ((ready - next_i) // C) * C
                    self.run(sink, start=next_i, max_frames=end,
                             close_sink=False, on_frame=on_frame)
                    next_i = end
                # bound the buffer for hours-long sessions: frames below
                # next_i - lookbehind can never be windowed again; trim in
                # 1024-frame strides so the copy amortizes (stride is an
                # attribute only so the trim path is testable at toy sizes)
                keep_from = max(0, next_i - lookbehind)
                if keep_from - offset >= getattr(
                        self, "_live_trim_stride", 1024):
                    buf = buf[keep_from - offset:]
                    offset = keep_from
            total = offset + (len(buf) if buf is not None else 0)
            if buf is not None and next_i < total:
                # stream over: the lookahead frames render with the real
                # end-of-sequence zero padding, exactly like offline
                set_window(buf, offset)
                self.run(sink, start=next_i, max_frames=total,
                         close_sink=False, on_frame=on_frame)
                next_i = total
        finally:
            # restore absolute indexing for any subsequent offline use,
            # and ALWAYS close the sink — an abandoned ffmpeg subprocess
            # leaks its pump fd and leaves an 'event' playlist without
            # EXT-X-ENDLIST that players stall on (streaming.py)
            self.ds.aud_offset = 0
            sink.close()
        return next_i, time.time() - t0
