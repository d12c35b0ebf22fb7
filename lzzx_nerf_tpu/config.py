"""Single config dataclass for the whole framework.

Replaces both the reference's ~60-flag argparse block (train.py:18-141) and the
hard-coded serving dict (HubertInferenceMQ.py:25-96); one typed object is
consumed by the CLI, the trainer, the renderer, and the serving path alike.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import List, Optional, Tuple


@dataclass
class Config:
    # paths / workspace
    path: str = "data/obama"
    workspace: str = "workspace"
    seed: int = 0
    ckpt: str = "latest"
    head_ckpt: str = ""

    # mode
    test: bool = False
    test_train: bool = False
    save_mesh: bool = False
    mesh_resolution: int = 256
    mesh_threshold: float = 10.0
    data_range: Tuple[int, int] = (0, -1)

    # training schedule (reference train.py:28-44)
    iters: int = 200_000
    lr: float = 1e-2          # grid-table learning rate
    lr_net: float = 1e-3      # MLP learning rate
    num_rays: int = 4096 * 16
    max_steps: int = 16       # max samples kept per ray
    num_steps: int = 16
    upsample_steps: int = 0
    update_extra_interval: int = 16
    max_ray_batch: int = 4096
    warmup_step: int = 10_000

    # losses (reference train.py:47-51, TrainerUtil.py:188-367)
    amb_aud_loss: bool = True
    amb_eye_loss: bool = True
    unc_loss: bool = True
    lambda_amb: float = 1e-4

    # precision: on TPU we default to bf16 compute with fp32 params/compositing
    # (replaces the reference's fp16 AMP + GradScaler, train.py:54).
    fp16: bool = True

    # background / eyes
    bg_img: str = ""
    fbg: bool = False
    exp_eye: bool = True
    fix_eye: float = -1.0
    smooth_eye: bool = False

    torso_shrink: float = 0.8

    # dataset (reference train.py:67-83)
    color_space: str = "srgb"
    preload: int = 0
    bound: float = 1.0
    scale: float = 4.0
    offset: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    dt_gamma: float = 1.0 / 256
    min_near: float = 0.05
    density_thresh: float = 10.0
    density_thresh_torso: float = 0.01
    patch_size: int = 1

    init_lips: bool = False
    finetune_lips: bool = False
    # --finetune_lips without pretrained LPIPS weights is REFUSED unless
    # this is set: a 25k-iter lips run against the fixed-seed random
    # backbone (train/lpips.py fallback) is a silent quality divergence
    # from the reference's real LPIPS-alex (TrainerUtil.py:106-109);
    # export weights with scripts/export_lpips.py
    allow_rand_lpips: bool = False
    smooth_lips: bool = False
    # static lips-crop side for the finetune-lips LPIPS step (the reference
    # uses the variable lms rect padded to >=32; static shapes need a fixed
    # crop centred on the rect)
    lips_crop: int = 64

    torso: bool = False

    # audio (reference train.py:101-139)
    att: int = 2              # audio attention mode: 0 off, 1 left, 2 bi
    aud: str = ""
    emb: bool = False
    asr_model: str = "hubert"  # deepspeech(29) | esperanto(44) | hubert(1024)

    # individual codes
    ind_dim: int = 4
    ind_num: int = 10_000
    ind_dim_torso: int = 8

    amb_dim: int = 2
    part: bool = False
    part2: bool = False

    # camera
    train_camera: bool = False
    smooth_path: bool = False
    smooth_path_window: int = 7

    # live ASR (reference asr.py)
    asr: bool = False
    asr_wav: str = ""
    asr_play: bool = False
    asr_save_feats: bool = False
    fps: int = 50
    l: int = 10
    m: int = 50
    r: int = 10

    # serving
    gui: bool = False
    W: int = 450
    H: int = 450
    radius: float = 3.35
    fovy: float = 21.24
    max_spp: int = 1
    face_optimize: bool = False

    # field encoder: "dense" = TPU-flagship corner-packed triplane;
    # "hash" = reference-exact instant-ngp triplane (use for checkpoints
    # imported from the reference via utils/convert.py)
    encoder: str = "dense"

    # renderer internals (reference renderer.py:93-99)
    grid_size: int = 128
    density_scale: float = 1.0
    T_thresh: float = 1e-4

    # TPU-specific knobs (no reference equivalent)
    # training-ray compaction budget as a fraction of num_rays (0 = off):
    # rays whose columns hold no occupied cell skip the field entirely
    # (render_rays_train_compact — exact; the reference's CUDA marcher
    # spends zero compute on them too). Active rays beyond the budget are
    # excluded from that step's loss with the survivors upweighted to keep
    # it unbiased (n_active metric reports demand). 0.75 holds trained
    # quality on the oracle check while cutting ~25% of the field work
    # (0.5 measured 7.1 vs 5.0 it/s but overflowed on head-filling frames
    # and cost ~2 dB of convergence at 3k steps — raise only with
    # n_active headroom).
    train_budget_frac: float = 0.75
    # use the FULL path for the first N steps: before the density grid
    # refines, nearly every ray is active, the budget overflows, and the
    # overflow-drop variance measurably slows early convergence (3000-step
    # oracle: 39.4 vs 41.7 dB). After refinement n_active fits the budget
    # and the compact step is gradient-identical to the full one.
    train_compact_warmup: int = 1000
    # staged early-termination field eval in the compact step: samples
    # [0, split) for every slotted ray, [split, S) only for rays still
    # transmissive at the split, compacted into train_stage2_frac * budget
    # slots. GRADIENT-EXACT whenever the survivors fit (a post-termination
    # sample contributes zero value AND zero gradient, composite.py:61-71;
    # _staged_train_eval_composite docstring) — it skips that sample's
    # gathers, MLPs and its share of the table-gradient scatter-add
    # backward (~70 of the step's 153 ms, scripts/trainphase.py round 3).
    # MEASURED NEGATIVE RESULT, default OFF: despite 19-37% fewer field
    # samples the step is SLOWER — trainbench A/B at num_rays 65536:
    # 6.55 it/s single-pass vs 5.96 (split 8 / frac .625), 6.42 (split 8 /
    # frac .34, n_stage2 15969/16384), 6.27 (split 4 / frac .5) — the
    # mid-graph compaction barrier (cumsum + gather before the stage-2
    # eval, transposed scatter in backward) breaks XLA's fusion of the
    # eval chain, the same platform lesson as serving's stage-1 sample
    # compaction (PERF.md: 21.6 vs 32.9 FPS). Ray-level compaction pays
    # only BEFORE the eval chain starts (train_budget_frac); kept
    # parity-tested (tests/test_train.py::test_staged_train_step_matches_
    # compact) and opt-in for re-evaluation if the field ever widens.
    # n_stage2 reports survivor demand; overflow truncates at the split.
    train_stage_split: int = 0
    train_stage2_frac: float = 0.34
    # deprecated in favour of data_parallel/infer_data_parallel (which
    # build the 1-D 'data' mesh); kept so old opt.txt documents round-trip
    mesh_shape: Tuple[int, ...] = (1,)
    mesh_axis_names: Tuple[str, ...] = ("data",)
    data_parallel: int = 0    # >0: train over an N-device 'data' mesh
    ema_decay: float = 0.95
    ema_update_interval: int = 1000
    # evaluate/test/serve from the EMA weights (the reference's "best"
    # checkpoint saves EMA params and infers from them,
    # TrainerUtil.py:1262-1279)
    use_ema: bool = True
    # serving fast-path knobs (render_rays_compact): samples per ray and
    # window candidates at inference; 0 = inherit max_steps / auto-K2.
    # S=16 is REQUIRED for quality: the learned density crust is several
    # cells thick, and truncating to S=8 measured -16 dB on a trained model
    # (scripts/quality_check.py). Speed comes from the two-stage
    # early-termination eval (infer_stage_split) instead — the exact
    # analogue of the reference's alive-ray T-threshold termination.
    infer_samples: int = 16
    # window candidates per compacted ray. 0 (default) = ADAPTIVE: derived
    # at model load from the trained occupancy's longest column z-slab and
    # the camera obliquity (ops/march2.window_candidates_for_scene). K2
    # must scale with grid_size — a fixed 40 covered only 1.08 world units
    # at grid 128 and truncated the far side of the head (-11 dB on the
    # trained oracle, round-3 find); the reference's alive-ray marcher
    # never truncates.
    infer_window_candidates: int = 0
    # evaluate samples [0, split) for all rays, then samples [split, S) only
    # for rays still transmissive (T >= T_thresh) — mathematically identical
    # to the single pass when the stage-2 budget suffices. 0 disables.
    infer_stage_split: int = 8
    infer_stage2_frac: float = 0.375  # stage-2 ray budget / stage-1 budget
    # post-march field-eval RAY budget as a fraction of the window budget
    # (block path only; 0 = off). The window analysis activates any block
    # whose center ray crosses a nonempty column z-SLAB ([z_lo, z_hi] is
    # one interval per (x, y) column) — an over-approximation of "has >= 1
    # occupied march candidate": on the trained production crust it admits
    # ~2.6x more rays than geometrically hit occupied cells. Blocks whose
    # march found zero occupied samples compose to exactly background, so
    # re-compacting them out before the field eval (the dominant phase) is
    # BIT-EXACT while the real blocks fit the eval budget; an overflowing
    # chunk renders the excess as background once and rebuilds with the
    # observed demand at the next chunk boundary (n_real escape,
    # serving/session.py), like the ray budget. This is RAY-level
    # compaction (the round-1 platform fact: pays), unlike the rejected
    # sample-level infer_sample_frac.
    infer_eval_frac: float = 0.0
    # stage-1 SAMPLE compaction: evaluate only the march-masked points of
    # the first stage, in sample_frac * budget * stage_split slots (0 =
    # off, evaluate the full budget x stage_split lattice). The ray budget
    # necessarily over-allocates (overflow slack + rays whose windows hold
    # < stage_split occupied cells): on the bench head only 37.6% of the
    # 786k stage-1 point slots carry a marched sample, so the triplane
    # gather + MLP volume shrinks ~2x. EXACT while the masked points fit
    # the slots; an overflowing frame triggers the same adaptive rebuild
    # as the ray budget (serving/session.py run()). Stage 2 is already
    # ~92% dense after survivor compaction — not worth compacting.
    # MEASURED NEGATIVE (PERF.md round 3): 21.6 vs 32.9 FPS at 512² —
    # the compaction's cumsum/scatter barrier breaks XLA's fusion of the
    # march mask into the lookup/interp consumers; sample-level
    # compaction doesn't pay on this platform (ray-level does). Kept
    # opt-in + parity-tested.
    infer_sample_frac: float = 0.0
    # block-path march mode: 2 = block-shared EXACT 5x5-neighborhood
    # bitmask march (one row fetch per 2x2 block per candidate group — 4x
    # fewer march gather rows; sample-identical to per-candidate exact
    # marching for every portrait-camera geometry, |d_xy| <= 0.95;
    # default). 1 = per-ray EXACT 3x3-neighborhood march (any direction).
    # Negative = the dilated single-column mask with group=|value| — -2 is
    # the fast / −2 dB mode (dilated cells crowd the S budget:
    # quality_check variant F attributed the entire serving gap to it);
    # -3 measured slower than -2 (odd-factor repeat).
    infer_march_group: int = 2
    # group-2 block-march select variant (all sample-exact — they differ
    # only in VPU select cost, tests/test_march2.py): "wslice" = word-pair
    # pre-reduce + flat 50-way per-candidate select; "zband" = 7-cell
    # z-band funnel shift per neighbor + 25-way single-word select;
    # "zband4" = 4 z-bands packed per uint32 + 7-way select (~1/5 the
    # select math). Full-frame bench A/B (PERF.md round 3): wslice 32.89
    # / zband 30.37 / zband4 28.00 FPS — the amortized pre-reduce stages
    # cost more than the narrower per-candidate select saves; wslice
    # stays ahead of zband/zband4. "quad" = directional quadrant-anchored
    # fetch (march_rays_window_bitmask_nb_block_quad): the half-step
    # anchor makes the fetch-to-candidate drift one-sided, so a signed
    # 4x4 window (32-way select) replaces the 5x5 (50-way) with NO added
    # pre-reduce stage — the structural reason it wins where zband/zband4
    # lost. TPU A/B (back to back): quad 33.47 / wslice 32.37 FPS
    # torso-composited @512²; grid-128 guard +0.00 dB (PERF.md round 3).
    # "quadw" = quad with the word-pair selection BAKED INTO THE TABLE
    # (column_bitmasks_quadrant_words, indexed by (quadrant, x, y,
    # z-word)): the profiler showed quad's cost was the data MOVEMENT
    # around the [*, 64]-word fetch result (a physical transpose + copies
    # ~21% of the frame), not the select math; the z-word-indexed table
    # halves the fetched bytes and deletes the pre-reduce stage and its
    # intermediates. Sample-identical to quad (bit-for-bit tests), same
    # anchor, same envelope. TPU A/B (back to back): quadw 35.45 / quad
    # 30.70 FPS torso-composited @512² (PERF.md round 3). Envelope-gated:
    # resolve_march_plan falls back to nb5w beyond nb_blockq_drift_cells
    # (<=2 fwd, <=1 back). "nb5w" (default) = the SYMMETRIC 5x5
    # neighborhood with the word pair baked into the table
    # (column_bitmasks_neighborhood5_words, [H*H*W32, 50]): quadw's
    # 262144-row table sits past the TPU gather row-count cliff at grid
    # 128 (~95M vs ~400M rows/s, scripts/quadwgather.py) — nb5w keeps the
    # no-pre-reduce fetch inside the full-rate zone AND drops the
    # directional envelope gate (any-direction ±2 coverage, like wslice).
    # TPU A/B (same session back to back): nb5w 36.61 / quadw 35.45 /
    # quadwx 34.93 FPS torso-composited @512²; quality guard J −0.02 dB =
    # the serving baseline delta, i.e. the marcher itself adds nothing
    # (PERF.md round 3 session 2). "nb5wz"/"nb5wz4" (zband stages on the
    # nb5w fetch) measured 34.19/30.23 vs 36.49 same-session — rejected,
    # kept parity-tested opt-in.
    infer_march_variant: str = "nb5w"
    # pre-march occupancy-true block activity (ops/march2.prepass_block_
    # hits): the window analysis's z-slab test over-admits ~2.6x on a
    # trained crust (215k window-active vs 82k real rays @512² — PERF.md
    # Round 4); one dilated-occupancy bit test per (block, candidate
    # group) drops provably-dead blocks BEFORE the march, so the march/
    # window-compaction budget tracks real occupancy instead of slab
    # over-approximation. Bit-exact (conservative under the same ±2-cell
    # envelope the group-2 block march is gated on; tests/test_march2.py
    # prepass suite); applies to the group-2 block path only — other
    # march modes ignore it. The session's adaptive budget escape sizes
    # the ray budget from the prepass admission automatically.
    infer_march_prepass: bool = True
    # SHORT/LONG two-bucket march (requires the prepass; group-2 block
    # path only): after the prepass-span window tightening, half the
    # blocks need far fewer candidates than the global worst-case K2
    # (trained trajectory: span p50 = 32 vs K2 = 82) — marching them in a
    # second program at a trajectory-measured K2s cuts the dominant
    # select/fetch work (bench A/B: 24.85 -> 25.68 FPS @512² trained).
    # Bit-exact: the lattice shift is whole candidate groups, shorts that
    # overflow their budget SPILL to the long bucket, and long-bucket
    # overflow rebuilds via the n_long escape (tests/test_march2.py
    # bucket suite). The plan (K2s + budgets) is measured per model load
    # over the dataset trajectory (ops/march2.measure_bucket_plan);
    # bucketing auto-disables when the modeled saving is < 8%.
    infer_march_bucket: bool = True
    # frames per dispatch (lax.scan inside one jitted call): the remote
    # chip's tunnel charges ~12 ms of fixed overhead per dispatch+sync;
    # chunking divides it (the reference batches 32 frames per wave,
    # TrainerUtil.py:691-699, i.e. 1.28 s of batching latency — 8 frames
    # adds 320 ms). Adds chunk-1 frames of stream latency.
    infer_chunk: int = 8
    # frame-parallel serving over an N-device mesh (0/1 = single chip):
    # each dispatch shards its chunk's frames across the mesh via
    # shard_map — the audio-encoder EMA chain (the only cross-frame
    # dependency) is precomputed serially first (it is ~1e-5 of the frame
    # FLOPs), then every device renders chunk/N whole frames
    # independently: zero collectives in the hot path, near-linear
    # offline/batch throughput. The reference has no serving-parallel
    # equivalent (its DDP scaffolding is train-only and dormant,
    # TrainerUtil.py:79-81). infer_chunk is rounded up to a multiple of N.
    infer_data_parallel: int = 0
    # active-ray budget as a fraction of the frame. 0.375 (round 3): the
    # z-band-probed windows deactivate grazing/background rays the old
    # 2-probe analysis kept active (bench head: n_active 69,360 of 262,144
    # rays — 53% of the old 0.5 budget, and 25.2 -> 34.5 FPS @512² from
    # shrinking every per-slot phase); a frame that outgrows the budget
    # triggers the adaptive rebuild (serving/session.py run(): pending-
    # budget recompile at the next chunk boundary) instead of clipping,
    # so the tighter default is safe for larger identities.
    budget_frac: float = 0.375
    # bf16 prebaked triplane tables at inference: half the bytes keeps the
    # packed table VMEM-resident -> 3x gather rate on v5e (quality-guarded
    # by tests/test_render.py)
    infer_table_bf16: bool = True
    # 2 = analyse windows/compaction per 2x2 pixel block (4x less work in
    # that phase, measured -5 ms @512²; conservative superset of the
    # per-ray windows); 1 = per-ray
    infer_block: int = 2
    # inference field-MLP evaluation (ops/fused_field.py): -1/1 = the
    # folded-weight decomposition in XLA (per-frame constants folded into
    # weights, ambient/uncertainty dropped — measured fastest), 2 = the
    # fused Pallas kernel (same math; measured slower at these 64-wide
    # layers, kept for re-evaluation), 0 = plain flax apply. Training is
    # unaffected.
    fused_field: int = -1
    # epochs between eval passes; 0 = auto, the reference's
    # max(1, 5000/len(train)) formula (train.py:296)
    eval_interval: int = 0
    # frames evaluated per eval epoch: 0 = the FULL val split (reference
    # TrainerUtil.py:1107-1220 semantics); a small cap (the round-1/2 code
    # hardwired 4) is noisy enough to mask a lips-finetune regression
    eval_frames: int = 0
    max_keep_ckpt: int = 2

    @property
    def audio_in_dim(self) -> int:
        # reference network.py:108-115
        if "esperanto" in self.asr_model:
            return 44
        if "deepspeech" in self.asr_model:
            return 29
        if "hubert" in self.asr_model:
            return 1024
        return 32

    @property
    def cascade(self) -> int:
        # reference renderer.py:93
        import math

        return 1 + math.ceil(math.log2(max(self.bound, 1.0)))

    def aabb(self) -> Tuple[float, float, float, float, float, float]:
        # reference renderer.py:110 (train and infer aabbs are identical)
        b = self.bound
        return (-b, -b / 2, -b, b, b / 2, b)

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)

    def to_json(self, indent=2) -> str:
        return json.dumps(dataclasses.asdict(self), indent=indent)

    @staticmethod
    def from_json(s: str) -> "Config":
        d = json.loads(s)
        for k in ("data_range", "offset", "mesh_shape", "mesh_axis_names"):
            if k in d and isinstance(d[k], list):
                d[k] = tuple(d[k])
        return Config(**d)


def optimized_defaults(**kw) -> Config:
    """Equivalent of the reference's `-O` macro (train.py:143-145):
    mixed precision + explicit eye control."""
    base = dict(fp16=True, exp_eye=True)
    base.update(kw)
    return Config(**base)
