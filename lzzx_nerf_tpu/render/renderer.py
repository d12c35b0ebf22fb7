"""The render program: near/far → static march → field eval → composite → bg.

Replaces both reference paths with ONE jitted function:
- training branch run_cuda (nerf_triplane/renderer.py:185-304)
- inference alive-ray loop run_cuda_for_inference (renderer.py:406-570)

The reference splits them only because CUDA compaction makes training
(two-pass atomic) and inference (python while over alive rays) different
programs; the static-shape formulation (ops/march.py) removes the split.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..ops.composite import composite_rays
from ..ops.march import march_rays_uniform
from ..ops.march2 import (InferenceTables, build_inference_tables,
                          column_intervals, compact_rays,
                          default_window_candidates, march_rays_window,
                          march_rays_window_bitmask,
                          march_rays_window_bitmask_nb,
                          march_rays_window_bitmask_nb_block,
                          march_rays_window_bitmask_nb_block3,
                          prepass_block_hits, ray_windows)
from ..ops.ray import near_far_from_aabb
from .state import OccupancyState, RenderSettings


def render_rays(
    field_apply,
    params,
    settings: RenderSettings,
    state: OccupancyState,
    rays_o: jnp.ndarray,            # [N, 3]
    rays_d: jnp.ndarray,            # [N, 3]
    enc_a: jnp.ndarray,             # [1, audio_dim] (already audio-encoded)
    ind_code: Optional[jnp.ndarray],  # [ind_dim] or None
    eye: Optional[jnp.ndarray],     # [1] or None
    bg_color: jnp.ndarray,          # [N, 3] (possibly torso-composited)
    noise: Optional[jnp.ndarray] = None,  # [N] perturb in [0,1), train only
    training: bool = False,
    compute_uncertainty: bool = True,
) -> Dict[str, Any]:
    """Returns dict with image [N,3], depth, weights_sum, ambient_aud,
    ambient_eye, uncertainty [N], and (training) the raw sample set for the
    jitter regulariser (reference renderer.py:299-304)."""
    N = rays_o.shape[0]
    aabb = jnp.asarray(settings.aabb, jnp.float32)
    nears, fars = near_far_from_aabb(rays_o, rays_d, aabb, settings.min_near)
    nears = jax.lax.stop_gradient(nears)
    fars = jax.lax.stop_gradient(fars)

    m = march_rays_uniform(
        rays_o, rays_d, nears, fars, state.occ,
        settings.bound, settings.dt, settings.num_cand, settings.max_steps,
        noise=noise,
    )
    S = settings.max_steps
    pts = m.xyzs.reshape(N * S, 3)
    dirs = jnp.repeat(rays_d, S, axis=0)

    out = field_apply(params, pts, dirs, enc_a, ind_code, eye,
                      compute_uncertainty=compute_uncertainty)
    sigmas = (out.sigma * settings.density_scale).reshape(N, S)
    rgbs = out.color.reshape(N, S, 3)
    # composite receives |amb|.sum(-1) of the [N,1] channels, i.e. the values
    # themselves (reference renderer.py:295-296)
    amb_aud = jnp.abs(out.ambient_aud).reshape(N, S)
    amb_eye = jnp.abs(out.ambient_eye).reshape(N, S)
    unc = out.uncertainty.reshape(N, S)

    comp = composite_rays(
        sigmas, rgbs, amb_aud, amb_eye, unc,
        m.deltas, m.ts, m.mask, T_thresh=settings.T_thresh,
    )

    image = comp.image + (1.0 - comp.weights_sum)[:, None] * bg_color
    image = jnp.clip(image, 0.0, 1.0)
    # normalised depth (reference renderer.py:385)
    depth = jnp.clip(comp.depth - nears, 0.0) / jnp.maximum(fars - nears, 1e-6)

    results: Dict[str, Any] = {
        "image": image,
        "depth": depth,
        "weights_sum": comp.weights_sum,
        "ambient_aud": comp.amb_aud_sum,
        "ambient_eye": comp.amb_eye_sum,
        "uncertainty": comp.uncertainty_sum,
    }
    if training:
        # raw samples for the every-16-step jitter regulariser
        results["rays"] = (pts, dirs, m.mask.reshape(-1))
    return results


def _staged_eval_composite(
    field_apply, params, settings, m, rd, enc_a, ind_code, eye,
    B: int, S: int, stage_split: int, stage2_budget: int,
    sample_budget: int = 0,
):
    """Two-stage field eval with exact early termination (the static-shape
    analogue of the reference's alive-ray loop, renderer.py:503-548):
    evaluate samples [0, split) for all B rays, then samples [split, S) only
    for rays whose transmittance is still >= T_thresh — compacted into
    `stage2_budget` slots. Identical to the single-pass composite whenever
    the stage-2 budget holds every survivor (rays beyond it truncate at the
    split, reported via n_stage2). Returns (image_premult [B,3],
    weights_sum [B], n_stage2).

    sample_budget > 0 additionally compacts the stage-1 field eval to the
    march-masked samples only (the ray budget necessarily over-allocates —
    overflow-safety slack plus rays with < S1 window samples leave ~40% of
    the B*S1 point slots empty on a typical head): points whose march mask
    is off never reach the triplane gather / MLPs, mirroring the reference
    CUDA marcher writing only real samples into its packed buffer
    (raymarching.cu:429-467). EXACT whenever every masked-on sample fits
    the budget (masked-off samples contribute exactly nothing to the
    composite: alpha is masked); overflowing samples compose as empty —
    sized like the ray budget, via n_spts in the diagnostics."""
    S1, S2 = stage_split, S - stage_split
    dt = settings.dt

    def field_eval(pts, dirs_rep):
        out = field_apply(params, pts, dirs_rep, enc_a, ind_code, eye,
                          compute_uncertainty=False)
        return out.sigma * settings.density_scale, out.color

    # ---- stage 1: all rays, first S1 samples
    n_spts = None
    if sample_budget > 0:
        flat = m.mask[:, :S1].reshape(B * S1)
        cp = compact_rays(flat, sample_budget)
        n_spts = cp.n_active
        src = cp.ray_idx                                       # flat pt idx
        pts1 = jnp.take(m.xyzs[:, :S1].reshape(B * S1, 3), src, axis=0)
        dirs1 = jnp.take(rd, src // S1, axis=0)
        sig_c, rgb_c = field_eval(pts1, dirs1)
        tgt = jnp.where(cp.slot_valid, src, B * S1)
        sig1 = jnp.zeros((B * S1,), sig_c.dtype).at[tgt].set(
            sig_c, mode="drop").reshape(B, S1)
        rgb1 = jnp.zeros((B * S1, 3), rgb_c.dtype).at[tgt].set(
            rgb_c, mode="drop").reshape(B, S1, 3)
    else:
        pts1 = m.xyzs[:, :S1].reshape(B * S1, 3)
        sig1, rgb1 = field_eval(pts1, jnp.repeat(rd, S1, axis=0))
        sig1 = sig1.reshape(B, S1)
        rgb1 = rgb1.reshape(B, S1, 3)
    mask1 = m.mask[:, :S1]
    alpha1 = (1.0 - jnp.exp(-sig1 * m.deltas[:, :S1])) * mask1
    one_minus1 = 1.0 - alpha1
    T1 = jnp.concatenate(
        [jnp.ones_like(alpha1[:, :1]),
         jnp.cumprod(one_minus1, axis=-1)[:, :-1]], axis=-1)
    w1 = alpha1 * T1 * ((T1 >= settings.T_thresh) & mask1)
    image = jnp.einsum("ns,nsc->nc", w1, rgb1)
    wsum = jnp.sum(w1, axis=-1)
    T_end = jnp.cumprod(one_minus1, axis=-1)[:, -1]              # [B]

    # ---- stage 2: survivors only
    surv = (T_end >= settings.T_thresh) & m.mask[:, S1:].any(axis=-1)
    cs2 = compact_rays(surv, stage2_budget)
    idx2 = cs2.ray_idx
    rd2 = jnp.take(rd, idx2, axis=0)
    T0 = jnp.take(T_end, idx2) * cs2.slot_valid
    xyz2 = jnp.take(m.xyzs[:, S1:], idx2, axis=0)                # [B2, S2, 3]
    delta2 = jnp.take(m.deltas[:, S1:], idx2, axis=0)
    mask2 = jnp.take(m.mask[:, S1:], idx2, axis=0) & cs2.slot_valid[:, None]

    sig2, rgb2 = field_eval(xyz2.reshape(stage2_budget * S2, 3),
                            jnp.repeat(rd2, S2, axis=0))
    sig2 = sig2.reshape(stage2_budget, S2)
    rgb2 = rgb2.reshape(stage2_budget, S2, 3)
    alpha2 = (1.0 - jnp.exp(-sig2 * delta2)) * mask2
    one_minus2 = 1.0 - alpha2
    T2 = T0[:, None] * jnp.concatenate(
        [jnp.ones_like(alpha2[:, :1]),
         jnp.cumprod(one_minus2, axis=-1)[:, :-1]], axis=-1)
    w2 = alpha2 * T2 * ((T2 >= settings.T_thresh) & mask2)

    tgt = jnp.where(cs2.slot_valid, idx2, B)
    image = image.at[tgt].add(jnp.einsum("ns,nsc->nc", w2, rgb2),
                              mode="drop")
    wsum = wsum.at[tgt].add(jnp.sum(w2, axis=-1), mode="drop")
    return image, wsum, cs2.n_active, n_spts


def render_rays_compact(
    field_apply,
    params,
    settings: RenderSettings,
    state: OccupancyState,
    rays_o: jnp.ndarray,            # [N, 3]
    rays_d: jnp.ndarray,            # [N, 3]
    enc_a: jnp.ndarray,
    ind_code: Optional[jnp.ndarray],
    eye: Optional[jnp.ndarray],
    bg_color: jnp.ndarray,          # [N, 3]
    budget: int,
    window_candidates: Optional[int] = None,
    compute_uncertainty: bool = False,
    tables: Optional[InferenceTables] = None,
    use_bitmask: bool = True,
    minimal: bool = False,
    stage_split: int = 0,
    stage2_budget: int = 0,
    sample_budget: int = 0,
) -> Dict[str, Any]:
    """Fast inference path: per-(x,y)-column z-windows + static-budget ray
    compaction (ops/march2.py), then the same field-eval + composite as
    render_rays, scattered back to the full frame.

    stage_split > 0 (minimal mode only): two-stage early-termination eval —
    samples [0, split) for all rays, [split, S) only for still-transmissive
    rays compacted into `stage2_budget` slots (_staged_eval_composite).

    Rays beyond `budget` active rays in a frame are dropped to background
    (static-budget semantics, like the reference's point-budget trick).
    Requires cascade == 1.

    tables: prebuilt occupancy products (build_inference_tables) — pass them
    when the grid is static (serving) to keep the per-frame program free of
    the dense grid reductions; derived in-graph when None.
    use_bitmask: march with one column-bitstring fetch per candidate group
    (march_rays_window_bitmask, ~3.5x faster) instead of per-candidate
    occupancy gathers.
    minimal: emit only image/weights_sum/n_active — drops the depth and
    ambient/uncertainty buffers and their scatters (the streaming server
    needs pixels only)."""
    assert settings.cascade == 1, "compact path supports cascade == 1 only"
    N = rays_o.shape[0]
    S = settings.max_steps
    K2 = window_candidates or default_window_candidates(
        settings.bound, settings.grid_size, settings.dt)

    aabb = jnp.asarray(settings.aabb, jnp.float32)
    nears, fars = near_far_from_aabb(rays_o, rays_d, aabb, settings.min_near)

    if tables is None:
        # per-ray path: only the always-built nb/bitmask tables are used
        tables = build_inference_tables(state.occ, settings.bound,
                                        variants=())
    win = ray_windows(rays_o, rays_d, nears, fars, tables.z_lo, tables.z_hi,
                      settings.bound, settings.dt)
    cs = compact_rays(win.active, budget)
    # max candidate count any active window needs this frame (the march
    # admits t_cand < t_end strictly → ceil + 1): serving compares it to K2
    # and rebuilds on overflow — window truncation (the round-3 −11 dB K2
    # find) is detected instead of silent (serving/session.py)
    n_winmax = (jnp.max(jnp.where(
        win.active, jnp.ceil((win.t_end - win.t_start) / settings.dt), 0.0))
        .astype(jnp.int32) + 1)

    # ONE fused per-ray gather for all compacted ray attributes (one wide
    # row per ray instead of 5-7 separate gathers)
    cols = [rays_o, rays_d, win.t_start[:, None], win.t_end[:, None]]
    if not minimal:
        cols += [nears[:, None], fars[:, None], bg_color]
    packed_rows = jnp.take(jnp.concatenate(cols, axis=-1), cs.ray_idx,
                           axis=0)
    ro, rd = packed_rows[:, 0:3], packed_rows[:, 3:6]
    t0, t1 = packed_rows[:, 6], packed_rows[:, 7]

    if use_bitmask:
        # exact-neighborhood bitmask (march_rays_window_bitmask_nb): same
        # fetch count as the dilated single-column mask, sample-set equal
        # to the per-candidate exact march — the dilated variant's false
        # positives crowded the S budget for −2.0 dB of trained quality
        # (scripts/quality_check.py variant F)
        m = march_rays_window_bitmask_nb(
            ro, rd, t0, t1, cs.slot_valid, tables.col_nbmask,
            settings.bound, settings.dt, K2, S)
    else:
        m = march_rays_window(ro, rd, t0, t1, cs.slot_valid, state.occ,
                              settings.bound, settings.dt, K2, S)

    tgt = jnp.where(cs.slot_valid, cs.ray_idx, N)

    # stage_split > S would reshape stage-2 with a negative sample count
    # deep inside _staged_eval_composite (obscure trace-time error); CLAMP
    # to S instead of falling back — split == S runs the staged path with
    # an EMPTY stage 2 (stage-1 math is identical to composite_rays), which
    # keeps sample compaction available when infer_samples <= the default
    # infer_stage_split (the sample-compaction sessions ride on it)
    if minimal and stage_split > 0:
        b2 = effective_infer_stage2_budget(budget, stage2_budget)
        image_c, wsum_c, n_stage2, n_spts = _staged_eval_composite(
            field_apply, params, settings, m, rd, enc_a, ind_code, eye,
            budget, S, min(stage_split, S), b2, sample_budget=sample_budget)
        img_acc = jnp.zeros((N, 3)).at[tgt].set(image_c, mode="drop")
        wsum = jnp.zeros((N,)).at[tgt].set(wsum_c, mode="drop")
        image = jnp.clip(img_acc + (1.0 - wsum)[:, None] * bg_color, 0.0, 1.0)
        out = {"image": image, "weights_sum": wsum, "n_active": cs.n_active,
               "n_stage2": n_stage2, "n_winmax": n_winmax}
        if n_spts is not None:
            out["n_spts"] = n_spts
        return out

    pts = m.xyzs.reshape(budget * S, 3)
    dirs = jnp.repeat(rd, S, axis=0)
    out = field_apply(params, pts, dirs, enc_a, ind_code, eye,
                      compute_uncertainty=compute_uncertainty)
    sigmas = (out.sigma * settings.density_scale).reshape(budget, S)
    rgbs = out.color.reshape(budget, S, 3)
    amb_aud = jnp.abs(out.ambient_aud).reshape(budget, S)
    amb_eye = jnp.abs(out.ambient_eye).reshape(budget, S)
    unc = out.uncertainty.reshape(budget, S)

    comp = composite_rays(sigmas, rgbs, amb_aud, amb_eye, unc,
                          m.deltas, m.ts, m.mask, T_thresh=settings.T_thresh)

    if minimal:
        # scatter the premultiplied color + coverage, blend the background
        # DENSELY on the full frame (saves the per-ray bg gather)
        img_acc = jnp.zeros((N, 3)).at[tgt].set(comp.image, mode="drop")
        wsum = jnp.zeros((N,)).at[tgt].set(comp.weights_sum, mode="drop")
        image = jnp.clip(img_acc + (1.0 - wsum)[:, None] * bg_color, 0.0, 1.0)
        return {"image": image, "weights_sum": wsum, "n_active": cs.n_active,
                "n_winmax": n_winmax}

    nears_c, fars_c = packed_rows[:, 8], packed_rows[:, 9]
    bg_c = packed_rows[:, 10:13]
    image_c = jnp.clip(
        comp.image + (1.0 - comp.weights_sum)[:, None] * bg_c, 0.0, 1.0)
    depth_c = jnp.clip(comp.depth - nears_c, 0.0) / jnp.maximum(
        fars_c - nears_c, 1e-6)

    # scatter back; inactive/overflow rays keep pure background
    image = jnp.clip(bg_color, 0.0, 1.0).at[tgt].set(image_c, mode="drop")

    def scat(vals):
        return jnp.zeros((N,), vals.dtype).at[tgt].set(vals, mode="drop")

    return {
        "image": image,
        "depth": scat(depth_c),
        "weights_sum": scat(comp.weights_sum),
        "ambient_aud": scat(comp.amb_aud_sum),
        "ambient_eye": scat(comp.amb_eye_sum),
        "uncertainty": scat(comp.uncertainty_sum),
        "n_active": cs.n_active,
        "n_winmax": n_winmax,
    }


def _staged_train_eval_composite(
    field_apply, params, settings, m, rd, enc_a, ind_code, eye,
    B: int, S: int, stage_split: int, stage2_budget: int,
    compute_uncertainty: bool,
):
    """Early-termination field eval for TRAINING: evaluate samples
    [0, split) for all B rays, then [split, S) only for rays whose
    transmittance after the split is still >= T_thresh — compacted into
    `stage2_budget` slots. The training twin of _staged_eval_composite,
    keeping the full composite outputs (image/depth/weights/amb/unc) the
    loss stack consumes.

    GRADIENT-EXACT, not just value-exact, whenever every survivor gets a
    stage-2 slot: in the single-pass composite a sample with T_i < T_thresh
    contributes zero to every output (weights and the ambient `processed`
    mask both carry the (T >= thresh) factor, ops/composite.py:61-71), and
    because T is monotone non-increasing its failure also zeroes every
    LATER sample — so d(loss)/d(field outputs at unprocessed samples) == 0
    identically, and skipping their field eval (gathers + MLPs + the
    table scatter-add backward, the step's dominant cost) changes no
    gradient. Rays beyond the stage-2 budget truncate at the split
    (reported via n_stage2; the cli warns on persistent overflow like the
    ray budget). The reference evaluates every marched sample in training
    (renderer.py:289) — its alive-ray early exit exists only at inference;
    this recovers the same economics for the training step."""
    S1, S2 = stage_split, S - stage_split
    tt = settings.T_thresh

    def field_eval(pts, dirs_rep):
        out = field_apply(params, pts, dirs_rep, enc_a, ind_code, eye,
                          compute_uncertainty=compute_uncertainty)
        return out

    # ---- stage 1: all rays, first S1 samples
    out1 = field_eval(m.xyzs[:, :S1].reshape(B * S1, 3),
                      jnp.repeat(rd, S1, axis=0))
    sig1 = (out1.sigma * settings.density_scale).reshape(B, S1)
    rgb1 = out1.color.reshape(B, S1, 3)
    amb_aud1 = jnp.abs(out1.ambient_aud).reshape(B, S1)
    amb_eye1 = jnp.abs(out1.ambient_eye).reshape(B, S1)
    unc1 = out1.uncertainty.reshape(B, S1)

    mask1 = m.mask[:, :S1]
    mask1f = mask1.astype(sig1.dtype)
    alpha1 = (1.0 - jnp.exp(-sig1 * m.deltas[:, :S1])) * mask1f
    one_minus1 = 1.0 - alpha1
    T1 = jnp.concatenate(
        [jnp.ones_like(alpha1[:, :1]),
         jnp.cumprod(one_minus1, axis=-1)[:, :-1]], axis=-1)
    proc1 = ((T1 >= tt) & mask1).astype(sig1.dtype)
    w1 = alpha1 * T1 * proc1
    image = jnp.einsum("ns,nsc->nc", w1, rgb1)
    depth = jnp.sum(w1 * m.ts[:, :S1], axis=-1)
    wsum = jnp.sum(w1, axis=-1)
    amb_aud_sum = jnp.sum(amb_aud1 * proc1, axis=-1)
    amb_eye_sum = jnp.sum(amb_eye1 * proc1, axis=-1)
    unc_sum = jnp.sum(w1 * unc1, axis=-1)
    T_end = jnp.cumprod(one_minus1, axis=-1)[:, -1]              # [B]

    # ---- stage 2: survivors only
    surv = (T_end >= tt) & m.mask[:, S1:].any(axis=-1)
    cs2 = compact_rays(surv, stage2_budget)
    idx2 = cs2.ray_idx
    rd2 = jnp.take(rd, idx2, axis=0)
    T0 = jnp.take(T_end, idx2) * cs2.slot_valid
    xyz2 = jnp.take(m.xyzs[:, S1:], idx2, axis=0)                # [B2, S2, 3]
    delta2 = jnp.take(m.deltas[:, S1:], idx2, axis=0)
    ts2 = jnp.take(m.ts[:, S1:], idx2, axis=0)
    mask2 = jnp.take(m.mask[:, S1:], idx2, axis=0) & cs2.slot_valid[:, None]

    out2 = field_eval(xyz2.reshape(stage2_budget * S2, 3),
                      jnp.repeat(rd2, S2, axis=0))
    sig2 = (out2.sigma * settings.density_scale).reshape(stage2_budget, S2)
    rgb2 = out2.color.reshape(stage2_budget, S2, 3)
    amb_aud2 = jnp.abs(out2.ambient_aud).reshape(stage2_budget, S2)
    amb_eye2 = jnp.abs(out2.ambient_eye).reshape(stage2_budget, S2)
    unc2 = out2.uncertainty.reshape(stage2_budget, S2)

    mask2f = mask2.astype(sig2.dtype)
    alpha2 = (1.0 - jnp.exp(-sig2 * delta2)) * mask2f
    one_minus2 = 1.0 - alpha2
    T2 = T0[:, None] * jnp.concatenate(
        [jnp.ones_like(alpha2[:, :1]),
         jnp.cumprod(one_minus2, axis=-1)[:, :-1]], axis=-1)
    proc2 = ((T2 >= tt) & mask2).astype(sig2.dtype)
    w2 = alpha2 * T2 * proc2

    tgt = jnp.where(cs2.slot_valid, idx2, B)
    image = image.at[tgt].add(jnp.einsum("ns,nsc->nc", w2, rgb2),
                              mode="drop")
    depth = depth.at[tgt].add(jnp.sum(w2 * ts2, axis=-1), mode="drop")
    wsum = wsum.at[tgt].add(jnp.sum(w2, axis=-1), mode="drop")
    amb_aud_sum = amb_aud_sum.at[tgt].add(
        jnp.sum(amb_aud2 * proc2, axis=-1), mode="drop")
    amb_eye_sum = amb_eye_sum.at[tgt].add(
        jnp.sum(amb_eye2 * proc2, axis=-1), mode="drop")
    unc_sum = unc_sum.at[tgt].add(jnp.sum(w2 * unc2, axis=-1), mode="drop")
    return (image, depth, wsum, amb_aud_sum, amb_eye_sum, unc_sum,
            cs2.n_active)


def effective_infer_stage2_budget(budget: int, stage2_budget: int) -> int:
    """The stage-2 slot count the INFERENCE staged paths actually use —
    the one definition shared by render_rays_compact,
    render_rays_compact_blocks, and every overflow reporter (session.py,
    cli.py run_test, bench diagnostics). Same trap as the train twin
    below: passing 0 selects this default, so comparing demand against a
    locally recomputed value diverges silently."""
    return stage2_budget or max(1024, budget // 4 // 1024 * 1024)


def effective_train_stage2_budget(budget: int, stage2_budget: int) -> int:
    """The stage-2 slot count render_rays_train_compact actually uses.

    Callers that report overflow (trainer.py's n_stage2_over) must compare
    demand against THIS value, not the raw stage2_budget argument — passing
    0 selects this default, and comparing against 0 would claim truncation
    on every step."""
    return stage2_budget or max(1024, budget // 2 // 1024 * 1024)


def render_rays_train_compact(
    field_apply,
    params,
    settings: RenderSettings,
    state: OccupancyState,
    rays_o: jnp.ndarray,            # [N, 3]
    rays_d: jnp.ndarray,            # [N, 3]
    enc_a: jnp.ndarray,
    ind_code: Optional[jnp.ndarray],
    eye: Optional[jnp.ndarray],
    bg_color: jnp.ndarray,          # [N, 3]
    budget: int,
    noise: Optional[jnp.ndarray] = None,
    compute_uncertainty: bool = True,
    window_candidates: Optional[int] = None,
    stage_split: int = 0,
    stage2_budget: int = 0,
    use_bitmask: bool = False,
) -> Dict[str, Any]:
    """Training-path ray compaction: EXACT render_rays(training=True) for
    every contributing ray, at a fraction of the work.

    The static-shape training step otherwise evaluates the field on S
    samples for EVERY sampled ray — including the ~half whose (x, y)
    columns contain no occupied cell and which render pure background
    (zero field work in the reference's CUDA marcher,
    raymarching.cu:429-440). Here those rays deactivate in the window
    analysis (ops/march2.ray_windows) exactly as they produce zero samples
    in march_rays_uniform, active rays compact into `budget` slots, and
    the march uses the same per-cell occupancy test and the same noisy
    near-anchored lattice as the full marcher — so outputs (and therefore
    loss and gradients) match render_rays bit-for-float for every ray that
    gets a slot. Active rays beyond the budget render as background, get
    loss weight 0, and the surviving active rays are upweighted to keep
    the loss unbiased (`ray_weight`); `n_active` reports the demand. Not
    for data-sharded batches: the compaction cumsum is global.

    stage_split > 0: two-stage early-termination field eval — samples
    [0, split) for all slotted rays, [split, S) only for rays still
    transmissive at the split, compacted into `stage2_budget` slots
    (_staged_train_eval_composite — gradient-exact whenever the survivors
    fit; n_stage2 reports the demand). Cuts the post-split field eval and
    its table-gradient scatter (the step's dominant cost, PERF.md) for
    the ~half of slotted rays that saturate early.
    """
    N = rays_o.shape[0]
    S = settings.max_steps
    K2 = window_candidates or settings.num_cand + 2

    aabb = jnp.asarray(settings.aabb, jnp.float32)
    nears, fars = near_far_from_aabb(rays_o, rays_d, aabb, settings.min_near)
    nears = jax.lax.stop_gradient(nears)
    fars = jax.lax.stop_gradient(fars)

    z_lo, z_hi = column_intervals(state.occ, settings.bound)
    win = ray_windows(rays_o, rays_d, nears, fars, z_lo, z_hi,
                      settings.bound, settings.dt)
    cs = compact_rays(win.active, budget)
    slotted = win.active & (jnp.cumsum(win.active.astype(jnp.int32))
                            <= budget)
    # per-ray loss weights: inactive rays 1, slotted active rays
    # n_active/n_slotted (>= 1), dropped rays 0. Slotted rays are a uniform
    # random subset of the active ones (random pixel order), so upweighting
    # them keeps the loss an UNBIASED estimator of the full-batch loss —
    # without it, overflow steps shift the batch composition toward
    # background (dropped rays are exclusively active) and head convergence
    # measurably slows. Sum of weights == N.
    n_slot = jnp.minimum(cs.n_active, budget).astype(jnp.float32)
    over_w = cs.n_active.astype(jnp.float32) / jnp.maximum(n_slot, 1.0)
    ray_weight = jnp.where(win.active,
                           jnp.where(slotted, over_w, 0.0), 1.0)

    cols = [rays_o, rays_d, win.t_start[:, None], win.t_end[:, None],
            nears[:, None], fars[:, None], bg_color]
    if noise is not None:
        cols.append(noise[:, None])
    packed_rows = jnp.take(jnp.concatenate(cols, axis=-1), cs.ray_idx,
                           axis=0)
    ro, rd = packed_rows[:, 0:3], packed_rows[:, 3:6]
    t0, t1 = packed_rows[:, 6], packed_rows[:, 7]
    nears_c, fars_c = packed_rows[:, 8], packed_rows[:, 9]
    bg_c = packed_rows[:, 10:13]
    noise_c = packed_rows[:, 13] if noise is not None else None

    # use_bitmask: the exact 3x3-neighborhood bitmask march (noise-lattice
    # variant, sample-set-identical — tests/test_march2.py noise-parity
    # test) halves the march GATHER rows (one 36-word row per 2-candidate
    # group vs one occupancy gather per candidate) but measured SLOWER in
    # the training step — 6.26 vs 6.55 it/s trainbench A/B: the two-stage
    # word/neighbor select on [B, G, group] costs more inside the
    # differentiated train graph than the saved rows (the serving frame,
    # where the same trade WINS 3.5x, amortizes the select across an
    # un-differentiated graph with K2=50 adaptive windows, not K2=114).
    # Kept opt-in + parity-tested like the repo's other measured negative
    # results (PERF.md round 3).
    if use_bitmask:
        from ..ops.march2 import column_bitmasks_neighborhood

        nbmask = column_bitmasks_neighborhood(state.occ)
        m = march_rays_window_bitmask_nb(
            ro, rd, t0, t1, cs.slot_valid, nbmask,
            settings.bound, settings.dt, K2, S,
            noise=noise_c, nears=nears_c)
    else:
        m = march_rays_window(ro, rd, t0, t1, cs.slot_valid, state.occ,
                              settings.bound, settings.dt, K2, S,
                              noise=noise_c, nears=nears_c)

    pts = m.xyzs.reshape(budget * S, 3)
    dirs = jnp.repeat(rd, S, axis=0)
    n_stage2 = None
    if stage_split and 0 < stage_split < S:
        b2 = effective_train_stage2_budget(budget, stage2_budget)
        (img_c, depth_raw, wsum_c, amb_aud_c, amb_eye_c, unc_c,
         n_stage2) = _staged_train_eval_composite(
            field_apply, params, settings, m, rd, enc_a, ind_code, eye,
            budget, S, stage_split, b2,
            compute_uncertainty=compute_uncertainty)
    else:
        out = field_apply(params, pts, dirs, enc_a, ind_code, eye,
                          compute_uncertainty=compute_uncertainty)
        sigmas = (out.sigma * settings.density_scale).reshape(budget, S)
        rgbs = out.color.reshape(budget, S, 3)
        amb_aud = jnp.abs(out.ambient_aud).reshape(budget, S)
        amb_eye = jnp.abs(out.ambient_eye).reshape(budget, S)
        unc = out.uncertainty.reshape(budget, S)

        comp = composite_rays(sigmas, rgbs, amb_aud, amb_eye, unc,
                              m.deltas, m.ts, m.mask,
                              T_thresh=settings.T_thresh)
        img_c, depth_raw, wsum_c = comp.image, comp.depth, comp.weights_sum
        amb_aud_c, amb_eye_c, unc_c = (comp.amb_aud_sum, comp.amb_eye_sum,
                                       comp.uncertainty_sum)

    image_c = img_c + (1.0 - wsum_c)[:, None] * bg_c
    image_c = jnp.clip(image_c, 0.0, 1.0)
    depth_c = jnp.clip(depth_raw - nears_c, 0.0) / jnp.maximum(
        fars_c - nears_c, 1e-6)

    tgt = jnp.where(cs.slot_valid, cs.ray_idx, N)
    image = jnp.clip(bg_color, 0.0, 1.0).at[tgt].set(image_c, mode="drop")

    def scat(vals):
        return jnp.zeros((N,), vals.dtype).at[tgt].set(vals, mode="drop")

    res = {
        "image": image,
        "depth": scat(depth_c),
        "weights_sum": scat(wsum_c),
        "ambient_aud": scat(amb_aud_c),
        "ambient_eye": scat(amb_eye_c),
        "uncertainty": scat(unc_c),
        "rays": (pts, dirs, m.mask.reshape(-1)),
        "ray_weight": ray_weight,
        "n_active": cs.n_active,
    }
    if n_stage2 is not None:
        res["n_stage2"] = n_stage2
    return res


def render_rays_compact_blocks(
    field_apply,
    params,
    settings: RenderSettings,
    state: OccupancyState,
    rays_o_origin: jnp.ndarray,     # [3] camera origin (shared by all rays)
    rays_d: jnp.ndarray,            # [H*W, 3] row-major unit dirs
    H: int,
    W: int,
    enc_a: jnp.ndarray,
    ind_code: Optional[jnp.ndarray],
    eye: Optional[jnp.ndarray],
    bg_color: jnp.ndarray,          # [H*W, 3]
    budget: int,                    # in RAYS (multiple of 4)
    window_candidates: Optional[int] = None,
    tables: Optional[InferenceTables] = None,
    stage_split: int = 0,
    stage2_budget: int = 0,
    march_group: int = 2,
    sample_budget: int = 0,
    march_variant: str = "wslice",
    eval_budget: int = 0,
    march_prepass: bool = False,
    march_bucket: Optional[tuple] = None,
) -> Dict[str, Any]:
    """Serving fast path with 2x2-pixel-block window analysis/compaction.

    The window/active/compaction stages run once per 2x2 pixel BLOCK instead
    of per ray — every N-sized gather/cumsum/scatter in that phase drops 4x
    (measured: the windows+compact block was ~40% of the 512² frame). The
    2x2 rays of a block share (x, y) columns to within ~0.1 grid cell, so
    the block-centre window is as conservative as the per-ray one; per-ray
    t-lattices stay anchored at each ray's own near (reference semantics).
    The march's bitmask-row fetches are ALSO per block (one 5x5-neighborhood
    row per block per candidate group, march_group=2 default — 4x fewer
    march gather rows); candidate tests, field-eval and composite still run
    per ray. Minimal outputs only
    (image + weights_sum + n_active; n_active counts rays = 4x blocks)."""
    assert settings.cascade == 1, "compact path supports cascade == 1 only"
    assert H % 2 == 0 and W % 2 == 0 and budget % 4 == 0
    N = H * W
    NB = N // 4
    S = settings.max_steps
    K2 = window_candidates or default_window_candidates(
        settings.bound, settings.grid_size, settings.dt)
    budget_b = budget // 4
    aabb = jnp.asarray(settings.aabb, jnp.float32)

    if tables is None:
        from ..ops.march2 import needed_variant_tables

        tables = build_inference_tables(
            state.occ, settings.bound,
            variants=needed_variant_tables(march_group, march_variant,
                                           prepass=march_prepass))

    # block view: [H/2, 2, W/2, 2, 3] -> [NB, 4(dy,dx), 3]
    d_blocks = rays_d.reshape(H // 2, 2, W // 2, 2, 3).transpose(
        0, 2, 1, 3, 4).reshape(NB, 4, 3)
    d_center = d_blocks.mean(axis=1)
    d_center = d_center / jnp.linalg.norm(d_center, axis=-1, keepdims=True)
    o_center = jnp.broadcast_to(rays_o_origin, d_center.shape)

    nears_b, fars_b = near_far_from_aabb(o_center, d_center, aabb,
                                         settings.min_near)
    # one extra pad step absorbs the <=0.3-cell intra-block drift
    win = ray_windows(o_center, d_center, nears_b, fars_b,
                      tables.z_lo, tables.z_hi, settings.bound, settings.dt,
                      pad_steps=3.0)
    active = win.active
    if march_bucket is not None and not (march_prepass
                                         and march_group == 2):
        # the bucket split is DERIVED from the prepass spans; accepting it
        # without them would silently march un-tightened windows at K2s
        raise ValueError(
            "march_bucket requires march_prepass=True and march_group=2")
    use_bucket = march_bucket is not None
    g_first = g_last = None
    if march_prepass and march_group == 2:
        # occupancy-true activity (ops/march2.prepass_block_hits): the
        # z-slab window test over-admits ~2.6x on a trained crust; one
        # dilated-occupancy bit test per (block, candidate group) PROVES
        # which blocks cannot keep a single sample, so they never enter
        # the march — the march/window phases were the dominant
        # un-compacted cost after the eval re-compaction (PERF.md Round
        # 4). Conservative under the same ±2-cell drift envelope the
        # group-2 block march is gated on; group != 2 geometries skip it
        # (their candidates may drift beyond the dilation).
        if tables.col_dilwords is None:
            from ..ops.march2 import dilated_occupancy_words

            tables = tables._replace(
                col_dilwords=dilated_occupancy_words(state.occ))
        if use_bucket:
            from ..ops.march2 import prepass_block_spans

            hit, g_first, g_last = prepass_block_spans(
                o_center, d_center, win.t_start, win.t_end,
                tables.col_dilwords, settings.bound, settings.dt, K2)
        else:
            hit = prepass_block_hits(
                o_center, d_center, win.t_start, win.t_end,
                tables.col_dilwords, settings.bound, settings.dt, K2)
        active = active & hit
    # max candidate count any active block window needs (per-ray windows
    # are subsets of their block's [t0, t1]); see render_rays_compact
    n_winmax = (jnp.max(jnp.where(
        win.active, jnp.ceil((win.t_end - win.t_start) / settings.dt), 0.0))
        .astype(jnp.int32) + 1)

    # per-block window, possibly TIGHTENED by the prepass spans (bucketed
    # path): groups before g_first / after g_last provably hold no
    # occupied candidate, and the shift is a whole number of groups, so
    # every surviving candidate keeps its exact lattice position
    t0_all, t1_all = win.t_start, win.t_end
    if use_bucket:
        dtf = settings.dt
        gf = g_first.astype(jnp.float32)
        gl = g_last.astype(jnp.float32)
        t0_all = win.t_start + (2.0 * dtf) * gf
        t1_all = jnp.minimum(win.t_end,
                             win.t_start + (2.0 * gl + 2.0) * dtf)
    cols = jnp.concatenate(
        [d_blocks.reshape(NB, 12), t0_all[:, None], t1_all[:, None],
         d_center], axis=-1)

    def march_bucket_blocks(csb, Bb_, K2_):
        """Gather block attrs for one compacted set, re-anchor per-ray
        windows on each ray's own near-based dt lattice (march_rays_
        window's snap, ray_windows:127-134), and run the group-2 block
        march at K2_ candidates."""
        rows = jnp.take(cols, csb.ray_idx, axis=0)       # [Bb_, 17]
        rd_ = rows[:, :12].reshape(Bb_ * 4, 3)
        t0_blk_ = rows[:, 12]
        t0b_ = jnp.repeat(t0_blk_, 4)
        t1b_ = jnp.repeat(rows[:, 13], 4)
        dc_ = rows[:, 14:17]
        ro_ = jnp.broadcast_to(rays_o_origin, rd_.shape)
        sv_ = jnp.repeat(csb.slot_valid, 4)
        nears_r, fars_r = near_far_from_aabb(ro_, rd_, aabb,
                                             settings.min_near)
        t_start_ = jnp.maximum(nears_r, t0b_)
        k0_ = jnp.ceil(jnp.maximum(t_start_ - nears_r, 0.0)
                       / settings.dt - 1e-4)
        t_start_ = nears_r + k0_ * settings.dt
        t_end_ = jnp.minimum(fars_r, t1b_)

        # march_group == 3: block-LATTICE exact 3x3-neighborhood march —
        # measured SLOWER than group 2 (31.4 vs 32.9 FPS) at −0.38 dB;
        # documented negative result, opt-in only (ops/march2.py).
        # march_group == 2: block-shared exact 5x5-neighborhood march —
        # one row fetch per (2x2 block, candidate group), sample-identical
        # for any portrait-camera geometry (|d_xy| <= 0.95 envelope).
        # march_group == 1: per-ray exact 3x3-neighborhood march (any
        # direction). march_group < 0: the dilated single-column fast
        # mode with group=|march_group| (−2 dB, quality_check variant F).
        if march_group == 3:
            return rd_, march_rays_window_bitmask_nb_block3(
                ro_, rd_, nears_r, t_end_, sv_, t0_blk_, dc_,
                tables.col_nbmask, settings.bound, settings.dt, K2_, S)
        if march_group == 2:
            tbl = (tables.col_quadwxmask if march_variant == "quadwx"
                   else tables.col_quadwmask if march_variant == "quadw"
                   else tables.col_quadmask if march_variant == "quad"
                   else tables.col_nb5wmask
                   if march_variant in ("nb5w", "nb5wz", "nb5wz4", "nb5wp")
                   else tables.col_nb5mask)
            return rd_, march_rays_window_bitmask_nb_block(
                ro_, rd_, t_start_, t_end_, sv_, t0_blk_, dc_,
                tbl, settings.bound, settings.dt, K2_, S,
                variant=march_variant)
        if march_group > 0:
            return rd_, march_rays_window_bitmask_nb(
                ro_, rd_, t_start_, t_end_, sv_, tables.col_nbmask,
                settings.bound, settings.dt, K2_, S)
        return rd_, march_rays_window_bitmask(
            ro_, rd_, t_start_, t_end_, sv_, tables.col_bitmask,
            settings.bound, settings.dt, K2_, S, group=-march_group)

    n_short = n_long = None
    if use_bucket:
        # SHORT/LONG bucketed march (march_bucket = (K2s, short_budget)):
        # after the prepass tightening, half the blocks need far fewer
        # candidates than the global worst case (trained-state trajectory:
        # span p50 = 32 vs K2 = 82) — marching them in a separate program
        # at K2s candidates cuts the dominant select/fetch work. Shorts
        # that overflow their budget SPILL to the long bucket (no
        # truncation); long-bucket overflow drops to background and is
        # reported via n_long for the session's rebuild escape (same
        # class as the ray budget).
        K2s, short_budget = march_bucket
        if not 0 < short_budget < budget or short_budget % 4:
            raise ValueError(
                f"march_bucket short budget {short_budget} must be a "
                f"multiple of 4 in (0, {budget})")
        if K2s < S:
            raise ValueError(
                f"march_bucket K2s ({K2s}) cannot be below max_steps ({S})")
        Bs_b = short_budget // 4
        Bl_b = budget_b - Bs_b
        span_cand = 2 * (g_last - g_first + 1) + 2
        short = active & (span_cand <= K2s)
        rank_s = jnp.cumsum(short.astype(jnp.int32))
        slotted_s = short & (rank_s <= Bs_b)
        long_ = (active & ~short) | (short & ~slotted_s)
        cs_s = compact_rays(slotted_s, Bs_b)
        cs_l = compact_rays(long_, Bl_b)
        rd_s, m_s = march_bucket_blocks(cs_s, Bs_b, K2s)
        rd_l, m_l = march_bucket_blocks(cs_l, Bl_b, K2)
        from ..ops.march import MarchResult as _MRc
        m = _MRc(xyzs=jnp.concatenate([m_s.xyzs, m_l.xyzs]),
                 deltas=jnp.concatenate([m_s.deltas, m_l.deltas]),
                 ts=jnp.concatenate([m_s.ts, m_l.ts]),
                 mask=jnp.concatenate([m_s.mask, m_l.mask]))
        rd = jnp.concatenate([rd_s, rd_l])
        blk_idx = jnp.concatenate([cs_s.ray_idx, cs_l.ray_idx])
        blk_valid = jnp.concatenate([cs_s.slot_valid, cs_l.slot_valid])
        n_active_val = (cs_s.n_active + cs_l.n_active) * 4
        n_short = rank_s[-1] * 4
        n_long = cs_l.n_active * 4
    else:
        cs = compact_rays(active, budget_b)
        rd, m = march_bucket_blocks(cs, budget_b, K2)
        blk_idx = cs.ray_idx
        blk_valid = cs.slot_valid
        n_active_val = cs.n_active * 4

    # Post-march block re-compaction: the window analysis activates any
    # block whose ray crosses a nonempty COLUMN z-slab ([z_lo, z_hi] is one
    # interval per (x, y) column), an over-approximation of "has >= 1
    # occupied candidate" — on the trained production crust it admits
    # ~2.6x more rays than geometrically hit occupied cells (measured:
    # 214,812 window-active vs ~82k real at 512²; silhouette projection
    # puts pixel coverage at ~31%). Blocks whose march found ZERO occupied
    # samples compose to exactly (image 0, wsum 0) == background, so
    # re-compacting them out before the field eval (the dominant phase) is
    # bit-exact while every real block fits `eval_budget`; overflowing
    # blocks render as background and are reported via n_real for the
    # session's adaptive-rebuild escape (same class as the ray budget).
    # This is RAY-level compaction (the round-1 platform fact: pays),
    # not the rejected SAMPLE-level one — one [budget_b] cumsum + row
    # gathers of the march outputs, no B*S-row barrier.
    n_real = None
    if eval_budget and eval_budget // 4 < budget_b:
        eb = max(1, eval_budget // 4)
        realb = m.mask.reshape(budget_b, 4 * S).any(axis=1) & blk_valid
        csr = compact_rays(realb, eb)
        n_real = csr.n_active * 4
        sel = csr.ray_idx
        keep = csr.slot_valid

        def _tk(a):
            return jnp.take(a.reshape((budget_b, 4) + a.shape[1:]), sel,
                            axis=0).reshape((eb * 4,) + a.shape[1:])

        from ..ops.march import MarchResult as _MR
        m = _MR(xyzs=_tk(m.xyzs), deltas=_tk(m.deltas), ts=_tk(m.ts),
                mask=_tk(m.mask) & jnp.repeat(keep, 4)[:, None])
        rd = _tk(rd.reshape(budget_b * 4, 3))
        blk_idx = jnp.take(blk_idx, sel)
        blk_valid = keep & jnp.take(blk_valid, sel)
        budget_b = eb

    B = budget_b * 4
    n_stage2 = n_spts = None
    if stage_split > 0:   # see render_rays_compact's clamp
        b2 = effective_infer_stage2_budget(budget, stage2_budget)
        image_c, wsum_c, n_stage2, n_spts = _staged_eval_composite(
            field_apply, params, settings, m, rd, enc_a, ind_code, eye,
            B, S, min(stage_split, S), b2, sample_budget=sample_budget)
    else:
        pts = m.xyzs.reshape(B * S, 3)
        dirs = jnp.repeat(rd, S, axis=0)
        out = field_apply(params, pts, dirs, enc_a, ind_code, eye,
                          compute_uncertainty=False)
        sigmas = (out.sigma * settings.density_scale).reshape(B, S)
        rgbs = out.color.reshape(B, S, 3)
        amb_aud = jnp.abs(out.ambient_aud).reshape(B, S)
        amb_eye = jnp.abs(out.ambient_eye).reshape(B, S)
        unc = out.uncertainty.reshape(B, S)
        comp = composite_rays(sigmas, rgbs, amb_aud, amb_eye, unc,
                              m.deltas, m.ts, m.mask,
                              T_thresh=settings.T_thresh)
        image_c, wsum_c = comp.image, comp.weights_sum

    # scatter per BLOCK: 16-wide rows (4 rays x (rgb + wsum)). A per-RAY
    # direct-to-pixel scatter (4-wide rows, no un-blocking transpose) was
    # measured at 35.09 vs 36.5 FPS same-session — the narrow scatter rows
    # cost more than the ~0.8 ms (H/2, W/2, 2, 2) relayout they delete.
    tgt = jnp.where(blk_valid, blk_idx, NB)
    payload = jnp.concatenate(
        [image_c.reshape(budget_b, 12),
         wsum_c.reshape(budget_b, 4)], axis=-1)
    acc = jnp.zeros((NB, 16)).at[tgt].set(payload, mode="drop")
    img_acc = acc[:, :12].reshape(H // 2, W // 2, 2, 2, 3).transpose(
        0, 2, 1, 3, 4).reshape(N, 3)
    wsum = acc[:, 12:16].reshape(H // 2, W // 2, 2, 2).transpose(
        0, 2, 1, 3).reshape(N)
    image = jnp.clip(img_acc + (1.0 - wsum)[:, None] * bg_color, 0.0, 1.0)
    out = {"image": image, "weights_sum": wsum, "n_active": n_active_val,
           "n_winmax": n_winmax}
    if n_short is not None:
        out["n_short"] = n_short
        out["n_long"] = n_long
    if n_real is not None:
        out["n_real"] = n_real
    if n_stage2 is not None:
        out["n_stage2"] = n_stage2
    if n_spts is not None:
        out["n_spts"] = n_spts
    return out


def _bilinear_sample_2d(grid: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """align_corners=True bilinear sample of grid [H, W] at coords [N, 2] in
    [-1, 1]; coords[:, 0] indexes width, coords[:, 1] height — matching
    F.grid_sample semantics in reference renderer.py:604-605."""
    H, W = grid.shape
    x = (coords[:, 0] + 1.0) * 0.5 * (W - 1)
    y = (coords[:, 1] + 1.0) * 0.5 * (H - 1)
    x0 = jnp.clip(jnp.floor(x), 0, W - 1).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor(y), 0, H - 1).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, W - 1)
    y1 = jnp.minimum(y0 + 1, H - 1)
    wx = x - x0
    wy = y - y0
    g = grid
    v00 = g[y0, x0]
    v01 = g[y0, x1]
    v10 = g[y1, x0]
    v11 = g[y1, x1]
    return (v00 * (1 - wx) * (1 - wy) + v01 * wx * (1 - wy)
            + v10 * (1 - wx) * wy + v11 * wx * wy)


class TorsoPlan(NamedTuple):
    """Serving-time torso evaluation plan. The torso occupancy mask depends
    only on the (static) 2-D torso grid and the (static) screen coords, so
    the set of pixels the torso can touch is FRAME-INVARIANT: precompute it
    once per model load and evaluate the torso nets only there (the
    reference compacts per frame with nonzero() — renderer.py:584-586)."""

    idx: jnp.ndarray       # [M] pixel indices (padded slots point at N)
    coords: jnp.ndarray    # [M, 2] their bg_coords
    n_pixels: int          # frame pixel count N


def build_torso_plan(settings: RenderSettings, state: OccupancyState,
                     bg_coords, pad_to: int = 1024) -> TorsoPlan:
    """Host-side, once per model load (grid static while serving)."""
    import numpy as np

    thresh = float(jnp.minimum(settings.density_thresh_torso,
                               state.mean_density_torso))
    occupancy = np.asarray(_bilinear_sample_2d(state.density_grid_torso,
                                               bg_coords))
    N = bg_coords.shape[0]
    idx = np.nonzero(occupancy > thresh)[0]
    M = max(pad_to, (len(idx) + pad_to - 1) // pad_to * pad_to)
    pad = np.full(M - len(idx), N, np.int32)        # drop-sentinel slots
    idx_p = np.concatenate([idx.astype(np.int32), pad])
    coords = np.zeros((M, 2), np.float32)
    coords[:len(idx)] = np.asarray(bg_coords)[idx]
    return TorsoPlan(idx=jnp.asarray(idx_p), coords=jnp.asarray(coords),
                     n_pixels=N)


def run_torso_compact(
    torso_apply,
    torso_params,
    plan: TorsoPlan,
    pose: jnp.ndarray,
    ind_code_torso: Optional[jnp.ndarray],
    bg_color: jnp.ndarray,          # [N, 3]
) -> jnp.ndarray:
    """Torso pass over the precomputed active pixels only (serving fast
    path; ~2-3x less MLP work than the dense run_torso at 512² and no
    per-frame occupancy sampling). Returns the composited background."""
    alpha, color, _ = torso_apply(torso_params, plan.coords, pose,
                                  ind_code_torso)
    bg_c = jnp.take(bg_color, jnp.minimum(plan.idx, plan.n_pixels - 1),
                    axis=0)
    blended = color * alpha + bg_c * (1.0 - alpha)
    return bg_color.at[plan.idx].set(blended, mode="drop")


def run_torso(
    torso_apply,
    torso_params,
    settings: RenderSettings,
    state: OccupancyState,
    bg_coords: jnp.ndarray,         # [N, 2] in [-1, 1]
    pose: jnp.ndarray,              # [4, 4]
    ind_code_torso: Optional[jnp.ndarray],
    bg_color: jnp.ndarray,          # [N, 3]
) -> Dict[str, Any]:
    """Torso pass: 2-D occupancy-masked deform-field query composited over the
    background (reference renderer.py:572-631). The reference compacts to the
    occupied subset; on TPU we evaluate dense and mask — static shapes, and
    the torso nets are tiny."""
    thresh = jnp.minimum(settings.density_thresh_torso, state.mean_density_torso)
    occupancy = _bilinear_sample_2d(state.density_grid_torso, bg_coords)
    mask = (occupancy > thresh).astype(jnp.float32)[:, None]   # [N, 1]

    alpha, color, deform = torso_apply(torso_params, bg_coords, pose, ind_code_torso)
    alpha = alpha * mask
    color = color * mask

    new_bg = color * alpha + bg_color * (1.0 - alpha)
    return {
        "bg_color": new_bg,
        "torso_alpha": alpha,
        "torso_color": new_bg,
        "deform": deform,
    }
