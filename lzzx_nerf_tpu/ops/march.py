"""Static-shape occupancy-grid ray marching.

TPU-native replacement for the reference's dynamic marching kernels
(raymarching/src/raymarching.cu: kernel_march_rays_train 353-518 and the
alive-ray kernel_march_rays 828-939 + the python compaction loop in
nerf_triplane/renderer.py:326-369).

Why this can be static-shape without losing the reference's semantics:
the CUDA step size is ``dt = clamp(t * dt_gamma, dt_min, dt_max)`` with
``dt_max = 2*sqrt(3)*2^(C-1)/H`` and ``dt_min = min(dt_max, 2*sqrt(3)/max_steps)``
(raymarching.cu:386-387). In the production talking-head config
(bound=1 → C=1, H=128, max_steps=16) dt_min == dt_max, so the step size is a
*constant* and every ray visits the fixed t-lattice ``t0 + k*dt``; empty-space
skipping merely decides which lattice points are kept. That maps exactly onto:

  1. evaluate occupancy at all K candidate lattice points   (one batched gather)
  2. keep the first S occupied candidates per ray           (a static top-k)

which is one fused XLA program with no data-dependent shapes, no atomics, and
no host round-trips — instead of a two-pass atomicAdd compaction (train) or a
python while-loop over alive rays (inference). Rays with < S occupied samples
get masked slots; the field evaluator runs dense (MXU-friendly) and the
compositor ignores masked samples.

The general adaptive-dt case (bound > 1 with dt_gamma > 0) falls outside the
constant-lattice precondition; `march_rays_uniform` asserts the precondition.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

SQRT3 = math.sqrt(3.0)


def occ_lookup(occ_grid: jnp.ndarray, flat_idx: jnp.ndarray) -> jnp.ndarray:
    """Occupancy test for flat cell indices into a [CAS, H, H, H] grid.

    Width-8 gather trick (measured on v5e): width-1 gathers retire ~113M
    rows/s, width-4..48 rows from VMEM-sized tables ~260-300M rows/s. So
    gather rows of 8 consecutive z-cells (a free reshape of the natural-order
    grid) and select the lane in-register — 2.3x faster than per-cell
    lookups."""
    rows8 = occ_grid.reshape(-1, 8).astype(jnp.uint8)
    shape = flat_idx.shape
    flat = flat_idx.reshape(-1)
    rows = jnp.take(rows8, flat >> 3, axis=0)              # [M, 8]
    lane = (flat & 7)[:, None].astype(jnp.uint8)
    hit = jnp.sum(jnp.where(lane == jnp.arange(8, dtype=jnp.uint8)[None],
                            rows, 0), axis=-1)
    return (hit > 0).reshape(shape)


def _first_s_select(valid: jnp.ndarray, num_cand: int, max_samples: int,
                    select: str = "topk"):
    """First-S selection: per ray, the lattice indices of the first
    `max_samples` valid candidates (in order) -> (sel_k [B, S] float,
    mask [B, S] bool). The single shared implementation for every marcher
    (march_rays_uniform and the march2 window/bitmask family).

    "topk": lax.top_k over a masked score. "rank": cumsum ranks + a
    [B, K2, S] one-hot reduction (no sort). Same result; relative speed is
    platform-dependent — measured on the serving shapes before choosing."""
    k = jnp.arange(num_cand, dtype=jnp.float32)
    if select == "topk":
        score = jnp.where(valid, k[None], jnp.float32(num_cand))
        neg_topk, _ = jax.lax.top_k(-score, max_samples)
        sel_k = -neg_topk
        mask = sel_k < num_cand
        return jnp.where(mask, sel_k, 0.0), mask
    if select == "rank":
        rank = jnp.cumsum(valid.astype(jnp.int32), axis=1)      # [B, K2]
        slot = jnp.arange(1, max_samples + 1, dtype=jnp.int32)
        sel = valid[:, :, None] & (rank[:, :, None] == slot[None, None, :])
        sel_k = jnp.sum(k[None, :, None] * sel, axis=1)         # [B, S]
        mask = jnp.any(sel, axis=1)
        return sel_k, mask
    raise ValueError(f"unknown select mode {select!r}")


class MarchResult(NamedTuple):
    xyzs: jnp.ndarray    # [N, S, 3] sample positions (clamped to ±bound)
    deltas: jnp.ndarray  # [N, S]   step sizes (constant dt where valid)
    ts: jnp.ndarray      # [N, S]   t *after* the step — the depth coordinate
                         #          (matches deltas[1]=t post-increment,
                         #           raymarching.cu:498-500)
    mask: jnp.ndarray    # [N, S]   bool, sample slot is a real occupied sample


def marching_dt(bound: float, grid_size: int, max_steps: int, cascade: int) -> float:
    """The constant step size of the production config (raymarching.cu:386-387)."""
    dt_max = 2.0 * SQRT3 * (1 << (cascade - 1)) / grid_size
    dt_min = min(dt_max, 2.0 * SQRT3 / max_steps)
    if not math.isclose(dt_min, dt_max):
        raise ValueError(
            "march_rays_uniform requires the constant-dt regime "
            f"(dt_min={dt_min} != dt_max={dt_max}); "
            "got max_steps too large for this grid/cascade."
        )
    return dt_max


def num_candidates(aabb, min_near: float, dt: float) -> int:
    """Static upper bound on lattice points along any ray through the aabb."""
    ext = [float(aabb[3] - aabb[0]), float(aabb[4] - aabb[1]), float(aabb[5] - aabb[2])]
    diag = math.sqrt(sum(e * e for e in ext))
    return int(math.ceil(diag / dt)) + 1


def march_rays_uniform(
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    nears: jnp.ndarray,
    fars: jnp.ndarray,
    occ_grid: jnp.ndarray,
    bound: float,
    dt: float,
    num_cand: int,
    max_samples: int,
    noise: Optional[jnp.ndarray] = None,
) -> MarchResult:
    """March all rays over the constant-dt lattice and keep the first
    `max_samples` occupied points per ray.

    Args:
      rays_o, rays_d: [N, 3]
      nears, fars: [N] from near_far_from_aabb
      occ_grid: [CAS, H, H, H] bool/uint8 occupancy (natural xyz order)
      bound: cubic scene half-extent (cascade 0 covers [-min(1,bound), ...])
      dt: constant step size (marching_dt)
      num_cand: static number of lattice candidates K
      max_samples: static samples kept per ray S
      noise: [N] in [0,1) start-jitter (perturb), or None
             (t0 += dt * noise, raymarching.cu:392)

    Returns MarchResult with [N, S] static shapes.
    """
    N = rays_o.shape[0]
    cascade, H = occ_grid.shape[0], occ_grid.shape[1]
    if max_samples > num_cand:
        raise ValueError(
            f"max_samples ({max_samples}) cannot exceed the candidate count "
            f"({num_cand}); a ray cannot keep more samples than the lattice "
            "points it tests")

    t0 = nears if noise is None else nears + dt * noise  # [N]
    k = jnp.arange(num_cand, dtype=jnp.float32)          # [K]
    t_cand = t0[:, None] + k[None, :] * dt               # [N, K]

    pos = rays_o[:, None, :] + t_cand[..., None] * rays_d[:, None, :]
    pos = jnp.clip(pos, -bound, bound)                   # [N, K, 3]

    # cascade (mip) selection — raymarching.cu:42-54,409
    if cascade > 1:
        mx = jnp.max(jnp.abs(pos), axis=-1)
        # frexp exponent: mx in [0.5,1) -> 0, [1,2) -> 1, ...
        exponent = jnp.floor(jnp.log2(jnp.maximum(mx, 1e-12))).astype(jnp.int32) + 1
        mip_pos = jnp.clip(exponent, 0, cascade - 1)
        mx_dt = dt * H * 0.5
        mip_dt = max(0, min(cascade - 1, int(math.floor(math.log2(max(mx_dt, 1e-12)))) + 1))
        level = jnp.maximum(mip_pos, mip_dt)             # [N, K]
    else:
        level = jnp.zeros(pos.shape[:-1], dtype=jnp.int32)

    mip_bound = jnp.minimum(jnp.exp2(level.astype(jnp.float32)), bound)  # [N, K]
    # voxel coords — raymarching.cu:415-417
    grid_pos = 0.5 * (pos / mip_bound[..., None] + 1.0) * H
    grid_pos = jnp.clip(grid_pos, 0.0, H - 1).astype(jnp.int32)          # [N, K, 3]

    flat = (
        level * (H * H * H)
        + grid_pos[..., 0] * (H * H)
        + grid_pos[..., 1] * H
        + grid_pos[..., 2]
    )                                                                    # [N, K]
    occ = occ_lookup(occ_grid, flat)

    valid = occ & (t_cand < fars[:, None])               # [N, K]

    # compact the first S valid candidates per ray: a static per-row top-k on
    # candidate order (replaces the CUDA two-pass atomic compaction)
    sel_k, mask = _first_s_select(valid, num_cand, max_samples, "topk")

    t_sel = t0[:, None] + sel_k * dt                     # [N, S]
    xyzs = rays_o[:, None, :] + t_sel[..., None] * rays_d[:, None, :]
    xyzs = jnp.clip(xyzs, -bound, bound)
    deltas = jnp.where(mask, dt, 0.0)
    ts = t_sel + dt                                      # post-step t (depth)

    return MarchResult(xyzs=xyzs, deltas=deltas, ts=ts, mask=mask)
