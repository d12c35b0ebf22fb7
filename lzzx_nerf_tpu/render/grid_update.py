"""Occupancy-grid maintenance, fully jitted.

Replaces NeRFRenderer.update_extra_state / mark_untrained_grid
(nerf_triplane/renderer.py:633-820). The reference's X/Y/Z chunk loops exist
only to bound CUDA VRAM; on TPU the full 128³ grid query is one batched field
evaluation (2M points, tiny MLPs — an MXU-friendly matmul), so the whole
update is a single XLA program called every `update_extra_interval` steps.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.morton import dilate_grid3d
from .state import OccupancyState, RenderSettings


def _cell_coords(H: int) -> jnp.ndarray:
    """[H^3, 3] integer cell coords in natural (x, y, z) order."""
    r = jnp.arange(H, dtype=jnp.int32)
    x, y, z = jnp.meshgrid(r, r, r, indexing="ij")
    return jnp.stack([x.reshape(-1), y.reshape(-1), z.reshape(-1)], axis=-1)


def update_density_grid(
    density_fn,
    settings: RenderSettings,
    state: OccupancyState,
    enc_a: jnp.ndarray,
    eye,
    rng: jax.Array,
    decay: float = 0.95,
) -> OccupancyState:
    """One head-grid refresh (reference renderer.py:699-766):
    query density at every (jittered) cell per cascade, 6-neighbour dilate,
    EMA-max with the old grid, re-threshold the occupancy.

    density_fn(pts [M,3], enc_a, eye) -> sigma [M]."""
    H, C = settings.grid_size, settings.cascade
    coords = _cell_coords(H)                                   # [H^3, 3]
    xyzs = 2.0 * coords.astype(jnp.float32) / (H - 1) - 1.0    # [-1, 1]

    cas_grids = []
    for cas in range(C):
        bound = min(2 ** cas, settings.bound)
        half = bound / H
        pts = xyzs * (bound - half)
        rng, sub = jax.random.split(rng)
        pts = pts + (jax.random.uniform(sub, pts.shape) * 2.0 - 1.0) * half
        sigma = density_fn(pts, enc_a, eye) * settings.density_scale
        cas_grids.append(sigma.reshape(H, H, H))
    tmp = jnp.stack(cas_grids, axis=0)                         # [C, H, H, H]

    tmp = dilate_grid3d(tmp)

    old = state.density_grid
    valid = (old >= 0) & (tmp >= 0)
    new_grid = jnp.where(valid, jnp.maximum(old * decay, tmp), old)
    mean_density = jnp.mean(jnp.clip(new_grid, 0.0))
    thresh = jnp.minimum(mean_density, settings.density_thresh)
    occ = new_grid > thresh

    return state._replace(
        density_grid=new_grid,
        occ=occ,
        mean_density=mean_density,
        iter_density=state.iter_density + 1,
    )


def update_torso_grid(
    torso_alpha_fn,
    settings: RenderSettings,
    state: OccupancyState,
    pose: jnp.ndarray,
    ind_code_torso,
    rng: jax.Array,
    decay: float = 0.95,
) -> OccupancyState:
    """Torso 2-D grid refresh (reference renderer.py:769-809): query alpha on
    the jittered cell lattice, 5x5 max-pool dilation, EMA-max.

    torso_alpha_fn(xys [M,2], pose, c) -> alpha [M]."""
    H = settings.grid_size
    r = jnp.arange(H, dtype=jnp.int32)
    cx, cy = jnp.meshgrid(r, r, indexing="ij")
    coords = jnp.stack([cx.reshape(-1), cy.reshape(-1)], axis=-1)  # [H^2, 2]
    half = 1.0 / H
    xys = (2.0 * coords.astype(jnp.float32) / (H - 1) - 1.0) * (1.0 - half)
    xys = xys + (jax.random.uniform(rng, xys.shape) * 2.0 - 1.0) * half

    alphas = torso_alpha_fn(xys, pose, ind_code_torso)             # [H^2]
    # NOTE xy transposed flat index (reference renderer.py:791): value for
    # coords (c0, c1) lands at row c1, col c0 — matching the grid_sample
    # convention used at lookup time (renderer.py:604-605).
    tmp = jnp.zeros((H, H), jnp.float32).at[coords[:, 1], coords[:, 0]].set(alphas)

    # 5x5 max-pool, stride 1, pad 2 (renderer.py:805)
    tmp = jax.lax.reduce_window(
        tmp, -jnp.inf, jax.lax.max, (5, 5), (1, 1), "SAME"
    )

    new = jnp.maximum(state.density_grid_torso * decay, tmp)
    return state._replace(
        density_grid_torso=new,
        mean_density_torso=jnp.mean(new),
    )


def make_density_grid_update(field, settings: RenderSettings,
                             decay: float = 0.95):
    """ONE jitted XLA program for the whole every-16-step head refresh:
    audio encode + full-grid density query (2M points at grid 128) +
    dilation + EMA-max + re-threshold.

    Calling update_density_grid directly with a python density_fn executes
    the refresh EAGERLY — the field apply inside dispatches dozens of
    unfused ops at ~10 ms each over a remote-dispatch link, ~0.3 s per
    refresh = ~20 ms/step amortized at interval 16 (scripts/trainbench.py
    round-3 A/B: 5.64 -> 6.37 it/s from jitting the refresh + folding the
    per-step rng split into the step).

    Returned fn: refresh(params, occ_state, auds, eye, rng, step) -> occ.
    `rng` can be a constant base key — it is folded with `step` inside the
    program, so callers pay zero per-call eager ops."""

    def refresh(params, state: OccupancyState, auds, eye, rng, step):
        # fold a domain tag on top of the step: the train step folds the
        # SAME (rng, step) pair, and without the tag the refresh's cell
        # jitter and the step's ray-lattice noise would be bit-identical
        # draws (occupancy probed at exactly the points that then jitter
        # the rays) — correlated sampling every refresh step.
        rng = jax.random.fold_in(jax.random.fold_in(rng, step), 0x6772)
        enc_a = field.apply(params, auds, method="encode_audio")

        def density_fn(pts, ea, ey):
            return field.apply(params, pts, ea, ey, method="density").sigma

        return update_density_grid(density_fn, settings, state, enc_a, eye,
                                   rng, decay=decay)

    return jax.jit(refresh)


def make_torso_grid_update(torso, settings: RenderSettings,
                           ind_dim_torso: int, decay: float = 0.95):
    """Jitted torso-grid refresh (same eager-dispatch rationale as
    make_density_grid_update): refresh(params, occ_state, pose, rng, step)
    -> occ."""

    def refresh(params, state: OccupancyState, pose, rng, step):
        # domain tag: see make_density_grid_update — the torso step consumes
        # the identical folded (rng, step) key directly for pixel selection.
        rng = jax.random.fold_in(jax.random.fold_in(rng, step), 0x746F)
        c = (params["params"]["individual_codes_torso"][0]
             if ind_dim_torso > 0 else None)

        def alpha_fn(xys, pose_, cc):
            a, _, _ = torso.apply(params, xys, pose_, cc)
            return a[:, 0]

        return update_torso_grid(alpha_fn, settings, state, pose, c, rng,
                                 decay=decay)

    return jax.jit(refresh)


def probe_field_grid(
    probe_fn,
    settings: RenderSettings,
    rng: jax.Array,
) -> jnp.ndarray:
    """Diagnostic grids: evaluate `probe_fn(pts [M,3]) -> [M]` (e.g. the
    field's ambient_aud or ambient_eye response) on the jittered cell
    lattice and dilate — the TPU equivalent of get_audio_grid /
    get_eye_grid (reference renderer.py:822-936)."""
    H, C = settings.grid_size, settings.cascade
    coords = _cell_coords(H)
    xyzs = 2.0 * coords.astype(jnp.float32) / (H - 1) - 1.0
    cas_grids = []
    for cas in range(C):
        bound = min(2 ** cas, settings.bound)
        half = bound / H
        pts = xyzs * (bound - half)
        rng, sub = jax.random.split(rng)
        pts = pts + (jax.random.uniform(sub, pts.shape) * 2.0 - 1.0) * half
        cas_grids.append(probe_fn(pts).reshape(H, H, H))
    return dilate_grid3d(jnp.stack(cas_grids, axis=0))


def mark_untrained_grid(
    settings: RenderSettings,
    state: OccupancyState,
    poses: jnp.ndarray,       # [B, 4, 4] c2w
    intrinsics,               # (fx, fy, cx, cy)
    chunk: int = 64,
) -> OccupancyState:
    """Mark cells not visible from any training camera as -1
    (reference renderer.py:633-697). Chunked scan over poses to bound memory
    at [chunk, H^3]."""
    H, C = settings.grid_size, settings.cascade
    fx, fy, cx, cy = [float(v) for v in intrinsics]
    coords = _cell_coords(H)
    world = 2.0 * coords.astype(jnp.float32) / (H - 1) - 1.0       # [H^3, 3]

    B = poses.shape[0]
    pad = (-B) % chunk
    poses_p = jnp.concatenate([poses, jnp.tile(poses[-1:], (pad, 1, 1))], axis=0)
    pose_chunks = poses_p.reshape(-1, chunk, 4, 4)

    counts = []
    for cas in range(C):
        bound = min(2 ** cas, settings.bound)
        half = bound / H
        pts = world * (bound - half)                               # [H^3, 3]

        def body(cnt, pc):
            # world -> cam: subtract translation, multiply by R (c2w rotation,
            # used untransposed as in reference renderer.py:680-682)
            rel = pts[None, :, :] - pc[:, None, :3, 3]             # [c, M, 3]
            cam = jnp.einsum("cmi,cij->cmj", rel, pc[:, :3, :3])
            vis = (
                (cam[..., 2] > 0)
                & (jnp.abs(cam[..., 0]) < cx / fx * cam[..., 2] + half * 2)
                & (jnp.abs(cam[..., 1]) < cy / fy * cam[..., 2] + half * 2)
            )
            return cnt + vis.sum(axis=0), None

        cnt, _ = jax.lax.scan(body, jnp.zeros(pts.shape[0], jnp.int32), pose_chunks)
        counts.append(cnt.reshape(H, H, H))

    count = jnp.stack(counts, axis=0)
    new_grid = jnp.where(count == 0, -1.0, state.density_grid)
    return state._replace(density_grid=new_grid)
