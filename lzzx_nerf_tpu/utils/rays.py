"""Ray generation (reference nerf_triplane/utils.py:217-312).

Same pixel convention as the reference: pixel centres at +0.5, pinhole model,
directions normalised then rotated by the c2w rotation. Random / patch / rect
selection modes are preserved; randomness is explicit via a JAX PRNG key.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp


def get_bg_coords(H: int, W: int) -> jnp.ndarray:
    """[1, H*W, 2] in [-1, 1] — coords[..., 0] spans rows (H), [..., 1] cols
    (reference utils.py:217-223)."""
    X = jnp.arange(H, dtype=jnp.float32) / (H - 1) * 2 - 1
    Y = jnp.arange(W, dtype=jnp.float32) / (W - 1) * 2 - 1
    xs, ys = jnp.meshgrid(X, Y, indexing="ij")
    return jnp.stack([xs.reshape(-1), ys.reshape(-1)], axis=-1)[None]


def get_rays(
    poses: jnp.ndarray,             # [B, 4, 4] c2w
    intrinsics,                     # (fx, fy, cx, cy)
    H: int,
    W: int,
    N: int = -1,
    patch_size: int = 1,
    rect: Optional[Tuple[int, int, int, int]] = None,
    rng: Optional[jax.Array] = None,
) -> Dict[str, jnp.ndarray]:
    """Build rays. N > 0 samples N pixels (random, patch-grid, or rect);
    N <= 0 returns all H*W rays. Returns dict(rays_o, rays_d [B,N,3],
    inds [B,N], i, j)."""
    B = poses.shape[0]
    fx, fy, cx, cy = [jnp.float32(v) for v in intrinsics]

    def pix_from_inds(inds):
        i = (inds % W).astype(jnp.float32) + 0.5
        j = (inds // W).astype(jnp.float32) + 0.5
        return i, j

    if rect is not None:
        xmin, xmax, ymin, ymax = rect
        # rect rows are xmin:xmax (first image axis), cols ymin:ymax
        rr = jnp.arange(xmin, xmax)
        cc = jnp.arange(ymin, ymax)
        gr, gc = jnp.meshgrid(rr, cc, indexing="ij")
        inds = (gr * W + gc).reshape(-1)
        inds = jnp.broadcast_to(inds[None], (B, inds.shape[0]))
        # NOTE: matches reference masking mask[xmin:xmax, ymin:ymax]
        # (utils.py:277-281) where the first axis is the row.
        i = (inds % W).astype(jnp.float32) + 0.5
        j = (inds // W).astype(jnp.float32) + 0.5
    elif N > 0:
        N = min(N, H * W)
        if patch_size > 1:
            assert rng is not None
            num_patch = N // (patch_size ** 2)
            kx, ky = jax.random.split(rng)
            inds_x = jax.random.randint(kx, (num_patch,), 0, H - patch_size)
            inds_y = jax.random.randint(ky, (num_patch,), 0, W - patch_size)
            pi, pj = jnp.meshgrid(jnp.arange(patch_size), jnp.arange(patch_size),
                                  indexing="ij")
            offs = jnp.stack([pi.reshape(-1), pj.reshape(-1)], axis=-1)  # [p^2,2]
            cells = jnp.stack([inds_x, inds_y], axis=-1)[:, None, :] + offs[None]
            cells = cells.reshape(-1, 2)
            inds = cells[:, 0] * W + cells[:, 1]
            inds = jnp.broadcast_to(inds[None], (B, inds.shape[0]))
        else:
            assert rng is not None
            inds = jax.random.randint(rng, (N,), 0, H * W)
            inds = jnp.broadcast_to(inds[None], (B, N))
        i = (inds % W).astype(jnp.float32) + 0.5
        j = (inds // W).astype(jnp.float32) + 0.5
    else:
        inds = jnp.broadcast_to(jnp.arange(H * W)[None], (B, H * W))
        i = (inds % W).astype(jnp.float32) + 0.5
        j = (inds // W).astype(jnp.float32) + 0.5

    zs = jnp.ones_like(i)
    xs = (i - cx) / fx * zs
    ys = (j - cy) / fy * zs
    directions = jnp.stack([xs, ys, zs], axis=-1)
    directions = directions / jnp.linalg.norm(directions, axis=-1, keepdims=True)

    rays_d = jnp.einsum("bnk,bjk->bnj", directions, poses[:, :3, :3])
    rays_o = jnp.broadcast_to(poses[:, None, :3, 3], rays_d.shape)

    return {"rays_o": rays_o, "rays_d": rays_d, "inds": inds, "i": i, "j": j}


def min_corner_dz(poses, intrinsics, H: int, W: int) -> float:
    """Smallest |world z| direction component over every pose's frame-corner
    rays (host-side numpy; poses [F, 4, 4] or [4, 4]). The window marcher's
    candidate count stretches by 1/|dz| (ops/march2.py
    window_candidates_for_scene) — corners are the obliquity extreme of a
    pinhole frame, and z is the column-interval reduction axis."""
    import numpy as np

    p = np.asarray(poses, np.float32)
    if p.ndim == 2:
        p = p[None]
    fx, fy, cx, cy = [float(v) for v in intrinsics]
    ii = np.array([0.5, W - 0.5, 0.5, W - 0.5], np.float32)
    jj = np.array([0.5, 0.5, H - 0.5, H - 0.5], np.float32)
    d = np.stack([(ii - cx) / fx, (jj - cy) / fy, np.ones(4, np.float32)],
                 -1)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    world = np.einsum("nk,fjk->fnj", d, p[:, :3, :3])
    return float(np.abs(world[..., 2]).min())
