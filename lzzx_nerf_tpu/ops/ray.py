"""Ray/AABB utilities.

TPU-native replacement for kernel_near_far_from_aabb
(raymarching/src/raymarching.cu:92-145) — a vectorised slab test.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

_BIG = 3.4e38  # matches the CUDA kernel writing FLT_MAX for missed rays


def near_far_from_aabb(
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    aabb: jnp.ndarray,
    min_near: float = 0.05,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Slab test of rays against an axis-aligned box.

    Args:
      rays_o, rays_d: [..., 3]
      aabb: [6] (xmin, ymin, zmin, xmax, ymax, zmax)
      min_near: minimum near distance clamp.

    Returns:
      nears, fars: [...] — both FLT_MAX when the ray misses the box
      (raymarching.cu:121-124,133-136).
    """
    rd = 1.0 / rays_d
    t0 = (aabb[:3] - rays_o) * rd  # [..., 3]
    t1 = (aabb[3:] - rays_o) * rd
    tmin = jnp.minimum(t0, t1)
    tmax = jnp.maximum(t0, t1)
    near = jnp.max(tmin, axis=-1)
    far = jnp.min(tmax, axis=-1)
    miss = near > far
    near = jnp.maximum(near, min_near)
    near = jnp.where(miss, _BIG, near)
    far = jnp.where(miss, _BIG, far)
    return near, far


def sph_from_ray(rays_o: jnp.ndarray, rays_d: jnp.ndarray,
                 radius: float) -> jnp.ndarray:
    """Background-sphere (theta, phi) coordinates of each ray's far
    intersection with a sphere of `radius`, normalised to [-1, 1]
    (reference kernel_sph_from_ray, raymarching.cu:163-198; part of the
    raymarching API surface, unused by the talking-head app)."""
    o, d = rays_o, rays_d
    A = jnp.sum(d * d, axis=-1)
    B = jnp.sum(o * d, axis=-1)  # B/2 in the quadratic
    C = jnp.sum(o * o, axis=-1) - radius * radius
    t = (-B + jnp.sqrt(jnp.maximum(B * B - A * C, 0.0))) / A
    p = o + t[..., None] * d
    theta = jnp.arctan2(jnp.sqrt(p[..., 0] ** 2 + p[..., 2] ** 2), p[..., 1])
    phi = jnp.arctan2(p[..., 2], p[..., 0])
    inv_pi = 1.0 / jnp.pi
    return jnp.stack([2 * theta * inv_pi - 1, phi * inv_pi], axis=-1)
