"""Renderer static settings + dynamic occupancy state.

The reference keeps this state as registered buffers on NeRFRenderer
(nerf_triplane/renderer.py:134-155); here it is an explicit pytree passed
through jitted functions, which is what makes one render program shared by
train / eval / inference.

Notes vs the reference:
- density_grid is natural [CAS, H, H, H] order (not Morton) — see ops.morton.
- the occupancy "bitfield" is a bool array of the same shape; TPU gathers
  don't benefit from bit-packing and the unpacked form avoids per-lookup
  bit arithmetic.
- step_counter / mean_count (the instant-ngp point-budget trick,
  raymarching/raymarching.py:186-280) is obsolete: the static-shape marcher
  has a fixed per-ray budget by construction.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import NamedTuple, Tuple

import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..ops.march import marching_dt, num_candidates


@dataclass(frozen=True)
class RenderSettings:
    """Static (trace-time) renderer configuration."""

    bound: float = 1.0
    cascade: int = 1
    grid_size: int = 128
    max_steps: int = 16           # S: samples kept per ray
    num_cand: int = 112           # K: lattice candidates per ray
    dt: float = 2.0 * math.sqrt(3.0) / 128
    min_near: float = 0.05
    T_thresh: float = 1e-4
    density_thresh: float = 10.0
    density_thresh_torso: float = 0.01
    density_scale: float = 1.0
    aabb: Tuple[float, float, float, float, float, float] = (-1, -0.5, -1, 1, 0.5, 1)
    exp_eye: bool = True
    torso_shrink: float = 0.8

    @staticmethod
    def from_config(cfg: Config) -> "RenderSettings":
        dt = marching_dt(cfg.bound, cfg.grid_size, cfg.max_steps, cfg.cascade)
        aabb = cfg.aabb()
        return RenderSettings(
            bound=cfg.bound,
            cascade=cfg.cascade,
            grid_size=cfg.grid_size,
            max_steps=cfg.max_steps,
            num_cand=num_candidates(aabb, cfg.min_near, dt),
            dt=dt,
            min_near=cfg.min_near,
            T_thresh=cfg.T_thresh,
            density_thresh=cfg.density_thresh,
            density_thresh_torso=cfg.density_thresh_torso,
            density_scale=cfg.density_scale,
            aabb=aabb,
            exp_eye=cfg.exp_eye,
            torso_shrink=cfg.torso_shrink,
        )


class OccupancyState(NamedTuple):
    """Dynamic occupancy-grid state (a pytree; lives across steps)."""

    density_grid: jnp.ndarray        # [CAS, H, H, H] f32; -1 marks untrained cells
    occ: jnp.ndarray                 # [CAS, H, H, H] bool
    mean_density: jnp.ndarray        # scalar f32
    iter_density: jnp.ndarray        # scalar i32
    density_grid_torso: jnp.ndarray  # [H, H] f32
    mean_density_torso: jnp.ndarray  # scalar f32


def init_occupancy_state(settings: RenderSettings) -> OccupancyState:
    H, C = settings.grid_size, settings.cascade
    return OccupancyState(
        density_grid=jnp.zeros((C, H, H, H), jnp.float32),
        occ=jnp.zeros((C, H, H, H), jnp.bool_),
        mean_density=jnp.zeros((), jnp.float32),
        iter_density=jnp.zeros((), jnp.int32),
        density_grid_torso=jnp.zeros((H, H), jnp.float32),
        mean_density_torso=jnp.zeros((), jnp.float32),
    )
