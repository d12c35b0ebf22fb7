"""Multiresolution hash / tiled grid encoding (instant-ngp style).

TPU-native replacement for the reference's gridencoder CUDA extension
(gridencoder/src/gridencoder.cu, wrapper gridencoder/grid.py). Same math:

- per-level scale   = 2^(level*log2(per_level_scale)) * base_res - 1
  and resolution    = ceil(scale) + 1                      (gridencoder.cu:125-126)
- corner position   = floor(x*scale + 0.5) (+ corner bit)  (align_corners=False)
- index: dense row-major while the level table fits, else XOR-prime hash
  {1, 2654435761, 805459861}, then `index % hashmap_size`  (gridencoder.cu:36-72)
- 2^D-corner linear interpolation                          (gridencoder.cu:144-169)
- out-of-[0,1] inputs produce zeros                        (gridencoder.cu:98-122)
- per-level tables padded to a multiple of 8 entries       (grid.py:110-125)

Design differences (deliberate, TPU-first):
- One batched `jnp.take` gather per (level, corner) instead of a
  thread-per-point kernel; XLA fuses the lerp into the gather consumers.
- The backward pass is XLA's transpose-of-gather (a segment-sum style
  scatter-add), replacing the CUDA atomicAdd kernel — no atomics on TPU.
- Input gradients come from autodiff through the interpolation weights,
  which equals the reference's analytic dy_dx (floor() has zero gradient).
- Tables stay fp32 (the reference halves them under AMP only when C%2==0;
  on TPU we keep encodings fp32 for quality and cast at the MLP boundary).

All per-level shapes/strides are static Python ints, so the whole encode is
a single fused XLA program with no dynamic shapes.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

# XOR-prime hash constants (instant-ngp); index d multiplies primes[d].
_PRIMES = (1, 2654435761, 805459861, 3674653429, 2097192037, 1434869437, 2165219737)


@dataclass(frozen=True)
class GridSpec:
    """Static metadata for one multiresolution grid encoder."""

    input_dim: int
    num_levels: int
    level_dim: int
    per_level_scale: float
    base_resolution: int
    log2_hashmap_size: int
    gridtype: str = "hash"          # "hash" | "tiled"
    align_corners: bool = False
    # derived (filled by make_grid_spec)
    offsets: Tuple[int, ...] = ()            # [L+1] row offsets into the table
    resolutions: Tuple[int, ...] = ()        # [L]
    scales: Tuple[float, ...] = ()           # [L]
    use_hash: Tuple[bool, ...] = ()          # [L] hash path vs dense path
    dense_dims: Tuple[int, ...] = ()         # [L] how many dims the dense index covers

    @property
    def output_dim(self) -> int:
        return self.num_levels * self.level_dim

    @property
    def total_params(self) -> int:
        return self.offsets[-1]

    def hashmap_size(self, level: int) -> int:
        return self.offsets[level + 1] - self.offsets[level]


def make_grid_spec(
    input_dim: int = 3,
    num_levels: int = 16,
    level_dim: int = 2,
    per_level_scale: float = 2.0,
    base_resolution: int = 16,
    log2_hashmap_size: int = 19,
    desired_resolution: float | None = None,
    gridtype: str = "hash",
    align_corners: bool = False,
) -> GridSpec:
    """Mirrors the table-sizing logic of reference gridencoder/grid.py:92-125."""
    if desired_resolution is not None:
        per_level_scale = float(
            np.exp2(np.log2(desired_resolution / base_resolution) / (num_levels - 1))
        )
    max_params = 2 ** log2_hashmap_size

    offsets = [0]
    resolutions = []
    scales = []
    use_hash = []
    dense_dims = []
    for lvl in range(num_levels):
        # the CUDA kernel recomputes resolution as ceil(2^(l*S)*H - 1) + 1,
        # which equals ceil(H * f^l) for every case; keep the kernel's form.
        scale = float(np.exp2(lvl * np.log2(per_level_scale)) * base_resolution - 1.0)
        resolution = int(np.ceil(scale)) + 1
        side = resolution if align_corners else resolution + 1
        params_in_level = min(max_params, side ** input_dim)
        params_in_level = int(np.ceil(params_in_level / 8) * 8)  # pad to 8
        offsets.append(offsets[-1] + params_in_level)
        resolutions.append(resolution)
        scales.append(scale)
        # dense indexing covers dims while the running stride fits the table
        # (gridencoder.cu:59-63); the hash path replaces it entirely when the
        # full dense table would not fit (gridencoder.cu:67-69).
        stride = 1
        nd = 0
        for _ in range(input_dim):
            if stride > params_in_level:
                break
            nd += 1
            stride *= side
        use_hash.append(gridtype == "hash" and stride > params_in_level)
        dense_dims.append(nd)

    return GridSpec(
        input_dim=input_dim,
        num_levels=num_levels,
        level_dim=level_dim,
        per_level_scale=float(per_level_scale),
        base_resolution=base_resolution,
        log2_hashmap_size=log2_hashmap_size,
        gridtype=gridtype,
        align_corners=align_corners,
        offsets=tuple(offsets),
        resolutions=tuple(resolutions),
        scales=tuple(scales),
        use_hash=tuple(use_hash),
        dense_dims=tuple(dense_dims),
    )


def init_grid_embeddings(key: jax.Array, spec: GridSpec, dtype=jnp.float32) -> jnp.ndarray:
    """Uniform ±1e-4 init (reference gridencoder/grid.py:132-134)."""
    return jax.random.uniform(
        key, (spec.total_params, spec.level_dim), dtype=dtype, minval=-1e-4, maxval=1e-4
    )


def _level_indices(spec: GridSpec, level: int, corner_pos: list) -> jnp.ndarray:
    """Flat table row index for one corner at one level. corner_pos: D × [B] uint32."""
    hashmap_size = spec.hashmap_size(level)
    resolution = spec.resolutions[level]
    side = resolution if spec.align_corners else resolution + 1

    if spec.use_hash[level]:
        index = jnp.zeros_like(corner_pos[0])
        for d in range(spec.input_dim):
            index = index ^ (corner_pos[d] * np.uint32(_PRIMES[d]))
    else:
        index = jnp.zeros_like(corner_pos[0])
        stride = 1
        for d in range(spec.dense_dims[level]):
            index = index + corner_pos[d] * np.uint32(stride)
            stride *= side
    return (index % np.uint32(hashmap_size)).astype(jnp.int32) + spec.offsets[level]


def grid_encode(
    x: jnp.ndarray,
    embeddings: jnp.ndarray,
    spec: GridSpec,
    bound: float = 1.0,
) -> jnp.ndarray:
    """Encode positions through the multiresolution grid.

    Args:
      x: [..., D] positions in [-bound, bound].
      embeddings: [total_params, level_dim] table (one flat array, all levels).
      spec: static GridSpec.
      bound: half-extent of the input domain.

    Returns:
      [..., num_levels * level_dim] features, level-major inside the last axis
      (matching the reference's [B, L*C] output layout, gridencoder/grid.py:52).
    """
    D = spec.input_dim
    batch_shape = x.shape[:-1]
    xf = x.reshape(-1, D).astype(jnp.float32)
    u = (xf + bound) / (2.0 * bound)  # [B, D] in [0, 1]

    # out-of-bound inputs produce zero features (gridencoder.cu:98-122)
    in_bounds = jnp.all((u >= 0.0) & (u <= 1.0), axis=-1)  # [B]
    # clamp so gathers stay in range for masked-out points
    uc = jnp.clip(u, 0.0, 1.0)

    shift = 0.0 if spec.align_corners else 0.5
    n_corners = 1 << D

    level_feats = []
    for lvl in range(spec.num_levels):
        scale = spec.scales[lvl]
        pos = uc * scale + shift                      # [B, D]
        pos_grid = jnp.floor(pos)
        frac = pos - pos_grid                         # [B, D]
        base = pos_grid.astype(jnp.uint32)

        acc = None
        for corner in range(n_corners):
            w = None
            corner_pos = []
            for d in range(D):
                if corner & (1 << d):
                    wd = frac[:, d]
                    corner_pos.append(base[:, d] + np.uint32(1))
                else:
                    wd = 1.0 - frac[:, d]
                    corner_pos.append(base[:, d])
                w = wd if w is None else w * wd
            rows = _level_indices(spec, lvl, corner_pos)          # [B]
            vals = jnp.take(embeddings, rows, axis=0)             # [B, C]
            contrib = w[:, None] * vals
            acc = contrib if acc is None else acc + contrib
        level_feats.append(acc)

    out = jnp.concatenate(level_feats, axis=-1)                   # [B, L*C]
    out = jnp.where(in_bounds[:, None], out, 0.0)
    return out.reshape(*batch_shape, spec.output_dim)
