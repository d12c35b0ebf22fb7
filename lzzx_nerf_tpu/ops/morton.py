"""Occupancy-grid bit utilities: Morton codes, packbits, dilation.

TPU-native replacement for the utility kernels in
raymarching/src/raymarching.cu (morton3D 56-88/214-265, packbits 268-301,
morton3D_dilation 304-341).

Design difference (deliberate): the CUDA pipeline keeps the density grid in
Morton order because the marching kernel's bitfield lookups are cache-local
that way. On TPU the occupancy grid lives as a natural-order [CAS, H, H, H]
array — gathers are batched and the (8,128) tiling doesn't care about Morton
locality — so the hot path never touches Morton codes. The Morton encode /
decode / packbits functions are still provided for checkpoint compatibility
and parity testing; dilation operates directly on the natural-order grid
(same 6-neighbour max the CUDA kernel computes).
"""

from __future__ import annotations

import functools

import jax.numpy as jnp


def _expand_bits(v: jnp.ndarray) -> jnp.ndarray:
    # raymarching.cu:56-63
    v = (v * jnp.uint32(0x00010001)) & jnp.uint32(0xFF0000FF)
    v = (v * jnp.uint32(0x00000101)) & jnp.uint32(0x0F00F00F)
    v = (v * jnp.uint32(0x00000011)) & jnp.uint32(0xC30C30C3)
    v = (v * jnp.uint32(0x00000005)) & jnp.uint32(0x49249249)
    return v


def morton3d(coords: jnp.ndarray) -> jnp.ndarray:
    """coords: [..., 3] int in [0, 1024) -> [...] Morton codes (int32)."""
    c = coords.astype(jnp.uint32)
    x = _expand_bits(c[..., 0])
    y = _expand_bits(c[..., 1])
    z = _expand_bits(c[..., 2])
    return (x | (y << 1) | (z << 2)).astype(jnp.int32)


def _compact_bits(x: jnp.ndarray) -> jnp.ndarray:
    # raymarching.cu:73-81
    x = x & jnp.uint32(0x49249249)
    x = (x | (x >> 2)) & jnp.uint32(0xC30C30C3)
    x = (x | (x >> 4)) & jnp.uint32(0x0F00F00F)
    x = (x | (x >> 8)) & jnp.uint32(0xFF0000FF)
    x = (x | (x >> 16)) & jnp.uint32(0x0000FFFF)
    return x


def morton3d_invert(indices: jnp.ndarray) -> jnp.ndarray:
    """[...] Morton codes -> [..., 3] int32 coords."""
    i = indices.astype(jnp.uint32)
    return jnp.stack(
        [
            _compact_bits(i >> 0),
            _compact_bits(i >> 1),
            _compact_bits(i >> 2),
        ],
        axis=-1,
    ).astype(jnp.int32)


def morton_perm(H: int):
    """Permutation mapping natural xyz order to morton buffer slots:
    `flat[:, perm] = natural.reshape(-1, H**3)` mortonises, and
    `natural = flat[:, perm]` de-mortonises — ONE definition shared by the
    checkpoint import/export scripts, which must stay exact inverses for
    the bitwise interchange roundtrip (tests/test_convert.py). Cached:
    the grid-128 table is 2M entries behind a jitted morton3d dispatch."""
    return _morton_perm_cached(H)


@functools.lru_cache(maxsize=8)
def _morton_perm_cached(H: int):
    import numpy as np

    coords = np.stack(np.meshgrid(np.arange(H), np.arange(H), np.arange(H),
                                  indexing="ij"), -1).reshape(-1, 3)
    return np.asarray(morton3d(jnp.asarray(coords, jnp.uint32)))


def packbits(grid: jnp.ndarray, density_thresh: float) -> jnp.ndarray:
    """Flat density grid -> uint8 bitfield, 8 consecutive cells per byte,
    bit i = cell (8n + i) > thresh (raymarching.cu:268-289)."""
    flat = grid.reshape(-1, 8)
    bits = (flat > density_thresh).astype(jnp.uint8)
    weights = jnp.asarray([1, 2, 4, 8, 16, 32, 64, 128], dtype=jnp.uint8)
    return (bits * weights).sum(axis=-1, dtype=jnp.uint8)


def unpack_bitfield(bitfield: jnp.ndarray) -> jnp.ndarray:
    """uint8 bitfield [M] -> bool occupancy [M*8] (inverse of packbits)."""
    shifts = jnp.arange(8, dtype=jnp.uint8)
    return ((bitfield[:, None] >> shifts) & 1).astype(jnp.bool_).reshape(-1)


def dilate_grid3d(grid: jnp.ndarray) -> jnp.ndarray:
    """6-neighbour max dilation of a [..., H, H, H] grid.

    Equivalent to the CUDA morton3D_dilation kernel (raymarching.cu:304-335),
    which takes max over the centre and its ±1 neighbours along each axis
    (NOT a full 3x3x3 pool), expressed as shifted maxes on the natural-order
    array.
    """
    out = grid

    # neighbour values with edge replication (edge cells have fewer
    # neighbours; replicating the cell's own value is a no-op under max)
    def shifted(g, axis, direction):
        pad = [(0, 0)] * g.ndim
        if direction > 0:
            sl = [slice(None)] * g.ndim
            sl[axis] = slice(1, None)
            pad[axis] = (0, 1)
        else:
            sl = [slice(None)] * g.ndim
            sl[axis] = slice(None, -1)
            pad[axis] = (1, 0)
        return jnp.pad(g[tuple(sl)], pad, mode="edge")

    for axis in (-3, -2, -1):
        out = jnp.maximum(out, shifted(grid, axis, +1))
        out = jnp.maximum(out, shifted(grid, axis, -1))
    return out
