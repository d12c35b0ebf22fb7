"""Dense nested-octave triplane encoding with corner-packed lookup rows.

THE TPU-native replacement for the instant-ngp hash-grid triplane on the hot
path. Motivation (measured on v5e): XLA TPU gathers retire ~110M rows/s
regardless of row width, and the hash encoder needs 12 levels x 4 corners x
3 planes = 144 one-float gather rows per sample — ~1.2 s per 256² frame.
This encoder restructures the same multiresolution-triplane capability so a
sample needs ONE gather row per plane:

- Levels are DENSE 2-D grids at nested power-of-two resolutions
  (64..512 by default). 2-D planes make dense storage cheap (~2.3M params
  per plane) — the hash table exists to compress 3-D grids into GPU L2 and
  buys nothing on TPU.
- Nesting means a query's cell at every level is determined by its cell at
  the finest level, so all levels' 4 bilinear corners can be PACKED into one
  row of a [R², 4·ΣC] table keyed by the finest cell.
- The packed table is BAKED from the level parameters with pure dense ops
  (slice + repeat): ~0.5 ms per plane, fully differentiable (the transpose
  of repeat is a block-sum), so training runs through the same path.
- A lookup is then: 1 gather row + per-level bilinear weights (VPU math).

Gather rows per 512² frame @16 samples: 12.6M (vs 600M for the hash path).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class DenseTriplaneSpec:
    # 12 features per plane (3 planes -> 36 total), matching the reference's
    # triplane feature width (12 levels x 1ch; here 4 nested octaves with
    # decreasing channel counts — dense 2-D storage needs no hashing)
    resolutions: Tuple[int, ...] = (64, 128, 256, 512)
    channels: Tuple[int, ...] = (4, 3, 3, 2)
    # pack_shift k keys rows by the (fine_res >> k)-res cell. Measured on
    # v5e: gathers from tables <= ~64K rows (VMEM-resident) run ~300M rows/s
    # vs ~88M rows/s beyond — so k=1 (512² fine res -> 65536 rows of 58
    # floats) is ~3x faster than k=0 (262144 rows of 48). Levels finer than
    # the packing res store their full (ratio+1)² point window per row and
    # the lookup selects the 4 bilinear corners in-register.
    pack_shift: int = 1

    def __post_init__(self):
        R = self.resolutions[-1]
        assert tuple(sorted(self.resolutions)) == tuple(self.resolutions), (
            "resolutions must be ascending (fine_res is the last entry)")
        for r in self.resolutions:
            assert R % r == 0 and (R // r) & (R // r - 1) == 0, (
                "resolutions must nest by powers of two")
        assert 0 <= self.pack_shift and self.pack_res >= 1, (
            f"pack_shift {self.pack_shift} leaves no packing resolution")

    @property
    def output_dim(self) -> int:
        return sum(self.channels)

    @property
    def fine_res(self) -> int:
        return self.resolutions[-1]

    @property
    def pack_res(self) -> int:
        return self.fine_res >> self.pack_shift

    def level_points(self, r: int) -> int:
        """Grid points stored per row for a level of resolution r."""
        if r <= self.pack_res:
            return 4
        ratio = r // self.pack_res
        return (ratio + 1) ** 2

    @property
    def packed_dim(self) -> int:
        return sum(self.level_points(r) * c
                   for r, c in zip(self.resolutions, self.channels))

    @property
    def num_params(self) -> int:
        return sum((r + 1) ** 2 * c
                   for r, c in zip(self.resolutions, self.channels))


def init_dense_planes(key: jax.Array, spec: DenseTriplaneSpec,
                      scale: float = 1e-4) -> List[jnp.ndarray]:
    """Per-level [r+1, r+1, C] grids, uniform ±scale (same init magnitude as
    the reference hash tables, gridencoder/grid.py:132-134)."""
    keys = jax.random.split(key, len(spec.resolutions))
    return [
        jax.random.uniform(k, (r + 1, r + 1, c), jnp.float32, -scale, scale)
        for k, r, c in zip(keys, spec.resolutions, spec.channels)
    ]


def bake_packed(levels: Sequence[jnp.ndarray], spec: DenseTriplaneSpec,
                dtype=jnp.float32) -> jnp.ndarray:
    """Levels -> packed table [pack_res², packed_dim].

    Row layout per level l (in order):
    - r <= pack_res: 4 bilinear corner blocks [c00 | c10 | c01 | c11] where
      cXY is the grid value at (cell_x + X, cell_y + Y).
    - r >  pack_res (ratio = r / pack_res): the (ratio+1)² point window
      A[ratio*cx + i, ratio*cy + j], i-major, from which the lookup picks
      any contained fine cell's 4 corners."""
    P = spec.pack_res
    parts = []
    for lvl, (r, C) in enumerate(zip(spec.resolutions, spec.channels)):
        A = levels[lvl]
        if r <= spec.pack_res:
            corners = (A[:-1, :-1], A[1:, :-1], A[:-1, 1:], A[1:, 1:])
            s = P // r
            for c in corners:
                up = c if s == 1 else jnp.repeat(jnp.repeat(c, s, 0), s, 1)
                parts.append(up)
        else:
            ratio = r // spec.pack_res
            for i in range(ratio + 1):
                for j in range(ratio + 1):
                    blk = A[i::ratio, j::ratio][:P, :P]
                    parts.append(blk)
    # assemble in the level dtype and cast ONCE at the end: a bf16 serving
    # table (half the bytes -> VMEM-resident -> 3x gather rate on v5e) must
    # not cast per-part — per-part bf16 repeat/concat faults the axon
    # platform (measured), and a single final cast is also cheaper
    out = jnp.concatenate(parts, axis=-1).reshape(P * P, spec.packed_dim)
    return out.astype(dtype)


def packed_lookup(packed: jnp.ndarray, xy01: jnp.ndarray,
                  spec: DenseTriplaneSpec,
                  interp_dtype=jnp.float32) -> jnp.ndarray:
    """Bilinear multiresolution features via one gather row per point.

    packed: [pack_res², packed_dim] from bake_packed.
    xy01: [B, 2] coordinates in [0, 1] (points outside produce zeros).
    Returns [B, output_dim] f32 (level-major channel order).

    interp_dtype: dtype of the per-point interpolation arithmetic. The
    default keeps reference-f32 math (a bf16 serving table upcasts right
    after the gather). jnp.bfloat16 keeps the gathered rows in bf16
    through the corner combine and converts only the [B, output_dim]
    result — the profiler showed the f32 materialization of the
    [786432, 58] row tensor (3 planes x ~320 us + relayout copies) in
    the 512² frame; bf16 weights quantize the bilinear fractions to 8
    mantissa bits (≤1/256-cell positional error) on features that are
    already bf16-quantized. Serving-only; gate any default change on the
    quality guard."""
    P = spec.pack_res
    in_bounds = jnp.all((xy01 >= 0.0) & (xy01 <= 1.0), axis=-1)
    u = jnp.clip(xy01, 0.0, 1.0)

    pc = jnp.clip(jnp.floor(u * P), 0, P - 1).astype(jnp.int32)     # [B, 2]
    rows = jnp.take(packed, pc[:, 0] * P + pc[:, 1], axis=0)
    rows = rows.astype(interp_dtype)

    outs = []
    offset = 0
    for r, C in zip(spec.resolutions, spec.channels):
        cell = jnp.clip(jnp.floor(u * r), 0, r - 1).astype(jnp.int32)
        # fractions computed in f32 (exact), then cast once for the combine
        frac = u * r - cell.astype(jnp.float32)          # [B, 2]
        fx = frac[:, :1].astype(interp_dtype)
        fy = frac[:, 1:].astype(interp_dtype)
        if r <= spec.pack_res:
            c00 = rows[:, offset + 0 * C: offset + 1 * C]
            c10 = rows[:, offset + 1 * C: offset + 2 * C]
            c01 = rows[:, offset + 2 * C: offset + 3 * C]
            c11 = rows[:, offset + 3 * C: offset + 4 * C]
            offset += 4 * C
        else:
            ratio = r // spec.pack_res
            n = ratio + 1
            # points p[i, j] = rows block (i*n + j); the fine cell sits at
            # local offset (px, py) within the packing cell
            pts = [rows[:, offset + k * C: offset + (k + 1) * C]
                   for k in range(n * n)]
            offset += n * n * C
            px = (cell[:, :1] - pc[:, :1] * ratio).astype(jnp.int32)
            py = (cell[:, 1:] - pc[:, 1:] * ratio).astype(jnp.int32)

            def sel(dx, dy):
                # point index (px+dx, py+dy) in [0, n)²; mask-sum over the
                # n*n static blocks (ratio is small: 9 blocks for ratio 2)
                acc = 0.0
                for i in range(n):
                    for j in range(n):
                        m = ((px == (i - dx)) & (py == (j - dy))).astype(
                            interp_dtype)
                        acc = acc + m * pts[i * n + j]
                return acc

            c00 = sel(0, 0)
            c10 = sel(1, 0)
            c01 = sel(0, 1)
            c11 = sel(1, 1)
        outs.append(
            c00 * (1 - fx) * (1 - fy)
            + c10 * fx * (1 - fy)
            + c01 * (1 - fx) * fy
            + c11 * fx * fy
        )
    out = jnp.concatenate(outs, axis=-1).astype(jnp.float32)
    return jnp.where(in_bounds[:, None], out, 0.0)


def dense_triplane_encode(
    levels: Sequence[jnp.ndarray],
    xy: jnp.ndarray,
    spec: DenseTriplaneSpec,
    bound: float = 1.0,
    packed: jnp.ndarray | None = None,
    dtype=jnp.float32,
    interp_dtype=jnp.float32,
) -> jnp.ndarray:
    """Full encode: map [-bound,bound] -> [0,1], bake (unless a prebaked
    table is supplied) and look up."""
    if packed is None:
        packed = bake_packed(levels, spec, dtype=dtype)
        # materialise the baked table before gathering: without the barrier
        # XLA fuses the bake into the gather consumer and the gather drops
        # off its fast (~300M rows/s) path (measured: 3x slower)
        packed = jax.lax.optimization_barrier(packed)
    u = (xy + bound) / (2.0 * bound)
    return packed_lookup(packed, u, spec, interp_dtype=interp_dtype)


def _mxu_lookup_consts(spec: DenseTriplaneSpec):
    """Constant matrices for packed_lookup_mxu: E maps the per-sample weight
    features (one weight per (level, corner/point)) onto packed-row columns
    (broadcast across each block's channels), Sel reduces weighted columns
    into the 12 output channels. Both depend only on the spec."""
    nw = sum(4 if r <= spec.pack_res else (r // spec.pack_res + 1) ** 2
             for r in spec.resolutions)
    E = np.zeros((nw, spec.packed_dim), np.float32)
    Sel = np.zeros((spec.packed_dim, spec.output_dim), np.float32)
    col = w = och = 0
    for r, C in zip(spec.resolutions, spec.channels):
        pts = 4 if r <= spec.pack_res else (r // spec.pack_res + 1) ** 2
        for p in range(pts):
            for c in range(C):
                E[w + p, col] = 1.0
                Sel[col, och + c] = 1.0
                col += 1
        w += pts
        och += C
    return jnp.asarray(E), jnp.asarray(Sel)


def packed_lookup_mxu(packed: jnp.ndarray, xy01: jnp.ndarray,
                      spec: DenseTriplaneSpec) -> jnp.ndarray:
    """packed_lookup with the interpolation arithmetic restructured for the
    VPU/MXU (bit-equal semantics, float-order differences only).

    packed_lookup evaluates bilinear weights and the fine-level point
    selection as ~50 ops over [B, C<=4]-wide arrays — 2-3 of 128 vector
    lanes doing work (measured: the interp math costs as much as the
    gather itself, ~6.5 ms vs 7.9 ms for 3.15M rows @512²). This version
    computes one [B, n_weights] feature (separable outer products of the
    per-level x/y corner weights; the fine-level point weights are the
    outer product of 3-tap x/y selection convolutions), expands it to the
    packed columns with a constant matmul, and reduces the weighted row to
    the output channels with another constant matmul — two full-width
    passes plus two tiny MXU contractions instead of dozens of 3-lane
    passes."""
    P = spec.pack_res
    in_bounds = jnp.all((xy01 >= 0.0) & (xy01 <= 1.0), axis=-1)
    u = jnp.clip(xy01, 0.0, 1.0)

    pc = jnp.clip(jnp.floor(u * P), 0, P - 1).astype(jnp.int32)     # [B, 2]
    rows = jnp.take(packed, pc[:, 0] * P + pc[:, 1], axis=0)
    rows = rows.astype(jnp.float32)

    feats = []
    for r, C in zip(spec.resolutions, spec.channels):
        cell = jnp.clip(jnp.floor(u * r), 0, r - 1).astype(jnp.int32)
        frac = u * r - cell.astype(jnp.float32)           # [B, 2]
        fx, fy = frac[:, :1], frac[:, 1:]
        wx = jnp.concatenate([1.0 - fx, fx], axis=-1)     # [B, 2]
        wy = jnp.concatenate([1.0 - fy, fy], axis=-1)
        if r <= spec.pack_res:
            # corner order in the row: c00 | c10 | c01 | c11 (x-major pairs)
            w4 = wx[:, :, None] * wy[:, None, :]          # [B, 2, 2] (x, y)
            feats.append(w4.transpose(0, 2, 1).reshape(-1, 4))
        else:
            ratio = r // spec.pack_res
            n = ratio + 1
            # 3-tap selection convolutions: WX_i = sum_dx wx_dx [px == i-dx]
            px = (cell[:, :1] - pc[:, :1] * ratio).astype(jnp.int32)
            py = (cell[:, 1:] - pc[:, 1:] * ratio).astype(jnp.int32)
            i_idx = jnp.arange(n, dtype=jnp.int32)[None, :]
            WX = (wx[:, :1] * (px == i_idx) + wx[:, 1:] * (px == i_idx - 1))
            WY = (wy[:, :1] * (py == i_idx) + wy[:, 1:] * (py == i_idx - 1))
            # row point order is i-major (i over x): point (i, j) at i*n + j
            feats.append((WX[:, :, None] * WY[:, None, :]).reshape(-1, n * n))
    wfeat = jnp.concatenate(feats, axis=-1)               # [B, n_weights]

    E, Sel = _mxu_lookup_consts(spec)
    wv = wfeat @ E                                        # [B, packed_dim]
    out = (rows * wv) @ Sel                               # [B, output_dim]
    return jnp.where(in_bounds[:, None], out, 0.0)


def reference_dense_encode(levels, xy01, spec):
    """Direct (gather-per-corner) bilinear evaluation — the semantic
    reference for tests; O(levels) gathers per point."""
    outs = []
    u = jnp.clip(xy01, 0.0, 1.0)
    in_bounds = jnp.all((xy01 >= 0.0) & (xy01 <= 1.0), axis=-1)
    for A, r in zip(levels, spec.resolutions):
        pos = u * r
        cell = jnp.clip(jnp.floor(pos), 0, r - 1).astype(jnp.int32)
        frac = pos - cell
        fx, fy = frac[:, :1], frac[:, 1:]
        g = lambda dx, dy: A[cell[:, 0] + dx, cell[:, 1] + dy]
        outs.append(
            g(0, 0) * (1 - fx) * (1 - fy) + g(1, 0) * fx * (1 - fy)
            + g(0, 1) * (1 - fx) * fy + g(1, 1) * fx * fy)
    return jnp.where(in_bounds[:, None], jnp.concatenate(outs, -1), 0.0)
