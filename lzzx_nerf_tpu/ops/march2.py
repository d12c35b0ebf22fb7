"""Interval-guided, ray-compacted marching — the fast inference path.

The v1 marcher (ops/march.py) tests occupancy at every one of K≈112 lattice
candidates for every ray: N×K gather rows dominate the frame at 512²
(XLA TPU gathers retire ~110M rows/s). This module cuts the row count two
ways while keeping the same sampling semantics:

1. **Column z-intervals**: reduce the occupancy grid along the dominant view
   axis into per-(x,y)-column [z_enter, z_exit] bounds (a dense reduction),
   dilate in-plane, and intersect each ray with its column's slab → a much
   shorter candidate window (K2≈56 instead of 112), plus an 'active' bit for
   rays that can hit anything at all.

2. **Static-budget ray compaction**: scatter the active rays into a fixed
   buffer of B slots (cumsum ranks; overflow drops excess rays — the same
   static-budget idea as the reference's mean_count trick,
   raymarching/raymarching.py:186-280). Occupancy tests, field evaluation
   and compositing then run on B rays instead of N.

Within the window the marcher still tests the real occupancy bitfield per
candidate and keeps the first S occupied samples, so the sample set equals
the v1/reference sampling wherever the window is conservative (the window is
dilated; rays more transverse than `min_axis_frac` fall back to [near, far]).

This path assumes cascade == 1 (bound <= 1 — true for the talking-head
production config); multi-cascade scenes use the v1 marcher.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .march import MarchResult, _first_s_select, occ_lookup

# Round-3 advisor finding: the word-pair selects below CLIP (word - w0)
# into {0,1}; a candidate outside the group's assumed ~2.1-cell z-span
# would silently read the WRONG word and corrupt samples without signal.
# The envelope analysis says this cannot happen for any valid geometry,
# but regressions must fail loudly: tests flip this flag, run the block
# marchers over the exactness-suite scenes, and assert the violation
# counter stayed zero (tests/test_march2.py::test_word_pair_envelope_*).
# Off in production — the callback would serialize the hot path.
DEBUG_WORD_ENVELOPE = False
_word_envelope_violations = 0


def reset_word_envelope_violations() -> None:
    global _word_envelope_violations
    _word_envelope_violations = 0


def word_envelope_violations() -> int:
    return _word_envelope_violations


def _word_pair_index(word, w0b, live):
    """clip(word - w0, 0, 1), with an optional loud envelope check."""
    delta = word - w0b
    if DEBUG_WORD_ENVELOPE:
        def _cb(c):
            global _word_envelope_violations
            _word_envelope_violations += int(c)

        jax.debug.callback(
            _cb, jnp.sum(((delta < 0) | (delta > 1)) & live))
    return jnp.clip(delta, 0, 1)


class RayWindow(NamedTuple):
    t_start: jnp.ndarray   # [N]
    t_end: jnp.ndarray     # [N]
    active: jnp.ndarray    # [N] bool


class InferenceTables(NamedTuple):
    """Occupancy products derivable from the grid; at serving the grid is
    static, so these are built ONCE per model load (serving/session.py)
    instead of in-graph per frame."""

    z_lo: jnp.ndarray         # [H, H] per-column window lower bound (world z)
    z_hi: jnp.ndarray         # [H, H] upper bound
    col_bitmask: jnp.ndarray  # [H*H, H//32] uint32, xy-dilated z-occupancy
    col_nbmask: jnp.ndarray   # [H*H, 9*H//32] uint32, exact 3x3-neighborhood
                              # z-bitstrings (column_bitmasks_neighborhood)
    col_nb5mask: jnp.ndarray  # [H*H, 25*H//32] uint32, exact 5x5-neighborhood
                              # z-bitstrings (column_bitmasks_neighborhood5),
                              # for the block-shared fetch marcher; None
                              # unless "nb5" in build variants (6.6 MB @128)
    col_quadmask: jnp.ndarray  # [4*H*H, 16*H//32] uint32, exact signed 4x4
                               # quadrant neighborhoods
                               # (column_bitmasks_quadrant), for the
                               # directional block marcher; None unless
                               # "quad" in build variants (16.8 MB @128)
    col_quadwmask: jnp.ndarray = None
                               # [4*H*H*(H//32), 32] uint32, the quadrant
                               # table additionally indexed by z-word
                               # (column_bitmasks_quadrant_words); None
                               # unless "quadw" in build variants
                               # (33.5 MB @128)
    col_quadwxmask: jnp.ndarray = None
                               # [2*H*H*(H//32), 64] uint32, the quadw
                               # table with the sy quadrant folded into row
                               # WIDTH (column_bitmasks_quadrant_words_xfold)
                               # — variant "quadwx": same bytes as quadw
                               # but the row count stays under the TPU
                               # gather row-count cliff
                               # (scripts/quadwgather.py). Measured-
                               # rejected at the frame level (PERF.md);
                               # None unless "quadwx" in build variants
                               # (33.5 MB @128)
    col_nb5wmask: jnp.ndarray = None
                               # [H*H*(H//32), 50] uint32, the symmetric
                               # 5x5 neighborhood additionally indexed by
                               # z-word (column_bitmasks_neighborhood5_words)
                               # — variant "nb5w"; None unless "nb5w" in
                               # build variants (13.1 MB @128)
    col_dilwords: jnp.ndarray = None
                               # [H*H*(H//32)] uint32 — the (5, 5, 7)-max-
                               # pooled occupancy packed as z-words and
                               # flattened to one word per (x, y, z-word)
                               # row (dilated_occupancy_words), for the
                               # pre-march block-activity prepass
                               # (prepass_block_hits): one 1-word fetch +
                               # bit test per (block, candidate group)
                               # answers "can ANY of the block's 8
                               # candidates in this group be occupied?"
                               # conservatively. None unless "dil" in
                               # build variants (256 KB @128)


class CompactSet(NamedTuple):
    ray_idx: jnp.ndarray   # [B] source ray index per slot (0 for empty slots)
    slot_valid: jnp.ndarray  # [B] bool
    n_active: jnp.ndarray  # scalar int32 (diagnostic; may exceed B)


def column_intervals(occ: jnp.ndarray, bound: float, dilate: int = 2
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """occ [CAS, H, H, H] (cascade 0 used) -> per-(x,y) column world-z bounds
    (z_lo, z_hi) [H, H]; empty columns get (+big, -big)."""
    H = occ.shape[1]
    o = occ[0].astype(jnp.bool_)                      # [H, H, H], z last
    zs = jnp.arange(H, dtype=jnp.int32)
    zmin = jnp.min(jnp.where(o, zs, H), axis=-1)      # [H, H]
    zmax = jnp.max(jnp.where(o, zs, -1), axis=-1)
    # in-plane dilation: min-pool zmin / max-pool zmax, `dilate` x 3x3 passes
    for _ in range(dilate):
        zmin = -jax.lax.reduce_window(-zmin, -jnp.asarray(H, zmin.dtype),
                                      jax.lax.max, (3, 3), (1, 1), "SAME")
        zmax = jax.lax.reduce_window(zmax, jnp.asarray(-1, zmax.dtype),
                                     jax.lax.max, (3, 3), (1, 1), "SAME")
    big = jnp.float32(1.0e30)  # empty-column sentinel (kept finite so
    # downstream t = (z - o)/d arithmetic cannot overflow to inf)
    # cell n spans world [(n/H*2-1)*b, ((n+1)/H*2-1)*b]
    z_lo = (zmin.astype(jnp.float32) / H * 2.0 - 1.0) * bound
    z_hi = ((zmax.astype(jnp.float32) + 1.0) / H * 2.0 - 1.0) * bound
    empty = zmax < 0
    z_lo = jnp.where(empty, big, z_lo)
    z_hi = jnp.where(empty, -big, z_hi)
    return z_lo, z_hi


def ray_windows(
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    nears: jnp.ndarray,
    fars: jnp.ndarray,
    z_lo: jnp.ndarray,
    z_hi: jnp.ndarray,
    bound: float,
    dt: float,
    min_axis_frac: float = 0.3,
    pad_steps: float = 2.0,
    probes: int = 6,
) -> RayWindow:
    """Intersect rays with the (x,y)-column z-slabs they cross: column
    lookups at the near point plus `probes - 1` uniformly-spaced points
    along [near, far], window = the t-envelope of every nonempty slab'-
    intersection; rays with |dz| < min_axis_frac fall back to [near, far].

    probes=6 (round 3): the original 2-probe scheme (near + first window
    estimate) mis-windowed GRAZING rays whose probes both landed in
    columns missing the actual crust crossing — at grid 128 (columns half
    the grid-64 width, so rays cross twice as many of them) a contiguous
    band of silhouette pixels lost every sample (~38 pixels of err≈0.95 at
    256², the dominant term of a −0.8 dB serving delta;
    scripts/marchdiag.py). Probes are spaced uniformly over the ray's
    crossing of the GLOBALLY occupied z-band (derived in-graph from the
    interval maps — outside it no column has content, so probing there is
    provably wasted), bounding the unprobed gap to band/probes of ray
    length, which the interval dilation (±2 cells) plus the head's own
    column footprint comfortably bridges. More probes only WIDEN windows
    (superset — the conservative direction); each probe costs one [N]-row
    gather in a phase that runs per 2x2 block."""
    H = z_lo.shape[0]
    zmaps = jnp.stack([z_lo, z_hi], axis=-1).reshape(H * H, 2)  # one table

    def col_lookup(t):
        p = rays_o + t[:, None] * rays_d
        p = jnp.clip(p, -bound, bound)
        cx = jnp.clip((0.5 * (p[:, 0] / bound + 1.0) * H), 0, H - 1).astype(jnp.int32)
        cy = jnp.clip((0.5 * (p[:, 1] / bound + 1.0) * H), 0, H - 1).astype(jnp.int32)
        zz = jnp.take(zmaps, cx * H + cy, axis=0)               # [N, 2]
        return zz[:, 0], zz[:, 1]

    oz = rays_o[:, 2]
    dz = rays_d[:, 2]
    safe_dz = jnp.where(jnp.abs(dz) < 1e-6, 1e-6, dz)
    big = jnp.float32(1.0e30)

    def slab_to_t(zl, zh):
        t1 = (zl - oz) / safe_dz
        t2 = (zh - oz) / safe_dz
        ta = jnp.minimum(t1, t2)
        tb = jnp.maximum(t1, t2)
        # empty columns carry the (+big, -big) sentinel; min/max above would
        # flip it into an everything-window — keep it EMPTY instead so rays
        # through unoccupied columns deactivate
        empty = zl > zh
        return jnp.where(empty, big, ta), jnp.where(empty, -big, tb)

    def probe_at(t):
        zl, zh = col_lookup(t)
        ta_i, tb_i = slab_to_t(zl, zh)
        # empty columns contribute nothing to the envelope; a nonempty
        # column contributes its FULL slab crossing even when probed at a
        # different t (that is the point: whichever probe lands in a crust
        # column recovers the true crossing interval). Over-wide envelopes
        # are conservative — [near, far] clipping below bounds them.
        valid = tb_i > ta_i
        return jnp.where(valid, ta_i, big), jnp.where(valid, tb_i, -big)

    # restrict the probe span to the ray's crossing of the global occupied
    # z-band [zmin, zmax] (in-graph scalars — cheap masked reductions)
    valid_col = z_hi > z_lo
    zmin = jnp.min(jnp.where(valid_col, z_lo, big))
    zmax = jnp.max(jnp.where(valid_col, z_hi, -big))
    tz1 = (zmin - oz) / safe_dz
    tz2 = (zmax - oz) / safe_dz
    p_lo = jnp.clip(jnp.minimum(tz1, tz2), nears, fars)
    p_hi = jnp.clip(jnp.maximum(tz1, tz2), nears, fars)

    ta, tb = probe_at(p_lo)
    seg = p_hi - p_lo
    for i in range(max(probes - 1, 1)):
        frac = (i + 1.0) / max(probes - 1, 1)
        ta_i, tb_i = probe_at(p_lo + frac * seg)
        ta = jnp.minimum(ta, ta_i)
        tb = jnp.maximum(tb, tb_i)
    ta = ta - pad_steps * dt
    tb = tb + pad_steps * dt

    fallback = jnp.abs(dz) < min_axis_frac
    ta = jnp.where(fallback, nears, ta)
    tb = jnp.where(fallback, fars, tb)

    t_start = jnp.maximum(nears, ta)
    t_end = jnp.minimum(fars, tb)
    active = t_end > t_start
    # snap t_start onto the near-anchored dt-lattice so sampling positions
    # match the v1 marcher exactly (t = near + k*dt)
    k0 = jnp.ceil(jnp.maximum(t_start - nears, 0.0) / dt - 1e-4)
    t_start = nears + k0 * dt
    return RayWindow(t_start=t_start, t_end=t_end, active=active)


def _pack_z_words(grid: jnp.ndarray) -> jnp.ndarray:
    """[H, H, H] occupancy (z last) -> [H, H, H//32] uint32 z-bitstrings
    (bit z%32 of word z//32)."""
    H = grid.shape[-1]
    bits = (grid > 0).reshape(*grid.shape[:-1], H // 32, 32)
    return jnp.sum(
        bits.astype(jnp.uint32) << jnp.arange(32, dtype=jnp.uint32),
        axis=-1, dtype=jnp.uint32)


def column_bitmasks(occ: jnp.ndarray, dilate: int = 1) -> jnp.ndarray:
    """occ [CAS, H, H, H] -> [H*H, H//32] uint32: each (x,y) column's
    z-occupancy as a bitstring, OR-dilated `dilate` x 3x3 passes in-plane.

    The dilation makes a single column fetch conservative for every
    candidate in a small marching group even though the ray's (x,y) drifts
    (march_rays_window_bitmask); the occupancy grid itself is already
    3x3x3-dilated by the update pass (reference morton3D_dilation,
    raymarching.cu:304-351), so the extra margin only admits a few more
    near-surface samples. Coverage condition (midpoint fetch): dilate >=
    (group/2)*sqrt(3)*|d_xy| cells — dilate=1 with group=2 covers EVERY
    unit ray (|d_xy| <= 1.15); wider dilation costs quality (extra empty
    cells crowd the S budget: -2.3 dB measured at dilate=2/group=4 on a
    trained model, scripts/quality_check.py)."""
    H = occ.shape[1]
    assert H % 32 == 0, "grid size must be a multiple of 32 for bit-packing"
    od = occ[0].astype(jnp.float32)
    for _ in range(dilate):
        od = jax.lax.reduce_window(od, 0.0, jax.lax.max, (3, 3, 1), (1, 1, 1),
                                   "SAME")
    return _pack_z_words(od).reshape(H * H, H // 32)


def column_bitmasks_neighborhood(occ: jnp.ndarray) -> jnp.ndarray:
    """occ [CAS, H, H, H] -> [H*H, 9*(H//32)] uint32: for each (x, y) cell,
    the EXACT (undilated) z-bitstrings of its 3x3 xy-neighborhood, ordered
    (dx+1)*3 + (dy+1) blocks of H//32 words (out-of-grid columns are 0).

    One row serves a whole marching group EXACTLY: at group=2 every
    candidate's xy cell is within ±1 of the group-midpoint cell for ANY
    ray direction (drift <= (dt/2)*|d_xy| = (sqrt(3)/2)*|d_xy| <= 0.87
    cells), so the candidate selects its own column's bits in-register —
    no dilation, no false positives. The OR-dilated single-column mask
    (column_bitmasks) admitted empty neighbor-column bits that crowded
    the S-sample budget: **-2.0 dB on a trained model** (the entire
    serving-vs-parity gap, scripts/quality_check.py variant F). Rows are
    36 uint32 at H=128 — inside the full-rate gather zone (<=116
    elements, scripts/gatherbench.py)."""
    H = occ.shape[1]
    assert H % 32 == 0, "grid size must be a multiple of 32 for bit-packing"
    words = _pack_z_words(occ[0].astype(jnp.float32))  # [H, H, W32]
    padded = jnp.pad(words, ((1, 1), (1, 1), (0, 0)))
    blocks = [padded[1 + dx:1 + dx + H, 1 + dy:1 + dy + H]
              for dx in (-1, 0, 1) for dy in (-1, 0, 1)]
    return jnp.concatenate(blocks, axis=-1).reshape(H * H, 9 * (H // 32))


def column_bitmasks_neighborhood5(occ: jnp.ndarray) -> jnp.ndarray:
    """occ [CAS, H, H, H] -> [H*H, 25*(H//32)] uint32: for each (x, y) cell,
    the EXACT z-bitstrings of its 5x5 xy-neighborhood, ordered
    (dx+2)*5 + (dy+2) blocks of H//32 words (out-of-grid columns 0).

    The ±2 envelope lets ONE row serve all 8 candidates of a (2x2-pixel
    block, 2-candidate group) — the block-shared fetch cuts march gather
    rows 4x vs the per-ray 3x3 row (march_rays_window_bitmask_nb_block).
    Rows are 100 uint32 at H=128 — still inside the full-rate gather zone
    (<=116 elements, scripts/gatherbench.py); table 6.5 MB."""
    H = occ.shape[1]
    assert H % 32 == 0, "grid size must be a multiple of 32 for bit-packing"
    words = _pack_z_words(occ[0].astype(jnp.float32))  # [H, H, W32]
    padded = jnp.pad(words, ((2, 2), (2, 2), (0, 0)))
    blocks = [padded[2 + dx:2 + dx + H, 2 + dy:2 + dy + H]
              for dx in (-2, -1, 0, 1, 2) for dy in (-2, -1, 0, 1, 2)]
    return jnp.concatenate(blocks, axis=-1).reshape(H * H, 25 * (H // 32))


def column_bitmasks_quadrant(occ: jnp.ndarray) -> jnp.ndarray:
    """occ [CAS, H, H, H] -> [4*H*H, 16*(H//32)] uint32: for each direction
    quadrant q = 2*(dx<0) + (dy<0) and each (x, y) cell, the EXACT
    z-bitstrings of the SIGNED 4x4 window {-1, 0, +1, +2}*sign per axis,
    field order ix*4 + iy with per-axis offset sign*(i-1) (out-of-grid
    columns 0).

    The directional block marcher (march_rays_window_bitmask_nb_block_quad)
    anchors its fetch half a step after the group's first block-lattice
    candidate, so the fetch-to-candidate xy drift is one-sided along the
    ray's travel direction — 16 columns cover what the symmetric ±2
    envelope needs 25 for, cutting the per-candidate select from 50-way
    to 32-way. Rows are 64 uint32 at H=128 (full-rate gather width);
    table 16.8 MB."""
    H = occ.shape[1]
    assert H % 32 == 0, "grid size must be a multiple of 32 for bit-packing"
    words = _pack_z_words(occ[0].astype(jnp.float32))  # [H, H, W32]
    padded = jnp.pad(words, ((2, 2), (2, 2), (0, 0)))
    quads = []
    for sx in (1, -1):
        for sy in (1, -1):
            blocks = [padded[2 + sx * (ix - 1):2 + sx * (ix - 1) + H,
                             2 + sy * (iy - 1):2 + sy * (iy - 1) + H]
                      for ix in range(4) for iy in range(4)]
            quads.append(
                jnp.concatenate(blocks, axis=-1).reshape(H * H, -1))
    return jnp.concatenate(quads, axis=0)


def column_bitmasks_quadrant_words(occ: jnp.ndarray) -> jnp.ndarray:
    """occ [CAS, H, H, H] -> [4*H*H*(H/32), 32] uint32: the quadrant table
    (column_bitmasks_quadrant) additionally indexed by the Z WORD, so one
    fetched row carries exactly the {w0, w0+1} word pair of all 16 signed-
    window columns — row (q*H*H + x*H + y)*W32 + w0, field nb*2 + i =
    column nb's z-word w0+i (word W32 reads as 0).

    Why: the profiler showed the quad march's cost is NOT the select math
    but the DATA MOVEMENT around the 64-word fetched rows — at 512² the
    [540672, 64] fetch result (138 MB) was relaid twice (a 4.0 ms physical
    transpose + 1.3/0.6 ms copies) before the word-pair pre-reduce even
    ran (~7.7 ms/frame of u32 layout churn vs 1.0 ms of gather and 2.4 ms
    of select — scripts/profile_frame.py). Baking the word-pair selection
    into the table halves the fetched bytes and deletes the pre-reduce
    stage and its intermediates; the per-candidate select reads the
    fetched row directly (j2 = nb*2 + (word - w0)). Same exactness
    envelope as "quad" (the anchor math is untouched). Table is W32x the
    quadrant table's rows at half the row width: 33.5 MB at H=128 — fine
    for HBM, and gather cost is row-count x full-rate, which is unchanged
    (one row per (block, group) either way)."""
    H = occ.shape[1]
    W32 = H // 32
    qt = column_bitmasks_quadrant(occ).reshape(4 * H * H, 16, W32)
    padded = jnp.pad(qt, ((0, 0), (0, 0), (0, 1)))     # word W32 -> 0
    w = jnp.stack([padded[:, :, w0:w0 + 2] for w0 in range(W32)],
                  axis=1)                              # [4H², W32, 16, 2]
    return w.reshape(4 * H * H * W32, 32)


def column_bitmasks_quadrant_words_xfold(occ: jnp.ndarray) -> jnp.ndarray:
    """occ [CAS, H, H, H] -> [2*H*H*(H//32), 64] uint32: the quadw table
    (column_bitmasks_quadrant_words) with the SY quadrant folded into row
    WIDTH — row (qx*H*H + x*H + y)*W32 + w0 with qx = (sign_x < 0), width
    [sy=+1's 32 fields | sy=-1's 32 fields], each half laid out exactly
    like a quadw row (field nb*2 + i).

    Why: the TPU gather's full-rate zone is bounded by ROW COUNT (~400M
    rows/s up to ~196k rows, ~95M beyond — scripts/quadwgather.py round-3
    sweep; width is free up to ~116 u32). The quadw table's 4*H*H*W32 =
    262144 rows at H=128 sit past the cliff, making its fetch the single
    largest march cost (5.6 of ~8 ms); this layout keeps identical bytes
    but 131072 rows x 64 wide — measured 431M rows/s, the sweep's fastest
    point. The per-block sy half-selection is ONE cheap where over the
    un-broadcast fetch result ([Bb, G, 32] out), not a wider per-candidate
    select — the 32-way select math is untouched. Same anchor, same
    directional envelope, bit-identical samples to "quadw"/"quad"."""
    H = occ.shape[1]
    W32 = H // 32
    qw = column_bitmasks_quadrant_words(occ).reshape(4, H * H * W32, 32)
    # quadrant order (column_bitmasks_quadrant): 0=(+,+) 1=(+,-) 2=(-,+)
    # 3=(-,-); fold sy pairs into width per sx half
    return jnp.concatenate([
        jnp.concatenate([qw[0], qw[1]], axis=1),
        jnp.concatenate([qw[2], qw[3]], axis=1),
    ], axis=0)


def column_bitmasks_neighborhood5_words(occ: jnp.ndarray) -> jnp.ndarray:
    """occ [CAS, H, H, H] -> [H*H*(H//32), 50] uint32: the symmetric 5x5
    neighborhood table (column_bitmasks_neighborhood5) additionally indexed
    by the Z WORD — row (x*H + y)*W32 + w0, field nb*2 + i = neighbor nb's
    z-word w0+i (word W32 reads as 0).

    The "nb5w" marcher variant: like quadw it deletes the word-pair
    pre-reduce and its relayout churn, but keeps the SYMMETRIC ±2 envelope
    (midpoint anchor, any ray direction — no quadrant logic, no
    directional drift gate in resolve_march_plan). 65536 rows x 50 wide at
    H=128 — both inside the gather full-rate zone (scripts/quadwgather.py:
    405M rows/s measured at this exact shape); the trade is a 50-way
    per-candidate select vs the quad family's 32-way."""
    H = occ.shape[1]
    W32 = H // 32
    nt = column_bitmasks_neighborhood5(occ).reshape(H * H, 25, W32)
    padded = jnp.pad(nt, ((0, 0), (0, 0), (0, 1)))     # word W32 -> 0
    w = jnp.stack([padded[:, :, w0:w0 + 2] for w0 in range(W32)],
                  axis=1)                              # [H², W32, 25, 2]
    return w.reshape(H * H * W32, 50)


def dilated_occupancy_words(occ: jnp.ndarray, dxy: int = 2, dz: int = 3
                            ) -> jnp.ndarray:
    """occ [CAS, H, H, H] -> [H*H*(H//32)] uint32: the occupancy max-pooled
    over a (2*dxy+1, 2*dxy+1, 2*dz+1) window (separable 1-D passes),
    packed as z-words and flattened to ONE word per (x, y, z-word) row.

    This is the pre-march activity oracle: dilated(c) == 1 whenever ANY
    cell within (±dxy, ±dxy, ±dz) of c is occupied, so a single bit test
    at a block's group-fetch cell conservatively answers "can any of the
    block's 8 candidates in this group hit an occupied cell?" — the same
    (±2, ±2, ±3) envelope the block-shared marchers prove for their
    fetch-to-candidate drift (march_rays_window_bitmask_nb_block: xy
    within ±2 for |d_xy| <= 0.95 portrait geometry, z within the 7-cell
    band [gz-3, gz+3] the zband variants index). Out-of-grid reads as
    empty — candidates clamp into the grid exactly like the fetch points,
    and clamping never increases cell distance, so coverage is preserved
    at the boundary. The default (5, 5, 7) window is conservative for
    every geometry resolve_march_plan admits to march_group == 2."""
    H = occ.shape[1]
    od = occ[0].astype(jnp.float32)
    od = jax.lax.reduce_window(od, 0.0, jax.lax.max,
                               (2 * dxy + 1, 1, 1), (1, 1, 1), "SAME")
    od = jax.lax.reduce_window(od, 0.0, jax.lax.max,
                               (1, 2 * dxy + 1, 1), (1, 1, 1), "SAME")
    od = jax.lax.reduce_window(od, 0.0, jax.lax.max,
                               (1, 1, 2 * dz + 1), (1, 1, 1), "SAME")
    return _pack_z_words(od).reshape(H * H * (H // 32))


def prepass_block_hits(
    o_blk: jnp.ndarray,        # [NB, 3] block-centre origins
    d_center: jnp.ndarray,     # [NB, 3] unit block-centre directions
    t0_blk: jnp.ndarray,       # [NB] block window start (lattice anchor)
    t1_blk: jnp.ndarray,       # [NB] block window end
    col_dilwords: jnp.ndarray,  # [H*H*(H//32)] from dilated_occupancy_words
    bound: float,
    dt: float,
    num_cand: int,             # K2 (the march's candidate count)
) -> jnp.ndarray:
    """Occupancy-true block activity: for each block, test the dilated
    occupancy bit at every group-fetch lattice point t0 + (2g+1)*dt of the
    window. Returns hit [NB] bool — False PROVES the block-shared march
    would keep zero samples for all 4 rays (candidates of group g lie
    within (±2, ±2, ±3) cells of the g-th fetch cell, and the dilation
    covers exactly that envelope), so dead blocks can be dropped BEFORE
    the march instead of after the field eval.

    The window analysis's z-slab test over-admits ~2.6x on a trained
    crust (215k window-active vs 82k real rays at 512² — PERF.md Round
    4); this prepass costs one 1-word gather + bit test per (block,
    group) — ~1/25 of the nb5w march's 50-word rows + 50-way selects —
    and removes ~35% of the march's block budget at the source (measured
    on the trained state; the reference's alive-ray loop never marches
    dead rays at all, /root/reference/nerf_triplane/renderer.py:503-548).
    """
    h = _prepass_group_hits(o_blk, d_center, t0_blk, t1_blk, col_dilwords,
                            bound, dt, num_cand)
    return jnp.any(h, axis=1)


def _prepass_group_hits(o_blk, d_center, t0_blk, t1_blk, col_dilwords,
                        bound, dt, num_cand):
    """Shared body of prepass_block_hits / prepass_block_spans: the
    per-(block, group) dilated-occupancy hit matrix [NB, G] — ONE place
    for the envelope-critical lattice / cell / live-gate math."""
    H = int(round((32 * col_dilwords.shape[0]) ** (1.0 / 3.0)))
    W32 = H // 32
    assert H * H * W32 == col_dilwords.shape[0]
    group = 2
    G = (num_cand + group - 1) // group

    gk = jnp.arange(G, dtype=jnp.float32) * group + 1.0     # 2g + 1
    t_g = t0_blk[:, None] + gk[None] * dt                   # [NB, G]
    pg = o_blk[:, None, :] + t_g[..., None] * d_center[:, None, :]
    pg = jnp.clip(pg, -bound, bound)
    gp = jnp.clip(0.5 * (pg / bound + 1.0) * H, 0, H - 1).astype(jnp.int32)
    gx, gy, gz = gp[..., 0], gp[..., 1], gp[..., 2]
    idx = (gx * H + gy) * W32 + (gz >> 5)
    words = jnp.take(col_dilwords, idx, axis=0)             # [NB, G]
    bit = ((words >> (gz & 31).astype(jnp.uint32)) & jnp.uint32(1)) > 0
    # group g carries candidates in [t_g - dt - eps, t_g + dt); a group
    # whose start is past the window end contributes nothing (candidates
    # are t < t_end-gated in the march) — one dt of slack keeps this
    # strictly conservative against the per-ray lattice snap
    live = (t_g - dt) < (t1_blk[:, None] + dt)
    return bit & live


def prepass_block_spans(
    o_blk: jnp.ndarray,        # [NB, 3]
    d_center: jnp.ndarray,     # [NB, 3]
    t0_blk: jnp.ndarray,       # [NB]
    t1_blk: jnp.ndarray,       # [NB]
    col_dilwords: jnp.ndarray,
    bound: float,
    dt: float,
    num_cand: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """prepass_block_hits plus the per-block FIRST/LAST hit groups:
    (hit [NB] bool, g_first [NB] int32, g_last [NB] int32).

    Groups before g_first (and after g_last) provably contain no occupied
    candidate for any of the block's 4 rays (dilated-occupancy superset),
    so the window can be TIGHTENED to [t0 + 2*g_first*dt,
    t0 + (2*g_last + 2)*dt] without losing a sample — the lattice shift
    is a whole number of candidate groups, so every surviving per-ray
    candidate keeps its exact position (near-anchored snap semantics
    unchanged). The candidates a bucket march then needs is
    2*(g_last - g_first + 1) + 2 (one group span + the snap's boundary
    candidate each side) — the basis for the short/long two-bucket march
    (render_rays_compact_blocks march_buckets)."""
    h = _prepass_group_hits(o_blk, d_center, t0_blk, t1_blk, col_dilwords,
                            bound, dt, num_cand)
    G = h.shape[1]
    hit = jnp.any(h, axis=1)
    g_first = jnp.argmax(h, axis=1).astype(jnp.int32)
    g_last = (G - 1 - jnp.argmax(h[:, ::-1], axis=1)).astype(jnp.int32)
    return hit, g_first, g_last


def bucket_short_budget(n_short: int, budget: int, gran: int,
                        margin: int = 64) -> int:
    """THE short-bucket budget sizing policy, shared by bench, serving
    and cli (review finding: three divergent copies drift): ceil the
    measured short demand + margin to the slot granularity, capped so
    the long bucket keeps at least one granule. Returns 0 when no valid
    carve exists (caller falls back to the single-bucket march)."""
    if budget <= gran:
        return 0
    bs = min(budget - gran,
             max(gran, -(-(n_short + margin) // gran) * gran))
    return bs if 0 < bs < budget and bs % 4 == 0 else 0


def build_inference_tables(occ: jnp.ndarray, bound: float,
                           dilate_intervals: int = 2,
                           dilate_mask: int = 1,
                           variants: Tuple[str, ...] = ("nb5", "quad"),
                           ) -> InferenceTables:
    """All occupancy-derived lookup tables the compact render needs.

    `variants` selects which BLOCK-march tables to materialize — a session
    uses at most one of them (needed_variant_tables), and the unused one
    is 6.6-16.8 MB of dead device memory at grid 128. The default builds
    both (diagnostic scripts A/B the variants); production callers build
    with variants=() first, resolve the march plan from z_lo/z_hi, then
    fill the one table the plan needs via ensure_variant_tables."""
    z_lo, z_hi = column_intervals(occ, bound, dilate=dilate_intervals)
    return InferenceTables(
        z_lo=z_lo, z_hi=z_hi,
        col_bitmask=column_bitmasks(occ, dilate_mask),
        col_nbmask=column_bitmasks_neighborhood(occ),
        col_nb5mask=(column_bitmasks_neighborhood5(occ)
                     if "nb5" in variants else None),
        col_quadmask=(column_bitmasks_quadrant(occ)
                      if "quad" in variants else None),
        col_quadwmask=(column_bitmasks_quadrant_words(occ)
                       if "quadw" in variants else None),
        col_quadwxmask=(column_bitmasks_quadrant_words_xfold(occ)
                        if "quadwx" in variants else None),
        col_nb5wmask=(column_bitmasks_neighborhood5_words(occ)
                      if "nb5w" in variants else None),
        col_dilwords=(dilated_occupancy_words(occ)
                      if "dil" in variants else None))


def needed_variant_tables(march_group: int,
                          march_variant: str,
                          prepass: bool = False) -> Tuple[str, ...]:
    """Which optional block tables a resolved march plan consumes: only
    the group-2 block marchers use them (quadwx/quadw/quad/nb5w -> their
    own table, every other variant -> col_nb5mask); groups 1/3 and the
    fast modes march from the always-built col_nbmask / col_bitmask.
    prepass=True additionally needs the dilated-word activity table
    (group-2 only — the prepass envelope is the block-shared one)."""
    if march_group == 2:
        extra = ("dil",) if prepass else ()
        if march_variant in ("quadwx", "quadw", "quad", "nb5w"):
            return (march_variant,) + extra
        if march_variant in ("nb5wz", "nb5wz4", "nb5wp"):
            return ("nb5w",) + extra
        return ("nb5",) + extra
    return ()


def ensure_variant_tables(tables: InferenceTables, occ: jnp.ndarray,
                          need: Tuple[str, ...]) -> InferenceTables:
    """Fill any missing block-march tables the resolved plan needs (one
    extra jitted build per model load; base tables stay as-is)."""
    import jax

    upd = {}
    if "nb5" in need and tables.col_nb5mask is None:
        upd["col_nb5mask"] = jax.jit(column_bitmasks_neighborhood5)(occ)
    if "quad" in need and tables.col_quadmask is None:
        upd["col_quadmask"] = jax.jit(column_bitmasks_quadrant)(occ)
    if "quadw" in need and tables.col_quadwmask is None:
        upd["col_quadwmask"] = jax.jit(column_bitmasks_quadrant_words)(occ)
    if "quadwx" in need and tables.col_quadwxmask is None:
        upd["col_quadwxmask"] = jax.jit(
            column_bitmasks_quadrant_words_xfold)(occ)
    if "nb5w" in need and tables.col_nb5wmask is None:
        upd["col_nb5wmask"] = jax.jit(
            column_bitmasks_neighborhood5_words)(occ)
    if "dil" in need and tables.col_dilwords is None:
        upd["col_dilwords"] = jax.jit(dilated_occupancy_words)(occ)
    return tables._replace(**upd) if upd else tables


def compact_rays(active: jnp.ndarray, budget: int) -> CompactSet:
    """First-`budget` active rays -> slot table (static shapes)."""
    rank = jnp.cumsum(active.astype(jnp.int32)) - 1           # [N]
    n_active = rank[-1] + 1
    N = active.shape[0]
    slot = jnp.where(active, rank, budget)                    # drop overflow
    ray_idx = jnp.zeros((budget,), jnp.int32).at[
        jnp.minimum(slot, budget)].set(jnp.arange(N, dtype=jnp.int32),
                                       mode="drop")
    nslots = jnp.minimum(n_active, budget)
    slot_valid = jnp.arange(budget) < nslots
    return CompactSet(ray_idx=ray_idx, slot_valid=slot_valid,
                      n_active=n_active)


def march_rays_window(
    rays_o: jnp.ndarray,       # [B, 3] (already compacted)
    rays_d: jnp.ndarray,       # [B, 3]
    t_start: jnp.ndarray,      # [B]
    t_end: jnp.ndarray,        # [B]
    slot_valid: jnp.ndarray,   # [B]
    occ_grid: jnp.ndarray,     # [CAS, H, H, H] (cascade 0 used)
    bound: float,
    dt: float,
    num_cand: int,             # K2: static candidates within the window
    max_samples: int,          # S
    noise: Optional[jnp.ndarray] = None,
    nears: Optional[jnp.ndarray] = None,
) -> MarchResult:
    """Same candidate-lattice + occupancy + first-S selection as
    march_rays_uniform, but only over the per-ray window.

    noise: [B] in [0,1) start-jitter on the near-anchored lattice
    (march.py:123 semantics: candidates at nears + (k + noise) * dt).
    Because the window's t_start is snapped UP to the unshifted lattice,
    the noisy point one lattice step BEFORE t_start can still fall inside
    the window hull — the lattice therefore starts one step early and
    candidates below the full marcher's own start (nears + noise * dt,
    requires `nears`) are masked, which makes the window sample set
    EXACTLY the full marcher's restricted to the hull."""
    B = rays_o.shape[0]
    H = occ_grid.shape[1]
    if max_samples > num_cand:
        raise ValueError(
            f"max_samples ({max_samples}) cannot exceed window candidates "
            f"({num_cand})")

    if noise is None:
        t0 = t_start
        floor_t = None
    else:
        if nears is None:
            raise ValueError("noise marching needs `nears` for the lattice "
                             "floor")
        t0 = t_start + dt * (noise - 1.0)
        floor_t = nears + dt * noise - 1e-4 * dt
    k = jnp.arange(num_cand, dtype=jnp.float32)
    t_cand = t0[:, None] + k[None, :] * dt                    # [B, K2]

    pos = rays_o[:, None, :] + t_cand[..., None] * rays_d[:, None, :]
    pos = jnp.clip(pos, -bound, bound)
    gp = jnp.clip(0.5 * (pos / bound + 1.0) * H, 0, H - 1).astype(jnp.int32)
    flat = gp[..., 0] * (H * H) + gp[..., 1] * H + gp[..., 2]
    occ = occ_lookup(occ_grid[0], flat)

    valid = occ & (t_cand < t_end[:, None]) & slot_valid[:, None]
    if floor_t is not None:
        valid = valid & (t_cand >= floor_t[:, None])

    sel_k, mask = _first_s_select(valid, num_cand, max_samples, "topk")

    t_sel = t0[:, None] + sel_k * dt
    xyzs = rays_o[:, None, :] + t_sel[..., None] * rays_d[:, None, :]
    xyzs = jnp.clip(xyzs, -bound, bound)
    deltas = jnp.where(mask, dt, 0.0)
    ts = t_sel + dt
    return MarchResult(xyzs=xyzs, deltas=deltas, ts=ts, mask=mask)


def march_rays_window_bitmask(
    rays_o: jnp.ndarray,       # [B, 3] (already compacted)
    rays_d: jnp.ndarray,       # [B, 3]
    t_start: jnp.ndarray,      # [B]
    t_end: jnp.ndarray,        # [B]
    slot_valid: jnp.ndarray,   # [B]
    col_bitmask: jnp.ndarray,  # [H*H, H//32] uint32 from column_bitmasks
    bound: float,
    dt: float,
    num_cand: int,             # K2
    max_samples: int,          # S
    group: int = 2,
    select: str = "topk",
) -> MarchResult:
    """march_rays_window with the occupancy test restructured for the TPU
    memory system: instead of one gather row per (ray, candidate) —
    budget x K2 rows/frame, the dominant cost of the v2 marcher — fetch each
    ray's COLUMN bitstring once per `group` consecutive candidates (the
    0.25-1 MB bitmask table lives in VMEM) and test the per-candidate z bits
    with dense VPU math. Measured v5e @512²: 24 ms -> ~7 ms.

    Correctness envelope (midpoint fetch): within half a group the ray's
    (x,y) cell drifts by (group/2)*sqrt(3)*|d_xy| grid cells (independent
    of H, since dt tracks the cell size); the mask's `dilate`x3x3 OR must
    cover it. group=2 with dilate=1 covers EVERY unit direction — every
    sample the exact per-candidate test keeps is kept here too (guarded by
    tests/test_march2.py::test_bitmask_march_superset)."""
    B = rays_o.shape[0]
    W32 = col_bitmask.shape[1]
    H = W32 * 32
    if max_samples > num_cand:
        raise ValueError(
            f"max_samples ({max_samples}) cannot exceed window candidates "
            f"({num_cand})")
    G = (num_cand + group - 1) // group

    k = jnp.arange(num_cand, dtype=jnp.float32)
    t_cand = t_start[:, None] + k[None] * dt                   # [B, K2]

    # one column fetch per candidate GROUP, at the group's midpoint
    gk = jnp.arange(G, dtype=jnp.float32) * group + (group - 1) / 2.0
    t_g = t_start[:, None] + gk[None] * dt                     # [B, G]
    pg = rays_o[:, None, :] + t_g[..., None] * rays_d[:, None, :]
    pg = jnp.clip(pg, -bound, bound)
    cx = jnp.clip((pg[..., 0] / bound + 1.0) * 0.5 * H, 0, H - 1).astype(
        jnp.int32)
    cy = jnp.clip((pg[..., 1] / bound + 1.0) * 0.5 * H, 0, H - 1).astype(
        jnp.int32)
    rows = jnp.take(col_bitmask, (cx * H + cy).reshape(-1),
                    axis=0).reshape(B, G, W32)                 # [B, G, W32]

    # per-candidate z bit test, all dense (repeat + masked word select)
    pz = rays_o[:, 2:3] + t_cand * rays_d[:, 2:3]
    pz = jnp.clip(pz, -bound, bound)
    cz = jnp.clip((pz / bound + 1.0) * 0.5 * H, 0, H - 1).astype(jnp.int32)
    word = cz >> 5                                             # [B, K2]
    bit = (cz & 31).astype(jnp.uint32)
    rows_k = jnp.repeat(rows, group, axis=1)[:, :num_cand]     # [B, K2, W32]
    wmask = word[..., None] == jnp.arange(W32, dtype=jnp.int32)
    wsel = jnp.sum(jnp.where(wmask, rows_k, jnp.uint32(0)), axis=-1,
                   dtype=jnp.uint32)
    occ = ((wsel >> bit) & jnp.uint32(1)) > 0

    valid = occ & (t_cand < t_end[:, None]) & slot_valid[:, None]
    sel_k, mask = _first_s_select(valid, num_cand, max_samples, select)

    t_sel = t_start[:, None] + sel_k * dt
    xyzs = jnp.clip(
        rays_o[:, None, :] + t_sel[..., None] * rays_d[:, None, :],
        -bound, bound)
    deltas = jnp.where(mask, dt, 0.0)
    return MarchResult(xyzs=xyzs, deltas=deltas, ts=t_sel + dt, mask=mask)


def march_rays_window_bitmask_nb(
    rays_o: jnp.ndarray,       # [B, 3] (already compacted)
    rays_d: jnp.ndarray,       # [B, 3]
    t_start: jnp.ndarray,      # [B]
    t_end: jnp.ndarray,        # [B]
    slot_valid: jnp.ndarray,   # [B]
    col_nbmask: jnp.ndarray,   # [H*H, 9*(H//32)] from
                               # column_bitmasks_neighborhood
    bound: float,
    dt: float,
    num_cand: int,             # K2
    max_samples: int,          # S
    select: str = "topk",
    noise: Optional[jnp.ndarray] = None,
    nears: Optional[jnp.ndarray] = None,
) -> MarchResult:
    """EXACT bitmask march: one neighborhood-row fetch per 2-candidate
    group, per-candidate selection of the candidate's OWN column bits
    in-register. Sample-set-identical to the per-candidate exact marcher
    (march_rays_window) for every ray direction — the dilated single-column
    variant (march_rays_window_bitmask) over-admits empty neighbor cells
    and measured −2.0 dB of trained-model quality from budget crowding
    (scripts/quality_check.py). Costs ~1 ms more VPU select math per 512²
    frame; gather row count unchanged. Requires the drift envelope
    (dt/2)·(H/(2·bound)) <= 1 cell — always true for the production
    dt = 2·sqrt(3)·bound/H, checked at trace time otherwise.

    noise/nears: the training lattice jitter, with march_rays_window's
    exact semantics (candidates at nears + (k + noise)·dt, lattice started
    one step before the snapped t_start, pre-floor candidates masked).
    The jitter shifts the WHOLE lattice — fetch points ride the same
    shifted lattice, so the fetch-to-candidate drift envelope is the
    unchanged (dt/2)·|d_xy|. This is what lets the TRAINING march use the
    bitmask fetch: one 36-word row per 2-candidate group instead of one
    occupancy gather per candidate — half the march gather rows of the
    per-candidate path at the same sample set (trainbench A/B)."""
    B = rays_o.shape[0]
    W9 = col_nbmask.shape[1]
    W32 = W9 // 9
    H = W32 * 32
    group = 2
    if noise is None:
        t0 = t_start
        floor_t = None
    else:
        if nears is None:
            raise ValueError("noise marching needs `nears` for the lattice "
                             "floor")
        t0 = t_start + dt * (noise - 1.0)
        floor_t = nears + dt * noise - 1e-4 * dt
    # exactness envelope: drift (cells) = (dt/2)*|d_xy| / (2*bound/H); with
    # the production dt = 2*sqrt(3)*bound/H this is (sqrt(3)/2)*|d_xy| <= 1
    # for any direction, but a caller-supplied dt/bound combination can
    # exceed the ±1 neighborhood — refuse rather than silently mis-select
    # (empirically 146/256 rays diverge at half the envelope).
    drift_cells = (dt / 2.0) * H / (2.0 * bound)
    if drift_cells > 1.0 + 1e-6:
        raise ValueError(
            f"nb-march drift {drift_cells:.2f} cells exceeds the ±1 "
            f"neighborhood (dt={dt:.4f}, bound={bound}); use "
            "march_rays_window or the dilated bitmask for this geometry")
    if max_samples > num_cand:
        raise ValueError(
            f"max_samples ({max_samples}) cannot exceed window candidates "
            f"({num_cand})")
    G = (num_cand + group - 1) // group
    Kp = G * group                                             # padded K2

    # candidates laid out [B, G, group] so the per-group row broadcasts
    # into the select instead of being repeat-materialised (the [B, K2,
    # 9, W32] copy was ~0.75 GB/frame at 512²)
    kg = (jnp.arange(G, dtype=jnp.float32)[:, None] * group
          + jnp.arange(group, dtype=jnp.float32)[None, :])     # [G, group]
    t_cand = t0[:, None, None] + kg[None] * dt                 # [B, G, group]

    # group-midpoint fetch of the 3x3-neighborhood row (on the same —
    # possibly noise-shifted — lattice as the candidates)
    gk = jnp.arange(G, dtype=jnp.float32) * group + (group - 1) / 2.0
    t_g = t0[:, None] + gk[None] * dt                          # [B, G]
    pg = rays_o[:, None, :] + t_g[..., None] * rays_d[:, None, :]
    pg = jnp.clip(pg, -bound, bound)
    gx = jnp.clip((pg[..., 0] / bound + 1.0) * 0.5 * H, 0, H - 1).astype(
        jnp.int32)
    gy = jnp.clip((pg[..., 1] / bound + 1.0) * 0.5 * H, 0, H - 1).astype(
        jnp.int32)
    rows = jnp.take(col_nbmask, (gx * H + gy).reshape(-1),
                    axis=0).reshape(B, G, 9, W32)              # [B, G, 9, W32]

    # per-candidate exact cell; neighborhood offset vs the group midpoint
    # is in {-1, 0, 1}² for any unit direction (drift <= 0.87 cells)
    pos = (rays_o[:, None, None, :]
           + t_cand[..., None] * rays_d[:, None, None, :])
    pos = jnp.clip(pos, -bound, bound)
    gp = jnp.clip(0.5 * (pos / bound + 1.0) * H, 0, H - 1).astype(jnp.int32)
    cx, cy, cz = gp[..., 0], gp[..., 1], gp[..., 2]            # [B, G, group]
    dx = jnp.clip(cx - gx[..., None], -1, 1)
    dy = jnp.clip(cy - gy[..., None], -1, 1)
    nb = (dx + 1) * 3 + (dy + 1)                               # [B, G, group]

    word = cz >> 5
    bit = (cz & 31).astype(jnp.uint32)
    # two-stage in-register select with the rows broadcast over the group
    # slot axis: z-word across W32, then the column across the 9 neighbors
    wmask = (word[..., None, None]
             == jnp.arange(W32, dtype=jnp.int32))              # [B,G,g,1,W32]
    col_words = jnp.sum(
        jnp.where(wmask, rows[:, :, None, :, :], jnp.uint32(0)),
        axis=-1, dtype=jnp.uint32)                             # [B, G, g, 9]
    nmask = nb[..., None] == jnp.arange(9, dtype=jnp.int32)
    wsel = jnp.sum(jnp.where(nmask, col_words, jnp.uint32(0)),
                   axis=-1, dtype=jnp.uint32)                  # [B, G, group]
    occ = ((wsel >> bit) & jnp.uint32(1)) > 0

    # flatten to [B, Kp] and drop the padded tail candidates
    t_cand = t_cand.reshape(B, Kp)[:, :num_cand]
    occ = occ.reshape(B, Kp)[:, :num_cand]
    valid = occ & (t_cand < t_end[:, None]) & slot_valid[:, None]
    if floor_t is not None:
        valid = valid & (t_cand >= floor_t[:, None])
    sel_k, mask = _first_s_select(valid, num_cand, max_samples, select)

    t_sel = t0[:, None] + sel_k * dt
    xyzs = jnp.clip(
        rays_o[:, None, :] + t_sel[..., None] * rays_d[:, None, :],
        -bound, bound)
    deltas = jnp.where(mask, dt, 0.0)
    return MarchResult(xyzs=xyzs, deltas=deltas, ts=t_sel + dt, mask=mask)


def _zband_select_from_pairs(pairs: jnp.ndarray, base: jnp.ndarray,
                             czb: jnp.ndarray, nb: jnp.ndarray,
                             pack: bool) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """zband stages 0b/0c + the per-candidate select, shared by the
    nb5-table variants (zband/zband4: word pairs from the wslice-style
    pre-reduce) and the nb5w-table variants (nb5wz/nb5wz4: word pairs
    straight from the z-word-indexed row).

    pairs: [Bb, 1, G, 1, 25, 2] uint32 — neighbor nb's {w0, w0+1} z-words.
    base:  [Bb, G] — the 7-cell band start max(gz-3, 0); all candidate
           z's lie in [base, base+6] (group z-span ~2.1 cells + rounding).
    czb:   [Bb, 4, G, group] candidate z cells.
    nb:    [Bb, 4, G, group] neighbor index in 0..24.
    pack:  False -> 25-way single-word select (zband/nb5wz);
           True  -> pack 4 neighbors' 7-bit bands per word, 7-way select
           + shift by 7*(nb&3) (zband4/nb5wz4).
    Returns (wsel, bit) for the final (wsel >> bit) & 1 occupancy test."""
    Bb, G = pairs.shape[0], pairs.shape[2]
    # stage 0b: funnel-shift each neighbor's word pair down to the 7-bit
    # band starting at `base` — ONE word per neighbor answers every
    # candidate of the group
    s = (base & 31).astype(jnp.uint32)[:, None, :, None, None]
    lo, hi = pairs[..., 0], pairs[..., 1]
    fields = jnp.where(s > 0, (lo >> s) | (hi << (jnp.uint32(32) - s)), lo)
    fields = fields & jnp.uint32(0x7F)                      # [Bb,1,G,1,25]
    off = jnp.clip(czb - base[:, None, :, None], 0, 6).astype(jnp.uint32)
    if pack:
        # stage 0c: pack 4 neighbors' bands per word (4*7 = 28 bits)
        f4 = jnp.pad(fields, [(0, 0)] * 4 + [(0, 3)])
        f4 = f4.reshape(Bb, 1, G, 1, 7, 4)
        sh = jnp.arange(4, dtype=jnp.uint32) * 7
        packed7 = jnp.sum(f4 << sh, axis=-1,
                          dtype=jnp.uint32)                 # [Bb,1,G,1,7]
        nmask = (nb >> 2)[..., None] == jnp.arange(7, dtype=jnp.int32)
        wsel = jnp.sum(jnp.where(nmask, packed7, jnp.uint32(0)),
                       axis=-1, dtype=jnp.uint32)           # [Bb,4,G,group]
        off = off + jnp.uint32(7) * (nb & 3).astype(jnp.uint32)
    else:
        nmask = nb[..., None] == jnp.arange(25, dtype=jnp.int32)
        wsel = jnp.sum(jnp.where(nmask, fields, jnp.uint32(0)),
                       axis=-1, dtype=jnp.uint32)           # [Bb,4,G,group]
    return wsel, off


def march_rays_window_bitmask_nb_block(
    rays_o: jnp.ndarray,       # [4*Bb, 3] block-major (4 rays per 2x2 block)
    rays_d: jnp.ndarray,       # [4*Bb, 3]
    t_start: jnp.ndarray,      # [4*Bb] per-ray snapped window start
    t_end: jnp.ndarray,        # [4*Bb]
    slot_valid: jnp.ndarray,   # [4*Bb]
    t0_block: jnp.ndarray,     # [Bb] block window start — the fetch-lattice
                               # anchor every ray's t_start derives from
                               # (t_start_r in [t0_block-eps, t0_block+dt))
    d_center: jnp.ndarray,     # [Bb, 3] unit block-centre direction
    col_mask: jnp.ndarray,     # [H*H, 25*(H//32)] from
                               # column_bitmasks_neighborhood5, or for
                               # variant="quad" [4*H*H, 16*(H//32)] from
                               # column_bitmasks_quadrant
    bound: float,
    dt: float,
    num_cand: int,             # K2
    max_samples: int,          # S
    select: str = "topk",
    variant: str = "wslice",
) -> MarchResult:
    """Block-shared EXACT bitmask march: ONE neighborhood row fetch per
    (2x2-pixel block, 2-candidate group) serves all 8 of the block's
    candidates — 4x fewer march gather rows than the per-ray nb marcher at
    the same exact per-candidate column test (VERDICT r2 item 1b).

    variant: how the per-candidate bit is selected from the fetched row
    (same result, different VPU cost — measured in scripts/marchbench.py):
      "wslice": per (block, group) pre-reduce each neighbor's W32 z-words
        to the 2 words that can contain ANY of the group's candidates
        (z drift <= ~2 cells << 32: words (zf-3)>>5 and +1), then one flat
        50-way select per candidate — ~60% of the nb_first select math.
      "quad": directional quadrant-anchored fetch. The anchor sits HALF a
        lattice step after the group's first block-lattice candidate
        (2g + 0.5 instead of the midpoint 2g + 1), which makes the
        fetch-to-candidate t-drift one-sided: t_cand - t_fetch in
        [-0.5*dt - eps, +1.5*dt). The xy drift therefore points along the
        ray's travel direction, and a SIGNED per-axis window
        {-1, 0, +1, +2}*sign(d_xy) covers it — the fetched row holds 16
        columns instead of the symmetric envelope's 25, and the
        per-candidate select is 32-way instead of 50-way (the march
        phase's dominant VPU cost, PERF.md round-3 phase budget). Its
        envelope is DIRECTIONAL (nb_blockq_drift_cells): forward
        1.5*step*|d_xy| + angular <= 2 and backward 0.5*step*|d_xy| +
        angular <= 1; resolve_march_plan steps quad -> nb5w when it
        fails. Rays whose |d_x| (or |d_y|) is below the block centre's
        sign resolution drift at most ±angular <= 1 cell, which the
        {-1, 0} slots of EITHER sign's window cover.
      "quadw": quad with the word-pair selection BAKED INTO THE TABLE
        (column_bitmasks_quadrant_words, indexed by (quadrant, x, y,
        z-word)): the fetched 32-word row is exactly the {w0, w0+1} pair
        of all 16 columns, so the pre-reduce stage and its [*, NF*W32]
        intermediate disappear — the profiler showed that tensor's
        relayouts (not the select, not the fetch) were ~21% of the 512²
        frame (scripts/profile_frame.py). Same anchor, same directional
        envelope, sample-identical to "quad".
      "quadwx": quadw fetched from the sy-width-folded table
        (column_bitmasks_quadrant_words_xfold, [2*H*H*W32, 64]): the
        quadw table's 4*H*H*W32 rows sit past the TPU gather's row-count
        cliff at H=128 (~95M vs ~400M rows/s — scripts/quadwgather.py),
        which made the FETCH the march's dominant cost. Halving rows by
        carrying both sy quadrants per row keeps the gather in the
        full-rate zone; the per-BLOCK sy half is then selected by one
        cheap where on the un-broadcast [Bb, G, 64] fetch result before
        the unchanged 32-way per-candidate select. Bit-identical samples
        to "quadw"/"quad"; same anchor and directional envelope.
      "nb5w": the symmetric 5x5 envelope with the word pair baked into
        the table (column_bitmasks_neighborhood5_words, [H*H*W32, 50]):
        wslice's midpoint anchor and any-direction ±2 coverage, quadw's
        no-pre-reduce fetch, rows/width both inside the gather full-rate
        zone. 50-way select; sample-identical to "wslice"/"nb_first".
      "nb5wz"/"nb5wz4": the zband/zband4 select stages on the nb5w fetch
        — the word-pair stage (zband's 0a) comes free from the table, so
        only the funnel shift (and the 4-per-word pack for nb5wz4) stay
        amortised; per-candidate select is 25-way single words (nb5wz)
        or 7-way + shifts (nb5wz4). Same bits, same envelope.
      "nb_first": select the neighbor column (25 -> W32 words), then the
        z word (W32 -> 1).
      "zband": extend the pre-reduce one step — funnel-shift each
        neighbor's word pair down to the 7-cell z-band [gz-3, gz+3] that
        can contain any of the group's candidates (amortised over the
        block's 8 candidates), so the per-candidate select is 25-way over
        SINGLE words + a bit shift — ~half the wslice select math.
      "zband4": additionally pack 4 neighbors' 7-bit bands per uint32
        (25 fields -> 7 words), so the per-candidate select is 7-way +
        one shift by off + 7*(nb&3) — ~1/5 of the wslice select math.
        Same exact column test; the candidates' bits are untouched.

    Exactness envelope (per axis, in grid cells): each candidate's t lies
    within dt of the block fetch point t0_block + (2g+1)*dt because every
    ray's snapped t_start lies in [t0_block - eps, t0_block + dt) — so the
    xy drift is dt*|d_xy| = sqrt(3)*|d_xy| cells at the production
    dt = 2*sqrt(3)*bound/H, plus <=0.35 cells of intra-block angular
    offset. For |d_xy| <= 0.95 that stays under the ±2-cell neighborhood —
    every practical portrait camera (|d_xy| <= ~0.6 incl. pose rotation).
    Offsets are clipped to ±2; a hypothetical near-transverse ray
    (|d_xy| > 0.95) through a corner pixel could mis-test single cells —
    use march_rays_window_bitmask_nb (per-ray, any direction) for such
    geometry. Guarded by tests/test_march2.py block-exactness tests."""
    B = rays_o.shape[0]
    Bb = B // 4
    assert B % 4 == 0
    if variant == "quadw":
        # z-word-indexed quadrant table: [4*H*H*(H//32), 32]; recover H
        # from the row count (8*rows = H^3)
        H = int(round((8 * col_mask.shape[0]) ** (1.0 / 3.0)))
        W32 = H // 32
        assert 4 * H * H * W32 == col_mask.shape[0] and col_mask.shape[1] == 32
        NF = 16
    elif variant == "quadwx":
        # sy-width-folded quadw table: [2*H*H*(H//32), 64] (16*rows = H^3)
        H = int(round((16 * col_mask.shape[0]) ** (1.0 / 3.0)))
        W32 = H // 32
        assert 2 * H * H * W32 == col_mask.shape[0] and col_mask.shape[1] == 64
        NF = 16
    elif variant in ("nb5w", "nb5wz", "nb5wz4", "nb5wp"):
        # z-word-indexed symmetric 5x5 table: [H*H*(H//32), 50]
        H = int(round((32 * col_mask.shape[0]) ** (1.0 / 3.0)))
        W32 = H // 32
        assert H * H * W32 == col_mask.shape[0] and col_mask.shape[1] == 50
        NF = 25
    else:
        NF = 16 if variant == "quad" else 25   # columns per fetched row
        W32 = col_mask.shape[1] // NF
        H = W32 * 32
    group = 2
    # trace-time sanity on the lattice/grid relation (data-independent part
    # of the envelope): production dt gives sqrt(3) cells per step
    step_cells = dt * H / (2.0 * bound)
    if step_cells > 2.0 + 1e-6:
        raise ValueError(
            f"nb-block march: {step_cells:.2f} cells per lattice step "
            f"exceeds the ±2 neighborhood (dt={dt:.4f}, bound={bound}); "
            "use march_rays_window_bitmask_nb for this geometry")
    if max_samples > num_cand:
        raise ValueError(
            f"max_samples ({max_samples}) cannot exceed window candidates "
            f"({num_cand})")
    G = (num_cand + group - 1) // group
    Kp = G * group

    # ---- one fetch per (block, group): neighborhood row at the centre of
    # the group's candidate SPAN. Candidates live on each ray's OWN
    # lattice (t_start in [t0_block - eps, t0_block + dt)), so group g's
    # t values cover [t0_block + 2g*dt, t0_block + (2g+2)*dt) — midpoint
    # gk = 2g+1, giving |t_cand - t_fetch| <= dt as the envelope assumes.
    # ((group-1)/2, the per-ray-lattice midpoint used by the non-block
    # marchers, would sit 0.5*dt early here and stretch the worst case to
    # 1.5*dt — under-covered by nb_block_drift_cells.)
    # variant "quad" instead anchors HALF a step after the group's first
    # block-lattice candidate (2g + 0.5) — one-sided drift, signed window
    # (see docstring).
    o_blk = rays_o.reshape(Bb, 4, 3).mean(axis=1)          # == shared origin
    gk = jnp.arange(G, dtype=jnp.float32) * group + (
        0.5 if variant in ("quad", "quadw", "quadwx") else group / 2.0)
    t_g = t0_block[:, None] + gk[None] * dt                # [Bb, G]
    pg = o_blk[:, None, :] + t_g[..., None] * d_center[:, None, :]
    pg = jnp.clip(pg, -bound, bound)
    gx = jnp.clip((pg[..., 0] / bound + 1.0) * 0.5 * H, 0, H - 1).astype(
        jnp.int32)
    gy = jnp.clip((pg[..., 1] / bound + 1.0) * 0.5 * H, 0, H - 1).astype(
        jnp.int32)
    gz = jnp.clip((pg[..., 2] / bound + 1.0) * 0.5 * H, 0, H - 1).astype(
        jnp.int32)                                         # [Bb, G]
    w0 = jnp.clip(jnp.maximum(gz - 3, 0) >> 5, 0, W32 - 1)  # [Bb, G]
    if variant in ("quad", "quadw", "quadwx"):
        # per-block direction quadrant selects the signed-window slice
        sx = jnp.where(d_center[:, 0] < 0, -1, 1).astype(jnp.int32)  # [Bb]
        sy = jnp.where(d_center[:, 1] < 0, -1, 1).astype(jnp.int32)
        q = ((sx < 0).astype(jnp.int32) * 2
             + (sy < 0).astype(jnp.int32))                 # [Bb]
        if variant == "quadwx":
            # sy lives in the row's width half, sx in the index
            idx = ((sx < 0).astype(jnp.int32)[:, None] * (H * H)
                   + gx * H + gy) * W32 + w0
        else:
            idx = q[:, None] * (H * H) + gx * H + gy
            if variant == "quadw":
                # z-word-indexed rows: the {w0, w0+1} pair per column comes
                # straight from the gather — no word-pair pre-reduce, no
                # [*, NF*W32] intermediate (profile_frame.py: that tensor's
                # relayouts were ~21% of the frame)
                idx = idx * W32 + w0
    else:
        idx = gx * H + gy
        if variant in ("nb5w", "nb5wz", "nb5wz4", "nb5wp"):
            idx = idx * W32 + w0
    if variant == "quadw":
        rows_q = jnp.take(col_mask, idx.reshape(-1),
                          axis=0).reshape(Bb, 1, G, 1, 32)
    elif variant == "quadwx":
        # one where on the UN-BROADCAST fetch result picks the block's sy
        # half — O(Bb*G*32), not part of the per-candidate select
        rows64 = jnp.take(col_mask, idx.reshape(-1),
                          axis=0).reshape(Bb, G, 64)
        rows_q = jnp.where((sy < 0)[:, None, None],
                           rows64[..., 32:], rows64[..., :32]
                           ).reshape(Bb, 1, G, 1, 32)
    elif variant == "nb5wp":
        # Pallas select: the whole per-candidate test + first-S scan runs
        # in one kernel on the RAW fetched rows (ops/march_select_pallas).
        # Bit-exact to "nb5w" (same anchors, same fetch, same clip
        # semantics); parity-tested through the same block-exactness suite.
        from .march_select_pallas import march_select_pallas

        rows_flat = jnp.take(col_mask, idx.reshape(-1), axis=0)
        sel = march_select_pallas(
            rows_flat, gx, gy, w0, rays_o, rays_d, t_start, t_end,
            slot_valid, bound, dt, H, num_cand, max_samples)
        mask = sel >= 0
        sel_k = jnp.where(mask, sel, 0).astype(jnp.float32)
        t_sel = t_start[:, None] + sel_k * dt
        xyzs = jnp.clip(
            rays_o[:, None, :] + t_sel[..., None] * rays_d[:, None, :],
            -bound, bound)
        deltas = jnp.where(mask, dt, 0.0)
        return MarchResult(xyzs=xyzs, deltas=deltas, ts=t_sel + dt,
                           mask=mask)
    elif variant in ("nb5w", "nb5wz", "nb5wz4"):
        rows_w = jnp.take(col_mask, idx.reshape(-1),
                          axis=0).reshape(Bb, 1, G, 1, 50)
    else:
        rows = jnp.take(col_mask, idx.reshape(-1),
                        axis=0).reshape(Bb, 1, G, 1, NF, W32)  # bcast dims

    # ---- per-candidate exact cells on each ray's OWN lattice
    kg = (jnp.arange(G, dtype=jnp.float32)[:, None] * group
          + jnp.arange(group, dtype=jnp.float32)[None, :])  # [G, group]
    t_cand = t_start[:, None, None] + kg[None] * dt         # [B, G, group]
    pos = (rays_o[:, None, None, :]
           + t_cand[..., None] * rays_d[:, None, None, :])
    pos = jnp.clip(pos, -bound, bound)
    gp = jnp.clip(0.5 * (pos / bound + 1.0) * H, 0, H - 1).astype(jnp.int32)
    cx, cy, cz = gp[..., 0], gp[..., 1], gp[..., 2]        # [B, G, group]
    # block-shaped views [Bb, 4, G, group]
    cxb = cx.reshape(Bb, 4, G, group)
    cyb = cy.reshape(Bb, 4, G, group)
    czb = cz.reshape(Bb, 4, G, group)
    if variant in ("quad", "quadw", "quadwx"):
        # signed offset -> canonical window index i = sign*(c - g) + 1 in
        # 0..3 (the {-1, 0, +1, +2}*sign window)
        ix = jnp.clip(sx[:, None, None, None]
                      * (cxb - gx[:, None, :, None]) + 1, 0, 3)
        iy = jnp.clip(sy[:, None, None, None]
                      * (cyb - gy[:, None, :, None]) + 1, 0, 3)
        nb = ix * 4 + iy                                   # [Bb, 4, G, group]
    else:
        dx = jnp.clip(cxb - gx[:, None, :, None], -2, 2)
        dy = jnp.clip(cyb - gy[:, None, :, None], -2, 2)
        nb = (dx + 2) * 5 + (dy + 2)                       # [Bb, 4, G, group]

    word = czb >> 5
    bit = (czb & 31).astype(jnp.uint32)
    live = (((t_cand < t_end[:, None, None]) & slot_valid[:, None, None])
            .reshape(Bb, 4, G, group) if DEBUG_WORD_ENVELOPE else None)
    if variant in ("zband", "zband4"):
        # stage 0a (amortised like wslice): the 2 words that can contain
        # any of the group's candidates
        base = jnp.maximum(gz - 3, 0)                       # [Bb, G]
        w0 = jnp.clip(base >> 5, 0, W32 - 1)
        wm = ((w0[:, None, :, None, None, None, None]
               + jnp.arange(2, dtype=jnp.int32)[:, None])
              == jnp.arange(W32, dtype=jnp.int32))
        rows2 = jnp.sum(
            jnp.where(wm, rows[..., :, None, :], jnp.uint32(0)),
            axis=-1, dtype=jnp.uint32)                      # [Bb,1,G,1,25,2]
        wsel, bit = _zband_select_from_pairs(rows2, base, czb, nb,
                                             pack=variant == "zband4")
    elif variant in ("quadw", "quadwx"):
        # the fetched row IS the word pair per column (nb*2 + i layout):
        # one flat 32-way select per candidate, nothing amortised
        widx = _word_pair_index(word, w0[:, None, :, None], live)
        j2 = nb * 2 + widx                                 # [Bb, 4, G, group]
        fmask = (j2[..., None]
                 == jnp.arange(32, dtype=jnp.int32))       # [Bb,4,G,g,32]
        wsel = jnp.sum(
            jnp.where(fmask, rows_q, jnp.uint32(0)),
            axis=-1, dtype=jnp.uint32)                     # [Bb, 4, G, group]
    elif variant == "nb5w":
        # symmetric word-baked row: flat 50-way select (25 neighbors x 2
        # words), nothing amortised — the nb5 analogue of quadw
        widx = _word_pair_index(word, w0[:, None, :, None], live)
        j2 = nb * 2 + widx                                 # [Bb, 4, G, group]
        fmask = (j2[..., None]
                 == jnp.arange(50, dtype=jnp.int32))       # [Bb,4,G,g,50]
        wsel = jnp.sum(
            jnp.where(fmask, rows_w, jnp.uint32(0)),
            axis=-1, dtype=jnp.uint32)                     # [Bb, 4, G, group]
    elif variant in ("nb5wz", "nb5wz4"):
        # zband on the nb5w fetch: the word-pair stage-0a comes FREE from
        # the table (row field nb*2+i = neighbor nb's word w0+i), so only
        # the funnel shift (0b) and optional pack (0c) remain amortised;
        # the per-candidate select halves (25-way single words) or drops
        # to 7-way + shifts (nb5wz4)
        base = jnp.maximum(gz - 3, 0)                       # [Bb, G]
        wsel, bit = _zband_select_from_pairs(
            rows_w.reshape(Bb, 1, G, 1, 25, 2), base, czb, nb,
            pack=variant == "nb5wz4")
    elif variant in ("wslice", "quad"):
        # stage 0 (amortised over the block's 8 candidates): per (block,
        # group) keep only the 2 z-words that can contain any candidate —
        # the group's z span is |dt|*|dz| + angular <= ~2.1 cells (quad:
        # [-1.3, +3] around gz), so all candidate words lie in {w0, w0+1}
        # with w0 = (zf-3)>>5 (7 cells < 32 can cross at most one word
        # boundary; w0 hoisted above for the quadw fetch index)
        # wm [Bb,1,G,1,1,2,W32]: word-pair one-hot; rows2[..., n, i] =
        # rows[..., n, w0+i]
        wm = ((w0[:, None, :, None, None, None, None]
               + jnp.arange(2, dtype=jnp.int32)[:, None])
              == jnp.arange(W32, dtype=jnp.int32))
        rows2 = jnp.sum(
            jnp.where(wm, rows[..., :, None, :], jnp.uint32(0)),
            axis=-1, dtype=jnp.uint32)                     # [Bb,1,G,1,NF,2]
        # flat 2*NF-way select (50 symmetric / 32 quad): index = nb*2 +
        # (word - w0), clipped into range
        widx = _word_pair_index(word, w0[:, None, :, None], live)
        j2 = nb * 2 + widx                                 # [Bb, 4, G, group]
        fmask = (j2[..., None]
                 == jnp.arange(2 * NF, dtype=jnp.int32))   # [Bb,4,G,g,2NF]
        wsel = jnp.sum(
            jnp.where(fmask, rows2.reshape(Bb, 1, G, 1, 2 * NF),
                      jnp.uint32(0)),
            axis=-1, dtype=jnp.uint32)                     # [Bb, 4, G, group]
    elif variant == "nb_first":
        # neighbor column first (25 -> W32 words), then the z word
        nmask = (nb[..., None, None]
                 == jnp.arange(25, dtype=jnp.int32)[:, None])
        nb_words = jnp.sum(jnp.where(nmask, rows, jnp.uint32(0)),
                           axis=-2, dtype=jnp.uint32)      # [Bb,4,G,g,W32]
        wmask = word[..., None] == jnp.arange(W32, dtype=jnp.int32)
        wsel = jnp.sum(jnp.where(wmask, nb_words, jnp.uint32(0)),
                       axis=-1, dtype=jnp.uint32)          # [Bb, 4, G, group]
    else:
        raise ValueError(f"unknown nb-block select variant {variant!r}")
    occ = (((wsel >> bit) & jnp.uint32(1)) > 0).reshape(B, Kp)[:, :num_cand]

    t_cand = t_cand.reshape(B, Kp)[:, :num_cand]
    valid = occ & (t_cand < t_end[:, None]) & slot_valid[:, None]
    sel_k, mask = _first_s_select(valid, num_cand, max_samples, select)

    t_sel = t_start[:, None] + sel_k * dt
    xyzs = jnp.clip(
        rays_o[:, None, :] + t_sel[..., None] * rays_d[:, None, :],
        -bound, bound)
    deltas = jnp.where(mask, dt, 0.0)
    return MarchResult(xyzs=xyzs, deltas=deltas, ts=t_sel + dt, mask=mask)


def march_rays_window_bitmask_nb_block_quad(
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    t_start: jnp.ndarray,
    t_end: jnp.ndarray,
    slot_valid: jnp.ndarray,
    t0_block: jnp.ndarray,
    d_center: jnp.ndarray,
    col_quadmask: jnp.ndarray,  # [4*H*H, 16*(H//32)] from
                                # column_bitmasks_quadrant
    bound: float,
    dt: float,
    num_cand: int,
    max_samples: int,
    select: str = "topk",
) -> MarchResult:
    """Directional quadrant-anchored block-shared EXACT bitmask march —
    named entry point for march_rays_window_bitmask_nb_block(
    variant="quad"); see that docstring for the signed-window anchor and
    the directional exactness envelope (nb_blockq_drift_cells)."""
    return march_rays_window_bitmask_nb_block(
        rays_o, rays_d, t_start, t_end, slot_valid, t0_block, d_center,
        col_quadmask, bound, dt, num_cand, max_samples, select=select,
        variant="quad")


def march_rays_window_bitmask_nb_block3(
    rays_o: jnp.ndarray,       # [4*Bb, 3] block-major (4 rays per 2x2 block)
    rays_d: jnp.ndarray,       # [4*Bb, 3]
    nears: jnp.ndarray,        # [4*Bb] per-ray AABB entry (candidates
                               # before it are masked, not lattice-shifted)
    t_end: jnp.ndarray,        # [4*Bb]
    slot_valid: jnp.ndarray,   # [4*Bb]
    t0_block: jnp.ndarray,     # [Bb] block window start — ALL 4 rays march
                               # on THIS lattice (t = t0_block + k*dt)
    d_center: jnp.ndarray,     # [Bb, 3] unit block-centre direction
    col_nbmask: jnp.ndarray,   # [H*H, 9*(H//32)] from
                               # column_bitmasks_neighborhood (3x3)
    bound: float,
    dt: float,
    num_cand: int,             # K2
    max_samples: int,          # S
    select: str = "topk",
) -> MarchResult:
    """Block-LATTICE exact bitmask march: the ±1 (3x3, 18-way select)
    variant of march_rays_window_bitmask_nb_block.

    MEASURED NEGATIVE RESULT (round 3, kept parity-tested like the fused
    Pallas kernel and the MXU lookup): 31.4 FPS vs the ±2 block marcher's
    32.9 on the 512² bench (the pre-reduce + double select layers cost
    more than the 50->18-way shrink saves), and the dt-bounded lattice
    phase shift costs −0.38 dB on the trained grid-128 oracle
    (scripts/quality_check.py variant I) — the sample-placement change is
    inherent to sharing the block lattice, not a bug. Opt-in via
    march_group=3 only; serving/cli step it down by drift envelope.

    The ±2/5x5 block marcher pays a 50-way per-candidate word select
    because each ray keeps its own near-anchored lattice, adding dt*|d_xy|
    of fetch-to-candidate drift. Snapping every ray of a 2x2 block to the
    BLOCK's lattice (all candidates at t0_block + k*dt) makes the along-ray
    offset exactly dt/2 (fetch at the candidate-pair midpoint k = 2g+0.5),
    so the xy drift is (dt/2)*|d_xy| = (sqrt(3)/2)*|d_xy| cells at the
    production dt — plus the intra-block angular offset. For portrait
    cameras (session.py checks nb_block3_drift_cells <= 1 at model load)
    that fits the ±1 neighborhood: 2.8x less select math, 2.8x smaller
    fetch rows, same row count.

    Trade-off vs the per-ray-lattice marchers: sample positions shift by
    up to dt along each ray (a lattice phase change, same class as the
    reference's per-ray noise jitter at train time, raymarching.cu:391-400)
    — quality-guarded by scripts/quality_check.py variant I. Rays whose
    AABB entry lies after t0_block keep their first candidates masked via
    `nears` instead of shifting the lattice (alignment with the group
    fetch is what the envelope proof needs)."""
    B = rays_o.shape[0]
    Bb = B // 4
    assert B % 4 == 0
    W9 = col_nbmask.shape[1]
    W32 = W9 // 9
    H = W32 * 32
    group = 2
    # data-independent envelope part: (dt/2) along the ray must stay within
    # ±1 cell even for a transverse ray before the angular term (the
    # host-side nb_block3_drift_cells check adds it per camera/grid)
    half_step_cells = (dt / 2.0) * H / (2.0 * bound)
    if half_step_cells > 1.0 + 1e-6:
        raise ValueError(
            f"nb-block3 march: {half_step_cells:.2f} cells per half-step "
            f"exceeds the ±1 neighborhood (dt={dt:.4f}, bound={bound}); "
            "use march_rays_window_bitmask_nb_block (±2) or the per-ray "
            "nb march for this geometry")
    if max_samples > num_cand:
        raise ValueError(
            f"max_samples ({max_samples}) cannot exceed window candidates "
            f"({num_cand})")
    G = (num_cand + group - 1) // group
    Kp = G * group

    # ---- one 3x3-neighborhood fetch per (block, group) at the candidate
    # PAIR midpoint: candidates sit exactly at k = 2g, 2g+1 on the block
    # lattice, so gk = 2g + 0.5 gives |t_cand - t_fetch| = dt/2
    o_blk = rays_o.reshape(Bb, 4, 3).mean(axis=1)          # == shared origin
    gk = jnp.arange(G, dtype=jnp.float32) * group + 0.5
    t_g = t0_block[:, None] + gk[None] * dt                # [Bb, G]
    pg = o_blk[:, None, :] + t_g[..., None] * d_center[:, None, :]
    pg = jnp.clip(pg, -bound, bound)
    gx = jnp.clip((pg[..., 0] / bound + 1.0) * 0.5 * H, 0, H - 1).astype(
        jnp.int32)
    gy = jnp.clip((pg[..., 1] / bound + 1.0) * 0.5 * H, 0, H - 1).astype(
        jnp.int32)
    gz = jnp.clip((pg[..., 2] / bound + 1.0) * 0.5 * H, 0, H - 1).astype(
        jnp.int32)                                         # [Bb, G]
    rows = jnp.take(col_nbmask, (gx * H + gy).reshape(-1),
                    axis=0).reshape(Bb, 1, G, 1, 9, W32)   # ray/slot bcast

    # ---- per-candidate exact cells, ALL on the block lattice
    kg = (jnp.arange(G, dtype=jnp.float32)[:, None] * group
          + jnp.arange(group, dtype=jnp.float32)[None, :])  # [G, group]
    t_cand = t0_block[:, None, None] + kg[None] * dt        # [Bb, G, group]
    t_cand4 = jnp.broadcast_to(t_cand[:, None], (Bb, 4, G, group))
    pos = (rays_o.reshape(Bb, 4, 1, 1, 3)
           + t_cand4[..., None] * rays_d.reshape(Bb, 4, 1, 1, 3))
    pos = jnp.clip(pos, -bound, bound)
    gp = jnp.clip(0.5 * (pos / bound + 1.0) * H, 0, H - 1).astype(jnp.int32)
    cxb, cyb, czb = gp[..., 0], gp[..., 1], gp[..., 2]     # [Bb, 4, G, group]
    dx = jnp.clip(cxb - gx[:, None, :, None], -1, 1)
    dy = jnp.clip(cyb - gy[:, None, :, None], -1, 1)
    nb = (dx + 1) * 3 + (dy + 1)                           # [Bb, 4, G, group]

    word = czb >> 5
    bit = (czb & 31).astype(jnp.uint32)
    live = (((t_cand4 < t_end.reshape(Bb, 4)[..., None, None])
             & slot_valid.reshape(Bb, 4)[..., None, None])
            if DEBUG_WORD_ENVELOPE else None)
    # word-pair pre-reduce (same trick as the ±2 wslice variant): the
    # group's z span is <= ~2.5 cells, so all candidate words lie in
    # {w0, w0+1} with w0 = (gz-2)>>5 (5 cells < 32 cross at most one
    # word boundary)
    w0 = jnp.clip(jnp.maximum(gz - 2, 0) >> 5, 0, W32 - 1)     # [Bb, G]
    wm = ((w0[:, None, :, None, None, None, None]
           + jnp.arange(2, dtype=jnp.int32)[:, None])
          == jnp.arange(W32, dtype=jnp.int32))
    rows2 = jnp.sum(
        jnp.where(wm, rows[..., :, None, :], jnp.uint32(0)),
        axis=-1, dtype=jnp.uint32)                         # [Bb,1,G,1,9,2]
    widx = _word_pair_index(word, w0[:, None, :, None], live)
    j2 = nb * 2 + widx                                     # [Bb, 4, G, group]
    fmask = (j2[..., None]
             == jnp.arange(18, dtype=jnp.int32))           # [Bb,4,G,g,18]
    wsel = jnp.sum(
        jnp.where(fmask, rows2.reshape(Bb, 1, G, 1, 18), jnp.uint32(0)),
        axis=-1, dtype=jnp.uint32)                         # [Bb, 4, G, group]
    occ = (((wsel >> bit) & jnp.uint32(1)) > 0).reshape(B, Kp)[:, :num_cand]

    t_cand = t_cand4.reshape(B, Kp)[:, :num_cand]
    valid = (occ & (t_cand >= nears[:, None]) & (t_cand < t_end[:, None])
             & slot_valid[:, None])
    sel_k, mask = _first_s_select(valid, num_cand, max_samples, select)

    t0r = jnp.repeat(t0_block, 4)
    t_sel = t0r[:, None] + sel_k * dt
    xyzs = jnp.clip(
        rays_o[:, None, :] + t_sel[..., None] * rays_d[:, None, :],
        -bound, bound)
    deltas = jnp.where(mask, dt, 0.0)
    return MarchResult(xyzs=xyzs, deltas=deltas, ts=t_sel + dt, mask=mask)


def default_window_candidates(bound: float, grid_size: int, dt: float,
                              max_extent: float = 1.2) -> int:
    """Static K2: candidates covering `max_extent` world units of window
    (default 1.2 ≈ a generously dilated head) plus padding."""
    return int(math.ceil(max_extent / dt)) + 4


def nb_block_drift_cells(dt: float, bound: float, grid_size: int,
                         focal: float, t_max: float,
                         min_dz: float) -> float:
    """Worst-case per-axis cell drift between a candidate's true xy cell
    and the block-shared fetch cell (march_rays_window_bitmask_nb_block):
    lattice-phase drift dt*|d_xy| (each ray's own near-anchored t_start
    lies within one step of the block anchor) plus the intra-block angular
    offset (~1 pixel of direction difference integrated over the ray
    length). The block-shared march is EXACT while this stays within the
    ±2-cell neighborhood; production 512²/grid-128 portrait cameras sit
    near 1.0, but low-resolution-per-cell geometries (e.g. 128² renders on
    a 128 grid) exceed 2 and must fall back to the per-ray nb march —
    the -0.4 dB block-path delta measured there (quality_check --grid 128
    --res 128)."""
    cells_per_world = grid_size / (2.0 * bound)
    max_dxy = math.sqrt(max(0.0, 1.0 - min_dz * min_dz))
    step_drift = dt * cells_per_world * max(max_dxy, 1e-3)
    angular = t_max * (1.0 / max(focal, 1e-6)) * cells_per_world
    return step_drift + angular


def nb_blockq_drift_cells(dt: float, bound: float, grid_size: int,
                          focal: float, t_max: float,
                          min_dz: float) -> Tuple[float, float]:
    """(forward, backward) worst-case per-axis cell drift for the
    quadrant-anchored block march (march_rays_window_bitmask_nb_block_quad):
    the half-step fetch anchor makes the lattice-phase drift one-sided —
    1.5 steps forward, 0.5 back — plus the symmetric intra-block angular
    offset on both sides. The march is EXACT while forward <= 2 AND
    backward <= 1 (the signed {-1, 0, +1, +2} window)."""
    cells_per_world = grid_size / (2.0 * bound)
    max_dxy = math.sqrt(max(0.0, 1.0 - min_dz * min_dz))
    step = dt * cells_per_world * max(max_dxy, 1e-3)
    angular = t_max * (1.0 / max(focal, 1e-6)) * cells_per_world
    return 1.5 * step + angular, 0.5 * step + angular


def nb_block3_drift_cells(dt: float, bound: float, grid_size: int,
                          focal: float, t_max: float,
                          min_dz: float) -> float:
    """Worst-case per-axis cell drift for the block-LATTICE 3x3 marcher
    (march_rays_window_bitmask_nb_block3): every candidate sits dt/2 from
    its group's fetch point on the shared lattice — half the per-ray-lattice
    phase term of nb_block_drift_cells — plus the same intra-block angular
    offset. The 3x3 march is EXACT while this stays <= 1; session.py falls
    back to the ±2 (then per-ray) marcher otherwise."""
    cells_per_world = grid_size / (2.0 * bound)
    max_dxy = math.sqrt(max(0.0, 1.0 - min_dz * min_dz))
    half_step_drift = 0.5 * dt * cells_per_world * max(max_dxy, 1e-3)
    angular = t_max * (1.0 / max(focal, 1e-6)) * cells_per_world
    return half_step_drift + angular


def measured_window_candidates(settings, z_lo, z_hi, poses, intrinsics,
                               H: int, W: int, block: bool = True,
                               margin: int = 4, pose_batch: int = 8) -> int:
    """Exact per-trajectory K2: run the serving window analysis
    (ray_windows — the same geometry and pads the renderer uses) over
    EVERY trajectory pose against the frozen serving occupancy and size
    K2 from the actually-needed candidate count, instead of the
    conservative global-z-band bound (window_candidates_for_scene).

    This is a measurement, not a heuristic: serving only ever renders the
    dataset trajectory's poses against a static grid, so the measured max
    IS the worst case. `margin` absorbs the learned per-frame camera
    refinement (train_camera's dT/dR, degrees/centimeters) and fp lattice
    snapping. The bench scene measures 40 vs the geometric bound's 50 —
    ~20% of per-candidate march select math (the largest non-gather-floor
    phase, PERF.md) spent on always-masked slack. Runtime escape: the
    compact renderers report each frame's max needed count (`n_winmax`)
    and serving rebuilds with a larger K2 if a frame ever exceeds it
    (serving/session.py) — the silent window-truncation class the round-3
    K2 find exposed (−11 dB at grid 128) is detected either way.

    block=True measures 2x2-block-centre windows (pad 3.0 — the geometry
    of render_rays_compact_blocks, whose per-ray [t_start, t_end) windows
    are subsets of their block's); block=False measures per-ray windows
    (pad 2.0, render_rays_compact). Rays under ray_windows' min_axis_frac
    fallback carry [near, far] windows and are measured as such — the
    result stays a true bound (callers clamp to the geometric K2, so a
    wide-FOV outlier can only lose the optimization, never correctness).
    Cost: one jitted window pass per `pose_batch` poses, once per model
    load (~1 s for a 500-frame trajectory at 512²)."""
    import numpy as np

    from ..utils.rays import get_rays
    from .ray import near_far_from_aabb

    aabb = jnp.asarray(settings.aabb, jnp.float32)
    dt, bound = settings.dt, settings.bound
    pad = 3.0 if block else 2.0
    poses = np.asarray(poses, np.float32).reshape(-1, 4, 4)
    P = len(poses)
    pose_batch = max(1, min(pose_batch, P))

    @jax.jit
    def batch_max_steps(pb):                                   # [b, 4, 4]
        rays = get_rays(pb, intrinsics, H, W, N=-1)
        b = pb.shape[0]
        if block:
            db = rays["rays_d"].reshape(
                b, H // 2, 2, W // 2, 2, 3).transpose(
                0, 1, 3, 2, 4, 5).reshape(b, H * W // 4, 4, 3)
            d = db.mean(axis=2)
            d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
            o = jnp.broadcast_to(rays["rays_o"][:, :1], d.shape)
            d = d.reshape(-1, 3)
            o = o.reshape(-1, 3)
        else:
            o = rays["rays_o"].reshape(-1, 3)
            d = rays["rays_d"].reshape(-1, 3)
        nears, fars = near_far_from_aabb(o, d, aabb, settings.min_near)
        win = ray_windows(o, d, nears, fars, z_lo, z_hi, bound, dt,
                          pad_steps=pad)
        steps = jnp.ceil((win.t_end - win.t_start) / dt)
        return jnp.max(jnp.where(win.active, steps, 0.0))

    mx = 0.0
    for s in range(0, P, pose_batch):
        pb = poses[s:s + pose_batch]
        if len(pb) < pose_batch:                 # one compile for all calls
            pb = np.concatenate(
                [pb, np.repeat(pb[-1:], pose_batch - len(pb), axis=0)])
        mx = max(mx, float(batch_max_steps(jnp.asarray(pb))))
    # +1: the march admits candidates at t_cand < t_end strictly, so the
    # needed count is ceil((t_end - t_start)/dt) rounded outward once
    k2 = int(mx) + 1 + margin
    k2 = max(k2, settings.max_steps, 16)
    return k2 + (k2 % 2)


def measure_real_blocks_host(occ3, aabb, min_near: float, origin,
                             d_blocks, t_start_blk, t_end_blk, active_blk,
                             bound: float, dt: float, K2: int,
                             chunk: int = 16384) -> int:
    """Host-side EXACT count of REAL 2x2 blocks — blocks where >= 1 of the
    4 rays has >= 1 candidate whose cell is occupied — for sizing the
    post-march field-eval budget (render_rays_compact_blocks eval_budget).

    The window analysis (ray_windows) activates any block whose centre ray
    crosses a nonempty column z-SLAB; on a trained crust that over-admits
    ~2.6x (215k window-active vs 82k real rays at 512²/grid 128, measured).
    This reproduces the march's per-candidate criterion in numpy (per-ray
    near-anchored dt lattice from the BLOCK window, candidate cell
    occupancy test — the 5x5-neighborhood tables are a fetch construct,
    the candidate test itself is per-ray exact), so the count converges to
    the renderer's n_real diagnostic; callers add a margin and keep the
    n_real overflow escape for anything that still drifts. Cost: ~20M
    numpy cell lookups at 512² (<2 s), once per model load.
    """
    occ3 = np.asarray(occ3)
    Hg = occ3.shape[0]
    idx = np.nonzero(np.asarray(active_blk))[0]
    o = np.asarray(origin, np.float32)
    lo = np.asarray(aabb[:3], np.float32)
    hi = np.asarray(aabb[3:], np.float32)
    d_blocks = np.asarray(d_blocks, np.float32)
    t0_all = np.asarray(t_start_blk, np.float32)
    t1_all = np.asarray(t_end_blk, np.float32)
    ks = np.arange(K2, dtype=np.float32)
    n_real = 0
    for s in range(0, len(idx), chunk):
        sel = idx[s:s + chunk]
        d = d_blocks[sel]                                  # [b, 4, 3]
        t0b = t0_all[sel][:, None]
        t1b = t1_all[sel][:, None]
        with np.errstate(divide="ignore", invalid="ignore"):
            inv = 1.0 / d
        ta = (lo[None, None] - o[None, None]) * inv
        tb = (hi[None, None] - o[None, None]) * inv
        tmin = np.minimum(ta, tb).max(-1)                  # [b, 4]
        tmax = np.maximum(ta, tb).min(-1)
        near = np.maximum(tmin, min_near)
        t_start = np.maximum(near, t0b)
        k0 = np.ceil(np.maximum(t_start - near, 0.0) / dt - 1e-4)
        t_start = near + k0 * dt
        t_end = np.minimum(tmax, t1b)
        t = t_start[..., None] + ks[None, None] * dt       # [b, 4, K2]
        p = o[None, None, None] + t[..., None] * d[:, :, None, :]
        p = np.clip(p, -bound, bound)
        cell = np.clip(((p / bound + 1.0) * (0.5 * Hg)).astype(np.int32),
                       0, Hg - 1)
        hit = occ3[cell[..., 0], cell[..., 1], cell[..., 2]]
        hit &= t <= t_end[..., None]
        n_real += int(hit.any(axis=(1, 2)).sum())
    return n_real


def measure_bucket_plan(settings, z_lo, z_hi, col_dilwords, poses,
                        intrinsics, H: int, W: int, K2: int,
                        k2s_override: int = 0, pose_batch: int = 8,
                        min_saving: float = 0.08, log=print):
    """Trajectory-measured SHORT/LONG bucket plan for the group-2 block
    march (render_rays_compact_blocks march_bucket): run the prepass span
    analysis (prepass_block_spans) over every trajectory pose, pick the
    short-bucket candidate count K2s that minimizes the modeled march
    cost sum(span <= K2s ? K2s : K2) — a linear-in-K2 proxy for the
    per-block fetch+select work — and return the worst-case per-pose
    short/long ray demands for budget sizing.

    Returns (k2s, max_short_rays, max_long_rays, max_admit_rays);
    k2s == 0 means bucketing is not worth a second march program on this
    trajectory (modeled saving < min_saving). Shorts that exceed their
    budget at serve time SPILL to the long bucket (bit-exact), so only
    the long budget is correctness-critical — the session's n_long escape
    rebuilds on overflow like the ray budget. Cost: one jitted pass per
    pose_batch poses at model load (~1 s for a 500-frame trajectory)."""
    import numpy as np

    from ..utils.rays import get_rays
    from .ray import near_far_from_aabb

    aabb = jnp.asarray(settings.aabb, jnp.float32)
    dt, bound = settings.dt, settings.bound
    poses = np.asarray(poses, np.float32).reshape(-1, 4, 4)
    P = len(poses)
    pose_batch = max(1, min(pose_batch, P))

    @jax.jit
    def batch_spans(pb):                                    # [b, 4, 4]
        rays = get_rays(pb, intrinsics, H, W, N=-1)
        b = pb.shape[0]
        db = rays["rays_d"].reshape(
            b, H // 2, 2, W // 2, 2, 3).transpose(
            0, 1, 3, 2, 4, 5).reshape(b, H * W // 4, 4, 3)
        d = db.mean(axis=2)
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        o = jnp.broadcast_to(rays["rays_o"][:, :1], d.shape)
        d2 = d.reshape(-1, 3)
        o2 = o.reshape(-1, 3)
        nears, fars = near_far_from_aabb(o2, d2, aabb, settings.min_near)
        win = ray_windows(o2, d2, nears, fars, z_lo, z_hi, bound, dt,
                          pad_steps=3.0)
        hit, gf, gl = prepass_block_spans(
            o2, d2, win.t_start, win.t_end, col_dilwords, bound, dt, K2)
        adm = (hit & win.active).reshape(b, -1)
        span = (2 * (gl - gf + 1) + 2).reshape(b, -1)
        return adm, span

    adms, spans = [], []
    for s in range(0, P, pose_batch):
        pb = poses[s:s + pose_batch]
        npad = pose_batch - len(pb)
        if npad:
            pb = np.concatenate([pb, np.repeat(pb[-1:], npad, axis=0)])
        a, sp = batch_spans(jnp.asarray(pb))
        a, sp = np.asarray(a), np.asarray(sp)
        if npad:
            a, sp = a[:-npad], sp[:-npad]
        adms.append(a)
        spans.append(sp)
    adm = np.concatenate(adms)                              # [P, NB]
    span = np.concatenate(spans)
    flat = span[adm]
    if not len(flat):
        return 0, 0, 0, 0
    # the march's hard floor is max_samples <= num_cand, i.e. K2s >= S
    smax = int(settings.max_steps)
    smax += smax % 2
    if k2s_override:
        k2s = k2s_override
    else:
        # K2s = the MEDIAN tightened span (clamped to [max_steps, K2)):
        # a measured rule, not a modeled one — the 512² trained-state
        # sweep (PERF.md Round 5) read 25.68 / 26.27 / 25.08 FPS at
        # K2s = 16 / 40 / 56 with median span 42, while the linear
        # cost model sum(span <= c ? c : K2) picked 16; per-block cost
        # is visibly non-linear in K2 (two-program overheads, sort
        # shape, fusion), so the split that halves the population at
        # its natural break wins
        k2s = int(np.median(flat))
        k2s += k2s % 2
        k2s = max(smax, min(k2s, K2 - 2))
        if k2s >= K2:   # S floor meets K2: a split buys nothing
            return 0, 0, 0, int(adm.sum(axis=1).max()) * 4
        # skip the second march program when the split buys too little
        # (degenerate trajectories, e.g. nearly all spans == K2)
        cost = int(np.where(flat <= k2s, k2s, K2).sum())
        if cost > (1.0 - min_saving) * len(flat) * K2:
            log(f"[INFO] bucket march: modeled saving "
                f"{1 - cost / (len(flat) * K2):.1%} < {min_saving:.0%} "
                f"(median span {int(np.median(flat))}, K2 {K2}) — "
                "single-bucket march")
            return 0, 0, 0, int(adm.sum(axis=1).max()) * 4
    short = adm & (span <= k2s)
    n_short = int(short.sum(axis=1).max()) * 4
    n_long = int((adm & ~short).sum(axis=1).max()) * 4
    n_adm = int(adm.sum(axis=1).max()) * 4
    log(f"[INFO] bucket march plan: K2s={k2s} (short demand {n_short}, "
        f"long {n_long}, admitted {n_adm} rays over {P} poses)")
    return k2s, n_short, n_long, n_adm


def resolve_march_plan(settings, z_lo, z_hi, poses, intrinsics,
                       H: int, W: int, k2_override: int = 0,
                       march_group: int = 1, march_variant: str = "wslice",
                       measure: Optional[str] = None,
                       log=print):
    """Derive the serving march plan for one model + camera geometry:
    the adaptive window-candidate count K2 (window_candidates_for_scene,
    unless k2_override is nonzero), and the block-march group/variant
    after stepping down whenever this geometry exceeds the variant's
    exactness drift envelope (3 -> 2 -> per-ray via nb_block3_drift_cells
    <= 1 / nb_block_drift_cells <= 2; variant "quad"/"quadw"/"quadwx" ->
    "nb5w" via nb_blockq_drift_cells (forward <= 2, backward <= 1)).
    Shared by
    serving/session.py and cli.run_test so both paths choose the same
    marcher; pass march_group=1 to skip the envelope checks (non-block
    callers). measure="block"/"ray": tighten K2 to the trajectory-measured
    candidate count (measured_window_candidates — exact for the poses
    given; the geometric bound stays the cap). Returns
    (k2, march_group, march_variant)."""
    import numpy as np

    from ..utils.rays import min_corner_dz

    dz = min_corner_dz(poses, intrinsics, H, W)
    k2 = k2_override
    if not k2:
        k2 = window_candidates_for_scene(
            np.asarray(z_lo), np.asarray(z_hi), settings.dt, min_dz=dz)
        if measure in ("block", "ray"):
            k2m = measured_window_candidates(
                settings, z_lo, z_hi, poses, intrinsics, H, W,
                block=measure == "block")
            if k2m < k2:
                log(f"[INFO] trajectory-measured window candidates: "
                    f"K2={k2m} (geometric bound {k2})")
                k2 = k2m
            else:
                log(f"[INFO] adaptive window candidates: K2={k2} "
                    f"(measured {k2m} >= geometric bound)")
        else:
            log(f"[INFO] adaptive window candidates: K2={k2} "
                f"(grid {settings.grid_size}, dt {settings.dt:.4f})")
    if march_group in (2, 3):
        t_max = float(np.linalg.norm(
            np.asarray(poses)[:, :3, 3], axis=1).max()) \
            + math.sqrt(3.0) * settings.bound
        geo = (settings.dt, settings.bound, settings.grid_size,
               min(intrinsics[0], intrinsics[1]), t_max, dz)
        if march_group == 3:
            drift3 = nb_block3_drift_cells(*geo)
            if drift3 > 1.0:
                log(f"[INFO] block-lattice march drift {drift3:.2f} cells "
                    "exceeds the ±1 envelope for this camera/grid — using "
                    "the ±2 block-shared march")
                march_group = 2
        if march_group == 2 and march_variant in ("quad", "quadw", "quadwx"):
            fwd, back = nb_blockq_drift_cells(*geo)
            if fwd > 2.0 or back > 1.0:
                log(f"[INFO] quadrant march drift ({fwd:.2f} fwd, "
                    f"{back:.2f} back) exceeds the signed window for this "
                    "camera/grid — using the symmetric ±2 block-shared "
                    "march")
                march_variant = "nb5w"
        if march_group == 2:
            drift = nb_block_drift_cells(*geo)
            if drift > 2.0:
                log(f"[INFO] block-shared march drift {drift:.2f} cells "
                    "exceeds the ±2 envelope for this camera/grid — using "
                    "the per-ray exact neighborhood march")
                march_group = 1
    return k2, march_group, march_variant


def window_candidates_for_scene(z_lo, z_hi, dt: float, min_dz: float = 0.8,
                                pad_steps: float = 3.0,
                                margin: int = 6) -> int:
    """Adaptive K2 from the ACTUAL occupancy (host-side, once per model
    load): enough lattice candidates to cover the longest column z-slab at
    the shallowest camera obliquity, plus the window pads and a drift
    margin.

    K2 must scale with the grid: a fixed candidate count covers K2*dt
    world units, and dt halves at grid 128 vs 64 — the round-2 fixed
    K2=40 silently truncated grid-128 windows longer than 1.08 world
    units, cutting the back side of semi-transparent heads (measured
    -11 dB on the trained synthetic oracle; scripts/quality_check.py
    --grid 128). The reference's alive-ray marcher never truncates
    (renderer.py:503-548) — parity demands the window be fully covered.

    Sizing bound: ray_windows' multi-probe envelope is the t-union of the
    FULL slab crossings of every probed nonempty column — for a grazing
    ray those intervals need not overlap, so the window can exceed any
    single column's slab. Every probed slab lies inside the global
    occupied z-band [min z_lo, max z_hi], so the envelope is bounded by
    the ray's crossing of that band: (zmax − zmin)/|dz|. Sizing from the
    longest single-column slab (the round-3 first cut) under-covered
    exactly the tilted-head geometry whose far-side slab is disjoint in t
    from the near-side one — the same silent truncation the fixed K2=40
    produced, just at a rarer obliquity.

    min_dz: smallest |world-z| ray-direction component the cameras
    produce (utils.rays.min_corner_dz computes it from the poses);
    windows stretch by 1/|dz|. Rays below the min_axis_frac fallback
    (0.3) use [near, far] windows and may still truncate — such rays do
    not exist for portrait cameras."""
    import numpy as np

    zl = np.asarray(z_lo)
    zh = np.asarray(z_hi)
    valid = zh > zl
    band = (float(zh[valid].max() - zl[valid].min())
            if valid.any() else 0.0)
    k2 = (int(np.ceil(band / (dt * max(min_dz, 0.3))))
          + int(2 * pad_steps) + margin)
    k2 = max(k2, 16)
    return k2 + (k2 % 2)
