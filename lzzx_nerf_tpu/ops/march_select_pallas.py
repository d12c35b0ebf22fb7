"""Pallas kernel for the block-march per-candidate select + first-S scan.

The XLA nb5w select (ops/march2.py march_rays_window_bitmask_nb_block)
evaluates the per-candidate "which of the fetched row's 50 words holds my
bit" question as a one-hot broadcast-compare over [Bb, 4, G, group, 50]
followed by a masked sum, and the first-S sample selection as a
lax.top_k sort over K2 candidates — together the frame profiler's largest
non-gather block (~4.5 ms of select/layout + ~1.6 ms of sort at 512²,
PERF.md round-4 target map): every intermediate ([24576, 22, 50] u32
one-hot products, [B, K2] valid masks, sort keys) is materialized in HBM.

This kernel runs the identical math per 2x2-pixel block tile with every
intermediate in VMEM/registers:

- candidate cells from the ray geometry (VPU: fma + clip + int cast),
- the 50-way word select as an in-register compare/select loop over the
  block's fetched row (loaded once per (block, group)),
- the first-S selection as the natural sequential scan over candidates
  (cnt/selected-slot registers) instead of a sort.

Both candidates of a group are packed on the sublane axis ([8, NBT]
arrays: rows 0-3 = candidate 2g for the block's 4 rays, rows 4-7 =
candidate 2g+1) so every vector op runs at full vreg occupancy — Mosaic
pads [4, NBT] to 8 sublanes, wasting half the ALU. The first-S scan
keeps per-candidate sequence by splitting the running count
(c8 = [cnt | cnt + valid_k0]) and merging the two half-selections with a
max at the end (a (ray, slot) pair is written at most once across the
whole scan, so max over the -1 init is exact).

HBM traffic drops to: the transposed row tensor in ([G, 50, Bb] u32 —
the same bytes the XLA path reads), the per-ray attribute pack
([32, Bb] f32), and the [S*4, Bb] s32 selection indices out.

Bit-exact contract: same candidate lattice (t_start + k*dt in f32), same
clip-to-bound, same cell quantization, same nb/word/bit indexing and
{0,1} word-pair clip as the "nb5w" variant — parity-tested against the
exhaustive per-candidate marcher through the same tests/test_march2.py
block-exactness suite (variant "nb5wp").

Reference contract: raymarching.cu:828-939 (march_rays) — the per-ray
DDA this whole family replaces with a static-shape candidate test.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NBT = 1024         # blocks per kernel instance (lane dim = NBT)


def _select_kernel(scal_ref, attrs_ref, anch_ref, rows_ref, sel_ref, *,
                   H: int, bound: float, num_cand: int, max_samples: int,
                   n_groups: int):
    """One tile of NBT blocks (4 rays each).

    scal_ref  SMEM [1, 2]  f32: (dt, unused)
    attrs_ref VMEM [32, NBT] f32: rows 0-11 rd (x0..x3, y0..y3, z0..z3),
              12-23 ro likewise, 24-27 t_start, 28-31 t_end (already
              -inf where the slot is invalid)
    anch_ref  VMEM [G, 3, NBT] i32: per group rows 0/1/2 = gx/gy/w0
    rows_ref  VMEM [G, 50, NBT] u32: the fetched nb5w rows, word-major
    sel_ref   VMEM [S*4, NBT] i32 out: row s*4 + r = candidate index of
              ray r's (s+1)-th sample, -1 if none
    """
    f32 = jnp.float32
    i32 = jnp.int32
    dt = scal_ref[0, 0]

    def two(a):                              # [4, NBT] -> [8, NBT]
        return jnp.concatenate([a, a], axis=0)

    rdx = two(attrs_ref[0:4, :])
    rdy = two(attrs_ref[4:8, :])
    rdz = two(attrs_ref[8:12, :])
    rox = two(attrs_ref[12:16, :])
    roy = two(attrs_ref[16:20, :])
    roz = two(attrs_ref[20:24, :])
    ts = two(attrs_ref[24:28, :])
    te = two(attrs_ref[28:32, :])

    nbt = ts.shape[1]
    # rows 0-3 carry candidate 2g, rows 4-7 candidate 2g+1
    off = (jax.lax.broadcasted_iota(i32, (8, nbt), 0) >= 4).astype(i32)
    offf = off.astype(f32)
    cnt0 = jnp.zeros((4, nbt), i32)
    sel0 = tuple(jnp.full((8, nbt), -1, i32) for _ in range(max_samples))

    def cell(p):
        # identical quantization to march2: clip pos, then
        # clip((p/bound + 1) * 0.5 * H, 0, H-1) as int (values >= 0 so the
        # int cast truncation == floor)
        pc = jnp.clip(p, -bound, bound)
        return jnp.clip((pc / bound + 1.0) * (0.5 * H), 0.0,
                        float(H - 1)).astype(i32)

    def group_body(g, carry):
        cnt, sel = carry
        gx = anch_ref[g, 0:1, :]                    # [1, NBT] i32
        gy = anch_ref[g, 1:2, :]
        w0 = anch_ref[g, 2:3, :]
        rows_g = rows_ref[g]                        # [50, NBT] u32

        ki = 2 * g + off                            # [8, NBT] i32
        t = ts + (2.0 * g + offf) * dt              # [8, NBT]
        cx = cell(rox + t * rdx)
        cy = cell(roy + t * rdy)
        cz = cell(roz + t * rdz)
        nb = ((jnp.clip(cx - gx, -2, 2) + 2) * 5
              + (jnp.clip(cy - gy, -2, 2) + 2))
        widx = jnp.clip((cz >> 5) - w0, 0, 1)
        j2 = nb * 2 + widx                          # [8, NBT] in 0..49
        bit = (cz & 31).astype(jnp.uint32)

        wsel = jnp.zeros((8, nbt), jnp.uint32)
        for w in range(50):
            wsel = jnp.where(j2 == w, rows_g[w:w + 1, :], wsel)
        occ = (jax.lax.shift_right_logical(wsel, bit)
               & jnp.uint32(1)) > 0
        valid = occ & (t < te) & (ki < num_cand)

        v0 = valid[0:4, :].astype(i32)
        c8 = jnp.concatenate([cnt, cnt + v0], axis=0)   # count BEFORE k
        sel = tuple(
            jnp.where(valid & (c8 == s), ki, sel[s])
            for s in range(max_samples))
        cnt = cnt + v0 + valid[4:8, :].astype(i32)
        return cnt, sel

    # static unroll: g constant per iteration lets Mosaic fold the
    # per-group lattice constants and schedule across groups (measured
    # faster than lax.fori_loop at G=22)
    cnt, sel = cnt0, sel0
    for g in range(n_groups):
        cnt, sel = group_body(g, (cnt, sel))
    for s in range(max_samples):
        # a (ray, slot) pair is written at most once across the scan:
        # max over the two candidate halves recovers the single write
        sel_ref[s * 4:(s + 1) * 4, :] = jnp.maximum(sel[s][0:4, :],
                                                    sel[s][4:8, :])


def march_select_pallas(
    rows: jnp.ndarray,         # [Bb*G, 50] u32 (raw nb5w gather output)
    gx: jnp.ndarray,           # [Bb, G] i32 group anchor cells
    gy: jnp.ndarray,           # [Bb, G] i32
    w0: jnp.ndarray,           # [Bb, G] i32 anchor z-words
    rays_o: jnp.ndarray,       # [4*Bb, 3]
    rays_d: jnp.ndarray,       # [4*Bb, 3]
    t_start: jnp.ndarray,      # [4*Bb]
    t_end: jnp.ndarray,        # [4*Bb]
    slot_valid: jnp.ndarray,   # [4*Bb] bool
    bound: float,
    dt: float,
    H: int,
    num_cand: int,
    max_samples: int,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """First-S candidate indices [B, S] i32 (-1 where no sample) for the
    nb5w block march. interpret=None auto-selects interpreter mode off-TPU
    so CPU tests exercise the same kernel."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B = rays_d.shape[0]
    Bb = B // 4
    G = gx.shape[1]
    S = max_samples
    assert rows.shape == (Bb * G, 50), rows.shape

    # VMEM-aware tile: Pallas double-buffers the per-step inputs, so a
    # tile costs ~ NBT * (2*G*(50+3)*4 B rows+anchors + ~2.4 KB attrs/out/
    # carries). K2=82 (G=41) at NBT=1024 hit the 16 MB scoped-vmem wall
    # (19.97M) — halve the tile until the estimate fits.
    nbt = _NBT
    while nbt > 128 and nbt * (424 * G + 2400) > 14_000_000:
        nbt //= 2
    if Bb < nbt:
        nbt = max(128, Bb)
    Bp = (Bb + nbt - 1) // nbt * nbt

    te_eff = jnp.where(slot_valid, t_end, jnp.float32(-1e9))
    attrs = jnp.concatenate([
        rays_d.reshape(Bb, 4, 3).transpose(2, 1, 0).reshape(12, Bb),
        rays_o.reshape(Bb, 4, 3).transpose(2, 1, 0).reshape(12, Bb),
        t_start.reshape(Bb, 4).T,
        te_eff.reshape(Bb, 4).T,
    ], axis=0)                                         # [32, Bb]
    anch = jnp.stack([gx.T, gy.T, w0.T], axis=1)       # [G, 3, Bb]
    rows_t = rows.reshape(Bb, G, 50).transpose(1, 2, 0)  # [G, 50, Bb]
    if Bp != Bb:
        # padded blocks carry t_end = -inf -> all-invalid -> sel -1
        attrs = jnp.pad(attrs, ((0, 0), (0, Bp - Bb)),
                        constant_values=-1e9)
        anch = jnp.pad(anch, ((0, 0), (0, 0), (0, Bp - Bb)))
        rows_t = jnp.pad(rows_t, ((0, 0), (0, 0), (0, Bp - Bb)))

    scal = jnp.asarray([[dt, 0.0]], jnp.float32)
    kern = functools.partial(
        _select_kernel, H=H, bound=float(bound), num_cand=num_cand,
        max_samples=S, n_groups=G)
    sel = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((S * 4, Bp), jnp.int32),
        grid=(Bp // nbt,),
        in_specs=[
            pl.BlockSpec((1, 2), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((32, nbt), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, 3, nbt), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, 50, nbt), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((S * 4, nbt), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(scal, attrs, anch, rows_t)

    # [S*4, Bp] (row s*4 + r) -> [Bb, 4, S] -> [B, S]
    return sel[:, :Bb].reshape(S, 4, Bb).transpose(2, 1, 0).reshape(B, S)
