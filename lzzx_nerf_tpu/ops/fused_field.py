"""Fused field-MLP Pallas kernel for the serving hot path.

The field's five tiny MLPs (aud_ch_att, eye_att, sigma_net, color_net — see
models/nerf.py, reference nerf_triplane/network.py:241-311) are individually
MXU-trivial: ~46K FLOPs/sample. Evaluated as separate XLA matmuls they
materialise ~370 intermediate floats per sample in HBM (att h1 64 + att 32 +
eye 16+1 + sigma h 64+64+65 + geo 64 + color h 64 + ...), and the measured
7.7 ms/frame for the MLP phase at 512² matches that HBM roundtrip exactly
(~6 GB @ 819 GB/s) — the phase is bandwidth-bound on activations, not FLOPs.

This kernel evaluates the whole stack per 2048-sample tile with every
intermediate held in VMEM; HBM traffic drops to the kernel inputs
(enc_x 144 B + dirs 12 B per sample) and outputs (16 B). Structural moves
that make it Mosaic-friendly:

- NO in-kernel concatenations. The reference concatenates
  [enc_x | enc_a*att | eye*eye_att] into the sigma input and
  [SH(d) | geo | ind] into the color input; here each concat block gets its
  own matmul against the corresponding row-slice of the weight and the
  results are summed (identical math, K-split matmul).
- Per-frame constants fold into the weights OUTSIDE the kernel
  (fold_frame_weights): enc_a (the audio code is one vector per frame) folds
  into sigma_net rows 36:68 — enc_w @ W = att @ (enc_a[:,None] * W); the
  individual code's color contribution ind @ W is a per-frame bias; the eye
  scalar scales sigma_net row 68 into a [64] vector applied as an
  outer-product with the eye attention.
- The SH-degree-4 direction basis is computed OUTSIDE the kernel (XLA fuses
  it into one cheap pass over dirs) and consumed as a [T, 16] matmul input:
  evaluating it in-kernel materialises 16 lane-padded [T, 1]->[T, 128]
  temporaries, which blows VMEM past tile 1024 (measured: Mosaic compile
  failure at T=2048). The extra HBM read is 64 B/sample (~0.13 ms/frame).

Training keeps the plain flax path (this kernel is forward-only); parity is
tested against NeRFField.apply to fp32 tolerance (tests/test_fused_field.py).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .sh import sh_encode


class FieldWeights(NamedTuple):
    """Raw per-model weights (extract once at load). Flax Dense kernels are
    [fan_in, fan_out]; slices split the reference's concatenated inputs."""

    aud0: jnp.ndarray    # [36, 64]  aud_ch_att layer 0
    aud1: jnp.ndarray    # [64, 32]  aud_ch_att layer 1
    eye0: jnp.ndarray    # [36, 16]  eye_att layer 0
    eye1: jnp.ndarray    # [16, 1]   eye_att layer 1
    sig0x: jnp.ndarray   # [36, 64]  sigma_net layer 0, enc_x rows
    sig0a: jnp.ndarray   # [32, 64]  sigma_net layer 0, enc_w rows
    sig0e: jnp.ndarray   # [64]      sigma_net layer 0, eye-feature row
    sig1: jnp.ndarray    # [64, 64]
    sig2: jnp.ndarray    # [64, 65]  -> [sigma | geo_feat(64)]
    col0s: jnp.ndarray   # [16, 64]  color_net layer 0, SH rows
    col0g: jnp.ndarray   # [64, 64]  color_net layer 0, geo_feat rows
    col0i: jnp.ndarray   # [ind_dim, 64] color_net layer 0, ind-code rows
    col1: jnp.ndarray    # [64, 3]


class FrameWeights(NamedTuple):
    """Per-frame folded weights (fold_frame_weights) — what the kernel sees."""

    aud0: jnp.ndarray    # [36, 64]
    aud1: jnp.ndarray    # [64, 32]
    eye0: jnp.ndarray    # [36, 16]
    eye1: jnp.ndarray    # [16, 1]
    sig0x: jnp.ndarray   # [36, 64]
    sig0a_f: jnp.ndarray  # [32, 64]  enc_a folded in
    v_eye: jnp.ndarray   # [1, 64]    eye * sig0e
    sig1: jnp.ndarray    # [64, 64]
    sig2: jnp.ndarray    # [64, 65]
    col0s: jnp.ndarray   # [16, 64]
    col0g: jnp.ndarray   # [64, 64]
    bias_c: jnp.ndarray  # [1, 64]    ind_code @ col0i
    col1: jnp.ndarray    # [64, 3]


def extract_field_weights(params, in_dim: int = 36, audio_dim: int = 32
                          ) -> FieldWeights:
    """Pull the MLP kernels out of a NeRFField params tree (models/nerf.py)."""
    p = params["params"] if "params" in params else params

    def k(net, layer):
        return jnp.asarray(p[net][f"net_{layer}"]["kernel"], jnp.float32)

    s0 = k("sigma_net", 0)          # [36+32+1, 64]
    c0 = k("color_net", 0)          # [16+64+ind, 64]
    return FieldWeights(
        aud0=k("aud_ch_att_net", 0), aud1=k("aud_ch_att_net", 1),
        eye0=k("eye_att_net", 0), eye1=k("eye_att_net", 1),
        sig0x=s0[:in_dim], sig0a=s0[in_dim:in_dim + audio_dim],
        sig0e=s0[in_dim + audio_dim], sig1=k("sigma_net", 1),
        sig2=k("sigma_net", 2),
        col0s=c0[:16], col0g=c0[16:80], col0i=c0[80:],
        col1=k("color_net", 1),
    )


def fold_frame_weights(w: FieldWeights, enc_a: jnp.ndarray,
                       ind_code, eye) -> FrameWeights:
    """Fold the per-frame constants (audio code, individual code, eye
    openness) into the weights — a few tiny XLA ops per frame."""
    enc_a = enc_a.reshape(-1)
    if ind_code is not None:
        bias_c = (ind_code.reshape(1, -1).astype(jnp.float32) @ w.col0i)
    else:
        bias_c = jnp.zeros((1, w.col0g.shape[1]), jnp.float32)
    if eye is not None:
        e = jnp.asarray(eye, jnp.float32).reshape(())
    else:
        e = jnp.float32(0.0)
    return FrameWeights(
        aud0=w.aud0, aud1=w.aud1, eye0=w.eye0, eye1=w.eye1,
        sig0x=w.sig0x,
        sig0a_f=enc_a[:, None].astype(jnp.float32) * w.sig0a,
        v_eye=(e * w.sig0e)[None, :],
        sig1=w.sig1, sig2=w.sig2, col0s=w.col0s, col0g=w.col0g,
        bias_c=bias_c, col1=w.col1,
    )


# row offsets of each weight inside the packed [448, 128] kernel input
# (single input => one DMA per grid step instead of twelve; measured: the
# v1 kernel with 12 separate full-array weight inputs spent ~11 us/tile on
# fixed per-step overhead)
_W_ROWS = {
    "w_ae": (0, 36, 80),        # (row0, nrows, ncols)
    "aud1": (36, 64, 32),
    "eye1": (100, 1, 16),
    "sig0x": (101, 36, 64),
    "sig0a_f": (137, 32, 64),
    "v_eye": (169, 1, 64),
    "sig1": (170, 64, 64),
    "sig2": (234, 64, 65),
    "col0s": (298, 16, 64),
    "col0g": (314, 64, 64),
    "bias_c": (378, 1, 64),
    "col1": (379, 64, 3),
}
_W_PACK_ROWS = 448  # 443 used, padded to a sublane multiple


def pack_frame_weights(fw: FrameWeights) -> jnp.ndarray:
    """FrameWeights -> one [448, 128] fp32 array (layout _W_ROWS)."""
    w = jnp.zeros((_W_PACK_ROWS, 128), jnp.float32)
    vals = {
        "w_ae": jnp.concatenate([fw.aud0, fw.eye0], axis=1),
        "aud1": fw.aud1, "eye1": fw.eye1.reshape(1, -1),
        "sig0x": fw.sig0x, "sig0a_f": fw.sig0a_f, "v_eye": fw.v_eye,
        "sig1": fw.sig1, "sig2": fw.sig2, "col0s": fw.col0s,
        "col0g": fw.col0g, "bias_c": fw.bias_c, "col1": fw.col1,
    }
    for name, (r0, nr, nc) in _W_ROWS.items():
        w = w.at[r0:r0 + nr, :nc].set(vals[name].astype(jnp.float32))
    return w


def _field_kernel(enc_x_ref, sh_ref, w_ref, out_ref, *,
                  compute_dtype=jnp.float32):
    """MXU notes: every K dimension is zero-padded to 128, so the kernel
    merges matmuls that share an input — aud_ch_att L0 and eye_att L0 both
    consume enc_x and run as ONE [36, 64+16] matmul (w_ae) — and evaluates
    the eye MLP's 16->1 output layer as a VPU lane reduction instead of a
    N=1 matmul. compute_dtype=bf16 runs the MXU at its native rate with f32
    accumulation (preferred_element_type)."""
    f32 = jnp.float32
    cdt = compute_dtype

    def mm(a, b):
        return jnp.dot(a.astype(cdt), b.astype(cdt),
                       preferred_element_type=f32)

    def w(name):
        r0, nr, nc = _W_ROWS[name]
        return w_ref[r0:r0 + nr, :nc]

    enc_x = enc_x_ref[:]                                   # [T, 36]
    shd = sh_ref[:]                                        # [T, 16]

    # shared first layer: [att hidden(64) | eye hidden(16)]
    h_ae = jnp.maximum(mm(enc_x, w("w_ae")), 0.0)          # [T, 80]
    att_h, eye_h = h_ae[:, :64], h_ae[:, 64:80]

    # audio channel attention (linear-out MLP; network.py:289 multiplies the
    # raw output into the audio code): att [T, 32]
    att = mm(att_h, w("aud1"))

    # eye attention -> sigmoid [T, 1] (VPU row-dot, eye1 is [1, 16])
    eye_att = jax.nn.sigmoid(
        jnp.sum(eye_h * w("eye1"), axis=-1, keepdims=True))

    # sigma_net layer 0 as a K-split sum (== concat([enc_x, enc_w, e]) @ W)
    h = mm(enc_x, w("sig0x")) + mm(att, w("sig0a_f")) + eye_att * w("v_eye")
    h = jnp.maximum(h, 0.0)
    h = jnp.maximum(mm(h, w("sig1")), 0.0)
    h = mm(h, w("sig2"))                                   # [T, 65]
    sigma = jnp.exp(h[:, 0:1])
    geo = h[:, 1:]                                         # [T, 64]

    # color_net layer 0 as a K-split sum (== concat([sh, geo, ind]) @ W)
    hc = mm(geo, w("col0g")) + mm(shd, w("col0s")) + w("bias_c")
    hc = jnp.maximum(hc, 0.0)
    rgb_raw = mm(hc, w("col1"))                            # [T, 3]
    color = jax.nn.sigmoid(rgb_raw) * (1.0 + 2.0 * 0.001) - 0.001

    out_ref[:, 0:1] = sigma
    out_ref[:, 1:4] = color


def fused_field_eval(fw: FrameWeights, enc_x: jnp.ndarray, dirs: jnp.ndarray,
                     tile: int = 2048, interpret: bool | None = None,
                     compute_dtype=jnp.float32):
    """(sigma [N], color [N, 3]) from triplane features + view dirs.

    enc_x: [N, 36] fp32 (packed_triplane lookup output), dirs: [N, 3].
    N is padded up to a tile multiple internally. interpret=None auto-selects
    interpreter mode off-TPU (so CPU tests exercise the same code path).
    compute_dtype=bf16 runs the matmuls at the MXU's native rate with f32
    accumulation (quality-guarded: scripts/quality_check.py)."""
    N = enc_x.shape[0]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    # SH basis in XLA (one fused pass over dirs; see module docstring) —
    # shared with the training path (models/nerf.py uses the same encoder)
    shd = sh_encode(dirs.astype(jnp.float32), 4)
    Np = (N + tile - 1) // tile * tile
    if Np != N:
        enc_x = jnp.pad(enc_x, ((0, Np - N), (0, 0)))
        shd = jnp.pad(shd, ((0, Np - N), (0, 0)))

    wpack = pack_frame_weights(fw)
    out = pl.pallas_call(
        functools.partial(_field_kernel, compute_dtype=compute_dtype),
        out_shape=jax.ShapeDtypeStruct((Np, 4), jnp.float32),
        grid=(Np // tile,),
        in_specs=[
            pl.BlockSpec((tile, enc_x.shape[1]), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 16), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(wpack.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, 4), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(enc_x.astype(jnp.float32), shd, wpack)
    return out[:N, 0], out[:N, 1:4]


def fused_field_eval_reference(fw: FrameWeights, enc_x, dirs,
                               compute_dtype=jnp.float32):
    """Pure-jnp evaluation of the identical folded-weight decomposition —
    the semantic reference for kernel parity tests, and the substitute used
    off-TPU (make_fused_apply)."""
    cdt = compute_dtype

    def mm(a, b):
        return jnp.dot(a.astype(cdt), b.astype(cdt),
                       preferred_element_type=jnp.float32)

    h_ae = jnp.maximum(
        mm(enc_x, jnp.concatenate([fw.aud0, fw.eye0], axis=1)), 0.0)
    att = mm(h_ae[:, :64], fw.aud1)
    eye_att = jax.nn.sigmoid(
        jnp.sum(h_ae[:, 64:80] * fw.eye1.reshape(1, -1),
                axis=-1, keepdims=True))
    h = mm(enc_x, fw.sig0x) + mm(att, fw.sig0a_f) + eye_att * fw.v_eye
    h = jnp.maximum(h, 0.0)
    h = mm(jnp.maximum(mm(h, fw.sig1), 0.0), fw.sig2)
    sigma = jnp.exp(h[:, 0])
    geo = h[:, 1:]
    shd = sh_encode(dirs.astype(jnp.float32), 4)
    hc = mm(geo, fw.col0g) + mm(shd, fw.col0s) + fw.bias_c
    rgb = mm(jnp.maximum(hc, 0.0), fw.col1)
    color = jax.nn.sigmoid(rgb) * 1.002 - 0.001
    return sigma, color
