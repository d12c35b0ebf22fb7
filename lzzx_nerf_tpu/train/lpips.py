"""LPIPS (AlexNet backbone) in pure JAX.

Replaces the `lpips` pip package the reference uses for patch/lips training
and the LPIPS eval metric (TrainerUtil.py:106-109, utils.py:417-451).

Architecture is the standard LPIPS-alex: AlexNet conv features tapped after
each ReLU, channel-unit-normalised, squared difference, per-layer 1x1
non-negative linear heads, spatial mean, summed over layers. Inputs are
[-1, 1] RGB, shifted/scaled by the LPIPS constants.

Weights: `load_weights(path)` reads an .npz with keys conv0..conv4 (+ biases)
and lin0..lin4 exported from the official torch checkpoint. In this
zero-egress build environment no pretrained weights ship, so `random_params`
provides a fixed-seed random backbone: random deep features still give a
useful perceptual training signal (random-weight perceptual losses are an
established result), but absolute values are NOT comparable to official
LPIPS numbers — evaluation code labels them "lpips(rand)" in that case.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

# (out_ch, kernel, stride, pad) per AlexNet feature conv
_ALEX = (
    (64, 11, 4, 2),
    (192, 5, 1, 2),
    (384, 3, 1, 1),
    (256, 3, 1, 1),
    (256, 3, 1, 1),
)
_POOL_AFTER = (0, 1)  # maxpool(k3, s2) after taps 0 and 1

_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def random_params(seed: int = 0) -> Dict[str, jnp.ndarray]:
    """He-init backbone + uniform lin heads (fixed seed → stable metric)."""
    rng = np.random.default_rng(seed)
    params = {}
    in_ch = 3
    for i, (out_ch, k, _, _) in enumerate(_ALEX):
        fan_in = in_ch * k * k
        params[f"conv{i}"] = (
            rng.standard_normal((k, k, in_ch, out_ch)) * np.sqrt(2.0 / fan_in)
        ).astype(np.float32)
        params[f"bias{i}"] = np.zeros(out_ch, np.float32)
        params[f"lin{i}"] = (rng.uniform(0, 1, (out_ch,)) / out_ch).astype(np.float32)
        in_ch = out_ch
    return {k: jnp.asarray(v) for k, v in params.items()}


def load_weights(path: str) -> Dict[str, jnp.ndarray]:
    data = np.load(path)
    return {k: jnp.asarray(data[k]) for k in data.files}


DEFAULT_WEIGHTS = os.path.expanduser("~/.cache/lzzx/lpips_alex.npz")


def default_weights_path() -> Optional[str]:
    """First existing candidate: $LZZX_LPIPS_NPZ, then the cache default.
    Export with scripts/export_lpips.py on any machine with the `lpips`
    package and copy the npz here."""
    for cand in (os.environ.get("LZZX_LPIPS_NPZ"), DEFAULT_WEIGHTS):
        if cand and os.path.exists(cand):
            return cand
    return None


def get_params(path: Optional[str] = None) -> Dict[str, jnp.ndarray]:
    """Explicit path: must exist (a typo'd --lpips_weights silently scoring
    with the random backbone is a quality divergence the user only discovers
    after a full run). No path: default weights if present, else the
    fixed-seed random backbone — is_pretrained() reports which, with the
    same precedence."""
    if path:
        if not os.path.exists(path):
            raise FileNotFoundError(f"LPIPS weights not found: {path}")
        return load_weights(path)
    default = default_weights_path()
    if default:
        return load_weights(default)
    return random_params()


def is_pretrained(path: Optional[str] = None) -> bool:
    if path:
        return os.path.exists(path)
    return default_weights_path() is not None


def _features(params, x):
    """x: [B, H, W, 3] in [-1, 1] -> list of tap activations."""
    h = (x - _SHIFT) / _SCALE
    taps = []
    for i, (_, k, s, p) in enumerate(_ALEX):
        h = jax.lax.conv_general_dilated(
            h, params[f"conv{i}"], (s, s), [(p, p), (p, p)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + params[f"bias{i}"]
        h = jax.nn.relu(h)
        taps.append(h)
        if i in _POOL_AFTER:
            h = jax.lax.reduce_window(
                h, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1), "VALID")
    return taps


def lpips(params, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Perceptual distance per batch element. x, y: [B, H, W, 3] in [-1, 1].
    H, W must be >= 32 — the conv/pool stack collapses smaller inputs to
    zero spatial size (NaN); pad smaller patches, as the reference does for
    the lips rect (TrainerUtil.py:298-303)."""
    if x.shape[1] < 32 or x.shape[2] < 32:
        raise ValueError(
            f"lpips needs patches >= 32x32, got {x.shape[1]}x{x.shape[2]} "
            "(pad the crop like the reference lips rect)")
    fx = _features(params, x)
    fy = _features(params, y)
    total = 0.0
    for i, (a, b) in enumerate(zip(fx, fy)):
        # sqrt(sum+eps) rather than norm: the norm's gradient at an
        # exactly-zero feature vector (all-dead ReLU channels at a pixel)
        # is nan even when clamped forward — same hazard as the amb_aud
        # norm (models/nerf.py density)
        na = a / jnp.sqrt(jnp.sum(a ** 2, -1, keepdims=True) + 1e-12)
        nb = b / jnp.sqrt(jnp.sum(b ** 2, -1, keepdims=True) + 1e-12)
        d = (na - nb) ** 2                              # [B, h, w, C]
        w = jnp.maximum(params[f"lin{i}"], 0.0)         # non-negative heads
        total = total + jnp.mean(jnp.sum(d * w, axis=-1), axis=(1, 2))
    return total
