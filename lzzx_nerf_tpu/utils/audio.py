"""Audio feature windowing (reference nerf_triplane/utils.py:20-52).

`get_audio_features(features, att_mode, index)` selects the attention context
for frame `index` from the per-frame feature array:
  mode 0: just the frame                      -> [1, ...]
  mode 1: 8 frames ending at index (left pad) -> [8, ...]
  mode 2: 8 frames centred at index (pad both)-> [8, ...]

This is the only sequence-window primitive in the system (SURVEY.md §5); a
static-shape gather with zero-padding via index clamping + masking, so it can
live inside a jitted step (batched over frames under vmap).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def window_offsets(att_mode: int) -> np.ndarray | None:
    """Frame offsets of the attention window relative to `index`, shared by
    the device (jnp) and host (np) windowing paths. None means mode 0 (just
    the frame itself)."""
    if att_mode == 0:
        return None
    if att_mode == 1:
        return np.arange(-8, 0, dtype=np.int32)   # frames [index-8, index)
    if att_mode == 2:
        return np.arange(-4, 4, dtype=np.int32)   # frames [index-4, index+4)
    raise NotImplementedError(f"wrong att_mode: {att_mode}")


def get_audio_features(features: jnp.ndarray, att_mode: int, index) -> jnp.ndarray:
    """features: [F, ...]; index: int scalar (python or traced).
    Returns [1, ...] (mode 0) or [8, ...] (modes 1/2); out-of-range slots are
    zeros, matching the reference's explicit zero padding."""
    index = jnp.asarray(index, jnp.int32)
    F = features.shape[0]
    offsets = window_offsets(att_mode)
    if offsets is None:
        return features[index][None]
    idx = index + jnp.asarray(offsets)
    valid = (idx >= 0) & (idx < F)
    gathered = jnp.take(features, jnp.clip(idx, 0, F - 1), axis=0)
    shape = (8,) + (1,) * (features.ndim - 1)
    return gathered * valid.astype(features.dtype).reshape(shape)


def get_audio_features_np(features: np.ndarray, att_mode: int,
                          index: int) -> np.ndarray:
    """Host-side (numpy) twin of get_audio_features for data loaders — same
    offsets, clamp-gather and zero-mask semantics, but never touches a device
    (a jnp call here would round-trip every loader frame through the TPU)."""
    F = features.shape[0]
    index = min(int(index), F - 1)
    offsets = window_offsets(att_mode)
    if offsets is None:
        return features[index][None]
    idx = index + offsets
    valid = (idx >= 0) & (idx < F)
    win = features[np.clip(idx, 0, F - 1)]
    shape = (8,) + (1,) * (features.ndim - 1)
    return win * valid.astype(features.dtype).reshape(shape)
