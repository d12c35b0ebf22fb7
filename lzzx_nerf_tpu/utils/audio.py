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


def get_audio_features(features: jnp.ndarray, att_mode: int, index) -> jnp.ndarray:
    """features: [F, ...]; index: int scalar (python or traced).
    Returns [1, ...] (mode 0) or [8, ...] (modes 1/2); out-of-range slots are
    zeros, matching the reference's explicit zero padding."""
    index = jnp.asarray(index, jnp.int32)
    F = features.shape[0]
    if att_mode == 0:
        return features[index][None]
    if att_mode == 1:
        offsets = jnp.arange(-8, 0, dtype=jnp.int32)  # frames [index-8, index)
    elif att_mode == 2:
        offsets = jnp.arange(-4, 4, dtype=jnp.int32)  # frames [index-4, index+4)
    else:
        raise NotImplementedError(f"wrong att_mode: {att_mode}")
    idx = index + offsets
    valid = (idx >= 0) & (idx < F)
    gathered = jnp.take(features, jnp.clip(idx, 0, F - 1), axis=0)
    shape = (8,) + (1,) * (features.ndim - 1)
    return gathered * valid.astype(features.dtype).reshape(shape)
