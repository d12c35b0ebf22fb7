"""NeRF positional (sin/cos) frequency encoding.

TPU-native replacement for the reference's freqencoder CUDA extension
(freqencoder/src/freqencoder.cu:30-58, wrapper freqencoder/freq.py).
A pure-JAX broadcast fuses straight into the consuming MLP's matmul; no
kernel is needed on TPU.

Output layout matches the reference exactly: ``[x, sin(2^0 x), cos(2^0 x),
sin(2^1 x), cos(2^1 x), ...]`` where for each frequency the D input dims are
contiguous, i.e. output[..., :D] = x and column block ``D*(2f+1+s) : D*(2f+2+s)``
holds sin/cos of ``2^f * x`` (cos realised as a pi/2 phase shift like the
reference kernel).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def freq_output_dim(input_dim: int, degree: int) -> int:
    # reference freqencoder/freq.py:55-61
    return input_dim + input_dim * 2 * degree


def freq_encode(x: jnp.ndarray, degree: int) -> jnp.ndarray:
    """x: [..., D] -> [..., D + D*2*degree]."""
    if degree <= 0:
        return x
    # scaled[..., f, d] = 2^f * x[..., d]
    freqs = jnp.asarray(2.0 ** np.arange(degree), dtype=x.dtype)
    scaled = x[..., None, :] * freqs[:, None]  # [..., deg, D]
    sin = jnp.sin(scaled)
    cos = jnp.cos(scaled)
    # interleave (sin_f, cos_f) per frequency, D-contiguous inside each block
    sc = jnp.stack([sin, cos], axis=-2)  # [..., deg, 2, D]
    sc = sc.reshape(*x.shape[:-1], degree * 2 * x.shape[-1])
    return jnp.concatenate([x, sc], axis=-1)
