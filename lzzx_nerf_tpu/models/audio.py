"""Audio conditioning networks (reference nerf_triplane/network.py:9-70).

AudioNet: per-frame audio feature window [T=16, C_in] -> [dim_aud] embedding
via a strided conv pyramid (16 -> 8 -> 4 -> 2 -> 1) + 2-layer head.
AudioAttNet: temporal attention over 8 consecutive frame embeddings.

Layout note: we use channels-last [B, T, C] (flax convention); the reference
uses [B, C, T] (torch). The convolution math is identical.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from .mlp import torch_linear_init

_LEAKY = 0.02


class AudioNet(nn.Module):
    dim_aud: int = 64
    win_size: int = 16
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: [B, T, C_in] with T >= win_size (centre window is used,
        reference network.py:63-64) -> [B, dim_aud]."""
        half = self.win_size // 2
        x = x[:, 8 - half: 8 + half, :].astype(self.dtype)
        for feats in (32, 32, 64, 64):
            x = nn.Conv(
                feats, kernel_size=(3,), strides=(2,), padding=[(1, 1)],
                kernel_init=torch_linear_init, dtype=self.dtype,
                param_dtype=jnp.float32,
            )(x)
            x = nn.leaky_relu(x, _LEAKY)
        x = x.reshape(x.shape[0], -1)  # [B, 64] (T collapsed to 1)
        x = nn.Dense(64, kernel_init=torch_linear_init, dtype=self.dtype,
                     param_dtype=jnp.float32)(x)
        x = nn.leaky_relu(x, _LEAKY)
        x = nn.Dense(self.dim_aud, kernel_init=torch_linear_init,
                     dtype=self.dtype, param_dtype=jnp.float32)(x)
        return x


class AudioAttNet(nn.Module):
    dim_aud: int = 64
    seq_len: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: [B, seq_len, dim_aud] -> [B, dim_aud] attention-pooled."""
        y = x.astype(self.dtype)
        for feats in (16, 8, 4, 2, 1):
            y = nn.Conv(
                feats, kernel_size=(3,), strides=(1,), padding=[(1, 1)],
                kernel_init=torch_linear_init, dtype=self.dtype,
                param_dtype=jnp.float32,
            )(y)
            y = nn.leaky_relu(y, _LEAKY)
        y = y.reshape(y.shape[0], self.seq_len)              # [B, seq]
        y = nn.Dense(self.seq_len, kernel_init=torch_linear_init,
                     dtype=self.dtype, param_dtype=jnp.float32)(y)
        y = nn.softmax(y, axis=1)[..., None]                 # [B, seq, 1]
        return jnp.sum(y * x, axis=1)                        # [B, dim_aud]
