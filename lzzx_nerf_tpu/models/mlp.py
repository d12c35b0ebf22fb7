"""Bias-free ReLU MLP (reference nerf_triplane/network.py:73-94).

The reference MLPs are 64-wide or narrower; on TPU their batched evaluation
over ~10^5-10^6 samples is one [M, 64]x[64, 64] matmul chain that tiles
straight onto the MXU, so no custom kernel is needed — XLA fuses the ReLUs.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn


def torch_linear_init(key, shape, dtype=jnp.float32):
    """PyTorch nn.Linear default kernel init: kaiming_uniform(a=sqrt(5)),
    which reduces to U(-1/sqrt(fan_in), 1/sqrt(fan_in)).

    Note on layout: flax Dense kernels are [fan_in, fan_out], so fan_in is
    shape[0] (torch stores the transpose)."""
    import jax

    fan_in = shape[0]
    bound = 1.0 / jnp.sqrt(jnp.asarray(fan_in, jnp.float32))
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


class MLP(nn.Module):
    dim_out: int
    dim_hidden: int
    num_layers: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = x.astype(self.dtype)
        for layer in range(self.num_layers):
            out = self.dim_out if layer == self.num_layers - 1 else self.dim_hidden
            x = nn.Dense(
                out,
                use_bias=False,
                kernel_init=torch_linear_init,
                dtype=self.dtype,
                param_dtype=jnp.float32,
                name=f"net_{layer}",
            )(x)
            if layer != self.num_layers - 1:
                x = nn.relu(x)
        return x
