"""Alpha compositing of per-sample fields into per-ray outputs.

TPU-native replacement for the triplane compositing kernels in
raymarching/src/raymarching.cu (training fwd/bwd 1878-2133, inference
2142-2257). One formulation serves training, eval, and inference: the serial
per-ray while-loop with early exit becomes a masked exclusive cumprod along
the (static) sample axis, and the hand-written closed-form backward becomes
plain autodiff of the same expression (which yields identical gradients).

Semantics preserved from the reference kernels:
- alpha_i   = 1 - exp(-sigma_i * delta_i)
- T_i       = prod_{j<i} (1 - alpha_j), weight_i = alpha_i * T_i
- image     = sum w_i * rgb_i ;  depth = sum w_i * t_i  (t_i = post-step t)
- weights_sum, uncertainty weighted by w_i
- ambient_aud / ambient_eye are *plain* sums over processed samples
  (raymarching.cu:1942-1943 — NOT weighted)
- early termination: the loop breaks after accumulating step i when
  T_{i+1} < T_thresh; since T is monotone decreasing this is exactly
  "process step i iff T_i >= T_thresh" (T_0 = 1 always processed).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class CompositeResult(NamedTuple):
    image: jnp.ndarray            # [N, 3]
    depth: jnp.ndarray            # [N]
    weights_sum: jnp.ndarray      # [N]
    amb_aud_sum: jnp.ndarray      # [N]
    amb_eye_sum: jnp.ndarray      # [N]
    uncertainty_sum: jnp.ndarray  # [N]
    weights: jnp.ndarray          # [N, S] (useful for extra losses/debug)


def composite_rays(
    sigmas: jnp.ndarray,       # [N, S]
    rgbs: jnp.ndarray,         # [N, S, 3]
    amb_aud: jnp.ndarray,      # [N, S]
    amb_eye: jnp.ndarray,      # [N, S]
    uncertainty: jnp.ndarray,  # [N, S]
    deltas: jnp.ndarray,       # [N, S] (0 on masked slots)
    ts: jnp.ndarray,           # [N, S] post-step t for depth
    mask: jnp.ndarray,         # [N, S] bool valid-sample mask
    T_thresh: float = 1e-4,
) -> CompositeResult:
    maskf = mask.astype(sigmas.dtype)
    alpha = (1.0 - jnp.exp(-sigmas * deltas)) * maskf            # [N, S]

    # exclusive cumprod: T_i = prod_{j<i} (1 - alpha_j), via shift (avoids the
    # fragile divide-by-(1-alpha) formulation when alpha -> 1)
    one_minus = 1.0 - alpha
    T = jnp.concatenate(
        [jnp.ones_like(alpha[:, :1]), jnp.cumprod(one_minus, axis=-1)[:, :-1]],
        axis=-1,
    )

    processed = (T >= T_thresh) & mask                           # [N, S]
    procf = processed.astype(sigmas.dtype)

    weights = alpha * T * procf                                  # [N, S]

    image = jnp.einsum("ns,nsc->nc", weights, rgbs)
    depth = jnp.sum(weights * ts, axis=-1)
    weights_sum = jnp.sum(weights, axis=-1)
    uncertainty_sum = jnp.sum(weights * uncertainty, axis=-1)
    amb_aud_sum = jnp.sum(amb_aud * procf, axis=-1)
    amb_eye_sum = jnp.sum(amb_eye * procf, axis=-1)

    return CompositeResult(
        image=image,
        depth=depth,
        weights_sum=weights_sum,
        amb_aud_sum=amb_aud_sum,
        amb_eye_sum=amb_eye_sum,
        uncertainty_sum=uncertainty_sum,
        weights=weights,
    )
