"""Real spherical-harmonics direction encoding (degrees 1..4).

TPU-native replacement for the reference's shencoder CUDA extension
(shencoder/src/shencoder.cu:28-120, wrapper shencoder/sphere_harmonics.py).
The basis is a closed-form polynomial in (x, y, z); in pure JAX it is fully
differentiable and fuses into the color MLP, so no kernel is needed.

The app uses degree 4 (16 output dims) for view directions
(reference nerf_triplane/network.py:147).
"""

from __future__ import annotations

import jax.numpy as jnp

# Standard real-SH normalisation constants (same values the reference kernel
# hardcodes; they are the textbook K_l^m coefficients).
C0 = 0.28209479177387814
C1 = 0.48860251190291987
C2 = (1.0925484305920792, -1.0925484305920792, 0.94617469575755997,
      -1.0925484305920792, 0.54627421529603959)
C3 = (0.59004358992664352, 2.8906114426405538, 0.45704579946446572,
      0.3731763325901154, 0.45704579946446572, 1.4453057213202769,
      0.59004358992664352)


def sh_output_dim(degree: int) -> int:
    return degree * degree


def sh_encode(d: jnp.ndarray, degree: int = 4) -> jnp.ndarray:
    """d: [..., 3] unit directions -> [..., degree**2] SH basis values."""
    if not 1 <= degree <= 4:
        raise NotImplementedError(f"sh_encode supports degree 1..4, got {degree}")
    x, y, z = d[..., 0], d[..., 1], d[..., 2]
    out = [jnp.full_like(x, C0)]
    if degree > 1:
        out += [-C1 * y, C1 * z, -C1 * x]
    if degree > 2:
        xy, yz, xz = x * y, y * z, x * z
        x2, y2, z2 = x * x, y * y, z * z
        out += [
            C2[0] * xy,
            C2[1] * yz,
            C2[2] * z2 - 0.31539156525251999,
            C2[3] * xz,
            C2[4] * (x2 - y2),
        ]
    if degree > 3:
        out += [
            C3[0] * y * (-3.0 * x2 + y2),
            C3[1] * xy * z,
            C3[2] * y * (1.0 - 5.0 * z2),
            C3[3] * z * (5.0 * z2 - 3.0),
            C3[4] * x * (1.0 - 5.0 * z2),
            C3[5] * z * (x2 - y2),
            C3[6] * x * (-x2 + 3.0 * y2),
        ]
    return jnp.stack(out, axis=-1)
