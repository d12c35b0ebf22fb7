"""Real spherical-harmonics direction encoding (degrees 1..8).

TPU-native replacement for the reference's shencoder CUDA extension
(shencoder/src/shencoder.cu:28-123, wrapper shencoder/sphere_harmonics.py).
The basis is a closed-form polynomial in (x, y, z); in pure JAX it is fully
differentiable and fuses into the color MLP, so no kernel is needed.

The app uses degree 4 (16 output dims) for view directions
(reference nerf_triplane/network.py:147); degrees 5-8 cover the CUDA
kernel's full envelope. The polynomials are the standard real SH basis
(Condon-Shortley phase, the same K_l^m forms the reference kernel
hardcodes); tests/test_ops.py verifies Monte-Carlo orthonormality over the
sphere for every degree — an independent check of each constant — plus
golden values against the kernel's published closed forms.
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
    if not 1 <= degree <= 8:
        raise NotImplementedError(f"sh_encode supports degree 1..8, got {degree}")
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
    if degree > 4:
        x4, y4, z4 = x2 * x2, y2 * y2, z2 * z2
        out += [
            2.5033429417967046 * xy * (x2 - y2),
            1.7701307697799304 * yz * (-3.0 * x2 + y2),
            0.94617469575756008 * xy * (7.0 * z2 - 1.0),
            0.66904654355728921 * yz * (3.0 - 7.0 * z2),
            -3.1735664074561294 * z2 + 3.7024941420321507 * z4
            + 0.31735664074561293,
            0.66904654355728921 * xz * (3.0 - 7.0 * z2),
            0.47308734787878004 * (x2 - y2) * (7.0 * z2 - 1.0),
            1.7701307697799304 * xz * (-x2 + 3.0 * y2),
            -3.7550144126950569 * x2 * y2 + 0.62583573544917614 * x4
            + 0.62583573544917614 * y4,
        ]
    if degree > 5:
        out += [
            0.65638205684017015 * y * (10.0 * x2 * y2 - 5.0 * x4 - y4),
            8.3026492595241645 * xy * z * (x2 - y2),
            -0.48923829943525038 * y * (3.0 * x2 - y2) * (9.0 * z2 - 1.0),
            4.7935367849733241 * xy * z * (3.0 * z2 - 1.0),
            0.45294665119569694 * y * (14.0 * z2 - 21.0 * z4 - 1.0),
            0.1169503224534236 * z * (-70.0 * z2 + 63.0 * z4 + 15.0),
            0.45294665119569694 * x * (14.0 * z2 - 21.0 * z4 - 1.0),
            2.3967683924866621 * z * (x2 - y2) * (3.0 * z2 - 1.0),
            -0.48923829943525038 * x * (x2 - 3.0 * y2) * (9.0 * z2 - 1.0),
            2.0756623148810411 * z * (-6.0 * x2 * y2 + x4 + y4),
            0.65638205684017015 * x * (10.0 * x2 * y2 - x4 - 5.0 * y4),
        ]
    if degree > 6:
        x6, y6, z6 = x4 * x2, y4 * y2, z4 * z2
        out += [
            1.3663682103838286 * xy * (-10.0 * x2 * y2 + 3.0 * x4
                                       + 3.0 * y4),
            2.3666191622317521 * yz * (10.0 * x2 * y2 - 5.0 * x4 - y4),
            2.0182596029148963 * xy * (x2 - y2) * (11.0 * z2 - 1.0),
            -0.92120525951492349 * yz * (3.0 * x2 - y2) * (11.0 * z2 - 3.0),
            0.92120525951492349 * xy * (-18.0 * z2 + 33.0 * z4 + 1.0),
            0.58262136251873131 * yz * (30.0 * z2 - 33.0 * z4 - 5.0),
            6.6747662381009842 * z2 - 20.024298714302954 * z4
            + 14.684485723822165 * z6 - 0.31784601133814211,
            0.58262136251873131 * xz * (30.0 * z2 - 33.0 * z4 - 5.0),
            0.46060262975746175 * (x2 - y2)
            * (11.0 * z2 * (3.0 * z2 - 1.0) - 7.0 * z2 + 1.0),
            -0.92120525951492349 * xz * (x2 - 3.0 * y2) * (11.0 * z2 - 3.0),
            0.50456490072872406 * (11.0 * z2 - 1.0)
            * (-6.0 * x2 * y2 + x4 + y4),
            2.3666191622317521 * xz * (10.0 * x2 * y2 - x4 - 5.0 * y4),
            10.247761577878714 * x2 * y4 - 10.247761577878714 * x4 * y2
            + 0.6831841051919143 * x6 - 0.6831841051919143 * y6,
        ]
    if degree > 7:
        out += [
            0.70716273252459627 * y * (-21.0 * x2 * y4 + 35.0 * x4 * y2
                                       - 7.0 * x6 + y6),
            5.2919213236038001 * xy * z * (-10.0 * x2 * y2 + 3.0 * x4
                                           + 3.0 * y4),
            -0.51891557872026028 * y * (13.0 * z2 - 1.0)
            * (-10.0 * x2 * y2 + 5.0 * x4 + y4),
            4.1513246297620823 * xy * z * (x2 - y2) * (13.0 * z2 - 3.0),
            -0.15645893386229404 * y * (3.0 * x2 - y2)
            * (13.0 * z2 * (11.0 * z2 - 3.0) - 27.0 * z2 + 3.0),
            0.44253269244498261 * xy * z * (-110.0 * z2 + 143.0 * z4
                                            + 15.0),
            0.090331607582517306 * y * (-135.0 * z2 + 495.0 * z4
                                        - 429.0 * z6 + 5.0),
            0.068284276912004949 * z * (315.0 * z2 - 693.0 * z4
                                        + 429.0 * z6 - 35.0),
            0.090331607582517306 * x * (-135.0 * z2 + 495.0 * z4
                                        - 429.0 * z6 + 5.0),
            0.07375544874083044 * z * (x2 - y2)
            * (143.0 * z2 * (3.0 * z2 - 1.0) - 187.0 * z2 + 45.0),
            -0.15645893386229404 * x * (x2 - 3.0 * y2)
            * (13.0 * z2 * (11.0 * z2 - 3.0) - 27.0 * z2 + 3.0),
            1.0378311574405206 * z * (13.0 * z2 - 3.0)
            * (-6.0 * x2 * y2 + x4 + y4),
            -0.51891557872026028 * x * (13.0 * z2 - 1.0)
            * (-10.0 * x2 * y2 + x4 + 5.0 * y4),
            2.6459606618019 * z * (15.0 * x2 * y4 - 15.0 * x4 * y2
                                   + x6 - y6),
            0.70716273252459627 * x * (-35.0 * x2 * y4 + 21.0 * x4 * y2
                                       - x6 + 7.0 * y6),
        ]
    return jnp.stack(out, axis=-1)
