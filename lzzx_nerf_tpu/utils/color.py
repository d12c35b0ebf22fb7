"""sRGB <-> linear (reference nerf_triplane/utils.py:55-62)."""

from __future__ import annotations

import jax.numpy as jnp


def linear_to_srgb(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(x < 0.0031308, 12.92 * x, 1.055 * x ** 0.41666 - 0.055)


def srgb_to_linear(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(x < 0.04045, x / 12.92, ((x + 0.055) / 1.055) ** 2.4)


def rgb_to_yuv420(img: jnp.ndarray) -> jnp.ndarray:
    """[H, W, 3] float RGB in [0, 1] -> planar YUV 4:2:0 buffer
    [H*W*3//2] uint8 (BT.601 limited range — exactly the rawvideo yuv420p
    layout ffmpeg ingests).

    Serving pushes yuv420p instead of rgb24: the stream encoder converts to
    4:2:0 anyway, and halving the frame bytes halves the device->host
    transfer (the serving bottleneck on the tunneled chip — PERF.md)."""
    H, W = img.shape[:2]
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    y = 16.0 + 65.481 * r + 128.553 * g + 24.966 * b
    u = 128.0 - 37.797 * r - 74.203 * g + 112.0 * b
    v = 128.0 + 112.0 * r - 93.786 * g - 18.214 * b
    u2 = u.reshape(H // 2, 2, W // 2, 2).mean(axis=(1, 3))
    v2 = v.reshape(H // 2, 2, W // 2, 2).mean(axis=(1, 3))
    buf = jnp.concatenate([y.reshape(-1), u2.reshape(-1), v2.reshape(-1)])
    return jnp.clip(jnp.round(buf), 0, 255).astype(jnp.uint8)


def yuv420_to_rgb(buf, H: int, W: int):
    """Inverse of rgb_to_yuv420 (numpy, for tests/debug): [H*W*3//2] uint8
    -> [H, W, 3] float RGB in [0, 1]."""
    import numpy as np

    buf = np.asarray(buf, np.float32)
    y = buf[:H * W].reshape(H, W)
    u = buf[H * W:H * W + H * W // 4].reshape(H // 2, W // 2)
    v = buf[H * W + H * W // 4:].reshape(H // 2, W // 2)
    u = np.repeat(np.repeat(u, 2, 0), 2, 1) - 128.0
    v = np.repeat(np.repeat(v, 2, 0), 2, 1) - 128.0
    c = (y - 16.0) / 219.0
    d, e = u / 224.0, v / 224.0
    kr, kb = 0.299, 0.114
    r = c + 2 * (1 - kr) * e
    b = c + 2 * (1 - kb) * d
    g = (c - kr * r - kb * b) / (1 - kr - kb)
    return np.clip(np.stack([r, g, b], -1), 0.0, 1.0)
