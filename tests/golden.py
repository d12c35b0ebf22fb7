"""Independent NumPy golden implementations of the reference CUDA kernel math.

These are written as literal sequential transcriptions of the formulas
documented in SURVEY.md §2.1 (per-point loops, exact corner/hash arithmetic)
so that the vectorised JAX ops in lzzx_nerf_tpu.ops can be verified against
them. They are intentionally slow and scalar.
"""

from __future__ import annotations

import math

import numpy as np

PRIMES = np.array(
    [1, 2654435761, 805459861, 3674653429, 2097192037, 1434869437, 2165219737],
    dtype=np.uint64,
)
U32 = np.uint64(0xFFFFFFFF)


def golden_grid_offsets(input_dim, num_levels, per_level_scale, base_resolution,
                        log2_hashmap_size, align_corners=False):
    max_params = 2 ** log2_hashmap_size
    offsets = [0]
    for lvl in range(num_levels):
        scale = 2.0 ** (lvl * math.log2(per_level_scale)) * base_resolution - 1.0
        res = int(math.ceil(scale)) + 1
        side = res if align_corners else res + 1
        n = min(max_params, side ** input_dim)
        n = int(math.ceil(n / 8) * 8)
        offsets.append(offsets[-1] + n)
    return offsets


def _grid_index(gridtype, align_corners, hashmap_size, resolution, pos_grid):
    D = len(pos_grid)
    stride = 1
    index = np.uint64(0)
    side = resolution if align_corners else resolution + 1
    d = 0
    while d < D and stride <= hashmap_size:
        index = (index + np.uint64(pos_grid[d]) * np.uint64(stride)) & U32
        stride *= side
        d += 1
    if gridtype == "hash" and stride > hashmap_size:
        index = np.uint64(0)
        for i in range(D):
            index ^= (np.uint64(pos_grid[i]) * PRIMES[i]) & U32
        index &= U32
    return int(index % np.uint64(hashmap_size))


def golden_grid_encode(x01, table, offsets, per_level_scale, base_resolution,
                       gridtype="hash", align_corners=False):
    """x01: [B, D] in [0,1]; table: [total, C]. Returns [B, L*C]."""
    B, D = x01.shape
    L = len(offsets) - 1
    C = table.shape[1]
    out = np.zeros((B, L * C), dtype=np.float64)
    S = math.log2(per_level_scale)
    for b in range(B):
        if np.any(x01[b] < 0) or np.any(x01[b] > 1):
            continue  # OOB -> zeros
        for lvl in range(L):
            hashmap_size = offsets[lvl + 1] - offsets[lvl]
            scale = 2.0 ** (lvl * S) * base_resolution - 1.0
            resolution = int(math.ceil(scale)) + 1
            # position math in float32, like the CUDA kernel (gridencoder.cu:134)
            pos = (x01[b].astype(np.float32) * np.float32(scale)
                   + np.float32(0.0 if align_corners else 0.5))
            pos_grid = np.floor(pos).astype(np.int64)
            frac = (pos - pos_grid.astype(np.float32)).astype(np.float64)
            acc = np.zeros(C)
            for corner in range(1 << D):
                w = 1.0
                pg = []
                for d in range(D):
                    if corner & (1 << d):
                        w *= frac[d]
                        pg.append(pos_grid[d] + 1)
                    else:
                        w *= 1.0 - frac[d]
                        pg.append(pos_grid[d])
                idx = _grid_index(gridtype, align_corners, hashmap_size, resolution, pg)
                acc += w * table[offsets[lvl] + idx]
            out[b, lvl * C:(lvl + 1) * C] = acc
    return out


def golden_sh4(d):
    """[B,3] -> [B,16] degree-4 real SH (shencoder.cu:44-70 formulas)."""
    x, y, z = d[:, 0], d[:, 1], d[:, 2]
    xy, yz, xz = x * y, y * z, x * z
    x2, y2, z2 = x * x, y * y, z * z
    out = np.stack([
        np.full_like(x, 0.28209479177387814),
        -0.48860251190291987 * y,
        0.48860251190291987 * z,
        -0.48860251190291987 * x,
        1.0925484305920792 * xy,
        -1.0925484305920792 * yz,
        0.94617469575755997 * z2 - 0.31539156525251999,
        -1.0925484305920792 * xz,
        0.54627421529603959 * x2 - 0.54627421529603959 * y2,
        0.59004358992664352 * y * (-3.0 * x2 + y2),
        2.8906114426405538 * xy * z,
        0.45704579946446572 * y * (1.0 - 5.0 * z2),
        0.3731763325901154 * z * (5.0 * z2 - 3.0),
        0.45704579946446572 * x * (1.0 - 5.0 * z2),
        1.4453057213202769 * z * (x2 - y2),
        0.59004358992664352 * x * (-x2 + 3.0 * y2),
    ], axis=-1)
    return out


def golden_freq(x, degree):
    """freqencoder.cu:30-58: out[c<D]=x[c]; else sin(2^freq * x_d + phase)."""
    B, D = x.shape
    C = D + D * 2 * degree
    out = np.zeros((B, C))
    out[:, :D] = x
    for c in range(D, C):
        col = c // D - 1
        d = c % D
        freq = col // 2
        phase = (col % 2) * (math.pi / 2)
        out[:, c] = np.sin(x[:, d] * (2.0 ** freq) + phase)
    return out


def golden_morton3d(x, y, z):
    def expand(v):
        v = np.uint64(v)
        v = (v * np.uint64(0x00010001)) & np.uint64(0xFF0000FF)
        v = (v * np.uint64(0x00000101)) & np.uint64(0x0F00F00F)
        v = (v * np.uint64(0x00000011)) & np.uint64(0xC30C30C3)
        v = (v * np.uint64(0x00000005)) & np.uint64(0x49249249)
        return v
    return int(expand(x) | (expand(y) << np.uint64(1)) | (expand(z) << np.uint64(2)))


def golden_composite_ray(sigmas, rgbs, amb_aud, amb_eye, unc, deltas, ts, T_thresh):
    """Sequential transcription of kernel_composite_rays_train_triplane_forward
    (raymarching.cu:1878-1975) for ONE ray's packed samples."""
    T = 1.0
    r = g = b = ws = d = a_aud = a_eye = u = 0.0
    for i in range(len(sigmas)):
        alpha = 1.0 - math.exp(-sigmas[i] * deltas[i])
        weight = alpha * T
        r += weight * rgbs[i, 0]
        g += weight * rgbs[i, 1]
        b += weight * rgbs[i, 2]
        d += weight * ts[i]
        ws += weight
        a_aud += amb_aud[i]
        a_eye += amb_eye[i]
        u += weight * unc[i]
        T *= 1.0 - alpha
        if T < T_thresh:
            break
    return dict(image=np.array([r, g, b]), depth=d, weights_sum=ws,
                amb_aud_sum=a_aud, amb_eye_sum=a_eye, uncertainty_sum=u)


def golden_near_far(o, dvec, aabb, min_near):
    """Slab test transcription (raymarching.cu:92-145) for one ray."""
    FLT_MAX = 3.4e38
    rd = 1.0 / dvec
    near = (aabb[0] - o[0]) * rd[0]
    far = (aabb[3] - o[0]) * rd[0]
    if near > far:
        near, far = far, near
    near_y = (aabb[1] - o[1]) * rd[1]
    far_y = (aabb[4] - o[1]) * rd[1]
    if near_y > far_y:
        near_y, far_y = far_y, near_y
    if near > far_y or near_y > far:
        return FLT_MAX, FLT_MAX
    near = max(near, near_y)
    far = min(far, far_y)
    near_z = (aabb[2] - o[2]) * rd[2]
    far_z = (aabb[5] - o[2]) * rd[2]
    if near_z > far_z:
        near_z, far_z = far_z, near_z
    if near > far_z or near_z > far:
        return FLT_MAX, FLT_MAX
    near = max(near, near_z)
    far = min(far, far_z)
    near = max(near, min_near)
    return near, far


def golden_march_uniform(o, dvec, near, far, occ, bound, dt, max_samples, noise=0.0):
    """Sequential constant-dt march of ONE ray through a [CAS,H,H,H] occupancy
    grid, transcribing kernel_march_rays_train (raymarching.cu:353-518) in the
    dt_min==dt_max regime (skip loop visits the same t-lattice)."""
    cascade, H = occ.shape[0], occ.shape[1]
    t = near + dt * noise
    samples = []
    while t < far and len(samples) < max_samples:
        p = np.clip(o + t * dvec, -bound, bound)
        if cascade > 1:
            mx = np.max(np.abs(p))
            level = min(cascade - 1, max(0, math.frexp(mx)[1]))
            mip_dt = min(cascade - 1, max(0, math.frexp(dt * H * 0.5)[1]))
            level = max(level, mip_dt)
        else:
            level = 0
        mip_bound = min(2.0 ** level, bound)
        n = np.clip(0.5 * (p / mip_bound + 1) * H, 0, H - 1).astype(np.int64)
        if occ[level, n[0], n[1], n[2]]:
            samples.append((p.copy(), dt, t + dt))
        t += dt
    return samples
