"""Pose math: NGP axis convention, Euler <-> rotation matrices, trajectory
smoothing (reference nerf_triplane/utils.py:64-215, provider.py:19-45).
NumPy where it runs at dataset-build time, JAX where it runs inside steps.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def nerf_matrix_to_ngp(pose: np.ndarray, scale: float = 4.0,
                       offset=(0, 0, 0)) -> np.ndarray:
    """Axis swap + scale from the dataset's convention to the renderer's
    (reference provider.py:19-26): new_pose rows are built from the original
    with y/z swapped and translation scaled by 1/scale + offset."""
    new_pose = np.array([
        [pose[1, 0], -pose[1, 1], -pose[1, 2], pose[1, 3] * scale + offset[0]],
        [pose[2, 0], -pose[2, 1], -pose[2, 2], pose[2, 3] * scale + offset[1]],
        [pose[0, 0], -pose[0, 1], -pose[0, 2], pose[0, 3] * scale + offset[2]],
        [0, 0, 0, 1],
    ], dtype=np.float32)
    return new_pose


def _axis_angle_rotation(axis: str, angle: jnp.ndarray) -> jnp.ndarray:
    cos, sin = jnp.cos(angle), jnp.sin(angle)
    one, zero = jnp.ones_like(angle), jnp.zeros_like(angle)
    if axis == "X":
        flat = (one, zero, zero, zero, cos, -sin, zero, sin, cos)
    elif axis == "Y":
        flat = (cos, zero, sin, zero, one, zero, -sin, zero, cos)
    elif axis == "Z":
        flat = (cos, -sin, zero, sin, cos, zero, zero, zero, one)
    else:
        raise ValueError(axis)
    return jnp.stack(flat, axis=-1).reshape(angle.shape + (3, 3))


def euler_angles_to_matrix(euler: jnp.ndarray, convention: str = "XYZ") -> jnp.ndarray:
    """[..., 3] radians -> [..., 3, 3] (reference utils.py:177-205)."""
    mats = [_axis_angle_rotation(c, euler[..., i]) for i, c in enumerate(convention)]
    return mats[0] @ mats[1] @ mats[2]


def _index_from_letter(letter: str) -> int:
    return {"X": 0, "Y": 1, "Z": 2}[letter]


def _angle_from_tan(axis, other_axis, data, horizontal, tait_bryan):
    i1, i2 = {"X": (2, 1), "Y": (0, 2), "Z": (1, 0)}[axis]
    if horizontal:
        i2, i1 = i1, i2
    even = (axis + other_axis) in ["XY", "YZ", "ZX"]
    if horizontal == even:
        return jnp.arctan2(data[..., i1], data[..., i2])
    if tait_bryan:
        return jnp.arctan2(-data[..., i2], data[..., i1])
    return jnp.arctan2(data[..., i2], -data[..., i1])


def matrix_to_euler_angles(matrix: jnp.ndarray, convention: str = "XYZ") -> jnp.ndarray:
    """[..., 3, 3] -> [..., 3] radians (reference utils.py:108-147)."""
    i0 = _index_from_letter(convention[0])
    i2 = _index_from_letter(convention[2])
    tait_bryan = i0 != i2
    if tait_bryan:
        central = jnp.arcsin(matrix[..., i0, i2]
                             * (-1.0 if i0 - i2 in [-1, 2] else 1.0))
    else:
        central = jnp.arccos(matrix[..., i0, i0])
    return jnp.stack([
        _angle_from_tan(convention[0], convention[1], matrix[..., i2], False, tait_bryan),
        central,
        _angle_from_tan(convention[2], convention[1], matrix[..., i0, :], True, tait_bryan),
    ], axis=-1)


def convert_poses(poses: jnp.ndarray) -> jnp.ndarray:
    """[B, 4, 4] -> [B, 6] (euler xyz, translation) (reference utils.py:208-215)."""
    return jnp.concatenate(
        [matrix_to_euler_angles(poses[:, :3, :3]), poses[:, :3, 3]], axis=-1
    )


def smooth_camera_path(poses: np.ndarray, kernel_size: int = 5) -> np.ndarray:
    """Sliding-window average of a [B, 4, 4] pose trajectory: mean translation
    + SVD-projected mean rotation (reference provider.py:29-45, which uses
    scipy Rotation.mean; SVD of the averaged matrix is the same chordal L2
    mean)."""
    B = poses.shape[0]
    out = poses.copy()
    for i in range(B):
        lo, hi = max(0, i - kernel_size // 2), min(B, i + kernel_size // 2 + 1)
        out[i, :3, 3] = poses[lo:hi, :3, 3].mean(0)
        R = poses[lo:hi, :3, :3].mean(0)
        U, _, Vt = np.linalg.svd(R)
        S = np.eye(3)
        S[2, 2] = np.sign(np.linalg.det(U @ Vt))
        out[i, :3, :3] = U @ S @ Vt
    return out
