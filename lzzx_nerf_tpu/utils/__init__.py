"""Shared utilities (reference: nerf_triplane/utils.py)."""

from .rays import get_rays, get_bg_coords
from .audio import get_audio_features
from .color import (srgb_to_linear, linear_to_srgb, rgb_to_yuv420,
                    yuv420_to_rgb)
from .pose import (
    nerf_matrix_to_ngp,
    euler_angles_to_matrix,
    matrix_to_euler_angles,
    convert_poses,
    smooth_camera_path,
)
