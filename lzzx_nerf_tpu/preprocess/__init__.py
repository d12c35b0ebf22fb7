"""Offline preprocessing: video -> per-frame NeRF dataset
(reference: data_utils/process.py 9-task driver)."""

from .process import (extract_audio, extract_images, extract_background,
                      extract_semantics, extract_torso_and_gt,
                      save_transforms, run_pipeline)
