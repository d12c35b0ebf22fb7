"""Preprocessing task tests on synthetic parsing data."""

import json
import os

import numpy as np
import pytest

from lzzx_nerf_tpu.preprocess import (extract_background, extract_torso_and_gt,
                                      save_transforms)

H = W = 48


@pytest.fixture()
def scene(tmp_path):
    import cv2

    base = tmp_path
    (base / "ori_imgs").mkdir()
    (base / "parsing").mkdir()
    (base / "gt_imgs").mkdir()
    (base / "torso_imgs").mkdir()

    # parsing color code is read with cv2 (BGR): head ch0=255, neck ch1=255,
    # torso ch2=255, bg all-255
    for i in range(3):
        img = np.full((H, W, 3), 0, np.uint8)
        img[:, :, :] = [10 + i, 150, 90]      # scene colors (BGR)
        img[:18, 14:34] = [200, 180, 170]     # head area pixels
        cv2.imwrite(str(base / "ori_imgs" / f"{i}.jpg"), img)

        seg = np.full((H, W, 3), 255, np.uint8)           # bg white
        seg[4:18, 14:34] = [255, 0, 0]                    # head
        seg[18:22, 20:28] = [0, 255, 0]                   # neck
        seg[22:H, 10:38] = [0, 0, 255]                    # torso
        cv2.imwrite(str(base / "parsing" / f"{i}.png"), seg)
    return str(base)


def test_extract_background_and_torso(scene):
    import cv2

    out = extract_background(scene, os.path.join(scene, "ori_imgs"), every=1)
    assert os.path.exists(out)
    bc = cv2.imread(out)
    assert bc.shape == (H, W, 3)
    # far-from-foreground corner keeps the scene color
    assert abs(int(bc[2, 2, 1]) - 150) < 30

    extract_torso_and_gt(scene, os.path.join(scene, "ori_imgs"))
    gt = cv2.imread(os.path.join(scene, "gt_imgs", "0.jpg"))
    torso = cv2.imread(os.path.join(scene, "torso_imgs", "0.png"),
                       cv2.IMREAD_UNCHANGED)
    assert gt.shape == (H, W, 3)
    assert torso.shape == (H, W, 4)
    # torso plate: alpha on in torso region, off in pure background corner
    assert torso[30, 20, 3] == 255
    assert torso[2, 2, 3] == 0
    # head pixels in a column with no neck below stay out of the torso alpha
    # (columns WITH neck are painted upward into the head — by design,
    # process.py:229-262 inpaints L=53 px up from the neck top)
    assert torso[10, 15, 3] == 0


def test_save_transforms_roundtrip(scene):
    n = 11
    rng = np.random.default_rng(0)
    params = {
        "focal": np.asarray([900.0]),
        "euler": rng.uniform(-0.2, 0.2, (n, 3)).astype(np.float32),
        "trans": rng.uniform(-1, 1, (n, 3)).astype(np.float32) + [0, 0, 5],
    }
    save_transforms(scene, os.path.join(scene, "ori_imgs"),
                    track_params=params)
    with open(os.path.join(scene, "transforms_train.json")) as f:
        train = json.load(f)
    with open(os.path.join(scene, "transforms_val.json")) as f:
        val = json.load(f)
    assert len(train["frames"]) == 10 and len(val["frames"]) == 1  # 10/11
    assert train["focal_len"] == 900.0
    m = np.asarray(train["frames"][0]["transform_matrix"])
    # c2w: rotation orthonormal, last row [0,0,0,1]
    np.testing.assert_allclose(m[:3, :3] @ m[:3, :3].T, np.eye(3), atol=1e-5)
    np.testing.assert_allclose(m[3], [0, 0, 0, 1])
    # pose inverts the tracker transform: R_inv @ t == -pose_trans * 10?? just
    # check translation magnitude is ~|trans|/10
    assert 0.2 < np.linalg.norm(m[:3, 3]) < 1.0
