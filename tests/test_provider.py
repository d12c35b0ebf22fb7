"""Provider test against a synthetic on-disk dataset in the reference layout
(transforms json + gt_imgs/torso_imgs/ori_imgs/bc.jpg/au.csv/aud_ds.npy)."""

import json
import os

import numpy as np
import pytest

from lzzx_nerf_tpu.config import Config
from lzzx_nerf_tpu.data.provider import NeRFDataset

H = W = 40
N_FRAMES = 6


@pytest.fixture(scope="module")
def dataset_dir(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("data")
    (root / "gt_imgs").mkdir()
    (root / "torso_imgs").mkdir()
    (root / "ori_imgs").mkdir()

    rng = np.random.default_rng(0)
    frames = []
    for i in range(N_FRAMES):
        img = (rng.uniform(0, 255, (H, W, 3))).astype(np.uint8)
        cv2.imwrite(str(root / "gt_imgs" / f"{i}.jpg"), img)
        torso = np.zeros((H, W, 4), np.uint8)
        torso[20:, :, :3] = 128
        torso[20:, :, 3] = 255
        cv2.imwrite(str(root / "torso_imgs" / f"{i}.png"), torso)
        # landmarks: 68 points inside the frame; lms[:,0]=col(y), lms[:,1]=row(x)
        lms = np.stack([rng.uniform(5, W - 5, 68), rng.uniform(5, H - 5, 68)],
                       axis=-1)
        np.savetxt(str(root / "ori_imgs" / f"{i}.lms"), lms)
        pose = np.eye(4)
        pose[2, 3] = 0.6 + 0.01 * i
        frames.append({"img_id": i, "aud_id": i,
                       "transform_matrix": pose.tolist()})

    cv2.imwrite(str(root / "bc.jpg"), np.full((H, W, 3), 200, np.uint8))

    tf = {"focal_len": 60.0, "cx": W / 2, "cy": H / 2, "h": H, "w": W,
          "frames": frames}
    with open(root / "transforms_train.json", "w") as f:
        json.dump(tf, f)
    with open(root / "transforms_val.json", "w") as f:
        json.dump({**tf, "frames": frames[:2]}, f)

    with open(root / "au.csv", "w") as f:
        f.write("frame, AU45_r\n")
        for i in range(N_FRAMES):
            f.write(f"{i}, {0.5 + 0.1 * i}\n")

    np.save(str(root / "aud_ds.npy"),
            rng.standard_normal((N_FRAMES, 16, 29)).astype(np.float32))
    return str(root)


def test_provider_train_frames(dataset_dir):
    cfg = Config(path=dataset_dir, asr_model="deepspeech", exp_eye=True,
                 preload=1, scale=4.0)
    ds = NeRFDataset(cfg, type="train")
    assert ds.num_frames == N_FRAMES
    assert ds.H == H and ds.W == W
    b = ds.frame(0)
    assert b["image"].shape == (H, W, 3)
    assert b["bg_color"].shape == (H, W, 3)
    assert b["auds"].shape == (8, 16, 29)     # att=2 window
    assert b["face_mask"].shape == (H, W) and b["face_mask"].any()
    assert 0 <= float(b["eye"][0]) <= 1.05
    # torso composite: rows >= 20 mix in the grey torso
    assert abs(float(b["bg_color"][30, 5, 0]) - 128 / 255) < 0.02
    assert abs(float(b["bg_color"][5, 5, 0]) - 200 / 255) < 0.02
    # pose went through the ngp conversion: original z-translation (0.6+)
    # lands on row 1 scaled by cfg.scale=4 (nerf_matrix_to_ngp axis swap)
    assert abs(float(b["pose"][1, 3])) > 2.0


def test_provider_eval_and_mirror(dataset_dir):
    cfg = Config(path=dataset_dir, asr_model="deepspeech", exp_eye=True)
    ds = NeRFDataset(cfg, type="val")
    assert ds.num_frames == 2
    assert not ds.training
    assert len(ds) == 2  # self-driven: audio features sized like frames

    assert ds.mirror_index(0) == 0
    assert ds.mirror_index(ds.num_frames) == ds.num_frames - 1


def test_provider_torso_mode(dataset_dir):
    cfg = Config(path=dataset_dir, asr_model="deepspeech", torso=True,
                 preload=1)
    ds = NeRFDataset(cfg, type="train")
    b = ds.frame(1)
    assert "bg_torso_color" in b
    # torso-stage bg is the plain plate
    assert abs(float(b["bg_color"][30, 5, 0]) - 200 / 255) < 0.02


def test_provider_audio_follows_aud_id(dataset_dir, tmp_path):
    """Dataset audio must be gathered per frame via aud_id (reference
    provider.py:477), not by split-local loader index: a val split whose
    frames start at global frame k must see frame k's audio at index 0."""
    import shutil

    root = tmp_path / "data"
    shutil.copytree(dataset_dir, root)
    with open(root / "transforms_train.json") as f:
        tf = json.load(f)
    # a val split of the LAST two frames (like the real 10/11 split point)
    with open(root / "transforms_val.json", "w") as f:
        json.dump({**tf, "frames": tf["frames"][-2:]}, f)

    cfg = Config(path=str(root), asr_model="deepspeech", att=0)
    ds = NeRFDataset(cfg, type="val")
    feats = np.load(str(root / "aud_ds.npy"))
    np.testing.assert_allclose(ds.frame(0)["auds"][0],
                               feats[N_FRAMES - 2], rtol=0, atol=0)
    np.testing.assert_allclose(ds.frame(1)["auds"][0],
                               feats[N_FRAMES - 1], rtol=0, atol=0)


def test_provider_downscale_intrinsics(dataset_dir):
    """downscale must scale focal_len and cx/cy exactly once."""
    cfg = Config(path=dataset_dir, asr_model="deepspeech")
    full = NeRFDataset(cfg, type="train")
    half = NeRFDataset(cfg, type="train", downscale=2)
    assert half.H == H // 2 and half.W == W // 2
    fx, fy, cx, cy = half.intrinsics
    assert fx == full.intrinsics[0] / 2 and fy == full.intrinsics[1] / 2
    assert cx == full.intrinsics[2] / 2 and cy == full.intrinsics[3] / 2


def test_provider_novel_audio(dataset_dir, tmp_path):
    novel = np.random.default_rng(1).standard_normal((17, 16, 29)).astype(
        np.float32)
    aud_path = str(tmp_path / "novel.npy")
    np.save(aud_path, novel)
    cfg = Config(path=dataset_dir, asr_model="deepspeech", aud=aud_path)
    ds = NeRFDataset(cfg, type="train")
    ds.training = False
    assert len(ds) == 17  # novel audio drives the length
    assert not ds.has_gt
    b = ds.frame(10)
    assert b["auds"].shape == (8, 16, 29)
    # frame index ping-pongs over the 6 poses
    assert int(b["index"]) == ds.mirror_index(10)
