"""Test configuration: run everything on a virtual 8-device CPU platform so
multi-chip sharding tests work without TPU hardware (SURVEY.md §4)."""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402  (import after env setup)

# NOTE: this environment force-registers a remote TPU backend ("axon") via
# sitecustomize and overrides the JAX_PLATFORMS env var; config.update is the
# reliable way to pin tests to the virtual 8-device CPU platform.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# persistent compile cache: CPU jit of the unrolled grid encoders dominates
# test wall-time; cache makes re-runs cheap
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_lzzx")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def make_toy_dataset(root, H=40, W=40, n=6, audio_dim=29, focal_mult=1.5):
    """Reference-layout toy dataset (gt/torso/ori imgs, transforms, au.csv,
    aud_ds.npy) shared by the provider/serving/cli tests."""
    import json

    import cv2
    import numpy as np

    root = str(root)
    for sub in ("gt_imgs", "torso_imgs", "ori_imgs"):
        os.makedirs(os.path.join(root, sub), exist_ok=True)
    rng = np.random.default_rng(0)
    frames = []
    for i in range(n):
        cv2.imwrite(os.path.join(root, "gt_imgs", f"{i}.jpg"),
                    rng.uniform(0, 255, (H, W, 3)).astype(np.uint8))
        torso = np.zeros((H, W, 4), np.uint8)
        torso[H // 2:, :, :3] = 128
        torso[H // 2:, :, 3] = 255
        cv2.imwrite(os.path.join(root, "torso_imgs", f"{i}.png"), torso)
        lms = np.stack([rng.uniform(5, W - 5, 68),
                        rng.uniform(5, H - 5, 68)], axis=-1)
        np.savetxt(os.path.join(root, "ori_imgs", f"{i}.lms"), lms)
        pose = np.eye(4)
        pose[2, 3] = 0.6
        frames.append({"img_id": i, "aud_id": i,
                       "transform_matrix": pose.tolist()})
    cv2.imwrite(os.path.join(root, "bc.jpg"),
                np.full((H, W, 3), 200, np.uint8))
    tf = {"focal_len": focal_mult * W, "cx": W / 2, "cy": H / 2, "h": H,
          "w": W, "frames": frames}
    json.dump(tf, open(os.path.join(root, "transforms_train.json"), "w"))
    json.dump({**tf, "frames": frames[:2]},
              open(os.path.join(root, "transforms_val.json"), "w"))
    with open(os.path.join(root, "au.csv"), "w") as f:
        f.write("frame, AU45_r\n")
        for i in range(n):
            f.write(f"{i}, {0.5 + 0.1 * i}\n")
    np.save(os.path.join(root, "aud_ds.npy"),
            rng.standard_normal((n, 16, audio_dim)).astype(np.float32))
    return root
