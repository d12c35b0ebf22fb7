"""End-to-end verification drive (CPU): toy disk dataset -> CLI train ->
CLI test -> REST serving loop. Exercises the public surfaces the tests
don't: cli.run_train / run_test, serving.webapi routes, sinks.

Usage: python scripts/e2e_drive.py [--root /tmp/lzzx_e2e] [--iters 60]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import urllib.request

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

H = W = 64
N_FRAMES = 8


def make_dataset(root: str) -> str:
    """Reference-layout dataset with a drawn disk 'head' (learnable signal)."""
    import cv2

    data = os.path.join(root, "data", "toy")
    for sub in ("gt_imgs", "torso_imgs", "ori_imgs"):
        os.makedirs(os.path.join(data, sub), exist_ok=True)

    rng = np.random.default_rng(0)
    frames = []
    for i in range(N_FRAMES):
        img = np.full((H, W, 3), 200, np.uint8)
        cv2.circle(img, (W // 2, H // 2), 18, (90, 120, 200), -1)
        cv2.circle(img, (W // 2 - 6, H // 2 - 4), 3, (30, 30, 30), -1)
        cv2.imwrite(os.path.join(data, "gt_imgs", f"{i}.jpg"), img)
        torso = np.zeros((H, W, 4), np.uint8)
        torso[44:, :, :3] = 128
        torso[44:, :, 3] = 255
        cv2.imwrite(os.path.join(data, "torso_imgs", f"{i}.png"), torso)
        lms = np.stack([rng.uniform(5, W - 5, 68), rng.uniform(5, H - 5, 68)],
                       axis=-1)
        np.savetxt(os.path.join(data, "ori_imgs", f"{i}.lms"), lms)
        pose = np.eye(4)
        pose[2, 3] = 4.0
        frames.append({"img_id": i, "aud_id": i,
                       "transform_matrix": pose.tolist()})
    cv2.imwrite(os.path.join(data, "bc.jpg"), np.full((H, W, 3), 200, np.uint8))
    tf = {"focal_len": 120.0, "cx": W / 2, "cy": H / 2, "h": H, "w": W,
          "frames": frames}
    json.dump(tf, open(os.path.join(data, "transforms_train.json"), "w"))
    json.dump({**tf, "frames": frames[:2]},
              open(os.path.join(data, "transforms_val.json"), "w"))
    with open(os.path.join(data, "au.csv"), "w") as f:
        f.write("frame, AU45_r\n")
        for i in range(N_FRAMES):
            f.write(f"{i}, {0.5 + 0.1 * i}\n")
    np.save(os.path.join(data, "aud_ds.npy"),
            rng.standard_normal((N_FRAMES, 16, 29)).astype(np.float32))
    return data


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/lzzx_e2e")
    ap.add_argument("--iters", type=int, default=60)
    ap.add_argument("--port", type=int, default=7899)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_lzzx")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    shutil.rmtree(args.root, ignore_errors=True)
    data = make_dataset(args.root)
    ws = os.path.join(args.root, "trial_toy")
    print(f"== dataset at {data}")

    from lzzx_nerf_tpu import cli

    base = [data, "--workspace", ws, "--asr_model", "deepspeech",
            "--grid_size", "32", "--max_steps", "8", "--num_rays", "2048",
            "--data_range", "0", "-1"]
    print(f"== train {args.iters} iters")
    # warmup 20 so the run exercises BOTH train paths (full, then the
    # ray-compacted step after the grid refines)
    cli.main(base + ["--iters", str(args.iters),
                     "--train_compact_warmup", "20"])
    log = open(os.path.join(ws, "log_ngp.txt")).read()
    assert "training done" in log, log[-500:]

    print("== torso stage (train)")
    cli.main(base + ["--torso", "1", "--workspace", ws + "_torso",
                     "--iters", "20"])
    assert os.path.isdir(os.path.join(ws + "_torso", "checkpoints"))

    print("== test (offline inference, torso composited)")
    cli.main(base + ["--test", "1", "--test_train", "1", "--torso", "1",
                     "--infer_samples", "8", "--infer_window_candidates",
                     "24", "--iters", str(args.iters)])
    results = os.listdir(os.path.join(ws, "results"))
    pngs = [f for f in results if f.endswith(".png")]
    assert len(pngs) == N_FRAMES, results
    log = open(os.path.join(ws, "log_ngp.txt")).read()
    assert "PSNR" in log
    print("   ", [ln for ln in log.splitlines() if "PSNR" in ln][-1])

    print("== REST loop")
    import threading

    from lzzx_nerf_tpu.config import Config
    from lzzx_nerf_tpu.serving.webapi import serve

    raw_out = os.path.join(args.root, "frames.raw")
    cfg = Config(asr_model="deepspeech", grid_size=32, max_steps=8,
                 infer_samples=8, infer_window_candidates=24)
    httpd = serve(cfg, host="127.0.0.1", port=args.port,
                  data_root=os.path.join(args.root, "data"),
                  trial_root=args.root, sink_kind="raw", out_path=raw_out)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    url = f"http://127.0.0.1:{args.port}"

    def post(route, payload):
        req = urllib.request.Request(
            url + route, json.dumps(payload).encode(),
            {"Content-Type": "application/json"})
        with urllib.request.urlopen(req) as r:
            return json.loads(r.read())

    def get(route):
        with urllib.request.urlopen(url + route) as r:
            return json.loads(r.read())

    # hardening checks: traversal rejected with 4xx
    for bad in ("../toy", "a/b", ".."):
        try:
            post("/api/model_select", {"model": bad})
            raise AssertionError(f"traversal {bad!r} accepted")
        except urllib.error.HTTPError as e:
            assert e.code in (400, 404), (bad, e.code)
    try:
        post("/api/audio_upload", {"aud_path": "/etc/passwd"})
        raise AssertionError("arbitrary aud_path accepted")
    except urllib.error.HTTPError as e:
        assert e.code in (400, 404), e.code

    r = post("/api/model_select", {"model": "toy"})
    assert r["model"] == "toy" and r["resumed"], r
    r = post("/api/audio_upload",
             {"aud_path": os.path.join(data, "aud_ds.npy")})
    n_aud = r["aud_frames"]
    assert n_aud == N_FRAMES, r
    r = get("/api/inference")
    assert r.get("started"), r
    import time

    for _ in range(600):
        s = get("/api/status")
        if not s["busy"]:
            break
        time.sleep(0.5)
    assert s["error"] is None, s
    size = os.path.getsize(raw_out)
    assert size == n_aud * H * W * 3, (size, n_aud * H * W * 3)
    print(f"   raw sink bytes ok: {size} = {n_aud}x{H}x{W}x3")

    print("== live REST protocol (audio_chunk -> incremental render)")
    # same features dripped as .npy segments: the raw sink must hold the
    # SAME bytes again (run_live == run(), REST-level)
    import io as _io

    import numpy as _np

    offline_bytes = open(raw_out, "rb").read()
    feats = _np.load(os.path.join(data, "aud_ds.npy"))

    def post_npy(arr):
        bio = _io.BytesIO()
        _np.save(bio, arr)
        req = urllib.request.Request(
            url + "/api/audio_chunk", bio.getvalue(),
            {"Content-Type": "application/octet-stream"})
        with urllib.request.urlopen(req) as r:
            return json.loads(r.read())

    r = post_npy(feats[:3])
    assert r.get("live"), r
    post_npy(feats[3:])
    req = urllib.request.Request(url + "/api/audio_end", b"",
                                 {"Content-Type": "application/json"})
    with urllib.request.urlopen(req) as r:
        assert json.loads(r.read()) == {"ended": True,
                                        "status": "success"}
    for _ in range(600):
        s = get("/api/status")
        if not s["busy"]:
            break
        time.sleep(0.5)
    assert s["error"] is None and s["frames_done"] == n_aud, s
    live_bytes = open(raw_out, "rb").read()
    assert live_bytes == offline_bytes, "live REST frames != offline"
    httpd.shutdown()
    print(f"   live frames byte-identical to offline ({len(live_bytes)} B)")
    print("E2E DRIVE: ALL OK")


if __name__ == "__main__":
    main()
