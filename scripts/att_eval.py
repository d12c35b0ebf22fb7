"""Quantify the att=1 (left-context-only) quality cost on the trained model.

Live serving with att=2 must wait for +3 future frames of audio (+120 ms of
latency, utils/audio.py window_offsets); att=1 windows end at the current
frame and add ZERO lookahead. This renders the production-trained model
(scripts/train_production.py state) with both window modes and reports the
PSNR delta — the measured price of the sub-100 ms live operating point
(VERDICT r3 next-round item 3; reference window semantics
nerf_triplane/utils.py:20-52).

Usage: python scripts/att_eval.py [--state trained/production_state.pkl]
       [--res 256] [--cpu]
"""

from __future__ import annotations

import argparse
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def psnr(a, b):
    mse = float(np.mean((np.asarray(a, np.float32)
                         - np.asarray(b, np.float32)) ** 2))
    return -10.0 * np.log10(max(mse, 1e-10))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--state", default="/root/repo/trained/production_state.pkl")
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/jax_cache_lzzx" if args.cpu
                      else "/tmp/jax_cache_lzzx_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    from lzzx_nerf_tpu.data import SyntheticTalkingHead
    from lzzx_nerf_tpu.models import NeRFField
    from lzzx_nerf_tpu.ops.march import num_candidates
    from lzzx_nerf_tpu.render import RenderSettings, render_rays
    from lzzx_nerf_tpu.render.state import OccupancyState
    from lzzx_nerf_tpu.utils import get_rays
    from lzzx_nerf_tpu.utils.audio import get_audio_features_np

    with open(args.state, "rb") as f:
        st = pickle.load(f)
    meta = st["meta"]
    res = args.res
    dt = float(meta["dt"])
    aabb = tuple(float(x) for x in meta["aabb"])
    settings = RenderSettings(bound=1.0, cascade=1,
                              grid_size=int(meta["grid"]), max_steps=16,
                              dt=dt, num_cand=num_candidates(aabb, 0.05, dt),
                              aabb=aabb)
    occ = OccupancyState(**{k: jnp.asarray(v) for k, v in st["occ"].items()})
    params = {"params": jax.tree.map(jnp.asarray, st["head_ema"])}
    ds = SyntheticTalkingHead(num_frames=int(meta["frames"]), H=res, W=res,
                              torso=True)
    field = NeRFField(audio_in_dim=ds.audio_dim,
                      ind_num=max(64, int(meta["frames"])))

    @jax.jit
    def render(params, occ, pose, auds, eye, bg):
        rays = get_rays(pose[None], ds.intrinsics, res, res, N=-1)
        enc_a = field.apply(params, auds, method="encode_audio")
        c = params["params"]["individual_codes"][0]
        return render_rays(field.apply, params, settings, occ,
                           rays["rays_o"][0], rays["rays_d"][0], enc_a, c,
                           eye, bg)["image"]

    scores = {1: [], 2: []}
    frames = list(range(1, ds.num_frames, max(1, ds.num_frames // 8)))[:8]
    for fi in frames:
        b = ds.frame(fi)
        gt = b["image"].reshape(-1, 3)
        for mode in (2, 1):
            auds = get_audio_features_np(ds.aud_features, mode, fi)
            img = render(params, occ, jnp.asarray(b["pose"]),
                         jnp.asarray(auds), jnp.asarray(b["eye"]),
                         jnp.asarray(b["bg_color"]).reshape(-1, 3))
            scores[mode].append(psnr(img, gt))
    a2 = float(np.mean(scores[2]))
    a1 = float(np.mean(scores[1]))
    print(f"att=2 (trained mode, +120 ms live lookahead): {a2:6.2f} dB")
    print(f"att=1 (left-only windows, +0 ms lookahead)  : {a1:6.2f} dB "
          f"(delta {a1 - a2:+.2f} dB)")
    print(f"frames: {frames} @{res}² ({len(frames)} frames)")


if __name__ == "__main__":
    main()
