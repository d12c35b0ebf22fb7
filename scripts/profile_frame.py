"""Profile the real 512² serving frame program with jax.profiler.

Builds the DEFAULT operating-point render (block path, quad march, staged
early-termination eval, measured K2, budget 0.375 — the same program
bench.py times), traces a few frames, and prints the top device ops from
the captured .xplane.pb via tensorboard_plugin_profile's raw converter.
Use this for the REAL per-op cost map: isolated phase programs
(scripts/phasebench2.py) fuse/schedule differently from the full frame
(PERF.md "isolation lies").

Usage: python scripts/profile_frame.py [--torso] [--top 25]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=512)
    ap.add_argument("--grid", type=int, default=128)
    ap.add_argument("--samples", type=int, default=16)
    ap.add_argument("--stage-split", type=int, default=8)
    ap.add_argument("--budget-frac", type=float, default=0.375)
    ap.add_argument("--stage2-frac", type=float, default=0.375)
    ap.add_argument("--march-variant", default="nb5w")
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--state", default=None,
                    help="production_state.pkl: profile the TRAINED frame "
                         "(trained occupancy + EMA params + trained pose) "
                         "with bench.py's auto-sized ray/eval budgets — "
                         "the phase map of the number that matters")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_lzzx_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    from __graft_entry__ import _build
    from lzzx_nerf_tpu.models.nerf import make_fused_apply
    from lzzx_nerf_tpu.ops.march2 import (build_inference_tables,
                                          ensure_variant_tables,
                                          needed_variant_tables,
                                          resolve_march_plan)
    from lzzx_nerf_tpu.render import render_rays_compact_blocks
    from lzzx_nerf_tpu.utils import get_rays

    res, S = args.res, args.samples
    ebudget = 0
    if args.state:
        import pickle

        from lzzx_nerf_tpu.models import NeRFField
        from lzzx_nerf_tpu.ops.march import num_candidates
        from lzzx_nerf_tpu.render import RenderSettings
        from lzzx_nerf_tpu.render.state import OccupancyState

        with open(args.state, "rb") as f:
            st = pickle.load(f)
        meta = st["meta"]
        args.grid = int(meta["grid"])
        aabb = tuple(float(x) for x in meta["aabb"])
        settings = RenderSettings(
            bound=1.0, cascade=1, grid_size=args.grid, max_steps=S,
            dt=float(meta["dt"]),
            num_cand=num_candidates(aabb, 0.05, float(meta["dt"])),
            aabb=aabb)
        occ = OccupancyState(**{k: jnp.asarray(v)
                                for k, v in st["occ"].items()})
        params = {"params": jax.tree.map(jnp.asarray, st["head_ema"])}
        ind_num = int(np.asarray(
            st["head_ema"]["individual_codes"]).shape[0])
        field = NeRFField(audio_in_dim=int(meta["audio_dim"]),
                          ind_num=ind_num)
        pose = jnp.asarray(np.asarray(meta["poses"][0], np.float32))[None]
        sc = res / float(meta["res"])
        intr = tuple(float(v) * sc for v in meta["intrinsics"])
    else:
        settings, occ, field, params = _build(res=res, grid=args.grid,
                                              max_steps=S)
        pose = jnp.asarray(np.array(
            [[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, -2.5], [0, 0, 0, 1]],
            np.float32))[None]
        intr = (res / 0.6, res / 0.6, res / 2, res / 2)
    rays = get_rays(pose, intr, res, res, N=-1)
    ray_o_origin = rays["rays_o"][0][0]
    rays_d = rays["rays_d"][0]
    bg = jnp.ones((res * res, 3))
    packed = jax.jit(lambda p: field.apply(p, method="bake_tables",
                                           dtype=jnp.bfloat16))(params)
    tables = jax.jit(
        lambda o: build_inference_tables(o, settings.bound, variants=()))(
            occ.occ)
    k2, group, variant = resolve_march_plan(
        settings, tables.z_lo, tables.z_hi, np.asarray(pose), intr, res, res,
        march_group=2, march_variant=args.march_variant, measure="block",
        log=lambda m: print(f"# {m}", file=sys.stderr))
    tables = ensure_variant_tables(tables, occ.occ,
                                   needed_variant_tables(group, variant))
    march_bucket = None
    use_prepass = False
    if args.state:
        # bench.py's trained-state sizing, verbatim semantics: prepass
        # admission for the ray budget (DEVICE count + 256 margin),
        # host-exact real-block count x1.25 for the eval budget, median-
        # span bucket plan — profile the program bench actually times
        # (it previously profiled the pre-prepass 2.6x-over-admitted
        # program, review finding)
        from lzzx_nerf_tpu.ops.march2 import (bucket_short_budget,
                                              ensure_variant_tables as _ev,
                                              measure_real_blocks_host,
                                              prepass_block_spans,
                                              ray_windows)
        from lzzx_nerf_tpu.ops.ray import near_far_from_aabb

        use_prepass = group == 2
        tables = _ev(tables, occ.occ, ("dil",) if use_prepass else ())
        db = rays_d.reshape(res // 2, 2, res // 2, 2, 3).transpose(
            0, 2, 1, 3, 4).reshape(res * res // 4, 4, 3)
        dcen = db.mean(axis=1)
        dcen = dcen / jnp.linalg.norm(dcen, axis=-1, keepdims=True)
        ocen = jnp.broadcast_to(ray_o_origin, dcen.shape)
        nb_, fb_ = near_far_from_aabb(
            ocen, dcen, jnp.asarray(settings.aabb, jnp.float32),
            settings.min_near)
        win_ = ray_windows(ocen, dcen, nb_, fb_, tables.z_lo, tables.z_hi,
                           settings.bound, settings.dt, pad_steps=3.0)
        if use_prepass:
            hits, gf, gl = jax.jit(
                prepass_block_spans, static_argnums=(5, 6, 7))(
                ocen, dcen, win_.t_start, win_.t_end, tables.col_dilwords,
                settings.bound, settings.dt, k2)
            adm = np.asarray(hits & win_.active)
            spans = (2 * (np.asarray(gl) - np.asarray(gf) + 1) + 2)[adm]
            n_act = int(adm.sum()) * 4 + 256
        else:
            n_act = int(jnp.sum(win_.active)) * 4
        budget = min(res * res // 1024 * 1024,
                     max(1024, -(-n_act // 1024) * 1024))
        if use_prepass and len(spans):
            k2s = int(np.median(spans))
            k2s += k2s % 2
            k2s = max(args.samples + args.samples % 2, min(k2s, k2 - 2))
            if k2s < k2:
                bs = bucket_short_budget(
                    int((spans <= k2s).sum()) * 4, budget, 1024)
                if bs:
                    march_bucket = (k2s, bs)
        n_real_m = 4 * measure_real_blocks_host(
            occ.occ[0], settings.aabb, settings.min_near,
            np.asarray(ray_o_origin), np.asarray(db),
            win_.t_start, win_.t_end, win_.active,
            settings.bound, settings.dt, k2)
        ebudget = min(budget,
                      max(1024, -(-int(n_real_m * 1.25) // 1024) * 1024))
    else:
        budget = max(1024, int(args.budget_frac * res * res)
                     // 1024 * 1024)
    s2_budget = max(1024, int(budget * args.stage2_frac) // 1024 * 1024)
    print(f"# plan: K2={k2} group={group} variant={variant} budget={budget} "
          f"s2={s2_budget} eval={ebudget} prepass={use_prepass} "
          f"bucket={march_bucket}", file=sys.stderr)
    ap16 = make_fused_apply(field, packed)

    @jax.jit
    def render_frame(params, packed, tables, occ, auds, eye):
        enc_a = field.apply(params, auds, method="encode_audio")
        c = params["params"]["individual_codes"][0]
        out = render_rays_compact_blocks(
            ap16, params, settings, occ, ray_o_origin, rays_d, res, res,
            enc_a, c, eye, bg, budget=budget, window_candidates=k2,
            tables=tables, stage_split=args.stage_split,
            stage2_budget=s2_budget, march_group=group,
            march_variant=variant, eval_budget=ebudget,
            march_prepass=use_prepass, march_bucket=march_bucket)
        return (jnp.clip(out["image"], 0, 1) * 255).astype(jnp.uint8)

    aud_dim = int(st["meta"]["audio_dim"]) if args.state else 1024
    auds = jnp.zeros((8, 16, aud_dim))
    eye = jnp.asarray([0.25])
    img = render_frame(params, packed, tables, occ, auds, eye)
    np.asarray(img)
    print("warm; tracing...", file=sys.stderr)

    logdir = "/tmp/jaxprof"
    os.system(f"rm -rf {logdir}")
    import time
    with jax.profiler.trace(logdir):
        for _ in range(5):
            img = render_frame(params, packed, tables, occ, auds, eye)
        jax.block_until_ready(img)
    t0 = time.perf_counter()
    for _ in range(20):
        img = render_frame(params, packed, tables, occ, auds, eye)
    jax.block_until_ready(img)
    print(f"20 frames (no fetch): {(time.perf_counter()-t0)/20*1000:.2f} "
          "ms/frame")

    xp = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)
    if not xp:
        print("no xplane captured", file=sys.stderr)
        return
    # parse the xplane proto directly — the tensorboard_plugin_profile
    # converter is incompatible with the installed TF in this image
    from collections import defaultdict

    from tensorflow.tsl.profiler.protobuf import xplane_pb2 as pb

    sp = pb.XSpace()
    sp.ParseFromString(open(xp[0], "rb").read())
    plane = [p for p in sp.planes if p.name == "/device:TPU:0"][0]
    emeta = {m.id: m.name for m in plane.event_metadata.values()}
    line = [l for l in plane.lines if l.name == "XLA Ops"][0]
    agg = defaultdict(float)
    for ev in line.events:
        agg[emeta.get(ev.metadata_id, "?")] += ev.duration_ps
    rows = sorted(agg.items(), key=lambda kv: -kv[1])
    total = sum(agg.values())
    print(f"\ntotal device op time {total/1e6/5:.0f} us/frame (5 traced)")
    for name, t in rows[:args.top]:
        print(f"{t/1e6/5:9.1f} us {100*t/total:5.1f}%  "
              f"{name[:120]}")
    _ = json  # keep import for ad-hoc edits


if __name__ == "__main__":
    main()
