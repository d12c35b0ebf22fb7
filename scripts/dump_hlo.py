"""Dump the TPU-optimized HLO of the production 512² frame program.

Reuses the exact build from scripts/profile_frame.py (same shapes → warm
persistent-cache compile) and writes the optimized module text to
/tmp/frame_hlo.txt for offline inspection of fusion bodies and layouts.
"""

from __future__ import annotations

import argparse
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
    ap.add_argument("--out", default="/tmp/frame_hlo.txt")
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
    settings, occ, field, params = _build(res=res, grid=args.grid,
                                          max_steps=S)
    budget = max(1024, int(args.budget_frac * res * res) // 1024 * 1024)
    s2_budget = max(1024, int(budget * args.stage2_frac) // 1024 * 1024)
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
    print(f"# plan: K2={k2} group={group} variant={variant} budget={budget} "
          f"s2={s2_budget}", file=sys.stderr)
    ap16 = make_fused_apply(field, packed)

    def render_frame(params, packed, tables, occ, auds, eye):
        enc_a = field.apply(params, auds, method="encode_audio")
        c = params["params"]["individual_codes"][0]
        out = render_rays_compact_blocks(
            ap16, params, settings, occ, ray_o_origin, rays_d, res, res,
            enc_a, c, eye, bg, budget=budget, window_candidates=k2,
            tables=tables, stage_split=args.stage_split,
            stage2_budget=s2_budget, march_group=group,
            march_variant=variant)
        return (jnp.clip(out["image"], 0, 1) * 255).astype(jnp.uint8)

    auds = jnp.zeros((8, 16, 1024))
    eye = jnp.asarray([0.25])
    compiled = jax.jit(render_frame).lower(
        params, packed, tables, occ, auds, eye).compile()
    txt = compiled.as_text()
    with open(args.out, "w") as f:
        f.write(txt)
    print(f"wrote {len(txt)/1e6:.1f} MB to {args.out}")


if __name__ == "__main__":
    main()
