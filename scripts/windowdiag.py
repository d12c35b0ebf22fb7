"""Diagnostic: per-block z-window length distribution vs the static K2.

The block march tests K2 candidates for EVERY slotted block (static shape);
candidates beyond a block's own window are masked but still pay the full
per-candidate select math. This prints the window-step distribution on the
bench scene to size a two-bucket march (short blocks at a smaller K2).

Usage: python scripts/windowdiag.py [--res 512] [--grid 128]
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
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_lzzx_tpu")

    from __graft_entry__ import _build
    from lzzx_nerf_tpu.ops.march2 import (build_inference_tables, ray_windows,
                                          resolve_march_plan)
    from lzzx_nerf_tpu.ops.ray import near_far_from_aabb
    from lzzx_nerf_tpu.utils import get_rays

    res, grid = args.res, args.grid
    settings, occ, field, params = _build(res=res, grid=grid,
                                          max_steps=args.samples)
    pose = jnp.asarray(np.array(
        [[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, -2.5], [0, 0, 0, 1]],
        np.float32))[None]
    intr = (res / 0.6, res / 0.6, res / 2, res / 2)
    rays = get_rays(pose, intr, res, res, N=-1)
    rays_o, rays_d = rays["rays_o"][0], rays["rays_d"][0]
    tables = jax.jit(
        lambda o: build_inference_tables(o, settings.bound, variants=()))(
            occ.occ)
    k2, group, variant = resolve_march_plan(
        settings, tables.z_lo, tables.z_hi, np.asarray(pose), intr, res, res,
        log=lambda m: print(f"# {m}", file=sys.stderr))

    # block view (render_rays_compact_blocks geometry)
    N = res * res
    NB = N // 4
    d_blocks = rays_d.reshape(res // 2, 2, res // 2, 2, 3).transpose(
        0, 2, 1, 3, 4).reshape(NB, 4, 3)
    d_center = d_blocks.mean(axis=1)
    d_center = d_center / jnp.linalg.norm(d_center, axis=-1, keepdims=True)
    o_center = jnp.broadcast_to(rays_o[0], d_center.shape)
    aabb = jnp.asarray(settings.aabb, jnp.float32)
    nears_b, fars_b = near_far_from_aabb(o_center, d_center, aabb,
                                         settings.min_near)
    win = jax.jit(lambda: ray_windows(
        o_center, d_center, nears_b, fars_b, tables.z_lo, tables.z_hi,
        settings.bound, settings.dt, pad_steps=3.0))()

    active = np.asarray(win.active)
    steps = np.asarray(
        jnp.ceil((win.t_end - win.t_start) / settings.dt))[active]
    steps = np.clip(steps, 0, k2)
    print(f"# scene: res={res} grid={grid} K2={k2} group={group} "
          f"variant={variant}")
    print(f"active blocks: {active.sum()}/{NB} "
          f"({100 * active.mean():.1f}%)")
    qs = [10, 25, 50, 75, 90, 95, 99, 100]
    print("window steps percentiles: "
          + ", ".join(f"p{q}={np.percentile(steps, q):.0f}" for q in qs))
    print(f"mean steps {steps.mean():.1f} of K2={k2} -> "
          f"{100 * (1 - steps.mean() / k2):.0f}% of candidate slots masked")
    for cut in (16, 24, 32, 40):
        frac = (steps <= cut).mean()
        # candidate-test volume if short blocks (<= cut) marched at K2=cut
        vol = (frac * cut + (1 - frac) * k2) / k2
        print(f"  bucket cut {cut}: {100 * frac:.1f}% short -> "
              f"candidate volume {100 * vol:.0f}% of single-K2")


if __name__ == "__main__":
    main()
