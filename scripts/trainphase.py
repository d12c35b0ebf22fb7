"""Training-step phase breakdown — differential chained timing.

Isolated phase programs schedule/fuse differently than the full step
(PERF.md "isolation lies"), so the PRIMARY numbers here are DIFFERENTIAL
full-step A/Bs: the production step re-jitted with ONE component removed
or replaced, chained through the optimizer state with a single final
fetch (the honest-timing shape of scripts/trainbench.py). The C-series
core timings (march only, render fwd, render grad) are isolated programs
— use them for ratios between each other, not as absolute shares of the
step.

Usage: python scripts/trainphase.py [--steps 100] [--only full,no_reg,...]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--num-rays", type=int, default=65536)
    ap.add_argument("--res", type=int, default=512)
    ap.add_argument("--grid", type=int, default=128)
    ap.add_argument("--budget-frac", type=float, default=0.75)
    ap.add_argument("--only", type=str, default="",
                    help="comma list of variant names to run")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_lzzx_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    from lzzx_nerf_tpu.data import SyntheticTalkingHead
    from lzzx_nerf_tpu.models import NeRFField
    from lzzx_nerf_tpu.ops.march import marching_dt, num_candidates
    from lzzx_nerf_tpu.ops import march, march2
    from lzzx_nerf_tpu.render import (RenderSettings, init_occupancy_state,
                                      make_density_grid_update,
                                      render_rays_train_compact)
    from lzzx_nerf_tpu.train import (TrainState, build_optimizer,
                                     make_train_step)

    res, grid = args.res, args.grid
    ds = SyntheticTalkingHead(num_frames=8, H=res, W=res)
    dt = marching_dt(1.0, grid, 16, 1)
    aabb = (-1.0, -0.5, -1.0, 1.0, 0.5, 1.0)
    settings = RenderSettings(bound=1.0, cascade=1, grid_size=grid,
                              max_steps=16, dt=dt,
                              num_cand=num_candidates(aabb, 0.05, dt),
                              aabb=aabb)
    occ0 = init_occupancy_state(settings)
    occ0 = occ0._replace(occ=jnp.ones_like(occ0.occ))

    field = NeRFField(audio_in_dim=ds.audio_dim, ind_num=64)
    b0 = ds.frame(0)
    params = field.init(jax.random.PRNGKey(0), jnp.zeros((4, 3)),
                        jnp.ones((4, 3)) / 3 ** 0.5, jnp.asarray(b0["auds"]),
                        jnp.zeros(4), jnp.asarray([0.25]), method="init_all")
    tx = build_optimizer(1e-2, 1e-3, 100_000)
    gran = 1024
    budget = max(gran, int(args.num_rays * args.budget_frac) // gran * gran)
    common = dict(H=res, W=res, intrinsics=ds.intrinsics,
                  num_rays=args.num_rays, iters=100_000, ind_dim=4,
                  ema_interval=1000)

    grid_refresh = make_density_grid_update(field, settings)
    rng = jax.random.PRNGKey(0)
    frames_dev = [jax.device_put({k: jnp.asarray(v)
                                  for k, v in ds.frame(i).items()})
                  for i in range(ds.num_frames)]

    # refresh the grid ONCE so every variant sees the same occupancy and no
    # variant pays refresh time inside its loop (differential isolation)
    occ0 = grid_refresh(params, occ0, frames_dev[0]["auds"],
                        frames_dev[0].get("eye"), rng, jnp.int32(0))
    jax.block_until_ready(occ0.occ)

    def bench_step(step, steps):
        state = TrainState.create(params, tx)
        # warm/compile
        state, m = step(state, occ0, frames_dev[0], rng)
        float(m["loss"])
        t0 = time.perf_counter()
        for it in range(steps):
            state, m = step(state, occ0, frames_dev[it % 8], rng)
        float(m["loss"])
        return (time.perf_counter() - t0) / steps * 1e3  # ms/step

    variants = {}

    def add(name, fn):
        variants[name] = fn

    add("full", lambda: bench_step(jax.jit(make_train_step(
        field, settings, tx, train_budget=budget, **common)), args.steps))
    add("full_path", lambda: bench_step(jax.jit(make_train_step(
        field, settings, tx, train_budget=0, **common)), args.steps))
    add("no_unc_amb", lambda: bench_step(jax.jit(make_train_step(
        field, settings, tx, train_budget=budget,
        unc_loss=False, amb_aud_loss=False, amb_eye_loss=False, **common)),
        args.steps))

    def no_reg():
        kw = dict(common)
        kw["update_extra_interval"] = 1 << 30   # jitter reg never fires
        return bench_step(jax.jit(make_train_step(
            field, settings, tx, train_budget=budget, **kw)), args.steps)

    add("no_reg", no_reg)

    def rank_select():
        orig = march._first_s_select

        def forced(valid, num_cand, max_samples, select="topk"):
            return orig(valid, num_cand, max_samples, "rank")

        march._first_s_select = forced
        march2._first_s_select = forced
        try:
            return bench_step(jax.jit(make_train_step(
                field, settings, tx, train_budget=budget, **common)),
                args.steps)
        finally:
            march._first_s_select = orig
            march2._first_s_select = orig

    add("rank_select", rank_select)

    # ---- C-series: isolated render-core programs, chained via a carried
    # scalar so each call depends on the previous one (honest queueing)
    enc_a0 = jax.jit(lambda p, a: field.apply(p, a, method="encode_audio"))(
        params, frames_dev[0]["auds"])
    from lzzx_nerf_tpu.utils.rays import get_rays

    rays = get_rays(jnp.asarray(b0["pose"])[None], ds.intrinsics, res, res,
                    N=args.num_rays, rng=rng)
    ro0, rd0 = rays["rays_o"][0], rays["rays_d"][0]
    bgc = jnp.ones((args.num_rays, 3)) * 0.5

    def chained(core):
        def fn(carry, p):
            pj = jax.tree.map(lambda x: x + carry * 0, p)
            return core(pj)

        jfn = jax.jit(fn)
        carry = jfn(jnp.float32(0), params)
        float(carry)  # block_until_ready lies on axon (PERF.md) — fetch
        t0 = time.perf_counter()
        for _ in range(args.steps):
            carry = jfn(carry, params)
        float(carry)  # the chain forces every step before this value exists
        return (time.perf_counter() - t0) / args.steps * 1e3

    def render_core(p):
        c = p["params"]["individual_codes"][0]
        res_d = render_rays_train_compact(
            field.apply, p, settings, occ0, ro0, rd0, enc_a0, c,
            jnp.asarray([0.25]), bgc, budget=budget,
            noise=jnp.zeros((args.num_rays,)))
        return jnp.sum(res_d["image"]) * 1e-6

    def march_core(p):
        from lzzx_nerf_tpu.ops.march2 import (column_intervals, compact_rays,
                                              march_rays_window, ray_windows)
        from lzzx_nerf_tpu.ops.ray import near_far_from_aabb

        aabbj = jnp.asarray(settings.aabb, jnp.float32)
        nears, fars = near_far_from_aabb(ro0, rd0, aabbj, settings.min_near)
        z_lo, z_hi = column_intervals(occ0.occ, settings.bound)
        win = ray_windows(ro0, rd0, nears, fars, z_lo, z_hi, settings.bound,
                          settings.dt)
        cs = compact_rays(win.active, budget)
        ro = jnp.take(ro0, cs.ray_idx, axis=0)
        rd = jnp.take(rd0, cs.ray_idx, axis=0)
        t0_ = jnp.take(win.t_start, cs.ray_idx)
        t1_ = jnp.take(win.t_end, cs.ray_idx)
        nr = jnp.take(nears, cs.ray_idx)
        m = march_rays_window(ro, rd, t0_, t1_, cs.slot_valid, occ0.occ,
                              settings.bound, settings.dt,
                              settings.num_cand + 2, settings.max_steps,
                              noise=jnp.zeros((budget,)), nears=nr)
        # touch params so the chained carry has a dependency
        p0 = jax.tree.leaves(p)[0]
        return jnp.sum(m.deltas) * 1e-6 + jnp.sum(p0) * 0

    add("C_render_fwd", lambda: chained(render_core))
    # NOTE: keeping only one net's grad lets XLA DCE every other backward
    # path (measured 61.5 ms ≈ fwd + 4 — an undermeasurement kept as the
    # "MLP-only backward" bound); C_grad_all keeps every leaf alive
    add("C_render_grad", lambda: chained(
        lambda p: jax.grad(lambda q: render_core(q))(p)["params"]
        ["sigma_net"]["net_0"]["kernel"].sum()))

    def grad_all(p):
        g = jax.grad(lambda q: render_core(q))(p)
        return sum(jnp.sum(x) for x in jax.tree.leaves(g))

    add("C_grad_all", lambda: chained(grad_all))

    def grad_no_tables():
        # stop gradients at the baked packed tables: isolates the
        # scatter-add + bake-VJP cost of the encoder backward
        from lzzx_nerf_tpu.ops import packed_triplane as pt

        orig = pt.bake_packed

        def stopped(levels, spec, dtype=jnp.float32):
            return jax.lax.stop_gradient(orig(levels, spec, dtype=dtype))

        pt.bake_packed = stopped
        try:
            return chained(grad_all)
        finally:
            pt.bake_packed = orig

    add("C_grad_no_tables", grad_no_tables)
    add("C_march", lambda: chained(march_core))

    only = [s for s in args.only.split(",") if s]
    for name, fn in variants.items():
        if only and name not in only:
            continue
        ms = fn()
        print(f"{name:>14}: {ms:8.1f} ms/step  ({1e3 / ms:5.2f} it/s)",
              flush=True)


if __name__ == "__main__":
    main()
