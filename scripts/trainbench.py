"""Training-throughput benchmark at the production configuration.

Times the jitted train step at the reference's training recipe scale
(num_rays 65536/step, grid 128, S=16 — BASELINE.md "Ray/sample budget")
on the current platform. Training steps chain through the optimizer state,
so a plain loop with one final fetch is honestly timed (no
block_until_ready pitfall: the last loss fetch forces the whole chain).

The reference trains 100k head iters + 25k lips + 200k torso on an
unstated GPU. it/s here x those budgets = wall-clock on one chip.

Usage: python scripts/trainbench.py [--steps 200] [--num-rays 65536]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--num-rays", type=int, default=65536)
    ap.add_argument("--res", type=int, default=512)
    ap.add_argument("--grid", type=int, default=128)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--budget-frac", type=float, default=0.75,
                    help="training-ray compaction budget as a fraction of "
                         "num_rays (render_rays_train_compact); 0 = the "
                         "full static path")
    ap.add_argument("--stage-split", type=int, default=0,
                    help="staged early-termination eval split "
                         "(Config.train_stage_split); 0 = single-pass "
                         "(the default: the staged step measured SLOWER "
                         "at every split/budget tried — Config comment)")
    ap.add_argument("--stage2-frac", type=float, default=0.34,
                    help="stage-2 survivor budget as a fraction of the ray "
                         "budget (Config.train_stage2_frac)")
    ap.add_argument("--fp32", action="store_true",
                    help="fp32 MLP compute (the production default is bf16 "
                         "compute with fp32 params/compositing — Config.fp16, "
                         "cli.py:122 — matching the reference's fp16 AMP)")
    ap.add_argument("--torso", action="store_true",
                    help="benchmark the TORSO stage step instead "
                         "(make_torso_train_step: 2-D deform-field nets, "
                         "no marching — the reference's 200k-iter stage)")
    ap.add_argument("--data_parallel", type=int, default=0,
                    help="shard the ray batch over an N-device 'data' mesh "
                         "(the compact step runs per-shard, trainer.py). "
                         "N=1 on the single real chip measures the vmapped "
                         "per-shard compaction's overhead vs the plain "
                         "path; N>1 needs N devices (virtual CPU mesh via "
                         "--cpu + XLA_FLAGS=--xla_force_host_platform_"
                         "device_count=N)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        if args.data_parallel > 1:
            jax.config.update("jax_num_cpu_devices", args.data_parallel)
        args.res, args.grid, args.num_rays, args.steps = 96, 32, 1024, 8
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/jax_cache_lzzx_tpu" if not args.cpu
                      else "/tmp/jax_cache_lzzx")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    from lzzx_nerf_tpu.data import SyntheticTalkingHead
    from lzzx_nerf_tpu.models import NeRFField
    from lzzx_nerf_tpu.ops.march import marching_dt, num_candidates
    from lzzx_nerf_tpu.render import RenderSettings, init_occupancy_state
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
    occ = init_occupancy_state(settings)
    occ = occ._replace(occ=jnp.ones_like(occ.occ))

    if args.torso:
        import time as _t

        from lzzx_nerf_tpu.models import TorsoField
        from lzzx_nerf_tpu.render import make_torso_grid_update
        from lzzx_nerf_tpu.train.trainer import make_torso_train_step

        torso = TorsoField(ind_dim_torso=8, ind_num=64,
                           dtype=jnp.float32 if args.fp32
                           else jnp.bfloat16)
        b0 = ds.frame(0)
        tparams = torso.init(jax.random.PRNGKey(0), jnp.zeros((4, 2)),
                             jnp.asarray(b0["pose"]), jnp.zeros(8))
        n_params = sum(x.size for x in jax.tree.leaves(tparams))
        tx = build_optimizer(1e-2, 1e-3, 200_000)
        state = TrainState.create(tparams, tx)
        tstep = jax.jit(make_torso_train_step(
            torso, settings, tx, H=res, W=res, num_rays=args.num_rays,
            iters=200_000, ind_dim_torso=8))
        refresh = make_torso_grid_update(torso, settings, 8)
        rng = jax.random.PRNGKey(0)
        frames_dev = []
        for i in range(ds.num_frames):
            fr = {k: jnp.asarray(v) for k, v in ds.frame(i).items()}
            # the torso target: gt torso composited over bg (the synthetic
            # scene has no torso split — any target measures throughput)
            fr["bg_torso_color"] = fr["image"]
            frames_dev.append(jax.device_put(fr))

        def trun(n, state, occ, rng):
            for it in range(n):
                batch = frames_dev[it % ds.num_frames]
                if it % 16 == 0:
                    occ = refresh(state.params, occ, batch["pose"], rng,
                                  state.step)
                state, metrics = tstep(state, occ, batch, rng)
            return state, occ, rng, metrics

        state, occ, rng, metrics = trun(17, state, occ, rng)
        float(metrics["loss"])
        t0 = _t.perf_counter()
        state, occ, rng, metrics = trun(args.steps, state, occ, rng)
        float(metrics["loss"])
        its = args.steps / (_t.perf_counter() - t0)
        print(f"torso step: {its:.2f} it/s at num_rays={args.num_rays} "
              f"({n_params / 1e6:.2f}M params); reference recipe torso "
              f"200k iters = {200_000 / its / 3600:.1f} h on one chip")
        return

    field = NeRFField(audio_in_dim=ds.audio_dim, ind_num=64,
                      dtype=jnp.float32 if args.fp32 else jnp.bfloat16)
    b0 = ds.frame(0)
    params = field.init(jax.random.PRNGKey(0), jnp.zeros((4, 3)),
                        jnp.ones((4, 3)) / 3 ** 0.5, jnp.asarray(b0["auds"]),
                        jnp.zeros(4), jnp.asarray([0.25]), method="init_all")
    n_params = sum(x.size for x in jax.tree.leaves(params))
    tx = build_optimizer(1e-2, 1e-3, 100_000)
    state = TrainState.create(params, tx)
    gran = 1024 if args.num_rays >= 8192 else 256
    budget = (max(gran, int(args.num_rays * args.budget_frac) // gran * gran)
              if args.budget_frac > 0 else 0)
    dp_sharding = None
    if args.data_parallel > 0:
        from lzzx_nerf_tpu.parallel import data_sharding, make_mesh

        devs = jax.devices()[:args.data_parallel]
        assert len(devs) == args.data_parallel, (
            f"need {args.data_parallel} devices, have {len(jax.devices())}")
        dp_sharding = data_sharding(make_mesh("data", devs))
    stage2 = (max(1024, int(budget * args.stage2_frac) // 1024 * 1024)
              if args.stage_split > 0 and budget > 0 else 0)
    step = jax.jit(make_train_step(
        field, settings, tx, H=res, W=res, intrinsics=ds.intrinsics,
        num_rays=args.num_rays, iters=100_000, ind_dim=4,
        ema_interval=1000, train_budget=budget, data_sharding=dp_sharding,
        train_stage_split=args.stage_split if budget > 0 else 0,
        train_stage2_budget=stage2))

    from lzzx_nerf_tpu.render import make_density_grid_update

    grid_refresh = make_density_grid_update(field, settings)

    rng = jax.random.PRNGKey(0)
    frames_dev = [jax.device_put({k: jnp.asarray(v)
                                  for k, v in ds.frame(i).items()})
                  for i in range(ds.num_frames)]

    def run(n, state, occ, rng):
        # no per-step eager ops: the step folds its own rng from state.step
        # and the refresh is one jitted program (render/grid_update.py)
        for it in range(n):
            batch = frames_dev[it % ds.num_frames]
            if it % 16 == 0:
                occ = grid_refresh(state.params, occ, batch["auds"],
                                   batch.get("eye"), rng, state.step)
            state, metrics = step(state, occ, batch, rng)
        return state, occ, rng, metrics

    # compile + warm
    state, occ, rng, metrics = run(17, state, occ, rng)
    float(metrics["loss"])
    t0 = time.perf_counter()
    state, occ, rng, metrics = run(args.steps, state, occ, rng)
    float(metrics["loss"])  # forces the whole chain
    dt_s = time.perf_counter() - t0
    its = args.steps / dt_s
    n_act = (f", n_active={int(metrics['n_active'])}/{budget}"
             if "n_active" in metrics else "")
    if "n_stage2" in metrics:
        n_act += f", n_stage2={int(metrics['n_stage2'])}/{stage2}"
    dp = f", dp={args.data_parallel}" if args.data_parallel else ""
    print(f"train step{dp}: {its:.2f} it/s at num_rays={args.num_rays}, "
          f"grid={grid}, S=16, budget={budget}, {n_params/1e6:.2f}M params "
          f"({args.num_rays * its / 1e6:.2f} Mrays/s backprop){n_act}")
    print(f"reference recipe on one chip: head 100k iters = "
          f"{100_000 / its / 3600:.1f} h, torso 200k = "
          f"{200_000 / its / 3600:.1f} h")


if __name__ == "__main__":
    main()
