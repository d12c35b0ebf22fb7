"""Import a reference (LZZX-NeRF / ER-NeRF torch) checkpoint into a
workspace this framework serves and tests from.

    python scripts/import_reference_ckpt.py \
        --ckpt trial_obama/checkpoints/ngp_ep0035.pth \
        --data data/obama --workspace trial_obama_tpu \
        [--torso-ckpt trial_obama_torso/checkpoints/ngp_ep0028.pth]

then evaluate / serve exactly like a natively-trained model:

    python -m lzzx_nerf_tpu.cli data/obama --workspace trial_obama_tpu \
        --encoder hash --test 1 --test_train 1      # PSNR / LPIPS / LMD
    python -m lzzx_nerf_tpu.serving.webapi --port 7860   # serving

What it does:
- converts the ['model'] state dict layout-for-layout
  (utils/convert.py — whole-network forward parity is regression-tested in
  tests/test_convert.py) and merges it over a freshly initialised
  NeRFField(encoder='hash') tree; EMA params get the same weights (the
  reference's 'best' checkpoints ARE the EMA weights,
  TrainerUtil.py:1262-1279);
- imports the density grid when the checkpoint carries one
  (reference buffers are MORTON-ordered [CAS, H^3],
  renderer.py:725-752 — de-mortonised into the natural-order occupancy
  state here) plus the mean_density/mean_count scalars; 'best'-style
  checkpoints that dropped the grid fall back to mark_untrained + a
  loud note to let update_density_grid refine during the first steps;
- writes an orbax checkpoint via the standard Trainer, so every consumer
  (cli --test, serving session, bench) just works.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def dem_morton(grid_flat: np.ndarray, H: int) -> np.ndarray:
    """[CAS, H^3] morton-ordered -> [CAS, H, H, H] natural xyz order."""
    from lzzx_nerf_tpu.ops.morton import morton_perm

    return grid_flat[:, morton_perm(H)].reshape(-1, H, H, H)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--data", required=True)
    ap.add_argument("--workspace", required=True)
    ap.add_argument("--torso-ckpt", default=None)
    ap.add_argument("--asr_model", default="hubert")
    ap.add_argument("--grid_size", type=int, default=128,
                    help="must match the original training run")
    ap.add_argument("--bound", type=float, default=1.0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import torch

    from lzzx_nerf_tpu.cli import _build_world
    from lzzx_nerf_tpu.config import Config
    from lzzx_nerf_tpu.data.provider import NeRFDataset
    from lzzx_nerf_tpu.train import TrainState, Trainer, build_optimizer
    from lzzx_nerf_tpu.utils.convert import (convert_reference_state_dict,
                                             convert_reference_torso)

    ckpt = torch.load(args.ckpt, map_location="cpu", weights_only=False)
    sd = ckpt.get("model", ckpt)
    cfg = Config(path=args.data, workspace=args.workspace,
                 asr_model=args.asr_model, encoder="hash",
                 grid_size=args.grid_size, bound=args.bound)
    if "individual_codes" in sd:
        # adopt the checkpoint's own dims so every later consumer builds
        # shape-compatible templates (opt.txt carries them to the server)
        n, d = sd["individual_codes"].shape
        cfg = cfg.replace(ind_num=int(n), ind_dim=int(d))
    ds = NeRFDataset(cfg, type="train")
    settings, occ, field, params = _build_world(cfg, ds)
    converted = convert_reference_state_dict(sd)
    tree = dict(params)
    base = dict(tree["params"])
    missing = [k for k in base if k not in converted
               and k not in ("camera_dR", "camera_dT")]
    base.update(jax.tree.map(jnp.asarray, converted))
    tree["params"] = base
    if missing:
        print(f"[note] kept fresh-init for params absent from the "
              f"checkpoint: {missing}")

    # density grid: morton-ordered buffer -> natural-order occupancy
    H = settings.grid_size
    if "density_grid" in sd:
        dg = np.asarray(sd["density_grid"].float())
        if dg.size % (H ** 3) or dg.size // (H ** 3) < 1:
            raise SystemExit(
                f"[ERROR] checkpoint density grid has {dg.size} cells, not "
                f"a [CAS, {H}^3] buffer — pass --grid_size to match the "
                "original training run")
        if dg.shape[0] != settings.cascade:
            raise SystemExit(
                f"[ERROR] checkpoint density grid has {dg.shape[0]} "
                f"cascade(s) but --bound {args.bound} implies "
                f"{settings.cascade} — pass --bound to match the original "
                "run")
        dg = dem_morton(dg.reshape(dg.shape[0], -1), H)
        mean_density = float(ckpt.get("mean_density", dg.mean()))
        thresh = min(cfg.density_thresh, mean_density)
        # untrained cells already carry -1 in the reference's own grid
        # (its mark_untrained_grid ran at training time,
        # renderer.py:633-697), so the threshold alone reproduces its
        # occupancy. Intersecting with the fresh occ.occ here would zero
        # EVERYTHING — init_occupancy_state starts occ all-False and only
        # update_density_grid ever sets it.
        occ = occ._replace(
            density_grid=jnp.asarray(dg),
            occ=jnp.asarray(dg > thresh),
            mean_density=jnp.asarray(mean_density, jnp.float32))
        print(f"[ok] density grid imported ({int(np.sum(dg > thresh))} "
              f"occupied cells, mean_density={mean_density:.3f})")
    else:
        print("[note] checkpoint has no density grid ('best'-style save "
              "drops it, TrainerUtil.py:1262-1279): starting from "
              "mark_untrained visibility only — run a few --iters so "
              "update_density_grid refines it, or --test with "
              "--budget_frac 1.0")
    if "mean_density_torso" in ckpt:
        occ = occ._replace(mean_density_torso=jnp.asarray(
            float(ckpt["mean_density_torso"]), jnp.float32))

    tx = build_optimizer(cfg.lr, cfg.lr_net, cfg.iters)
    state = TrainState.create(tree, tx)
    state = state.replace(ema_params=tree["params"],
                          step=jnp.asarray(int(ckpt.get("global_step", 0)),
                                           jnp.int32))
    Trainer(args.workspace).save_checkpoint(state, occ)
    # opt.txt: the serving session adopts architecture fields from the
    # LAST LINE — one JSON document per line (session.py), so no indent
    with open(os.path.join(args.workspace, "opt.txt"), "a") as f:
        f.write(cfg.to_json(indent=None) + "\n")
    print(f"[ok] head checkpoint written to {args.workspace}\n"
          f"     evaluate: python -m lzzx_nerf_tpu.cli {args.data} "
          f"--workspace {args.workspace} --encoder hash "
          f"--grid_size {cfg.grid_size} --ind_num {cfg.ind_num} "
          f"--ind_dim {cfg.ind_dim} --asr_model {cfg.asr_model} "
          f"--test 1 --test_train 1")

    if args.torso_ckpt:
        from lzzx_nerf_tpu.models import TorsoField

        tckpt = torch.load(args.torso_ckpt, map_location="cpu",
                           weights_only=False)
        tsd = tckpt.get("model", tckpt)
        tconv = convert_reference_torso(tsd)
        torso = TorsoField(torso_shrink=cfg.torso_shrink,
                           ind_dim_torso=cfg.ind_dim_torso,
                           ind_num=cfg.ind_num, encoder="tiled")
        tp = torso.init(jax.random.PRNGKey(0), jnp.zeros((4, 2)),
                        jnp.eye(4), jnp.zeros(max(cfg.ind_dim_torso, 1)))
        tbase = dict(tp["params"])
        tbase.update(jax.tree.map(jnp.asarray, tconv))
        occ_t = occ
        if "density_grid_torso" in tsd:
            g = np.asarray(tsd["density_grid_torso"].float()).reshape(H, H)
            occ_t = occ._replace(density_grid_torso=jnp.asarray(g))
        # the torso run's own checkpoint carries the real mean (the head
        # ckpt's, read above, is 0 unless head+torso trained together —
        # TrainerUtil.py:1234-1235 saves it per-run); without it the torso
        # occupancy threshold min(density_thresh_torso, mean) collapses to 0
        if "mean_density_torso" in tckpt:
            occ_t = occ_t._replace(mean_density_torso=jnp.asarray(
                float(tckpt["mean_density_torso"]), jnp.float32))
        t_state = TrainState.create({**tp, "params": tbase}, tx)
        t_state = t_state.replace(ema_params=tbase)
        tws = args.workspace.rstrip("/") + "_torso"
        Trainer(tws).save_checkpoint(t_state, occ_t)
        print(f"[ok] torso checkpoint written to {tws} (encoder=tiled — "
              "pass --encoder hash at test/serve so both fields use the "
              "reference-exact encoders)")


if __name__ == "__main__":
    main()
