"""Export a workspace trained by THIS framework back to the reference
(LZZX-NeRF / ER-NeRF torch) checkpoint format — the inverse of
scripts/import_reference_ckpt.py, completing weight interchange in both
directions (train here, serve there; or diff forward outputs across the
two implementations for parity checks):

    python scripts/export_reference_ckpt.py \
        --workspace trial_obama_tpu --data data/obama \
        --out ngp_from_tpu.pth \
        [--torso-workspace trial_obama_tpu_torso]

What it does:
- loads the workspace checkpoint (the standard orbax Trainer) and writes
  the EMA weights into the reference's ['model'] state dict layout
  (utils/convert.py::export_reference_state_dict — the reference's own
  'best' checkpoints carry EMA weights, TrainerUtil.py:1262-1279);
- re-MORTONises the natural-order density grid into the reference's
  [CAS, H^3] buffer layout (renderer.py:725-752) and packs the occupancy
  bitfield the way its marcher consumes it;
- merges torso parameters into the same state dict when a torso workspace
  is given (the reference keeps head+torso in one model);
- writes mean_density / mean_density_torso / global_step alongside, so
  the reference's load_checkpoint (TrainerUtil.py:1283-1345) restores
  grid statistics too.

Requires --encoder hash training (the dense/tiled encoders have their own
parameterisation with no reference counterpart).
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def to_morton(natural: np.ndarray) -> np.ndarray:
    """[CAS, H, H, H] natural xyz order -> [CAS, H^3] morton-ordered
    (inverse of import_reference_ckpt.dem_morton; both use the shared
    ops.morton.morton_perm permutation)."""
    from lzzx_nerf_tpu.ops.morton import morton_perm

    H = natural.shape[-1]
    flat = np.zeros((natural.shape[0], H ** 3), natural.dtype)
    flat[:, morton_perm(H)] = natural.reshape(natural.shape[0], -1)
    return flat


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--workspace", required=True)
    ap.add_argument("--data", required=True)
    ap.add_argument("--out", required=True, help="output .pth path")
    ap.add_argument("--torso-workspace", default=None)
    ap.add_argument("--asr_model", default="hubert")
    ap.add_argument("--grid_size", type=int, default=128)
    ap.add_argument("--bound", type=float, default=1.0)
    args = ap.parse_args()

    import torch

    from lzzx_nerf_tpu.cli import _build_world
    from lzzx_nerf_tpu.config import Config
    from lzzx_nerf_tpu.data.provider import NeRFDataset
    from lzzx_nerf_tpu.train import TrainState, Trainer, build_optimizer
    from lzzx_nerf_tpu.utils.convert import (export_reference_state_dict,
                                             export_reference_torso)

    # adopt the workspace's own architecture from opt.txt when present —
    # the SAME parsing rules as the serving session (one JSON doc per
    # line, last wins; legacy multi-line fallback; malformed -> defaults)
    def adopt_opt(cfg, workspace, keys):
        import json

        opt_txt = os.path.join(workspace, "opt.txt")
        if not os.path.exists(opt_txt):
            return cfg
        try:
            text = open(opt_txt).read()
            lines = [ln for ln in text.splitlines() if ln.strip()]
            try:
                trained = json.loads(lines[-1])
            except json.JSONDecodeError:
                trained = json.loads("{" + text.rsplit("{", 1)[-1])
            return cfg.replace(**{k: trained[k] for k in keys
                                  if k in trained})
        except Exception:
            return cfg

    cfg = Config(path=args.data, workspace=args.workspace,
                 asr_model=args.asr_model, encoder="hash",
                 grid_size=args.grid_size, bound=args.bound)
    cfg = adopt_opt(cfg, args.workspace,
                    ("encoder", "grid_size", "bound", "ind_num", "ind_dim",
                     "ind_dim_torso", "asr_model", "att", "exp_eye",
                     # train_camera params (camera_dR/dT) live in the saved
                     # tree: the restore template must match even though
                     # the deltas have no reference counterpart
                     "train_camera"))
    if cfg.encoder != "hash":
        raise SystemExit(
            f"workspace was trained with encoder={cfg.encoder!r}; only "
            "'hash' matches the reference parameterisation "
            "(utils/convert.py)")

    ds = NeRFDataset(cfg, type="train")
    settings, occ, field, params = _build_world(cfg, ds)
    tx = build_optimizer(cfg.lr, cfg.lr_net, cfg.iters)
    state = TrainState.create(dict(params), tx)
    state, occ, resumed = Trainer(args.workspace).load_checkpoint(state, occ)
    if not resumed:
        raise SystemExit(f"no checkpoint in {args.workspace!r}")

    # EMA weights, like the reference's own 'best' saves; fall back to the
    # live params for checkpoints that predate EMA
    tree = getattr(state, "ema_params", None) or state.params
    p = tree["params"] if "params" in tree else tree
    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in export_reference_state_dict(p).items()}

    # density grid + bitfield in the reference's morton buffers
    dg = np.asarray(occ.density_grid, np.float32)
    sd["density_grid"] = torch.from_numpy(to_morton(dg))
    occ_m = to_morton(np.asarray(occ.occ, np.uint8))
    sd["density_bitfield"] = torch.from_numpy(
        np.packbits(occ_m.reshape(-1).astype(bool), bitorder="little"))

    ckpt = {"model": sd,
            "mean_density": float(np.asarray(occ.mean_density)),
            "mean_density_torso": float(
                np.asarray(occ.mean_density_torso)),
            "global_step": int(state.step),
            "epoch": 0, "stats": {}}

    if args.torso_workspace:
        from lzzx_nerf_tpu.models import TorsoField
        import jax
        import jax.numpy as jnp

        # the torso run records its own dims in ITS opt.txt (a torso
        # trained with a different --ind_dim_torso than the head's
        # default would otherwise fail the orbax restore)
        tcfg = adopt_opt(cfg, args.torso_workspace,
                         ("ind_dim_torso", "ind_num", "torso_shrink"))
        torso = TorsoField(torso_shrink=tcfg.torso_shrink,
                           ind_dim_torso=tcfg.ind_dim_torso,
                           ind_num=tcfg.ind_num,
                           encoder="dense" if tcfg.encoder == "dense"
                           else "tiled")
        tparams = torso.init(jax.random.PRNGKey(0), jnp.zeros((4, 2)),
                             jnp.eye(4),
                             jnp.zeros(max(tcfg.ind_dim_torso, 1)))
        t_state = TrainState.create(dict(tparams), tx)
        t_state, occ_t, t_ok = Trainer(
            args.torso_workspace).load_checkpoint(t_state, occ)
        if not t_ok:
            raise SystemExit(
                f"no torso checkpoint in {args.torso_workspace!r}")
        t_tree = getattr(t_state, "ema_params", None) or t_state.params
        tp = t_tree["params"] if "params" in t_tree else t_tree
        for k, v in export_reference_torso(tp).items():
            sd[k] = torch.from_numpy(np.ascontiguousarray(v))
        # the trained 2-D torso occupancy grid, flat like the reference's
        # buffer (import_reference_ckpt reads it back via reshape(H, H))
        sd["density_grid_torso"] = torch.from_numpy(
            np.asarray(occ_t.density_grid_torso,
                       np.float32).reshape(-1))
        ckpt["mean_density_torso"] = float(
            np.asarray(occ_t.mean_density_torso))

    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    torch.save(ckpt, args.out)
    print(f"[ok] reference-format checkpoint written to {args.out} "
          f"({len(sd)} tensors, step {ckpt['global_step']})")


if __name__ == "__main__":
    main()
