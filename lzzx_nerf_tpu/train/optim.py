"""Optimizer wiring with the reference's per-group hyperparameters.

Reference (train.py:274, network.py:315-356): AdamW betas=(0, 0.99), eps 1e-8,
LambdaLR factor 0.5^(step/iters) (0.05^(step/iters) for lips finetune), with
param groups:
  - grid tables (encoder_xy/yz/xz, torso_encoder): lr,       wd = torch AdamW
    default 0.01 (these groups don't set weight_decay)
  - audio_att_net:                                 lr_net*5, wd = 1e-4
  - all other nets + individual codes:             lr_net,   wd = 0
"""

from __future__ import annotations

from typing import Any

import optax


GRID_TABLES = ("encoder_xy", "encoder_yz", "encoder_xz", "torso_encoder")


def param_label_fn(path, leaf) -> str:
    names = {str(getattr(k, "key", getattr(k, "name", k))) for k in path}
    # matches both the hash tables (encoder_xy) and the dense-octave tables
    # (encoder_xy_l0 ... encoder_xz_l3, torso_encoder)
    if any(n.startswith("encoder_") or n.startswith("torso_encoder")
           for n in names):
        return "grid"
    if "audio_att_net" in names:
        return "att"
    # trainable camera refinement: fixed lr 1e-5, no decay/wd
    # (reference network.py:349-351)
    if names & {"camera_dR", "camera_dT"}:
        return "camera"
    return "net"


def lr_decay_rate(finetune_lips: bool) -> float:
    """Per-`iters` exponential decay (reference TrainerUtil scheduler: 0.5,
    0.05 for lips finetune). Shared with the trainer's lr_factor metric so
    the logged rate matches the optax schedule."""
    return 0.05 if finetune_lips else 0.5


def build_optimizer(
    lr: float = 1e-2,
    lr_net: float = 1e-3,
    iters: int = 200_000,
    finetune_lips: bool = False,
) -> optax.GradientTransformation:
    decay_rate = lr_decay_rate(finetune_lips)

    def sched(base):
        return optax.exponential_decay(
            init_value=base, transition_steps=iters, decay_rate=decay_rate
        )

    def adamw(base_lr, wd):
        return optax.adamw(
            learning_rate=sched(base_lr), b1=0.0, b2=0.99, eps=1e-8,
            weight_decay=wd,
        )

    import jax

    def label_tree(params):
        return jax.tree_util.tree_map_with_path(param_label_fn, params)

    tx = optax.multi_transform(
        {
            "grid": adamw(lr, 0.01),
            "att": adamw(lr_net * 5, 1e-4),
            "net": adamw(lr_net, 0.0),
            "camera": optax.adamw(learning_rate=1e-5, b1=0.0, b2=0.99,
                                  eps=1e-8, weight_decay=0.0),
        },
        label_tree,
    )
    # The reference trains under AMP with a GradScaler whose step() SKIPS
    # any update whose grads contain inf/nan (TrainerUtil.py:1045-1050) —
    # bf16 removes the need for loss SCALING, but not for that skip: one
    # non-finite step otherwise poisons the params forever. Measured: the
    # 128-frame production run at 512²/grid 128 NaN'd between steps 50
    # and 100 at sustained lr=1e-2 (horizon 60k), while the same data at
    # a fast-decaying 300-step horizon trained clean — a sporadic blowup,
    # exactly the class the scaler skip absorbs. apply_if_finite is the
    # TPU-native equivalent; train-step metrics report grad_notfinite so
    # runs record how often it fires (metrics.jsonl).
    return optax.apply_if_finite(tx, max_consecutive_errors=100)
