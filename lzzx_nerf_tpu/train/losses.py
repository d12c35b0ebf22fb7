"""The ER-NeRF loss stack, transcribed from reference TrainerUtil.py:188-367.

All pure functions of (render outputs, batch, step); the jitter regulariser
(which re-runs the field) lives in trainer.make_train_step where the model is
in scope.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp


def binary_entropy(alphas: jnp.ndarray) -> jnp.ndarray:
    """Elementwise binary entropy pushing weights/alphas to 0 or 1
    (TrainerUtil.py:326-328)."""
    a = jnp.clip(alphas, 1e-5, 1 - 1e-5)
    return -a * jnp.log2(a) - (1 - a) * jnp.log2(1 - a)


def entropy_loss(alphas: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(binary_entropy(alphas))


def head_losses(
    outputs: Dict,
    pred_rgb: jnp.ndarray,      # [N, 3]
    gt_rgb: jnp.ndarray,        # [N, 3]
    face_mask: jnp.ndarray,     # [N] bool
    step_factor: jnp.ndarray,   # scalar: min(step / iters, 1)
    unc_loss: bool = True,
    amb_aud_loss: bool = True,
    amb_eye_loss: bool = True,
    lambda_amb: float = 1e-4,
    max_steps: int = 16,
    finetune_lips_active: bool = False,
    ray_weight: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Per-step scalar loss, excluding LPIPS terms (added by the caller when a
    perceptual model is configured) and the jitter regulariser.

    ray_weight: [N] float per-ray loss weights from the compact training
    path (render_rays_train_compact): 0 for budget-overflow rays (their
    render is background, not signal), n_active/n_slotted for the active
    rays that got slots (unbiased-estimator correction), 1 elsewhere.
    Every mean here becomes a weighted mean; identical to the unweighted
    loss when all weights are 1."""
    N = pred_rgb.shape[0]
    face = face_mask.astype(jnp.float32)
    if ray_weight is None:
        vmean = jnp.mean
    else:
        v = ray_weight.astype(jnp.float32)
        denom = jnp.maximum(jnp.sum(v), 1.0)

        def vmean(x):
            return jnp.sum(x * v) / denom

    loss = jnp.mean((pred_rgb - gt_rgb) ** 2, axis=-1)          # [N]

    if unc_loss and not finetune_lips_active:
        # uncertainty-weighted reconstruction (TrainerUtil.py:254-271)
        alpha = 0.2
        uncertainty = outputs["uncertainty"]                     # [N]
        unc_weight = jax.nn.softmax(uncertainty) * N
        scale = alpha + (1 - alpha) * jnp.clip(
            (1 - step_factor) + step_factor * jax.lax.stop_gradient(unc_weight),
            0.0, 10.0,
        )
        loss = loss * scale

        beta = uncertainty + 1.0
        norm_rgb = jax.lax.stop_gradient(
            jnp.linalg.norm(pred_rgb - gt_rgb, axis=-1))
        loss_u = norm_rgb / (2 * beta ** 2) + (jnp.log(beta) ** 2) / 2
        loss = loss + step_factor * loss_u * face

        loss_static_unc = uncertainty * (1.0 - face)
        loss = loss + 1e-3 * step_factor * loss_static_unc

    total = vmean(loss)

    # weights_sum entropy (TrainerUtil.py:326-328)
    total = total + 1e-4 * vmean(binary_entropy(outputs["weights_sum"]))

    # ambient audio: regions outside the face should be audio-static
    # (TrainerUtil.py:331-336)
    lam = step_factor * lambda_amb
    if amb_aud_loss:
        amb_aud = outputs["ambient_aud"]
        total = total + lam * vmean(amb_aud * (1.0 - face))

    # ambient eye x ambient aud cross term inside the face
    # (TrainerUtil.py:339-343)
    if amb_eye_loss:
        amb_eye = outputs["ambient_eye"] / max_steps
        total = total + lam * vmean(
            amb_eye * jax.lax.stop_gradient(outputs["ambient_aud"]) * face)

    return total


def torso_losses(
    pred_rgb: jnp.ndarray,       # [N, 3] torso_color
    gt_rgb: jnp.ndarray,         # [N, 3] bg_torso_color target
    torso_alpha: jnp.ndarray,    # [N, 1]
    anchor_points: jnp.ndarray,  # [3, 4]
) -> jnp.ndarray:
    """Torso-stage loss (TrainerUtil.py:241-244, 319-323)."""
    loss = jnp.mean((pred_rgb - gt_rgb) ** 2)
    loss = loss + jnp.mean((1.0 - anchor_points[:, 3]) ** 2)
    loss = loss + 1e-4 * entropy_loss(torso_alpha)
    return loss
