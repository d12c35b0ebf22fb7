"""3DMM head-pose tracking (task 8) — JAX port of the landmark-driven stages.

Reference: data_utils/face_tracking/ (facemodel.py Face_3DMM,
util.py geometry helpers, ajian_util.py fit loops, face_tracker.py driver).
The reference pipeline is: focal search (600..1400) -> coarse landmark fit
over all frames -> photometric light/texture fit via a pytorch3d rasterizer
-> fine batched fit with laplacian temporal smoothing, resumable from
track_iter_params.pt.

This port implements the landmark-driven stages (focal search, coarse fit,
fine fit with laplacian smoothing, resume files) as jitted optax loops; they
produce the euler/trans/focal that transforms.json needs. The photometric
refinement stage is gated: it requires the Basel Face Model textures plus a
differentiable rasterizer, neither of which ships here (the BFM assets are
gitignored in the reference snapshot too).

Convention notes (kept bit-compatible with the reference):
- euler2rot uses the tracker's transposed-sine convention (util.py:18-50) —
  NOT the pytorch3d convention in utils/pose.py.
- projection: x' = -f*X/Z + cx, y' = f*Y/Z + cy (util.py:73-83).
- contour landmarks 0..7 / 9..16 snap to the extreme-x candidate vertex of
  per-landmark contour sets (facemodel.py get_3dlandmarks).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
import optax


# ---------- geometry (util.py ports) ----------

def euler2rot(euler: jnp.ndarray) -> jnp.ndarray:
    """[B, 3] -> [B, 3, 3], tracker convention (util.py:18-50)."""
    t, p, s = euler[:, 0], euler[:, 1], euler[:, 2]
    z = jnp.zeros_like(t)
    o = jnp.ones_like(t)
    # rows as columns-of-cat(2) in the torch code == transposed stacking
    rot_x = jnp.stack([o, z, z, z, jnp.cos(t), -jnp.sin(t),
                       z, jnp.sin(t), jnp.cos(t)], -1).reshape(-1, 3, 3)
    rot_x = rot_x.transpose(0, 2, 1)
    rot_y = jnp.stack([jnp.cos(p), z, jnp.sin(p), z, o, z,
                       -jnp.sin(p), z, jnp.cos(p)], -1).reshape(-1, 3, 3)
    rot_y = rot_y.transpose(0, 2, 1)
    rot_z = jnp.stack([jnp.cos(s), jnp.sin(s), z, -jnp.sin(s), jnp.cos(s), z,
                       z, z, o], -1).reshape(-1, 3, 3)
    rot_z = rot_z.transpose(0, 2, 1)
    return rot_x @ rot_y @ rot_z


def forward_transform(geometry, euler, trans, focal, cxy):
    """[B, N, 3] model pts -> [B, N, 3] (x', y', Z) projections
    (util.py:73-97)."""
    rot = euler2rot(euler)
    g = jnp.einsum("bij,bnj->bni", rot, geometry) + trans[:, None, :]
    X, Y, Z = g[..., 0], g[..., 1], g[..., 2]
    px = -focal * X / Z + cxy[0]
    py = focal * Y / Z + cxy[1]
    return jnp.stack([px, py, Z], -1)


def lap_loss_1d(x: jnp.ndarray) -> jnp.ndarray:
    """Temporal laplacian (-0.5, 1, -0.5) over the frame axis
    (util.py:52-66); x: [F, D]."""
    if x.shape[0] < 3:
        return jnp.float32(0.0)
    lap = -0.5 * x[:-2] + x[1:-1] - 0.5 * x[2:]
    return jnp.mean(lap ** 2)


# ---------- model ----------

@dataclass
class Face3DMM:
    """BFM bases (facemodel.py:8-50). Loads 3DMM_info.npy + keys_info.npy
    from `modelpath`; raises with instructions when absent."""

    base_id: jnp.ndarray      # [id_dim, 3N]
    base_exp: jnp.ndarray     # [exp_dim, 3N]
    mu: jnp.ndarray           # [3N]
    sig_id: jnp.ndarray       # [id_dim]
    sig_exp: jnp.ndarray      # [exp_dim]
    keyinds: np.ndarray       # [68]
    left_contour: np.ndarray  # [8, K]
    right_contour: np.ndarray  # [8, K]

    @staticmethod
    def load(modelpath: str, id_dim: int = 100, exp_dim: int = 79) -> "Face3DMM":
        info_p = os.path.join(modelpath, "3DMM_info.npy")
        keys_p = os.path.join(modelpath, "keys_info.npy")
        if not (os.path.exists(info_p) and os.path.exists(keys_p)):
            raise RuntimeError(
                f"3DMM assets not found in {modelpath}. The Basel Face Model "
                "is not redistributable; obtain 01_MorphableModel.mat + "
                "exp_info.npy and convert them (the reference ships "
                "data_utils/face_tracking/convert_BFM.py), then place "
                "3DMM_info.npy and keys_info.npy here.")
        info = np.load(info_p, allow_pickle=True).item()
        keys = np.load(keys_p, allow_pickle=True).item()
        mu = (info["mu_shape"] + info["mu_exp"]).reshape(-1, 3)
        mu = mu - mu.mean(0, keepdims=True)
        return Face3DMM(
            base_id=jnp.asarray(info["b_shape"][:id_dim] / 1e5, jnp.float32),
            base_exp=jnp.asarray(info["b_exp"][:exp_dim] / 1e5, jnp.float32),
            mu=jnp.asarray(mu.reshape(-1) / 1e5, jnp.float32),
            sig_id=jnp.asarray(info["sig_shape"][:id_dim], jnp.float32),
            sig_exp=jnp.asarray(info["sig_exp"][:exp_dim], jnp.float32),
            keyinds=np.asarray(keys["keyinds"], np.int64),
            left_contour=np.asarray(keys["left_contour"], np.int64),
            right_contour=np.asarray(keys["right_contour"], np.int64),
        )

    def _sel(self, vert_ids: np.ndarray) -> np.ndarray:
        v = np.asarray(vert_ids).reshape(-1)
        return np.stack([3 * v, 3 * v + 1, 3 * v + 2], -1).reshape(-1)

    def landmarks_3d(self, id_para, exp_para, euler, trans, focal, cxy):
        """[B, 68, 3] model-space landmarks with contour snapping
        (facemodel.py:51-118)."""
        idp = id_para * self.sig_id
        expp = exp_para * self.sig_exp
        B = idp.shape[0]

        def geo(vsel):
            sel = self._sel(vsel)
            g = idp @ self.base_id[:, sel] + expp @ self.base_exp[:, sel] \
                + self.mu[sel]
            return g.reshape(B, -1, 3)

        npc = self.left_contour.shape[1]

        def contour(cset, take_max):
            g = geo(cset)                                    # [B, 8*npc, 3]
            proj_x = forward_transform(g, euler, trans, focal, cxy)[..., 0]
            proj_x = proj_x.reshape(B, 8, npc)
            arg = (jnp.argmax if take_max else jnp.argmin)(proj_x, axis=2)
            g = g.reshape(B, 8, npc, 3)
            return jnp.take_along_axis(
                g, arg[:, :, None, None].repeat(3, -1), axis=2)[:, :, 0]

        left = contour(self.left_contour, take_max=False)
        right = contour(self.right_contour, take_max=True)
        lands = geo(self.keyinds)                            # [B, 68, 3]
        lands = lands.at[:, :8].set(left)
        lands = lands.at[:, 9:17].set(right)
        return lands


# ---------- fit stages (ajian_util.py ports) ----------

def _adam_fit(model: Face3DMM, lms, cxy, params: Dict, trainable, iters: int,
              lr: float, reg_id: float = 0.0, reg_exp: float = 0.0,
              lap_w: float = 0.0, decay_at: Optional[int] = None):
    """Generic landmark-loss Adam loop; params: dict with id (shared [1,Did]),
    exp/euler/trans per-frame. Only keys in `trainable` get gradients."""
    tx = optax.adam(lr)
    opt_state = tx.init({k: params[k] for k in trainable})
    F = lms.shape[0]

    def loss_fn(tp, frozen):
        p = {**frozen, **tp}
        idb = jnp.broadcast_to(p["id"], (F, p["id"].shape[-1]))
        geometry = model.landmarks_3d(idb, p["exp"], p["euler"], p["trans"],
                                      p["focal"], cxy)
        proj = forward_transform(geometry, p["euler"], p["trans"], p["focal"],
                                 cxy)
        loss = jnp.mean((proj[..., :2] - lms) ** 2)
        total = loss
        if reg_id:
            total = total + reg_id * jnp.mean(p["id"] ** 2)
        if reg_exp:
            total = total + reg_exp * jnp.mean(p["exp"] ** 2)
        if lap_w:
            total = total + lap_w * (lap_loss_1d(p["euler"])
                                     + lap_loss_1d(p["trans"])
                                     + lap_loss_1d(p["exp"]))
        return total, loss

    @jax.jit
    def step(tp, frozen, opt_state, scale):
        (_, lan), grads = jax.value_and_grad(loss_fn, has_aux=True)(tp, frozen)
        updates, opt_state = tx.update(grads, opt_state)
        updates = jax.tree.map(lambda u: u * scale, updates)
        tp = optax.apply_updates(tp, updates)
        return tp, opt_state, lan

    tp = {k: params[k] for k in trainable}
    frozen = {k: v for k, v in params.items() if k not in trainable}
    scale = jnp.float32(1.0)
    lan = jnp.float32(0.0)
    for i in range(iters):
        if decay_at and i and i % decay_at == 0:
            scale = scale * 0.2
        tp, opt_state, lan = step(tp, frozen, opt_state, scale)
    params.update(tp)
    return params, float(lan)


def _init_params(F: int, id_dim: int, exp_dim: int, focal: float) -> Dict:
    return {
        "id": jnp.zeros((1, id_dim)),
        "exp": jnp.zeros((F, exp_dim)),
        "euler": jnp.zeros((F, 3)),
        "trans": jnp.zeros((F, 3)).at[:, 2].add(-7.0),
        "focal": jnp.float32(focal),
    }


def fit_focal(model: Face3DMM, lms_sel: jnp.ndarray, cxy,
              id_dim: int = 100, exp_dim: int = 79,
              focal_range=range(600, 1500, 100),
              pose_iters: int = 2000, idexp_iters: int = 2500
              ) -> Tuple[float, float]:
    """Focal-length grid search on a frame subset (ajian_util.py:28-92).
    Returns (best_focal, best_landmark_loss)."""
    best = (None, 1e5)
    F = lms_sel.shape[0]
    for focal in focal_range:
        p = _init_params(F, id_dim, exp_dim, float(focal))
        p, _ = _adam_fit(model, lms_sel, cxy, p, ("euler", "trans"),
                         pose_iters, 0.1)
        p, lan = _adam_fit(model, lms_sel, cxy, p,
                           ("id", "exp", "euler", "trans"), idexp_iters, 0.1,
                           reg_id=0.5, reg_exp=0.4, decay_at=1500)
        if lan < best[1]:
            best = (float(focal), lan)
    return best


def fit_coarse(model: Face3DMM, lms: jnp.ndarray, cxy, focal: float,
               id_dim: int = 100, exp_dim: int = 79) -> Dict:
    """Coarse all-frame fit (ajian_util.py:97-165)."""
    F = lms.shape[0]
    p = _init_params(F, id_dim, exp_dim, focal)
    p, _ = _adam_fit(model, lms, cxy, p, ("euler", "trans"), 1500, 1.0,
                     decay_at=1000)
    p, lan = _adam_fit(model, lms, cxy, p, ("id", "exp", "euler", "trans"),
                       2000, 0.1, reg_id=0.5, reg_exp=0.4, decay_at=1000)
    return p


def fit_fine(model: Face3DMM, lms: jnp.ndarray, cxy, params: Dict,
             iters: int = 1000, lap_w: float = 0.05,
             resume_path: Optional[str] = None,
             save_every: int = 200) -> Dict:
    """Fine fit with laplacian temporal smoothing (the landmark terms of
    ajian_util.py:255-488; the photometric color term is gated — see module
    docstring). Periodically checkpoints to `resume_path` (.npz) like the
    reference's track_iter_params.pt."""
    if resume_path and os.path.exists(resume_path):
        data = np.load(resume_path)
        params = {k: jnp.asarray(data[k]) for k in
                  ("id", "exp", "euler", "trans")} | {
                      "focal": jnp.float32(data["focal"])}
    done = 0
    while done < iters:
        n = min(save_every, iters - done)
        params, _ = _adam_fit(model, lms, cxy, params,
                              ("exp", "euler", "trans"), n, 0.01,
                              reg_exp=0.2, lap_w=lap_w)
        done += n
        if resume_path:
            np.savez(resume_path,
                     **{k: np.asarray(v) for k, v in params.items()})
    return params


def track_video(ori_dir: str, base_dir: str, modelpath: str,
                sel_num: int = 25) -> Dict:
    """Full tracking driver (face_tracker.py:24-132): load .lms files,
    focal search on a subset, coarse fit, fine fit, save track_params."""
    import glob

    lms_files = sorted(glob.glob(os.path.join(ori_dir, "*.lms")),
                       key=lambda p: int(os.path.basename(p).split(".")[0]))
    lms = jnp.asarray(np.stack([np.loadtxt(p) for p in lms_files]),
                      jnp.float32)                                # [F, 68, 2]
    import cv2

    img = cv2.imread(lms_files[0].replace(".lms", ".jpg"))
    h, w = img.shape[:2]
    cxy = (w / 2.0, h / 2.0)

    model = Face3DMM.load(modelpath)
    F = lms.shape[0]
    sel = np.arange(0, F, max(1, F // sel_num))[:sel_num]
    focal, landis = fit_focal(model, lms[sel], cxy)
    params = fit_coarse(model, lms, cxy, focal)
    params = fit_fine(model, lms, cxy, params,
                      resume_path=os.path.join(base_dir,
                                               "track_iter_params.npz"))

    # trans is saved in tracker units; save_transforms divides by 10
    # (process.py:327) exactly as with the reference's track_params.pt
    out = {"focal": np.asarray([params["focal"]]),
           "euler": np.asarray(params["euler"]),
           "trans": np.asarray(params["trans"]),
           "exp": np.asarray(params["exp"]),
           "id": np.asarray(params["id"])}
    np.savez(os.path.join(base_dir, "track_params.npz"), **out)
    try:
        import torch

        torch.save({k: torch.as_tensor(v) for k, v in out.items()},
                   os.path.join(base_dir, "track_params.pt"))
    except ImportError:
        pass
    return out
