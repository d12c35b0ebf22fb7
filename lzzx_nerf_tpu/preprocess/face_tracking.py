"""3DMM head-pose tracking (task 8) — JAX port of all four fit stages.

Reference: data_utils/face_tracking/ (facemodel.py Face_3DMM,
util.py geometry helpers, ajian_util.py fit loops, face_tracker.py driver).
The reference pipeline is: focal search (600..1400) -> coarse landmark fit
over all frames -> photometric light/texture fit via a pytorch3d rasterizer
(render_3dmm.py:79-207, ajian_util.py:167-253) -> fine batched fit with
laplacian temporal smoothing, resumable from track_iter_params.pt.

This port implements the landmark-driven stages (focal search, coarse fit,
fine fit with laplacian smoothing, resume files) as jitted optax loops, plus
a TPU-native photometric stage: instead of a triangle rasterizer, vertices
are point-splatted with differentiable bilinear scatter-add (sigma-free,
static shapes, one fused XLA program) under 9-band spherical-harmonics
lighting over per-vertex BFM albedo — same optimization variables as the
reference (shared texture code, per-frame SH gamma, then pose/exp refinement
against the photometric + landmark loss). The stage activates when the BFM
assets include the texture basis + topology and is a no-op otherwise (the
BFM itself is not redistributable and is gitignored in the reference too).

Convention notes (kept bit-compatible with the reference):
- euler2rot reproduces the tracker's own convention (util.py:18-50:
  standard R_x/R_y, transposed R_z) — NOT the pytorch3d convention in
  utils/pose.py. Parity-tested against a transcription of the torch code.
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
    """[B, 3] -> [B, 3, 3], tracker convention (util.py:18-50).

    Matches the reference factor-for-factor: its torch.cat(..., 2) builds
    rot_x/rot_y as the STANDARD axis rotations and rot_z as the transposed
    one — so the row-major stacks below reproduce it directly, with NO
    per-factor transpose. (An earlier revision transposed each factor,
    which equals reference(-pitch, -yaw, +roll): self-consistent for
    videos tracked here, but it silently inverted the poses derived from
    a reference-produced track_params.pt — guarded by
    tests/test_face_tracking.py::test_euler2rot_matches_reference.)"""
    t, p, s = euler[:, 0], euler[:, 1], euler[:, 2]
    z = jnp.zeros_like(t)
    o = jnp.ones_like(t)
    rot_x = jnp.stack([o, z, z, z, jnp.cos(t), -jnp.sin(t),
                       z, jnp.sin(t), jnp.cos(t)], -1).reshape(-1, 3, 3)
    rot_y = jnp.stack([jnp.cos(p), z, jnp.sin(p), z, o, z,
                       -jnp.sin(p), z, jnp.cos(p)], -1).reshape(-1, 3, 3)
    rot_z = jnp.stack([jnp.cos(s), jnp.sin(s), z, -jnp.sin(s), jnp.cos(s), z,
                       z, z, o], -1).reshape(-1, 3, 3)
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

def _load_tris(info: dict, modelpath: str) -> Optional[np.ndarray]:
    """Triangle topology: prefer 3DMM_info.npy['tris'] (written by
    scripts/convert_bfm.py), else the reference's topology_info.npy."""
    if "tris" in info:
        return np.asarray(info["tris"], np.int64)
    topo_p = os.path.join(modelpath, "topology_info.npy")
    if os.path.exists(topo_p):
        topo = np.load(topo_p, allow_pickle=True).item()
        if "tris" in topo:
            return np.asarray(topo["tris"], np.int64)
    return None


@dataclass
class Face3DMM:
    """BFM bases (facemodel.py:8-50). Loads 3DMM_info.npy + keys_info.npy
    from `modelpath`; raises with instructions when absent. Texture basis +
    topology are optional — when present they enable the photometric stage."""

    base_id: jnp.ndarray      # [id_dim, 3N]
    base_exp: jnp.ndarray     # [exp_dim, 3N]
    mu: jnp.ndarray           # [3N]
    sig_id: jnp.ndarray       # [id_dim]
    sig_exp: jnp.ndarray      # [exp_dim]
    keyinds: np.ndarray       # [68]
    left_contour: np.ndarray  # [8, K]
    right_contour: np.ndarray  # [8, K]
    base_tex: Optional[jnp.ndarray] = None   # [tex_dim, 3N]
    mu_tex: Optional[jnp.ndarray] = None     # [3N] in 0..255
    sig_tex: Optional[jnp.ndarray] = None    # [tex_dim]
    tris: Optional[np.ndarray] = None        # [T, 3] vertex indices

    @staticmethod
    def load(modelpath: str, id_dim: int = 100, exp_dim: int = 79,
             tex_dim: int = 100) -> "Face3DMM":
        info_p = os.path.join(modelpath, "3DMM_info.npy")
        keys_p = os.path.join(modelpath, "keys_info.npy")
        if not (os.path.exists(info_p) and os.path.exists(keys_p)):
            raise RuntimeError(
                f"3DMM assets not found in {modelpath}. The Basel Face Model "
                "is not redistributable; obtain 01_MorphableModel.mat + "
                "exp_info.npy and convert them (scripts/convert_bfm.py, "
                "mirroring the reference data_utils/face_tracking/"
                "convert_BFM.py), then place 3DMM_info.npy and keys_info.npy "
                "here.")
        info = np.load(info_p, allow_pickle=True).item()
        keys = np.load(keys_p, allow_pickle=True).item()
        mu = (info["mu_shape"] + info["mu_exp"]).reshape(-1, 3)
        mu = mu - mu.mean(0, keepdims=True)

        def opt(key, scale=1.0, dims=None):
            if key not in info:
                return None
            v = np.asarray(info[key], np.float32)
            if dims is not None:
                v = v[:dims]
            return jnp.asarray(v * scale, jnp.float32)

        return Face3DMM(
            base_id=jnp.asarray(info["b_shape"][:id_dim] / 1e5, jnp.float32),
            base_exp=jnp.asarray(info["b_exp"][:exp_dim] / 1e5, jnp.float32),
            mu=jnp.asarray(mu.reshape(-1) / 1e5, jnp.float32),
            sig_id=jnp.asarray(info["sig_shape"][:id_dim], jnp.float32),
            sig_exp=jnp.asarray(info["sig_exp"][:exp_dim], jnp.float32),
            keyinds=np.asarray(keys["keyinds"], np.int64),
            left_contour=np.asarray(keys["left_contour"], np.int64),
            right_contour=np.asarray(keys["right_contour"], np.int64),
            base_tex=opt("b_tex", dims=tex_dim),
            mu_tex=opt("mu_tex"),
            sig_tex=opt("sig_tex", dims=tex_dim),
            tris=_load_tris(info, modelpath),
        )

    @property
    def has_texture(self) -> bool:
        return (self.base_tex is not None and self.mu_tex is not None
                and self.tris is not None)

    def geometry(self, id_para: jnp.ndarray, exp_para: jnp.ndarray
                 ) -> jnp.ndarray:
        """Full model-space vertices [B, N, 3] (facemodel.py forward_geo)."""
        idp = id_para * self.sig_id
        expp = exp_para * self.sig_exp
        g = idp @ self.base_id + expp @ self.base_exp + self.mu
        return g.reshape(g.shape[0], -1, 3)

    def albedo(self, tex_para: jnp.ndarray) -> jnp.ndarray:
        """Per-vertex albedo [N, 3] in [0, 1] (facemodel.py forward_tex)."""
        sig = self.sig_tex if self.sig_tex is not None else 1.0
        t = self.mu_tex + (tex_para * sig) @ self.base_tex
        return jnp.clip(t.reshape(-1, 3) / 255.0, 0.0, 1.0)

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


# ---------- photometric stage (render_3dmm.py + ajian_util.py:167-253,
# re-designed as a differentiable point-splat instead of a triangle raster) --


def vertex_normals(verts: jnp.ndarray, tris: np.ndarray) -> jnp.ndarray:
    """Area-weighted vertex normals. verts [B, N, 3], tris [T, 3] ->
    [B, N, 3] unit normals (the raster normals of render_3dmm.py:120-140)."""
    v0 = verts[:, tris[:, 0]]
    v1 = verts[:, tris[:, 1]]
    v2 = verts[:, tris[:, 2]]
    fn = jnp.cross(v1 - v0, v2 - v0)                  # [B, T, 3]
    N = verts.shape[1]
    vn = jnp.zeros_like(verts)
    for k in range(3):
        vn = vn.at[:, tris[:, k]].add(fn)
    return vn / jnp.maximum(jnp.linalg.norm(vn, axis=-1, keepdims=True), 1e-8)


# 9-band SH constants (the standard Ramamoorthi/Hanrahan irradiance basis
# used by the reference's SHLights, render_3dmm.py:79-118)
_SH_A = np.array([np.pi, 2 * np.pi / np.sqrt(3.0), 2 * np.pi / np.sqrt(8.0)])
_SH_C = np.array([1 / np.sqrt(4 * np.pi),
                  np.sqrt(3.0) / np.sqrt(4 * np.pi),
                  3 * np.sqrt(5.0) / np.sqrt(12 * np.pi)])


def sh_irradiance(normals: jnp.ndarray, gamma: jnp.ndarray) -> jnp.ndarray:
    """normals [B, N, 3], gamma [B, 9, 3] SH coefficients -> [B, N, 3]
    per-vertex RGB irradiance. gamma[:, 0] carries a +0.8 ambient offset
    convention (as in the reference's init_gamma=0.8)."""
    nx, ny, nz = normals[..., 0], normals[..., 1], normals[..., 2]
    a, c = _SH_A, _SH_C
    basis = jnp.stack([
        jnp.full_like(nx, float(a[0] * c[0])),
        -float(a[1] * c[1]) * ny,
        float(a[1] * c[1]) * nz,
        -float(a[1] * c[1]) * nx,
        float(a[2] * c[2]) * nx * ny,
        -float(a[2] * c[2]) * ny * nz,
        float(a[2] * c[2] / (2 * np.sqrt(3.0))) * (3 * nz ** 2 - 1),
        -float(a[2] * c[2]) * nx * nz,
        float(a[2] * c[2] / 2) * (nx ** 2 - ny ** 2),
    ], axis=-1)                                        # [B, N, 9]
    g = gamma.at[:, 0].add(0.8) if gamma.ndim == 3 else gamma
    return jnp.einsum("bnk,bkc->bnc", basis, g)


def splat_render(proj: jnp.ndarray, colors: jnp.ndarray, weights: jnp.ndarray,
                 H: int, W: int, depth: Optional[jnp.ndarray] = None,
                 depth_tau: Optional[jnp.ndarray] = None,
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Differentiable point-splat: bilinear scatter-add of per-vertex colors.

    proj [B, N, 2] pixel coords (x, y), colors [B, N, 3], weights [B, N]
    (visibility/facing weights) -> (image [B, H, W, 3], wsum [B, H, W]).
    Static shapes, no sort.

    depth/depth_tau (round-2 review item 7 — occlusion handling beyond
    facing weights): `depth` [B, N] positive camera distances enable a SOFT
    Z-BUFFER — pass 1 scatter-mins the nearest contributing depth per
    pixel, pass 2 multiplies each splat by exp(-(d - d_nearest)/tau)
    ([B] or scalar tau), so surfaces behind a nearer surface fade out
    smoothly (differentiable, unlike the reference's hard rasterizer
    z-test, render_3dmm.py:79-207, which this approximates as tau -> 0).
    Facing weights alone are exact only for convex geometry; profile-view
    frames (far cheek behind the near one) need the depth term."""
    B, N = proj.shape[:2]
    x = proj[..., 0]
    y = proj[..., 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0

    corners = ((0, 0, (1 - fx) * (1 - fy)), (1, 0, fx * (1 - fy)),
               (0, 1, (1 - fx) * fy), (1, 1, fx * fy))

    def corner_idx(dx, dy):
        xi = jnp.clip(x0 + dx, 0, W - 1).astype(jnp.int32)
        yi = jnp.clip(y0 + dy, 0, H - 1).astype(jnp.int32)
        return yi * W + xi                             # [B, N]

    occl = [1.0] * 4
    if depth is not None:
        tau = jnp.asarray(depth_tau if depth_tau is not None else 1.0,
                          jnp.float32)
        tau = jnp.broadcast_to(tau, (B,))              # scalar or [B]
        zsrc = jnp.where(weights > 1e-6, depth, 1e9)   # ignore back-facing
        zbuf = jnp.full((B, H * W), 1e9)
        for dx, dy, _ in corners:
            idx = corner_idx(dx, dy)
            zbuf = jax.vmap(lambda zb, i, v: zb.at[i].min(v))(zbuf, idx, zsrc)
        zbuf = jax.lax.stop_gradient(zbuf)
        occl = []
        for dx, dy, _ in corners:
            idx = corner_idx(dx, dy)
            znear = jnp.take_along_axis(zbuf, idx, axis=1)  # [B, N]
            occl.append(jnp.exp(-jnp.maximum(depth - znear, 0.0)
                                / jnp.maximum(tau.reshape(B, 1), 1e-6)))

    img = jnp.zeros((B, H * W, 3))
    wsum = jnp.zeros((B, H * W))
    for (dx, dy, w), oc in zip(corners, occl):
        idx = corner_idx(dx, dy)
        ww = w * weights * oc
        img = jax.vmap(lambda im, i, v: im.at[i].add(v))(
            img, idx, colors * ww[..., None])
        wsum = jax.vmap(lambda ws, i, v: ws.at[i].add(v))(wsum, idx, ww)
    img = img / jnp.maximum(wsum, 1e-6)[..., None]
    return img.reshape(B, H, W, 3), wsum.reshape(B, H, W)


def render_photometric(model: Face3DMM, params: Dict, cxy, H: int, W: int,
                       scale: float = 1.0, frames_idx: Optional[slice] = None,
                       depth_tau_rel: float = 0.05):
    """Forward photometric model: geometry -> normals -> SH shading ->
    depth-weighted point-splat. Returns (image [F, H', W', 3], wsum) at
    resolution/scale.

    depth_tau_rel: soft z-buffer temperature as a fraction of the model's
    per-frame depth range (splat_render's occlusion term; 0 disables —
    facing weights only, the pre-round-3 behavior)."""
    idb = jnp.broadcast_to(params["id"],
                           (params["exp"].shape[0], params["id"].shape[-1]))
    verts = model.geometry(idb, params["exp"])
    rot = euler2rot(params["euler"])
    verts_view = jnp.einsum("bij,bnj->bni", rot, verts) \
        + params["trans"][:, None, :]
    normals = vertex_normals(verts, model.tris)
    normals_view = jnp.einsum("bij,bnj->bni", rot, normals)
    # facing weight: camera looks along -Z from the origin (projection
    # px = -f X/Z, util.py:73-83); front-facing surfaces have view-space
    # normal z > 0
    facing = jax.nn.relu(normals_view[..., 2])
    albedo = model.albedo(params["tex"])               # [N, 3]
    shade = sh_irradiance(normals_view, params["gamma"])
    colors = jnp.clip(albedo[None] * shade, 0.0, 1.0)

    X, Y, Z = verts_view[..., 0], verts_view[..., 1], verts_view[..., 2]
    px = (-params["focal"] * X / Z + cxy[0]) * scale
    py = (params["focal"] * Y / Z + cxy[1]) * scale
    proj = jnp.stack([px, py], -1)
    h, w = int(round(H * scale)), int(round(W * scale))
    depth = tau = None
    if depth_tau_rel > 0:
        # camera at the origin looking along -Z (projection above): positive
        # camera distance is -Z; tau scales with the head's depth extent
        depth = -Z
        rng_d = (jnp.max(depth, axis=1) - jnp.min(depth, axis=1))
        tau = jnp.maximum(depth_tau_rel * rng_d, 1e-6)
    return splat_render(proj, colors, facing, h, w, depth=depth,
                        depth_tau=tau)


def fit_light(model: Face3DMM, frames: jnp.ndarray, cxy, params: Dict,
              scale: float = 0.25, tex_dim: Optional[int] = None,
              iters: int = 300, lr: float = 0.05,
              reg_tex: float = 0.05) -> Dict:
    """Photometric light/texture fit (ajian_util.py:167-253): holding the
    landmark-fit pose, optimize the shared texture code + per-frame SH gamma
    against the downscaled video frames. frames: [F, h, w, 3] float in
    [0, 1] ALREADY at the downscaled resolution (h = H*scale)."""
    if not model.has_texture:
        raise RuntimeError("photometric stage needs texture basis + topology "
                           "(b_tex/mu_tex/tris in 3DMM_info.npy)")
    F = params["exp"].shape[0]
    td = tex_dim or model.base_tex.shape[0]
    H = int(round(frames.shape[1] / scale))
    W = int(round(frames.shape[2] / scale))
    p = dict(params)
    p.setdefault("tex", jnp.zeros((1, td)))
    p.setdefault("gamma", jnp.zeros((F, 9, 3)))

    tx = optax.adam(lr)
    trainable = ("tex", "gamma")
    opt_state = tx.init({k: p[k] for k in trainable})

    def loss_fn(tp, frozen):
        q = {**frozen, **tp}
        img, wsum = render_photometric(model, q, cxy, H, W, scale)
        cover = (wsum > 0.5).astype(jnp.float32)[..., None]
        photo = jnp.sum(((img - frames) ** 2) * cover) / \
            jnp.maximum(jnp.sum(cover), 1.0)
        return photo + reg_tex * jnp.mean(tp["tex"] ** 2), photo

    @jax.jit
    def step(tp, frozen, opt_state):
        (_, photo), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            tp, frozen)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(tp, updates), opt_state, photo

    tp = {k: p[k] for k in trainable}
    frozen = {k: v for k, v in p.items() if k not in trainable}
    photo = jnp.float32(0.0)
    for _ in range(iters):
        tp, opt_state, photo = step(tp, frozen, opt_state)
    p.update(tp)
    p["photo_loss"] = float(photo)
    return p


# ---------- fit stages (ajian_util.py ports) ----------

# jitted fit steps cached ON the model instance, keyed by the loss
# configuration: a fresh @jax.jit closure per _adam_fit call would
# recompile the IDENTICAL program on every call — fit_focal invokes
# _adam_fit 18 times (9 focals x 2 stages) and fit_fine's checkpointing
# loop iters/save_every times, all at the same shapes. One cached function
# object per config lets jit's own cache reuse the compiled program
# (lms/photo_frames are arguments, so shape changes retrace naturally).
# Instance-attached (not a module global keyed by id(model)) so a batch
# job tracking many videos doesn't retain every video's BFM arrays +
# compiled executables for the process lifetime — entries die with the
# model (the model->cache->closure->model cycle is ordinary GC fodder).


def _fit_step_for(model: Face3DMM, cxy, lr: float, reg_id: float,
                  reg_exp: float, lap_w: float, photo_scale: float,
                  photo_w: float):
    cache: Dict = model.__dict__.setdefault("_fit_step_cache", {})
    key = (tuple(float(v) for v in np.asarray(cxy).ravel()),
           float(lr), float(reg_id), float(reg_exp), float(lap_w),
           float(photo_scale), float(photo_w))
    cached = cache.get(key)
    if cached is not None:
        return cached
    tx = optax.adam(lr)

    def loss_fn(tp, frozen, lms, photo_frames):
        p = {**frozen, **tp}
        F = lms.shape[0]
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
        if photo_frames is not None and photo_w > 0:
            ph = int(round(photo_frames.shape[1] / photo_scale))
            pw = int(round(photo_frames.shape[2] / photo_scale))
            img, wsum = render_photometric(model, p, cxy, ph, pw, photo_scale)
            cover = (wsum > 0.5).astype(jnp.float32)[..., None]
            photo = jnp.sum(((img - photo_frames) ** 2) * cover) / \
                jnp.maximum(jnp.sum(cover), 1.0)
            total = total + photo_w * photo
        return total, loss

    @jax.jit
    def step(tp, frozen, opt_state, scale, lms, photo_frames):
        (_, lan), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            tp, frozen, lms, photo_frames)
        updates, opt_state = tx.update(grads, opt_state)
        updates = jax.tree.map(lambda u: u * scale, updates)
        tp = optax.apply_updates(tp, updates)
        return tp, opt_state, lan

    cache[key] = (tx, step)
    return tx, step


def _adam_fit(model: Face3DMM, lms, cxy, params: Dict, trainable, iters: int,
              lr: float, reg_id: float = 0.0, reg_exp: float = 0.0,
              lap_w: float = 0.0, decay_at: Optional[int] = None,
              photo_frames: Optional[jnp.ndarray] = None,
              photo_scale: float = 0.25, photo_w: float = 0.0):
    """Generic landmark-loss Adam loop; params: dict with id (shared [1,Did]),
    exp/euler/trans per-frame. Only keys in `trainable` get gradients.
    With photo_frames ([F, h, w, 3] downscaled video) and photo_w > 0 the
    loss adds the point-splat photometric term (the fine stage's color loss,
    ajian_util.py:255-488)."""
    tx, step = _fit_step_for(model, cxy, lr, reg_id, reg_exp, lap_w,
                             photo_scale, photo_w)
    opt_state = tx.init({k: params[k] for k in trainable})
    if not (photo_frames is not None and photo_w > 0):
        photo_frames = None

    tp = {k: params[k] for k in trainable}
    frozen = {k: v for k, v in params.items() if k not in trainable}
    scale = jnp.float32(1.0)
    lan = jnp.float32(0.0)
    for i in range(iters):
        if decay_at and i and i % decay_at == 0:
            scale = scale * 0.2
        tp, opt_state, lan = step(tp, frozen, opt_state, scale, lms,
                                  photo_frames)
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
    Returns (best_focal, best_landmark_loss). The best-so-far always wins
    (inf sentinel): an absolute threshold here would return focal=None on
    a high-resolution crop whose pixel-squared loss never dips below it."""
    best = (None, float("inf"))
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
             save_every: int = 200,
             photo_frames: Optional[jnp.ndarray] = None,
             photo_scale: float = 0.25,
             photo_w: float = 0.0) -> Dict:
    """Fine fit with laplacian temporal smoothing and (when photo_frames +
    tex/gamma params are present) the photometric color term
    (ajian_util.py:255-488). Periodically checkpoints to `resume_path`
    (.npz) like the reference's track_iter_params.pt."""
    if resume_path and os.path.exists(resume_path):
        data = np.load(resume_path)
        restored = {k: jnp.asarray(data[k]) for k in data.files
                    if k != "focal"}
        params = {**params, **restored, "focal": jnp.float32(data["focal"])}
    use_photo = (photo_frames is not None and photo_w > 0
                 and "tex" in params and "gamma" in params)
    trainable = ("exp", "euler", "trans") + (("gamma",) if use_photo else ())
    done = 0
    while done < iters:
        n = min(save_every, iters - done)
        params, _ = _adam_fit(
            model, lms, cxy, params, trainable, n, 0.01,
            reg_exp=0.2, lap_w=lap_w,
            photo_frames=photo_frames if use_photo else None,
            photo_scale=photo_scale, photo_w=photo_w if use_photo else 0.0)
        done += n
        if resume_path:
            np.savez(resume_path,
                     **{k: np.asarray(v) for k, v in params.items()
                        if k != "photo_loss"})
    return params


def track_video(ori_dir: str, base_dir: str, modelpath: str,
                sel_num: int = 25, photometric: bool = True,
                photo_scale: float = 0.25, photo_w: float = 0.5) -> Dict:
    """Full tracking driver (face_tracker.py:24-132): load .lms files,
    focal search on a subset, coarse fit, photometric light/texture fit
    (when the BFM texture assets are present), fine fit, save
    track_params."""
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

    photo_frames = None
    if photometric and model.has_texture:
        hw = (int(round(h * photo_scale)), int(round(w * photo_scale)))
        frames = [cv2.resize(
            cv2.cvtColor(cv2.imread(p.replace(".lms", ".jpg")),
                         cv2.COLOR_BGR2RGB), (hw[1], hw[0]))
            for p in lms_files]
        photo_frames = jnp.asarray(np.stack(frames), jnp.float32) / 255.0
        params = fit_light(model, photo_frames, cxy, params,
                           scale=photo_scale)
    params = fit_fine(model, lms, cxy, params,
                      resume_path=os.path.join(base_dir,
                                               "track_iter_params.npz"),
                      photo_frames=photo_frames, photo_scale=photo_scale,
                      photo_w=photo_w)

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
