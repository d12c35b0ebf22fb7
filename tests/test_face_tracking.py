"""3DMM tracker: with a synthetic morphable model and landmarks generated
from known pose parameters, the landmark fit must recover the pose."""

import numpy as np
import pytest

import jax.numpy as jnp

from lzzx_nerf_tpu.preprocess.face_tracking import (
    Face3DMM, euler2rot, fit_coarse, fit_fine, fit_light, forward_transform,
    render_photometric, sh_irradiance, splat_render, vertex_normals)


def _synthetic_model(n_verts=120, id_dim=8, exp_dim=6, seed=0, texture=False):
    rng = np.random.default_rng(seed)
    # a face-ish blob of 3D points with small id/exp bases
    mu = rng.uniform(-1, 1, (n_verts, 3))
    mu[:, 2] *= 0.5
    mu -= mu.mean(0)
    keyinds = rng.choice(n_verts, 68, replace=False)
    left = rng.choice(n_verts, (8, 5))
    right = rng.choice(n_verts, (8, 5))
    kw = {}
    if texture:
        # a paraboloid "face" with consistent outward (+z-ish) normals so
        # the facing weights of the splat renderer are well-defined
        g = int(np.sqrt(n_verts))
        n_verts = g * g
        xs, ys = np.meshgrid(np.linspace(-1, 1, g), np.linspace(-1, 1, g),
                             indexing="xy")
        zs = 0.6 * (1 - 0.5 * (xs ** 2 + ys ** 2))
        mu = np.stack([xs, ys, zs], -1).reshape(-1, 3)
        mu -= mu.mean(0)
        tris = []
        for r in range(g - 1):
            for c in range(g - 1):
                a, b = r * g + c, r * g + c + 1
                cc, dd = (r + 1) * g + c, (r + 1) * g + c + 1
                tris += [[a, b, cc], [b, dd, cc]]  # +z-facing winding
        keyinds = rng.choice(n_verts, 68, replace=False)
        left = rng.choice(n_verts, (8, 5))
        right = rng.choice(n_verts, (8, 5))
        tex_dim = 4
        kw = dict(
            base_tex=jnp.asarray(
                rng.standard_normal((tex_dim, n_verts * 3)) * 20.0,
                jnp.float32),
            mu_tex=jnp.asarray(
                rng.uniform(80, 200, n_verts * 3), jnp.float32),
            sig_tex=jnp.ones(tex_dim, jnp.float32),
            tris=np.asarray(tris, np.int64),
        )
    return Face3DMM(
        base_id=jnp.asarray(rng.standard_normal((id_dim, n_verts * 3)) * 1e-3,
                            jnp.float32),
        base_exp=jnp.asarray(rng.standard_normal((exp_dim, n_verts * 3)) * 1e-3,
                             jnp.float32),
        mu=jnp.asarray(mu.reshape(-1), jnp.float32),
        sig_id=jnp.ones(id_dim, jnp.float32),
        sig_exp=jnp.ones(exp_dim, jnp.float32),
        keyinds=keyinds, left_contour=left, right_contour=right,
        **kw,
    )


def test_euler2rot_orthonormal():
    e = jnp.asarray([[0.1, -0.2, 0.3], [0.0, 0.0, 0.0]])
    R = np.asarray(euler2rot(e))
    np.testing.assert_allclose(R[1], np.eye(3), atol=1e-6)
    np.testing.assert_allclose(R[0] @ R[0].T, np.eye(3), atol=1e-5)


def test_euler2rot_matches_reference():
    """Factor-for-factor parity with the reference tracker's euler2rot
    (face_tracking/util.py:18-50: standard R_x(t) @ R_y(p) and a
    TRANSPOSED R_z — torch.cat along dim 2 builds columns). Regression:
    transposing every factor equals reference(-t, -p, +s), which inverted
    the poses save_transforms derives from a reference track_params.pt."""
    def ref_euler2rot(e):
        t, p, s = e[:, 0], e[:, 1], e[:, 2]
        ct, st = np.cos(t), np.sin(t)
        cp, sp = np.cos(p), np.sin(p)
        cs, ss = np.cos(s), np.sin(s)
        z = np.zeros_like(t)
        o = np.ones_like(t)
        rx = np.stack([o, z, z, z, ct, -st, z, st, ct], -1).reshape(-1, 3, 3)
        ry = np.stack([cp, z, sp, z, o, z, -sp, z, cp], -1).reshape(-1, 3, 3)
        rz = np.stack([cs, ss, z, -ss, cs, z, z, z, o], -1).reshape(-1, 3, 3)
        return rx @ ry @ rz

    rng = np.random.default_rng(7)
    e = rng.uniform(-1.0, 1.0, (16, 3)).astype(np.float32)
    np.testing.assert_allclose(np.asarray(euler2rot(jnp.asarray(e))),
                               ref_euler2rot(e), atol=1e-5)
    # and specifically NOT the all-factors-transposed variant
    oblique = np.array([[0.3, -0.2, 0.5]], np.float32)
    assert not np.allclose(np.asarray(euler2rot(jnp.asarray(oblique))),
                           ref_euler2rot(-oblique), atol=1e-3)


def test_coarse_fit_recovers_pose():
    model = _synthetic_model()
    F = 6
    rng = np.random.default_rng(1)
    true_euler = jnp.asarray(rng.uniform(-0.15, 0.15, (F, 3)), jnp.float32)
    true_trans = jnp.asarray(
        rng.uniform(-0.3, 0.3, (F, 3)) + [0, 0, -7.0], jnp.float32)
    focal = 900.0
    cxy = (256.0, 256.0)

    idp = jnp.zeros((F, 8))
    expp = jnp.zeros((F, 6))
    lands = model.landmarks_3d(idp, expp, true_euler, true_trans,
                               jnp.float32(focal), cxy)
    gt_lms = forward_transform(lands, true_euler, true_trans,
                               jnp.float32(focal), cxy)[..., :2]

    params = fit_coarse(model, gt_lms, cxy, focal, id_dim=8, exp_dim=6)
    proj = forward_transform(
        model.landmarks_3d(
            jnp.broadcast_to(params["id"], (F, 8)), params["exp"],
            params["euler"], params["trans"], params["focal"], cxy),
        params["euler"], params["trans"], params["focal"], cxy)[..., :2]
    # assert on the inner (non-contour) landmarks: this synthetic model's
    # contour candidate sets are random far-apart points, so the
    # argmin/argmax snapping is unstable by construction (real silhouette
    # candidates are near-colinear and snap stably)
    err = float(jnp.sqrt(jnp.mean((proj[:, 17:] - gt_lms[:, 17:]) ** 2)))
    assert err < 2.0, f"inner landmark reprojection error {err} px"
    # translation recovered to within ~2% of camera distance
    terr = float(jnp.abs(params["trans"] - true_trans).max())
    assert terr < 0.35, terr


def _photo_params(model, F, rng):
    return {
        "id": jnp.zeros((1, 8)), "exp": jnp.zeros((F, 6)),
        "euler": jnp.asarray(rng.uniform(-0.05, 0.05, (F, 3)), jnp.float32),
        "trans": jnp.asarray(rng.uniform(-0.1, 0.1, (F, 3)) + [0, 0, -7.0],
                             jnp.float32),
        "focal": jnp.float32(900.0),
        "tex": jnp.asarray(rng.uniform(-1, 1, (1, 4)), jnp.float32),
        "gamma": jnp.asarray(rng.uniform(-0.1, 0.1, (F, 9, 3)), jnp.float32),
    }


def test_vertex_normals_unit_and_outward():
    model = _synthetic_model(texture=True)
    verts = model.geometry(jnp.zeros((1, 8)), jnp.zeros((1, 6)))
    n = vertex_normals(verts, model.tris)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(n[0]), axis=-1),
                               1.0, atol=1e-5)
    # the paraboloid fixture's winding gives +z-dominant normals
    assert float(jnp.mean(n[0, :, 2])) > 0.5


def test_splat_render_covers_projection():
    model = _synthetic_model(texture=True)
    rng = np.random.default_rng(3)
    p = _photo_params(model, 2, rng)
    img, wsum = render_photometric(model, p, (64.0, 64.0), 128, 128,
                                   scale=0.5)
    img, wsum = np.asarray(img), np.asarray(wsum)
    assert img.shape == (2, 64, 64, 3) and np.isfinite(img).all()
    assert (img >= 0).all() and (img <= 1).all()
    cover = (wsum > 0.5).mean()
    assert 0.005 < cover < 0.9, cover


def test_fit_light_recovers_photometric_target():
    """Self-consistency: frames rendered with a known texture/light must be
    reproduced by fit_light starting from zeros (photometric loss ~ 0)."""
    model = _synthetic_model(texture=True)
    F = 3
    rng = np.random.default_rng(4)
    true = _photo_params(model, F, rng)
    frames, _ = render_photometric(model, true, (64.0, 64.0), 128, 128,
                                   scale=0.5)
    start = dict(true)
    del start["tex"], start["gamma"]
    out = fit_light(model, frames, (64.0, 64.0), start, scale=0.5,
                    iters=150, lr=0.05, reg_tex=0.0)
    assert out["photo_loss"] < 5e-4, out["photo_loss"]


def test_fine_fit_with_photometric_term_improves_pose():
    model = _synthetic_model(texture=True)
    F = 2
    rng = np.random.default_rng(5)
    true = _photo_params(model, F, rng)
    cxy = (64.0, 64.0)
    frames, _ = render_photometric(model, true, cxy, 128, 128, scale=0.5)
    lands = model.landmarks_3d(
        jnp.broadcast_to(true["id"], (F, 8)), true["exp"], true["euler"],
        true["trans"], true["focal"], cxy)
    gt_lms = forward_transform(lands, true["euler"], true["trans"],
                               true["focal"], cxy)[..., :2]
    start = dict(true)
    start["euler"] = true["euler"] + 0.02
    start["trans"] = true["trans"] + jnp.asarray([0.05, -0.05, 0.0])

    def reproj_err(p):
        lp = model.landmarks_3d(
            jnp.broadcast_to(p["id"], (F, 8)), p["exp"], p["euler"],
            p["trans"], p["focal"], cxy)
        pr = forward_transform(lp, p["euler"], p["trans"], p["focal"],
                               cxy)[..., :2]
        return float(jnp.sqrt(jnp.mean((pr[:, 17:] - gt_lms[:, 17:]) ** 2)))

    err0 = reproj_err(start)
    out = fit_fine(model, gt_lms, cxy, dict(start), iters=150, lap_w=0.0,
                   photo_frames=frames, photo_scale=0.5, photo_w=0.5,
                   save_every=150)
    err1 = reproj_err(out)
    assert err1 < err0, (err0, err1)


def test_fine_fit_resume(tmp_path):
    model = _synthetic_model()
    F = 5
    cxy = (128.0, 128.0)
    gt_lms = jnp.asarray(
        np.random.default_rng(2).uniform(40, 210, (F, 68, 2)), jnp.float32)
    params = {
        "id": jnp.zeros((1, 8)), "exp": jnp.zeros((F, 6)),
        "euler": jnp.zeros((F, 3)),
        "trans": jnp.zeros((F, 3)).at[:, 2].add(-7.0),
        "focal": jnp.float32(800.0),
    }
    resume = str(tmp_path / "iter.npz")
    out = fit_fine(model, gt_lms, cxy, dict(params), iters=20,
                   resume_path=resume, save_every=10)
    assert (tmp_path / "iter.npz").exists()
    # resuming restores from the checkpoint instead of the passed params
    out2 = fit_fine(model, gt_lms, cxy, dict(params), iters=0 + 10,
                    resume_path=resume, save_every=10)
    assert np.isfinite(np.asarray(out2["euler"])).all()


def test_splat_depth_weighting_occludes_back_surface():
    """Soft z-buffer (round-2 review item 7): two co-projected front-facing
    surfaces — with depth weighting the nearer one wins the pixel; without
    it (facing weights only, the old behavior) they blend ~50/50."""
    B, n = 1, 400
    rng = np.random.default_rng(0)
    xy = rng.uniform(10, 22, (n, 2)).astype(np.float32)
    proj = jnp.asarray(np.tile(xy, (2, 1))[None])          # both sheets
    colors = jnp.asarray(np.concatenate(
        [np.tile([[1.0, 0.0, 0.0]], (n, 1)),               # near sheet: red
         np.tile([[0.0, 1.0, 0.0]], (n, 1))])[None])       # far sheet: green
    weights = jnp.ones((B, 2 * n))
    depth = jnp.asarray(np.concatenate(
        [np.full(n, 5.0), np.full(n, 6.0)])[None])

    img_occ, ws = splat_render(proj, colors, weights, 32, 32,
                               depth=depth, depth_tau=jnp.asarray(0.05))
    img_blend, _ = splat_render(proj, colors, weights, 32, 32)
    covered = np.asarray(ws[0]) > 0.5
    red_occ = np.asarray(img_occ[0])[covered]
    red_blend = np.asarray(img_blend[0])[covered]
    # occluded render is (almost) pure near-sheet red
    assert red_occ[:, 0].mean() > 0.98 and red_occ[:, 1].mean() < 0.02
    # the un-depth-weighted splat blends the two sheets
    assert 0.3 < red_blend[:, 1].mean() < 0.7


def _two_layer_model(seed=0):
    """Non-convex fixture: the paraboloid 'face' plus a second sheet 0.8
    behind it with the same +z winding — front-facing but occluded, the
    case facing weights alone cannot express."""
    import dataclasses

    m = _synthetic_model(texture=True, seed=seed)
    n = m.mu.shape[0] // 3
    mu = np.asarray(m.mu).reshape(n, 3)
    back = mu.copy()
    back[:, 2] -= 0.8
    mu2 = np.concatenate([mu, back]).reshape(-1)
    dup = lambda b: jnp.asarray(np.tile(np.asarray(b).reshape(-1, n, 3),
                                        (1, 2, 1)).reshape(b.shape[0], -1))
    tris2 = np.concatenate([np.asarray(m.tris), np.asarray(m.tris) + n])
    rng = np.random.default_rng(seed + 7)
    return dataclasses.replace(
        m, mu=jnp.asarray(mu2, jnp.float32),
        base_id=dup(m.base_id), base_exp=dup(m.base_exp),
        base_tex=dup(m.base_tex),
        mu_tex=jnp.asarray(rng.uniform(80, 200, 2 * n * 3), jnp.float32),
        tris=tris2)


def test_fit_light_closure_with_occlusion():
    """Synthetic-BFM closure on a self-occluding model: frames rendered
    with the depth-weighted splat from known texture/light must be
    recovered by fit_light from scratch (the soft z-buffer keeps the
    photometric optimization self-consistent and differentiable)."""
    model = _two_layer_model()
    F = 2
    rng = np.random.default_rng(5)
    true = _photo_params(model, F, rng)
    frames, _ = render_photometric(model, true, (64.0, 64.0), 128, 128,
                                   scale=0.5)
    start = dict(true)
    del start["tex"], start["gamma"]
    out = fit_light(model, frames, (64.0, 64.0), start, scale=0.5,
                    iters=200, lr=0.05, reg_tex=0.0)
    assert out["photo_loss"] < 1e-3, out["photo_loss"]
