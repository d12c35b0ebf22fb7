"""3DMM tracker: with a synthetic morphable model and landmarks generated
from known pose parameters, the landmark fit must recover the pose."""

import numpy as np
import pytest

import jax.numpy as jnp

from lzzx_nerf_tpu.preprocess.face_tracking import (
    Face3DMM, euler2rot, fit_coarse, fit_fine, forward_transform)


def _synthetic_model(n_verts=120, id_dim=8, exp_dim=6, seed=0):
    rng = np.random.default_rng(seed)
    # a face-ish blob of 3D points with small id/exp bases
    mu = rng.uniform(-1, 1, (n_verts, 3))
    mu[:, 2] *= 0.5
    mu -= mu.mean(0)
    keyinds = rng.choice(n_verts, 68, replace=False)
    left = rng.choice(n_verts, (8, 5))
    right = rng.choice(n_verts, (8, 5))
    return Face3DMM(
        base_id=jnp.asarray(rng.standard_normal((id_dim, n_verts * 3)) * 1e-3,
                            jnp.float32),
        base_exp=jnp.asarray(rng.standard_normal((exp_dim, n_verts * 3)) * 1e-3,
                             jnp.float32),
        mu=jnp.asarray(mu.reshape(-1), jnp.float32),
        sig_id=jnp.ones(id_dim, jnp.float32),
        sig_exp=jnp.ones(exp_dim, jnp.float32),
        keyinds=keyinds, left_contour=left, right_contour=right,
    )


def test_euler2rot_orthonormal():
    e = jnp.asarray([[0.1, -0.2, 0.3], [0.0, 0.0, 0.0]])
    R = np.asarray(euler2rot(e))
    np.testing.assert_allclose(R[1], np.eye(3), atol=1e-6)
    np.testing.assert_allclose(R[0] @ R[0].T, np.eye(3), atol=1e-5)


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
