"""Parity of the fused Pallas field kernel (ops/fused_field.py) against the
flax NeRFField forward it replaces on the serving hot path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lzzx_nerf_tpu.models.nerf import NeRFField
from lzzx_nerf_tpu.ops.fused_field import (extract_field_weights,
                                           fold_frame_weights,
                                           fused_field_eval,
                                           fused_field_eval_reference)


@pytest.fixture(scope="module")
def field_and_params():
    field = NeRFField(bound=1.0, encoder="dense")
    key = jax.random.PRNGKey(0)
    x = jnp.zeros((4, 3))
    d = jnp.ones((4, 3)) / np.sqrt(3.0)
    auds = jnp.zeros((8, 2, 1024))
    c = jnp.zeros((4,))
    e = jnp.zeros((1,))
    params = field.init(key, x, d, auds, c, e, method="init_all")
    return field, params


def _inputs(n=257, seed=1):
    key = jax.random.PRNGKey(seed)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    pts = jax.random.uniform(k1, (n, 3), minval=-0.9, maxval=0.9)
    d = jax.random.normal(k2, (n, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    enc_a = jax.random.normal(k3, (1, 32)) * 0.3
    ind = jax.random.normal(k4, (4,)) * 0.1
    eye = jnp.asarray([0.25])
    return pts, d, enc_a, ind, eye


def test_reference_decomposition_matches_flax(field_and_params):
    """The folded-weight decomposition (K-split matmuls, SH rank-1 updates,
    per-frame constant folding) reproduces NeRFField.apply exactly."""
    field, params = field_and_params
    pts, d, enc_a, ind, eye = _inputs()
    out = field.apply(params, pts, d, enc_a, ind, eye,
                      compute_uncertainty=False)

    w = extract_field_weights(params)
    fw = fold_frame_weights(w, enc_a, ind, eye)
    enc_x = field.apply(params, pts, method="encode_x")
    sigma, color = fused_field_eval_reference(fw, enc_x, d)
    np.testing.assert_allclose(sigma, out.sigma, rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(color, out.color, rtol=2e-5, atol=1e-6)


def test_kernel_matches_reference(field_and_params):
    """The Pallas kernel (interpret mode on CPU) matches the jnp reference,
    including the N -> tile-multiple padding path."""
    field, params = field_and_params
    pts, d, enc_a, ind, eye = _inputs(n=300, seed=2)
    w = extract_field_weights(params)
    fw = fold_frame_weights(w, enc_a, ind, eye)
    enc_x = field.apply(params, pts, method="encode_x")

    sig_ref, col_ref = fused_field_eval_reference(fw, enc_x, d)
    sigma, color = fused_field_eval(fw, enc_x, d, tile=128)
    assert sigma.shape == (300,) and color.shape == (300, 3)
    np.testing.assert_allclose(sigma, sig_ref, rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(color, col_ref, rtol=2e-5, atol=1e-6)


def test_fused_apply_through_render_path(field_and_params):
    """make_fused_apply slots into render_rays_compact (the serving path)
    and reproduces the flax-apply image."""
    from lzzx_nerf_tpu.models.nerf import make_fused_apply
    from lzzx_nerf_tpu.render import (RenderSettings, init_occupancy_state,
                                      render_rays_compact)

    field, params = field_and_params
    grid = 32
    settings = RenderSettings(bound=1.0, cascade=1, grid_size=grid,
                              max_steps=8, dt=2 * 3.0 ** 0.5 / grid,
                              num_cand=112)
    state = init_occupancy_state(settings)
    r = jnp.linspace(-1, 1, grid)
    X, Y, Z = jnp.meshgrid(r, r, r, indexing="ij")
    state = state._replace(occ=(jnp.sqrt(X**2 + Y**2 + Z**2) < 0.5)[None])

    n = 128
    key = jax.random.PRNGKey(7)
    d = jax.random.normal(key, (n, 3)) * jnp.asarray([0.15, 0.15, 1.0])
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    o = jnp.tile(jnp.asarray([[0.0, 0.0, -2.5]]), (n, 1))
    enc_a = jax.random.normal(jax.random.PRNGKey(8), (1, 32)) * 0.3
    ind = jnp.zeros((4,))
    eye = jnp.asarray([0.25])
    bg = jnp.full((n, 3), 0.7)

    packed = field.apply(params, method="bake_tables")
    kw = dict(budget=128, window_candidates=40, minimal=True,
              stage_split=4, stage2_budget=64)

    def apply_packed(p, *a, **kws):
        return field.apply(p, *a, packed=packed, **kws)

    ref = render_rays_compact(apply_packed, params, settings, state, o, d,
                              enc_a, ind, eye, bg, **kw)
    fused = render_rays_compact(make_fused_apply(field, packed), params,
                                settings, state, o, d, enc_a, ind, eye, bg,
                                **kw)
    np.testing.assert_allclose(np.asarray(fused["image"]),
                               np.asarray(ref["image"]), atol=3e-5)
    np.testing.assert_allclose(np.asarray(fused["weights_sum"]),
                               np.asarray(ref["weights_sum"]), atol=3e-5)


def test_kernel_no_eye_no_ind(field_and_params):
    """eye=None / ind_code=None fold to zero contributions, matching the
    flax path called with zeros (the serving session always passes both, but
    the fold must be well-defined without them)."""
    field, params = field_and_params
    pts, d, enc_a, _, _ = _inputs(n=64, seed=3)
    w = extract_field_weights(params)
    fw = fold_frame_weights(w, enc_a, None, None)
    enc_x = field.apply(params, pts, method="encode_x")
    sigma, color = fused_field_eval(fw, enc_x, d, tile=64)

    out = field.apply(params, pts, d, enc_a, jnp.zeros((4,)),
                      jnp.zeros((1,)), compute_uncertainty=False)
    np.testing.assert_allclose(sigma, out.sigma, rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(color, out.color, rtol=2e-5, atol=1e-6)
