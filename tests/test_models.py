"""Model-shape and semantics tests (reference dims from network.py:97-167)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lzzx_nerf_tpu.models import AudioAttNet, AudioNet, NeRFField, TorsoField


@pytest.fixture(scope="module")
def field_and_params():
    field = NeRFField(audio_in_dim=29, att=2, exp_eye=True, ind_dim=4)
    x = jax.random.normal(jax.random.PRNGKey(0), (16, 3)) * 0.3
    d = x / jnp.linalg.norm(x, axis=-1, keepdims=True)
    auds = jax.random.normal(jax.random.PRNGKey(1), (8, 16, 29))
    params = field.init(jax.random.PRNGKey(2), x, d, auds, jnp.zeros(4),
                        jnp.asarray([0.25]), method="init_all")
    return field, params


def test_audio_net_shapes():
    net = AudioNet(dim_aud=32)
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 16, 29))
    p = net.init(jax.random.PRNGKey(1), x)
    out = net.apply(p, x)
    assert out.shape == (8, 32)


def test_audio_att_net_is_convex_combination():
    net = AudioAttNet(dim_aud=32, seq_len=8)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 32))
    p = net.init(jax.random.PRNGKey(1), x)
    out = net.apply(p, x)
    assert out.shape == (1, 32)
    # attention weights softmax to 1 => output within per-dim min/max envelope
    lo, hi = np.asarray(x.min(1)), np.asarray(x.max(1))
    o = np.asarray(out)
    assert np.all(o >= lo - 1e-5) and np.all(o <= hi + 1e-5)


def test_field_output_shapes_and_ranges(field_and_params):
    field, params = field_and_params
    x = jax.random.normal(jax.random.PRNGKey(3), (64, 3)) * 0.3
    d = x / jnp.linalg.norm(x, axis=-1, keepdims=True)
    auds = jax.random.normal(jax.random.PRNGKey(4), (8, 16, 29))
    enc_a = field.apply(params, auds, method="encode_audio")
    assert enc_a.shape == (1, 32)

    out = field.apply(params, x, d, enc_a, jnp.zeros(4), jnp.asarray([0.25]))
    assert out.sigma.shape == (64,)
    assert out.color.shape == (64, 3)
    assert np.all(np.asarray(out.sigma) > 0)          # exp activation
    assert np.all(np.asarray(out.color) >= -0.001 - 1e-6)
    assert np.all(np.asarray(out.color) <= 1.001 + 1e-6)
    assert np.all(np.asarray(out.ambient_eye) >= 0)   # sigmoid
    assert np.all(np.asarray(out.ambient_eye) <= 1)
    assert np.all(np.asarray(out.uncertainty) >= 0)   # softplus
    assert np.all(np.asarray(out.ambient_aud) >= 0)   # norm


def test_field_feature_dims(field_and_params):
    field, params = field_and_params
    x = jax.random.normal(jax.random.PRNGKey(5), (4, 3)) * 0.3
    enc_x = field.apply(params, x, method="encode_x")
    assert enc_x.shape == (4, 36)  # 3 planes x 12 levels x 1 ch


def test_uncertainty_detached_from_encoder(field_and_params):
    """unc_net must see a stop-gradient encoding (network.py:247): the grid
    tables get NO gradient from an uncertainty-only loss."""
    field, params = field_and_params
    x = jax.random.normal(jax.random.PRNGKey(6), (8, 3)) * 0.3
    d = x / jnp.linalg.norm(x, axis=-1, keepdims=True)
    enc_a = jnp.zeros((1, 32))

    def unc_loss(p):
        out = field.apply(p, x, d, enc_a, jnp.zeros(4), jnp.asarray([0.2]))
        return out.uncertainty.sum()

    g = jax.grad(unc_loss)(params)
    gp = g["params"]
    enc_keys = [k for k in gp if k.startswith("encoder_")]
    assert enc_keys
    for k in enc_keys:
        assert np.all(np.asarray(gp[k]) == 0), k
    # but the unc_net itself does receive gradient
    unc_g = jax.tree.leaves(gp["unc_net"])
    assert any(np.any(np.asarray(t) != 0) for t in unc_g)


def test_torso_field(field_and_params):
    torso = TorsoField(ind_dim_torso=8)
    x = jax.random.uniform(jax.random.PRNGKey(7), (32, 2), minval=-1, maxval=1)
    pose = jnp.eye(4)
    p = torso.init(jax.random.PRNGKey(8), x, pose, jnp.zeros(8))
    alpha, color, dx = torso.apply(p, x, pose, jnp.zeros(8))
    assert alpha.shape == (32, 1) and color.shape == (32, 3) and dx.shape == (32, 2)
    assert np.all(np.asarray(alpha) >= -0.001 - 1e-6)
    assert np.all(np.asarray(alpha) <= 1.001 + 1e-6)


def test_ambient_aud_gradient_finite_at_dead_attention():
    """d||x||/dx at x=0 is nan in JAX (torch special-cases it): with the
    aud_ch_att MLP forced to output EXACTLY zero (fully dead layer — the
    state the ambient-audio loss drives non-face regions toward), the
    gradient through ambient_aud must stay finite (regression: this NaN'd
    the grid-128 production training run at ~step 320, 0*nan poisoning
    aud_ch_att's update even though the zero rows were masked)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from lzzx_nerf_tpu.models import NeRFField

    field = NeRFField(audio_in_dim=29, encoder="dense", ind_num=8)
    auds = jnp.zeros((8, 16, 29))
    params = field.init(jax.random.PRNGKey(0), jnp.zeros((4, 3)),
                        jnp.ones((4, 3)) / 3 ** 0.5, auds, jnp.zeros(4),
                        jnp.asarray([0.25]), method="init_all")
    # kill the attention head: output == 0 for every input
    p = jax.tree.map(lambda x: x, params)
    p["params"]["aud_ch_att_net"]["net_1"]["kernel"] = jnp.zeros_like(
        p["params"]["aud_ch_att_net"]["net_1"]["kernel"])

    x = jnp.asarray(np.random.default_rng(0).uniform(-0.5, 0.5, (16, 3)),
                    jnp.float32)
    d = x / jnp.linalg.norm(x, axis=-1, keepdims=True)
    enc_a = jnp.ones((1, 32))

    def loss(params):
        out = field.apply(params, x, d, enc_a, jnp.zeros(4),
                          jnp.asarray([0.25]))
        # amb_aud feeds the loss both directly and via a masked (zero
        # weight) term — the 0*nan path
        return jnp.sum(out.ambient_aud) + jnp.sum(out.ambient_aud * 0.0) \
            + jnp.sum(out.sigma * 1e-6)

    g = jax.grad(loss)(p)
    assert all(np.isfinite(np.asarray(l)).all() for l in jax.tree.leaves(g))
