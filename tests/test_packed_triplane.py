"""Dense nested-octave triplane: packed lookup must exactly match the direct
per-corner bilinear evaluation, gradients must flow to every level."""

import jax
import jax.numpy as jnp
import numpy as np

from lzzx_nerf_tpu.ops.packed_triplane import (
    DenseTriplaneSpec, bake_packed, dense_triplane_encode, init_dense_planes,
    packed_lookup, reference_dense_encode)


import pytest as _pytest

SPEC = DenseTriplaneSpec(resolutions=(8, 16, 32), channels=(3, 2, 2),
                         pack_shift=0)
SPEC1 = DenseTriplaneSpec(resolutions=(8, 16, 32), channels=(3, 2, 2),
                          pack_shift=1)


@_pytest.mark.parametrize("spec", [SPEC, SPEC1])
def test_packed_matches_direct_bilinear(spec):
    levels = init_dense_planes(jax.random.PRNGKey(0), spec, scale=1.0)
    xy01 = jax.random.uniform(jax.random.PRNGKey(1), (257, 2))
    # include exact boundary and near-boundary points
    xy01 = jnp.concatenate(
        [xy01, jnp.asarray([[0.0, 0.0], [1.0, 1.0], [0.999999, 0.5],
                            [0.5, 1.0]])])
    packed = bake_packed(levels, spec)
    assert packed.shape == (spec.pack_res ** 2, spec.packed_dim)
    got = packed_lookup(packed, xy01, spec)
    want = reference_dense_encode(levels, xy01, spec)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_edges_and_oob():
    levels = init_dense_planes(jax.random.PRNGKey(2), SPEC, scale=1.0)
    packed = bake_packed(levels, SPEC)
    # exact corners 0 and 1 hit grid endpoints
    xy = jnp.asarray([[0.0, 0.0], [1.0, 1.0], [0.0, 1.0]])
    got = packed_lookup(packed, xy, SPEC)
    want = jnp.concatenate(
        [jnp.stack([A[0, 0], A[-1, -1], A[0, -1]]) for A in levels], -1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)
    # OOB -> zeros
    oob = packed_lookup(packed, jnp.asarray([[1.5, 0.2], [-0.1, 0.5]]), SPEC)
    assert np.all(np.asarray(oob) == 0.0)


def test_gradients_reach_all_levels():
    levels = init_dense_planes(jax.random.PRNGKey(3), SPEC)
    xy = jax.random.uniform(jax.random.PRNGKey(4), (64, 2), minval=-0.9,
                            maxval=0.9)

    def loss(levels):
        return dense_triplane_encode(levels, xy, SPEC, bound=1.0).sum()

    grads = jax.grad(loss)(levels)
    for g, r in zip(grads, SPEC.resolutions):
        assert np.any(np.asarray(g) != 0.0), f"no grad at res {r}"
        assert np.all(np.isfinite(np.asarray(g)))


def test_gradient_matches_direct_path():
    """Grad through bake+gather must equal grad through the direct gather
    formulation (the bake transpose is a block-sum)."""
    levels = init_dense_planes(jax.random.PRNGKey(5), SPEC, scale=1.0)
    xy01 = jax.random.uniform(jax.random.PRNGKey(6), (50, 2))
    w = jax.random.normal(jax.random.PRNGKey(7), (50, SPEC.output_dim))

    g_packed = jax.grad(
        lambda ls: (packed_lookup(bake_packed(ls, SPEC), xy01, SPEC) * w).sum()
    )(levels)
    g_direct = jax.grad(
        lambda ls: (reference_dense_encode(ls, xy01, SPEC) * w).sum()
    )(levels)
    for a, b in zip(g_packed, g_direct):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_field_with_dense_encoder():
    from lzzx_nerf_tpu.models import NeRFField

    field = NeRFField(audio_in_dim=29, encoder="dense")
    x = jax.random.normal(jax.random.PRNGKey(0), (16, 3)) * 0.3
    d = x / jnp.linalg.norm(x, axis=-1, keepdims=True)
    auds = jnp.zeros((8, 16, 29))
    params = field.init(jax.random.PRNGKey(1), x, d, auds, jnp.zeros(4),
                        jnp.asarray([0.25]), method="init_all")
    assert "encoder_xy_l0" in params["params"]
    assert "encoder_xz_l3" in params["params"]
    enc = field.apply(params, x, method="encode_x")
    assert enc.shape == (16, 36)
    out = field.apply(params, x, d, jnp.zeros((1, 32)), jnp.zeros(4),
                      jnp.asarray([0.25]))
    assert np.all(np.isfinite(np.asarray(out.sigma)))


def test_optimizer_labels_dense_tables_as_grid():
    from lzzx_nerf_tpu.train.optim import param_label_fn
    from lzzx_nerf_tpu.models import NeRFField

    field = NeRFField(audio_in_dim=29, encoder="dense")
    x = jnp.zeros((4, 3))
    params = field.init(jax.random.PRNGKey(0), x,
                        jnp.ones((4, 3)) / 3 ** 0.5, jnp.zeros((8, 16, 29)),
                        jnp.zeros(4), jnp.asarray([0.2]), method="init_all")
    labels = jax.tree_util.tree_map_with_path(param_label_fn,
                                              params["params"])
    flat = jax.tree_util.tree_flatten_with_path(labels)[0]
    seen = {}
    for path, lab in flat:
        seen[str(getattr(path[0], "key", path[0]))] = lab
    assert seen["encoder_xy_l0"] == "grid"
    assert seen["encoder_xz_l3"] == "grid"
    assert seen["sigma_net"] == "net"


def test_prebaked_tables_match_in_graph_path():
    """field.bake_tables + encode_x(packed=...) must equal the in-graph
    bake exactly (the serving fast path vs the training path)."""
    from lzzx_nerf_tpu.models import NeRFField

    field = NeRFField(audio_in_dim=29, encoder="dense")
    x = jax.random.normal(jax.random.PRNGKey(0), (64, 3)) * 0.4
    params = field.init(jax.random.PRNGKey(1), x,
                        x / jnp.linalg.norm(x, axis=-1, keepdims=True),
                        jnp.zeros((8, 16, 29)), jnp.zeros(4),
                        jnp.asarray([0.2]), method="init_all")
    packed = field.apply(params, method="bake_tables")
    assert set(packed) == {"xy", "yz", "xz"}
    a = field.apply(params, x, method="encode_x")
    b = field.apply(params, x, packed, method="encode_x")
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_bf16_tables_close_and_pack_shift2():
    """bf16 serving tables (VMEM-resident fast path) must track the fp32
    bake within bf16 precision, for both pack layouts."""
    from lzzx_nerf_tpu.ops.packed_triplane import (DenseTriplaneSpec,
                                                   bake_packed,
                                                   packed_lookup)

    rng = jax.random.PRNGKey(3)
    u = jax.random.uniform(jax.random.PRNGKey(4), (512, 2))
    for shift in (1, 2):
        spec = DenseTriplaneSpec(pack_shift=shift)
        # O(1)-magnitude levels so the relative bf16 error is visible
        levels = [jax.random.normal(k, (r + 1, r + 1, c))
                  for k, r, c in zip(jax.random.split(rng, 4),
                                     spec.resolutions, spec.channels)]
        t32 = bake_packed(levels, spec, dtype=jnp.float32)
        t16 = bake_packed(levels, spec, dtype=jnp.bfloat16)
        assert t16.dtype == jnp.bfloat16
        a = np.asarray(packed_lookup(t32, u, spec))
        b = np.asarray(packed_lookup(t16, u, spec))
        # bf16 mantissa: 8 bits -> ~0.4% relative
        np.testing.assert_allclose(b, a, atol=2e-2, rtol=1e-2)


@_pytest.mark.parametrize("spec", [SPEC, SPEC1,
                                   DenseTriplaneSpec(
                                       resolutions=(8, 16, 32),
                                       channels=(3, 2, 2), pack_shift=2)])
def test_mxu_lookup_matches_packed_lookup(spec):
    """packed_lookup_mxu (wide-row weight-vector formulation) must match the
    narrow-slice packed_lookup to float tolerance, boundaries and OOB
    included."""
    from lzzx_nerf_tpu.ops.packed_triplane import packed_lookup_mxu

    levels = init_dense_planes(jax.random.PRNGKey(3), spec, scale=1.0)
    packed = bake_packed(levels, spec)
    xy01 = jax.random.uniform(jax.random.PRNGKey(4), (513, 2),
                              minval=-0.1, maxval=1.1)
    xy01 = jnp.concatenate(
        [xy01, jnp.asarray([[0.0, 0.0], [1.0, 1.0], [0.999999, 0.5],
                            [0.5, 1.0], [1.0, 0.0]])])
    got = packed_lookup_mxu(packed, xy01, spec)
    want = packed_lookup(packed, xy01, spec)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)
    ref = reference_dense_encode(levels, jnp.clip(xy01, 0, 1), spec)
    inb = np.all((np.asarray(xy01) >= 0) & (np.asarray(xy01) <= 1), -1)
    np.testing.assert_allclose(np.asarray(got)[inb], np.asarray(ref)[inb],
                               rtol=1e-5, atol=1e-6)


def test_mxu_lookup_default_spec_bf16_rows():
    """The serving configuration: default spec, bf16 table rows."""
    from lzzx_nerf_tpu.ops.packed_triplane import packed_lookup_mxu

    spec = DenseTriplaneSpec()
    levels = init_dense_planes(jax.random.PRNGKey(5), spec, scale=1.0)
    packed = bake_packed(levels, spec, dtype=jnp.bfloat16)
    xy01 = jax.random.uniform(jax.random.PRNGKey(6), (64, 2))
    got = packed_lookup_mxu(packed, xy01, spec)
    want = packed_lookup(packed, xy01, spec)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)
