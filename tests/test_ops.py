"""Golden-parity tests of the TPU-native ops vs NumPy transcriptions of the
reference CUDA kernel math (BASELINE config #2: encoder fwd+bwd parity)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lzzx_nerf_tpu import ops
from lzzx_nerf_tpu.ops.grid import make_grid_spec, grid_encode, init_grid_embeddings
from lzzx_nerf_tpu.ops.march import marching_dt, num_candidates, march_rays_uniform

import golden


# ---------- frequency encoder ----------

def test_freq_encode_matches_golden():
    rng = np.random.default_rng(0)
    for D, deg in [(2, 8), (6, 3), (3, 4)]:
        x = rng.standard_normal((17, D)).astype(np.float32)
        got = np.asarray(ops.freq_encode(jnp.asarray(x), deg))
        want = golden.golden_freq(x.astype(np.float64), deg)
        assert got.shape == (17, ops.freq_output_dim(D, deg))
        np.testing.assert_allclose(got, want, atol=1e-5)


def test_freq_encode_grad_finite():
    x = jnp.asarray(np.random.default_rng(1).standard_normal((5, 2)), jnp.float32)
    g = jax.grad(lambda v: ops.freq_encode(v, 8).sum())(x)
    assert np.all(np.isfinite(np.asarray(g)))


# ---------- spherical harmonics ----------

def test_sh_encode_matches_golden():
    rng = np.random.default_rng(2)
    d = rng.standard_normal((64, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    got = np.asarray(ops.sh_encode(jnp.asarray(d, jnp.float32), 4))
    want = golden.golden_sh4(d)
    np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.parametrize("degree", [1, 2, 3, 4, 5, 6, 7, 8])
def test_sh_degrees(degree):
    d = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
    out = ops.sh_encode(d, degree)
    assert out.shape == (1, degree * degree)


@pytest.mark.parametrize("degree", [4, 5, 6, 7, 8])
def test_sh_orthonormality(degree):
    """Monte-Carlo Gram matrix over the sphere must be the identity:
    an independent check of every normalisation constant and polynomial in
    the degree-5..8 extension (shencoder.cu:28-123 envelope) — a typo in
    any coefficient or term breaks a whole row/column."""
    rng = np.random.default_rng(0)
    d = rng.standard_normal((200_000, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    Y = np.asarray(ops.sh_encode(jnp.asarray(d, jnp.float64), degree))
    gram = 4.0 * np.pi * (Y.T @ Y) / len(d)
    np.testing.assert_allclose(gram, np.eye(degree * degree),
                               atol=5e-2)


def test_sh_high_degree_golden_values():
    """Spot goldens transcribed from the CUDA kernel's closed forms
    (shencoder.cu:74-123): output index / direction / value triples."""
    inv = 1.0 / np.sqrt(3.0)
    dirs = np.array([[0.0, 0.0, 1.0],
                     [1.0, 0.0, 0.0],
                     [inv, inv, inv]], np.float64)
    Y = np.asarray(ops.sh_encode(jnp.asarray(dirs), 8))
    x = y = z = inv
    x2 = y2 = z2 = 1.0 / 3.0
    x4 = y4 = z4 = 1.0 / 9.0
    x6 = y6 = z6 = 1.0 / 27.0
    # l=4, m=0 at +z: 3*(-30z2+35z4+3)/(16 sqrt(pi)) with z=1
    assert abs(Y[0, 20] - (-3.1735664074561294 + 3.7024941420321507
                           + 0.31735664074561293)) < 1e-6
    # l=6, m=0 at +z
    assert abs(Y[0, 42] - (6.6747662381009842 - 20.024298714302954
                           + 14.684485723822165 - 0.31784601133814211)) < 1e-6
    # l=8 (degree 8) m=0 at +z: outputs[56]
    assert abs(Y[0, 56] - 0.068284276912004949 * (315.0 - 693.0 + 429.0
                                                  - 35.0)) < 1e-6
    # l=4, m=4 at +x: outputs[24] = 3 sqrt(35) x4 /(16 sqrt(pi))
    assert abs(Y[1, 24] - 0.62583573544917614) < 1e-6
    # l=6 sectoral at +x: outputs[48] = sqrt(6006) x6 / (64 sqrt(pi))
    assert abs(Y[1, 48] - 0.6831841051919143) < 1e-6
    # diagonal direction, a mixed term: outputs[26] = 3 sqrt(385) xyz(x2-y2)
    assert abs(Y[2, 26] - 8.3026492595241645 * x * y * z * (x2 - y2)) < 1e-6
    # outputs[54] = 3 sqrt(70) xyz (-110 z2 + 143 z4 + 15)/(32 sqrt(pi))
    want = 0.44253269244498261 * x * y * z * (-110.0 * z2 + 143.0 * z4 + 15.0)
    assert abs(Y[2, 54] - want) < 1e-6
    # outputs[63] (l=7 sectoral) at the diagonal
    want = 0.70716273252459627 * x * (-35.0 * x2 * y4 + 21.0 * x4 * y2
                                      - x6 + 7.0 * y6)
    assert abs(Y[2, 63] - want) < 1e-6


# ---------- hash / tiled grid encoder ----------

TRIPLANE = dict(input_dim=2, num_levels=12, level_dim=1, base_resolution=64,
                log2_hashmap_size=14, desired_resolution=512)
TORSO_TILED = dict(input_dim=2, num_levels=16, level_dim=2, base_resolution=16,
                   log2_hashmap_size=16, desired_resolution=2048, gridtype="tiled")


@pytest.mark.parametrize("cfg", [TRIPLANE, TORSO_TILED,
                                 dict(input_dim=3, num_levels=8, level_dim=2,
                                      base_resolution=16, log2_hashmap_size=12,
                                      desired_resolution=256)])
def test_grid_encode_matches_golden(cfg):
    spec = make_grid_spec(**cfg)
    off = golden.golden_grid_offsets(
        spec.input_dim, spec.num_levels, spec.per_level_scale,
        spec.base_resolution, spec.log2_hashmap_size, spec.align_corners)
    assert list(spec.offsets) == off

    rng = np.random.default_rng(3)
    table = rng.standard_normal((spec.total_params, spec.level_dim)).astype(np.float32)
    x = rng.uniform(-1, 1, size=(33, spec.input_dim)).astype(np.float32)
    x[0] = 2.5  # OOB row -> zeros

    got = np.asarray(grid_encode(jnp.asarray(x), jnp.asarray(table), spec, bound=1.0))
    x01 = (x.astype(np.float64) + 1.0) / 2.0
    want = golden.golden_grid_encode(
        x01, table.astype(np.float64), off, spec.per_level_scale,
        spec.base_resolution, spec.gridtype, spec.align_corners)
    np.testing.assert_allclose(got, want, atol=2e-4)
    assert np.all(got[0] == 0.0)  # OOB -> zero


def test_grid_encode_backward_scatters_correctly():
    """Backward = transpose-of-gather: the table gradient must equal the sum of
    interpolation weights routed to each queried row (replaces atomicAdd)."""
    spec = make_grid_spec(input_dim=2, num_levels=2, level_dim=1,
                          base_resolution=4, log2_hashmap_size=4,
                          per_level_scale=2.0)
    key = jax.random.PRNGKey(0)
    table = init_grid_embeddings(key, spec)
    x = jax.random.uniform(jax.random.PRNGKey(1), (50, 2), minval=-1, maxval=1)

    def loss(tbl):
        return grid_encode(x, tbl, spec).sum()

    g = jax.grad(loss)(table)
    # finite-difference check on a handful of rows
    eps = 1e-3
    base = loss(table)
    rng = np.random.default_rng(0)
    for row in rng.choice(spec.total_params, size=5, replace=False):
        bumped = table.at[row, 0].add(eps)
        fd = (loss(bumped) - base) / eps
        np.testing.assert_allclose(np.asarray(g)[row, 0], np.asarray(fd),
                                   rtol=0.05, atol=1e-3)


def test_grid_encode_input_gradients():
    """Input grads flow through the lerp weights (analytic dy_dx equivalent)."""
    spec = make_grid_spec(**TRIPLANE)
    table = init_grid_embeddings(jax.random.PRNGKey(0), spec)
    x = jax.random.uniform(jax.random.PRNGKey(1), (8, 2), minval=-0.9, maxval=0.9)
    g = jax.grad(lambda v: grid_encode(v, table, spec).sum())(x)
    assert np.all(np.isfinite(np.asarray(g)))
    assert np.any(np.asarray(g) != 0.0)


# ---------- morton / packbits / dilation ----------

def test_morton3d_roundtrip_and_golden():
    rng = np.random.default_rng(4)
    coords = rng.integers(0, 128, size=(100, 3)).astype(np.int32)
    codes = np.asarray(ops.morton3d(jnp.asarray(coords)))
    for i in range(10):
        assert codes[i] == golden.golden_morton3d(*coords[i])
    back = np.asarray(ops.morton3d_invert(jnp.asarray(codes)))
    np.testing.assert_array_equal(back, coords)


def test_packbits_roundtrip():
    rng = np.random.default_rng(5)
    grid = rng.uniform(0, 20, size=(2, 16 ** 3)).astype(np.float32)
    bf = ops.packbits(jnp.asarray(grid), 10.0)
    assert bf.dtype == jnp.uint8 and bf.shape == (2 * 16 ** 3 // 8,)
    unpacked = np.asarray(ops.unpack_bitfield(bf))
    np.testing.assert_array_equal(unpacked, (grid.reshape(-1) > 10.0))


def test_dilate_grid3d_is_6_neighbour_max():
    rng = np.random.default_rng(6)
    g = rng.standard_normal((1, 8, 8, 8)).astype(np.float32)
    got = np.asarray(ops.dilate_grid3d(jnp.asarray(g)))[0]
    want = g[0].copy()
    H = 8
    for x in range(H):
        for y in range(H):
            for z in range(H):
                v = g[0, x, y, z]
                if x + 1 < H: v = max(v, g[0, x + 1, y, z])
                if x > 0:     v = max(v, g[0, x - 1, y, z])
                if y + 1 < H: v = max(v, g[0, x, y + 1, z])
                if y > 0:     v = max(v, g[0, x, y - 1, z])
                if z + 1 < H: v = max(v, g[0, x, y, z + 1])
                if z > 0:     v = max(v, g[0, x, y, z - 1])
                want[x, y, z] = v
    np.testing.assert_allclose(got, want)


# ---------- near/far ----------

def test_near_far_matches_golden():
    rng = np.random.default_rng(7)
    aabb = np.array([-1.0, -0.5, -1.0, 1.0, 0.5, 1.0], np.float32)
    o = rng.uniform(-3, 3, size=(200, 3)).astype(np.float32)
    d = rng.standard_normal((200, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    nears, fars = ops.near_far_from_aabb(jnp.asarray(o), jnp.asarray(d),
                                         jnp.asarray(aabb), 0.05)
    nears, fars = np.asarray(nears), np.asarray(fars)
    for i in range(200):
        wn, wf = golden.golden_near_far(o[i].astype(np.float64),
                                        d[i].astype(np.float64), aabb, 0.05)
        if wn > 1e37:
            assert nears[i] > 1e37 and fars[i] > 1e37
        else:
            np.testing.assert_allclose(nears[i], wn, rtol=1e-4, atol=1e-5)
            np.testing.assert_allclose(fars[i], wf, rtol=1e-4, atol=1e-5)


# ---------- march ----------

def test_march_uniform_matches_golden_sequential():
    rng = np.random.default_rng(8)
    bound, H, cascade, max_steps = 1.0, 32, 1, 16
    occ = (rng.uniform(size=(cascade, H, H, H)) < 0.15)
    aabb = np.array([-1, -0.5, -1, 1, 0.5, 1], np.float32)
    dt = marching_dt(bound, H, max_steps, cascade)
    K = num_candidates(aabb, 0.05, dt)

    N = 64
    o = np.tile(np.array([[0.0, 0.0, -2.5]], np.float32), (N, 1))
    d = rng.standard_normal((N, 3)).astype(np.float32)
    d[:, 2] = np.abs(d[:, 2]) + 0.5
    d /= np.linalg.norm(d, axis=-1, keepdims=True)

    nears, fars = ops.near_far_from_aabb(jnp.asarray(o), jnp.asarray(d),
                                         jnp.asarray(aabb), 0.05)
    res = march_rays_uniform(jnp.asarray(o), jnp.asarray(d), nears, fars,
                             jnp.asarray(occ), bound, dt, K, max_steps)
    xyzs, deltas, ts, mask = map(np.asarray, res)

    nears_np, fars_np = np.asarray(nears), np.asarray(fars)
    for i in range(N):
        want = golden.golden_march_uniform(
            o[i].astype(np.float64), d[i].astype(np.float64),
            float(nears_np[i]), float(fars_np[i]), occ, bound, dt, max_steps)
        n_want = len(want)
        assert int(mask[i].sum()) == n_want, f"ray {i}"
        for s in range(n_want):
            np.testing.assert_allclose(xyzs[i, s], want[s][0], atol=2e-4)
            np.testing.assert_allclose(ts[i, s], want[s][2], atol=2e-4)
            assert deltas[i, s] == np.float32(dt)


def test_march_mask_is_prefix():
    rng = np.random.default_rng(9)
    occ = (rng.uniform(size=(1, 16, 16, 16)) < 0.3)
    aabb = np.array([-1, -0.5, -1, 1, 0.5, 1], np.float32)
    dt = marching_dt(1.0, 16, 8, 1)
    K = num_candidates(aabb, 0.05, dt)
    o = jnp.asarray(rng.uniform(-2, 2, (32, 3)), jnp.float32)
    d = rng.standard_normal((32, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    nears, fars = ops.near_far_from_aabb(o, jnp.asarray(d), jnp.asarray(aabb), 0.05)
    res = march_rays_uniform(o, jnp.asarray(d), nears, fars, jnp.asarray(occ),
                             1.0, dt, K, 8)
    m = np.asarray(res.mask)
    # valid samples must be packed at the front of each row
    for row in m:
        seen_false = False
        for v in row:
            if not v:
                seen_false = True
            assert not (seen_false and v)


# ---------- composite ----------

def test_composite_matches_golden():
    rng = np.random.default_rng(10)
    N, S = 40, 16
    sigmas = rng.uniform(0, 30, (N, S)).astype(np.float32)
    rgbs = rng.uniform(0, 1, (N, S, 3)).astype(np.float32)
    amb_aud = rng.uniform(0, 1, (N, S)).astype(np.float32)
    amb_eye = rng.uniform(0, 1, (N, S)).astype(np.float32)
    unc = rng.uniform(0, 1, (N, S)).astype(np.float32)
    dt = 0.027
    deltas = np.full((N, S), dt, np.float32)
    ts = 0.5 + dt * np.arange(1, S + 1, dtype=np.float32)[None, :].repeat(N, 0)
    nvalid = rng.integers(0, S + 1, N)
    mask = np.arange(S)[None, :] < nvalid[:, None]
    deltas = deltas * mask

    res = ops.composite_rays(
        jnp.asarray(sigmas), jnp.asarray(rgbs), jnp.asarray(amb_aud),
        jnp.asarray(amb_eye), jnp.asarray(unc), jnp.asarray(deltas),
        jnp.asarray(ts), jnp.asarray(mask), T_thresh=1e-4)

    for i in range(N):
        n = int(nvalid[i])
        want = golden.golden_composite_ray(
            sigmas[i, :n].astype(np.float64), rgbs[i, :n].astype(np.float64),
            amb_aud[i, :n], amb_eye[i, :n], unc[i, :n],
            deltas[i, :n].astype(np.float64), ts[i, :n].astype(np.float64), 1e-4)
        np.testing.assert_allclose(np.asarray(res.image)[i], want["image"],
                                   rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(np.asarray(res.depth)[i], want["depth"],
                                   rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(np.asarray(res.weights_sum)[i],
                                   want["weights_sum"], rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(np.asarray(res.amb_aud_sum)[i],
                                   want["amb_aud_sum"], rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(np.asarray(res.amb_eye_sum)[i],
                                   want["amb_eye_sum"], rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(np.asarray(res.uncertainty_sum)[i],
                                   want["uncertainty_sum"], rtol=2e-4, atol=2e-5)


def test_composite_gradients_flow():
    N, S = 4, 8
    key = jax.random.PRNGKey(0)
    sigmas = jax.random.uniform(key, (N, S), minval=0.1, maxval=5.0)
    rgbs = jax.random.uniform(key, (N, S, 3))
    dt = jnp.full((N, S), 0.05)
    ts = jnp.cumsum(dt, axis=-1)
    mask = jnp.ones((N, S), bool)
    z = jnp.zeros((N, S))

    def loss(s, c):
        res = ops.composite_rays(s, c, z, z, z, dt, ts, mask)
        return res.image.sum() + res.weights_sum.sum()

    gs, gc = jax.grad(loss, argnums=(0, 1))(sigmas, rgbs)
    assert np.all(np.isfinite(np.asarray(gs)))
    assert np.all(np.isfinite(np.asarray(gc)))
    assert np.any(np.asarray(gs) != 0)
