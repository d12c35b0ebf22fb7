"""End-to-end render-path tests on a tiny configuration
(BASELINE config #3: single-frame static render, one jit call)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lzzx_nerf_tpu.models import NeRFField, TorsoField
from lzzx_nerf_tpu.render import (
    OccupancyState,
    RenderSettings,
    init_occupancy_state,
    mark_untrained_grid,
    render_rays,
    run_torso,
    update_density_grid,
    update_torso_grid,
)
from lzzx_nerf_tpu.utils import get_bg_coords, get_rays

GRID = 32


@pytest.fixture(scope="module")
def setup():
    settings = RenderSettings(
        bound=1.0, cascade=1, grid_size=GRID, max_steps=8,
        dt=2 * 3.0 ** 0.5 / GRID, num_cand=28, min_near=0.05,
    )
    state = init_occupancy_state(settings)
    # occupancy: central sphere
    r = jnp.linspace(-1, 1, GRID)
    X, Y, Z = jnp.meshgrid(r, r, r, indexing="ij")
    occ = (jnp.sqrt(X**2 + Y**2 + Z**2) < 0.5)[None]
    state = state._replace(occ=occ)

    field = NeRFField(audio_in_dim=29, att=2, exp_eye=True, ind_dim=4)
    x0 = jnp.zeros((4, 3))
    d0 = jnp.ones((4, 3)) / 3.0 ** 0.5
    auds = jnp.zeros((8, 16, 29))
    params = field.init(jax.random.PRNGKey(0), x0, d0, auds, jnp.zeros(4),
                        jnp.asarray([0.25]), method="init_all")
    return settings, state, field, params


def _camera(H=24, W=24):
    pose = jnp.asarray(np.array([
        [1, 0, 0, 0],
        [0, 1, 0, 0],
        [0, 0, 1, -2.5],
        [0, 0, 0, 1],
    ], np.float32))[None]
    fx = fy = W / 0.7
    return pose, (fx, fy, W / 2, H / 2), H, W


def test_render_full_frame_shapes(setup):
    settings, state, field, params = setup
    pose, intr, H, W = _camera()
    rays = get_rays(pose, intr, H, W, N=-1)

    enc_a = jnp.zeros((1, 32))
    bg = jnp.ones((H * W, 3))

    res = render_rays(
        functools.partial(field.apply), params, settings, state,
        rays["rays_o"][0], rays["rays_d"][0], enc_a,
        jnp.zeros(4), jnp.asarray([0.25]), bg,
    )
    assert res["image"].shape == (H * W, 3)
    assert res["depth"].shape == (H * W,)
    for k in ("image", "depth", "weights_sum", "ambient_aud", "ambient_eye",
              "uncertainty"):
        assert np.all(np.isfinite(np.asarray(res[k]))), k
    img = np.asarray(res["image"])
    assert img.min() >= 0.0 and img.max() <= 1.0
    # background pixels (rays that miss the sphere) stay exactly bg
    ws = np.asarray(res["weights_sum"]).reshape(H, W)
    assert ws[0, 0] == 0.0  # corner ray misses the r=0.5 sphere
    assert ws.max() > 0.1   # centre rays hit (random init has some density)


def test_render_is_jittable_and_deterministic(setup):
    settings, state, field, params = setup
    pose, intr, H, W = _camera(16, 16)
    rays = get_rays(pose, intr, H, W, N=-1)
    enc_a = jnp.zeros((1, 32))
    bg = jnp.ones((H * W, 3))

    @jax.jit
    def rf(params, state, ro, rd):
        return render_rays(field.apply, params, settings, state, ro, rd,
                           enc_a, jnp.zeros(4), jnp.asarray([0.25]), bg)["image"]

    a = rf(params, state, rays["rays_o"][0], rays["rays_d"][0])
    b = rf(params, state, rays["rays_o"][0], rays["rays_d"][0])
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_update_density_grid(setup):
    settings, state, field, params = setup
    enc_a = jnp.zeros((1, 32))

    def density_fn(pts, enc_a, eye):
        return field.apply(params, pts, enc_a, eye, method="density").sigma

    new_state = update_density_grid(density_fn, settings, state, enc_a,
                                    jnp.asarray([0.25]), jax.random.PRNGKey(0))
    assert new_state.density_grid.shape == (1, GRID, GRID, GRID)
    assert float(new_state.mean_density) > 0.0
    assert int(new_state.iter_density) == 1
    # fresh random field: sigma = exp(~0) ~ 1 everywhere < thresh min(mean,10)
    # at least the occupancy changed from the handcrafted sphere
    assert new_state.occ.dtype == jnp.bool_


def test_mark_untrained_grid(setup):
    settings, state, field, params = setup
    # a single camera at -z: cells behind it must be marked -1
    pose, intr, H, W = _camera()
    new_state = mark_untrained_grid(settings, state, pose, intr)
    grid = np.asarray(new_state.density_grid)
    assert (grid == -1).any()
    assert (grid == 0).any()  # visible cells keep their value


def test_torso_pass(setup):
    settings, state, field, params = setup
    torso = TorsoField(ind_dim_torso=8)
    bg_coords = get_bg_coords(16, 16)[0]
    pose = jnp.eye(4)
    tp = torso.init(jax.random.PRNGKey(1), bg_coords, pose, jnp.zeros(8))

    # make the torso grid fully occupied so the mask passes
    state2 = state._replace(
        density_grid_torso=jnp.ones((GRID, GRID)),
        mean_density_torso=jnp.asarray(1.0),
    )
    bg = jnp.ones((bg_coords.shape[0], 3))
    res = run_torso(torso.apply, tp, settings, state2, bg_coords, pose,
                    jnp.zeros(8), bg)
    assert res["bg_color"].shape == bg.shape
    assert np.all(np.isfinite(np.asarray(res["bg_color"])))

    def alpha_fn(xys, pose, c):
        a, _, _ = torso.apply(tp, xys, pose, c)
        return a[:, 0]

    state3 = update_torso_grid(alpha_fn, settings, state2, pose, jnp.zeros(8),
                               jax.random.PRNGKey(2))
    assert state3.density_grid_torso.shape == (GRID, GRID)
    assert float(state3.mean_density_torso) > 0.0


def test_get_rays_sampling_modes():
    pose, intr, H, W = _camera(20, 20)
    all_rays = get_rays(pose, intr, H, W, N=-1)
    assert all_rays["rays_o"].shape == (1, 400, 3)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(all_rays["rays_d"][0]), axis=-1), 1.0, atol=1e-5)

    sub = get_rays(pose, intr, H, W, N=64, rng=jax.random.PRNGKey(0))
    assert sub["rays_d"].shape == (1, 64, 3)

    patch = get_rays(pose, intr, H, W, N=64, patch_size=4, rng=jax.random.PRNGKey(0))
    assert patch["rays_d"].shape == (1, 64, 3)

    rect = get_rays(pose, intr, H, W, rect=(2, 6, 3, 8))
    assert rect["rays_d"].shape == (1, 4 * 5, 3)


def test_torso_compact_matches_dense(setup):
    """run_torso_compact over the precomputed plan must equal the dense
    run_torso composite exactly (same pixels, same nets)."""
    from lzzx_nerf_tpu.render import build_torso_plan, run_torso_compact

    settings, state, field, params = setup
    torso = TorsoField(ind_dim_torso=8)
    bg_coords = get_bg_coords(16, 16)[0]
    pose = jnp.eye(4)
    tp = torso.init(jax.random.PRNGKey(1), bg_coords, pose, jnp.zeros(8))

    rng = np.random.default_rng(0)
    grid = jnp.asarray(rng.uniform(0, 1, (GRID, GRID)), jnp.float32)
    state2 = state._replace(density_grid_torso=grid,
                            mean_density_torso=jnp.asarray(0.5))
    bg = jnp.asarray(rng.uniform(0, 1, (bg_coords.shape[0], 3)), jnp.float32)

    dense = run_torso(torso.apply, tp, settings, state2, bg_coords, pose,
                      jnp.zeros(8), bg)["bg_color"]
    plan = build_torso_plan(settings, state2, bg_coords, pad_to=32)
    compact = run_torso_compact(torso.apply, tp, plan, pose, jnp.zeros(8), bg)
    np.testing.assert_allclose(np.asarray(compact), np.asarray(dense),
                               atol=1e-5)
