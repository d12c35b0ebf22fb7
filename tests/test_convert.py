"""Reference-checkpoint conversion: numerical parity against torch CPU for
every torch-expressible submodule (the CUDA-extension encoders are validated
separately by the golden grid tests)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from lzzx_nerf_tpu.models import NeRFField
from lzzx_nerf_tpu.utils.convert import convert_reference_state_dict


def _torch_reference_state(audio_in_dim=29, audio_dim=32, ind_num=64,
                           ind_dim=4, seed=0):
    """Random weights in the reference's exact parameter layout
    (network.py:97-167)."""
    torch.manual_seed(seed)
    sd = {}

    convs = [(audio_in_dim, 32), (32, 32), (32, 64), (64, 64)]
    for i, l in enumerate((0, 2, 4, 6)):
        cin, cout = convs[i]
        sd[f"audio_net.encoder_conv.{l}.weight"] = torch.randn(cout, cin, 3) * 0.1
        sd[f"audio_net.encoder_conv.{l}.bias"] = torch.randn(cout) * 0.1
    sd["audio_net.encoder_fc1.0.weight"] = torch.randn(64, 64) * 0.1
    sd["audio_net.encoder_fc1.0.bias"] = torch.randn(64) * 0.1
    sd["audio_net.encoder_fc1.2.weight"] = torch.randn(audio_dim, 64) * 0.1
    sd["audio_net.encoder_fc1.2.bias"] = torch.randn(audio_dim) * 0.1

    att_chans = [(audio_dim, 16), (16, 8), (8, 4), (4, 2), (2, 1)]
    for i, l in enumerate((0, 2, 4, 6, 8)):
        cin, cout = att_chans[i]
        sd[f"audio_att_net.attentionConvNet.{l}.weight"] = torch.randn(cout, cin, 3) * 0.1
        sd[f"audio_att_net.attentionConvNet.{l}.bias"] = torch.randn(cout) * 0.1
    sd["audio_att_net.attentionNet.0.weight"] = torch.randn(8, 8) * 0.1
    sd["audio_att_net.attentionNet.0.bias"] = torch.randn(8) * 0.1

    def mlp(prefix, dims):
        for l, (i, o) in enumerate(dims):
            sd[f"{prefix}.net.{l}.weight"] = torch.randn(o, i) * 0.1

    mlp("sigma_net", [(69, 64), (64, 64), (64, 65)])
    mlp("color_net", [(84, 64), (64, 3)])
    mlp("unc_net", [(36, 32), (32, 1)])
    mlp("aud_ch_att_net", [(36, 64), (64, 32)])
    mlp("eye_att_net", [(36, 16), (16, 1)])

    # hash tables: triplane spec total rows (level tables concatenated)
    from lzzx_nerf_tpu.models.nerf import triplane_spec

    rows = triplane_spec(1.0).total_params
    for p in ("xy", "yz", "xz"):
        sd[f"encoder_{p}.embeddings"] = torch.randn(rows, 1) * 1e-2
    sd["individual_codes"] = torch.randn(ind_num, ind_dim) * 0.1
    return sd


def _torch_audio_forward(sd, a):
    """AudioNet + AudioAttNet forward in plain torch (network.py:31-70)."""
    import torch.nn.functional as F

    x = torch.as_tensor(a).permute(0, 2, 1)         # [n, C, T]
    for l in (0, 2, 4, 6):
        x = F.conv1d(x, sd[f"audio_net.encoder_conv.{l}.weight"],
                     sd[f"audio_net.encoder_conv.{l}.bias"], stride=2,
                     padding=1)
        x = F.leaky_relu(x, 0.02)
    x = x.squeeze(-1)
    x = F.leaky_relu(F.linear(x, sd["audio_net.encoder_fc1.0.weight"],
                              sd["audio_net.encoder_fc1.0.bias"]), 0.02)
    x = F.linear(x, sd["audio_net.encoder_fc1.2.weight"],
                 sd["audio_net.encoder_fc1.2.bias"])   # [8, 32]

    y = x[None].permute(0, 2, 1)                     # [1, 32, 8]
    for l in (0, 2, 4, 6, 8):
        y = F.conv1d(y, sd[f"audio_att_net.attentionConvNet.{l}.weight"],
                     sd[f"audio_att_net.attentionConvNet.{l}.bias"],
                     padding=1)
        y = F.leaky_relu(y, 0.02)
    y = F.softmax(F.linear(y.view(1, 8),
                           sd["audio_att_net.attentionNet.0.weight"],
                           sd["audio_att_net.attentionNet.0.bias"]), dim=1)
    return (y.view(1, 8, 1) * x[None]).sum(dim=1)    # [1, 32]


def test_converted_audio_path_matches_torch():
    sd = _torch_reference_state()
    params = {"params": convert_reference_state_dict(sd)}
    field = NeRFField(audio_in_dim=29, encoder="hash", att=2, ind_num=64)

    a = np.random.default_rng(0).standard_normal((8, 16, 29)).astype(np.float32)
    want = _torch_audio_forward(sd, a).detach().numpy()
    got = np.asarray(field.apply(params, jnp.asarray(a),
                                 method="encode_audio"))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def _torch_mlp(sd, prefix, num_layers, h):
    """Reference MLP forward (network.py MLP: bias-free Linear chain, ReLU
    between layers, none at the end)."""
    import torch.nn.functional as F

    t = torch.as_tensor(h)
    for l in range(num_layers):
        t = F.linear(t, sd[f"{prefix}.net.{l}.weight"])
        if l < num_layers - 1:
            t = F.relu(t)
    return t


def _reference_full_forward(sd, x, d, a, e, bound=1.0):
    """WHOLE-network forward of the reference NeRFNetwork
    (network.py:252-311) re-implemented in torch + the NumPy golden grid
    encode — the independent oracle for the converted-checkpoint field.
    Returns (sigma, color, amb_aud, amb_eye, uncertainty) as numpy."""
    import torch.nn.functional as F

    from golden import golden_grid_encode, golden_sh4
    from lzzx_nerf_tpu.models.nerf import triplane_spec

    N = x.shape[0]
    enc_a = _torch_audio_forward(sd, a)                       # [1, 32]

    spec = triplane_spec(bound)
    offsets = list(spec.offsets)

    def enc_plane(p, uv):
        u01 = (uv + bound) / (2.0 * bound)
        return golden_grid_encode(
            u01, np.asarray(sd[f"encoder_{p}.embeddings"]), offsets,
            spec.per_level_scale, spec.base_resolution)

    xy, yz = x[:, :2], x[:, 1:]
    xz = np.concatenate([x[:, :1], x[:, 2:]], axis=-1)
    enc_x = np.concatenate(
        [enc_plane("xy", xy), enc_plane("yz", yz), enc_plane("xz", xz)],
        axis=-1).astype(np.float32)                           # [N, 36]

    # density (network.py:283-311)
    aud_ch_att = _torch_mlp(sd, "aud_ch_att_net", 2, enc_x)   # [N, 32]
    enc_w = enc_a.repeat(N, 1) * aud_ch_att
    eye_att = torch.sigmoid(_torch_mlp(sd, "eye_att_net", 2, enc_x))
    e_feat = torch.as_tensor([[float(e)]]) * eye_att          # [N, 1]
    h = torch.cat([torch.as_tensor(enc_x), enc_w, e_feat], dim=-1)
    h = _torch_mlp(sd, "sigma_net", 3, h)
    sigma = torch.exp(h[..., 0])
    geo_feat = h[..., 1:]

    # color (network.py:252-275)
    enc_d = torch.as_tensor(golden_sh4(d).astype(np.float32))
    c = torch.as_tensor(np.asarray(sd["individual_codes"][0]))[None]
    hc = torch.cat([enc_d, geo_feat, c.repeat(N, 1)], dim=-1)
    color = torch.sigmoid(_torch_mlp(sd, "color_net", 2, hc)) \
        * (1 + 2 * 0.001) - 0.001

    unc = F.softplus(_torch_mlp(sd, "unc_net", 2, enc_x))[..., 0]
    return (sigma.detach().numpy(), color.detach().numpy(),
            aud_ch_att.norm(dim=-1).detach().numpy(),
            eye_att[..., 0].detach().numpy(), unc.detach().numpy())


def test_converted_whole_field_forward_matches_reference():
    """End-to-end forward parity: a random reference state dict, converted,
    must drive NeRFField(encoder='hash') to the SAME density, color,
    ambient and uncertainty outputs as an independent torch+golden
    re-implementation of the full reference forward
    (network.py:252-311) — the missing whole-network oracle flagged by the
    round-2 review. Audio encoding runs through the converted AudioNet/
    AudioAttNet on both sides."""
    sd = _torch_reference_state()
    params = {"params": convert_reference_state_dict(sd)}
    field = NeRFField(audio_in_dim=29, encoder="hash", att=2, ind_num=64)

    rng = np.random.default_rng(7)
    x = rng.uniform(-0.9, 0.9, (48, 3)).astype(np.float32)
    d = rng.standard_normal((48, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    a = rng.standard_normal((8, 16, 29)).astype(np.float32)
    e = 0.21

    want = _reference_full_forward(sd, x, d, a, e)

    enc_a = field.apply(params, jnp.asarray(a), method="encode_audio")
    out = field.apply(params, jnp.asarray(x), jnp.asarray(d), enc_a,
                      jnp.asarray(np.asarray(sd["individual_codes"][0])),
                      jnp.asarray([e]))

    np.testing.assert_allclose(np.asarray(out.sigma), want[0],
                               rtol=5e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.color), want[1],
                               rtol=5e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.ambient_aud), want[2],
                               rtol=5e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.ambient_eye), want[3],
                               rtol=5e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.uncertainty), want[4],
                               rtol=5e-4, atol=1e-5)


def test_converted_field_renders_like_golden_composite():
    """Render-level closure: a converted checkpoint pushed through
    render_rays must equal a per-ray NumPy golden pipeline (golden
    near/far -> golden sequential march -> the SAME field -> golden
    front-to-back composite + background blend). Proves the conversion is
    consumable by the actual render path, not just the field forward."""
    from golden import (golden_composite_ray, golden_march_uniform,
                        golden_near_far)
    from lzzx_nerf_tpu.render import (RenderSettings, init_occupancy_state,
                                      render_rays)

    sd = _torch_reference_state()
    params = {"params": convert_reference_state_dict(sd)}
    field = NeRFField(audio_in_dim=29, encoder="hash", att=2, ind_num=64)

    GRID, BOUND = 32, 1.0
    DT = 2 * 3 ** 0.5 / GRID
    S = 8
    settings = RenderSettings(bound=BOUND, cascade=1, grid_size=GRID,
                              max_steps=S, dt=DT, num_cand=64)
    state = init_occupancy_state(settings)
    r = jnp.linspace(-1, 1, GRID)
    X, Y, Z = jnp.meshgrid(r, r, r, indexing="ij")
    occ = (jnp.sqrt(X ** 2 + Y ** 2 + Z ** 2) < 0.5)[None]
    state = state._replace(occ=occ)

    rng = np.random.default_rng(3)
    N = 24
    o = np.tile(np.array([[0.0, 0.0, -2.2]], np.float32), (N, 1))
    d = rng.standard_normal((N, 3)).astype(np.float32) * 0.2
    d[:, 2] = 1.0
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    a = rng.standard_normal((8, 16, 29)).astype(np.float32)
    e = 0.3
    bg = np.full((N, 3), 0.55, np.float32)

    enc_a = field.apply(params, jnp.asarray(a), method="encode_audio")
    code = jnp.asarray(np.asarray(sd["individual_codes"][0]))
    out = render_rays(field.apply, params, settings, state,
                      jnp.asarray(o), jnp.asarray(d), enc_a, code,
                      jnp.asarray([e]), jnp.asarray(bg))

    aabb = np.asarray(settings.aabb, np.float32)
    occ_np = np.asarray(occ)
    for i in range(N):
        near, far = golden_near_far(o[i], d[i], aabb, settings.min_near)
        samples = golden_march_uniform(o[i], d[i], near, far, occ_np,
                                       BOUND, DT, S)
        if not samples:
            np.testing.assert_allclose(np.asarray(out["image"][i]), bg[i],
                                       atol=1e-6)
            continue
        pts = np.stack([s[0] for s in samples]).astype(np.float32)
        dirs = np.tile(d[i], (len(samples), 1))
        f = field.apply(params, jnp.asarray(pts), jnp.asarray(dirs), enc_a,
                        code, jnp.asarray([e]))
        gold = golden_composite_ray(
            np.asarray(f.sigma, np.float64) * settings.density_scale,
            np.asarray(f.color, np.float64),
            np.abs(np.asarray(f.ambient_aud, np.float64)),
            np.abs(np.asarray(f.ambient_eye, np.float64)),
            np.asarray(f.uncertainty, np.float64),
            np.asarray([s[1] for s in samples]),
            np.asarray([s[2] for s in samples]),
            settings.T_thresh)
        want_img = np.clip(
            gold["image"] + (1.0 - gold["weights_sum"]) * bg[i], 0, 1)
        np.testing.assert_allclose(np.asarray(out["image"][i]), want_img,
                                   atol=5e-4)
        np.testing.assert_allclose(np.asarray(out["weights_sum"][i]),
                                   gold["weights_sum"], atol=5e-4)
        np.testing.assert_allclose(np.asarray(out["uncertainty"][i]),
                                   gold["uncertainty_sum"], atol=5e-4)


def test_converted_full_field_runs_and_mlps_match():
    sd = _torch_reference_state()
    params = {"params": convert_reference_state_dict(sd)}
    field = NeRFField(audio_in_dim=29, encoder="hash", att=2, ind_num=64)

    x = np.random.default_rng(1).standard_normal((32, 3)).astype(np.float32) * 0.3
    d = x / np.linalg.norm(x, axis=-1, keepdims=True)
    enc_a = jnp.zeros((1, 32))
    out = field.apply(params, jnp.asarray(x), jnp.asarray(d), enc_a,
                      jnp.asarray(np.asarray(sd["individual_codes"][0])),
                      jnp.asarray([0.25]))
    assert np.all(np.isfinite(np.asarray(out.sigma)))
    assert np.all(np.isfinite(np.asarray(out.color)))

    # MLP parity on a raw torch pass of sigma_net
    import torch.nn.functional as F

    h = np.random.default_rng(2).standard_normal((16, 69)).astype(np.float32)
    t = torch.as_tensor(h)
    for l in range(3):
        t = F.linear(t, sd[f"sigma_net.net.{l}.weight"])
        if l < 2:
            t = F.relu(t)
    want = t.detach().numpy()

    from lzzx_nerf_tpu.models.mlp import MLP

    mlp = MLP(65, 64, 3)
    got = np.asarray(mlp.apply(
        {"params": {f"net_{l}": {"kernel": np.asarray(
            sd[f"sigma_net.net.{l}.weight"]).T} for l in range(3)}},
        jnp.asarray(h)))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_import_reference_ckpt_to_workspace(tmp_path):
    """scripts/import_reference_ckpt.py: a reference-layout torch checkpoint
    (converted params + MORTON-ordered density grid + EMA semantics) must
    become a workspace that cli --test renders from directly — the
    documented real-data protocol's executable half (round-2 review
    missing item 1)."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "scripts"))
    from conftest import make_toy_dataset
    from import_reference_ckpt import dem_morton, main as import_main

    from lzzx_nerf_tpu import cli

    # reference-layout checkpoint: random-but-valid state dict + a morton
    # density grid whose natural-order image we know
    GRID = 32
    sd = _torch_reference_state()
    rng = np.random.default_rng(2)
    natural = rng.uniform(0, 20, (1, GRID, GRID, GRID)).astype(np.float32)
    from lzzx_nerf_tpu.ops.morton import morton3d

    coords = np.stack(np.meshgrid(*([np.arange(GRID)] * 3), indexing="ij"),
                      -1).reshape(-1, 3)
    codes = np.asarray(morton3d(jnp.asarray(coords, jnp.uint32)))
    morton_flat = np.zeros((1, GRID ** 3), np.float32)
    morton_flat[:, codes] = natural.reshape(1, -1)
    np.testing.assert_allclose(dem_morton(morton_flat, GRID), natural)
    sd["density_grid"] = torch.as_tensor(morton_flat)

    ckpt_path = tmp_path / "ngp_ep0001.pth"
    torch.save({"model": sd, "mean_density": 2.0, "global_step": 123},
               ckpt_path)

    data = make_toy_dataset(tmp_path / "data")
    ws = str(tmp_path / "ws")
    argv = sys.argv
    sys.argv = ["x", "--ckpt", str(ckpt_path), "--data", data,
                "--workspace", ws, "--asr_model", "deepspeech",
                "--grid_size", "32"]
    try:
        import_main()
    finally:
        sys.argv = argv
    assert os.path.isdir(os.path.join(ws, "checkpoints"))

    # the imported OCCUPANCY must be the thresholded reference grid —
    # regression: `(dg > thresh) & occ.occ` zeroed every cell (occ.occ is
    # all-False before any update_density_grid), so imports rendered only
    # background. Adopt the architecture exactly as serving does: the LAST
    # LINE of opt.txt parsed as one JSON doc (also pins indent=None there).
    from lzzx_nerf_tpu.cli import _build_world
    from lzzx_nerf_tpu.config import Config
    from lzzx_nerf_tpu.data.provider import NeRFDataset
    from lzzx_nerf_tpu.train import TrainState, Trainer, build_optimizer

    last = open(os.path.join(ws, "opt.txt")).read().strip().splitlines()[-1]
    icfg = Config.from_json(last)
    assert icfg.grid_size == GRID and icfg.encoder == "hash"
    settings_i, occ_i, field_i, params_i = _build_world(
        icfg.replace(path=data, workspace=ws), NeRFDataset(
            icfg.replace(path=data, workspace=ws), type="train"))
    st = TrainState.create(dict(params_i),
                           build_optimizer(icfg.lr, icfg.lr_net, icfg.iters))
    st, occ_i, ok = Trainer(ws).load_checkpoint(st, occ_i)
    assert ok
    exp = int((natural > 2.0).sum())  # thresh = min(10, mean_density=2.0)
    assert exp > 0
    assert int(np.asarray(occ_i.occ).sum()) == exp

    # the standard --test consumer renders from it (hash encoder adopted)
    cli.main([data, "--workspace", ws, "--encoder", "hash", "--asr_model",
              "deepspeech", "--test", "1", "--test_train", "1",
              "--grid_size", "32", "--max_steps", "8", "--ind_num", "64",
              "--infer_samples", "8", "--infer_window_candidates", "24",
              "--data_range", "0", "-1"])
    results = os.listdir(os.path.join(ws, "results"))
    assert [f for f in results if f.endswith(".png")]
    log = open(os.path.join(ws, "log_ngp.txt")).read()
    assert "resumed=True" in log or "ckpt resumed" in log


def test_export_roundtrips_reference_state_dict():
    """Export is the exact inverse of import: reference sd -> flax params
    -> reference sd reproduces every tensor bitwise (same keys), and flax
    params -> sd -> flax params reproduces the tree — the interchange
    contract for moving trained weights BACK to the torch reference."""
    from lzzx_nerf_tpu.utils.convert import (export_reference_state_dict,
                                             export_reference_torso,
                                             convert_reference_torso)

    sd = {k: v.numpy() for k, v in _torch_reference_state(seed=3).items()}
    params = convert_reference_state_dict(sd)
    back = export_reference_state_dict(params)
    assert sorted(back) == sorted(sd)
    for k in sd:
        np.testing.assert_array_equal(back[k], sd[k], err_msg=k)
    # params -> sd -> params
    again = convert_reference_state_dict(back)

    def tree_eq(a, b, path=""):
        assert sorted(a) == sorted(b), path
        for k in a:
            if isinstance(a[k], dict):
                tree_eq(a[k], b[k], path + "/" + str(k))
            else:
                np.testing.assert_array_equal(a[k], b[k],
                                              err_msg=path + "/" + str(k))

    tree_eq(params, again)

    # torso: build a layout-correct random sd and roundtrip it
    rng = np.random.default_rng(4)
    tsd = {"anchor_points": rng.standard_normal((68, 3)).astype(np.float32),
           "torso_encoder.embeddings":
               rng.standard_normal((1024, 2)).astype(np.float32),
           "individual_codes_torso":
               rng.standard_normal((64, 8)).astype(np.float32)}
    for name, dims in (("torso_deform_net", [(34, 32), (32, 32), (32, 2)]),
                       ("torso_net", [(52, 32), (32, 32), (32, 4)])):
        for l, (i, o) in enumerate(dims):
            tsd[f"{name}.net.{l}.weight"] = (
                rng.standard_normal((o, i)).astype(np.float32))
    tback = export_reference_torso(convert_reference_torso(tsd))
    assert sorted(tback) == sorted(tsd)
    for k in tsd:
        np.testing.assert_array_equal(tback[k], tsd[k], err_msg=k)


def test_export_reference_ckpt_script_roundtrip(tmp_path):
    """scripts/export_reference_ckpt.py: import a reference checkpoint into
    a workspace, export it back, and recover every network tensor and the
    MORTON density grid bitwise — train-here/serve-there interchange."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "scripts"))
    from conftest import make_toy_dataset
    from export_reference_ckpt import main as export_main, to_morton
    from import_reference_ckpt import main as import_main

    GRID = 32
    sd = _torch_reference_state()
    rng = np.random.default_rng(7)
    natural = rng.uniform(0, 20, (1, GRID, GRID, GRID)).astype(np.float32)
    sd["density_grid"] = torch.as_tensor(to_morton(natural))

    ckpt_path = tmp_path / "ngp_ref.pth"
    torch.save({"model": sd, "mean_density": 2.0, "global_step": 7},
               ckpt_path)
    data = make_toy_dataset(tmp_path / "data")
    ws = str(tmp_path / "ws")
    argv = sys.argv
    sys.argv = ["x", "--ckpt", str(ckpt_path), "--data", data,
                "--workspace", ws, "--asr_model", "deepspeech",
                "--grid_size", str(GRID)]
    try:
        import_main()
        out = str(tmp_path / "back.pth")
        sys.argv = ["x", "--workspace", ws, "--data", data, "--out", out,
                    "--asr_model", "deepspeech", "--grid_size", str(GRID)]
        export_main()
    finally:
        sys.argv = argv

    back = torch.load(out, map_location="cpu", weights_only=False)
    bsd = back["model"]
    for k in sd:
        got = np.asarray(bsd[k])
        want = np.asarray(sd[k])
        if k == "density_grid":
            # import thresholds into occupancy; export re-mortonises the
            # imported grid — values roundtrip exactly
            np.testing.assert_allclose(got, want, atol=1e-6, err_msg=k)
        else:
            np.testing.assert_array_equal(got, want, err_msg=k)
    assert back["global_step"] == 7
    assert abs(back["mean_density"] - 2.0) < 1e-6
    assert "density_bitfield" in bsd


def test_export_reference_ckpt_torso_direction(tmp_path):
    """--torso-workspace: a natively-saved torso workspace exports its
    network tensors (roundtrip through convert_reference_torso) AND the
    trained 2-D torso occupancy grid + mean — the reference side must not
    be left with a zero-init torso grid (invisible torso)."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "scripts"))
    import jax
    from conftest import make_toy_dataset
    from export_reference_ckpt import main as export_main, to_morton
    from import_reference_ckpt import main as import_main

    from lzzx_nerf_tpu.cli import _build_world
    from lzzx_nerf_tpu.config import Config
    from lzzx_nerf_tpu.data.provider import NeRFDataset
    from lzzx_nerf_tpu.models import TorsoField
    from lzzx_nerf_tpu.train import TrainState, Trainer, build_optimizer
    from lzzx_nerf_tpu.utils.convert import convert_reference_torso

    GRID = 32
    sd = _torch_reference_state()
    rng = np.random.default_rng(8)
    natural = rng.uniform(0, 20, (1, GRID, GRID, GRID)).astype(np.float32)
    sd["density_grid"] = torch.as_tensor(to_morton(natural))
    ckpt_path = tmp_path / "ngp_ref.pth"
    torch.save({"model": sd, "mean_density": 2.0, "global_step": 1},
               ckpt_path)
    data = make_toy_dataset(tmp_path / "data")
    ws = str(tmp_path / "ws")
    argv = sys.argv
    sys.argv = ["x", "--ckpt", str(ckpt_path), "--data", data,
                "--workspace", ws, "--asr_model", "deepspeech",
                "--grid_size", str(GRID)]
    try:
        import_main()

        # natively-initialized torso workspace with a known torso grid;
        # dims must match what the importer adopted into ws/opt.txt
        # (ind_num/ind_dim come from the checkpoint), exactly as a real
        # torso run adopts them via the CLI
        last = open(os.path.join(ws, "opt.txt")).read().splitlines()[-1]
        cfg = Config.from_json(last).replace(path=data, workspace=ws)
        ds = NeRFDataset(cfg, type="train")
        _, occ, _, _ = _build_world(cfg, ds)
        torso = TorsoField(torso_shrink=cfg.torso_shrink,
                           ind_dim_torso=cfg.ind_dim_torso,
                           ind_num=cfg.ind_num, encoder="tiled")
        tparams = torso.init(jax.random.PRNGKey(1), jnp.zeros((4, 2)),
                             jnp.eye(4),
                             jnp.zeros(max(cfg.ind_dim_torso, 1)))
        tgrid = rng.uniform(0, 5, np.asarray(
            occ.density_grid_torso).shape).astype(np.float32)
        occ_t = occ._replace(density_grid_torso=jnp.asarray(tgrid),
                             mean_density_torso=jnp.asarray(0.5,
                                                            jnp.float32))
        tws = str(tmp_path / "ws_torso")
        t_state = TrainState.create(
            dict(tparams), build_optimizer(cfg.lr, cfg.lr_net, cfg.iters))
        Trainer(tws).save_checkpoint(t_state, occ_t)
        # the torso run records its dims in ITS opt.txt (run_train does
        # this before dispatching the torso stage)
        with open(os.path.join(tws, "opt.txt"), "a") as f:
            f.write(cfg.replace(workspace=tws).to_json(indent=None) + "\n")

        out = str(tmp_path / "with_torso.pth")
        sys.argv = ["x", "--workspace", ws, "--data", data, "--out", out,
                    "--asr_model", "deepspeech", "--grid_size", str(GRID),
                    "--torso-workspace", tws]
        export_main()
    finally:
        sys.argv = argv

    back = torch.load(out, map_location="cpu", weights_only=False)
    bsd = {k: np.asarray(v) for k, v in back["model"].items()}
    np.testing.assert_allclose(
        bsd["density_grid_torso"].reshape(tgrid.shape), tgrid, atol=1e-6)
    assert abs(back["mean_density_torso"] - 0.5) < 1e-6
    # torso tensors roundtrip through the importer's converter
    tp_back = convert_reference_torso(
        {k: v for k, v in bsd.items()
         if k.startswith(("anchor_points", "torso_", "individual_codes_"))})
    want = tparams["params"]

    def tree_eq(a, b, path=""):
        assert sorted(a) == sorted(b), (path, sorted(a), sorted(b))
        for k in a:
            if isinstance(a[k], dict):
                tree_eq(a[k], b[k], path + "/" + str(k))
            else:
                np.testing.assert_allclose(np.asarray(a[k]),
                                           np.asarray(b[k]), atol=1e-6,
                                           err_msg=path + "/" + str(k))

    tree_eq(tp_back, {k: want[k] for k in tp_back})
