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
