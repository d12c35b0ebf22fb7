"""Reference checkpoint import: torch .pth state dict -> flax params.

Lets a user of the reference bring trained weights across: the hash-encoder
NeRFField is architecture-identical to reference nerf_triplane/network.py
(same dims, same parameter tensors), so conversion is layout transposition:

  torch Linear.weight [out, in]      -> flax Dense kernel [in, out]
  torch Conv1d.weight [out, in, k]   -> flax Conv kernel [k, in, out]
  GridEncoder.embeddings [rows, C]   -> the flat hash table (as-is)

Use `NeRFField(encoder="hash")` with converted checkpoints (the dense
encoder has its own parameterisation and trains from scratch).
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def _lin(w) -> np.ndarray:
    return np.asarray(w).T


def _conv1d(w) -> np.ndarray:
    return np.asarray(w).transpose(2, 1, 0)


def _mlp(sd: Dict, prefix: str, num_layers: int) -> Dict:
    return {f"net_{l}": {"kernel": _lin(sd[f"{prefix}.net.{l}.weight"])}
            for l in range(num_layers)}


def convert_reference_state_dict(sd: Dict) -> Dict:
    """sd: the reference checkpoint's ['model'] state dict (torch tensors or
    numpy arrays). Returns the flax params dict for
    NeRFField(encoder='hash') (pass as {'params': ...} to apply)."""
    sd = {k: np.asarray(getattr(v, "cpu", lambda: v)()) for k, v in sd.items()}

    audio_net = {}
    for i, l in enumerate((0, 2, 4, 6)):
        audio_net[f"Conv_{i}"] = {
            "kernel": _conv1d(sd[f"audio_net.encoder_conv.{l}.weight"]),
            "bias": sd[f"audio_net.encoder_conv.{l}.bias"],
        }
    for i, l in enumerate((0, 2)):
        audio_net[f"Dense_{i}"] = {
            "kernel": _lin(sd[f"audio_net.encoder_fc1.{l}.weight"]),
            "bias": sd[f"audio_net.encoder_fc1.{l}.bias"],
        }

    params = {
        "audio_net": audio_net,
        "sigma_net": _mlp(sd, "sigma_net", 3),
        "color_net": _mlp(sd, "color_net", 2),
        "unc_net": _mlp(sd, "unc_net", 2),
        "aud_ch_att_net": _mlp(sd, "aud_ch_att_net", 2),
        "eye_att_net": _mlp(sd, "eye_att_net", 2),
        "encoder_xy": sd["encoder_xy.embeddings"],
        "encoder_yz": sd["encoder_yz.embeddings"],
        "encoder_xz": sd["encoder_xz.embeddings"],
    }

    if "audio_att_net.attentionConvNet.0.weight" in sd:
        att = {}
        for i, l in enumerate((0, 2, 4, 6, 8)):
            att[f"Conv_{i}"] = {
                "kernel": _conv1d(
                    sd[f"audio_att_net.attentionConvNet.{l}.weight"]),
                "bias": sd[f"audio_att_net.attentionConvNet.{l}.bias"],
            }
        att["Dense_0"] = {
            "kernel": _lin(sd["audio_att_net.attentionNet.0.weight"]),
            "bias": sd["audio_att_net.attentionNet.0.bias"],
        }
        params["audio_att_net"] = att

    if "individual_codes" in sd:
        params["individual_codes"] = sd["individual_codes"]

    return params


def convert_reference_torso(sd: Dict) -> Dict:
    """Torso submodel (reference network.py:156-205) -> TorsoField params."""
    sd = {k: np.asarray(getattr(v, "cpu", lambda: v)()) for k, v in sd.items()}
    params = {
        "anchor_points": sd["anchor_points"],
        "torso_encoder": sd["torso_encoder.embeddings"],
        "torso_deform_net": _mlp(sd, "torso_deform_net", 3),
        "torso_net": _mlp(sd, "torso_net", 3),
    }
    if "individual_codes_torso" in sd:
        params["individual_codes_torso"] = sd["individual_codes_torso"]
    return params


def export_reference_state_dict(params: Dict) -> Dict:
    """Inverse of convert_reference_state_dict: flax
    NeRFField(encoder='hash') params -> the reference's ['model'] state
    dict layout (numpy arrays; wrap with torch.from_numpy/torch.save for a
    .pth the reference loads). _lin and _conv1d are involutions, so the
    same transposes convert both directions; roundtrip identity is
    regression-tested in tests/test_convert.py."""
    sd: Dict = {}
    an = params["audio_net"]
    for i, l in enumerate((0, 2, 4, 6)):
        sd[f"audio_net.encoder_conv.{l}.weight"] = _conv1d(
            an[f"Conv_{i}"]["kernel"])
        sd[f"audio_net.encoder_conv.{l}.bias"] = np.asarray(
            an[f"Conv_{i}"]["bias"])
    for i, l in enumerate((0, 2)):
        sd[f"audio_net.encoder_fc1.{l}.weight"] = _lin(
            an[f"Dense_{i}"]["kernel"])
        sd[f"audio_net.encoder_fc1.{l}.bias"] = np.asarray(
            an[f"Dense_{i}"]["bias"])
    for name, n in (("sigma_net", 3), ("color_net", 2), ("unc_net", 2),
                    ("aud_ch_att_net", 2), ("eye_att_net", 2)):
        if name not in params:
            # eye_att_net only materialises under exp_eye=True (the flax
            # module is created lazily by use); the reference tolerates
            # missing keys on load (TrainerUtil.py:1283-1345)
            continue
        for l in range(n):
            sd[f"{name}.net.{l}.weight"] = _lin(
                params[name][f"net_{l}"]["kernel"])
    for plane in ("xy", "yz", "xz"):
        sd[f"encoder_{plane}.embeddings"] = np.asarray(
            params[f"encoder_{plane}"])
    if "audio_att_net" in params:
        att = params["audio_att_net"]
        for i, l in enumerate((0, 2, 4, 6, 8)):
            sd[f"audio_att_net.attentionConvNet.{l}.weight"] = _conv1d(
                att[f"Conv_{i}"]["kernel"])
            sd[f"audio_att_net.attentionConvNet.{l}.bias"] = np.asarray(
                att[f"Conv_{i}"]["bias"])
        sd["audio_att_net.attentionNet.0.weight"] = _lin(
            att["Dense_0"]["kernel"])
        sd["audio_att_net.attentionNet.0.bias"] = np.asarray(
            att["Dense_0"]["bias"])
    if "individual_codes" in params:
        sd["individual_codes"] = np.asarray(params["individual_codes"])
    return sd


def export_reference_torso(params: Dict) -> Dict:
    """Inverse of convert_reference_torso."""
    sd: Dict = {
        "anchor_points": np.asarray(params["anchor_points"]),
        "torso_encoder.embeddings": np.asarray(params["torso_encoder"]),
    }
    for name, n in (("torso_deform_net", 3), ("torso_net", 3)):
        for l in range(n):
            sd[f"{name}.net.{l}.weight"] = _lin(
                params[name][f"net_{l}"]["kernel"])
    if "individual_codes_torso" in params:
        sd["individual_codes_torso"] = np.asarray(
            params["individual_codes_torso"])
    return sd


def load_reference_checkpoint(path: str) -> Dict:
    """Load a reference .pth checkpoint file and convert the head params."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model", ckpt)
    return convert_reference_state_dict(sd)
