"""Flax model modules (reference: nerf_triplane/network.py)."""

from .mlp import MLP, torch_linear_init
from .audio import AudioNet, AudioAttNet
from .nerf import NeRFField, TorsoField, DensityOutputs, FieldOutputs
