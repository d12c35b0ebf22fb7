"""lzzx_nerf_tpu — TPU-native audio-driven talking-portrait NeRF framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of the CUDA/PyTorch
reference GithinjiHans/LZZX-NeRF (ER-NeRF-style triplane NeRF talking head):

- ``ops``      — TPU-native encoder / ray-marching / compositing primitives
                 (replaces the reference's four CUDA extensions:
                 gridencoder, shencoder, freqencoder, raymarching).
- ``models``   — flax modules: AudioNet, AudioAttNet, MLP, triplane NeRF field,
                 torso deformation model (reference: nerf_triplane/network.py).
- ``render``   — static-shape occupancy-grid volume renderer, one jitted
                 program shared by train/eval/inference
                 (reference: nerf_triplane/renderer.py).
- ``train``    — optax trainer with the full ER-NeRF loss stack, EMA,
                 checkpointing (reference: nerf_triplane/TrainerUtil.py).
- ``data``     — dataset providers + audio feature windowing
                 (reference: nerf_triplane/provider.py, utils.py).
- ``parallel`` — jax.sharding mesh / pjit utilities (replaces DDP/NCCL
                 scaffolding in the reference trainer).
- ``serving``  — streaming inference session + REST API
                 (reference: webapi.py, HubertInferenceMQ.py).
"""

__version__ = "0.1.0"
