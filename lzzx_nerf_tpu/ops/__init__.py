"""TPU-native compute primitives.

Each module here replaces one of the reference's hand-written CUDA extensions
with an XLA/Pallas-friendly formulation (static shapes, batched gathers,
associative scans instead of serial loops, segment-sums instead of atomics):

- ``freq``      ← freqencoder/src/freqencoder.cu
- ``sh``        ← shencoder/src/shencoder.cu
- ``grid``      ← gridencoder/src/gridencoder.cu
- ``morton``    ← raymarching/src/raymarching.cu (morton3D / packbits / dilation)
- ``ray``       ← raymarching/src/raymarching.cu (near_far_from_aabb)
- ``march``     ← raymarching/src/raymarching.cu (march_rays[_train])
- ``composite`` ← raymarching/src/raymarching.cu (composite_rays[_train]_triplane)
"""

from .freq import freq_encode, freq_output_dim
from .sh import sh_encode, sh_output_dim
from .grid import GridSpec, grid_encode, make_grid_spec, init_grid_embeddings
from .morton import (
    morton3d,
    morton3d_invert,
    packbits,
    unpack_bitfield,
    dilate_grid3d,
)
from .ray import near_far_from_aabb, sph_from_ray
from .march import march_rays_uniform
from .composite import composite_rays
