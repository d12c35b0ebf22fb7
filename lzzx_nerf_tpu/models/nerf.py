"""Triplane audio-conditioned NeRF field + torso model.

Flax re-design of the reference NeRFNetwork (nerf_triplane/network.py:97-356):
same tensor dims and math, idiomatic JAX structure. The field is a pure
function of (params, inputs); all renderer state (occupancy grids, step
counters) lives outside in render.state.

Dims (hubert config):
  triplane encode_x: 3 x (12 levels x 1ch hash grid, base 64, 2^14, ->512*bound)
                     => 36 features                  (network.py:129-135)
  audio: AudioNet(audio_in_dim -> 32) [+ AudioAttNet over 8 frames]
  sigma_net:  MLP(36 + 32 + eye(1) -> 1 + 64, hidden 64, 3 layers)
  color_net:  MLP(SH16 + 64 + ind_dim -> 3, hidden 64, 2 layers)
  unc_net:    MLP(36 -> 1, hidden 32, 2)   aud_ch_att: MLP(36 -> 32, hidden 64, 2)
  eye_att:    MLP(36 -> 1, hidden 16, 2)
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.freq import freq_encode
from ..ops.grid import GridSpec, grid_encode, make_grid_spec
from ..ops.packed_triplane import (DenseTriplaneSpec, bake_packed,
                                   dense_triplane_encode)
from ..ops.sh import sh_encode
from .audio import AudioAttNet, AudioNet
from .mlp import MLP


class DensityOutputs(NamedTuple):
    sigma: jnp.ndarray        # [N]
    geo_feat: jnp.ndarray     # [N, 64]
    ambient_aud: jnp.ndarray  # [N]  ||aud channel attention||_2
    ambient_eye: jnp.ndarray  # [N]  eye attention (sigmoid)


class FieldOutputs(NamedTuple):
    sigma: jnp.ndarray        # [N]
    color: jnp.ndarray        # [N, 3]
    ambient_aud: jnp.ndarray  # [N]
    ambient_eye: jnp.ndarray  # [N]
    uncertainty: jnp.ndarray  # [N]  softplus-activated


def triplane_spec(bound: float) -> GridSpec:
    # reference network.py:131-133
    return make_grid_spec(
        input_dim=2, num_levels=12, level_dim=1, base_resolution=64,
        log2_hashmap_size=14, desired_resolution=512 * bound, gridtype="hash",
    )


class NeRFField(nn.Module):
    bound: float = 1.0
    audio_in_dim: int = 1024      # hubert
    audio_dim: int = 32
    att: int = 2
    exp_eye: bool = True
    emb: bool = False
    ind_dim: int = 4
    ind_num: int = 10_000
    dtype: jnp.dtype = jnp.float32
    # "dense": TPU-native corner-packed nested-octave triplane (flagship,
    #          1 gather row per plane per sample — see ops/packed_triplane.py)
    # "hash":  reference-exact instant-ngp hash triplane (network.py:129-135)
    encoder: str = "dense"

    def setup(self):
        def table_init(key, shape, dtype=jnp.float32):
            return jax.random.uniform(key, shape, dtype, minval=-1e-4, maxval=1e-4)

        if self.encoder == "dense":
            dspec = DenseTriplaneSpec()
            self.dense_spec = dspec
            planes = {}
            for p in ("xy", "yz", "xz"):
                planes[p] = [
                    self.param(f"encoder_{p}_l{l}", table_init,
                               (r + 1, r + 1, c))
                    for l, (r, c) in enumerate(
                        zip(dspec.resolutions, dspec.channels))
                ]
            self.dense_planes = planes
            self.in_dim = 3 * dspec.output_dim  # 36
        else:
            spec = triplane_spec(self.bound)
            self.spec = spec
            tbl = (spec.total_params, spec.level_dim)
            self.encoder_xy = self.param("encoder_xy", table_init, tbl)
            self.encoder_yz = self.param("encoder_yz", table_init, tbl)
            self.encoder_xz = self.param("encoder_xz", table_init, tbl)
            self.in_dim = 3 * spec.output_dim  # 36

        if self.emb:
            self.embedding = nn.Embed(self.audio_in_dim, self.audio_in_dim)
        self.audio_net = AudioNet(dim_aud=self.audio_dim, dtype=self.dtype)
        if self.att > 0:
            self.audio_att_net = AudioAttNet(dim_aud=self.audio_dim, dtype=self.dtype)

        self.eye_att_net = MLP(1, 16, 2, dtype=self.dtype)
        self.sigma_net = MLP(1 + 64, 64, 3, dtype=self.dtype)
        self.color_net = MLP(3, 64, 2, dtype=self.dtype)
        self.unc_net = MLP(1, 32, 2, dtype=self.dtype)
        self.aud_ch_att_net = MLP(self.audio_dim, 64, 2, dtype=self.dtype)

        if self.ind_dim > 0:
            self.individual_codes = self.param(
                "individual_codes",
                lambda k, s: jax.random.normal(k, s) * 0.1,
                (self.ind_num, self.ind_dim),
            )

    def encode_x(self, xyz: jnp.ndarray,
                 packed: Optional[dict] = None,
                 interp_dtype=jnp.float32) -> jnp.ndarray:
        """[N, 3] in [-bound, bound] -> [N, 36] triplane features
        (reference network.py:208-223). `packed` (from bake_tables) skips
        the in-graph bake — for inference, where params are static.
        interp_dtype: serving-only bilinear-combine dtype
        (ops/packed_triplane.packed_lookup); dense encoder only."""
        xy = xyz[:, :2]
        yz = xyz[:, 1:]
        xz = jnp.concatenate([xyz[:, :1], xyz[:, 2:]], axis=-1)
        if self.encoder == "dense":
            pk = packed or {}
            f_xy = dense_triplane_encode(self.dense_planes["xy"], xy,
                                         self.dense_spec, self.bound,
                                         packed=pk.get("xy"),
                                         interp_dtype=interp_dtype)
            f_yz = dense_triplane_encode(self.dense_planes["yz"], yz,
                                         self.dense_spec, self.bound,
                                         packed=pk.get("yz"),
                                         interp_dtype=interp_dtype)
            f_xz = dense_triplane_encode(self.dense_planes["xz"], xz,
                                         self.dense_spec, self.bound,
                                         packed=pk.get("xz"),
                                         interp_dtype=interp_dtype)
        else:
            if interp_dtype != jnp.float32:
                # the hash path has no reduced-precision interp — refuse
                # rather than silently run f32 under a bf16 request
                raise ValueError(
                    "interp_dtype is only supported by the dense "
                    f"(packed-triplane) encoder, not {self.encoder!r}")
            f_xy = grid_encode(xy, self.encoder_xy, self.spec, self.bound)
            f_yz = grid_encode(yz, self.encoder_yz, self.spec, self.bound)
            f_xz = grid_encode(xz, self.encoder_xz, self.spec, self.bound)
        return jnp.concatenate([f_xy, f_yz, f_xz], axis=-1)

    def bake_tables(self, dtype=None) -> dict:
        """Corner-packed lookup tables for all three planes; compute once at
        model load when serving (params static) and pass as `packed` to
        encode_x / density / __call__. dtype=jnp.bfloat16 halves the table
        to VMEM-resident size — 3x the gather rate on v5e (serving default);
        None keeps fp32 (bit-exact with the in-graph bake)."""
        if self.encoder != "dense":
            return {}
        return {p: bake_packed(self.dense_planes[p], self.dense_spec,
                               dtype=dtype or jnp.float32)
                for p in ("xy", "yz", "xz")}

    def encode_audio(self, a: jnp.ndarray) -> jnp.ndarray:
        """a: [n_frames, T, C_in] (n_frames = 8 when att > 0, else 1)
        -> [1, audio_dim] (reference network.py:226-240)."""
        if self.emb:
            a = self.embedding(a.astype(jnp.int32))
        enc = self.audio_net(a)                       # [n, audio_dim]
        if self.att > 0:
            enc = self.audio_att_net(enc[None])       # [1, audio_dim]
        return enc

    def density(
        self,
        x: jnp.ndarray,
        enc_a: jnp.ndarray,
        e: Optional[jnp.ndarray] = None,
        enc_x: Optional[jnp.ndarray] = None,
        packed: Optional[dict] = None,
    ) -> DensityOutputs:
        """reference network.py:283-311."""
        if enc_x is None:
            enc_x = self.encode_x(x, packed=packed)
        N = enc_x.shape[0]
        enc_a = jnp.broadcast_to(enc_a.reshape(1, -1), (N, self.audio_dim))
        aud_ch_att = self.aud_ch_att_net(enc_x)       # [N, audio_dim]
        enc_w = enc_a * aud_ch_att

        if self.exp_eye and e is not None:
            eye_att = jax.nn.sigmoid(self.eye_att_net(enc_x))  # [N, 1]
            e_feat = e.reshape(1, 1) * eye_att                 # [N, 1]
            h = jnp.concatenate([enc_x, enc_w, e_feat], axis=-1)
        else:
            eye_att = jnp.zeros((N, 1), enc_x.dtype)
            h = jnp.concatenate([enc_x, enc_w], axis=-1)

        h = self.sigma_net(h)
        # plain exp IS the reference activation (network.py:303 uses
        # torch.exp, not torch-ngp's gradient-clamped trunc_exp) — keep
        # the unclamped backward for checkpoint/gradient parity
        sigma = jnp.exp(h[..., 0].astype(jnp.float32))
        geo_feat = h[..., 1:]
        # safe L2: the plain norm's gradient at an EXACTLY-zero vector is
        # x/||x|| = nan, and the ambient-audio loss actively drives these
        # outputs to zero outside the face (TrainerUtil.py:331-336) — a
        # single fully-dead ReLU row then NaNs aud_ch_att's gradients even
        # through masked/zero upstream weights (0*nan). torch.norm
        # special-cases the zero subgradient; replicate that.
        amb_aud = jnp.sqrt(jnp.sum(aud_ch_att ** 2, axis=-1) + 1e-12)  # [N]
        return DensityOutputs(sigma, geo_feat, amb_aud, eye_att[..., 0])

    def __call__(
        self,
        x: jnp.ndarray,                 # [N, 3]
        d: jnp.ndarray,                 # [N, 3] unit view dirs
        enc_a: jnp.ndarray,             # [1, audio_dim]
        c: Optional[jnp.ndarray],       # [ind_dim] individual code or None
        e: Optional[jnp.ndarray] = None,  # [1] / scalar eye openness
        compute_uncertainty: bool = True,
        packed: Optional[dict] = None,
    ) -> FieldOutputs:
        """reference network.py:252-280."""
        enc_x = self.encode_x(x, packed=packed)
        dens = self.density(x, enc_a, e, enc_x)

        enc_d = sh_encode(d, 4)
        if c is not None:
            cc = jnp.broadcast_to(c.reshape(1, -1), (x.shape[0], c.size))
            h = jnp.concatenate([enc_d, dens.geo_feat, cc], axis=-1)
        else:
            h = jnp.concatenate([enc_d, dens.geo_feat], axis=-1)
        h_color = self.color_net(h).astype(jnp.float32)
        color = jax.nn.sigmoid(h_color) * (1 + 2 * 0.001) - 0.001

        if compute_uncertainty:
            # unc_net sees a detached encoding (network.py:247)
            unc_raw = self.unc_net(jax.lax.stop_gradient(enc_x))
            unc = jax.nn.softplus(unc_raw.astype(jnp.float32))[..., 0]
        else:
            unc = jnp.zeros_like(dens.sigma)

        return FieldOutputs(dens.sigma, color, dens.ambient_aud,
                            dens.ambient_eye, unc)

    def init_all(self, x, d, auds, c, e):
        """Touches every submodule so `field.init(key, ..., method='init_all')`
        creates the complete parameter tree (flax only materialises params on
        executed paths)."""
        enc_a = self.encode_audio(auds)
        return self(x, d, enc_a, c, e)


def make_fused_apply(field: "NeRFField", packed: dict, tile: int = 2048,
                     use_kernel: bool = False,
                     interp_dtype=jnp.float32):
    """field.apply-compatible closure for the serving hot path that runs the
    MLP stack through the folded-weight decomposition (ops/fused_field.py):
    per-frame constants (audio code, ind code, eye) fold into the weights,
    the ambient/uncertainty side-outputs and their broadcasts are dropped,
    and the concat-input layers become K-split matmul sums.

    use_kernel=True evaluates the stack as ONE Pallas kernel holding every
    intermediate in VMEM; the default evaluates the same decomposition as
    XLA matmuls. Measured on v5e (scripts/fusedbench.py, 2M samples): XLA
    chain 5.3 ms vs Pallas kernel ~11 ms — at 64-wide layers the kernel is
    dominated by per-grid-step overhead, so XLA's own fusion is the
    production default and the kernel stays available for re-evaluation.

    The triplane lookup stays in XLA (its gather is the measured-fastest
    path). Off-TPU use_kernel is ignored (interpreter-mode Pallas would
    crawl; the jnp decomposition is numerically identical). Forward-only:
    training keeps the flax path. Minimal outputs (ambient/uncertainty
    zeroed) — exactly what the serving render paths consume."""
    from ..ops.fused_field import (extract_field_weights, fold_frame_weights,
                                   fused_field_eval,
                                   fused_field_eval_reference)

    on_tpu = jax.default_backend() == "tpu"

    def apply_fused(p, pts, dirs, enc_a, c, e, compute_uncertainty=False):
        if compute_uncertainty:
            # the folded serving path drops the uncertainty/ambient heads
            # entirely — returning silent zeros here would feed an
            # uncertainty-weighted loss all-zero signals with no error
            raise ValueError(
                "the fused serving apply has no uncertainty head; use the "
                "full flax apply (training path) for "
                "compute_uncertainty=True")
        enc_x = field.apply(p, pts, packed=packed, method="encode_x",
                            interp_dtype=interp_dtype)
        fw = fold_frame_weights(extract_field_weights(p), enc_a, c, e)
        if use_kernel and on_tpu:
            sigma, color = fused_field_eval(fw, enc_x, dirs, tile=tile,
                                            interpret=False)
        else:
            sigma, color = fused_field_eval_reference(fw, enc_x, dirs)
        z = jnp.zeros_like(sigma)
        return FieldOutputs(sigma, color, z, z, z)

    return apply_fused


def torso_tiled_spec() -> GridSpec:
    # reference network.py:166
    return make_grid_spec(
        input_dim=2, num_levels=16, level_dim=2, base_resolution=16,
        log2_hashmap_size=16, desired_resolution=2048, gridtype="tiled",
    )


class TorsoField(nn.Module):
    """2-D deformation-field torso model (reference network.py:156-205).

    encoder="dense" (TPU flagship): the reference's 16-level x 2ch TILED
    hash grid needs 64 gather rows per point — 16.8M rows for a dense 512²
    torso pass, ~83 ms/frame on v5e (measured; it alone broke the 25 FPS
    budget). The corner-packed nested-octave pyramid (ops/packed_triplane,
    one gather row per point, bf16 table VMEM-resident) models the same
    smooth 2-D color/deform field at 512-cell resolution for ~0.5 ms.
    encoder="tiled" keeps the reference-exact grid (golden parity tests).
    """

    torso_shrink: float = 0.8
    ind_dim_torso: int = 8
    ind_num: int = 10_000
    dtype: jnp.dtype = jnp.float32
    encoder: str = "dense"

    def setup(self):
        self.anchor_points = self.param(
            "anchor_points",
            lambda k, s: jnp.asarray(
                [[0.01, 0.01, 0.1, 1.0],
                 [-0.1, -0.1, 0.1, 1.0],
                 [0.1, -0.1, 0.1, 1.0]], jnp.float32),
            (3, 4),
        )

        def table_init(key, shape, dtype=jnp.float32):
            return jax.random.uniform(key, shape, dtype,
                                      minval=-1e-4, maxval=1e-4)

        if self.encoder == "dense":
            dspec = DenseTriplaneSpec()
            self.dense_spec = dspec
            self.torso_planes = [
                self.param(f"torso_encoder_l{l}", table_init, (r + 1, r + 1, c))
                for l, (r, c) in enumerate(
                    zip(dspec.resolutions, dspec.channels))
            ]
            feat_dim = dspec.output_dim  # 12
        else:
            spec = torso_tiled_spec()
            self.spec = spec
            self.torso_encoder = self.param(
                "torso_encoder", table_init,
                (spec.total_params, spec.level_dim),
            )
            feat_dim = spec.output_dim  # 32

        # in dims: freq(2, deg8)=34 + freq(6, deg3)=42 + ind(8) = 84
        self.torso_deform_net = MLP(2, 32, 3, dtype=self.dtype)
        # feat_dim (grid) + 84
        self.torso_net = MLP(4, 32, 3, dtype=self.dtype)
        if self.ind_dim_torso > 0:
            self.individual_codes_torso = self.param(
                "individual_codes_torso",
                lambda k, s: jax.random.normal(k, s) * 0.1,
                (self.ind_num, self.ind_dim_torso),
            )

    def bake_table(self, dtype=None) -> Optional[jnp.ndarray]:
        """Corner-packed lookup table for serving (params static);
        None for the tiled encoder."""
        if self.encoder != "dense":
            return None
        return bake_packed(self.torso_planes, self.dense_spec,
                           dtype=dtype or jnp.float32)

    def __call__(self, x: jnp.ndarray, pose: jnp.ndarray,
                 c: Optional[jnp.ndarray] = None,
                 packed: Optional[jnp.ndarray] = None):
        """x: [N, 2] in [-1,1] screen coords; pose: [4, 4] head c2w.
        Returns (alpha [N,1], color [N,3], dx [N,2]);
        reference network.py:170-205."""
        N = x.shape[0]
        x = x * self.torso_shrink

        # project anchor points through the inverse transposed pose
        inv_pose_t = jnp.linalg.inv(pose.T)                     # [4,4]
        wrapped = self.anchor_points @ inv_pose_t               # [3,4]
        wrapped = (wrapped[:, :2] / wrapped[:, 3:4] / wrapped[:, 2:3]).reshape(1, -1)

        enc_anchor = freq_encode(wrapped, 3)                    # [1, 42]
        enc_x = freq_encode(x, 8)                               # [N, 34]

        parts = [enc_x, jnp.broadcast_to(enc_anchor, (N, enc_anchor.shape[-1]))]
        if c is not None:
            parts.append(jnp.broadcast_to(c.reshape(1, -1), (N, c.size)))
        h = jnp.concatenate(parts, axis=-1)

        dx = self.torso_deform_net(h)                           # [N, 2]
        xd = jnp.clip(x + dx, -1.0, 1.0)

        if self.encoder == "dense":
            feat = dense_triplane_encode(self.torso_planes, xd,
                                         self.dense_spec, bound=1.0,
                                         packed=packed)
        else:
            feat = grid_encode(xd, self.torso_encoder, self.spec, bound=1.0)
        h = jnp.concatenate([feat, h], axis=-1)
        h = self.torso_net(h).astype(jnp.float32)

        alpha = jax.nn.sigmoid(h[..., :1]) * (1 + 2 * 0.001) - 0.001
        color = jax.nn.sigmoid(h[..., 1:]) * (1 + 2 * 0.001) - 0.001
        return alpha, color, dx
