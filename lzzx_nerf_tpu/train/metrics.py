"""Evaluation meters (reference nerf_triplane/utils.py:381-548)."""

from __future__ import annotations

import os
from typing import Optional

import jax.numpy as jnp
import numpy as np

from . import lpips as lpips_mod


def psnr(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    mse = jnp.mean((pred - gt) ** 2)
    return -10.0 * jnp.log10(jnp.maximum(mse, 1e-12))


class PSNRMeter:
    """Running PSNR (reference utils.py:381-415)."""

    def __init__(self):
        self.clear()

    def clear(self):
        self.V, self.N = 0.0, 0

    def update(self, pred, gt):
        self.V += float(psnr(jnp.asarray(pred), jnp.asarray(gt)))
        self.N += 1

    def measure(self) -> float:
        return self.V / max(self.N, 1)

    def report(self) -> str:
        return f"PSNR = {self.measure():.6f}"


class LPIPSMeter:
    """Running LPIPS-alex (reference utils.py:417-451). Uses pretrained
    weights when an npz path is given; otherwise a fixed random backbone
    (values then not comparable to official LPIPS — name says so)."""

    def __init__(self, weights_path: Optional[str] = None):
        self.params = lpips_mod.get_params(weights_path)
        self.pretrained = lpips_mod.is_pretrained(weights_path)
        self.clear()

    def clear(self):
        self.V, self.N = 0.0, 0

    def update(self, pred, gt):
        # [H, W, 3] in [0,1] -> [1, H, W, 3] in [-1, 1]
        p = jnp.asarray(pred)[None] * 2 - 1
        g = jnp.asarray(gt)[None] * 2 - 1
        self.V += float(lpips_mod.lpips(self.params, p, g)[0])
        self.N += 1

    def measure(self) -> float:
        return self.V / max(self.N, 1)

    def report(self) -> str:
        name = "LPIPS (alex)" if self.pretrained else "LPIPS (alex, rand-feat)"
        return f"{name} = {self.measure():.6f}"


class LMDMeter:
    """Mouth landmark distance (reference utils.py:454-548). Needs a facial
    landmark backend; `face_alignment`/`dlib` are optional — when absent the
    meter reports n/a instead of failing the eval loop."""

    def __init__(self, backend: str = "fan",
                 dlib_predictor_path: str = "", region: str = "mouth"):
        if region not in ("mouth", "face"):
            raise ValueError(f"region must be mouth|face, got {region!r}")
        self.backend = backend
        self.region = region   # reference utils.py:455-458: mouth or face
        self.predictor = None
        self.detector = None
        try:
            if backend == "dlib":
                # reference utils.py:459-468: frontal detector + 68-point
                # shape predictor (shape_predictor_68_face_landmarks.dat,
                # http://dlib.net/files/...bz2)
                import dlib

                path = dlib_predictor_path or os.path.expanduser(
                    "~/.cache/lzzx/shape_predictor_68_face_landmarks.dat")
                if not os.path.exists(path):
                    raise ImportError(
                        f"dlib shape predictor not found at {path}")
                self.detector = dlib.get_frontal_face_detector()
                self.predictor = dlib.shape_predictor(path)
            else:
                import face_alignment  # noqa

                self.predictor = face_alignment.FaceAlignment(
                    face_alignment.LandmarksType.TWO_D, flip_input=False)
        except ImportError:
            self.predictor = None
        self.clear()

    def clear(self):
        self.V, self.N = 0.0, 0

    def get_landmarks(self, img: np.ndarray):
        if self.predictor is None:
            return None
        u8 = np.asarray(img * 255, np.uint8)
        if self.backend == "dlib":
            # reference utils.py:483-495
            faces = self.detector(u8, 1)
            if len(faces) == 0:
                return None
            shape = self.predictor(u8, faces[0])
            return np.array([[pt.x, pt.y] for pt in shape.parts()],
                            np.float32)
        lms = self.predictor.get_landmarks(u8)
        return None if not lms else lms[-1]

    def update(self, pred, gt):
        if self.predictor is None:
            return
        lp = self.get_landmarks(np.asarray(pred))
        lg = self.get_landmarks(np.asarray(gt))
        if lp is None or lg is None:
            return
        # region landmarks (mouth = 48:68 of the 68-point layout), then
        # centre each set before the distance (utils.py:528-537)
        if self.region == "mouth":
            lp, lg = lp[48:68], lg[48:68]
        lp = lp - lp.mean(0)
        lg = lg - lg.mean(0)
        self.V += float(np.linalg.norm(lp - lg, axis=-1).mean())
        self.N += 1

    def measure(self) -> float:
        return self.V / max(self.N, 1)

    def report(self) -> str:
        if self.predictor is None:
            return "LMD = n/a (no landmark backend installed)"
        return f"LMD ({self.region}) = {self.measure():.6f}"
