"""Convert the Basel Face Model 2009 into the tracker's 3DMM_info.npy.

Equivalent of the reference's data_utils/face_tracking/convert_BFM.py: reads
01_MorphableModel.mat (obtain from the BFM distributors — the model is not
redistributable), exp_info.npy (the 79-dim expression basis) and
topology_info.npy (sub_inds + tris) from --bfm-dir and writes 3DMM_info.npy
there. Also carries the triangle topology into 3DMM_info.npy so the
photometric stage (preprocess/face_tracking.py render_photometric) can
compute vertex normals without re-reading topology_info.npy.

Usage: python scripts/convert_bfm.py --bfm-dir data/3DMM
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bfm-dir", default="data/3DMM")
    args = ap.parse_args()
    d = args.bfm_dir

    from scipy.io import loadmat

    bfm = loadmat(os.path.join(d, "01_MorphableModel.mat"))
    topo = np.load(os.path.join(d, "topology_info.npy"),
                   allow_pickle=True).item()
    sub_inds = topo["sub_inds"]

    def principal(pc):
        # [3N_full, K] -> [K, N_sub*3] restricted to the tracker's sub-mesh
        k = pc.shape[-1]
        b = pc.reshape(-1, k).transpose(1, 0).reshape(k, -1, 3)
        return b[:, sub_inds, :].reshape(k, -1)

    info = {
        "mu_shape": bfm["shapeMU"].reshape(-1, 3)[sub_inds].reshape(-1),
        "b_shape": principal(bfm["shapePC"]),
        "sig_shape": bfm["shapeEV"].reshape(-1),
        "mu_tex": bfm["texMU"].reshape(-1, 3)[sub_inds].reshape(-1),
        "b_tex": principal(bfm["texPC"]),
        "sig_tex": bfm["texEV"].reshape(-1),
    }
    exp_info = np.load(os.path.join(d, "exp_info.npy"),
                       allow_pickle=True).item()
    info["mu_exp"] = exp_info["mu_exp"]
    info["b_exp"] = exp_info["base_exp"]
    info["sig_exp"] = exp_info["sig_exp"]
    if "tris" in topo:
        info["tris"] = np.asarray(topo["tris"], np.int64)

    out = os.path.join(d, "3DMM_info.npy")
    np.save(out, info)
    print(f"wrote {out}: "
          + ", ".join(f"{k}{np.asarray(v).shape}" for k, v in info.items()))


if __name__ == "__main__":
    main()
