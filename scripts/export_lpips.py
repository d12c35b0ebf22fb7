"""Export official LPIPS-alex weights to the npz layout train/lpips.py loads.

Run this on any machine with the `lpips` pip package (this zero-egress build
image ships neither the package nor the checkpoints), then copy the npz to
~/.cache/lzzx/lpips_alex.npz (or point LZZX_LPIPS_NPZ at it). Training
(patch/lips LPIPS terms) and the LPIPS eval metric pick it up automatically
(lzzx_nerf_tpu/train/lpips.py get_params) — without it they fall back to a
fixed-seed random backbone labeled "rand-feat".

Layout (matching lzzx_nerf_tpu/train/lpips.py):
  conv0..conv4: [k, k, in_ch, out_ch]  (HWIO; torch OIHW is transposed)
  bias0..bias4: [out_ch]
  lin0..lin4:   [out_ch]               (the 1x1 non-negative heads)

Usage: python scripts/export_lpips.py --out lpips_alex.npz
"""

from __future__ import annotations

import argparse

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="lpips_alex.npz")
    args = ap.parse_args()

    import lpips as lpips_pkg  # pip install lpips

    net = lpips_pkg.LPIPS(net="alex", spatial=False)
    alex = net.net  # torchvision alexnet features wrapper
    convs = [m for m in alex.slice1] + [m for m in alex.slice2] + \
            [m for m in alex.slice3] + [m for m in alex.slice4] + \
            [m for m in alex.slice5]
    import torch

    conv_layers = [m for m in convs if isinstance(m, torch.nn.Conv2d)]
    assert len(conv_layers) == 5, [type(m) for m in convs]

    out = {}
    for i, c in enumerate(conv_layers):
        w = c.weight.detach().numpy()            # [O, I, k, k]
        out[f"conv{i}"] = np.transpose(w, (2, 3, 1, 0)).astype(np.float32)
        out[f"bias{i}"] = c.bias.detach().numpy().astype(np.float32)
    for i, lin in enumerate(net.lins):
        w = lin.model[-1].weight.detach().numpy()  # [1, C, 1, 1]
        out[f"lin{i}"] = w.reshape(-1).astype(np.float32)

    np.savez(args.out, **out)
    print(f"wrote {args.out}: " +
          ", ".join(f"{k}{v.shape}" for k, v in out.items()))


if __name__ == "__main__":
    main()
