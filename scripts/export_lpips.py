"""Export official LPIPS-alex weights to the npz layout train/lpips.py loads.

Run this on any machine with the `lpips` pip package (this zero-egress build
image ships neither the package nor the checkpoints), then copy the npz to
~/.cache/lzzx/lpips_alex.npz (or point LZZX_LPIPS_NPZ at it). Training
(patch/lips LPIPS terms) and the LPIPS eval metric pick it up automatically
(lzzx_nerf_tpu/train/lpips.py get_params) — without it they fall back to a
fixed-seed random backbone labeled "rand-feat".

Sources (first that applies):
  --alexnet-ckpt PATH   a torch checkpoint holding the torchvision AlexNet
                        state_dict (features.{0,3,6,8,10}.{weight,bias}) —
                        no `lpips` package needed. Combine with
                        --lpips-ckpt PATH (the official LPIPS linear-head
                        .pth, keys lin{i}.model.*.weight) for calibrated
                        heads; without it the heads are uniform 1/C and the
                        npz is a perceptual FEATURE distance, not calibrated
                        LPIPS (loudly noted).
  (default)             the `lpips` pip package downloads/provides both.

Layout (matching lzzx_nerf_tpu/train/lpips.py):
  conv0..conv4: [k, k, in_ch, out_ch]  (HWIO; torch OIHW is transposed)
  bias0..bias4: [out_ch]
  lin0..lin4:   [out_ch]               (the 1x1 non-negative heads)

Usage: python scripts/export_lpips.py --out lpips_alex.npz
       python scripts/export_lpips.py --alexnet-ckpt alexnet.pth \
              [--lpips-ckpt lpips_lins.pth] --out lpips_alex.npz
"""

from __future__ import annotations

import argparse

import numpy as np

_ALEX_FEATURE_IDX = (0, 3, 6, 8, 10)  # torchvision alexnet conv positions


def _from_lpips_package(out):
    import lpips as lpips_pkg  # pip install lpips

    net = lpips_pkg.LPIPS(net="alex", spatial=False)
    alex = net.net  # torchvision alexnet features wrapper
    convs = [m for m in alex.slice1] + [m for m in alex.slice2] + \
            [m for m in alex.slice3] + [m for m in alex.slice4] + \
            [m for m in alex.slice5]
    import torch

    conv_layers = [m for m in convs if isinstance(m, torch.nn.Conv2d)]
    assert len(conv_layers) == 5, [type(m) for m in convs]

    for i, c in enumerate(conv_layers):
        w = c.weight.detach().numpy()            # [O, I, k, k]
        out[f"conv{i}"] = np.transpose(w, (2, 3, 1, 0)).astype(np.float32)
        out[f"bias{i}"] = c.bias.detach().numpy().astype(np.float32)
    for i, lin in enumerate(net.lins):
        w = lin.model[-1].weight.detach().numpy()  # [1, C, 1, 1]
        out[f"lin{i}"] = w.reshape(-1).astype(np.float32)


def _load_state_dict(path):
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    if "state_dict" in sd and isinstance(sd["state_dict"], dict):
        sd = sd["state_dict"]
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
            for k, v in sd.items()}


def _from_checkpoints(out, alexnet_ckpt, lpips_ckpt):
    sd = _load_state_dict(alexnet_ckpt)
    for i, fi in enumerate(_ALEX_FEATURE_IDX):
        w = sd[f"features.{fi}.weight"]          # [O, I, k, k]
        out[f"conv{i}"] = np.transpose(w, (2, 3, 1, 0)).astype(np.float32)
        out[f"bias{i}"] = sd[f"features.{fi}.bias"].astype(np.float32)
    if lpips_ckpt:
        lsd = _load_state_dict(lpips_ckpt)
        for i in range(5):
            # official LPIPS linear .pth: lin{i}.model.1.weight [1, C, 1, 1]
            key = next(k for k in lsd
                       if k.startswith(f"lin{i}.") and k.endswith("weight"))
            out[f"lin{i}"] = lsd[key].reshape(-1).astype(np.float32)
    else:
        print("NOTE: no --lpips-ckpt given — writing UNIFORM 1/C linear "
              "heads. The npz is a perceptual feature distance over "
              "pretrained AlexNet taps, NOT calibrated LPIPS; values are "
              "not comparable to official LPIPS numbers.")
        for i in range(5):
            c = out[f"conv{i}"].shape[-1]
            out[f"lin{i}"] = np.full(c, 1.0 / c, np.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="lpips_alex.npz")
    ap.add_argument("--alexnet-ckpt", default=None,
                    help="torchvision AlexNet state_dict checkpoint (skips "
                         "the `lpips` package)")
    ap.add_argument("--lpips-ckpt", default=None,
                    help="official LPIPS linear-head .pth (with "
                         "--alexnet-ckpt)")
    args = ap.parse_args()

    out = {}
    if args.alexnet_ckpt:
        _from_checkpoints(out, args.alexnet_ckpt, args.lpips_ckpt)
    else:
        _from_lpips_package(out)

    np.savez(args.out, **out)
    print(f"wrote {args.out}: " +
          ", ".join(f"{k}{v.shape}" for k, v in out.items()))


if __name__ == "__main__":
    main()
