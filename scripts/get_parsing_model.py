"""Fetch/convert a concrete face-parsing backend for preprocess task 4.

The reference pins ModelScope M2FP (damo/cv_resnet101_image-multiple-human-
parsing, data_utils/face_parsing_by_m2fp/m2fp.py:36-42). This script makes
task 4 runnable without out-of-band work by providing BOTH backends:

  modelscope  — warm the reference's own M2FP pipeline cache:
                  python scripts/get_parsing_model.py modelscope
                (needs `pip install modelscope` + network once)

  bisenet     — convert the standard BiSeNet CelebAMask-HQ face parser
                (zllrunning/face-parsing.PyTorch, checkpoint `79999_iter.pth`,
                pinned: https://github.com/zllrunning/face-parsing.PyTorch
                → model link in its README, Google Drive id
                154JgKpzCPW82qINcVieuPH3fZ2e0P812) into a SELF-CONTAINED
                TorchScript module matching lzzx_nerf_tpu/preprocess/
                parsing.py's contract ([1,3,H,W] RGB in [0,1] ->
                [1,19,H,W] CelebAMask-HQ logits; ImageNet normalization and
                the 512x512 eval resize are folded inside):
                  python scripts/get_parsing_model.py bisenet \
                      --weights 79999_iter.pth [--out PATH]
                then `export LZZX_PARSER_TS=PATH` (default
                ~/.cache/lzzx/face_parsing_bisenet.ts).

The BiSeNet implementation below is written for this exporter; checkpoint
tensors are assigned by ORDERED SHAPE MATCHING (state-dict insertion order
follows module definition order), so it tolerates differing parameter names
and fails loudly with a diff when the architecture doesn't line up.
"""

from __future__ import annotations

import argparse
import os
from typing import List, Tuple

import torch
import torch.nn as nn
import torch.nn.functional as F

N_CLASSES = 19
DEFAULT_OUT = os.path.expanduser("~/.cache/lzzx/face_parsing_bisenet.ts")


class ConvBNReLU(nn.Module):
    def __init__(self, cin: int, cout: int, ks: int = 3, stride: int = 1):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, ks, stride, ks // 2, bias=False)
        self.bn = nn.BatchNorm2d(cout)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


class BasicBlock(nn.Module):
    def __init__(self, cin: int, cout: int, stride: int = 1):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(cout)
        self.conv2 = nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(cout)
        self.down: nn.Module = nn.Identity()
        if stride != 1 or cin != cout:
            self.down = nn.Sequential(
                nn.Conv2d(cin, cout, 1, stride, bias=False),
                nn.BatchNorm2d(cout))

    def forward(self, x):
        y = self.bn2(self.conv2(F.relu(self.bn1(self.conv1(x)))))
        return F.relu(y + self.down(x))


class ResNet18(nn.Module):
    """torchvision-layout ResNet-18 trunk returning /8, /16, /32 features."""

    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        self.layer1 = nn.Sequential(BasicBlock(64, 64), BasicBlock(64, 64))
        self.layer2 = nn.Sequential(BasicBlock(64, 128, 2),
                                    BasicBlock(128, 128))
        self.layer3 = nn.Sequential(BasicBlock(128, 256, 2),
                                    BasicBlock(256, 256))
        self.layer4 = nn.Sequential(BasicBlock(256, 512, 2),
                                    BasicBlock(512, 512))

    def forward(self, x) -> Tuple[torch.Tensor, torch.Tensor, torch.Tensor]:
        x = self.maxpool(F.relu(self.bn1(self.conv1(x))))
        x = self.layer1(x)
        f8 = self.layer2(x)
        f16 = self.layer3(f8)
        f32 = self.layer4(f16)
        return f8, f16, f32


class AttentionRefinement(nn.Module):
    def __init__(self, cin: int, cout: int):
        super().__init__()
        self.conv = ConvBNReLU(cin, cout, 3)
        self.conv_atten = nn.Conv2d(cout, cout, 1, bias=False)
        self.bn_atten = nn.BatchNorm2d(cout)

    def forward(self, x):
        feat = self.conv(x)
        atten = F.adaptive_avg_pool2d(feat, 1)
        atten = torch.sigmoid(self.bn_atten(self.conv_atten(atten)))
        return feat * atten


class ContextPath(nn.Module):
    def __init__(self):
        super().__init__()
        self.resnet = ResNet18()
        self.arm16 = AttentionRefinement(256, 128)
        self.arm32 = AttentionRefinement(512, 128)
        self.conv_head32 = ConvBNReLU(128, 128, 3)
        self.conv_head16 = ConvBNReLU(128, 128, 3)
        self.conv_avg = ConvBNReLU(512, 128, 1)

    def forward(self, x) -> Tuple[torch.Tensor, torch.Tensor]:
        f8, f16, f32 = self.resnet(x)
        avg = self.conv_avg(F.adaptive_avg_pool2d(f32, 1))
        f32 = self.arm32(f32) + avg
        f32 = self.conv_head32(
            F.interpolate(f32, size=[int(f16.shape[2]), int(f16.shape[3])],
                          mode="nearest"))
        f16 = self.arm16(f16) + f32
        f16 = self.conv_head16(
            F.interpolate(f16, size=[int(f8.shape[2]), int(f8.shape[3])],
                          mode="nearest"))
        return f8, f16   # spatial(/8, 128ch via layer2), context(/8, 128ch)


class FeatureFusion(nn.Module):
    def __init__(self, cin: int, cout: int):
        super().__init__()
        self.convblk = ConvBNReLU(cin, cout, 1)
        self.conv1 = nn.Conv2d(cout, cout // 4, 1, bias=False)
        self.conv2 = nn.Conv2d(cout // 4, cout, 1, bias=False)

    def forward(self, sp, cp):
        feat = self.convblk(torch.cat([sp, cp], dim=1))
        atten = F.adaptive_avg_pool2d(feat, 1)
        atten = torch.sigmoid(self.conv2(F.relu(self.conv1(atten))))
        return feat + feat * atten


class SegHead(nn.Module):
    def __init__(self, cin: int, mid: int, n_classes: int):
        super().__init__()
        self.conv = ConvBNReLU(cin, mid, 3)
        self.conv_out = nn.Conv2d(mid, n_classes, 1, bias=False)

    def forward(self, x):
        return self.conv_out(self.conv(x))


class BiSeNet(nn.Module):
    """BiSeNet face parser (CelebAMask-HQ, 19 classes): the /8 backbone
    feature doubles as the spatial path (the face-parsing variant drops the
    separate spatial CNN). Aux heads exist so the checkpoint's tensor
    sequence lines up; inference uses the fused head only."""

    def __init__(self, n_classes: int = N_CLASSES):
        super().__init__()
        self.cp = ContextPath()
        self.ffm = FeatureFusion(256, 256)
        self.conv_out = SegHead(256, 256, n_classes)
        self.conv_out16 = SegHead(128, 64, n_classes)
        self.conv_out32 = SegHead(128, 64, n_classes)

    def forward(self, x):
        h, w = int(x.shape[2]), int(x.shape[3])
        sp, cp = self.cp(x)
        fused = self.ffm(sp, cp)
        out = self.conv_out(fused)
        return F.interpolate(out, size=[h, w], mode="bilinear",
                             align_corners=True)


class ParsingModule(nn.Module):
    """The exported contract module: RGB [1,3,H,W] in [0,1] -> logits
    [1,19,H,W]. ImageNet normalization + the 512x512 eval resize live
    inside, so preprocess/parsing.py needs no model-specific knowledge."""

    def __init__(self, net: BiSeNet, eval_size: int = 512):
        super().__init__()
        self.net = net
        self.eval_size = eval_size
        self.register_buffer(
            "mean", torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1))
        self.register_buffer(
            "std", torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1))

    def forward(self, x):
        h, w = int(x.shape[2]), int(x.shape[3])
        x = (x - self.mean) / self.std
        x = F.interpolate(x, size=[self.eval_size, self.eval_size],
                          mode="bilinear", align_corners=False)
        logits = self.net(x)
        return F.interpolate(logits, size=[h, w], mode="bilinear",
                             align_corners=False)


def assign_by_shape_order(model: nn.Module, src: dict) -> List[str]:
    """Assign source tensors to model parameters/buffers by ORDERED SHAPE
    MATCHING: both sequences follow module definition order, so an
    isomorphic architecture lines up even when names differ. num_batches
    -tracked counters are skipped on both sides. Raises with a positional
    diff when the sequences disagree. Returns the matched source keys."""
    dst_items = [(k, v) for k, v in model.state_dict().items()
                 if "num_batches_tracked" not in k and v.ndim > 0]
    src_items = [(k, v) for k, v in src.items()
                 if "num_batches_tracked" not in k
                 and getattr(v, "ndim", 0) > 0]
    if len(dst_items) != len(src_items):
        raise SystemExit(
            f"[ERROR] tensor count mismatch: model has {len(dst_items)}, "
            f"checkpoint has {len(src_items)} — wrong architecture/"
            "checkpoint pairing?\n  first model keys: "
            + ", ".join(k for k, _ in dst_items[:5])
            + "\n  first ckpt keys: "
            + ", ".join(k for k, _ in src_items[:5]))
    new_sd = dict(model.state_dict())
    for i, ((dk, dv), (sk, sv)) in enumerate(zip(dst_items, src_items)):
        if tuple(dv.shape) != tuple(sv.shape):
            raise SystemExit(
                f"[ERROR] shape mismatch at position {i}: model {dk} "
                f"{tuple(dv.shape)} vs checkpoint {sk} {tuple(sv.shape)}")
        new_sd[dk] = sv.to(dv.dtype)
    model.load_state_dict(new_sd)
    return [k for k, _ in src_items]


def export_bisenet(weights: str | None, out: str,
                   eval_size: int = 512) -> str:
    net = BiSeNet()
    if weights:
        sd = torch.load(weights, map_location="cpu", weights_only=False)
        sd = sd.get("state_dict", sd) if isinstance(sd, dict) else sd
        sd = {k.replace("module.", ""): v for k, v in sd.items()}
        matched = assign_by_shape_order(net, sd)
        print(f"loaded {len(matched)} tensors from {weights}")
    module = ParsingModule(net.eval(), eval_size=eval_size).eval()
    scripted = torch.jit.script(module)
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    scripted.save(out)
    print(f"TorchScript parser written to {out}\n"
          f"  export LZZX_PARSER_TS={out}")
    return out


def warm_modelscope() -> None:
    from modelscope.pipelines import pipeline
    from modelscope.utils.constant import Tasks

    pipeline(Tasks.image_segmentation,
             "damo/cv_resnet101_image-multiple-human-parsing")
    print("modelscope M2FP cache warmed "
          "(damo/cv_resnet101_image-multiple-human-parsing)")


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)
    b = sub.add_parser("bisenet")
    b.add_argument("--weights", default=None,
                   help="79999_iter.pth from zllrunning/face-parsing.PyTorch"
                        " (omit for a random-weights contract export)")
    b.add_argument("--out", default=DEFAULT_OUT)
    b.add_argument("--eval-size", type=int, default=512)
    sub.add_parser("modelscope")
    args = ap.parse_args()
    if args.cmd == "bisenet":
        export_bisenet(args.weights, args.out, args.eval_size)
    else:
        warm_modelscope()


if __name__ == "__main__":
    main()
