"""Generate tests/fixtures/lpips_fixture.npz — a CI stand-in for LPIPS-alex.

This zero-egress build image cannot produce the official LPIPS-alex
checkpoint (reference TrainerUtil.py:121-135 trains lips against it), so the
lips-finetune path would otherwise never execute its ACTUAL criterion in CI.
This fixture is a narrow AlexNet-layout weight set (same kernel sizes,
strides, pads and key layout as scripts/export_lpips.py writes — only the
channel widths are reduced) so `train/lpips.py` runs the identical code path
(load_weights -> _features -> lpips forward/backward) at test size.

The values are deterministic (fixed seed, He-scaled convs, non-negative lin
heads); the fixture's sha256 is asserted in tests/test_train.py so a drifted
or corrupted fixture fails loudly. It is NOT a perceptual metric — tests
only use it to drive the finetune-lips training path end to end.

Usage: python scripts/make_lpips_fixture.py   (writes tests/fixtures/)
"""

from __future__ import annotations

import hashlib
import os

import numpy as np

# (out_ch, kernel) — kernels/strides/pads match train/lpips.py _ALEX;
# channels reduced ~8x so the committed file stays small
_NARROW = ((8, 11), (24, 5), (48, 3), (32, 3), (32, 3))


def build(seed: int = 7) -> dict:
    rng = np.random.default_rng(seed)
    out = {}
    in_ch = 3
    for i, (out_ch, k) in enumerate(_NARROW):
        fan_in = in_ch * k * k
        out[f"conv{i}"] = (rng.standard_normal((k, k, in_ch, out_ch))
                           * np.sqrt(2.0 / fan_in)).astype(np.float32)
        out[f"bias{i}"] = (rng.standard_normal(out_ch)
                           * 0.01).astype(np.float32)
        out[f"lin{i}"] = (rng.uniform(0, 1, (out_ch,))
                          / out_ch).astype(np.float32)
        in_ch = out_ch
    return out


def main():
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "fixtures",
        "lpips_fixture.npz")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    arrs = build()
    # deterministic bytes: savez writes zip entries with fixed metadata only
    # when we control the order; write uncompressed for byte stability
    np.savez(path, **{k: arrs[k] for k in sorted(arrs)})
    digest = hashlib.sha256(open(path, "rb").read()).hexdigest()
    size = os.path.getsize(path)
    print(f"wrote {path} ({size} B)\nsha256: {digest}")


if __name__ == "__main__":
    main()
