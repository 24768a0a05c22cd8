"""Export LPIPS(alex) weights to a self-contained .npz.

Run ONCE on any machine with network access (torchvision downloads the
AlexNet trunk; the LPIPS linear head comes from the `lpips` package or
its checkpoint file):

    python -m ingp_tpu.utils.export_lpips lpips_alex.npz

then point training at it:

    python -m ingp_tpu.train ... --eval_lpips --lpips_weights lpips_alex.npz

The offline evaluator (training/lpips.py) never touches the network.
Reference: train.py:94-97 (torchmetrics LPIPS 'alex').
"""
from __future__ import annotations

import sys

import numpy as np


def export(out_path: str, lins_path: str | None = None) -> None:
    try:
        import torch
        from torchvision.models import alexnet, AlexNet_Weights
    except ImportError as e:
        raise SystemExit(
            f"export_lpips needs torch + torchvision ({e}); run it on an "
            "online machine and copy the .npz here") from e

    net = alexnet(weights=AlexNet_Weights.IMAGENET1K_V1).features.eval()
    convs = [m for m in net if isinstance(m, torch.nn.Conv2d)]
    out = {}
    for i, c in enumerate(convs):
        # torch OIHW -> HWIO
        out[f"conv{i}_w"] = c.weight.detach().numpy().transpose(2, 3, 1, 0)
        out[f"conv{i}_b"] = c.bias.detach().numpy()

    if lins_path is None:
        try:
            import lpips as lpips_pkg
            import os
            lins_path = os.path.join(
                os.path.dirname(lpips_pkg.__file__), "weights", "v0.1",
                "alex.pth")
        except ImportError as e:
            raise SystemExit(
                "pass the LPIPS v0.1 alex.pth path explicitly (from "
                f"https://github.com/richzhang/PerceptualSimilarity): {e}"
            ) from e
    lins = torch.load(lins_path, map_location="cpu")
    for i in range(5):
        out[f"lin{i}"] = (
            lins[f"lin{i}.model.1.weight"].detach().numpy().reshape(-1))

    # ScalingLayer buffers (richzhang/PerceptualSimilarity lpips.py)
    out["shift"] = np.asarray([-0.030, -0.088, -0.188], np.float32)
    out["scale"] = np.asarray([0.458, 0.448, 0.450], np.float32)
    np.savez(out_path, **out)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    if len(sys.argv) < 2:
        raise SystemExit("usage: python -m ingp_tpu.utils.export_lpips "
                         "OUT.npz [alex_lins.pth]")
    export(sys.argv[1], sys.argv[2] if len(sys.argv) > 2 else None)
