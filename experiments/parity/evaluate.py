"""Shared evaluator for the DSB parity experiment: computes per-channel soft
Dice of each side's best-model val predictions against the common targets
(the reference's dice formula, torch_em/loss/dice.py:34) and writes the
comparison table consumed by PARITY.md.

Run after both train scripts: python evaluate.py -d ./parity_data -o ./parity_out
"""

import argparse
import json
import os

import h5py
import numpy as np

from torch_em_tpu.transforms.label import BoundaryTransform


def dice_per_channel(pred: np.ndarray, target: np.ndarray, eps: float = 1e-7) -> np.ndarray:
    """Soft Dice per channel over the whole set (channel-first flatten)."""
    c = pred.shape[1]
    p = np.transpose(pred, (1, 0, 2, 3)).reshape(c, -1)
    t = np.transpose(target, (1, 0, 2, 3)).reshape(c, -1)
    num = (p * t).sum(axis=1)
    den = np.maximum((p * p).sum(axis=1) + (t * t).sum(axis=1), eps)
    return 2 * num / den


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-d", "--data", default="./parity_data")
    parser.add_argument("-o", "--output", default="./parity_out")
    args = parser.parse_args()

    trafo = BoundaryTransform(mode="thick", add_binary_target=True, ndim=2)
    with h5py.File(os.path.join(args.data, "val.h5"), "r") as f:
        targets = np.stack([trafo(lab).astype("float32") for lab in f["labels"][:]])

    rows = {}
    for side, fname in (("reference-torch", "ref_torch_preds.h5"),
                        ("torch_em_tpu", "tpu_preds.h5")):
        path = os.path.join(args.output, fname)
        if not os.path.exists(path):
            print(f"missing {path} — run the {side} training first")
            continue
        with h5py.File(path, "r") as f:
            preds = f["preds"][:]
        fg, bd = dice_per_channel(preds, targets)
        rows[side] = {"dice_foreground": round(float(fg), 4),
                      "dice_boundary": round(float(bd), 4),
                      "dice_mean": round(float((fg + bd) / 2), 4)}

    if len(rows) == 2:
        gap = abs(rows["reference-torch"]["dice_mean"] - rows["torch_em_tpu"]["dice_mean"])
        rows["abs_gap_mean_dice"] = round(float(gap), 4)
    print(json.dumps(rows, indent=2))
    with open(os.path.join(args.output, "parity_table.json"), "w") as f:
        json.dump(rows, f, indent=2)


if __name__ == "__main__":
    main()
