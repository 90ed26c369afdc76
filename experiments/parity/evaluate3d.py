"""Shared evaluator for the CREMI-style 3D parity experiment: soft Dice of
each side's best-model predictions on the fixed val patches vs the common
boundary targets. Run after both 3d train scripts."""

import argparse
import json
import os

import h5py
import numpy as np

from torch_em_tpu.transforms.label import BoundaryTransform

PATCH = (8, 64, 64)


def soft_dice(pred, target, eps=1e-7):
    p, t = pred.reshape(-1), target.reshape(-1)
    return float(2 * (p * t).sum() / max((p * p).sum() + (t * t).sum(), eps))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-d", "--data", default="./parity_data3d")
    parser.add_argument("-o", "--output", default="./parity_out3d")
    parser.add_argument("--patch", default="8,64,64",
                        help="eval patch z,y,x — must match the preds files")
    args = parser.parse_args()
    global PATCH
    PATCH = tuple(int(s) for s in args.patch.split(","))

    from glob import glob

    trafo = BoundaryTransform(mode="thick", ndim=3)
    labs = []
    for path in sorted(glob(os.path.join(args.data, "val", "vol*.h5"))):
        with h5py.File(path, "r") as f:
            labs.append(f["labels"][:])
    targets = np.stack([trafo(lab).astype("float32")[0] for lab in labs])
    targets = targets[:, None, :PATCH[0], :PATCH[1], :PATCH[2]]

    rows = {}
    for side, fname in (("reference-torch", "ref_torch_preds3d.h5"),
                        ("torch_em_tpu", "tpu_preds3d.h5")):
        path = os.path.join(args.output, fname)
        if not os.path.exists(path):
            print(f"missing {path}")
            continue
        with h5py.File(path, "r") as f:
            preds = f["preds"][:]
        rows[side] = {"dice_boundary": round(soft_dice(preds, targets), 4)}

    if len(rows) == 2:
        rows["abs_gap"] = round(abs(rows["reference-torch"]["dice_boundary"]
                                    - rows["torch_em_tpu"]["dice_boundary"]), 4)
    print(json.dumps(rows, indent=2))
    with open(os.path.join(args.output, "parity_table3d.json"), "w") as f:
        json.dump(rows, f, indent=2)


if __name__ == "__main__":
    main()
