"""Generate the synthetic-DSB parity dataset shared by both framework sides.

The environment has no network egress, so the real DSB archive cannot be
downloaded and the reference cannot be installed in full (elf/kornia/skimage
are absent).  To still measure *framework* parity (reference README.md:28-70
recipe: 2D U-Net, foreground+boundary targets, Dice loss), we generate a
DSB-like nucleus dataset once and train BOTH sides on the identical files:

- the reference's own pure-torch ``model/unet.py`` + ``loss/dice.py``
  (loaded standalone from /root/reference) with a training loop that
  replicates ``DefaultTrainer`` semantics, on CPU;
- this repo's full pipeline (TensorDataset -> loader -> DefaultTrainer) on TPU.

Targets (foreground + thick boundary, the reference ``boundaries=True`` DSB
recipe, reference torch_em/transform/label.py:100-131) are precomputed into
the files so that neither side's label-transform stack is a variable.

Images: 256x256, ~30-60 nucleus blobs obtained by thresholding the intra-cell
EDT of a space-filling watershed over smoothed noise (same construction idea
as reference util/test.py:14 ``make_gt``), per-instance intensities, blur and
noise -- visually close to fluorescence DSB.
"""

import argparse
import os

import h5py
import numpy as np
from scipy import ndimage

from torch_em_tpu.ops import native
from torch_em_tpu.transforms.label import BoundaryTransform


def make_image(rng: np.random.Generator, size: int = 128):
    shape = (size, size)
    n_seeds = int(rng.integers(10, 20))
    seeds = np.zeros(shape, dtype="uint32")
    coords = (rng.integers(0, size, n_seeds), rng.integers(0, size, n_seeds))
    seeds[coords] = np.arange(1, n_seeds + 1)
    hmap = ndimage.gaussian_filter(rng.random(shape, dtype=np.float32), 2.0)
    ws = native.watershed(hmap, seeds)

    # carve nuclei out of the space-filling regions: keep the EDT core of each
    labels = np.zeros(shape, dtype="uint32")
    raw = np.full(shape, 0.08, dtype="float32")
    next_id = 1
    for region_id in np.unique(ws):
        mask = ws == region_id
        edt = ndimage.distance_transform_edt(mask)
        rmax = edt.max()
        if rmax < 3:  # too small to host a nucleus
            continue
        tau = rng.uniform(0.25, 0.55) * rmax
        nucleus = edt > max(tau, 1.5)
        if nucleus.sum() < 12:
            continue
        labels[nucleus] = next_id
        raw[nucleus] = rng.uniform(0.35, 0.95)
        next_id += 1

    raw = ndimage.gaussian_filter(raw, 1.0)
    raw = raw + rng.normal(0.0, 0.04, shape).astype("float32")
    raw = np.clip(raw, 0.0, 1.0).astype("float32")
    return raw, labels


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-o", "--output", default="./parity_data")
    parser.add_argument("--n-train", type=int, default=128)
    parser.add_argument("--n-val", type=int, default=16)
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--size", type=int, default=128,
                        help="image side; 256 = the tracked DSB config scale")
    args = parser.parse_args()

    os.makedirs(args.output, exist_ok=True)
    rng = np.random.default_rng(args.seed)
    trafo = BoundaryTransform(mode="thick", add_binary_target=True, ndim=2)

    for split, n in (("train", args.n_train), ("val", args.n_val)):
        raws, labs, tgts = [], [], []
        for _ in range(n):
            raw, labels = make_image(rng, size=args.size)
            raws.append(raw)
            labs.append(labels)
            tgts.append(trafo(labels).astype("float32"))
        path = os.path.join(args.output, f"{split}.h5")
        with h5py.File(path, "w") as f:
            f.create_dataset("raw", data=np.stack(raws), compression="gzip")
            f.create_dataset("labels", data=np.stack(labs), compression="gzip")
            f.create_dataset("targets", data=np.stack(tgts), compression="gzip")
        print(f"wrote {path}: raw {np.stack(raws).shape}, targets {np.stack(tgts).shape}")


if __name__ == "__main__":
    main()
