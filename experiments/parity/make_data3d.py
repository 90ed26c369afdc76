"""Synthetic CREMI-like 3D data for the second parity experiment (boundary
segmentation with an AnisotropicUNet — the reference CREMI recipe shape).

Labels: space-filling neuron-like 3D segments (watershed over smoothed noise,
anisotropic in z like CREMI). Raw: EM-membrane-like image — dark membranes at
segment boundaries on a textured background, blurred + noise.
"""

import argparse
import os

import h5py
import numpy as np
from scipy import ndimage

from torch_em_tpu.ops import native
from torch_em_tpu.ops.host import find_boundaries


def make_volume(rng: np.random.Generator, shape=(24, 96, 96)):
    shape = tuple(shape)
    n_seeds = max(int(np.prod(shape) // 3000), 8)
    seeds = np.zeros(shape, dtype="uint32")
    coords = tuple(rng.integers(0, s, n_seeds) for s in shape)
    seeds[coords] = np.arange(1, n_seeds + 1)
    hmap = ndimage.gaussian_filter(rng.random(shape, dtype=np.float32),
                                   (1.0, 3.0, 3.0))  # anisotropic like CREMI
    labels = native.watershed(hmap, seeds)

    membranes = find_boundaries(labels, mode="thick").astype("float32")
    raw = 0.75 - 0.55 * ndimage.gaussian_filter(membranes, (0.5, 1.0, 1.0))
    raw = raw + 0.08 * ndimage.gaussian_filter(rng.random(shape, dtype=np.float32), 1.0)
    raw = np.clip(raw + rng.normal(0, 0.03, shape), 0, 1).astype("float32")
    return raw, labels.astype("uint32")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-o", "--output", default="./parity_data3d")
    parser.add_argument("--n-train", type=int, default=6)
    parser.add_argument("--n-val", type=int, default=2)
    parser.add_argument("--seed", type=int, default=13)
    parser.add_argument("--shape", default="24,96,96",
                        help="volume shape z,y,x (tracked-scale runs need >= the patch)")
    args = parser.parse_args()
    shape = tuple(int(s) for s in args.shape.split(","))

    rng = np.random.default_rng(args.seed)
    for split, n in (("train", args.n_train), ("val", args.n_val)):
        split_dir = os.path.join(args.output, split)
        os.makedirs(split_dir, exist_ok=True)
        for i in range(n):
            raw, labels = make_volume(rng, shape)
            with h5py.File(os.path.join(split_dir, f"vol{i}.h5"), "w") as f:
                f.create_dataset("raw", data=raw, compression="gzip")
                f.create_dataset("labels", data=labels, compression="gzip")
        print(f"wrote {split}: {n} volumes of {raw.shape}")


if __name__ == "__main__":
    main()
