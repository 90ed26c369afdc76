"""SNEMI-style end-to-end config (BASELINE.json tracked config #3): affinity
training + mutex-watershed decoding + instance metrics.

Trains this repo's AnisotropicUNet on the shared synthetic neuron data with a
multi-offset AffinityTransform (binary channel + validity masks, the
reference's SNEMI recipe shape), masked Dice via LossWrapper /
ApplyAndRemoveMask, decodes the val affinities with the native C++ mutex
watershed and reports VOI / Rand / matching-F1 against the GT instances.
The reference side cannot run here (affogato/elf absent), so this records the
rebuild's end-to-end instance-segmentation numbers for the config.

Run: python train_affinity3d.py -d ./parity_data3d -o ./parity_out_affinity [-n 600]
"""

import argparse
import json
import os
from glob import glob

import h5py
import numpy as np

import torch_em_tpu as torch_em
from torch_em_tpu.loss import ApplyAndRemoveMask, DiceLoss, LossWrapper
from torch_em_tpu.metric.eval import matching, rand_index, variation_of_information
from torch_em_tpu.models import AnisotropicUNet
from torch_em_tpu.transforms.label import AffinityTransform
from torch_em_tpu.utils.segmentation import mutex_watershed_segmentation

PATCH = (8, 64, 64)
OFFSETS = [[-1, 0, 0], [0, -1, 0], [0, 0, -1], [-2, 0, 0], [0, -3, 0], [0, 0, -3]]


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-d", "--data", default="./parity_data3d")
    parser.add_argument("-o", "--output", default="./parity_out_affinity")
    parser.add_argument("-n", "--n-iterations", type=int, default=600)
    parser.add_argument("--batch-size", type=int, default=1)
    args = parser.parse_args()
    os.makedirs(args.output, exist_ok=True)

    trafo = AffinityTransform(offsets=OFFSETS, add_binary_target=True, add_mask=True)
    train_paths = sorted(glob(os.path.join(args.data, "train", "vol*.h5")))
    val_paths = sorted(glob(os.path.join(args.data, "val", "vol*.h5")))

    loss = LossWrapper(DiceLoss(), transform=ApplyAndRemoveMask())

    train_loader = torch_em.default_segmentation_loader(
        train_paths, "raw", train_paths, "labels", batch_size=args.batch_size,
        patch_shape=PATCH, ndim=3, label_transform2=trafo, label_dtype="float32",
        n_samples=50 * args.batch_size,
    )
    val_loader = torch_em.default_segmentation_loader(
        val_paths, "raw", val_paths, "labels", batch_size=args.batch_size,
        patch_shape=PATCH, ndim=3, label_transform2=trafo, label_dtype="float32",
        n_samples=8,
    )

    model = AnisotropicUNet(
        in_channels=1, out_channels=1 + len(OFFSETS), initial_features=8,
        scale_factors=[[1, 2, 2], [2, 2, 2]], final_activation="Sigmoid")
    trainer = torch_em.default_segmentation_trainer(
        name="parity-affinity-tpu", model=model,
        train_loader=train_loader, val_loader=val_loader,
        loss=loss, metric=loss, learning_rate=1e-4,
        save_root=args.output, logger=None,
    )
    trainer.fit(iterations=args.n_iterations)

    # decode val volumes with mutex watershed + instance metrics vs GT
    trainer.load_checkpoint("best")
    import jax

    fwd = jax.jit(lambda v, x: trainer.model.module.apply({"params": v["params"]}, x, train=False))

    results = []
    for path in val_paths:
        with h5py.File(path, "r") as f:
            raw = f["raw"][:PATCH[0], :PATCH[1], :PATCH[2]].astype("float32")
            gt = f["labels"][:PATCH[0], :PATCH[1], :PATCH[2]].astype("uint64")
        pred = np.asarray(fwd(trainer.variables, raw[None, None]))[0]
        foreground, affs = pred[0], pred[1:]
        # the native MWS consumes the training (disaffinity) convention directly
        seg = mutex_watershed_segmentation(
            np.ones_like(foreground), affs, offsets=OFFSETS, min_size=10)
        vi_split, vi_merge = variation_of_information(seg, gt)
        ri, ari = rand_index(seg, gt)
        m = matching(seg, gt, threshold=0.5)
        results.append({
            "voi_split": round(float(vi_split), 4), "voi_merge": round(float(vi_merge), 4),
            "adapted_rand_error": round(float(1.0 - ari), 4),
            "matching_f1@0.5": round(float(m["f1"]), 4),
            "n_pred_instances": int(len(np.unique(seg)) - 1),
            "n_gt_instances": int(len(np.unique(gt)) - 1),
        })

    summary = {
        "config": "SNEMI-style affinity UNet3d + mutex-watershed decode",
        "best_val_metric": float(trainer.best_metric),
        "iterations": int(trainer.iteration),
        "per_volume": results,
        "mean_voi": round(float(np.mean([r["voi_split"] + r["voi_merge"] for r in results])), 4),
        "mean_f1": round(float(np.mean([r["matching_f1@0.5"] for r in results])), 4),
    }
    with open(os.path.join(args.output, "affinity_mws_results.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
