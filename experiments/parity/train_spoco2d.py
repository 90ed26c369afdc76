"""SPOCO tracked config (BASELINE.json #4): sparse embedding instance
segmentation — SPOCOTrainer (two-network EMA consistency) with the SPOCO
contrastive loss on the synthetic nucleus data, decoded with the
embedding mutex watershed and scored with VOI / Rand vs GT instances.

The embedding-MWS decode parameters (delta, min_seg_size) are grid-searched
through utils/grid_search.py::instance_segmentation_grid_search on the first
half of the val set and the final metrics are reported on the held-out
second half (round-3 upgrade; the r2 run used hand-picked decode params and
2x oversegmented).

Run: python train_spoco2d.py -d ./parity_data -o ./parity_out_spoco [-n 5000]
"""

import argparse
import json
import os

import h5py
import numpy as np

import torch_em_tpu as torch_em
from torch_em_tpu.data import TensorDataset
from torch_em_tpu.loss import ContrastiveLoss, SPOCOLoss
from torch_em_tpu.metric.eval import rand_index, variation_of_information
from torch_em_tpu.metric.instance_segmentation_metric import EmbeddingMWS
from torch_em_tpu.models import UNet2d
from torch_em_tpu.trainer.spoco_trainer import SPOCOTrainer

EMBED_DIM = 8
OFFSETS = [[-1, 0], [0, -1], [-3, 0], [0, -3], [-9, 0], [0, -9]]


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-d", "--data", default="./parity_data")
    parser.add_argument("-o", "--output", default="./parity_out_spoco")
    parser.add_argument("-n", "--n-iterations", type=int, default=5000)
    parser.add_argument("--batch-size", type=int, default=4)
    parser.add_argument("--resume", action="store_true",
                        help="continue from the latest checkpoint up to "
                             "n_iterations TOTAL (skips straight to the "
                             "decode when training already finished)")
    args = parser.parse_args()
    os.makedirs(args.output, exist_ok=True)

    with h5py.File(os.path.join(args.data, "train.h5"), "r") as f:
        raw_tr, lab_tr = f["raw"][:], f["labels"][:]
    with h5py.File(os.path.join(args.data, "val.h5"), "r") as f:
        raw_va, lab_va = f["raw"][:], f["labels"][:]

    train_ds = TensorDataset(images=list(raw_tr), labels=list(lab_tr),
                             patch_shape=raw_tr.shape[1:], label_dtype="int64")
    val_ds = TensorDataset(images=list(raw_va), labels=list(lab_va),
                           patch_shape=raw_va.shape[1:], label_dtype="int64")
    train_loader = torch_em.get_data_loader(train_ds, batch_size=args.batch_size, shuffle=True)
    val_loader = torch_em.get_data_loader(val_ds, batch_size=args.batch_size)

    model = UNet2d(in_channels=1, out_channels=EMBED_DIM, initial_features=16)
    loss = SPOCOLoss(delta_var=0.75, delta_dist=2.0, max_instances=64)
    metric = ContrastiveLoss(delta_var=0.75, delta_dist=2.0, max_instances=64)

    trainer = torch_em.default_segmentation_trainer(
        name="parity-spoco", model=model,
        train_loader=train_loader, val_loader=val_loader,
        loss=loss, metric=metric, learning_rate=1e-4,
        # contrastive embedding losses need f32 (bf16 distance matrices
        # overflow once embeddings spread to +-delta_dist scales)
        mixed_precision=False,
        save_root=args.output, logger=None,
        trainer_class=SPOCOTrainer,
    )
    n_train = args.n_iterations
    ckpt_latest = os.path.join(
        args.output, "checkpoints", "parity-spoco", "latest.ckpt")
    if args.resume and os.path.exists(ckpt_latest):
        trainer.load_checkpoint("latest")
        n_train = max(0, args.n_iterations - int(trainer.iteration))
        print(f"resuming at iteration {trainer.iteration}, {n_train} to go")
    if n_train > 0:
        trainer.fit(iterations=n_train)

    # decode embeddings with the embedding mutex watershed; decode params are
    # grid-searched on the first half of the val set (tune split), metrics
    # reported on the held-out second half
    trainer.load_checkpoint("best")
    import jax

    from torch_em_tpu.utils.grid_search import instance_segmentation_grid_search

    fwd = jax.jit(lambda v, x: trainer.model.module.apply({"params": v["params"]}, x, train=False))

    def embed(image):
        return np.asarray(fwd(trainer.variables, image[None, None].astype("float32")))[0]

    class EmbeddingMWSSegmenter:
        """Adapter for instance_segmentation_grid_search: initialize caches
        the embedding, generate decodes with candidate parameters."""

        def initialize(self, image):
            self._emb = embed(image)

        def is_initialized(self):
            return hasattr(self, "_emb")

        def generate(self, delta=1.5, min_seg_size=150):
            dec = EmbeddingMWS(delta=delta, offsets=OFFSETS,
                               with_background=True, min_seg_size=min_seg_size)
            return dec(self._emb)

    n_tune = len(raw_va) // 2
    tune_dir = os.path.join(args.output, "grid")
    os.makedirs(tune_dir, exist_ok=True)
    image_paths, gt_paths = [], []
    for i in range(n_tune):
        p = os.path.join(tune_dir, f"tune_{i}.h5")
        with h5py.File(p, "w") as f:
            f.create_dataset("raw", data=raw_va[i])
            f.create_dataset("gt", data=lab_va[i].astype("uint32"))
        image_paths.append(p)
        gt_paths.append(p)

    grid = {"delta": [1.0, 1.5, 2.0, 2.5],
            "min_seg_size": [50, 100, 200, 400]}
    best_params, best_score = instance_segmentation_grid_search(
        EmbeddingMWSSegmenter(), image_paths, gt_paths, tune_dir,
        grid_search_values=grid, image_key="raw", gt_key="gt")
    print("grid-search best:", best_params, "tune accuracy:", best_score)

    decoder = EmbeddingMWS(delta=best_params["delta"], offsets=OFFSETS,
                           with_background=True,
                           min_seg_size=int(best_params["min_seg_size"]))
    results = []
    for i in range(n_tune, len(raw_va)):
        seg = decoder(embed(raw_va[i]))
        gt = lab_va[i].astype("uint64")
        vi_s, vi_m = variation_of_information(seg.astype("uint64"), gt)
        _, ari = rand_index(seg.astype("uint64"), gt)
        results.append({"voi": round(float(vi_s + vi_m), 4),
                        "adapted_rand_error": round(float(1 - ari), 4),
                        "n_pred": int(len(np.unique(seg)) - 1),
                        "n_gt": int(len(np.unique(gt)) - 1)})

    summary = {
        "config": f"SPOCO embedding UNet2d ({args.n_iterations} its) + "
                  "grid-searched embedding-MWS decode",
        "best_val_metric": float(trainer.best_metric),
        "iterations": int(trainer.iteration),
        "decode": {"delta": best_params["delta"],
                   "min_seg_size": int(best_params["min_seg_size"]),
                   "tune_images": n_tune, "tune_accuracy": round(float(best_score), 4)},
        "per_image": results[:4],
        "mean_voi": round(float(np.mean([r["voi"] for r in results])), 4),
        "mean_arand_error": round(float(np.mean([r["adapted_rand_error"] for r in results])), 4),
        "mean_pred_instances": round(float(np.mean([r["n_pred"] for r in results])), 1),
        "mean_gt_instances": round(float(np.mean([r["n_gt"] for r in results])), 1),
    }
    with open(os.path.join(args.output, "spoco_results.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
