"""TPU-side parity run: train this repo's UNet2d through the full pipeline
(TensorDataset -> loader -> default_segmentation_trainer) on the shared
synthetic-DSB data — the same recipe as the reference README.md:28-70 DSB
config, scaled to this environment (see make_data.py).

Run: python train_tpu.py -d ./parity_data -o ./parity_out [-n 1500]
"""

import argparse
import json
import os

import h5py
import numpy as np

import torch_em_tpu as torch_em
from torch_em_tpu.data import TensorDataset
from torch_em_tpu.models import UNet2d
from torch_em_tpu.transforms.augmentation import get_augmentations
from torch_em_tpu.transforms.label import BoundaryTransform


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-d", "--data", default="./parity_data")
    parser.add_argument("-o", "--output", default="./parity_out")
    parser.add_argument("-n", "--n-iterations", type=int, default=1500)
    parser.add_argument("--batch-size", type=int, default=4)
    parser.add_argument("--features", type=int, default=16)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--resume", action="store_true",
                        help="continue from the latest checkpoint up to "
                             "n_iterations TOTAL")
    args = parser.parse_args()
    os.makedirs(args.output, exist_ok=True)

    with h5py.File(os.path.join(args.data, "train.h5"), "r") as f:
        raw_tr, lab_tr = f["raw"][:], f["labels"][:]
    with h5py.File(os.path.join(args.data, "val.h5"), "r") as f:
        raw_va, lab_va = f["raw"][:], f["labels"][:]

    trafo = BoundaryTransform(mode="thick", add_binary_target=True, ndim=2)
    patch_shape = raw_tr.shape[1:]

    train_ds = TensorDataset(
        images=list(raw_tr), labels=list(lab_tr), patch_shape=patch_shape,
        label_transform=trafo, transform=get_augmentations(ndim=2),
        label_dtype="float32",
    )
    val_ds = TensorDataset(
        images=list(raw_va), labels=list(lab_va), patch_shape=patch_shape,
        label_transform=trafo, label_dtype="float32",
    )
    train_loader = torch_em.get_data_loader(train_ds, batch_size=args.batch_size, shuffle=True)
    val_loader = torch_em.get_data_loader(val_ds, batch_size=args.batch_size)

    model = UNet2d(in_channels=1, out_channels=2, initial_features=args.features,
                   final_activation="Sigmoid", seed=args.seed)
    trainer = torch_em.default_segmentation_trainer(
        name="parity-dsb-tpu",
        model=model,
        train_loader=train_loader,
        val_loader=val_loader,
        learning_rate=1e-4,
        optimizer_kwargs={"weight_decay": 0.01},  # match torch AdamW defaults
        save_root=args.output,
        logger=None,
    )
    n_train = args.n_iterations
    ckpt_latest = os.path.join(
        args.output, "checkpoints", "parity-dsb-tpu", "latest.ckpt")
    if args.resume and os.path.exists(ckpt_latest):
        trainer.load_checkpoint("latest")
        n_train = max(0, args.n_iterations - int(trainer.iteration))
        print(f"resuming at iteration {trainer.iteration}, {n_train} to go")
    if n_train > 0:
        trainer.fit(iterations=n_train)
    trained_iterations = int(trainer.iteration)

    # predictions of the best model on the val set, for the shared evaluator
    # (loading "best" resets trainer.iteration to that checkpoint's step,
    # so the trained total is captured above)
    trainer.load_checkpoint("best")
    import jax

    fwd = jax.jit(lambda v, x: trainer.model.module.apply(
        {"params": v["params"]}, x, train=False))
    xv = raw_va[:, None].astype("float32")
    preds = np.concatenate([
        np.asarray(fwd(trainer.variables, xv[i:i + 4])) for i in range(0, len(xv), 4)
    ])
    with h5py.File(os.path.join(args.output, "tpu_preds.h5"), "w") as f:
        f.create_dataset("preds", data=preds)
    result = {"side": "torch_em_tpu", "best_val_metric": float(trainer.best_metric),
              "iterations": trained_iterations,
              "best_checkpoint_iteration": int(trainer.iteration)}
    with open(os.path.join(args.output, "tpu_result.json"), "w") as f:
        json.dump(result, f)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
