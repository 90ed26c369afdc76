"""Reference-side parity run: train the reference's own UNet2d + DiceLoss
(loaded standalone from /root/reference — pure torch, no elf/kornia needed)
on the shared synthetic-DSB data, with a loop replicating DefaultTrainer
semantics (reference torch_em/trainer/default_trainer.py:643-754: epoch loop,
per-epoch validation, ReduceLROnPlateau on the val metric, best-checkpoint
tracking; AMP disabled on CPU as segmentation.py:552-553 does).

Run: python train_ref_torch.py -d ./parity_data -o ./parity_out [-n 1500]
"""

import argparse
import importlib.util
import json
import os
import time

import h5py
import numpy as np
import torch

from torch_em_tpu.transforms.label import BoundaryTransform

REF = "/root/reference/torch_em"


def load_ref_module(path, name):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def batches(rng, raw, targets, batch_size):
    """One epoch of shuffled, H/V-flip augmented batches (the reference's
    default 2D augmentation is H+V random flips, augmentation.py:248)."""
    order = rng.permutation(len(raw))
    for i in range(0, len(order) - batch_size + 1, batch_size):
        idx = order[i:i + batch_size]
        x, y = raw[idx][:, None].copy(), targets[idx].copy()
        for b in range(batch_size):
            if rng.random() < 0.5:
                x[b], y[b] = x[b, :, :, ::-1], y[b, :, :, ::-1]
            if rng.random() < 0.5:
                x[b], y[b] = x[b, :, ::-1], y[b, :, ::-1]
        yield torch.from_numpy(np.ascontiguousarray(x)), torch.from_numpy(np.ascontiguousarray(y))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-d", "--data", default="./parity_data")
    parser.add_argument("-o", "--output", default="./parity_out")
    parser.add_argument("-n", "--n-iterations", type=int, default=1500)
    parser.add_argument("--batch-size", type=int, default=4)
    parser.add_argument("--features", type=int, default=16)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()
    os.makedirs(args.output, exist_ok=True)

    unet_mod = load_ref_module(os.path.join(REF, "model/unet.py"), "ref_unet")
    dice_mod = load_ref_module(os.path.join(REF, "loss/dice.py"), "ref_dice")

    torch.manual_seed(args.seed)
    model = unet_mod.UNet2d(in_channels=1, out_channels=2,
                            initial_features=args.features, final_activation="Sigmoid")
    loss_f = dice_mod.DiceLoss()
    optimizer = torch.optim.AdamW(model.parameters(), lr=1e-4, weight_decay=0.01)
    scheduler = torch.optim.lr_scheduler.ReduceLROnPlateau(
        optimizer, mode="min", factor=0.5, patience=5)

    trafo = BoundaryTransform(mode="thick", add_binary_target=True, ndim=2)
    with h5py.File(os.path.join(args.data, "train.h5"), "r") as f:
        raw_tr = f["raw"][:].astype("float32")
        tgt_tr = np.stack([trafo(lab).astype("float32") for lab in f["labels"][:]])
    with h5py.File(os.path.join(args.data, "val.h5"), "r") as f:
        raw_va = f["raw"][:].astype("float32")
        tgt_va = np.stack([trafo(lab).astype("float32") for lab in f["labels"][:]])
    xv = torch.from_numpy(raw_va[:, None])
    yv = torch.from_numpy(tgt_va)

    rng = np.random.default_rng(args.seed)
    best_metric, it, epoch = np.inf, 0, 0
    t0 = time.time()
    while it < args.n_iterations:
        model.train()
        for x, y in batches(rng, raw_tr, tgt_tr, args.batch_size):
            optimizer.zero_grad()
            loss = loss_f(model(x), y)
            loss.backward()
            optimizer.step()
            it += 1
            if it >= args.n_iterations:
                break
        model.eval()
        with torch.no_grad():
            metric = float(np.mean([float(loss_f(model(xv[i:i + 4]), yv[i:i + 4]))
                                    for i in range(0, len(xv), 4)]))
        scheduler.step(metric)
        epoch += 1
        if metric < best_metric:
            best_metric = metric
            torch.save(model.state_dict(), os.path.join(args.output, "ref_best.pt"))
        print(f"epoch {epoch} it {it} val_metric {metric:.4f} best {best_metric:.4f} "
              f"({(time.time() - t0) / max(it, 1):.2f} s/it)", flush=True)

    # predictions of the best model on the val set, for the shared evaluator
    model.load_state_dict(torch.load(os.path.join(args.output, "ref_best.pt"), weights_only=True))
    model.eval()
    with torch.no_grad():
        preds = torch.cat([model(xv[i:i + 4]) for i in range(0, len(xv), 4)]).numpy()
    with h5py.File(os.path.join(args.output, "ref_torch_preds.h5"), "w") as f:
        f.create_dataset("preds", data=preds)
    result = {"side": "reference-torch-cpu", "best_val_metric": best_metric,
              "iterations": it, "epochs": epoch}
    with open(os.path.join(args.output, "ref_torch_result.json"), "w") as f:
        json.dump(result, f)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
