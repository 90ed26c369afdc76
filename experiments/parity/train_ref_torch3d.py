"""Reference-side CREMI-style parity run: the reference's own AnisotropicUNet
+ DiceLoss (pure torch, loaded from /root/reference) trained on the shared
synthetic 3D data with boundary targets, replicating DefaultTrainer semantics
on CPU. See train_ref_torch.py for the approach rationale.

Run: python train_ref_torch3d.py -d ./parity_data3d -o ./parity_out3d [-n 600]
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


PATCH = (8, 64, 64)


def batches(rng, raw, targets, batch_size):
    """Random 3D patches + H/V flips (the reference's anisotropic default
    augs are flips, augmentation.py:254)."""
    n = len(raw)
    while True:
        xs, ys = [], []
        for _ in range(batch_size):
            i = int(rng.integers(0, n))
            z0 = int(rng.integers(0, raw.shape[1] - PATCH[0] + 1))
            y0 = int(rng.integers(0, raw.shape[2] - PATCH[1] + 1))
            x0 = int(rng.integers(0, raw.shape[3] - PATCH[2] + 1))
            sl = (i, slice(z0, z0 + PATCH[0]), slice(y0, y0 + PATCH[1]), slice(x0, x0 + PATCH[2]))
            xr, yt = raw[sl].copy(), targets[sl].copy()
            if rng.random() < 0.5:
                xr, yt = xr[:, :, ::-1], yt[:, :, ::-1]
            if rng.random() < 0.5:
                xr, yt = xr[:, ::-1], yt[:, ::-1]
            xs.append(np.ascontiguousarray(xr)[None])
            ys.append(np.ascontiguousarray(yt)[None])
        yield (torch.from_numpy(np.stack(xs)), torch.from_numpy(np.stack(ys)))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-d", "--data", default="./parity_data3d")
    parser.add_argument("-o", "--output", default="./parity_out3d")
    parser.add_argument("-n", "--n-iterations", type=int, default=600)
    parser.add_argument("--batch-size", type=int, default=1)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--patch", default="8,64,64")
    parser.add_argument("--features", type=int, default=8)
    parser.add_argument("--eval-patch", default=None,
                        help="final-prediction patch z,y,x (defaults to --patch); "
                             "lets a CPU-bound training still emit preds at the "
                             "tracked comparison patch")
    parser.add_argument("--tracked-model", action="store_true",
                        help="use the bench.py north-star model (4 levels, "
                             "anisotropic kernels) instead of the reduced 2-level one")
    parser.add_argument("--resume", action="store_true",
                        help="continue from ref_ckpt3d.pt (saved each epoch) up "
                             "to n_iterations TOTAL — exact resume incl. the "
                             "data-sampling rng state")
    args = parser.parse_args()
    os.makedirs(args.output, exist_ok=True)
    global PATCH
    PATCH = tuple(int(s) for s in args.patch.split(","))
    EVAL_PATCH = (tuple(int(s) for s in args.eval_patch.split(","))
                  if args.eval_patch else PATCH)

    unet_mod = load_ref_module(os.path.join(REF, "model/unet.py"), "ref_unet3d")
    dice_mod = load_ref_module(os.path.join(REF, "loss/dice.py"), "ref_dice3d")

    torch.manual_seed(args.seed)
    if args.tracked_model:
        model = unet_mod.AnisotropicUNet(
            in_channels=1, out_channels=1, initial_features=args.features,
            scale_factors=[[1, 2, 2], [1, 2, 2], [2, 2, 2], [2, 2, 2]],
            anisotropic_kernel=True, final_activation="Sigmoid")
    else:
        model = unet_mod.AnisotropicUNet(
            in_channels=1, out_channels=1, initial_features=args.features,
            scale_factors=[[1, 2, 2], [2, 2, 2]], final_activation="Sigmoid")
    loss_f = dice_mod.DiceLoss()
    optimizer = torch.optim.AdamW(model.parameters(), lr=1e-4, weight_decay=0.01)
    scheduler = torch.optim.lr_scheduler.ReduceLROnPlateau(
        optimizer, mode="min", factor=0.5, patience=5)

    from glob import glob

    trafo = BoundaryTransform(mode="thick", ndim=3)

    def load_split(split):
        raws, tgts = [], []
        for path in sorted(glob(os.path.join(args.data, split, "vol*.h5"))):
            with h5py.File(path, "r") as f:
                raws.append(f["raw"][:])
                tgts.append(trafo(f["labels"][:]).astype("float32")[0])
        return np.stack(raws), np.stack(tgts)

    raw_tr, tgt_tr = load_split("train")
    raw_va, tgt_va = load_split("val")

    # fixed central val patches (full volumes are too big for repeated CPU fwd)
    xv = torch.from_numpy(raw_va[:, None, :PATCH[0], :PATCH[1], :PATCH[2]].copy())
    yv = torch.from_numpy(tgt_va[:, None, :PATCH[0], :PATCH[1], :PATCH[2]].copy())

    rng = np.random.default_rng(args.seed)
    best_metric, it, epoch = np.inf, 0, 0
    ckpt_path = os.path.join(args.output, "ref_ckpt3d.pt")
    if args.resume and os.path.exists(ckpt_path):
        state = torch.load(ckpt_path, weights_only=False)
        model.load_state_dict(state["model"])
        optimizer.load_state_dict(state["optimizer"])
        scheduler.load_state_dict(state["scheduler"])
        rng.bit_generator.state = state["rng_state"]
        best_metric, it, epoch = state["best_metric"], state["it"], state["epoch"]
        print(f"resuming at iteration {it} (epoch {epoch}), best {best_metric:.4f}",
              flush=True)
    gen = batches(rng, raw_tr, tgt_tr, args.batch_size)
    iters_per_epoch = 50
    t0 = time.time()
    it0 = it
    while it < args.n_iterations:
        model.train()
        for _ in range(iters_per_epoch):
            x, y = next(gen)
            optimizer.zero_grad()
            loss = loss_f(model(x), y)
            loss.backward()
            optimizer.step()
            it += 1
            if it >= args.n_iterations:
                break
        model.eval()
        with torch.no_grad():
            metric = float(np.mean([float(loss_f(model(xv[i:i + 1]), yv[i:i + 1]))
                                    for i in range(len(xv))]))
        scheduler.step(metric)
        epoch += 1
        if metric < best_metric:
            best_metric = metric
            torch.save(model.state_dict(), os.path.join(args.output, "ref_best3d.pt"))
        torch.save({
            "model": model.state_dict(), "optimizer": optimizer.state_dict(),
            "scheduler": scheduler.state_dict(), "rng_state": rng.bit_generator.state,
            "best_metric": best_metric, "it": it, "epoch": epoch,
        }, ckpt_path)
        print(f"epoch {epoch} it {it} val_metric {metric:.4f} best {best_metric:.4f} "
              f"({(time.time() - t0) / max(it - it0, 1):.2f} s/it)", flush=True)

    model.load_state_dict(torch.load(os.path.join(args.output, "ref_best3d.pt"), weights_only=True))
    model.eval()
    xe = torch.from_numpy(
        raw_va[:, None, :EVAL_PATCH[0], :EVAL_PATCH[1], :EVAL_PATCH[2]].copy())
    with torch.no_grad():
        preds = torch.cat([model(xe[i:i + 1]) for i in range(len(xe))]).numpy()
    with h5py.File(os.path.join(args.output, "ref_torch_preds3d.h5"), "w") as f:
        f.create_dataset("preds", data=preds)
    result = {"side": "reference-torch-cpu", "best_val_metric": best_metric, "iterations": it}
    with open(os.path.join(args.output, "ref_torch_result3d.json"), "w") as f:
        json.dump(result, f)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
