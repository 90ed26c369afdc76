"""TPU-side CREMI-style parity run: this repo's AnisotropicUNet through the
full pipeline (SegmentationDataset over h5 -> loader -> trainer) on the shared
synthetic 3D data with boundary targets — the reference CREMI recipe shape.

Run: python train_tpu3d.py -d ./parity_data3d -o ./parity_out3d [-n 600]
"""

import argparse
import json
import os

import h5py
import numpy as np

import torch_em_tpu as torch_em
from torch_em_tpu.models import AnisotropicUNet
from torch_em_tpu.transforms.label import BoundaryTransform

def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-d", "--data", default="./parity_data3d")
    parser.add_argument("-o", "--output", default="./parity_out3d")
    parser.add_argument("-n", "--n-iterations", type=int, default=600)
    parser.add_argument("--batch-size", type=int, default=1)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--patch", default="8,64,64")
    parser.add_argument("--features", type=int, default=8)
    parser.add_argument("--tracked-model", action="store_true",
                        help="use the bench.py north-star model (4 levels, "
                             "anisotropic kernels) instead of the reduced 2-level one")
    parser.add_argument("--resume", action="store_true",
                        help="resume from the latest checkpoint if one exists")
    parser.add_argument("--plain-lowering", action="store_true",
                        help="disable all UNet perf switches (packing, pallas "
                             "norm, norm fold) — dynamics-isolation ablation")
    parser.add_argument("--fp32", action="store_true",
                        help="train in full f32 (mixed_precision=False) — the "
                             "reference parity side runs fp32, and bf16 compute "
                             "on the tiny f=8 model is a per-seed stall suspect")
    parser.add_argument("--fixed-val", action="store_true",
                        help="validate on the fixed central patch of each val "
                             "volume (ROI == patch) instead of random patches — "
                             "matches the reference parity script's deterministic "
                             "val protocol, equalizing best-checkpoint selection "
                             "noise between the sides")
    parser.add_argument("--precomputed-boundaries", action="store_true",
                        help="train on boundary targets precomputed over the "
                             "FULL volume (written as a 'boundaries' dataset "
                             "next to 'labels'), exactly like the reference "
                             "parity script's precompute-then-crop pipeline — "
                             "isolates the per-patch label-transform border "
                             "semantics (patch-edge boundaries to objects "
                             "outside the crop are invisible to a per-patch "
                             "transform) as a convergence factor")
    parser.add_argument("--torch-init", action="store_true",
                        help="initialize from the EXACT parameter draw the "
                             "torch reference side gets at this --seed "
                             "(torch.manual_seed(seed) + reference-module "
                             "construction, imported via load_torch_unet_state) "
                             "— the init-vs-training-path cross-implant forensic")
    parser.add_argument("--ref-augs", action="store_true",
                        help="restrict train augmentations to H/V flips — the "
                             "exact set the hand-rolled reference side applies "
                             "(the library default adds the depth flip)")
    parser.add_argument("--device-transform", action="store_true",
                        help="ship raw labels and compute the boundary target "
                             "inside the jitted step (DeviceBoundaryTransform) — "
                             "the TPU-native path; semantics match the host "
                             "BoundaryTransform (tested element-wise)")
    args = parser.parse_args()
    # persistent XLA compile cache: the sweep re-runs one program many times
    import jax as _jax
    try:
        _jax.config.update("jax_compilation_cache_dir", "/tmp/jax_parity_cache")
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass
    if args.plain_lowering:
        from torch_em_tpu.models.unet import perf_options
        perf_options(packing=False, pallas_norm=False, phase_packing=False,
                     norm_fold=False)
    os.makedirs(args.output, exist_ok=True)
    PATCH = tuple(int(s) for s in args.patch.split(","))

    from glob import glob

    # host path: boundary targets computed per sample in the loader;
    # --device-transform ships raw labels and derives the target batched
    # inside the jitted step (the TPU-native mode, ops/device.py)
    # identity raw transform: BOTH parity sides train and evaluate on the raw
    # [0,1] volumes (the hand-rolled reference side feeds f['raw'] patches
    # directly, and the final dice eval below does the same). Note this is
    # protocol hygiene, not a quality lever: the first InstanceNorm makes the
    # network function exactly invariant to per-patch affine input transforms,
    # and an A/B (round 4) measured identical trajectories and dice either way.
    identity_raw = lambda x: x  # noqa: E731
    trafo = None if args.device_transform else BoundaryTransform(mode="thick", ndim=3)
    device_trafo = None
    if args.device_transform:
        from torch_em_tpu.ops.device import DeviceBoundaryTransform
        device_trafo = DeviceBoundaryTransform(ndim=3)
    train_paths = sorted(glob(os.path.join(args.data, "train", "vol*.h5")))
    val_paths = sorted(glob(os.path.join(args.data, "val", "vol*.h5")))

    label_key = "labels"
    if args.precomputed_boundaries:
        # write the full-volume boundary target once per file (idempotent) and
        # train on crops of it with label_transform=None — the reference
        # parity script's exact target pipeline
        full_trafo = BoundaryTransform(mode="thick", ndim=3)
        for path in train_paths + val_paths:
            with h5py.File(path, "a") as f:
                if "boundaries" not in f:
                    f.create_dataset(
                        "boundaries",
                        data=full_trafo(f["labels"][:]).astype("float32")[0])
        label_key, trafo = "boundaries", None

    train_kwargs = {}
    if args.ref_augs:
        from torch_em_tpu.transforms.augmentation import get_augmentations
        train_kwargs["transform"] = get_augmentations(
            ndim="anisotropic",
            transforms=["RandomHorizontalFlip3D", "RandomVerticalFlip3D"])
    train_loader = torch_em.default_segmentation_loader(
        train_paths, "raw", train_paths, label_key, batch_size=args.batch_size,
        patch_shape=PATCH, ndim=3, label_transform=trafo, label_dtype="float32",
        raw_transform=identity_raw, n_samples=50 * args.batch_size, **train_kwargs,
    )
    if args.fixed_val:
        # one deterministic central patch per val volume (the reference parity
        # script evaluates raw_va[:, :patch] fixed patches, train_ref_torch3d.py)
        val_rois = [tuple(slice(0, p) for p in PATCH)] * len(val_paths)
        val_loader = torch_em.default_segmentation_loader(
            val_paths, "raw", val_paths, label_key, batch_size=args.batch_size,
            patch_shape=PATCH, ndim=3, label_transform=trafo, label_dtype="float32",
            raw_transform=identity_raw, rois=val_rois,
            transform=lambda raw, labels: (raw, labels),
        )
    else:
        val_loader = torch_em.default_segmentation_loader(
            val_paths, "raw", val_paths, label_key, batch_size=args.batch_size,
            patch_shape=PATCH, ndim=3, label_transform=trafo, label_dtype="float32",
            raw_transform=identity_raw, n_samples=8,
        )

    if args.tracked_model:
        # the BASELINE.json / bench.py CREMI north-star model
        model = AnisotropicUNet(
            in_channels=1, out_channels=1, initial_features=args.features,
            scale_factors=[[1, 2, 2], [1, 2, 2], [2, 2, 2], [2, 2, 2]],
            anisotropic_kernel=True, final_activation="Sigmoid", seed=args.seed)
    else:
        model = AnisotropicUNet(
            in_channels=1, out_channels=1, initial_features=args.features,
            scale_factors=[[1, 2, 2], [2, 2, 2]], final_activation="Sigmoid",
            seed=args.seed)
    if args.torch_init:
        import importlib.util

        import torch

        from torch_em_tpu.utils.modelzoo import load_torch_unet_state

        spec = importlib.util.spec_from_file_location(
            "ref_unet_ti", "/root/reference/torch_em/model/unet.py")
        ref_unet = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(ref_unet)
        torch.manual_seed(args.seed)
        if args.tracked_model:
            ref_net = ref_unet.AnisotropicUNet(
                in_channels=1, out_channels=1, initial_features=args.features,
                scale_factors=[[1, 2, 2], [1, 2, 2], [2, 2, 2], [2, 2, 2]],
                anisotropic_kernel=True, final_activation="Sigmoid")
        else:
            ref_net = ref_unet.AnisotropicUNet(
                in_channels=1, out_channels=1, initial_features=args.features,
                scale_factors=[[1, 2, 2], [2, 2, 2]], final_activation="Sigmoid")
        state = {k: v.detach().numpy() for k, v in ref_net.state_dict().items()}
        model.replace_variables(load_torch_unet_state(model, state))
        print(f"torch-init: imported the reference's torch.manual_seed({args.seed}) draw")

    trainer = torch_em.default_segmentation_trainer(
        name="parity-cremi-tpu", model=model,
        train_loader=train_loader, val_loader=val_loader,
        learning_rate=1e-4, optimizer_kwargs={"weight_decay": 0.01},
        save_root=args.output, logger=None,
        device_label_transform=device_trafo,
        mixed_precision=not args.fp32,
    )
    # --resume continues an interrupted run up to n_iterations TOTAL.  Both
    # this trainer and the reference treat fit(N, load_from_checkpoint=...)
    # as "N more iterations" (reference default_trainer.py:519), so load
    # first and pass the remaining count.
    n_train = args.n_iterations
    ckpt_latest = os.path.join(
        args.output, "checkpoints", "parity-cremi-tpu", "latest.ckpt")
    if args.resume and os.path.exists(ckpt_latest):
        trainer.load_checkpoint("latest")
        n_train = max(0, args.n_iterations - int(trainer.iteration))
        print(f"resuming at iteration {trainer.iteration}, {n_train} to go")
    if n_train > 0:
        trainer.fit(iterations=n_train)

    trainer.load_checkpoint("best")
    import jax

    # the eval-side target is always computed on the host, independent of
    # whether training used the device transform (ADVICE r3: trafo is None
    # under --device-transform, which used to crash here post-training)
    eval_trafo = trafo if trafo is not None else BoundaryTransform(mode="thick", ndim=3)
    raw_va, tgt_va = [], []
    for path in val_paths:
        with h5py.File(path, "r") as f:
            raw_va.append(f["raw"][:])
            tgt_va.append(eval_trafo(f["labels"][:]).astype("float32")[0])
    raw_va, tgt_va = np.stack(raw_va), np.stack(tgt_va)
    xv = raw_va[:, None, :PATCH[0], :PATCH[1], :PATCH[2]].astype("float32")

    fwd = jax.jit(lambda v, x: trainer.model.module.apply({"params": v["params"]}, x, train=False))
    preds = np.concatenate([np.asarray(fwd(trainer.variables, xv[i:i + 1]))
                            for i in range(len(xv))])
    with h5py.File(os.path.join(args.output, "tpu_preds3d.h5"), "w") as f:
        f.create_dataset("preds", data=preds)
    result = {"side": "torch_em_tpu", "best_val_metric": float(trainer.best_metric),
              "iterations": int(trainer.iteration)}
    with open(os.path.join(args.output, "tpu_result3d.json"), "w") as f:
        json.dump(result, f)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
