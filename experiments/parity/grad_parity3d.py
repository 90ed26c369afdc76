"""Gradient-parity forensic: do the two frameworks compute the SAME loss and
gradients at the SAME parameter point?

Loads a TPU-side checkpoint (e.g. the stuck seed-1 run), exports its weights
into the reference's torch AnisotropicUNet, evaluates DiceLoss + full
gradients on an identical batch in both frameworks, and reports per-layer
agreement. If gradients match to float tolerance, any convergence gap between
the sides is a property of the init/data draw (the basin), not of the
framework's dynamics; if they diverge, the offending layer is named.

Run: JAX_PLATFORMS=cpu python grad_parity3d.py -o parity_out3d_s1 [--seed 1]
"""

import argparse
import importlib.util
import json
import os

import h5py
import numpy as np

REF = "/root/reference/torch_em"


def load_ref_module(path, name):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-d", "--data", default="./parity_data3d")
    parser.add_argument("-o", "--output", default="./parity_out3d_s1")
    parser.add_argument("--checkpoint", default="best")
    parser.add_argument("--patch", default="8,64,64")
    parser.add_argument("--features", type=int, default=8)
    args = parser.parse_args()
    PATCH = tuple(int(s) for s in args.patch.split(","))

    import jax
    import jax.numpy as jnp
    from flax import serialization

    from torch_em_tpu.models import AnisotropicUNet
    from torch_em_tpu.loss import DiceLoss
    from torch_em_tpu.transforms.label import BoundaryTransform
    from torch_em_tpu.utils.modelzoo import torch_state_dict_from_flax

    model = AnisotropicUNet(
        in_channels=1, out_channels=1, initial_features=args.features,
        scale_factors=[[1, 2, 2], [2, 2, 2]], final_activation="Sigmoid", seed=0)
    ckpt = os.path.join(args.output, "checkpoints", "parity-cremi-tpu",
                        f"{args.checkpoint}.ckpt")
    with open(ckpt, "rb") as f:
        saved = serialization.msgpack_restore(f.read())
    model.variables = jax.tree_util.tree_map(jnp.asarray, saved["model_state"])
    print(f"loaded {ckpt} (iteration {saved['iteration']}, "
          f"best {saved['best_metric']:.4f})")

    # one deterministic batch from the shared parity data
    trafo = BoundaryTransform(mode="thick", ndim=3)
    from glob import glob
    path = sorted(glob(os.path.join(args.data, "train", "vol*.h5")))[0]
    with h5py.File(path, "r") as f:
        raw = f["raw"][:PATCH[0], :PATCH[1], :PATCH[2]].astype("float32")
        tgt = trafo(f["labels"][:PATCH[0], :PATCH[1], :PATCH[2]]).astype("float32")
    x = raw[None, None]
    y = tgt[None]
    print("batch:", x.shape, y.shape, "target mean", float(y.mean()))

    # --- JAX side: loss + grads in f32
    loss_fn = DiceLoss()

    def jloss(params, xb, yb):
        out = model.module.apply({"params": params}, xb, train=True)
        return loss_fn(out, yb)

    jl, jgrads = jax.value_and_grad(jloss)(
        model.variables["params"], jnp.asarray(x), jnp.asarray(y))
    jgrads = jax.device_get(jgrads)
    print(f"jax loss  : {float(jl):.6f}")

    # --- torch side: same weights, same batch
    import torch

    unet_mod = load_ref_module(os.path.join(REF, "model/unet.py"), "ref_unet_gp")
    dice_mod = load_ref_module(os.path.join(REF, "loss/dice.py"), "ref_dice_gp")
    net = unet_mod.AnisotropicUNet(
        in_channels=1, out_channels=1, initial_features=args.features,
        scale_factors=[[1, 2, 2], [2, 2, 2]], final_activation="Sigmoid")
    state = torch_state_dict_from_flax(model)
    net.load_state_dict({k: torch.from_numpy(np.asarray(v).copy())
                         for k, v in state.items()})
    net.train()
    xt = torch.from_numpy(x).requires_grad_(False)
    yt = torch.from_numpy(y)
    tl = dice_mod.DiceLoss()(net(xt), yt)
    tl.backward()
    print(f"torch loss: {float(tl):.6f}")

    # --- compare gradients through the export mapping
    # grads live on the same tree as params; export them with the same mapper
    grad_model = AnisotropicUNet(
        in_channels=1, out_channels=1, initial_features=args.features,
        scale_factors=[[1, 2, 2], [2, 2, 2]], final_activation="Sigmoid", seed=0)
    grad_model.variables = {"params": jax.tree_util.tree_map(jnp.asarray, jgrads)}
    jax_grad_state = torch_state_dict_from_flax(grad_model)

    rows = []
    for name, p in net.named_parameters():
        tg = p.grad.detach().numpy()
        jg = np.asarray(jax_grad_state[name], dtype=np.float32)
        denom = np.linalg.norm(tg) + 1e-12
        rel = np.linalg.norm(jg - tg) / denom
        cos = float((jg * tg).sum() / ((np.linalg.norm(jg) * np.linalg.norm(tg)) + 1e-12))
        rows.append((name, float(np.linalg.norm(tg)), rel, cos))
    rows.sort(key=lambda r: -r[2])
    print(f"{'param':45s} {'|g_torch|':>10s} {'rel_err':>10s} {'cos':>8s}")
    for name, gn, rel, cos in rows:
        print(f"{name:45s} {gn:10.3e} {rel:10.3e} {cos:8.5f}")

    worst = rows[0]
    result = {
        "loss_jax": float(jl), "loss_torch": float(tl),
        "loss_rel_gap": abs(float(jl) - float(tl)) / (abs(float(tl)) + 1e-12),
        "worst_param": worst[0], "worst_rel_err": float(worst[2]),
        "median_rel_err": float(np.median([float(r[2]) for r in rows])),
    }
    out_path = os.path.join(args.output, "grad_parity3d.json")
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
