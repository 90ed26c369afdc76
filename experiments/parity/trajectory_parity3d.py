"""Deterministic multi-step trajectory parity: identical init (torch draw,
implanted), identical batch sequence (seeded generator, full-volume targets,
no augmentation), K optimizer steps in BOTH frameworks, compare losses and
parameter drift along the way. The single-point gradient forensic
(grad_parity3d.py) proved pointwise equivalence; this measures whether the
equivalence HOLDS ACROSS A TRAJECTORY or the sides drift apart faster than
f32 roundoff chaos would explain.

Run: JAX_PLATFORMS=cpu python trajectory_parity3d.py [-k 100]
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
    parser.add_argument("-k", "--steps", type=int, default=100)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--patch", default="8,64,64")
    parser.add_argument("--features", type=int, default=8)
    parser.add_argument("-o", "--output", default="./trajectory_parity3d.json")
    args = parser.parse_args()
    PATCH = tuple(int(s) for s in args.patch.split(","))

    import torch

    from torch_em_tpu.transforms.label import BoundaryTransform

    # ---- shared deterministic batch sequence (ref-script pipeline) ----
    from glob import glob

    trafo = BoundaryTransform(mode="thick", ndim=3)
    raws, tgts = [], []
    for path in sorted(glob(os.path.join(args.data, "train", "vol*.h5"))):
        with h5py.File(path, "r") as f:
            raws.append(f["raw"][:])
            tgts.append(trafo(f["labels"][:]).astype("float32")[0])
    raw_tr, tgt_tr = np.stack(raws), np.stack(tgts)

    rng = np.random.default_rng(args.seed)
    batches = []
    n = len(raw_tr)
    for _ in range(args.steps):
        i = int(rng.integers(0, n))
        z0 = int(rng.integers(0, raw_tr.shape[1] - PATCH[0] + 1))
        y0 = int(rng.integers(0, raw_tr.shape[2] - PATCH[1] + 1))
        x0 = int(rng.integers(0, raw_tr.shape[3] - PATCH[2] + 1))
        sl = (i, slice(z0, z0 + PATCH[0]), slice(y0, y0 + PATCH[1]), slice(x0, x0 + PATCH[2]))
        batches.append((raw_tr[sl].copy()[None, None], tgt_tr[sl].copy()[None, None]))

    # ---- identical init: the torch draw ----
    unet_mod = load_ref_module(os.path.join(REF, "model/unet.py"), "ref_unet_tp")
    dice_mod = load_ref_module(os.path.join(REF, "loss/dice.py"), "ref_dice_tp")
    torch.manual_seed(args.seed)
    net = unet_mod.AnisotropicUNet(
        in_channels=1, out_channels=1, initial_features=args.features,
        scale_factors=[[1, 2, 2], [2, 2, 2]], final_activation="Sigmoid")
    init_state = {k: v.detach().numpy().copy() for k, v in net.state_dict().items()}

    # ---- torch trajectory ----
    loss_f = dice_mod.DiceLoss()
    opt = torch.optim.AdamW(net.parameters(), lr=1e-4, weight_decay=0.01)
    torch_losses = []
    net.train()
    for xb, yb in batches:
        opt.zero_grad()
        loss = loss_f(net(torch.from_numpy(xb)), torch.from_numpy(yb))
        loss.backward()
        opt.step()
        torch_losses.append(float(loss))
    torch_final = {k: v.detach().numpy().copy() for k, v in net.state_dict().items()}

    # ---- tpu-em trajectory (f32, same init, same batches) ----
    import jax
    import jax.numpy as jnp

    from torch_em_tpu.loss import DiceLoss
    from torch_em_tpu.models import AnisotropicUNet
    from torch_em_tpu.trainer.optimizers import OptimizerSpec
    from torch_em_tpu.utils.modelzoo import load_torch_unet_state, torch_state_dict_from_flax

    model = AnisotropicUNet(
        in_channels=1, out_channels=1, initial_features=args.features,
        scale_factors=[[1, 2, 2], [2, 2, 2]], final_activation="Sigmoid", seed=0)
    model.replace_variables(load_torch_unet_state(model, init_state))
    loss_obj = DiceLoss()
    tx = OptimizerSpec("adamw", lr=1e-4, weight_decay=0.01).build()

    def train_step(params, opt_state, x, y):
        def loss_fn(p):
            pred = model.module.apply({"params": p}, x, train=True)
            return loss_obj(pred, y)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
        return params, opt_state, loss

    step = jax.jit(train_step)
    params = model.variables["params"]
    opt_state = tx.init(params)
    jax_losses = []
    for xb, yb in batches:
        params, opt_state, loss = step(params, opt_state, jnp.asarray(xb), jnp.asarray(yb))
        jax_losses.append(float(loss))

    model.replace_variables({"params": params})
    jax_final = torch_state_dict_from_flax(model)

    # ---- compare ----
    checkpoints = sorted({1, 5, 10, 25, 50, args.steps} & set(range(1, args.steps + 1)))
    rows = []
    for k in checkpoints:
        lt, lj = torch_losses[k - 1], jax_losses[k - 1]
        rows.append({"step": k, "loss_torch": lt, "loss_jax": lj,
                     "rel_gap": abs(lt - lj) / (abs(lt) + 1e-12)})
    drift = {}
    for name in torch_final:
        a = np.asarray(jax_final[name], np.float32)
        b = torch_final[name]
        drift[name] = float(np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-12))
    worst = max(drift, key=drift.get)
    result = {
        "steps": args.steps,
        "loss_track": rows,
        "mean_abs_loss_gap": float(np.mean(np.abs(np.array(torch_losses) - np.array(jax_losses)))),
        "final_param_rel_drift_median": float(np.median(list(drift.values()))),
        "final_param_rel_drift_worst": (worst, drift[worst]),
    }
    with open(args.output, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
