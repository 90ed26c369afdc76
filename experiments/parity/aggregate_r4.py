"""Aggregate the round-4 parity sweep outputs into `parity_r4_summary.json`:
the 3-seed CREMI-3D tables (torch-matching init + deterministic val protocol,
dirs `parity_out3d_r4_s*`), the tracked-scale CREMI/DSB artifacts, and the
gradient-parity forensic. Run after run_r4_tpu.sh + run_r4_cpu.sh."""

import json
import os

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))


def _load(path):
    path = os.path.join(HERE, path)
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def main():
    summary = {}

    # TPU draws: the pb protocol (full-volume targets — the same target
    # function the torch side trains on and the dice eval measures against)
    tpu, tpu_seeds = [], {}
    for s in range(10):
        tab = _load(f"parity_out3d_r4pb_s{s}/parity_table3d.json")
        if tab and "torch_em_tpu" in tab:
            tpu_seeds[f"seed{s}"] = tab["torch_em_tpu"]["dice_boundary"]
            tpu.append(tab["torch_em_tpu"]["dice_boundary"])
    # reference draws
    ref, ref_seeds = [], {}
    for s in range(10):
        for pat in (f"parity_out3d_s{s}", f"parity_out3d_ref_s{s}"):
            tab = _load(f"{pat}/parity_table3d.json")
            if tab and "reference-torch" in tab and f"seed{s}" not in ref_seeds:
                ref_seeds[f"seed{s}"] = tab["reference-torch"]["dice_boundary"]
                ref.append(tab["reference-torch"]["dice_boundary"])
    # cross-implant draws: the reference's own init values trained on this stack
    ti_seeds = {}
    for s in range(3):
        tab = _load(f"parity_out3d_r4ti_s{s}/parity_table3d.json")
        if tab and "torch_em_tpu" in tab:
            ti_seeds[f"seed{s}"] = tab["torch_em_tpu"]["dice_boundary"]
    # same-init PAIRS on the aligned pb protocol: the strongest statement —
    # identical init values, identical target function, dice side by side
    pairs = {}
    for s in range(5):
        tab = _load(f"parity_out3d_r4tipb_s{s}/parity_table3d.json")
        if not (tab and "torch_em_tpu" in tab):
            continue
        r = ref_seeds.get(f"seed{s}")
        pairs[f"seed{s}"] = {
            "reference": r, "tpu_same_init": tab["torch_em_tpu"]["dice_boundary"],
            "gap": None if r is None else round(tab["torch_em_tpu"]["dice_boundary"] - r, 4),
        }
    if pairs:
        summary["cremi3d_same_init_pairs"] = {
            "note": "torch.manual_seed(s) init implanted into the TPU stack "
                    "(verified to 3e-6), both sides trained on full-volume "
                    "targets — removes the init-draw lottery entirely",
            **pairs,
        }
    if tpu or ref:
        summary["cremi3d_seeds_r4"] = {
            "protocol": "1500 its, torch-matching init, deterministic "
                        "fixed-patch val, identical raw [0,1] inputs, and "
                        "full-volume boundary targets on BOTH sides. Per-seed "
                        "outcomes are init-basin draws on BOTH sides (ref seed "
                        "2 converges ~65% slower than its 0/1; outcomes "
                        "replicate across bf16/fp32 and data orders to ~2%), "
                        "so seed-index pairings are meaningless — compare the "
                        "distributions and the cross-implant runs.",
            "tpu_dice_by_seed": tpu_seeds,
            "reference_dice_by_seed": ref_seeds,
            "ref_init_implant_dice_by_seed": ti_seeds,
            "reference_mean": round(float(np.mean(ref)), 4) if ref else None,
            "reference_std": round(float(np.std(ref)), 4) if ref else None,
            "reference_n": len(ref),
            "tpu_mean": round(float(np.mean(tpu)), 4) if tpu else None,
            "tpu_std": round(float(np.std(tpu)), 4) if tpu else None,
            "tpu_n": len(tpu),
            "mean_gap_tpu_minus_ref": (round(float(np.mean(tpu) - np.mean(ref)), 4)
                                       if ref and tpu else None),
        }

    grad = _load("parity_out3d_s1/grad_parity3d.json")
    if grad:
        summary["grad_parity_forensic"] = {
            "note": "loss+gradients computed at the round-3 stuck seed-1 "
                    "checkpoint in BOTH frameworks on an identical batch",
            **grad,
        }

    tracked3d = _load("parity_out3d_tracked/parity_table3d.json")
    if tracked3d and len(tracked3d) >= 2:
        summary["cremi3d_tracked"] = {
            "config": "TPU patch (32,256,256) f=32 4-level anisotropic (the "
                      "north-star/bench model), 2000 its; torch side same model "
                      "at CPU-feasible patch (16,128,128), 800 its, preds "
                      "emitted at (32,256,256)",
            **tracked3d,
        }

    tracked_dsb = _load("parity_out_tracked/tpu_result.json")
    if tracked_dsb:
        summary["dsb_tracked_tpu"] = {
            "config": "UNet2d f=64, fg+boundary, patch (1,256,256), bs8 "
                      "(reference README.md:28-70 tracked config; recipe "
                      "length 3000 its, actual length in 'iterations' - "
                      "the f=64 model converges well before the recipe end)",
            **tracked_dsb,
        }
        eval_tab = _load("parity_out_tracked/parity_table.json")
        if eval_tab:
            summary["dsb_tracked_tpu"]["eval"] = eval_tab

    out = os.path.join(HERE, "parity_r4_summary.json")
    with open(out, "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
