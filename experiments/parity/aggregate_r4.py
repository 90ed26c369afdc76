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

    seeds = {}
    for s in (0, 1, 2):
        tab = _load(f"parity_out3d_r4_s{s}/parity_table3d.json")
        if tab and "abs_gap" in tab:
            seeds[f"seed{s}"] = tab
    if seeds:
        ref = [t["reference-torch"]["dice_boundary"] for t in seeds.values()]
        tpu = [t["torch_em_tpu"]["dice_boundary"] for t in seeds.values()]
        gaps = [t["torch_em_tpu"]["dice_boundary"]
                - t["reference-torch"]["dice_boundary"] for t in seeds.values()]
        summary["cremi3d_seeds_r4"] = {
            "protocol": "1500 its, torch-matching init (models/unet.py), "
                        "deterministic central-patch val on both sides",
            **seeds,
            "reference_mean": round(float(np.mean(ref)), 4),
            "reference_std": round(float(np.std(ref)), 4),
            "tpu_mean": round(float(np.mean(tpu)), 4),
            "tpu_std": round(float(np.std(tpu)), 4),
            "signed_gap_mean_tpu_minus_ref": round(float(np.mean(gaps)), 4),
            "max_abs_gap": round(float(np.max(np.abs(gaps))), 4),
            "all_seeds_within_1pct": bool(np.max(np.abs(gaps)) < 0.01),
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
            "config": "UNet2d f=64, fg+boundary, patch (1,256,256), bs8, "
                      "3000 its (reference README.md:28-70 tracked config)",
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
