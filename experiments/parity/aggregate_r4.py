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

    seeds, ref, tpu, gaps = {}, [], [], []
    for s in range(8):
        tab = _load(f"parity_out3d_r4_s{s}/parity_table3d.json")
        if not tab:
            continue
        seeds[f"seed{s}"] = tab
        if "torch_em_tpu" in tab:
            tpu.append(tab["torch_em_tpu"]["dice_boundary"])
        if "reference-torch" in tab:
            ref.append(tab["reference-torch"]["dice_boundary"])
        if "abs_gap" in tab:
            gaps.append(tab["torch_em_tpu"]["dice_boundary"]
                        - tab["reference-torch"]["dice_boundary"])
    if seeds:
        summary["cremi3d_seeds_r4"] = {
            "protocol": "1500 its, torch-matching init (models/unet.py), "
                        "deterministic fixed-patch val and identical raw [0,1] "
                        "inputs on both sides; reference seeds 0-2, TPU seeds "
                        "0-7 (per-seed outcomes are high-variance draws on BOTH "
                        "sides — ref seed 2 converges ~65% slower than 0/1 — so "
                        "the distribution stats are the primary comparison)",
            **seeds,
            "reference_mean": round(float(np.mean(ref)), 4) if ref else None,
            "reference_std": round(float(np.std(ref)), 4) if ref else None,
            "reference_n": len(ref),
            "tpu_mean": round(float(np.mean(tpu)), 4) if tpu else None,
            "tpu_std": round(float(np.std(tpu)), 4) if tpu else None,
            "tpu_n": len(tpu),
            "mean_gap_tpu_minus_ref": (round(float(np.mean(tpu) - np.mean(ref)), 4)
                                       if ref and tpu else None),
            "same_seed_signed_gaps": [round(float(g), 4) for g in gaps],
            "max_abs_same_seed_gap": (round(float(np.max(np.abs(gaps))), 4)
                                      if gaps else None),
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
