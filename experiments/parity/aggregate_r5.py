"""Round-5 free-seed distribution comparison: 16 reference seeds vs 16 TPU
seeds at the CREMI-3D probe scale (VERDICT r4 ask #3 option (i)).

Both sides use their DEFAULT init draw (torch default conv init on the
reference; the torch-statistics JAX draw on the TPU side), the pb protocol
(precomputed full-volume boundary targets, fixed val), 1500 iterations.
Reports means/stds and a Welch t-test so the "distributions coincide"
claim is powered, not eyeballed. Run after run_r5_cpu_seeds.sh +
run_r5_tpu_seeds.sh:  python aggregate_r5.py
"""

import json
import os

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
N_SEEDS = 16


def _dice(path, side):
    path = os.path.join(HERE, path, "parity_table3d.json")
    if not os.path.exists(path):
        return None
    with open(path) as f:
        tab = json.load(f)
    return tab.get(side, {}).get("dice_boundary")


def welch(a, b):
    """Welch's t statistic + Welch-Satterthwaite dof (no scipy in the image;
    the caller reads significance off the t distribution table)."""
    a, b = np.asarray(a, "float64"), np.asarray(b, "float64")
    va, vb = a.var(ddof=1) / len(a), b.var(ddof=1) / len(b)
    t = (a.mean() - b.mean()) / np.sqrt(va + vb)
    dof = (va + vb) ** 2 / (va ** 2 / (len(a) - 1) + vb ** 2 / (len(b) - 1))
    return float(t), float(dof)


def main():
    ref, ref_seeds = [], {}
    for s in range(N_SEEDS):
        for pat in (f"parity_out3d_s{s}", f"parity_out3d_ref_s{s}"):
            d = _dice(pat, "reference-torch")
            if d is not None and f"seed{s}" not in ref_seeds:
                ref_seeds[f"seed{s}"] = d
                ref.append(d)

    tpu, tpu_seeds = [], {}
    for s in range(N_SEEDS):
        d = _dice(f"parity_out3d_r4pb_s{s}", "torch_em_tpu")
        if d is not None:
            tpu_seeds[f"seed{s}"] = d
            tpu.append(d)

    if len(ref) < 2 or len(tpu) < 2:
        print(f"not enough results yet (ref n={len(ref)}, tpu n={len(tpu)}); "
              "run the sweeps first")
        return

    t, dof = welch(tpu, ref)
    summary = {
        "cremi3d_free_seeds_r5": {
            "protocol": "pb: precomputed full-volume boundary targets, fixed "
                        "val, 1500 its, probe scale (8,64,64); default init "
                        "draw each side",
            "reference": {"n": len(ref), "mean": round(float(np.mean(ref)), 4),
                          "std": round(float(np.std(ref, ddof=1)), 4),
                          "min": round(float(np.min(ref)), 4),
                          "by_seed": ref_seeds},
            "tpu": {"n": len(tpu), "mean": round(float(np.mean(tpu)), 4),
                    "std": round(float(np.std(tpu, ddof=1)), 4),
                    "min": round(float(np.min(tpu)), 4),
                    "by_seed": tpu_seeds},
            "mean_gap": round(float(np.mean(tpu) - np.mean(ref)), 4),
            "welch_t": None if t is None else round(t, 3),
            "welch_dof": None if dof is None else round(dof, 1),
        }
    }
    out = os.path.join(HERE, "parity_r5_summary.json")
    with open(out, "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
