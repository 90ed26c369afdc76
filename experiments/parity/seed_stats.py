"""Tabulate every CREMI-3D parity run (val loss + boundary dice per config
and seed) into one table — the round-4 investigation moves on distributions,
not single runs. Run: python seed_stats.py"""

import glob
import json
import os
import re

HERE = os.path.dirname(os.path.abspath(__file__))

CONFIGS = [
    ("r3 bf16 lecun-init (random-val)", "parity_out3d_s{s}"),
    ("r4 bf16 torch-init", "parity_out3d_r4_s{s}"),
    ("r4 bf16 torch-init precomp-targets", "parity_out3d_r4pb_s{s}"),
    ("r4 fp32 torch-init", "parity_out3d_r4fp32_s{s}"),
    ("r4 bf16 torch-init ref-augs", "parity_out3d_r4ra_s{s}"),
    ("r4 bf16 REF-INIT implant", "parity_out3d_r4ti_s{s}"),
    ("reference torch fp32", "parity_out3d_s{s}"),
    ("reference torch fp32 (extra)", "parity_out3d_ref_s{s}"),
]


def main():
    rows = []
    for name, pat in CONFIGS:
        is_ref = name.startswith("reference")
        for s in range(10):
            d = os.path.join(HERE, pat.format(s=s))
            res = os.path.join(d, "ref_torch_result3d.json" if is_ref else "tpu_result3d.json")
            if not os.path.exists(res):
                continue
            with open(res) as f:
                r = json.load(f)
            dice = None
            tab = os.path.join(d, "parity_table3d.json")
            if os.path.exists(tab):
                with open(tab) as f:
                    t = json.load(f)
                side = "reference-torch" if is_ref else "torch_em_tpu"
                dice = t.get(side, {}).get("dice_boundary")
            rows.append((name, s, r["best_val_metric"], r["iterations"], dice))

    print(f"{'config':42s} {'seed':>4s} {'best_val':>9s} {'its':>5s} {'dice':>7s}")
    for name, s, v, it, dice in rows:
        print(f"{name:42s} {s:4d} {v:9.4f} {it:5d} "
              f"{dice if dice is not None else float('nan'):7.4f}")

    # distribution summary per config
    import numpy as np

    print()
    for name, _ in CONFIGS:
        vals = [v for n, _, v, _, _ in rows if n == name]
        dices = [d for n, _, _, _, d in rows if n == name and d is not None]
        if vals:
            extra = (f"  dice mean {np.mean(dices):.4f}" if dices else "")
            print(f"{name:42s} n={len(vals)} val mean {np.mean(vals):.4f} "
                  f"median {np.median(vals):.4f} max {np.max(vals):.4f}{extra}")


if __name__ == "__main__":
    main()
