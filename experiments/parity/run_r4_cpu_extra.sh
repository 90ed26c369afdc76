#!/bin/bash
# Round-4 CPU extras: widen the torch-reference seed distribution (seeds 3-4)
# for the distribution-level CREMI comparison. Run AFTER run_r4_cpu.sh
# (single CPU core; the tracked-ref run must finish first).
set -x
cd /root/repo/experiments/parity
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_PLATFORMS=cpu

for s in 3 4; do
  for attempt in 1 2 3; do
    [ -f parity_out3d_ref_s$s/ref_torch_result3d.json ] && break
    timeout 2400 python train_ref_torch3d.py -d parity_data3d -o parity_out3d_ref_s$s \
      -n 1500 --seed $s --resume > ref3d_s${s}_r4.log 2>&1
  done
  # dice eval of the ref side alone (evaluate3d reports whichever preds exist)
  [ -f parity_out3d_ref_s$s/parity_table3d.json ] || \
    timeout 600 python evaluate3d.py -d parity_data3d -o parity_out3d_ref_s$s \
      > eval3d_ref_s${s}_r4.log 2>&1
done
echo R4 CPU EXTRA SEEDS DONE
