#!/bin/bash
# Round-5: power the free-seed CREMI-3D distribution comparison (VERDICT r4
# item 3, option i). Widen the torch-reference side from n=5 to n=16 free
# seeds at the cheap (8,64,64) probe scale; run_r5_tpu_seeds.sh widens the
# TPU side from n=8 to n=16. Protocol identical to round 4 (1500 its,
# full-volume targets, fixed central val patches).
set -x
cd /root/repo/experiments/parity
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_PLATFORMS=cpu

for s in 5 6 7 8 9 10 11 12 13 14 15; do
  for attempt in 1 2 3; do
    [ -f parity_out3d_ref_s$s/ref_torch_result3d.json ] && break
    timeout 3600 nice -n 10 python train_ref_torch3d.py -d parity_data3d \
      -o parity_out3d_ref_s$s -n 1500 --seed $s --resume \
      > ref3d_s${s}_r5.log 2>&1
  done
  [ -f parity_out3d_ref_s$s/parity_table3d.json ] || \
    timeout 900 nice -n 10 python evaluate3d.py -d parity_data3d \
      -o parity_out3d_ref_s$s > eval3d_ref_s${s}_r5.log 2>&1
done
echo R5 CPU SEEDS DONE
