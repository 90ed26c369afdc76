#!/bin/bash
# Round-4 ablation C: restrict TPU-side train augmentations to H/V flips —
# the exact set the hand-rolled reference side applies (the library default
# adds the depth flip). Run AFTER run_r4_ablations.sh.
set -x
cd /root/repo/experiments/parity
export PYTHONPATH=/root/repo:/root/.axon_site

for s in 0 1 2; do
  for attempt in 1 2; do
    [ -f parity_out3d_r4ra_s$s/tpu_result3d.json ] && break
    timeout 1800 python train_tpu3d.py -d parity_data3d -o parity_out3d_r4ra_s$s \
      -n 1500 --seed $s --fixed-val --ref-augs --resume > tpu3d_r4ra_s$s.log 2>&1
  done
  [ -f parity_out3d_r4ra_s$s/parity_table3d.json ] || \
    JAX_PLATFORMS=cpu timeout 600 python evaluate3d.py -d parity_data3d \
      -o parity_out3d_r4ra_s$s > eval3d_r4ra_s$s.log 2>&1
done
echo R4 ABLATIONS2 DONE
