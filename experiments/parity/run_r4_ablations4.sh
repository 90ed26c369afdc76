#!/bin/bash
# Round-4 ablation E: same-init cross-framework PAIRS. Seeds 3-4 implant the
# reference's exact torch init draw into the TPU stack (pb protocol:
# full-volume targets, so val numbers are directly comparable) while
# run_r4_cpu_extra.sh trains the torch side from the SAME inits — with
# init-determined basins, pairs landing in the same basin is the strongest
# possible quality-parity statement. Run AFTER run_r4_tpu_extra.sh.
set -x
cd /root/repo/experiments/parity
export PYTHONPATH=/root/repo:/root/.axon_site

for s in 0 1 2 3 4; do
  for attempt in 1 2; do
    [ -f parity_out3d_r4tipb_s$s/tpu_result3d.json ] && break
    timeout 1800 python train_tpu3d.py -d parity_data3d_pb -o parity_out3d_r4tipb_s$s \
      -n 1500 --seed $s --fixed-val --torch-init --precomputed-boundaries --resume \
      > tpu3d_r4tipb_s$s.log 2>&1
  done
  [ -f parity_out3d_r4tipb_s$s/parity_table3d.json ] || \
    JAX_PLATFORMS=cpu timeout 600 python evaluate3d.py -d parity_data3d \
      -o parity_out3d_r4tipb_s$s > eval3d_r4tipb_s$s.log 2>&1
done
JAX_PLATFORMS=cpu python aggregate_r4.py > aggregate_r4.log 2>&1
echo R4 ABLATIONS4 DONE
