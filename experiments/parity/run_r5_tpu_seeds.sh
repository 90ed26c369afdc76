#!/bin/bash
# Round-5: TPU free-seed widening, seeds 8-15 (pb protocol — full-volume
# boundary targets — matching the round-4 tpu_dice_by_seed distribution).
set -x
cd /root/repo/experiments/parity
export PYTHONPATH=/root/repo:/root/.axon_site

if [ ! -d parity_data3d_pb ]; then
  mkdir -p parity_data3d_pb
  cp -r parity_data3d/train parity_data3d/val parity_data3d_pb/
fi

for s in 8 9 10 11 12 13 14 15; do
  for attempt in 1 2; do
    [ -f parity_out3d_r4pb_s$s/tpu_result3d.json ] && break
    timeout 1800 python train_tpu3d.py -d parity_data3d_pb -o parity_out3d_r4pb_s$s \
      -n 1500 --seed $s --fixed-val --precomputed-boundaries --resume \
      > tpu3d_r5pb_s$s.log 2>&1
  done
  [ -f parity_out3d_r4pb_s$s/parity_table3d.json ] || \
    JAX_PLATFORMS=cpu timeout 900 python evaluate3d.py -d parity_data3d \
      -o parity_out3d_r4pb_s$s > eval3d_r5pb_s$s.log 2>&1
done
echo R5 TPU SEEDS DONE
