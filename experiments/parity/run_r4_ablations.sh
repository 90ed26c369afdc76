#!/bin/bash
# Round-4 convergence-gap ablations, in causal-suspect order. Run AFTER
# run_r4_tpu.sh (sequential TPU use).
#
# A) precomputed full-volume boundary targets (the reference parity script's
#    precompute-then-crop pipeline) vs the library's per-patch label
#    transform — per-patch transforms cannot see boundaries to objects
#    outside the crop, a systematic label-noise handicap on the ~30% border
#    shell of an (8,64,64) patch.
# B) fp32 vs bf16 compute at full length — the reference side is fp32 CPU.
set -x
cd /root/repo/experiments/parity
export PYTHONPATH=/root/repo:/root/.axon_site

# derived data dir (the flag writes a 'boundaries' dataset into its data dir;
# never mutate the h5 files concurrent runs are reading)
if [ ! -d parity_data3d_pb ]; then
  mkdir -p parity_data3d_pb
  cp -r parity_data3d/train parity_data3d/val parity_data3d_pb/
fi

# A) precomputed-boundary targets, bf16 (default), seeds 0-2
for s in 0 1 2; do
  for attempt in 1 2; do
    [ -f parity_out3d_r4pb_s$s/tpu_result3d.json ] && break
    timeout 1800 python train_tpu3d.py -d parity_data3d_pb -o parity_out3d_r4pb_s$s \
      -n 1500 --seed $s --fixed-val --precomputed-boundaries --resume \
      > tpu3d_r4pb_s$s.log 2>&1
  done
  [ -f parity_out3d_r4pb_s$s/parity_table3d.json ] || \
    JAX_PLATFORMS=cpu timeout 600 python evaluate3d.py -d parity_data3d \
      -o parity_out3d_r4pb_s$s > eval3d_r4pb_s$s.log 2>&1
done

# B) fp32, per-patch targets, seeds 0-2
for s in 0 1 2; do
  for attempt in 1 2; do
    [ -f parity_out3d_r4fp32_s$s/tpu_result3d.json ] && break
    timeout 1800 python train_tpu3d.py -d parity_data3d -o parity_out3d_r4fp32_s$s \
      -n 1500 --seed $s --fixed-val --fp32 --resume > tpu3d_r4fp32_s$s.log 2>&1
  done
  [ -f parity_out3d_r4fp32_s$s/parity_table3d.json ] || \
    JAX_PLATFORMS=cpu timeout 600 python evaluate3d.py -d parity_data3d \
      -o parity_out3d_r4fp32_s$s > eval3d_r4fp32_s$s.log 2>&1
done
echo R4 ABLATIONS DONE
