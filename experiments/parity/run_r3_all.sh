#!/bin/bash
# Round-3 sweep driver, ordered by value-per-minute so a wall-clock cutoff
# still leaves the most important artifacts behind. Every step is guarded by
# its output file (resumable) and a timeout (a device-tunnel stall cannot eat
# the whole budget). Run: bash run_r3_all.sh
set -x
cd /root/repo/experiments/parity
export PYTHONPATH=/root/repo:/root/.axon_site

# data (cheap, CPU)
[ -f parity_data256/train.h5 ] || JAX_PLATFORMS=cpu python make_data.py \
  -o parity_data256 --size 256 --n-train 128 --n-val 16 > make_data256.log 2>&1
[ -f parity_data3d_tracked/train/vol0.h5 ] || \
  JAX_PLATFORMS=cpu python make_data3d.py -o parity_data3d_tracked \
    --shape 40,320,320 --n-train 4 --n-val 2 > make_data3d_tracked.log 2>&1

# 1) SPOCO quality (VERDICT #4): 5000 its + grid-searched decode
[ -f parity_out_spoco/.r3done ] || \
  { timeout 1500 python train_spoco2d.py -d parity_data -o parity_out_spoco \
      -n 5000 --resume > spoco_r3.log 2>&1 && touch parity_out_spoco/.r3done; }

# 2) CREMI-3D 3-seed TPU sweep (VERDICT #2 / weak #5)
for s in 0 1 2; do
  [ -f parity_out3d_s$s/tpu_result3d.json ] || \
    timeout 900 python train_tpu3d.py -d parity_data3d -o parity_out3d_s$s \
      -n 1500 --seed $s --resume > tpu3d_s$s.log 2>&1
done

# 3) DSB tracked-scale TPU run (f=64, 256^2, bs8 — reference README.md:28-70)
[ -f parity_out_tracked/tpu_result.json ] || \
  timeout 1200 python train_tpu.py -d parity_data256 -o parity_out_tracked \
    -n 3000 --batch-size 8 --features 64 --seed 0 --resume > tpu_tracked.log 2>&1

# 4) CREMI tracked-scale TPU run (patch (32,256,256), bench model)
[ -f parity_out3d_tracked/tpu_result3d.json ] || \
  timeout 1500 python train_tpu3d.py -d parity_data3d_tracked -o parity_out3d_tracked --device-transform \
    -n 2000 --patch 32,256,256 --features 32 --tracked-model --seed 0 --resume \
    > tpu3d_tracked.log 2>&1

# 5) CPU torch side for the CREMI seeds + evals
for s in 0 1 2; do
  [ -f parity_out3d_s$s/ref_torch_result3d.json ] || \
    JAX_PLATFORMS=cpu timeout 1200 python train_ref_torch3d.py -d parity_data3d \
      -o parity_out3d_s$s -n 1500 --seed $s > ref3d_s$s.log 2>&1
  [ -f parity_out3d_s$s/parity_table3d.json ] || \
    JAX_PLATFORMS=cpu timeout 600 python evaluate3d.py -d parity_data3d \
      -o parity_out3d_s$s > eval3d_s$s.log 2>&1
done

# 6) DSB tracked eval + CPU torch tracked CREMI side
[ -f parity_out_tracked/parity_table.json ] || \
  JAX_PLATFORMS=cpu timeout 600 python evaluate.py -d parity_data256 \
    -o parity_out_tracked > eval_tracked.log 2>&1
[ -f parity_out3d_tracked/ref_torch_result3d.json ] || \
  JAX_PLATFORMS=cpu timeout 1800 python train_ref_torch3d.py -d parity_data3d_tracked \
    -o parity_out3d_tracked -n 800 --patch 16,128,128 --eval-patch 32,256,256 \
    --features 32 --tracked-model --seed 0 > ref3d_tracked.log 2>&1
[ -f parity_out3d_tracked/parity_table3d.json ] || \
  JAX_PLATFORMS=cpu timeout 900 python evaluate3d.py -d parity_data3d_tracked \
    -o parity_out3d_tracked --patch 32,256,256 > eval3d_tracked.log 2>&1

# 7) aggregate
JAX_PLATFORMS=cpu python aggregate_r3.py > aggregate_r3.log 2>&1
echo R3 SWEEP DONE
