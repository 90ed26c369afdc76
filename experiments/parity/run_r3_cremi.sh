#!/bin/bash
# Round-3 CREMI-3D parity sweep (VERDICT items #2/#5-weak): 3 seeds x 1500 its
# at the reduced scale on BOTH sides, plus a tracked-scale run — TPU side at
# the north-star patch (32,256,256) with the bench model (4-level f=32
# anisotropic), torch side same model at a CPU-feasible patch with final
# preds emitted at the tracked patch for a same-region comparison.
# TPU phase first (loader shares the 1-core host), then the pure-CPU phase.
set -x
cd /root/repo/experiments/parity
export PYTHONPATH=/root/repo:/root/.axon_site

# tracked-scale 3D data (volumes must exceed the (32,256,256) patch)
[ -f parity_data3d_tracked/train/vol0.h5 ] || \
  JAX_PLATFORMS=cpu python make_data3d.py -o parity_data3d_tracked \
    --shape 40,320,320 --n-train 4 --n-val 2 > make_data3d_tracked.log 2>&1

# ---- TPU phase ----
for s in 0 1 2; do
  [ -f parity_out3d_s$s/tpu_result3d.json ] || \
    python train_tpu3d.py -d parity_data3d -o parity_out3d_s$s -n 1500 --seed $s \
      > tpu3d_s$s.log 2>&1
done
[ -f parity_out3d_tracked/tpu_result3d.json ] || \
  python train_tpu3d.py -d parity_data3d_tracked -o parity_out3d_tracked \
    -n 2000 --patch 32,256,256 --features 32 --tracked-model --seed 0 --resume \
    > tpu3d_tracked.log 2>&1

# SPOCO with grid-searched decode (VERDICT item #4)
[ -f parity_out_spoco/.r3done ] || \
  { python train_spoco2d.py -d parity_data -o parity_out_spoco -n 5000 \
      > spoco_r3.log 2>&1 && touch parity_out_spoco/.r3done; }

# DSB tracked-scale TPU run (f=64, 256^2, bs8 — reference README.md:28-70)
[ -f parity_out_tracked/tpu_result.json ] || \
  python train_tpu.py -d parity_data256 -o parity_out_tracked -n 3000 \
    --batch-size 8 --features 64 --seed 0 > tpu_tracked.log 2>&1

# ---- CPU phase ----
for s in 0 1 2; do
  [ -f parity_out3d_s$s/ref_torch_result3d.json ] || \
    JAX_PLATFORMS=cpu python train_ref_torch3d.py -d parity_data3d -o parity_out3d_s$s \
      -n 1500 --seed $s > ref3d_s$s.log 2>&1
  JAX_PLATFORMS=cpu python evaluate3d.py -d parity_data3d -o parity_out3d_s$s \
    > eval3d_s$s.log 2>&1
done
[ -f parity_out3d_tracked/ref_torch_result3d.json ] || \
  JAX_PLATFORMS=cpu python train_ref_torch3d.py -d parity_data3d_tracked \
    -o parity_out3d_tracked -n 800 --patch 16,128,128 --eval-patch 32,256,256 \
    --features 32 --tracked-model --seed 0 > ref3d_tracked.log 2>&1
JAX_PLATFORMS=cpu python evaluate3d.py -d parity_data3d_tracked -o parity_out3d_tracked \
  --patch 32,256,256 > eval3d_tracked.log 2>&1
echo CREMI SWEEP DONE
