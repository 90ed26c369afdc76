#!/bin/bash
# Round-3 DSB parity sweep (VERDICT item #2): 3 seeds at the r2 scale on BOTH
# sides + one tracked-scale (f=64, 256^2, bs8, README.md:28-70) TPU run.
# The torch side stays at the reduced scale (CPU-bound on the 1-core host).
set -x
cd /root/repo/experiments/parity
export PYTHONPATH=/root/repo:/root/.axon_site

# tracked-scale data (256^2)
[ -f parity_data256/train.h5 ] || JAX_PLATFORMS=cpu python make_data.py -o parity_data256 --size 256 --n-train 128 --n-val 16

# TPU side: 3 seeds small scale + 1 tracked scale
for s in 0 1 2; do
  python train_tpu.py -d parity_data -o parity_out_s$s -n 1500 --seed $s > tpu_s$s.log 2>&1
done
python train_tpu.py -d parity_data256 -o parity_out_tracked -n 3000 --batch-size 8 --features 64 --seed 0 > tpu_tracked.log 2>&1

# torch side: 3 seeds small scale (CPU)
for s in 0 1 2; do
  JAX_PLATFORMS=cpu python train_ref_torch.py -d parity_data -o parity_out_s$s -n 1500 --seed $s > ref_s$s.log 2>&1
  JAX_PLATFORMS=cpu python evaluate.py -d parity_data -o parity_out_s$s > eval_s$s.log 2>&1
done
echo SWEEP DONE
