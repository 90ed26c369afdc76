#!/bin/bash
# Round-4 ablation D: the init-vs-training-path cross-implant. Train the TPU
# side FROM THE REFERENCE'S EXACT INIT DRAW (torch.manual_seed(seed) on the
# reference module, imported through load_torch_unet_state). Ref seed 0
# converged to val 0.0376 (fast) and seed 2 to 0.0581 (slow): if the TPU side
# is slow from the ref's fast init, the training path (data stream / step
# composition) is guilty; if it is fast, convergence basins are
# init-value-determined and the TPU-side RNG draws were unlucky.
set -x
cd /root/repo/experiments/parity
export PYTHONPATH=/root/repo:/root/.axon_site

for s in 0 1 2; do
  for attempt in 1 2; do
    [ -f parity_out3d_r4ti_s$s/tpu_result3d.json ] && break
    timeout 1800 python train_tpu3d.py -d parity_data3d -o parity_out3d_r4ti_s$s \
      -n 1500 --seed $s --fixed-val --torch-init --resume > tpu3d_r4ti_s$s.log 2>&1
  done
  [ -f parity_out3d_r4ti_s$s/parity_table3d.json ] || \
    JAX_PLATFORMS=cpu timeout 600 python evaluate3d.py -d parity_data3d \
      -o parity_out3d_r4ti_s$s > eval3d_r4ti_s$s.log 2>&1
done
echo R4 ABLATIONS3 DONE
