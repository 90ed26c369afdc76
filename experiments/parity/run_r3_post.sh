#!/bin/bash
# Post-sweep round-3 steps: evaluate the tracked-scale DSB TPU run (absolute
# Dice vs the common targets; the torch side stays at the reduced scale where
# it is CPU-feasible) and aggregate everything into parity_r3_summary.json.
set -x
cd /root/repo/experiments/parity
export PYTHONPATH=/root/repo:/root/.axon_site

JAX_PLATFORMS=cpu python evaluate.py -d parity_data256 -o parity_out_tracked \
  > eval_tracked.log 2>&1
JAX_PLATFORMS=cpu python aggregate_r3.py
echo POST DONE
