#!/bin/bash
# Round-4 TPU stream: CREMI-3D 3-seed 1500-it sweep with the torch-matching
# init (fresh dirs — the init change invalidates round-3 TPU runs) and the
# deterministic --fixed-val checkpoint-selection protocol (same as the torch
# parity side), then the two tracked-scale resumes. Every step is guarded by
# its output file and a timeout; safe to re-run until all artifacts exist.
# Run: bash run_r4_tpu.sh  (pairs with run_r4_cpu.sh on the CPU)
set -x
cd /root/repo/experiments/parity
export PYTHONPATH=/root/repo:/root/.axon_site

# 1) CREMI-3D 3-seed TPU sweep, new init (VERDICT r3 item 1)
for s in 0 1 2; do
  for attempt in 1 2 3; do
    [ -f parity_out3d_r4_s$s/tpu_result3d.json ] && break
    timeout 1800 python train_tpu3d.py -d parity_data3d -o parity_out3d_r4_s$s \
      -n 1500 --seed $s --fixed-val --resume > tpu3d_r4_s$s.log 2>&1
  done
done

# 2) CREMI tracked-scale TPU run (patch (32,256,256), bench model; resumes
#    the round-3 checkpoints) (VERDICT r3 item 3)
for attempt in 1 2 3; do
  [ -f parity_out3d_tracked/tpu_result3d.json ] && break
  timeout 1800 python train_tpu3d.py -d parity_data3d_tracked -o parity_out3d_tracked \
    --device-transform -n 2000 --patch 32,256,256 --features 32 --tracked-model \
    --seed 0 --resume > tpu3d_tracked_r4.log 2>&1
done

# 3) DSB tracked-scale run to the full 3000 its (resumes round-3's 128)
for attempt in 1 2 3; do
  [ -f parity_out_tracked/.r4done ] && break
  timeout 1800 python train_tpu.py -d parity_data256 -o parity_out_tracked \
    -n 3000 --batch-size 8 --features 64 --seed 0 --resume > tpu_tracked_r4.log 2>&1 \
    && python - <<'EOF' && touch parity_out_tracked/.r4done
import json
with open("parity_out_tracked/tpu_result.json") as f:
    r = json.load(f)
assert r["iterations"] >= 3000, r
EOF
done

echo R4 TPU STREAM DONE
