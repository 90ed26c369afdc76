#!/bin/bash
# Round-4 CPU stream: the torch reference sides that were missing after round
# 3 (CREMI seed 2, tracked-scale CREMI to 800 its), then the evals once the
# TPU stream has produced its preds. Ref seeds 0/1 are unchanged by the TPU
# init fix, so their round-3 preds are reused (copied into the r4 dirs).
# Run: bash run_r4_cpu.sh  (pairs with run_r4_tpu.sh on the TPU)
set -x
cd /root/repo/experiments/parity
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_PLATFORMS=cpu

# 1) missing torch side: CREMI seed 2 (1500 its, ~0.9 s/it)
for attempt in 1 2 3; do
  [ -f parity_out3d_s2/ref_torch_result3d.json ] && break
  timeout 1800 python train_ref_torch3d.py -d parity_data3d -o parity_out3d_s2 \
    -n 1500 --seed 2 --resume > ref3d_s2_r4.log 2>&1
done

# 2) missing torch side: tracked-scale CREMI (resumes round-3's it 250/800)
for attempt in 1 2 3 4; do
  [ -f parity_out3d_tracked/ref_torch_result3d.json ] && break
  timeout 3000 python train_ref_torch3d.py -d parity_data3d_tracked \
    -o parity_out3d_tracked -n 800 --patch 16,128,128 --eval-patch 32,256,256 \
    --features 32 --tracked-model --seed 0 --resume > ref3d_tracked_r4.log 2>&1
done

# 3) stage the (unchanged) round-3 ref sides into the r4 seed dirs
for s in 0 1 2; do
  [ -f parity_out3d_r4_s$s/ref_torch_preds3d.h5 ] || {
    mkdir -p parity_out3d_r4_s$s
    cp parity_out3d_s$s/ref_torch_preds3d.h5 parity_out3d_r4_s$s/ 2>/dev/null
    cp parity_out3d_s$s/ref_torch_result3d.json parity_out3d_r4_s$s/ 2>/dev/null
  }
done

# 4) evals (wait for the TPU stream's preds, up to 2h)
for s in 0 1 2; do
  for i in $(seq 1 120); do
    [ -f parity_out3d_r4_s$s/tpu_preds3d.h5 ] && break; sleep 60
  done
  [ -f parity_out3d_r4_s$s/parity_table3d.json ] || \
    timeout 600 python evaluate3d.py -d parity_data3d -o parity_out3d_r4_s$s \
      > eval3d_r4_s$s.log 2>&1
done
for i in $(seq 1 60); do
  [ -f parity_out3d_tracked/tpu_preds3d.h5 ] && break; sleep 60
done
[ -f parity_out3d_tracked/parity_table3d.json ] && \
  python - <<'EOF' || rm -f parity_out3d_tracked/parity_table3d.json
import json, sys
with open("parity_out3d_tracked/parity_table3d.json") as f:
    sys.exit(0 if len(json.load(f)) >= 2 else 1)
EOF
[ -f parity_out3d_tracked/parity_table3d.json ] || \
  timeout 900 python evaluate3d.py -d parity_data3d_tracked -o parity_out3d_tracked \
    --patch 32,256,256 > eval3d_tracked_r4.log 2>&1

# 5) DSB tracked eval at the full 3000 its
for i in $(seq 1 60); do
  [ -f parity_out_tracked/.r4done ] && break; sleep 60
done
[ -f parity_out_tracked/.r4done ] && \
  timeout 600 python evaluate.py -d parity_data256 -o parity_out_tracked \
    > eval_tracked_r4.log 2>&1

# 6) aggregate
python aggregate_r4.py > aggregate_r4.log 2>&1
echo R4 CPU STREAM DONE
