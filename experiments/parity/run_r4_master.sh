#!/bin/bash
# Round-4 TPU master (replaces the fragile chained runners): finishes the
# tracked CREMI run with resume-until-done, then DSB tracked, then pb extra
# seeds, then the same-init pb pairs, then aggregates. Sequential — one chip.
set -x
cd /root/repo/experiments/parity
export PYTHONPATH=/root/repo:/root/.axon_site

# 1) tracked CREMI (resumes; repeat until the result exists)
for attempt in 1 2 3 4 5 6; do
  [ -f parity_out3d_tracked/tpu_result3d.json ] && break
  timeout 2400 python train_tpu3d.py -d parity_data3d_tracked -o parity_out3d_tracked \
    --device-transform -n 2000 --patch 32,256,256 --features 32 --tracked-model \
    --seed 0 --resume > tpu3d_tracked_r4.log 2>&1
done
[ -f parity_out3d_tracked/parity_table3d.json ] && \
  python - <<'EOF' || rm -f parity_out3d_tracked/parity_table3d.json
import json, sys
with open("parity_out3d_tracked/parity_table3d.json") as f:
    sys.exit(0 if len(json.load(f)) >= 2 else 1)
EOF
[ -f parity_out3d_tracked/parity_table3d.json ] || \
  JAX_PLATFORMS=cpu timeout 900 python evaluate3d.py -d parity_data3d_tracked \
    -o parity_out3d_tracked --patch 32,256,256 > eval3d_tracked_r4.log 2>&1

# 2) DSB tracked to 3000 its
for attempt in 1 2 3; do
  [ -f parity_out_tracked/.r4done ] && break
  timeout 2400 python train_tpu.py -d parity_data256 -o parity_out_tracked \
    -n 3000 --batch-size 8 --features 64 --seed 0 --resume > tpu_tracked_r4.log 2>&1 \
    && python - <<'EOF' && touch parity_out_tracked/.r4done
import json
with open("parity_out_tracked/tpu_result.json") as f:
    r = json.load(f)
assert r["iterations"] >= 3000, r
EOF
done
[ -f parity_out_tracked/.r4done ] && [ ! -f parity_out_tracked/.r4eval ] && \
  JAX_PLATFORMS=cpu timeout 600 python evaluate.py -d parity_data256 \
    -o parity_out_tracked > eval_tracked_r4.log 2>&1 && touch parity_out_tracked/.r4eval

# 3) pb extra seeds 3-7
bash run_r4_tpu_extra.sh > run_r4_tpu_extra.log 2>&1

# 4) same-init pb pairs seeds 0-4
bash run_r4_ablations4.sh > run_r4_ablations4.log 2>&1

echo R4 MASTER DONE
