#!/bin/bash
# Finish the DSB tracked config to the full 3000-iteration reference recipe
# length (resume-until-done), then re-evaluate and re-aggregate.
set -x
cd /root/repo/experiments/parity
export PYTHONPATH=/root/repo:/root/.axon_site

for attempt in 1 2 3 4; do
  [ -f parity_out_tracked/.r4done ] && break
  timeout 2400 python train_tpu.py -d parity_data256 -o parity_out_tracked \
    -n 3000 --batch-size 8 --features 64 --seed 0 --resume > tpu_tracked_r4.log 2>&1
  python - <<'EOF' && touch parity_out_tracked/.r4done
import json
with open("parity_out_tracked/tpu_result.json") as f:
    r = json.load(f)
assert r["iterations"] >= 3000, r
EOF
done
if [ -f parity_out_tracked/.r4done ]; then
  rm -f parity_out_tracked/.r4eval
  JAX_PLATFORMS=cpu timeout 600 nice -n 19 python evaluate.py -d parity_data256 \
    -o parity_out_tracked > eval_tracked_r4.log 2>&1 && touch parity_out_tracked/.r4eval
  nice -n 19 python aggregate_r4.py > aggregate_r4.log 2>&1
fi
echo DSB FINISH DONE
