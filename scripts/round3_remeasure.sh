#!/bin/bash
# Post-outage re-measurement sequence for round 3 (run when the axon relay
# is reachable again).  Each stage appends to /tmp/remeasure.log and writes
# its artifact; stages are ordered so the most important artifacts land
# first in case the relay drops again mid-run.
set -x
cd "$(dirname "$0")/.."
LOG=/tmp/remeasure.log
: > "$LOG"

# 1. hardware kernel verification artifact (VERDICT r2 item 5)
timeout 3600 python scripts/verify_hardware.py --out VERIFY_r03.json >> "$LOG" 2>&1
echo "verify_hardware rc=$?" >> "$LOG"

# 2. headline bench (driver-format JSON line, now incl. SA/FFN + frame-loss
#    kernels + flat opt state)
timeout 3600 python bench.py >> "$LOG" 2>&1
echo "bench rc=$?" >> "$LOG"

# 3. train-step profile for the post-SA-fusion tail attribution
timeout 1800 python scripts/profile_train_step.py 8 /tmp/train_trace_r3final bfloat16 >> "$LOG" 2>&1
echo "profile rc=$?" >> "$LOG"

# 4. epic-scale training number refresh
timeout 1800 python scripts/bench_epic.py --train >> "$LOG" 2>&1
echo "bench_epic rc=$?" >> "$LOG"

# 5. batch-size sweep rows (B=8/32, f32+bf16 inference)
timeout 2400 python scripts/profile_batch_sweep.py >> "$LOG" 2>&1
echo "batch_sweep rc=$?" >> "$LOG"

# 5b. AOT serving artifact latency vs the live eval step
timeout 2400 python scripts/bench_serving.py >> "$LOG" 2>&1
echo "bench_serving rc=$?" >> "$LOG"

# 5c. int8-quantized inference towers vs the f32 fused path
timeout 2400 python scripts/bench_quant.py >> "$LOG" 2>&1
echo "bench_quant rc=$?" >> "$LOG"

# 5d. epic-scale fwd+decode with the int8 towers
timeout 1800 python scripts/bench_epic.py --quantize int8 >> "$LOG" 2>&1
echo "bench_epic_q8 rc=$?" >> "$LOG"

# 6. attribute the post-SA-fusion tail: diff the fresh trace (stage 3)
#    against the archived pre-SA-fusion trace, if that archive still exists
if [ -d /tmp/train_trace_b8g ]; then
  timeout 600 python scripts/analyze_trace_diff.py \
    /tmp/train_trace_b8g 8 8 /tmp/train_trace_r3final 8 8 \
    > /tmp/remeasure_trace_diff.txt 2>&1
  echo "trace_diff rc=$? (see /tmp/remeasure_trace_diff.txt)" >> "$LOG"
fi

echo DONE >> "$LOG"
