#!/bin/bash
# Round-4 hardware sequence — run when the relay accepts FRESH Mosaic
# compiles again (mid-round-4 regression: new Pallas compiles hang
# indefinitely relay-side; cached programs and plain-XLA compiles work).
# Gate on that first, then order stages most-important-first so artifacts
# land even if the relay drops mid-run.
set -x
cd "$(dirname "$0")/.."
LOG=/tmp/remeasure4.log
: > "$LOG"

# 0. Mosaic-compile health gate: a tiny NEVER-CACHED kernel (random static
#    shape) must compile within 5 min or everything below would wedge.
timeout 300 python - >> "$LOG" 2>&1 <<'EOF'
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
n = 128 + 8 * int(np.random.default_rng().integers(0, 64))  # unseen shape
f = pl.pallas_call(lambda x_ref, o_ref: o_ref.__setitem__(..., x_ref[...] * 2),
                   out_shape=jax.ShapeDtypeStruct((n, 128), jnp.float32))
jax.jit(f)(jnp.ones((n, 128))).block_until_ready()
print("mosaic compile ok at n=%d" % n)
EOF
rc=$?
echo "mosaic_gate rc=$rc" >> "$LOG"
if [ $rc -ne 0 ]; then echo "MOSAIC COMPILES STILL WEDGED" >> "$LOG"; exit 1; fi

# 1. int8 MXU rate microbench: is s8xs8->s32 really 2x bf16 through Mosaic?
#    Decides fix-vs-demote for the whole quantized path (VERDICT r3 #1).
timeout 1800 python scripts/bench_q8_matmul.py >> "$LOG" 2>&1
echo "bench_q8_matmul rc=$?" >> "$LOG"

# 2. Mosaic-vs-interpret LN divergence sweep (rsqrt vs div_sqrt variants)
timeout 2400 python scripts/diag_quant_mosaic.py >> "$LOG" 2>&1
echo "diag_quant rc=$?" >> "$LOG"

# 3. full hardware verification artifact for the round
timeout 5400 python scripts/verify_hardware.py --out VERIFY_r04.json >> "$LOG" 2>&1
echo "verify_hardware rc=$?" >> "$LOG"

# 4. headline bench (medians + IQR since round 4)
timeout 3600 python bench.py >> "$LOG" 2>&1
echo "bench rc=$?" >> "$LOG"

# 5. train-step profile -> fresh tail attribution for the MFU work
timeout 1800 python scripts/profile_train_step.py 8 /tmp/train_trace_r4 bfloat16 >> "$LOG" 2>&1
echo "profile rc=$?" >> "$LOG"

# 6. single-chip max-T rows for the long-T table (infer f32, train bf16)
timeout 5400 python scripts/find_max_T.py --mode infer >> "$LOG" 2>&1
echo "find_max_T_infer rc=$?" >> "$LOG"
timeout 5400 python scripts/find_max_T.py --mode train >> "$LOG" 2>&1
echo "find_max_T_train rc=$?" >> "$LOG"

# 7. B>=16 f32 inference residual sweep (merge-not-clobber since round 4)
timeout 2400 python scripts/profile_batch_sweep.py >> "$LOG" 2>&1
echo "batch_sweep rc=$?" >> "$LOG"

# 8. int8 A/B with medians
timeout 2400 python scripts/bench_quant.py >> "$LOG" 2>&1
echo "bench_quant rc=$?" >> "$LOG"

echo DONE >> "$LOG"
