#!/bin/bash
# Multi-slice TPU pod runbook for the hybrid (slice x data x seq) mesh.
#
# Environment-blocked standing item (VERDICT r3/r4 "Missing #2"): this image
# exposes ONE v5e chip through the axon relay, so the multi-slice path is
# proven only on virtual meshes (MULTICHIP_r04.json: 8-device dryrun, hybrid
# slice=2 x data=2 x seq=2 == 2D mesh losses, 2-process x 4-device agreeing
# losses).  This is the one-shot sequence for a real pod.
#
# Usage (run ON EVERY HOST of the pod, e.g. via gcloud compute tpus ssh --worker=all):
#   bash scripts/runbook_pod.sh <cfg.yaml> [extra --set overrides...]
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
CFG=${1:?usage: runbook_pod.sh <cfg.yaml> [--set k v ...]}; shift || true

NCHIPS=$(python -c "import jax; print(len(jax.devices()))" 2>/dev/null || echo 0)
if [ "$NCHIPS" -le 1 ]; then
    echo "BLOCKED: only $NCHIPS device(s) visible — this runbook needs a pod" >&2
    echo "(single-chip axon relay cannot exercise ICI/DCN collectives)." >&2
    exit 2
fi

# 1. Engage multi-process JAX.  On a standard TPU pod runtime,
#    jax.distributed.initialize() auto-discovers coordinator/topology:
export FACT_COORDINATOR=auto
#    (non-TPU-runtime clusters instead export FACT_COORDINATOR=host:port,
#     FACT_NUM_PROCESSES, FACT_PROCESS_ID per process.)

# 2. Smoke the mesh construction + collectives before any long run: builds
#    the DCN-outer hybrid mesh (slice axis outermost so gradient all-reduce
#    lowers hierarchically: ICI reduce-scatter -> small DCN exchange -> ICI
#    all-gather) and runs one psum over it.
python - <<'EOF'
from fact_clip_tpu.parallel import distributed
distributed.initialize_from_env()
import jax, jax.numpy as jnp
from fact_clip_tpu.parallel.mesh import make_hybrid_mesh
mesh = make_hybrid_mesh()  # infers n_slice from device slice_index
print("mesh:", mesh.shape, "process", *distributed.process_info())
from jax.sharding import NamedSharding, PartitionSpec as P
x = jax.device_put(jnp.ones((len(jax.devices()), 8)),
                   NamedSharding(mesh, P(("slice", "data", "seq"))))
print("psum ok:", float(jax.jit(lambda v: v.sum())(x)))
EOF

# 3. Real training through the standard CLI.  TPU.num_slice_shards>1 selects
#    the hybrid mesh inside the train loop; sequence sharding (seq>1) stays
#    intra-slice by construction.  Start with pure data parallel across
#    slices, then add seq for long-T recipes:
python "$REPO/scripts/train.py" --cfg "$CFG" \
    --set TPU.num_slice_shards -1 TPU.num_data_shards -1 "$@"

# 4. Acceptance:
#    - all processes print identical global losses each log step (the
#      2-process virtual proof in tests/test_multihost.py is the contract);
#    - per-chip step time within ~10% of the single-chip bench at the same
#      per-chip batch (DCN exchange is only the small cross-slice leaf);
#    - checkpoint written by process 0 resumes on a DIFFERENT pod shape
#      (resume is sharding-agnostic: state is saved unsharded).
echo "Pod run complete.  Record per-chip throughput next to BENCH_LAST_GOOD.json."
