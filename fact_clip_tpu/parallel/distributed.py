"""Multi-host (multi-process) execution support.

The reference has no scale-out story at all (train.py:102-105 pins one GPU);
this is the net-new capability SURVEY.md §2.6 plans: pure data parallelism
with gradients all-reduced over ICI within a slice and DCN across slices —
all of it expressed as a *global* device mesh + GSPMD sharding, no
NCCL/MPI-style calls.

One process per host/slice: call :func:`initialize` (or export the
``FACT_COORDINATOR`` / ``FACT_NUM_PROCESSES`` / ``FACT_PROCESS_ID`` env vars
and let ``scripts/train.py`` call :func:`initialize_from_env`) before any
JAX computation.  After that, ``jax.devices()`` is the global device list,
each process feeds its local shard of every global batch
(``TrainLoader(process_id=..., process_count=...)``), and
:func:`form_global_batch` assembles global arrays from process-local data.
"""

from __future__ import annotations

import os

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(coordinator_address: str, num_processes: int, process_id: int,
               local_device_ids=None) -> None:
    """Thin wrapper over jax.distributed.initialize (idempotence guarded)."""
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )


def initialize_from_env() -> bool:
    """Initialize multi-process JAX from environment variables.

    Recognizes ``FACT_COORDINATOR`` (host:port), ``FACT_NUM_PROCESSES`` and
    ``FACT_PROCESS_ID``.  Returns True when distributed mode was engaged.
    On TPU pods with the standard runtime, plain ``jax.distributed.initialize()``
    auto-discovers everything; setting only ``FACT_COORDINATOR=auto`` selects
    that path.
    """
    addr = os.environ.get("FACT_COORDINATOR", "")
    if not addr:
        return False
    if addr == "auto":
        jax.distributed.initialize()
        return True
    nproc = int(os.environ["FACT_NUM_PROCESSES"])
    pid = int(os.environ["FACT_PROCESS_ID"])
    initialize(addr, nproc, pid)
    return True


def process_info() -> tuple:
    return jax.process_index(), jax.process_count()


def form_global_batch(mesh: Mesh, local_arrays: dict, specs: dict) -> dict:
    """Build global jax.Arrays from each process's local batch slice.

    ``local_arrays`` holds this process's rows of the global batch (shape
    (B/process_count, ...)); the returned arrays are global (B, ...) with the
    batch dim sharded over the mesh's data axis.  Single-process meshes work
    too (the local slice is the whole batch).
    """
    out = {}
    for k, v in local_arrays.items():
        sh = NamedSharding(mesh, specs.get(k, P()))
        out[k] = jax.make_array_from_process_local_data(sh, v)
    return out


def replicate_global(mesh: Mesh, tree):
    """Replicate a host-local pytree (params / TrainState) onto a global
    multi-process mesh.  Every process must hold identical values (same init
    seed); each contributes its full copy via
    ``make_array_from_process_local_data``."""
    import numpy as np

    sh = NamedSharding(mesh, P())

    def put(x):
        return jax.make_array_from_process_local_data(sh, np.asarray(x))

    return jax.tree_util.tree_map(put, tree)


def local_values(arr):
    """Fetch this process's addressable rows of a global array whose leading
    dim is batch-sharded, reassembled in row order (duplicate/replicated
    shards dedupe by start index).  Returns (B_local, ...) numpy."""
    import numpy as np

    rows = {}
    for s in arr.addressable_shards:
        start = (s.index[0].start or 0) if s.index else 0
        rows.setdefault(start, np.asarray(s.data))
    starts = sorted(rows)
    return np.concatenate([rows[k] for k in starts], axis=0)
