"""Device mesh construction and sharding helpers.

The scale-out strategy for this model family (SURVEY.md §2.6): pure data
parallelism over the ``data`` axis (the model is <50M params — gradients are
all-reduced over ICI by XLA automatically once inputs are sharded and params
replicated), plus an optional ``seq`` axis for time-sharding very long videos
(parallel/seqpar.py).  No NCCL/MPI-style backend: placement + jit is the
entire distribution story.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: int = -1, n_seq: int = 1, devices=None,
              data_axis: str = "data", seq_axis: str = "seq") -> Mesh:
    if devices is None:
        devices = jax.devices()
    if n_data is None or n_data <= 0:
        n_data = len(devices) // n_seq
    need = n_data * n_seq
    assert need <= len(devices), f"mesh {n_data}x{n_seq} needs {need} devices, have {len(devices)}"
    arr = np.array(devices[:need]).reshape(n_data, n_seq)
    return Mesh(arr, (data_axis, seq_axis))


def make_hybrid_mesh(n_slice: int = -1, n_data: int = -1, n_seq: int = 1,
                     devices=None, slice_axis: str = "slice",
                     data_axis: str = "data", seq_axis: str = "seq") -> Mesh:
    """3-axis ``(slice, data, seq)`` mesh for multi-slice TPU pods.

    Scale-out beyond one pod slice goes over DCN, which is an order of
    magnitude slower than ICI — so the inter-slice dimension must be the
    *outermost* mesh axis, carrying only data parallelism: XLA then lowers
    the gradient all-reduce hierarchically (reduce-scatter over ICI within
    each slice first, a small cross-slice exchange over DCN, all-gather over
    ICI), instead of threading every hop through DCN.  Sequence sharding
    (halo exchanges + collective softmax every layer) stays strictly
    intra-slice on the innermost axis.

    On a real multi-slice runtime (devices expose ``slice_index``) the
    physical grouping comes from ``mesh_utils.create_hybrid_device_mesh`` so
    mesh rows coincide with physical slices.  Anywhere else (single slice,
    CPU test meshes) the same logical topology is built by reshape, which
    keeps the sharding semantics — and all tests — identical.
    """
    if devices is None:
        devices = jax.devices()
    slice_ids = sorted({getattr(d, "slice_index", 0) or 0 for d in devices})
    if n_slice is None or n_slice <= 0:
        n_slice = len(slice_ids) if len(slice_ids) > 1 else 1
    if n_data is None or n_data <= 0:
        n_data = len(devices) // (n_slice * n_seq)
    need = n_slice * n_data * n_seq
    assert need <= len(devices), (
        f"mesh {n_slice}x{n_data}x{n_seq} needs {need} devices, have {len(devices)}"
    )
    if len(slice_ids) > 1 and n_slice > 1:
        from jax.experimental import mesh_utils

        arr = mesh_utils.create_hybrid_device_mesh(
            (1, n_data, n_seq), (n_slice, 1, 1), devices=devices
        )
    else:
        arr = np.array(devices[:need]).reshape(n_slice, n_data, n_seq)
    return Mesh(arr, (slice_axis, data_axis, seq_axis))


def batch_sharding(mesh: Mesh, data_axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dimension over the data axis."""
    return NamedSharding(mesh, P(data_axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, arrays: dict, data_axis: str = "data") -> dict:
    """Place a dict of batch arrays with the batch dim sharded over ``data``."""
    sh = batch_sharding(mesh, data_axis)
    return {k: jax.device_put(v, sh) for k, v in arrays.items()}


def batch_specs_2d(data_axis: str = "data", seq_axis: str = "seq") -> dict:
    """PartitionSpecs for a batch dict under data x sequence sharding.

    Frame-axis arrays shard over both axes; per-video segment arrays shard
    over data only.  XLA GSPMD propagates these through the whole model —
    including dilated convolutions (automatic halo exchange), the M x T
    cross-attentions (collective softmax), and the TDU cumsum/pooling —
    verified bit-exact against the unsharded forward in tests/test_parallel.py.
    """
    return dict(
        feats=P(data_axis, seq_axis, None),
        mask=P(data_axis, seq_axis),
        labels=P(data_axis, seq_axis),
        seg_label=P(data_axis, seq_axis),
        transcript=P(data_axis),
        seg_mask=P(data_axis),
        lengths=P(data_axis),
    )


def shard_batch_2d(mesh: Mesh, arrays: dict, data_axis: str = "data", seq_axis: str = "seq") -> dict:
    """Place a batch dict with batch over ``data`` and time over ``seq``.

    ``data_axis`` may be a tuple of mesh axes — e.g. ``("slice", "data")``
    on a :func:`make_hybrid_mesh` — in which case the batch dimension is
    sharded over their product (hybrid DCN x ICI data parallelism).
    """
    specs = batch_specs_2d(data_axis, seq_axis)
    return {
        k: jax.device_put(v, NamedSharding(mesh, specs.get(k, P())))
        for k, v in arrays.items()
    }


def shard_batch_hybrid(mesh: Mesh, arrays: dict, slice_axis: str = "slice",
                       data_axis: str = "data", seq_axis: str = "seq") -> dict:
    """Batch over ``slice x data`` (DCN-outer DP), time over ``seq``."""
    return shard_batch_2d(mesh, arrays, data_axis=(slice_axis, data_axis),
                          seq_axis=seq_axis)


def replicate_tree(mesh: Mesh, tree):
    """Replicate a pytree (params / optimizer state) across the mesh."""
    sh = replicated(mesh)
    return jax.device_put(tree, sh)


def make_eval_placer(cfg, params):
    """Length-selective sequence sharding for the eval/decode path.

    Returns ``(place, params)``.  With ``cfg.TPU.num_seq_shards > 1`` (and
    enough devices), params are replicated over a ``1 x n_seq`` mesh and
    ``place(arrays)`` shards a batch's time axis over ``seq`` — but only for
    batches whose padded length reaches ``cfg.TPU.eval_seq_min_T``: short
    buckets stay unsharded (replicated inputs on the same mesh), because at
    small T the per-layer halo exchanges and the collective softmax cost
    more than they save.  Beyond the single-chip max (245,760 frames
    inference on v5e, BASELINE.md max-T table) sharding is the only way to
    fit at all, so set ``num_seq_shards`` high enough that
    T / n_seq stays under that per-device bound.

    Decode equality under this sharding (TDU segmentation + two-branch
    argmax voting on the flagship block string) is pinned at T=98,304 by
    tests/test_parallel.py::test_eval_decode_seq_sharded_matches_dense;
    the wiring itself is exercised through the real run_eval CLI on the
    8-device CPU mesh.
    """
    n_seq = max(1, int(cfg.TPU.num_seq_shards))
    if n_seq <= 1 or jax.device_count() < n_seq:
        return (lambda arrays: arrays), params
    mesh = make_mesh(n_data=1, n_seq=n_seq)
    params = replicate_tree(mesh, params)
    min_t = int(getattr(cfg.TPU, "eval_seq_min_T", 0))

    def place(arrays: dict) -> dict:
        if arrays["feats"].shape[1] < min_t:
            # short bucket: replicated on the mesh (single-device math)
            return {k: jax.device_put(v, replicated(mesh)) for k, v in arrays.items()}
        return shard_batch_2d(mesh, arrays)

    return place, params
