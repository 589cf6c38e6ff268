"""Static-shape segment pooling for temporal down/up-sampling (TDU).

The reference's TDU leaves the device every block: it argmaxes frame
predictions, round-trips to NumPy for run-length parsing, and builds
dynamic-size index tensors (/root/reference/fact_clip/models/blocks.py:417-447
and models/basic.py:595-651).  Here everything stays on device with static
shapes: segment ids are a cumulative sum of the prediction-change mask capped
at ``s_max`` (frames beyond the cap merge into the last segment slot), and
pooling is a (T, S) one-hot assignment matmul so the work lands on the MXU.

All functions operate on a single video; batch via ``jax.vmap``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def segment_ids_from_pred(pred: jnp.ndarray, mask: jnp.ndarray, s_max: int):
    """Per-frame segment ids from a frame prediction sequence.

    pred: (T,) int — predicted class per frame
    mask: (T,) bool — valid frames (padding must be a contiguous suffix)

    Returns (seg_id (T,) int32 in [0, s_max), num_segs () int32).
    Padded frames inherit the last valid segment id (their contribution is
    removed later via ``mask``).
    """
    pred = jnp.asarray(pred)
    valid = jnp.asarray(mask)
    # a change point is a valid frame whose predecessor is valid and differs
    prev_same = jnp.concatenate([jnp.ones((1,), bool), pred[1:] == pred[:-1]])
    change = (~prev_same) & valid & jnp.concatenate([jnp.zeros((1,), bool), valid[:-1]])
    seg_id = jnp.cumsum(change.astype(jnp.int32))
    num_segs = jnp.where(valid.any(), seg_id[jnp.maximum(valid.sum() - 1, 0)] + 1, 0)
    seg_id = jnp.minimum(seg_id, s_max - 1)
    num_segs = jnp.minimum(num_segs, s_max)
    return seg_id, num_segs


def assignment_matrix(seg_id: jnp.ndarray, mask: jnp.ndarray, s_max: int) -> jnp.ndarray:
    """(T, S) one-hot frame->segment assignment, zero rows at padded frames."""
    T = seg_id.shape[0]
    onehot = jax.nn.one_hot(seg_id, s_max, dtype=jnp.float32)
    return onehot * jnp.asarray(mask, jnp.float32)[:, None]


def segment_lengths(P: jnp.ndarray) -> jnp.ndarray:
    """(S,) frame count of each segment from the assignment matrix."""
    return P.sum(axis=0)


def pool_mean(P: jnp.ndarray, frame_feature: jnp.ndarray) -> jnp.ndarray:
    """Mean-pool frame features into segments: (T, H) -> (S, H).

    Matches ``TemporalDownsampleUpsample.feature_frame2seg`` with
    normalize=True (basic.py:615-625).  Empty segment slots yield zeros.
    """
    seg_sum = P.T @ frame_feature  # (S, H) — one GEMM on the MXU
    lens = segment_lengths(P)
    return seg_sum / jnp.maximum(lens, 1.0)[:, None]


def pool_mean_rows(P: jnp.ndarray, frame_rows: jnp.ndarray) -> jnp.ndarray:
    """Mean-pool per-frame rows (T, A) -> (S, A) (attn_frame2seg, basic.py:627-636)."""
    return pool_mean(P, frame_rows)


def unpool(seg_feature: jnp.ndarray, seg_id: jnp.ndarray) -> jnp.ndarray:
    """Broadcast segment features back to frames: (S, H) -> (T, H).

    Matches ``feature_seg2frame`` (basic.py:638-643): a gather by segment id.
    """
    return seg_feature[seg_id]


def segment_centers(P: jnp.ndarray, s_max: int) -> jnp.ndarray:
    """(S,) int32 center frame index of each segment: floor((start+end)/2).

    Matches the reference's segment-center positional-encoding lookup
    (blocks.py:454-455).  Empty segments get center 0.
    """
    T = P.shape[0]
    t_idx = jnp.arange(T, dtype=jnp.float32)[:, None]
    big = jnp.float32(T + 1)
    starts = jnp.min(jnp.where(P > 0, t_idx, big), axis=0)
    ends = jnp.max(jnp.where(P > 0, t_idx, -1.0), axis=0)
    centers = jnp.floor((starts + ends) / 2.0)
    valid = segment_lengths(P) > 0
    centers = jnp.where(valid, centers, 0.0)
    return centers.astype(jnp.int32)


def pool_onehot_labels(P: jnp.ndarray, onehot: jnp.ndarray) -> jnp.ndarray:
    """Length-normalized pooling of per-frame one-hot labels: (T, C) -> (S, C).

    Matches the ``index_add_`` + divide-by-length pattern used by the TDU
    losses (/root/reference/fact_clip/models/loss.py:229-232,267-270).
    """
    pooled = P.T @ onehot
    lens = segment_lengths(P)
    return pooled / jnp.maximum(lens, 1.0)[:, None]
