"""Sequence (time-axis) parallel primitives for very long videos.

For Epic-Kitchens-scale inputs (~1e5 frames) a single chip's HBM and the
desire for latency scaling motivate sharding the time axis across devices
(SURVEY.md §2.6).  The FACT architecture needs exactly two collective
patterns on the time axis:

* dilated temporal convolutions -> halo exchange of ``dilation`` frames
  between neighboring shards (``jax.lax.ppermute``),
* frame<->action cross-attention -> attention over a sharded key axis with a
  tiny (M <= 300) query side: local QK^T plus a collective softmax
  (pmax of row maxima + psum of row sums + psum of weighted values).

These functions run inside ``jax.shard_map`` over the ``seq`` mesh axis and
are numerically identical to their unsharded counterparts (see
tests/test_parallel.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def halo_exchange(x_local: jnp.ndarray, halo: int, axis_name: str):
    """Fetch ``halo`` frames from each neighbor along the time axis.

    x_local: (T_local, C) this shard's chunk.  Returns (left, right) halos,
    zero-filled at the sequence boundary shards (matching the zero padding a
    single-device dilated conv sees at sequence ends).
    """
    idx = jax.lax.axis_index(axis_name)
    n = jax.lax.axis_size(axis_name)

    # send my last `halo` frames to the right neighbor -> its left halo
    left = jax.lax.ppermute(
        x_local[-halo:], axis_name, [(i, (i + 1) % n) for i in range(n)]
    )
    # send my first `halo` frames to the left neighbor -> its right halo
    right = jax.lax.ppermute(
        x_local[:halo], axis_name, [(i, (i - 1) % n) for i in range(n)]
    )
    zero = jnp.zeros_like(left)
    left = jnp.where(idx == 0, zero, left)
    right = jnp.where(idx == n - 1, zero, right)
    return left, right


def sharded_dilated_conv(x_local, kernel, bias, dilation: int, ngroup: int, axis_name: str):
    """Grouped dilated conv (k=3, SAME) on a time-sharded (T_local, C) chunk.

    Equivalent to ops in models/layers.py::_dilated_conv on the gathered
    sequence: neighbor halos supply the receptive field across shard
    boundaries; the ring wrap at the global sequence ends is zeroed.
    """
    left, right = halo_exchange(x_local, dilation, axis_name)
    padded = jnp.concatenate([left, x_local, right], axis=0)[None]  # (1, T+2d, C)
    out = jax.lax.conv_general_dilated(
        padded, kernel,
        window_strides=(1,),
        padding="VALID",
        rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=ngroup,
    )[0]
    return out + bias


def collective_cross_attention(yq, xk_local, xv_local, x_mask_local, axis_name: str, scale: float):
    """Cross-attention with keys/values sharded over the time axis.

    yq: (M, D) replicated queries (action tokens);
    xk_local/xv_local: (T_local, D); x_mask_local: (T_local,).

    Returns (attended (M, Dv), probs_local (M, T_local)) — the local slice of
    the globally normalized attention matrix, so losses that consume the
    attention map keep working shard-locally.
    """
    logits = (yq @ xk_local.T) * scale  # (M, T_local)
    logits = jnp.where(x_mask_local[None, :], logits, -jnp.inf)

    row_max = jax.lax.pmax(jnp.max(logits, axis=1), axis_name)  # (M,)
    unnorm = jnp.exp(logits - row_max[:, None])
    unnorm = jnp.where(x_mask_local[None, :], unnorm, 0.0)
    denom = jax.lax.psum(unnorm.sum(axis=1), axis_name)  # (M,)
    probs_local = unnorm / jnp.maximum(denom, 1e-30)[:, None]
    attended = jax.lax.psum(probs_local @ xv_local, axis_name)  # (M, Dv)
    return attended, probs_local
