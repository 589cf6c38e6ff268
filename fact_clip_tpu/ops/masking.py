"""Training-time masking augmentations.

``time_mask`` is the SpecAugment-style temporal zeroing of the reference
(/root/reference/fact_clip/models/basic.py:10-36, applied blocks.py:65-68
with replace_with_zero=True); here it is vectorized over a batch with
per-video valid lengths and a static number of masks.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def time_mask(
    rng: jax.Array,
    feature: jnp.ndarray,
    lengths: jnp.ndarray,
    t_max: int,
    num_masks: int,
    p: float,
) -> jnp.ndarray:
    """Zero ``num_masks`` random temporal spans per video.

    feature: (B, T, H); lengths: (B,) valid frame counts.
    Span length ~ U{0, t_max-1} clamped to floor(p * length); start uniform
    in [0, length - span].
    """
    B, T, _ = feature.shape
    t_idx = jnp.arange(T)[None, :]  # (1, T)
    keep = jnp.ones((B, T), dtype=feature.dtype)

    for i in range(num_masks):
        rng, k1, k2 = jax.random.split(rng, 3)
        t = jax.random.randint(k1, (B,), 0, max(t_max, 1))
        t = jnp.minimum((p * lengths).astype(jnp.int32), t)
        hi = jnp.maximum(lengths - t, 1)
        t_zero = (jax.random.uniform(k2, (B,)) * hi).astype(jnp.int32)
        span = (t_idx >= t_zero[:, None]) & (t_idx < (t_zero + t)[:, None])
        keep = keep * (1.0 - span.astype(feature.dtype))

    return feature * keep[:, :, None]


def channel_mask(rng: jax.Array, feature: jnp.ndarray, rate: float) -> jnp.ndarray:
    """Channel-masking dropout (torch Dropout2d over the feature channels).

    Mirrors blocks.py:28,60-63: whole channels are zeroed per video with
    probability ``rate`` and survivors are scaled by 1/(1-rate).
    """
    if rate <= 0.0:
        return feature
    B, _, H = feature.shape
    keep = jax.random.bernoulli(rng, 1.0 - rate, (B, 1, H))
    return feature * keep.astype(feature.dtype) / (1.0 - rate)
