"""Inference decoding — pure XLA ops on the last block's saves.

Matches the reference's two-branch decode (Block._eval,
/root/reference/fact_clip/models/blocks.py:242-261), the transcript-
restricted variant (:263-275), and FACT_CLIP's zero-shot decode where the
CLIP cosine-similarity softmax replaces the frame branch (:788-887).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _abranch_prob(action_clogit, a2f_attn, token_mask):
    """Per-frame action-token-vote probabilities plus the has-action flag.

    action_clogit: (B, M, C+1); a2f_attn: (B, T, M) probs over tokens.
    Returns (abranch_prob (B, T, C), has_action (B,)).
    """
    null_id = action_clogit.shape[-1] - 1
    qtk_cpred = jnp.argmax(action_clogit, axis=-1)  # (B, M)
    nonnull = (qtk_cpred != null_id) & token_mask
    has_action = nonnull.any(axis=1)

    qtk_prob = jax.nn.softmax(action_clogit[..., :-1], axis=-1)  # (B, M, C)

    neg = jnp.asarray(-jnp.inf, a2f_attn.dtype)
    attn_masked = jnp.where(nonnull[:, None, :], a2f_attn, neg)
    act_idx = jnp.argmax(attn_masked, axis=-1)  # (B, T)
    abranch = jax.vmap(lambda qp, ai: qp[ai])(qtk_prob, act_idx)  # (B, T, C)
    return abranch, has_action


def decode_two_branch(action_clogit, a2f_attn, frame_clogit, weight: float, token_mask):
    """Blend action-token votes with frame logits; fall back to the frame
    branch when no token predicts a non-null class (blocks.py:242-261)."""
    fbranch = jax.nn.softmax(frame_clogit, axis=-1)  # (B, T, C)
    abranch, has_action = _abranch_prob(action_clogit, a2f_attn, token_mask)
    prob = (1.0 - weight) * abranch + weight * fbranch
    pred = jnp.argmax(prob, axis=-1)
    fallback = jnp.argmax(fbranch, axis=-1)
    return jnp.where(has_action[:, None], pred, fallback)


def decode_with_transcript(transcript, seg_mask, a2f_attn, frame_clogit, weight: float):
    """Restrict predictions to the given transcript (blocks.py:263-275).

    a2f_attn: (B, T, M) attention *probabilities*; the reference re-softmaxes
    the first S columns (its M == S in transcript mode).
    """
    fbranch_all = jax.nn.softmax(frame_clogit, axis=-1)  # (B, T, C)
    fbranch = jax.vmap(lambda f, t: f[:, t])(fbranch_all, transcript)  # (B, T, S)

    neg = jnp.asarray(-jnp.inf, a2f_attn.dtype)
    attn = jnp.where(seg_mask[:, None, :], a2f_attn, neg)
    abranch = jax.nn.softmax(attn, axis=-1)

    prob = (1.0 - weight) * abranch + weight * fbranch
    prob = jnp.where(seg_mask[:, None, :], prob, neg)
    idx = jnp.argmax(prob, axis=-1)  # (B, T)
    return jnp.take_along_axis(transcript, idx, axis=1)


def decode_two_branch_logp(action_logp, a2f_attn, frame_logp, weight: float, token_mask):
    """Verb/noun variant of the two-branch decode
    (blocks_SepVerbNoun.py:323-342): inputs are composed action
    log-probabilities; token probs are exp(logp) renormalized over non-null.
    """
    fbranch = jnp.exp(frame_logp)  # (B, T, C)
    null_id = action_logp.shape[-1] - 1
    qtk_cpred = jnp.argmax(action_logp, axis=-1)
    nonnull = (qtk_cpred != null_id) & token_mask
    has_action = nonnull.any(axis=1)

    qtk_prob = jnp.exp(action_logp[..., :-1])
    qtk_prob = qtk_prob / jnp.maximum(qtk_prob.sum(axis=-1, keepdims=True), 1e-12)

    neg = jnp.asarray(-jnp.inf, a2f_attn.dtype)
    attn_masked = jnp.where(nonnull[:, None, :], a2f_attn, neg)
    act_idx = jnp.argmax(attn_masked, axis=-1)
    abranch = jax.vmap(lambda qp, ai: qp[ai])(qtk_prob, act_idx)

    prob = (1.0 - weight) * abranch + weight * fbranch
    pred = jnp.argmax(prob, axis=-1)
    fallback = jnp.argmax(fbranch, axis=-1)
    return jnp.where(has_action[:, None], pred, fallback)


def decode_transcript_attn_only(transcript, seg_mask, a2f_attn):
    """Verb/noun transcript decode (blocks_SepVerbNoun.py:344-349):
    pure argmax over the transcript's attention columns."""
    neg = jnp.asarray(-jnp.inf, a2f_attn.dtype)
    attn = jnp.where(seg_mask[:, None, :], a2f_attn, neg)
    idx = jnp.argmax(attn, axis=-1)
    return jnp.take_along_axis(transcript, idx, axis=1)


def decode_with_clip(action_clogit, a2f_attn, frame_emb, text_emb, temp: float,
                     weight: float, token_mask):
    """Zero-shot decode: CLIP cosine-similarity softmax *replaces* the frame
    branch, blended with the action branch at ``weight`` (blocks.py:788-887)."""
    sim = jnp.einsum("bte,ne->btn", frame_emb, text_emb) / temp
    fbranch_clip = jax.nn.softmax(sim, axis=-1)  # (B, T, n)
    abranch, has_action = _abranch_prob(action_clogit, a2f_attn, token_mask)
    prob = (1.0 - weight) * abranch + weight * fbranch_clip
    pred = jnp.argmax(prob, axis=-1)
    fallback = jnp.argmax(fbranch_clip, axis=-1)
    return jnp.where(has_action[:, None], pred, fallback)
