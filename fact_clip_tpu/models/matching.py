"""Token <-> ground-truth-segment matching.

Reproduces MatchCriterion.match (/root/reference/fact_clip/models/loss.py:108-193):
cost = -pc * P(segment class) - a2fc * softIoU(a2f_attn, segment), solved by

* ``o2o``  — Hungarian assignment (scipy on host via jax.pure_callback; the
  cost matrix is at most ntoken x S ~ 300 x 165, negligible traffic),
* ``o2m``  — the reference's greedy two-stage class-grouped assignment,
* ``seq``  — identity (transcript mode).

The batched result is ``seg2tok (B, S)``: the token index assigned to each
ground-truth segment (exactly one token per segment in every mode; a token
may serve several same-class segments under o2m).  This representation is
equivalent to the reference's (action_ind, seg_ind) pair lists.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from scipy.optimize import linear_sum_assignment


def soft_iou(a2f_attn: jnp.ndarray, seg_label: jnp.ndarray, seg_mask: jnp.ndarray,
             frame_mask: jnp.ndarray) -> jnp.ndarray:
    """Soft IoU between token attention columns and GT segments.

    a2f_attn: (B, T, M) — rows softmax over tokens (each valid frame sums to 1)
    Returns (B, M, S).

    Uses the closed form union = seg_len + attn_sum - overlap, valid because
    min(a + b, 1) = a + b - a*b for a in [0, 1], b in {0, 1}; this avoids the
    reference's (T, M, S) broadcast (loss.py:91-106).
    """
    S = seg_mask.shape[1]
    onehot = jax.nn.one_hot(seg_label, S, dtype=a2f_attn.dtype) * frame_mask[..., None]  # (B,T,S)
    attn = a2f_attn * frame_mask[..., None]
    overlap = jnp.einsum("btm,bts->bms", attn, onehot)
    attn_sum = attn.sum(axis=1)  # (B, M)
    seg_len = onehot.sum(axis=1)  # (B, S)
    union = seg_len[:, None, :] + attn_sum[:, :, None] - overlap
    iou = jnp.where(union > 0, overlap / jnp.maximum(union, 1e-12), 0.0)
    return iou * seg_mask[:, None, :]


def match_cost(action_cprob, a2f_attn, transcript, seg_label, seg_mask, frame_mask, pc, a2fc):
    """Matching cost (B, M, S); mirrors loss.py:128-142 (no_grad there)."""
    cost = jnp.zeros((action_cprob.shape[0], action_cprob.shape[1], transcript.shape[1]),
                     action_cprob.dtype)
    if pc > 0:
        prob = jnp.take_along_axis(action_cprob, transcript[:, None, :], axis=2)  # (B,M,S)
        cost = cost - pc * prob
    if a2fc > 0:
        cost = cost - a2fc * soft_iou(a2f_attn, seg_label, seg_mask, frame_mask)
    return jax.lax.stop_gradient(cost)


# ------------------------------------------------------------------- host solvers


def _hungarian_host(cost: np.ndarray, nsegs: np.ndarray) -> np.ndarray:
    """o2o: scipy Hungarian per batch element on the valid S prefix."""
    B, M, S = cost.shape
    out = np.zeros((B, S), np.int32)
    for b in range(B):
        s = int(nsegs[b])
        if s == 0:
            continue
        rows, cols = linear_sum_assignment(cost[b, :, :s])
        out[b, cols] = rows.astype(np.int32)
    return out


def _o2m_host(cost: np.ndarray, transcript: np.ndarray, nsegs: np.ndarray) -> np.ndarray:
    """o2m: the reference's greedy two-stage matching (loss.py:155-193)."""
    B, M, S = cost.shape
    out = np.zeros((B, S), np.int32)
    for b in range(B):
        s = int(nsegs[b])
        if s == 0:
            continue
        c = cost[b, :, :s]
        trans = transcript[b, :s]
        actions = np.unique(trans)

        # stage 1: Hungarian between tokens and *classes* (summed column costs)
        token2action_cost = np.stack([c[:, trans == a].sum(1) for a in actions], axis=1)
        _aid, _cid = linear_sum_assignment(token2action_cost)

        unassign_aid = [a for a in range(M) if a not in _aid]
        unassign_cid = token2action_cost[unassign_aid].argmin(1)
        all_aid = np.array(list(_aid) + unassign_aid)
        all_cid = np.array([actions[i] for i in list(_cid) + list(unassign_cid)])

        atoken_cid = np.zeros(M)
        atoken_cid[all_aid] = all_cid

        # stage 2: per class, each segment picks its cheapest token of that class
        for a in actions:
            seg_where = np.where(trans == a)[0]
            token_where = np.where(atoken_cid == a)[0]
            subset = c[token_where][:, seg_where]
            assign = subset.argmin(0)
            for sidx, tpos in zip(seg_where, assign):
                out[b, sidx] = token_where[tpos]
    return out


def resolve_matcher(matcher: str = "auto") -> str:
    """'host' = scipy via pure_callback (needs callback support — CPU/GPU
    backends); 'auction' = on-device solver (the TPU path; the deployment
    PJRT rejects host callbacks inside compiled programs)."""
    if matcher != "auto":
        return matcher
    if jax.process_count() > 1:
        # host callbacks under multi-process GSPMD would gather sharded
        # operands per process; keep matching on device
        return "auction"
    return "host" if jax.default_backend() == "cpu" else "auction"


def run_match(cost, transcript, seg_mask, mode: str, matcher: str = "auto", nclasses: int = None,
              phases: int = 1):
    """Dispatch to the solver; returns seg2tok (B, S) int32."""
    B, M, S = cost.shape
    if mode == "seq":
        # identity matching: token k <-> segment k (loss.py:121-126)
        return jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32)[None], (B, S))

    matcher = resolve_matcher(matcher)
    nsegs = seg_mask.sum(axis=1).astype(jnp.int32)

    if matcher == "auction":
        from ..ops import assignment

        if mode == "o2o":
            st = jax.vmap(
                lambda c, m: assignment.auction_assign(c, m, safety_net=False, phases=phases)
            )(cost, seg_mask)
            # the sequential S-step fallback only compiles into the taken
            # branch: the auction converges in a couple of iterations in
            # practice, so the common case pays nothing
            return jax.lax.cond(
                ((st < 0) & seg_mask).any(),
                lambda st: jax.vmap(assignment.fallback_place)(cost, seg_mask, st),
                lambda st: jnp.maximum(st, 0),
                st,
            )
        if mode == "o2m":
            assert nclasses is not None, "o2m on device needs the class count"
            t32 = transcript.astype(jnp.int32)
            class_cost, class_present = jax.vmap(
                lambda c, t, m: assignment.o2m_class_cost(c, t, m, nclasses)
            )(cost, t32, seg_mask)
            tfc = jax.vmap(
                lambda c, m: assignment.auction_assign(c, m, safety_net=False, phases=phases)
            )(class_cost, class_present)
            tfc = jax.lax.cond(  # same rarely-taken fallback gating as o2o
                ((tfc < 0) & class_present).any(),
                lambda t: jax.vmap(assignment.fallback_place)(class_cost, class_present, t),
                lambda t: jnp.maximum(t, 0),
                tfc,
            )
            return jax.vmap(
                lambda c, t, m, tf, cp, cc: assignment.o2m_stage2(
                    c, t, m, tf, cp, nclasses, class_cost=cc)
            )(cost, t32, seg_mask, tfc, class_present, class_cost)
        raise ValueError(f"Unknown match mode {mode!r}")

    result_shape = jax.ShapeDtypeStruct((B, S), jnp.int32)
    if mode == "o2o":
        return jax.pure_callback(
            _hungarian_host, result_shape, cost, nsegs, vmap_method="sequential"
        )
    if mode == "o2m":
        return jax.pure_callback(
            _o2m_host, result_shape, cost, transcript.astype(jnp.int32), nsegs,
            vmap_method="sequential",
        )
    raise ValueError(f"Unknown match mode {mode!r}")


def match(cfg_loss, action_cprob, a2f_attn, transcript, seg_label, seg_mask, frame_mask,
          matcher: str = "auto", nclasses: int = None, phases: int = 1):
    """Full matching step: cost + solve.  All inputs batched."""
    if cfg_loss.match == "seq":
        B, S = transcript.shape
        return jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32)[None], (B, S))
    cost = match_cost(
        action_cprob, a2f_attn, transcript, seg_label, seg_mask, frame_mask,
        cfg_loss.pc, cfg_loss.a2fc,
    )
    return run_match(cost, transcript, seg_mask, cfg_loss.match, matcher=matcher, nclasses=nclasses,
                     phases=phases)
