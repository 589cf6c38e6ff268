"""On-device linear assignment via the Bertsekas auction algorithm.

The TPU runtime in deployment does not support host callbacks from inside a
compiled program, so the Hungarian matching of the reference
(/root/reference/fact_clip/models/loss.py:146, scipy on host) is replaced on
TPU by an epsilon-scaled Jacobi auction: all unassigned segments bid in
parallel for their best token, prices rise, and the assignment converges to
the optimal one within S*eps (exact for small final eps up to cost ties).
Everything is dense (M x S <= ~300 x ~300) ``lax.while_loop`` arithmetic —
microseconds on the MXU/VPU and fully jittable.

Also provides the device formulation of the reference's greedy one-to-many
matching (loss.py:155-193) built on the same auction core.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_NEG = -1e30


def _auction_phase(value, col_valid, price, eps, max_iters):
    """One epsilon phase. value: (M, S) to maximize; returns (seg_tok, price).

    seg_tok[s] = token owned by segment s (-1 while unassigned).
    """
    M, S = value.shape
    valueT = jnp.where(col_valid[:, None], value.T, _NEG)  # (S, M); invalid segs never win

    def cond(carry):
        seg_tok, tok_seg, price, it = carry
        unassigned = (seg_tok < 0) & col_valid
        return jnp.logical_and(unassigned.any(), it < max_iters)

    def body(carry):
        # scatter-free body: every ownership update is a broadcast-compare +
        # where over the small (M, S) plane.  XLA:TPU lowers scatters into
        # latency-bound serial loops (profiled ~0.27 ms per scatter per
        # step at production sizes — ~1 ms/step across the auction); the
        # compare forms are single VPU passes.  (A lax.top_k-based rewrite
        # was ALSO slower — it lowers to a sort; plain argmax + compare
        # masking keeps everything elementwise.)
        seg_tok, tok_seg, price, it = carry
        net = valueT - price[None, :]  # (S, M)
        best_idx = jnp.argmax(net, axis=1)
        best_val = net.max(axis=1)
        m_ids = jnp.arange(M)
        net2 = jnp.where(m_ids[None, :] == best_idx[:, None], _NEG, net)
        second_val = jnp.max(net2, axis=1)
        bid = price[best_idx] + best_val - second_val + eps  # (S,)

        bidding = (seg_tok < 0) & col_valid
        tok_ids = m_ids
        bidmat = jnp.where(
            bidding[None, :] & (best_idx[None, :] == tok_ids[:, None]), bid[None, :], _NEG
        )  # (M, S)
        win_val = bidmat.max(axis=1)
        win_seg = jnp.argmax(bidmat, axis=1)
        has_bid = win_val > _NEG / 2

        price = jnp.where(has_bid, win_val, price)
        s_ids = jnp.arange(S)
        # winners: segment s won token argmax_m won[m, s] (bids are unique
        # per token, and a bidding segment bids on exactly one token)
        won = has_bid[:, None] & (win_seg[:, None] == s_ids[None, :])  # (M, S)
        won_any = won.any(axis=0)
        won_tok = jnp.argmax(won, axis=0).astype(seg_tok.dtype)
        # dispossessed: previous owner of a token that received a bid (a
        # winner is never simultaneously dispossessed: bidders are unassigned)
        disp = (has_bid & (tok_seg >= 0))[:, None] & (tok_seg[:, None] == s_ids[None, :])
        disp_any = disp.any(axis=0)
        seg_tok = jnp.where(won_any, won_tok,
                            jnp.where(disp_any, jnp.int32(-1), seg_tok))
        tok_seg = jnp.where(has_bid, win_seg, tok_seg)
        return seg_tok, tok_seg, price, it + 1

    seg_tok0 = jnp.full((S,), -1, jnp.int32)
    tok_seg0 = jnp.full((M,), -1, jnp.int32)
    seg_tok, _, price, iters = jax.lax.while_loop(
        cond, body, (seg_tok0, tok_seg0, price, jnp.int32(0))
    )
    return seg_tok, price, iters


def auction_assign(cost, col_valid, eps_rel: float = 1e-3, max_iters: int = 50000,
                   with_stats: bool = False, safety_net: bool = True,
                   phases: int = 1):
    """Minimize assignment cost. cost: (M, S); col_valid: (S,) bool.

    Returns seg_tok (S,) int32 — a distinct token per valid segment
    (0 for invalid segments; with safety_net=False, segments the auction
    left unassigned stay -1 and the caller runs ``fallback_place`` behind a
    batch-level cond).  Requires M >= number of valid segments.
    ``with_stats=True`` additionally returns a dict of convergence telemetry
    (auction iterations, segments left to the sequential safety net, the
    eps-suboptimality bound).

    phases=1 (default): a single phase with small epsilon from zero prices;
    suboptimality is bounded by S * eps = S * eps_rel * spread.  Matching
    costs here live in [-(pc + a2fc), 0], so this is far below the scale
    that changes training targets, and empirically the assignment equals
    scipy's exactly (tests/test_matching.py incl. trained-model and
    near-tie stress).

    phases>1: Bertsekas epsilon scaling — run the phase at a geometric
    ladder of epsilons from spread/4 down to spread*eps_rel, carrying prices
    forward (each phase starts near-equilibrium, so its iteration count
    stays bounded even on adversarial cost spreads where a single small-eps
    phase can churn).  Price carry-over is only sound when every phase ends
    in a PERFECT matching (with M > S tokens, a token left unowned keeps a
    stale high price from a coarse phase and — since auction prices never
    fall — stays wrongly unattractive forever; measured: breaks the bound by
    orders of magnitude on grid-valued costs).  So the scaled path pads the
    problem symmetric with zero-value dummy columns: all M tokens end owned
    each phase, the duality argument goes through with carried prices, and
    the final real-segment assignment is within M*eps_final of optimal.
    Opt in via cfg.TPU.auction_phases.
    """
    M, S = cost.shape
    value = -cost
    spread = jnp.maximum(value.max() - value.min(), 1e-3)

    if phases <= 1:
        eps = spread * eps_rel
        price = jnp.zeros((M,), value.dtype)
        seg_tok, price, total_iters = _auction_phase(value, col_valid, price, eps, max_iters)
        eps_bound = eps * col_valid.sum()
    else:
        # geometric: eps_0 = spread/4, eps_{phases-1} = spread * eps_rel
        ratio = (4.0 * eps_rel) ** (1.0 / (phases - 1))
        eps_ladder = [spread / 4.0 * (ratio ** i) for i in range(phases)]
        # symmetric padding: invalid and dummy columns get constant value 0,
        # so they soak up leftover tokens without biasing the real columns
        v_pad = jnp.zeros((M, M), value.dtype)
        v_pad = v_pad.at[:, :S].set(jnp.where(col_valid[None, :], value, 0.0))
        all_valid = jnp.ones((M,), bool)
        price = jnp.zeros((M,), value.dtype)
        total_iters = jnp.int32(0)
        for eps in eps_ladder:
            seg_tok_pad, price, iters = _auction_phase(v_pad, all_valid, price, eps, max_iters)
            total_iters = total_iters + iters
        seg_tok = jnp.where(col_valid, seg_tok_pad[:S], -1)
        eps_bound = eps_ladder[-1] * M
    fallback_segs = ((seg_tok < 0) & col_valid).sum()

    if safety_net:
        seg_tok = fallback_place(cost, col_valid, seg_tok)
    if with_stats:
        stats = {
            "iterations": total_iters,
            "fallback_segments": fallback_segs,
            "eps_bound": eps_bound,
        }
        return seg_tok, stats
    return seg_tok


def fallback_place(cost, col_valid, seg_tok):
    """Sequentially place still-unassigned (-1) segments on their best
    untaken token (auction max_iters exhaustion is pathological).  S
    sequential tiny steps — batched callers should gate this behind a
    batch-level ``lax.cond`` on ``((seg_tok < 0) & col_valid).any()`` so the
    common converged case pays nothing (under vmap a cond would become a
    select and run anyway)."""
    M, S = cost.shape
    value = -cost
    taken = jnp.zeros((M,), bool).at[jnp.where(seg_tok >= 0, seg_tok, M)].set(True, mode="drop")

    def place(i, carry):
        seg_tok, taken = carry
        need = (seg_tok[i] < 0) & col_valid[i]
        avail = jnp.where(taken, _NEG, value[:, i])
        pick = jnp.argmax(avail).astype(jnp.int32)
        new_seg = jnp.where(need, pick, seg_tok[i])
        seg_tok = seg_tok.at[i].set(new_seg)
        taken = taken.at[jnp.where(need, pick, M)].set(True, mode="drop")
        return seg_tok, taken

    seg_tok, _ = jax.lax.fori_loop(0, S, place, (seg_tok, taken))
    return jnp.maximum(seg_tok, 0)


def o2m_assign(cost, transcript, col_valid, nclasses: int):
    """Device version of the reference's one-to-many matching (loss.py:155-193).

    Stage 1: optimal assignment between tokens and the *classes* present in
    the transcript (column cost = sum of that class's segment costs); leftover
    tokens take their cheapest present class.  Stage 2: each segment picks the
    cheapest token of its class.

    cost: (M, S); transcript: (S,) int; col_valid: (S,) bool.
    Returns seg_tok (S,) int32.
    """
    class_cost, class_present = o2m_class_cost(cost, transcript, col_valid, nclasses)
    tok_for_class = auction_assign(class_cost, class_present)  # (C,) token per present class
    return o2m_stage2(cost, transcript, col_valid, tok_for_class, class_present, nclasses,
                      class_cost=class_cost)


def o2m_class_cost(cost, transcript, col_valid, nclasses: int):
    """Stage-1 inputs: per-class summed cost (M, C) and class presence (C,)."""
    onehot = jax.nn.one_hot(transcript, nclasses, dtype=cost.dtype) * col_valid[:, None]  # (S, C)
    class_present = onehot.sum(0) > 0  # (C,)
    # HIGHEST: the one-hot contraction is exact summation of cost entries —
    # default TPU precision would bf16-truncate the operands and near-tie
    # class auctions could flip vs the f32 math (same rationale as the
    # a2f/f2a einsums in models/blocks.py).
    class_cost = jnp.matmul(cost, onehot, precision=jax.lax.Precision.HIGHEST)  # (M, C)
    return class_cost, class_present


def o2m_stage2(cost, transcript, col_valid, tok_for_class, class_present, nclasses: int,
               class_cost=None):
    """Resolve token->class then segment->token from the class auction."""
    M, S = cost.shape
    if class_cost is None:
        class_cost = o2m_class_cost(cost, transcript, col_valid, nclasses)[0]

    # token -> class table: matched tokens take their auction class,
    # all other tokens take their cheapest present class
    cheap = jnp.where(class_present[None, :], class_cost, jnp.inf).argmin(axis=1)  # (M,)
    tok_class = cheap
    class_ids = jnp.arange(nclasses)
    tok_class = tok_class.at[jnp.where(class_present, tok_for_class, M)].set(
        class_ids, mode="drop"
    )

    # stage 2: per segment, cheapest token among those of its class
    same_class = tok_class[:, None] == transcript[None, :]  # (M, S)
    masked = jnp.where(same_class, cost, jnp.inf)
    seg_tok = masked.argmin(axis=0).astype(jnp.int32)
    # a segment whose class won no token (cannot happen when M >= #classes,
    # matching the reference's implicit assumption) falls back to global argmin
    has_tok = same_class.any(axis=0)
    seg_tok = jnp.where(has_tok, seg_tok, cost.argmin(axis=0).astype(jnp.int32))
    return jnp.where(col_valid, seg_tok, 0)
