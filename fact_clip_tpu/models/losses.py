"""Batched, masked training losses.

Numerically equivalent (per video) to MatchCriterion and the standalone
losses in /root/reference/fact_clip/models/loss.py, reformulated over padded
batches: every normalizer (frame counts, segment counts, class-weight sums)
is computed per video from validity masks, so padding never perturbs the
loss, and the batch loss is the mean of per-video losses — exactly the
reference's Python-loop averaging (blocks.py:108-130).

One deliberate deviation: the reference multiplies the per-segment weight
vector (transcript order) onto loss columns ordered by the *matching* result,
which silently permutes weights when the Hungarian column order is not
sorted (loss.py:218-219).  We apply the weight of the segment the column
actually represents.  With the default bgw=1.0 configs the two are identical;
for non-uniform segment weights (egoprocel ships bgw=0.5),
``cfg.Loss.ref_weight_order: true`` reproduces the reference's permuted
order exactly (see ``ref_order_sweight``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def build_class_weights(cfg, nclasses: int, bg_ids, class_weight=None) -> np.ndarray:
    """(C+1,) class weights: 1, bgw at background ids, nullw at the null slot.

    Mirrors MatchCriterion.set_label (loss.py:64-72).
    """
    w = np.ones(nclasses + 1, np.float32)
    w[-1] = cfg.Loss.nullw
    if class_weight is not None:
        w[:nclasses] = np.asarray(class_weight, np.float32)
    else:
        for i in bg_ids:
            w[i] = cfg.Loss.bgw
    return w


def compute_null_weight(cfg, dataset):
    """Auto nullw = ntoken / (num_null * nclasses) (train_tools.py:54-71)."""
    ntoken = cfg.FACT.ntoken
    num_null = ntoken - dataset.average_transcript_len
    if cfg.dataset == "epic":
        null_weight = ntoken / (num_null * (301 + 98) / 2)
    else:
        null_weight = ntoken / (num_null * dataset.nclasses)
    cfg.defrost()
    cfg.Loss.nullw = float(null_weight)
    return cfg


def masked_log_softmax(logits, mask, axis):
    """log_softmax restricted to ``mask`` entries along ``axis``."""
    neg = jnp.asarray(-1e9, logits.dtype)
    masked = jnp.where(mask, logits, neg)
    return jax.nn.log_softmax(masked, axis=axis)


# --------------------------------------------------------------------------
# per-loss terms; every function returns a per-video (B,) vector


def action_token_loss(action_clogit, seg2tok, transcript, seg_mask, cweight):
    """Weighted CE of token logits vs matched class, null elsewhere
    (loss.py:195-207; torch weighted-CE normalization = sum of target weights)."""
    B, M, C1 = action_clogit.shape
    null_id = C1 - 1

    clabel = jnp.full((B, M), null_id, jnp.int32)
    idx = jnp.where(seg_mask, seg2tok, M)  # invalid segments scatter out of range
    val = jnp.where(seg_mask, transcript, null_id).astype(jnp.int32)
    clabel = clabel.at[jnp.arange(B)[:, None], idx].set(val, mode="drop")

    logp = jax.nn.log_softmax(action_clogit, axis=-1)
    # gather-free label pick: one-hot contraction stays on the VPU/MXU where
    # take_along_axis lowers to a latency-bound serial gather on TPU
    onehot = jax.nn.one_hot(clabel, C1, dtype=logp.dtype)
    ce = -(logp * onehot).sum(axis=-1)  # (B, M)
    w = onehot @ cweight  # (B, M)
    return (ce * w).sum(axis=1) / jnp.maximum(w.sum(axis=1), 1e-12)


def _build_targets(seg_label, frame_mask, seg_mask):
    """Hard frame->GT-segment membership Y (B, R, S)."""
    S = seg_mask.shape[1]
    Y = jax.nn.one_hot(seg_label, S, dtype=jnp.float32) * frame_mask[..., None]
    return Y * seg_mask[:, None, :]


def a2f_attn_loss(logits_r2m, seg2tok, seg_mask, Y, sweight):
    """Cross-attention loss, softmax over the matched-token axis.

    logits_r2m: (B, R, M) attention logits, rows = frames or predicted segs.
    Y: (B, R, S) row->GT-segment (soft) membership.
    Matches cross_attn_loss(dim=2) / cross_attn_loss_tdu(dim=2)
    (loss.py:209-222,224-244): columns are gathered by the matching (with
    multiplicity under o2m) before the log-softmax.
    """
    # gather-free column pick: the (B, R, M) -> (B, R, S) take_along_axis
    # backward lowers to a serial scatter-add over R (~3000 frames) on TPU;
    # a one-hot contraction is two small MXU matmuls instead.  HIGHEST
    # precision keeps it bit-exact (one-hot rows select, never mix, values).
    M = logits_r2m.shape[2]
    A = jax.nn.one_hot(seg2tok, M, dtype=logits_r2m.dtype)  # (B, S, M)
    G = jnp.einsum("brm,bsm->brs", logits_r2m, A,
                   precision=jax.lax.Precision.HIGHEST)
    logp = masked_log_softmax(G, seg_mask[:, None, :], axis=2)
    loss = -(logp * Y * sweight[:, None, :]).sum(axis=(1, 2))
    norm = Y.sum(axis=(1, 2))
    return loss / jnp.maximum(norm, 1e-12)


def f2a_attn_loss(logits_m2r, seg2tok, seg_mask, row_mask, Y, sweight):
    """Cross-attention loss, softmax over rows (frames / predicted segs).

    logits_m2r: (B, M, R).  Matches cross_attn_loss(dim=1) variants.
    """
    # gather-free row pick (see a2f_attn_loss: scatter-free backward)
    M = logits_m2r.shape[1]
    A = jax.nn.one_hot(seg2tok, M, dtype=logits_m2r.dtype)  # (B, S, M)
    G = jnp.einsum("bmr,bsm->bsr", logits_m2r, A,
                   precision=jax.lax.Precision.HIGHEST)
    logp = masked_log_softmax(G, row_mask[:, None, :], axis=2)
    Yt = Y.transpose(0, 2, 1)  # (B, S, R)
    loss = -(logp * Yt * sweight[:, :, None]).sum(axis=(1, 2))
    norm = Y.sum(axis=(1, 2))
    return loss / jnp.maximum(norm, 1e-12)


def frame_loss(frame_clogit, labels, frame_mask, cweight, is_logit=True):
    """Class-weighted CE on frame logits, normalized by frame count
    (loss.py:246-258)."""
    C = frame_clogit.shape[-1]
    logp = jax.nn.log_softmax(frame_clogit, axis=-1) if is_logit else frame_clogit
    # gather-free label pick (see action_loss): the per-frame
    # take_along_axis over (B, T, C) profiled at ~0.25 ms/step per block on
    # v5e — a one-hot contraction is ~free
    onehot = jax.nn.one_hot(labels.astype(jnp.int32), C, dtype=logp.dtype)
    ce = -(logp * onehot).sum(axis=-1)  # (B, T)
    w = onehot @ cweight[:C]
    m = frame_mask.astype(ce.dtype)
    return (ce * w * m).sum(axis=1) / jnp.maximum(m.sum(axis=1), 1e-12)


def frame_loss_tdu(seg_clogit, P, labels, cweight, is_logit=True):
    """Weighted CE on length-normalized pooled labels (loss.py:260-277)."""
    C = seg_clogit.shape[-1]
    onehot = jax.nn.one_hot(labels, C, dtype=jnp.float32)
    pooled = jnp.einsum("bts,btc->bsc", P, onehot)
    lens = P.sum(axis=1)  # (B, S_pred)
    zoomed = pooled / jnp.maximum(lens, 1.0)[..., None]
    logp = jax.nn.log_softmax(seg_clogit, axis=-1) if is_logit else seg_clogit
    loss = -(logp * zoomed * cweight[:C]).sum(axis=(1, 2))
    norm = zoomed.sum(axis=(1, 2))
    return loss / jnp.maximum(norm, 1e-12)


def verbnoun_action_token_loss(action_logp, seg2tok, transcript, seg_mask, cweight):
    """Multi-hot token loss of the verb/noun model
    (blocks_SepVerbNoun.py:271-283): default target = null class, matched
    tokens target their segment's action class; mean over tokens."""
    B, M, C1 = action_logp.shape
    null_id = C1 - 1
    clabel = jnp.zeros((B, M, C1), jnp.float32).at[:, :, null_id].set(1.0)
    idx = jnp.where(seg_mask, seg2tok, M)
    # clear matched rows, then set the matched class
    clabel = clabel.at[jnp.arange(B)[:, None], idx, null_id].set(0.0, mode="drop")
    val = jnp.where(seg_mask, transcript, 0).astype(jnp.int32)
    clabel = clabel.at[jnp.arange(B)[:, None], idx, val].set(
        jnp.where(seg_mask, 1.0, 0.0), mode="drop"
    )
    loss = ((-action_logp * clabel) * cweight).sum(axis=-1)
    return loss.mean(axis=1)


def smooth_loss(logits, pair_mask, col_mask=None, is_logit=True):
    """Truncated squared difference of adjacent log-softmax rows
    (loss.py:8-18), masked mean over valid adjacent pairs.

    logits: (B, R, C); pair_mask: (B, R-1) — both frames valid.
    """
    if is_logit:
        if col_mask is not None:
            ls = masked_log_softmax(logits, col_mask[:, None, :], axis=-1)
        else:
            ls = jax.nn.log_softmax(logits, axis=-1)
    else:
        ls = logits
    d = jnp.clip((ls[:, 1:] - ls[:, :-1]) ** 2, 0.0, 16.0)
    pm = pair_mask.astype(d.dtype)[..., None]
    if col_mask is not None:
        pm = pm * col_mask[:, None, :].astype(d.dtype)
        denom = pair_mask.sum(axis=1) * jnp.maximum(col_mask.sum(axis=1), 1)
    else:
        denom = pair_mask.sum(axis=1) * logits.shape[-1]
    return (d * pm).sum(axis=(1, 2)) / jnp.maximum(denom, 1e-12)


# --------------------------------------------------------------------------
# fused (Pallas) frame CE + smoothing path


def frame_ce_smooth(frame_clogit, labels, frame_mask, cweight, use_pallas=False):
    """(frame_loss, smooth_loss) on frame logits, optionally via the fused
    single-pass Pallas kernel (ops/pallas/frame_loss.py).  Identical math:
    the kernel returns the unnormalized sums and the normalizers here mirror
    frame_loss / smooth_loss exactly."""
    C = frame_clogit.shape[-1]
    # class weights are config constants (reference passes them as torch CE
    # weight args); treat them as non-differentiable on BOTH paths so the
    # fused kernel's zero cweight-cotangent cannot silently diverge from XLA
    cweight = jax.lax.stop_gradient(cweight)
    pair_mask = frame_mask[:, 1:] & frame_mask[:, :-1]
    if use_pallas:
        from ..ops.pallas.frame_loss import fused_ce_smooth_sums

        ce_sum, sl_sum = fused_ce_smooth_sums(
            frame_clogit.astype(jnp.float32), labels, frame_mask, cweight)
        m = frame_mask.astype(jnp.float32).sum(axis=1)
        fl = ce_sum / jnp.maximum(m, 1e-12)
        sl = sl_sum / jnp.maximum(pair_mask.sum(axis=1) * C, 1e-12)
        return fl, sl
    return (frame_loss(frame_clogit, labels, frame_mask, cweight),
            smooth_loss(frame_clogit, pair_mask))


def smooth_loss_opt(logits, frame_mask, col_mask, use_pallas=False):
    """smooth_loss with the fused kernel when there is no column mask."""
    pair_mask = frame_mask[:, 1:] & frame_mask[:, :-1]
    if use_pallas and col_mask is None:
        from ..ops.pallas.frame_loss import fused_smooth_sum

        sl_sum = fused_smooth_sum(logits.astype(jnp.float32), frame_mask)
        return sl_sum / jnp.maximum(pair_mask.sum(axis=1) * logits.shape[-1], 1e-12)
    return smooth_loss(logits, pair_mask, col_mask=col_mask)


# --------------------------------------------------------------------------
# per-block compositions (blocks.py:313-320, 369-382, 487-497)


def ref_order_sweight(sweight, seg2tok, seg_mask):
    """Permute segment weights into the reference's matching order.

    The reference (loss.py:218-219) weights cross-attention loss column j —
    which represents segment sind[j], pairs sorted by matched *token* index —
    by sweight[j].  Equivalently, segment s receives the weight of the
    segment whose rank equals s's rank under seg2tok ordering.
    """
    big = jnp.asarray(1 << 30, seg2tok.dtype)
    order = jnp.argsort(jnp.where(seg_mask, seg2tok, big), axis=1)  # rank -> segment
    rank = jnp.argsort(order, axis=1)  # segment -> rank
    return jnp.take_along_axis(sweight, rank, axis=1)


def block_loss(saves: dict, batch: dict, seg2tok, cweight_arr, sw: float, token_mask=None,
               ref_weight_order: bool = False, use_pallas: bool = False):
    """Per-video loss (B,) of one block, matching Block.compute_loss."""
    labels = batch["labels"]
    frame_mask = batch["mask"]
    seg_label = batch["seg_label"]
    transcript = batch["transcript"]
    seg_mask = batch["seg_mask"]

    sweight = jnp.where(seg_mask, cweight_arr[transcript], 0.0)
    if ref_weight_order:
        sweight = ref_order_sweight(sweight, seg2tok, seg_mask)

    fl, sl = frame_ce_smooth(saves["frame_clogit"], labels, frame_mask, cweight_arr,
                             use_pallas=use_pallas)
    atk = action_token_loss(saves["action_clogit"], seg2tok, transcript, seg_mask, cweight_arr)

    kind = saves["kind"]
    if kind == "i":
        return fl + atk + sw * sl

    if kind == "u":
        Y = _build_targets(seg_label, frame_mask, seg_mask)
        f2a = f2a_attn_loss(saves["f2a_attn_logit"], seg2tok, seg_mask, frame_mask, Y, sweight)
        a2f = a2f_attn_loss(saves["a2f_attn_logit"], seg2tok, seg_mask, Y, sweight)
        al = smooth_loss_opt(saves["a2f_attn_logit"], frame_mask, token_mask,
                             use_pallas=use_pallas)
        flog = saves["f2a_attn_logit"].transpose(0, 2, 1)  # (B, T, M)
        fsl = smooth_loss_opt(flog, frame_mask, token_mask, use_pallas=use_pallas)
        return atk + f2a + a2f + fl + sw * (al + fsl + sl)

    if kind == "U":
        P = saves["tdu_P"]
        seg_valid = saves["tdu_seg_valid"]
        seg_loss = frame_loss_tdu(saves["seg_clogit"], P, labels, cweight_arr)
        # soft targets: GT-segment membership pooled over predicted segments
        S_gt = seg_mask.shape[1]
        onehot_gt = jax.nn.one_hot(seg_label, S_gt, dtype=jnp.float32) * frame_mask[..., None]
        pooled = jnp.einsum("btp,bts->bps", P, onehot_gt)
        lens = P.sum(axis=1)
        Y = pooled / jnp.maximum(lens, 1.0)[..., None]  # (B, S_pred, S_gt)
        Y = Y * seg_mask[:, None, :]
        f2a = f2a_attn_loss(saves["f2a_attn_logit"], seg2tok, seg_mask, seg_valid, Y, sweight)
        a2f = a2f_attn_loss(saves["a2f_attn_logit"], seg2tok, seg_mask, Y, sweight)
        return (fl + seg_loss) / 2.0 + atk + f2a + a2f + sw * sl

    raise ValueError(kind)


def fact_loss(saves_list, batch, seg2tok, cweight_arr, sw: float, token_mask=None,
              ref_weight_order: bool = False, use_pallas: bool = False):
    """Mean over blocks of per-video block losses -> (B,) per-video loss
    (blocks.py:90-106)."""
    per_block = [
        block_loss(s, batch, seg2tok, cweight_arr, sw, token_mask=token_mask,
                   ref_weight_order=ref_weight_order, use_pallas=use_pallas)
        for s in saves_list
    ]
    return sum(per_block) / len(per_block)


def verbnoun_block_loss(saves: dict, batch: dict, seg2tok, cweight_arr, sw: float, vids, nids):
    """Per-video loss of one verb/noun block
    (blocks_SepVerbNoun.py:400-413, 484-496).  Frame log-probs arrive
    factored as (frame_vlogp, frame_nlogp); the frame loss gathers the
    composed value at the label indices and the smoothing loss streams over
    action chunks, so the dense (T, n_act) tensor never materializes."""
    from ..ops.verbnoun_compose import composed_gather, composed_smooth_loss

    labels = batch["labels"]
    frame_mask = batch["mask"]
    seg_label = batch["seg_label"]
    transcript = batch["transcript"]
    seg_mask = batch["seg_mask"]

    sweight = jnp.where(seg_mask, cweight_arr[transcript], 0.0)
    pair_mask = frame_mask[:, 1:] & frame_mask[:, :-1]
    P = saves["tdu_P"]
    seg_valid = saves["tdu_seg_valid"]

    lv, ln = saves["frame_vlogp"], saves["frame_nlogp"]
    n_act = vids.shape[0]
    logp_at_label = composed_gather(lv, ln, vids, nids, labels.astype(jnp.int32))
    w = cweight_arr[:n_act][labels]
    m = frame_mask.astype(logp_at_label.dtype)
    fl = (-logp_at_label * w * m).sum(axis=1) / jnp.maximum(m.sum(axis=1), 1e-12) / 2.0

    seg_l = frame_loss_tdu(saves["seg_logp"], P, labels, cweight_arr, is_logit=False) / 2.0
    atk = verbnoun_action_token_loss(saves["action_logp"], seg2tok, transcript, seg_mask, cweight_arr) / 2.0
    sl = composed_smooth_loss(lv, ln, vids, nids, pair_mask)

    if saves["kind"] == "I":
        return (fl + seg_l) / 2.0 + atk + sw * sl

    # 'U' verb/noun block adds the segment-granularity cross-attention losses
    S_gt = seg_mask.shape[1]
    onehot_gt = jax.nn.one_hot(seg_label, S_gt, dtype=jnp.float32) * frame_mask[..., None]
    pooled = jnp.einsum("btp,bts->bps", P, onehot_gt)
    lens = P.sum(axis=1)
    Y = pooled / jnp.maximum(lens, 1.0)[..., None]
    Y = Y * seg_mask[:, None, :]
    f2a = f2a_attn_loss(saves["f2a_attn_logit"], seg2tok, seg_mask, seg_valid, Y, sweight)
    a2f = a2f_attn_loss(saves["a2f_attn_logit"], seg2tok, seg_mask, Y, sweight)
    return (fl + seg_l) / 2.0 + atk + f2a + a2f + sw * sl


def verbnoun_fact_loss(saves_list, batch, seg2tok, cweight_arr, sw: float, vids, nids):
    per_block = [
        verbnoun_block_loss(s, batch, seg2tok, cweight_arr, sw, vids, nids) for s in saves_list
    ]
    return sum(per_block) / len(per_block)


# --------------------------------------------------------------------------
# CLIP contrastive loss


def infonce_contrastive_loss(frame_emb, text_emb, labels, frame_mask, temperature: float):
    """Symmetric InfoNCE between frame embeddings and class text embeddings.

    Per-video equivalent of loss.py:280-341 with masked frames:
    v2t = CE over frames; t2v = class-count-weighted CE over classes.
    frame_emb: (B, T, E) normalized; text_emb: (n, E); labels: (B, T).
    Returns (B,).
    """
    n = text_emb.shape[0]
    sim = jnp.einsum("bte,ne->btn", frame_emb, text_emb) / temperature

    m = frame_mask.astype(sim.dtype)
    logp_v2t = jax.nn.log_softmax(sim, axis=-1)
    ce = -jnp.take_along_axis(logp_v2t, labels[..., None].astype(jnp.int32), axis=-1)[..., 0]
    v2t = (ce * m).sum(axis=1) / jnp.maximum(m.sum(axis=1), 1e-12)

    # text -> video: softmax over (valid) frames per class
    neg = jnp.asarray(-1e9, sim.dtype)
    sim_t = jnp.where(frame_mask[:, :, None], sim, neg)
    logp_t2v = jax.nn.log_softmax(sim_t, axis=1)  # (B, T, n)
    targets = jax.nn.one_hot(labels, n, dtype=sim.dtype) * m[..., None]
    counts = jnp.maximum(targets.sum(axis=1), 1.0)  # (B, n)
    per_class = -(logp_t2v * targets).sum(axis=1) / counts
    t2v = per_class.mean(axis=1)

    return (v2t + t2v) / 2.0


def action_token_contrastive_loss(projected_tokens, text_emb, seg2tok, transcript,
                                  seg_mask, temperature: float):
    """Symmetric contrastive loss between matched action tokens and their
    segments' text embeddings (loss.py:344-384; not used by the reference's
    default training path, provided for capability parity).

    projected_tokens: (B, M, E) normalized; text_emb: (n, E);
    seg2tok: (B, S) matching; transcript: (B, S).  Returns (B,).
    """
    matched_tok = jnp.take_along_axis(
        projected_tokens, seg2tok[..., None].astype(jnp.int32), axis=1
    )  # (B, S, E)
    matched_text = text_emb[transcript]  # (B, S, E)

    sim = jnp.einsum("bse,bte->bst", matched_tok, matched_text) / temperature
    neg = jnp.asarray(-1e9, sim.dtype)
    sim = jnp.where(seg_mask[:, None, :], sim, neg)
    sim = jnp.where(seg_mask[:, :, None], sim, neg)

    S = sim.shape[1]
    targets = jnp.arange(S)
    m = seg_mask.astype(sim.dtype)

    logp_a2t = jax.nn.log_softmax(sim, axis=2)
    ce_a2t = -jnp.take_along_axis(logp_a2t, targets[None, :, None].repeat(sim.shape[0], 0), axis=2)[..., 0]
    loss_a2t = (ce_a2t * m).sum(1) / jnp.maximum(m.sum(1), 1e-12)

    logp_t2a = jax.nn.log_softmax(sim, axis=1)
    ce_t2a = -jnp.take_along_axis(logp_t2a, targets[None, None, :].repeat(sim.shape[0], 0), axis=1)[:, 0]
    loss_t2a = (ce_t2a * m).sum(1) / jnp.maximum(m.sum(1), 1e-12)

    return (loss_a2t + loss_t2a) / 2.0
