"""Loss.ref_weight_order: reproduce the reference's segment-weight permutation.

The reference weights cross-attention loss column j — columns ordered by the
matching result (loss.py:209-222: ``attn[0, :, aind]``, pairs sorted by token
index) — with ``sweight[j]`` (transcript order).  When the matching is not
order-preserving and segment weights are non-uniform (egoprocel ships
``bgw: 0.5``), that permutes weights across segments.  Our default applies
each segment its own weight; the flag restores the reference behavior.
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fact_clip_tpu.configs.default import get_cfg_defaults
from fact_clip_tpu.models import losses

REF = "/root/reference"


def _reference_sim_a2f(logits, Y, sweight, seg2tok):
    """Literal numpy transcription of the reference cross_attn_loss(dim=2)
    semantics (loss.py:209-222) for one video."""
    order = np.argsort(seg2tok)  # pairs sorted by token index -> segment ids
    sind = order
    aind = seg2tok[order]
    frame_tgt = Y[:, sind]  # (T, S)
    attn = logits[:, aind]  # (T, S)
    logp = np.asarray(jax.nn.log_softmax(jnp.asarray(attn), axis=1))
    loss = -(logp * frame_tgt * sweight[None, :]).sum()
    return loss / Y.sum()


def test_ref_order_sweight_matches_reference_column_math():
    rng = np.random.default_rng(3)
    T, S, M = 40, 4, 7
    logits = rng.normal(size=(T, M)).astype(np.float32)
    # piecewise segment membership
    seg_of_frame = np.repeat(np.arange(S), T // S)
    Y = np.zeros((T, S), np.float32)
    Y[np.arange(T), seg_of_frame] = 1.0
    sweight = np.array([0.5, 1.0, 2.0, 0.25], np.float32)  # non-uniform
    seg2tok = np.array([5, 1, 6, 0], np.int64)  # deliberately unsorted matching

    ref = _reference_sim_a2f(logits, Y, sweight, seg2tok)

    seg_mask = jnp.ones((1, S), bool)
    sw_perm = losses.ref_order_sweight(
        jnp.asarray(sweight)[None], jnp.asarray(seg2tok)[None], seg_mask
    )
    ours = losses.a2f_attn_loss(
        jnp.asarray(logits)[None], jnp.asarray(seg2tok)[None], seg_mask,
        jnp.asarray(Y)[None], sw_perm,
    )
    np.testing.assert_allclose(float(ours[0]), ref, rtol=1e-5)

    # and without the flag the two deviate (the permutation is real)
    ours_default = losses.a2f_attn_loss(
        jnp.asarray(logits)[None], jnp.asarray(seg2tok)[None], seg_mask,
        jnp.asarray(Y)[None], jnp.asarray(sweight)[None],
    )
    assert abs(float(ours_default[0]) - ref) > 1e-4


def test_ref_order_identity_when_sorted_or_uniform():
    rng = np.random.default_rng(4)
    S = 5
    sweight = jnp.asarray(rng.uniform(0.3, 2.0, size=(1, S)).astype(np.float32))
    seg_mask = jnp.ones((1, S), bool)
    sorted_match = jnp.asarray(np.array([[2, 4, 7, 9, 11]]))
    out = losses.ref_order_sweight(sweight, sorted_match, seg_mask)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(sweight))


def test_action_token_contrastive_loss_parity_vs_reference():
    """Torch-oracle parity for the token<->text contrastive loss (#26) against
    the live reference implementation (loss.py:344-384), like losses #21-#25.

    Reference form: pairs (action_ind, seg_ind), tokens (M, 1, E), unbatched.
    Ours: seg2tok (B, S) per-segment token indices, batched + seg_mask.  The
    pair list is the same data — pair i = (token seg2tok[i], segment i) — and
    CE over the S x S similarity is invariant to a joint row/col permutation,
    which the second check exercises with a shuffled reference pair order.
    """
    import pytest

    if not os.path.isdir(REF):
        pytest.skip("reference not available")
    import torch

    sys.path.insert(0, REF)
    try:
        from fact_clip.models.loss import (
            action_token_contrastive_loss as ref_fn,
        )
    finally:
        sys.path.remove(REF)

    rng = np.random.default_rng(7)
    M, E, n, temperature = 10, 16, 7, 0.07
    S_pad = 5

    # two videos with different true segment counts (second one padded)
    cases = [(5, np.array([4, 1, 8, 0, 6])), (3, np.array([2, 9, 5, 0, 0]))]
    tokens = rng.normal(size=(2, M, E)).astype(np.float32)
    text = rng.normal(size=(n, E)).astype(np.float32)
    transcripts = np.stack([
        np.array([3, 1, 3, 6, 0]),  # duplicate class on purpose
        np.array([2, 5, 4, 0, 0]),
    ]).astype(np.int64)

    refs = []
    for b, (S, seg2tok) in enumerate(cases):
        proj = torch.from_numpy(tokens[b][:, None, :])  # (M, 1, E)
        action_ind = torch.from_numpy(seg2tok[:S])
        seg_ind = torch.arange(S)
        with torch.no_grad():
            r = ref_fn(proj, torch.from_numpy(text),
                       (action_ind, seg_ind),
                       torch.from_numpy(transcripts[b][:S]), temperature)
        refs.append(float(r))
        # joint permutation of the pair list leaves the loss unchanged
        perm = torch.from_numpy(rng.permutation(S))
        with torch.no_grad():
            r_perm = ref_fn(proj, torch.from_numpy(text),
                            (action_ind[perm], seg_ind[perm]),
                            torch.from_numpy(transcripts[b][:S]), temperature)
        np.testing.assert_allclose(float(r_perm), refs[-1], rtol=1e-5)

    seg2tok = np.stack([c[1] for c in cases])
    seg_mask = np.arange(S_pad)[None, :] < np.array([c[0] for c in cases])[:, None]
    ours = losses.action_token_contrastive_loss(
        jnp.asarray(tokens), jnp.asarray(text), jnp.asarray(seg2tok),
        jnp.asarray(transcripts.astype(np.int32)), jnp.asarray(seg_mask),
        temperature,
    )
    np.testing.assert_allclose(np.asarray(ours), np.array(refs, np.float32), rtol=1e-5)


@pytest.mark.slow
def test_egoprocel_bgw_loss_parity_vs_reference():
    """bgw=0.5 (egoprocel) + ref_weight_order=True must match the live
    reference's end-to-end loss; also quantifies the flag-off delta."""
    import pytest

    if not os.path.isdir(REF):
        pytest.skip("reference not available")
    from test_torch_parity import _cfg_pair
    import torch
    import types

    import fact_clip_tpu.configs.node as node

    yacs = types.ModuleType("yacs")
    yacs_config = types.ModuleType("yacs.config")
    yacs_config.CfgNode = node.CfgNode
    yacs.config = yacs_config
    sys.modules.setdefault("yacs", yacs)
    sys.modules.setdefault("yacs.config", yacs_config)

    sys.path.insert(0, REF)
    try:
        from fact_clip.configs.default import get_cfg_defaults as ref_defaults
        from fact_clip.models.blocks import FACT as RefFACT
        from fact_clip.models.loss import MatchCriterion as RefCriterion
    finally:
        sys.path.remove(REF)

    from fact_clip_tpu.models import matching
    from fact_clip_tpu.models.blocks import build_fact, resolve_block_cfgs
    from fact_clip_tpu.utils.segments import class_label_to_segment_data
    from fact_clip_tpu.utils.torch_import import convert_fact_state_dict

    fill = _cfg_pair(16, 32, "m")
    ref_cfg = fill(ref_defaults())
    ref_cfg.Loss.nullw = 0.1
    ref_cfg.Loss.sw = 1.0
    ref_cfg.Loss.pc = 0.2
    ref_cfg.Loss.bgw = 0.5  # egoprocel setting -> non-uniform sweight
    torch.manual_seed(1)
    net = RefFACT(ref_cfg, 11, 5).eval()
    net.mcriterion = RefCriterion(ref_cfg, 5, [0])

    T, C, D = 50, 5, 11
    rng = np.random.default_rng(1)
    feats = rng.normal(size=(T, D)).astype(np.float32)
    labels = np.repeat(rng.integers(0, C, size=5), T // 5 + 1)[:T].astype(np.int64)
    labels[:10] = 0  # ensure background frames exist

    with torch.no_grad():
        ref_loss, _ = net([torch.from_numpy(feats)], [torch.from_numpy(labels)], compute_loss=True)
    ref_loss = float(ref_loss)

    cfg = fill(get_cfg_defaults())
    cfg.Loss.nullw = 0.1
    cfg.Loss.sw = 1.0
    cfg.Loss.pc = 0.2
    cfg.Loss.bgw = 0.5
    bcfgs = resolve_block_cfgs(cfg)
    model = build_fact(cfg, D, C, s_pred_cap=T)
    converted = jax.tree_util.tree_map(
        jnp.asarray,
        convert_fact_state_dict({k: v.numpy() for k, v in net.state_dict().items()}, bcfgs),
    )

    transcript, seg_label = class_label_to_segment_data(labels)
    S = len(transcript)
    batch = dict(
        feats=jnp.array(feats)[None],
        mask=jnp.ones((1, T), bool),
        labels=jnp.array(labels)[None].astype(jnp.int32),
        seg_label=jnp.array(seg_label)[None].astype(jnp.int32),
        transcript=jnp.array(transcript)[None].astype(jnp.int32),
        seg_mask=jnp.ones((1, S), bool),
        lengths=jnp.array([T], jnp.int32),
    )
    saves, _ = model.apply(
        {"params": converted}, batch["feats"], batch["mask"], batch["lengths"], train=False
    )
    cweight = jnp.array(losses.build_class_weights(cfg, C, [0]))
    cprob = jax.nn.softmax(saves[-1]["action_clogit"], -1)
    seg2tok = matching.match(
        cfg.Loss, cprob, saves[-1]["a2f_attn"], batch["transcript"], batch["seg_label"],
        batch["seg_mask"], batch["mask"],
    )
    ours_flag = float(
        losses.fact_loss(saves, batch, seg2tok, cweight, cfg.Loss.sw, ref_weight_order=True)[0]
    )
    ours_default = float(losses.fact_loss(saves, batch, seg2tok, cweight, cfg.Loss.sw)[0])
    np.testing.assert_allclose(ours_flag, ref_loss, rtol=2e-3)
    # record the deviation magnitude of the (intentional) default: measured
    # ~6.5% at random init on this synthetic — material, which is why
    # egoprocel.yaml ships with ref_weight_order: true for parity runs
    delta = abs(ours_default - ref_loss) / abs(ref_loss)
    print(f"egoprocel-style bgw=0.5 default-vs-reference loss delta: {delta:.2e}")
    assert np.isfinite(delta)
