"""Epic-Kitchens verb/noun factored-head FACT.

Equivalent to /root/reference/fact_clip/models/blocks_SepVerbNoun.py: frame
and token heads emit separate verb (n1) and noun (n2) logits; action
probabilities are the outer composition ``v[..., VIDS] * n[..., NIDS]`` via
global action->verb / action->noun id tables; block string uses 'I'
(InputBlockTDU — input block that immediately compresses frames to predicted
segments for attention) and 'U' (UpdateBlockTDU).  All at predicted-segment
granularity with the static-cap TDU design of models/blocks.py.
"""

from __future__ import annotations

import os
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops import masking, segments
from ..ops.verbnoun_compose import composed_argmax  # noqa: F401
from . import layers as L
from .blocks import BlockCfg, make_abranch, make_fbranch, make_x2y, resolve_block_cfgs


def load_vids_nids(processed_dir: str) -> Tuple[np.ndarray, np.ndarray]:
    """Action->verb-id / action->noun-id tables from the epic mapping files
    (blocks_SepVerbNoun.py:148-170): mapping.txt lines are ``<id> verb,noun``.
    """
    from ..data.io import load_action_mapping

    v2i, _ = load_action_mapping(os.path.join(processed_dir, "verb_mapping.txt"))
    n2i, _ = load_action_mapping(os.path.join(processed_dir, "noun_mapping.txt"))
    _, i2a = load_action_mapping(os.path.join(processed_dir, "mapping.txt"))

    vids, nids = [], []
    for i in range(len(i2a)):
        v, n = i2a[i].split(",")
        vids.append(v2i[v])
        nids.append(n2i[n])
    return np.asarray(vids, np.int32), np.asarray(nids, np.int32)


def split_softmax(clogit: jnp.ndarray, class_sep: int) -> jnp.ndarray:
    """logit2prob with class_sep (basic.py:56-64): independent softmaxes over
    the verb and noun logit groups, concatenated."""
    v = jax.nn.softmax(clogit[..., :class_sep], axis=-1)
    n = jax.nn.softmax(clogit[..., class_sep:], axis=-1)
    return jnp.concatenate([v, n], axis=-1)


def combine_verb_noun(clogit, vids, nids, n1: int, action: bool = False, apply_log: bool = False):
    """Compose verb/noun logits into action (log-)probabilities
    (blocks_SepVerbNoun.py:189-224).  With ``action`` the heads carry an
    extra null slot each; the composed null is their product."""
    if action:
        vlogit = clogit[..., : n1 + 1]
        nlogit = clogit[..., n1 + 1 :]
    else:
        vlogit = clogit[..., :n1]
        nlogit = clogit[..., n1:]

    if apply_log:
        v = jax.nn.log_softmax(vlogit, axis=-1)
        n = jax.nn.log_softmax(nlogit, axis=-1)
        a = v[..., vids] + n[..., nids]
        if action:
            null = (v[..., -1] + n[..., -1])[..., None]
            a = jnp.concatenate([a, null], axis=-1)
    else:
        v = jax.nn.softmax(vlogit, axis=-1)
        n = jax.nn.softmax(nlogit, axis=-1)
        a = v[..., vids] * n[..., nids]
        if action:
            null = (v[..., -1] * n[..., -1])[..., None]
            a = jnp.concatenate([a, null], axis=-1)
    return a


def process_feature_vn(feature, n1: int, n2: int):
    """Verb/noun process_feature (blocks_SepVerbNoun.py:227-232)."""
    clogit = feature[..., -(n1 + n2):]
    feat = feature[..., : -(n1 + n2)]
    cprob = split_softmax(clogit, n1)
    return jnp.concatenate([feat, cprob], axis=-1), clogit


class _TDUCore(nn.Module):
    """Shared temporal-downsample machinery for the verb/noun blocks
    (blocks_SepVerbNoun.py:285-318)."""

    c: BlockCfg
    n1: int
    n2: int
    s_pred_cap: int
    gru_layers: int

    @nn.compact
    def __call__(self, frame_feature, frame_mask, vids, nids, deterministic, tables=None,
                 pallas: bool = False):
        S = self.s_pred_cap
        cprob = frame_feature[..., -(self.n1 + self.n2):]
        vprob, nprob = cprob[..., : self.n1], cprob[..., self.n1 :]
        # argmax of the composed action probs == argmax of summed log-probs;
        # factored over (verb, noun) instead of materializing (T, n_act)
        pred = composed_argmax(
            jnp.log(jnp.maximum(vprob, 1e-30)), jnp.log(jnp.maximum(nprob, 1e-30)), vids, nids,
            tables=tables, pallas=pallas,
        )

        seg_id, _ = jax.vmap(lambda p, m: segments.segment_ids_from_pred(p, m, S))(pred, frame_mask)
        P = jax.vmap(lambda s, m: segments.assignment_matrix(s, m, S))(seg_id, frame_mask)
        seg_valid = P.sum(axis=1) > 0

        seg_feature = jax.vmap(segments.pool_mean)(P, frame_feature)
        seg_feature = L.BiGRU(self.c.hid_dim // 2, self.gru_layers, dropout=0.0, name="seg_update")(
            seg_feature, seg_valid, deterministic=deterministic
        )
        seg_feature = jax.nn.relu(seg_feature)
        seg_feature = L.TorchDense(self.c.hid_dim, name="seg_combine")(seg_feature)
        seg_feature, seg_clogit = process_feature_vn(seg_feature, self.n1, self.n2)

        centers = jax.vmap(lambda p: segments.segment_centers(p, S))(P)
        return dict(
            P=P, seg_id=seg_id, seg_valid=seg_valid, centers=centers,
            seg_feature=seg_feature, seg_clogit=seg_clogit,
        )


class InputBlockTDUVN(nn.Module):
    """blocks_SepVerbNoun.py:358-398."""

    c: BlockCfg
    in_dim: int
    n1: int
    n2: int
    trans: bool
    s_pred_cap: int

    @nn.compact
    def __call__(self, frame_feature, action_feature, frame_pos, action_pos,
                 frame_mask, token_mask, vids, nids, deterministic, tables=None,
                 pallas: bool = False):
        c = self.c
        frame_feature = make_fbranch(c, self.in_dim, "frame_branch")(frame_feature, frame_mask, deterministic)
        frame_feature, frame_clogit = process_feature_vn(frame_feature, self.n1, self.n2)

        # the reference's 'I' block uses a fixed 2-layer segment GRU (:370)
        tdu = _TDUCore(c, self.n1, self.n2, self.s_pred_cap, gru_layers=2, name="tdu")(
            frame_feature, frame_mask, vids, nids, deterministic, tables=tables, pallas=pallas
        )
        seg_pos = frame_pos[tdu["centers"]]

        abranch = make_abranch(c, self.trans, "action_branch")
        action_feature = abranch(
            action_feature, tdu["seg_feature"], pos=seg_pos, query_pos=action_pos,
            memory_mask=tdu["seg_valid"], deterministic=deterministic,
        )
        action_feature, action_clogit = process_feature_vn(action_feature, self.n1 + 1, self.n2 + 1)

        saves = {
            # frame log-probs stay factored (lv, ln); consumers compose them
            # lazily (ops/verbnoun_compose.py) — the dense (T, n_act) tensor
            # is never materialized
            "frame_vlogp": jax.nn.log_softmax(frame_clogit[..., : self.n1], axis=-1),
            "frame_nlogp": jax.nn.log_softmax(frame_clogit[..., self.n1 :], axis=-1),
            "seg_logp": combine_verb_noun(tdu["seg_clogit"], vids, nids, self.n1, apply_log=True),
            "action_logp": combine_verb_noun(action_clogit, vids, nids, self.n1, action=True, apply_log=True),
            "tdu_P": tdu["P"],
            "tdu_seg_valid": tdu["seg_valid"],
            "kind": "I",
        }
        return frame_feature, action_feature, saves


class UpdateBlockTDUVN(nn.Module):
    """blocks_SepVerbNoun.py:415-496."""

    c: BlockCfg
    n1: int
    n2: int
    trans: bool
    s_pred_cap: int

    @nn.compact
    def __call__(self, frame_feature, action_feature, frame_pos, action_pos,
                 frame_mask, token_mask, vids, nids, deterministic, tables=None,
                 pallas: bool = False):
        c = self.c
        tdu = _TDUCore(c, self.n1, self.n2, self.s_pred_cap, gru_layers=c.s_layers, name="tdu")(
            frame_feature, frame_mask, vids, nids, deterministic, tables=tables, pallas=pallas
        )
        seg_feature = tdu["seg_feature"]
        seg_valid = tdu["seg_valid"]
        seg_pos = frame_pos[tdu["centers"]]

        action_feature, f2a_attn_seg, f2a_logit = make_x2y(c, c.a_dim, "f2a_layer")(
            seg_feature, action_feature, x_pos=seg_pos, y_pos=action_pos,
            x_mask=seg_valid, deterministic=deterministic,
        )

        abranch = make_abranch(c, self.trans, "action_branch")
        action_feature = abranch(action_feature, pos=action_pos, deterministic=deterministic)
        action_feature, action_clogit = process_feature_vn(action_feature, self.n1 + 1, self.n2 + 1)

        seg_out, a2f_attn_seg, a2f_logit = make_x2y(c, c.f_dim, "a2f_layer")(
            action_feature, seg_feature, x_pos=action_pos, y_pos=seg_pos,
            x_mask=token_mask, deterministic=deterministic,
        )

        # seg->frame upsamples as assignment-matrix matmuls, exactly like
        # UpdateBlockTDU (blocks.py): the gathers' backward is a
        # latency-bound scatter-add on TPU; the one-hot P rows make the
        # matmul equal to the gather on valid frames (zeros on padding)
        P = tdu["P"]
        s2f = jnp.einsum("bts,bsh->bth", P.astype(seg_out.dtype), seg_out,
                         precision=jax.lax.Precision.HIGHEST)
        frame_feature = jax.nn.relu(
            L.SplitTorchDense(c.f_dim, name="sf_merge")(s2f, frame_feature))

        frame_feature = make_fbranch(c, None, "frame_branch")(frame_feature, frame_mask, deterministic)
        frame_feature, frame_clogit = process_feature_vn(frame_feature, self.n1, self.n2)

        a2f_attn = jnp.einsum("bts,bsm->btm", P, a2f_attn_seg,
                              precision=jax.lax.Precision.HIGHEST)
        f2a_attn = jnp.einsum("bms,bts->bmt", f2a_attn_seg, P,
                              precision=jax.lax.Precision.HIGHEST)

        saves = {
            "frame_vlogp": jax.nn.log_softmax(frame_clogit[..., : self.n1], axis=-1),
            "frame_nlogp": jax.nn.log_softmax(frame_clogit[..., self.n1 :], axis=-1),
            "seg_logp": combine_verb_noun(tdu["seg_clogit"], vids, nids, self.n1, apply_log=True),
            "action_logp": combine_verb_noun(action_clogit, vids, nids, self.n1, action=True, apply_log=True),
            "f2a_attn": f2a_attn,
            "f2a_attn_logit": f2a_logit,
            "a2f_attn": a2f_attn,
            "a2f_attn_logit": a2f_logit,
            "tdu_P": tdu["P"],
            "tdu_seg_valid": seg_valid,
            "kind": "U",
        }
        return frame_feature, action_feature, saves


class VerbNounFACT(nn.Module):
    """blocks_SepVerbNoun.py:14-142, batched and jittable."""

    block_cfgs: Tuple[BlockCfg, ...]
    in_dim: int
    n_classes1: int
    n_classes2: int
    vids: tuple  # action -> verb id, static
    nids: tuple  # action -> noun id, static
    ntoken: int
    trans: bool
    fpos: bool
    cmr: float
    s_pred_cap: int
    tm_use: bool = False
    tm_t: int = 30
    tm_m: int = 5
    tm_p: float = 0.05

    @nn.compact
    def __call__(self, feats, mask, lengths, transcript=None, seg_mask=None, train: bool = False):
        B, T, _ = feats.shape
        bi = self.block_cfgs[0]
        vids = jnp.asarray(self.vids, jnp.int32)
        nids = jnp.asarray(self.nids, jnp.int32)
        # On the Pallas path, every TDU's composed argmax runs the fused
        # VMEM-resident MXU kernel (ops/pallas/compose_decode.py) — ~3x the
        # dense gather at epic scale.  The XLA factored form stays a
        # negative result (the (T,n1,n2) broadcast-max materializes);
        # without Pallas the dense composition remains the default.
        pallas_compose = bool(bi.pallas)
        tables = None

        frame_pos = L.positional_encoding_table(T, bi.hid_dim, empty=not self.fpos)

        frame_feature = feats
        if train and self.cmr > 0:
            frame_feature = masking.channel_mask(self.make_rng("aug"), frame_feature, self.cmr)
        if train and self.tm_use:
            frame_feature = masking.time_mask(
                self.make_rng("aug"), frame_feature, lengths, self.tm_t, self.tm_m, self.tm_p
            )

        if not self.trans:
            action_query = self.param("action_query", nn.initializers.normal(1.0), (self.ntoken, bi.a_dim))
            action_pos = jnp.broadcast_to(action_query[None], (B, self.ntoken, bi.a_dim))
            action_feature = jnp.zeros_like(action_pos)
            token_mask = jnp.ones((B, self.ntoken), bool)
        else:
            assert transcript is not None and seg_mask is not None
            M = transcript.shape[1]
            pe = L.positional_encoding_table(M, bi.a_dim)
            vt = vids[transcript]
            nt = nids[transcript]
            vemb = nn.Embed(self.n_classes1, bi.a_dim // 2, embedding_init=nn.initializers.normal(1.0),
                            name="verb_embed")(vt)
            nemb = nn.Embed(self.n_classes2, bi.a_dim // 2, embedding_init=nn.initializers.normal(1.0),
                            name="noun_embed")(nt)
            action_feature = jnp.concatenate([vemb, nemb], axis=-1) + pe[None]
            action_pos = jnp.zeros_like(action_feature)
            token_mask = seg_mask

        deterministic = not train
        saves_list = []
        for idx, c in enumerate(self.block_cfgs):
            if c.kind == "I":
                block = InputBlockTDUVN(c, self.in_dim, self.n_classes1, self.n_classes2,
                                        self.trans, self.s_pred_cap, name=f"block{idx}")
            elif c.kind == "U":
                block = UpdateBlockTDUVN(c, self.n_classes1, self.n_classes2,
                                         self.trans, self.s_pred_cap, name=f"block{idx}")
            else:
                raise ValueError(f"verb/noun model only supports 'I'/'U' blocks, got {c.kind!r}")
            frame_feature, action_feature, saves = block(
                frame_feature, action_feature, frame_pos, action_pos, mask, token_mask,
                vids, nids, deterministic, tables=tables, pallas=pallas_compose,
            )
            saves_list.append(saves)

        return saves_list, frame_feature


def build_verbnoun_fact(cfg, in_dim: int, vids: np.ndarray, nids: np.ndarray,
                        s_pred_cap: int, n_classes1: int = 98, n_classes2: int = 301) -> VerbNounFACT:
    return VerbNounFACT(
        block_cfgs=resolve_block_cfgs(cfg),
        in_dim=in_dim,
        n_classes1=n_classes1,
        n_classes2=n_classes2,
        vids=tuple(int(v) for v in vids),
        nids=tuple(int(n) for n in nids),
        ntoken=cfg.FACT.ntoken,
        trans=cfg.FACT.trans,
        fpos=cfg.FACT.fpos,
        cmr=cfg.FACT.cmr,
        s_pred_cap=s_pred_cap,
        tm_use=cfg.TM.use,
        tm_t=cfg.TM.t,
        tm_m=cfg.TM.m,
        tm_p=cfg.TM.p,
    )
