"""FACT blocks and models over batched, padded videos.

Re-designs the reference's per-video block stack
(/root/reference/fact_clip/models/blocks.py) as flax modules whose forward is
one jitted computation over a padded batch:

* InputBlock (blocks.py:284-320): dilated-TCN frame branch + SCA decoder
  turning learned action queries into action tokens.
* UpdateBlock (blocks.py:322-382): f2a cross-attention -> token self-attention
  -> a2f cross-attention -> frame TCN, with attention probabilities/logits
  exposed for the losses and the two-branch decode.
* UpdateBlockTDU (blocks.py:385-497): the same at *predicted segment*
  granularity.  The reference argmaxes on device, round-trips to NumPy for
  run-length parsing, and builds dynamic-size tensors per block; here segment
  ids are computed on device (cumsum of the prediction-change mask) with a
  static segment cap, so the whole model stays inside one XLA program.

Each block returns ``(frame_feature, action_feature, saves)`` where saves
holds the tensors the reference stashed on ``self`` (clogits, attn maps,
TDU pooling state) for loss computation and decoding.

Per-block config inheritance (Bi -> Bu -> BU None-filling, blocks.py:36-52)
is resolved host-side by ``resolve_block_cfgs`` before module construction.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..configs.utils import update_from
from ..ops import masking, segments
from . import layers as L


@dataclasses.dataclass(frozen=True)
class BlockCfg:
    """Static per-block hyperparameters (one of Bi/Bu/BU after inheritance)."""

    kind: str  # 'i', 'u', 'U', 'I'
    hid_dim: int
    dropout: float
    a: str
    a_nhead: int
    a_ffdim: int
    a_layers: int
    a_dim: int
    f: str
    f_layers: int
    f_ln: bool
    f_dim: int
    f_ngp: int
    s_layers: int = 1
    pallas: bool = False
    pallas_attn: bool = True
    pallas_sa: bool = True
    quantize: str = ""  # "int8": quantized inference MSTCN towers (eval only)
    dtype: str = ""  # "" = float32; "bfloat16" = mixed precision (layers.py policy)


def _block_cfg_from(node, kind: str, pallas: bool = False, dtype: str = "",
                    pallas_attn: bool = True, pallas_sa: bool = True,
                    quantize: str = "") -> BlockCfg:
    return BlockCfg(
        pallas=pallas,
        pallas_attn=pallas_attn,
        pallas_sa=pallas_sa,
        quantize=quantize,
        dtype=dtype,
        kind=kind,
        hid_dim=node.hid_dim,
        dropout=float(node.dropout),
        a=node.a,
        a_nhead=node.a_nhead,
        a_ffdim=node.a_ffdim,
        a_layers=node.a_layers,
        a_dim=node.a_dim,
        f=node.f,
        f_layers=node.f_layers,
        f_ln=bool(node.f_ln),
        f_dim=node.f_dim,
        f_ngp=node.f_ngp,
        s_layers=getattr(node, "s_layers", 1) or 1,
    )


# engine.export sets this to lower for a platform other than the live
# backend (AOT cross-compilation: Mosaic lowering needs no TPU device).
_PALLAS_PLATFORM_OVERRIDE: Optional[str] = None


def _want_pallas(cfg) -> bool:
    """Pallas kernels run on the TPU backend only (Mosaic lowering)."""
    if "TPU" not in cfg or not cfg.TPU.pallas:
        return False
    if _PALLAS_PLATFORM_OVERRIDE is not None:
        return _PALLAS_PLATFORM_OVERRIDE == "tpu"
    import jax

    return jax.default_backend() == "tpu"


def _compute_dtype(cfg) -> str:
    if "TPU" not in cfg:
        return ""
    d = cfg.TPU.compute_dtype
    if d in ("", "float32", None):
        return ""
    assert d == "bfloat16", f"Unsupported TPU.compute_dtype {d!r}"
    return d


def resolve_block_cfgs(cfg) -> Tuple[BlockCfg, ...]:
    """Sequential Bi -> Bu -> BU None-inheritance (blocks.py:36-52)."""
    cfg = cfg.clone()
    pallas = _want_pallas(cfg)
    dtype = _compute_dtype(cfg)
    pattn = bool(getattr(cfg.TPU, "pallas_attn", True)) if "TPU" in cfg else True
    psa = bool(getattr(cfg.TPU, "pallas_sa", True)) if "TPU" in cfg else True
    quant = str(getattr(cfg.TPU, "quantize_infer", "") or "") if "TPU" in cfg else ""
    assert quant in ("", "int8"), f"Unsupported TPU.quantize_infer {quant!r}"
    # the int8 towers are Pallas kernels — no Pallas backend, no quantization
    quant = quant if pallas else ""
    base = cfg.Bi
    out = []
    for t in cfg.FACT.block:
        if t in ("i", "I"):
            out.append(_block_cfg_from(cfg.Bi, t, pallas, dtype, pattn, psa, quant))
        elif t == "u":
            update_from(cfg.Bu, base, inplace=True)
            base = cfg.Bu
            out.append(_block_cfg_from(cfg.Bu, t, pallas, dtype, pattn, psa, quant))
        elif t == "U":
            update_from(cfg.BU, base, inplace=True)
            base = cfg.BU
            out.append(_block_cfg_from(cfg.BU, t, pallas, dtype, pattn, psa, quant))
        else:
            raise ValueError(f"Unknown block type {t!r}")
    return tuple(out)


# ---------------------------------------------------------------------------
# shared block helpers


def process_feature(feature: jnp.ndarray, nclass: int, dtype=None):
    """Split trailing ``nclass`` dims as logits, re-concat their softmax.

    Matches Block.process_feature (blocks.py:195-202): downstream blocks see
    class probabilities as part of the feature vector.

    ``dtype`` (mixed-precision only): the re-concatenated *stream* is cast to
    the block compute dtype, so inter-block traffic and the block-boundary
    cotangent merges run at half width; the returned logits always stay f32
    (losses/decode/metrics consume them).
    """
    clogit = feature[..., -nclass:].astype(jnp.float32)
    cprob = jax.nn.softmax(clogit, axis=-1)
    # dtype=None keeps the pre-rewrite promotion semantics: the old
    # concatenate([feat, cprob_f32]) promoted a bf16 stream to f32, so the
    # action-token sites (which pass no dtype) must still see f32 under
    # mixed precision
    out_dtype = jnp.promote_types(feature.dtype, cprob.dtype) if dtype is None else dtype
    out = feature.astype(out_dtype)
    # overwrite the logit tail in place (dynamic-update-slice) instead of
    # concatenate([feat, cprob]): XLA lowers the concat to two full-stream
    # pads + add, which fuse at B<=8 but MATERIALIZE at B>=16 (~100 MB of
    # f32 pad writes per block boundary at B=32 — the round-2/4 "B>=16
    # f32 residual").  The DUS writes only the nclass-wide tail.
    out = out.at[..., -nclass:].set(cprob.astype(out.dtype))
    return out, clogit


def _jdtype(c: BlockCfg):
    return jnp.bfloat16 if c.dtype == "bfloat16" else None


def make_fbranch(c: BlockCfg, in_dim: Optional[int], name: str):
    f_inmap = in_dim is not None
    in_dim = c.f_dim if in_dim is None else in_dim
    if c.f == "m":
        return L.MSTCN(
            in_dim=in_dim, hid_dim=c.f_dim, out_dim=c.hid_dim, num_layers=c.f_layers,
            dropout=c.dropout, ln=c.f_ln, ngroup=c.f_ngp, in_map=f_inmap,
            use_pallas=c.pallas, quantize=c.quantize, dtype=_jdtype(c), name=name,
        )
    if c.f == "m2":
        return L.MSTCN2(
            in_dim=in_dim, hid_dim=c.f_dim, out_dim=c.hid_dim, num_layers=c.f_layers,
            dropout=c.dropout, ngroup=c.f_ngp, in_map=f_inmap, dtype=_jdtype(c),
            use_pallas=c.pallas, quantize=c.quantize, name=name,
        )
    raise ValueError(f"Unknown frame branch {c.f!r}")


def make_abranch(c: BlockCfg, trans: bool, name: str):
    if c.a == "sa":
        return L.SADecoder(
            in_dim=c.a_dim, hid_dim=c.a_dim, out_dim=c.hid_dim, num_layers=c.a_layers,
            nhead=c.a_nhead, ffdim=c.a_ffdim, dropout=c.dropout, dtype=_jdtype(c),
            use_pallas_sa=c.pallas and c.pallas_sa, name=name,
        )
    if c.a == "sca":
        return L.SCADecoder(
            in_dim=c.a_dim, hid_dim=c.a_dim, out_dim=c.hid_dim, frame_dim=c.hid_dim,
            num_layers=c.a_layers, nhead=c.a_nhead, ffdim=c.a_ffdim, dropout=c.dropout,
            dtype=_jdtype(c), use_pallas=c.pallas and c.pallas_attn,
            use_pallas_sa=c.pallas and c.pallas_sa, quantize=c.quantize,
            # memory pos is the fixed sinusoid table (FACT.__call__): its
            # cotangent is dead, so the fused backward skips the dxk stream
            pos_grad=False, name=name,
        )
    if c.a in ("gru", "gru_om"):
        assert trans, "GRU action branch requires transcript mode"
        return L.ActionUpdateGRU(
            in_dim=c.a_dim, hid_dim=c.a_dim, out_dim=c.hid_dim, n_layers=c.a_layers,
            dropout=c.dropout, out_map=(c.a == "gru_om"), name=name,
        )
    raise ValueError(f"Unknown action branch {c.a!r}")


def make_x2y(c: BlockCfg, outdim: int, name: str):
    return L.X2YMap(
        x_dim=c.hid_dim, y_dim=c.hid_dim, y_outdim=outdim, head_dim=c.hid_dim,
        dropout=c.dropout, kq_pos=True, dtype=_jdtype(c), use_pallas=c.pallas,
        quantize=c.quantize, name=name,
    )


def apply_abranch(branch, c: BlockCfg, action_feature, action_pos, token_mask, deterministic,
                  memory=None, memory_pos=None, memory_mask=None):
    if c.a == "sa":
        return branch(action_feature, pos=action_pos, deterministic=deterministic)
    if c.a == "sca":
        return branch(
            action_feature, memory, pos=memory_pos, query_pos=action_pos,
            memory_mask=memory_mask, deterministic=deterministic,
        )
    return branch(action_feature, token_mask, deterministic=deterministic)


# ---------------------------------------------------------------------------
# blocks


class InputBlock(nn.Module):
    """blocks.py:284-320."""

    c: BlockCfg
    in_dim: int
    nclass: int
    trans: bool

    @nn.compact
    def __call__(self, frame_feature, action_feature, frame_pos, action_pos,
                 frame_mask, token_mask, deterministic: bool):
        c = self.c
        frame_feature = make_fbranch(c, self.in_dim, "frame_branch")(
            frame_feature, frame_mask, deterministic
        )
        frame_feature, frame_clogit = process_feature(frame_feature, self.nclass, _jdtype(c))

        abranch = make_abranch(c, self.trans, "action_branch")
        action_feature = apply_abranch(
            abranch, c, action_feature, action_pos, token_mask, deterministic,
            memory=frame_feature, memory_pos=frame_pos, memory_mask=frame_mask,
        )
        action_feature, action_clogit = process_feature(action_feature, self.nclass + 1)

        saves = {
            "frame_clogit": frame_clogit,
            "action_clogit": action_clogit,
            "action_feature": action_feature[..., : -(self.nclass + 1)],
            "kind": "i",
        }
        return frame_feature, action_feature, saves


class UpdateBlock(nn.Module):
    """blocks.py:322-382."""

    c: BlockCfg
    nclass: int
    trans: bool

    @nn.compact
    def __call__(self, frame_feature, action_feature, frame_pos, action_pos,
                 frame_mask, token_mask, deterministic: bool):
        c = self.c
        # f -> a : query is action, keys/values are frames
        action_feature, f2a_attn, f2a_logit = make_x2y(c, c.a_dim, "f2a_layer")(
            frame_feature, action_feature, x_pos=frame_pos, y_pos=action_pos,
            x_mask=frame_mask, deterministic=deterministic,
        )

        abranch = make_abranch(c, self.trans, "action_branch")
        action_feature = apply_abranch(abranch, c, action_feature, action_pos, token_mask, deterministic)
        action_feature, action_clogit = process_feature(action_feature, self.nclass + 1)

        # a -> f : query is frame, keys/values are action tokens
        frame_feature, a2f_attn, a2f_logit = make_x2y(c, c.f_dim, "a2f_layer")(
            action_feature, frame_feature, x_pos=action_pos, y_pos=frame_pos,
            x_mask=token_mask, deterministic=deterministic,
        )

        frame_feature = make_fbranch(c, None, "frame_branch")(frame_feature, frame_mask, deterministic)
        frame_feature, frame_clogit = process_feature(frame_feature, self.nclass, _jdtype(c))

        saves = {
            "frame_clogit": frame_clogit,
            "action_clogit": action_clogit,
            "action_feature": action_feature[..., : -(self.nclass + 1)],
            # f2a attention: (B, M, T), softmax over frames
            "f2a_attn": f2a_attn,
            "f2a_attn_logit": f2a_logit,
            # a2f attention: (B, T, M), softmax over tokens
            "a2f_attn": a2f_attn,
            "a2f_attn_logit": a2f_logit,
            "kind": "u",
        }
        return frame_feature, action_feature, saves


class UpdateBlockTDU(nn.Module):
    """blocks.py:385-497 with static-shape segment pooling."""

    c: BlockCfg
    nclass: int
    trans: bool
    s_pred_cap: int

    @nn.compact
    def __call__(self, frame_feature, action_feature, frame_pos, action_pos,
                 frame_mask, token_mask, deterministic: bool):
        c = self.c
        S = self.s_pred_cap

        # ---- temporal downsample (blocks.py:417-437), fully on device
        cprob = frame_feature[..., -self.nclass:]
        pred = jnp.argmax(cprob, axis=-1)  # (B, T)
        seg_id, num_segs = jax.vmap(lambda p, m: segments.segment_ids_from_pred(p, m, S))(
            pred, frame_mask
        )
        P = jax.vmap(lambda s, m: segments.assignment_matrix(s, m, S))(seg_id, frame_mask)
        seg_lens = P.sum(axis=1)  # (B, S)
        seg_valid = seg_lens > 0

        seg_feature = jax.vmap(segments.pool_mean)(P, frame_feature)  # (B, S, hid)

        seg_feature = L.BiGRU(c.hid_dim // 2, c.s_layers, dropout=0.0, name="seg_update")(
            seg_feature, seg_valid, deterministic=deterministic
        )
        seg_feature = jax.nn.relu(seg_feature)
        seg_feature = L.TorchDense(c.hid_dim, name="seg_combine")(seg_feature)
        seg_feature, seg_clogit = process_feature(seg_feature, self.nclass, _jdtype(c))

        # segment-center positional encodings (blocks.py:454-455)
        centers = jax.vmap(lambda p: segments.segment_centers(p, S))(P)  # (B, S)
        seg_pos = frame_pos[centers]  # (B, S, P)

        # ---- f -> a at segment granularity
        action_feature, f2a_attn_seg, f2a_logit = make_x2y(c, c.a_dim, "f2a_layer")(
            seg_feature, action_feature, x_pos=seg_pos, y_pos=action_pos,
            x_mask=seg_valid, deterministic=deterministic,
        )

        abranch = make_abranch(c, self.trans, "action_branch")
        action_feature = apply_abranch(abranch, c, action_feature, action_pos, token_mask, deterministic)
        action_feature, action_clogit = process_feature(action_feature, self.nclass + 1)

        # ---- a -> f at segment granularity
        seg_out, a2f_attn_seg, a2f_logit = make_x2y(c, c.f_dim, "a2f_layer")(
            action_feature, seg_feature, x_pos=action_pos, y_pos=seg_pos,
            x_mask=token_mask, deterministic=deterministic,
        )

        # ---- temporal upsample (blocks.py:439-447).  P rows are one-hot, so
        # the seg->frame gather is exactly P @ seg_out — and as a matmul its
        # backward is P^T @ g (another matmul) instead of a scatter-add,
        # which XLA:TPU executes as a ~latency-bound serial loop (profiled
        # ~0.25 ms/step per scatter at flagship scale).
        Pc = P.astype(seg_out.dtype)
        # HIGHEST precision: P rows are one-hot so the dot is a selection —
        # exact at full precision (matching the gather it replaced) and free
        # on the MXU for one-hot operands; default TPU precision would
        # truncate seg_out to bf16 mantissas in f32 mode.
        s2f = jnp.einsum("bts,bsh->bth", Pc, seg_out,
                         precision=jax.lax.Precision.HIGHEST)  # (B, T, f_dim)
        # split dense == TorchDense(concat([s2f, frame])): the (B, T, 2*f_dim)
        # concat (and its backward grad-split) never hits HBM
        frame_feature = jax.nn.relu(
            L.SplitTorchDense(c.f_dim, name="sf_merge")(s2f, frame_feature))

        frame_feature = make_fbranch(c, None, "frame_branch")(frame_feature, frame_mask, deterministic)
        frame_feature, frame_clogit = process_feature(frame_feature, self.nclass, _jdtype(c))

        # upsample attention maps to frame granularity (blocks.py:480-483),
        # same gather-as-matmul trick.  HIGHEST precision: these are f32
        # probabilities consumed by losses/decode, and the TPU default would
        # truncate them to bf16 mantissas in the dot
        # a2f_attn_seg: (B, S, M) -> per-frame (B, T, M)
        a2f_attn = jnp.einsum("bts,bsm->btm", P, a2f_attn_seg,
                              precision=jax.lax.Precision.HIGHEST)
        # f2a_attn_seg: (B, M, S) -> (B, M, T)
        f2a_attn = jnp.einsum("bms,bts->bmt", f2a_attn_seg, P,
                              precision=jax.lax.Precision.HIGHEST)

        saves = {
            "frame_clogit": frame_clogit,
            "seg_clogit": seg_clogit,
            "action_clogit": action_clogit,
            "action_feature": action_feature[..., : -(self.nclass + 1)],
            "f2a_attn": f2a_attn,
            "f2a_attn_logit": f2a_logit,  # (B, M, S_pred)
            "a2f_attn": a2f_attn,
            "a2f_attn_logit": a2f_logit,  # (B, S_pred, M)
            "tdu_P": P,
            "tdu_seg_valid": seg_valid,
            "kind": "U",
        }
        return frame_feature, action_feature, saves


# ---------------------------------------------------------------------------
# models


class FACT(nn.Module):
    """The full dual-branch model (blocks.py:19-135), batched and jittable.

    __call__ returns the per-block saves list; loss and decode are pure
    functions over those saves (models/losses.py, models/decode.py).
    """

    block_cfgs: Tuple[BlockCfg, ...]
    in_dim: int
    n_classes: int
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

        frame_pos = L.positional_encoding_table(T, bi.hid_dim, empty=not self.fpos)

        frame_feature = feats
        if train and self.cmr > 0:
            frame_feature = masking.channel_mask(self.make_rng("aug"), frame_feature, self.cmr)
        if train and self.tm_use:
            frame_feature = masking.time_mask(
                self.make_rng("aug"), frame_feature, lengths, self.tm_t, self.tm_m, self.tm_p
            )

        # action features / positional queries (blocks.py:70-79)
        if not self.trans:
            action_query = self.param(
                "action_query", nn.initializers.normal(1.0), (self.ntoken, bi.a_dim)
            )
            action_pos = jnp.broadcast_to(action_query[None], (B, self.ntoken, bi.a_dim))
            action_feature = jnp.zeros_like(action_pos)
            token_mask = jnp.ones((B, self.ntoken), bool)
        else:
            assert transcript is not None and seg_mask is not None
            M = transcript.shape[1]
            pe = L.positional_encoding_table(M, bi.a_dim)
            embed = nn.Embed(
                self.n_classes, bi.a_dim, embedding_init=nn.initializers.normal(1.0), name="action_embed"
            )
            action_feature = embed(transcript) + pe[None]
            action_pos = jnp.zeros_like(action_feature)
            token_mask = seg_mask

        deterministic = not train
        saves_list = []
        for idx, c in enumerate(self.block_cfgs):
            if c.kind == "i":
                block = InputBlock(c, self.in_dim, self.n_classes, self.trans, name=f"block{idx}")
            elif c.kind == "u":
                block = UpdateBlock(c, self.n_classes, self.trans, name=f"block{idx}")
            elif c.kind == "U":
                block = UpdateBlockTDU(c, self.n_classes, self.trans, self.s_pred_cap, name=f"block{idx}")
            else:
                raise ValueError(c.kind)
            frame_feature, action_feature, saves = block(
                frame_feature, action_feature, frame_pos, action_pos, mask, token_mask, deterministic
            )
            saves_list.append(saves)

        # final frame feature (with class probs in the trailing dims) — the
        # CLIP head strips the probs and projects the rest (blocks.py:657-660)
        return saves_list, frame_feature


def build_fact(cfg, in_dim: int, n_classes: int, s_pred_cap: int) -> FACT:
    """Construct the FACT module from a run config."""
    return FACT(
        block_cfgs=resolve_block_cfgs(cfg),
        in_dim=in_dim,
        n_classes=n_classes,
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
