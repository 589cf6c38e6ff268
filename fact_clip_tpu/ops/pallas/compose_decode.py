"""Fused Pallas kernels for the epic verb/noun composed-action decode.

The epic model factors its ~3,800-action space into 98 verb x 301 noun
heads; every TDU block and the final decode need an argmax over the
COMPOSED action scores (blocks_SepVerbNoun.py:107-140, 148-170).  The XLA
dense path (ops/verbnoun_compose.py) materializes two (T, n_act) f32
gathers plus an iota/reduce argmax per site — profiled at ~3 ms per site
at epic scale (T=24,576), ~15 ms of the 21.9 ms step across the 3 TDU
blocks and the decode (scripts/profile_epic_step.py, round 5).  These
kernels keep everything in VMEM:

* ``factored_argmax``: EXACT composed argmax via the (verb, noun)
  factorization max_a lv[v(a)]+ln[n(a)] == max_v (lv[v] + max_{n in N(v)}
  ln[n]).  The round-2 negative result (factored 3x slower under XLA) was
  an XLA fusion failure — the (T, n1, n2) broadcast-max materialized; here
  the noun tile stays resident in VMEM across the 98-verb loop, so the
  whole reduction is one pass over (tile, n2) per verb with zero HBM
  transients.  Bit-exact f32 (same max/add ops as the XLA factored form;
  ties break verb-then-noun like composed_argmax_factored).

* ``blend_argmax``: the two-branch decode blend (token-vote action probs
  blended with exp(composed logp), then argmax) as one kernel.  The
  (T, n_act) composition runs on the MXU as one-hot matmuls
  (lv @ onehot(vids) + ln @ onehot(nids)) with in-kernel three-term bf16 splits of the
  f32 log-probs (~f32-ulp compose fidelity; hardware-verified 1.000 argmax agreement), and
  the blend + argmax never leave VMEM.  Also emits the all-null fallback
  argmax over the composed logp for free.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pad_to(x, mult):
    return -(-x // mult) * mult


def _tile_for(T: int, tile: int):
    tile = min(tile, max(_pad_to(T, 8), 8))
    n_tiles = pl.cdiv(T, tile)
    return tile, n_tiles


# --------------------------------------------------------------- factored


def _factored_kernel(lv_ref, ln_ref, mvn_ref, ov_ref, ob_ref, *, n1: int,
                     n1p: int, tile: int):
    lv = lv_ref[0].astype(jnp.float32)  # (tile, n1p)
    ln = ln_ref[0].astype(jnp.float32)  # (tile, n2p)
    lane = jax.lax.broadcasted_iota(jnp.int32, (tile, n1p), 1)

    def body(v, carry):
        best, bestv = carry
        row = mvn_ref[pl.ds(v, 1), :].astype(jnp.float32)  # (1, n2p)
        bv = jnp.max(ln + row, axis=-1, keepdims=True)  # (tile, 1)
        # lv[:, v] without a dynamic lane slice (Mosaic: masked reduce)
        colv = jnp.sum(jnp.where(lane == v, lv, 0.0), axis=-1, keepdims=True)
        sv = colv + bv
        upd = sv > best  # strict: ties keep the FIRST verb (argmax semantics)
        return jnp.where(upd, sv, best), jnp.where(upd, v, bestv)

    best0 = jnp.full((tile, 1), -jnp.inf, jnp.float32)
    v0 = jnp.zeros((tile, 1), jnp.int32)
    best, bestv = jax.lax.fori_loop(0, n1, body, (best0, v0))
    ov_ref[0] = bestv
    ob_ref[0] = best


def factored_argmax(lv, ln, mask_vn, a_table, *, tile: int = 512,
                    interpret: bool = False):
    """Exact composed argmax on TPU: returns (B, T) int32 action ids.

    lv: (B, T, n1) f32 log-probs; ln: (B, T, n2); mask_vn/a_table from
    verbnoun_compose.build_factored_tables.  The kernel finds the best verb
    v* (and its score) per frame; the best noun given v* and the action id
    are two cheap XLA gathers over (B, T) afterwards.
    """
    B, T, n1 = lv.shape
    n2 = ln.shape[-1]
    n1p, n2p = _pad_to(n1, 128), _pad_to(n2, 128)
    tile, n_tiles = _tile_for(T, tile)
    T_pad = n_tiles * tile

    lv_p = jnp.pad(lv.astype(jnp.float32), ((0, 0), (0, T_pad - T), (0, n1p - n1)))
    ln_p = jnp.pad(ln.astype(jnp.float32), ((0, 0), (0, T_pad - T), (0, n2p - n2)))
    # padded noun columns can never win: mask them with -inf in the table
    mvn = jnp.pad(mask_vn, ((0, 0), (0, n2p - n2)), constant_values=-jnp.inf)

    kernel = functools.partial(_factored_kernel, n1=n1, n1p=n1p, tile=tile)
    out_shape = [jax.ShapeDtypeStruct((B, T_pad, 1), jnp.int32),
                 jax.ShapeDtypeStruct((B, T_pad, 1), jnp.float32)]
    ospec = pl.BlockSpec((1, tile, 1), lambda b, t: (b, t, 0))
    v_star, _best = pl.pallas_call(
        kernel,
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec((1, tile, n1p), lambda b, t: (b, t, 0)),
            pl.BlockSpec((1, tile, n2p), lambda b, t: (b, t, 0)),
            pl.BlockSpec((n1, n2p), lambda b, t: (0, 0)),
        ],
        out_specs=[ospec, ospec],
        out_shape=out_shape,
        interpret=interpret,
    )(lv_p, ln_p, mvn)
    v_star = v_star[:, :T, 0]
    # best noun for the winning verb, then the action id (tiny XLA gathers)
    n_star = jnp.argmax(ln + mask_vn[v_star], axis=-1).astype(jnp.int32)
    return a_table[v_star, n_star]


# ---------------------------------------------------------- MXU argmax


def _prep_compose(lv, ln, vids, nids, T_pad):
    """Shared host prep: padded f32 log-probs (the 3-term split happens
    IN-KERNEL — see _split3), one-hot composition tables (exact in bf16),
    and the padded-action -inf mask."""
    B, T, n1 = lv.shape
    n2 = ln.shape[-1]
    n_act = vids.shape[0]
    n1p, n2p = _pad_to(n1, 128), _pad_to(n2, 128)
    n_act_p = _pad_to(n_act, 128)
    lv_p = jnp.pad(lv.astype(jnp.float32), ((0, 0), (0, T_pad - T), (0, n1p - n1)))
    ln_p = jnp.pad(ln.astype(jnp.float32), ((0, 0), (0, T_pad - T), (0, n2p - n2)))
    vone = jax.nn.one_hot(vids, n1p, dtype=jnp.float32).T.astype(jnp.bfloat16)
    none_ = jax.nn.one_hot(nids, n2p, dtype=jnp.float32).T.astype(jnp.bfloat16)
    vone = jnp.pad(vone, ((0, 0), (0, n_act_p - n_act)))
    none_ = jnp.pad(none_, ((0, 0), (0, n_act_p - n_act)))
    amask = jnp.full((n_act_p,), -jnp.inf, jnp.float32).at[:n_act].set(0.0)
    return lv_p, ln_p, vone, none_, amask, n1p, n2p, n_act_p


def _mxu_argmax_kernel(lv_ref, ln_ref, vone_ref, none_ref, amask_ref, o_ref, *,
                       tile: int, n_act_p: int):
    L = _compose_in_kernel(lv_ref[0], ln_ref[0], vone_ref, none_ref)
    L = L + amask_ref[0][None, :]
    iota = jax.lax.broadcasted_iota(jnp.int32, (tile, n_act_p), 1)
    mx = jnp.max(L, axis=-1, keepdims=True)
    o_ref[0] = jnp.min(jnp.where(L == mx, iota, n_act_p), axis=-1, keepdims=True)


def mxu_argmax(lv, ln, vids, nids, *, tile: int = 256, interpret: bool = False):
    """Composed argmax via one-hot MXU matmuls: the (T, n_act) composition
    lives only in VMEM.  In-kernel three-term bf16 splits keep the compose
    at ~f32-ulp fidelity (hardware-verified 1.000 agreement with the exact
    dense argmax; see _split3 for why the split cannot live in host HLO).
    Returns (B, T) int32."""
    B, T, n1 = lv.shape
    tile, n_tiles = _tile_for(T, tile)
    T_pad = n_tiles * tile
    lv_p, ln_p, vone, none_, amask, n1p, n2p, n_act_p = _prep_compose(
        lv, ln, vids, nids, T_pad)

    kernel = functools.partial(_mxu_argmax_kernel, tile=tile, n_act_p=n_act_p)
    out = pl.pallas_call(
        kernel,
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec((1, tile, n1p), lambda b, t: (b, t, 0)),
            pl.BlockSpec((1, tile, n2p), lambda b, t: (b, t, 0)),
            pl.BlockSpec((n1p, n_act_p), lambda b, t: (0, 0)),
            pl.BlockSpec((n2p, n_act_p), lambda b, t: (0, 0)),
            pl.BlockSpec((1, n_act_p), lambda b, t: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, tile, 1), lambda b, t: (b, t, 0)),
        out_shape=jax.ShapeDtypeStruct((B, T_pad, 1), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(lv_p, ln_p, vone, none_, amask[None])
    return out[:, :T, 0]


# ----------------------------------------------------------------- blend


def _split3(x):
    """Three-term bf16 split: x ~= a + b + c to ~2^-24 (f32 ulp) relative.

    MUST run INSIDE the Pallas kernel: under jit, XLA's convert-chain
    simplification collapses the correction terms computed in host-side
    HLO (measured: eager split-compose argmax agreed 1.000 with the exact
    dense argmax, the jitted version of the SAME code only 0.961, with the
    2- and 3-term variants bit-identical — the classic sign that the lo
    terms were optimized away).  Mosaic lowers converts verbatim, so the
    in-kernel split keeps its f32-ulp fidelity.  A single bf16 term
    (~2^-8) measured 0.031 max abs compose error — far too coarse for
    near-uniform 3806-action log-probs whose top-2 margins sit at ~1e-3."""
    a = x.astype(jnp.bfloat16)
    r = x - a.astype(jnp.float32)
    b = r.astype(jnp.bfloat16)
    c = (r - b.astype(jnp.float32)).astype(jnp.bfloat16)
    return a, b, c


def _compose_in_kernel(lv, ln, vone_ref, none_ref):
    """(tile, n_act_p) composed scores from f32 factored tiles: three
    split-term MXU matmuls per side against the shared one-hot tables,
    f32-accumulated — exact to ~1 f32 ulp (hardware-verified)."""
    f32 = jnp.float32
    L = None
    for side, table_ref in ((lv, vone_ref), (ln, none_ref)):
        for term in _split3(side):
            d = jnp.dot(term, table_ref[:], preferred_element_type=f32)
            L = d if L is None else L + d
    return L


def _blend_kernel(lv_ref, ln_ref, ai_ref, vone_ref,
                  none_ref, q_ref, amask_ref, op_ref, of_ref, *,
                  tile: int, n_act_p: int, m_p: int):
    f32 = jnp.float32
    L = _compose_in_kernel(lv_ref[0], ln_ref[0], vone_ref, none_ref)
    # amask carries log(weight) at valid actions and -inf at padding, so
    # exp(L + amask) IS the weighted frame branch and the fallback argmax
    # ordering over valid columns is unchanged (constant shift)
    L = L + amask_ref[0][None, :]

    ai = ai_ref[0]  # (tile, 1) voting-token index per frame
    lane = jax.lax.broadcasted_iota(jnp.int32, (tile, m_p), 1)
    onehot = (lane == ai).astype(jnp.bfloat16)
    q = q_ref[0]
    A = None
    for term in _split3(q):
        d = jnp.dot(onehot, term, preferred_element_type=f32)
        A = d if A is None else A + d

    S = A + jnp.exp(L)
    iota = jax.lax.broadcasted_iota(jnp.int32, (tile, n_act_p), 1)

    def first_argmax(x):
        mx = jnp.max(x, axis=-1, keepdims=True)
        return jnp.min(jnp.where(x == mx, iota, n_act_p), axis=-1, keepdims=True)

    op_ref[0] = first_argmax(S)
    of_ref[0] = first_argmax(L)


def blend_argmax(lv, ln, vids, nids, qtk_prob, act_idx, weight: float, *,
                 tile: int = 256, interpret: bool = False):
    """Two-branch decode blend + fallback argmax, fused.

    lv: (B, T, n1) f32; ln: (B, T, n2); qtk_prob: (B, M, n_act) renormalized
    token action probs; act_idx: (B, T) voting token per frame.  Returns
    (pred_blend, pred_fallback), both (B, T) int32 — pred_fallback is the
    plain composed argmax used when every token predicts null.
    """
    B, T, n1 = lv.shape
    M = qtk_prob.shape[1]
    n_act = vids.shape[0]
    m_p = _pad_to(M, 128)
    tile, n_tiles = _tile_for(T, tile)
    T_pad = n_tiles * tile
    lv_p, ln_p, vone, none_, amask0, n1p, n2p, n_act_p = _prep_compose(
        lv, ln, vids, nids, T_pad)

    # (1-weight) folded into the token branch, log(weight) into the mask
    q = (1.0 - weight) * qtk_prob.astype(jnp.float32)
    q = jnp.pad(q, ((0, 0), (0, m_p - M), (0, n_act_p - n_act)))
    # weight=0 (pure token decode): exp(L + log(tiny)) flushes the frame
    # branch to ~0 while keeping the fallback argmax ordering over L intact
    amask = jnp.where(amask0 == 0.0, float(np.log(max(weight, 1e-38))), amask0)
    ai = jnp.pad(act_idx.astype(jnp.int32), ((0, 0), (0, T_pad - T)))[..., None]

    kernel = functools.partial(_blend_kernel, tile=tile, n_act_p=n_act_p, m_p=m_p)
    ospec = pl.BlockSpec((1, tile, 1), lambda b, t: (b, t, 0))
    pred, fb = pl.pallas_call(
        kernel,
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec((1, tile, n1p), lambda b, t: (b, t, 0)),
            pl.BlockSpec((1, tile, n2p), lambda b, t: (b, t, 0)),
            pl.BlockSpec((1, tile, 1), lambda b, t: (b, t, 0)),
            pl.BlockSpec((n1p, n_act_p), lambda b, t: (0, 0)),
            pl.BlockSpec((n2p, n_act_p), lambda b, t: (0, 0)),
            pl.BlockSpec((1, m_p, n_act_p), lambda b, t: (b, 0, 0)),
            pl.BlockSpec((1, n_act_p), lambda b, t: (0, 0)),
        ],
        out_specs=[ospec, ospec],
        out_shape=[jax.ShapeDtypeStruct((B, T_pad, 1), jnp.int32),
                   jax.ShapeDtypeStruct((B, T_pad, 1), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(lv_p, ln_p, ai, vone, none_, q, amask[None])
    return pred[:, :T, 0], fb[:, :T, 0]
