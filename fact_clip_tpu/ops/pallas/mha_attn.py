"""Fused multi-head cross-attention Pallas kernel (SCA frame memory path).

The i-block's SCADecoder (models/layers.py::SCALayer, reference
basic.py:454-523) runs ``a_layers`` (default 6) layers of 8-head M x T
cross-attention: action tokens (M ~ 40-300) query the frame memory
(T ~ 3000-24576).  Under XLA each layer materializes the K/V projections
(B, T, E) and the (B, H, M, T) logits/probs in HBM — ~6 stream-sized
round trips per layer.

This kernel streams the frame memory once: per time tile it computes the
*full-width* K and V projections in VMEM (two (tile, Cx) @ (Cx, E) MXU
matmuls — the dominant FLOPs, at full MXU width), then runs the whole
attention in full-width form: queries arrive as a lane-masked row
expansion (B, H*M8, E) (_expand_rows: head h's rows carry zeros outside
lanes [h*hd, (h+1)*hd)), so ONE (H*M8, E) x (E, tile) matmul yields exact
per-head logits, one shared online-softmax (flash) update covers all rows,
and one (H*M8, tile) x (tile, E) attend accumulates per-head outputs on
the diagonal lanes (extracted outside).  The expansion multiplies
logits/attend MACs by H, but those are a small fraction of the projection
FLOPs and the dense form avoids every sub-128-lane head slice (hd = E/H is
far below the lane width; a per-head slice loop costs relayouts instead).
Measured on v5e at B=8: forward 0.139 ms/layer and backward 0.337 ms/layer
— both within ~10%% of their arithmetic rooflines.

Attention dropout (torch semantics: softmax, then dropout on the
probabilities) runs in-kernel from the on-core PRNG: the mask multiplies
the attend accumulation only, while the softmax normalizer accumulates the
undropped probabilities — exactly ``dropout(softmax(logits)) @ v``.

The backward (``_mha_bwd_kernel``) is a fused single pass over key tiles:
the forward additionally emits its online-softmax stats (m, l), the true
probs are recovered as exp(logits - m)/l per tile, and the softmax row term
D = sum_x p*dp comes in precomputed as rowsum(dout * out) — which equals
sum_x p_dropped * dp_raw, so it stays exact under dropout.  The dropout
keep-mask is regenerated in-kernel with the same per-(batch, tile) seeding;
this ties the forward and backward to the SAME key-tile size whenever
rate > 0 (see ``_pick_tile``).  dq accumulates in VMEM scratch, dwk/dwv
accumulate across the sequential grid into constant-index output blocks.

Masking: invalid key columns get -1e9 before the online max (prefix-
contiguous masks only — data/batching.py guarantees them).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .dilated_conv import _keep_mask

_NEG = -1e9

# The default per-kernel scoped-VMEM limit on this toolchain is 16 MB —
# the large-tile working sets (see _pick_tile / the x2y tile docstring)
# need an explicit raise toward the v5e's 128 MB physical VMEM.
_VMEM_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20)


def _mha_kernel(xlen_ref, seed_ref, x_ref, xpos_ref, q_ref, wk_ref, bk_ref,
                wv_ref, bv_ref, out_ref, m_ref, l_ref, m_scr, l_scr, acc_scr, *,
                num_heads: int, m8: int, rate: float, tile: int, n_t: int):
    b = pl.program_id(0)
    t = pl.program_id(1)
    H, M8 = num_heads, m8
    hd = wk_ref.shape[1] // H

    @pl.when(t == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    xk_in = x_ref[0].astype(jnp.float32) + xpos_ref[0].astype(jnp.float32)
    k = jnp.dot(xk_in.astype(x_ref.dtype), wk_ref[:], preferred_element_type=jnp.float32)
    k = k + bk_ref[:].astype(jnp.float32)  # (tile, E)
    v = jnp.dot(x_ref[0], wv_ref[:], preferred_element_type=jnp.float32)
    v = v + bv_ref[:].astype(jnp.float32)
    k = k.astype(q_ref.dtype)
    v = v.astype(q_ref.dtype)

    # one full-width logits matmul: q rows are lane-masked per head
    # (_expand_rows), so the E-wide contraction is exactly the per-head
    # (M8, hd) x (hd, tile) product — no sub-lane slicing/relayouts (hd=E/H
    # is below the 128-lane granularity; per-head slices measured ~10x
    # slower than this dense form on v5e).  Scale is folded into q.
    logits = jax.lax.dot_general(
        q_ref[0], k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
    )  # (H*M8, tile)
    col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1) + t * tile
    logits = jnp.where(col < xlen_ref[b], logits, _NEG)

    m_prev = m_scr[:, 0]
    m_new = jnp.maximum(m_prev, logits.max(axis=-1))
    alpha = jnp.exp(m_prev - m_new)  # (H*M8,)
    p = jnp.exp(logits - m_new[:, None])  # (H*M8, tile)
    l_scr[:, 0] = l_scr[:, 0] * alpha + p.sum(axis=-1)
    if rate > 0.0:
        pltpu.prng_seed(seed_ref[0] + b * n_t + t)
        p = p * _keep_mask(rate, p.shape)
    p = p.astype(v.dtype)
    # full-width attend: row h*M8+i carries the true head-h output in lanes
    # [h*hd, (h+1)*hd) and cross-head garbage elsewhere; _extract_diag
    # outside takes the diagonal lanes
    attend = jnp.dot(p, v, preferred_element_type=jnp.float32)  # (H*M8, E)
    acc_scr[...] = acc_scr[...] * alpha[:, None] + attend
    m_scr[:, 0] = m_new

    @pl.when(t == n_t - 1)
    def _finish():
        out_ref[0, :, :] = (
            acc_scr[...] / jnp.maximum(l_scr[:, 0], 1e-30)[:, None]
        ).astype(out_ref.dtype)
        # online-softmax stats, saved for the fused backward: true
        # probs are exp(logits - m) / l
        m_ref[0, :, :] = m_scr[...]
        l_ref[0, :, :] = l_scr[...]


def _mask_kernel(seed_ref, o_ref, *, rate: float, n_t: int):
    b = pl.program_id(0)
    t = pl.program_id(1)
    pltpu.prng_seed(seed_ref[0] + b * n_t + t)
    o_ref[0, :, :] = _keep_mask(rate, o_ref.shape[1:])


# Per-cell VMEM working-set budget for tile sizing.  12 MB is the measured
# sweet spot (the round-4 large-tile experiment showed bigger working sets
# lose DMA/compute overlap); compile-time headroom for shapes near the
# bound comes from the explicit vmem_limit raise below, not from this cap.
_VMEM_BUDGET = 12 * 2**20

# Default key tile.  NEGATIVE RESULT (round 4, measured on v5e): raising
# this to 1024/2048 so flagship shapes run as one or two key tiles made
# the train step and f32 eval SLOWER (20.4 -> 20.5/21.6 ms train,
# 5.4 -> 5.7/6.2 ms eval) — the multi-tile grid overlaps block DMA with
# compute, and single-tile cells serialize a 6-12 MB load against the
# whole cell's compute.  512 stays the default.
_DEFAULT_TILE = 512


def _pick_tile(tile: int, X: int, HM8: int, E: int, bwd: bool = False) -> int:
    """Cap the key tile so per-cell VMEM stays under ``_VMEM_BUDGET``.

    bwd=True uses the backward kernel's footprint (x/xpos/k/v/dk/dv/dx/dxk
    tiles + four (HM8, tile) prob-class buffers) instead of the forward's.
    When in-kernel dropout is active the two passes MUST use the same tile
    (the mask is a pure function of (seed, grid cell, (HM8, tile))), so the
    forward is sized with bwd=True in that case; inference (rate=0) keeps
    the larger forward-only tile."""
    streams = (4 * HM8 + 10 * E) if bwd else (2 * HM8 + 6 * E)
    while tile > 128 and streams * tile * 4 > _VMEM_BUDGET:
        tile //= 2
    return min(tile, max(-(-X // 128) * 128, 128))


@functools.partial(jax.jit, static_argnames=("shape", "rate", "tile", "interpret"))
def mha_dropout_mask(seed, shape, rate: float, tile: int = _DEFAULT_TILE, interpret: bool = False):
    """Regenerate the exact scaled keep-mask the fused forward used.

    ``shape`` is (B, H*M, X).  Seeding and the per-cell ``prng_random_bits``
    call mirror ``_mha_kernel`` bit-for-bit.
    """
    B, HM, X = shape
    n_t = pl.cdiv(X, tile)
    X_pad = n_t * tile
    kernel = functools.partial(_mask_kernel, rate=rate, n_t=n_t)
    out = pl.pallas_call(
        kernel,
        compiler_params=_VMEM_PARAMS,
        grid=(B, n_t),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((1, HM, tile), lambda b, t: (b, 0, t)),
        out_shape=jax.ShapeDtypeStruct((B, HM, X_pad), jnp.float32),
        interpret=interpret,
    )(seed)
    return out[:, :, :X]


def _round8(n: int) -> int:
    return -(-n // 8) * 8


def _arrange_rows(q, num_heads: int):
    """(B, M, E) -> (B, H*M8, hd): heads split to rows (M8 = M rounded up to
    the sublane width; pad rows are zero)."""
    B, M, E = q.shape
    H = num_heads
    hd = E // H
    M8 = _round8(M)
    if M8 != M:
        q = jnp.pad(q, ((0, 0), (0, M8 - M), (0, 0)))
    return q.reshape(B, M8, H, hd).transpose(0, 2, 1, 3).reshape(B, H * M8, hd)


def _expand_rows(a, num_heads: int):
    """(B, M, E) -> (B, H*M8, E): row i of head h lands at h*M8+i with every
    lane outside [h*hd, (h+1)*hd) zeroed.  The zero cross-head lanes make
    the full-E-wide contractions in the kernels exactly per-head, avoiding
    sub-128-lane head slices (hd = E/H is far below the lane width)."""
    B, M, E = a.shape
    H = num_heads
    hd = E // H
    M8 = _round8(M)
    if M8 != M:
        a = jnp.pad(a, ((0, 0), (0, M8 - M), (0, 0)))
    mask = (jnp.arange(E)[None, :] // hd) == jnp.arange(H)[:, None]  # (H, E)
    out = a[:, None, :, :] * mask[None, :, None, :].astype(a.dtype)
    return out.reshape(B, H * M8, E)


def _arrange_queries(q, num_heads: int):
    """Lane-masked row expansion with the attention scale folded in."""
    hd = q.shape[2] // num_heads
    return _expand_rows(q * (1.0 / math.sqrt(hd)), num_heads)


def _extract_diag(a_hm, num_heads: int, M: int):
    """(B, H*M8, E) -> (B, M, E): lanes of head h from the head-h rows (the
    complementary lanes hold cross-head garbage from full-width products)."""
    B, HM8, E = a_hm.shape
    H = num_heads
    M8 = HM8 // H
    hd = E // H
    a5 = a_hm.reshape(B, H, M8, H, hd)
    o = jnp.einsum("bhmgd,hg->bmhd", a5, jnp.eye(H, dtype=a_hm.dtype))
    return o.reshape(B, M8, E)[:, :M]


def _mha_fwd_impl(q, x_in, x_pos_k, wk, bk, wv, bv, x_len, seed, *,
                  num_heads: int, rate: float, tile: int, interpret: bool,
                  with_stats: bool = False):
    B, X, Cx = x_in.shape
    M, E = q.shape[1], wk.shape[1]
    M8 = _round8(M)
    HM8 = num_heads * M8
    hd = E // num_heads
    tile = _pick_tile(tile, X, HM8, E, bwd=rate > 0.0)
    n_t = pl.cdiv(X, tile)
    X_pad = n_t * tile
    if X_pad != X:
        x_in = jnp.pad(x_in, ((0, 0), (0, X_pad - X), (0, 0)))
        x_pos_k = jnp.pad(x_pos_k, ((0, 0), (0, X_pad - X), (0, 0)))
    pos_b = 0 if x_pos_k.shape[0] == 1 else None  # unbatched pos: broadcast
    qh = _arrange_queries(q, num_heads)
    kernel = functools.partial(_mha_kernel, num_heads=num_heads, m8=M8,
                               rate=rate, tile=tile, n_t=n_t)
    out = pl.pallas_call(
        kernel,
        compiler_params=_VMEM_PARAMS,
        grid=(B, n_t),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, tile, Cx), lambda b, t: (b, t, 0)),
            pl.BlockSpec((1, tile, Cx), lambda b, t, pb=pos_b: (pb if pb is not None else b, t, 0)),
            pl.BlockSpec((1, HM8, E), lambda b, t: (b, 0, 0)),
            pl.BlockSpec((Cx, E), lambda b, t: (0, 0)),
            pl.BlockSpec((E,), lambda b, t: (0,)),
            pl.BlockSpec((Cx, E), lambda b, t: (0, 0)),
            pl.BlockSpec((E,), lambda b, t: (0,)),
        ],
        out_specs=[
            pl.BlockSpec((1, HM8, E), lambda b, t: (b, 0, 0)),
            pl.BlockSpec((1, HM8, 1), lambda b, t: (b, 0, 0)),
            pl.BlockSpec((1, HM8, 1), lambda b, t: (b, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, HM8, E), jnp.float32),
            jax.ShapeDtypeStruct((B, HM8, 1), jnp.float32),
            jax.ShapeDtypeStruct((B, HM8, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((HM8, 1), jnp.float32),
            pltpu.VMEM((HM8, 1), jnp.float32),
            pltpu.VMEM((HM8, E), jnp.float32),
        ],
        interpret=interpret,
    )(x_len, seed, x_in, x_pos_k, qh, wk, bk, wv, bv)
    out, m_row, l_row = out
    if with_stats:
        return _extract_diag(out, num_heads, M), out, m_row, l_row
    return _extract_diag(out, num_heads, M)


def _mha_reference(q, x_in, x_pos_k, wk, bk, wv, bv, x_len, keep, num_heads: int):
    """XLA forward with identical math (used by the backward pass).

    keep: scaled dropout keep-mask (B, H, M, X) or None.
    """
    B, X, _ = x_in.shape
    M, E = q.shape[1], wk.shape[1]
    H = num_heads
    hd = E // H
    k = jnp.einsum("bxc,ce->bxe", x_in + x_pos_k, wk) + bk
    v = jnp.einsum("bxc,ce->bxe", x_in, wv) + bv
    kh = k.reshape(B, X, H, hd)
    vh = v.reshape(B, X, H, hd)
    qh = q.reshape(B, M, H, hd) * (1.0 / math.sqrt(hd))
    logits = jnp.einsum("bmhd,bxhd->bhmx", qh, kh)
    colmask = jnp.arange(X)[None, None, None, :] < x_len[:, None, None, None]
    logits = jnp.where(colmask, logits, _NEG)
    p = jax.nn.softmax(logits, axis=-1)
    if keep is not None:
        p = p * keep
    out = jnp.einsum("bhmx,bxhd->bmhd", p, vh)
    return out.reshape(B, M, E)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11, 12))
def _mha_vjp(q, x_in, x_pos_k, wk, bk, wv, bv, xlen_seed, num_heads, rate, tile, interpret,
             pos_grad):
    x_len, seed = xlen_seed
    return _mha_fwd_impl(q, x_in, x_pos_k, wk, bk, wv, bv, x_len, seed,
                         num_heads=num_heads, rate=rate, tile=tile, interpret=interpret)


def _mha_fwd(q, x_in, x_pos_k, wk, bk, wv, bv, xlen_seed, num_heads, rate, tile, interpret,
             pos_grad):
    x_len, seed = xlen_seed
    out, out_hm, m_row, l_row = _mha_fwd_impl(
        q, x_in, x_pos_k, wk, bk, wv, bv, x_len, seed,
        num_heads=num_heads, rate=rate, tile=tile, interpret=interpret,
        with_stats=True,
    )
    return out, (q, x_in, x_pos_k, wk, bk, wv, bv, xlen_seed, out_hm, m_row, l_row)


def _mha_bwd_kernel(xlen_ref, seed_ref, x_ref, xpos_ref, q_ref, g_ref,
                    m_ref, l_ref, d_ref, wk_ref, bk_ref, wv_ref, bv_ref,
                    *refs, num_heads: int, m8: int, rate: float,
                    tile: int, n_t: int, pos_grad: bool):
    """Single-pass flash backward over key tiles.

    True probs are recovered from the saved online-softmax stats
    (p = exp(logits - m) / l); the softmax-backward row term
    D = sum_x p*dp comes in precomputed as rowsum(dout * out), which equals
    sum_x p_dropped * dp_raw, so it is exact under in-kernel dropout too.

    With ``pos_grad=False`` the separate dxk stream (needed only to derive
    the key-positional cotangent) is neither computed nor written — in FACT
    the key positional table is a constant, and the (B, X, Cx) dxk write +
    batch-sum read-back is pure HBM traffic (~50 MB/layer/step at flagship
    scale).
    """
    if pos_grad:
        (dx_ref, dxk_ref, dq_ref, dwk_ref, dbk_ref, dwv_ref, dbv_ref,
         dq_scr) = refs
    else:
        dx_ref, dq_ref, dwk_ref, dbk_ref, dwv_ref, dbv_ref, dq_scr = refs
        dxk_ref = None
    b = pl.program_id(0)
    t = pl.program_id(1)
    H, M8 = num_heads, m8
    E = wk_ref.shape[1]
    hd = E // H

    @pl.when(t == 0)
    def _init():
        dq_scr[...] = jnp.zeros_like(dq_scr)

    # recompute k/v exactly like the forward
    xk_in = x_ref[0].astype(jnp.float32) + xpos_ref[0].astype(jnp.float32)
    xk_c = xk_in.astype(x_ref.dtype)
    k = jnp.dot(xk_c, wk_ref[:], preferred_element_type=jnp.float32)
    k = (k + bk_ref[:].astype(jnp.float32)).astype(q_ref.dtype)
    v = jnp.dot(x_ref[0], wv_ref[:], preferred_element_type=jnp.float32)
    v = (v + bv_ref[:].astype(jnp.float32)).astype(q_ref.dtype)

    if rate > 0.0:
        pltpu.prng_seed(seed_ref[0] + b * n_t + t)
        keep = _keep_mask(rate, (H * M8, tile))
    else:
        keep = None

    col = jax.lax.broadcasted_iota(jnp.int32, (H * M8, tile), 1) + t * tile
    colmask = col < xlen_ref[b]
    l_inv = 1.0 / jnp.maximum(l_ref[0, :, 0], 1e-30)

    # full-width form throughout (see _expand_rows): q and g rows are
    # lane-masked per head, so every E-wide contraction is exactly the
    # per-head product with no sub-lane slicing.
    q_exp = q_ref[0]  # (H*M8, E), scale folded, lanes masked
    g_exp = g_ref[0].astype(v.dtype)  # (H*M8, E), lanes masked

    logits = jax.lax.dot_general(q_exp, k, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    logits = jnp.where(colmask, logits, _NEG)
    p = jnp.exp(logits - m_ref[0, :, :]) * l_inv[:, None]  # (H*M8, tile)
    dpt = jax.lax.dot_general(g_exp, v, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    if keep is not None:
        dp = dpt * keep
        p_used = p * keep
    else:
        dp = dpt
        p_used = p
    dl = p * (dp - d_ref[0, :, :])  # (H*M8, tile)
    dl_c = dl.astype(k.dtype)
    # dq rows carry the true grad in their head's lanes (diag-extracted
    # outside); dk/dv are exact because the zero q/g lanes kill cross terms
    dq_scr[...] += jnp.dot(dl_c, k, preferred_element_type=jnp.float32)
    dk_f = jax.lax.dot_general(dl_c, q_exp, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)  # (tile, E)
    dv_f = jax.lax.dot_general(p_used.astype(g_exp.dtype), g_exp,
                               (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    dk = dk_f.astype(x_ref.dtype)
    dv = dv_f.astype(x_ref.dtype)

    dims = (((1,), (1,)), ((), ()))
    dxk = jax.lax.dot_general(dk, wk_ref[:], dims, preferred_element_type=jnp.float32)
    dxv = jax.lax.dot_general(dv, wv_ref[:], dims, preferred_element_type=jnp.float32)
    if dxk_ref is not None:
        dxk_ref[0, :, :] = dxk.astype(dxk_ref.dtype)
    dx_ref[0, :, :] = (dxk + dxv).astype(dx_ref.dtype)

    rdims = (((0,), (0,)), ((), ()))
    dwk_part = jax.lax.dot_general(xk_c, dk, rdims, preferred_element_type=jnp.float32)
    dwv_part = jax.lax.dot_general(x_ref[0], dv, rdims, preferred_element_type=jnp.float32)

    @pl.when((b == 0) & (t == 0))
    def _zero():
        dwk_ref[:, :] = jnp.zeros_like(dwk_ref)
        dbk_ref[:, :] = jnp.zeros_like(dbk_ref)
        dwv_ref[:, :] = jnp.zeros_like(dwv_ref)
        dbv_ref[:, :] = jnp.zeros_like(dbv_ref)

    dwk_ref[:, :] += dwk_part
    dbk_ref[:, :] += dk_f.sum(axis=0)[None, :]
    dwv_ref[:, :] += dwv_part
    dbv_ref[:, :] += dv_f.sum(axis=0)[None, :]

    @pl.when(t == n_t - 1)
    def _finish():
        dq_ref[0, :, :] = dq_scr[...]


def _mha_bwd(num_heads, rate, tile, interpret, pos_grad, res, g):
    q, x_in, x_pos_k, wk, bk, wv, bv, (x_len, seed), out_hm, m_row, l_row = res
    B, X, Cx = x_in.shape
    M, E = q.shape[1], wk.shape[1]
    M8 = _round8(M)
    HM8 = num_heads * M8
    hd = E // num_heads
    ktile = _pick_tile(tile, X, HM8, E, bwd=True)  # == fwd tile when rate>0
    n_t = pl.cdiv(X, ktile)
    X_pad = n_t * ktile
    x_p, pos_p = x_in, x_pos_k
    if X_pad != X:
        x_p = jnp.pad(x_in, ((0, 0), (0, X_pad - X), (0, 0)))
        pos_p = jnp.pad(x_pos_k, ((0, 0), (0, X_pad - X), (0, 0)))
    pos_b = 0 if x_pos_k.shape[0] == 1 else None
    qh = _arrange_queries(q, num_heads)
    gh = _expand_rows(g.astype(jnp.float32), num_heads)
    d_row = (gh * out_hm).sum(axis=-1, keepdims=True)  # = sum_x p~ dp~

    kernel = functools.partial(_mha_bwd_kernel, num_heads=num_heads, m8=M8,
                               rate=rate, tile=ktile, n_t=n_t, pos_grad=pos_grad)
    row = lambda: pl.BlockSpec((1, HM8, 1), lambda b, t: (b, 0, 0))  # noqa: E731
    wspec = lambda *s: pl.BlockSpec(s, lambda b, t: (0,) * len(s))  # noqa: E731
    dxk_specs = (
        [pl.BlockSpec((1, ktile, Cx), lambda b, t: (b, t, 0))] if pos_grad else [])
    dxk_shapes = (
        [jax.ShapeDtypeStruct((B, X_pad, Cx), x_in.dtype)] if pos_grad else [])
    outs = pl.pallas_call(
        kernel,
        compiler_params=_VMEM_PARAMS,
        grid=(B, n_t),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, ktile, Cx), lambda b, t: (b, t, 0)),
            pl.BlockSpec((1, ktile, Cx), lambda b, t, pb=pos_b: (pb if pb is not None else b, t, 0)),
            pl.BlockSpec((1, HM8, E), lambda b, t: (b, 0, 0)),
            pl.BlockSpec((1, HM8, E), lambda b, t: (b, 0, 0)),
            row(), row(), row(),
            wspec(Cx, E), wspec(E), wspec(Cx, E), wspec(E),
        ],
        out_specs=[
            pl.BlockSpec((1, ktile, Cx), lambda b, t: (b, t, 0)),
            *dxk_specs,
            pl.BlockSpec((1, HM8, E), lambda b, t: (b, 0, 0)),
            wspec(Cx, E), wspec(1, E), wspec(Cx, E), wspec(1, E),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, X_pad, Cx), x_in.dtype),
            *dxk_shapes,
            jax.ShapeDtypeStruct((B, HM8, E), jnp.float32),
            jax.ShapeDtypeStruct((Cx, E), jnp.float32),
            jax.ShapeDtypeStruct((1, E), jnp.float32),
            jax.ShapeDtypeStruct((Cx, E), jnp.float32),
            jax.ShapeDtypeStruct((1, E), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((HM8, E), jnp.float32)],
        interpret=interpret,
    )(x_len, seed, x_p, pos_p, qh, gh, m_row, l_row, d_row, wk, bk, wv, bv)
    if pos_grad:
        dx_p, dxk_p, dqh, dwk, dbk, dwv, dbv = outs
    else:
        dx_p, dqh, dwk, dbk, dwv, dbv = outs

    scale = 1.0 / math.sqrt(hd)
    dq = (_extract_diag(dqh, num_heads, M) * scale).astype(q.dtype)
    dx = dx_p[:, :X].astype(x_in.dtype)
    if not pos_grad:
        # key positional input declared constant by the caller: its cotangent
        # is a structural zero (DCE'd when pos really is a constant)
        dpos = jnp.zeros(x_pos_k.shape, x_pos_k.dtype)
    elif x_pos_k.shape[0] == 1:
        dxk = dxk_p[:, :X]
        dpos = dxk.sum(axis=0, keepdims=True).astype(x_pos_k.dtype)
    else:
        dpos = dxk_p[:, :X].astype(x_pos_k.dtype)
    daux = (np.zeros(x_len.shape, jax.dtypes.float0), np.zeros(seed.shape, jax.dtypes.float0))
    return (dq, dx, dpos, dwk.astype(wk.dtype), dbk[0].astype(bk.dtype),
            dwv.astype(wv.dtype), dbv[0].astype(bv.dtype), daux)


_mha_vjp.defvjp(_mha_fwd, _mha_bwd)


def mha_cross_attention(q, x_in, x_pos_k, wk, bk, wv, bv, x_len, *,
                        num_heads: int, rate: float = 0.0, seed=None,
                        tile: int = _DEFAULT_TILE, interpret: bool = False,
                        pos_grad: bool = True):
    """Fused multi-head cross-attention over a long key/value stream.

    q: (B, M, E) projected queries (bias and any query positional encoding
    already applied); x_in: (B, X, Cx) raw memory; x_pos_k: (B or 1, X, Cx)
    positional term added to the *key* projection input only (zeros when the
    keys carry no positional encoding — values always see raw memory);
    wk/bk, wv/bv: (Cx, E)/(E,) projection weights; x_len: (B,) int32 valid
    key prefix; rate/seed: in-kernel attention dropout (rate=0 disables;
    seed is a (1,) int32 array, required when rate > 0).

    pos_grad=False declares ``x_pos_k`` a constant: the backward returns a
    zero cotangent for it and skips the dedicated dxk output stream (a
    (B, X, Cx) HBM write + batch-sum read-back per layer).  FACT's frame
    positional table is a fixed sinusoid (models/layers.py:112), so the
    model path always sets False; leave True for learned key positions.

    Returns (B, M, E) float32: concatenated per-head attention outputs
    (the caller applies the output projection).
    """
    if x_pos_k.ndim == 2:
        x_pos_k = x_pos_k[None]
    if seed is None:
        seed = jnp.zeros((1,), jnp.int32)
    return _mha_vjp(q, x_in, x_pos_k, wk, bk, wv, bv, (x_len, seed),
                    num_heads, float(rate), tile, interpret, pos_grad)
