"""Fused X2Y single-head cross-attention Pallas kernels.

X2Y_map (models/layers.py::X2YMap, reference basic.py:335-389) is the
frame<->action bottleneck: three projections (k/v from X, q from Y), a
logits matmul, a masked softmax, and the attend matmul, with probs and
logits *materialized* for the losses and the two-branch decode.

Under XLA the three projections each round-trip their (N, d) result through
HBM.  These kernels fuse projection + logits + (softmax) + attend into one
pass over the large axis, so the projected tensors never leave VMEM:

* ``x2y_small_x`` — X (keys) small (action tokens / TDU segments), Y large
  (frames): one grid pass over Y tiles; computes q-projection, logits,
  softmax and attend per tile.  Emits (attn, probs, logits).
* ``x2y_flash`` — X large (frames), Y small (tokens): online-softmax
  accumulation over X tiles (flash-attention style) with the k/v projections
  computed per tile in VMEM; logits are streamed out for the losses, probs
  are recovered by one fused XLA softmax over the materialized logits.

Masking follows X2YMap exactly: invalid X positions get -1e9 (prefix masks
only — batching.py guarantees contiguous validity), which both zeroes their
probability mass and keeps the stored logits finite for downstream
log-softmax.  Backward passes are hand-derived XLA (recompute projections,
reuse the materialized probs).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e9


# ---------------------------------------------------------------------------
# case A: small X (keys fit VMEM), tiled over Y


def _small_x_kernel(xlen_ref, y_ref, ypos_ref, xk_ref, xv_ref, wq_ref, bq_ref,
                    attn_ref, probs_ref, logits_ref, *, scale: float, tile: int):
    b = pl.program_id(0)
    yq_in = y_ref[0].astype(jnp.float32) + ypos_ref[0].astype(jnp.float32)
    yq = jnp.dot(yq_in.astype(y_ref.dtype), wq_ref[:], preferred_element_type=jnp.float32)
    yq = yq + bq_ref[:].astype(jnp.float32)

    logits = jax.lax.dot_general(
        yq.astype(xk_ref.dtype), xk_ref[0],
        (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
    ) * scale  # (tile, X)
    X = logits.shape[-1]
    col = jax.lax.broadcasted_iota(jnp.int32, (1, X), 1)
    logits = jnp.where(col < xlen_ref[b], logits, _NEG)

    mx = logits.max(axis=-1, keepdims=True)
    e = jnp.exp(logits - mx)
    probs = e / e.sum(axis=-1, keepdims=True)

    attn = jnp.dot(probs.astype(xv_ref.dtype), xv_ref[0], preferred_element_type=jnp.float32)

    attn_ref[0, :, :] = attn.astype(attn_ref.dtype)
    probs_ref[0, :, :] = probs.astype(probs_ref.dtype)
    logits_ref[0, :, :] = logits.astype(logits_ref.dtype)


def _x2y_small_x_fwd_impl(y_in, y_pos, xk, xv, wq, bq, x_len, *, tile: int, interpret: bool):
    """y_in: (B, Y, Cy); y_pos: (B, Y, Cy) or zeros; xk/xv: (B, X, d)."""
    B, Y, Cy = y_in.shape
    X, d = xk.shape[1], xk.shape[2]
    tile = min(tile, max(-(-Y // 8) * 8, 8))
    n_t = pl.cdiv(Y, tile)
    pos_b = 0 if y_pos.shape[0] == 1 else None  # unbatched pos: broadcast
    kernel = functools.partial(_small_x_kernel, scale=1.0 / math.sqrt(d), tile=tile)
    attn, probs, logits = pl.pallas_call(
        kernel,
        grid=(B, n_t),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, tile, Cy), lambda b, t: (b, t, 0)),
            pl.BlockSpec((1, tile, Cy), lambda b, t, pb=pos_b: (pb if pb is not None else b, t, 0)),
            pl.BlockSpec((1, X, d), lambda b, t: (b, 0, 0)),
            pl.BlockSpec((1, X, d), lambda b, t: (b, 0, 0)),
            pl.BlockSpec((Cy, d), lambda b, t: (0, 0)),
            pl.BlockSpec((d,), lambda b, t: (0,)),
        ],
        out_specs=[
            pl.BlockSpec((1, tile, d), lambda b, t: (b, t, 0)),
            pl.BlockSpec((1, tile, X), lambda b, t: (b, t, 0)),
            pl.BlockSpec((1, tile, X), lambda b, t: (b, t, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Y, d), jnp.float32),
            jax.ShapeDtypeStruct((B, Y, X), jnp.float32),
            jax.ShapeDtypeStruct((B, Y, X), jnp.float32),
        ],
        interpret=interpret,
    )(x_len, y_in, y_pos, xk, xv, wq, bq)
    return attn, probs, logits


# ---------------------------------------------------------------------------
# case B: large X streamed with online softmax, small Y


def _flash_kernel(xlen_ref, x_ref, xpos_ref, yq_ref, wk_ref, bk_ref, wv_ref, bv_ref,
                  logits_ref, attn_ref, m_scr, l_scr, acc_scr, *,
                  scale: float, tile: int, n_t: int):
    b = pl.program_id(0)
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    xk_in = x_ref[0].astype(jnp.float32) + xpos_ref[0].astype(jnp.float32)
    xk = jnp.dot(xk_in.astype(x_ref.dtype), wk_ref[:], preferred_element_type=jnp.float32)
    xk = xk + bk_ref[:].astype(jnp.float32)  # (tile, d)
    xv = jnp.dot(x_ref[0], wv_ref[:], preferred_element_type=jnp.float32)
    xv = xv + bv_ref[:].astype(jnp.float32)

    logits = jax.lax.dot_general(
        yq_ref[0], xk.astype(yq_ref.dtype),
        (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
    ) * scale  # (M, tile)
    col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1) + t * tile
    logits = jnp.where(col < xlen_ref[b], logits, _NEG)
    logits_ref[0, :, :] = logits.astype(logits_ref.dtype)

    m_prev = m_scr[:, 0]
    m_new = jnp.maximum(m_prev, logits.max(axis=-1))
    alpha = jnp.exp(m_prev - m_new)  # (M,)
    p = jnp.exp(logits - m_new[:, None])  # (M, tile)
    l_scr[:, 0] = l_scr[:, 0] * alpha + p.sum(axis=-1)
    acc_scr[...] = acc_scr[...] * alpha[:, None] + jnp.dot(
        p.astype(xv.dtype), xv, preferred_element_type=jnp.float32
    )
    m_scr[:, 0] = m_new

    @pl.when(t == n_t - 1)
    def _finish():
        attn_ref[0, :, :] = (
            acc_scr[...] / jnp.maximum(l_scr[:, 0], 1e-30)[:, None]
        ).astype(attn_ref.dtype)


def _x2y_flash_fwd_impl(x, x_pos, yq, wk, bk, wv, bv, x_len, *, tile: int, interpret: bool):
    """x: (B, X, Cx); yq: (B, M, d) already projected (+bias)."""
    B, X, Cx = x.shape
    M, d = yq.shape[1], yq.shape[2]
    tile = min(tile, max(-(-X // 128) * 128, 128))
    n_t = pl.cdiv(X, tile)
    X_pad = n_t * tile
    if X_pad != X:
        x = jnp.pad(x, ((0, 0), (0, X_pad - X), (0, 0)))
        x_pos = jnp.pad(x_pos, ((0, 0), (0, X_pad - X), (0, 0)))
    pos_b = 0 if x_pos.shape[0] == 1 else None  # unbatched pos: broadcast
    kernel = functools.partial(_flash_kernel, scale=1.0 / math.sqrt(d), tile=tile, n_t=n_t)
    logits, attn = pl.pallas_call(
        kernel,
        grid=(B, n_t),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, tile, Cx), lambda b, t: (b, t, 0)),
            pl.BlockSpec((1, tile, Cx), lambda b, t, pb=pos_b: (pb if pb is not None else b, t, 0)),
            pl.BlockSpec((1, M, d), lambda b, t: (b, 0, 0)),
            pl.BlockSpec((Cx, d), lambda b, t: (0, 0)),
            pl.BlockSpec((d,), lambda b, t: (0,)),
            pl.BlockSpec((Cx, d), lambda b, t: (0, 0)),
            pl.BlockSpec((d,), lambda b, t: (0,)),
        ],
        out_specs=[
            pl.BlockSpec((1, M, tile), lambda b, t: (b, 0, t)),
            pl.BlockSpec((1, M, d), lambda b, t: (b, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, M, X_pad), jnp.float32),
            jax.ShapeDtypeStruct((B, M, d), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((M, 1), jnp.float32),
            pltpu.VMEM((M, 1), jnp.float32),
            pltpu.VMEM((M, d), jnp.float32),
        ],
        interpret=interpret,
    )(x_len, x, x_pos, yq, wk, bk, wv, bv)
    logits = logits[:, :, :X]
    probs = jax.nn.softmax(logits, axis=-1)  # one fused XLA pass over (B,M,X)
    return attn, probs, logits


# ---------------------------------------------------------------------------
# differentiable wrappers (hand-derived XLA backward; reuses stored probs)


def _softmax_bwd(probs, dprobs):
    """Row softmax backward: dlogits from dprobs given probs."""
    return probs * (dprobs - (dprobs * probs).sum(axis=-1, keepdims=True))


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10))
def _small_x_vjp(y_in, y_pos, x_in, x_pos_k, wk, bk, wv, bv, wq_bq_xlen, tile, interpret):
    wq, bq, x_len = wq_bq_xlen
    xk = x_in + x_pos_k
    xk = jnp.einsum("bxc,cd->bxd", xk, wk) + bk
    xv = jnp.einsum("bxc,cd->bxd", x_in, wv) + bv
    return _x2y_small_x_fwd_impl(y_in, y_pos, xk, xv, wq, bq, x_len,
                                 tile=tile, interpret=interpret)


def _small_x_fwd(y_in, y_pos, x_in, x_pos_k, wk, bk, wv, bv, wq_bq_xlen, tile, interpret):
    out = _small_x_vjp(y_in, y_pos, x_in, x_pos_k, wk, bk, wv, bv, wq_bq_xlen, tile, interpret)
    attn, probs, logits = out
    return out, (y_in, y_pos, x_in, x_pos_k, wk, bk, wv, bv, wq_bq_xlen, probs)


def _small_x_bwd(tile, interpret, res, g):
    """Hand-derived backward: recompute projections, reuse stored probs.
    d(y_in) and d(y_pos) are both d_yq_in; d(x_pos_k) is d_xk_in alone."""
    y_in, y_pos, x_in, x_pos_k, wk, bk, wv, bv, (wq, bq, x_len), probs = res
    g_attn, g_probs, g_logits = g
    d = wq.shape[1]
    scale = 1.0 / math.sqrt(d)

    xk_in = x_in + x_pos_k
    xk = jnp.einsum("bxc,cd->bxd", xk_in, wk) + bk
    xv = jnp.einsum("bxc,cd->bxd", x_in, wv) + bv
    yq_in = y_in + y_pos
    yq = jnp.einsum("byc,cd->byd", yq_in, wq) + bq

    d_xv = jnp.einsum("byx,byd->bxd", probs, g_attn)
    d_probs = g_probs + jnp.einsum("byd,bxd->byx", g_attn, xv)
    d_logits = _softmax_bwd(probs, d_probs) + g_logits
    X = x_in.shape[1]
    colmask = jnp.arange(X)[None, None, :] < x_len[:, None, None]
    d_logits = jnp.where(colmask, d_logits, 0.0) * scale

    d_yq = jnp.einsum("byx,bxd->byd", d_logits, xk)
    d_xk = jnp.einsum("byx,byd->bxd", d_logits, yq)

    d_wq = jnp.einsum("byc,byd->cd", yq_in, d_yq)
    d_bq = d_yq.sum(axis=(0, 1))
    d_yq_in = jnp.einsum("byd,cd->byc", d_yq, wq)

    d_wk = jnp.einsum("bxc,bxd->cd", xk_in, d_xk)
    d_bk = d_xk.sum(axis=(0, 1))
    d_xk_in = jnp.einsum("bxd,cd->bxc", d_xk, wk)

    d_wv = jnp.einsum("bxc,bxd->cd", x_in, d_xv)
    d_bv = d_xv.sum(axis=(0, 1))
    d_x_from_v = jnp.einsum("bxd,cd->bxc", d_xv, wv)

    d_ypos = d_yq_in.sum(axis=0, keepdims=True) if y_pos.shape[0] == 1 else d_yq_in
    d_xpos = d_xk_in.sum(axis=0, keepdims=True) if x_pos_k.shape[0] == 1 else d_xk_in
    # cotangents must carry the primals' dtypes (bf16 under mixed precision)
    return (d_yq_in.astype(y_in.dtype), d_ypos.astype(y_pos.dtype),
            (d_xk_in + d_x_from_v).astype(x_in.dtype), d_xpos.astype(x_pos_k.dtype),
            d_wk.astype(wk.dtype), d_bk.astype(bk.dtype),
            d_wv.astype(wv.dtype), d_bv.astype(bv.dtype),
            (d_wq.astype(wq.dtype), d_bq.astype(bq.dtype),
             np.zeros(x_len.shape, jax.dtypes.float0)))


_small_x_vjp.defvjp(_small_x_fwd, _small_x_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10))
def _flash_vjp(y_in, y_pos, x_in, x_pos_k, wk, bk, wv, bv, wq_bq_xlen, tile, interpret):
    wq, bq, x_len = wq_bq_xlen
    yq = jnp.einsum("byc,cd->byd", y_in + y_pos, wq) + bq
    return _x2y_flash_fwd_impl(x_in, x_pos_k, yq, wk, bk, wv, bv, x_len,
                               tile=tile, interpret=interpret)


def _flash_fwd(y_in, y_pos, x_in, x_pos_k, wk, bk, wv, bv, wq_bq_xlen, tile, interpret):
    out = _flash_vjp(y_in, y_pos, x_in, x_pos_k, wk, bk, wv, bv, wq_bq_xlen, tile, interpret)
    attn, probs, logits = out
    return out, (y_in, y_pos, x_in, x_pos_k, wk, bk, wv, bv, wq_bq_xlen, probs)


def _flash_bwd(tile, interpret, res, g):
    y_in, y_pos, x_in, x_pos_k, wk, bk, wv, bv, (wq, bq, x_len), probs = res
    g_attn, g_probs, g_logits = g
    d = wq.shape[1]
    scale = 1.0 / math.sqrt(d)

    xk_in = x_in + x_pos_k
    xk = jnp.einsum("bxc,cd->bxd", xk_in, wk) + bk
    xv = jnp.einsum("bxc,cd->bxd", x_in, wv) + bv
    yq_in = y_in + y_pos
    yq = jnp.einsum("byc,cd->byd", yq_in, wq) + bq

    # attn = probs @ xv ; probs/logits: (B, M, X), softmax over X
    d_xv = jnp.einsum("bmx,bmd->bxd", probs, g_attn)
    d_probs = g_probs + jnp.einsum("bmd,bxd->bmx", g_attn, xv)
    d_logits = _softmax_bwd(probs, d_probs) + g_logits
    X = x_in.shape[1]
    colmask = jnp.arange(X)[None, None, :] < x_len[:, None, None]
    d_logits = jnp.where(colmask, d_logits, 0.0) * scale

    d_yq = jnp.einsum("bmx,bxd->bmd", d_logits, xk)
    d_xk = jnp.einsum("bmx,bmd->bxd", d_logits, yq)

    d_wq = jnp.einsum("bmc,bmd->cd", yq_in, d_yq)
    d_bq = d_yq.sum(axis=(0, 1))
    d_yq_in = jnp.einsum("bmd,cd->bmc", d_yq, wq)

    d_wk = jnp.einsum("bxc,bxd->cd", xk_in, d_xk)
    d_bk = d_xk.sum(axis=(0, 1))
    d_xk_in = jnp.einsum("bxd,cd->bxc", d_xk, wk)

    d_wv = jnp.einsum("bxc,bxd->cd", x_in, d_xv)
    d_bv = d_xv.sum(axis=(0, 1))
    d_x_from_v = jnp.einsum("bxd,cd->bxc", d_xv, wv)

    d_ypos = d_yq_in.sum(axis=0, keepdims=True) if y_pos.shape[0] == 1 else d_yq_in
    d_xpos = d_xk_in.sum(axis=0, keepdims=True) if x_pos_k.shape[0] == 1 else d_xk_in
    # cotangents must carry the primals' dtypes (bf16 under mixed precision)
    return (d_yq_in.astype(y_in.dtype), d_ypos.astype(y_pos.dtype),
            (d_xk_in + d_x_from_v).astype(x_in.dtype), d_xpos.astype(x_pos_k.dtype),
            d_wk.astype(wk.dtype), d_bk.astype(bk.dtype),
            d_wv.astype(wv.dtype), d_bv.astype(bv.dtype),
            (d_wq.astype(wq.dtype), d_bq.astype(bq.dtype),
             np.zeros(x_len.shape, jax.dtypes.float0)))


_flash_vjp.defvjp(_flash_fwd, _flash_bwd)


# ---------------------------------------------------------------------------
# public entry


def x2y_attention(y_in, y_pos, x_in, x_pos_k, wk, bk, wv, bv, wq, bq, x_len, *,
                  tile: int = 512, interpret: bool = False):
    """Fused X2Y attention: returns (attn_feat, probs, logits).

    y_in/y_pos: (B, Y, Cy) query stream and its positional add (zeros when
    kq_pos is off); x_in/x_pos_k: (B, X, Cx) key/value stream and the
    positional add for the key projection only (values see raw x);
    wk/bk, wv/bv: (Cx, d)/(d,); wq/bq: (Cy, d)/(d,); x_len: (B,) int32 valid
    key prefix.  probs/logits: (B, Y, X) f32; attn_feat: (B, Y, d) f32.
    Picks the flash formulation when X is large, the one-pass small-X
    formulation otherwise.
    """
    X = x_in.shape[1]
    args = (y_in, y_pos, x_in, x_pos_k, wk, bk, wv, bv, (wq, bq, x_len))
    if X > 1024:
        return _flash_vjp(*args, tile, interpret)
    return _small_x_vjp(*args, tile, interpret)
