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

# The default per-kernel scoped-VMEM limit on this toolchain is 16 MB —
# the large-tile working sets (see _pick_tile / the x2y tile docstring)
# need an explicit raise toward the v5e's 128 MB physical VMEM.
_VMEM_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20)


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
        compiler_params=_VMEM_PARAMS,
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
        compiler_params=_VMEM_PARAMS,
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
# fused flash backward: one pass over X tiles, all grads in a single read of x


def _flash_bwd_kernel(xlen_ref, x_ref, xpos_ref, probs_ref, gprobs_ref, glogits_ref,
                      gattn_ref, yq_ref, dD_ref, wk_ref, bk_ref, wv_ref, bv_ref,
                      dx_ref, dxpos_ref, dyq_ref, dwk_ref, dbk_ref, dwv_ref, dbv_ref,
                      dyq_scr, dwk_scr, dwv_scr, dbk_scr, dbv_scr, *,
                      scale: float, tile: int, n_t: int, n_b: int):
    t = pl.program_id(0)
    b = pl.program_id(1)

    @pl.when((t == 0) & (b == 0))
    def _init():
        dyq_scr[...] = jnp.zeros_like(dyq_scr)
        dwk_scr[...] = jnp.zeros_like(dwk_scr)
        dwv_scr[...] = jnp.zeros_like(dwv_scr)
        dbk_scr[...] = jnp.zeros_like(dbk_scr)
        dbv_scr[...] = jnp.zeros_like(dbv_scr)

    @pl.when(b == 0)
    def _init_pos():  # d_xpos[t] accumulates over the inner b iterations
        dxpos_ref[...] = jnp.zeros_like(dxpos_ref)

    x = x_ref[0]  # (tile, Cx), possibly bf16
    xk_in = x.astype(jnp.float32) + xpos_ref[0].astype(jnp.float32)
    # recompute the tile's projections in VMEM (cheap; saves (B, X, d) x2 HBM)
    xk = jnp.dot(xk_in.astype(x.dtype), wk_ref[:], preferred_element_type=jnp.float32)
    xk = xk + bk_ref[:].astype(jnp.float32)  # (tile, d)
    xv = jnp.dot(x, wv_ref[:], preferred_element_type=jnp.float32)
    xv = xv + bv_ref[:].astype(jnp.float32)

    probs = probs_ref[0]  # (M, tile) f32 (zero on cols >= x_len and padding)
    gattn = gattn_ref[0].astype(jnp.float32)  # (M, d)

    # d_probs = g_probs + g_attn @ xv^T ; softmax bwd via precomputed row term
    # D = rowsum(probs * d_probs) (full-X reduction done outside the kernel)
    dprobs = gprobs_ref[0] + jax.lax.dot_general(
        gattn, xv, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    dlog = probs * (dprobs - dD_ref[0]) + glogits_ref[0]  # dD block is (M, 1)
    col = jax.lax.broadcasted_iota(jnp.int32, dlog.shape, 1) + t * tile
    dlog = jnp.where(col < xlen_ref[b], dlog * scale, 0.0)  # (M, tile)

    dxv = jax.lax.dot_general(  # (tile, d) = probs^T @ g_attn
        probs, gattn, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    dxk = jax.lax.dot_general(  # (tile, d) = dlog^T @ yq
        dlog, yq_ref[0].astype(jnp.float32), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dyq_scr[b] += jnp.dot(dlog, xk, preferred_element_type=jnp.float32)  # (M, d)

    dxk_in = jax.lax.dot_general(  # (tile, Cx) = dxk @ wk^T
        dxk.astype(wk_ref.dtype), wk_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    dxv_in = jax.lax.dot_general(
        dxv.astype(wv_ref.dtype), wv_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    dx_ref[0, :, :] = (dxk_in + dxv_in).astype(dx_ref.dtype)
    dxpos_ref[...] += dxk_in

    dwk_scr[...] += jax.lax.dot_general(  # (Cx, d) = xk_in^T @ dxk
        xk_in.astype(x.dtype), dxk.astype(x.dtype), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dwv_scr[...] += jax.lax.dot_general(
        x, dxv.astype(x.dtype), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dbk_scr[...] += dxk.sum(axis=0, keepdims=True)
    dbv_scr[...] += dxv.sum(axis=0, keepdims=True)

    @pl.when((t == n_t - 1) & (b == n_b - 1))
    def _finish():
        dyq_ref[...] = dyq_scr[...]
        dwk_ref[...] = dwk_scr[...]
        dwv_ref[...] = dwv_scr[...]
        dbk_ref[...] = dbk_scr[...]
        dbv_ref[...] = dbv_scr[...]


def _x2y_flash_bwd_impl(x, x_pos, yq, wk, bk, wv, bv, x_len, probs, g_attn,
                        g_probs, g_logits, attn, *, tile: int, interpret: bool):
    """Fused backward over X tiles.  Returns
    (d_x (B,X,Cx), d_xpos (Xp,Cx f32), d_yq (B,M,d), d_wk, d_bk, d_wv, d_bv)
    with d_x in x.dtype and the rest f32.  d_xpos is summed over batch
    (caller slices/casts for the broadcast-pos case)."""
    B, X, Cx = x.shape
    M, d = yq.shape[1], yq.shape[2]
    tile = min(tile, max(-(-X // 128) * 128, 128))
    n_t = pl.cdiv(X, tile)
    X_pad = n_t * tile
    if X_pad != X:
        padx = ((0, 0), (0, X_pad - X), (0, 0))
        x = jnp.pad(x, padx)
        x_pos = jnp.pad(x_pos, padx)
        padp = ((0, 0), (0, 0), (0, X_pad - X))
        probs = jnp.pad(probs, padp)
        g_probs = jnp.pad(g_probs, padp)
        g_logits = jnp.pad(g_logits, padp)

    # full-X softmax row term, one fused XLA reduction over the small probs.
    # (B, M, 1): Mosaic requires 2D blocks be 8x128-divisible or full-dim;
    # the trailing singleton keeps the (1, M, 1) block legal.
    D = ((probs * g_probs).sum(axis=-1) + (g_attn * attn).sum(axis=-1))[:, :, None]

    pos_b = 0 if x_pos.shape[0] == 1 else None
    kernel = functools.partial(
        _flash_bwd_kernel, scale=1.0 / math.sqrt(d), tile=tile, n_t=n_t, n_b=B)
    dx, dxpos, dyq, dwk, dbk, dwv, dbv = pl.pallas_call(
        kernel,
        compiler_params=_VMEM_PARAMS,
        grid=(n_t, B),  # b minor: d_xpos[t] accumulates over consecutive steps
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, tile, Cx), lambda t, b: (b, t, 0)),
            pl.BlockSpec((1, tile, Cx), lambda t, b, pb=pos_b: (pb if pb is not None else b, t, 0)),
            pl.BlockSpec((1, M, tile), lambda t, b: (b, 0, t)),
            pl.BlockSpec((1, M, tile), lambda t, b: (b, 0, t)),
            pl.BlockSpec((1, M, tile), lambda t, b: (b, 0, t)),
            pl.BlockSpec((1, M, d), lambda t, b: (b, 0, 0)),
            pl.BlockSpec((1, M, d), lambda t, b: (b, 0, 0)),
            pl.BlockSpec((1, M, 1), lambda t, b: (b, 0, 0)),
            pl.BlockSpec((Cx, d), lambda t, b: (0, 0)),
            pl.BlockSpec((d,), lambda t, b: (0,)),
            pl.BlockSpec((Cx, d), lambda t, b: (0, 0)),
            pl.BlockSpec((d,), lambda t, b: (0,)),
        ],
        out_specs=[
            pl.BlockSpec((1, tile, Cx), lambda t, b: (b, t, 0)),
            pl.BlockSpec((tile, Cx), lambda t, b: (t, 0)),
            pl.BlockSpec((B, M, d), lambda t, b: (0, 0, 0)),
            pl.BlockSpec((Cx, d), lambda t, b: (0, 0)),
            pl.BlockSpec((1, d), lambda t, b: (0, 0)),
            pl.BlockSpec((Cx, d), lambda t, b: (0, 0)),
            pl.BlockSpec((1, d), lambda t, b: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, X_pad, Cx), x.dtype),
            jax.ShapeDtypeStruct((X_pad, Cx), jnp.float32),
            jax.ShapeDtypeStruct((B, M, d), jnp.float32),
            jax.ShapeDtypeStruct((Cx, d), jnp.float32),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
            jax.ShapeDtypeStruct((Cx, d), jnp.float32),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((B, M, d), jnp.float32),
            pltpu.VMEM((Cx, d), jnp.float32),
            pltpu.VMEM((Cx, d), jnp.float32),
            pltpu.VMEM((1, d), jnp.float32),
            pltpu.VMEM((1, d), jnp.float32),
        ],
        interpret=interpret,
    )(x_len, x, x_pos, probs, g_probs, g_logits, g_attn, yq, D, wk, bk, wv, bv)
    return (dx[:, :X], dxpos[:X], dyq, dwk, dbk[0], dwv, dbv[0])


# ---------------------------------------------------------------------------
# fused small-X backward: one pass over Y tiles (a2f direction — Y is the
# frame axis).  The X-side projection grads stay XLA (X is tokens/segments,
# tiny); what the fusion removes from HBM is yq/d_yq (B, Y, d) and the
# (B, Y, X) d_probs/d_logits intermediates, plus a second read of y.


def _small_x_bwd_kernel(xlen_ref, y_ref, ypos_ref, probs_ref, gprobs_ref,
                        glogits_ref, gattn_ref, xk_ref, xv_ref, wq_ref, bq_ref,
                        dy_ref, dypos_ref, dxk_ref, dxv_ref, dwq_ref, dbq_ref,
                        dxk_scr, dxv_scr, dwq_scr, dbq_scr, *,
                        scale: float, tile: int, n_t: int, n_b: int, Y: int):
    t = pl.program_id(0)
    b = pl.program_id(1)

    @pl.when((t == 0) & (b == 0))
    def _init():
        dxk_scr[...] = jnp.zeros_like(dxk_scr)
        dxv_scr[...] = jnp.zeros_like(dxv_scr)
        dwq_scr[...] = jnp.zeros_like(dwq_scr)
        dbq_scr[...] = jnp.zeros_like(dbq_scr)

    @pl.when(b == 0)
    def _init_pos():
        dypos_ref[...] = jnp.zeros_like(dypos_ref)

    row = jax.lax.broadcasted_iota(jnp.int32, (tile, 1), 0) + t * tile
    row_ok = row < Y  # ragged last Y tile: mask garbage rows out of every sum

    yq_in = y_ref[0].astype(jnp.float32) + ypos_ref[0].astype(jnp.float32)
    yq = jnp.dot(yq_in.astype(y_ref.dtype), wq_ref[:], preferred_element_type=jnp.float32)
    # mask ragged-tile garbage rows: 0-weight x NaN still poisons contractions
    yq = jnp.where(row_ok, yq + bq_ref[:].astype(jnp.float32), 0.0)  # (tile, d)

    probs = jnp.where(row_ok, probs_ref[0], 0.0)  # (tile, X)
    gattn = jnp.where(row_ok, gattn_ref[0].astype(jnp.float32), 0.0)  # (tile, d)
    xv = xv_ref[0].astype(jnp.float32)  # (X, d)
    xk = xk_ref[0].astype(jnp.float32)

    dprobs = gprobs_ref[0] + jax.lax.dot_general(
        gattn, xv, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    dD = (probs * dprobs).sum(axis=-1, keepdims=True)  # rows are tile-local
    dlog = probs * (dprobs - dD) + glogits_ref[0]
    col = jax.lax.broadcasted_iota(jnp.int32, dlog.shape, 1)
    dlog = jnp.where(row_ok & (col < xlen_ref[b]), dlog * scale, 0.0)

    d_yq = jnp.dot(dlog, xk, preferred_element_type=jnp.float32)  # (tile, d)
    dxk_scr[b] += jax.lax.dot_general(  # (X, d) = dlog^T @ yq
        dlog, yq, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    dxv_scr[b] += jax.lax.dot_general(  # (X, d) = probs^T @ gattn
        probs, gattn, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    dwq_scr[...] += jax.lax.dot_general(  # (Cy, d) = yq_in^T @ d_yq
        jnp.where(row_ok, yq_in, 0.0), d_yq, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dbq_scr[...] += d_yq.sum(axis=0, keepdims=True)

    d_y = jax.lax.dot_general(  # (tile, Cy) = d_yq @ wq^T
        d_yq.astype(wq_ref.dtype), wq_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    d_y = jnp.where(row_ok, d_y, 0.0)
    dy_ref[0, :, :] = d_y.astype(dy_ref.dtype)
    dypos_ref[...] += d_y

    @pl.when((t == n_t - 1) & (b == n_b - 1))
    def _finish():
        dxk_ref[...] = dxk_scr[...]
        dxv_ref[...] = dxv_scr[...]
        dwq_ref[...] = dwq_scr[...]
        dbq_ref[...] = dbq_scr[...]


def _x2y_small_x_bwd_impl(y_in, y_pos, xk, xv, wq, bq, x_len, probs,
                          g_attn, g_probs, g_logits, *, tile: int, interpret: bool):
    """Fused backward over Y tiles.  Returns
    (d_y (B,Y,Cy), d_ypos (Y,Cy f32, batch-summed), d_xk (B,X,d),
     d_xv (B,X,d), d_wq (Cy,d), d_bq (d,))."""
    B, Y, Cy = y_in.shape
    X, d = xk.shape[1], xk.shape[2]
    tile = min(tile, max(-(-Y // 8) * 8, 8))
    n_t = pl.cdiv(Y, tile)
    pos_b = 0 if y_pos.shape[0] == 1 else None
    kernel = functools.partial(
        _small_x_bwd_kernel, scale=1.0 / math.sqrt(d), tile=tile, n_t=n_t,
        n_b=B, Y=Y)
    dy, dypos, dxk, dxv, dwq, dbq = pl.pallas_call(
        kernel,
        compiler_params=_VMEM_PARAMS,
        grid=(n_t, B),  # b minor: d_ypos[t] accumulates over consecutive steps
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, tile, Cy), lambda t, b: (b, t, 0)),
            pl.BlockSpec((1, tile, Cy), lambda t, b, pb=pos_b: (pb if pb is not None else b, t, 0)),
            pl.BlockSpec((1, tile, X), lambda t, b: (b, t, 0)),
            pl.BlockSpec((1, tile, X), lambda t, b: (b, t, 0)),
            pl.BlockSpec((1, tile, X), lambda t, b: (b, t, 0)),
            pl.BlockSpec((1, tile, d), lambda t, b: (b, t, 0)),
            pl.BlockSpec((1, X, d), lambda t, b: (b, 0, 0)),
            pl.BlockSpec((1, X, d), lambda t, b: (b, 0, 0)),
            pl.BlockSpec((Cy, d), lambda t, b: (0, 0)),
            pl.BlockSpec((d,), lambda t, b: (0,)),
        ],
        out_specs=[
            pl.BlockSpec((1, tile, Cy), lambda t, b: (b, t, 0)),
            pl.BlockSpec((tile, Cy), lambda t, b: (t, 0)),
            pl.BlockSpec((B, X, d), lambda t, b: (0, 0, 0)),
            pl.BlockSpec((B, X, d), lambda t, b: (0, 0, 0)),
            pl.BlockSpec((Cy, d), lambda t, b: (0, 0)),
            pl.BlockSpec((1, d), lambda t, b: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Y, Cy), y_in.dtype),
            jax.ShapeDtypeStruct((n_t * tile, Cy), jnp.float32),
            jax.ShapeDtypeStruct((B, X, d), jnp.float32),
            jax.ShapeDtypeStruct((B, X, d), jnp.float32),
            jax.ShapeDtypeStruct((Cy, d), jnp.float32),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((B, X, d), jnp.float32),
            pltpu.VMEM((B, X, d), jnp.float32),
            pltpu.VMEM((Cy, d), jnp.float32),
            pltpu.VMEM((1, d), jnp.float32),
        ],
        interpret=interpret,
    )(x_len, y_in, y_pos, probs, g_probs, g_logits, g_attn, xk, xv, wq, bq)
    return dy, dypos[:Y], dxk, dxv, dwq, dbq[0]


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
    """Backward dispatch: the fused Pallas kernel (one pass over Y tiles;
    yq/d_yq and the (B, Y, X) intermediates never hit HBM) for the
    broadcast-y_pos case; XLA recompute otherwise (batched y_pos needs the
    per-batch d_yq_in the kernel reduces away)."""
    y_in, y_pos, x_in, x_pos_k, wk, bk, wv, bv, (wq, bq, x_len), probs = res
    g_attn, g_probs, g_logits = g
    d = wq.shape[1]

    if y_pos.shape[0] == 1:
        xk_in = x_in + x_pos_k
        xk = jnp.einsum("bxc,cd->bxd", xk_in, wk) + bk
        xv = jnp.einsum("bxc,cd->bxd", x_in, wv) + bv
        dy, dypos, d_xk, d_xv, d_wq, d_bq = _x2y_small_x_bwd_impl(
            y_in, y_pos, xk, xv, wq, bq, x_len, probs,
            g_attn, g_probs, g_logits, tile=tile, interpret=interpret)
        # X side stays XLA: X is the small token/segment axis
        d_wk = jnp.einsum("bxc,bxd->cd", xk_in, d_xk)
        d_bk = d_xk.sum(axis=(0, 1))
        d_xk_in = jnp.einsum("bxd,cd->bxc", d_xk, wk)
        d_wv = jnp.einsum("bxc,bxd->cd", x_in, d_xv)
        d_bv = d_xv.sum(axis=(0, 1))
        d_x_from_v = jnp.einsum("bxd,cd->bxc", d_xv, wv)
        d_xpos = d_xk_in.sum(axis=0, keepdims=True) if x_pos_k.shape[0] == 1 else d_xk_in
        return (dy.astype(y_in.dtype), dypos[None].astype(y_pos.dtype),
                (d_xk_in + d_x_from_v).astype(x_in.dtype), d_xpos.astype(x_pos_k.dtype),
                d_wk.astype(wk.dtype), d_bk.astype(bk.dtype),
                d_wv.astype(wv.dtype), d_bv.astype(bv.dtype),
                (d_wq.astype(wq.dtype), d_bq.astype(bq.dtype),
                 np.zeros(x_len.shape, jax.dtypes.float0)))

    return _small_x_bwd_xla(res, g, d)


def _small_x_bwd_xla(res, g, d):
    y_in, y_pos, x_in, x_pos_k, wk, bk, wv, bv, (wq, bq, x_len), probs = res
    g_attn, g_probs, g_logits = g
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
    return out, (y_in, y_pos, x_in, x_pos_k, wk, bk, wv, bv, wq_bq_xlen, probs, attn)


def _flash_bwd(tile, interpret, res, g):
    """Backward dispatch: the fused Pallas kernel (one pass over X tiles, all
    grads in a single read of x) for the production broadcast-pos case; the
    XLA recompute path when x_pos is per-batch (it then needs per-batch
    d_xk_in, which the fused kernel deliberately reduces away)."""
    y_in, y_pos, x_in, x_pos_k, wk, bk, wv, bv, (wq, bq, x_len), probs, attn = res
    g_attn, g_probs, g_logits = g
    d = wq.shape[1]

    if x_pos_k.shape[0] == 1:
        yq_in = y_in + y_pos
        yq = jnp.einsum("byc,cd->byd", yq_in, wq) + bq
        dx, dxpos, d_yq, d_wk, d_bk, d_wv, d_bv = _x2y_flash_bwd_impl(
            x_in, x_pos_k, yq, wk, bk, wv, bv, x_len, probs,
            g_attn, g_probs, g_logits, attn, tile=tile, interpret=interpret)
        d_wq = jnp.einsum("bmc,bmd->cd", yq_in, d_yq)
        d_bq = d_yq.sum(axis=(0, 1))
        d_yq_in = jnp.einsum("bmd,cd->bmc", d_yq, wq)
        d_ypos = d_yq_in.sum(axis=0, keepdims=True) if y_pos.shape[0] == 1 else d_yq_in
        return (d_yq_in.astype(y_in.dtype), d_ypos.astype(y_pos.dtype),
                dx.astype(x_in.dtype), dxpos[None].astype(x_pos_k.dtype),
                d_wk.astype(wk.dtype), d_bk.astype(bk.dtype),
                d_wv.astype(wv.dtype), d_bv.astype(bv.dtype),
                (d_wq.astype(wq.dtype), d_bq.astype(bq.dtype),
                 np.zeros(x_len.shape, jax.dtypes.float0)))

    return _flash_bwd_xla(res, g, d)


def _flash_bwd_xla(res, g, d):
    y_in, y_pos, x_in, x_pos_k, wk, bk, wv, bv, (wq, bq, x_len), probs, attn = res
    g_attn, g_probs, g_logits = g
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

    tile=512: larger tiles (1024-3072, i.e. one X tile for the flagship
    bucket) were measured SLOWER on v5e (round 4; +6-15%% on the train
    step / f32 eval) — multi-tile grids overlap block DMA with compute.
    """
    X = x_in.shape[1]
    args = (y_in, y_pos, x_in, x_pos_k, wk, bk, wv, bv, (wq, bq, x_len))
    if X > 1024:
        return _flash_vjp(*args, tile, interpret)
    return _small_x_vjp(*args, tile, interpret)
