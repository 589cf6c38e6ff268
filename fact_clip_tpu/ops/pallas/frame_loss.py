"""Fused frame-loss Pallas kernel: class-weighted CE + temporal smoothing.

Every block's loss reads its (B, T, C) frame logits through a chain of XLA
elementwise/reduce fusions — log-softmax (twice: CE and smoothing share the
input but not the intermediate), one-hot contraction, adjacent-row diffs,
clips, masked sums — profiled at ~1 ms/step across the four flagship blocks
(reference math: /root/reference/fact_clip/models/loss.py:8-18,246-258).

This kernel computes BOTH reduction sums in one pass over the logits.  The
time axis is TILED: the grid is (B, ceil(T / K)) and each program holds one
(K, C128) row chunk in VMEM, so VMEM use is constant in T (whole-(T, C)
panels blow the 16 MB scoped-vmem limit beyond T~3k — and the compiler's
liveness there is shape-dependent, so tiling is the only robust form).  The
adjacent-pair smoothing term needs one row across each tile boundary; the
caller passes precomputed strided boundary-row arrays (one (1, C128) row per
tile — reading whole neighbor tiles instead measured 3x the HBM traffic) and
the kernel recomputes those rows' log-softmax in-register.  Per-video sums
accumulate across the sequential inner grid dimension into a revisited
output block.

The backward is a second tiled pass that recomputes log-softmax and writes
dlogits directly (CE term + smoothing pair terms + softmax correction),
instead of XLA's materialized log-softmax residual chain.

Returned sums are UNNORMALIZED (see ``frame_ce_smooth`` in models/losses.py
for the /frame-count and /pair-count normalizations, applied outside).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e30

# Row-tile budget: keep each (K, Cp) f32 panel near 256 KB so the ~12 panels
# the compiler keeps live stay far under the 16 MB scoped-vmem limit even
# for wide class axes (verb/noun heads pad Cp to 384+).
_PANEL_ELEMS = 250_000
_K_MAX = 512


def _round_up(n: int, k: int) -> int:
    return -(-n // k) * k


def _tile_rows(Tp: int, Cp: int) -> int:
    k = max(8, min(_K_MAX, (_PANEL_ELEMS // Cp) // 8 * 8))
    return min(k, Tp)


def _ls_valid(x, lmask):
    """Masked log-softmax over lanes; invalid lanes return 0."""
    xm = jnp.where(lmask, x, _NEG)
    m = xm.max(axis=1, keepdims=True)
    ls = xm - m - jnp.log(jnp.exp(xm - m).sum(axis=1, keepdims=True))
    return jnp.where(lmask, ls, 0.0)


def _ls_row(x1, n_classes):
    """log-softmax of one boundary row (1, Cp)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, x1.shape[1]), 1)
    return _ls_valid(x1.astype(jnp.float32), lane < n_classes)


def _fwd_kernel(x_ref, xn_ref, lab_ref, mk_ref, mkn_ref, cw_ref,
                ce_ref, sl_ref, *, n_classes: int, n_rows: int, with_ce: bool):
    i = pl.program_id(1)
    K, Cp = x_ref.shape[1], x_ref.shape[2]
    lane = jax.lax.broadcasted_iota(jnp.int32, (K, Cp), 1)
    lmask = lane < n_classes
    ls = _ls_valid(x_ref[0].astype(jnp.float32), lmask)
    mk = mk_ref[0]  # (K, 1) f32, zero on padded/invalid rows
    row = i * K + jax.lax.broadcasted_iota(jnp.int32, (K, 1), 0)
    lrow = jax.lax.broadcasted_iota(jnp.int32, (K, 1), 0)

    @pl.when(i == 0)
    def _init():
        ce_ref[0] = jnp.zeros((8, 128), jnp.float32)
        sl_ref[0] = jnp.zeros((8, 128), jnp.float32)

    if with_ce:
        onehot = (lane == lab_ref[0]) & lmask
        ce_t = -jnp.where(onehot, ls, 0.0).sum(axis=1, keepdims=True)
        w_t = jnp.where(onehot, cw_ref[0, 0][None, :], 0.0).sum(axis=1, keepdims=True)
        ce_ref[0] += jnp.broadcast_to((ce_t * w_t * mk).sum(), (8, 128))

    # adjacent-pair truncated squared diff: row t carries pair (t, t+1); the
    # tile's last pair reads the next tile's first row from the precomputed
    # strided boundary array (one row per tile, not a whole neighbor tile —
    # keeps HBM traffic at ~1x the panel; final tile's row is garbage, zeroed
    # by the row guard)
    ls_n0 = _ls_row(xn_ref[0, pl.ds(i, 1)], n_classes)
    last = lrow == K - 1
    nxt = jnp.where(last, ls_n0, pltpu.roll(ls, K - 1, 0))
    mk_n = jnp.where(last, mkn_ref[0, pl.ds(i, 1)], pltpu.roll(mk, K - 1, 0))
    pm = mk * mk_n * (row < n_rows - 1).astype(jnp.float32)
    d = jnp.clip((nxt - ls) ** 2, 0.0, 16.0)
    sl_ref[0] += jnp.broadcast_to((d * pm).sum(), (8, 128))


def _bwd_kernel(x_ref, xp_ref, xn_ref, lab_ref, mk_ref, mkp_ref, mkn_ref,
                cw_ref, gce_ref, gsl_ref, dx_ref, *,
                n_classes: int, n_rows: int, with_ce: bool):
    i = pl.program_id(1)
    K, Cp = x_ref.shape[1], x_ref.shape[2]
    lane = jax.lax.broadcasted_iota(jnp.int32, (K, Cp), 1)
    lmask = lane < n_classes
    ls = _ls_valid(x_ref[0].astype(jnp.float32), lmask)
    mk = mk_ref[0]
    row = i * K + jax.lax.broadcasted_iota(jnp.int32, (K, 1), 0)
    lrow = jax.lax.broadcasted_iota(jnp.int32, (K, 1), 0)
    gce = gce_ref[0, 0, 0]
    gsl = gsl_ref[0, 0, 0]

    # pair r = (r, r+1), row r carrying d/dls of clip((ls[r+1]-ls[r])^2, 16):
    # +2g*diff onto ls[r+1], -2g*diff onto ls[r].  In-tile pairs roll; the
    # last pair reads the next tile's first row, the incoming pair (r0-1)
    # reads the previous tile's last row — both from the precomputed strided
    # boundary arrays (guard-masked garbage on the first/final tile).
    ls_n0 = _ls_row(xn_ref[0, pl.ds(i, 1)], n_classes)
    last = lrow == K - 1
    nxt = jnp.where(last, ls_n0, pltpu.roll(ls, K - 1, 0))
    mk_n = jnp.where(last, mkn_ref[0, pl.ds(i, 1)], pltpu.roll(mk, K - 1, 0))
    pm = mk * mk_n * (row < n_rows - 1).astype(jnp.float32)
    diff = nxt - ls
    g_pair = jnp.where(diff * diff <= 16.0, (2.0 * gsl) * diff * pm, 0.0)

    ls_p = _ls_row(xp_ref[0, pl.ds(i, 1)], n_classes)
    diff_p = ls[0:1] - ls_p
    pm_p = (mk[0:1] * mkp_ref[0, pl.ds(i, 1)]
            * jnp.where(i * K - 1 >= 0, 1.0, 0.0))
    g_prev = jnp.where(diff_p * diff_p <= 16.0, (2.0 * gsl) * diff_p * pm_p, 0.0)

    # dls[t] = g_pair[t-1] - g_pair[t]; row 0's incoming pair is g_prev
    dls = jnp.where(lrow == 0, g_prev, pltpu.roll(g_pair, 1, 0)) - g_pair

    if with_ce:
        onehot = (lane == lab_ref[0]) & lmask
        w_t = jnp.where(onehot, cw_ref[0, 0][None, :], 0.0).sum(axis=1, keepdims=True)
        dls = dls - (gce * w_t * mk) * onehot.astype(jnp.float32)

    dmask = jnp.where(lmask, dls, 0.0)
    p = jnp.where(lmask, jnp.exp(ls), 0.0)
    dx_ref[0] = (dmask - p * dmask.sum(axis=1, keepdims=True)).astype(dx_ref.dtype)


def _pad_inputs(x, labels, maskf, cweight):
    B, T, C = x.shape
    Cp = _round_up(C, 128)
    K = _tile_rows(_round_up(T, 8), Cp)
    nT = -(-_round_up(T, 8) // K)
    Tp = nT * K
    xp = jnp.pad(x, ((0, 0), (0, Tp - T), (0, Cp - C)))
    lab = jnp.pad(labels.astype(jnp.int32), ((0, 0), (0, Tp - T)))[..., None]
    mk = jnp.pad(maskf, ((0, 0), (0, Tp - T)))[..., None]
    cw = jnp.pad(cweight, (0, Cp - C))[None, None, :]
    return xp, lab, mk, cw, K, nT, Tp, Cp


def _boundary_next(arr, K, nT):
    """(B, nT, ...) where row i = arr[:, (i+1)*K] (first row of tile i+1);
    the final tile's row is garbage (row guard zeroes its pair)."""
    nxt = arr[:, K::K]
    return jnp.pad(nxt, ((0, 0), (0, nT - nxt.shape[1])) + ((0, 0),) * (arr.ndim - 2))


def _boundary_prev(arr, K, nT):
    """(B, nT, ...) where row i = arr[:, i*K - 1] (last row of tile i-1);
    row 0 is garbage (the i>0 guard zeroes its pair)."""
    prv = arr[:, K - 1::K][:, :nT - 1]
    return jnp.pad(prv, ((0, 0), (1, nT - 1 - prv.shape[1])) + ((0, 0),) * (arr.ndim - 2))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _loss_vjp(x, aux, n_classes, with_ce, interpret):
    return _fwd_impl(x, aux, n_classes, with_ce, interpret)


def _fwd_impl(x, aux, n_classes, with_ce, interpret):
    labels, maskf, cweight = aux
    B, T, C = x.shape
    xp, lab, mk, cw, K, nT, Tp, Cp = _pad_inputs(x, labels, maskf, cweight)
    kernel = functools.partial(_fwd_kernel, n_classes=C, n_rows=T, with_ce=with_ce)
    row_spec = pl.BlockSpec((1, nT, Cp), lambda b, i: (b, 0, 0))
    col_spec = pl.BlockSpec((1, nT, 1), lambda b, i: (b, 0, 0))
    ce, sl = pl.pallas_call(
        kernel,
        grid=(B, nT),
        in_specs=[pl.BlockSpec((1, K, Cp), lambda b, i: (b, i, 0)), row_spec,
                  pl.BlockSpec((1, K, 1), lambda b, i: (b, i, 0)),
                  pl.BlockSpec((1, K, 1), lambda b, i: (b, i, 0)), col_spec,
                  pl.BlockSpec((1, 1, Cp), lambda b, i: (0, 0, 0))],
        out_specs=[pl.BlockSpec((1, 8, 128), lambda b, i: (b, 0, 0)),
                   pl.BlockSpec((1, 8, 128), lambda b, i: (b, 0, 0))],
        out_shape=[jax.ShapeDtypeStruct((B, 8, 128), jnp.float32),
                   jax.ShapeDtypeStruct((B, 8, 128), jnp.float32)],
        interpret=interpret,
    )(xp, _boundary_next(xp, K, nT), lab, mk, _boundary_next(mk, K, nT), cw)
    return ce[:, 0, 0], sl[:, 0, 0]


def _loss_fwd(x, aux, n_classes, with_ce, interpret):
    return _fwd_impl(x, aux, n_classes, with_ce, interpret), (x, aux)


def _loss_bwd(n_classes, with_ce, interpret, res, g):
    x, aux = res
    labels, maskf, cweight = aux
    gce, gsl = g
    B, T, C = x.shape
    xp, lab, mk, cw, K, nT, Tp, Cp = _pad_inputs(x, labels, maskf, cweight)
    kernel = functools.partial(_bwd_kernel, n_classes=C, n_rows=T, with_ce=with_ce)
    row_spec = pl.BlockSpec((1, nT, Cp), lambda b, i: (b, 0, 0))
    col_spec = pl.BlockSpec((1, nT, 1), lambda b, i: (b, 0, 0))
    dx = pl.pallas_call(
        kernel,
        grid=(B, nT),
        in_specs=[pl.BlockSpec((1, K, Cp), lambda b, i: (b, i, 0)),
                  row_spec, row_spec,
                  pl.BlockSpec((1, K, 1), lambda b, i: (b, i, 0)),
                  pl.BlockSpec((1, K, 1), lambda b, i: (b, i, 0)),
                  col_spec, col_spec,
                  pl.BlockSpec((1, 1, Cp), lambda b, i: (0, 0, 0)),
                  pl.BlockSpec((1, 8, 128), lambda b, i: (b, 0, 0)),
                  pl.BlockSpec((1, 8, 128), lambda b, i: (b, 0, 0))],
        out_specs=pl.BlockSpec((1, K, Cp), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((B, Tp, Cp), x.dtype),
        interpret=interpret,
    )(xp, _boundary_prev(xp, K, nT), _boundary_next(xp, K, nT), lab, mk,
      _boundary_prev(mk, K, nT), _boundary_next(mk, K, nT), cw,
      jnp.broadcast_to(gce.astype(jnp.float32)[:, None, None], (B, 8, 128)),
      jnp.broadcast_to(gsl.astype(jnp.float32)[:, None, None], (B, 8, 128)))
    daux = tuple(np.zeros(a.shape, jax.dtypes.float0) if jnp.issubdtype(a.dtype, jnp.integer)
                 else jnp.zeros(a.shape, a.dtype) for a in aux)
    return dx[:, :T, :C], daux


_loss_vjp.defvjp(_loss_fwd, _loss_bwd)


def fused_ce_smooth_sums(clogit, labels, frame_mask, cweight, *,
                         interpret: bool = False):
    """Unnormalized (ce_sum, smooth_sum) per video, one fused pass.

    ce_sum[b]   = sum_t CE(clogit[b,t], labels[b,t]) * cweight[labels[b,t]]
                  * mask[b,t]
    smooth_sum[b] = sum_{t,c} clip((ls[t+1]-ls[t])^2, 0, 16) * pairmask[b,t]

    clogit: (B, T, C) logits; labels (B, T) int; frame_mask (B, T) bool;
    cweight (>=C,) f32.  The caller normalizes (frame count / C*pairs).
    Gradients flow to clogit only: cweight (like labels/masks) gets a zero
    cotangent — class weights are config constants, and the wrapper in
    models/losses.py stop-gradients them on the XLA path to match.
    """
    C = clogit.shape[-1]
    aux = (labels, frame_mask.astype(jnp.float32), cweight[:C].astype(jnp.float32))
    return _loss_vjp(clogit, aux, C, True, interpret)


def fused_smooth_sum(logits, pair_row_mask_src, *, interpret: bool = False):
    """Unnormalized smoothing sum per video (no CE term).

    logits: (B, T, C); pair_row_mask_src: (B, T) bool row validity (pairs are
    valid where both rows are).
    """
    B, T, C = logits.shape
    aux = (jnp.zeros((B, T), jnp.int32), pair_row_mask_src.astype(jnp.float32),
           jnp.zeros((C,), jnp.float32))
    _, sl = _loss_vjp(logits, aux, C, False, interpret)
    return sl
