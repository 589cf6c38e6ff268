"""Fused action-branch sublayer kernels: self-attention and FFN.

The decoder stacks run H=8-head self-attention over only M~40 action tokens
(models/layers.py::SALayer / SCALayer, reference basic.py:391-523).  At that
size every XLA op is latency-bound: the 24 sublayer instances in the
flagship step cost ~3.2 ms across ~2,000 dispatched micro-fusions.  Each
kernel here runs one whole sublayer per video in VMEM:

* ``sa_sublayer``  — y = LN(x + drop(Wo @ MHA(x+pos, x+pos, x) + bo))
* ``ffn_sublayer`` — y = LN(x + drop(W2 @ drop(relu(W1 @ x + b1)) + b2))

Multi-head attention without batched matmuls: queries are stacked
head-blocked — rows h*M+i hold query i masked to head h's lanes — so all
heads' logits come from ONE (H*M, E) x (E, M) matmul per video, softmax
runs over the key lanes, and the head-blocked context collapses back with a
lane-select.  The grid is (B,); the weight blocks and the shared positional
table have constant index maps so they stay VMEM-resident across videos, and
the weight + pos gradients accumulate into revisited output blocks.

Dropout uses the on-core PRNG (dilated_conv._keep_mask); the backward
re-seeds per video and redraws the identical masks (same draw sequence).
Backward kernels recompute the forward in-register (no residual tensors in
HBM) and write dx plus the LN gradients in one pass.  The SA backward also
accumulates all projection weight grads in VMEM; the FFN backward instead
emits per-video panels (dz1, dropped-h, dt2) that the wrapper reduces with
two MXU matmuls — its (E,F)/(F,E) accumulators would double the weight
footprint in VMEM for no FLOP win.

Numerics follow the XLA path: projections and attention matmuls run at the
compute dtype with f32 accumulation, softmax/out-proj/residual/LayerNorm in
f32 (flax LayerNorm promotes to f32; eps 1e-6).
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

_LN_EPS = 1e-6

# The weight panels alone are ~8-16 MB f32 at flagship F=2048 (Mosaic
# double-buffers operand windows), far over the conservative 16 MB scoped
# default; v5e has 128 MB of physical VMEM.
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def _round8(n: int) -> int:
    return -(-n // 8) * 8


def _dot(a, b, dims, out=jnp.float32):
    # Precision pinned by operand dtype, independent of the global
    # jax_default_matmul_precision: f32 operands run full-precision (like
    # the other fused kernels — Mosaic's DEFAULT f32 matmul is single-pass
    # bf16, ~1e-3 error), bf16 operands run the native MXU pass (Mosaic
    # rejects fp32-precision matmuls on bf16 inputs).
    prec = (jax.lax.Precision.HIGHEST
            if a.dtype == jnp.float32 and b.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    return jax.lax.dot_general(a, b, (dims, ((), ())), precision=prec,
                               preferred_element_type=out)


def _cast(v, bf16: bool):
    return v.astype(jnp.bfloat16) if bf16 else v


def _ln_fwd(res, s, b):
    mu = res.mean(axis=1, keepdims=True)
    var = jnp.maximum((res * res).mean(axis=1, keepdims=True) - mu * mu, 0.0)
    inv = jax.lax.rsqrt(var + _LN_EPS)
    xhat = (res - mu) * inv
    return xhat * s + b, xhat, inv


def _ln_bwd(g, xhat, inv, s):
    """dres for y = xhat*s + b; also returns (dscale, dbias) row-sums."""
    dxh = g * s
    dres = inv * (dxh - dxh.mean(axis=1, keepdims=True)
                  - xhat * (dxh * xhat).mean(axis=1, keepdims=True))
    return dres, (g * xhat).sum(axis=0, keepdims=True), g.sum(axis=0, keepdims=True)


def _head_stack(v, H, M8, headmask):
    """(M8, E) -> (H*M8, E) with rows h*M8+i = v[i] masked to head h lanes."""
    return jnp.where(headmask, jnp.concatenate([v] * H, axis=0), 0.0)


def _head_collapse(stack, H, M8, headmask):
    """Adjoint of _head_stack: (H*M8, E) -> (M8, E), o[i,l] = stack[(l//hd)*M8+i, l]."""
    out = jnp.zeros((M8, stack.shape[1]), stack.dtype)
    for h in range(H):
        blk = stack[h * M8:(h + 1) * M8]
        out = out + jnp.where(headmask[h * M8:(h + 1) * M8], blk, 0.0)
    return out


def _attn_core(x, pos, wqk_r, bqk_r, wv_r, bv_r, *, H, M, bf16):
    """Shared forward compute up to (undropped) probs P and value panel v.

    Returns (a_qk, v, q_bd, S_scaled-P pieces) needed by both passes."""
    M8, E = x.shape
    hd = E // H
    lane = jax.lax.broadcasted_iota(jnp.int32, (H * M8, E), 1)
    rowb = jax.lax.broadcasted_iota(jnp.int32, (H * M8, E), 0)
    headmask = (lane // hd) == (rowb // M8)

    a_qk = _cast(x + pos, bf16)
    qk = _cast(_dot(a_qk, _cast(wqk_r, bf16), ((1,), (0,))), bf16) + _cast(bqk_r, bf16)
    q, k = qk[:, :E], qk[:, E:]
    v = _cast(_dot(_cast(x, bf16), _cast(wv_r, bf16), ((1,), (0,))), bf16) + _cast(bv_r, bf16)

    q_bd = _head_stack(q.astype(jnp.float32), H, M8, headmask).astype(q.dtype)
    S = _dot(q_bd, k, ((1,), (1,))) * (1.0 / math.sqrt(hd))  # (H*M8, M8) f32
    klane = jax.lax.broadcasted_iota(jnp.int32, S.shape, 1)
    S = jnp.where(klane < M, S, -1e30)
    m = S.max(axis=1, keepdims=True)
    e = jnp.exp(S - m)
    P = e / e.sum(axis=1, keepdims=True)
    return a_qk, q_bd, k, v, P, headmask


def _sa_fwd_kernel(seed_ref, x_ref, pos_ref, wqk_ref, bqk_ref, wv_ref, bv_ref,
                   wo_ref, bo_ref, ls_ref, lb_ref, y_ref, *,
                   H: int, M: int, rate_attn: float, rate: float, bf16: bool):
    b = pl.program_id(0)
    x = x_ref[0].astype(jnp.float32)
    M8, E = x.shape
    if rate_attn > 0.0 or rate > 0.0:
        pltpu.prng_seed(seed_ref[0] + b)

    a_qk, q_bd, k, v, P, headmask = _attn_core(
        x, pos_ref[0].astype(jnp.float32), wqk_ref[...], bqk_ref[...],
        wv_ref[...], bv_ref[...], H=H, M=M, bf16=bf16)
    if rate_attn > 0.0:
        P = P * _keep_mask(rate_attn, P.shape)
    o_stack = _dot(_cast(P, bf16), v, ((1,), (0,)))  # (H*M8, E) f32
    o = _head_collapse(o_stack, H, M8, headmask)
    out = _dot(o, wo_ref[...], ((1,), (0,))) + bo_ref[...]
    if rate > 0.0:
        out = out * _keep_mask(rate, out.shape)
    res = x + out
    y, _, _ = _ln_fwd(res, ls_ref[...], lb_ref[...])
    y_ref[0] = y


def _sa_bwd_kernel(seed_ref, x_ref, pos_ref, wqk_ref, bqk_ref, wv_ref, bv_ref,
                   wo_ref, bo_ref, ls_ref, lb_ref, g_ref,
                   dx_ref, dpos_ref, dwqk_ref, dbqk_ref, dwv_ref, dbv_ref,
                   dwo_ref, dbo_ref, dls_ref, dlb_ref, *,
                   H: int, M: int, rate_attn: float, rate: float, bf16: bool):
    b = pl.program_id(0)
    x = x_ref[0].astype(jnp.float32)
    M8, E = x.shape
    hd = E // H
    if rate_attn > 0.0 or rate > 0.0:
        pltpu.prng_seed(seed_ref[0] + b)

    a_qk, q_bd, k, v, P, headmask = _attn_core(
        x, pos_ref[0].astype(jnp.float32), wqk_ref[...], bqk_ref[...],
        wv_ref[...], bv_ref[...], H=H, M=M, bf16=bf16)
    keep_a = _keep_mask(rate_attn, P.shape) if rate_attn > 0.0 else None
    Pd = P * keep_a if keep_a is not None else P
    o_stack = _dot(_cast(Pd, bf16), v, ((1,), (0,)))
    o = _head_collapse(o_stack, H, M8, headmask)
    out = _dot(o, wo_ref[...], ((1,), (0,))) + bo_ref[...]
    keep_o = _keep_mask(rate, out.shape) if rate > 0.0 else None
    res = x + (out * keep_o if keep_o is not None else out)
    _, xhat, inv = _ln_fwd(res, ls_ref[...], lb_ref[...])

    g = g_ref[0].astype(jnp.float32)
    dres, dls, dlb = _ln_bwd(g, xhat, inv, ls_ref[...])
    dout = dres * keep_o if keep_o is not None else dres

    dwo = _dot(o, dout, ((0,), (0,)))            # (E, E)
    dbo = dout.sum(axis=0, keepdims=True)
    do = _dot(dout, wo_ref[...], ((1,), (1,)))   # (M8, E)
    do_stack = _head_stack(do, H, M8, headmask)

    Pd_dt = _cast(Pd, bf16)
    dv = _dot(Pd_dt, do_stack, ((0,), (0,)))     # (M8, E) f32
    dPd = _dot(do_stack, _cast(v, bf16), ((1,), (1,)))  # (H*M8, M8) f32
    dP = dPd * keep_a if keep_a is not None else dPd
    dS = P * (dP - (P * dP).sum(axis=1, keepdims=True))
    dS = dS * (1.0 / math.sqrt(hd))
    dS_dt = _cast(dS, bf16)

    dq_bd = _dot(dS_dt, _cast(k, bf16), ((1,), (0,)))   # (H*M8, E) f32
    dq = _head_collapse(dq_bd, H, M8, headmask)
    dk = _dot(dS_dt, _cast(q_bd, bf16), ((0,), (0,)))   # (M8, E) f32

    dqk = jnp.concatenate([dq, dk], axis=1)      # (M8, 2E) f32
    dqk_dt = _cast(dqk, bf16)
    dwqk = _dot(a_qk, dqk_dt, ((0,), (0,)))
    dbqk = dqk.sum(axis=0, keepdims=True)
    dxa = _dot(dqk_dt, _cast(wqk_ref[...], bf16), ((1,), (1,)))  # (M8, E) f32
    dv_dt = _cast(dv, bf16)
    dwv = _dot(_cast(x, bf16), dv_dt, ((0,), (0,)))
    dbv = dv.sum(axis=0, keepdims=True)
    dxv = _dot(dv_dt, _cast(wv_ref[...], bf16), ((1,), (1,)))

    dx_ref[0] = dres + dxa + dxv

    @pl.when(b == 0)
    def _init():
        dpos_ref[...] = jnp.zeros(dpos_ref.shape, jnp.float32)
        dwqk_ref[...] = jnp.zeros(dwqk_ref.shape, jnp.float32)
        dbqk_ref[...] = jnp.zeros(dbqk_ref.shape, jnp.float32)
        dwv_ref[...] = jnp.zeros(dwv_ref.shape, jnp.float32)
        dbv_ref[...] = jnp.zeros(dbv_ref.shape, jnp.float32)
        dwo_ref[...] = jnp.zeros(dwo_ref.shape, jnp.float32)
        dbo_ref[...] = jnp.zeros(dbo_ref.shape, jnp.float32)
        dls_ref[...] = jnp.zeros(dls_ref.shape, jnp.float32)
        dlb_ref[...] = jnp.zeros(dlb_ref.shape, jnp.float32)

    dpos_ref[0] += dxa
    dwqk_ref[...] += dwqk.astype(jnp.float32)
    dbqk_ref[...] += dbqk
    dwv_ref[...] += dwv.astype(jnp.float32)
    dbv_ref[...] += dbv
    dwo_ref[...] += dwo
    dbo_ref[...] += dbo
    dls_ref[...] += dls
    dlb_ref[...] += dlb


def _ffn_fwd_kernel(seed_ref, x_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                    ls_ref, lb_ref, y_ref, *, rate: float, bf16: bool):
    b = pl.program_id(0)
    x = x_ref[0].astype(jnp.float32)
    if rate > 0.0:
        pltpu.prng_seed(seed_ref[0] + b)
    a = _cast(x, bf16)
    z1 = _cast(_dot(a, _cast(w1_ref[...], bf16), ((1,), (0,))), bf16) + _cast(b1_ref[...], bf16)
    h = jnp.maximum(z1, 0).astype(jnp.float32)
    if rate > 0.0:
        h = h * _keep_mask(rate, h.shape)
    t2 = _dot(h, w2_ref[...], ((1,), (0,))) + b2_ref[...]
    if rate > 0.0:
        t2 = t2 * _keep_mask(rate, t2.shape)
    res = x + t2
    y, _, _ = _ln_fwd(res, ls_ref[...], lb_ref[...])
    y_ref[0] = y


def _ffn_bwd_kernel(seed_ref, x_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                    ls_ref, lb_ref, g_ref,
                    dx_ref, dz1_ref, hd_ref, dt2_ref,
                    dls_ref, dlb_ref, *, rate: float, bf16: bool):
    """dx + LN grads in-kernel; the (E,F)/(F,E) weight grads would need
    8 MB of VMEM accumulators on top of the 8 MB of weights (F=2048
    overflows the 16 MB scoped budget), so the kernel instead emits the
    per-video panels (dz1, dropped-h, dt2) and the wrapper reduces them
    with two MXU matmuls in XLA."""
    b = pl.program_id(0)
    x = x_ref[0].astype(jnp.float32)
    if rate > 0.0:
        pltpu.prng_seed(seed_ref[0] + b)
    a = _cast(x, bf16)
    z1 = _cast(_dot(a, _cast(w1_ref[...], bf16), ((1,), (0,))), bf16) + _cast(b1_ref[...], bf16)
    h = jnp.maximum(z1, 0).astype(jnp.float32)
    keep1 = _keep_mask(rate, h.shape) if rate > 0.0 else None
    hd_ = h * keep1 if keep1 is not None else h
    t2 = _dot(hd_, w2_ref[...], ((1,), (0,))) + b2_ref[...]
    keep2 = _keep_mask(rate, t2.shape) if rate > 0.0 else None
    res = x + (t2 * keep2 if keep2 is not None else t2)
    _, xhat, inv = _ln_fwd(res, ls_ref[...], lb_ref[...])

    g = g_ref[0].astype(jnp.float32)
    dres, dls, dlb = _ln_bwd(g, xhat, inv, ls_ref[...])
    dt2 = dres * keep2 if keep2 is not None else dres
    dhd = _dot(dt2, w2_ref[...], ((1,), (1,)))
    dh = dhd * keep1 if keep1 is not None else dhd
    dz1 = jnp.where(z1.astype(jnp.float32) > 0, dh, 0.0)
    dx_ref[0] = dres + _dot(_cast(dz1, bf16), _cast(w1_ref[...], bf16), ((1,), (1,)))
    dz1_ref[0] = dz1
    hd_ref[0] = hd_
    dt2_ref[0] = dt2

    @pl.when(b == 0)
    def _init():
        dls_ref[...] = jnp.zeros(dls_ref.shape, jnp.float32)
        dlb_ref[...] = jnp.zeros(dlb_ref.shape, jnp.float32)

    dls_ref[...] += dls
    dlb_ref[...] += dlb


# ---------------------------------------------------------------------------
# wrappers (pad M -> M8, custom VJPs)


def _row(v):
    return v.reshape(1, -1)


def _const(shape):
    return pl.BlockSpec(shape, lambda b: (0,) * len(shape))


def _seed_arr(seed):
    if seed is None:
        return jnp.zeros((1,), jnp.int32)
    return seed.reshape((1,)).astype(jnp.int32)


def _seed_ct(seed):
    """float0 cotangent matching an optional (1,)-int32 seed operand."""
    return None if seed is None else np.zeros((1,), jax.dtypes.float0)


def _pad_tokens(x, pos, M8):
    """x: (B, M, E); pos: (1, M, E) — one shared table, not per-video."""
    B, M, E = x.shape
    if M8 != M:
        x = jnp.pad(x, ((0, 0), (0, M8 - M), (0, 0)))
        pos = jnp.pad(pos, ((0, 0), (0, M8 - M), (0, 0)))
    return x, pos


@functools.partial(jax.custom_vjp, nondiff_argnums=(11, 12, 13, 14, 15))
def _sa_vjp(x, pos, wqk, bqk, wv, bv, wo, bo, ln_s, ln_b, seed_t,
            H, rate_attn, rate, bf16, interpret):
    return _sa_fwd_impl(x, pos, wqk, bqk, wv, bv, wo, bo, ln_s, ln_b, seed_t,
                        H, rate_attn, rate, bf16, interpret)


def _sa_fwd_impl(x, pos, wqk, bqk, wv, bv, wo, bo, ln_s, ln_b, seed_t,
                 H, rate_attn, rate, bf16, interpret):
    B, M, E = x.shape
    M8 = _round8(M)
    xp, posp = _pad_tokens(x.astype(jnp.float32), pos.astype(jnp.float32), M8)
    kernel = functools.partial(_sa_fwd_kernel, H=H, M=M,
                               rate_attn=rate_attn, rate=rate, bf16=bf16)
    y = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec((1, M8, E), lambda b: (b, 0, 0)),
                  _const((1, M8, E)),
                  _const((E, 2 * E)), _const((1, 2 * E)),
                  _const((E, E)), _const((1, E)),
                  _const((E, E)), _const((1, E)),
                  _const((1, E)), _const((1, E))],
        out_specs=pl.BlockSpec((1, M8, E), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, M8, E), jnp.float32),
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
    )(_seed_arr(seed_t), xp, posp, wqk, _row(bqk), wv, _row(bv), wo, _row(bo),
      _row(ln_s), _row(ln_b))
    return y[:, :M]


def _sa_fwd(x, pos, wqk, bqk, wv, bv, wo, bo, ln_s, ln_b, seed_t,
            H, rate_attn, rate, bf16, interpret):
    y = _sa_fwd_impl(x, pos, wqk, bqk, wv, bv, wo, bo, ln_s, ln_b, seed_t,
                     H, rate_attn, rate, bf16, interpret)
    return y, (x, pos, wqk, bqk, wv, bv, wo, bo, ln_s, ln_b, seed_t)


def _sa_bwd(H, rate_attn, rate, bf16, interpret, res, g):
    x, pos, wqk, bqk, wv, bv, wo, bo, ln_s, ln_b, seed_t = res
    B, M, E = x.shape
    M8 = _round8(M)
    xp, posp = _pad_tokens(x.astype(jnp.float32), pos.astype(jnp.float32), M8)
    gp = jnp.pad(g.astype(jnp.float32), ((0, 0), (0, M8 - M), (0, 0)))
    kernel = functools.partial(_sa_bwd_kernel, H=H, M=M,
                               rate_attn=rate_attn, rate=rate, bf16=bf16)
    tok = pl.BlockSpec((1, M8, E), lambda b: (b, 0, 0))
    outs = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  tok, _const((1, M8, E)),
                  _const((E, 2 * E)), _const((1, 2 * E)),
                  _const((E, E)), _const((1, E)),
                  _const((E, E)), _const((1, E)),
                  _const((1, E)), _const((1, E)),
                  tok],
        out_specs=[tok, _const((1, M8, E)),
                   _const((E, 2 * E)), _const((1, 2 * E)),
                   _const((E, E)), _const((1, E)),
                   _const((E, E)), _const((1, E)),
                   _const((1, E)), _const((1, E))],
        out_shape=[jax.ShapeDtypeStruct((B, M8, E), jnp.float32),
                   jax.ShapeDtypeStruct((1, M8, E), jnp.float32),
                   jax.ShapeDtypeStruct((E, 2 * E), jnp.float32),
                   jax.ShapeDtypeStruct((1, 2 * E), jnp.float32),
                   jax.ShapeDtypeStruct((E, E), jnp.float32),
                   jax.ShapeDtypeStruct((1, E), jnp.float32),
                   jax.ShapeDtypeStruct((E, E), jnp.float32),
                   jax.ShapeDtypeStruct((1, E), jnp.float32),
                   jax.ShapeDtypeStruct((1, E), jnp.float32),
                   jax.ShapeDtypeStruct((1, E), jnp.float32)],
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
    )(_seed_arr(seed_t), xp, posp, wqk, _row(bqk), wv, _row(bv), wo, _row(bo),
      _row(ln_s), _row(ln_b), gp)
    dx, dpos, dwqk, dbqk, dwv, dbv, dwo, dbo, dls, dlb = outs
    # dpos is accumulated across videos in-kernel -> one (1, M, E) table grad
    return (dx[:, :M].astype(x.dtype), dpos[:, :M].astype(pos.dtype),
            dwqk, dbqk[0], dwv, dbv[0], dwo, dbo[0], dls[0], dlb[0],
            _seed_ct(seed_t))


_sa_vjp.defvjp(_sa_fwd, _sa_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10))
def _ffn_vjp(x, w1, b1, w2, b2, ln_s, ln_b, seed_t, rate, bf16, interpret):
    return _ffn_fwd_impl(x, w1, b1, w2, b2, ln_s, ln_b, seed_t, rate, bf16, interpret)


def _ffn_fwd_impl(x, w1, b1, w2, b2, ln_s, ln_b, seed_t, rate, bf16, interpret):
    B, M, E = x.shape
    F = w1.shape[1]
    M8 = _round8(M)
    xp = jnp.pad(x.astype(jnp.float32), ((0, 0), (0, M8 - M), (0, 0)))
    kernel = functools.partial(_ffn_fwd_kernel, rate=rate, bf16=bf16)
    y = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec((1, M8, E), lambda b: (b, 0, 0)),
                  _const((E, F)), _const((1, F)),
                  _const((F, E)), _const((1, E)),
                  _const((1, E)), _const((1, E))],
        out_specs=pl.BlockSpec((1, M8, E), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, M8, E), jnp.float32),
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
    )(_seed_arr(seed_t), xp, w1, _row(b1), w2, _row(b2), _row(ln_s), _row(ln_b))
    return y[:, :M]


def _ffn_fwd(x, w1, b1, w2, b2, ln_s, ln_b, seed_t, rate, bf16, interpret):
    y = _ffn_fwd_impl(x, w1, b1, w2, b2, ln_s, ln_b, seed_t, rate, bf16, interpret)
    return y, (x, w1, b1, w2, b2, ln_s, ln_b, seed_t)


def _ffn_bwd(rate, bf16, interpret, res, g):
    x, w1, b1, w2, b2, ln_s, ln_b, seed_t = res
    B, M, E = x.shape
    F = w1.shape[1]
    M8 = _round8(M)
    xp = jnp.pad(x.astype(jnp.float32), ((0, 0), (0, M8 - M), (0, 0)))
    gp = jnp.pad(g.astype(jnp.float32), ((0, 0), (0, M8 - M), (0, 0)))
    kernel = functools.partial(_ffn_bwd_kernel, rate=rate, bf16=bf16)
    tok = pl.BlockSpec((1, M8, E), lambda b: (b, 0, 0))
    ftok = pl.BlockSpec((1, M8, F), lambda b: (b, 0, 0))
    outs = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), tok,
                  _const((E, F)), _const((1, F)),
                  _const((F, E)), _const((1, E)),
                  _const((1, E)), _const((1, E)), tok],
        out_specs=[tok, ftok, ftok, tok,
                   _const((1, E)), _const((1, E))],
        out_shape=[jax.ShapeDtypeStruct((B, M8, E), jnp.float32),
                   jax.ShapeDtypeStruct((B, M8, F), jnp.float32),
                   jax.ShapeDtypeStruct((B, M8, F), jnp.float32),
                   jax.ShapeDtypeStruct((B, M8, E), jnp.float32),
                   jax.ShapeDtypeStruct((1, E), jnp.float32),
                   jax.ShapeDtypeStruct((1, E), jnp.float32)],
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
    )(_seed_arr(seed_t), xp, w1, _row(b1), w2, _row(b2), _row(ln_s), _row(ln_b), gp)
    dx, dz1, hd_, dt2, dls, dlb = outs
    # weight grads: two clean MXU matmuls over the emitted panels, at the
    # kernel's exact dtypes.  Padded token rows contribute nothing: dz1/dt2
    # rows are zero there (g is zero-padded), and hd_'s nonzero padded rows
    # (relu(b1)) are annihilated by dt2's zeros in the dw2 contraction.
    if bf16:
        a = xp.astype(jnp.bfloat16)
        dw1 = jax.lax.dot_general(a, dz1.astype(jnp.bfloat16),
                                  (((0, 1), (0, 1)), ((), ())),
                                  preferred_element_type=jnp.float32)
    else:
        dw1 = jax.lax.dot_general(xp, dz1, (((0, 1), (0, 1)), ((), ())),
                                  precision=jax.lax.Precision.HIGHEST,
                                  preferred_element_type=jnp.float32)
    dw2 = jax.lax.dot_general(hd_, dt2, (((0, 1), (0, 1)), ((), ())),
                              precision=jax.lax.Precision.HIGHEST,
                              preferred_element_type=jnp.float32)
    db1 = dz1.sum(axis=(0, 1))
    db2 = dt2.sum(axis=(0, 1))
    return (dx[:, :M].astype(x.dtype), dw1, db1, dw2, db2, dls[0], dlb[0],
            _seed_ct(seed_t))


_ffn_vjp.defvjp(_ffn_fwd, _ffn_bwd)


# ---------------------------------------------------------------------------
# dropout-mask extraction (verification only).  Mirrors the kernels'
# (seed, draw-shape) sequence bit-for-bit so scripts/verify_sa_layer.py can
# build an XLA reference with the exact in-kernel masks — the same pattern
# as dilated_conv.dropout_mask.


def _sa_masks_kernel(seed_ref, ka_ref, ko_ref, *, rate_attn: float, rate: float):
    b = pl.program_id(0)
    pltpu.prng_seed(seed_ref[0] + b)
    if rate_attn > 0.0:
        ka_ref[0] = _keep_mask(rate_attn, ka_ref.shape[1:])
    else:
        ka_ref[0] = jnp.ones(ka_ref.shape[1:], jnp.float32)
    if rate > 0.0:
        ko_ref[0] = _keep_mask(rate, ko_ref.shape[1:])
    else:
        ko_ref[0] = jnp.ones(ko_ref.shape[1:], jnp.float32)


def sa_dropout_masks(seed, B, M, E, H, rate_attn, rate):
    """(keep_attn (B, H*M8, M8), keep_out (B, M8, E)) as the fwd/bwd draw."""
    M8 = _round8(M)
    return pl.pallas_call(
        functools.partial(_sa_masks_kernel, rate_attn=rate_attn, rate=rate),
        grid=(B,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=[pl.BlockSpec((1, H * M8, M8), lambda b: (b, 0, 0)),
                   pl.BlockSpec((1, M8, E), lambda b: (b, 0, 0))],
        out_shape=[jax.ShapeDtypeStruct((B, H * M8, M8), jnp.float32),
                   jax.ShapeDtypeStruct((B, M8, E), jnp.float32)],
    )(_seed_arr(seed))


def ffn_dropout_masks(seed, B, M, E, F, rate):
    """(keep_hidden (B, M8, F), keep_out (B, M8, E)) as the fwd/bwd draw."""
    M8 = _round8(M)

    def kernel(seed_ref, k1_ref, k2_ref):
        b = pl.program_id(0)
        pltpu.prng_seed(seed_ref[0] + b)
        k1_ref[0] = _keep_mask(rate, k1_ref.shape[1:])
        k2_ref[0] = _keep_mask(rate, k2_ref.shape[1:])

    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=[pl.BlockSpec((1, M8, F), lambda b: (b, 0, 0)),
                   pl.BlockSpec((1, M8, E), lambda b: (b, 0, 0))],
        out_shape=[jax.ShapeDtypeStruct((B, M8, F), jnp.float32),
                   jax.ShapeDtypeStruct((B, M8, E), jnp.float32)],
    )(_seed_arr(seed))


# ---------------------------------------------------------------------------
# public API


def sa_sublayer(x, pos, wq, bq, wk, bk, wv, bv, wo, bo, ln_scale, ln_bias, *,
                num_heads: int, rate_attn: float = 0.0, rate: float = 0.0,
                seed=None, bf16: bool = False, interpret: bool = False):
    """Fused self-attention sublayer: LN(x + drop(out_proj(MHA(x+pos, x+pos, x)))).

    x: (B, M, E); pos: (M, E) or (1, M, E), ONE table shared across the
    batch (zero-padded to E by the caller if narrower) — it rides a
    constant-index-map block and its gradient is accumulated in-kernel.
    Weights are the flax Dense (in, out) kernels; ``seed`` is a (1,) int32
    array seeding the in-kernel dropout PRNG (required when a rate > 0).
    """
    if pos.ndim == 2:
        pos = pos[None]
    wqk = jnp.concatenate([wq, wk], axis=1)
    bqk = jnp.concatenate([bq, bk], axis=0)
    return _sa_vjp(x, pos, wqk, bqk, wv, bv, wo, bo, ln_scale, ln_bias, seed,
                   num_heads, float(rate_attn), float(rate), bf16, interpret)


def ffn_sublayer(x, w1, b1, w2, b2, ln_scale, ln_bias, *,
                 rate: float = 0.0, seed=None, bf16: bool = False,
                 interpret: bool = False):
    """Fused FFN sublayer: LN(x + drop(W2 @ drop(relu(W1 @ x + b1)) + b2))."""
    return _ffn_vjp(x, w1, b1, w2, b2, ln_scale, ln_bias, seed,
                    float(rate), bf16, interpret)
