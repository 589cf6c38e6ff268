"""Int8-quantized fused MSTCN tower (inference-only).

The bf16 fused stack (`dilated_conv.py::dilated_residual_stack`) already
runs the towers at the v5e bf16 MXU roofline — the only way past that
ceiling is narrower arithmetic: the v5e MXU executes int8 x int8 -> int32
matmuls at 2x the bf16 rate (394 TOPS vs 197 TFLOP/s).  This kernel keeps
the tower's structure (one halo pad at entry, one slice at exit, extended
inter-layer buffers) but runs the four matmuls per layer — three dilation
taps + the 1x1 conv — on int8 operands:

- **weights**: symmetric per-output-channel (per-tap for the dilated
  conv), quantized on the fly from the live f32/bf16 params with one tiny
  elementwise pass per step (no checkpoint-format change, no extra param
  collections);
- **activations**: dynamic symmetric per-row (per-frame) quantization on
  the VPU inside the kernel — each row's absmax becomes its scale, so the
  dequantization factor of a dot output is the rank-1 outer product
  ``row_scale x col_scale`` and is applied as two cheap broadcasts;
- everything that carries the numerics — bias, ReLU, residual add,
  LayerNorm — stays in f32, and the inter-layer stream keeps the model
  compute dtype, exactly like the bf16 kernel.

Mirrors the reference semantics of fact_clip/models/basic.py:131-220 (the
reference has no quantized path; this is net-new capability).  Inference
only: the rounding step is not differentiated — training always uses the
bf16/f32 stack.  Enable with ``cfg.TPU.quantize_infer = "int8"``.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .dilated_conv import _stack_layout, _tiling


def quantize_weight(w, axis: int = -2):
    """Symmetric per-output-channel int8 weights.

    ``w`` is (..., C_in, C_out); the scale is the absmax over ``axis``
    (C_in), one per output channel (and per leading tap for conv kernels).
    Returns (q, scale) with ``w ~= q * scale * 127`` — the returned scale
    already folds BOTH 1/127 factors (weight and activation), so a dot
    output dequantizes as ``idot * row_absmax * scale``.
    """
    w = w.astype(jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(w), axis=axis, keepdims=True), 1e-12)
    q = jnp.round(w * (127.0 / s)).astype(jnp.int8)
    return q, jnp.squeeze(s, axis=axis) / (127.0 * 127.0)


def quantize_weight_joint(w):
    """Joint-tap per-output-channel int8 conv weights.

    ``w`` is (K, C_in, C_out); ONE scale per output channel across all K
    taps and C_in, so the K tap dot outputs share a dequantization factor
    and can be summed in int32 on the MXU before a single dequant pass —
    the key VPU saving of the ``act_scale="tile"`` path.  Same folded-scale
    convention as ``quantize_weight``.
    """
    w = w.astype(jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(w), axis=(0, 1), keepdims=True), 1e-12)
    q = jnp.round(w * (127.0 / s)).astype(jnp.int8)
    return q, jnp.squeeze(s, axis=(0, 1)) / (127.0 * 127.0)


def dense_q8(x, w, b):
    """Plain-XLA int8 dense for evaluation: dynamic per-row activation
    scales, per-output-channel weight scales, s8 x s8 -> s32 on the MXU.

    Used for the towers' D -> C input projection (`in_map`) — at HAViD
    scale (D=2048) the single largest matmul of the forward — where no
    fusion is needed, so XLA's native int8 dot suffices without a kernel.
    Returns f32 (+ bias), like the f32 dense it replaces.
    """
    qx, s = _quantize_rows(x.astype(jnp.float32))
    wf = w.astype(jnp.float32)
    sw = jnp.maximum(jnp.max(jnp.abs(wf), axis=0, keepdims=True), 1e-12)
    qw = jnp.round(wf * (127.0 / sw)).astype(jnp.int8)
    y = jax.lax.dot_general(
        qx, qw, (((qx.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = y.astype(jnp.float32) * (s / 127.0) * (sw / 127.0)
    return y + b.astype(jnp.float32)


def _quantize_rows(x):
    """Dynamic symmetric per-row int8: returns (q_int8, raw row absmax).

    Rows holding halo garbage (never-written memory) quantize to garbage
    — callers must mask those rows out of the int8 operand afterwards,
    exactly like the bf16 kernel masks its halo reads.
    """
    s = jnp.maximum(jnp.max(jnp.abs(x), axis=-1, keepdims=True), 1e-12)
    q = jnp.round(x * (127.0 / s)).astype(jnp.int8)
    return q, s


def _ln_normalize(out, eps: float, ln_impl: str):
    """In-kernel LayerNorm normalization with a selectable backend-stable
    implementation.

    The Mosaic-vs-interpret hardware check (scripts/verify_quant.py) showed
    LN is the only cross-backend divergence in this kernel: the no-LN path
    is BIT-EXACT across backends at every depth while the LN'd stack
    differs at the ulp level (~1e-7) that requantization amplifies into
    int8 quantum flips at depth (measured round 4, diag_quant_mosaic.py).
    Both implementations were swept on hardware: ``div_sqrt`` (IEEE sqrt +
    true divide) is NOT better than the fused hardware ``rsqrt`` — the ulps
    come from the mean/var reduction order, which no scalar-op choice can
    align across backends — so the default stays on the faster ``rsqrt``
    and the hardware gate uses an f32-relative error model instead of
    bitwise agreement (see scripts/verify_quant.py).
    """
    mean = out.mean(axis=-1, keepdims=True)
    var = ((out - mean) ** 2).mean(axis=-1, keepdims=True)
    if ln_impl == "div_sqrt":
        return (out - mean) / jnp.sqrt(var + eps)
    return (out - mean) * jax.lax.rsqrt(var + eps)


def _stack_kernel_q8(len_ref, x_ref, qwd_ref, swd_ref, bd_ref, qw1_ref, sw1_ref,
                     b1_ref, g_ref, beta_ref, o_ref, *, dilation: int, halo: int,
                     tile: int, use_ln: bool, eps: float, n_tiles: int,
                     ln_impl: str, act_scale: str):
    d, hp = dilation, halo
    b = pl.program_id(0)
    t = pl.program_id(1)

    xw = x_ref[0, :, :].astype(jnp.float32)  # (tile + 2*halo, C)
    row = jax.lax.broadcasted_iota(jnp.int32, (tile, 1), 0)
    pos = t * tile + row

    if act_scale == "tile":
        # ONE scalar activation scale for the window; with joint-tap weight
        # scales the three tap dots share a dequant factor, so they sum in
        # int32 on the MXU and dequantize in a single pass — the per-row
        # path below spends ~12 broadcast passes on the same work and is
        # VPU-bound (BASELINE.md int8 section)
        wrow = jax.lax.broadcasted_iota(jnp.int32, (tile + 2 * hp, 1), 0)
        wpos = t * tile - hp + wrow  # absolute time of each window row
        valid = (wpos >= 0) & (wpos < n_tiles * tile)
        xm = jnp.where(valid, xw, 0.0)  # zeroes halo garbage AND conv pad
        s_x = jnp.maximum(jnp.max(jnp.abs(xm)), 1e-12)
        qx = jnp.round(xm * (127.0 / s_x)).astype(jnp.int8)

        acc = jnp.dot(qx[hp - d : hp - d + tile], qwd_ref[0],
                      preferred_element_type=jnp.int32)
        acc += jnp.dot(qx[hp : hp + tile], qwd_ref[1],
                       preferred_element_type=jnp.int32)
        acc += jnp.dot(qx[hp + d : hp + d + tile], qwd_ref[2],
                       preferred_element_type=jnp.int32)
        # swd is the joint (C,) scale (quantize_weight_joint)
        acc = acc.astype(jnp.float32) * (s_x * swd_ref[0][None, :])
        acc = jax.nn.relu(acc + bd_ref[:].astype(jnp.float32))

        s_a = jnp.maximum(jnp.max(jnp.abs(acc)), 1e-12)
        qa = jnp.round(acc * (127.0 / s_a)).astype(jnp.int8)
        out = jnp.dot(qa, qw1_ref[:], preferred_element_type=jnp.int32)
        out = out.astype(jnp.float32) * (s_a * sw1_ref[:][None, :])
        out = out + b1_ref[:].astype(jnp.float32)
        mid_f = xw[hp : hp + tile, :]
        out = out + mid_f
    else:
        # per-row scales: quantize the whole VMEM window once; the three
        # taps are row-shifted static slices of the same int8 buffer
        qx, sx = _quantize_rows(xw)

        q_left = qx[hp - d : hp - d + tile, :]
        q_mid = qx[hp : hp + tile, :]
        q_right = qx[hp + d : hp + d + tile, :]
        s_left = sx[hp - d : hp - d + tile, :]
        s_mid = sx[hp : hp + tile, :]
        s_right = sx[hp + d : hp + d + tile, :]

        # edge reads into unwritten halo garbage: zero the int8 rows whose
        # absolute center-time falls outside [0, T_pad) (conv SAME zero pad);
        # absolute conditions — with dilation > tile the garbage spans tiles
        zero8 = jnp.zeros((), jnp.int8)
        q_left = jnp.where(pos < d, zero8, q_left)
        q_right = jnp.where(pos >= n_tiles * tile - d, zero8, q_right)
        # ... and their row scales: garbage rows quantize to garbage scales,
        # and NaN * zeroed-int8-dot is still NaN in the dequant multiply
        s_left = jnp.where(pos < d, 0.0, s_left)
        s_right = jnp.where(pos >= n_tiles * tile - d, 0.0, s_right)

        acc = jnp.dot(q_left, qwd_ref[0], preferred_element_type=jnp.int32)
        acc = acc.astype(jnp.float32) * s_left * swd_ref[0][None, :]
        a1 = jnp.dot(q_mid, qwd_ref[1], preferred_element_type=jnp.int32)
        acc += a1.astype(jnp.float32) * s_mid * swd_ref[1][None, :]
        a2 = jnp.dot(q_right, qwd_ref[2], preferred_element_type=jnp.int32)
        acc += a2.astype(jnp.float32) * s_right * swd_ref[2][None, :]
        acc = jax.nn.relu(acc + bd_ref[:].astype(jnp.float32))

        qa, sa = _quantize_rows(acc)
        out = jnp.dot(qa, qw1_ref[:], preferred_element_type=jnp.int32)
        out = out.astype(jnp.float32) * sa * sw1_ref[:][None, :]
        out = out + b1_ref[:].astype(jnp.float32)
        mid_f = xw[hp : hp + tile, :]
        out = out + mid_f

    if use_ln:
        out = _ln_normalize(out, eps, ln_impl)
        out = out * g_ref[:].astype(jnp.float32) + beta_ref[:].astype(jnp.float32)

    # write-mask: padded frames stay zero in the inter-layer buffer
    mask = ((t * tile + row) < len_ref[b]).astype(jnp.float32)
    o_ref[0, :, :] = (out * mask).astype(o_ref.dtype)


def _stack_layer_q8(x_ext, lengths, qwd, swd, bd, qw1, sw1, b1, gamma, beta, *,
                    dilation: int, halo_max: int, tile: int, n_tiles: int,
                    use_ln: bool, eps: float, interpret: bool, ln_impl: str,
                    act_scale: str):
    """One quantized layer on the extended buffer (same layout contract as
    dilated_conv._stack_layer: read window spans only this layer's halo,
    output halo regions are never written)."""
    B, T_ext, C = x_ext.shape
    halo_d = -(-dilation // 8) * 8
    off = halo_max - halo_d
    assert halo_max % tile == 0
    kernel = functools.partial(
        _stack_kernel_q8, dilation=dilation, halo=halo_d, tile=tile,
        use_ln=use_ln, eps=eps, n_tiles=n_tiles, ln_impl=ln_impl,
        act_scale=act_scale,
    )
    return pl.pallas_call(
        kernel,
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (pl.Element(1), pl.Element(tile + 2 * halo_d), pl.Element(C)),
                lambda b, t: (b, (t * (tile // 8) + off // 8) * 8, 0),
            ),
            pl.BlockSpec((3, C, C), lambda b, t: (0, 0, 0)),
            pl.BlockSpec((3, C), lambda b, t: (0, 0)),
            pl.BlockSpec((C,), lambda b, t: (0,)),
            pl.BlockSpec((C, C), lambda b, t: (0, 0)),
            pl.BlockSpec((C,), lambda b, t: (0,)),
            pl.BlockSpec((C,), lambda b, t: (0,)),
            pl.BlockSpec((C,), lambda b, t: (0,)),
            pl.BlockSpec((C,), lambda b, t: (0,)),
        ],
        out_specs=pl.BlockSpec((1, tile, C), lambda b, t: (b, t + halo_max // tile, 0)),
        out_shape=jax.ShapeDtypeStruct((B, T_ext, C), x_ext.dtype),
        interpret=interpret,
    )(lengths, x_ext, qwd, swd, bd, qw1, sw1, b1, gamma, beta)


def dilated_residual_stack_q8(x, mask, layers, dilations, *, use_ln: bool = True,
                              eps: float = 1e-5, tile: int = 512,
                              interpret: bool = False, ln_impl: str = "rsqrt",
                              act_scale: str = "tile"):
    """Int8 fused MSTCN tower: N quantized dilated-residual layers, one pad,
    one slice.  Same signature contract as ``dilated_residual_stack`` minus
    dropout (inference-only path — eval never drops).

    x: (B, T, C); mask: (B, T) bool; layers: sequence of parameter tuples
    (wd, bd, w1, b1, gamma, beta) in f32/bf16 — weights are quantized here,
    per step, with one tiny elementwise pass each.

    act_scale: "tile" (default) = one scalar activation scale per VMEM
    window + joint-tap weight scales (int32 tap accumulation, single
    dequant pass — the fast path); "row" = per-frame scales + per-tap
    weight scales (slightly finer quantization, ~12 extra VPU passes per
    layer; the round-3 formulation, kept for comparison).
    """
    B, T, C = x.shape
    dilations = tuple(int(d) for d in dilations)
    tile, n_tiles, T_pad, halo = _stack_layout(T, dilations, tile)

    xm = x * mask[:, :, None].astype(x.dtype)
    x_ext = jnp.pad(xm, ((0, 0), (halo, halo + (T_pad - T)), (0, 0)))
    lengths = mask.astype(jnp.int32).sum(axis=1)

    for (wd, bd, w1, b1, gamma, beta), d in zip(layers, dilations):
        if act_scale == "tile":
            qwd, sj = quantize_weight_joint(wd)  # (3,C,C) int8, (C,) joint
            swd = jnp.stack([sj, sj, sj])  # kernel reads row 0
        else:
            qwd, swd = quantize_weight(wd)  # (3,C,C) int8, (3,C)
        qw1, sw1 = quantize_weight(w1)  # (C,C) int8, (C,)
        x_ext = _stack_layer_q8(
            x_ext, lengths, qwd, swd, bd, qw1, sw1, b1,
            gamma if gamma is not None else jnp.ones((C,), jnp.float32),
            beta if beta is not None else jnp.zeros((C,), jnp.float32),
            dilation=d, halo_max=halo, tile=tile, n_tiles=n_tiles,
            use_ln=use_ln, eps=eps, interpret=interpret, ln_impl=ln_impl,
            act_scale=act_scale,
        )
    return x_ext[:, halo : halo + T]


# ---------------------------------------------------------------------------
# MS-TCN++ (dual-dilation) int8 tower.  Per layer
# (dilated_conv.py::_stack2_kernel, reference basic.py:222-281):
#   f = relu(concat[conv_{d1}(f*m), conv_{d2}(f*m)] @ Wf + bf) + f
# Eight int8 MXU dots per layer: two 3-tap convs + the split fuse matmuls
# (the (tile, 2C) concat never materializes, same as the bf16 kernel).


def _stack2_kernel_q8(len_ref, x_ref, qk1_ref, sk1_ref, b1_ref, qk2_ref, sk2_ref,
                      b2_ref, qwt_ref, swt_ref, qwb_ref, swb_ref, bf_ref, o_ref, *,
                      d1: int, d2: int, halo: int, tile: int, n_tiles: int,
                      act_scale: str):
    hp = halo
    b = pl.program_id(0)
    t = pl.program_id(1)
    xw = x_ref[0, :, :].astype(jnp.float32)
    mid_f = xw[hp : hp + tile, :]
    row = jax.lax.broadcasted_iota(jnp.int32, (tile, 1), 0)
    pos = t * tile + row
    zero8 = jnp.zeros((), jnp.int8)

    if act_scale == "tile":
        # scalar window scale + joint-tap weight scales: int32 tap
        # accumulation, one dequant pass per conv (see _stack_kernel_q8)
        wrow = jax.lax.broadcasted_iota(jnp.int32, (tile + 2 * hp, 1), 0)
        wpos = t * tile - hp + wrow
        valid = (wpos >= 0) & (wpos < n_tiles * tile)
        xm = jnp.where(valid, xw, 0.0)
        s_x = jnp.maximum(jnp.max(jnp.abs(xm)), 1e-12)
        qx = jnp.round(xm * (127.0 / s_x)).astype(jnp.int8)

        def conv3_q8(qk_ref, sk_ref, b_ref, d):
            acc = jnp.dot(qx[hp - d : hp - d + tile], qk_ref[0],
                          preferred_element_type=jnp.int32)
            acc += jnp.dot(qx[hp : hp + tile], qk_ref[1],
                           preferred_element_type=jnp.int32)
            acc += jnp.dot(qx[hp + d : hp + d + tile], qk_ref[2],
                           preferred_element_type=jnp.int32)
            acc = acc.astype(jnp.float32) * (s_x * sk_ref[0][None, :])
            return acc + b_ref[:].astype(jnp.float32)

        c1 = conv3_q8(qk1_ref, sk1_ref, b1_ref, d1)
        c2 = conv3_q8(qk2_ref, sk2_ref, b2_ref, d2)
        s1 = jnp.maximum(jnp.max(jnp.abs(c1)), 1e-12)
        s2 = jnp.maximum(jnp.max(jnp.abs(c2)), 1e-12)
        qc1 = jnp.round(c1 * (127.0 / s1)).astype(jnp.int8)
        qc2 = jnp.round(c2 * (127.0 / s2)).astype(jnp.int8)
        h = jnp.dot(qc1, qwt_ref[:], preferred_element_type=jnp.int32)
        h = h.astype(jnp.float32) * (s1 * swt_ref[:][None, :])
        h2 = jnp.dot(qc2, qwb_ref[:], preferred_element_type=jnp.int32)
        h += h2.astype(jnp.float32) * (s2 * swb_ref[:][None, :])
        h = jax.nn.relu(h + bf_ref[:].astype(jnp.float32))
        mask = ((t * tile + row) < len_ref[b]).astype(jnp.float32)
        o_ref[0, :, :] = ((h + mid_f) * mask).astype(o_ref.dtype)
        return

    qx, sx = _quantize_rows(xw)

    def conv3_q8(qk_ref, sk_ref, b_ref, d):
        q_left = jnp.where(pos < d, zero8, qx[hp - d : hp - d + tile, :])
        q_mid = qx[hp : hp + tile, :]
        q_right = jnp.where(pos >= n_tiles * tile - d, zero8,
                            qx[hp + d : hp + d + tile, :])
        s_left = jnp.where(pos < d, 0.0, sx[hp - d : hp - d + tile, :])
        s_mid = sx[hp : hp + tile, :]
        s_right = jnp.where(pos >= n_tiles * tile - d, 0.0,
                            sx[hp + d : hp + d + tile, :])
        acc = jnp.dot(q_left, qk_ref[0], preferred_element_type=jnp.int32)
        acc = acc.astype(jnp.float32) * s_left * sk_ref[0][None, :]
        a1 = jnp.dot(q_mid, qk_ref[1], preferred_element_type=jnp.int32)
        acc += a1.astype(jnp.float32) * s_mid * sk_ref[1][None, :]
        a2 = jnp.dot(q_right, qk_ref[2], preferred_element_type=jnp.int32)
        acc += a2.astype(jnp.float32) * s_right * sk_ref[2][None, :]
        return acc + b_ref[:].astype(jnp.float32)

    c1 = conv3_q8(qk1_ref, sk1_ref, b1_ref, d1)
    c2 = conv3_q8(qk2_ref, sk2_ref, b2_ref, d2)
    qc1, sc1 = _quantize_rows(c1)
    qc2, sc2 = _quantize_rows(c2)
    h = jnp.dot(qc1, qwt_ref[:], preferred_element_type=jnp.int32)
    h = h.astype(jnp.float32) * sc1 * swt_ref[:][None, :]
    h2 = jnp.dot(qc2, qwb_ref[:], preferred_element_type=jnp.int32)
    h += h2.astype(jnp.float32) * sc2 * swb_ref[:][None, :]
    h = jax.nn.relu(h + bf_ref[:].astype(jnp.float32))

    mask = ((t * tile + row) < len_ref[b]).astype(jnp.float32)
    o_ref[0, :, :] = ((h + mid_f) * mask).astype(o_ref.dtype)


def _stack2_layer_q8(x_ext, lengths, qparams, *, d1: int, d2: int, halo_max: int,
                     tile: int, n_tiles: int, interpret: bool, act_scale: str):
    qk1, sk1, b1, qk2, sk2, b2, qwt, swt, qwb, swb, bf = qparams
    B, T_ext, C = x_ext.shape
    halo_d = -(-max(d1, d2) // 8) * 8
    off = halo_max - halo_d
    assert halo_max % tile == 0
    kernel = functools.partial(
        _stack2_kernel_q8, d1=d1, d2=d2, halo=halo_d, tile=tile, n_tiles=n_tiles,
        act_scale=act_scale,
    )
    return pl.pallas_call(
        kernel,
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (pl.Element(1), pl.Element(tile + 2 * halo_d), pl.Element(C)),
                lambda b, t: (b, (t * (tile // 8) + off // 8) * 8, 0),
            ),
            pl.BlockSpec((3, C, C), lambda b, t: (0, 0, 0)),
            pl.BlockSpec((3, C), lambda b, t: (0, 0)),
            pl.BlockSpec((C,), lambda b, t: (0,)),
            pl.BlockSpec((3, C, C), lambda b, t: (0, 0, 0)),
            pl.BlockSpec((3, C), lambda b, t: (0, 0)),
            pl.BlockSpec((C,), lambda b, t: (0,)),
            pl.BlockSpec((C, C), lambda b, t: (0, 0)),
            pl.BlockSpec((C,), lambda b, t: (0,)),
            pl.BlockSpec((C, C), lambda b, t: (0, 0)),
            pl.BlockSpec((C,), lambda b, t: (0,)),
            pl.BlockSpec((C,), lambda b, t: (0,)),
        ],
        out_specs=pl.BlockSpec((1, tile, C), lambda b, t: (b, t + halo_max // tile, 0)),
        out_shape=jax.ShapeDtypeStruct((B, T_ext, C), x_ext.dtype),
        interpret=interpret,
    )(lengths, x_ext, qk1, sk1, b1, qk2, sk2, b2, qwt, swt, qwb, swb, bf)


def dilated_residual2_stack_q8(x, mask, layers, dil_pairs, *, tile: int = 512,
                               interpret: bool = False, act_scale: str = "tile"):
    """Int8 fused MS-TCN++ tower (inference-only).  layers: (k1, b1, k2, b2,
    wf_top, wf_bot, bf) per layer, exactly the bf16 kernel's split-fuse
    layout; dil_pairs: (d1, d2) per layer.  act_scale as in
    ``dilated_residual_stack_q8``."""
    B, T, C = x.shape
    dil_pairs = tuple((int(a), int(b)) for a, b in dil_pairs)
    _, tile, n_tiles = _tiling(T, tile, 1)
    T_pad = n_tiles * tile
    halo_req = -(-max(max(p) for p in dil_pairs) // 8) * 8
    halo = -(-halo_req // tile) * tile

    xm = x * mask[:, :, None].astype(x.dtype)
    x_ext = jnp.pad(xm, ((0, 0), (halo, halo + (T_pad - T)), (0, 0)))
    lengths = mask.astype(jnp.int32).sum(axis=1)

    for (k1, b1, k2, b2, wt, wb, bf), (d1, d2) in zip(layers, dil_pairs):
        if act_scale == "tile":
            qk1, s1 = quantize_weight_joint(k1)
            sk1 = jnp.stack([s1, s1, s1])
            qk2, s2 = quantize_weight_joint(k2)
            sk2 = jnp.stack([s2, s2, s2])
        else:
            qk1, sk1 = quantize_weight(k1)
            qk2, sk2 = quantize_weight(k2)
        qwt, swt = quantize_weight(wt)
        qwb, swb = quantize_weight(wb)
        x_ext = _stack2_layer_q8(
            x_ext, lengths, (qk1, sk1, b1, qk2, sk2, b2, qwt, swt, qwb, swb, bf),
            d1=d1, d2=d2, halo_max=halo, tile=tile, n_tiles=n_tiles,
            interpret=interpret, act_scale=act_scale,
        )
    return x_ext[:, halo : halo + T]


# ---------------------------------------------------------------------------
# X2Y cross-attention with int8 frame-side projections (eval-only forward).
# Mirrors x2y_attn.py's two formulations; only the projections over the
# LARGE axis go int8 (flash: xk/xv over frames; small-X: yq over frames) —
# the logits/softmax/attend math is unchanged, so probs/logits keep the
# fidelity the losses and the two-branch decode rely on.

_NEG = -1e9


def _x2y_flash_kernel_q8(xlen_ref, x_ref, xpos_ref, yq_ref, qwk_ref, swk_ref,
                         bk_ref, qwv_ref, swv_ref, bv_ref, logits_ref, attn_ref,
                         m_scr, l_scr, acc_scr, *, scale: float, tile: int, n_t: int):
    b = pl.program_id(0)
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    xk_in = x_ref[0].astype(jnp.float32) + xpos_ref[0].astype(jnp.float32)
    qk, sk = _quantize_rows(xk_in)
    xk = jnp.dot(qk, qwk_ref[:], preferred_element_type=jnp.int32)
    xk = xk.astype(jnp.float32) * sk * swk_ref[:][None, :] + bk_ref[:].astype(jnp.float32)
    qv, sv = _quantize_rows(x_ref[0].astype(jnp.float32))
    xv = jnp.dot(qv, qwv_ref[:], preferred_element_type=jnp.int32)
    xv = xv.astype(jnp.float32) * sv * swv_ref[:][None, :] + bv_ref[:].astype(jnp.float32)

    logits = jax.lax.dot_general(
        yq_ref[0], xk.astype(yq_ref.dtype),
        (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
    ) * scale  # (M, tile)
    col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1) + t * tile
    logits = jnp.where(col < xlen_ref[b], logits, _NEG)
    logits_ref[0, :, :] = logits.astype(logits_ref.dtype)

    m_prev = m_scr[:, 0]
    m_new = jnp.maximum(m_prev, logits.max(axis=-1))
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(logits - m_new[:, None])
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


def _x2y_flash_q8_impl(x, x_pos, yq, qwk, swk, bk, qwv, swv, bv, x_len, *,
                       tile: int, interpret: bool):
    B, X, Cx = x.shape
    M, d = yq.shape[1], yq.shape[2]
    tile = min(tile, max(-(-X // 128) * 128, 128))
    n_t = pl.cdiv(X, tile)
    X_pad = n_t * tile
    if X_pad != X:
        x = jnp.pad(x, ((0, 0), (0, X_pad - X), (0, 0)))
        x_pos = jnp.pad(x_pos, ((0, 0), (0, X_pad - X), (0, 0)))
    pos_b = 0 if x_pos.shape[0] == 1 else None
    kernel = functools.partial(_x2y_flash_kernel_q8, scale=1.0 / math.sqrt(d),
                               tile=tile, n_t=n_t)
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
            pl.BlockSpec((d,), lambda b, t: (0,)),
            pl.BlockSpec((Cx, d), lambda b, t: (0, 0)),
            pl.BlockSpec((d,), lambda b, t: (0,)),
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
    )(x_len, x, x_pos, yq, qwk, swk, bk, qwv, swv, bv)
    logits = logits[:, :, :X]
    probs = jax.nn.softmax(logits, axis=-1)
    return attn, probs, logits


def _x2y_small_x_kernel_q8(xlen_ref, y_ref, ypos_ref, xk_ref, xv_ref, qwq_ref,
                           swq_ref, bq_ref, attn_ref, probs_ref, logits_ref, *,
                           scale: float, tile: int):
    b = pl.program_id(0)
    yq_in = y_ref[0].astype(jnp.float32) + ypos_ref[0].astype(jnp.float32)
    qy, sy = _quantize_rows(yq_in)
    yq = jnp.dot(qy, qwq_ref[:], preferred_element_type=jnp.int32)
    yq = yq.astype(jnp.float32) * sy * swq_ref[:][None, :] + bq_ref[:].astype(jnp.float32)

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


def _x2y_small_x_q8_impl(y_in, y_pos, xk, xv, qwq, swq, bq, x_len, *,
                         tile: int, interpret: bool):
    B, Y, Cy = y_in.shape
    X, d = xk.shape[1], xk.shape[2]
    tile = min(tile, max(-(-Y // 8) * 8, 8))
    n_t = pl.cdiv(Y, tile)
    pos_b = 0 if y_pos.shape[0] == 1 else None
    kernel = functools.partial(_x2y_small_x_kernel_q8, scale=1.0 / math.sqrt(d), tile=tile)
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
    )(x_len, y_in, y_pos, xk, xv, qwq, swq, bq)
    return attn, probs, logits


def x2y_attention_q8(y_in, y_pos, x_in, x_pos_k, wk, bk, wv, bv, wq, bq, x_len, *,
                     tile: int = 512, interpret: bool = False):
    """Quantized-projection X2Y attention (same contract as
    x2y_attn.py::x2y_attention, eval-only — not differentiated).

    Only the projection over the large axis runs int8; the small-axis
    projection (a (B, M, d)-sized matmul) stays dense at full precision.
    """
    X = x_in.shape[1]
    if X > 1024:
        yq = jnp.einsum("byc,cd->byd", (y_in + y_pos).astype(wq.dtype), wq)
        yq = yq.astype(jnp.float32) + bq
        qwk, swk = quantize_weight(wk)
        qwv, swv = quantize_weight(wv)
        return _x2y_flash_q8_impl(x_in, x_pos_k, yq.astype(x_in.dtype), qwk, swk, bk,
                                  qwv, swv, bv, x_len, tile=tile, interpret=interpret)
    xk = jnp.einsum("bxc,cd->bxd", (x_in + x_pos_k).astype(wk.dtype), wk)
    xk = (xk.astype(jnp.float32) + bk).astype(x_in.dtype)
    xv = jnp.einsum("bxc,cd->bxd", x_in.astype(wv.dtype), wv)
    xv = (xv.astype(jnp.float32) + bv).astype(x_in.dtype)
    qwq, swq = quantize_weight(wq)
    return _x2y_small_x_q8_impl(y_in, y_pos, xk, xv, qwq, swq, bq, x_len,
                                tile=tile, interpret=interpret)


# ---------------------------------------------------------------------------
# SCA multi-head cross-attention with int8 K/V projections (eval-only
# forward).  Twin of mha_attn.py::_mha_kernel at rate=0 without the
# backward's (m, l) stat outputs; the full-width lane-masked query form and
# the online softmax are unchanged (see mha_attn.py's module docstring for
# the layout rationale).

from .mha_attn import (  # noqa: E402
    _arrange_queries,
    _extract_diag,
    _pick_tile,
    _round8,
)


def _mha_kernel_q8(xlen_ref, x_ref, xpos_ref, q_ref, qwk_ref, swk_ref, bk_ref,
                   qwv_ref, swv_ref, bv_ref, out_ref, m_scr, l_scr, acc_scr, *,
                   tile: int, n_t: int):
    b = pl.program_id(0)
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    xk_in = x_ref[0].astype(jnp.float32) + xpos_ref[0].astype(jnp.float32)
    qk, sk = _quantize_rows(xk_in)
    k = jnp.dot(qk, qwk_ref[:], preferred_element_type=jnp.int32)
    k = k.astype(jnp.float32) * sk * swk_ref[:][None, :] + bk_ref[:].astype(jnp.float32)
    qv, sv = _quantize_rows(x_ref[0].astype(jnp.float32))
    v = jnp.dot(qv, qwv_ref[:], preferred_element_type=jnp.int32)
    v = v.astype(jnp.float32) * sv * swv_ref[:][None, :] + bv_ref[:].astype(jnp.float32)
    k = k.astype(q_ref.dtype)
    v = v.astype(q_ref.dtype)

    logits = jax.lax.dot_general(
        q_ref[0], k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
    )  # (H*M8, tile)
    col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1) + t * tile
    logits = jnp.where(col < xlen_ref[b], logits, _NEG)

    m_prev = m_scr[:, 0]
    m_new = jnp.maximum(m_prev, logits.max(axis=-1))
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(logits - m_new[:, None])  # (H*M8, tile)
    l_scr[:, 0] = l_scr[:, 0] * alpha + p.sum(axis=-1)
    acc_scr[...] = acc_scr[...] * alpha[:, None] + jnp.dot(
        p.astype(v.dtype), v, preferred_element_type=jnp.float32
    )
    m_scr[:, 0] = m_new

    @pl.when(t == n_t - 1)
    def _finish():
        out_ref[0, :, :] = (
            acc_scr[...] / jnp.maximum(l_scr[:, 0], 1e-30)[:, None]
        ).astype(out_ref.dtype)


def mha_cross_attention_q8(q, x_in, x_pos_k, wk, bk, wv, bv, x_len, *,
                           num_heads: int, tile: int = 512, interpret: bool = False):
    """Quantized-projection twin of mha_attn.py::mha_cross_attention
    (eval-only — no dropout, not differentiated).  Same contract: q is
    (B, M, E) projected queries, returns (B, M, E) f32 per-head outputs."""
    if x_pos_k.ndim == 2:
        x_pos_k = x_pos_k[None]
    B, X, Cx = x_in.shape
    M, E = q.shape[1], wk.shape[1]
    M8 = _round8(M)
    HM8 = num_heads * M8
    tile = _pick_tile(tile, X, HM8, E)
    n_t = pl.cdiv(X, tile)
    X_pad = n_t * tile
    if X_pad != X:
        x_in = jnp.pad(x_in, ((0, 0), (0, X_pad - X), (0, 0)))
        x_pos_k = jnp.pad(x_pos_k, ((0, 0), (0, X_pad - X), (0, 0)))
    pos_b = 0 if x_pos_k.shape[0] == 1 else None
    qh = _arrange_queries(q, num_heads)
    qwk, swk = quantize_weight(wk)
    qwv, swv = quantize_weight(wv)
    kernel = functools.partial(_mha_kernel_q8, tile=tile, n_t=n_t)
    out = pl.pallas_call(
        kernel,
        grid=(B, n_t),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, tile, Cx), lambda b, t: (b, t, 0)),
            pl.BlockSpec((1, tile, Cx), lambda b, t, pb=pos_b: (pb if pb is not None else b, t, 0)),
            pl.BlockSpec((1, HM8, E), lambda b, t: (b, 0, 0)),
            pl.BlockSpec((Cx, E), lambda b, t: (0, 0)),
            pl.BlockSpec((E,), lambda b, t: (0,)),
            pl.BlockSpec((E,), lambda b, t: (0,)),
            pl.BlockSpec((Cx, E), lambda b, t: (0, 0)),
            pl.BlockSpec((E,), lambda b, t: (0,)),
            pl.BlockSpec((E,), lambda b, t: (0,)),
        ],
        out_specs=pl.BlockSpec((1, HM8, E), lambda b, t: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, HM8, E), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((HM8, 1), jnp.float32),
            pltpu.VMEM((HM8, 1), jnp.float32),
            pltpu.VMEM((HM8, E), jnp.float32),
        ],
        interpret=interpret,
    )(x_len, x_in, x_pos_k, qh, qwk, swk, bk, qwv, swv, bv)
    return _extract_diag(out, num_heads, M)
