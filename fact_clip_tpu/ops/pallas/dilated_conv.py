"""Fused dilated-residual-layer Pallas kernel.

One DilatedResidualLayer (models/layers.py, mirroring the reference's
basic.py:131-171) is five HBM round trips under naive lowering:
dilated conv3 -> ReLU -> 1x1 conv -> dropout -> residual add -> LayerNorm.
This kernel keeps a time tile plus its dilation halo in VMEM and does all
stages in one pass: the k=3 dilated conv is three shifted (TT, C) @ (C, C)
MXU matmuls, the 1x1 conv a fourth, with the VPU handling
ReLU/dropout/residual/LayerNorm — ~2 HBM touches per element instead of ~10.

Dropout runs *inside* the kernel from the on-core PRNG
(``pltpu.prng_seed`` / ``pltpu.prng_random_bits``), so training recipes with
dropout > 0 stay on the fused path with zero extra HBM traffic for the mask.
The backward pass regenerates the identical mask with a tiny mask-only
kernel seeded the same per-(batch, tile) way (``dropout_mask``) — the bits
are a pure function of (seed, grid cell, shape), never stored.

Overlapping halo windows use ``pl.Element`` block dims (elementwise start
indices); x is pre-padded by ``dilation`` zeros on both time ends with one
XLA pad so every window is in-bounds and sequence-edge semantics match a
dense SAME conv.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _keep_mask(rate: float, shape):
    """Scaled keep mask from the (already seeded) on-core PRNG.

    keep probability = 1-rate; kept elements scaled by 1/(1-rate), exactly
    torch/flax inverted-dropout semantics.
    """
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    threshold = np.uint32(min(int((1.0 - rate) * 2.0**32), 2**32 - 1))
    keep = bits < threshold
    return jnp.where(keep, 1.0 / (1.0 - rate), 0.0).astype(jnp.float32)


def _seed_cell(seed_ref, n_tiles: int):
    """Seed the PRNG uniquely per (batch, tile) grid cell."""
    b = pl.program_id(0)
    t = pl.program_id(1)
    pltpu.prng_seed(seed_ref[0] + b * n_tiles + t)


def _kernel(seed_ref, x_ref, wd_ref, bd_ref, w1_ref, b1_ref, g_ref, beta_ref, o_ref, *,
            dilation: int, halo: int, tile: int, use_ln: bool, eps: float,
            rate: float, n_tiles: int):
    d, hp = dilation, halo
    # x_ref window: (1, tile + 2*halo, C); halo >= d keeps the window 8-aligned
    left = x_ref[0, hp - d : hp - d + tile, :]
    mid = x_ref[0, hp : hp + tile, :]
    right = x_ref[0, hp + d : hp + d + tile, :]

    acc = jnp.dot(left, wd_ref[0], preferred_element_type=jnp.float32)
    acc += jnp.dot(mid, wd_ref[1], preferred_element_type=jnp.float32)
    acc += jnp.dot(right, wd_ref[2], preferred_element_type=jnp.float32)
    acc = jax.nn.relu(acc + bd_ref[:].astype(jnp.float32))

    out = jnp.dot(acc.astype(mid.dtype), w1_ref[:], preferred_element_type=jnp.float32)
    out = out + b1_ref[:].astype(jnp.float32)
    if rate > 0.0:
        _seed_cell(seed_ref, n_tiles)
        out = out * _keep_mask(rate, out.shape)
    out = out + mid.astype(jnp.float32)

    if use_ln:
        mean = out.mean(axis=-1, keepdims=True)
        var = ((out - mean) ** 2).mean(axis=-1, keepdims=True)
        out = (out - mean) * jax.lax.rsqrt(var + eps)
        out = out * g_ref[:].astype(jnp.float32) + beta_ref[:].astype(jnp.float32)

    o_ref[0, :, :] = out.astype(o_ref.dtype)


def _mask_kernel(seed_ref, o_ref, *, rate: float, n_tiles: int):
    _seed_cell(seed_ref, n_tiles)
    o_ref[0, :, :] = _keep_mask(rate, o_ref.shape[1:])


def _tiling(T: int, tile: int, dilation: int):
    halo = -(-dilation // 8) * 8  # 8-aligned halo so the VMEM window tiles cleanly
    tile = min(tile, max(-(-T // 8) * 8, 8))
    n_tiles = pl.cdiv(T, tile)
    return halo, tile, n_tiles


@functools.partial(jax.jit, static_argnames=("shape", "rate", "tile", "interpret"))
def dropout_mask(seed, shape, rate: float, tile: int = 512, interpret: bool = False):
    """Regenerate the exact scaled dropout mask the fused forward used.

    ``shape`` is the (B, T, C) of the layer input; seeding and the per-cell
    ``prng_random_bits`` call mirror ``_kernel`` bit-for-bit, so this is the
    same mask — recomputed, never materialized by the forward.
    """
    B, T, C = shape
    _, tile, n_tiles = _tiling(T, tile, 1)
    T_pad = n_tiles * tile
    kernel = functools.partial(_mask_kernel, rate=rate, n_tiles=n_tiles)
    out = pl.pallas_call(
        kernel,
        grid=(B, n_tiles),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((1, tile, C), lambda b, t: (b, t, 0)),
        out_shape=jax.ShapeDtypeStruct((B, T_pad, C), jnp.float32),
        interpret=interpret,
    )(seed)
    return out[:, :T]


def dilated_residual_layer(x, wd, bd, w1, b1, gamma, beta, *, dilation: int,
                           use_ln: bool = True, eps: float = 1e-5,
                           rate: float = 0.0, seed=None,
                           tile: int = 512, interpret: bool = False):
    """Differentiable fused layer: Pallas forward, recompute-in-backward VJP
    (the backward recomputes the cheap intermediates from x instead of saving
    them — rematerialization trades a little compute for activation memory).

    rate/seed: in-kernel dropout on the 1x1-conv output (rate=0 disables;
    seed is a (1,) int32 array, required when rate > 0).
    """
    if seed is None:
        seed = jnp.zeros((1,), jnp.int32)
    return _dr_vjp(x, wd, bd, w1, b1, gamma, beta, seed,
                   dilation, use_ln, eps, float(rate), tile, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11, 12, 13))
def _dr_vjp(x, wd, bd, w1, b1, gamma, beta, seed, dilation, use_ln, eps, rate, tile, interpret):
    return _forward(x, wd, bd, w1, b1, gamma, beta, seed, dilation=dilation,
                    use_ln=use_ln, eps=eps, rate=rate, tile=tile, interpret=interpret)


def _reference_forward_pieces(x, wd, bd, w1, b1, dilation):
    """XLA recomputation of the intermediates (used by the backward pass)."""
    import jax.lax as lax

    conv = lax.conv_general_dilated(
        x, wd, window_strides=(1,), padding=[(dilation, dilation)],
        rhs_dilation=(dilation,), dimension_numbers=("NWC", "WIO", "NWC"),
    ) + bd
    a = jax.nn.relu(conv)
    z_pre = a @ w1 + b1  # pre-dropout, pre-residual
    return a, z_pre


def _fwd(x, wd, bd, w1, b1, gamma, beta, seed, dilation, use_ln, eps, rate, tile, interpret):
    y = _forward(x, wd, bd, w1, b1, gamma, beta, seed, dilation=dilation,
                 use_ln=use_ln, eps=eps, rate=rate, tile=tile, interpret=interpret)
    return y, (x, wd, bd, w1, b1, gamma, beta, seed)


def _bwd(dilation, use_ln, eps, rate, tile, interpret, res, g):
    import jax.lax as lax

    x, wd, bd, w1, b1, gamma, beta, seed = res
    a, z_pre = _reference_forward_pieces(x, wd, bd, w1, b1, dilation)
    if rate > 0.0:
        m = dropout_mask(seed, shape=x.shape, rate=rate, tile=tile, interpret=interpret)
        z = z_pre * m + x
    else:
        m = None
        z = z_pre + x

    if use_ln:
        mean = z.mean(axis=-1, keepdims=True)
        var = ((z - mean) ** 2).mean(axis=-1, keepdims=True)
        rstd = lax.rsqrt(var + eps)
        xhat = (z - mean) * rstd
        dgamma = (g * xhat).sum(axis=(0, 1))
        dbeta = g.sum(axis=(0, 1))
        gg = g * gamma
        dz = (gg - gg.mean(axis=-1, keepdims=True)
              - xhat * (gg * xhat).mean(axis=-1, keepdims=True)) * rstd
    else:
        dgamma = jnp.zeros_like(gamma)
        dbeta = jnp.zeros_like(gamma)
        dz = g

    # z = dropout(a @ w1 + b1) + x
    dz_pre = dz * m if m is not None else dz
    da = dz_pre @ w1.T
    dw1 = jnp.einsum("btc,btd->cd", a, dz_pre)
    db1 = dz_pre.sum(axis=(0, 1))

    dc = da * (a > 0)
    dbd = dc.sum(axis=(0, 1))
    # conv backward w.r.t. input: correlate dc with flipped taps
    wd_flip = jnp.flip(wd, axis=0).transpose(0, 2, 1)  # (3, C_out, C_in) -> taps on dc
    dx_conv = lax.conv_general_dilated(
        dc.astype(wd_flip.dtype), wd_flip, window_strides=(1,),
        padding=[(dilation, dilation)], rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
    )
    # conv backward w.r.t. weights: dW[k] = sum_t x[t + (k-1)d]^T dc[t]
    d = dilation
    xp = jnp.pad(x, ((0, 0), (d, d), (0, 0)))
    T = x.shape[1]
    dwd = jnp.stack(
        [jnp.einsum("btc,btd->cd", xp[:, k * d : k * d + T], dc) for k in range(3)], axis=0
    )

    dx = dx_conv.astype(jnp.float32) + dz  # residual path
    dseed = np.zeros(seed.shape, jax.dtypes.float0)
    # cotangents must carry the primals' dtypes (weights may be bf16 casts)
    return (dx.astype(x.dtype), dwd.astype(wd.dtype), dbd.astype(bd.dtype),
            dw1.astype(w1.dtype), db1.astype(b1.dtype),
            dgamma.astype(gamma.dtype), dbeta.astype(beta.dtype), dseed)


_dr_vjp.defvjp(_fwd, _bwd)


# ---------------------------------------------------------------------------
# pad-once stack: a whole MSTCN tower of dilated-residual layers with ONE
# halo pad at entry and ONE slice at exit.  The per-layer jnp.pad / [:, :T]
# of the single-layer API cost a full stream read+write each — XLA fuses
# them at small batch but materializes them at B>=32 (profiled on v5e:
# pad+slice+copy grew from 0.02 to 0.14 ms/video between B=8 and B=32).
# Buffers between layers live in the (B, h + T_pad + h, C) extended layout;
# halo regions hold garbage (never written) — edge tiles zero their reads
# in-register, and every layer re-zeroes padded frames at write time via the
# frame mask (same semantics as the reference's per-layer x*mask).


def _stack_kernel(seed_ref, len_ref, x_ref, wd_ref, bd_ref, w1_ref, b1_ref, g_ref, beta_ref,
                  *refs, dilation: int, halo: int, tile: int,
                  use_ln: bool, eps: float, rate: float, n_tiles: int,
                  save_a: bool = False, out_proj: bool = False):
    # ref layout: [ow, ob] when out_proj, then the primary output (the
    # stream, or the f32 logits when out_proj), then [a] when save_a
    if out_proj:
        ow_ref, ob_ref, o_ref = refs[0], refs[1], refs[2]
        maybe_a_ref = refs[3:]
    else:
        o_ref = refs[0]
        maybe_a_ref = refs[1:]
    d, hp = dilation, halo
    b = pl.program_id(0)
    t = pl.program_id(1)
    # x_ref window: (1, tile + 2*halo, C) at start t*tile in the extended
    # buffer; center rows sit at [halo, halo + tile).
    left = x_ref[0, hp - d : hp - d + tile, :]
    mid = x_ref[0, hp : hp + tile, :]
    right = x_ref[0, hp + d : hp + d + tile, :]
    # valid-frame write mask from the video length (frame masks are always a
    # contiguous prefix — batching.py zero-pads suffixes)
    row = jax.lax.broadcasted_iota(jnp.int32, (tile, 1), 0)
    mask = ((t * tile + row) < len_ref[b]).astype(jnp.float32)

    # edge reads that reach into the (unwritten) halo garbage are exactly the
    # rows whose absolute center-time falls outside [0, T_pad) — zero them
    # (conv SAME zero padding).  Absolute conditions, not first/last-tile
    # ones: with dilation > tile the garbage region spans several tiles.
    pos = t * tile + row
    left = jnp.where(pos < d, 0.0, left.astype(jnp.float32))
    right = jnp.where(pos >= n_tiles * tile - d, 0.0, right.astype(jnp.float32))
    left = left.astype(mid.dtype)
    right = right.astype(mid.dtype)

    acc = jnp.dot(left, wd_ref[0], preferred_element_type=jnp.float32)
    acc += jnp.dot(mid, wd_ref[1], preferred_element_type=jnp.float32)
    acc += jnp.dot(right, wd_ref[2], preferred_element_type=jnp.float32)
    acc = jax.nn.relu(acc + bd_ref[:].astype(jnp.float32))
    acc_c = acc.astype(mid.dtype)
    if save_a:
        # stash the relu activations for the backward (training path): the
        # backward then needs no conv recompute (a > 0 is the relu mask and
        # a itself feeds dw1)
        maybe_a_ref[0][0, :, :] = acc_c

    out = jnp.dot(acc_c, w1_ref[:], preferred_element_type=jnp.float32)
    out = out + b1_ref[:].astype(jnp.float32)
    if rate > 0.0:
        _seed_cell(seed_ref, n_tiles)
        out = out * _keep_mask(rate, out.shape)
    out = out + mid.astype(jnp.float32)

    if use_ln:
        mean = out.mean(axis=-1, keepdims=True)
        var = ((out - mean) ** 2).mean(axis=-1, keepdims=True)
        out = (out - mean) * jax.lax.rsqrt(var + eps)
        out = out * g_ref[:].astype(jnp.float32) + beta_ref[:].astype(jnp.float32)

    # write-mask: padded frames stay zero in the inter-layer buffer (the
    # reference masks at the *input* of every layer — same computation)
    out = out * mask
    if out_proj:
        # fold the tower's out projection (C -> O; its trailing dims are the
        # frame class logits) into the final layer: the stream never round-
        # trips HBM between the stack and the out matmul.  The stream cast
        # mirrors what the unfused path reads back from the inter-layer
        # buffer, so logits match the separate-dense path bit-for-bit; f32
        # accumulation as in _F32OutDense (models/layers.py).
        y_c = out.astype(x_ref.dtype)
        lg = jnp.dot(y_c, ow_ref[:].astype(y_c.dtype),
                     preferred_element_type=jnp.float32)
        o_ref[0, :, :] = lg + ob_ref[:].astype(jnp.float32)
    else:
        o_ref[0, :, :] = out.astype(o_ref.dtype)


def _stack_layer(x_ext, lengths, wd, bd, w1, b1, gamma, beta, seed, *,
                 dilation: int, halo_max: int, tile: int, n_tiles: int,
                 use_ln: bool, eps: float, rate: float, interpret: bool,
                 save_a: bool = False, out_params=None):
    """One layer on the extended buffer: (B, hm+T_pad+hm, C) -> same shape.

    The read window spans only this layer's own halo (tile + 2*align8(d)
    rows), positioned inside the shared halo_max layout — small-dilation
    layers don't pay the max layer's read amplification.  Output halo
    regions are never written (uninitialized); edge-tile reads mask them
    in-register, so the garbage never propagates.

    save_a=True additionally emits the relu activations (center rows of an
    extended-layout buffer) as backward residuals.

    out_params=(ow, ob) (only on a stack's LAST layer) fuses the out
    projection: the primary output becomes the f32 logits in a plain
    (B, T_pad, O) buffer instead of the extended-layout stream.
    """
    B, T_ext, C = x_ext.shape
    halo_d = -(-dilation // 8) * 8
    off = halo_max - halo_d
    assert halo_max % tile == 0  # output blocks must be tile-aligned (Mosaic)
    out_proj = out_params is not None
    kernel = functools.partial(
        _stack_kernel, dilation=dilation, halo=halo_d, tile=tile, use_ln=use_ln,
        eps=eps, rate=rate, n_tiles=n_tiles, save_a=save_a, out_proj=out_proj,
    )
    center_out = pl.BlockSpec((1, tile, C), lambda b, t: (b, t + halo_max // tile, 0))
    ext_shape = jax.ShapeDtypeStruct((B, T_ext, C), x_ext.dtype)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(
            (pl.Element(1), pl.Element(tile + 2 * halo_d), pl.Element(C)),
            # written as (..)*8 so Mosaic's alignment prover accepts the
            # constant offset (t*tile + off alone fails on this version)
            lambda b, t: (b, (t * (tile // 8) + off // 8) * 8, 0),
        ),
        pl.BlockSpec((3, C, C), lambda b, t: (0, 0, 0)),
        pl.BlockSpec((C,), lambda b, t: (0,)),
        pl.BlockSpec((C, C), lambda b, t: (0, 0)),
        pl.BlockSpec((C,), lambda b, t: (0,)),
        pl.BlockSpec((C,), lambda b, t: (0,)),
        pl.BlockSpec((C,), lambda b, t: (0,)),
    ]
    args = [seed, lengths, x_ext, wd, bd, w1, b1, gamma, beta]
    if out_proj:
        ow, ob = out_params
        O = ow.shape[-1]
        T_pad = n_tiles * tile
        in_specs += [pl.BlockSpec((C, O), lambda b, t: (0, 0)),
                     pl.BlockSpec((O,), lambda b, t: (0,))]
        args += [ow, ob]
        primary_spec = pl.BlockSpec((1, tile, O), lambda b, t: (b, t, 0))
        primary_shape = jax.ShapeDtypeStruct((B, T_pad, O), jnp.float32)
    else:
        primary_spec = center_out
        primary_shape = ext_shape
    out = pl.pallas_call(
        kernel,
        grid=(B, n_tiles),
        in_specs=in_specs,
        out_specs=[primary_spec, center_out] if save_a else primary_spec,
        out_shape=[primary_shape, ext_shape] if save_a else primary_shape,
        interpret=interpret,
    )(*args)
    return out  # (out_ext, a_ext) when save_a else out_ext


def _stack_reference(x, mask, layers, dilations, use_ln, eps, rates, seeds, tile, interpret):
    """XLA reference of the whole stack (used by the backward pass; dropout
    masks regenerated bit-exactly via dropout_mask).

    The inter-layer stream keeps the input dtype (bf16 under mixed precision)
    exactly like the fused kernel, whose internal f32 math is cast back at
    each layer's write."""
    dt = x.dtype
    m = mask[:, :, None].astype(dt)
    for (wd, bd, w1, b1, gamma, beta), d, rate, seed in zip(layers, dilations, rates, seeds):
        xm = x * m
        a, z_pre = _reference_forward_pieces(xm, wd, bd, w1, b1, d)
        if rate > 0.0:
            km = dropout_mask(seed, shape=x.shape, rate=rate, tile=tile, interpret=interpret)
            z = z_pre * km + xm
        else:
            z = z_pre + xm
        if use_ln:
            z = z.astype(jnp.float32)
            mean = z.mean(axis=-1, keepdims=True)
            var = ((z - mean) ** 2).mean(axis=-1, keepdims=True)
            z = (z - mean) * jax.lax.rsqrt(var + eps) * gamma + beta
        x = (z * m[:, :, 0:1].astype(z.dtype)).astype(dt)  # write-mask invariant
    return x


def dilated_residual_stack(x, mask, layers, dilations, *, use_ln: bool = True,
                           eps: float = 1e-5, rates=None, seeds=None,
                           tile: int = 512, interpret: bool = False,
                           out_params=None):
    """Fused MSTCN tower: N dilated-residual layers, one pad, one slice.

    x: (B, T, C); mask: (B, T) bool; layers: sequence of parameter tuples
    (wd, bd, w1, b1, gamma, beta); dilations: per-layer dilation ints;
    rates/seeds: per-layer dropout (rate 0 disables; seed (1,) int32 each).

    Returns (B, T, C) with padded frames zeroed (reference semantics: every
    layer masks its input, so outputs at padded frames are zero here).

    out_params=(ow, ob) additionally fuses the tower's out projection
    (C -> O dense; the reference's conv_out, basic.py:173-220) into the
    last layer's kernel and returns f32 logits (B, T, O) instead of the
    stream — the final stream then never round-trips HBM in forward OR
    backward (its cotangent is formed in-VMEM from the logits cotangent).
    Padded frames carry the bias row, exactly like dense(0-masked stream).
    """
    n = len(layers)
    if rates is None:
        rates = (0.0,) * n
    if seeds is None:
        seeds = (jnp.zeros((1,), jnp.int32),) * n
    rates = tuple(float(r) for r in rates)
    dilations = tuple(int(d) for d in dilations)
    if out_params is not None:
        return _stack_proj_vjp(x, mask, tuple(layers), tuple(out_params),
                               tuple(seeds), dilations, use_ln, eps, rates,
                               tile, interpret)
    return _stack_vjp(x, mask, tuple(layers), tuple(seeds), dilations, use_ln, eps,
                      rates, tile, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9))
def _stack_vjp(x, mask, layers, seeds, dilations, use_ln, eps, rates, tile, interpret):
    return _stack_forward(x, mask, layers, seeds, dilations, use_ln, eps, rates, tile, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10))
def _stack_proj_vjp(x, mask, layers, out_params, seeds, dilations, use_ln, eps,
                    rates, tile, interpret):
    return _stack_forward(x, mask, layers, seeds, dilations, use_ln, eps, rates,
                          tile, interpret, out_params=out_params)


def _stack_layout(T, dilations, tile):
    _, tile, n_tiles = _tiling(T, tile, 1)
    T_pad = n_tiles * tile
    # buffer offset = whole tiles >= the largest layer halo, so every layer's
    # output windows are block-aligned (Mosaic requires provable alignment)
    halo_req = -(-max(dilations) // 8) * 8
    halo = -(-halo_req // tile) * tile
    return tile, n_tiles, T_pad, halo


def _stack_forward(x, mask, layers, seeds, dilations, use_ln, eps, rates, tile,
                   interpret, with_saves: bool = False, out_params=None):
    B, T, C = x.shape
    tile, n_tiles, T_pad, halo = _stack_layout(T, dilations, tile)

    xm = x * mask[:, :, None].astype(x.dtype)
    x_ext = jnp.pad(xm, ((0, 0), (halo, halo + (T_pad - T)), (0, 0)))  # the ONE pad
    lengths = mask.astype(jnp.int32).sum(axis=1)  # masks are prefix-contiguous

    n = len(layers)
    streams, a_exts = [], []
    for i, ((wd, bd, w1, b1, gamma, beta), d, rate, seed) in enumerate(
            zip(layers, dilations, rates, seeds)):
        if with_saves:
            streams.append(x_ext)
        x_ext = _stack_layer(
            x_ext, lengths, wd, bd, w1, b1, gamma, beta, seed,
            dilation=d, halo_max=halo, tile=tile, n_tiles=n_tiles,
            use_ln=use_ln, eps=eps, rate=rate, interpret=interpret,
            save_a=with_saves,
            out_params=out_params if i == n - 1 else None,
        )
        if with_saves:
            x_ext, a_ext = x_ext
            a_exts.append(a_ext)
    if out_params is not None:
        y = x_ext[:, :T]  # logits live in a plain (B, T_pad, O) buffer
    else:
        y = x_ext[:, halo : halo + T]  # the ONE slice
    if with_saves:
        return y, tuple(streams), tuple(a_exts)
    return y


def _stack_fwd(x, mask, layers, seeds, dilations, use_ln, eps, rates, tile, interpret):
    # training path: keep the inter-layer streams (already materialized by
    # the forward) and the relu activations as residuals — the backward then
    # runs no forward recompute at all (12 instead of 19 MXU matmuls per
    # layer per train step measured at flagship scale)
    y, streams, a_exts = _stack_forward(
        x, mask, layers, seeds, dilations, use_ln, eps, rates, tile, interpret,
        with_saves=True,
    )
    return y, (x, mask, layers, seeds, streams, a_exts)


# --- fused stack backward -------------------------------------------------
# The XLA-vjp-of-reference backward moved ~21 GB/step at flagship scale
# (profiled: per-layer forward recompute plus conv-transpose/weight-grad
# einsums each materialize full (B, T, C) streams).  These two kernels do
# the whole layer backward with ~7 stream touches per layer:
#   A: recompute conv+relu in-tile from the (rematerialized) layer-input
#      stream, regenerate the dropout keep-mask from the PRNG, run
#      LN/dropout/1x1 backward, emit dc (pre-relu cotangent) and the
#      pointwise weight grads (dw1/db1/dbd/dgamma/dbeta).
#   B: conv-transpose dc into dx (three shifted (tile,C)@(C,C)^T MXU
#      matmuls + residual), emit the three conv-tap grads dwd[k].
# Weight grads accumulate across the sequential (B, n_tiles) grid into
# constant-index output blocks (zeroed at the first cell).


def _stack_bwd_dc_kernel(seed_ref, len_ref, a_ref, x_ref, g_ref,
                         w1_ref, b1_ref, gamma_ref, *refs,
                         tile: int, use_ln: bool,
                         eps: float, rate: float, n_tiles: int,
                         out_proj: bool = False):
    # out_proj: g_ref carries the LOGITS cotangent (tile, O); the stream
    # cotangent dy = g @ ow^T is formed in-VMEM (never hits HBM), and the
    # out-projection weight grads accumulate here.  The post-LN output y is
    # recomputed bit-exactly from the saved residuals (a, x, regenerated
    # dropout mask) — it was never written by the fused forward.
    if out_proj:
        ow_ref, beta_ref, out_refs = refs[0], refs[1], refs[2:]
    else:
        ow_ref, beta_ref, out_refs = None, None, refs
    emit_dz = use_ln or out_proj
    it = iter(out_refs)
    dc_ref = next(it)
    dz_ref = next(it) if emit_dz else None
    dw1_ref, db1_ref, dbd_ref = next(it), next(it), next(it)
    if use_ln:
        dgamma_ref, dbeta_ref = next(it), next(it)
    if out_proj:
        dow_ref, dob_ref = next(it), next(it)
    b = pl.program_id(0)
    t = pl.program_id(1)
    row = jax.lax.broadcasted_iota(jnp.int32, (tile, 1), 0)
    valid = ((t * tile + row) < len_ref[b]).astype(jnp.float32)

    a_c = a_ref[0]  # relu activations saved by the forward (stream dtype)
    if rate > 0.0:
        _seed_cell(seed_ref, n_tiles)
        keep = _keep_mask(rate, (tile, a_c.shape[-1]))
    else:
        keep = None

    if use_ln or out_proj:
        mid = x_ref[0]
        h = jnp.dot(a_c, w1_ref[:], preferred_element_type=jnp.float32)
        h = h + b1_ref[:].astype(jnp.float32)
        if keep is not None:
            h = h * keep
        z = h + mid.astype(jnp.float32)
    if use_ln:
        mean = z.mean(axis=-1, keepdims=True)
        var = ((z - mean) ** 2).mean(axis=-1, keepdims=True)
        rstd = jax.lax.rsqrt(var + eps)
        xhat = (z - mean) * rstd

    if out_proj:
        # y exactly as the forward's lg input: LN output (or z), write-masked,
        # cast to the stream dtype
        if use_ln:
            y = (xhat * gamma_ref[:].astype(jnp.float32)
                 + beta_ref[:].astype(jnp.float32))
        else:
            y = z
        y_c = (y * valid).astype(a_c.dtype)
        glg = g_ref[0].astype(jnp.float32)
        glg_c = glg.astype(a_c.dtype)
        ow_c = ow_ref[:].astype(a_c.dtype)
        dy = jax.lax.dot_general(glg_c, ow_c, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        g = dy * valid
        dow_part = jax.lax.dot_general(y_c, glg_c, (((0,), (0,)), ((), ())),
                                       preferred_element_type=jnp.float32)
        dob_part = glg.sum(axis=0)[None, :]
    else:
        g = g_ref[0].astype(jnp.float32) * valid

    if use_ln:
        gg = g * gamma_ref[:].astype(jnp.float32)
        dz = (gg - gg.mean(axis=-1, keepdims=True)
              - xhat * (gg * xhat).mean(axis=-1, keepdims=True)) * rstd
        dgamma_part = (g * xhat).sum(axis=0)[None, :]
        dbeta_part = g.sum(axis=0)[None, :]
    else:
        dz = g
    if emit_dz:
        dz_ref[0, :, :] = dz.astype(dz_ref.dtype)

    dh = dz * keep if keep is not None else dz
    dh_c = dh.astype(a_c.dtype)
    # da = dh @ w1^T (contract the output channel of both)
    da = jax.lax.dot_general(dh_c, w1_ref[:], (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    # a > 0 <=> pre-relu > 0; compare in f32 (Mosaic rejects bf16 cmpf)
    dc = da * (a_c.astype(jnp.float32) > 0)
    dc_ref[0, :, :] = dc.astype(dc_ref.dtype)

    dw1_part = jax.lax.dot_general(a_c, dh_c, (((0,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
    db1_part = dh.sum(axis=0)[None, :]
    dbd_part = dc.sum(axis=0)[None, :]

    @pl.when((b == 0) & (t == 0))
    def _init():
        dw1_ref[:, :] = jnp.zeros_like(dw1_ref)
        db1_ref[:, :] = jnp.zeros_like(db1_ref)
        dbd_ref[:, :] = jnp.zeros_like(dbd_ref)
        if use_ln:
            dgamma_ref[:, :] = jnp.zeros_like(dgamma_ref)
            dbeta_ref[:, :] = jnp.zeros_like(dbeta_ref)
        if out_proj:
            dow_ref[:, :] = jnp.zeros_like(dow_ref)
            dob_ref[:, :] = jnp.zeros_like(dob_ref)

    dw1_ref[:, :] += dw1_part
    db1_ref[:, :] += db1_part
    dbd_ref[:, :] += dbd_part
    if use_ln:
        dgamma_ref[:, :] += dgamma_part
        dbeta_ref[:, :] += dbeta_part
    if out_proj:
        dow_ref[:, :] += dow_part
        dob_ref[:, :] += dob_part


def _stack_bwd_dx_kernel(len_ref, x_ref, dc_ref, gsrc_ref, wd_ref,
                         dx_ref, dwd_ref, *, dilation: int, halo: int,
                         tile: int, n_tiles: int):
    d, hp = dilation, halo
    b = pl.program_id(0)
    t = pl.program_id(1)
    row = jax.lax.broadcasted_iota(jnp.int32, (tile, 1), 0)
    valid = ((t * tile + row) < len_ref[b]).astype(jnp.float32)

    def window(ref):
        left = ref[0, hp - d : hp - d + tile, :]
        mid = ref[0, hp : hp + tile, :]
        right = ref[0, hp + d : hp + d + tile, :]
        pos = t * tile + row
        left = jnp.where(pos < d, 0.0,
                         left.astype(jnp.float32)).astype(mid.dtype)
        right = jnp.where(pos >= n_tiles * tile - d, 0.0,
                          right.astype(jnp.float32)).astype(mid.dtype)
        return left, mid, right

    x_left, x_mid, x_right = window(x_ref)
    dc_left, dc_mid, dc_right = window(dc_ref)

    # dx[s] = dc[s+d] @ wd[0]^T + dc[s] @ wd[1]^T + dc[s-d] @ wd[2]^T + dz[s]
    dims = (((1,), (1,)), ((), ()))
    dx = jax.lax.dot_general(dc_right, wd_ref[0], dims, preferred_element_type=jnp.float32)
    dx += jax.lax.dot_general(dc_mid, wd_ref[1], dims, preferred_element_type=jnp.float32)
    dx += jax.lax.dot_general(dc_left, wd_ref[2], dims, preferred_element_type=jnp.float32)
    dx += gsrc_ref[0].astype(jnp.float32)
    dx = dx * valid  # d(layer)/d(x at padded frames) == 0 (input mask)
    dx_ref[0, :, :] = dx.astype(dx_ref.dtype)

    # dwd[k] = sum_t x[t + (k-1)d]^T dc[t]
    rdims = (((0,), (0,)), ((), ()))
    dwd0 = jax.lax.dot_general(x_left, dc_mid, rdims, preferred_element_type=jnp.float32)
    dwd1 = jax.lax.dot_general(x_mid, dc_mid, rdims, preferred_element_type=jnp.float32)
    dwd2 = jax.lax.dot_general(x_right, dc_mid, rdims, preferred_element_type=jnp.float32)

    @pl.when((b == 0) & (t == 0))
    def _init():
        dwd_ref[:, :, :] = jnp.zeros_like(dwd_ref)

    dwd_ref[0, :, :] += dwd0
    dwd_ref[1, :, :] += dwd1
    dwd_ref[2, :, :] += dwd2


def _stack_bwd_layer(x_ext, a_ext, g_ext, lengths, wd, w1, b1, gamma, seed, *,
                     dilation: int, halo_max: int, tile: int, n_tiles: int,
                     use_ln: bool, eps: float, rate: float, interpret: bool,
                     out_w=None, beta=None):
    """One layer's backward on the extended layout.  Returns
    (dx_ext, dwd, dbd, dw1, db1, dgamma, dbeta[, dow, dob]) with weight
    grads in f32.

    out_w (a stack's LAST layer only): ``g_ext`` is then the logits
    cotangent in a plain (B, T_pad, O) buffer; the kernel folds the out
    projection backward in (dy formed in-VMEM, dow/dob accumulated) and
    additionally returns them."""
    B, T_ext, C = x_ext.shape
    out_proj = out_w is not None
    halo_d = -(-dilation // 8) * 8
    off = halo_max - halo_d
    win_spec = pl.BlockSpec(
        (pl.Element(1), pl.Element(tile + 2 * halo_d), pl.Element(C)),
        lambda b, t: (b, (t * (tile // 8) + off // 8) * 8, 0),
    )
    center_in = pl.BlockSpec(
        (pl.Element(1), pl.Element(tile), pl.Element(C)),
        lambda b, t: (b, (t * (tile // 8) + halo_max // 8) * 8, 0),
    )
    center_out = pl.BlockSpec((1, tile, C), lambda b, t: (b, t + halo_max // tile, 0))
    wspec = lambda *shape: pl.BlockSpec(shape, lambda b, t: (0,) * len(shape))  # noqa: E731
    ext = lambda dt: jax.ShapeDtypeStruct((B, T_ext, C), dt)  # noqa: E731

    kernel_a = functools.partial(
        _stack_bwd_dc_kernel, tile=tile,
        use_ln=use_ln, eps=eps, rate=rate, n_tiles=n_tiles, out_proj=out_proj,
    )
    vec = jax.ShapeDtypeStruct((1, C), jnp.float32)
    mat = jax.ShapeDtypeStruct((C, C), jnp.float32)
    emit_dz = use_ln or out_proj
    out_shapes = [ext(x_ext.dtype)]
    out_specs = [center_out]
    if emit_dz:
        out_shapes.append(ext(x_ext.dtype))
        out_specs.append(center_out)
    out_shapes += [mat, vec, vec]
    out_specs += [wspec(C, C), wspec(1, C), wspec(1, C)]
    if use_ln:
        out_shapes += [vec, vec]
        out_specs += [wspec(1, C), wspec(1, C)]
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        center_in, center_in, center_in,
        wspec(C, C), wspec(C), wspec(C),
    ]
    args = [seed, lengths, a_ext, x_ext, g_ext, w1, b1, gamma]
    if out_proj:
        O = out_w.shape[-1]
        # the logits cotangent lives in a plain (B, T_pad, O) buffer
        in_specs[4] = pl.BlockSpec((1, tile, O), lambda b, t: (b, t, 0))
        in_specs += [wspec(C, O), wspec(C)]
        args += [out_w, beta]
        out_shapes += [jax.ShapeDtypeStruct((C, O), jnp.float32),
                       jax.ShapeDtypeStruct((1, O), jnp.float32)]
        out_specs += [wspec(C, O), wspec(1, O)]
    outs = pl.pallas_call(
        kernel_a,
        grid=(B, n_tiles),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(*args)
    dow = dob = None
    if out_proj:
        outs, (dow, dob) = outs[:-2], outs[-2:]
    if use_ln:
        dc_ext, dz_ext, dw1, db1, dbd, dgamma, dbeta = outs
        gsrc = dz_ext
    elif out_proj:
        dc_ext, dz_ext, dw1, db1, dbd = outs
        dgamma = dbeta = jnp.zeros((1, C), jnp.float32)
        gsrc = dz_ext
    else:
        dc_ext, dw1, db1, dbd = outs
        dgamma = dbeta = jnp.zeros((1, C), jnp.float32)
        gsrc = g_ext

    kernel_b = functools.partial(
        _stack_bwd_dx_kernel, dilation=dilation, halo=halo_d, tile=tile,
        n_tiles=n_tiles,
    )
    dx_ext, dwd = pl.pallas_call(
        kernel_b,
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            win_spec, win_spec, center_in, wspec(3, C, C),
        ],
        out_specs=[center_out, wspec(3, C, C)],
        out_shape=[ext(x_ext.dtype), jax.ShapeDtypeStruct((3, C, C), jnp.float32)],
        interpret=interpret,
    )(lengths, x_ext, dc_ext, gsrc, wd)
    if out_proj:
        return dx_ext, dwd, dbd, dw1, db1, dgamma, dbeta, dow, dob
    return dx_ext, dwd, dbd, dw1, db1, dgamma, dbeta


def _stack_bwd(dilations, use_ln, eps, rates, tile, interpret, res, g):
    x, mask, layers, seeds, streams, a_exts = res
    B, T, C = x.shape
    tile, n_tiles, T_pad, halo = _stack_layout(T, dilations, tile)
    lengths = mask.astype(jnp.int32).sum(axis=1)

    g_ext = jnp.pad(g.astype(x.dtype), ((0, 0), (halo, halo + (T_pad - T)), (0, 0)))
    dlayers = [None] * len(layers)
    for i in reversed(range(len(layers))):
        wd, bd, w1, b1, gamma, beta = layers[i]
        g_ext, dwd, dbd, dw1, db1, dgamma, dbeta = _stack_bwd_layer(
            streams[i], a_exts[i], g_ext, lengths, wd, w1, b1, gamma, seeds[i],
            dilation=dilations[i], halo_max=halo, tile=tile, n_tiles=n_tiles,
            use_ln=use_ln, eps=eps, rate=rates[i], interpret=interpret,
        )
        dlayers[i] = (dwd.astype(wd.dtype), dbd[0].astype(bd.dtype),
                      dw1.astype(w1.dtype), db1[0].astype(b1.dtype),
                      dgamma[0].astype(gamma.dtype), dbeta[0].astype(beta.dtype))

    dx = g_ext[:, halo : halo + T].astype(x.dtype)
    dmask = np.zeros(mask.shape, jax.dtypes.float0)
    dseeds = tuple(np.zeros(s.shape, jax.dtypes.float0) for s in seeds)
    return dx, dmask, tuple(dlayers), dseeds


_stack_vjp.defvjp(_stack_fwd, _stack_bwd)


def _stack_proj_fwd(x, mask, layers, out_params, seeds, dilations, use_ln, eps,
                    rates, tile, interpret):
    y, streams, a_exts = _stack_forward(
        x, mask, layers, seeds, dilations, use_ln, eps, rates, tile, interpret,
        with_saves=True, out_params=out_params,
    )
    return y, (x, mask, layers, out_params, seeds, streams, a_exts)


def _stack_proj_bwd(dilations, use_ln, eps, rates, tile, interpret, res, g):
    x, mask, layers, out_params, seeds, streams, a_exts = res
    ow, ob = out_params
    B, T, C = x.shape
    tile, n_tiles, T_pad, halo = _stack_layout(T, dilations, tile)
    lengths = mask.astype(jnp.int32).sum(axis=1)

    # logits cotangent: plain (B, T_pad, O) buffer (stream-dtype, same
    # cotangent precision policy as the unfused g_ext path)
    g_ext = jnp.pad(g.astype(x.dtype), ((0, 0), (0, T_pad - T), (0, 0)))
    n = len(layers)
    dlayers = [None] * n
    dow = dob = None
    for i in reversed(range(n)):
        wd, bd, w1, b1, gamma, beta = layers[i]
        outs = _stack_bwd_layer(
            streams[i], a_exts[i], g_ext, lengths, wd, w1, b1, gamma, seeds[i],
            dilation=dilations[i], halo_max=halo, tile=tile, n_tiles=n_tiles,
            use_ln=use_ln, eps=eps, rate=rates[i], interpret=interpret,
            out_w=ow if i == n - 1 else None, beta=beta if i == n - 1 else None,
        )
        if i == n - 1:
            g_ext, dwd, dbd, dw1, db1, dgamma, dbeta, dow, dob = outs
        else:
            g_ext, dwd, dbd, dw1, db1, dgamma, dbeta = outs
        dlayers[i] = (dwd.astype(wd.dtype), dbd[0].astype(bd.dtype),
                      dw1.astype(w1.dtype), db1[0].astype(b1.dtype),
                      dgamma[0].astype(gamma.dtype), dbeta[0].astype(beta.dtype))

    dx = g_ext[:, halo : halo + T].astype(x.dtype)
    dmask = np.zeros(mask.shape, jax.dtypes.float0)
    dseeds = tuple(np.zeros(s.shape, jax.dtypes.float0) for s in seeds)
    d_out = (dow.astype(ow.dtype), dob[0].astype(ob.dtype))
    return dx, dmask, tuple(dlayers), d_out, dseeds


_stack_proj_vjp.defvjp(_stack_proj_fwd, _stack_proj_bwd)


@functools.partial(
    jax.jit, static_argnames=("dilation", "use_ln", "eps", "rate", "tile", "interpret")
)
def _forward(x, wd, bd, w1, b1, gamma, beta, seed, *, dilation: int,
             use_ln: bool = True, eps: float = 1e-5, rate: float = 0.0,
             tile: int = 512, interpret: bool = False):
    """Apply one fused dilated residual layer.

    x: (B, T, C) with padded frames already zeroed;
    wd: (3, C, C) dilated conv taps; w1: (C, C) pointwise; gamma/beta: (C,);
    seed: (1,) int32 for in-kernel dropout (ignored when rate == 0).
    Returns (B, T, C) = LN(x + dropout(W1 relu(dilated_conv3(x)))) on valid
    frames.
    """
    B, T, C = x.shape
    d = dilation
    halo, tile, n_tiles = _tiling(T, tile, d)
    T_pad = n_tiles * tile

    # halo + round-up padding in one XLA pad
    x_p = jnp.pad(x, ((0, 0), (halo, halo + (T_pad - T)), (0, 0)))

    kernel = functools.partial(
        _kernel, dilation=d, halo=halo, tile=tile, use_ln=use_ln, eps=eps,
        rate=rate, n_tiles=n_tiles,
    )

    out = pl.pallas_call(
        kernel,
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            # overlapping windows: element starts into the padded time axis
            # (Mosaic requires every dim to be Element when any is)
            pl.BlockSpec(
                (pl.Element(1), pl.Element(tile + 2 * halo), pl.Element(C)),
                lambda b, t: (b, t * tile, 0),
            ),
            pl.BlockSpec((3, C, C), lambda b, t: (0, 0, 0)),
            pl.BlockSpec((C,), lambda b, t: (0,)),
            pl.BlockSpec((C, C), lambda b, t: (0, 0)),
            pl.BlockSpec((C,), lambda b, t: (0,)),
            pl.BlockSpec((C,), lambda b, t: (0,)),
            pl.BlockSpec((C,), lambda b, t: (0,)),
        ],
        out_specs=pl.BlockSpec((1, tile, C), lambda b, t: (b, t, 0)),
        out_shape=jax.ShapeDtypeStruct((B, T_pad, C), x.dtype),
        interpret=interpret,
    )(seed, x_p, wd, bd, w1, b1, gamma, beta)
    return out[:, :T]


# ---------------------------------------------------------------------------
# MSTCN2 (MS-TCN++ dual-dilation) pad-once stack.  Per layer
# (models/layers.py::MSTCN2, reference basic.py:222-281):
#   f = dropout(relu(concat[conv_{d1}(f*m), conv_{d2}(f*m)] @ Wf + bf)) + f
# The concat@Wf is computed as split matmuls (c1 @ Wf_top + c2 @ Wf_bot), so
# the (tile, 2C) concat never materializes.  Layout/masking/PRNG identical to
# the MSTCN stack above.


def _stack2_kernel(seed_ref, len_ref, x_ref, k1_ref, b1_ref, k2_ref, b2_ref,
                   wt_ref, wb_ref, bf_ref, *refs, d1: int, d2: int, halo: int,
                   tile: int, rate: float, n_tiles: int, out_proj: bool = False):
    if out_proj:
        ow_ref, ob_ref, o_ref = refs[0], refs[1], refs[2]
    else:
        o_ref = refs[0]
    hp = halo
    b = pl.program_id(0)
    t = pl.program_id(1)
    mid = x_ref[0, hp : hp + tile, :]
    row = jax.lax.broadcasted_iota(jnp.int32, (tile, 1), 0)
    mask = ((t * tile + row) < len_ref[b]).astype(jnp.float32)

    def conv3(k_ref, b_ref, d):
        left = x_ref[0, hp - d : hp - d + tile, :]
        right = x_ref[0, hp + d : hp + d + tile, :]
        pos = t * tile + row
        left = jnp.where(pos < d, 0.0, left.astype(jnp.float32)).astype(mid.dtype)
        right = jnp.where(pos >= n_tiles * tile - d, 0.0,
                          right.astype(jnp.float32)).astype(mid.dtype)
        acc = jnp.dot(left, k_ref[0], preferred_element_type=jnp.float32)
        acc += jnp.dot(mid, k_ref[1], preferred_element_type=jnp.float32)
        acc += jnp.dot(right, k_ref[2], preferred_element_type=jnp.float32)
        return acc + b_ref[:].astype(jnp.float32)

    c1 = conv3(k1_ref, b1_ref, d1)
    c2 = conv3(k2_ref, b2_ref, d2)
    h = jnp.dot(c1.astype(mid.dtype), wt_ref[:], preferred_element_type=jnp.float32)
    h += jnp.dot(c2.astype(mid.dtype), wb_ref[:], preferred_element_type=jnp.float32)
    h = jax.nn.relu(h + bf_ref[:].astype(jnp.float32))
    if rate > 0.0:
        _seed_cell(seed_ref, n_tiles)
        h = h * _keep_mask(rate, h.shape)
    out = (h + mid.astype(jnp.float32)) * mask
    if out_proj:
        # fused out projection (see _stack_kernel): logits replace the
        # stream as the last layer's output
        y_c = out.astype(mid.dtype)
        lg = jnp.dot(y_c, ow_ref[:].astype(y_c.dtype),
                     preferred_element_type=jnp.float32)
        o_ref[0, :, :] = lg + ob_ref[:].astype(jnp.float32)
    else:
        o_ref[0, :, :] = out.astype(o_ref.dtype)


def _stack2_layer(x_ext, lengths, params, seed, *, d1: int, d2: int,
                  halo_max: int, tile: int, n_tiles: int, rate: float,
                  interpret: bool, out_params=None):
    k1, b1, k2, b2, wt, wb, bf = params
    B, T_ext, C = x_ext.shape
    halo_d = -(-max(d1, d2) // 8) * 8
    off = halo_max - halo_d
    assert halo_max % tile == 0
    out_proj = out_params is not None
    kernel = functools.partial(
        _stack2_kernel, d1=d1, d2=d2, halo=halo_d, tile=tile, rate=rate,
        n_tiles=n_tiles, out_proj=out_proj,
    )
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(
            (pl.Element(1), pl.Element(tile + 2 * halo_d), pl.Element(C)),
            lambda b, t: (b, (t * (tile // 8) + off // 8) * 8, 0),
        ),
        pl.BlockSpec((3, C, C), lambda b, t: (0, 0, 0)),
        pl.BlockSpec((C,), lambda b, t: (0,)),
        pl.BlockSpec((3, C, C), lambda b, t: (0, 0, 0)),
        pl.BlockSpec((C,), lambda b, t: (0,)),
        pl.BlockSpec((C, C), lambda b, t: (0, 0)),
        pl.BlockSpec((C, C), lambda b, t: (0, 0)),
        pl.BlockSpec((C,), lambda b, t: (0,)),
    ]
    args = [seed, lengths, x_ext, k1, b1, k2, b2, wt, wb, bf]
    if out_proj:
        ow, ob = out_params
        O = ow.shape[-1]
        T_pad = n_tiles * tile
        in_specs += [pl.BlockSpec((C, O), lambda b, t: (0, 0)),
                     pl.BlockSpec((O,), lambda b, t: (0,))]
        args += [ow, ob]
        out_spec = pl.BlockSpec((1, tile, O), lambda b, t: (b, t, 0))
        out_shape = jax.ShapeDtypeStruct((B, T_pad, O), jnp.float32)
    else:
        out_spec = pl.BlockSpec((1, tile, C), lambda b, t: (b, t + halo_max // tile, 0))
        out_shape = jax.ShapeDtypeStruct((B, T_ext, C), x_ext.dtype)
    return pl.pallas_call(
        kernel,
        grid=(B, n_tiles),
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(*args)


def _stack2_reference(x, mask, layers, dil_pairs, rates, seeds, tile, interpret):
    import jax.lax as lax

    dt = x.dtype
    m = mask[:, :, None].astype(dt)
    for (k1, b1, k2, b2, wt, wb, bf), (d1, d2), rate, seed in zip(
        layers, dil_pairs, rates, seeds
    ):
        xm = x * m

        def conv(k, bias, d):
            return lax.conv_general_dilated(
                xm, k, window_strides=(1,), padding=[(d, d)], rhs_dilation=(d,),
                dimension_numbers=("NWC", "WIO", "NWC"),
            ) + bias

        h = jax.nn.relu(conv(k1, b1, d1) @ wt + conv(k2, b2, d2) @ wb + bf)
        if rate > 0.0:
            km = dropout_mask(seed, shape=x.shape, rate=rate, tile=tile, interpret=interpret)
            h = h * km
        # keep the inter-layer stream in the input dtype, like the kernel
        x = ((h + xm) * m[:, :, 0:1].astype(h.dtype)).astype(dt)
    return x


def dilated_residual2_stack(x, mask, layers, dil_pairs, *, rates=None, seeds=None,
                            tile: int = 512, interpret: bool = False,
                            out_params=None):
    """Fused MS-TCN++ tower.  layers: (k1, b1, k2, b2, wf_top, wf_bot, bf)
    per layer (wf split along its 2C input rows); dil_pairs: (d1, d2).

    out_params=(ow, ob): fuse the out projection into the last layer and
    return f32 logits (B, T, O) — see dilated_residual_stack."""
    n = len(layers)
    if rates is None:
        rates = (0.0,) * n
    if seeds is None:
        seeds = (jnp.zeros((1,), jnp.int32),) * n
    rates = tuple(float(r) for r in rates)
    dil_pairs = tuple((int(a), int(b)) for a, b in dil_pairs)
    if out_params is not None:
        return _stack2_proj_vjp(x, mask, tuple(layers), tuple(out_params),
                                tuple(seeds), dil_pairs, rates, tile, interpret)
    return _stack2_vjp(x, mask, tuple(layers), tuple(seeds), dil_pairs, rates, tile, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _stack2_vjp(x, mask, layers, seeds, dil_pairs, rates, tile, interpret):
    return _stack2_forward(x, mask, layers, seeds, dil_pairs, rates, tile, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def _stack2_proj_vjp(x, mask, layers, out_params, seeds, dil_pairs, rates, tile,
                     interpret):
    return _stack2_forward(x, mask, layers, seeds, dil_pairs, rates, tile,
                           interpret, out_params=out_params)


def _stack2_forward(x, mask, layers, seeds, dil_pairs, rates, tile, interpret,
                    out_params=None):
    B, T, C = x.shape
    _, tile, n_tiles = _tiling(T, tile, 1)
    T_pad = n_tiles * tile
    halo_req = -(-max(max(p) for p in dil_pairs) // 8) * 8
    halo = -(-halo_req // tile) * tile

    xm = x * mask[:, :, None].astype(x.dtype)
    x_ext = jnp.pad(xm, ((0, 0), (halo, halo + (T_pad - T)), (0, 0)))
    lengths = mask.astype(jnp.int32).sum(axis=1)

    n = len(layers)
    for i, (params, (d1, d2), rate, seed) in enumerate(
            zip(layers, dil_pairs, rates, seeds)):
        x_ext = _stack2_layer(
            x_ext, lengths, params, seed, d1=d1, d2=d2, halo_max=halo,
            tile=tile, n_tiles=n_tiles, rate=rate, interpret=interpret,
            out_params=out_params if i == n - 1 else None,
        )
    if out_params is not None:
        return x_ext[:, :T]
    return x_ext[:, halo : halo + T]


def _stack2_fwd(x, mask, layers, seeds, dil_pairs, rates, tile, interpret):
    y = _stack2_forward(x, mask, layers, seeds, dil_pairs, rates, tile, interpret)
    return y, (x, mask, layers, seeds)


# --- fused MS-TCN++ stack backward (same scheme as the MSTCN one above) ---


def _stack2_bwd_dc_kernel(seed_ref, len_ref, x_ref, g_ref, k1_ref, b1_ref,
                          k2_ref, b2_ref, wt_ref, wb_ref, bf_ref,
                          *refs, d1: int, d2: int, halo: int,
                          tile: int, rate: float, n_tiles: int,
                          out_proj: bool = False):
    # out_proj (a stack's LAST layer): g_ref is the logits cotangent
    # (tile, O); the stream cotangent dy = g @ ow^T is formed in-VMEM from
    # the layer output y recomputed here (the forward never wrote it), the
    # out-projection grads accumulate, and dz is emitted for kernel B.
    if out_proj:
        ow_ref = refs[0]
        (dc1_ref, dc2_ref, dz_ref, dwt_ref, dwb_ref, dbf_ref,
         db1_ref, db2_ref, dow_ref, dob_ref) = refs[1:]
    else:
        (dc1_ref, dc2_ref, dwt_ref, dwb_ref, dbf_ref,
         db1_ref, db2_ref) = refs
    hp = halo
    b = pl.program_id(0)
    t = pl.program_id(1)
    mid = x_ref[0, hp : hp + tile, :]
    row = jax.lax.broadcasted_iota(jnp.int32, (tile, 1), 0)
    pos = t * tile + row
    valid = (pos < len_ref[b]).astype(jnp.float32)

    def conv3(k_ref, b_ref, d):
        left = x_ref[0, hp - d : hp - d + tile, :]
        right = x_ref[0, hp + d : hp + d + tile, :]
        left = jnp.where(pos < d, 0.0, left.astype(jnp.float32)).astype(mid.dtype)
        right = jnp.where(pos >= n_tiles * tile - d, 0.0,
                          right.astype(jnp.float32)).astype(mid.dtype)
        acc = jnp.dot(left, k_ref[0], preferred_element_type=jnp.float32)
        acc += jnp.dot(mid, k_ref[1], preferred_element_type=jnp.float32)
        acc += jnp.dot(right, k_ref[2], preferred_element_type=jnp.float32)
        return acc + b_ref[:].astype(jnp.float32)

    c1 = conv3(k1_ref, b1_ref, d1)
    c2 = conv3(k2_ref, b2_ref, d2)
    c1_c = c1.astype(mid.dtype)
    c2_c = c2.astype(mid.dtype)
    s = jnp.dot(c1_c, wt_ref[:], preferred_element_type=jnp.float32)
    s += jnp.dot(c2_c, wb_ref[:], preferred_element_type=jnp.float32)
    s += bf_ref[:].astype(jnp.float32)

    if rate > 0.0:
        _seed_cell(seed_ref, n_tiles)
        keep = _keep_mask(rate, s.shape)
    else:
        keep = None
    if out_proj:
        # recompute y = (dropout(relu(s)) + mid) * valid, exactly the fused
        # forward's lg input
        h = jax.nn.relu(s)
        if keep is not None:
            h = h * keep
        y = (h + mid.astype(jnp.float32)) * valid
        y_c = y.astype(mid.dtype)
        glg = g_ref[0].astype(jnp.float32)
        glg_c = glg.astype(mid.dtype)
        ow_c = ow_ref[:].astype(mid.dtype)
        dy = jax.lax.dot_general(glg_c, ow_c, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        g = dy * valid
        dow_part = jax.lax.dot_general(y_c, glg_c, (((0,), (0,)), ((), ())),
                                       preferred_element_type=jnp.float32)
        dob_part = glg.sum(axis=0)[None, :]
        dz_ref[0, :, :] = g.astype(dz_ref.dtype)
    else:
        g = g_ref[0].astype(jnp.float32) * valid
    if keep is not None:
        g = g * keep  # dropout bwd (mask regen)
    ds = g * (s > 0)
    ds_c = ds.astype(mid.dtype)

    dims = (((1,), (1,)), ((), ()))
    dc1 = jax.lax.dot_general(ds_c, wt_ref[:], dims, preferred_element_type=jnp.float32)
    dc2 = jax.lax.dot_general(ds_c, wb_ref[:], dims, preferred_element_type=jnp.float32)
    dc1_ref[0, :, :] = dc1.astype(dc1_ref.dtype)
    dc2_ref[0, :, :] = dc2.astype(dc2_ref.dtype)

    rdims = (((0,), (0,)), ((), ()))
    dwt_part = jax.lax.dot_general(c1_c, ds_c, rdims, preferred_element_type=jnp.float32)
    dwb_part = jax.lax.dot_general(c2_c, ds_c, rdims, preferred_element_type=jnp.float32)

    @pl.when((b == 0) & (t == 0))
    def _init():
        dwt_ref[:, :] = jnp.zeros_like(dwt_ref)
        dwb_ref[:, :] = jnp.zeros_like(dwb_ref)
        dbf_ref[:, :] = jnp.zeros_like(dbf_ref)
        db1_ref[:, :] = jnp.zeros_like(db1_ref)
        db2_ref[:, :] = jnp.zeros_like(db2_ref)
        if out_proj:
            dow_ref[:, :] = jnp.zeros_like(dow_ref)
            dob_ref[:, :] = jnp.zeros_like(dob_ref)

    dwt_ref[:, :] += dwt_part
    dwb_ref[:, :] += dwb_part
    dbf_ref[:, :] += ds.sum(axis=0)[None, :]
    db1_ref[:, :] += dc1.sum(axis=0)[None, :]
    db2_ref[:, :] += dc2.sum(axis=0)[None, :]
    if out_proj:
        dow_ref[:, :] += dow_part
        dob_ref[:, :] += dob_part


def _stack2_bwd_dx_kernel(len_ref, x_ref, dc1_ref, dc2_ref, g_ref, k1_ref,
                          k2_ref, dx_ref, dk1_ref, dk2_ref, *, d1: int,
                          d2: int, halo: int, tile: int, n_tiles: int):
    hp = halo
    b = pl.program_id(0)
    t = pl.program_id(1)
    row = jax.lax.broadcasted_iota(jnp.int32, (tile, 1), 0)
    pos = t * tile + row
    valid = (pos < len_ref[b]).astype(jnp.float32)

    def window(ref, d):
        left = ref[0, hp - d : hp - d + tile, :]
        mid = ref[0, hp : hp + tile, :]
        right = ref[0, hp + d : hp + d + tile, :]
        left = jnp.where(pos < d, 0.0, left.astype(jnp.float32)).astype(mid.dtype)
        right = jnp.where(pos >= n_tiles * tile - d, 0.0,
                          right.astype(jnp.float32)).astype(mid.dtype)
        return left, mid, right

    dims = (((1,), (1,)), ((), ()))
    rdims = (((0,), (0,)), ((), ()))

    dx = g_ref[0].astype(jnp.float32)  # residual path (masked at write)
    for dc_ref, k_ref, dk_ref, d in ((dc1_ref, k1_ref, dk1_ref, d1),
                                     (dc2_ref, k2_ref, dk2_ref, d2)):
        dc_left, dc_mid, dc_right = window(dc_ref, d)
        x_left, x_mid, x_right = window(x_ref, d)
        dx += jax.lax.dot_general(dc_right, k_ref[0], dims, preferred_element_type=jnp.float32)
        dx += jax.lax.dot_general(dc_mid, k_ref[1], dims, preferred_element_type=jnp.float32)
        dx += jax.lax.dot_general(dc_left, k_ref[2], dims, preferred_element_type=jnp.float32)
        dk0 = jax.lax.dot_general(x_left, dc_mid, rdims, preferred_element_type=jnp.float32)
        dk1_ = jax.lax.dot_general(x_mid, dc_mid, rdims, preferred_element_type=jnp.float32)
        dk2_ = jax.lax.dot_general(x_right, dc_mid, rdims, preferred_element_type=jnp.float32)

        @pl.when((b == 0) & (t == 0))
        def _init(dk_ref=dk_ref):
            dk_ref[:, :, :] = jnp.zeros_like(dk_ref)

        dk_ref[0, :, :] += dk0
        dk_ref[1, :, :] += dk1_
        dk_ref[2, :, :] += dk2_

    dx = dx * valid
    dx_ref[0, :, :] = dx.astype(dx_ref.dtype)


def _stack2_bwd_layer(x_ext, g_ext, lengths, params, seed, *, d1: int, d2: int,
                      halo_max: int, tile: int, n_tiles: int, rate: float,
                      interpret: bool, out_w=None):
    k1, b1, k2, b2, wt, wb, bf = params
    B, T_ext, C = x_ext.shape
    out_proj = out_w is not None
    halo_d = -(-max(d1, d2) // 8) * 8
    off = halo_max - halo_d
    win_spec = pl.BlockSpec(
        (pl.Element(1), pl.Element(tile + 2 * halo_d), pl.Element(C)),
        lambda b, t: (b, (t * (tile // 8) + off // 8) * 8, 0),
    )
    center_in = pl.BlockSpec(
        (pl.Element(1), pl.Element(tile), pl.Element(C)),
        lambda b, t: (b, (t * (tile // 8) + halo_max // 8) * 8, 0),
    )
    center_out = pl.BlockSpec((1, tile, C), lambda b, t: (b, t + halo_max // tile, 0))
    wspec = lambda *shape: pl.BlockSpec(shape, lambda b, t: (0,) * len(shape))  # noqa: E731
    ext = lambda: jax.ShapeDtypeStruct((B, T_ext, C), x_ext.dtype)  # noqa: E731
    vec = jax.ShapeDtypeStruct((1, C), jnp.float32)
    mat = jax.ShapeDtypeStruct((C, C), jnp.float32)

    kernel_a = functools.partial(
        _stack2_bwd_dc_kernel, d1=d1, d2=d2, halo=halo_d, tile=tile,
        rate=rate, n_tiles=n_tiles, out_proj=out_proj,
    )
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        win_spec, center_in,
        wspec(3, C, C), wspec(C), wspec(3, C, C), wspec(C),
        wspec(C, C), wspec(C, C), wspec(C),
    ]
    args = [seed, lengths, x_ext, g_ext, k1, b1, k2, b2, wt, wb, bf]
    out_specs = [center_out, center_out]
    out_shapes = [ext(), ext()]
    if out_proj:
        O = out_w.shape[-1]
        in_specs[3] = pl.BlockSpec((1, tile, O), lambda b, t: (b, t, 0))
        in_specs.append(wspec(C, O))
        args.append(out_w)
        out_specs.append(center_out)  # dz (C-wide, extended layout)
        out_shapes.append(ext())
    out_specs += [wspec(C, C), wspec(C, C), wspec(1, C), wspec(1, C), wspec(1, C)]
    out_shapes += [mat, mat, vec, vec, vec]
    if out_proj:
        out_specs += [wspec(C, O), wspec(1, O)]
        out_shapes += [jax.ShapeDtypeStruct((C, O), jnp.float32),
                       jax.ShapeDtypeStruct((1, O), jnp.float32)]
    outs = pl.pallas_call(
        kernel_a,
        grid=(B, n_tiles),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(*args)
    dow = dob = None
    if out_proj:
        dc1_ext, dc2_ext, dz_ext, dwt, dwb, dbf, db1, db2, dow, dob = outs
        gsrc = dz_ext
    else:
        dc1_ext, dc2_ext, dwt, dwb, dbf, db1, db2 = outs
        gsrc = g_ext

    kernel_b = functools.partial(
        _stack2_bwd_dx_kernel, d1=d1, d2=d2, halo=halo_d, tile=tile,
        n_tiles=n_tiles,
    )
    tap = jax.ShapeDtypeStruct((3, C, C), jnp.float32)
    dx_ext, dk1, dk2 = pl.pallas_call(
        kernel_b,
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            win_spec, win_spec, win_spec, center_in,
            wspec(3, C, C), wspec(3, C, C),
        ],
        out_specs=[center_out, wspec(3, C, C), wspec(3, C, C)],
        out_shape=[ext(), tap, tap],
        interpret=interpret,
    )(lengths, x_ext, dc1_ext, dc2_ext, gsrc, k1, k2)
    if out_proj:
        return dx_ext, dk1, db1, dk2, db2, dwt, dwb, dbf, dow, dob
    return dx_ext, dk1, db1, dk2, db2, dwt, dwb, dbf


def _stack2_bwd(dil_pairs, rates, tile, interpret, res, g):
    x, mask, layers, seeds = res
    B, T, C = x.shape
    _, tile, n_tiles = _tiling(T, tile, 1)
    T_pad = n_tiles * tile
    halo_req = -(-max(max(p) for p in dil_pairs) // 8) * 8
    halo = -(-halo_req // tile) * tile

    xm = x * mask[:, :, None].astype(x.dtype)
    x_ext = jnp.pad(xm, ((0, 0), (halo, halo + (T_pad - T)), (0, 0)))
    lengths = mask.astype(jnp.int32).sum(axis=1)
    streams = []
    for params, (d1, d2), rate, seed in zip(layers, dil_pairs, rates, seeds):
        streams.append(x_ext)
        x_ext = _stack2_layer(
            x_ext, lengths, params, seed, d1=d1, d2=d2, halo_max=halo,
            tile=tile, n_tiles=n_tiles, rate=rate, interpret=interpret,
        )

    g_ext = jnp.pad(g.astype(x.dtype), ((0, 0), (halo, halo + (T_pad - T)), (0, 0)))
    dlayers = [None] * len(layers)
    for i in reversed(range(len(layers))):
        k1, b1, k2, b2, wt, wb, bf = layers[i]
        d1, d2 = dil_pairs[i]
        g_ext, dk1, db1, dk2, db2, dwt, dwb, dbf = _stack2_bwd_layer(
            streams[i], g_ext, lengths, layers[i], seeds[i], d1=d1, d2=d2,
            halo_max=halo, tile=tile, n_tiles=n_tiles, rate=rates[i],
            interpret=interpret,
        )
        dlayers[i] = (dk1.astype(k1.dtype), db1[0].astype(b1.dtype),
                      dk2.astype(k2.dtype), db2[0].astype(b2.dtype),
                      dwt.astype(wt.dtype), dwb.astype(wb.dtype),
                      dbf[0].astype(bf.dtype))

    dx = g_ext[:, halo : halo + T].astype(x.dtype)
    dmask = np.zeros(mask.shape, jax.dtypes.float0)
    dseeds = tuple(np.zeros(s.shape, jax.dtypes.float0) for s in seeds)
    return dx, dmask, tuple(dlayers), dseeds


_stack2_vjp.defvjp(_stack2_fwd, _stack2_bwd)


def _stack2_proj_fwd(x, mask, layers, out_params, seeds, dil_pairs, rates, tile,
                     interpret):
    y = _stack2_forward(x, mask, layers, seeds, dil_pairs, rates, tile,
                        interpret, out_params=out_params)
    return y, (x, mask, layers, out_params, seeds)


def _stack2_proj_bwd(dil_pairs, rates, tile, interpret, res, g):
    x, mask, layers, out_params, seeds = res
    ow, ob = out_params
    B, T, C = x.shape
    _, tile, n_tiles = _tiling(T, tile, 1)
    T_pad = n_tiles * tile
    halo_req = -(-max(max(p) for p in dil_pairs) // 8) * 8
    halo = -(-halo_req // tile) * tile

    xm = x * mask[:, :, None].astype(x.dtype)
    x_ext = jnp.pad(xm, ((0, 0), (halo, halo + (T_pad - T)), (0, 0)))
    lengths = mask.astype(jnp.int32).sum(axis=1)
    # replay the stack (plain, no projection) to rebuild the layer-input
    # streams; the last layer's own replay is dead and DCE'd
    streams = []
    for params, (d1, d2), rate, seed in zip(layers, dil_pairs, rates, seeds):
        streams.append(x_ext)
        x_ext = _stack2_layer(
            x_ext, lengths, params, seed, d1=d1, d2=d2, halo_max=halo,
            tile=tile, n_tiles=n_tiles, rate=rate, interpret=interpret,
        )

    # logits cotangent: plain (B, T_pad, O) buffer
    g_ext = jnp.pad(g.astype(x.dtype), ((0, 0), (0, T_pad - T), (0, 0)))
    n = len(layers)
    dlayers = [None] * n
    dow = dob = None
    for i in reversed(range(n)):
        k1, b1, k2, b2, wt, wb, bf = layers[i]
        d1, d2 = dil_pairs[i]
        outs = _stack2_bwd_layer(
            streams[i], g_ext, lengths, layers[i], seeds[i], d1=d1, d2=d2,
            halo_max=halo, tile=tile, n_tiles=n_tiles, rate=rates[i],
            interpret=interpret, out_w=ow if i == n - 1 else None,
        )
        if i == n - 1:
            g_ext, dk1, db1, dk2, db2, dwt, dwb, dbf, dow, dob = outs
        else:
            g_ext, dk1, db1, dk2, db2, dwt, dwb, dbf = outs
        dlayers[i] = (dk1.astype(k1.dtype), db1[0].astype(b1.dtype),
                      dk2.astype(k2.dtype), db2[0].astype(b2.dtype),
                      dwt.astype(wt.dtype), dwb.astype(wb.dtype),
                      dbf[0].astype(bf.dtype))

    dx = g_ext[:, halo : halo + T].astype(x.dtype)
    dmask = np.zeros(mask.shape, jax.dtypes.float0)
    dseeds = tuple(np.zeros(s.shape, jax.dtypes.float0) for s in seeds)
    d_out = (dow.astype(ow.dtype), dob[0].astype(ob.dtype))
    return dx, dmask, tuple(dlayers), d_out, dseeds


_stack2_proj_vjp.defvjp(_stack2_proj_fwd, _stack2_proj_bwd)
