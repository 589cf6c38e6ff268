"""Fused dilated-residual-layer Pallas kernel.

One DilatedResidualLayer (models/layers.py, mirroring the reference's
basic.py:131-171) is five HBM round trips under naive lowering:
dilated conv3 -> ReLU -> 1x1 conv -> residual add -> LayerNorm.  This kernel
keeps a time tile plus its dilation halo in VMEM and does all five stages in
one pass: the k=3 dilated conv is three shifted (TT, C) @ (C, C) MXU matmuls,
the 1x1 conv a fourth, with the VPU handling ReLU/residual/LayerNorm —
~2 HBM touches per element instead of ~10.

Overlapping halo windows use ``pl.Element`` block dims (elementwise start
indices); x is pre-padded by ``dilation`` zeros on both time ends with one
XLA pad so every window is in-bounds and sequence-edge semantics match a
dense SAME conv.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _kernel(x_ref, wd_ref, bd_ref, w1_ref, b1_ref, g_ref, beta_ref, o_ref, *,
            dilation: int, halo: int, tile: int, use_ln: bool, eps: float):
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
    out = out + b1_ref[:].astype(jnp.float32) + mid.astype(jnp.float32)

    if use_ln:
        mean = out.mean(axis=-1, keepdims=True)
        var = ((out - mean) ** 2).mean(axis=-1, keepdims=True)
        out = (out - mean) * jax.lax.rsqrt(var + eps)
        out = out * g_ref[:].astype(jnp.float32) + beta_ref[:].astype(jnp.float32)

    o_ref[0, :, :] = out.astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("dilation", "use_ln", "eps", "tile", "interpret")
)
def dilated_residual_layer(x, wd, bd, w1, b1, gamma, beta, *, dilation: int,
                           use_ln: bool = True, eps: float = 1e-5,
                           tile: int = 512, interpret: bool = False):
    """Apply one fused dilated residual layer.

    x: (B, T, C) with padded frames already zeroed;
    wd: (3, C, C) dilated conv taps; w1: (C, C) pointwise; gamma/beta: (C,).
    Returns (B, T, C) = LN(x + W1 relu(dilated_conv3(x))) on valid frames.
    """
    B, T, C = x.shape
    d = dilation
    halo = -(-d // 8) * 8  # 8-aligned halo so the VMEM window tiles cleanly
    tile = min(tile, max(-(-T // 8) * 8, 8))
    n_tiles = pl.cdiv(T, tile)
    T_pad = n_tiles * tile

    # halo + round-up padding in one XLA pad
    x_p = jnp.pad(x, ((0, 0), (halo, halo + (T_pad - T)), (0, 0)))

    kernel = functools.partial(
        _kernel, dilation=d, halo=halo, tile=tile, use_ln=use_ln, eps=eps
    )

    out = pl.pallas_call(
        kernel,
        grid=(B, n_tiles),
        in_specs=[
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
    )(x_p, wd, bd, w1, b1, gamma, beta)
    return out[:, :T]
