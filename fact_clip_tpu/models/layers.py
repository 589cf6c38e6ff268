"""Core network layers as flax modules over batched, padded sequences.

Functionally equivalent to the reference's torch layers
(/root/reference/fact_clip/models/basic.py): the dilated-TCN frame branches
(MSTCN basic.py:173-220, MSTCN2 :222-281), the post-norm attention layers
(SALayer :391-452, SCALayer :454-523) and decoders (:525-593), the
single-head cross-attention with exposed probabilities/logits
(X2Y_map :335-389), the bidirectional GRU (:283-308), and the positional
encoding (:67-129) — redesigned for TPU:

* everything is batched ``(B, N, H)`` with explicit validity masks instead of
  the reference's B=1 sequence-major tensors;
* attention over padded keys is masked with -inf before the softmax, and
  dilated convolutions re-zero padding so boundary frames see exactly the
  zero-padding semantics of the B=1 reference;
* the GRU carries its hidden state through padded steps so bidirectional
  scans match the unpadded computation;
* parameter initializers replicate torch defaults so training dynamics are
  comparable.
"""

from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

# Mixed precision policy (cfg.TPU.compute_dtype="bfloat16"): modules take a
# ``dtype`` attribute (None = float32 everywhere).  Heavy matmuls/convs and
# the TCN inter-layer stream run in ``dtype`` with float32 accumulation
# (``preferred_element_type``); softmax, LayerNorm statistics, and every
# logit-producing output dense stay float32, so saves/losses are float32.


def _cast(x, dtype):
    return x if dtype is None else x.astype(dtype)


def _poslike(pos, x):
    """Positional table shaped for the fused X2Y kernel: channel-zero-extend
    to x's width (add_pos adds to the *leading* channels only) and give it a
    leading batch dim (kept at 1 when unbatched — the kernel broadcasts)."""
    if pos.ndim == 2:
        pos = pos[None]
    P, C = pos.shape[-1], x.shape[-1]
    if P < C:
        pos = jnp.pad(pos, ((0, 0), (0, 0), (0, C - P)))
    return pos.astype(x.dtype)

# --------------------------------------------------------------------------
# torch-style initializers


def torch_linear_kernel_init(key, shape, dtype=jnp.float32):
    """Kaiming-uniform(a=sqrt(5)) == U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    fan_in = shape[0]
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_linear_bias_init(fan_in):
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def torch_conv_init(key, shape, dtype=jnp.float32):
    """Conv kernel (k, in/groups, out): U(+-1/sqrt(k * in/groups))."""
    fan_in = shape[0] * shape[1]
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def uniform_init(bound):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class _Q8Dense(nn.Module):
    """Int8-evaluating stand-in for nn.Dense: identical param names/shapes
    ("kernel"/"bias"), so instantiating it under the same module name yields
    an interchangeable checkpoint tree.  Math: dynamic per-row activation
    scales + per-channel weight scales on the MXU
    (ops/pallas/quant_conv.py::dense_q8).  Eval only — not differentiated."""

    features: int
    kernel_init: Any
    bias_init: Any
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        w = self.param("kernel", self.kernel_init, (x.shape[-1], self.features), jnp.float32)
        b = self.param("bias", self.bias_init, (self.features,), jnp.float32)
        from ..ops.pallas.quant_conv import dense_q8

        y = dense_q8(x, w, b)
        return y.astype(self.dtype) if self.dtype is not None else y


class _F32OutDense(nn.Module):
    """Dense with low-precision operands and float32 accumulation/output.

    The MXU computes f32 matmuls at DEFAULT precision by rounding operands
    to bf16 anyway, so feeding bf16 operands explicitly and asking for an
    f32 result (``preferred_element_type``) preserves the accumulation
    fidelity of the "f32" dense while halving its input traffic and
    skipping the upcast pass — used for the tower out-projections whose
    trailing dims are class logits (they must stay f32 for the losses).
    Same param tree as nn.Dense (instantiated as ``Dense_0``).

    The equivalence (bf16 operands + f32 accumulation == DEFAULT-precision
    f32 dense) holds on TPU only; on CPU the old path ran a true f32
    matmul, so under mixed precision CPU logits carry bf16 operand
    rounding the TPU never adds.  The mixed-precision tolerance tests and
    the bf16 serving round-trip cover this — a CPU-parity drift here is
    expected rounding, not a kernel bug.
    """

    features: int
    dtype: Any
    kernel_init: Any
    bias_init: Any

    @nn.compact
    def __call__(self, x):
        k = self.param("kernel", self.kernel_init, (x.shape[-1], self.features))
        b = self.param("bias", self.bias_init, (self.features,))
        y = jax.lax.dot_general(
            x.astype(self.dtype), k.astype(self.dtype),
            (((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return y + b.astype(jnp.float32)


class TorchDenseParams(nn.Module):
    """Parameter-tree twin of TorchDense (TorchDense_N/Dense_0/{kernel,bias}).

    Used by the fused tower out-projection: the params are declared at the
    identical path/init as the TorchDense the unfused branches call, so
    checkpoints are interchangeable, but the matmul itself runs inside the
    fused Pallas stack (ops/pallas/dilated_conv.py ``out_params``).
    Instantiate with the explicit ``name`` the auto-counter would have
    assigned (``TorchDense_1`` after an in_map dense, else ``TorchDense_0``).
    """

    features: int
    in_dim: int

    @nn.compact
    def __call__(self):
        return _TorchDenseParams(self.features, self.in_dim, name="Dense_0")()


class TorchDense(nn.Module):
    """nn.Dense with torch nn.Linear default initialization.

    ``dtype`` is the computation dtype (params stay float32); None keeps
    full float32.  ``quantize="int8"`` evaluates through the int8 MXU dense
    (same param tree; callers gate it to deterministic/eval use).
    ``out_f32`` (only meaningful with a low-precision ``dtype``): compute
    with bf16 operands but return f32 (see _F32OutDense).
    """

    features: int
    dtype: Any = None
    quantize: str = ""
    out_f32: bool = False

    @nn.compact
    def __call__(self, x):
        in_dim = x.shape[-1]
        if self.out_f32 and self.dtype is not None and self.quantize != "int8":
            return _F32OutDense(
                self.features, dtype=self.dtype,
                kernel_init=torch_linear_kernel_init,
                bias_init=torch_linear_bias_init(in_dim),
                name="Dense_0",
            )(x)
        cls = _Q8Dense if self.quantize == "int8" else nn.Dense
        return cls(
            self.features,
            kernel_init=torch_linear_kernel_init,
            bias_init=torch_linear_bias_init(in_dim),
            dtype=self.dtype,
            name="Dense_0",
        )(x)


# --------------------------------------------------------------------------
# positional encoding


def positional_encoding_table(length: int, d_model: int, empty: bool = False) -> jnp.ndarray:
    """Sin/cos positional encoding table (length, d_model).

    Matches PositionalEncoding.__compute_pe__ (basic.py:92-103); ``empty``
    yields zeros (used when cfg.FACT.fpos is false).
    """
    if empty:
        return jnp.zeros((length, d_model), jnp.float32)
    position = jnp.arange(length, dtype=jnp.float32)[:, None]
    div_term = jnp.exp(jnp.arange(0, d_model, 2, dtype=jnp.float32) * (-math.log(10000.0) / d_model))
    ang = position * div_term  # (length, ceil(d/2))
    pe = jnp.zeros((length, d_model), jnp.float32)
    pe = pe.at[:, 0::2].set(jnp.sin(ang))
    pe = pe.at[:, 1::2].set(jnp.cos(ang[:, : d_model // 2]))
    return pe


def add_pos(x: jnp.ndarray, pos: Optional[jnp.ndarray]) -> jnp.ndarray:
    """Add a positional encoding to the first pos-dim channels of ``x``.

    Matches add_positional_encoding (basic.py:313-320): ``pos`` may have
    fewer channels than ``x``; only the leading channels are shifted.
    """
    if pos is None:
        return x
    d = pos.shape[-1]
    if d == x.shape[-1]:
        return x + pos
    return jnp.concatenate([x[..., :d] + pos, x[..., d:]], axis=-1)


# --------------------------------------------------------------------------
# dilated temporal convolution stacks (frame branches)


def _dilated_conv(x, kernel, bias, dilation, ngroup):
    """(B, T, C) x (3, C/g, C) grouped dilated conv with SAME zero padding."""
    out = jax.lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(1,),
        padding=[(dilation, dilation)],
        rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=ngroup,
    )
    return out + bias


class DilatedResidualLayer(nn.Module):
    """Dilated conv3 -> ReLU -> 1x1 -> dropout -> residual (+LayerNorm).

    Matches basic.py:131-171.  Padded frames are zeroed on input so valid
    frames near the boundary see zero padding exactly like the B=1 reference.

    With ``use_pallas`` (inference path, ungrouped), all five stages run in
    one fused Pallas kernel (ops/pallas/dilated_conv.py).
    """

    dilation: int
    nchannels: int
    dropout: float = 0.5
    layernorm: bool = True
    ngroup: int = 1
    use_pallas: bool = False
    dtype: Any = None

    def setup(self):
        C, g = self.nchannels, self.ngroup
        self.k_dil = self.param("conv_dilated_kernel", torch_conv_init, (3, C // g, C))
        self.b_dil = self.param("conv_dilated_bias", uniform_init(1.0 / math.sqrt(3 * C // g)), (C,))
        self.k_1x1 = self.param("conv_1x1_kernel", torch_linear_kernel_init, (C, C))
        self.b_1x1 = self.param("conv_1x1_bias", torch_linear_bias_init(C), (C,))
        if self.layernorm:
            self.ln_g = self.param("ln_scale", nn.initializers.ones, (C,))
            self.ln_b = self.param("ln_bias", nn.initializers.zeros, (C,))

    def param_tuple(self):
        """(wd, bd, w1, b1, gamma, beta) for the fused-stack API, compute
        dtype applied to the matmul weights."""
        C = self.nchannels
        gamma = self.ln_g if self.layernorm else jnp.ones((C,), jnp.float32)
        beta = self.ln_b if self.layernorm else jnp.zeros((C,), jnp.float32)
        return (_cast(self.k_dil, self.dtype), self.b_dil,
                _cast(self.k_1x1, self.dtype), self.b_1x1, gamma, beta)

    def __call__(self, x, mask, deterministic: bool):
        C, g = self.nchannels, self.ngroup
        kernel, kbias = self.k_dil, self.b_dil
        w1, b1 = self.k_1x1, self.b_1x1
        if self.layernorm:
            gamma, beta = self.ln_g, self.ln_b

        xm = _cast(x, self.dtype) * mask[:, :, None].astype(self.dtype or x.dtype)

        # fused path (ungrouped): inference and training both.  Training
        # dropout runs inside the kernel from the on-core PRNG, seeded from
        # the flax dropout rng; the custom VJP regenerates the mask.
        if self.use_pallas and g == 1:
            from ..ops.pallas.dilated_conv import dilated_residual_layer

            rate = 0.0 if deterministic else float(self.dropout)
            if rate > 0.0:
                seed = jax.random.randint(
                    self.make_rng("dropout"), (1,), 0, jnp.iinfo(jnp.int32).max, jnp.int32
                )
            else:
                seed = None
            return dilated_residual_layer(
                xm, _cast(kernel, self.dtype), kbias, _cast(w1, self.dtype), b1,
                gamma if self.layernorm else jnp.ones((C,), jnp.float32),
                beta if self.layernorm else jnp.zeros((C,), jnp.float32),
                dilation=self.dilation, use_ln=self.layernorm,
                rate=rate, seed=seed,
            )

        out = jax.nn.relu(_dilated_conv(xm, _cast(kernel, self.dtype), kbias, self.dilation, g))
        out = _cast(out, self.dtype) @ _cast(w1, self.dtype) + b1  # the 1x1 conv is pointwise
        # inline dropout (same math as nn.Dropout; this is a setup-style
        # module, so no submodules may be created here)
        if not deterministic and self.dropout > 0.0:
            keep = jax.random.bernoulli(self.make_rng("dropout"), 1.0 - self.dropout, out.shape)
            out = jnp.where(keep, out / (1.0 - self.dropout), jnp.zeros_like(out))
        x = (xm + out).astype(jnp.float32)  # LayerNorm statistics in f32
        if self.layernorm:
            mean = x.mean(axis=-1, keepdims=True)
            var = ((x - mean) ** 2).mean(axis=-1, keepdims=True)
            x = (x - mean) * jax.lax.rsqrt(var + 1e-5) * gamma + beta
        return _cast(x, self.dtype)


class MSTCN(nn.Module):
    """Stack of dilated residual layers with 1x1 in/out maps (basic.py:173-220)."""

    in_dim: int
    hid_dim: int
    out_dim: int
    num_layers: int
    dropout: float = 0.5
    dilation_factor: int = 2
    ln: bool = True
    ngroup: int = 1
    in_map: bool = False
    use_pallas: bool = False
    quantize: str = ""  # "int8": quantized inference towers (eval only)
    dtype: Any = None

    @nn.compact
    def __call__(self, x, mask, deterministic: bool):
        if self.in_map:
            # in_map is the largest single matmul (D -> C): quantize it too
            # on the eval path when the towers are quantized (grouped convs
            # never quantize — the tower falls to the unfused path there)
            q = self.quantize if deterministic and self.ngroup == 1 else ""
            x = TorchDense(self.hid_dim, dtype=self.dtype, quantize=q)(x)
        else:
            assert self.in_dim == self.hid_dim
        layers = [
            DilatedResidualLayer(
                dilation=self.dilation_factor**i,
                nchannels=self.hid_dim,
                dropout=self.dropout,
                layernorm=self.ln,
                ngroup=self.ngroup,
                use_pallas=self.use_pallas,
                dtype=self.dtype,
            )
            for i in range(self.num_layers)
        ]
        if self.use_pallas and self.ngroup == 1:
            # fused tower: one halo pad + N kernels + one slice instead of a
            # pad/slice round trip per layer (ops/pallas/dilated_conv.py)
            rate = 0.0 if deterministic else float(self.dropout)
            L = self.num_layers
            if self.quantize == "int8" and deterministic:
                # int8 MXU tower (2x bf16 peak): eval path only — the
                # rounding step is not differentiated (ops/pallas/quant_conv)
                from ..ops.pallas.quant_conv import dilated_residual_stack_q8

                x = dilated_residual_stack_q8(
                    _cast(x, self.dtype), mask,
                    [l.param_tuple() for l in layers],
                    [self.dilation_factor**i for i in range(L)],
                    use_ln=self.ln,
                )
            else:
                from ..ops.pallas.dilated_conv import dilated_residual_stack

                if rate > 0.0:
                    bits = jax.random.randint(
                        self.make_rng("dropout"), (L, 1), 0, jnp.iinfo(jnp.int32).max, jnp.int32
                    )
                    seeds = tuple(bits[i] for i in range(L))
                else:
                    seeds = None
                # the out projection (C -> out_dim; trailing dims are the
                # frame logits) runs inside the stack's last kernel — the
                # final stream never round-trips HBM (fwd or bwd).  Params
                # declared at the TorchDense-compatible tree path.
                ow, ob = TorchDenseParams(
                    self.out_dim, self.hid_dim,
                    name="TorchDense_1" if self.in_map else "TorchDense_0",
                )()
                return dilated_residual_stack(
                    _cast(x, self.dtype), mask,
                    [l.param_tuple() for l in layers],
                    [self.dilation_factor**i for i in range(L)],
                    use_ln=self.ln, rates=(rate,) * L, seeds=seeds,
                    out_params=(_cast(ow, self.dtype), ob),
                )
        else:
            for layer in layers:
                x = layer(x, mask, deterministic)
        # output dense emits float32 (its trailing dims are class logits);
        # under mixed precision it computes with bf16 operands + f32
        # accumulation (_F32OutDense) — same MXU math as the f32 matmul at
        # DEFAULT precision, half the input traffic
        return TorchDense(self.out_dim, dtype=self.dtype, out_f32=True)(
            x if self.dtype is not None else x.astype(jnp.float32))


class MSTCN2(nn.Module):
    """MS-TCN++ dual-dilation variant (basic.py:222-281)."""

    in_dim: int
    hid_dim: int
    out_dim: int
    num_layers: int
    dropout: float = 0.5
    dilation_factor: int = 2
    ngroup: int = 1
    in_map: bool = True
    dtype: Any = None

    use_pallas: bool = False
    quantize: str = ""  # "int8": quantized inference towers (eval only)

    @nn.compact
    def __call__(self, x, mask, deterministic: bool):
        if self.in_map:
            q = self.quantize if deterministic and self.ngroup == 1 else ""
            f = TorchDense(self.hid_dim, dtype=self.dtype, quantize=q)(x)
        else:
            assert self.in_dim == self.hid_dim
            f = _cast(x, self.dtype)
        C, g = self.hid_dim, self.ngroup
        L = self.num_layers
        m = mask[:, :, None].astype(f.dtype)

        layer_params, dil_pairs = [], []
        for i in range(L):
            d1 = self.dilation_factor ** (L - 1 - i)
            d2 = self.dilation_factor**i
            k1 = self.param(f"conv_dilated_1_{i}_kernel", torch_conv_init, (3, C // g, C))
            b1 = self.param(f"conv_dilated_1_{i}_bias", uniform_init(1.0 / math.sqrt(3 * C // g)), (C,))
            k2 = self.param(f"conv_dilated_2_{i}_kernel", torch_conv_init, (3, C // g, C))
            b2 = self.param(f"conv_dilated_2_{i}_bias", uniform_init(1.0 / math.sqrt(3 * C // g)), (C,))
            wf = self.param(f"fuse_{i}_kernel", torch_linear_kernel_init, (2 * C, C))
            bf = self.param(f"fuse_{i}_bias", torch_linear_bias_init(2 * C), (C,))
            layer_params.append((k1, b1, k2, b2, wf, bf))
            dil_pairs.append((d1, d2))

        if self.use_pallas and g == 1:
            dt = self.dtype
            stacked = [
                (_cast(k1, dt), b1, _cast(k2, dt), b2,
                 _cast(wf[:C], dt), _cast(wf[C:], dt), bf)
                for (k1, b1, k2, b2, wf, bf) in layer_params
            ]
            if self.quantize == "int8" and deterministic:
                # int8 MXU tower: eval path only (ops/pallas/quant_conv.py)
                from ..ops.pallas.quant_conv import dilated_residual2_stack_q8

                f = dilated_residual2_stack_q8(f, mask, stacked, dil_pairs)
            else:
                from ..ops.pallas.dilated_conv import dilated_residual2_stack

                # dropout on all but the last layer (torch MS-TCN++ behavior)
                rate = 0.0 if deterministic else float(self.dropout)
                rates = [rate] * (L - 1) + [0.0]
                if rate > 0.0:
                    bits = jax.random.randint(
                        self.make_rng("dropout"), (L, 1), 0, jnp.iinfo(jnp.int32).max, jnp.int32
                    )
                    seeds = tuple(bits[i] for i in range(L))
                else:
                    seeds = None
                # out projection fused into the last layer (see MSTCN)
                ow, ob = TorchDenseParams(
                    self.out_dim, self.hid_dim,
                    name="TorchDense_1" if self.in_map else "TorchDense_0",
                )()
                return dilated_residual2_stack(
                    f, mask, stacked, dil_pairs, rates=rates, seeds=seeds,
                    out_params=(_cast(ow, dt), ob),
                )
        else:
            for i, ((k1, b1, k2, b2, wf, bf), (d1, d2)) in enumerate(zip(layer_params, dil_pairs)):
                f_in = f
                fm = f * m
                cat = jnp.concatenate(
                    [_dilated_conv(fm, _cast(k1, self.dtype), b1, d1, g),
                     _dilated_conv(fm, _cast(k2, self.dtype), b2, d2, g)], axis=-1
                )
                h = jax.nn.relu(_cast(cat, self.dtype) @ _cast(wf, self.dtype) + bf)
                f = _cast(h, self.dtype)
                if i != L - 1:
                    f = nn.Dropout(self.dropout)(f, deterministic=deterministic)
                f = f + f_in
        # f32 logits out; bf16 operands under mixed precision (see MSTCN)
        return TorchDense(self.out_dim, dtype=self.dtype, out_f32=True)(
            f if self.dtype is not None else f.astype(jnp.float32))


# --------------------------------------------------------------------------
# attention


class _TorchDenseParams(nn.Module):
    """Parameter twin of TorchDense's inner nn.Dense (same scope leaves:
    kernel/bias, same torch nn.Linear init) consumed by a split apply."""

    features: int
    in_dim: int

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", torch_linear_kernel_init, (self.in_dim, self.features))
        bias = self.param("bias", torch_linear_bias_init(self.in_dim), (self.features,))
        return kernel, bias


class SplitTorchDense(nn.Module):
    """TorchDense over a PAIR of inputs: equals TorchDense(concat([a, b]))
    but computes ``a @ W[:da] + b @ W[da:] + bias`` so the (B, T, da+db)
    concat never materializes in HBM (and its backward never splits a
    gradient concat).  Parameter tree is identical to TorchDense
    (``Dense_0/{kernel,bias}`` with kernel (da+db, features)), so
    checkpoints, torch_import and torch_export are unchanged."""

    features: int
    dtype: Any = None

    @nn.compact
    def __call__(self, a, b):
        da = a.shape[-1]
        in_dim = da + b.shape[-1]
        kernel, bias = _TorchDenseParams(self.features, in_dim, name="Dense_0")()
        # mirror nn.Dense dtype semantics: promote inputs/params to dtype
        ka = _cast(kernel[:da], self.dtype)
        kb = _cast(kernel[da:], self.dtype)
        out = _cast(a, self.dtype) @ ka + _cast(b, self.dtype) @ kb
        return out + _cast(bias, self.dtype)


class _DenseParams(nn.Module):
    """Parameter twin of an nn.Dense (same scope leaves: kernel/bias) whose
    weights are consumed by a fused kernel instead of being applied here."""

    features: int
    kernel_init: Any = None  # None -> xavier uniform (nn.Dense default here)

    @nn.compact
    def __call__(self, in_dim: int):
        init = self.kernel_init or nn.initializers.xavier_uniform()
        kernel = self.param("kernel", init, (in_dim, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return kernel, bias


class _LNParams(nn.Module):
    """Parameter twin of nn.LayerNorm (scale/bias leaves) for fused kernels."""

    @nn.compact
    def __call__(self, dim: int):
        scale = self.param("scale", nn.initializers.ones, (dim,))
        bias = self.param("bias", nn.initializers.zeros, (dim,))
        return scale, bias


class _MHAParams(nn.Module):
    """Parameter twin of MultiHeadAttention for the fused self-attention
    sublayer kernel (same scope leaves: {q,k,v,out}_proj/{kernel,bias})."""

    embed_dim: int

    @nn.compact
    def __call__(self):
        E = self.embed_dim
        wq, bq = _DenseParams(E, name="q_proj")(E)
        wk, bk = _DenseParams(E, name="k_proj")(E)
        wv, bv = _DenseParams(E, name="v_proj")(E)
        wo, bo = _DenseParams(E, kernel_init=torch_linear_kernel_init, name="out_proj")(E)
        return wq, bq, wk, bk, wv, bv, wo, bo


class _TorchDenseTwin(nn.Module):
    """Parameter twin of TorchDense (TorchDense_i/Dense_0/{kernel,bias})."""

    features: int
    in_dim: int

    @nn.compact
    def __call__(self):
        return _TorchDenseParams(self.features, self.in_dim, name="Dense_0")()


class MultiHeadAttention(nn.Module):
    """torch nn.MultiheadAttention equivalent (batch-first, masked keys).

    ``key_pos``: optional positional term added to the key-projection input
    (the caller may pass ``key`` already pos-added instead; ``key_pos`` keeps
    the raw memory visible so the fused path can add it in-kernel).

    With ``use_pallas``, long-key cross-attention (keys >= pallas_min_keys,
    prefix-contiguous key_mask — guaranteed by data/batching.py) runs the
    fused flash kernel (ops/pallas/mha_attn.py): K/V projections, all-head
    logits, online softmax, in-kernel attention dropout.  Short keys and
    self-attention keep the XLA path; both paths share one parameter tree.
    """

    embed_dim: int
    num_heads: int
    dropout: float = 0.0
    dtype: Any = None
    use_pallas: bool = False
    quantize: str = ""  # "int8": quantized K/V projections (eval only)
    pallas_interpret: bool = False  # tests only
    pallas_min_keys: int = 1024
    # False declares key_pos a constant (FACT's frame PE table): the fused
    # backward then skips the dxk stream it would only need for d(key_pos)
    key_pos_grad: bool = True

    @nn.compact
    def __call__(self, query, key, value, key_mask=None, deterministic: bool = True,
                 key_pos=None):
        E, H = self.embed_dim, self.num_heads
        assert E % H == 0
        hd = E // H
        xavier = nn.initializers.xavier_uniform()
        zeros = nn.initializers.zeros

        q = nn.Dense(E, kernel_init=xavier, bias_init=zeros, dtype=self.dtype, name="q_proj")(query)

        B, Nq, _ = q.shape
        Nk, Ck = key.shape[1], key.shape[-1]
        fuse = (
            self.use_pallas
            and Nk >= self.pallas_min_keys
            and key is value  # cross-attention to raw memory (SCA layout)
            and E % 128 == 0
            and Ck % 128 == 0
        )
        if fuse:
            from ..ops.pallas.mha_attn import mha_cross_attention

            wk, bk = _DenseParams(E, name="k_proj")(Ck)
            wv, bv = _DenseParams(E, name="v_proj")(Ck)
            rate = 0.0 if deterministic else float(self.dropout)
            if rate > 0.0:
                seed = jax.random.randint(
                    self.make_rng("dropout"), (1,), 0, jnp.iinfo(jnp.int32).max, jnp.int32
                )
            else:
                seed = None
            x_len = (key_mask.astype(jnp.int32).sum(axis=1) if key_mask is not None
                     else jnp.full((B,), Nk, jnp.int32))
            xc = _cast(value, self.dtype)
            pos = (_poslike(key_pos, xc) if key_pos is not None
                   else jnp.zeros((1,) + xc.shape[1:], xc.dtype))
            if self.quantize == "int8" and deterministic:
                # K/V projections on int8 MXU operands (eval only)
                from ..ops.pallas.quant_conv import mha_cross_attention_q8

                out = mha_cross_attention_q8(
                    _cast(q, self.dtype), xc, pos,
                    _cast(wk, self.dtype), bk, _cast(wv, self.dtype), bv, x_len,
                    num_heads=H, interpret=self.pallas_interpret,
                )
            else:
                out = mha_cross_attention(
                    _cast(q, self.dtype), xc, pos,
                    _cast(wk, self.dtype), bk, _cast(wv, self.dtype), bv, x_len,
                    num_heads=H, rate=rate, seed=seed, interpret=self.pallas_interpret,
                    pos_grad=self.key_pos_grad,
                )
            out = nn.Dense(
                E, kernel_init=torch_linear_kernel_init, bias_init=zeros, name="out_proj"
            )(out.astype(jnp.float32))
            return out

        if key_pos is not None:
            key = add_pos(key, key_pos)
        k = nn.Dense(E, kernel_init=xavier, bias_init=zeros, dtype=self.dtype, name="k_proj")(key)
        v = nn.Dense(E, kernel_init=xavier, bias_init=zeros, dtype=self.dtype, name="v_proj")(value)

        B, Nq, _ = q.shape
        Nk = k.shape[1]
        q = q.reshape(B, Nq, H, hd).transpose(0, 2, 1, 3)
        k = k.reshape(B, Nk, H, hd).transpose(0, 2, 1, 3)
        v = v.reshape(B, Nk, H, hd).transpose(0, 2, 1, 3)

        # logits accumulate in f32; softmax in f32 for stability
        logits = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
        ) / math.sqrt(hd)
        if key_mask is not None:
            logits = jnp.where(key_mask[:, None, None, :], logits, -jnp.inf)
        probs = jax.nn.softmax(logits, axis=-1)
        probs = nn.Dropout(self.dropout)(probs, deterministic=deterministic)
        out = jnp.einsum(
            "bhqk,bhkd->bhqd", _cast(probs, self.dtype), v,
            preferred_element_type=jnp.float32,
        )
        out = out.transpose(0, 2, 1, 3).reshape(B, Nq, E)
        out = nn.Dense(
            E, kernel_init=torch_linear_kernel_init, bias_init=zeros, name="out_proj"
        )(out)
        return out


class X2YMap(nn.Module):
    """Single-head cross-attention with exposed probabilities and logits.

    Matches X2Y_map (basic.py:335-389): K/V from X, Q from Y, concat of the
    attended feature with Y, then a linear map to ``y_outdim``.  Returns
    (y_out, probs, logits) with probs/logits of shape (B, Y, X) — the losses
    and the two-branch decode consume them, so they are materialized (X or Y
    is the small action-token axis, never T x T).
    """

    x_dim: int
    y_dim: int
    y_outdim: int
    head_dim: int
    dropout: float = 0.5
    kq_pos: bool = False
    dtype: Any = None
    use_pallas: bool = False
    quantize: str = ""  # "int8": quantized large-axis projections (eval only)
    pallas_interpret: bool = False  # tests only

    @nn.compact
    def __call__(self, x_feat, y_feat, x_pos=None, y_pos=None, x_mask=None, deterministic=True):
        d = self.head_dim
        Cx, Cy = x_feat.shape[-1], y_feat.shape[-1]
        wk = self.param("xk_kernel", torch_linear_kernel_init, (Cx, d))
        bk = self.param("xk_bias", torch_linear_bias_init(Cx), (d,))
        wv = self.param("xv_kernel", torch_linear_kernel_init, (Cx, d))
        bv = self.param("xv_bias", torch_linear_bias_init(Cx), (d,))
        wq = self.param("yq_kernel", torch_linear_kernel_init, (Cy, d))
        bq = self.param("yq_bias", torch_linear_bias_init(Cy), (d,))

        use_kq_xpos = x_pos is not None and self.kq_pos
        use_kq_ypos = y_pos is not None and self.kq_pos

        if self.use_pallas:
            # fused projection+logits+softmax+attend kernel; valid-key masks
            # are prefix-contiguous by construction (data/batching.py)
            if self.quantize == "int8" and deterministic:
                # large-axis projections on int8 MXU operands (eval only)
                from ..ops.pallas.quant_conv import x2y_attention_q8 as x2y_fn
            else:
                from ..ops.pallas.x2y_attn import x2y_attention as x2y_fn

            X = x_feat.shape[1]
            x_len = (x_mask.astype(jnp.int32).sum(axis=1) if x_mask is not None
                     else jnp.full((x_feat.shape[0],), X, jnp.int32))
            xc = _cast(x_feat, self.dtype)
            yc = _cast(y_feat, self.dtype)
            zeros_x = jnp.zeros_like(xc) if not use_kq_xpos else _poslike(x_pos, xc)
            zeros_y = jnp.zeros_like(yc) if not use_kq_ypos else _poslike(y_pos, yc)
            attn_feat, probs, logits = x2y_fn(
                yc, zeros_y, xc, zeros_x,
                _cast(wk, self.dtype), bk, _cast(wv, self.dtype), bv,
                _cast(wq, self.dtype), bq, x_len,
                interpret=self.pallas_interpret,
            )
        else:
            xk_in = add_pos(x_feat, x_pos) if use_kq_xpos else x_feat
            yq_in = add_pos(y_feat, y_pos) if use_kq_ypos else y_feat
            xk = _cast(xk_in, self.dtype) @ _cast(wk, self.dtype) + bk
            xv = _cast(x_feat, self.dtype) @ _cast(wv, self.dtype) + bv
            yq = _cast(yq_in, self.dtype) @ _cast(wq, self.dtype) + bq

            # logits/probs stay f32 — they are materialized for losses/decode
            logits = jnp.einsum(
                "byd,bxd->byx", yq, xk, preferred_element_type=jnp.float32
            ) / math.sqrt(d)
            if x_mask is not None:
                logits = jnp.where(x_mask[:, None, :], logits, -jnp.inf)
            probs = jax.nn.softmax(logits, axis=-1)

            attn_feat = jnp.einsum(
                "byx,bxh->byh", _cast(probs, self.dtype), xv,
                preferred_element_type=jnp.float32,
            )
            if x_mask is not None:
                # keep stored logits finite at masked keys for log-softmax
                logits = jnp.where(x_mask[:, None, :], logits, -1e9)

        # out map as a split dense: dropout(concat([y, attn])) @ W ==
        # dropout(y) @ W[:Cy] + dropout(attn) @ W[Cy:], and the (B, Y, Cy+d)
        # concat (f32, ~100 MB at flagship u-block scale) never materializes.
        # Not a logit head (process_feature owns those), so it may run in
        # the compute dtype under mixed precision.
        wo = self.param("out_kernel", torch_linear_kernel_init, (Cy + d, self.y_outdim))
        bo = self.param("out_bias", torch_linear_bias_init(Cy + d), (self.y_outdim,))
        y_d = nn.Dropout(self.dropout)(y_feat, deterministic=deterministic)
        a_d = nn.Dropout(self.dropout)(attn_feat.astype(y_feat.dtype),
                                       deterministic=deterministic)
        y_out = (
            jnp.dot(_cast(y_d, self.dtype), _cast(wo[:Cy], self.dtype),
                    preferred_element_type=jnp.float32)
            + jnp.dot(_cast(a_d, self.dtype), _cast(wo[Cy:], self.dtype),
                      preferred_element_type=jnp.float32)
            + bo
        )
        # mixed precision: emit the stream at the compute dtype (f32 MXU
        # accumulation above is unchanged) so the downstream branch and this
        # dense's backward run at half the HBM width; probs/logits stay f32
        y_out = _cast(y_out, self.dtype)
        return y_out, probs, logits


def _dropout_seed(mod: nn.Module, needed: bool):
    """(1,)-int32 seed for an in-kernel dropout PRNG, or None when inert."""
    if not needed:
        return None
    return jax.random.randint(
        mod.make_rng("dropout"), (1,), 0, jnp.iinfo(jnp.int32).max, jnp.int32
    )


def _shared_pos(query_pos):
    """True when pos is one table shared across the batch (the SADecoder /
    SCADecoder layout) — the fused kernel keeps it VMEM-resident and
    accumulates its gradient in-kernel; per-video pos falls back to XLA."""
    return query_pos is None or query_pos.ndim == 2 or query_pos.shape[0] == 1


def _fused_pos(query_pos, x, E):
    _, M, _ = x.shape
    if query_pos is None:
        return jnp.zeros((1, M, E), jnp.float32)
    return _poslike(query_pos, x).astype(jnp.float32)


class SALayer(nn.Module):
    """Post-norm transformer layer: MHA + FFN (basic.py:391-452).

    With ``use_pallas_sa`` and a pure self-attention call pattern
    (key is tgt is value, shared pos, no mask — the SADecoder layout), the
    whole layer runs as two fused Pallas sublayer kernels
    (ops/pallas/sa_layer.py) — one video per grid step, all projections +
    softmax + dropout + residual + LayerNorm in VMEM.  Parameter tree is
    identical to the XLA path (twin modules), so checkpoints interop.
    """

    q_dim: int
    nhead: int
    dim_feedforward: int = 2048
    dropout: float = 0.1
    attn_dropout: float = 0.1
    dtype: Any = None
    use_pallas_sa: bool = False
    pallas_interpret: bool = False  # tests only

    @nn.compact
    def __call__(self, tgt, key, value, query_pos=None, key_pos=None, key_mask=None, deterministic=True):
        fuse = (
            self.use_pallas_sa
            and key is tgt
            and value is tgt
            and key_pos is query_pos
            and key_mask is None
            and self.q_dim % self.nhead == 0
            and _shared_pos(query_pos)
        )
        if fuse:
            from ..ops.pallas.sa_layer import ffn_sublayer, sa_sublayer

            E, F = self.q_dim, self.dim_feedforward
            wq, bq, wk, bk, wv, bv, wo, bo = _MHAParams(E, name="MultiHeadAttention_0")()
            ls0, lb0 = _LNParams(name="LayerNorm_0")(E)
            w1, b1 = _TorchDenseTwin(F, E, name="TorchDense_0")()
            w2, b2 = _TorchDenseTwin(E, F, name="TorchDense_1")()
            ls1, lb1 = _LNParams(name="LayerNorm_1")(E)

            rate = 0.0 if deterministic else float(self.dropout)
            rate_attn = 0.0 if deterministic else float(self.attn_dropout)
            x = tgt.astype(jnp.float32)
            bf16 = self.dtype == jnp.bfloat16
            y = sa_sublayer(
                x, _fused_pos(query_pos, x, E), wq, bq, wk, bk, wv, bv, wo, bo,
                ls0, lb0, num_heads=self.nhead, rate_attn=rate_attn, rate=rate,
                seed=_dropout_seed(self, rate > 0.0 or rate_attn > 0.0),
                bf16=bf16, interpret=self.pallas_interpret,
            )
            return ffn_sublayer(
                y, w1, b1, w2, b2, ls1, lb1, rate=rate,
                seed=_dropout_seed(self, rate > 0.0),
                bf16=bf16, interpret=self.pallas_interpret,
            )

        query = add_pos(tgt, query_pos)
        key = add_pos(key, key_pos)
        tgt2 = MultiHeadAttention(self.q_dim, self.nhead, self.attn_dropout, dtype=self.dtype)(
            query, key, value, key_mask=key_mask, deterministic=deterministic
        )
        tgt = tgt + nn.Dropout(self.dropout)(tgt2, deterministic=deterministic)
        tgt = nn.LayerNorm()(tgt)

        ff = TorchDense(self.dim_feedforward, dtype=self.dtype)(tgt)
        ff = nn.Dropout(self.dropout)(jax.nn.relu(ff), deterministic=deterministic)
        tgt2 = TorchDense(self.q_dim)(ff.astype(jnp.float32))
        tgt = tgt + nn.Dropout(self.dropout)(tgt2, deterministic=deterministic)
        tgt = nn.LayerNorm()(tgt)
        return tgt


class SCALayer(nn.Module):
    """Self-attention over tokens + cross-attention to frame memory + FFN
    (basic.py:454-523).

    ``use_pallas_sa`` fuses the token self-attention and FFN sublayers into
    per-video Pallas kernels (ops/pallas/sa_layer.py); the cross-attention
    keeps its own fused flash path (``use_pallas``).  Parameter tree matches
    the XLA path exactly (twin modules + pinned LayerNorm auto-names).
    """

    action_dim: int
    frame_dim: int
    nhead: int
    dim_feedforward: int = 2048
    dropout: float = 0.1
    attn_dropout: float = 0.1
    dtype: Any = None
    use_pallas: bool = False
    use_pallas_sa: bool = False
    quantize: str = ""  # "int8": quantized cross-attn K/V projections (eval only)
    pallas_interpret: bool = False  # tests only
    pos_grad: bool = True  # False: memory pos is a constant (FACT PE table)

    @nn.compact
    def __call__(self, tgt, memory, pos=None, query_pos=None, memory_mask=None, deterministic=True):
        fuse = (self.use_pallas_sa and self.action_dim % self.nhead == 0
                and _shared_pos(query_pos))
        E, F = self.action_dim, self.dim_feedforward
        bf16 = self.dtype == jnp.bfloat16
        rate = 0.0 if deterministic else float(self.dropout)
        rate_attn = 0.0 if deterministic else float(self.attn_dropout)
        if fuse:
            from ..ops.pallas.sa_layer import ffn_sublayer, sa_sublayer

            wq, bq, wk, bk, wv, bv, wo, bo = _MHAParams(E, name="self_attn")()
            ls0, lb0 = _LNParams(name="LayerNorm_0")(E)
            x = tgt.astype(jnp.float32)
            tgt = sa_sublayer(
                x, _fused_pos(query_pos, x, E), wq, bq, wk, bk, wv, bv, wo, bo,
                ls0, lb0, num_heads=self.nhead, rate_attn=rate_attn, rate=rate,
                seed=_dropout_seed(self, rate > 0.0 or rate_attn > 0.0),
                bf16=bf16, interpret=self.pallas_interpret,
            )
        else:
            q = add_pos(tgt, query_pos)
            tgt2 = MultiHeadAttention(self.action_dim, self.nhead, self.attn_dropout, dtype=self.dtype, name="self_attn")(
                q, q, tgt, deterministic=deterministic
            )
            tgt = tgt + nn.Dropout(self.dropout)(tgt2, deterministic=deterministic)
            tgt = nn.LayerNorm(name="LayerNorm_0")(tgt)

        query = add_pos(tgt, query_pos)
        tgt2 = MultiHeadAttention(
            self.action_dim, self.nhead, self.attn_dropout, dtype=self.dtype,
            use_pallas=self.use_pallas, quantize=self.quantize,
            key_pos_grad=self.pos_grad, name="cross_attn",
        )(
            query, memory, memory, key_mask=memory_mask, deterministic=deterministic,
            key_pos=pos,
        )
        tgt = tgt + nn.Dropout(self.dropout)(tgt2, deterministic=deterministic)
        tgt = nn.LayerNorm(name="LayerNorm_1")(tgt)

        if fuse:
            w1, b1 = _TorchDenseTwin(F, E, name="TorchDense_0")()
            w2, b2 = _TorchDenseTwin(E, F, name="TorchDense_1")()
            ls2, lb2 = _LNParams(name="LayerNorm_2")(E)
            return ffn_sublayer(
                tgt.astype(jnp.float32), w1, b1, w2, b2, ls2, lb2, rate=rate,
                seed=_dropout_seed(self, rate > 0.0),
                bf16=bf16, interpret=self.pallas_interpret,
            )

        ff = TorchDense(self.dim_feedforward, dtype=self.dtype)(tgt)
        ff = nn.Dropout(self.dropout)(jax.nn.relu(ff), deterministic=deterministic)
        tgt2 = TorchDense(self.action_dim)(ff.astype(jnp.float32))
        tgt = tgt + nn.Dropout(self.dropout)(tgt2, deterministic=deterministic)
        tgt = nn.LayerNorm(name="LayerNorm_2")(tgt)
        return tgt


class SADecoder(nn.Module):
    """N self-attention layers + output linear (basic.py:561-593)."""

    in_dim: int
    hid_dim: int
    out_dim: int
    num_layers: int
    nhead: int
    ffdim: int
    dropout: float = 0.1
    dtype: Any = None
    use_pallas_sa: bool = False
    pallas_interpret: bool = False

    @nn.compact
    def __call__(self, tgt, pos=None, deterministic=True):
        assert self.in_dim == self.hid_dim
        out = tgt
        for i in range(self.num_layers):
            out = SALayer(
                self.hid_dim, self.nhead, self.ffdim, self.dropout, self.dropout,
                dtype=self.dtype, use_pallas_sa=self.use_pallas_sa,
                pallas_interpret=self.pallas_interpret, name=f"layer{i}"
            )(out, out, out, query_pos=pos, key_pos=pos, deterministic=deterministic)
        return TorchDense(self.out_dim)(out)


class SCADecoder(nn.Module):
    """N SCA layers + final LayerNorm + output linear (basic.py:525-557)."""

    in_dim: int
    hid_dim: int
    out_dim: int
    frame_dim: int
    num_layers: int
    nhead: int
    ffdim: int
    dropout: float = 0.1
    dtype: Any = None
    use_pallas: bool = False
    use_pallas_sa: bool = False
    quantize: str = ""  # "int8": quantized cross-attn K/V projections (eval only)
    pallas_interpret: bool = False
    pos_grad: bool = True

    @nn.compact
    def __call__(self, tgt, memory, pos=None, query_pos=None, memory_mask=None, deterministic=True):
        assert self.in_dim == self.hid_dim
        out = tgt
        for i in range(self.num_layers):
            out = SCALayer(
                self.hid_dim, self.frame_dim, self.nhead, self.ffdim, self.dropout, self.dropout,
                dtype=self.dtype, use_pallas=self.use_pallas, use_pallas_sa=self.use_pallas_sa,
                quantize=self.quantize,
                pallas_interpret=self.pallas_interpret, pos_grad=self.pos_grad,
                name=f"layer{i}",
            )(out, memory, pos=pos, query_pos=query_pos, memory_mask=memory_mask, deterministic=deterministic)
        out = nn.LayerNorm()(out)
        return TorchDense(self.out_dim)(out)


# --------------------------------------------------------------------------
# GRU


class _GRURecurStep(nn.Module):
    """One recurrent GRU step on *precomputed* input gates (torch gate math:
    n = tanh(gi_n + r*(W_hn h + b_hn))); carries the hidden state through
    padded frames."""

    hidden: int

    @nn.compact
    def __call__(self, h, inp):
        gi_t, mt = inp
        H = self.hidden
        bound = 1.0 / math.sqrt(H)
        w_hh = self.param("w_hh", uniform_init(bound), (H, 3 * H))
        b_hh = self.param("b_hh", uniform_init(bound), (3 * H,))
        gh = h @ w_hh + b_hh
        i_r, i_z, i_n = jnp.split(gi_t, 3, axis=-1)
        h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
        r = jax.nn.sigmoid(i_r + h_r)
        z = jax.nn.sigmoid(i_z + h_z)
        n = jnp.tanh(i_n + r * h_n)
        h_new = (1.0 - z) * n + z * h
        h = mt * h_new + (1.0 - mt) * h
        return h, h


class _GRUCellParams(nn.Module):
    """Parameter twin of _GRURecurStep: same scope leaves (w_hh/b_hh), but the
    weights are consumed by BiGRU's merged two-direction scan instead of a
    per-direction nn.scan — the checkpoint/import/export param tree is
    unchanged."""

    hidden: int

    @nn.compact
    def __call__(self):
        H = self.hidden
        bound = 1.0 / math.sqrt(H)
        return (self.param("w_hh", uniform_init(bound), (H, 3 * H)),
                self.param("b_hh", uniform_init(bound), (3 * H,)))


class BiGRU(nn.Module):
    """Multi-layer bidirectional GRU over padded sequences.

    Matches torch nn.GRU(bidirectional=True) semantics on the valid prefix:
    the hidden state carries through padded steps unchanged, so the backward
    pass entering the valid region is identical to running on the unpadded
    sequence.  Inter-layer dropout as in torch (all layers but the last).

    The input projection (x @ W_ih) does not depend on the recurrence, so it
    runs for ALL steps in one batched MXU matmul before the scan; only the
    h @ W_hh half stays sequential.  The two directions run in ONE scan
    (forward direction paired with the flipped-sequence backward direction)
    as a batch-2 recurrent matmul: the per-step work is far below MXU
    latency, so N serial dispatches beat 2N half-sized ones — together with
    ``unroll`` this roughly halved the seg_update (S=128) scan cost on v5e.
    Params: ``l{i}_{fwd,bwd}_w_ih/b_ih`` at this module +
    ``l{i}_{fwd,bwd}/w_hh, b_hh`` in a parameter-twin child scope
    (engine/checkpoint.py migrates the old ``l{i}_{dir}/cell/*`` layout).
    """

    hidden: int  # per direction
    num_layers: int
    dropout: float = 0.0
    unroll: int = 8  # lax.scan unroll: amortizes while-loop overhead

    @nn.compact
    def __call__(self, x, mask, deterministic=True):
        B, N, _ = x.shape
        H = self.hidden
        m = mask.astype(x.dtype)[:, :, None]
        bound = 1.0 / math.sqrt(H)

        def direction_gates(inp, name, reverse):
            in_dim = inp.shape[-1]
            w_ih = self.param(f"{name}_w_ih", uniform_init(bound), (in_dim, 3 * H))
            b_ih = self.param(f"{name}_b_ih", uniform_init(bound), (3 * H,))
            gi = inp @ w_ih + b_ih  # (B, N, 3H): every step's input gates at once
            return jnp.flip(gi, axis=1) if reverse else gi

        out = x
        for layer in range(self.num_layers):
            gi_f = direction_gates(out, f"l{layer}_fwd", reverse=False)
            gi_b = direction_gates(out, f"l{layer}_bwd", reverse=True)
            w_f, b_f = _GRUCellParams(H, name=f"l{layer}_fwd")()
            w_b, b_b = _GRUCellParams(H, name=f"l{layer}_bwd")()
            w_st = jnp.stack([w_f, w_b])  # (2, H, 3H)
            b_st = jnp.stack([b_f, b_b])  # (2, 3H)

            # both directions in one scan: (N, B, 2, ...) xs, h is (B, 2, H)
            gis = jnp.stack([gi_f, gi_b], axis=2).transpose(1, 0, 2, 3)
            ms = jnp.stack([m, jnp.flip(m, axis=1)], axis=2).transpose(1, 0, 2, 3)

            def step(h, inp):
                gi_t, mt = inp  # (B, 2, 3H), (B, 2, 1)
                # torch gate math: n = tanh(gi_n + r*(W_hn h + b_hn))
                gh = jnp.einsum("bdh,dhg->bdg", h, w_st) + b_st[None]
                i_r, i_z, i_n = jnp.split(gi_t, 3, axis=-1)
                h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
                r = jax.nn.sigmoid(i_r + h_r)
                z = jax.nn.sigmoid(i_z + h_z)
                n = jnp.tanh(i_n + r * h_n)
                h_new = (1.0 - z) * n + z * h
                h = mt * h_new + (1.0 - mt) * h
                return h, h

            h0 = jnp.zeros((B, 2, H), out.dtype)
            _, ys = jax.lax.scan(step, h0, (gis, ms), unroll=self.unroll)
            yf = ys[:, :, 0].transpose(1, 0, 2)  # (B, N, H)
            yb = jnp.flip(ys[:, :, 1].transpose(1, 0, 2), axis=1)
            out = jnp.concatenate([yf, yb], axis=-1)
            if layer != self.num_layers - 1 and self.dropout > 0:
                out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        return out


class ActionUpdateGRU(nn.Module):
    """Bi-GRU action branch for transcript mode (basic.py:283-308)."""

    in_dim: int
    hid_dim: int
    out_dim: int
    n_layers: int
    dropout: float = 0.5
    out_map: bool = False

    @nn.compact
    def __call__(self, action_feature, mask, deterministic=True):
        out = BiGRU(self.hid_dim // 2, self.n_layers, self.dropout)(
            action_feature, mask, deterministic=deterministic
        )
        out = nn.LayerNorm(epsilon=1e-5)(out)
        if self.out_map:
            out = TorchDense(self.out_dim)(out)
        else:
            assert self.hid_dim == self.out_dim
        return out


class FeatureProjection(nn.Module):
    """MLP projection of frame features into CLIP space, L2-normalized.

    Matches blocks.py:141-175.
    """

    clip_dim: int = 512
    hidden_dim: int = 512
    dropout: float = 0.1

    @nn.compact
    def __call__(self, feature, deterministic=True):
        h = TorchDense(self.hidden_dim)(feature)
        h = nn.LayerNorm()(h)
        h = jax.nn.relu(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = TorchDense(self.clip_dim)(h)
        norm = jnp.linalg.norm(h, axis=-1, keepdims=True)
        return h / jnp.maximum(norm, 1e-12)
