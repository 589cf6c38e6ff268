"""Import reference PyTorch checkpoints into the JAX parameter tree.

Maps the reference's ``state_dict`` names (/root/reference/fact_clip/models/
basic.py + blocks.py module structure) onto this framework's flax param tree,
so released reference checkpoints can be evaluated here and numeric parity of
the forward pass can be verified (SURVEY.md §7, hard part 5).

Key layout conversions (torch -> flax):
  Linear       weight (out, in)        -> kernel (in, out)
  Conv1d       weight (out, in/g, k)   -> kernel (k, in/g, out)
  MHA packed   in_proj_weight (3E, E)  -> q/k/v kernels (E, E) each
  GRU          weight_ih_l{k}[_reverse] (3H, in) -> l{k}_{fwd,bwd}/cell/w_ih (in, 3H)

The positional-encoding buffers (frame_pe.pe / action_pe.pe) are dropped just
like the reference loader does (scripts/train.py:212-213).
"""

from __future__ import annotations

import numpy as np


def _t(w):
    return np.ascontiguousarray(np.asarray(w).T)


def _conv(w):  # (out, in/g, k) -> (k, in/g, out)
    return np.ascontiguousarray(np.asarray(w).transpose(2, 1, 0))


class _SD:
    """state_dict accessor with prefix tracking and consumption checking."""

    def __init__(self, sd):
        self.sd = {k: np.asarray(v) for k, v in sd.items()}
        self.used = set()

    def __call__(self, name):
        self.used.add(name)
        return self.sd[name]

    def has(self, name):
        return name in self.sd

    def unused(self):
        return [k for k in self.sd if k not in self.used
                and not k.endswith("pe.pe")]


def _dense(sd, prefix):
    return {"Dense_0": {"kernel": _t(sd(prefix + ".weight")), "bias": sd(prefix + ".bias")}}


def _layernorm(sd, prefix):
    return {"scale": sd(prefix + ".weight"), "bias": sd(prefix + ".bias")}


def _mha(sd, prefix, embed_dim):
    """torch nn.MultiheadAttention -> q/k/v/out projection params."""
    out = {}
    if sd.has(prefix + ".in_proj_weight"):
        w = sd(prefix + ".in_proj_weight")
        b = sd(prefix + ".in_proj_bias")
        E = embed_dim
        out["q_proj"] = {"kernel": _t(w[:E]), "bias": b[:E]}
        out["k_proj"] = {"kernel": _t(w[E : 2 * E]), "bias": b[E : 2 * E]}
        out["v_proj"] = {"kernel": _t(w[2 * E :]), "bias": b[2 * E :]}
    else:
        b = sd(prefix + ".in_proj_bias")
        E = embed_dim
        out["q_proj"] = {"kernel": _t(sd(prefix + ".q_proj_weight")), "bias": b[:E]}
        out["k_proj"] = {"kernel": _t(sd(prefix + ".k_proj_weight")), "bias": b[E : 2 * E]}
        out["v_proj"] = {"kernel": _t(sd(prefix + ".v_proj_weight")), "bias": b[2 * E :]}
    out["out_proj"] = {
        "kernel": _t(sd(prefix + ".out_proj.weight")),
        "bias": sd(prefix + ".out_proj.bias"),
    }
    return out


def _dilated_layer(sd, prefix, ln):
    out = {
        "conv_dilated_kernel": _conv(sd(prefix + ".conv_dilated.weight")),
        "conv_dilated_bias": sd(prefix + ".conv_dilated.bias"),
        "conv_1x1_kernel": _conv(sd(prefix + ".conv_1x1.weight"))[0],
        "conv_1x1_bias": sd(prefix + ".conv_1x1.bias"),
    }
    if ln:
        out["ln_scale"] = sd(prefix + ".norm.weight")
        out["ln_bias"] = sd(prefix + ".norm.bias")
    return out


def _mstcn(sd, prefix, num_layers, ln, in_map):
    out = {}
    idx = 0
    if in_map:
        # torch stores the 1x1 in-map as Conv1d (out, in, 1)
        out[f"TorchDense_{idx}"] = {"Dense_0": {
            "kernel": _conv(sd(prefix + ".conv_1x1.weight"))[0],
            "bias": sd(prefix + ".conv_1x1.bias"),
        }}
        idx += 1
    for i in range(num_layers):
        out[f"DilatedResidualLayer_{i}"] = _dilated_layer(sd, f"{prefix}.layers.{i}", ln)
    out[f"TorchDense_{idx}"] = {
        "Dense_0": {"kernel": _conv(sd(prefix + ".conv_out.weight"))[0],
                    "bias": sd(prefix + ".conv_out.bias")}
    }
    return out


def _mstcn2(sd, prefix, num_layers, in_map):
    out = {}
    idx = 0
    if in_map:
        out[f"TorchDense_{idx}"] = {"Dense_0": {
            "kernel": _conv(sd(prefix + ".conv_1x1_in.weight"))[0],
            "bias": sd(prefix + ".conv_1x1_in.bias"),
        }}
        idx += 1
    for i in range(num_layers):
        out[f"conv_dilated_1_{i}_kernel"] = _conv(sd(f"{prefix}.conv_dilated_1.{i}.weight"))
        out[f"conv_dilated_1_{i}_bias"] = sd(f"{prefix}.conv_dilated_1.{i}.bias")
        out[f"conv_dilated_2_{i}_kernel"] = _conv(sd(f"{prefix}.conv_dilated_2.{i}.weight"))
        out[f"conv_dilated_2_{i}_bias"] = sd(f"{prefix}.conv_dilated_2.{i}.bias")
        # MS-TCN++ fusion 1x1 conv: kernel (1, 2C, C) -> dense (2C, C)
        out[f"fuse_{i}_kernel"] = _conv(sd(f"{prefix}.conv_fusion.{i}.weight"))[0]
        out[f"fuse_{i}_bias"] = sd(f"{prefix}.conv_fusion.{i}.bias")
    out[f"TorchDense_{idx}"] = {"Dense_0": {
        "kernel": _conv(sd(prefix + ".conv_out.weight"))[0],
        "bias": sd(prefix + ".conv_out.bias"),
    }}
    return out


def _fbranch(sd, prefix, c, in_map):
    if c.f == "m":
        return _mstcn(sd, prefix, c.f_layers, c.f_ln, in_map)
    return _mstcn2(sd, prefix, c.f_layers, in_map)


def _sa_layer(sd, prefix, q_dim):
    return {
        "MultiHeadAttention_0": _mha(sd, prefix + ".multihead_attn", q_dim),
        "TorchDense_0": _dense(sd, prefix + ".linear1"),
        "TorchDense_1": _dense(sd, prefix + ".linear2"),
        "LayerNorm_0": _layernorm(sd, prefix + ".norm1"),
        "LayerNorm_1": _layernorm(sd, prefix + ".norm2"),
    }


def _sca_layer(sd, prefix, a_dim):
    return {
        "self_attn": _mha(sd, prefix + ".self_attn", a_dim),
        "cross_attn": _mha(sd, prefix + ".multihead_attn", a_dim),
        "TorchDense_0": _dense(sd, prefix + ".linear1"),
        "TorchDense_1": _dense(sd, prefix + ".linear2"),
        "LayerNorm_0": _layernorm(sd, prefix + ".norm1"),
        "LayerNorm_1": _layernorm(sd, prefix + ".norm2"),
        "LayerNorm_2": _layernorm(sd, prefix + ".norm3"),
    }


def _abranch(sd, prefix, c):
    out = {}
    if c.a == "sa":
        for i in range(c.a_layers):
            out[f"layer{i}"] = _sa_layer(sd, f"{prefix}.layers.{i}", c.a_dim)
        out["TorchDense_0"] = _dense(sd, prefix + ".out_linear")
    elif c.a == "sca":
        for i in range(c.a_layers):
            out[f"layer{i}"] = _sca_layer(sd, f"{prefix}.layers.{i}", c.a_dim)
        out["LayerNorm_0"] = _layernorm(sd, prefix + ".norm")
        out["TorchDense_0"] = _dense(sd, prefix + ".out_linear")
    elif c.a in ("gru", "gru_om"):
        out["BiGRU_0"] = _gru(sd, prefix + ".gru", c.a_layers)
        out["LayerNorm_0"] = _layernorm(sd, prefix + ".layernorm")
        if c.a == "gru_om":
            out["TorchDense_0"] = _dense(sd, prefix + ".out_map")
    return out


def _gru(sd, prefix, num_layers):
    out = {}
    for layer in range(num_layers):
        for tag, suffix in (("fwd", ""), ("bwd", "_reverse")):
            out[f"l{layer}_{tag}"] = {
                "w_hh": _t(sd(f"{prefix}.weight_hh_l{layer}{suffix}")),
                "b_hh": sd(f"{prefix}.bias_hh_l{layer}{suffix}"),
            }
            out[f"l{layer}_{tag}_w_ih"] = _t(sd(f"{prefix}.weight_ih_l{layer}{suffix}"))
            out[f"l{layer}_{tag}_b_ih"] = sd(f"{prefix}.bias_ih_l{layer}{suffix}")
    return out


def _x2y(sd, prefix):
    def kb(torch_prefix):
        d = _dense(sd, torch_prefix)
        return d["Dense_0"]["kernel"], d["Dense_0"]["bias"]

    wk, bk = kb(prefix + ".X_K")
    wv, bv = kb(prefix + ".X_V")
    wq, bq = kb(prefix + ".Y_Q")
    wo, bo = kb(prefix + ".Y_W")
    return {
        "xk_kernel": wk, "xk_bias": bk,
        "xv_kernel": wv, "xv_bias": bv,
        "yq_kernel": wq, "yq_bias": bq,
        "out_kernel": wo, "out_bias": bo,
    }


def convert_fact_state_dict(state_dict, block_cfgs, trans: bool = False) -> dict:
    """Convert a reference FACT/FACT_CLIP state_dict to our flax param tree.

    block_cfgs: the resolved BlockCfg tuple (models/blocks.py).
    Returns {'params': tree}-shaped inner dict suitable for model.apply.
    """
    sd = _SD(state_dict)
    params = {}

    if not trans:
        params["action_query"] = np.asarray(sd("action_query"))[:, 0, :]
    else:
        params["action_embed"] = {"embedding": sd("action_embed.weight")}

    for idx, c in enumerate(block_cfgs):
        p = f"block_list.{idx}"
        blk = {}
        if c.kind == "i":
            blk["frame_branch"] = _fbranch(sd, p + ".frame_branch", c, in_map=True)
            blk["action_branch"] = _abranch(sd, p + ".action_branch", c)
        elif c.kind == "u":
            blk["frame_branch"] = _fbranch(sd, p + ".frame_branch", c, in_map=False)
            blk["action_branch"] = _abranch(sd, p + ".action_branch", c)
            blk["f2a_layer"] = _x2y(sd, p + ".f2a_layer")
            blk["a2f_layer"] = _x2y(sd, p + ".a2f_layer")
        elif c.kind == "U":
            blk["frame_branch"] = _fbranch(sd, p + ".frame_branch", c, in_map=False)
            blk["action_branch"] = _abranch(sd, p + ".action_branch", c)
            blk["f2a_layer"] = _x2y(sd, p + ".f2a_layer")
            blk["a2f_layer"] = _x2y(sd, p + ".a2f_layer")
            blk["seg_update"] = _gru(sd, p + ".seg_update", c.s_layers)
            blk["seg_combine"] = _dense(sd, p + ".seg_combine")
            blk["sf_merge"] = _dense(sd, p + ".sf_merge.0")
        params[f"block{idx}"] = blk

    # FACT_CLIP frame projection (blocks.py:141-175)
    if sd.has("frame_projection.projection.0.weight"):
        proj = {
            "TorchDense_0": _dense(sd, "frame_projection.projection.0"),
            "LayerNorm_0": _layernorm(sd, "frame_projection.projection.1"),
            "TorchDense_1": _dense(sd, "frame_projection.projection.4"),
        }
        params = {"fact": params, "frame_projection": proj}
        if sd.has("text_embeddings"):
            sd("text_embeddings")  # consumed by the engine, not the params

    leftovers = sd.unused()
    if leftovers:
        print(f"torch_import: {len(leftovers)} unconverted entries: {leftovers[:8]} ...")
    return params


def convert_verbnoun_state_dict(state_dict, block_cfgs, trans: bool = False) -> dict:
    """Convert a reference verb/noun (epic) FACT state_dict
    (blocks_SepVerbNoun.py module structure) to our VerbNounFACT tree."""
    sd = _SD(state_dict)
    params = {}

    if not trans:
        params["action_query"] = np.asarray(sd("action_query"))[:, 0, :]
    else:
        params["verb_embed"] = {"embedding": sd("verb_embed.weight")}
        params["noun_embed"] = {"embedding": sd("noun_embed.weight")}

    for idx, c in enumerate(block_cfgs):
        p = f"block_list.{idx}"
        blk = {}
        if c.kind == "I":
            blk["frame_branch"] = _fbranch(sd, p + ".frame_branch", c, in_map=True)
            blk["action_branch"] = _abranch(sd, p + ".action_branch", c)
            blk["tdu"] = {
                "seg_update": _gru(sd, p + ".seg_update", 2),  # fixed 2 layers (:370)
                "seg_combine": _dense(sd, p + ".seg_combine"),
            }
        elif c.kind == "U":
            blk["frame_branch"] = _fbranch(sd, p + ".frame_branch", c, in_map=False)
            blk["action_branch"] = _abranch(sd, p + ".action_branch", c)
            blk["f2a_layer"] = _x2y(sd, p + ".f2a_layer")
            blk["a2f_layer"] = _x2y(sd, p + ".a2f_layer")
            blk["tdu"] = {
                "seg_update": _gru(sd, p + ".seg_update", c.s_layers),
                "seg_combine": _dense(sd, p + ".seg_combine"),
            }
            blk["sf_merge"] = _dense(sd, p + ".sf_merge.0")
        else:
            raise ValueError(c.kind)
        params[f"block{idx}"] = blk

    leftovers = sd.unused()
    if leftovers:
        print(f"torch_import (verbnoun): {len(leftovers)} unconverted: {leftovers[:8]} ...")
    return params
