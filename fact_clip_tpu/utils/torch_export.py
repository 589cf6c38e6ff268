"""Export this framework's flax parameter tree to a reference-loadable
PyTorch ``state_dict``.

Inverse of torch_import.py: the produced dict loads into the reference's
``FACT``/``FACT_CLIP``/``FACT_SepVerbNoun`` modules via
``net.load_state_dict(ckpt, strict=False)`` exactly as the reference does for
its own checkpoints (/root/reference/scripts/run_eval.py:134-137,
scripts/train.py:209-214 — both delete the ``*_pe.pe`` buffers and load
non-strict, so positional-encoding buffers are deliberately not emitted;
they are deterministic and re-created by the module constructor).

Layout conversions (flax -> torch), mirroring torch_import.py:

  Dense      kernel (in, out)          -> Linear weight (out, in)
  1x1 conv   kernel (in, out)          -> Conv1d weight (out, in, 1)
  dilated    kernel (k, in/g, out)     -> Conv1d weight (out, in/g, k)
  MHA        q/k/v kernels             -> packed in_proj_weight (3E, E) when
                                          kdim == embed_dim (torch packs in
                                          that case), else separate
                                          {q,k,v}_proj_weight
  BiGRU      l{k}_{dir}[_w_ih] (in,3H) -> weight_ih_l{k}[_reverse] (3H, in)

Round-trip identity (export then torch_import) and forward parity under the
*executed* reference implementation are covered by tests/test_torch_export.py.
"""

from __future__ import annotations

import numpy as np


def _f32(a):
    return np.ascontiguousarray(np.asarray(a), dtype=np.float32)


def _t(k):  # kernel (in, out) -> weight (out, in)
    return np.ascontiguousarray(_f32(k).T)


def _conv(k):  # kernel (k, in/g, out) -> weight (out, in/g, k)
    return np.ascontiguousarray(_f32(k).transpose(2, 1, 0))


def _conv1x1(k):  # dense kernel (in, out) -> Conv1d weight (out, in, 1)
    return np.ascontiguousarray(_f32(k).T[:, :, None])


def _dense(out, prefix, node):
    d = node["Dense_0"]
    out[prefix + ".weight"] = _t(d["kernel"])
    out[prefix + ".bias"] = _f32(d["bias"])


def _layernorm(out, prefix, node):
    out[prefix + ".weight"] = _f32(node["scale"])
    out[prefix + ".bias"] = _f32(node["bias"])


def _mha(out, prefix, node):
    """flax q/k/v/out projections -> torch nn.MultiheadAttention entries.

    torch packs q/k/v into in_proj_weight iff kdim == vdim == embed_dim
    (nn.MultiheadAttention._qkv_same_embed_dim); detect from kernel shapes.
    """
    qk = _f32(node["q_proj"]["kernel"])  # (E, E)
    kk = _f32(node["k_proj"]["kernel"])  # (kdim, E)
    vk = _f32(node["v_proj"]["kernel"])  # (vdim, E)
    E = qk.shape[0]
    bias = np.concatenate(
        [_f32(node["q_proj"]["bias"]), _f32(node["k_proj"]["bias"]),
         _f32(node["v_proj"]["bias"])])
    if kk.shape[0] == E and vk.shape[0] == E:
        out[prefix + ".in_proj_weight"] = np.concatenate([qk.T, kk.T, vk.T])
    else:
        out[prefix + ".q_proj_weight"] = _t(qk)
        out[prefix + ".k_proj_weight"] = _t(kk)
        out[prefix + ".v_proj_weight"] = _t(vk)
    out[prefix + ".in_proj_bias"] = bias
    out[prefix + ".out_proj.weight"] = _t(node["out_proj"]["kernel"])
    out[prefix + ".out_proj.bias"] = _f32(node["out_proj"]["bias"])


def _dilated_layer(out, prefix, node):
    out[prefix + ".conv_dilated.weight"] = _conv(node["conv_dilated_kernel"])
    out[prefix + ".conv_dilated.bias"] = _f32(node["conv_dilated_bias"])
    out[prefix + ".conv_1x1.weight"] = _conv1x1(node["conv_1x1_kernel"])
    out[prefix + ".conv_1x1.bias"] = _f32(node["conv_1x1_bias"])
    if "ln_scale" in node:
        out[prefix + ".norm.weight"] = _f32(node["ln_scale"])
        out[prefix + ".norm.bias"] = _f32(node["ln_bias"])


def _mstcn(out, prefix, node, in_map):
    idx = 0
    if in_map:
        d = node[f"TorchDense_{idx}"]["Dense_0"]
        out[prefix + ".conv_1x1.weight"] = _conv1x1(d["kernel"])
        out[prefix + ".conv_1x1.bias"] = _f32(d["bias"])
        idx += 1
    i = 0
    while f"DilatedResidualLayer_{i}" in node:
        _dilated_layer(out, f"{prefix}.layers.{i}", node[f"DilatedResidualLayer_{i}"])
        i += 1
    d = node[f"TorchDense_{idx}"]["Dense_0"]
    out[prefix + ".conv_out.weight"] = _conv1x1(d["kernel"])
    out[prefix + ".conv_out.bias"] = _f32(d["bias"])


def _mstcn2(out, prefix, node, in_map):
    idx = 0
    if in_map:
        d = node[f"TorchDense_{idx}"]["Dense_0"]
        out[prefix + ".conv_1x1_in.weight"] = _conv1x1(d["kernel"])
        out[prefix + ".conv_1x1_in.bias"] = _f32(d["bias"])
        idx += 1
    i = 0
    while f"conv_dilated_1_{i}_kernel" in node:
        out[f"{prefix}.conv_dilated_1.{i}.weight"] = _conv(node[f"conv_dilated_1_{i}_kernel"])
        out[f"{prefix}.conv_dilated_1.{i}.bias"] = _f32(node[f"conv_dilated_1_{i}_bias"])
        out[f"{prefix}.conv_dilated_2.{i}.weight"] = _conv(node[f"conv_dilated_2_{i}_kernel"])
        out[f"{prefix}.conv_dilated_2.{i}.bias"] = _f32(node[f"conv_dilated_2_{i}_bias"])
        out[f"{prefix}.conv_fusion.{i}.weight"] = _conv1x1(node[f"fuse_{i}_kernel"])
        out[f"{prefix}.conv_fusion.{i}.bias"] = _f32(node[f"fuse_{i}_bias"])
        i += 1
    d = node[f"TorchDense_{idx}"]["Dense_0"]
    out[prefix + ".conv_out.weight"] = _conv1x1(d["kernel"])
    out[prefix + ".conv_out.bias"] = _f32(d["bias"])


def _fbranch(out, prefix, node, c, in_map):
    if c.f == "m":
        _mstcn(out, prefix, node, in_map)
    else:
        _mstcn2(out, prefix, node, in_map)


def _sa_layer(out, prefix, node):
    _mha(out, prefix + ".multihead_attn", node["MultiHeadAttention_0"])
    _dense(out, prefix + ".linear1", node["TorchDense_0"])
    _dense(out, prefix + ".linear2", node["TorchDense_1"])
    _layernorm(out, prefix + ".norm1", node["LayerNorm_0"])
    _layernorm(out, prefix + ".norm2", node["LayerNorm_1"])


def _sca_layer(out, prefix, node):
    _mha(out, prefix + ".self_attn", node["self_attn"])
    _mha(out, prefix + ".multihead_attn", node["cross_attn"])
    _dense(out, prefix + ".linear1", node["TorchDense_0"])
    _dense(out, prefix + ".linear2", node["TorchDense_1"])
    _layernorm(out, prefix + ".norm1", node["LayerNorm_0"])
    _layernorm(out, prefix + ".norm2", node["LayerNorm_1"])
    _layernorm(out, prefix + ".norm3", node["LayerNorm_2"])


def _gru(out, prefix, node):
    layer = 0
    while f"l{layer}_fwd" in node:
        for tag, suffix in (("fwd", ""), ("bwd", "_reverse")):
            out[f"{prefix}.weight_hh_l{layer}{suffix}"] = _t(node[f"l{layer}_{tag}"]["w_hh"])
            out[f"{prefix}.bias_hh_l{layer}{suffix}"] = _f32(node[f"l{layer}_{tag}"]["b_hh"])
            out[f"{prefix}.weight_ih_l{layer}{suffix}"] = _t(node[f"l{layer}_{tag}_w_ih"])
            out[f"{prefix}.bias_ih_l{layer}{suffix}"] = _f32(node[f"l{layer}_{tag}_b_ih"])
        layer += 1


def _abranch(out, prefix, node, c):
    if c.a == "sa":
        for i in range(c.a_layers):
            _sa_layer(out, f"{prefix}.layers.{i}", node[f"layer{i}"])
        _dense(out, prefix + ".out_linear", node["TorchDense_0"])
    elif c.a == "sca":
        for i in range(c.a_layers):
            _sca_layer(out, f"{prefix}.layers.{i}", node[f"layer{i}"])
        _layernorm(out, prefix + ".norm", node["LayerNorm_0"])
        _dense(out, prefix + ".out_linear", node["TorchDense_0"])
    elif c.a in ("gru", "gru_om"):
        _gru(out, prefix + ".gru", node["BiGRU_0"])
        _layernorm(out, prefix + ".layernorm", node["LayerNorm_0"])
        if c.a == "gru_om":
            _dense(out, prefix + ".out_map", node["TorchDense_0"])
    else:
        raise ValueError(f"unknown action branch {c.a!r}")


def _x2y(out, prefix, node):
    out[prefix + ".X_K.weight"] = _t(node["xk_kernel"])
    out[prefix + ".X_K.bias"] = _f32(node["xk_bias"])
    out[prefix + ".X_V.weight"] = _t(node["xv_kernel"])
    out[prefix + ".X_V.bias"] = _f32(node["xv_bias"])
    out[prefix + ".Y_Q.weight"] = _t(node["yq_kernel"])
    out[prefix + ".Y_Q.bias"] = _f32(node["yq_bias"])
    out[prefix + ".Y_W.weight"] = _t(node["out_kernel"])
    out[prefix + ".Y_W.bias"] = _f32(node["out_bias"])


def export_fact_state_dict(params, block_cfgs, trans: bool = False) -> dict:
    """Convert our flax FACT/FACT_CLIP param tree to a reference state_dict.

    ``params`` is the inner tree (``variables["params"]``); accepts either
    the plain FACT tree or the FACT_CLIP ``{"fact":..., "frame_projection":...}``
    wrapper.  Values are numpy float32; callers torch-ify for torch.save.
    """
    params = _as_plain_dict(params)
    out = {}

    fact = params.get("fact", params)
    if not trans:
        # flax (M, E) -> torch buffer action_query (M, 1, E)
        out["action_query"] = _f32(fact["action_query"])[:, None, :]
    else:
        out["action_embed.weight"] = _f32(fact["action_embed"]["embedding"])

    for idx, c in enumerate(block_cfgs):
        p = f"block_list.{idx}"
        blk = fact[f"block{idx}"]
        if c.kind == "i":
            _fbranch(out, p + ".frame_branch", blk["frame_branch"], c, in_map=True)
            _abranch(out, p + ".action_branch", blk["action_branch"], c)
        elif c.kind == "u":
            _fbranch(out, p + ".frame_branch", blk["frame_branch"], c, in_map=False)
            _abranch(out, p + ".action_branch", blk["action_branch"], c)
            _x2y(out, p + ".f2a_layer", blk["f2a_layer"])
            _x2y(out, p + ".a2f_layer", blk["a2f_layer"])
        elif c.kind == "U":
            _fbranch(out, p + ".frame_branch", blk["frame_branch"], c, in_map=False)
            _abranch(out, p + ".action_branch", blk["action_branch"], c)
            _x2y(out, p + ".f2a_layer", blk["f2a_layer"])
            _x2y(out, p + ".a2f_layer", blk["a2f_layer"])
            _gru(out, p + ".seg_update", blk["seg_update"])
            _dense(out, p + ".seg_combine", blk["seg_combine"])
            _dense(out, p + ".sf_merge.0", blk["sf_merge"])
        else:
            raise ValueError(f"unexpected block kind {c.kind!r} in FACT export")

    if "frame_projection" in params:
        proj = params["frame_projection"]
        _dense(out, "frame_projection.projection.0", proj["TorchDense_0"])
        _layernorm(out, "frame_projection.projection.1", proj["LayerNorm_0"])
        _dense(out, "frame_projection.projection.4", proj["TorchDense_1"])

    return out


def export_verbnoun_state_dict(params, block_cfgs, trans: bool = False) -> dict:
    """Convert our VerbNounFACT tree (models/verbnoun.py) to the reference's
    blocks_SepVerbNoun.py state_dict layout."""
    params = _as_plain_dict(params)
    out = {}

    if not trans:
        out["action_query"] = _f32(params["action_query"])[:, None, :]
    else:
        out["verb_embed.weight"] = _f32(params["verb_embed"]["embedding"])
        out["noun_embed.weight"] = _f32(params["noun_embed"]["embedding"])

    for idx, c in enumerate(block_cfgs):
        p = f"block_list.{idx}"
        blk = params[f"block{idx}"]
        if c.kind == "I":
            _fbranch(out, p + ".frame_branch", blk["frame_branch"], c, in_map=True)
            _abranch(out, p + ".action_branch", blk["action_branch"], c)
            _gru(out, p + ".seg_update", blk["tdu"]["seg_update"])
            _dense(out, p + ".seg_combine", blk["tdu"]["seg_combine"])
        elif c.kind == "U":
            _fbranch(out, p + ".frame_branch", blk["frame_branch"], c, in_map=False)
            _abranch(out, p + ".action_branch", blk["action_branch"], c)
            _x2y(out, p + ".f2a_layer", blk["f2a_layer"])
            _x2y(out, p + ".a2f_layer", blk["a2f_layer"])
            _gru(out, p + ".seg_update", blk["tdu"]["seg_update"])
            _dense(out, p + ".seg_combine", blk["tdu"]["seg_combine"])
            _dense(out, p + ".sf_merge.0", blk["sf_merge"])
        else:
            raise ValueError(f"unexpected block kind {c.kind!r} in verbnoun export")

    return out


def _as_plain_dict(tree):
    """flax FrozenDict / nested mapping -> plain nested dict of arrays."""
    if hasattr(tree, "items") and not isinstance(tree, dict):
        tree = dict(tree)
    if isinstance(tree, dict):
        return {k: _as_plain_dict(v) for k, v in tree.items()}
    return tree
