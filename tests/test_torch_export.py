"""flax -> torch checkpoint export (utils/torch_export.py).

Two guarantees:
  1. Round-trip identity: export then torch_import reproduces the exact
     flax tree (both MHA packings, MSTCN and MSTCN++, TDU blocks, verbnoun).
  2. Reference-executable: the exported state_dict loads into the *executed*
     reference implementation (load_state_dict exactly as
     /root/reference/scripts/run_eval.py:134-137 does) and produces the same
     logits/decode as our forward — so TPU-trained weights can be
     cross-validated under the reference when real data appears.
"""

import os
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fact_clip_tpu.configs.default import get_cfg_defaults
from fact_clip_tpu.models import decode
from fact_clip_tpu.models.blocks import build_fact, resolve_block_cfgs
from fact_clip_tpu.utils.torch_export import export_fact_state_dict, export_verbnoun_state_dict
from fact_clip_tpu.utils.torch_import import convert_fact_state_dict, convert_verbnoun_state_dict

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF), reason="reference repo not mounted")


def _small_cfg(block="iuU", a="sca", f="m", a_dim=16, hid_dim=32):
    cfg = get_cfg_defaults()
    cfg.FACT.block = block
    cfg.FACT.ntoken = 6
    cfg.FACT.trans = False
    cfg.FACT.fpos = False
    cfg.FACT.cmr = 0.0
    cfg.FACT.mwt = 0.1
    cfg.Bi.hid_dim = hid_dim
    cfg.Bi.dropout = 0.0
    cfg.Bi.a = a
    cfg.Bi.a_nhead = 2
    cfg.Bi.a_ffdim = 24
    cfg.Bi.a_layers = 2
    cfg.Bi.a_dim = a_dim
    cfg.Bi.f = f
    cfg.Bi.f_layers = 3
    cfg.Bi.f_ln = (f == "m")
    cfg.Bi.f_dim = 24
    cfg.Bi.f_ngp = 1
    cfg.Bu.f_layers = 2
    cfg.BU.f_layers = 2
    cfg.TM.use = False
    return cfg


def _init_params(cfg, D=11, C=5, T=50):
    model = build_fact(cfg, D, C, s_pred_cap=T)
    feats = jnp.zeros((1, T, D), jnp.float32)
    mask = jnp.ones((1, T), bool)
    lengths = jnp.full((1,), T, jnp.int32)
    params = model.init({"params": jax.random.PRNGKey(0)},
                        feats, mask, lengths, train=False)["params"]
    return model, params


def _assert_trees_equal(a, b, atol=0.0):
    la = jax.tree_util.tree_leaves_with_path(a)
    lb = dict(jax.tree_util.tree_leaves_with_path(b))
    assert len(la) == len(lb)
    for path, x in la:
        y = lb[path]
        np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), atol=atol,
            err_msg=jax.tree_util.keystr(path))


@pytest.mark.parametrize("a,f,a_dim,hid_dim", [
    ("sca", "m", 16, 32),   # unpacked cross-attn MHA
    ("sca", "m2", 32, 32),  # packed MHA + MSTCN++
    ("sa", "m", 16, 32),    # SA action branch
])
def test_roundtrip_identity(a, f, a_dim, hid_dim):
    cfg = _small_cfg(a=a, f=f, a_dim=a_dim, hid_dim=hid_dim)
    bcfgs = resolve_block_cfgs(cfg)
    _, params = _init_params(cfg)

    sd = export_fact_state_dict(params, bcfgs, trans=cfg.FACT.trans)
    back = convert_fact_state_dict(sd, bcfgs, trans=cfg.FACT.trans)
    _assert_trees_equal(params, back)


@pytest.mark.slow
def test_roundtrip_identity_verbnoun(tmp_path):
    from fact_clip_tpu.data.synthetic import make_epic_fixture
    from fact_clip_tpu.models.verbnoun import build_verbnoun_fact, load_vids_nids

    base = make_epic_fixture(
        str(tmp_path), n_verbs=3, n_nouns=4, n_actions=6, n_train=2, n_test=1,
        feat_dim=12, min_len=40, max_len=60, class_sep=3.0)

    cfg = _small_cfg(block="iuU", a="sca", f="m2", a_dim=16, hid_dim=32)
    cfg.FACT.block = "IU"
    cfg.FACT.fpos = True

    vids, nids = load_vids_nids(base)
    D, T = 12, 40
    model = build_verbnoun_fact(cfg, D, vids, nids, s_pred_cap=T,
                                n_classes1=3, n_classes2=4)
    feats = jnp.zeros((1, T, D), jnp.float32)
    mask = jnp.ones((1, T), bool)
    lengths = jnp.full((1,), T, jnp.int32)
    params = model.init({"params": jax.random.PRNGKey(0)},
                        feats, mask, lengths, train=False)["params"]

    bcfgs = resolve_block_cfgs(cfg)
    sd = export_verbnoun_state_dict(params, bcfgs, trans=cfg.FACT.trans)
    back = convert_verbnoun_state_dict(sd, bcfgs, trans=cfg.FACT.trans)
    _assert_trees_equal(params, back)


@pytest.fixture(scope="module")
def ref_modules():
    import fact_clip_tpu.configs.node as node

    yacs = types.ModuleType("yacs")
    yacs_config = types.ModuleType("yacs.config")
    yacs_config.CfgNode = node.CfgNode
    yacs.config = yacs_config
    sys.modules.setdefault("yacs", yacs)
    sys.modules.setdefault("yacs.config", yacs_config)
    sys.path.insert(0, REF)
    try:
        from fact_clip.configs.default import get_cfg_defaults as ref_defaults
        from fact_clip.models.blocks import FACT as RefFACT

        yield ref_defaults, RefFACT
    finally:
        sys.path.remove(REF)


@pytest.mark.parametrize("a_dim,hid_dim,f", [(16, 32, "m"), (32, 32, "m2")])
def test_reference_runs_exported_weights(ref_modules, a_dim, hid_dim, f):
    """Our random-init weights, exported, loaded by the reference loader,
    produce the reference's forward == our forward."""
    import torch

    ref_defaults, RefFACT = ref_modules
    cfg = _small_cfg(a=("sca"), f=f, a_dim=a_dim, hid_dim=hid_dim)
    T, C, D = 50, 5, 11
    model, params = _init_params(cfg, D=D, C=C, T=T)
    bcfgs = resolve_block_cfgs(cfg)

    sd = export_fact_state_dict(params, bcfgs, trans=cfg.FACT.trans)
    ckpt = {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()}

    def fill(rc):
        rc.FACT.block = cfg.FACT.block
        rc.FACT.ntoken = cfg.FACT.ntoken
        rc.FACT.trans = False
        rc.FACT.fpos = False
        rc.FACT.cmr = 0.0
        rc.FACT.mwt = cfg.FACT.mwt
        for k in ("hid_dim", "dropout", "a", "a_nhead", "a_ffdim", "a_layers",
                  "a_dim", "f", "f_layers", "f_ln", "f_dim", "f_ngp"):
            setattr(rc.Bi, k, getattr(cfg.Bi, k))
        rc.Bu.f_layers = cfg.Bu.f_layers
        rc.BU.f_layers = cfg.BU.f_layers
        rc.TM.use = False
        return rc

    torch.manual_seed(0)
    net = RefFACT(fill(ref_defaults()), D, C).eval()

    # exactly the reference's own loading protocol (run_eval.py:134-137)
    if "frame_pe.pe" in ckpt:
        del ckpt["frame_pe.pe"]
    if "action_pe.pe" in ckpt:
        del ckpt["action_pe.pe"]
    result = net.load_state_dict(ckpt, strict=False)
    assert not result.unexpected_keys, result.unexpected_keys
    for k in result.missing_keys:  # only non-exported buffers may be missing
        assert k.endswith("pe.pe"), f"missing real parameter: {k}"

    rng = np.random.default_rng(0)
    feats = rng.normal(size=(T, D)).astype(np.float32)
    labels = np.repeat(rng.integers(0, C, size=5), T // 5 + 1)[:T].astype(np.int64)

    with torch.no_grad():
        saves_ref = net([torch.from_numpy(feats)], [torch.from_numpy(labels)],
                        compute_loss=False)
        ref_pred = saves_ref[0]["pred"]
        ref_blocks = [
            dict(frame_clogit=b.frame_clogit.squeeze(1).numpy(),
                 action_clogit=b.action_clogit.squeeze(1).numpy())
            for b in net.block_list
        ]

    batch_feats = jnp.array(feats)[None]
    mask = jnp.ones((1, T), bool)
    lengths = jnp.array([T], jnp.int32)
    saves, _ = model.apply({"params": params}, batch_feats, mask, lengths, train=False)

    for blk, (ours, ref) in enumerate(zip(saves, ref_blocks)):
        np.testing.assert_allclose(
            np.array(ours["frame_clogit"])[0], ref["frame_clogit"], atol=2e-4,
            err_msg=f"block {blk} frame_clogit")
        np.testing.assert_allclose(
            np.array(ours["action_clogit"])[0], ref["action_clogit"], atol=2e-4,
            err_msg=f"block {blk} action_clogit")

    last = saves[-1]
    pred = decode.decode_two_branch(
        last["action_clogit"], last["a2f_attn"], last["frame_clogit"],
        cfg.FACT.mwt, jnp.ones((1, cfg.FACT.ntoken), bool))
    agree = (np.array(pred)[0] == ref_pred).mean()
    assert agree > 0.99, f"decode agreement {agree}"
