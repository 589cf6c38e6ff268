"""Numeric forward-parity against the actual reference implementation.

Builds the reference PyTorch FACT (imported from /root/reference with a yacs
shim — executed as an oracle, never copied), converts its random-initialized
state_dict into our flax param tree (utils/torch_import.py), and checks that
both frameworks produce the same per-block logits, attention maps, and final
decode on the same video.  This is the checkpoint-interop guarantee of
SURVEY.md §7 (hard part 5).
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
from fact_clip_tpu.utils.segments import class_label_to_segment_data
from fact_clip_tpu.utils.torch_import import convert_fact_state_dict

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF), reason="reference repo not mounted")


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


def _cfg_pair(a_dim, hid_dim, f_kind="m"):
    """Matching (ref cfg via ref defaults, our cfg) small model configs."""
    def fill(cfg):
        cfg.FACT.block = "iuU"
        cfg.FACT.ntoken = 6
        cfg.FACT.trans = False
        cfg.FACT.fpos = False
        cfg.FACT.cmr = 0.0
        cfg.FACT.mwt = 0.1
        cfg.Bi.hid_dim = hid_dim
        cfg.Bi.dropout = 0.0
        cfg.Bi.a = "sca"
        cfg.Bi.a_nhead = 2
        cfg.Bi.a_ffdim = 24
        cfg.Bi.a_layers = 2
        cfg.Bi.a_dim = a_dim
        cfg.Bi.f = f_kind
        cfg.Bi.f_layers = 3
        cfg.Bi.f_ln = (f_kind == "m")
        cfg.Bi.f_dim = 24
        cfg.Bi.f_ngp = 1
        cfg.Bu.f_layers = 2
        cfg.BU.f_layers = 2
        cfg.TM.use = False
        return cfg
    return fill


def _run_parity(ref_modules, a_dim, hid_dim, f_kind, T=50, C=5, D=11, seed=0):
    import torch

    ref_defaults, RefFACT = ref_modules
    fill = _cfg_pair(a_dim, hid_dim, f_kind)

    ref_cfg = fill(ref_defaults())
    torch.manual_seed(seed)
    net = RefFACT(ref_cfg, D, C).eval()

    rng = np.random.default_rng(seed)
    feats = rng.normal(size=(T, D)).astype(np.float32)
    labels = np.repeat(rng.integers(0, C, size=5), T // 5 + 1)[:T].astype(np.int64)

    with torch.no_grad():
        saves_ref = net(
            [torch.from_numpy(feats)], [torch.from_numpy(labels)], compute_loss=False
        )
        ref_pred = saves_ref[0]["pred"]
        ref_blocks = [
            dict(
                frame_clogit=b.frame_clogit.squeeze(1).numpy(),
                action_clogit=b.action_clogit.squeeze(1).numpy(),
            )
            for b in net.block_list
        ]

    # ---- ours, with the converted params
    cfg = fill(get_cfg_defaults())
    bcfgs = resolve_block_cfgs(cfg)
    model = build_fact(cfg, D, C, s_pred_cap=T)

    converted = convert_fact_state_dict(
        {k: v.numpy() for k, v in net.state_dict().items()}, bcfgs
    )
    converted = jax.tree_util.tree_map(jnp.asarray, converted)

    batch_feats = jnp.array(feats)[None]
    mask = jnp.ones((1, T), bool)
    lengths = jnp.array([T], jnp.int32)
    saves, _ = model.apply(
        {"params": converted}, batch_feats, mask, lengths, train=False
    )

    for blk, (ours, ref) in enumerate(zip(saves, ref_blocks)):
        np.testing.assert_allclose(
            np.array(ours["frame_clogit"])[0], ref["frame_clogit"], atol=2e-4,
            err_msg=f"block {blk} frame_clogit",
        )
        np.testing.assert_allclose(
            np.array(ours["action_clogit"])[0], ref["action_clogit"], atol=2e-4,
            err_msg=f"block {blk} action_clogit",
        )

    last = saves[-1]
    pred = decode.decode_two_branch(
        last["action_clogit"], last["a2f_attn"], last["frame_clogit"],
        cfg.FACT.mwt, jnp.ones((1, cfg.FACT.ntoken), bool),
    )
    agree = (np.array(pred)[0] == ref_pred).mean()
    assert agree > 0.99, f"decode agreement {agree}"


def test_forward_parity_unpacked_mha(ref_modules):
    """a_dim != hid_dim: torch MHA uses unpacked q/k/v projections."""
    _run_parity(ref_modules, a_dim=16, hid_dim=32, f_kind="m")


def test_forward_parity_packed_mha_mstcn2(ref_modules):
    """a_dim == hid_dim: packed in_proj; MSTCN++ frame branches."""
    _run_parity(ref_modules, a_dim=32, hid_dim=32, f_kind="m2")


def test_loss_parity_vs_reference(ref_modules):
    """End-to-end training loss must match the reference's on the same video."""
    import torch

    ref_defaults, RefFACT = ref_modules
    sys.path.insert(0, REF)
    try:
        from fact_clip.models.loss import MatchCriterion as RefCriterion
    finally:
        sys.path.remove(REF)

    fill = _cfg_pair(16, 32, "m")
    ref_cfg = fill(ref_defaults())
    ref_cfg.Loss.nullw = 0.1
    ref_cfg.Loss.sw = 1.0
    ref_cfg.Loss.pc = 0.2
    torch.manual_seed(1)
    net = RefFACT(ref_cfg, 11, 5).eval()
    net.mcriterion = RefCriterion(ref_cfg, 5, [0])

    T, C, D = 50, 5, 11
    rng = np.random.default_rng(1)
    feats = rng.normal(size=(T, D)).astype(np.float32)
    labels = np.repeat(rng.integers(0, C, size=5), T // 5 + 1)[:T].astype(np.int64)

    with torch.no_grad():
        ref_loss, _ = net([torch.from_numpy(feats)], [torch.from_numpy(labels)], compute_loss=True)
    ref_loss = float(ref_loss)

    from fact_clip_tpu.models import losses, matching

    cfg = fill(get_cfg_defaults())
    cfg.Loss.nullw = 0.1
    cfg.Loss.sw = 1.0
    cfg.Loss.pc = 0.2
    bcfgs = resolve_block_cfgs(cfg)
    model = build_fact(cfg, D, C, s_pred_cap=T)
    converted = jax.tree_util.tree_map(
        jnp.asarray, convert_fact_state_dict({k: v.numpy() for k, v in net.state_dict().items()}, bcfgs)
    )

    transcript, seg_label = class_label_to_segment_data(labels)
    S = len(transcript)
    batch = dict(
        feats=jnp.array(feats)[None],
        mask=jnp.ones((1, T), bool),
        labels=jnp.array(labels)[None].astype(jnp.int32),
        seg_label=jnp.array(seg_label)[None].astype(jnp.int32),
        transcript=jnp.array(transcript)[None].astype(jnp.int32),
        seg_mask=jnp.ones((1, S), bool),
        lengths=jnp.array([T], jnp.int32),
    )
    saves, _ = model.apply({"params": converted}, batch["feats"], batch["mask"], batch["lengths"], train=False)
    cweight = jnp.array(losses.build_class_weights(cfg, C, [0]))
    cprob = jax.nn.softmax(saves[-1]["action_clogit"], -1)
    seg2tok = matching.match(
        cfg.Loss, cprob, saves[-1]["a2f_attn"], batch["transcript"], batch["seg_label"],
        batch["seg_mask"], batch["mask"],
    )
    ours = float(losses.fact_loss(saves, batch, seg2tok, cweight, cfg.Loss.sw)[0])
    np.testing.assert_allclose(ours, ref_loss, rtol=2e-3)


def test_verbnoun_forward_parity(ref_modules, tmp_path, monkeypatch):
    """Epic verb/noun factored-head model vs the reference implementation."""
    import torch

    from fact_clip_tpu.data.synthetic import make_epic_fixture
    from fact_clip_tpu.models.verbnoun import build_verbnoun_fact, load_vids_nids
    from fact_clip_tpu.utils.torch_import import convert_verbnoun_state_dict

    # the reference resolves its verb/noun mapping files relative to the CWD
    base = make_epic_fixture(str(tmp_path), n_verbs=3, n_nouns=4, n_actions=6,
                             n_train=2, n_test=1, feat_dim=9)
    os.makedirs(tmp_path / "data" / "epic-kitchens", exist_ok=True)
    monkeypatch.chdir(tmp_path)

    ref_defaults, _ = ref_modules
    sys.path.insert(0, REF)
    try:
        import fact_clip.models.blocks_SepVerbNoun as ref_vn

        ref_vn._VIDS = None
        ref_vn._NIDS = None

        cfg_fill = _cfg_pair(16, 32, "m2")
        ref_cfg = cfg_fill(ref_defaults())
        ref_cfg.FACT.block = "IU"
        ref_cfg.FACT.fpos = True
        torch.manual_seed(0)
        net = ref_vn.FACT(ref_cfg, 9, n_classes1=3, n_classes2=4).eval()

        T, D = 40, 9
        rng = np.random.default_rng(0)
        feats = rng.normal(size=(T, D)).astype(np.float32)
        labels = np.repeat(rng.integers(0, 6, size=4), T // 4 + 1)[:T].astype(np.int64)

        with torch.no_grad():
            saves_ref = net([torch.from_numpy(feats)], [torch.from_numpy(labels)])
            ref_pred = saves_ref[0]["pred"]
            ref_blocks = [
                dict(frame_logp=b.frame_logp.squeeze(1).numpy(),
                     action_logp=b.action_logp.squeeze(1).numpy())
                for b in net.block_list
            ]
    finally:
        sys.path.remove(REF)

    cfg = cfg_fill(get_cfg_defaults())
    cfg.FACT.block = "IU"
    cfg.FACT.fpos = True
    from fact_clip_tpu.models.blocks import resolve_block_cfgs as _resolve

    bcfgs = _resolve(cfg)
    vids, nids = load_vids_nids(base)
    model = build_verbnoun_fact(cfg, D, vids, nids, s_pred_cap=T, n_classes1=3, n_classes2=4)

    converted = jax.tree_util.tree_map(
        jnp.asarray,
        convert_verbnoun_state_dict({k: v.numpy() for k, v in net.state_dict().items()}, bcfgs),
    )
    saves, _ = model.apply(
        {"params": converted}, jnp.array(feats)[None], jnp.ones((1, T), bool),
        jnp.array([T], jnp.int32), train=False,
    )
    jvids, jnids = jnp.array(vids), jnp.array(nids)
    for blk, (ours, ref) in enumerate(zip(saves, ref_blocks)):
        # compose the factored frame log-probs densely for comparison
        frame_logp = np.array(ours["frame_vlogp"][..., jvids] + ours["frame_nlogp"][..., jnids])
        np.testing.assert_allclose(
            frame_logp[0], ref["frame_logp"], atol=3e-4,
            err_msg=f"block {blk} frame_logp",
        )
        np.testing.assert_allclose(
            np.array(ours["action_logp"])[0], ref["action_logp"], atol=3e-4,
            err_msg=f"block {blk} action_logp",
        )

    from fact_clip_tpu.ops.verbnoun_compose import composed_decode

    pred = composed_decode(
        saves[-1]["action_logp"], saves[-1]["a2f_attn"],
        saves[-1]["frame_vlogp"], saves[-1]["frame_nlogp"], jvids, jnids,
        cfg.FACT.mwt, jnp.ones((1, cfg.FACT.ntoken), bool), chunk=4,
    )
    agree = (np.array(pred)[0] == ref_pred).mean()
    assert agree > 0.99, f"decode agreement {agree}"


def test_fact_clip_parity(ref_modules, tmp_path):
    """FACT_CLIP: frame projection, holdout-masked InfoNCE, and the zero-shot
    decode vs the reference implementation."""
    import torch

    ref_defaults, _ = ref_modules
    sys.path.insert(0, REF)
    try:
        from fact_clip.models.blocks import FACT_CLIP as RefFACTCLIP
        from fact_clip.models.loss import MatchCriterion as RefCriterion
    finally:
        sys.path.remove(REF)

    C, D, T = 5, 11, 50
    fill = _cfg_pair(16, 32, "m")
    ref_cfg = fill(ref_defaults())
    ref_cfg.Loss.nullw = 0.1
    ref_cfg.Loss.sw = 1.0
    ref_cfg.use_clip = True
    ref_cfg.holdout_mode = True
    ref_cfg.holdout_classes = [2]
    ref_cfg.CLIP.temp = 0.07
    ref_cfg.CLIP.projection_hidden_dim = 16
    ref_cfg.CLIP.projection_dropout = 0.0

    rng = np.random.default_rng(3)
    text_emb = rng.normal(size=(C, 8)).astype(np.float32)
    text_emb /= np.linalg.norm(text_emb, axis=-1, keepdims=True)

    torch.manual_seed(3)
    net = RefFACTCLIP(ref_cfg, D, C, text_embeddings=torch.from_numpy(text_emb)).eval()
    # the reference projection is hardcoded to clip_dim=512; rebuild it at 8
    # dims for a compact test with the same structure
    import torch.nn as nn

    torch.manual_seed(4)
    from fact_clip.models.blocks import FeatureProjection as RefProj

    sys.path.insert(0, REF)
    try:
        net.frame_projection = RefProj(
            feature_dim=ref_cfg.Bi.hid_dim - C, clip_dim=8, hidden_dim=16, dropout=0.0
        ).eval()
    finally:
        sys.path.remove(REF)
    net.mcriterion = RefCriterion(ref_cfg, C, [0])

    feats = rng.normal(size=(T, D)).astype(np.float32)
    labels = np.repeat(np.array([0, 1, 3, 4, 0]), T // 5)[:T].astype(np.int64)  # seen only

    with torch.no_grad():
        net._forward_one_video(torch.from_numpy(feats).unsqueeze(1), None)
        ref_pred = net.eval_with_clip(None).numpy()
        ref_loss = float(net._loss_one_video(torch.from_numpy(labels)))

    # ---- ours
    from fact_clip_tpu.engine.setup import build_clip_bundle
    from fact_clip_tpu.models import losses, matching
    from fact_clip_tpu.models.clip_model import build_fact_clip
    from fact_clip_tpu.utils.torch_import import convert_fact_state_dict

    cfg = fill(get_cfg_defaults())
    cfg.Loss.nullw = 0.1
    cfg.Loss.sw = 1.0
    cfg.use_clip = True
    cfg.holdout_mode = True
    cfg.holdout_classes = [2]
    cfg.CLIP.temp = 0.07
    cfg.CLIP.projection_hidden_dim = 16
    cfg.CLIP.projection_dropout = 0.0

    model = build_fact_clip(cfg, D, C, s_pred_cap=T, clip_dim=8)
    bundle = build_clip_bundle(cfg, text_emb, holdout_classes=[2])

    sd = {k: v.numpy() for k, v in net.state_dict().items()}
    bcfgs = resolve_block_cfgs(cfg)
    converted = jax.tree_util.tree_map(jnp.asarray, convert_fact_state_dict(sd, bcfgs))

    transcript, seg_label = class_label_to_segment_data(labels)
    S = len(transcript)
    batch = dict(
        feats=jnp.array(feats)[None], mask=jnp.ones((1, T), bool),
        labels=jnp.array(labels)[None].astype(jnp.int32),
        seg_label=jnp.array(seg_label)[None].astype(jnp.int32),
        transcript=jnp.array(transcript)[None].astype(jnp.int32),
        seg_mask=jnp.ones((1, S), bool), lengths=jnp.array([T], jnp.int32),
    )
    saves, frame_emb = model.apply(
        {"params": converted}, batch["feats"], batch["mask"], batch["lengths"], train=False
    )

    # zero-shot decode parity
    pred = decode.decode_with_clip(
        saves[-1]["action_clogit"], saves[-1]["a2f_attn"], frame_emb,
        bundle["text_emb"], bundle["temp"], cfg.FACT.mwt,
        jnp.ones((1, cfg.FACT.ntoken), bool),
    )
    agree = (np.array(pred)[0] == ref_pred).mean()
    assert agree > 0.99, f"clip decode agreement {agree}"

    # combined loss parity (fact + holdout-masked InfoNCE)
    cweight = jnp.array(losses.build_class_weights(cfg, C, [0]))
    cprob = jax.nn.softmax(saves[-1]["action_clogit"], -1)
    seg2tok = matching.match(
        cfg.Loss, cprob, saves[-1]["a2f_attn"], batch["transcript"], batch["seg_label"],
        batch["seg_mask"], batch["mask"],
    )
    fact_l = losses.fact_loss(saves, batch, seg2tok, cweight, cfg.Loss.sw)
    remapped = bundle["label_map"][batch["labels"]]
    cont_l = losses.infonce_contrastive_loss(
        frame_emb, bundle["seen_text_emb"], jnp.maximum(remapped, 0),
        batch["mask"] & (remapped >= 0), bundle["temp"],
    )
    total = float(bundle["fact_w"] * fact_l[0] + bundle["cont_w"] * cont_l[0])
    np.testing.assert_allclose(total, ref_loss, rtol=2e-3)
