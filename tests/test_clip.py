import os

import jax.numpy as jnp
import numpy as np
import pytest

from fact_clip_tpu.configs.default import get_cfg_defaults
from fact_clip_tpu.data.synthetic import make_fixture_dataset
from fact_clip_tpu.data.text_prompts import generate_action_prompt, is_havid_label, parse_havid_label
from fact_clip_tpu.engine.setup import build_clip_bundle
from fact_clip_tpu.engine.train_loop import run_train
from fact_clip_tpu.models import decode, losses


# ------------------------------------------------------------- HAViD prompts
def test_parse_havid_label_full():
    p = parse_havid_label("sshc1dh")
    assert p == {
        "verb": "screws",
        "manipulated_object": "hex screw",
        "target_object": "cylinder plate hole 1",
        "tool": "hex screwdriver",
    }


def test_generate_action_prompt_examples():
    # the reference's docstring example (havid_text_prompts.py:12)
    assert (
        generate_action_prompt("sshc1dh")
        == "a person screws a hex screw into cylinder plate hole 1 with a hex screwdriver"
    )
    assert generate_action_prompt("gnt") == "a person grasps a nut"
    assert generate_action_prompt("null") == "noise: null"
    assert generate_action_prompt("w") == "noise: wrong"
    assert generate_action_prompt("iglft") == "a person inserts a large gear into gear shaft"


def test_is_havid_label():
    assert is_havid_label("sshc1dh")
    assert is_havid_label("null")
    assert not is_havid_label("crack_egg")
    assert not is_havid_label("")


# ------------------------------------------------------------ clip bundle
def test_clip_bundle_holdout_remap():
    cfg = get_cfg_defaults()
    emb = np.random.default_rng(0).normal(size=(6, 8)).astype(np.float32)
    bundle = build_clip_bundle(cfg, emb, holdout_classes=[2, 4])
    assert bundle["seen_text_emb"].shape == (4, 8)
    lm = np.array(bundle["label_map"])
    np.testing.assert_array_equal(lm, [0, 1, -1, 2, -1, 3])
    np.testing.assert_allclose(np.array(bundle["seen_text_emb"])[2], emb[3])


def test_infonce_masked_per_video(rng):
    B, T, E, n = 2, 12, 8, 4
    emb = rng.normal(size=(B, T, E)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=-1, keepdims=True)
    text = rng.normal(size=(n, E)).astype(np.float32)
    text /= np.linalg.norm(text, axis=-1, keepdims=True)
    labels = rng.integers(0, n, (B, T))
    mask = np.ones((B, T), bool)
    mask[1, 8:] = False
    out = np.array(
        losses.infonce_contrastive_loss(jnp.array(emb), jnp.array(text), jnp.array(labels), jnp.array(mask), 0.07)
    )
    assert out.shape == (2,)
    assert np.isfinite(out).all()
    # padding invariance for video 1
    solo = np.array(
        losses.infonce_contrastive_loss(
            jnp.array(emb[1:2, :8]), jnp.array(text), jnp.array(labels[1:2, :8]),
            jnp.array(np.ones((1, 8), bool)), 0.07,
        )
    )
    np.testing.assert_allclose(out[1], solo[0], atol=1e-5)


def test_decode_with_clip_prefers_similar_class(rng):
    B, T, M, C, E = 1, 6, 4, 5, 8
    text = np.eye(C, E).astype(np.float32)
    # frame embeddings aligned with class 3
    emb = np.tile(text[3], (B, T, 1))
    aclog = np.full((B, M, C + 1), -5.0, np.float32)
    aclog[:, :, C] = 5.0  # all tokens null -> pure CLIP fallback
    a2f = np.full((B, T, M), 0.25, np.float32)
    pred = decode.decode_with_clip(
        jnp.array(aclog), jnp.array(a2f), jnp.array(emb), jnp.array(text), 0.07, 0.1,
        jnp.ones((B, M), bool),
    )
    assert (np.array(pred) == 3).all()


# ------------------------------------------------------- end-to-end holdout
@pytest.fixture(scope="module")
def clip_fixture(tmp_path_factory):
    root = tmp_path_factory.mktemp("clipds")
    make_fixture_dataset(
        str(root), name="havid_view0_lh_pt", n_classes=6, n_train=10, n_test=4,
        feat_dim=16, min_len=60, max_len=150, class_sep=3.0,
        label_names=["null", "gnt", "sshc1dh", "iglft", "pntbx", "rhdcb"],
    )
    return str(root)


def clip_cfg(base):
    cfg = get_cfg_defaults()
    cfg.dataset = "havid_view0_lh_pt"
    ds_base = os.path.join(base, "data", "havid_view0_lh_pt")
    cfg.feature_path = os.path.join(ds_base, "features")
    cfg.groundTruth_path = os.path.join(ds_base, "groundTruth")
    cfg.map_fname = os.path.join(ds_base, "mapping.txt")
    cfg.split_path = os.path.join(ds_base, "splits")
    cfg.feature_transpose = True
    cfg.bg_class = 0
    cfg.average_transcript_len = 4.0
    cfg.use_clip = True
    cfg.holdout_mode = True
    cfg.holdout_classes = [3]

    cfg.FACT.block = "iu"
    cfg.FACT.ntoken = 8
    cfg.FACT.fpos = False
    cfg.FACT.cmr = 0.0
    cfg.Bi.hid_dim = 48
    cfg.Bi.a_dim = 24
    cfg.Bi.a_ffdim = 48
    cfg.Bi.a_layers = 2
    cfg.Bi.a_nhead = 4
    cfg.Bi.f = "m"
    cfg.Bi.f_dim = 32
    cfg.Bi.f_layers = 3
    cfg.Bi.f_ln = False
    cfg.Bi.f_ngp = 1
    cfg.Bi.dropout = 0.1
    cfg.Bu.f_layers = 2
    cfg.Loss.sw = 1.0
    cfg.Loss.pc = 0.2
    cfg.CLIP.temp = 0.1
    cfg.CLIP.projection_hidden_dim = 32
    cfg.batch_size = 3
    cfg.optimizer = "Adam"
    cfg.lr = 0.002
    cfg.epoch = 30
    cfg.aux.print_every = 10
    cfg.aux.eval_every = 10
    cfg.aux.resume = ""
    cfg.aux.logdir = "log/clipsmoke"
    cfg.aux.exp = "clipsmoke"
    cfg.TM.use = False
    cfg.TPU.bucket_multiple = 64
    return cfg


@pytest.mark.slow
def test_fact_clip_holdout_training(clip_fixture, tmp_path):
    cfg = clip_cfg(clip_fixture)
    # synthetic "text embeddings": one-hot-ish directions per class
    rng = np.random.default_rng(0)
    emb = rng.normal(size=(6, 32)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=-1, keepdims=True)

    state, best_ckpt = run_train(cfg, text_embeddings=emb, base_dir=str(tmp_path))
    assert best_ckpt is not None
    m = best_ckpt.metrics
    # holdout metric groups must exist
    assert "Acc-seen" in m
    assert "Acc-unseen" in m  # class 3 appears in the test split
    assert np.isfinite(m["Acc-seen"])
    # training videos were filtered: seen-class accuracy should be learnable
    assert m["Acc-seen"] > 50.0, m
    # detailed results JSON was written
    logdir = os.path.join(str(tmp_path), cfg.aux.logdir)
    saves = os.listdir(os.path.join(logdir, "saves"))
    assert any(f.endswith("_detailed.json") for f in saves)


def test_text_embedding_cache_roundtrip(tmp_path):
    """Cached text embeddings load from both .pt (reference format) and .npy."""
    import torch

    from fact_clip_tpu.configs.default import get_cfg_defaults
    from fact_clip_tpu.data.text_embeddings import (
        get_or_compute_text_embeddings,
        load_text_embeddings,
        save_text_embeddings,
    )

    emb = np.random.default_rng(0).normal(size=(7, 16)).astype(np.float32)

    pt = str(tmp_path / "cache.pt")
    torch.save(torch.from_numpy(emb), pt)  # the reference's cache format
    np.testing.assert_allclose(load_text_embeddings(pt), emb)

    npy = str(tmp_path / "cache.npy")
    save_text_embeddings(emb, npy)
    np.testing.assert_allclose(load_text_embeddings(npy), emb)

    # get_or_compute with an existing cache short-circuits (no HF download)
    cfg = get_cfg_defaults()
    cfg.use_clip = True
    cfg.CLIP.text_emb_path = pt
    out = get_or_compute_text_embeddings(cfg, {}, {}, base=str(tmp_path))
    np.testing.assert_allclose(out, emb)
