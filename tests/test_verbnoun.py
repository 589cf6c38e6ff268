import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fact_clip_tpu.configs.default import get_cfg_defaults
from fact_clip_tpu.data.synthetic import make_epic_fixture
from fact_clip_tpu.engine.train_loop import run_train
from fact_clip_tpu.models import verbnoun


def test_combine_verb_noun_probs(rng):
    n1, n2 = 3, 4
    vids = jnp.array([0, 1, 2, 2], jnp.int32)
    nids = jnp.array([0, 1, 2, 3], jnp.int32)
    clogit = jnp.array(rng.normal(size=(1, 5, n1 + n2)), jnp.float32)
    a = np.array(verbnoun.combine_verb_noun(clogit, vids, nids, n1))
    v = np.array(jax.nn.softmax(clogit[..., :n1], -1))
    n = np.array(jax.nn.softmax(clogit[..., n1:], -1))
    expected = v[..., [0, 1, 2, 2]] * n[..., [0, 1, 2, 3]]
    np.testing.assert_allclose(a, expected, atol=1e-6)
    # log variant
    la = np.array(verbnoun.combine_verb_noun(clogit, vids, nids, n1, apply_log=True))
    np.testing.assert_allclose(np.exp(la), expected, atol=1e-6)


def test_combine_verb_noun_action_null(rng):
    n1, n2 = 3, 4
    vids = jnp.array([0, 1], jnp.int32)
    nids = jnp.array([0, 1], jnp.int32)
    clogit = jnp.array(rng.normal(size=(1, 2, n1 + n2 + 2)), jnp.float32)
    a = np.array(verbnoun.combine_verb_noun(clogit, vids, nids, n1, action=True))
    assert a.shape == (1, 2, 3)  # 2 actions + null
    v = np.array(jax.nn.softmax(clogit[..., : n1 + 1], -1))
    n = np.array(jax.nn.softmax(clogit[..., n1 + 1 :], -1))
    np.testing.assert_allclose(a[..., -1], v[..., -1] * n[..., -1], atol=1e-6)


def test_split_softmax(rng):
    x = jnp.array(rng.normal(size=(2, 3, 7)), jnp.float32)
    p = np.array(verbnoun.split_softmax(x, 3))
    np.testing.assert_allclose(p[..., :3].sum(-1), 1.0, atol=1e-5)
    np.testing.assert_allclose(p[..., 3:].sum(-1), 1.0, atol=1e-5)


@pytest.fixture(scope="module")
def epic_fixture(tmp_path_factory):
    root = tmp_path_factory.mktemp("epic")
    base = make_epic_fixture(
        str(root), n_verbs=3, n_nouns=4, n_actions=6, n_train=6, n_test=3,
        feat_dim=16, min_len=80, max_len=200, class_sep=3.0,
    )
    return base


def test_load_vids_nids(epic_fixture):
    vids, nids = verbnoun.load_vids_nids(epic_fixture)
    assert len(vids) == 6 and len(nids) == 6
    assert vids.max() < 3 and nids.max() < 4


@pytest.mark.slow
def test_verbnoun_training_smoke(epic_fixture, tmp_path):
    cfg = get_cfg_defaults()
    cfg.dataset = "epic"
    cfg.feature_path = os.path.join(epic_fixture, "features")
    cfg.groundTruth_path = os.path.join(epic_fixture, "groundTruth")
    cfg.map_fname = os.path.join(epic_fixture, "mapping.txt")
    cfg.split_path = epic_fixture
    cfg.bg_class = 0
    cfg.average_transcript_len = 4.0
    cfg.sr = 2

    cfg.FACT.block = "IU"
    cfg.FACT.ntoken = 10
    cfg.FACT.fpos = True
    cfg.FACT.cmr = 0.0
    cfg.Bi.hid_dim = 48
    cfg.Bi.a_dim = 24
    cfg.Bi.a_ffdim = 48
    cfg.Bi.a_layers = 2
    cfg.Bi.a_nhead = 4
    cfg.Bi.f = "m2"
    cfg.Bi.f_dim = 32
    cfg.Bi.f_layers = 3
    cfg.Bi.f_ln = False
    cfg.Bi.f_ngp = 1
    cfg.Bi.dropout = 0.1
    cfg.BU.f_layers = 2
    cfg.Loss.match = "o2m"
    cfg.Loss.sw = 1.0
    cfg.Loss.pc = 0.2
    cfg.Loss.nullw = 0.05
    cfg.batch_size = 2
    cfg.optimizer = "Adam"
    cfg.lr = 0.002
    cfg.epoch = 20
    cfg.aux.print_every = 10
    cfg.aux.eval_every = 30
    cfg.aux.resume = ""
    cfg.aux.logdir = "log/vnsmoke"
    cfg.aux.exp = "vnsmoke"
    cfg.TM.use = False
    cfg.TPU.bucket_multiple = 64

    state, best_ckpt = run_train(cfg, base_dir=str(tmp_path))
    assert best_ckpt is not None
    m = best_ckpt.metrics
    assert np.isfinite(m["AccB"])
    # factored verb/noun heads on a separable fixture must beat chance (1/6)
    assert m["AccB"] > 35.0, m


@pytest.mark.slow
def test_composed_ops_match_dense(rng):
    """Chunked lazy composition == dense composition on small shapes."""
    import jax

    from fact_clip_tpu.models import losses
    from fact_clip_tpu.ops import verbnoun_compose as vc

    B, T, n1, n2, n_act = 2, 17, 4, 5, 11
    vids = jnp.array(rng.integers(0, n1, n_act), jnp.int32)
    nids = jnp.array(rng.integers(0, n2, n_act), jnp.int32)
    lv = jax.nn.log_softmax(jnp.array(rng.normal(size=(B, T, n1)), jnp.float32), -1)
    ln = jax.nn.log_softmax(jnp.array(rng.normal(size=(B, T, n2)), jnp.float32), -1)
    dense = np.array(lv[..., vids] + ln[..., nids])  # (B, T, n_act)

    # argmax
    idx = np.array(vc.composed_argmax(lv, ln, vids, nids, chunk=3))
    np.testing.assert_array_equal(idx, dense.argmax(-1))

    # gather
    labels = jnp.array(rng.integers(0, n_act, (B, T)), jnp.int32)
    g = np.array(vc.composed_gather(lv, ln, vids, nids, labels))
    expected = np.take_along_axis(dense, np.array(labels)[..., None], axis=-1)[..., 0]
    np.testing.assert_allclose(g, expected, atol=1e-6)

    # smooth loss vs the dense implementation
    pair_mask = jnp.ones((B, T - 1), bool)
    ours = np.array(vc.composed_smooth_loss(lv, ln, vids, nids, pair_mask, chunk=3))
    ref = np.array(losses.smooth_loss(jnp.array(dense), pair_mask, is_logit=False))
    np.testing.assert_allclose(ours, ref, atol=1e-5)

    # decode vs the dense log-prob decode
    M = 6
    action_logp = jax.nn.log_softmax(jnp.array(rng.normal(size=(B, M, n_act + 1)), jnp.float32), -1)
    a2f = jax.nn.softmax(jnp.array(rng.normal(size=(B, T, M)), jnp.float32), -1)
    tm = jnp.ones((B, M), bool)
    from fact_clip_tpu.models import decode as dec

    ref_pred = np.array(dec.decode_two_branch_logp(action_logp, a2f, jnp.array(dense), 0.1, tm))
    ours_pred = np.array(vc.composed_decode(action_logp, a2f, lv, ln, vids, nids, 0.1, tm, chunk=3))
    np.testing.assert_array_equal(ours_pred, ref_pred)


def test_composed_argmax_factored_matches_dense():
    """Factored (verb,noun) argmax == dense composed argmax (exact)."""
    from fact_clip_tpu.ops.verbnoun_compose import (
        build_factored_tables, composed_argmax, composed_argmax_factored,
    )

    rng = np.random.default_rng(0)
    n1, n2, n_act = 13, 11, 37
    pairs = set()
    while len(pairs) < n_act:
        pairs.add((int(rng.integers(0, n1)), int(rng.integers(0, n2))))
    pairs = sorted(pairs)
    vids = np.array([p[0] for p in pairs], np.int32)
    nids = np.array([p[1] for p in pairs], np.int32)

    B, T = 3, 50
    lv = jnp.asarray(rng.normal(size=(B, T, n1)).astype(np.float32))
    ln = jnp.asarray(rng.normal(size=(B, T, n2)).astype(np.float32))

    dense = composed_argmax(lv, ln, jnp.asarray(vids), jnp.asarray(nids))
    mask_vn, a_table = build_factored_tables(vids, nids, n1, n2)
    fact = composed_argmax_factored(lv, ln, jnp.asarray(mask_vn), jnp.asarray(a_table))
    np.testing.assert_array_equal(np.asarray(dense), np.asarray(fact))

    # and through the dispatching wrapper
    viat = composed_argmax(lv, ln, jnp.asarray(vids), jnp.asarray(nids),
                           tables=(jnp.asarray(mask_vn), jnp.asarray(a_table)))
    np.testing.assert_array_equal(np.asarray(dense), np.asarray(viat))
