import os

import numpy as np
import pytest

from fact_clip_tpu.configs.default import get_cfg_defaults
from fact_clip_tpu.data.synthetic import make_fixture_dataset
from fact_clip_tpu.engine.train_loop import run_train


@pytest.fixture(scope="module")
def fixture_base(tmp_path_factory):
    root = tmp_path_factory.mktemp("smoke")
    make_fixture_dataset(
        str(root), name="gtea", n_classes=5, n_train=6, n_test=3,
        feat_dim=16, min_len=80, max_len=200, min_segs=3, max_segs=5, class_sep=3.0,
    )
    return str(root)


def smoke_cfg(base, block="iuU"):
    cfg = get_cfg_defaults()
    cfg.dataset = "gtea"
    ds_base = os.path.join(base, "data", "gtea")
    cfg.feature_path = os.path.join(ds_base, "features")
    cfg.groundTruth_path = os.path.join(ds_base, "groundTruth")
    cfg.map_fname = os.path.join(ds_base, "mapping.txt")
    cfg.split_path = os.path.join(ds_base, "splits")
    cfg.feature_transpose = True
    cfg.bg_class = 0
    cfg.average_transcript_len = 4.0

    cfg.FACT.block = block
    cfg.FACT.ntoken = 10
    cfg.FACT.fpos = False
    cfg.FACT.cmr = 0.0
    cfg.FACT.mwt = 0.3
    cfg.Bi.hid_dim = 48
    cfg.Bi.a_dim = 24
    cfg.Bi.a_ffdim = 48
    cfg.Bi.a_layers = 2
    cfg.Bi.a_nhead = 4
    cfg.Bi.f = "m"
    cfg.Bi.f_dim = 32
    cfg.Bi.f_layers = 4
    cfg.Bi.f_ln = False
    cfg.Bi.f_ngp = 1
    cfg.Bi.dropout = 0.1
    cfg.Bu.f_layers = 3
    cfg.BU.f_layers = 3
    cfg.Loss.sw = 1.0
    cfg.Loss.pc = 0.2
    cfg.TM.use = False

    cfg.batch_size = 3
    cfg.optimizer = "Adam"
    cfg.lr = 0.002
    cfg.epoch = 40
    cfg.aux.print_every = 20
    cfg.aux.eval_every = 40
    cfg.aux.resume = ""
    cfg.aux.logdir = "log/smoke"
    cfg.aux.exp = "smoke"
    cfg.TPU.bucket_multiple = 64
    return cfg


@pytest.mark.slow
def test_training_learns_and_checkpoints(fixture_base, tmp_path):
    cfg = smoke_cfg(fixture_base)
    state, best_ckpt = run_train(cfg, base_dir=str(tmp_path))

    logdir = os.path.join(str(tmp_path), cfg.aux.logdir)
    assert os.path.exists(os.path.join(logdir, "FINISH_PROOF"))
    assert os.path.exists(os.path.join(logdir, "args.json"))
    ckpts = os.listdir(os.path.join(logdir, "ckpts"))
    assert any(f.startswith("network.iter-") for f in ckpts)

    assert best_ckpt is not None
    m = best_ckpt.metrics
    # the fixture is nearly linearly separable: a learning model clears this easily
    assert m["AccB"] > 60.0, m
    assert np.isfinite(m["F1@0.50"])

    # without wandb the Logger appends the metric stream to metrics.jsonl
    # (reference namespaces, one JSON object per log call)
    import json

    with open(os.path.join(logdir, "metrics.jsonl")) as f:
        records = [json.loads(line) for line in f]
    assert records, "metrics.jsonl is empty"
    train_recs = [r for r in records if any(k.startswith("train-loss/") for k in r)]
    test_recs = [r for r in records if any(k.startswith("test-metric-all/") for k in r)]
    assert train_recs and test_recs
    assert all(isinstance(r["step"], int) for r in records)
    steps = [r["step"] for r in train_recs]
    assert steps == sorted(steps)


@pytest.mark.slow
def test_finish_proof_skips_rerun(fixture_base, tmp_path):
    cfg = smoke_cfg(fixture_base)
    cfg.epoch = 1
    cfg.aux.eval_every = 10**9
    run_train(cfg, base_dir=str(tmp_path))
    cfg2 = smoke_cfg(fixture_base)
    cfg2.aux.resume = "max"
    with pytest.raises(SystemExit):
        run_train(cfg2, base_dir=str(tmp_path))


@pytest.mark.slow
def test_training_multidevice_mesh(fixture_base, tmp_path):
    """run_train on a data x seq mesh over the 8 virtual devices."""
    cfg = smoke_cfg(fixture_base)
    cfg.epoch = 6
    cfg.aux.print_every = 6
    cfg.aux.eval_every = 12
    cfg.batch_size = 4
    cfg.TPU.num_data_shards = 4
    cfg.TPU.num_seq_shards = 2
    cfg.TPU.matcher = "auction"
    cfg.aux.logdir = "log/meshsmoke"
    state, best_ckpt = run_train(cfg, base_dir=str(tmp_path))
    assert best_ckpt is not None
    assert np.isfinite(best_ckpt.metrics["AccB"])


@pytest.mark.slow
def test_training_transcript_mode(fixture_base, tmp_path):
    """End-to-end training with transcripts given (seq matching, trans decode)."""
    cfg = smoke_cfg(fixture_base, block="iu")
    cfg.FACT.trans = True
    cfg.FACT.ntoken = 0
    cfg.FACT.mwt = 0.0
    cfg.Loss.match = "seq"
    cfg.epoch = 15
    cfg.aux.print_every = 10
    cfg.aux.eval_every = 15
    cfg.aux.logdir = "log/transsmoke"
    state, best_ckpt = run_train(cfg, base_dir=str(tmp_path))
    assert best_ckpt is not None
    m = best_ckpt.metrics
    # transcript-restricted decode on a separable fixture: high accuracy fast
    assert m["AccB"] > 55.0, m


def test_orbax_checkpoint_roundtrip(tmp_path):
    import jax
    import jax.numpy as jnp

    from fact_clip_tpu.engine import checkpoint as ckpt_io

    params = {"a": jnp.arange(6.0).reshape(2, 3), "b": {"c": jnp.ones(4)}}
    path = ckpt_io.save_model(params, str(tmp_path), 7, backend="orbax")
    assert path.endswith("network.iter-7.orbax")
    template = jax.tree_util.tree_map(jnp.zeros_like, params)
    loaded = ckpt_io.load_model(template, path)
    np.testing.assert_allclose(np.asarray(loaded["a"]), np.asarray(params["a"]))
    np.testing.assert_allclose(np.asarray(loaded["b"]["c"]), np.asarray(params["b"]["c"]))
    # resume discovery picks the orbax dir too
    from fact_clip_tpu.configs.default import get_cfg_defaults

    cfg = get_cfg_defaults()
    cfg.aux.resume = "max"
    import os as _os

    logdir = str(tmp_path / "run")
    _os.makedirs(_os.path.join(logdir, "ckpts"))
    ckpt_io.save_model(params, _os.path.join(logdir, "ckpts"), 3, backend="orbax")
    it, f = ckpt_io.resume_ckpt(cfg, logdir)
    assert it == 3 and f.endswith("network.iter-3.orbax")


@pytest.mark.slow
def test_training_streaming_features(fixture_base, tmp_path):
    """Training with per-batch feature streaming (cfg.TPU.cache_features=false)."""
    cfg = smoke_cfg(fixture_base, block="iu")
    cfg.epoch = 5
    cfg.aux.print_every = 5
    cfg.aux.eval_every = 10
    cfg.TPU.cache_features = False
    cfg.aux.logdir = "log/streamsmoke"
    state, best_ckpt = run_train(cfg, base_dir=str(tmp_path))
    assert best_ckpt is not None
    assert np.isfinite(best_ckpt.metrics["AccB"])


@pytest.mark.slow
def test_crash_resume_continues_from_checkpoint(fixture_base, tmp_path, capsys):
    """Crash-restart contract: after an interrupted run (no FINISH_PROOF),
    resume='max' loads the newest network.iter-N and continues from there."""
    cfg = smoke_cfg(fixture_base, block="iu")
    cfg.epoch = 4
    cfg.aux.print_every = 4
    cfg.aux.eval_every = 4  # checkpoint every 4 steps (2 steps/epoch)
    cfg.aux.resume = ""
    cfg.aux.logdir = "log/resume_smoke"
    run_train(cfg, base_dir=str(tmp_path))

    logdir = os.path.join(str(tmp_path), cfg.aux.logdir)
    ckpts = [f for f in os.listdir(os.path.join(logdir, "ckpts")) if f.startswith("network.iter-")]
    assert ckpts
    # simulate a crash: the run never wrote its completion marker
    os.remove(os.path.join(logdir, "FINISH_PROOF"))

    cfg2 = smoke_cfg(fixture_base, block="iu")
    cfg2.epoch = 6
    cfg2.aux.print_every = 4
    cfg2.aux.eval_every = 4
    cfg2.aux.resume = "max"
    cfg2.aux.logdir = "log/resume_smoke"
    run_train(cfg2, base_dir=str(tmp_path))
    out = capsys.readouterr().out
    assert "Resume from" in out
    # resumed past epoch 0: latest ckpt was at step 8 (epoch 4), 2 steps/epoch
    assert "Start Training from Epoch 4..." in out
    assert os.path.exists(os.path.join(logdir, "FINISH_PROOF"))
