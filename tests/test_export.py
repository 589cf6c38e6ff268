"""AOT serving-export tests (engine/export.py).

Covers: CPU round-trip equality vs the live eval step, cross-compilation of
the Pallas-fused TPU artifact from this CPU-pinned process, the
ServingModel bucket/pad/trim plumbing over variable-length inputs, the
multi-platform/Pallas exclusion rule, and the transcript-mode calling
convention.
"""

import numpy as np
import pytest

from fact_clip_tpu.data.synthetic import make_fixture_dataset
from fact_clip_tpu.engine.export import (
    export_serving,
    load_serving,
    save_serving,
)
from fact_clip_tpu.engine.setup import build_experiment
from fact_clip_tpu.engine.steps import make_step_fns

from test_train_smoke import smoke_cfg


@pytest.fixture(scope="module")
def fixture_base(tmp_path_factory):
    root = tmp_path_factory.mktemp("export_fix")
    make_fixture_dataset(
        str(root), name="gtea", n_classes=5, n_train=6, n_test=3,
        feat_dim=16, min_len=80, max_len=200, min_segs=3, max_segs=5, class_sep=3.0,
    )
    return str(root)


@pytest.fixture(scope="module")
def exp(fixture_base):
    cfg = smoke_cfg(fixture_base)
    cfg.batch_size = 2
    return build_experiment(cfg)


@pytest.fixture(scope="module")
def cpu_artifact(exp, tmp_path_factory):
    exported, meta = export_serving(exp, platforms=("cpu",))
    path = str(tmp_path_factory.mktemp("art") / "model.factserve")
    save_serving(path, exported, meta)
    return path


def _direct_eval_step(exp):
    _, eval_step = make_step_fns(
        exp.model, exp.cfg, exp.dataset.nclasses, exp.cweight, exp.clip_bundle,
        verbnoun=exp.verbnoun,
    )
    return eval_step


def test_cpu_roundtrip_matches_eval_step(exp, cpu_artifact):
    serving = load_serving(cpu_artifact)
    assert serving.meta["platforms"] == ["cpu"]
    assert serving.meta["pallas"] is False
    eval_step = _direct_eval_step(exp)
    n_batches = 0
    for batch in exp.test_loader():
        arrays = batch.device_arrays
        want = np.asarray(eval_step(exp.params, arrays))
        L = arrays["feats"].shape[1]
        got = np.asarray(
            serving.call(L, arrays["feats"], arrays["mask"], arrays["lengths"])
        )
        assert want.shape == got.shape
        np.testing.assert_array_equal(want, got)
        n_batches += 1
    assert n_batches >= 1


def test_predict_buckets_pads_and_trims(exp, cpu_artifact):
    serving = load_serving(cpu_artifact)
    eval_step = _direct_eval_step(exp)

    # ground truth per video, via the EvalLoader (its padding mirrors predict's)
    want = {}
    loader = exp.test_loader()
    for batch in loader:
        pred = np.asarray(eval_step(exp.params, batch.device_arrays))
        for i, v in enumerate(batch.vnames):
            want[v] = pred[i, : int(batch.lengths[i])]

    # shuffled variable-length inputs through the high-level API
    vnames = list(exp.test_dataset.get_vnames())
    rng = np.random.default_rng(3)
    rng.shuffle(vnames)
    feats = [np.asarray(exp.test_dataset[v].feature, np.float32) for v in vnames]
    preds = serving.predict(feats)
    assert len(preds) == len(vnames)
    for v, p, f in zip(vnames, preds, feats):
        assert p.shape == (len(f),)
        np.testing.assert_array_equal(p, want[v])


def test_tpu_artifact_cross_compiles_with_pallas(exp, tmp_path):
    L = exp.buckets[0]
    exported, meta = export_serving(exp, platforms=("tpu",), bucket_lengths=[L])
    assert meta["pallas"] is True
    e = exported[L]
    assert tuple(e.platforms) == ("tpu",)
    # the fused kernels really are in the lowered module
    assert "tpu_custom_call" in e.mlir_module()
    path = str(tmp_path / "tpu.factserve")
    save_serving(path, exported, meta)
    serving = load_serving(path)  # deserializes fine; execution needs a TPU
    assert serving.buckets == [L]
    assert serving.meta["platforms"] == ["tpu"]


def test_multiplatform_requires_pallas_off(exp, tmp_path):
    with pytest.raises(ValueError, match="[Pp]allas"):
        export_serving(exp, platforms=("tpu", "cpu"), pallas=True)

    L = exp.buckets[0]
    exported, meta = export_serving(
        exp, platforms=("tpu", "cpu"), bucket_lengths=[L]
    )
    assert meta["pallas"] is False
    path = str(tmp_path / "multi.factserve")
    save_serving(path, exported, meta)
    serving = load_serving(path)
    # the multi-platform artifact still executes on this (cpu) runtime
    batch = next(iter(exp.test_loader()))
    arrays = batch.device_arrays
    if arrays["feats"].shape[1] == L:
        eval_step = _direct_eval_step(exp)
        want = np.asarray(eval_step(exp.params, arrays))
        got = np.asarray(serving.call(L, arrays["feats"], arrays["mask"], arrays["lengths"]))
        np.testing.assert_array_equal(want, got)


@pytest.mark.slow
def test_transcript_mode_export(fixture_base, tmp_path):
    cfg = smoke_cfg(fixture_base)
    cfg.batch_size = 2
    cfg.FACT.trans = True
    cfg.FACT.mwt = 0.0
    exp = build_experiment(cfg)
    exported, meta = export_serving(exp, platforms=("cpu",))
    assert meta["trans"] is True
    path = str(tmp_path / "trans.factserve")
    save_serving(path, exported, meta)
    serving = load_serving(path)

    eval_step = _direct_eval_step(exp)
    want = {}
    for batch in exp.test_loader():
        pred = np.asarray(eval_step(exp.params, batch.device_arrays))
        for i, v in enumerate(batch.vnames):
            want[v] = pred[i, : int(batch.lengths[i])]

    vnames = list(exp.test_dataset.get_vnames())
    feats = [np.asarray(exp.test_dataset[v].feature, np.float32) for v in vnames]
    trs = [np.asarray(exp.test_dataset[v].transcript, np.int32) for v in vnames]
    with pytest.raises(ValueError, match="transcript"):
        serving.predict(feats)
    preds = serving.predict(feats, transcripts=trs)
    for v, p in zip(vnames, preds):
        np.testing.assert_array_equal(p, want[v])


def test_tpu_artifact_cross_compiles_quantized(fixture_base, tmp_path):
    """TPU.quantize_infer=int8 bakes the int8 towers into the TPU artifact
    (Mosaic lowering is device-independent, so this works from CPU too)."""
    from fact_clip_tpu.engine.setup import build_experiment

    cfg = smoke_cfg(fixture_base)
    cfg.batch_size = 2
    cfg.TPU.quantize_infer = "int8"
    exp2 = build_experiment(cfg)
    L = exp2.buckets[0]
    exported, meta = export_serving(exp2, platforms=("tpu",), bucket_lengths=[L])
    assert meta["pallas"] is True
    assert "quantize_infer: int8" in meta["cfg"]
    e = exported[L]
    assert "tpu_custom_call" in e.mlir_module()
    # int8 tensors really appear in the lowered module — 'tpu_custom_call'
    # alone is also emitted by the bf16 kernels, so it cannot detect the
    # quantized path silently falling back
    assert "xi8>" in e.mlir_module()
    path = str(tmp_path / "tpu_q8.factserve")
    save_serving(path, exported, meta)
    serving = load_serving(path)
    assert serving.meta["platforms"] == ["tpu"]


def test_bf16_serving_artifact_roundtrip(fixture_base, tmp_path):
    """TPU.compute_dtype=bfloat16 — the production serving recommendation
    (configs/havid_tpu.yaml, BASELINE dtype matrix: bf16 is 1.185x f32) —
    bakes into the artifact and the CPU round-trip matches the live bf16
    eval step exactly."""
    cfg = smoke_cfg(fixture_base)
    cfg.batch_size = 2
    cfg.TPU.compute_dtype = "bfloat16"
    exp2 = build_experiment(cfg)
    L = exp2.buckets[0]

    # TPU artifact: bf16 tensors present in the lowered fused module
    exported, meta = export_serving(exp2, platforms=("tpu",), bucket_lengths=[L])
    assert "compute_dtype: bfloat16" in meta["cfg"]
    assert "xbf16>" in exported[L].mlir_module()

    # CPU artifact executes here and matches the live bf16 eval step
    exported, meta = export_serving(exp2, platforms=("cpu",), bucket_lengths=[L])
    path = str(tmp_path / "bf16.factserve")
    save_serving(path, exported, meta)
    serving = load_serving(path)
    eval_step = _direct_eval_step(exp2)
    for batch in exp2.test_loader():
        arrays = batch.device_arrays
        if arrays["feats"].shape[1] != L:
            continue
        want = np.asarray(eval_step(exp2.params, arrays))
        got = np.asarray(serving.call(L, arrays["feats"], arrays["mask"], arrays["lengths"]))
        np.testing.assert_array_equal(want, got)
