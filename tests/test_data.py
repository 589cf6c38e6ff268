import os

import numpy as np
import pytest

from fact_clip_tpu.configs.default import get_cfg_defaults
from fact_clip_tpu.data.batching import (
    BatchAssembler,
    EvalLoader,
    TrainLoader,
    bucket_for,
    make_bucket_lengths,
    scan_dataset_caps,
)
from fact_clip_tpu.data.dataset import create_dataset
from fact_clip_tpu.data.io import load_action_mapping, read_groundtruth_lines
from fact_clip_tpu.data.synthetic import make_fixture_dataset


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("ds")
    base = make_fixture_dataset(str(root), name="gtea", n_classes=6, n_train=8, n_test=4)
    return base


def _cfg_for(base, **over):
    cfg = get_cfg_defaults()
    cfg.dataset = "gtea"
    cfg.feature_path = os.path.join(base, "features")
    cfg.groundTruth_path = os.path.join(base, "groundTruth")
    cfg.map_fname = os.path.join(base, "mapping.txt")
    cfg.split_path = os.path.join(base, "splits")
    cfg.feature_transpose = True
    cfg.bg_class = 0
    for k, v in over.items():
        cfg[k] = v
    return cfg


def test_mapping_io(fixture_dir):
    l2i, i2l = load_action_mapping(os.path.join(fixture_dir, "mapping.txt"))
    assert l2i["background"] == 0
    assert i2l[1] == "act_1"
    assert len(l2i) == 6


def test_groundtruth_io(fixture_dir):
    lines = read_groundtruth_lines(os.path.join(fixture_dir, "groundTruth"), "train_vid_000")
    assert len(lines) >= 120
    assert all(l in ("background",) or l.startswith("act_") for l in lines)


def test_create_dataset(fixture_dir):
    cfg = _cfg_for(fixture_dir)
    train_ds, test_ds = create_dataset(cfg)
    assert len(train_ds) == 8 and len(test_ds) == 4
    assert train_ds.nclasses == 6
    assert train_ds.input_dimension == 32
    assert train_ds.bg_class == [0]
    item = train_ds["train_vid_000"]
    assert item.feature.shape[0] == len(item.train_label)
    assert len(item.transcript) >= 3
    # transcript/seg_label consistency
    np.testing.assert_array_equal(item.transcript[item.seg_label], item.train_label)


def test_create_dataset_sr(fixture_dir):
    cfg = _cfg_for(fixture_dir, sr=3)
    train_ds, _ = create_dataset(cfg)
    item = train_ds["train_vid_000"]
    assert len(item.train_label) == (len(item.eval_label) - 1) // 3 + 1
    assert item.feature.shape[0] == len(item.train_label)


def test_debug_mode_trains_on_test(fixture_dir):
    cfg = _cfg_for(fixture_dir)
    cfg.aux.debug = True
    train_ds, test_ds = create_dataset(cfg)
    assert train_ds is test_ds


def test_holdout_filtering(fixture_dir):
    cfg = _cfg_for(fixture_dir)
    cfg.holdout_mode = True
    cfg.holdout_classes = [2]
    train_ds, test_ds = create_dataset(cfg)
    # no training video may contain class 2
    for v in train_ds.get_vnames():
        assert 2 not in train_ds[v].train_label
    assert test_ds.holdout_classes == [2]
    assert 2 not in train_ds.seen_classes
    assert len(train_ds.seen_classes) == 5


def test_bucket_lengths():
    buckets = make_bucket_lengths(1000, multiple=128, growth=1.26)
    assert all(b % 128 == 0 for b in buckets)
    assert buckets == sorted(set(buckets))
    assert buckets[-1] >= 1000
    assert bucket_for(1, buckets) == 128
    assert bucket_for(129, buckets) >= 129
    with pytest.raises(ValueError):
        bucket_for(10**9, buckets)


def test_batch_assembly(fixture_dir):
    cfg = _cfg_for(fixture_dir)
    train_ds, test_ds = create_dataset(cfg)
    buckets, seg_cap = scan_dataset_caps([train_ds, test_ds], cfg)
    asm = BatchAssembler(train_ds, seg_cap, buckets)
    vnames = train_ds.get_vnames()[:3]
    batch = asm.assemble(vnames)

    assert batch.feats.shape[0] == 3
    assert batch.feats.shape[1] in buckets
    assert batch.feats.shape[2] == 32
    for i, v in enumerate(vnames):
        item = train_ds[v]
        t = len(item.train_label)
        assert batch.lengths[i] == t
        assert batch.mask[i, :t].all() and not batch.mask[i, t:].any()
        np.testing.assert_array_equal(batch.labels[i, :t], item.train_label)
        np.testing.assert_array_equal(batch.feats[i, :t], item.feature)
        assert (batch.feats[i, t:] == 0).all()
        s = len(item.transcript)
        assert batch.seg_mask[i, :s].all() and not batch.seg_mask[i, s:].any()
        np.testing.assert_array_equal(batch.transcript[i, :s], item.transcript)
        # padding labels continue the last value (in-range gathers)
        if t < batch.labels.shape[1]:
            assert (batch.labels[i, t:] == item.train_label[-1]).all()


def test_train_loader_epoch(fixture_dir):
    cfg = _cfg_for(fixture_dir)
    train_ds, test_ds = create_dataset(cfg)
    buckets, seg_cap = scan_dataset_caps([train_ds, test_ds], cfg)
    asm = BatchAssembler(train_ds, seg_cap, buckets)
    loader = TrainLoader(train_ds, batch_size=3, assembler=asm, seed=0)
    assert len(loader) == 3  # ceil(8/3)
    seen = []
    for batch in loader:
        assert len(batch.vnames) == 3  # wrap-around keeps batches full
        seen.extend(batch.vnames)
    assert set(seen) == set(train_ds.get_vnames())  # every video appears
    assert len(seen) == 9  # 8 + 1 wrapped


def test_eval_loader_covers_all_once(fixture_dir):
    cfg = _cfg_for(fixture_dir)
    _, test_ds = create_dataset(cfg)
    buckets, seg_cap = scan_dataset_caps([test_ds], cfg)
    asm = BatchAssembler(test_ds, seg_cap, buckets)
    loader = EvalLoader(test_ds, batch_size=3, assembler=asm)
    seen = [v for b in loader for v in b.vnames]
    # tail batches are padded by repeating the last video (static shapes);
    # coverage is what matters
    assert set(seen) == set(test_ds.get_vnames())
    for b in loader:
        assert len(b.vnames) == 3


def test_seg_cap_violation(fixture_dir):
    cfg = _cfg_for(fixture_dir)
    train_ds, _ = create_dataset(cfg)
    asm = BatchAssembler(train_ds, seg_cap=1, buckets=[512])
    with pytest.raises(ValueError):
        asm.assemble(train_ds.get_vnames()[:1])


def test_prefetch_iterator_matches_direct():
    from fact_clip_tpu.data.prefetch import prefetch

    items = list(range(20))
    assert list(prefetch(items, depth=3)) == items
    # exceptions propagate to the consumer
    def gen():
        yield 1
        raise RuntimeError("boom")

    import pytest as _pytest

    with _pytest.raises(RuntimeError):
        list(prefetch(gen(), depth=2))


@pytest.mark.parametrize("sr", [1, 3])
def test_streaming_features_match_cached(fixture_dir, sr, monkeypatch):
    """Streaming mode (features read per batch) must produce byte-identical
    batches to the cached mode, with and without the native loader."""
    cfg_c = _cfg_for(fixture_dir, sr=sr)
    ds_c, _ = create_dataset(cfg_c)

    cfg_s = _cfg_for(fixture_dir, sr=sr)
    cfg_s.TPU.cache_features = False
    ds_s, _ = create_dataset(cfg_s)

    assert ds_s.input_dimension == ds_c.input_dimension
    buckets, seg_cap = scan_dataset_caps([ds_c], cfg_c)
    asm_c = BatchAssembler(ds_c, seg_cap, buckets)
    asm_s = BatchAssembler(ds_s, seg_cap, buckets)
    vnames = ds_c.get_vnames()[:4]

    b_c = asm_c.assemble(vnames)
    b_s = asm_s.assemble(vnames)
    np.testing.assert_allclose(b_s.feats, b_c.feats, rtol=1e-6)
    np.testing.assert_array_equal(b_s.labels, b_c.labels)
    np.testing.assert_array_equal(b_s.lengths, b_c.lengths)

    # numpy fallback path
    from fact_clip_tpu.data import native

    monkeypatch.setattr(native, "available", lambda: False)
    b_f = asm_s.assemble(vnames)
    np.testing.assert_allclose(b_f.feats, b_c.feats, rtol=1e-6)
