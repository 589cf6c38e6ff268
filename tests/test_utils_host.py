import numpy as np
import pytest

from fact_clip_tpu.utils.metrics import edit_score, f_score, levenstein
from fact_clip_tpu.utils.reduce import easy_reduce
from fact_clip_tpu.utils.results import Checkpoint, save_results
from fact_clip_tpu.utils.segments import (
    Segment,
    class_label_to_segment_data,
    expand_frame_label,
    parse_label,
    shrink_frame_label,
)


# ------------------------------------------------------------------ segments
def test_parse_label_basic():
    segs = parse_label([1, 1, 2, 2, 2, 3])
    assert [(s.action, s.start, s.end, s.len) for s in segs] == [(1, 0, 1, 2), (2, 2, 4, 3), (3, 5, 5, 1)]


def test_parse_label_single_segment():
    segs = parse_label([7, 7, 7])
    assert len(segs) == 1 and segs[0].start == 0 and segs[0].end == 2


def test_segment_ops():
    a = Segment(1, 0, 9)
    b = Segment(1, 5, 14)
    assert a.intersect(b) == 5
    assert a.union(b) == 15
    assert Segment(1, 0, 2).intersect(Segment(1, 5, 6)) == 0


def test_expand_frame_label_matches_torch_nearest():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(3)
    for src_len, tgt_len in [(5, 13), (13, 5), (7, 7), (100, 333), (333, 100), (1, 4)]:
        label = rng.integers(0, 5, size=src_len)
        ours = expand_frame_label(label, tgt_len)
        t = torch.nn.functional.interpolate(
            torch.from_numpy(label.astype(np.float64)).view(1, 1, -1), size=tgt_len, mode="nearest"
        ).view(-1).long().numpy()
        np.testing.assert_array_equal(ours, t)


def test_shrink_frame_label_majority():
    label = [0, 0, 1, 1, 1, 2, 2, 2, 2]
    # clip_len 3: [0,0,1]->0, [1,1,2]->1, [2,2,2]->2
    assert shrink_frame_label(label, 3) == [0, 1, 2]
    assert shrink_frame_label([5], 4) == [5]


def test_shrink_expand_roundtrip_long_segments():
    label = np.repeat([0, 3, 1, 2], 40)
    small = shrink_frame_label(list(label), 4)
    back = expand_frame_label(np.array(small), len(label))
    assert (back == label).mean() > 0.95


def test_class_label_to_segment_data():
    label = np.array([4, 4, 2, 2, 2, 4])
    transcript, seg_label = class_label_to_segment_data(label)
    np.testing.assert_array_equal(transcript, [4, 2, 4])
    np.testing.assert_array_equal(seg_label, [0, 0, 1, 1, 1, 2])


# ------------------------------------------------------------------ metrics
def _ref_levenstein(p, y, norm=False):
    """Direct O(nm) DP, used as an oracle for the vectorized version."""
    m_row, n_col = len(p), len(y)
    D = np.zeros([m_row + 1, n_col + 1], float)
    D[:, 0] = np.arange(m_row + 1)
    D[0, :] = np.arange(n_col + 1)
    for j in range(1, n_col + 1):
        for i in range(1, m_row + 1):
            if y[j - 1] == p[i - 1]:
                D[i, j] = D[i - 1, j - 1]
            else:
                D[i, j] = min(D[i - 1, j] + 1, D[i, j - 1] + 1, D[i - 1, j - 1] + 1)
    if norm:
        return (1 - D[-1, -1] / max(m_row, n_col)) * 100
    return D[-1, -1]


def test_levenstein_matches_reference_dp():
    rng = np.random.default_rng(0)
    for _ in range(30):
        p = list(rng.integers(0, 4, size=rng.integers(1, 20)))
        y = list(rng.integers(0, 4, size=rng.integers(1, 20)))
        assert levenstein(p, y) == _ref_levenstein(p, y)
        assert levenstein(p, y, norm=True) == pytest.approx(_ref_levenstein(p, y, norm=True))


def test_edit_score_identical_sequences():
    segs = parse_label([1, 1, 2, 2, 3])
    assert edit_score(segs, segs, bg_class=[]) == 100.0


def test_edit_score_filters_background():
    pred = parse_label([0, 0, 1, 1, 2, 2])
    gt = parse_label([1, 1, 1, 2, 2, 2])
    assert edit_score(pred, gt, bg_class=[0]) == 100.0


def test_f_score_perfect():
    gt = parse_label([1, 1, 2, 2, 3, 3])
    tp, fp, fn = f_score(gt, gt, 0.5, bg_class=[])
    assert (tp, fp, fn) == (3.0, 0.0, 0.0)


def test_f_score_partial_overlap():
    gt = parse_label([1] * 10 + [2] * 10)
    pred = parse_label([1] * 12 + [2] * 8)
    # seg1 IoU = 10/12, seg2 IoU = 8/10 -> both >= 0.5
    tp, fp, fn = f_score(pred, gt, 0.5, bg_class=[])
    assert (tp, fp, fn) == (2.0, 0.0, 0.0)
    tp, fp, fn = f_score(pred, gt, 0.9, bg_class=[])
    assert tp == 0.0 and fp == 2.0 and fn == 2.0


def test_f_score_wrong_class():
    gt = parse_label([1] * 10)
    pred = parse_label([2] * 10)
    tp, fp, fn = f_score(pred, gt, 0.1, bg_class=[])
    assert (tp, fp, fn) == (0.0, 1.0, 1.0)


# ------------------------------------------------------------------- reduce
def test_easy_reduce_nested():
    scores = [{"a": 1.0, "b": [1.0, 3.0]}, {"a": 3.0, "b": [3.0, 5.0]}]
    out = easy_reduce(scores)
    assert out["a"] == 2.0
    assert out["b"] == [2.0, 4.0]


def test_easy_reduce_skip_nan():
    assert easy_reduce([1.0, np.nan, 3.0], skip_nan=True) == 2.0


# ------------------------------------------------------------------ results
def test_checkpoint_roundtrip(tmp_path):
    ckpt = Checkpoint(5, bg_class=[0])
    gt = np.array([0, 0, 1, 1, 2, 2])
    save_results(ckpt, ["v1"], [gt], [{"pred": np.array([0, 0, 1, 1, 2, 2])}])
    m = ckpt.compute_metrics()
    assert m["Acc"] == 100.0
    assert m["AccB"] == 100.0
    assert m["F1@0.50"] > 99.0
    f = tmp_path / "ckpt.gz"
    ckpt.save(str(f))
    loaded = Checkpoint.load(str(f))
    assert loaded.iteration == 5
    assert "v1" in loaded.videos


def test_checkpoint_downsampled_pred():
    ckpt = Checkpoint(0, bg_class=[])
    gt = np.repeat([1, 2], 10)
    pred_sr2 = np.repeat([1, 2], 5)  # predictions at sr=2
    save_results(ckpt, ["v"], [gt], [{"pred": pred_sr2}])
    m = ckpt.compute_metrics()
    assert m["Acc"] == 100.0


def test_checkpoint_holdout_metrics():
    ckpt = Checkpoint(0, bg_class=[0], holdout_classes=[2], seen_classes=[0, 1])
    gt = np.array([0, 0, 1, 1, 2, 2])
    pred = np.array([0, 0, 1, 1, 1, 2])
    save_results(ckpt, ["v"], [gt], [{"pred": pred}])
    m = ckpt.compute_metrics()
    assert m["Acc-seen"] == 100.0
    assert m["Acc-unseen"] == 50.0
    assert "F1@0.50-seen" in m


def test_checkpoint_detailed_json(tmp_path):
    ckpt = Checkpoint(1, bg_class=[], holdout_classes=[1], seen_classes=[0])
    gt = np.array([0, 0, 1, 1])
    save_results(ckpt, ["v"], [gt], [{"pred": gt.copy()}])
    ckpt.compute_metrics()
    f = tmp_path / "detail.json"
    ckpt.save_detailed_results(str(f))
    import json

    data = json.loads(f.read_text())
    assert data["per_video_results"]["v"]["gt_label"] == [0, 0, 1, 1]


def test_egoprocel_vname2dataset():
    from fact_clip_tpu.utils.reduce import egoprocel_vname2dataset

    assert egoprocel_vname2dataset("tent_video_3") == "EPIC"
    assert egoprocel_vname2dataset("S07_brownie") == "CMU"
    assert egoprocel_vname2dataset("Head_22") == "PC"
    assert egoprocel_vname2dataset("OP01-R01") == "EGTEA"
    assert egoprocel_vname2dataset("0001_meccano") == "MECCANO"
    with pytest.raises(ValueError):
        egoprocel_vname2dataset("zzz")
