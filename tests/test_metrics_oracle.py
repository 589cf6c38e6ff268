"""Metric-suite oracle parity: the reference's evaluate.Checkpoint run on
identical predictions must produce the same metric dict as utils/results.py.

This closes the last unproven parity surface (VERDICT r1 missing #6):
forward/loss/decode already use the live reference as oracle; here Edit,
F1@{10,25,50}, Acc/AccB, and the holdout seen/unseen splits do too.
"""

import os
import sys

import numpy as np
import pytest

from fact_clip_tpu.utils.results import Checkpoint, save_results

REF = "/root/reference"


def _make_predictions(rng, n_videos=8, C=6, with_bg=True):
    """Synthetic (gt, pred) pairs with realistic segment structure and
    moderately noisy predictions."""
    vids = []
    for i in range(n_videos):
        t = int(rng.integers(60, 200))
        gt = np.zeros(t, np.int64)
        n_seg = int(rng.integers(3, 8))
        cuts = np.sort(rng.choice(np.arange(1, t), n_seg - 1, replace=False))
        bounds = np.concatenate([[0], cuts, [t]])
        prev = -1
        for k in range(n_seg):
            c = int(rng.integers(0, C))
            while c == prev:
                c = int(rng.integers(0, C))
            gt[bounds[k]:bounds[k + 1]] = c
            prev = c
        pred = gt.copy()
        # shift some boundaries and corrupt some segments
        for k in range(1, n_seg):
            shift = int(rng.integers(-8, 9))
            b = np.clip(bounds[k] + shift, 1, t - 1)
            pred[min(b, bounds[k]):max(b, bounds[k])] = pred[max(0, min(b, bounds[k]) - 1)]
        flip = rng.random(t) < 0.07
        pred[flip] = rng.integers(0, C, size=flip.sum())
        vids.append((f"v{i:02d}", gt, pred.astype(np.int64)))
    return vids


def _run_ref_checkpoint(vids, bg_class, holdout_classes, seen_classes):
    import types

    import fact_clip_tpu.configs.node as node

    yacs = types.ModuleType("yacs")
    yacs_config = types.ModuleType("yacs.config")
    yacs_config.CfgNode = node.CfgNode
    yacs.config = yacs_config
    sys.modules.setdefault("yacs", yacs)
    sys.modules.setdefault("yacs.config", yacs_config)

    sys.path.insert(0, REF)
    try:
        from fact_clip.utils.evaluate import Checkpoint as RefCheckpoint
        from fact_clip.utils.evaluate import Video as RefVideo
    finally:
        sys.path.remove(REF)

    ckpt = RefCheckpoint(1, bg_class=bg_class, holdout_classes=holdout_classes,
                         seen_classes=seen_classes)
    videos = [RefVideo(v, gt_label=gt, pred=pred) for v, gt, pred in vids]
    ckpt.add_videos(videos)
    ckpt.compute_metrics()
    return ckpt.metrics


def _run_our_checkpoint(vids, bg_class, holdout_classes, seen_classes):
    ckpt = Checkpoint(1, bg_class=bg_class, holdout_classes=holdout_classes,
                      seen_classes=seen_classes)
    save_results(ckpt, [v for v, _, _ in vids], [gt for _, gt, _ in vids],
                 [{"pred": pred} for _, _, pred in vids])
    ckpt.compute_metrics()
    return ckpt.metrics


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not available")
@pytest.mark.parametrize("seed", [0, 1])
def test_metrics_match_reference_oracle(seed):
    rng = np.random.default_rng(seed)
    vids = _make_predictions(rng)
    ref = _run_ref_checkpoint(vids, bg_class=[0], holdout_classes=[], seen_classes=None)
    ours = _run_our_checkpoint(vids, bg_class=[0], holdout_classes=[], seen_classes=None)
    assert set(ref) <= set(ours), (set(ref) - set(ours))
    for k, v in ref.items():
        np.testing.assert_allclose(ours[k], v, rtol=1e-9, err_msg=k)


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not available")
def test_holdout_metrics_match_reference_oracle():
    rng = np.random.default_rng(2)
    C = 6
    vids = _make_predictions(rng, C=C)
    holdout = [4, 5]
    seen = [c for c in range(C) if c not in holdout]
    ref = _run_ref_checkpoint(vids, bg_class=[0], holdout_classes=holdout, seen_classes=seen)
    ours = _run_our_checkpoint(vids, bg_class=[0], holdout_classes=holdout, seen_classes=seen)
    for k, v in ref.items():
        np.testing.assert_allclose(ours[k], v, rtol=1e-9, err_msg=k)
    # the split keys must actually exist
    for key in ("Acc-seen", "Acc-unseen", "F1@0.50-seen", "F1@0.50-unseen"):
        assert key in ref and key in ours
