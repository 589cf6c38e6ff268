"""End-to-end learning-dynamics parity: train BOTH stacks from scratch.

Drives scripts/learning_dynamics.py — the reference PyTorch implementation
through its real CLI (/root/reference/scripts/train.py, launched by
scripts/ref_train_runner.py with wandb/CUDA/BASE shims) and this framework
through scripts/train.py — on the same fixture dataset written in the
reference's on-disk layout, two seeds each, and asserts the stated
tolerances: per-checkpoint train-loss curves within mean |log-ratio| 0.15,
final Acc and F1@50 not worse than the reference by more than 10 points,
and monotone loss decrease.

This is the last correctness surface beyond same-loss-on-same-weights
(tests/test_torch_parity.py): it validates optimizer settings, LR placement,
loss weighting, init scales and matching dynamics end to end.

Runtime: ~6-10 minutes (4 subprocess trainings of ~200 steps each on CPU).
"""

import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

pytestmark = [
    pytest.mark.skipif(not os.path.isdir("/root/reference"),
                       reason="reference repo not mounted"),
    # each recipe trains BOTH stacks ~200 steps in subprocesses (~minutes
    # per test on the 1-CPU box) — the dominant share of the full suite
    pytest.mark.slow,
]


def test_learning_dynamics_parity(tmp_path):
    import learning_dynamics as ld

    workdir = str(tmp_path)
    cfg_path = ld.make_fixture(workdir)

    ref_runs, our_runs = [], []
    for seed in (1, 2):
        ref_runs.append(ld.run_reference(workdir, cfg_path, seed))
        our_runs.append(ld.run_ours(workdir, cfg_path, seed))

    summary, ok = ld.compare(ref_runs, our_runs)
    for c in summary["checks"]:
        print(("PASS" if c["pass"] else "FAIL"), c)
    assert ok, summary["checks"]

    # every run actually trained and evaluated
    for r in ref_runs + our_runs:
        assert len(r["losses"]) >= 5
        assert len(r["evals"]) >= 1


def test_learning_dynamics_parity_clip(tmp_path):
    """FACT_CLIP recipe: InfoNCE contrastive alignment to a shared frozen
    text-embedding cache + the CLIP-similarity eval path, one seed (the
    vanilla recipe above covers seed variance).  Both stacks log the
    composite 0.5*fact + 0.5*contrastive loss, so the curve comparison
    covers the contrastive term's scale and trajectory too."""
    import learning_dynamics as ld

    workdir = str(tmp_path)
    cfg_path = ld.make_fixture(workdir, recipe="clip")
    ref_runs = [ld.run_reference(workdir, cfg_path, 1)]
    our_runs = [ld.run_ours(workdir, cfg_path, 1)]

    summary, ok = ld.compare(ref_runs, our_runs)
    for c in summary["checks"]:
        print(("PASS" if c["pass"] else "FAIL"), c)
    assert ok, summary["checks"]

    # the reference really trained its contrastive term (it silently
    # degrades to vanilla FACT when the mapping file isn't configured)
    ref_log = open(os.path.join(workdir, "ref_seed1.log")).read()
    assert "contrastive_loss" in ref_log


def test_learning_dynamics_parity_clip_holdout(tmp_path):
    """Zero-shot holdout: class 6 held out.  Both stacks must filter the
    same training videos, mask the contrastive loss to the seen subset
    (reference blocks.py:700-750) and emit the seen/unseen metric split;
    compare() additionally gates on Acc-seen (tight) and Acc-unseen
    (present + loose — unseen is chance-level for both stacks on random
    fixture text embeddings)."""
    import learning_dynamics as ld

    workdir = str(tmp_path)
    cfg_path = ld.make_fixture(workdir, recipe="clip_holdout")
    ref_runs = [ld.run_reference(workdir, cfg_path, 1)]
    our_runs = [ld.run_ours(workdir, cfg_path, 1)]

    summary, ok = ld.compare(ref_runs, our_runs, holdout=True)
    for c in summary["checks"]:
        print(("PASS" if c["pass"] else "FAIL"), c)
    assert ok, summary["checks"]

    # both stacks filtered the same number of training videos
    ref_log = open(os.path.join(workdir, "ref_seed1.log")).read()
    our_log = open(os.path.join(workdir, "ours_seed1.log")).read()
    assert "Remaining training videos: 11" in ref_log
    assert "holdout filtering: 11/16" in our_log


def test_learning_dynamics_parity_epic(tmp_path):
    """Epic verb/noun model family (reference blocks_SepVerbNoun.py) from
    scratch: factored 98/301 verb/noun heads and embeddings, TDU blocks,
    composed-action decode, o2m matching — the full-size vocabularies are
    declared by the fixture because the reference hardcodes the head sizes
    and asserts the action mapping spans them."""
    import learning_dynamics as ld

    workdir = str(tmp_path)
    cfg_path = ld.make_fixture(workdir, recipe="epic")
    ref_runs = [ld.run_reference(workdir, cfg_path, 1)]
    our_runs = [ld.run_ours(workdir, cfg_path, 1)]

    summary, ok = ld.compare(ref_runs, our_runs)
    for c in summary["checks"]:
        print(("PASS" if c["pass"] else "FAIL"), c)
    assert ok, summary["checks"]


def test_learning_dynamics_parity_transcript(tmp_path):
    """Transcript mode (the gtea_transcript.yaml family): transcripts given
    at train and test time — `seq` identity matching, transcript-embedding
    action features, the GRU action branch (ActionUpdate_GRU) in the input
    block, and mwt 0.0 transcript-restricted decode.  The last matching
    mode + action-branch architecture without from-scratch proof."""
    import learning_dynamics as ld

    workdir = str(tmp_path)
    cfg_path = ld.make_fixture(workdir, recipe="transcript")
    ref_runs = [ld.run_reference(workdir, cfg_path, 1)]
    our_runs = [ld.run_ours(workdir, cfg_path, 1)]

    summary, ok = ld.compare(ref_runs, our_runs)
    for c in summary["checks"]:
        print(("PASS" if c["pass"] else "FAIL"), c)
    assert ok, summary["checks"]


def test_learning_dynamics_parity_o2m(tmp_path):
    """One-to-many greedy matching (the epic/egoprocel matcher) from
    scratch — the other recipes all train under o2o/Hungarian matching."""
    import learning_dynamics as ld

    workdir = str(tmp_path)
    cfg_path = ld.make_fixture(workdir, recipe="o2m")
    ref_runs = [ld.run_reference(workdir, cfg_path, 1)]
    our_runs = [ld.run_ours(workdir, cfg_path, 1)]

    summary, ok = ld.compare(ref_runs, our_runs)
    for c in summary["checks"]:
        print(("PASS" if c["pass"] else "FAIL"), c)
    assert ok, summary["checks"]


def test_learning_dynamics_parity_aug(tmp_path):
    """Stochastic input augmentations on — the production gtea.yaml setup:
    channel-masking dropout (cmr 0.5) + temporal span zeroing (TM t=60 m=5
    p=0.1).  Each stack draws its own augmentation RNG, so this validates
    the masking schemes are distributionally equivalent end to end."""
    import learning_dynamics as ld

    workdir = str(tmp_path)
    cfg_path = ld.make_fixture(workdir, recipe="aug")
    ref_runs = [ld.run_reference(workdir, cfg_path, 1)]
    our_runs = [ld.run_ours(workdir, cfg_path, 1)]

    summary, ok = ld.compare(ref_runs, our_runs)
    for c in summary["checks"]:
        print(("PASS" if c["pass"] else "FAIL"), c)
    assert ok, summary["checks"]
