"""Subprocess tests of the CLI entry points (the reference's user surface)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from fact_clip_tpu.data.synthetic import make_fixture_dataset

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def cli_env(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli")
    make_fixture_dataset(str(root), name="gtea", n_classes=5, n_train=5, n_test=2,
                         feat_dim=12, min_len=60, max_len=140, class_sep=3.0)
    cfg = root / "smoke.yaml"
    cfg.write_text(
        """
dataset: gtea
feature_path: data/gtea/features
groundTruth_path: data/gtea/groundTruth
map_fname: data/gtea/mapping.txt
split_path: data/gtea/splits
feature_transpose: true
bg_class: 0
average_transcript_len: 4.0
FACT: {block: iu, ntoken: 8, fpos: false, cmr: 0.0, mwt: 0.3}
Bi:
  hid_dim: 32
  a_dim: 16
  a_ffdim: 32
  a_layers: 1
  a_nhead: 4
  f: m
  f_dim: 24
  f_layers: 2
  f_ln: false
  f_ngp: 1
  dropout: 0.0
Bu: {f_layers: 2}
Loss: {sw: 1.0, pc: 0.2}
batch_size: 2
optimizer: Adam
lr: 0.002
epoch: 4
aux: {print_every: 5, eval_every: 10, resume: ''}
TPU: {bucket_multiple: 64, num_data_shards: 1}
"""
    )
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return str(root), env


def _run(args, cwd, env):
    return subprocess.run(
        [sys.executable] + args, cwd=cwd, env=env, capture_output=True, text=True, timeout=600
    )


@pytest.mark.slow
def test_train_and_eval_cli(cli_env):
    root, env = cli_env
    r = _run([os.path.join(REPO, "scripts", "train.py"), "--cfg", "smoke.yaml",
              "--set", "aux.runid", "7"], root, env)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    assert "TESTING" in r.stdout
    assert "Best Checkpoint" in r.stdout

    # logdir contract under the repo base (home.get_project_base)
    logdirs = []
    for base, dirs, files in os.walk(os.path.join(REPO, "log")):
        if "FINISH_PROOF" in files:
            logdirs.append(base)
    assert logdirs, "no finished logdir found"
    logdir = [d for d in logdirs if d.endswith("/7")][0]
    ckpts = os.listdir(os.path.join(logdir, "ckpts"))
    assert any(f.startswith("network.iter-") for f in ckpts)
    assert os.path.exists(os.path.join(logdir, "args.json"))
    json.load(open(os.path.join(logdir, "args.json")))

    ckpt = sorted(f for f in ckpts if f.startswith("network.iter-"))[-1]
    r2 = _run([os.path.join(REPO, "scripts", "run_eval.py"), "--cfg", "smoke.yaml",
               "--ckpt", os.path.join(logdir, "ckpts", ckpt)], root, env)
    assert r2.returncode == 0, r2.stdout[-2000:] + r2.stderr[-2000:]
    assert "Acc" in r2.stdout
    # eval results saved next to the checkpoint dir
    eval_dir = os.path.normpath(os.path.join(logdir, "ckpts", "../eval_results"))
    assert os.path.exists(os.path.join(eval_dir, "eval_result.gz"))

    # cleanup only the experiment dir this test created — the repo-level
    # log/ may hold unrelated (e.g. manually launched) runs
    import shutil

    shutil.rmtree(os.path.dirname(logdir), ignore_errors=True)


def test_eval_holdout_cli(cli_env, tmp_path):
    root, env = cli_env
    from fact_clip_tpu.utils.results import Checkpoint, save_results

    ckpt = Checkpoint(42, bg_class=[0], holdout_classes=[2], seen_classes=[0, 1, 3, 4])
    gt = np.array([0, 0, 1, 1, 2, 2])
    save_results(ckpt, ["v"], [gt], [{"pred": gt.copy()}])
    ckpt.compute_metrics()
    f = tmp_path / "42.gz"
    ckpt.save(str(f))

    r = _run([os.path.join(REPO, "scripts", "eval_holdout.py"),
              "--checkpoint_path", str(f), "--output_dir", str(tmp_path / "out")], root, env)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    assert "Zero-Shot Gap" in r.stdout
    assert os.path.exists(tmp_path / "out" / "analysis_iter_42.json")
    assert os.path.exists(tmp_path / "out" / "per_class_metrics_iter_42.csv")
