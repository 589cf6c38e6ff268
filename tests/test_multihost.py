"""Multi-host (multi-process) data parallelism.

Spawns 2 CPU processes x 4 virtual devices each (one global data=8 mesh) via
tests/multihost_worker.py and asserts the per-step training losses equal the
single-process 8-device run bit-for-bit-ish (fp tolerance).  This is the
net-new scale-out capability (SURVEY.md §2.6) — the reference pins a single
GPU (/root/reference/scripts/train.py:102-105).
"""

import json
import os
import socket
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
GLOBAL_B = 8


def make_global_batch():
    """Deterministic global batch every process reconstructs identically."""
    from test_model import make_batch

    rng = np.random.default_rng(42)
    lengths = (48, 33, 40, 48, 29, 44, 48, 37)
    return make_batch(rng, B=GLOBAL_B, T=48, D=12, C=5, S=8, lengths=lengths)


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _single_process_losses(steps=3):
    """Reference: same job on this process's 8 virtual devices."""
    from fact_clip_tpu.engine.state import create_train_state
    from fact_clip_tpu.engine.steps import make_step_fns
    from fact_clip_tpu.models.blocks import build_fact
    from fact_clip_tpu.parallel import mesh as mesh_lib

    from test_model import small_cfg

    cfg = small_cfg("iuU")
    cfg.Bi.dropout = 0.2
    cfg.TPU.matcher = "auction"
    C, D = 5, 12
    batch_np = make_global_batch()
    model = build_fact(cfg, D, C, s_pred_cap=24)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1), "aug": jax.random.PRNGKey(2)},
        batch_np["feats"], batch_np["mask"], batch_np["lengths"], train=False,
    )["params"]
    state = create_train_state(model, params, cfg, steps_per_epoch=10)
    train_step, _ = make_step_fns(model, cfg, C, np.ones((C + 1,), np.float32))

    mesh = mesh_lib.make_mesh(n_data=8)
    state = mesh_lib.replicate_tree(mesh, state)
    gbatch = mesh_lib.shard_batch_2d(mesh, {k: np.asarray(v) for k, v in batch_np.items()})

    base = jax.random.PRNGKey(123)
    losses, pv = [], None
    for i in range(steps):
        state, out = train_step(state, gbatch, jax.random.fold_in(base, i))
        losses.append(float(out["loss"]))
        pv = np.asarray(out["per_video_loss"])
    return losses, pv


@pytest.mark.slow  # spawns two fresh-jax-compile worker processes
@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_two_process_dp_matches_single_process(tmp_path):
    steps = 3
    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
        env["JAX_PLATFORMS"] = "cpu"
        env["PYTHONPATH"] = REPO + os.pathsep + HERE + os.pathsep + env.get("PYTHONPATH", "")
        procs.append(subprocess.Popen(
            [sys.executable, os.path.join(HERE, "multihost_worker.py"),
             str(pid), "2", str(port), str(steps)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env,
        ))
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, f"worker failed:\n{out[-2000:]}\n{err[-2000:]}"
        outs.append(json.loads(out.strip().splitlines()[-1]))

    ref_losses, ref_pv = _single_process_losses(steps)

    for o in outs:
        np.testing.assert_allclose(o["losses"], ref_losses, rtol=1e-5,
                                   err_msg=f"process {o['pid']} losses diverge")
    # per-process local per-video losses reassemble into the global vector
    got_pv = np.concatenate([np.asarray(outs[0]["local_pv"]), np.asarray(outs[1]["local_pv"])])
    np.testing.assert_allclose(got_pv, ref_pv, rtol=1e-5)


def test_trainloader_process_sharding_partitions_batches():
    """Every process sees the same composition; slices are disjoint and
    ordered; identical bucket padding."""
    from fact_clip_tpu.data.batching import BatchAssembler, TrainLoader
    from fact_clip_tpu.data.dataset import Dataset

    pytest.importorskip("numpy")
    # synthetic in-memory dataset via the fixture machinery
    from fact_clip_tpu.data.synthetic import make_fixture_dataset
    import tempfile

    with tempfile.TemporaryDirectory() as root:
        make_fixture_dataset(root, name="gtea", n_classes=4, n_train=9, n_test=2,
                             feat_dim=6, min_len=30, max_len=90)
        from fact_clip_tpu.configs.default import get_cfg_defaults
        from fact_clip_tpu.data.dataset import create_dataset

        cfg = get_cfg_defaults()
        cfg.dataset = "gtea"
        cfg.split = "split1"
        cfg.feature_path = os.path.join(root, "data/gtea/features")
        cfg.groundTruth_path = os.path.join(root, "data/gtea/groundTruth")
        cfg.map_fname = os.path.join(root, "data/gtea/mapping.txt")
        cfg.split_path = os.path.join(root, "data/gtea/splits")
        cfg.feature_transpose = True
        cfg.bg_class = 0
        cfg.average_transcript_len = 4.0
        ds, _ = create_dataset(cfg)
        assembler = BatchAssembler(ds, seg_cap=16, buckets=[64, 128])

        def batches(pid, nproc):
            loader = TrainLoader(ds, 4, assembler, seed=7, process_id=pid, process_count=nproc)
            return list(loader)

        full = batches(0, 1)
        p0 = batches(0, 2)
        p1 = batches(1, 2)
        assert len(full) == len(p0) == len(p1)
        for bf, b0, b1 in zip(full, p0, p1):
            assert b0.vnames + b1.vnames == bf.vnames
            assert b0.feats.shape[1] == b1.feats.shape[1] == bf.feats.shape[1]
            np.testing.assert_array_equal(
                np.concatenate([b0.feats, b1.feats]), bf.feats
            )
