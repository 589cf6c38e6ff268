"""The training and evaluation loops.

Flow-compatible with /root/reference/scripts/train.py: epoch loop over a
shuffled loader, train metrics accumulated into a results Checkpoint and
reported every ``print_every`` steps, a test pass + weight checkpoint every
``eval_every`` steps, best-model tracking by F1@0.50, the reference LR-decay
rule (inside the optimizer schedule here), and the FINISH_PROOF completion
marker.  The per-step compute is one jitted XLA program (engine/steps.py).
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..configs.utils import cfg2flatdict
from ..data.prefetch import prefetch
from ..utils.results import Checkpoint, save_results
from . import checkpoint as ckpt_io
from .logging import Logger, split_metric_namespace
from .setup import Experiment, build_experiment
from .state import create_train_state, param_count
from .steps import make_step_fns


def _collect_video_saves(batch, pred_dev, per_video_loss=None, extra_losses=None):
    """Slice device outputs back into per-video host dicts."""
    pred = np.asarray(pred_dev)
    saves = []
    for i in range(len(batch.vnames)):
        t = int(batch.lengths[i])
        data = {"pred": pred[i, :t]}
        if per_video_loss is not None:
            loss_dict = {"loss": float(per_video_loss[i])}
            if extra_losses:
                for k, v in extra_losses.items():
                    loss_dict[k] = float(v[i])
            data["loss"] = loss_dict
        saves.append(data)
    return saves


def evaluate(global_step, exp: Experiment, eval_step, params, logger, savedir,
             place=lambda a: a, fetch=np.asarray):
    """Test pass -> metrics -> results checkpoint (train.py:18-86)."""
    cfg = exp.cfg
    test_ds = exp.test_dataset
    print("TESTING" + "~" * 10)
    ckpt = Checkpoint(
        global_step + 1,
        bg_class=([] if cfg.eval_bg else test_ds.bg_class),
        holdout_classes=test_ds.holdout_classes,
        seen_classes=test_ds.seen_classes,
    )
    for batch in prefetch(exp.test_loader(), cfg.TPU.prefetch):
        pred = fetch(eval_step(params, place(batch.device_arrays)))
        video_saves = _collect_video_saves(batch, pred)
        save_results(ckpt, batch.vnames, batch.eval_labels, video_saves)

    ckpt.compute_metrics()

    log_dict = split_metric_namespace(ckpt.metrics)
    print(", ".join("%s:%.1f" % (k, v) for k, v in ckpt.metrics.items()) + "\n")

    if len(test_ds.holdout_classes) > 0:
        print("=" * 60)
        print("HOLDOUT EVALUATION SUMMARY")
        for key in ("Acc-seen", "Acc-unseen", "F1@0.50-seen", "F1@0.50-unseen"):
            if key in ckpt.metrics:
                print(f"{key}: {ckpt.metrics[key]:.1f}%")
        print("=" * 60)

    logger.log(log_dict, step=global_step + 1)
    ckpt.save(os.path.join(savedir, "%d.gz" % (global_step + 1)))
    if len(test_ds.holdout_classes) > 0:
        ckpt.save_detailed_results(os.path.join(savedir, f"{global_step + 1}_detailed.json"))
    return ckpt


def run_train(cfg, text_embeddings=None, base_dir=None):
    """Full training entry (mirrors scripts/train.py __main__)."""
    base = base_dir or os.getcwd()
    logdir = os.path.join(base, cfg.aux.logdir)
    ckptdir = os.path.join(logdir, "ckpts")
    savedir = os.path.join(logdir, "saves")
    os.makedirs(ckptdir, exist_ok=True)
    os.makedirs(savedir, exist_ok=True)
    print("Saving log at", logdir)

    # resume decision first: exits early if FINISH_PROOF exists
    global_step, ckpt_file = ckpt_io.resume_ckpt(cfg, logdir)

    with open(os.path.join(logdir, "args.json"), "w") as f:
        json.dump(cfg2flatdict(cfg), f, indent=True)

    exp = build_experiment(cfg, text_embeddings=text_embeddings, seed=cfg.aux.seed)
    dataset, test_ds = exp.dataset, exp.test_dataset
    print("Train dataset", dataset)
    print("Test dataset ", test_ds)
    print(f"Buckets {exp.buckets}, seg_cap {exp.seg_cap}, pred_seg_cap {exp.s_pred_cap}")
    print(f"Model parameters: {param_count(exp.params):,}")

    n_proc = jax.process_count()
    pid = jax.process_index()
    trainloader = exp.train_loader(seed=cfg.aux.seed, process_id=pid, process_count=n_proc)
    steps_per_epoch = len(trainloader)

    params = exp.params
    if ckpt_file is not None:
        params = ckpt_io.load_model(params, ckpt_file)

    state = create_train_state(exp.model, params, cfg, steps_per_epoch)
    if ckpt_file is not None and cfg.TPU.save_opt_state:
        full = ckpt_io.load_train_state(state, ckpt_file)
        if full is not None:
            state = full
            print("Restored full TrainState (optimizer moments + step)")
    train_step, eval_step = make_step_fns(
        exp.model, cfg, dataset.nclasses, exp.cweight, exp.clip_bundle, verbnoun=exp.verbnoun
    )

    # multi-device / multi-host: shard batches over a *global* data x seq
    # mesh and replicate state; GSPMD handles every collective — ICI within a
    # slice, DCN across slices (tests/test_parallel.py, tests/test_multihost.py)
    mesh = None
    batch_data_axes = "data"  # PartitionSpec axes carrying the batch dim
    n_dev = jax.device_count()  # global across processes
    if (n_dev > 1 or n_proc > 1) and (
        cfg.TPU.num_data_shards != 1 or cfg.TPU.num_slice_shards > 1
    ):
        from ..parallel import mesh as mesh_lib

        n_slice = max(1, cfg.TPU.num_slice_shards)
        n_seq = max(1, cfg.TPU.num_seq_shards)
        if cfg.TPU.num_data_shards > 0:
            n_data = cfg.TPU.num_data_shards
            assert cfg.batch_size % (n_slice * n_data) == 0, (
                f"batch_size {cfg.batch_size} not divisible by "
                f"num_slice_shards*num_data_shards {n_slice}*{n_data}"
            )
        else:
            # auto: the largest batch divisor that fits the devices
            n_data = 1
            for cand in range(min(n_dev // (n_slice * n_seq),
                                  max(1, cfg.batch_size // n_slice)), 0, -1):
                if cfg.batch_size % (n_slice * cand) == 0:
                    n_data = cand
                    break
        if n_slice * n_data * n_seq > 1:
            assert (n_slice * n_data) % n_proc == 0 or n_proc == 1, (
                f"data shards {n_slice}x{n_data} must be a multiple of process count {n_proc}"
            )
            if n_slice > 1:
                # multi-slice pod: DCN-outer slice axis carries only DP
                mesh = mesh_lib.make_hybrid_mesh(n_slice=n_slice, n_data=n_data, n_seq=n_seq)
                batch_data_axes = ("slice", "data")
            else:
                mesh = mesh_lib.make_mesh(n_data=n_data, n_seq=n_seq)
            if n_proc > 1:
                from ..parallel import distributed as dist_lib

                state = dist_lib.replicate_global(mesh, state)
            else:
                state = mesh_lib.replicate_tree(mesh, state)
            print(f"Mesh: "
                  + (f"slice={n_slice} x " if n_slice > 1 else "")
                  + f"data={n_data} x seq={n_seq} over {n_dev} devices"
                  + (f" across {n_proc} processes" if n_proc > 1 else ""))
    assert not (n_proc > 1 and mesh is None), (
        "multi-process execution requires a data mesh (cfg.TPU.num_data_shards != 1)"
    )

    # Feed features at the training compute dtype: the first dense would
    # cast them on device anyway, so casting on host halves host->HBM
    # traffic AND removes a (B, T, D)-sized device cast from every step
    # (D=2048 makes the raw features the largest tensor in the step).
    fdt = cfg.TPU.feature_dtype if "TPU" in cfg else ""
    if fdt == "":
        fdt = cfg.TPU.compute_dtype if "TPU" in cfg else "float32"
    feat_np_dtype = np.dtype("float32") if fdt in ("", "float32") else jnp.bfloat16

    def cast_feats(arrays: dict) -> dict:
        if arrays["feats"].dtype != feat_np_dtype:
            arrays = dict(arrays, feats=arrays["feats"].astype(feat_np_dtype))
        return arrays

    def place(arrays: dict) -> dict:
        arrays = cast_feats(arrays)
        if mesh is None:
            return arrays
        from ..parallel import mesh as mesh_lib

        if n_proc > 1:
            from ..parallel import distributed as dist_lib

            return dist_lib.form_global_batch(
                mesh, arrays, mesh_lib.batch_specs_2d(data_axis=batch_data_axes))
        return mesh_lib.shard_batch_2d(mesh, arrays, data_axis=batch_data_axes)

    def fetch_local(arr):
        """Per-video outputs of a sharded step: this process's rows."""
        if n_proc > 1:
            from ..parallel import distributed as dist_lib

            return dist_lib.local_values(arr)
        return np.asarray(arr)

    def place_eval(arrays: dict) -> dict:
        """Eval under multi-process runs replicated (every process feeds the
        identical full batch and computes full metrics) — eval is rare and
        redundant compute beats a cross-process metric reduction."""
        if mesh is None:
            return arrays
        from ..parallel import mesh as mesh_lib

        if n_proc > 1:
            from ..parallel import distributed as dist_lib

            return dist_lib.form_global_batch(mesh, arrays, {})  # all P() = replicated
        return mesh_lib.shard_batch_2d(mesh, arrays, data_axis=batch_data_axes)

    def fetch_eval(arr):
        if n_proc > 1:
            from ..parallel import distributed as dist_lib

            return dist_lib.local_values(arr)
        return np.asarray(arr)

    logger = Logger(cfg, cfg2flatdict(cfg), logdir=logdir)

    # rbg PRNG: the training step draws large dropout masks (e.g. the
    # u-blocks' (B, T, 2*hid) X2Y concats); threefry mask generation costs
    # ~0.5-1 ms/step at flagship scale where the TPU-native rbg generator is
    # ~free.  Mask quality is irrelevant beyond uniformity; eval paths draw
    # no rngs.  (The Pallas kernels use the on-core PRNG independently.)
    base_rng = jax.random.key(cfg.aux.seed, impl="rbg")

    def fresh_train_ckpt():
        return Checkpoint(
            -1,
            bg_class=(dataset.bg_class if cfg.eval_bg else []),
            eval_edit=False,
            holdout_classes=test_ds.holdout_classes,
            seen_classes=test_ds.seen_classes,
        )

    train_ckpt = fresh_train_ckpt()
    best_ckpt, best_metric = None, 0.0

    start_epoch = global_step // max(steps_per_epoch, 1)
    print(f"Start Training from Epoch {start_epoch}...")
    t_start = time.time()

    profile_dir = cfg.TPU.profile_dir

    for eidx in range(start_epoch, cfg.epoch):
        for batch in prefetch(trainloader, cfg.TPU.prefetch):
            if profile_dir and global_step == cfg.TPU.profile_start:
                jax.profiler.start_trace(profile_dir)
                print(f"profiler: tracing steps {global_step}..{cfg.TPU.profile_stop} -> {profile_dir}")
            rng = jax.random.fold_in(base_rng, global_step)
            state, out = train_step(state, place(batch.device_arrays), rng)

            if "contrastive_loss" in out:  # CLIP runs log the loss split
                extra = {k: fetch_local(out[k]) for k in ("fact_loss", "contrastive_loss")}
            else:
                extra = {}
            video_saves = _collect_video_saves(
                batch, fetch_local(out["pred"]), fetch_local(out["per_video_loss"]), extra
            )
            save_results(train_ckpt, batch.vnames, batch.eval_labels, video_saves)

            if profile_dir and global_step == cfg.TPU.profile_stop:
                jax.profiler.stop_trace()
                print("profiler: trace stopped")

            if (global_step + 1) % cfg.aux.print_every == 0:
                train_ckpt.compute_metrics()
                train_ckpt.average_losses()
                log_dict = {}
                loss_str = ", ".join(f"{k}:{v:.2f}" for k, v in train_ckpt.loss.items())
                for k, v in train_ckpt.loss.items():
                    log_dict[f"train-loss/{k}"] = v
                for k, v in train_ckpt.metrics.items():
                    log_dict["train-metric/" + k] = v
                metr_str = ", ".join(f"{k}:{v:.3f}" for k, v in train_ckpt.metrics.items())
                dt = time.time() - t_start
                print(f"Iter{global_step + 1} [{dt:.0f}s], {loss_str}")
                print(" " * 6 + metr_str)
                logger.log(log_dict, step=global_step + 1)
                train_ckpt = fresh_train_ckpt()

            if global_step != 0 and (global_step + 1) % cfg.aux.eval_every == 0:
                test_ckpt = evaluate(global_step, exp, eval_step, state.params, logger,
                                     savedir, place_eval, fetch_eval)
                if test_ckpt.metrics["F1@0.50"] >= best_metric:
                    best_ckpt = test_ckpt
                    best_metric = test_ckpt.metrics["F1@0.50"]
                ckpt_io.save_model(state.params, ckptdir, global_step + 1,
                                   backend=cfg.TPU.checkpoint_backend)
                if cfg.TPU.save_opt_state:
                    ckpt_io.save_train_state(state, ckptdir, global_step + 1,
                                             backend=cfg.TPU.checkpoint_backend)

            global_step += 1
        # LR decay lives in the optimizer schedule (state.py)

    if best_ckpt is not None:
        print(f"Best Checkpoint: {best_ckpt.iteration}")
        best_ckpt.eval_edit = True
        best_ckpt.compute_metrics()
        best_ckpt.save(os.path.join(logdir, "best_ckpt.gz"))
    else:
        print("No evaluation performed during training (best checkpoint not available)")

    logger.finish()
    ckpt_io.write_finish_proof(logdir)
    return state, best_ckpt
