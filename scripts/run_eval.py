#!/usr/bin/python3
"""Checkpoint evaluation entry point.

CLI-compatible with /root/reference/scripts/run_eval.py:
``python scripts/run_eval.py --cfg <yaml...> --ckpt <file> [--set k v ...]``.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fact_clip_tpu.platform import ensure_platform

ensure_platform()

from fact_clip_tpu.configs.utils import setup_cfg
from fact_clip_tpu.engine import checkpoint as ckpt_io
from fact_clip_tpu.engine.setup import build_experiment
from fact_clip_tpu.engine.steps import make_step_fns
from fact_clip_tpu.home import get_project_base
from fact_clip_tpu.utils.results import Checkpoint, save_results


def evaluate(exp, eval_step, params, savedir):
    cfg = exp.cfg
    test_ds = exp.test_dataset
    print("TESTING" + "~" * 10)
    # sequence sharding for videos beyond the single-chip max-T (engaged
    # per-batch by length; parallel/mesh.py::make_eval_placer)
    from fact_clip_tpu.parallel.mesh import make_eval_placer

    place, params = make_eval_placer(cfg, params)
    ckpt = Checkpoint(
        -1,
        bg_class=([] if cfg.eval_bg else test_ds.bg_class),
        holdout_classes=test_ds.holdout_classes,
        seen_classes=test_ds.seen_classes,
    )
    for batch in exp.test_loader():
        pred = eval_step(params, place(batch.device_arrays))
        import numpy as np

        pred = np.asarray(pred)
        saves = [{"pred": pred[i, : int(batch.lengths[i])]} for i in range(len(batch.vnames))]
        save_results(ckpt, batch.vnames, batch.eval_labels, saves)

    ckpt.compute_metrics()
    print(", ".join("%s:%.1f" % (k, v) for k, v in ckpt.metrics.items()) + "\n")

    if len(test_ds.holdout_classes) > 0:
        print("=" * 60)
        print("HOLDOUT EVALUATION SUMMARY")
        print(f"Seen classes: {len(test_ds.seen_classes)}")
        print(f"Unseen (holdout) classes: {len(test_ds.holdout_classes)}")
        for key in ("Acc-seen", "Acc-unseen", "F1@0.10-seen", "F1@0.10-unseen"):
            if key in ckpt.metrics:
                print(f"{key}: {ckpt.metrics[key]:.1f}%")
        print("=" * 60)

    os.makedirs(savedir, exist_ok=True)
    ckpt.save(os.path.join(savedir, "eval_result.gz"))
    if len(test_ds.holdout_classes) > 0:
        ckpt.save_detailed_results(os.path.join(savedir, "eval_detailed.json"))
    return ckpt


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--cfg", dest="cfg_file", nargs="*", help="optional config file", default=[])
    parser.add_argument("--set", dest="set_cfgs", help="set config keys", default=None,
                        nargs=argparse.REMAINDER)
    parser.add_argument("--ckpt", dest="ckpt_file", help="checkpoint file to evaluate", required=True)
    args = parser.parse_args()

    BASE = get_project_base()
    cfg = setup_cfg(args.cfg_file, args.set_cfgs)
    print("============")
    print(cfg)
    print("============")

    text_embeddings = None
    if cfg.use_clip:
        from scripts.train import resolve_text_embeddings  # noqa: PLC0415

        text_embeddings = resolve_text_embeddings(cfg, BASE)

    exp = build_experiment(cfg, text_embeddings=text_embeddings)
    print("Test dataset ", exp.test_dataset)

    print(f"Loading checkpoint: {args.ckpt_file}")
    params = ckpt_io.load_model(exp.params, args.ckpt_file)
    print("Checkpoint loaded.")

    _, eval_step = make_step_fns(
        exp.model, cfg, exp.dataset.nclasses, exp.cweight, exp.clip_bundle, verbnoun=exp.verbnoun
    )
    savedir = os.path.join(os.path.dirname(args.ckpt_file), "../eval_results")
    evaluate(exp, eval_step, params, savedir)
