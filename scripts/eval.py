#!/usr/bin/python3
"""Multi-dataset / multi-split evaluation harness for released checkpoints.

Mirrors /root/reference/scripts/eval.py: loops checkpoints at
``./ckpts/<dataset>/split<k>-weight.net`` over gtea (4 splits), breakfast
(4 splits), egoprocel, epic-kitchens; averages metrics with easy_reduce.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fact_clip_tpu.platform import ensure_platform

ensure_platform()

import numpy as np

from fact_clip_tpu.configs.default import get_cfg_defaults
from fact_clip_tpu.engine import checkpoint as ckpt_io
from fact_clip_tpu.engine.setup import build_experiment
from fact_clip_tpu.engine.steps import make_step_fns
from fact_clip_tpu.utils.reduce import easy_reduce
from fact_clip_tpu.utils.results import Checkpoint, save_results

CONFIG_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                          "fact_clip_tpu", "configs")


def eval_one(cfg, weights_path):
    exp = build_experiment(cfg)
    params = ckpt_io.load_model(exp.params, weights_path)
    _, eval_step = make_step_fns(
        exp.model, cfg, exp.dataset.nclasses, exp.cweight, exp.clip_bundle, verbnoun=exp.verbnoun
    )
    ckpt = Checkpoint(-1, bg_class=([] if cfg.eval_bg else exp.test_dataset.bg_class))
    for batch in exp.test_loader():
        pred = np.asarray(eval_step(params, batch.device_arrays))
        saves = [{"pred": pred[i, : int(batch.lengths[i])]} for i in range(len(batch.vnames))]
        save_results(ckpt, batch.vnames, batch.eval_labels, saves)
    return ckpt.compute_metrics()


if __name__ == "__main__":
    for dataset_name, n_splits in [
        ["gtea", 4], ["breakfast", 4], ["egoprocel", 1], ["epic-kitchens", 1]
    ]:
        print(dataset_name)
        metrics = []
        for split in range(1, n_splits + 1):
            cfg = get_cfg_defaults()
            cfg.merge_from_file(os.path.join(CONFIG_DIR, f"{dataset_name}.yaml"))
            cfg.split = f"split{split}"
            weights = f"./ckpts/{dataset_name}/split{split}-weight.net"
            if not os.path.exists(weights):
                print(f"  missing {weights}, skipping")
                continue
            metrics.append(eval_one(cfg, weights))
        if metrics:
            print(easy_reduce(metrics))
