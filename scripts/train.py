#!/usr/bin/python3
"""Training entry point.

CLI-compatible with the reference (/root/reference/scripts/train.py):
``python scripts/train.py --cfg <yaml...> --set k v ...``.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from fact_clip_tpu.platform import ensure_platform

ensure_platform()

# multi-host: engage jax.distributed when FACT_COORDINATOR/... env is set
from fact_clip_tpu.parallel.distributed import initialize_from_env

initialize_from_env()

from fact_clip_tpu.configs.utils import setup_cfg
from fact_clip_tpu.data.io import load_action_mapping
from fact_clip_tpu.engine.train_loop import run_train
from fact_clip_tpu.home import get_project_base


def resolve_text_embeddings(cfg, BASE):
    """Mirror train.py:151-193: soft-fail text-embedding bootstrap."""
    from fact_clip_tpu.data.text_embeddings import get_or_compute_text_embeddings

    if cfg.map_fname:
        map_fname = cfg.map_fname
    elif cfg.dataset.startswith("havid"):
        variant = cfg.dataset.replace("havid_", "")
        map_fname = os.path.join(
            BASE, "data", "HAViD", "ActionSegmentation", "data", variant, "mapping.txt"
        )
    else:
        map_fname = None

    if map_fname and os.path.exists(map_fname):
        label2index, index2label = load_action_mapping(map_fname)
        try:
            return get_or_compute_text_embeddings(cfg, label2index, index2label, base=BASE)
        except Exception as e:  # noqa: BLE001
            print(f"Warning: Failed to load/compute text embeddings: {e}")
            print("Continuing without text embeddings (contrastive loss will be disabled)")
    else:
        print(f"Warning: Mapping file not found at {map_fname if map_fname else 'default path'}")
        print("Continuing without text embeddings (contrastive loss will be disabled)")
    return None


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--cfg", dest="cfg_file", nargs="*", help="optional config file", default=[])
    parser.add_argument("--set", dest="set_cfgs", help="set config keys", default=None,
                        nargs=argparse.REMAINDER)
    args = parser.parse_args()

    BASE = get_project_base()
    cfg = setup_cfg(args.cfg_file, args.set_cfgs)

    print("============")
    print(cfg)
    print("============")

    if cfg.aux.debug:
        np.random.seed(1)

    text_embeddings = None
    if cfg.use_clip:
        print("=" * 60)
        print("CREATING FACT_CLIP MODEL (Open-Vocabulary)")
        print("=" * 60)
        if cfg.dataset == "epic":
            raise ValueError("FACT_CLIP not yet supported for epic dataset")
        text_embeddings = resolve_text_embeddings(cfg, BASE)

    run_train(cfg, text_embeddings=text_embeddings, base_dir=BASE)
