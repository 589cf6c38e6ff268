#!/usr/bin/python3
"""Emit per-variant HAViD configs from the havid.yaml template.

Mirrors the reference's fact_clip/configs/generate_havid_configs.py: one YAML
per view{0,1,2} x {lh,rh} x {pt,aa} (ntoken 40 for primitive tasks, 60 for
atomic actions), plus optional ``_holdout`` variants with holdout_mode /
use_clip enabled.  Validates dataset directories when they exist.
"""

from __future__ import annotations

import argparse
import os
import sys

import yaml

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

from fact_clip_tpu.home import get_project_base

CONFIG_DIR = os.path.dirname(os.path.abspath(__file__))

VIEWS = ["view0", "view1", "view2"]
HANDS = ["lh", "rh"]
GRANULARITIES = ["pt", "aa"]  # primitive tasks / atomic actions


def variant_overrides(variant: str) -> dict:
    ntoken = 40 if variant.endswith("_pt") else 60
    return {"dataset": f"havid_{variant}", "FACT": {"ntoken": ntoken}}


def holdout_overrides(holdout_classes) -> dict:
    return {
        "holdout_mode": True,
        "holdout_classes": list(holdout_classes),
        "use_clip": True,
        "Bi": {"dropout": 0.2},
        "FACT": {"ntoken": 75},
        "CLIP": {"temp": 0.1},
        "epoch": 250,
        "aux": {"eval_every": 100, "print_every": 50},
    }


def deep_update(base: dict, over: dict) -> dict:
    for k, v in over.items():
        if isinstance(v, dict) and isinstance(base.get(k), dict):
            deep_update(base[k], v)
        else:
            base[k] = v
    return base


def validate_dataset_dir(variant: str) -> bool:
    base = os.path.join(get_project_base(), "data", "HAViD", "ActionSegmentation", "data", variant)
    ok = all(
        os.path.exists(os.path.join(base, p))
        for p in ("mapping.txt", "groundTruth", "splits")
    )
    if not ok:
        print(f"  (dataset dir not found/incomplete for {variant}: {base})")
    return ok


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--holdout", action="store_true", help="also emit _holdout variants")
    parser.add_argument(
        "--holdout_classes", type=int, nargs="*", default=[51, 53, 61, 67, 56],
        help="class ids to hold out (default: the reference's view0_lh_pt selection)",
    )
    parser.add_argument("--validate", action="store_true", help="check dataset dirs exist")
    args = parser.parse_args()

    with open(os.path.join(CONFIG_DIR, "havid.yaml")) as f:
        template = yaml.safe_load(f)

    written = []
    for view in VIEWS:
        for hand in HANDS:
            for gran in GRANULARITIES:
                variant = f"{view}_{hand}_{gran}"
                if args.validate:
                    validate_dataset_dir(variant)
                cfg = deep_update(yaml.safe_load(yaml.safe_dump(template)), variant_overrides(variant))
                fname = os.path.join(CONFIG_DIR, f"havid_{variant}.yaml")
                with open(fname, "w") as f:
                    yaml.safe_dump(cfg, f, default_flow_style=False)
                written.append(fname)

                if args.holdout and gran == "pt":
                    hcfg = deep_update(cfg, holdout_overrides(args.holdout_classes))
                    hname = os.path.join(CONFIG_DIR, f"havid_{variant}_holdout.yaml")
                    with open(hname, "w") as f:
                        yaml.safe_dump(hcfg, f, default_flow_style=False)
                    written.append(hname)

    print(f"Wrote {len(written)} configs:")
    for w in written:
        print(" ", os.path.basename(w))


if __name__ == "__main__":
    main()
