#!/usr/bin/env python3
"""Standalone analysis of holdout-training result checkpoints.

CLI-compatible with /root/reference/scripts/eval_holdout.py:
``python scripts/eval_holdout.py --checkpoint_path <saves/N.gz> [--output_dir d]``
Prints all/seen/unseen metric groups, the zero-shot gap, and a per-class
table; writes a JSON report and a per-class CSV.  Pure host-side.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fact_clip_tpu.utils.results import Checkpoint


def analyze_checkpoint(ckpt_path, output_dir=None):
    print(f"Loading checkpoint from: {ckpt_path}")
    ckpt = Checkpoint.load(ckpt_path)

    print(f"\nCheckpoint Iteration: {ckpt.iteration}")
    print(f"Number of videos: {len(ckpt.videos)}")

    print("\n" + "=" * 80)
    print("METRICS SUMMARY")
    print("=" * 80)

    all_metrics, seen_metrics, unseen_metrics = {}, {}, {}
    if hasattr(ckpt, "metrics"):
        for k, v in ckpt.metrics.items():
            if "-seen" in k:
                seen_metrics[k.replace("-seen", "")] = v
            elif "-unseen" in k:
                unseen_metrics[k.replace("-unseen", "")] = v
            else:
                all_metrics[k] = v

        for title, group in (
            ("All Classes", all_metrics),
            ("Seen Classes", seen_metrics),
            ("Unseen Classes", unseen_metrics),
        ):
            if group:
                print(f"\n{title}:")
                print("-" * 80)
                for k, v in group.items():
                    print(f"  {k:20s}: {v:6.2f}")

        if seen_metrics and unseen_metrics:
            print("\nZero-Shot Gap (Seen - Unseen):")
            print("-" * 80)
            for k in seen_metrics:
                if k in unseen_metrics:
                    print(f"  {k:20s}: {seen_metrics[k] - unseen_metrics[k]:6.2f}")

    if getattr(ckpt, "per_class_metrics", None):
        print("\n" + "=" * 80)
        print("PER-CLASS METRICS")
        print("=" * 80)
        print(f"{'Class ID':<10} {'Correct':<10} {'Total':<10} {'Accuracy':<10} {'Type':<10}")
        print("-" * 80)
        for cls_id, m in sorted(ckpt.per_class_metrics.items()):
            cls_type = "Unseen" if cls_id in ckpt.holdout_classes else "Seen"
            print(f"{cls_id:<10} {m['correct']:<10} {m['total']:<10} {m['accuracy']:<10.2f} {cls_type:<10}")

    if output_dir:
        os.makedirs(output_dir, exist_ok=True)
        report_path = os.path.join(output_dir, f"analysis_iter_{ckpt.iteration}.json")
        report = {
            "iteration": ckpt.iteration,
            "num_videos": len(ckpt.videos),
            "holdout_classes": getattr(ckpt, "holdout_classes", []),
            "seen_classes": getattr(ckpt, "seen_classes", []),
            "metrics": {k: float(v) for k, v in dict(getattr(ckpt, "metrics", {})).items()},
            "per_class_metrics": getattr(ckpt, "per_class_metrics", {}),
        }
        with open(report_path, "w") as f:
            json.dump(report, f, indent=2)
        print(f"\nDetailed report saved to: {report_path}")

        csv_path = os.path.join(output_dir, f"per_class_metrics_iter_{ckpt.iteration}.csv")
        with open(csv_path, "w") as f:
            f.write("class_id,correct,total,accuracy,type\n")
            for cls_id in sorted(ckpt.per_class_metrics.keys()):
                m = ckpt.per_class_metrics[cls_id]
                cls_type = "unseen" if cls_id in ckpt.holdout_classes else "seen"
                f.write(f"{cls_id},{m['correct']},{m['total']},{m['accuracy']:.2f},{cls_type}\n")
        print(f"Per-class CSV saved to: {csv_path}")

    print("\n" + "=" * 80)
    return ckpt


def main():
    parser = argparse.ArgumentParser(description="Analyze holdout training checkpoint results")
    parser.add_argument("--checkpoint_path", type=str, required=True, help="Path to checkpoint file (.gz)")
    parser.add_argument("--output_dir", type=str, default=None)
    args = parser.parse_args()

    if args.output_dir is None:
        args.output_dir = os.path.join(os.path.dirname(args.checkpoint_path), "analysis")
    analyze_checkpoint(args.checkpoint_path, args.output_dir)


if __name__ == "__main__":
    main()
