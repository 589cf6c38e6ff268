#!/usr/bin/python3
"""Frequency-based holdout class selection and leakage analysis.

Behavior-compatible with /root/reference/fact_clip/utils/analyze_holdout_classes.py:
collects per-class train/test frame and video statistics, selects holdout
classes (skip the top-N most frequent, take the next ``n_frequent`` plus a
seeded random sample of ``n_medium`` middle-frequency classes with at least
``min_test_videos`` test videos), prints impact statistics, and checks how
much training data survives filtering (the "leakage"/viability check).
"""

from __future__ import annotations

import argparse
import os
import sys
from collections import Counter, defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fact_clip_tpu.data.io import load_action_mapping, read_groundtruth_lines, read_split_list


def collect_statistics(base_path: str, split_name: str = "split1"):
    map_path = os.path.join(base_path, "mapping.txt")
    gt_path = os.path.join(base_path, "groundTruth")
    label2index, index2label = load_action_mapping(map_path)

    def read_videos(split_file):
        vids = [v.strip() for v in read_split_list(split_file) if v.strip()]
        return [v[:-4] if v.endswith(".txt") else v for v in vids]

    train_videos = read_videos(os.path.join(base_path, "splits", f"train.{split_name}.bundle"))
    test_videos = read_videos(os.path.join(base_path, "splits", f"test.{split_name}.bundle"))

    def analyze(videos):
        frame_counts, video_counts = Counter(), Counter()
        class_to_videos = defaultdict(set)
        for vname in videos:
            labels = [label2index[l] for l in read_groundtruth_lines(gt_path, vname) if l in label2index]
            frame_counts.update(labels)
            for cls in set(labels):
                video_counts[cls] += 1
                class_to_videos[cls].add(vname)
        return frame_counts, video_counts, class_to_videos

    trf, trv, trc = analyze(train_videos)
    tef, tev, tec = analyze(test_videos)
    return {
        "label2index": label2index, "index2label": index2label, "nclasses": len(label2index),
        "train_videos": train_videos, "test_videos": test_videos,
        "train_frame_counts": trf, "train_video_counts": trv, "train_class_to_videos": trc,
        "test_frame_counts": tef, "test_video_counts": tev, "test_class_to_videos": tec,
    }


def select_holdout_classes(stats, n_frequent=6, n_medium=3, min_test_videos=3, bg_class=0, skip_top_n=5):
    """Skip the most frequent classes, hold out the next frequent + a medium sample."""
    sorted_classes = [
        (idx, count) for idx, count in stats["train_frame_counts"].most_common() if idx != bg_class
    ]
    eligible = [idx for idx, _ in sorted_classes if stats["test_video_counts"][idx] >= min_test_videos]
    print(f"\nClasses with >={min_test_videos} test videos: {len(eligible)}/{len(sorted_classes)}")

    if skip_top_n > 0:
        print(f"Skipping top {skip_top_n} most frequent classes: {eligible[:skip_top_n]}")

    if len(eligible) < skip_top_n + n_frequent + n_medium:
        print("Warning: not enough eligible classes after skipping; adjusting selection")
        available = max(len(eligible) - skip_top_n, 0)
        n_frequent = min(n_frequent, available // 2)
        n_medium = min(n_medium, available - n_frequent)

    frequent_holdout = eligible[skip_top_n : skip_top_n + n_frequent]

    middle = [c for c in eligible[len(eligible) // 3 : 2 * len(eligible) // 3] if c not in frequent_holdout]
    rng = np.random.RandomState(42)
    n_medium = min(n_medium, len(middle))
    medium_holdout = list(rng.choice(middle, n_medium, replace=False)) if n_medium else []

    return sorted(int(c) for c in frequent_holdout + medium_holdout), eligible


def print_class_statistics(stats, holdout_classes):
    i2l = stats["index2label"]
    total_train = sum(stats["train_frame_counts"].values())
    total_test = sum(stats["test_frame_counts"].values())
    print("\n" + "=" * 80)
    print("SELECTED HOLDOUT CLASSES")
    print(f"{'ID':<4} {'Label':<15} {'TrainFrames':<12} {'TrainVids':<10} {'TestFrames':<12} {'TestVids':<10}")
    print("-" * 80)
    for c in holdout_classes:
        print(f"{c:<4} {i2l[c]:<15} {stats['train_frame_counts'][c]:<12} "
              f"{stats['train_video_counts'][c]:<10} {stats['test_frame_counts'][c]:<12} "
              f"{stats['test_video_counts'][c]:<10}")
    h_train = sum(stats["train_frame_counts"][c] for c in holdout_classes)
    h_test = sum(stats["test_frame_counts"][c] for c in holdout_classes)
    print("-" * 80)
    print(f"Total holdout classes: {len(holdout_classes)}")
    if total_train:
        print(f"Holdout train frames: {h_train} ({100 * h_train / total_train:.1f}%)")
    if total_test:
        print(f"Holdout test frames: {h_test} ({100 * h_test / total_test:.1f}%)")


def check_training_impact(stats, holdout_classes):
    """How many training videos survive holdout filtering (viability check)."""
    train_with_holdout = set()
    for cls in holdout_classes:
        train_with_holdout.update(stats["train_class_to_videos"][cls])
    remaining = [v for v in stats["train_videos"] if v not in train_with_holdout]
    n_total = len(stats["train_videos"])
    print("\n" + "=" * 80)
    print("TRAINING IMPACT / LEAKAGE CHECK")
    print(f"Training videos containing holdout classes (removed): {len(train_with_holdout)}")
    print(f"Remaining training videos: {len(remaining)}/{n_total} "
          f"({100 * len(remaining) / max(n_total, 1):.1f}%)")
    if len(remaining) == 0:
        print("ERROR: no training videos would remain — pick different holdout classes!")
    elif len(remaining) < 0.05 * n_total:
        print("WARNING: fewer than 5% of training videos remain")
    return remaining


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--base_path", required=True, help="dataset dir with mapping.txt/groundTruth/splits")
    parser.add_argument("--split", default="split1")
    parser.add_argument("--n_frequent", type=int, default=6)
    parser.add_argument("--n_medium", type=int, default=3)
    parser.add_argument("--min_test_videos", type=int, default=3)
    parser.add_argument("--bg_class", type=int, default=0)
    parser.add_argument("--skip_top_n", type=int, default=5)
    args = parser.parse_args()

    stats = collect_statistics(args.base_path, args.split)
    holdout, _ = select_holdout_classes(
        stats, args.n_frequent, args.n_medium, args.min_test_videos, args.bg_class, args.skip_top_n
    )
    print_class_statistics(stats, holdout)
    check_training_impact(stats, holdout)
    print("\nYAML config snippet:")
    print(f"holdout_classes: {holdout}")


if __name__ == "__main__":
    main()
