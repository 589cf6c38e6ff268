#!/usr/bin/python3
"""Select holdout classes for compositional zero-shot on HA-ViD.

Behavior-compatible with /root/reference/scripts/select_holdout_classes.py:
scores each class by how well its components (verb / objects) are supported
by the *remaining* training data — geometric mean of verb support and object
support — and recommends the top frequent, well-supported classes.
"""

import argparse
import os
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fact_clip_tpu.data.io import load_action_mapping, read_groundtruth_lines, read_split_list
from fact_clip_tpu.data.text_prompts import parse_havid_label
from fact_clip_tpu.home import get_project_base


def score_candidates(base_path: str, split_name: str = "split1", min_frames: int = 500, top_k: int = 5):
    map_path = os.path.join(base_path, "mapping.txt")
    train_split = os.path.join(base_path, "splits", f"train.{split_name}.bundle")
    gt_path = os.path.join(base_path, "groundTruth")

    label2index, index2label = load_action_mapping(map_path)

    train_videos = [v.strip() for v in read_split_list(train_split) if v.strip()]
    train_videos = [v[:-4] if v.endswith(".txt") else v for v in train_videos]

    train_counts = Counter()
    for v in train_videos:
        labels = [label2index[l] for l in read_groundtruth_lines(gt_path, v) if l in label2index]
        train_counts.update(labels)
    print(f"Total training frames: {sum(train_counts.values())}")

    # parse classes into verb + object components
    class_components = {}
    for idx, label in index2label.items():
        if label == "background":
            continue
        parsed = parse_havid_label(label)
        objs = [parsed[k] for k in ("manipulated_object", "target_object", "tool") if parsed.get(k)]
        class_components[idx] = {
            "label": label,
            "verb": parsed.get("verb"),
            "objects": objs,
            "frame_count": train_counts[idx],
        }

    candidates = []
    for target_idx, target in class_components.items():
        verb_support = 0
        object_support = 0.0
        target_objs = set(target["objects"])
        for other_idx, other in class_components.items():
            if other_idx == target_idx:
                continue
            frames = other["frame_count"]
            if frames == 0:
                continue
            if other["verb"] == target["verb"]:
                verb_support += frames
            common = target_objs.intersection(other["objects"])
            if common:
                object_support += frames * (len(common) / max(1, len(target_objs)))
        score = (verb_support * object_support) ** 0.5
        candidates.append({
            "id": target_idx, "label": target["label"], "frames": target["frame_count"],
            "verb": target["verb"], "objects": target["objects"], "score": score,
            "verb_support": verb_support, "obj_support": object_support,
        })

    candidates.sort(key=lambda x: x["score"], reverse=True)

    print("\n" + "=" * 100)
    print(f"{'ID':<4} {'Label':<15} {'Frames':<8} {'Score':<10} {'VerbSup':<12} {'ObjSup':<12} Components")
    print("=" * 100)
    top = []
    for c in candidates:
        if c["frames"] > min_frames:
            print(f"{c['id']:<4} {c['label']:<15} {c['frames']:<8} {int(c['score']):<10} "
                  f"{c['verb_support']:<12} {int(c['obj_support']):<12} {c['verb']} | {c['objects']}")
            top.append(c["id"])

    selected = top[:top_k]
    print("\n" + "=" * 80)
    print("RECOMMENDED HOLDOUT CONFIGURATION")
    print("=" * 80)
    print(f"Top {top_k} Compositional Zero-Shot Candidates: {selected}")
    print("\nYAML config snippet:")
    print(f"holdout_classes: {selected}")
    return selected


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--variant", default="view0_lh_pt")
    parser.add_argument("--split", default="split1")
    parser.add_argument("--min_frames", type=int, default=500)
    parser.add_argument("--top_k", type=int, default=5)
    parser.add_argument("--base_path", default=None, help="override dataset dir")
    args = parser.parse_args()

    base_path = args.base_path or os.path.join(
        get_project_base(), "data", "HAViD", "ActionSegmentation", "data", args.variant
    )
    print(f"Analyzing dataset: {args.variant}\nPath: {base_path}")
    score_candidates(base_path, args.split, args.min_frames, args.top_k)


if __name__ == "__main__":
    main()
