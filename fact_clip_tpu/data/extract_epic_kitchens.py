#!/usr/bin/python3
"""One-off tool: build per-video Epic-Kitchens feature `.npy`s from the
C2-Action-Detection RGB+flow LMDB feature dumps.

Functional equivalent of /root/reference/fact_clip/utils/extract_epic_kitchens.py:
for each video listed in the annotation CSV, read the per-frame RGB and flow
feature vectors from the two LMDBs, concatenate them, and save
``features/<video>.npy`` (T, D).  Requires the optional ``lmdb`` and
``pandas`` packages (not part of the framework runtime — this is an offline
data preparation script).
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def extract(rgb_lmdb: str, flow_lmdb: str, video_list, out_dir: str, key_pattern: str = "{video}_frame_{idx:010d}.jpg"):
    import lmdb  # noqa: PLC0415 - optional offline dependency

    os.makedirs(out_dir, exist_ok=True)
    env_rgb = lmdb.open(rgb_lmdb, readonly=True, lock=False)
    env_flow = lmdb.open(flow_lmdb, readonly=True, lock=False)

    with env_rgb.begin() as txn_rgb, env_flow.begin() as txn_flow:
        for video in video_list:
            feats = []
            idx = 1
            while True:
                key = key_pattern.format(video=video, idx=idx).encode()
                rgb = txn_rgb.get(key)
                flow = txn_flow.get(key)
                if rgb is None or flow is None:
                    break
                rgb = np.frombuffer(rgb, dtype=np.float32)
                flow = np.frombuffer(flow, dtype=np.float32)
                feats.append(np.concatenate([rgb, flow]))
                idx += 1
            if not feats:
                print(f"warning: no frames found for {video}")
                continue
            arr = np.stack(feats).astype(np.float32)
            np.save(os.path.join(out_dir, video + ".npy"), arr)
            print(f"{video}: {arr.shape}")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--rgb_lmdb", required=True)
    parser.add_argument("--flow_lmdb", required=True)
    parser.add_argument("--video_list", required=True, help="text file, one video id per line")
    parser.add_argument("--out_dir", required=True)
    args = parser.parse_args()

    with open(args.video_list) as f:
        videos = [l.strip() for l in f if l.strip()]
    extract(args.rgb_lmdb, args.flow_lmdb, videos, args.out_dir)


if __name__ == "__main__":
    main()
