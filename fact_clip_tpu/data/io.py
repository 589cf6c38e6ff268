"""Host-side file IO for the dataset directory conventions.

Format-compatible with the reference loaders
(/root/reference/fact_clip/utils/dataset.py:12-35,137-167): `.npy` feature
arrays (optionally transposed), `mapping.txt` (``idx label`` lines),
`groundTruth/<video>.txt` per-frame label files (with CRLF / latin-1
fallback), and split bundle files.
"""

from __future__ import annotations

import os

import numpy as np


def load_feature(feature_dir: str, video: str, transpose: bool) -> np.ndarray:
    """Load a (T, D) float32 feature array for one video.

    Uses the native C++ reader (fused parse + cast + transpose, data/native.py)
    when the library is built; NumPy otherwise.
    """
    path = os.path.join(feature_dir, video + ".npy")
    try:
        from . import native

        if native.available():
            rows, cols = native.npy_dims(path)
            t, d = (cols, rows) if transpose else (rows, cols)
            return native.load_features(path, transpose, t_cap=t, d=d)
    except Exception:  # noqa: BLE001 - any native hiccup falls back to numpy
        pass

    feature = np.load(path)
    if transpose:
        feature = feature.T
    if feature.dtype != np.float32:
        feature = feature.astype(np.float32)
    return feature


def load_action_mapping(map_fname: str, sep: str = " "):
    """Parse ``mapping.txt`` into (label2index, index2label)."""
    label2index, index2label = {}, {}
    with open(map_fname, "r") as f:
        for line in f.read().split("\n")[:-1]:
            tokens = line.split(sep)
            label = sep.join(tokens[1:])
            idx = int(tokens[0])
            label2index[label] = idx
            index2label[idx] = label
    return label2index, index2label


def read_groundtruth_lines(groundTruth_path: str, vname: str) -> list:
    """Read per-frame label strings with CRLF and latin-1 fallbacks."""
    with open(os.path.join(groundTruth_path, vname + ".txt"), "rb") as f:
        raw = f.read().replace(b"\r\n", b"\n")
    try:
        content = raw.decode("utf-8")
    except UnicodeDecodeError:
        content = raw.decode("latin-1")
    return content.split("\n")[:-1]


def read_split_list(split_fname: str) -> list:
    with open(split_fname, "r") as f:
        return f.read().split("\n")[0:-1]


def video_contains_holdout_classes(vname, groundTruth_path, label2index, holdout_classes) -> bool:
    """True if any frame of the video belongs to a holdout class."""
    try:
        lines = read_groundtruth_lines(groundTruth_path, vname)
        holdout = set(holdout_classes)
        for line in lines:
            if line in label2index and label2index[line] in holdout:
                return True
        return False
    except Exception as e:  # noqa: BLE001 - mirror reference's soft failure
        print(f"Warning: Could not read labels for video {vname}: {e}")
        return False
