"""ctypes bindings for the native host data runtime (native/factdata.cpp).

The library is optional: if ``native/libfactdata.so`` hasn't been built
(``make -C native``), callers fall back to the NumPy implementations.

Wired into the pipeline: the fused .npy reader (f8->f4 cast + transpose,
data/io.py::load_feature) and the majority-vote label shrink
(data/dataset.py).  ``assemble_batch`` (thread-pooled parallel load of a
whole batch straight into the padded buffer) is the streaming-mode API for
datasets too large for the in-memory VideoItem cache; not yet used by the
default cached-Dataset path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB = None
_TRIED = False

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "native")


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    so = os.path.join(_NATIVE_DIR, "libfactdata.so")
    if not os.path.exists(so):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True, capture_output=True)
        except Exception:  # noqa: BLE001 - missing toolchain: stay on numpy
            return None
    try:
        lib = ctypes.CDLL(so)
    except OSError:
        return None

    lib.fact_npy_dims.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_long),
                                  ctypes.POINTER(ctypes.c_long)]
    lib.fact_npy_dims.restype = ctypes.c_int

    lib.fact_load_features.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.POINTER(ctypes.c_float),
        ctypes.c_long, ctypes.c_long,
    ]
    lib.fact_load_features.restype = ctypes.c_long

    lib.fact_load_features_strided.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_long, ctypes.POINTER(ctypes.c_float),
        ctypes.c_long, ctypes.c_long,
    ]
    lib.fact_load_features_strided.restype = ctypes.c_long

    lib.fact_shrink_labels.argtypes = [
        ctypes.POINTER(ctypes.c_int64), ctypes.c_long, ctypes.c_long,
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.fact_shrink_labels.restype = ctypes.c_long

    lib.fact_rle.argtypes = [ctypes.POINTER(ctypes.c_int64), ctypes.c_long] + \
        [ctypes.POINTER(ctypes.c_int64)] * 3
    lib.fact_rle.restype = ctypes.c_long

    lib.fact_assemble_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_long, ctypes.c_int,
        ctypes.c_long, ctypes.POINTER(ctypes.c_long),
        ctypes.POINTER(ctypes.c_float), ctypes.c_long, ctypes.c_long,
        ctypes.POINTER(ctypes.c_long), ctypes.c_int,
    ]
    lib.fact_assemble_batch.restype = None

    _LIB = lib
    return _LIB


def available() -> bool:
    return _load() is not None


def npy_dims(path: str):
    lib = _load()
    rows, cols = ctypes.c_long(), ctypes.c_long()
    rc = lib.fact_npy_dims(path.encode(), ctypes.byref(rows), ctypes.byref(cols))
    if rc != 0:
        raise IOError(f"fact_npy_dims({path}) -> {rc}")
    return rows.value, cols.value


def load_features(path: str, transpose: bool, t_cap: int, d: int) -> np.ndarray:
    """Load one feature file into a fresh (t, d) float32 array."""
    lib = _load()
    out = np.zeros((t_cap, d), np.float32)
    t = lib.fact_load_features(
        path.encode(), int(transpose), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        t_cap, d,
    )
    if t < 0:
        raise IOError(f"fact_load_features({path}) -> {t}")
    return out[:t]


def shrink_labels(labels, clip_len: int) -> np.ndarray:
    lib = _load()
    labels = np.ascontiguousarray(labels, np.int64)
    n = len(labels)
    out = np.zeros(((n - 1) // clip_len + 1,), np.int64)
    k = lib.fact_shrink_labels(
        labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), n, clip_len,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    return out[:k]


def rle(labels) -> tuple:
    lib = _load()
    labels = np.ascontiguousarray(labels, np.int64)
    n = len(labels)
    cls = np.zeros(n, np.int64)
    start = np.zeros(n, np.int64)
    end = np.zeros(n, np.int64)
    k = lib.fact_rle(
        labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), n,
        cls.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        start.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        end.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    return cls[:k], start[:k], end[:k]


def assemble_batch(paths, transpose: bool, t_cap: int, d: int, n_threads: int = 0,
                   stride: int = 1, t_caps=None):
    """Parallel-load a batch of feature files into (B, t_cap, d) float32.

    ``stride`` applies cfg.sr temporal subsampling; ``t_caps`` optionally caps
    each video's rows (e.g. its ground-truth label count).  Returns
    (batch, lengths) with zero padding beyond each video's length.
    """
    lib = _load()
    B = len(paths)
    out = np.empty((B, t_cap, d), np.float32)
    lengths = np.zeros(B, np.int64)
    arr = (ctypes.c_char_p * B)(*[p.encode() for p in paths])
    caps_ptr = None
    if t_caps is not None:
        t_caps = np.ascontiguousarray(t_caps, np.int64)
        caps_ptr = t_caps.ctypes.data_as(ctypes.POINTER(ctypes.c_long))
    lib.fact_assemble_batch(
        arr, B, int(transpose), int(stride), caps_ptr,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        t_cap, d, lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_long)), n_threads,
    )
    if (lengths < 0).any():
        bad = [paths[i] for i in np.where(lengths < 0)[0]]
        raise IOError(f"native batch assembly failed for {bad}")
    return out, lengths
