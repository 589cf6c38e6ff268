"""Bucketed, padded batch assembly for the jitted training step.

This replaces the reference's hand-rolled one-video-at-a-time DataLoader
(/root/reference/fact_clip/utils/dataset.py:82-131).  Videos are padded to a
small set of static bucket lengths (limiting XLA recompiles) and stacked into
dense (B, L, D) arrays with frame masks; per-video ground-truth transcripts
and segment indices are padded to a static segment cap.  Loss semantics stay
per-video (masked) so batching is numerically equivalent to the reference's
B=1 loop.

Wrap-around of the last partial batch mirrors the reference loader
(dataset.py:116-117): the tail batch is completed with videos from the head
of the (shuffled) order.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from .dataset import Dataset


def make_bucket_lengths(max_len: int, multiple: int = 128, growth: float = 1.26) -> list:
    """Geometric ladder of padded lengths, each a multiple of ``multiple``."""
    buckets = []
    cur = multiple
    while cur < max_len:
        buckets.append(cur)
        nxt = int(np.ceil(cur * growth / multiple)) * multiple
        cur = max(nxt, cur + multiple)
    buckets.append(int(np.ceil(max_len / multiple)) * multiple)
    return buckets


def bucket_for(length: int, buckets: list) -> int:
    for b in buckets:
        if length <= b:
            return b
    raise ValueError(f"Length {length} exceeds largest bucket {buckets[-1]}")


@dataclasses.dataclass
class Batch:
    """One padded batch; array members are what ships to the device."""

    feats: np.ndarray       # (B, L, D) float32
    mask: np.ndarray        # (B, L) bool — valid frames
    labels: np.ndarray      # (B, L) int32 — train labels, 0 at padding
    seg_label: np.ndarray   # (B, L) int32 — GT segment index per frame
    transcript: np.ndarray  # (B, S) int32 — GT segment classes, 0 at padding
    seg_mask: np.ndarray    # (B, S) bool — valid GT segments
    lengths: np.ndarray     # (B,) int32
    vnames: list            # host-side
    eval_labels: list       # host-side full-rate labels for metrics

    @property
    def device_arrays(self) -> dict:
        return dict(
            feats=self.feats,
            mask=self.mask,
            labels=self.labels,
            seg_label=self.seg_label,
            transcript=self.transcript,
            seg_mask=self.seg_mask,
            lengths=self.lengths,
        )


class BatchAssembler:
    """Pads and stacks VideoItems into fixed-shape Batches."""

    def __init__(self, dataset: Dataset, seg_cap: int, buckets: list):
        self.dataset = dataset
        self.seg_cap = seg_cap
        self.buckets = buckets

    def assemble(self, vnames: list, min_len: int = 0) -> Batch:
        """``min_len`` pins the bucket at least that long — multi-process
        loaders use it so every process pads its local slice identically."""
        items = [self.dataset[v] for v in vnames]
        B = len(items)
        D = self.dataset.input_dimension
        L = bucket_for(max(max(len(it.train_label) for it in items), min_len), self.buckets)
        S = self.seg_cap

        feats = np.zeros((B, L, D), dtype=np.float32)
        mask = np.zeros((B, L), dtype=bool)
        labels = np.zeros((B, L), dtype=np.int32)
        seg_label = np.zeros((B, L), dtype=np.int32)
        transcript = np.zeros((B, S), dtype=np.int32)
        seg_mask = np.zeros((B, S), dtype=bool)
        lengths = np.zeros((B,), dtype=np.int32)
        eval_labels = []

        streaming = self.dataset.feature_source is not None
        if streaming:
            feats = self._stream_features(vnames, items, L, D)

        for i, it in enumerate(items):
            t = len(it.train_label)
            s = len(it.transcript)
            if s > S:
                raise ValueError(
                    f"Video {vnames[i]} has {s} GT segments > static cap {S}; "
                    f"raise cfg.TPU.max_gt_segs"
                )
            if not streaming:
                feats[i, :t] = it.feature[:t]
            mask[i, :t] = True
            labels[i, :t] = it.train_label
            seg_label[i, :t] = it.seg_label
            # padding frames keep the last valid segment id so downstream
            # gathers stay in-range; the frame mask removes their contribution
            if t < L:
                labels[i, t:] = it.train_label[-1]
                seg_label[i, t:] = it.seg_label[-1]
            transcript[i, :s] = it.transcript
            seg_mask[i, :s] = True
            lengths[i] = t
            eval_labels.append(it.eval_label)

        return Batch(feats, mask, labels, seg_label, transcript, seg_mask, lengths, list(vnames), eval_labels)

    def _stream_features(self, vnames, items, L, D):
        """Streaming mode: read this batch's features from disk (native
        thread-pooled loader with fused stride/cast/transpose when built)."""
        import os

        src = self.dataset.feature_source
        paths = [os.path.join(src["feature_path"], v + ".npy") for v in vnames]
        caps = np.array([len(it.train_label) for it in items], np.int64)

        from . import native

        if native.available():
            feats, lens = native.assemble_batch(
                paths, src["transpose"], t_cap=L, d=D, stride=src["sr"], t_caps=caps
            )
            if not (lens == caps).all():
                raise IOError(
                    f"streaming feature rows {lens.tolist()} != label rows {caps.tolist()}"
                )
            return feats

        from .io import load_feature

        feats = np.zeros((len(vnames), L, D), np.float32)
        for i, v in enumerate(vnames):
            f = load_feature(src["feature_path"], v, src["transpose"])
            f = f[:: src["sr"]] if src["sr"] > 1 else f
            feats[i, : caps[i]] = f[: caps[i]]
        return feats


class TrainLoader:
    """Shuffled, bucket-sorted epoch iterator with wrap-around tail batch.

    Multi-host data parallelism: pass ``process_id``/``process_count`` and
    every process derives the *same* global batch composition (the shuffle is
    seeded identically), then assembles only its contiguous slice of each
    batch — rows [pid * B/n, (pid+1) * B/n).  ``parallel/distributed.py``
    turns the local slices back into global batch-sharded arrays.
    """

    def __init__(self, dataset: Dataset, batch_size: int, assembler: BatchAssembler,
                 seed: int = 0, shuffle: bool = True,
                 process_id: int = 0, process_count: int = 1):
        assert batch_size % process_count == 0, (
            f"batch_size {batch_size} not divisible by process_count {process_count}"
        )
        self.dataset = dataset
        self.batch_size = batch_size
        self.assembler = assembler
        self.shuffle = shuffle
        self._rng = np.random.default_rng(seed)
        self.videos = list(dataset.get_vnames())
        self.num_batch = int(np.ceil(len(self.videos) / batch_size))
        self.process_id = process_id
        self.process_count = process_count

    def __len__(self):
        return self.num_batch

    def __iter__(self):
        order = list(range(len(self.videos)))
        if self.shuffle:
            self._rng.shuffle(order)
            # group videos of similar length together (stable sort by bucket)
            # so batches pad to the same bucket; order within a bucket stays random
            lens = [len(self.dataset[self.videos[i]].train_label) for i in order]
            bucket_ids = [bucket_for(l, self.assembler.buckets) for l in lens]
            order = [o for _, o in sorted(zip(bucket_ids, order), key=lambda x: x[0])]

        batches = []
        for b in range(self.num_batch):
            idx = order[b * self.batch_size : (b + 1) * self.batch_size]
            if len(idx) < self.batch_size:
                # complete the tail batch from the *end* of the order: those
                # are same-bucket (longest) videos, so a short video never
                # gets dragged through the largest bucket's padded compute
                pool = order[-self.batch_size :]
                while len(idx) < self.batch_size:
                    idx = idx + pool[: self.batch_size - len(idx)]
            batches.append(idx)
        if self.shuffle:
            self._rng.shuffle(batches)

        per = self.batch_size // self.process_count
        lo, hi = self.process_id * per, (self.process_id + 1) * per
        for idx in batches:
            local = idx[lo:hi]
            if self.process_count > 1:
                # all processes must pad to the same bucket: pin the batch's
                # global bucket from the full composition
                gmax = max(len(self.dataset[self.videos[i]].train_label) for i in idx)
                yield self.assembler.assemble(
                    [self.videos[i] for i in local], min_len=gmax
                )
            else:
                yield self.assembler.assemble([self.videos[i] for i in local])


class EvalLoader:
    """Sequential iterator over the full dataset (no shuffling).

    Partial tail batches are padded by repeating the last video so every
    batch has a static shape; the results store is keyed by video name, so
    duplicate entries overwrite harmlessly (the reference's wrap-around
    loader relies on the same property).
    """

    def __init__(self, dataset: Dataset, batch_size: int, assembler: BatchAssembler, pad: bool = True):
        self.dataset = dataset
        self.batch_size = batch_size
        self.assembler = assembler
        self.pad = pad
        self.videos = list(dataset.get_vnames())
        # group by bucket so eval batches are densely packed
        lens = [len(dataset[v].train_label) for v in self.videos]
        bids = [bucket_for(l, assembler.buckets) for l in lens]
        self.videos = [v for _, v in sorted(zip(bids, self.videos), key=lambda x: x[0])]
        self.num_batch = int(np.ceil(len(self.videos) / batch_size))

    def __len__(self):
        return self.num_batch

    def __iter__(self):
        for b in range(self.num_batch):
            vnames = self.videos[b * self.batch_size : (b + 1) * self.batch_size]
            if self.pad and len(vnames) < self.batch_size:
                vnames = vnames + [vnames[-1]] * (self.batch_size - len(vnames))
            yield self.assembler.assemble(vnames)


def scan_dataset_caps(datasets: list, cfg) -> tuple:
    """Determine (bucket list, gt segment cap) from the data + config."""
    max_len, max_segs = 0, 0
    for ds in datasets:
        l, s = ds.max_stats()
        max_len = max(max_len, l)
        max_segs = max(max_segs, s)

    buckets = make_bucket_lengths(max_len, cfg.TPU.bucket_multiple, cfg.TPU.bucket_growth)

    seg_cap = cfg.TPU.max_gt_segs
    if seg_cap is None or seg_cap <= 0:
        seg_cap = max_segs
    elif seg_cap < max_segs:
        raise ValueError(f"cfg.TPU.max_gt_segs={seg_cap} < observed max segments {max_segs}")
    return buckets, int(seg_cap)
