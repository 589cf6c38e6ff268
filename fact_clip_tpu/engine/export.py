"""AOT serving export — package the inference step as StableHLO artifacts.

The reference's deployment story is a torch pickle that
``scripts/run_eval.py`` re-instantiates the full Python model tree around
(/root/reference/scripts/run_eval.py:134-137); serving it requires the whole
source tree plus a matching torch build.  Here the entire eval step (forward
through every block, TDU segmentation, and the on-device decode) is one
jitted program, so ``jax.export`` can serialize it — weights baked in as
constants — into a self-contained, versioned artifact that any JAX/PJRT
runtime for the target platform can execute with neither ``fact_clip_tpu``
nor flax installed on the serving host.

Artifact layout (a zip file):

* ``meta.json`` — format version, the full config dump, shapes, platforms,
  and the jax version used to build it.
* ``bucket_<L>.jexp`` — one ``jax.export`` blob per padded-length bucket.

Each exported function takes ``(feats, mask, lengths[, transcript,
seg_mask])`` with static shapes ``(B, L, D) / (B, L) / (B,) [/ (B, S),
(B, S)]`` and returns the ``(B, L)`` int32 frame predictions (composed
action ids for the epic verb/noun family).

Cross-compilation: exporting for ``platforms=("tpu",)`` from a CPU-pinned
process lowers the Pallas kernels through Mosaic without a TPU device, so
production artifacts (fused kernels) can be built on any machine.  A
multi-platform artifact (``("tpu", "cpu")``) must be built with the Pallas
kernels disabled, because ``pallas_call`` has no CPU lowering.

Scope: artifacts are single-device programs (one chip per replica, the
serving deployment shape).  Videos beyond the single-chip max-T (245,760
frames inference on v5e — BASELINE.md max-T table) are out of scope for
AOT artifacts; serve those through the live eval path, which shards the
time axis across chips per batch length (``TPU.num_seq_shards`` +
``TPU.eval_seq_min_T``, parallel/mesh.py::make_eval_placer).
"""

from __future__ import annotations

import contextlib
import json
import zipfile

import jax
import numpy as np
from jax import export as jax_export

from ..models import blocks as blocks_mod
from .steps import make_step_fns

FORMAT_VERSION = 1
_META_NAME = "meta.json"


@contextlib.contextmanager
def _pallas_platform(platform: str | None):
    """Temporarily override the platform ``_want_pallas`` resolves against."""
    prev = blocks_mod._PALLAS_PLATFORM_OVERRIDE
    blocks_mod._PALLAS_PLATFORM_OVERRIDE = platform
    try:
        yield
    finally:
        blocks_mod._PALLAS_PLATFORM_OVERRIDE = prev


def _serve_fn(exp, model, params):
    """Bake params (and the CLIP bundle) into a positional-arg eval step."""
    cfg = exp.cfg
    _, eval_step = make_step_fns(
        model, cfg, exp.dataset.nclasses, exp.cweight, exp.clip_bundle,
        verbnoun=exp.verbnoun,
    )
    if bool(cfg.FACT.trans):
        def serve(feats, mask, lengths, transcript, seg_mask):
            batch = dict(feats=feats, mask=mask, lengths=lengths,
                         transcript=transcript, seg_mask=seg_mask)
            return eval_step(params, batch)
    else:
        def serve(feats, mask, lengths):
            batch = dict(feats=feats, mask=mask, lengths=lengths)
            return eval_step(params, batch)
    return serve


def export_serving(exp, params=None, *, platforms=("tpu",), batch_size=None,
                   bucket_lengths=None, pallas=None):
    """Export the eval step for every requested bucket.

    Returns ``(exported, meta)`` where ``exported`` maps bucket length ->
    ``jax.export.Exported`` and ``meta`` is the JSON-serializable artifact
    header.  ``pallas=None`` resolves to "on iff the only target platform is
    tpu and cfg.TPU.pallas is set".
    """
    cfg = exp.cfg
    platforms = tuple(platforms)
    params = exp.params if params is None else params
    tpu_only = platforms == ("tpu",)
    if pallas is None:
        pallas = tpu_only and bool(cfg.TPU.pallas)
    if pallas and not tpu_only:
        raise ValueError(
            f"Pallas kernels only lower for the tpu platform; got {platforms}. "
            "Pass pallas=False for a multi-platform artifact."
        )

    B = int(batch_size or cfg.batch_size)
    buckets = [int(b) for b in (bucket_lengths or exp.buckets)]
    D = int(exp.dataset.input_dimension)
    S = int(exp.seg_cap)
    trans = bool(cfg.FACT.trans)

    with _pallas_platform("tpu" if pallas else "cpu"):
        model = _rebuild_model(exp)
        serve = _serve_fn(exp, model, params)
        exported = {}
        for L in buckets:
            specs = [
                jax.ShapeDtypeStruct((B, L, D), np.float32),
                jax.ShapeDtypeStruct((B, L), np.bool_),
                jax.ShapeDtypeStruct((B,), np.int32),
            ]
            if trans:
                specs += [
                    jax.ShapeDtypeStruct((B, S), np.int32),
                    jax.ShapeDtypeStruct((B, S), np.bool_),
                ]
            exported[L] = jax_export.export(jax.jit(serve), platforms=platforms)(*specs)

    meta = {
        "format_version": FORMAT_VERSION,
        "cfg": cfg.dump(),
        "platforms": list(platforms),
        "pallas": bool(pallas),
        "batch_size": B,
        "buckets": buckets,
        "input_dim": D,
        "seg_cap": S,
        "trans": trans,
        "use_clip": bool(cfg.use_clip),
        "verbnoun": bool(exp.verbnoun),
        "nclasses": int(exp.dataset.nclasses),
        "jax_version": jax.__version__,
    }
    return exported, meta


def _rebuild_model(exp):
    """Parameter-tree-identical model rebuilt under the Pallas override.

    ``exp.model`` resolved its Pallas flags against the *live* backend at
    build time; the export target platform may differ (cross-compilation),
    so the model is rebuilt with the override active.  The Pallas-on and
    Pallas-off module twins share one parameter tree by design (see
    ops/pallas/sa_layer.py and tests/test_pallas_kernels.py), so ``exp.params``
    load unchanged.
    """
    from .setup import build_model

    clip_dim = (
        int(exp.clip_bundle["text_emb"].shape[1]) if exp.clip_bundle is not None else 512
    )
    vids = np.asarray(exp.model.vids) if exp.verbnoun else None
    nids = np.asarray(exp.model.nids) if exp.verbnoun else None
    return build_model(
        exp.cfg, exp.dataset.input_dimension, exp.dataset.nclasses, exp.s_pred_cap,
        clip_dim=clip_dim, vids=vids, nids=nids,
    )


def save_serving(path: str, exported: dict, meta: dict) -> None:
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr(_META_NAME, json.dumps(meta, indent=2))
        for L, e in sorted(exported.items()):
            z.writestr(f"bucket_{L}.jexp", e.serialize())


def load_serving(path: str) -> "ServingModel":
    with zipfile.ZipFile(path) as z:
        meta = json.loads(z.read(_META_NAME))
        if meta["format_version"] > FORMAT_VERSION:
            raise ValueError(f"artifact format {meta['format_version']} is newer than "
                             f"this loader ({FORMAT_VERSION})")
        fns = {}
        for L in meta["buckets"]:
            fns[int(L)] = jax_export.deserialize(z.read(f"bucket_{L}.jexp"))
    return ServingModel(meta, fns)


class ServingModel:
    """A loaded serving artifact: padded-bucket dispatch over exported fns.

    ``predict`` is the high-level entry: it buckets variable-length feature
    sequences, pads each group to the artifact's static batch size (repeating
    the final video, like data/batching.py's EvalLoader), invokes the right
    exported program, and trims predictions back to the true lengths.
    """

    def __init__(self, meta: dict, fns: dict):
        self.meta = meta
        self.fns = dict(sorted(fns.items()))
        self.buckets = sorted(self.fns)
        self.batch_size = int(meta["batch_size"])
        self.input_dim = int(meta["input_dim"])
        self.trans = bool(meta["trans"])
        self.seg_cap = int(meta["seg_cap"])

    def call(self, bucket: int, *args):
        """Invoke one exported bucket program with exact static-shape args."""
        return self.fns[int(bucket)].call(*args)

    def _bucket_for(self, length: int) -> int:
        for b in self.buckets:
            if length <= b:
                return b
        raise ValueError(f"length {length} exceeds largest exported bucket {self.buckets[-1]}")

    def predict(self, feats_list, transcripts=None):
        """feats_list: sequence of (T_i, D) float arrays; returns a list of
        (T_i,) int32 frame predictions in the same order.

        transcripts: required iff the artifact was exported from a
        transcript-mode config — a sequence of (n_i,) int arrays.
        """
        if self.trans and transcripts is None:
            raise ValueError("transcript-mode artifact: pass transcripts=")
        n = len(feats_list)
        order = sorted(range(n), key=lambda i: self._bucket_for(len(feats_list[i])))
        out = [None] * n
        B = self.batch_size
        i = 0
        while i < len(order):
            # greedy chunk: same bucket, up to B videos
            bucket = self._bucket_for(len(feats_list[order[i]]))
            idx = [order[i]]
            while (len(idx) < B and i + len(idx) < len(order)
                   and self._bucket_for(len(feats_list[order[i + len(idx)]])) == bucket):
                idx.append(order[i + len(idx)])
            i += len(idx)
            pad_idx = idx + [idx[-1]] * (B - len(idx))
            feats = np.zeros((B, bucket, self.input_dim), np.float32)
            mask = np.zeros((B, bucket), bool)
            lengths = np.zeros((B,), np.int32)
            for row, j in enumerate(pad_idx):
                f = np.asarray(feats_list[j], np.float32)
                feats[row, : len(f)] = f
                mask[row, : len(f)] = True
                lengths[row] = len(f)
            args = [feats, mask, lengths]
            if self.trans:
                tr = np.zeros((B, self.seg_cap), np.int32)
                sm = np.zeros((B, self.seg_cap), bool)
                for row, j in enumerate(pad_idx):
                    t = np.asarray(transcripts[j], np.int32)
                    tr[row, : len(t)] = t
                    sm[row, : len(t)] = True
                args += [tr, sm]
            pred = np.asarray(self.call(bucket, *args))
            for row, j in enumerate(idx):
                out[j] = pred[row, : lengths[row]].astype(np.int32)
        return out
