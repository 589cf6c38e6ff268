"""Shared experiment assembly for the train / eval entry points.

Builds datasets, length buckets and segment caps, the model, class weights,
and (for FACT_CLIP) the text-embedding bundle — the part of
/root/reference/scripts/train.py:139-224 that precedes the training loop.
"""

from __future__ import annotations

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..data.batching import BatchAssembler, EvalLoader, TrainLoader, scan_dataset_caps
from ..data.dataset import create_dataset
from ..models import losses as losses_mod
from ..models.blocks import build_fact


@dataclasses.dataclass
class Experiment:
    cfg: object
    dataset: object
    test_dataset: object
    buckets: list
    seg_cap: int
    s_pred_cap: int
    model: object
    params: object
    cweight: np.ndarray
    clip_bundle: dict | None
    assembler: BatchAssembler
    test_assembler: BatchAssembler
    verbnoun: bool = False

    def train_loader(self, seed=0, process_id=0, process_count=1):
        return TrainLoader(self.dataset, self.cfg.batch_size, self.assembler, seed=seed,
                           process_id=process_id, process_count=process_count)

    def test_loader(self):
        return EvalLoader(self.test_dataset, self.cfg.batch_size, self.test_assembler)


def auto_pred_seg_cap(cfg, seg_cap: int, max_len: int) -> int:
    cap = cfg.TPU.max_pred_segs
    if cap is None or cap <= 0:
        cap = max(2 * seg_cap, 64)
        cap = int(np.ceil(cap / 32)) * 32
    return int(min(cap, max_len))


def build_clip_bundle(cfg, text_embeddings: np.ndarray, holdout_classes) -> dict:
    """Holdout-masked CLIP bundle (blocks.py:704-751): seen-class embeddings
    for the training loss + a global->seen label remap table; all-class
    embeddings for zero-shot decode."""
    n = text_embeddings.shape[0]
    holdout = set(holdout_classes or [])
    seen = [i for i in range(n) if i not in holdout]
    label_map = np.full((n,), -1, np.int32)
    label_map[np.array(seen, np.int64)] = np.arange(len(seen), dtype=np.int32)
    return {
        "text_emb": jnp.asarray(text_embeddings, jnp.float32),
        "seen_text_emb": jnp.asarray(text_embeddings[np.array(seen, np.int64)], jnp.float32),
        "label_map": jnp.asarray(label_map),
        "temp": float(cfg.CLIP.temp),
        "fact_w": float(cfg.CLIP.fact_loss_weight),
        "cont_w": float(cfg.CLIP.contrastive_weight),
    }


def build_model(cfg, in_dim: int, nclasses: int, s_pred_cap: int, *,
                clip_dim: int = 512, vids=None, nids=None):
    """Model-family dispatch (vanilla FACT / FACT_CLIP / epic verb-noun).

    Factored out of ``build_experiment`` so ``engine.export`` can rebuild a
    parameter-tree-identical model under a Pallas-platform override for AOT
    cross-compilation.
    """
    if bool(cfg.use_clip):
        from ..models.clip_model import build_fact_clip

        return build_fact_clip(cfg, in_dim, nclasses, s_pred_cap, clip_dim)
    if cfg.dataset == "epic":
        from ..models.verbnoun import build_verbnoun_fact

        n1 = int(vids.max()) + 1
        n2 = int(nids.max()) + 1
        return build_verbnoun_fact(cfg, in_dim, vids, nids, s_pred_cap,
                                   n_classes1=n1, n_classes2=n2)
    return build_fact(cfg, in_dim, nclasses, s_pred_cap)


def build_experiment(cfg, text_embeddings: np.ndarray | None = None, seed: int = 0) -> Experiment:
    if cfg.TPU.matmul_precision:
        jax.config.update("jax_default_matmul_precision", cfg.TPU.matmul_precision)

    dataset, test_dataset = create_dataset(cfg)
    buckets, seg_cap = scan_dataset_caps([dataset, test_dataset], cfg)
    max_len = buckets[-1]
    s_pred_cap = auto_pred_seg_cap(cfg, seg_cap, max_len)

    if cfg.Loss.nullw == -1:
        losses_mod.compute_null_weight(cfg, dataset)

    use_clip = bool(cfg.use_clip)
    clip_bundle = None
    if use_clip and text_embeddings is not None:
        holdout = cfg.holdout_classes if cfg.holdout_mode else []
        clip_bundle = build_clip_bundle(cfg, text_embeddings, holdout)

    verbnoun = cfg.dataset == "epic" and not use_clip
    if verbnoun:
        from ..home import get_project_base
        from ..models.verbnoun import load_vids_nids

        processed_dir = (
            os.path.dirname(cfg.map_fname) if cfg.map_fname
            else get_project_base() + "data/epic-kitchens/processed"
        )
        vids, nids = load_vids_nids(processed_dir)
    else:
        vids = nids = None
    clip_dim = int(text_embeddings.shape[1]) if text_embeddings is not None else 512
    model = build_model(
        cfg, dataset.input_dimension, dataset.nclasses, s_pred_cap,
        clip_dim=clip_dim, vids=vids, nids=nids,
    )

    cweight = losses_mod.build_class_weights(cfg, dataset.nclasses, dataset.bg_class)

    # init params on a tiny dummy batch (shapes don't matter to param shapes)
    B, L, S = 1, buckets[0], seg_cap
    dummy = dict(
        feats=jnp.zeros((B, L, dataset.input_dimension), jnp.float32),
        mask=jnp.ones((B, L), bool),
        lengths=jnp.full((B,), L, jnp.int32),
        transcript=jnp.zeros((B, S), jnp.int32),
        seg_mask=jnp.ones((B, S), bool),
    )
    trans_args = (dummy["transcript"], dummy["seg_mask"]) if cfg.FACT.trans else (None, None)
    params = model.init(
        {"params": jax.random.PRNGKey(seed)},
        dummy["feats"], dummy["mask"], dummy["lengths"], *trans_args, train=False,
    )["params"]

    assembler = BatchAssembler(dataset, seg_cap, buckets)
    test_assembler = BatchAssembler(test_dataset, seg_cap, buckets)

    return Experiment(
        cfg=cfg, dataset=dataset, test_dataset=test_dataset, buckets=buckets,
        seg_cap=seg_cap, s_pred_cap=s_pred_cap, model=model, params=params,
        cweight=cweight, clip_bundle=clip_bundle,
        assembler=assembler, test_assembler=test_assembler, verbnoun=verbnoun,
    )
