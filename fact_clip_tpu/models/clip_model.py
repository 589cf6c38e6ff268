"""FACT_CLIP: open-vocabulary FACT with a CLIP text-embedding head.

Equivalent to /root/reference/fact_clip/models/blocks.py:504-920: the vanilla
FACT stack plus a FeatureProjection MLP that maps the last block's raw frame
features (class-prob dims stripped, blocks.py:657-660) into CLIP space.  The
frozen text embeddings themselves are not parameters; they live in the step
functions (engine/steps.py) as constants, which keeps the checkpointed param
tree equal to vanilla FACT + projection.
"""

from __future__ import annotations

from flax import linen as nn

from .blocks import FACT, build_fact
from .layers import FeatureProjection


class FACTCLIP(nn.Module):
    fact: FACT
    n_classes: int
    clip_dim: int = 512
    projection_hidden_dim: int = 512
    projection_dropout: float = 0.1

    @nn.compact
    def __call__(self, feats, mask, lengths, transcript=None, seg_mask=None, train: bool = False):
        saves_list, frame_feature = self.fact(
            feats, mask, lengths, transcript=transcript, seg_mask=seg_mask, train=train
        )
        raw = frame_feature[..., : frame_feature.shape[-1] - self.n_classes]
        frame_emb = FeatureProjection(
            clip_dim=self.clip_dim,
            hidden_dim=self.projection_hidden_dim,
            dropout=self.projection_dropout,
            name="frame_projection",
        )(raw, deterministic=not train)
        return saves_list, frame_emb


def build_fact_clip(cfg, in_dim: int, n_classes: int, s_pred_cap: int, clip_dim: int = 512) -> FACTCLIP:
    return FACTCLIP(
        fact=build_fact(cfg, in_dim, n_classes, s_pred_cap),
        n_classes=n_classes,
        clip_dim=clip_dim,
        projection_hidden_dim=cfg.CLIP.projection_hidden_dim,
        projection_dropout=cfg.CLIP.projection_dropout,
    )
