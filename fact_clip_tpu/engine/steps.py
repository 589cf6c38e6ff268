"""Jitted train / eval step builders.

One ``train_step`` is a single XLA program: forward through all blocks,
matching (host Hungarian callback inside the program for o2o/o2m), all
losses, backward, optimizer update, and the train-time decode.  This
replaces the reference's per-video Python loop with device<->host syncs at
every TDU block and every matching call (SURVEY.md §3.1).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..models import decode, losses, matching


def _model_kwargs(batch, trans: bool):
    if trans:
        return dict(transcript=batch["transcript"], seg_mask=batch["seg_mask"])
    return dict(transcript=None, seg_mask=None)


def make_step_fns(model, cfg, nclasses: int, cweight, clip_bundle=None, verbnoun: bool = False):
    """Build (train_step, eval_step).

    clip_bundle: optional dict for FACT_CLIP with keys
      text_emb        (n, 512) all-class text embeddings (decode)
      seen_text_emb   (n_seen, 512) seen-class embeddings (training loss)
      label_map       (n,) global->seen-subset index or -1 (holdout remap)
      temp, fact_w, cont_w
    verbnoun: the epic factored-head model (log-prob saves, its own losses).
    """
    trans = bool(cfg.FACT.trans)
    mwt = float(cfg.FACT.mwt)
    sw = float(cfg.Loss.sw)
    loss_cfg = cfg.Loss
    cweight = jnp.asarray(cweight)
    use_clip = clip_bundle is not None

    if verbnoun:
        vn_vids = jnp.asarray(model.vids, jnp.int32)
        vn_nids = jnp.asarray(model.nids, jnp.int32)

    def _decode(saves, batch, frame_emb):
        last = saves[-1]
        if verbnoun:
            from ..ops.verbnoun_compose import composed_decode

            token_mask = batch["seg_mask"] if trans else jnp.ones(last["action_logp"].shape[:2], bool)
            if trans:
                return decode.decode_transcript_attn_only(
                    batch["transcript"], batch["seg_mask"], last["a2f_attn"]
                )
            from ..models.blocks import _want_pallas

            return composed_decode(
                last["action_logp"], last["a2f_attn"], last["frame_vlogp"], last["frame_nlogp"],
                vn_vids, vn_nids, mwt, token_mask, pallas=_want_pallas(cfg),
            )
        token_mask = batch["seg_mask"] if trans else jnp.ones(last["action_clogit"].shape[:2], bool)
        if trans:
            return decode.decode_with_transcript(
                batch["transcript"], batch["seg_mask"], last["a2f_attn"], last["frame_clogit"], mwt
            )
        if use_clip:
            return decode.decode_with_clip(
                last["action_clogit"], last["a2f_attn"], frame_emb,
                clip_bundle["text_emb"], clip_bundle["temp"], mwt, token_mask,
            )
        return decode.decode_two_branch(
            last["action_clogit"], last["a2f_attn"], last["frame_clogit"], mwt, token_mask
        )

    matcher = cfg.TPU.matcher if "TPU" in cfg else "auto"
    auction_phases = int(getattr(cfg.TPU, "auction_phases", 1)) if "TPU" in cfg else 1
    from ..models.blocks import _want_pallas

    pallas_losses = _want_pallas(cfg)  # fused frame CE+smooth kernel (TPU only)

    def _match(saves, batch):
        last = saves[-1]
        if verbnoun:
            cprob = jnp.exp(last["action_logp"])
        else:
            cprob = jax.nn.softmax(last["action_clogit"], axis=-1)
        return matching.match(
            loss_cfg, cprob, last["a2f_attn"], batch["transcript"], batch["seg_label"],
            batch["seg_mask"], batch["mask"], matcher=matcher, nclasses=nclasses,
            phases=auction_phases,
        )

    def _loss(saves, batch, frame_emb):
        seg2tok = _match(saves, batch)
        token_mask = batch["seg_mask"] if trans else None
        if verbnoun:
            per_video = losses.verbnoun_fact_loss(saves, batch, seg2tok, cweight, sw, vn_vids, vn_nids)
        else:
            per_video = losses.fact_loss(
                saves, batch, seg2tok, cweight, sw, token_mask=token_mask,
                ref_weight_order=bool(getattr(loss_cfg, "ref_weight_order", False)),
                use_pallas=pallas_losses,
            )
        aux = {"fact_loss": per_video}
        if use_clip:
            labels = clip_bundle["label_map"][batch["labels"]]  # remap to seen subset
            valid = batch["mask"] & (labels >= 0)
            contrastive = losses.infonce_contrastive_loss(
                frame_emb, clip_bundle["seen_text_emb"], jnp.maximum(labels, 0), valid,
                clip_bundle["temp"],
            )
            total = clip_bundle["fact_w"] * per_video + clip_bundle["cont_w"] * contrastive
            aux["contrastive_loss"] = contrastive
            per_video = total
        return per_video, aux

    def _apply(params, batch, rngs, train):
        saves, tail = model.apply(
            {"params": params}, batch["feats"], batch["mask"], batch["lengths"],
            train=train, rngs=rngs, **_model_kwargs(batch, trans),
        )
        # tail is the projected frame embedding for FACT_CLIP, the raw final
        # frame feature for vanilla FACT (unused there)
        return saves, (tail if use_clip else None)

    def train_step_fn(state, batch, rng):
        rngs = {"dropout": jax.random.fold_in(rng, 0), "aug": jax.random.fold_in(rng, 1)}

        def loss_fn(params):
            saves, frame_emb = _apply(params, batch, rngs, train=True)
            per_video, aux = _loss(saves, batch, frame_emb)
            pred = _decode(saves, batch, frame_emb)
            return per_video.mean(), (per_video, aux, pred)

        (loss, (per_video, aux, pred)), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        state = state.apply_gradients(grads=grads)
        out = {"loss": loss, "per_video_loss": per_video, "pred": pred}
        for k, v in aux.items():
            out[k] = v
        return state, out

    train_step = jax.jit(train_step_fn, donate_argnums=0)
    # bench.py chains steps inside one lax.scan (the dev relay has ~25 ms
    # dispatch latency); expose the unjitted body for that
    train_step.unjitted = train_step_fn

    @jax.jit
    def eval_step(params, batch):
        saves, frame_emb = _apply(params, batch, None, train=False)
        return _decode(saves, batch, frame_emb)

    return train_step, eval_step
