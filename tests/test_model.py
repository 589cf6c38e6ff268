import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fact_clip_tpu.configs.default import get_cfg_defaults
from fact_clip_tpu.models import decode, losses, matching
from fact_clip_tpu.models.blocks import build_fact, resolve_block_cfgs
from fact_clip_tpu.utils.segments import class_label_to_segment_data


def small_cfg(block="iuU", ntoken=8, trans=False):
    cfg = get_cfg_defaults()
    cfg.FACT.block = block
    cfg.FACT.ntoken = ntoken
    cfg.FACT.trans = trans
    cfg.FACT.fpos = False
    cfg.FACT.cmr = 0.3
    cfg.Bi.hid_dim = 32
    cfg.Bi.a_dim = 16
    cfg.Bi.a_ffdim = 32
    cfg.Bi.a_layers = 2
    cfg.Bi.a_nhead = 4
    cfg.Bi.f = "m"
    cfg.Bi.f_dim = 24
    cfg.Bi.f_layers = 3
    cfg.Bi.f_ln = False
    cfg.Bi.f_ngp = 1
    cfg.Bi.dropout = 0.0
    cfg.Bu.f_layers = 2
    cfg.BU.f_layers = 2
    cfg.Loss.nullw = 0.1
    cfg.Loss.sw = 1.0
    return cfg


def make_batch(rng, B=2, T=48, D=12, C=5, S=8, lengths=(48, 33)):
    feats = rng.normal(size=(B, T, D)).astype(np.float32)
    mask = np.zeros((B, T), bool)
    labels = np.zeros((B, T), np.int32)
    seg_label = np.zeros((B, T), np.int32)
    transcript = np.zeros((B, S), np.int32)
    seg_mask = np.zeros((B, S), bool)
    for b in range(B):
        t = lengths[b]
        mask[b, :t] = True
        feats[b, t:] = 0.0
        # piecewise-constant labels with 3-5 segments
        n_seg = rng.integers(3, 6)
        cuts = np.sort(rng.choice(np.arange(1, t), n_seg - 1, replace=False))
        bounds = np.concatenate([[0], cuts, [t]])
        prev = -1
        for k in range(n_seg):
            c = int(rng.integers(0, C))
            while c == prev:
                c = int(rng.integers(0, C))
            labels[b, bounds[k] : bounds[k + 1]] = c
            prev = c
        tr, sl = class_label_to_segment_data(labels[b, :t])
        seg_label[b, :t] = sl
        seg_label[b, t:] = sl[-1]
        labels[b, t:] = labels[b, t - 1]
        transcript[b, : len(tr)] = tr
        seg_mask[b, : len(tr)] = True
    return dict(
        feats=jnp.array(feats), mask=jnp.array(mask), labels=jnp.array(labels),
        seg_label=jnp.array(seg_label), transcript=jnp.array(transcript),
        seg_mask=jnp.array(seg_mask), lengths=jnp.array([lengths[b] for b in range(B)], jnp.int32),
    )


def _forward(cfg, batch, C=5, D=12, s_pred_cap=24, train=False, seed=0):
    model = build_fact(cfg, D, C, s_pred_cap)
    params = model.init(
        {"params": jax.random.PRNGKey(seed), "dropout": jax.random.PRNGKey(1), "aug": jax.random.PRNGKey(2)},
        batch["feats"], batch["mask"], batch["lengths"],
        batch["transcript"] if cfg.FACT.trans else None,
        batch["seg_mask"] if cfg.FACT.trans else None,
        train=False,
    )
    saves, _ = model.apply(
        params, batch["feats"], batch["mask"], batch["lengths"],
        batch["transcript"] if cfg.FACT.trans else None,
        batch["seg_mask"] if cfg.FACT.trans else None,
        train=train,
        rngs={"dropout": jax.random.PRNGKey(3), "aug": jax.random.PRNGKey(4)} if train else None,
    )
    return model, params, saves


def test_resolve_block_cfgs_inheritance():
    cfg = small_cfg("iuU")
    bcfgs = resolve_block_cfgs(cfg)
    assert [c.kind for c in bcfgs] == ["i", "u", "U"]
    assert bcfgs[1].hid_dim == 32  # inherited from Bi
    assert bcfgs[1].f_layers == 2  # Bu's own value
    assert bcfgs[2].a_dim == 16  # inherited through Bu


def test_forward_shapes(rng):
    cfg = small_cfg("iuU")
    batch = make_batch(rng)
    _, _, saves = _forward(cfg, batch)
    assert len(saves) == 3
    B, T = batch["mask"].shape
    C, M = 5, 8
    assert saves[0]["frame_clogit"].shape == (B, T, C)
    assert saves[0]["action_clogit"].shape == (B, M, C + 1)
    assert saves[1]["a2f_attn"].shape == (B, T, M)
    assert saves[1]["f2a_attn"].shape == (B, M, T)
    assert saves[2]["a2f_attn"].shape == (B, T, M)  # upsampled to frames
    assert saves[2]["tdu_P"].shape == (B, T, 24)
    # attention rows over valid keys sum to 1
    a2f = np.array(saves[1]["a2f_attn"])
    np.testing.assert_allclose(a2f.sum(-1), 1.0, atol=1e-4)


@pytest.mark.slow
def test_forward_padding_invariance(rng):
    """The entire stacked model must produce identical valid-frame outputs
    whether a video is padded or exact — including through the TDU block."""
    cfg = small_cfg("iuU")
    batch = make_batch(rng, B=2, T=48, lengths=(48, 33))
    model, params, saves = _forward(cfg, batch)

    # re-run video 1 alone at its exact length
    t = 33
    solo = {k: (v[1:2, :t] if v.ndim > 1 and v.shape[1] == 48 else v[1:2]) for k, v in batch.items()}
    solo["transcript"] = batch["transcript"][1:2]
    solo["seg_mask"] = batch["seg_mask"][1:2]
    saves_solo, _ = model.apply(
        params, solo["feats"], solo["mask"], solo["lengths"], None, None, train=False
    )
    for blk, (s_batch, s_solo) in enumerate(zip(saves, saves_solo)):
        np.testing.assert_allclose(
            np.array(s_batch["frame_clogit"])[1, :t], np.array(s_solo["frame_clogit"])[0],
            atol=2e-4, err_msg=f"block {blk} frame_clogit",
        )
        np.testing.assert_allclose(
            np.array(s_batch["action_clogit"])[1], np.array(s_solo["action_clogit"])[0],
            atol=2e-4, err_msg=f"block {blk} action_clogit",
        )


@pytest.mark.slow
def test_loss_finite_and_padding_invariant(rng):
    cfg = small_cfg("iuU")
    batch = make_batch(rng, B=2, T=48, lengths=(48, 33))
    model, params, saves = _forward(cfg, batch)

    cweight = jnp.array(losses.build_class_weights(cfg, 5, [0]))
    cprob = jax.nn.softmax(saves[-1]["action_clogit"], -1)
    seg2tok = matching.match(
        cfg.Loss, cprob, saves[-1]["a2f_attn"], batch["transcript"], batch["seg_label"],
        batch["seg_mask"], batch["mask"],
    )
    per_video = losses.fact_loss(saves, batch, seg2tok, cweight, cfg.Loss.sw)
    assert per_video.shape == (2,)
    assert np.isfinite(np.array(per_video)).all()

    # per-video loss of video 1 must equal its unpadded solo loss
    t = 33
    solo_batch = {
        "feats": batch["feats"][1:2, :t], "mask": batch["mask"][1:2, :t],
        "labels": batch["labels"][1:2, :t], "seg_label": batch["seg_label"][1:2, :t],
        "transcript": batch["transcript"][1:2], "seg_mask": batch["seg_mask"][1:2],
        "lengths": batch["lengths"][1:2],
    }
    saves_solo, _ = model.apply(
        params, solo_batch["feats"], solo_batch["mask"], solo_batch["lengths"], None, None, train=False
    )
    cprob_s = jax.nn.softmax(saves_solo[-1]["action_clogit"], -1)
    seg2tok_s = matching.match(
        cfg.Loss, cprob_s, saves_solo[-1]["a2f_attn"], solo_batch["transcript"],
        solo_batch["seg_label"], solo_batch["seg_mask"], solo_batch["mask"],
    )
    solo_loss = losses.fact_loss(saves_solo, solo_batch, seg2tok_s, cweight, cfg.Loss.sw)
    np.testing.assert_allclose(np.array(per_video[1]), np.array(solo_loss[0]), atol=2e-3)


@pytest.mark.slow
def test_grad_flows(rng):
    cfg = small_cfg("iu")
    batch = make_batch(rng, T=32, lengths=(32, 20))
    model = build_fact(cfg, 12, 5, 24)
    params = model.init(
        {"params": jax.random.PRNGKey(0)}, batch["feats"], batch["mask"], batch["lengths"], train=False
    )
    cweight = jnp.array(losses.build_class_weights(cfg, 5, [0]))

    def loss_fn(p):
        saves, _ = model.apply(p, batch["feats"], batch["mask"], batch["lengths"], train=False)
        cprob = jax.nn.softmax(saves[-1]["action_clogit"], -1)
        seg2tok = matching.match(
            cfg.Loss, cprob, saves[-1]["a2f_attn"], batch["transcript"], batch["seg_label"],
            batch["seg_mask"], batch["mask"],
        )
        return losses.fact_loss(saves, batch, seg2tok, cweight, cfg.Loss.sw).mean()

    loss, grads = jax.jit(jax.value_and_grad(loss_fn))(params)
    assert np.isfinite(float(loss))
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.array(g)).all() for g in leaves)
    # at least the action query and conv kernels receive gradient
    gnorm = sum(float(jnp.abs(g).sum()) for g in leaves)
    assert gnorm > 0


def test_decode_shapes_and_fallback(rng):
    B, T, M, C = 2, 10, 4, 5
    frame_clogit = jnp.array(rng.normal(size=(B, T, C)), jnp.float32)
    a2f = jax.nn.softmax(jnp.array(rng.normal(size=(B, T, M)), jnp.float32), -1)
    # video 0: all tokens null -> fallback to frame branch
    aclog = np.full((B, M, C + 1), -5.0, np.float32)
    aclog[0, :, C] = 5.0
    aclog[1, :, C] = 5.0  # all null except token 0 ...
    aclog[1, 0, C] = -5.0
    aclog[1, 0, 2] = 5.0  # ... which predicts class 2
    pred = decode.decode_two_branch(jnp.array(aclog), a2f, frame_clogit, 0.1, jnp.ones((B, M), bool))
    assert pred.shape == (B, T)
    np.testing.assert_array_equal(np.array(pred[0]), np.argmax(np.array(frame_clogit[0]), -1))
    # video 1: only token 0 non-null, predicting class 2 with prob~1 -> blended
    # prob dominated by abranch (0.9 weight) -> class 2 everywhere
    assert (np.array(pred[1]) == 2).all()


def test_decode_with_transcript(rng):
    B, T, S, C = 1, 6, 3, 5
    transcript = jnp.array([[4, 1, 3]], jnp.int32)
    seg_mask = jnp.ones((B, S), bool)
    frame_clogit = jnp.zeros((B, T, C))
    attn = np.zeros((B, T, S), np.float32)
    attn[0, :2, 0] = 5
    attn[0, 2:4, 1] = 5
    attn[0, 4:, 2] = 5
    pred = decode.decode_with_transcript(transcript, seg_mask, jnp.array(attn), frame_clogit, 0.0)
    np.testing.assert_array_equal(np.array(pred[0]), [4, 4, 1, 1, 3, 3])


def test_transcript_mode_forward(rng):
    cfg = small_cfg("iu", trans=True)
    cfg.Bi.a = "gru_om"  # out_map variant since a_dim != hid_dim here
    cfg.FACT.ntoken = 0
    batch = make_batch(rng, T=32, lengths=(32, 20))
    model = build_fact(cfg, 12, 5, 24)
    params = model.init(
        {"params": jax.random.PRNGKey(0)},
        batch["feats"], batch["mask"], batch["lengths"], batch["transcript"], batch["seg_mask"], train=False,
    )
    saves, _ = model.apply(
        params, batch["feats"], batch["mask"], batch["lengths"], batch["transcript"], batch["seg_mask"], train=False
    )
    S = batch["transcript"].shape[1]
    assert saves[0]["action_clogit"].shape == (2, S, 6)
    pred = decode.decode_with_transcript(
        batch["transcript"], batch["seg_mask"], saves[-1]["a2f_attn"],
        saves[-1]["frame_clogit"], 0.0,
    )
    assert pred.shape == batch["labels"].shape


def test_train_mode_with_augmentation(rng):
    cfg = small_cfg("iuU")
    cfg.TM.use = True
    batch = make_batch(rng)
    _, _, saves = _forward(cfg, batch, train=True)
    assert np.isfinite(np.array(saves[-1]["frame_clogit"])).all()
