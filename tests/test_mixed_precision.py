"""Mixed precision (cfg.TPU.compute_dtype = "bfloat16").

The policy (models/layers.py): heavy matmuls/convs and the TCN stream run in
bfloat16 with f32 accumulation; softmax, LayerNorm statistics, attention
probs/logits, and every logit-producing output dense stay f32.  These tests
pin (a) bf16 numerics against the f32 forward within a tolerance, (b) that
saves/losses remain f32, (c) that gradients are finite and close, and
(d) that the default config is bit-identical to round-1 f32 behavior.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fact_clip_tpu.models import losses, matching
from fact_clip_tpu.models.blocks import build_fact, resolve_block_cfgs

from test_model import make_batch, small_cfg


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def _init_and_saves(cfg, batch, train=False, C=5, D=12):
    model = build_fact(cfg, D, C, s_pred_cap=24)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1), "aug": jax.random.PRNGKey(2)},
        batch["feats"], batch["mask"], batch["lengths"], train=False,
    )
    saves, tail = model.apply(
        params, batch["feats"], batch["mask"], batch["lengths"], train=train,
        rngs={"dropout": jax.random.PRNGKey(1), "aug": jax.random.PRNGKey(2)} if train else None,
    )
    return params, saves, tail


def test_dtype_threads_through_block_cfgs():
    cfg = small_cfg("iuU")
    assert all(c.dtype == "" for c in resolve_block_cfgs(cfg))
    cfg.TPU.compute_dtype = "bfloat16"
    assert all(c.dtype == "bfloat16" for c in resolve_block_cfgs(cfg))


@pytest.mark.slow
def test_bf16_forward_close_to_f32(rng):
    batch = make_batch(rng)
    cfg = small_cfg("iuU")
    _, saves32, _ = _init_and_saves(cfg, batch)
    cfg16 = small_cfg("iuU")
    cfg16.TPU.compute_dtype = "bfloat16"
    _, saves16, _ = _init_and_saves(cfg16, batch)

    for s32, s16 in zip(saves32, saves16):
        for key in ("frame_clogit", "action_clogit"):
            a, b = np.asarray(s32[key]), np.asarray(s16[key])
            assert b.dtype == np.float32, f"{key} must stay f32"
            assert np.isfinite(b).all()
            scale = np.abs(a).max()
            assert np.abs(a - b).max() < 0.05 * scale, (
                f"{key} ({s32['kind']}): bf16 deviates "
                f"{np.abs(a - b).max():.4f} vs scale {scale:.4f}"
            )


def test_bf16_saves_probs_are_f32_and_normalized(rng):
    batch = make_batch(rng)
    cfg = small_cfg("iuU")
    cfg.TPU.compute_dtype = "bfloat16"
    _, saves, _ = _init_and_saves(cfg, batch)
    mask = np.asarray(batch["mask"])  # padded frames carry zero rows in the
    # TDU-upsampled maps (gather-as-matmul), so only valid frames normalize
    for s in saves:
        if "a2f_attn" in s:
            p = np.asarray(s["a2f_attn"])
            assert p.dtype == np.float32
            np.testing.assert_allclose(p.sum(-1)[mask], 1.0, atol=1e-3)


@pytest.mark.slow
def test_bf16_loss_and_grads_close(rng):
    batch = make_batch(rng)
    C = 5

    def loss_for(cfg):
        model = build_fact(cfg, 12, C, s_pred_cap=24)
        params = model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1), "aug": jax.random.PRNGKey(2)},
            batch["feats"], batch["mask"], batch["lengths"], train=False,
        )

        def f(p):
            saves, _ = model.apply(p, batch["feats"], batch["mask"], batch["lengths"], train=False)
            cprob = jax.nn.softmax(saves[-1]["action_clogit"], axis=-1)
            seg2tok = matching.match(
                cfg.Loss, cprob, saves[-1]["a2f_attn"], batch["transcript"], batch["seg_label"],
                batch["seg_mask"], batch["mask"], matcher="host", nclasses=C,
            )
            per_video = losses.fact_loss(
                saves, batch, seg2tok, jnp.ones((C + 1,)), cfg.Loss.sw, token_mask=None
            )
            return per_video.mean()

        loss, grads = jax.value_and_grad(f)(params)
        return float(loss), grads

    cfg32 = small_cfg("iuU")
    cfg16 = small_cfg("iuU")
    cfg16.TPU.compute_dtype = "bfloat16"
    l32, g32 = loss_for(cfg32)
    l16, g16 = loss_for(cfg16)
    assert np.isfinite(l16)
    assert abs(l16 - l32) / abs(l32) < 0.03, (l16, l32)

    flat32 = jax.tree_util.tree_leaves(g32)
    flat16 = jax.tree_util.tree_leaves(g16)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat16)
    # global grad direction agreement (cosine over the concatenation)
    v32 = np.concatenate([np.asarray(g).ravel() for g in flat32])
    v16 = np.concatenate([np.asarray(g).ravel() for g in flat16])
    cos = float(v32 @ v16 / (np.linalg.norm(v32) * np.linalg.norm(v16) + 1e-12))
    assert cos > 0.99, cos


def test_default_config_unchanged_f32(rng):
    """compute_dtype left at default must produce exactly the f32 graph."""
    batch = make_batch(rng)
    cfg = small_cfg("iu")
    _, saves_a, _ = _init_and_saves(cfg, batch)
    cfg2 = small_cfg("iu")
    cfg2.TPU.compute_dtype = "float32"
    _, saves_b, _ = _init_and_saves(cfg2, batch)
    for sa, sb in zip(saves_a, saves_b):
        np.testing.assert_array_equal(np.asarray(sa["frame_clogit"]), np.asarray(sb["frame_clogit"]))
