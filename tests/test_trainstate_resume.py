"""Full-TrainState checkpointing: train 2N straight == train N + resume + N.

The reference checkpoint contract is weights-only
(/root/reference/fact_clip/utils/train_tools.py:15-52, train.py:209-214);
this build additionally sidecars the optimizer moments + step
(engine/checkpoint.py), so Adam/momentum resume bit-continuously.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fact_clip_tpu.engine import checkpoint as ckpt_io
from fact_clip_tpu.engine.state import create_train_state
from fact_clip_tpu.engine.steps import make_step_fns
from fact_clip_tpu.models.blocks import build_fact

from test_model import make_batch, small_cfg


def _setup(optimizer="Adam", flat=None, clip=None):
    cfg = small_cfg("iu")
    if flat is not None:
        cfg.TPU.flat_opt_state = flat
    if clip is not None:
        cfg.clip_grad_norm = clip
    cfg.optimizer = optimizer
    cfg.lr = 0.01
    cfg.momentum = 0.9
    cfg.Bi.dropout = 0.2  # dropout on: rng-per-step must also line up
    batch = make_batch(np.random.default_rng(0))
    C, D = 5, 12
    model = build_fact(cfg, D, C, s_pred_cap=24)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1), "aug": jax.random.PRNGKey(2)},
        batch["feats"], batch["mask"], batch["lengths"], train=False,
    )["params"]
    state = create_train_state(model, params, cfg, steps_per_epoch=10)
    train_step, _ = make_step_fns(model, cfg, C, np.ones((C + 1,), np.float32))
    return cfg, state, train_step, batch


def _run(state, train_step, batch, steps, start=0):
    # train_step donates its state argument; copy so callers can reuse theirs
    state = jax.tree_util.tree_map(jnp.copy, state)
    base = jax.random.PRNGKey(123)
    losses = []
    for i in range(start, start + steps):
        state, out = train_step(state, batch, jax.random.fold_in(base, i))
        losses.append(float(out["loss"]))
    return state, losses


def _trees_equal(a, b):
    fa = jax.tree_util.tree_leaves(a)
    fb = jax.tree_util.tree_leaves(b)
    return all(np.array_equal(np.asarray(x), np.asarray(y)) for x, y in zip(fa, fb))


@pytest.mark.slow
def test_resume_equivalence_adam(tmp_path):
    cfg, state0, train_step, batch = _setup("Adam")

    # straight 2N
    state_straight, losses_straight = _run(state0, train_step, batch, 6)

    # N + save + restore + N
    state_half, losses_a = _run(state0, train_step, batch, 3)
    ckptdir = str(tmp_path)
    ckpt_io.save_model(state_half.params, ckptdir, 3)
    ckpt_io.save_train_state(state_half, ckptdir, 3)

    # restore into a fresh-structure template, as run_train does
    restored = ckpt_io.load_train_state(state0, os.path.join(ckptdir, "network.iter-3.net"))
    assert restored is not None
    assert int(restored.step) == int(state_half.step)
    assert _trees_equal(restored.params, state_half.params)
    assert _trees_equal(restored.opt_state, state_half.opt_state)

    state_resumed, losses_b = _run(restored, train_step, batch, 3, start=3)

    np.testing.assert_allclose(losses_a + losses_b, losses_straight, rtol=1e-6)
    assert _trees_equal(state_resumed.params, state_straight.params)


def _trees_close(a, b, rtol=1e-5, atol=1e-5):
    fa = jax.tree_util.tree_leaves(a)
    fb = jax.tree_util.tree_leaves(b)
    assert len(fa) == len(fb)
    for x, y in zip(fa, fb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=rtol, atol=atol)


def _synthetic_grads(params, k):
    """Deterministic params-shaped cotangents (no RNG: both layouts see the
    same params bit-for-bit, so these grads are bit-identical too)."""
    return jax.tree_util.tree_map(lambda p: jnp.cos(p * (k + 3.0)) * 1e-2, params)


@pytest.mark.slow
def test_flat_layout_optimizer_math_bitexact():
    """TPU.flat_opt_state changes the optimizer-state layout, not the math:
    fed identical gradients, the flat and tree layouts produce bit-identical
    parameters, because Adam/SGD are elementwise and raveling is lossless.
    (Global-norm clipping stays off here — the flat layout reduces the norm
    over one vector while the tree layout sums ~400 per-leaf reductions, a
    different summation order; that path is covered at tolerance below.)"""
    _, state_f, _, _ = _setup("Adam", flat=True, clip=0.0)
    _, state_t, _, _ = _setup("Adam", flat=False, clip=0.0)
    assert hasattr(state_f, "flat") and not hasattr(state_t, "flat")
    for k in range(3):
        grads = _synthetic_grads(state_t.params, k)
        state_f = state_f.apply_gradients(grads=grads)
        state_t = state_t.apply_gradients(grads=grads)
        assert _trees_equal(state_f.params, state_t.params), f"step {k}"
    assert int(state_f.step) == int(state_t.step) == 3


@pytest.mark.slow
def test_flat_layout_optimizer_math_with_clip():
    """With global-norm clipping on, the two layouts reduce the norm in a
    different order, so equality is to rounding tolerance rather than
    bitwise."""
    _, state_f, _, _ = _setup("Adam", flat=True, clip=1.0)
    _, state_t, _, _ = _setup("Adam", flat=False, clip=1.0)
    for k in range(3):
        grads = _synthetic_grads(state_t.params, k)
        state_f = state_f.apply_gradients(grads=grads)
        state_t = state_t.apply_gradients(grads=grads)
    _trees_close(state_f.params, state_t.params, rtol=1e-6, atol=1e-8)


@pytest.mark.slow
def test_flat_and_tree_layouts_train_same_losses():
    """End-to-end: the two layouts compile into different XLA programs, so
    training is only reproducible to rounding — and this model family is
    chaotic at the ulp level (the auction matching is discrete; measured on
    this fixture: step 1 bit-exact, step 2 params within 1.5e-8, step 3
    params 5e-4 apart after a near-tie assignment flips).  The meaningful
    end-to-end contract is therefore loss-trajectory agreement, with the
    exact optimizer math pinned bitwise by the synthetic-gradient tests
    above."""
    _, state_f, step_f, batch = _setup("Adam", flat=True, clip=0.0)
    _, state_t, step_t, _ = _setup("Adam", flat=False, clip=0.0)
    state_f, losses_f = _run(state_f, step_f, batch, 3)
    state_t, losses_t = _run(state_t, step_t, batch, 3)
    np.testing.assert_allclose(losses_f, losses_t, rtol=1e-5)


@pytest.mark.slow
def test_sidecar_interop_between_layouts(tmp_path):
    """A sidecar written under one state layout restores into the other
    bit-exactly (sidecars are always tree-layout on disk)."""
    _, state_f0, step_f, batch = _setup("Adam", flat=True, clip=0.0)
    _, state_t0, step_t, _ = _setup("Adam", flat=False, clip=0.0)

    # flat -> disk -> tree
    state_f, _ = _run(state_f0, step_f, batch, 2)
    ckpt_io.save_model(state_f.params, str(tmp_path), 2)
    ckpt_io.save_train_state(state_f, str(tmp_path), 2)
    ckpt = os.path.join(str(tmp_path), "network.iter-2.net")
    restored_t = ckpt_io.load_train_state(state_t0, ckpt)
    assert restored_t is not None and not hasattr(restored_t, "flat")
    assert _trees_equal(restored_t.params, state_f.params)

    # tree -> disk -> flat
    state_t, _ = _run(state_t0, step_t, batch, 2)
    ckpt_io.save_model(state_t.params, str(tmp_path), 3)
    ckpt_io.save_train_state(state_t, str(tmp_path), 3)
    ckpt3 = os.path.join(str(tmp_path), "network.iter-3.net")
    restored_f = ckpt_io.load_train_state(state_f0, ckpt3)
    assert restored_f is not None and hasattr(restored_f, "flat")
    assert _trees_equal(restored_f.params, state_t.params)

    # the SAME sidecar restored into both layouts continues with the same
    # loss (params are compared only through the loss: one step under two
    # different XLA programs is reproducible to rounding, not bitwise — see
    # test_flat_and_tree_layouts_train_same_losses)
    restored_f2 = ckpt_io.load_train_state(state_f0, ckpt)
    assert _trees_equal(restored_f2.params, restored_t.params)
    cont_t, losses_t = _run(restored_t, step_t, batch, 1, start=2)
    cont_f, losses_f = _run(restored_f2, step_f, batch, 1, start=2)
    np.testing.assert_allclose(losses_t, losses_f, rtol=1e-5)
    _trees_close(cont_t.params, cont_f.params, rtol=1e-3, atol=1e-5)


@pytest.mark.slow
def test_weights_only_resume_differs_for_adam(tmp_path):
    """Sanity: restarting Adam moments (the reference contract) is NOT
    equivalent — proving the sidecar carries real information."""
    cfg, state0, train_step, batch = _setup("Adam")
    state_straight, _ = _run(state0, train_step, batch, 6)

    state_half, _ = _run(state0, train_step, batch, 3)
    if hasattr(state0, "flat"):  # FlatTrainState: params live in .flat
        weights_only = state0.replace(flat=state_half.flat)  # moments reset
    else:
        weights_only = state0.replace(params=state_half.params)  # moments reset
    state_resumed, _ = _run(weights_only, train_step, batch, 3, start=3)
    assert not _trees_equal(state_resumed.params, state_straight.params)


def test_sidecar_absent_falls_back(tmp_path):
    cfg, state0, train_step, batch = _setup("SGD")
    ckptdir = str(tmp_path)
    ckpt_io.save_model(state0.params, ckptdir, 5)
    assert ckpt_io.load_train_state(state0, os.path.join(ckptdir, "network.iter-5.net")) is None


def test_state_path_for_orbax_dir():
    p = ckpt_io._state_path("/x/ckpts/network.iter-12.orbax")
    assert p == "/x/ckpts/state.iter-12.state"
    p = ckpt_io._state_path("/x/ckpts/network.iter-12.net")
    assert p == "/x/ckpts/state.iter-12.state"


def _to_old_layout(tree):
    """Rewrite a current state_dict into the pre-2026-08-17 layout (nested
    X2YMap TorchDense_0 out map; BiGRU gates folded into a cell node) — the
    inverse of engine/checkpoint._migrate_param_layouts."""
    if not isinstance(tree, dict):
        return tree
    out = {}
    for k, v in tree.items():
        out[k] = _to_old_layout(v)
    if "xk_kernel" in out and "out_kernel" in out:
        out["TorchDense_0"] = {"Dense_0": {
            "kernel": out.pop("out_kernel"), "bias": out.pop("out_bias")}}
    for k in [k for k in out if k.endswith("_w_ih")]:
        name = k[: -len("_w_ih")]  # BiGRU: fold back into the old cell
        out[name] = {"cell": {
            "w_ih": out.pop(k), "b_ih": out.pop(f"{name}_b_ih"),
            "w_hh": out[name]["w_hh"], "b_hh": out[name]["b_hh"]}}
    return out


def test_old_x2y_checkpoint_layout_migrates(tmp_path):
    """Pre-split checkpoints (X2YMap out map as a nested TorchDense_0) load
    through the migration shim in engine/checkpoint.py."""
    from flax import serialization

    from fact_clip_tpu.models.blocks import build_fact
    from test_model import make_batch, small_cfg

    rng = np.random.default_rng(0)
    batch = make_batch(rng)
    cfg = small_cfg("iuU")  # U block: includes the seg_update BiGRU
    model = build_fact(cfg, 12, 5, s_pred_cap=24)
    params = model.init({"params": jax.random.PRNGKey(0)},
                        batch["feats"], batch["mask"], batch["lengths"], train=False)

    old_sd = _to_old_layout(serialization.to_state_dict(params))
    fname = str(tmp_path / "old.net")
    with open(fname, "wb") as f:
        f.write(serialization.msgpack_serialize(old_sd))

    restored = ckpt_io.load_params(params, fname)
    for a, b in zip(jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_old_trainstate_sidecar_migrates(tmp_path):
    """A pre-migration TrainState sidecar (old param layouts in params AND in
    the param-shaped Adam moments) restores through load_train_state instead
    of raising — the auto-resume contract survives layout changes."""
    from flax import serialization

    cfg, state0, train_step, batch = _setup("Adam")
    state_half, _ = _run(state0, train_step, batch, 2)

    # sidecars are always written in the tree layout (engine/checkpoint.py),
    # so the old-layout fixture starts from the tree representation
    payload = (ckpt_io._flat_state_to_tree_repr(state_half)
               if hasattr(state_half, "flat") else state_half)
    sd = serialization.to_state_dict(payload)
    old_sd = _to_old_layout(sd)
    assert old_sd != sd, "fixture should actually produce an old layout"
    ckptdir = str(tmp_path)
    ckpt_io.save_model(state_half.params, ckptdir, 2)
    with open(ckpt_io._state_path(os.path.join(ckptdir, "network.iter-2.net")), "wb") as f:
        f.write(serialization.msgpack_serialize(old_sd))

    restored = ckpt_io.load_train_state(state0, os.path.join(ckptdir, "network.iter-2.net"))
    assert restored is not None
    assert int(restored.step) == int(state_half.step)
    assert _trees_equal(restored.params, state_half.params)
    assert _trees_equal(restored.opt_state, state_half.opt_state)
