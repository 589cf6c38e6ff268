"""Train state and optimizer construction.

Optimizer semantics follow the reference (/root/reference/scripts/train.py:219-224,
321-324): SGD(momentum, weight_decay) or Adam with torch-style L2 (decay added
to the gradient), global-norm gradient clipping, and the reference's LR decay
rule — from epoch ``lr_decay`` onward the LR is 0.1x the base (the reference
re-assigns ``cfg.lr * 0.1`` on every multiple, so the decay is a single step,
not cumulative).
"""

from __future__ import annotations

import functools
from typing import Any, Callable

import jax
import optax
from flax import struct
from flax.training import train_state
from jax.flatten_util import ravel_pytree


class TrainState(train_state.TrainState):
    pass


@functools.lru_cache(maxsize=8)
def _jit_unravel(unravel: Callable) -> Callable:
    """One jit wrapper per unravel closure, so repeated ``.params`` reads
    reuse the compiled program instead of recompiling (or dispatching
    per-leaf eagerly)."""
    return jax.jit(unravel)


class FlatTrainState(struct.PyTreeNode):
    """TrainState with the master params and optimizer moments stored as
    single flat f32 vectors.

    The model's ~400 parameter leaves otherwise appear in the train step as
    ~400 per-leaf optimizer fusions, ~300 per-leaf global-norm reduces and
    ~2,400 per-iteration carry copies when steps are chained inside one
    ``lax.scan`` (profiled at ~2 ms/step on v5e, see BASELINE.md) — and as
    one small grad collective per leaf on a device mesh.  Flat layout:
    one concatenate, one big fused optimizer update, three carried buffers.

    ``params`` is a property that unravels the flat vector into the model's
    tree; under jit the per-leaf slices fuse with the mixed-precision casts
    that the forward pass performs anyway.  The public surface
    (``.params`` / ``apply_gradients`` / ``step``) matches
    ``flax.training.train_state.TrainState``, and checkpoint sidecars are
    written in the tree layout (engine/checkpoint.py) so the two layouts'
    checkpoints stay interchangeable.
    """

    step: Any
    flat: jax.Array
    opt_state: optax.OptState
    apply_fn: Callable = struct.field(pytree_node=False)
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    unravel: Callable = struct.field(pytree_node=False)

    @property
    def params(self):
        # Jitted: eagerly, unravel issues one slice+reshape dispatch per leaf
        # (~400), and each eager dispatch costs ~25 ms through the axon TPU
        # relay — tens of seconds per eval/checkpoint boundary.  One compiled
        # call amortizes to a single dispatch; under an enclosing jit the
        # inner jit is inlined, so the train step is unaffected.
        return _jit_unravel(self.unravel)(self.flat)

    def apply_gradients(self, *, grads, **kwargs):
        g_flat, _ = ravel_pytree(grads)
        updates, new_opt = self.tx.update(g_flat, self.opt_state, self.flat)
        return self.replace(
            step=self.step + 1,
            flat=optax.apply_updates(self.flat, updates),
            opt_state=new_opt,
            **kwargs,
        )

    @classmethod
    def create(cls, *, apply_fn, params, tx, **kwargs):
        flat, unravel = ravel_pytree(params)
        return cls(step=0, flat=flat, opt_state=tx.init(flat),
                   apply_fn=apply_fn, tx=tx, unravel=unravel, **kwargs)


def lr_schedule(base_lr: float, lr_decay_epochs: int, steps_per_epoch: int):
    def fn(step):
        if lr_decay_epochs <= 0:
            return base_lr
        epoch = step // max(steps_per_epoch, 1)
        import jax.numpy as jnp

        return jnp.where(epoch >= lr_decay_epochs, base_lr * 0.1, base_lr)

    return fn


def build_optimizer(cfg, steps_per_epoch: int) -> optax.GradientTransformation:
    sched = lr_schedule(cfg.lr, cfg.lr_decay, steps_per_epoch)
    parts = []
    if cfg.clip_grad_norm and cfg.clip_grad_norm > 0:
        parts.append(optax.clip_by_global_norm(cfg.clip_grad_norm))
    if cfg.weight_decay and cfg.weight_decay > 0:
        parts.append(optax.add_decayed_weights(cfg.weight_decay))

    if cfg.optimizer == "SGD":
        if cfg.momentum and cfg.momentum > 0:
            parts.append(optax.trace(decay=cfg.momentum))
        parts.append(optax.scale_by_learning_rate(sched))
    elif cfg.optimizer == "Adam":
        parts.append(optax.scale_by_adam())
        parts.append(optax.scale_by_learning_rate(sched))
    else:
        raise ValueError(f"Unknown optimizer {cfg.optimizer!r}")

    return optax.chain(*parts)


def create_train_state(model, params, cfg, steps_per_epoch: int):
    tx = build_optimizer(cfg, steps_per_epoch)
    want_flat = bool(getattr(cfg.TPU, "flat_opt_state", True)) if "TPU" in cfg else True
    dtypes = {p.dtype for p in jax.tree_util.tree_leaves(params)}
    if want_flat and len(dtypes) == 1:
        return FlatTrainState.create(apply_fn=model.apply, params=params, tx=tx)
    # mixed-dtype param trees can't ravel losslessly; keep the tree layout
    return TrainState.create(apply_fn=model.apply, params=params, tx=tx)


def param_count(params) -> int:
    return sum(p.size for p in jax.tree_util.tree_leaves(params))
