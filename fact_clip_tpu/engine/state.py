"""Train state and optimizer construction.

Optimizer semantics follow the reference (/root/reference/scripts/train.py:219-224,
321-324): SGD(momentum, weight_decay) or Adam with torch-style L2 (decay added
to the gradient), global-norm gradient clipping, and the reference's LR decay
rule — from epoch ``lr_decay`` onward the LR is 0.1x the base (the reference
re-assigns ``cfg.lr * 0.1`` on every multiple, so the decay is a single step,
not cumulative).
"""

from __future__ import annotations

import jax
import optax
from flax.training import train_state


class TrainState(train_state.TrainState):
    pass


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


def create_train_state(model, params, cfg, steps_per_epoch: int) -> TrainState:
    tx = build_optimizer(cfg, steps_per_epoch)
    return TrainState.create(apply_fn=model.apply, params=params, tx=tx)


def param_count(params) -> int:
    return sum(p.size for p in jax.tree_util.tree_leaves(params))
