#!/usr/bin/python3
"""Dump the optimized HLO of the bench train-step program (compile-cache
hit on the relay) so trace op names (fusion.N, multiply_add_fusion.N,
reshape.N) can be attributed to source-level operations."""

import functools
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

import bench
from bench import D, C, NTOKEN, log

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/train_step_hlo.txt"


def main():
    import jax
    import jax.numpy as jnp

    from fact_clip_tpu.engine.state import create_train_state
    from fact_clip_tpu.engine.steps import make_step_fns
    from fact_clip_tpu.models.blocks import build_fact
    from __graft_entry__ import _make_cfg

    cfg = _make_cfg(small=False)
    cfg.FACT.ntoken = NTOKEN
    cfg.TPU.pallas = True
    cfg.Bi.dropout = 0.2
    cfg.TPU.matcher = "auction"
    cfg.TPU.compute_dtype = "bfloat16"
    model = build_fact(cfg, D, C, s_pred_cap=128)

    rng = np.random.default_rng(0)
    b = bench._bench_batch(rng, with_labels=True)
    b["feats"] = b["feats"].astype(jnp.bfloat16)
    batch = {k: jnp.asarray(v) for k, v in b.items()}
    params = jax.jit(
        lambda k: model.init(
            {"params": k, "dropout": k, "aug": k},
            batch["feats"], batch["mask"], batch["lengths"], train=False,
        )
    )(jax.random.PRNGKey(0))["params"]
    state = create_train_state(model, params, cfg, steps_per_epoch=100)
    train_step, _ = make_step_fns(model, cfg, C, np.ones((C + 1,), np.float32))
    step_fn = train_step.unjitted

    @functools.partial(jax.jit, static_argnames="n")
    def chained(state, batch, n):
        def body(carry, i):
            st, out = step_fn(carry, batch, jax.random.fold_in(jax.random.key(7, impl="rbg"), i))
            return st, out["loss"]
        state, losses_ = jax.lax.scan(body, state, jnp.arange(n))
        return state, losses_.sum()

    log("lowering + compiling (expect a cache hit) ...")
    compiled = chained.lower(state, batch, n=8).compile()
    txt = compiled.as_text()
    with open(OUT, "w") as f:
        f.write(txt)
    log(f"wrote {len(txt) / 1e6:.1f} MB of HLO to {OUT}")


if __name__ == "__main__":
    main()
