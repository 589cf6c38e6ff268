#!/usr/bin/python3
"""Profile the full train step on the TPU and attribute device time by op
group (forward Pallas kernels vs XLA backward convs vs matcher vs optimizer).

Usage: python scripts/profile_train_step.py [B] [outdir] [dtype]
Writes a jax.profiler trace and prints the per-video ms by op group.
dtype: float32 (default) or bfloat16.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

import bench
from bench import D, C, NTOKEN, T_VIDEO, log

B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
OUT = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/train_trace_b{B}"
DTYPE = sys.argv[3] if len(sys.argv) > 3 else "float32"
bench.BATCH = B
STEPS = 8


def main():
    import jax
    import jax.numpy as jnp

    from fact_clip_tpu.engine.state import create_train_state
    from fact_clip_tpu.engine.steps import make_step_fns
    from fact_clip_tpu.models.blocks import build_fact
    from __graft_entry__ import _make_cfg

    assert jax.default_backend() == "tpu"
    cfg = _make_cfg(small=False)
    cfg.FACT.ntoken = NTOKEN
    cfg.TPU.pallas = True
    cfg.Bi.dropout = 0.2
    cfg.TPU.matcher = "auction"
    cfg.TPU.compute_dtype = DTYPE
    model = build_fact(cfg, D, C, s_pred_cap=128)

    rng = np.random.default_rng(0)
    b = bench._bench_batch(rng, with_labels=True)
    if DTYPE == "bfloat16":
        # match bench.py / engine.train_loop: features feed at the compute dtype
        b["feats"] = b["feats"].astype(jnp.bfloat16)
    batch = {k: jax.device_put(jnp.asarray(v)) for k, v in b.items()}
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

    _, s = chained(state, batch, STEPS)
    np.asarray(s)  # compile + warm
    log("compiled; tracing ...")
    with jax.profiler.trace(OUT):
        _, s = chained(state, batch, STEPS)
        np.asarray(s)
    log(f"trace written to {OUT}")

    from analyze_trace_diff import load
    per_video, groups = load(OUT, B, STEPS)
    total = sum(groups.values())
    print(f"B={B}: device total {total:.3f} ms/video ({total*B:.1f} ms/step)")
    for name, v in groups.most_common(25):
        print(f"  {v:8.4f} ms/video  {name}")


if __name__ == "__main__":
    main()
