#!/usr/bin/python3
"""A/B the fused SCA multi-head attention kernel (TPU.pallas_attn) on the
HAViD-scale bench workload, inference and training, in one process.

Usage: python scripts/bench_sca_attn.py [B] [T]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

import bench
from bench import D, C, NTOKEN, T_VIDEO, log

if len(sys.argv) > 1:  # optional batch-size override
    bench.BATCH = int(sys.argv[1])
BATCH = bench.BATCH
_bench_batch = bench._bench_batch


def measure(pallas_attn: bool, train: bool):
    import jax
    import jax.numpy as jnp

    from fact_clip_tpu.models import decode
    from fact_clip_tpu.models.blocks import build_fact
    from __graft_entry__ import _make_cfg

    cfg = _make_cfg(small=False)
    cfg.FACT.ntoken = NTOKEN
    cfg.TPU.pallas = True
    cfg.TPU.pallas_attn = pallas_attn
    rng = np.random.default_rng(0)

    if train:
        from fact_clip_tpu.engine.state import create_train_state
        from fact_clip_tpu.engine.steps import make_step_fns

        cfg.Bi.dropout = 0.2
        cfg.TPU.matcher = "auction"
        model = build_fact(cfg, D, C, s_pred_cap=128)
        b = _bench_batch(rng, with_labels=True)
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
                st, out = step_fn(carry, batch, jax.random.fold_in(jax.random.PRNGKey(7), i))
                return st, out["loss"]
            state, losses_ = jax.lax.scan(body, state, jnp.arange(n))
            return state, losses_.sum()

        def run(n):
            _, s = chained(state, batch, n)
            np.asarray(s)
    else:
        model = build_fact(cfg, D, C, s_pred_cap=128)
        feats, mask, lengths = _bench_batch(rng)
        params = jax.jit(
            lambda k: model.init({"params": k}, feats, mask, lengths, train=False)
        )(jax.random.PRNGKey(0))
        mwt = float(cfg.FACT.mwt)
        f = jax.device_put(feats)
        m = jax.device_put(mask)
        le = jax.device_put(lengths)

        @functools.partial(jax.jit, static_argnames="n")
        def chained(params, feats, n):
            def body(carry, _):
                fx = carry
                saves, _ = model.apply(params, fx, m, le, train=False)
                last = saves[-1]
                token_mask = jnp.ones(last["action_clogit"].shape[:2], bool)
                pred = decode.decode_two_branch(
                    last["action_clogit"], last["a2f_attn"], last["frame_clogit"], mwt, token_mask
                )
                fx = fx + pred.sum().astype(fx.dtype) * 1e-20
                return fx, pred.sum()
            _, sums = jax.lax.scan(body, feats, None, length=n)
            return sums.sum()

        def run(n):
            np.asarray(chained(params, f, n))

    n1, n2 = (2, 8) if train else (4, 20)

    def best_time(n, reps=3):
        run(n)  # compile + warm
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            run(n)
            best = min(best, time.perf_counter() - t0)
        return best

    step_s = (best_time(n2) - best_time(n1)) / (n2 - n1)
    return step_s * 1000


def main():
    import jax
    assert jax.default_backend() == "tpu", jax.default_backend()
    for train in (False, True):
        kind = "train" if train else "infer"
        for pa in (False, True):
            ms = measure(pa, train)
            log(f"{kind} pallas_attn={pa}: {ms:.2f} ms/step "
                f"({BATCH} x {T_VIDEO} frames, {BATCH*T_VIDEO/ms*1000/1e6:.2f} Mf/s)")


if __name__ == "__main__":
    main()
