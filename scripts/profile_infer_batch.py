#!/usr/bin/python3
"""Trace the f32 inference step at two batch sizes and diff per-op cost.

Targets the B>=16 f32 residual (+~35% per-video at B=32 vs B=8 on the
flagship; bf16 is within ~8%): writes a jax.profiler trace per batch size
and prints the op groups whose per-video cost grows superlinearly.

Usage: python scripts/profile_infer_batch.py [B1] [B2]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

B1 = int(sys.argv[1]) if len(sys.argv) > 1 else 8
B2 = int(sys.argv[2]) if len(sys.argv) > 2 else 32
STEPS = 8


def trace_one(B, outdir):
    import jax
    import jax.numpy as jnp

    from fact_clip_tpu.models import decode
    from fact_clip_tpu.models.blocks import build_fact
    from __graft_entry__ import _make_cfg
    import bench

    cfg = _make_cfg(small=False)
    cfg.FACT.ntoken = bench.NTOKEN
    cfg.TPU.pallas = True
    model = build_fact(cfg, bench.D, bench.C, s_pred_cap=128)

    rng = np.random.default_rng(0)
    feats = np.zeros((B, bench.BUCKET, bench.D), np.float32)
    mask = np.zeros((B, bench.BUCKET), bool)
    feats[:, :bench.T_VIDEO] = rng.normal(size=(B, bench.T_VIDEO, bench.D)).astype(np.float32)
    mask[:, :bench.T_VIDEO] = True
    lengths = np.full((B,), bench.T_VIDEO, np.int32)

    params = jax.jit(lambda k: model.init({"params": k}, feats, mask, lengths, train=False))(
        jax.random.PRNGKey(0)
    )
    mwt = float(cfg.FACT.mwt)

    @functools.partial(jax.jit, static_argnames="n")
    def chained(params, f, m, l, n):
        def body(carry, _):
            x = carry
            saves, _ = model.apply(params, x, m, l, train=False)
            last = saves[-1]
            token_mask = jnp.ones(last["action_clogit"].shape[:2], bool)
            pred = decode.decode_two_branch(
                last["action_clogit"], last["a2f_attn"], last["frame_clogit"], mwt, token_mask
            )
            return x + pred.sum().astype(x.dtype) * 1e-20, pred.sum()

        _, sums = jax.lax.scan(body, f, None, length=n)
        return sums.sum()

    f = jax.device_put(feats)
    m = jax.device_put(mask)
    l = jax.device_put(lengths)
    np.asarray(chained(params, f, m, l, STEPS))  # compile + warm
    print(f"B={B}: compiled, tracing ...", file=sys.stderr, flush=True)
    with jax.profiler.trace(outdir):
        np.asarray(chained(params, f, m, l, STEPS))


def main():
    import jax

    assert jax.default_backend() == "tpu"
    d1, d2 = f"/tmp/infer_trace_b{B1}", f"/tmp/infer_trace_b{B2}"
    trace_one(B1, d1)
    trace_one(B2, d2)

    from analyze_trace_diff import load

    pv1, g1 = load(d1, B1, STEPS)
    pv2, g2 = load(d2, B2, STEPS)
    t1, t2 = sum(g1.values()), sum(g2.values())
    print(f"B={B1}: {t1:.3f} ms/video   B={B2}: {t2:.3f} ms/video "
          f"({(t2 / t1 - 1) * 100:+.1f}%)")
    keys = set(g1) | set(g2)
    rows = sorted(keys, key=lambda k: g2.get(k, 0.0) - g1.get(k, 0.0), reverse=True)
    print(f"{'op group':40s} {'B' + str(B1):>9s} {'B' + str(B2):>9s} {'delta':>8s}")
    for k in rows[:25]:
        a, b = g1.get(k, 0.0), g2.get(k, 0.0)
        print(f"{k:40s} {a:9.4f} {b:9.4f} {b - a:+8.4f}")


if __name__ == "__main__":
    main()
