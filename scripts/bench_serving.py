#!/usr/bin/python3
"""Benchmark the AOT serving artifact against the live jitted eval step.

``python scripts/bench_serving.py [--cpu] [--batch N] [--calls K]``

Builds the HAViD-scale flagship (same workload as bench.py: D=2048, C=75,
B x 3072-frame bucket), exports the eval step with engine/export.py (weights
baked into one StableHLO program per bucket), loads the artifact back, and
times per-dispatch latency of:

* ``live``    — the jitted eval step (forward + TDU + decode), params passed
  as an argument (what run_eval.py executes);
* ``serving`` — the deserialized artifact's bucket program (what a serving
  host without fact_clip_tpu installed executes).

Both paths are timed per *individual* dispatch on device-resident inputs
(serving calls cannot be scan-chained — the artifact boundary is the jit
boundary), so on the axon relay both include the same ~25 ms round-trip;
the delta between them isolates the artifact overhead.  Emits one JSON line
per row.  ``--cpu`` runs a tiny smoke model on 8 virtual CPU devices for
correctness of the harness itself.

The reference has no comparable deployment path — its eval re-instantiates
the full Python model tree around a torch pickle
(/root/reference/scripts/run_eval.py:134-137).
"""

import argparse
import json
import os
import sys
import time
from types import SimpleNamespace

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_exp(cpu: bool, batch: int):
    import jax
    import numpy as np

    from __graft_entry__ import _make_cfg
    from fact_clip_tpu.models import losses
    from fact_clip_tpu.models.blocks import build_fact

    cfg = _make_cfg(small=cpu)
    if cpu:
        D, C, bucket, s_cap, s_pred_cap = 12, 5, 128, 16, 24
    else:
        # bench.py's HAViD-scale inference workload
        D, C, bucket, s_cap, s_pred_cap = 2048, 75, 3072, 24, 128
        cfg.FACT.ntoken = 40
    cfg.batch_size = batch
    model = build_fact(cfg, D, C, s_pred_cap=s_pred_cap)

    rng = np.random.default_rng(0)
    feats = rng.normal(size=(batch, bucket, D)).astype(np.float32)
    mask = np.ones((batch, bucket), bool)
    lengths = np.full((batch,), bucket, np.int32)
    # exp.params holds the inner param tree (build_experiment convention)
    params = model.init(
        {"params": jax.random.PRNGKey(0)}, feats, mask, lengths, train=False
    )["params"]

    exp = SimpleNamespace(
        cfg=cfg,
        model=model,
        params=params,
        dataset=SimpleNamespace(nclasses=C, input_dimension=D),
        buckets=[bucket],
        seg_cap=s_cap,
        s_pred_cap=s_pred_cap,
        cweight=losses.build_class_weights(cfg, C, [0]),
        clip_bundle=None,
        verbnoun=False,
    )
    return exp, (feats, mask, lengths)


def time_calls(fn, args, calls: int, warmup: int = 2):
    import jax

    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    times = []
    for _ in range(calls):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        times.append(time.perf_counter() - t0)
    return min(times), sorted(times)[len(times) // 2]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true", help="small smoke model on CPU")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--calls", type=int, default=30)
    ap.add_argument("--out", default="", help="keep the artifact zip here (default: temp)")
    args = ap.parse_args()

    if args.cpu:
        os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
        from fact_clip_tpu.platform import ensure_platform

        ensure_platform("cpu")
    else:
        from fact_clip_tpu.platform import ensure_platform

        ensure_platform()

    import jax

    from fact_clip_tpu.engine.export import export_serving, load_serving, save_serving
    from fact_clip_tpu.engine.steps import make_step_fns

    platform = jax.devices()[0].platform
    exp, (feats, mask, lengths) = build_exp(cpu=args.cpu, batch=args.batch)
    bucket = exp.buckets[0]
    frames = args.batch * bucket

    # --- live path: jitted eval step, params as argument --------------------
    _, eval_step = make_step_fns(
        exp.model, exp.cfg, exp.dataset.nclasses, exp.cweight, exp.clip_bundle,
        verbnoun=exp.verbnoun,
    )
    live = jax.jit(lambda p, f, m, ln: eval_step(p, dict(feats=f, mask=m, lengths=ln)))
    dev_args = jax.device_put((feats, mask, lengths))
    dev_params = jax.device_put(exp.params)
    t_live, t_live_med = time_calls(
        lambda f, m, ln: live(dev_params, f, m, ln), dev_args, args.calls)

    # --- serving path: export -> save -> load -> call -----------------------
    t0 = time.perf_counter()
    exported, meta = export_serving(
        exp, platforms=("cpu",) if args.cpu else ("tpu",))
    export_s = time.perf_counter() - t0
    path = args.out or os.path.join("/tmp", f"bench_serving_{platform}.factserve")
    save_serving(path, exported, meta)
    size_mb = os.path.getsize(path) / 1e6
    serving = load_serving(path)
    t_serve, t_serve_med = time_calls(
        lambda f, m, ln: serving.call(bucket, f, m, ln), dev_args, args.calls)

    # outputs agree between the two paths
    import numpy as np

    p_live = np.asarray(live(dev_params, *dev_args))
    p_serve = np.asarray(serving.call(bucket, *dev_args))
    assert p_live.shape == p_serve.shape == (args.batch, bucket)
    agree = float((p_live == p_serve).mean())

    for name, best, med in (("live", t_live, t_live_med),
                            ("serving", t_serve, t_serve_med)):
        print(json.dumps({
            "metric": f"serving_bench_{name}_ms",
            "value": round(best * 1e3, 3),
            "median_ms": round(med * 1e3, 3),
            "frames_per_s": round(frames / best),
            "platform": platform,
            "batch": args.batch,
            "bucket": bucket,
        }), flush=True)
    print(json.dumps({
        "metric": "serving_bench_meta",
        "artifact_mb": round(size_mb, 1),
        "export_s": round(export_s, 1),
        "pred_agreement": agree,
        "overhead_ms": round((t_serve - t_live) * 1e3, 3),
        "platform": platform,
    }), flush=True)
    assert agree == 1.0, f"serving/live predictions disagree: {agree:.4f}"


if __name__ == "__main__":
    main()
