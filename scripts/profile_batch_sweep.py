#!/usr/bin/python3
"""Attribute the B=8 -> B=32 inference throughput regression (ROADMAP item 1,
VERDICT round-1 weak #2).

Measures chained-scan step time on the real TPU across:
  * batch size B in {8, 16, 32} on the flagship iuUU model;
  * block-prefix ablations at B=8 vs B=32 ("i", "iu", "iuU", "iuUU");
  * input-dim ablation (D=2048 vs 512) to test the feature-read hypothesis;
  * compute dtype f32 vs bf16.

Writes a JSON report to scripts/batch_sweep_results.json (and stdout).
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def measure(block, B, D, dtype, T_video=3000, bucket=3072, C=75, ntoken=40):
    import jax
    import jax.numpy as jnp

    from fact_clip_tpu.models import decode
    from fact_clip_tpu.models.blocks import build_fact
    from __graft_entry__ import _make_cfg

    cfg = _make_cfg(small=False)
    cfg.FACT.block = block
    cfg.FACT.ntoken = ntoken
    cfg.TPU.pallas = True
    cfg.TPU.compute_dtype = dtype
    model = build_fact(cfg, D, C, s_pred_cap=128)

    rng = np.random.default_rng(0)
    feats = np.zeros((B, bucket, D), np.float32)
    mask = np.zeros((B, bucket), bool)
    feats[:, :T_video] = rng.normal(size=(B, T_video, D)).astype(np.float32)
    mask[:, :T_video] = True
    lengths = np.full((B,), T_video, np.int32)

    params = jax.jit(lambda k: model.init({"params": k}, feats, mask, lengths, train=False))(
        jax.random.PRNGKey(0)
    )
    mwt = 0.1
    has_u = "u" in block or "U" in block

    @functools.partial(jax.jit, static_argnames="n")
    def chained(params, feats, mask, lengths, n):
        def body(carry, _):
            f = carry
            saves, _ = model.apply(params, f, mask, lengths, train=False)
            last = saves[-1]
            if has_u:
                token_mask = jnp.ones(last["action_clogit"].shape[:2], bool)
                pred = decode.decode_two_branch(
                    last["action_clogit"], last["a2f_attn"], last["frame_clogit"], mwt, token_mask
                )
                s = pred.sum()
            else:
                s = last["frame_clogit"].sum()
            f = f + s.astype(f.dtype) * 1e-20
            return f, s

        _, sums = jax.lax.scan(body, feats, None, length=n)
        return sums.sum()

    f = jax.device_put(jnp.asarray(feats))
    m = jax.device_put(jnp.asarray(mask))
    l = jax.device_put(jnp.asarray(lengths))
    n1, n2 = 4, 16

    def best_time(n, reps=3):
        np.asarray(chained(params, f, m, l, n))
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(chained(params, f, m, l, n))
            best = min(best, time.perf_counter() - t0)
        return best

    t1 = best_time(n1)
    t2 = best_time(n2)
    step_ms = (t2 - t1) / (n2 - n1) * 1e3
    fps = B * T_video / (step_ms / 1e3)
    log(f"block={block:5s} B={B:2d} D={D} dtype={dtype or 'f32':8s}: "
        f"{step_ms:7.2f} ms/step  {fps/1e6:6.2f} Mf/s  {step_ms/B:6.3f} ms/video")
    return {"block": block, "B": B, "D": D, "dtype": dtype or "float32",
            "step_ms": round(step_ms, 3), "mfps": round(fps / 1e6, 3)}


def _merge(path, results):
    """Merge new entries into the existing report (keyed by config) instead
    of clobbering it — partial re-runs must not lose prior sweep coverage."""
    old = []
    if os.path.exists(path):
        with open(path) as fh:
            try:
                old = json.load(fh)
            except json.JSONDecodeError:
                old = []
    key = lambda r: (r.get("block"), r.get("B"), r.get("D"), r.get("dtype"))
    merged = {key(r): r for r in old}
    for r in results:
        # a transient-failure record must not replace a measured row
        if "error" in r and "error" not in merged.get(key(r), r):
            continue
        merged[key(r)] = r
    return list(merged.values())


def main():
    results = []
    runs = [
        # batch sweep, flagship
        ("iuUU", 8, 2048, "float32"),
        ("iuUU", 16, 2048, "float32"),
        ("iuUU", 32, 2048, "float32"),
        # bf16 comparison
        ("iuUU", 8, 2048, "bfloat16"),
        ("iuUU", 32, 2048, "bfloat16"),
        # block ablation at both ends
        ("i", 8, 2048, "float32"),
        ("i", 32, 2048, "float32"),
        ("iu", 8, 2048, "float32"),
        ("iu", 32, 2048, "float32"),
        ("iuU", 8, 2048, "float32"),
        ("iuU", 32, 2048, "float32"),
        # input-dim ablation
        ("iuUU", 8, 512, "float32"),
        ("iuUU", 32, 512, "float32"),
    ]
    for block, B, D, dtype in runs:
        try:
            results.append(measure(block, B, D, dtype))
        except Exception as e:  # noqa: BLE001
            log(f"FAILED block={block} B={B} D={D} dtype={dtype}: {e}")
            results.append({"block": block, "B": B, "D": D, "dtype": dtype, "error": str(e)})
        path = os.path.join(os.path.dirname(__file__), "batch_sweep_results.json")
        with open(path, "w") as fh:
            json.dump(_merge(path, results), fh, indent=2)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
