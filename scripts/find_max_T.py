#!/usr/bin/python3
"""Find the single-chip max sequence length for the epic IUUU model.

SURVEY §2.6 long-T plan: beyond the sr=4 epic benchmark length (24,576
frames), how far can one v5e chip (16 GB HBM) stretch before the step
OOMs?  Doubles T from the epic benchmark length until failure, then
bisects to the boundary at TILE-granularity.  Each trial jits and runs
one real step (fwd+decode for --mode infer f32; the full bf16 train step
with o2m matching and Adam for --mode train) and reports device memory
stats.  Writes a JSON line per mode for the BASELINE.md long-T table.

Run on the real TPU: `python scripts/find_max_T.py --mode infer`.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


TILE = 8192


def build(T, mode):
    import jax
    import jax.numpy as jnp

    from fact_clip_tpu.engine.state import create_train_state
    from fact_clip_tpu.engine.steps import make_step_fns
    from fact_clip_tpu.models.verbnoun import build_verbnoun_fact
    from bench_epic import _epic_train_labels, epic_recipe

    # the exact benchmark model (shared recipe): the long-T table rows must
    # describe the same config as scripts/bench_epic.py's numbers
    cfg, vids, nids, n1, n2, n_act, D = epic_recipe(mode == "train")
    rng = np.random.default_rng(0)
    B = 1
    model = build_verbnoun_fact(cfg, D, vids, nids, s_pred_cap=256,
                                n_classes1=n1, n_classes2=n2)

    fdtype = jnp.bfloat16 if mode == "train" else np.float32
    feats = jnp.asarray(rng.normal(size=(B, T, D)).astype(np.float32), fdtype)
    mask = jnp.ones((B, T), bool)
    lengths = jnp.full((B,), T, jnp.int32)

    if mode == "infer":
        params = jax.jit(lambda k: model.init(
            {"params": k}, feats, mask, lengths, train=False))(jax.random.PRNGKey(0))["params"]
        _, eval_step = make_step_fns(model, cfg, n_act, np.ones((n_act + 1,), np.float32),
                                     verbnoun=True)
        batch = dict(feats=feats, mask=mask, lengths=lengths,
                     transcript=jnp.zeros((B, 8), jnp.int32),
                     seg_mask=jnp.zeros((B, 8), bool),
                     labels=jnp.zeros((B, T), jnp.int32),
                     seg_label=jnp.zeros((B, T), jnp.int32))

        def run():
            pred = np.asarray(eval_step(params, batch))
            assert pred.shape == (B, T), pred.shape
        return run

    S = 64
    labels = np.zeros((B, T), np.int32)
    seg_label = np.zeros((B, T), np.int32)
    transcript = np.zeros((B, S), np.int32)
    seg_mask = np.zeros((B, S), bool)
    for b in range(B):
        lab, sl, tr = _epic_train_labels(rng, T, n_act)
        labels[b], seg_label[b] = lab, sl
        transcript[b, :min(len(tr), S)] = tr[:S]
        seg_mask[b, :min(len(tr), S)] = True
    batch = dict(feats=feats, mask=mask, lengths=lengths,
                 labels=jnp.asarray(labels), seg_label=jnp.asarray(seg_label),
                 transcript=jnp.asarray(transcript), seg_mask=jnp.asarray(seg_mask))
    params = jax.jit(lambda k: model.init(
        {"params": k, "dropout": k, "aug": k},
        batch["feats"], batch["mask"], batch["lengths"], train=False,
    ))(jax.random.PRNGKey(0))["params"]
    state = create_train_state(model, params, cfg, steps_per_epoch=100)
    train_step, _ = make_step_fns(model, cfg, n_act, np.ones((n_act + 1,), np.float32),
                                  verbnoun=True)

    def run():
        st, out = train_step(state, batch, jax.random.PRNGKey(1))
        loss = float(out["loss"])
        assert np.isfinite(loss), loss
    return run


def try_T(T, mode, timeout_note=""):
    import jax

    t0 = time.perf_counter()
    try:
        run = build(T, mode)
        run()
        dt = time.perf_counter() - t0
        stats = jax.local_devices()[0].memory_stats() or {}
        peak = stats.get("peak_bytes_in_use", 0) / 2**30
        log(f"T={T}: OK ({dt:.0f}s incl. compile, peak {peak:.2f} GiB){timeout_note}")
        return True, peak
    except Exception as e:  # noqa: BLE001 - RESOURCE_EXHAUSTED etc.
        msg = str(e).splitlines()[0][:160]
        log(f"T={T}: FAIL ({msg})")
        return False, None
    finally:
        # drop cached buffers between trials so failures don't poison later ones
        try:
            jax.clear_caches()
        except Exception:  # noqa: BLE001
            pass


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--mode", choices=["infer", "train"], default="infer")
    parser.add_argument("--start", type=int, default=24576)
    args = parser.parse_args()

    import jax
    assert jax.default_backend() == "tpu", jax.default_backend()

    lo, peak_lo = args.start, None
    ok, peak = try_T(lo, args.mode)
    if not ok:
        print(json.dumps({"mode": args.mode, "max_T": 0, "note": "start length failed"}))
        sys.exit(1)
    peak_lo = peak
    hi = None
    T = lo * 2
    while hi is None:
        ok, peak = try_T(T, args.mode)
        if ok:
            lo, peak_lo = T, peak
            T *= 2
        else:
            hi = T
    while hi - lo > TILE:
        mid = (lo + hi) // 2 // TILE * TILE
        if mid in (lo, hi):
            break
        ok, peak = try_T(mid, args.mode)
        if ok:
            lo, peak_lo = mid, peak
        else:
            hi = mid
    print(json.dumps({"mode": args.mode, "max_T": lo, "first_fail_T": hi,
                      "peak_gib_at_max": round(peak_lo or 0.0, 2),
                      "model": "epic IUUU verb/noun, B=1, D=1024"}))


if __name__ == "__main__":
    main()
