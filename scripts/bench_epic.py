#!/usr/bin/python3
"""Epic-Kitchens long-video benchmark: full 24,576-frame (sr=4) forward +
decode on one chip with the verb/noun factored model (~3,800 composed
actions), chained-scan methodology.

Round-1 baseline: 45.5 ms.  Round 2 gates the all-null decode fallback
behind has-action (lax.cond; one whole composed argmax skipped in the common
case) and runs the MSTCN towers through the pad-once fused stack.  The
factored (verb,noun) argmax decomposition was measured 3x slower than the
dense gather (XLA keeps the (T,n1,n2) broadcast unfused) and is opt-in only.

Prints one line per configuration to stderr and a JSON summary to stdout.
"""

import argparse
import functools
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _epic_train_labels(rng, T, n_act, n_seg=40):
    """Piecewise-constant composed-action labels + segment data for one
    epic-length video (o2m recipes run ~dozens of segments per video)."""
    from fact_clip_tpu.utils.segments import class_label_to_segment_data

    cuts = np.sort(rng.choice(np.arange(1, T), n_seg - 1, replace=False))
    bounds = np.concatenate([[0], cuts, [T]])
    labels = np.zeros((T,), np.int32)
    prev = -1
    for k in range(n_seg):
        c = int(rng.integers(0, n_act))
        while c == prev:
            c = int(rng.integers(0, n_act))
        labels[bounds[k]: bounds[k + 1]] = c
        prev = c
    tr, sl = class_label_to_segment_data(labels)
    return labels, sl.astype(np.int32), tr.astype(np.int32)


def bench_train(model, cfg, vids, nids, n_act, feats, mask, lengths, rng):
    """Full epic-scale train step: fwd, o2m matching, all losses, fused
    backwards, Adam — T=24,576 on one chip.  VERDICT r2 item 7."""
    import jax
    import jax.numpy as jnp

    from fact_clip_tpu.engine.state import create_train_state
    from fact_clip_tpu.engine.steps import make_step_fns

    B, T = feats.shape[0], feats.shape[1]
    S = 64
    labels = np.zeros((B, T), np.int32)
    seg_label = np.zeros((B, T), np.int32)
    transcript = np.zeros((B, S), np.int32)
    seg_mask = np.zeros((B, S), bool)
    for b in range(B):
        lab, sl, tr = _epic_train_labels(rng, T, n_act)
        labels[b], seg_label[b] = lab, sl
        transcript[b, :len(tr)] = tr[:S]
        seg_mask[b, :min(len(tr), S)] = True
    batch = dict(
        feats=feats, mask=mask, lengths=lengths,
        labels=jnp.asarray(labels), seg_label=jnp.asarray(seg_label),
        transcript=jnp.asarray(transcript), seg_mask=jnp.asarray(seg_mask),
    )

    params = jax.jit(lambda k: model.init(
        {"params": k, "dropout": k, "aug": k},
        batch["feats"], batch["mask"], batch["lengths"], train=False,
    ))(jax.random.PRNGKey(0))["params"]
    state = create_train_state(model, params, cfg, steps_per_epoch=100)
    train_step, _ = make_step_fns(model, cfg, n_act, np.ones((n_act + 1,), np.float32),
                                  verbnoun=True)
    step_fn = train_step.unjitted

    @functools.partial(jax.jit, static_argnames="n")
    def chained(state, batch, n):
        def body(carry, i):
            st = carry
            st, out = step_fn(st, batch, jax.random.fold_in(jax.random.key(7, impl="rbg"), i))
            return st, out["loss"]
        state, losses_ = jax.lax.scan(body, state, jnp.arange(n))
        return state, losses_.sum()

    log(f"compiling epic train step (B={B}, T={T}) ...")
    n1_, n2_ = 2, 6

    def best_time(n, reps=3):
        _, s = chained(state, batch, n)
        s = np.asarray(s)
        assert np.isfinite(s), s
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            _, s = chained(state, batch, n)
            np.asarray(s)
            best = min(best, time.perf_counter() - t0)
        return best

    t1 = best_time(n1_)
    t2 = best_time(n2_)
    ms = (t2 - t1) / (n2_ - n1_) * 1e3

    mem = {}
    try:
        stats = jax.local_devices()[0].memory_stats() or {}
        for k in ("bytes_in_use", "peak_bytes_in_use", "bytes_limit"):
            if k in stats:
                mem[k + "_gb"] = round(stats[k] / 2**30, 2)
    except Exception:  # noqa: BLE001
        pass
    log(f"epic train step: {ms:.1f} ms (B={B} x {T} frames, "
        f"{B * T / (ms / 1e3) / 1e6:.2f} Mf/s) mem={mem}")
    return ms, mem


def epic_recipe(train: bool):
    """The epic-scale benchmark model recipe (configs/epic.yaml scale:
    n1=98 verbs (+null), n2=301 nouns, 3,806 composed actions, block IUUU,
    D=1024).  Shared with scripts/find_max_T.py so the BASELINE long-T
    rows always describe the same model as this benchmark.

    Returns (cfg, vids, nids, n1, n2, n_act, D).
    """
    from fact_clip_tpu.configs.default import get_cfg_defaults

    n1, n2 = 98, 301
    rng = np.random.default_rng(0)
    n_act = 3806
    pairs = set()
    while len(pairs) < n_act:
        pairs.add((int(rng.integers(0, n1)), int(rng.integers(0, n2))))
    pairs = sorted(pairs)
    vids = np.array([p[0] for p in pairs], np.int32)
    nids = np.array([p[1] for p in pairs], np.int32)

    cfg = get_cfg_defaults()
    cfg.dataset = "epic"
    cfg.FACT.block = "IUUU"  # round-1 measured this block string
    cfg.FACT.ntoken = 100
    cfg.FACT.fpos = False
    cfg.FACT.cmr = 0.0
    cfg.Bi.hid_dim = 512
    cfg.Bi.a_dim = 256
    cfg.Bi.a_ffdim = 512
    cfg.Bi.a_layers = 2
    cfg.Bi.a_nhead = 8
    cfg.Bi.f = "m"
    cfg.Bi.f_dim = 256
    cfg.Bi.f_layers = 10
    cfg.Bi.f_ln = False
    cfg.Bi.f_ngp = 1
    cfg.Bi.dropout = 0.0
    cfg.Bu.f_layers = 10
    cfg.BU.f_layers = 10
    cfg.TPU.pallas = True
    if train:
        # epic production recipe (epic-kitchens.yaml): o2m matching, Adam,
        # dropout, bf16 streams; exercises the fused backwards at long T
        cfg.Loss.match = "o2m"
        cfg.Loss.sw = 1.0
        cfg.Loss.pc = 0.2
        cfg.Loss.nullw = 0.05
        cfg.Bi.dropout = 0.1
        cfg.optimizer = "Adam"
        cfg.lr = 1e-4
        cfg.TPU.matcher = "auction"
        cfg.TPU.compute_dtype = "bfloat16"
    return cfg, vids, nids, n1, n2, n_act, 1024


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--train", action="store_true",
                        help="benchmark the full train step instead of fwd+decode")
    parser.add_argument("--batch", type=int, default=1)
    parser.add_argument("--quantize", default="", choices=["", "int8"],
                        help="TPU.quantize_infer for the fwd+decode benchmark")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from fact_clip_tpu.engine.steps import make_step_fns
    from fact_clip_tpu.models.verbnoun import build_verbnoun_fact

    cfg, vids, nids, n1, n2, n_act, D = epic_recipe(args.train)
    cfg.TPU.quantize_infer = "" if args.train else args.quantize
    rng = np.random.default_rng(0)

    B, T = args.batch, 24576
    model = build_verbnoun_fact(cfg, D, vids, nids, s_pred_cap=256,
                                n_classes1=n1, n_classes2=n2)

    fdtype = jnp.bfloat16 if args.train else np.float32
    feats = jnp.asarray(rng.normal(size=(B, T, D)).astype(np.float32), fdtype)
    mask = jnp.ones((B, T), bool)
    lengths = jnp.full((B,), T, jnp.int32)

    if args.train:
        ms, mem = bench_train(model, cfg, vids, nids, n_act, feats, mask, lengths, rng)
        print(json.dumps({"epic_train_ms": round(ms, 2), "T": T, "batch": B,
                          "n_act": n_act, **mem}))
        return

    params = jax.jit(lambda k: model.init({"params": k}, feats, mask, lengths, train=False))(
        jax.random.PRNGKey(0)
    )["params"]

    _, eval_step = make_step_fns(model, cfg, n_act, np.ones((n_act + 1,), np.float32),
                                 verbnoun=True)
    # chained-scan timing (25 ms relay latency)
    batch = dict(feats=feats, mask=mask, lengths=lengths,
                 transcript=jnp.zeros((B, 8), jnp.int32), seg_mask=jnp.zeros((B, 8), bool),
                 labels=jnp.zeros((B, T), jnp.int32), seg_label=jnp.zeros((B, T), jnp.int32))

    from fact_clip_tpu.models import decode  # noqa: F401

    def one(params, f):
        b = dict(batch)
        b["feats"] = f
        saves, tail = model.apply({"params": params}, b["feats"], b["mask"], b["lengths"], train=False)
        from fact_clip_tpu.ops.verbnoun_compose import composed_decode

        last = saves[-1]
        pred = composed_decode(
            last["action_logp"], last["a2f_attn"], last["frame_vlogp"], last["frame_nlogp"],
            jnp.asarray(vids), jnp.asarray(nids), 0.5,
            jnp.ones(last["action_logp"].shape[:2], bool),
            pallas=jax.default_backend() == "tpu",
        )
        return pred

    @functools.partial(jax.jit, static_argnames="n")
    def chained(params, f, n):
        def body(c, _):
            pred = one(params, c)
            s = pred.sum()
            return c + s.astype(c.dtype) * 1e-20, s

        _, ss = jax.lax.scan(body, f, None, length=n)
        return ss.sum()

    log("compiling epic fwd+decode ...")
    n1_, n2_ = 2, 8

    def best_time(n, reps=3):
        np.asarray(chained(params, feats, n))
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(chained(params, feats, n))
            best = min(best, time.perf_counter() - t0)
        return best

    t1 = best_time(n1_)
    t2 = best_time(n2_)
    ms = (t2 - t1) / (n2_ - n1_) * 1e3
    log(f"epic {T}-frame forward+decode: {ms:.1f} ms (round-1: 45.5 ms)")
    out = {"epic_fwd_decode_ms": round(ms, 2), "T": T, "n_act": n_act}
    if args.quantize:
        out["quantize"] = args.quantize
    print(json.dumps(out))


if __name__ == "__main__":
    main()
