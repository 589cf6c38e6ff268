#!/usr/bin/python3
"""Profile the epic-scale fwd+decode step on the TPU and attribute device
time per op group (VERDICT r4 #2: the decode-dominated epic step had no
per-op table).  Same methodology as profile_train_step.py: chained-scan
trace + analyze_trace_diff group attribution.

Usage: python scripts/profile_epic_step.py [outdir]
"""

import functools
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/epic_trace"
STEPS = 6


def main():
    import jax
    import jax.numpy as jnp

    from bench_epic import epic_recipe
    from fact_clip_tpu.models.verbnoun import build_verbnoun_fact
    from fact_clip_tpu.ops.verbnoun_compose import composed_decode

    assert jax.default_backend() == "tpu"
    cfg, vids, nids, n1, n2, n_act, D = epic_recipe(train=False)
    rng = np.random.default_rng(0)
    B, T = 1, 24576
    model = build_verbnoun_fact(cfg, D, vids, nids, s_pred_cap=256,
                                n_classes1=n1, n_classes2=n2)
    feats = jnp.asarray(rng.normal(size=(B, T, D)).astype(np.float32))
    mask = jnp.ones((B, T), bool)
    lengths = jnp.full((B,), T, jnp.int32)
    params = jax.jit(lambda k: model.init({"params": k}, feats, mask, lengths, train=False))(
        jax.random.PRNGKey(0)
    )["params"]
    jvids, jnids = jnp.asarray(vids), jnp.asarray(nids)

    def one(params, f):
        saves, _ = model.apply({"params": params}, f, mask, lengths, train=False)
        last = saves[-1]
        return composed_decode(
            last["action_logp"], last["a2f_attn"], last["frame_vlogp"], last["frame_nlogp"],
            jvids, jnids, 0.5, jnp.ones(last["action_logp"].shape[:2], bool),
            pallas=jax.default_backend() == "tpu",
        )

    @functools.partial(jax.jit, static_argnames="n")
    def chained(params, f, n):
        def body(c, _):
            pred = one(params, c)
            s = pred.sum()
            return c + s.astype(c.dtype) * 1e-20, s
        _, ss = jax.lax.scan(body, f, None, length=n)
        return ss.sum()

    np.asarray(chained(params, feats, STEPS))  # compile + warm
    print("compiled; tracing ...", file=sys.stderr)
    with jax.profiler.trace(OUT):
        np.asarray(chained(params, feats, STEPS))
    print(f"trace written to {OUT}", file=sys.stderr)

    from analyze_trace_diff import load
    per_video, groups = load(OUT, B, STEPS)
    total = sum(groups.values())
    print(f"epic B={B} T={T}: device total {total:.3f} ms/step")
    for name, v in groups.most_common(30):
        print(f"  {v:8.4f} ms  {name}")


if __name__ == "__main__":
    main()
