#!/usr/bin/python3
"""Count algorithmic FLOPs/step of the bench workload via XLA cost analysis.

Runs on the CPU backend (cost_analysis is unavailable through the TPU relay)
with Pallas disabled, so every op is visible to XLA's HLO cost model — the
Pallas kernels compute the same math (parity-proven by
tests/test_pallas_kernels.py), so this is the true FLOP count of the
TPU-executed step as well.  bench.py divides these counts by measured step
time to report achieved TFLOP/s and MFU (fraction of v5e bf16 peak).

Prints ONE JSON line:
  {"train_flops_per_step": F, "infer_flops_per_step": G,
   "batch": B, "frames_per_video": T}
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fact_clip_tpu.platform import ensure_platform

ensure_platform("cpu")


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    import bench
    from fact_clip_tpu.engine.state import create_train_state
    from fact_clip_tpu.engine.steps import make_step_fns
    from fact_clip_tpu.models import decode
    from fact_clip_tpu.models.blocks import build_fact
    from __graft_entry__ import _make_cfg

    assert jax.default_backend() == "cpu"

    rng = np.random.default_rng(0)

    # ---- training step (mirror bench.measure_ours_train exactly)
    cfg = _make_cfg(small=False)
    cfg.FACT.ntoken = bench.NTOKEN
    cfg.TPU.pallas = False  # every op visible to the cost model
    cfg.Bi.dropout = 0.2
    cfg.TPU.matcher = "auction"
    cfg.TPU.compute_dtype = "bfloat16"
    model = build_fact(cfg, bench.D, bench.C, s_pred_cap=128)

    b = bench._bench_batch(rng, with_labels=True)
    batch = {k: jnp.asarray(v) for k, v in b.items()}
    params = jax.eval_shape(
        lambda k: model.init(
            {"params": k, "dropout": k, "aug": k},
            batch["feats"], batch["mask"], batch["lengths"], train=False,
        ), jax.random.PRNGKey(0),
    )["params"]
    params = jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape, s.dtype), params)
    state = create_train_state(model, params, cfg, steps_per_epoch=100)
    train_step, _ = make_step_fns(model, cfg, bench.C, np.ones((bench.C + 1,), np.float32))

    lowered = jax.jit(train_step.unjitted).lower(
        state, batch, jax.random.key(7, impl="rbg"))
    train_flops = float(lowered.cost_analysis()["flops"])

    # ---- inference forward + decode (mirror bench.measure_ours)
    icfg = _make_cfg(small=False)
    icfg.FACT.ntoken = bench.NTOKEN
    icfg.TPU.pallas = False
    imodel = build_fact(icfg, bench.D, bench.C, s_pred_cap=128)
    feats, mask, lengths = bench._bench_batch(rng)
    feats, mask, lengths = jnp.asarray(feats), jnp.asarray(mask), jnp.asarray(lengths)
    iparams = jax.eval_shape(
        lambda k: imodel.init({"params": k}, feats, mask, lengths, train=False),
        jax.random.PRNGKey(0),
    )
    iparams = jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape, s.dtype), iparams)
    mwt = float(icfg.FACT.mwt)

    def fwd(p, f, m, l):
        saves, _ = imodel.apply(p, f, m, l, train=False)
        last = saves[-1]
        token_mask = jnp.ones(last["action_clogit"].shape[:2], bool)
        return decode.decode_two_branch(
            last["action_clogit"], last["a2f_attn"], last["frame_clogit"], mwt, token_mask)

    infer_flops = float(
        jax.jit(fwd).lower(iparams, feats, mask, lengths).cost_analysis()["flops"])

    print(json.dumps({
        "train_flops_per_step": train_flops,
        "infer_flops_per_step": infer_flops,
        "batch": bench.BATCH,
        "frames_per_video": bench.T_VIDEO,
    }))


if __name__ == "__main__":
    main()
