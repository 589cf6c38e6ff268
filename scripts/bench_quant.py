"""Measure int8-quantized inference against the f32 fused path on the TPU.

Runs bench.py's inference measurement twice — once with the default config
and once with ``TPU.quantize_infer = "int8"`` (the MSTCN towers on int8 MXU
matmuls, ops/pallas/quant_conv.py) — plus a prediction-agreement check on
one batch, and prints one JSON line.  The towers are the roofline-bound part
of the forward, so the ideal ceiling for the speedup is well under 2x; this
script records what the int8 MXU actually buys end-to-end.

Usage: python scripts/bench_quant.py  (needs the axon relay up; bound it
with `timeout` — a down relay hangs in the first compile).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

import bench  # noqa: E402
import __graft_entry__ as ge  # noqa: E402


def _pred_agreement():
    """Fraction of frames where q8 and f32 eval argmax-decode agree."""
    import jax
    import jax.numpy as jnp

    from fact_clip_tpu.models import decode
    from fact_clip_tpu.models.blocks import build_fact

    cfg = ge._make_cfg(small=False)
    cfg.FACT.ntoken = bench.NTOKEN
    cfg.TPU.pallas = True
    rng = np.random.default_rng(0)
    feats, mask, lengths = bench._bench_batch(rng)

    def preds(quantize):
        c = cfg.clone()
        c.TPU.quantize_infer = quantize
        model = build_fact(c, bench.D, bench.C, s_pred_cap=128)
        params = jax.jit(
            lambda k: model.init({"params": k}, feats, mask, lengths, train=False)
        )(jax.random.PRNGKey(0))

        @jax.jit
        def run(params, feats, mask, lengths):
            saves, _ = model.apply(params, feats, mask, lengths, train=False)
            last = saves[-1]
            token_mask = jnp.ones(last["action_clogit"].shape[:2], bool)
            return decode.decode_two_branch(
                last["action_clogit"], last["a2f_attn"], last["frame_clogit"],
                float(c.FACT.mwt), token_mask,
            )

        return np.asarray(run(params, feats, mask, lengths))

    p_f32 = preds("")
    p_q8 = preds("int8")
    valid = np.asarray(mask)
    return float((p_f32 == p_q8)[valid].mean())


def main():
    t0 = time.time()
    fps_f32, step_f32, samples_f32 = bench.measure_ours()
    fps_q8, step_q8, samples_q8 = bench.measure_ours(quantize="int8")
    agree = _pred_agreement()
    print(json.dumps({
        "metric": "int8_inference_frames_per_sec_per_chip",
        "value": round(fps_q8, 1),
        "unit": "frames/s",
        "f32_frames_per_sec": round(fps_f32, 1),
        "speedup_vs_f32": round(fps_q8 / fps_f32, 3),
        "step_ms_f32": round(step_f32 * 1e3, 2),
        "step_ms_int8": round(step_q8 * 1e3, 2),
        "spread": {"f32": bench._spread(samples_f32), "int8": bench._spread(samples_q8)},
        "frame_pred_agreement": round(agree, 4),
        "wall_s": round(time.time() - t0, 1),
    }))


if __name__ == "__main__":
    main()
