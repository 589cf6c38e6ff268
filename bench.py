#!/usr/bin/python3
"""Benchmark: inference frames/sec/chip on a HAViD-scale workload.

Prints ONE JSON line:
  {"metric": "frames_per_sec_per_chip", "value": N, "unit": "frames/s",
   "vs_baseline": N / reference_fps}

The reference repo publishes no benchmark numbers (BASELINE.md), so the
baseline is *measured*: the reference PyTorch implementation is imported from
/root/reference (with a yacs shim; its code is executed, not copied) and
timed on the same workload on this host's CPU — the only hardware the
reference can run on here.  The measured value is cached in
BASELINE_MEASURED.json.  ``vs_baseline`` is therefore TPU-chip throughput vs
the reference implementation on this host; the project north star is >=10x a
reference *GPU*, which BASELINE.md estimates from this number once a GPU
measurement exists.

All diagnostics go to stderr; stdout carries only the JSON line.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
CACHE = os.path.join(REPO, "BASELINE_MEASURED.json")

# HAViD-scale workload (configs/havid_*: I3D features 2048-d, ~75 classes)
D, C, NTOKEN = 2048, 75, 40
T_VIDEO = 3000  # frames per video at sr=1
N_VIDEOS_REF = 3
BATCH = 8
BUCKET = 3072
STEPS = 20


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _make_videos(n, rng):
    vids = []
    for _ in range(n):
        t = T_VIDEO
        labels = np.repeat(rng.integers(0, C, size=8), t // 8 + 1)[:t].astype(np.int64)
        feats = rng.normal(size=(t, D)).astype(np.float32)
        vids.append((feats, labels))
    return vids


def measure_ours():
    import functools

    import jax
    import jax.numpy as jnp

    from fact_clip_tpu.models import decode
    from fact_clip_tpu.models.blocks import build_fact
    from __graft_entry__ import _make_cfg

    cfg = _make_cfg(small=False)
    cfg.FACT.ntoken = NTOKEN
    cfg.TPU.pallas = True
    model = build_fact(cfg, D, C, s_pred_cap=128)

    rng = np.random.default_rng(0)
    feats = np.zeros((BATCH, BUCKET, D), np.float32)
    mask = np.zeros((BATCH, BUCKET), bool)
    for b in range(BATCH):
        feats[b, :T_VIDEO] = rng.normal(size=(T_VIDEO, D)).astype(np.float32)
        mask[b, :T_VIDEO] = True
    lengths = np.full((BATCH,), T_VIDEO, np.int32)

    params = jax.jit(
        lambda k: model.init({"params": k}, feats, mask, lengths, train=False)
    )(jax.random.PRNGKey(0))

    mwt = float(cfg.FACT.mwt)

    # The axon relay to the chip has a fixed ~25 ms round-trip latency, so a
    # single dispatch cannot measure per-step time.  Chain n dependent steps
    # inside one jitted scan (each iteration consumes the previous decode so
    # XLA cannot hoist the loop body) and difference two chain lengths to
    # cancel both the latency and the scan overhead.
    @functools.partial(jax.jit, static_argnames="n")
    def chained(params, feats, mask, lengths, n):
        def body(carry, _):
            f = carry
            saves, _ = model.apply(params, f, mask, lengths, train=False)
            last = saves[-1]
            token_mask = jnp.ones(last["action_clogit"].shape[:2], bool)
            pred = decode.decode_two_branch(
                last["action_clogit"], last["a2f_attn"], last["frame_clogit"], mwt, token_mask
            )
            f = f + pred.sum().astype(f.dtype) * 1e-20
            return f, pred.sum()

        _, sums = jax.lax.scan(body, feats, None, length=n)
        return sums.sum()

    f = jax.device_put(feats)
    m = jax.device_put(mask)
    l = jax.device_put(lengths)

    log(f"compiling on {jax.default_backend()} ({jax.devices()[0]}) ...")
    n1, n2 = 4, STEPS

    def best_time(n, reps=3):
        np.asarray(chained(params, f, m, l, n))  # compile + warm
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(chained(params, f, m, l, n))
            best = min(best, time.perf_counter() - t0)
        return best

    t1 = best_time(n1)
    t2 = best_time(n2)
    step_s = (t2 - t1) / (n2 - n1)

    n_chips = jax.local_device_count()
    fps = BATCH * T_VIDEO / step_s / n_chips
    log(f"ours: {step_s * 1000:.2f} ms/step ({BATCH} videos x {T_VIDEO} frames) "
        f"on {n_chips} chip(s) -> {fps:.0f} frames/s/chip")
    return fps


def measure_reference():
    """Run the actual reference implementation (torch, CPU) on the same
    workload.  Imported from /root/reference with a yacs shim — executed for
    measurement, never copied."""
    ref_path = "/root/reference"
    if not os.path.isdir(ref_path):
        return None
    try:
        import types

        import fact_clip_tpu.configs.node as node

        yacs = types.ModuleType("yacs")
        yacs_config = types.ModuleType("yacs.config")
        yacs_config.CfgNode = node.CfgNode
        yacs.config = yacs_config
        sys.modules.setdefault("yacs", yacs)
        sys.modules.setdefault("yacs.config", yacs_config)

        sys.path.insert(0, ref_path)
        import torch

        from fact_clip.configs.default import get_cfg_defaults as ref_defaults
        from fact_clip.models.blocks import FACT as RefFACT

        cfg = ref_defaults()
        cfg.FACT.block = "iuUU"
        cfg.FACT.ntoken = NTOKEN
        cfg.FACT.fpos = False
        cfg.FACT.cmr = 0.3
        cfg.Bi.hid_dim = 512
        cfg.Bi.a_dim = 256
        cfg.Bi.a_ffdim = 512
        cfg.Bi.a_layers = 6
        cfg.Bi.a_nhead = 8
        cfg.Bi.f = "m"
        cfg.Bi.f_dim = 256
        cfg.Bi.f_layers = 10
        cfg.Bi.f_ln = False
        cfg.Bi.f_ngp = 1
        cfg.Bi.dropout = 0.2

        net = RefFACT(cfg, D, C).eval()

        rng = np.random.default_rng(0)
        vids = _make_videos(N_VIDEOS_REF, rng)
        seqs = [torch.from_numpy(f) for f, _ in vids]
        labs = [torch.from_numpy(l) for _, l in vids]

        with torch.no_grad():
            net([seqs[0]], [labs[0]])  # warmup
            t0 = time.perf_counter()
            net(seqs, labs)
            dt = time.perf_counter() - t0
        frames = sum(len(l) for l in labs)
        fps = frames / dt
        log(f"reference (torch CPU): {frames} frames in {dt:.3f}s -> {fps:.0f} frames/s")
        return fps
    except Exception as e:  # noqa: BLE001
        log(f"reference measurement failed: {e}")
        return None
    finally:
        if ref_path in sys.path:
            sys.path.remove(ref_path)


def get_reference_fps():
    if os.path.exists(CACHE):
        with open(CACHE) as f:
            data = json.load(f)
        if data.get("workload") == [D, C, NTOKEN, T_VIDEO]:
            log(f"using cached reference fps: {data['reference_cpu_fps']:.0f}")
            return data["reference_cpu_fps"]
    fps = measure_reference()
    if fps is not None:
        with open(CACHE, "w") as f:
            json.dump(
                {
                    "workload": [D, C, NTOKEN, T_VIDEO],
                    "reference_cpu_fps": fps,
                    "note": "reference torch implementation measured on this host's CPU "
                    "(no reference GPU available in this environment)",
                },
                f,
                indent=2,
            )
    return fps


def main():
    ref_fps = get_reference_fps()
    fps = measure_ours()
    vs = fps / ref_fps if ref_fps else 0.0
    print(json.dumps({
        "metric": "frames_per_sec_per_chip",
        "value": round(fps, 1),
        "unit": "frames/s",
        "vs_baseline": round(vs, 2),
    }))


if __name__ == "__main__":
    main()
