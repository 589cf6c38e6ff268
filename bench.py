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

# persistent XLA compile cache (must go through jax.config — sitecustomize
# imports jax before us, so the env var is already snapshotted)
import jax as _jax

if _jax.config.jax_compilation_cache_dir is None:
    _jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
CACHE = os.path.join(REPO, "BASELINE_MEASURED.json")
LAST_GOOD = os.path.join(REPO, "BENCH_LAST_GOOD.json")

# HAViD-scale workload (configs/havid_*: I3D features 2048-d, ~75 classes)
D, C, NTOKEN = 2048, 75, 40
T_VIDEO = 3000  # frames per video at sr=1
N_VIDEOS_REF = 3
BATCH = 8
BUCKET = 3072
STEPS = 20

# TPU v5e peak: 197 TFLOP/s bf16 per chip (MXU).  MFU below is achieved
# TFLOP/s over this peak; the inference path runs f32 activations but the
# MXU is bf16-native either way, so bf16 peak is the roofline for both.
PEAK_TFLOPS_BF16 = 197.0


def log(*a):
    print(*a, file=sys.stderr, flush=True)


N_SAMPLES = 5  # timed samples per metric (median + IQR reported)


def _sample_step_s(run, n1, n2, nsamples=N_SAMPLES):
    """N independent samples of per-step time via chain-length differencing.

    ``run(n)`` executes an n-step chained program and blocks on the result.
    Each sample times one (n1, n2) pair back-to-back so the ~25 ms relay
    round-trip and the scan overhead cancel in the difference; the caller
    reports the median and IQR — single-sample numbers through the relay
    have shown ±15-25% swings (VERDICT r3), so round-over-round comparisons
    must be made on medians.
    """
    run(n1)
    run(n2)  # compile + warm both chain lengths
    samples = []
    for _ in range(nsamples):
        t0 = time.perf_counter()
        run(n1)
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        run(n2)
        t2 = time.perf_counter() - t0
        samples.append((t2 - t1) / (n2 - n1))
    return samples


def _median_iqr(samples):
    med = float(np.median(samples))
    q25, q75 = np.percentile(samples, [25, 75])
    return med, float(q75 - q25)


def _make_videos(n, rng):
    vids = []
    for _ in range(n):
        t = T_VIDEO
        labels = np.repeat(rng.integers(0, C, size=8), t // 8 + 1)[:t].astype(np.int64)
        feats = rng.normal(size=(t, D)).astype(np.float32)
        vids.append((feats, labels))
    return vids


def _bench_batch(rng, with_labels=False):
    """HAViD-scale synthetic batch (BATCH x BUCKET, valid prefix T_VIDEO)."""
    feats = np.zeros((BATCH, BUCKET, D), np.float32)
    mask = np.zeros((BATCH, BUCKET), bool)
    for b in range(BATCH):
        feats[b, :T_VIDEO] = rng.normal(size=(T_VIDEO, D)).astype(np.float32)
        mask[b, :T_VIDEO] = True
    lengths = np.full((BATCH,), T_VIDEO, np.int32)
    if not with_labels:
        return feats, mask, lengths

    from fact_clip_tpu.utils.segments import class_label_to_segment_data

    S = 24  # transcript cap (~HAViD segment counts)
    labels = np.zeros((BATCH, BUCKET), np.int32)
    seg_label = np.zeros((BATCH, BUCKET), np.int32)
    transcript = np.zeros((BATCH, S), np.int32)
    seg_mask = np.zeros((BATCH, S), bool)
    for b in range(BATCH):
        n_seg = 16
        cuts = np.sort(rng.choice(np.arange(1, T_VIDEO), n_seg - 1, replace=False))
        bounds = np.concatenate([[0], cuts, [T_VIDEO]])
        prev = -1
        for k in range(n_seg):
            c = int(rng.integers(0, C))
            while c == prev:
                c = int(rng.integers(0, C))
            labels[b, bounds[k] : bounds[k + 1]] = c
            prev = c
        tr, sl = class_label_to_segment_data(labels[b, :T_VIDEO])
        seg_label[b, :T_VIDEO] = sl
        seg_label[b, T_VIDEO:] = sl[-1]
        labels[b, T_VIDEO:] = labels[b, T_VIDEO - 1]
        transcript[b, : len(tr)] = tr
        seg_mask[b, : len(tr)] = True
    return dict(
        feats=feats, mask=mask, lengths=lengths, labels=labels,
        seg_label=seg_label, transcript=transcript, seg_mask=seg_mask,
    )


def measure_ours_train():
    """Training frames/s/chip: full train step (forward, on-device auction
    matching, all losses, backward, SGD update, train-time decode) chained
    inside one jitted scan, dropout active (the production recipes train with
    dropout 0.2-0.5, exercising the in-kernel Pallas dropout path)."""
    import functools

    import jax
    import jax.numpy as jnp

    from fact_clip_tpu.engine.state import create_train_state
    from fact_clip_tpu.engine.steps import make_step_fns
    from fact_clip_tpu.models.blocks import build_fact
    from __graft_entry__ import _make_cfg

    cfg = _make_cfg(small=False)
    cfg.FACT.ntoken = NTOKEN
    cfg.TPU.pallas = True
    cfg.Bi.dropout = 0.2  # havid recipe
    cfg.TPU.matcher = "auction"
    # production TPU recipe: bf16 streams/matmuls with f32 accumulation and
    # f32 logits/losses (numerics pinned by tests/test_mixed_precision.py);
    # the fused Pallas backwards keep the whole step on the MXU
    cfg.TPU.compute_dtype = "bfloat16"
    model = build_fact(cfg, D, C, s_pred_cap=128)

    rng = np.random.default_rng(0)
    b = _bench_batch(rng, with_labels=True)
    # features feed at the compute dtype (engine/train_loop.py does the same):
    # halves the largest tensor's HBM traffic and removes the on-device cast
    b["feats"] = b["feats"].astype(jnp.bfloat16)
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
            state = carry
            state, out = step_fn(state, batch, jax.random.fold_in(jax.random.key(7, impl="rbg"), i))
            return state, out["loss"]
        state, losses_ = jax.lax.scan(body, state, jnp.arange(n))
        return state, losses_.sum()

    log(f"compiling train step on {jax.default_backend()} ...")
    n1, n2 = 2, 8

    def run(n):
        _, s = chained(state, batch, n)
        np.asarray(s)

    samples = _sample_step_s(run, n1, n2)
    step_s, iqr_s = _median_iqr(samples)
    n_chips = jax.local_device_count()
    fps = BATCH * T_VIDEO / step_s / n_chips
    log(f"ours train: {step_s * 1000:.2f} ms/step median (IQR {iqr_s * 1000:.2f}) "
        f"({BATCH} x {T_VIDEO} frames) -> {fps:.0f} frames/s/chip")
    return fps, step_s, samples


def measure_ours(quantize: str = "", dtype: str = ""):
    import functools

    import jax
    import jax.numpy as jnp

    from fact_clip_tpu.models import decode
    from fact_clip_tpu.models.blocks import build_fact
    from __graft_entry__ import _make_cfg

    cfg = _make_cfg(small=False)
    cfg.FACT.ntoken = NTOKEN
    cfg.TPU.pallas = True
    cfg.TPU.quantize_infer = quantize  # "int8": quantized eval towers
    if dtype:
        cfg.TPU.compute_dtype = dtype  # "bfloat16": the production serving recipe
    model = build_fact(cfg, D, C, s_pred_cap=128)

    rng = np.random.default_rng(0)
    feats, mask, lengths = _bench_batch(rng)
    if dtype == "bfloat16":
        feats = feats.astype(jnp.bfloat16)

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

    def run(n):
        np.asarray(chained(params, f, m, l, n))

    samples = _sample_step_s(run, n1, n2)
    step_s, iqr_s = _median_iqr(samples)
    n_chips = jax.local_device_count()
    fps = BATCH * T_VIDEO / step_s / n_chips
    log(f"ours: {step_s * 1000:.2f} ms/step median (IQR {iqr_s * 1000:.2f}) "
        f"({BATCH} videos x {T_VIDEO} frames) on {n_chips} chip(s) "
        f"-> {fps:.0f} frames/s/chip")
    return fps, step_s, samples


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


def measure_reference_train():
    """Time the reference training hot loop (train.py:255-268: forward with
    compute_loss, backward, grad clip, SGD step) on this host's CPU."""
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
        from fact_clip.models.loss import MatchCriterion as RefCriterion

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
        cfg.Loss.nullw = 0.1

        net = RefFACT(cfg, D, C).train()
        net.mcriterion = RefCriterion(cfg, C, [0])
        opt = torch.optim.SGD(net.parameters(), lr=0.01, momentum=0.009)

        rng = np.random.default_rng(0)
        vids = _make_videos(N_VIDEOS_REF, rng)
        seqs = [torch.from_numpy(f) for f, _ in vids]
        labs = [torch.from_numpy(l) for _, l in vids]

        def one_step(ss, ll):
            opt.zero_grad()
            loss, _ = net(ss, ll, compute_loss=True)
            loss.backward()
            torch.nn.utils.clip_grad_norm_(net.parameters(), cfg.clip_grad_norm)
            opt.step()

        one_step([seqs[0]], [labs[0]])  # warmup
        t0 = time.perf_counter()
        one_step(seqs, labs)
        dt = time.perf_counter() - t0
        frames = sum(len(l) for l in labs)
        fps = frames / dt
        log(f"reference train (torch CPU): {frames} frames in {dt:.3f}s -> {fps:.0f} frames/s")
        return fps
    except Exception as e:  # noqa: BLE001
        log(f"reference train measurement failed: {e}")
        return None
    finally:
        if ref_path in sys.path:
            sys.path.remove(ref_path)


def get_reference_fps():
    data = {}
    if os.path.exists(CACHE):
        with open(CACHE) as f:
            data = json.load(f)
        if data.get("workload") != [D, C, NTOKEN, T_VIDEO]:
            data = {}
    changed = False
    if "reference_cpu_fps" not in data:
        fps = measure_reference()
        if fps is not None:
            data["reference_cpu_fps"] = fps
            changed = True
    else:
        log(f"using cached reference fps: {data['reference_cpu_fps']:.0f}")
    if "reference_cpu_train_fps" not in data:
        tfps = measure_reference_train()
        if tfps is not None:
            data["reference_cpu_train_fps"] = tfps
            changed = True
    else:
        log(f"using cached reference train fps: {data['reference_cpu_train_fps']:.0f}")
    if changed and data:
        data["workload"] = [D, C, NTOKEN, T_VIDEO]
        data["note"] = ("reference torch implementation measured on this host's CPU "
                        "(no reference GPU available in this environment)")
        with open(CACHE, "w") as f:
            json.dump(data, f, indent=2)
    return data.get("reference_cpu_fps"), data.get("reference_cpu_train_fps")


def get_flops():
    """FLOPs/step of the bench workload via XLA cost analysis on the CPU
    backend with Pallas disabled (scripts/count_flops.py); cached because the
    count is a property of the model/workload, not the run."""
    data = {}
    if os.path.exists(CACHE):
        with open(CACHE) as f:
            data = json.load(f)
        if data.get("workload") != [D, C, NTOKEN, T_VIDEO]:
            data = {}
    if "train_flops_per_step" in data and "infer_flops_per_step" in data:
        return data["train_flops_per_step"], data["infer_flops_per_step"]
    import subprocess

    try:
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "scripts", "count_flops.py")],
            capture_output=True, text=True, timeout=1800, check=True,
        ).stdout.strip().splitlines()[-1]
        counts = json.loads(out)
    except Exception as e:  # noqa: BLE001
        log(f"flop counting failed: {e}")
        return None, None
    data.update({k: counts[k] for k in ("train_flops_per_step", "infer_flops_per_step")})
    data["workload"] = [D, C, NTOKEN, T_VIDEO]
    with open(CACHE, "w") as f:
        json.dump(data, f, indent=2)
    return data["train_flops_per_step"], data["infer_flops_per_step"]


def _wait_for_tpu(max_wait_s: float = 1500.0, probe_timeout_s: float = 150.0):
    """Gate on the axon relay being reachable before measuring.

    Backend init on a downed relay hangs indefinitely (observed: >9 min with
    no error), which would leave the driver's bench artifact empty.  The
    relay has also been seen in a half-up state where device enumeration
    succeeds but compile/execute RPCs hang — so the probe runs an actual
    tiny computation, not just `jax.devices()`.  Probe in a subprocess with
    a hard timeout and retry with backoff; on sustained outage, exit
    nonzero with a clear diagnostic — proceeding would just re-enter the
    indefinite hang in-process."""
    import subprocess

    deadline = time.time() + max_wait_s
    attempt = 0
    timed_out = False  # last failure mode: hang (relay down) vs fast error
    while True:
        attempt += 1
        try:
            proc = subprocess.run(
                [sys.executable, "-c",
                 # float(...) fetches the result — on the axon relay only a
                 # device->host read provably waits for execution
                 # (block_until_ready returns before the execute completes)
                 "import jax, jax.numpy as jnp; "
                 "float(jax.jit(lambda x: (x @ x).sum())(jnp.ones((128, 128))))"],
                timeout=probe_timeout_s, capture_output=True,
            )
            if proc.returncode == 0:
                if attempt > 1:
                    log(f"TPU relay reachable after {attempt} probes")
                return
            timed_out = False
            log(f"TPU probe {attempt} failed: {proc.stderr.decode()[-200:]}")
        except subprocess.TimeoutExpired:
            timed_out = True
            log(f"TPU probe {attempt} timed out after {probe_timeout_s:.0f}s")
        if time.time() >= deadline:
            if timed_out:
                log(f"TPU relay unreachable for {max_wait_s:.0f}s")
                _emit_stale_or_die()
            # a fast nonzero probe exit is a code/env regression, not an
            # outage — emitting the stale result would mask it as success
            log("TPU probe failing fast (not a relay hang); aborting")
            sys.exit(1)
        time.sleep(min(60.0, max(5.0, deadline - time.time())))


def _emit_stale_or_die():
    """On sustained relay outage, emit the last on-hardware result, marked.

    An empty bench artifact tells the driver nothing; the previous
    measurement with ``"stale": true`` and its timestamp is strictly more
    informative and clearly labeled.  Exits the process either way."""
    try:
        with open(LAST_GOOD) as f:
            result = json.load(f)
    except (OSError, ValueError):
        log("no cached last-good bench result; aborting with empty output")
        sys.exit(1)
    result["stale"] = True
    result["stale_reason"] = "axon TPU relay unreachable; last hardware measurement shown"
    print(json.dumps(result))
    sys.exit(0)


def _spread(samples):
    med, iqr = _median_iqr(samples)
    return {
        "median_ms": round(med * 1e3, 3),
        "iqr_ms": round(iqr * 1e3, 3),
        "samples_ms": [round(s * 1e3, 3) for s in samples],
    }


def _update_last_good(result):
    """Refresh the outage-fallback cache, gated on median-not-worse.

    One noisy-low run must not overwrite a good measurement (the relay has
    shown ±15-25% single-sample swings); a >10% median regression is kept
    out of LAST_GOOD the first time it appears.  A *persistent* regression
    is real, though — if the same metric fails the gate on two consecutive
    runs AND the two refused medians agree with each other (within 10%),
    the cache accepts it, so the outage fallback never keeps claiming a
    number the hardware can no longer reproduce.  The refused result is
    parked in ``LAST_GOOD + '.refused'`` between runs to implement this.
    """
    refused_path = LAST_GOOD + ".refused"
    prev = refused = None
    try:
        with open(LAST_GOOD) as f:
            prev = json.load(f)
    except (OSError, ValueError):
        pass
    try:
        with open(refused_path) as f:
            refused = json.load(f)
    except (OSError, ValueError):
        pass
    # every headline metric must be median-not-worse: f32 inference, the
    # bf16 serving headline, and train — a noisy-low sample of any of them
    # must not overwrite a good cached number
    gate_keys = ("value", "bf16_frames_per_sec_per_chip",
                 "train_frames_per_sec_per_chip")
    if prev and not prev.get("stale"):
        regressed = [
            key for key in gate_keys
            if prev.get(key, 0.0) and result.get(key, 0.0) < 0.9 * prev[key]
        ]
        if regressed:
            reproduced = refused is not None and all(
                refused.get(key, 0.0)
                and abs(result.get(key, 0.0) - refused[key]) <= 0.1 * refused[key]
                for key in regressed
            )
            if not reproduced:
                log("not refreshing BENCH_LAST_GOOD: "
                    + ", ".join(
                        f"{k} median {result.get(k, 0.0):.0f} is >10% below "
                        f"cached {prev[k]:.0f}" for k in regressed)
                    + " (will accept if it reproduces next run)")
                try:
                    with open(refused_path, "w") as f:
                        json.dump(result, f, indent=1)
                except OSError as e:
                    log(f"could not park refused result: {e}")
                return
            log("accepting reproduced regression into BENCH_LAST_GOOD: "
                + ", ".join(regressed))
    try:
        with open(LAST_GOOD, "w") as f:
            json.dump(result, f, indent=1)
        if os.path.exists(refused_path):
            os.remove(refused_path)
    except OSError as e:
        log(f"could not cache last-good result: {e}")


def main():
    _wait_for_tpu()
    ref_fps, ref_train_fps = get_reference_fps()
    train_flops, infer_flops = get_flops()
    train_fps, train_step_s, train_samples = measure_ours_train()
    fps, infer_step_s, infer_samples = measure_ours()
    vs = fps / ref_fps if ref_fps else 0.0
    result = {
        "metric": "frames_per_sec_per_chip",
        "value": round(fps, 1),
        "unit": "frames/s",
        "vs_baseline": round(vs, 2),
        "train_frames_per_sec_per_chip": round(train_fps, 1),
        "train_dtype": "bfloat16",
    }
    if ref_train_fps:
        result["train_vs_baseline"] = round(train_fps / ref_train_fps, 2)
    # absolute utilization: achieved TFLOP/s and fraction of v5e bf16 peak
    if train_flops:
        tflops = train_flops / train_step_s / 1e12
        result["tflops_train"] = round(tflops, 1)
        result["mfu_train"] = round(tflops / PEAK_TFLOPS_BF16, 3)
    if infer_flops:
        tflops = infer_flops / infer_step_s / 1e12
        result["tflops_infer"] = round(tflops, 1)
        result["mfu_infer"] = round(tflops / PEAK_TFLOPS_BF16, 3)
    spread = {
        "train_step": _spread(train_samples),
        "infer_step": _spread(infer_samples),
    }
    # bf16 inference — the production serving recipe (configs/havid_tpu.yaml;
    # within-run matrix in BASELINE.md: 1.185x f32, int8 adds nothing on
    # top).  Guarded — a failure must not cost the round its headline.
    try:
        fps_bf16, _, bf16_samples = measure_ours(dtype="bfloat16")
        result["bf16_frames_per_sec_per_chip"] = round(fps_bf16, 1)
        result["bf16_speedup_vs_f32"] = round(fps_bf16 / fps, 3)
        spread["bf16_step"] = _spread(bf16_samples)
    except Exception as e:  # noqa: BLE001
        log(f"bf16 inference measurement failed (field omitted): {e!r}")
    # int8-quantized inference (TPU.quantize_infer): guarded likewise
    try:
        fps_q8, _, q8_samples = measure_ours(quantize="int8")
        result["int8_frames_per_sec_per_chip"] = round(fps_q8, 1)
        result["int8_speedup_vs_f32"] = round(fps_q8 / fps, 3)
        spread["int8_step"] = _spread(q8_samples)
    except Exception as e:  # noqa: BLE001
        log(f"int8 inference measurement failed (field omitted): {e!r}")
    result["spread"] = spread
    result["measured_at"] = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
    _update_last_good(result)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
