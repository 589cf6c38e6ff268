#!/usr/bin/python3
"""Run the real-Mosaic kernel verification suite on the TPU and capture a
per-check artifact (VERIFY_r0N.json).

CI exercises the Pallas kernels only in interpret mode on CPU
(tests/conftest.py pins the platform); the checks here run the compiled
Mosaic kernels on actual hardware — fused MSTCN/MSTCN++ forward+backward,
flash MHA backward, in-kernel PRNG dropout — against f32-precision XLA
references.  Capturing the result per round means a silent kernel regression
can't ship while the bench loss stays finite.

Usage:
  python scripts/verify_hardware.py [--out VERIFY_r03.json]

Exit code 0 iff every check in every suite passes.
"""

import argparse
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Ordered so the kernels most recently changed (i.e. least recently
# hardware-verified) run first — if the relay drops mid-run, the artifact
# still covers the riskiest code.  verify_x2y_bwd is also the slowest
# suite (~21 min of compiles), so it goes last.
SUITES = ["verify_compose.py", "verify_outproj.py",
          "verify_quant.py", "verify_sa_layer.py", "verify_frame_loss.py",
          "verify_assignment.py", "verify_stack_bwd.py", "verify_pallas_mha.py",
          "verify_pallas_dropout.py", "verify_x2y_bwd.py"]

LINE = re.compile(r"^(PASS|FAIL)\s+(\S.*?)(?:\s+rel-err\s+([0-9.e+-]+))?\s*$")


def run_suite(script: str):
    t0 = time.time()
    env = dict(os.environ)
    # effective when set before launch: sitecustomize imports jax at
    # interpreter startup, which snapshots this env var
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", script)],
        capture_output=True, text=True, cwd=REPO, timeout=3600, env=env,
    )
    checks = []
    for raw in proc.stdout.splitlines():
        m = LINE.match(raw.strip())
        if not m:
            continue
        entry = {"name": m.group(2).strip(), "pass": m.group(1) == "PASS"}
        if m.group(3):
            entry["rel_err"] = float(m.group(3))
        checks.append(entry)
    return {
        "suite": script,
        "returncode": proc.returncode,
        "elapsed_s": round(time.time() - t0, 1),
        "checks": checks,
        "ok": proc.returncode == 0 and bool(checks) and all(c["pass"] for c in checks),
        **({} if proc.returncode == 0 else {"stderr_tail": proc.stderr[-2000:]}),
    }


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", default=os.path.join(REPO, "VERIFY.json"))
    args = parser.parse_args()

    import jax  # platform stamp only; suites initialize their own runtimes

    # write the artifact INCREMENTALLY after each suite: a relay outage or
    # an external timeout mid-run then still leaves a truthful partial
    # artifact (suites not yet run are listed as pending)
    results = []

    def flush():
        artifact = {
            "platform": jax.default_backend(),
            "device": str(jax.devices()[0]),
            "timestamp": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            "suites": results,
            "pending": SUITES[len(results):],
            "ok": bool(results) and all(r["ok"] for r in results) and len(results) == len(SUITES),
            "n_checks": sum(len(r["checks"]) for r in results),
            "n_pass": sum(sum(c["pass"] for c in r["checks"]) for r in results),
        }
        with open(args.out, "w") as f:
            json.dump(artifact, f, indent=1)
        return artifact

    for s in SUITES:
        results.append(run_suite(s))
        artifact = flush()
        print(f"[{len(results)}/{len(SUITES)}] {s}: "
              f"{'ok' if results[-1]['ok'] else 'FAIL'}", flush=True)
    print(f"{artifact['n_pass']}/{artifact['n_checks']} checks pass "
          f"({'OK' if artifact['ok'] else 'FAIL'}) -> {args.out}")
    sys.exit(0 if artifact["ok"] else 1)


if __name__ == "__main__":
    main()
