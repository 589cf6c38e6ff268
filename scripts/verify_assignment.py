#!/usr/bin/python3
"""Verify the on-device auction assignment solver on real TPU hardware
against scipy's Hungarian optimum.

The matcher decides the training targets (reference
/root/reference/fact_clip/models/loss.py:129-168), so it is the other
numerics-critical device component besides the Pallas kernels.  CI
exercises it on CPU (tests/test_matching.py); this script runs the
*compiled TPU* program — different matmul precision, different scheduling
of the bidding body — across the cost regimes the stress tests cover:
random, near-tie, adversarial grid-valued spreads (single and multi-phase
epsilon scaling), and the greedy o2m stage.

Prints PASS/FAIL lines; exit code 0 iff all pass (consumed by
scripts/verify_hardware.py -> VERIFY_r0N.json).  Set
FACT_VERIFY_ALLOW_CPU=1 to run the same checks on the CPU backend (logic
smoke only — the artifact must come from the TPU).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from scipy.optimize import linear_sum_assignment

from fact_clip_tpu.ops import assignment

ok = True


def check(name, cond, detail=""):
    global ok
    print(("PASS" if cond else "FAIL"), name, detail, flush=True)
    ok = ok and bool(cond)


def opt_cost(cost, s):
    rows, cols = linear_sum_assignment(cost[:, :s])
    return cost[rows, cols].sum()


def achieved(cost, seg_tok, s):
    return cost[np.array(seg_tok)[:s], np.arange(s)].sum()


def main():
    if not os.environ.get("FACT_VERIFY_ALLOW_CPU"):
        assert jax.default_backend() == "tpu", jax.default_backend()

    rng = np.random.default_rng(3)
    solve = jax.jit(assignment.auction_assign,
                    static_argnames=("phases", "with_stats"))

    # production-shaped random costs (M tokens x S segments, M > S)
    for _ in range(4):
        M, S = 40, int(rng.integers(4, 25))
        cost = -rng.uniform(0.0, 1.2, size=(M, 32)).astype(np.float32)
        col_valid = np.arange(32) < S
        seg_tok = solve(jnp.array(cost), jnp.array(col_valid))
        a, o = achieved(cost, seg_tok, S), opt_cost(cost, S)
        check(f"random-M{M}-S{S}", abs(a - o) <= 1e-5 + 1e-5 * abs(o),
              f"rel-err {abs(a - o) / max(abs(o), 1e-12):.3g}")

    # near-ties: every column within 1e-4 of every other
    cost = -np.ones((40, 16), np.float32) * 0.5
    cost += rng.normal(size=cost.shape).astype(np.float32) * 1e-4
    col_valid = np.ones(16, bool)
    seg_tok = solve(jnp.array(cost), jnp.array(col_valid))
    st = np.array(seg_tok)
    a, o = achieved(cost, seg_tok, 16), opt_cost(cost, 16)
    check("near-tie-distinct", len(set(st[:16].tolist())) == 16)
    check("near-tie-cost", abs(a - o) <= 2e-3,
          f"rel-err {abs(a - o) / max(abs(o), 1e-12):.3g}")

    # adversarial spreads (the test_matching stress cases): the achieved
    # cost must respect the solver's own eps-suboptimality bound, single
    # AND multi-phase, and leave nothing to the sequential safety net
    base = rng.normal(size=(40, 24)).astype(np.float32)
    spike = base.copy()
    spike[0, 0] = -1e4
    wide = base * np.logspace(0, 4, 24, dtype=np.float32)[None, :]
    grid = np.round(base * 2) * 1e3 + base * 1e-3
    col_valid = np.ones(24, bool)
    for name, cost in (("one-spike", spike), ("log-spread", wide),
                       ("grid-ties", grid)):
        for phases in (1, 4):
            seg_tok, stats = solve(jnp.array(cost), jnp.array(col_valid),
                                   with_stats=True, phases=phases)
            st = np.array(seg_tok)
            a, o = achieved(cost, seg_tok, 24), opt_cost(cost, 24)
            bound = float(stats["eps_bound"]) + 1e-5 * max(1.0, abs(o))
            check(f"{name}-phases{phases}",
                  len(set(st.tolist())) == 24 and a <= o + bound
                  and int(stats["fallback_segments"]) == 0,
                  f"rel-err {max(a - o, 0.0) / max(abs(o), 1e-12):.3g}")

    # o2m greedy stage: device program equals the CPU-backend program
    M, S, C = 40, 18, 11
    cost = -rng.uniform(0.0, 1.0, size=(M, 32)).astype(np.float32)
    transcript = rng.integers(0, C, size=32).astype(np.int32)
    col_valid = np.arange(32) < S
    o2m = jax.jit(assignment.o2m_assign, static_argnames="nclasses")
    dev = o2m(jnp.array(cost), jnp.array(transcript), jnp.array(col_valid), C)
    with jax.default_device(jax.devices("cpu")[0]):
        cpu = o2m(jnp.array(cost), jnp.array(transcript), jnp.array(col_valid), C)
    same = all(np.array_equal(np.array(d), np.array(c))
               for d, c in zip(jax.tree_util.tree_leaves(dev),
                               jax.tree_util.tree_leaves(cpu)))
    check("o2m-device-equals-cpu", same)

    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
