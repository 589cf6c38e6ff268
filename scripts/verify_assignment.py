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

    # production-shaped random costs (M tokens x S segments, M > S).
    # Gate at the solver's own eps-suboptimality bound (stats["eps_bound"]),
    # like the adversarial cases below — the auction only contracts
    # eps-optimality, so a tighter bitwise/1e-5 gate would flag legitimate
    # eps-suboptimal assignments as hardware failures.
    for _ in range(4):
        M, S = 40, int(rng.integers(4, 25))
        cost = -rng.uniform(0.0, 1.2, size=(M, 32)).astype(np.float32)
        col_valid = np.arange(32) < S
        seg_tok, stats = solve(jnp.array(cost), jnp.array(col_valid),
                               with_stats=True)
        a, o = achieved(cost, seg_tok, S), opt_cost(cost, S)
        bound = float(stats["eps_bound"]) + 1e-5 * max(1.0, abs(o))
        check(f"random-M{M}-S{S}", a <= o + bound,
              f"rel-err {max(a - o, 0.0) / max(abs(o), 1e-12):.3g}")

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

    # o2m greedy stage, decomposed against host-numpy references.  (No CPU
    # jax backend here: the deployment image pins jax_platforms to the
    # single axon TPU, so jax.devices("cpu") raises on the artifact run.)
    M, S, C = 40, 18, 11
    cost = -rng.uniform(0.0, 1.0, size=(M, 32)).astype(np.float32)
    transcript = rng.integers(0, C, size=32).astype(np.int32)
    col_valid = np.arange(32) < S

    # (a) stage-1 inputs: per-class summed cost must match exact f64 host
    # summation (the matmul runs at Precision.HIGHEST for exactly this)
    cc_fn = jax.jit(assignment.o2m_class_cost, static_argnames="nclasses")
    dev_cc, dev_present = cc_fn(jnp.array(cost), jnp.array(transcript),
                                jnp.array(col_valid), C)
    onehot = np.eye(C, dtype=np.float64)[transcript] * col_valid[:, None]
    host_cc = cost.astype(np.float64) @ onehot
    cc_err = np.abs(np.array(dev_cc, np.float64) - host_cc).max()
    check("o2m-class-cost-exact", cc_err <= 1e-5 * max(1.0, np.abs(host_cc).max()),
          f"max-abs-err {cc_err:.3g}")
    check("o2m-class-present", np.array_equal(np.array(dev_present), onehot.sum(0) > 0))

    # (b) stage-1 class auction: eps-optimal vs scipy on the present classes
    tok_for_class, stats = solve(dev_cc, dev_present, with_stats=True)
    present = np.array(dev_present)
    rows, cols = linear_sum_assignment(host_cc[:, present])
    o = host_cc[rows, cols].sum()
    a = host_cc[np.array(tok_for_class)[present], np.arange(C)[present]].sum()
    bound = float(stats["eps_bound"]) + 1e-5 * max(1.0, abs(o))
    check("o2m-class-auction", a <= o + bound,
          f"rel-err {max(a - o, 0.0) / max(abs(o), 1e-12):.3g}")

    # (c) stage 2: given the device's class assignment, the segment->token
    # resolution is pure argmin bookkeeping — host replication is exact
    st2 = jax.jit(assignment.o2m_stage2, static_argnames="nclasses")
    dev_seg = np.array(st2(jnp.array(cost), jnp.array(transcript),
                           jnp.array(col_valid), tok_for_class, dev_present, C))
    cheap = np.where(present[None, :], np.array(dev_cc), np.inf).argmin(axis=1)
    tok_class = cheap.copy()
    tfc = np.array(tok_for_class)
    for c in np.arange(C)[present]:
        tok_class[tfc[c]] = c
    same_class = tok_class[:, None] == transcript[None, :]
    masked = np.where(same_class, cost, np.inf)
    host_seg = masked.argmin(axis=0)
    host_seg = np.where(same_class.any(axis=0), host_seg, cost.argmin(axis=0))
    host_seg = np.where(col_valid, host_seg, 0)
    check("o2m-stage2-exact", np.array_equal(dev_seg, host_seg))

    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
