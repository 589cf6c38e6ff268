#!/usr/bin/python3
"""Hardware (real Mosaic) verification of the fused composed-decode kernels
(ops/pallas/compose_decode.py) against the exact XLA dense paths.

Prints PASS/FAIL lines consumed by verify_hardware.py.  Gates:

- factored_argmax must equal the XLA factored argmax EXACTLY (same f32
  reductions) and the dense argmax on continuous random inputs.
- mxu_argmax / blend_argmax use in-kernel 3-term bf16 splits (~f32-ulp
  compose error): agreement with the exact dense path must be >= 99.95%
  (flips only at near-exact ties; measured 1.000 at these shapes when the
  split survives — a LOWER number means the split degraded, the failure
  mode XLA's host-side convert simplification caused in round 5).
"""

import sys

sys.path.insert(0, "/root/repo")

import numpy as np


def check(name, ok, err=None):
    tag = "PASS" if ok else "FAIL"
    extra = f"  rel-err {err:.3e}" if err is not None else ""
    print(f"{tag} {name}{extra}")
    return ok


def main():
    import jax
    import jax.numpy as jnp

    from fact_clip_tpu.ops.pallas.compose_decode import (
        blend_argmax, factored_argmax, mxu_argmax)
    from fact_clip_tpu.ops.verbnoun_compose import (
        build_factored_tables, composed_argmax, composed_argmax_factored,
        composed_decode)

    assert jax.default_backend() == "tpu", jax.default_backend()
    rng = np.random.default_rng(11)
    n1, n2, n_act = 98, 301, 3806
    pairs = set()
    while len(pairs) < n_act:
        pairs.add((int(rng.integers(0, n1)), int(rng.integers(0, n2))))
    pairs = sorted(pairs)
    vids = jnp.asarray([p[0] for p in pairs], jnp.int32)
    nids = jnp.asarray([p[1] for p in pairs], jnp.int32)
    B, T, M = 1, 4096, 100
    lv = jnp.asarray(np.log(rng.dirichlet(np.ones(n1), size=(B, T))), jnp.float32)
    ln = jnp.asarray(np.log(rng.dirichlet(np.ones(n2), size=(B, T))), jnp.float32)

    ok = True
    ref = np.asarray(jax.jit(lambda a, b: composed_argmax(a, b, vids, nids))(lv, ln))

    got = np.asarray(jax.jit(lambda a, b: mxu_argmax(a, b, vids, nids))(lv, ln))
    agree = float((got == ref).mean())
    ok &= check("mxu_argmax agreement vs dense (jit)", agree >= 0.9995, 1 - agree)

    mvn, at = build_factored_tables(vids, nids, n1, n2)
    mvn, at = jnp.asarray(mvn), jnp.asarray(at)
    gf = np.asarray(jax.jit(lambda a, b: factored_argmax(a, b, mvn, at))(lv, ln))
    rf = np.asarray(jax.jit(lambda a, b: composed_argmax_factored(a, b, mvn, at))(lv, ln))
    ok &= check("factored_argmax bit-exact vs XLA factored", bool((gf == rf).all()))
    agree_f = float((gf == ref).mean())
    ok &= check("factored_argmax agreement vs dense", agree_f >= 0.9995, 1 - agree_f)

    alogp = jnp.asarray(np.log(rng.dirichlet(np.ones(n_act + 1), size=(B, M))), jnp.float32)
    attn = jnp.asarray(rng.standard_normal((B, T, M)), jnp.float32)
    tm = jnp.ones((B, M), bool)
    rd = np.asarray(jax.jit(lambda *a: composed_decode(*a, 0.5, tm))(
        alogp, attn, lv, ln, vids, nids))
    gd = np.asarray(jax.jit(lambda *a: composed_decode(*a, 0.5, tm, pallas=True))(
        alogp, attn, lv, ln, vids, nids))
    agree_b = float((gd == rd).mean())
    ok &= check("blend decode agreement vs dense (jit)", agree_b >= 0.9995, 1 - agree_b)

    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
