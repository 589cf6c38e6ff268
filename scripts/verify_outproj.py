#!/usr/bin/python3
"""Hardware (real Mosaic) verification of the fused tower out-projection
(ops/pallas/dilated_conv.py ``out_params``): forward must match
stack-then-dense and the full VJP must match the unfused composition.

Prints PASS/FAIL lines consumed by verify_hardware.py.
"""

import sys

sys.path.insert(0, "/root/repo")

import numpy as np


def check(name, err, tol):
    ok = err <= tol
    print(f"{'PASS' if ok else 'FAIL'} {name}  rel-err {err:.3e}")
    return ok


def main():
    import jax
    import jax.numpy as jnp

    from fact_clip_tpu.ops.pallas.dilated_conv import (
        dilated_residual2_stack, dilated_residual_stack)

    assert jax.default_backend() == "tpu", jax.default_backend()
    rng = np.random.default_rng(5)
    ok = True

    for name, stack, mk_layers, dils in [
        ("stack", dilated_residual_stack,
         lambda C: tuple(tuple(jnp.asarray(rng.standard_normal(s) * 0.1, jnp.float32)
                               for s in [(3, C, C), (C,), (C, C), (C,), (C,), (C,)])
                         for _ in range(3)),
         [1, 2, 4]),
        ("stack2", dilated_residual2_stack,
         lambda C: tuple(tuple(jnp.asarray(rng.standard_normal(s) * 0.1, jnp.float32)
                               for s in [(3, C, C), (C,), (3, C, C), (C,), (C, C), (C, C), (C,)])
                         for _ in range(3)),
         [(4, 1), (2, 2), (1, 4)]),
    ]:
        B, T, C, O = 2, 1500, 256, 128
        x = jnp.asarray(rng.standard_normal((B, T, C)), jnp.float32)
        mask = jnp.asarray(np.arange(T)[None, :] < np.array([T, T - 300])[:, None])
        layers = mk_layers(C)
        ow = jnp.asarray(rng.standard_normal((C, O)) * 0.1, jnp.float32)
        ob = jnp.asarray(rng.standard_normal((O,)) * 0.1, jnp.float32)
        kw = dict(use_ln=(name == "stack"))
        if name == "stack2":
            kw = {}

        def unfused(x, layers, ow, ob, stack=stack, kw=kw):
            y = stack(x, mask, layers, dils, **kw)
            return jnp.dot(y, ow, preferred_element_type=jnp.float32) + ob

        def fused(x, layers, ow, ob, stack=stack, kw=kw):
            return stack(x, mask, layers, dils, **kw, out_params=(ow, ob))

        a = np.asarray(jax.jit(unfused)(x, layers, ow, ob))
        b = np.asarray(jax.jit(fused)(x, layers, ow, ob))
        err = float(np.abs(a - b).max() / (np.abs(a).max() + 1e-9))
        ok &= check(f"outproj {name} forward", err, 2e-5)

        ct = jnp.asarray(rng.standard_normal(a.shape), jnp.float32)
        ga = jax.jit(jax.grad(lambda *args: (unfused(*args) * ct).sum(), argnums=(0, 1, 2, 3)))(
            x, layers, ow, ob)
        gb = jax.jit(jax.grad(lambda *args: (fused(*args) * ct).sum(), argnums=(0, 1, 2, 3)))(
            x, layers, ow, ob)
        worst = 0.0
        for p, q in zip(jax.tree_util.tree_leaves(ga), jax.tree_util.tree_leaves(gb)):
            p, q = np.asarray(p), np.asarray(q)
            worst = max(worst, float(np.abs(p - q).max() / (np.abs(p).max() + 1e-9)))
        ok &= check(f"outproj {name} grads", worst, 5e-4)

    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
