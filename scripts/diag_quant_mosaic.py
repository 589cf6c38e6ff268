"""Diagnose the mstcn-q8 Mosaic-vs-interpret divergence (VERIFY_r03).

Hypothesis: the LayerNorm rsqrt inside the q8 kernel is the only
transcendental between quantization steps; Mosaic's hardware rsqrt and
XLA:CPU's (interpret mode) differ by ~1 ulp, which flips ±1 int8 quanta at
the next layer's round() and accumulates across layers.  MSTCN++ (no LN)
is bit-exact across backends, consistent with this.

Checks, on the real TPU:
  1. use_ln=False mstcn stack: Mosaic vs interpret — expect ~0 if the
     hypothesis holds.
  2. use_ln=True, per-layer-count sweep L=1..6: error growth with depth.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from fact_clip_tpu.ops.pallas.quant_conv import dilated_residual_stack_q8


def _rel(a, b):
    return float(np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-30))


def _layers1(rng, C, L):
    layers = []
    for _ in range(L):
        wd = rng.normal(size=(3, C, C)).astype(np.float32) * (C ** -0.5)
        bd = np.zeros((C,), np.float32)
        w1 = rng.normal(size=(C, C)).astype(np.float32) * (C ** -0.5)
        b1 = np.zeros((C,), np.float32)
        g = np.ones((C,), np.float32)
        beta = np.zeros((C,), np.float32)
        layers.append(tuple(jnp.array(a) for a in (wd, bd, w1, b1, g, beta)))
    return layers


def main():
    assert jax.default_backend() == "tpu", jax.default_backend()
    rng = np.random.default_rng(0)
    B, T, C = 4, 300, 128
    x = jnp.array(rng.normal(size=(B, T, C)).astype(np.float32))
    mask = np.ones((B, T), bool)
    mask[-1, (3 * T) // 4:] = False
    mask = jnp.array(mask)

    # pre-generate the L=6 layer set once from a fixed seed and slice per
    # config, so the depth/LN sweep compares identical weight draws
    all_layers = _layers1(np.random.default_rng(1), C, 6)
    for use_ln, ln_impl in ((False, "rsqrt"), (True, "rsqrt"), (True, "div_sqrt")):
        for L in (1, 2, 4, 6):
            dils = [2 ** i for i in range(L)]
            layers = all_layers[:L]
            kw = dict(use_ln=use_ln, ln_impl=ln_impl)
            m = np.asarray(jax.jit(lambda x: dilated_residual_stack_q8(
                x, mask, layers, dils, **kw))(x))
            i = np.asarray(jax.jit(lambda x: dilated_residual_stack_q8(
                x, mask, layers, dils, interpret=True, **kw))(x))
            n_diff = int((m != i).sum())
            print(f"use_ln={use_ln} ln={ln_impl} L={L}: rel={_rel(m, i):.3e} "
                  f"n_diff={n_diff}/{m.size} max_abs={np.abs(m - i).max():.3e}",
                  flush=True)


if __name__ == "__main__":
    main()
