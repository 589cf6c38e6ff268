#!/usr/bin/python3
"""Verify the fused frame CE + smoothing loss kernels on real TPU hardware
against the plain-XLA loss implementations.

Covers the tiled forward (per-video CE and smoothing sums accumulated
across row tiles) and the custom backward (direct dlogits) at flagship,
epic-length, and wide-class shapes (reference math:
/root/reference/fact_clip/models/loss.py:8-18,246-258).

CI runs these kernels only in interpret mode on CPU
(tests/test_pallas_kernels.py); this script is part of the
scripts/verify_hardware.py suite that writes VERIFY_r0N.json each round.

Prints PASS/FAIL lines; exit code 0 iff all pass.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from fact_clip_tpu.models import losses
from fact_clip_tpu.ops.pallas.frame_loss import fused_ce_smooth_sums, fused_smooth_sum

ok = True


def check(name, cond, detail=""):
    global ok
    print(("PASS" if cond else "FAIL"), name, detail, flush=True)
    ok = ok and bool(cond)


def main():
    assert jax.default_backend() == "tpu", jax.default_backend()
    rng = np.random.default_rng(0)
    shapes = [("flagship", 8, 2972, 48), ("wide-lanes", 8, 3000, 128),
              ("epic-T", 1, 24576, 97), ("wide-classes", 2, 3000, 300)]
    for tag, B, T, C in shapes:
        logits = jnp.array(rng.normal(size=(B, T, C)).astype(np.float32) * 2.0)
        labels = jnp.array(rng.integers(0, C, size=(B, T)), jnp.int32)
        lengths = rng.integers(T // 2, T + 1, size=B)
        lengths[0] = T
        mask = jnp.array(np.arange(T)[None, :] < lengths[:, None])
        cw = jnp.array(rng.uniform(0.5, 1.5, size=(C,)).astype(np.float32))
        pair_mask = mask[:, 1:] & mask[:, :-1]
        wce = jnp.array(rng.normal(size=(B,)).astype(np.float32))
        wsl = jnp.array(rng.normal(size=(B,)).astype(np.float32))

        def f_fused(x):
            ce, sl = fused_ce_smooth_sums(x, labels, mask, cw)
            m = mask.astype(jnp.float32).sum(1)
            fl = ce / jnp.maximum(m, 1e-12)
            s = sl / jnp.maximum(pair_mask.sum(1) * C, 1e-12)
            return (wce * fl + wsl * s).sum()

        def f_xla(x):
            fl = losses.frame_loss(x, labels, mask, cw)
            s = losses.smooth_loss(x, pair_mask)
            return (wce * fl + wsl * s).sum()

        va, ga = jax.jit(jax.value_and_grad(f_fused))(logits)
        vb, gb = jax.jit(jax.value_and_grad(f_xla))(logits)
        va, ga, vb, gb = map(np.asarray, (va, ga, vb, gb))
        # the clip(d^2, 16) subgradient at EXACTLY d^2==16 is a tie-break
        # (kernel passes the gradient, XLA's min/max splits it); mask pairs
        # straddling the edge out of the comparison — either choice is a
        # valid subgradient and random data does hit 16.0 to the ulp
        ls = np.asarray(jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1))
        d2 = (ls[:, 1:] - ls[:, :-1]) ** 2
        edge = np.abs(d2 - 16.0) < 1e-3
        tie = np.zeros(ga.shape, bool)
        tie[:, :-1] |= edge
        tie[:, 1:] |= edge
        ga, gb = np.where(tie, 0.0, ga), np.where(tie, 0.0, gb)
        rel_v = float(abs(va - vb) / max(abs(vb), 1e-12))
        abs_g = float(np.abs(ga - gb).max())
        rel_g = float(abs_g / (np.abs(gb).max() + 1e-12))
        check(f"frame-loss-fwd {tag} B={B} T={T} C={C}", rel_v < 1e-5,
              f"rel-err {rel_v:.2e}")
        # the 1/(pairs*C) normalizers push |g| to ~1e-3, so rel-to-max
        # over-amplifies reduction-order f32 noise; accept a 5e-6 abs floor
        check(f"frame-loss-bwd {tag} B={B} T={T} C={C}",
              rel_g < 1e-4 or abs_g < 5e-6, f"rel-err {rel_g:.2e}")

        sl_only = np.asarray(jax.jit(fused_smooth_sum)(logits, mask))
        sl_ref = np.asarray(losses.smooth_loss(logits, pair_mask)
                            * jnp.maximum(pair_mask.sum(1) * C, 1e-12))
        rel_s = float(np.abs(sl_only - sl_ref).max() / (np.abs(sl_ref).max() + 1e-12))
        check(f"smooth-only {tag} B={B} T={T} C={C}", rel_s < 1e-5,
              f"rel-err {rel_s:.2e}")

    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
