#!/usr/bin/python3
"""One-shot TPU verification of the in-kernel dropout path of the fused
dilated-residual Pallas kernel (ops/pallas/dilated_conv.py).

Checks, on the real chip (interpret mode cannot run the TPU PRNG):
  1. forward(rate>0) == XLA unfused forward using the mask extracted via
     ``dropout_mask`` (bit-for-bit mask regeneration);
  2. custom-VJP grads == jax.grad of that XLA forward (same mask);
  3. keep-fraction statistics match 1-rate;
  4. different seeds give different masks, same seed gives the same mask.

Prints PASS/FAIL lines; exit code 0 iff all pass.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from fact_clip_tpu.ops.pallas.dilated_conv import (  # noqa: E402
    dilated_residual_layer, dropout_mask, _reference_forward_pieces,
)

ok = True


def check(name, cond):
    global ok
    print(("PASS" if cond else "FAIL"), name, flush=True)
    ok = ok and bool(cond)


def xla_forward(x, wd, bd, w1, b1, gamma, beta, m, dilation, eps=1e-5):
    a, z_pre = _reference_forward_pieces(x, wd, bd, w1, b1, dilation)
    z = z_pre * m + x
    mean = z.mean(axis=-1, keepdims=True)
    var = ((z - mean) ** 2).mean(axis=-1, keepdims=True)
    return (z - mean) * jax.lax.rsqrt(var + eps) * gamma + beta


def main():
    assert jax.default_backend() == "tpu", f"need TPU, got {jax.default_backend()}"
    B, T, C, d = 2, 640, 256, 4
    rate = 0.5
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    x = jax.random.normal(ks[0], (B, T, C), jnp.float32)
    wd = jax.random.normal(ks[1], (3, C, C)) * 0.05
    bd = jax.random.normal(ks[2], (C,)) * 0.05
    w1 = jax.random.normal(ks[3], (C, C)) * 0.05
    b1 = jax.random.normal(ks[4], (C,)) * 0.05
    # NB: gamma must not be constant and the loss must weight elements
    # unevenly — with gamma=1 and loss=sum(y^2), sum_j xhat_j^2 == C makes the
    # true gradient identically ~0 and the comparison pure cancellation noise.
    gamma = jax.random.normal(ks[5], (C,)) * 0.3 + 1.0
    beta = jax.random.normal(ks[6], (C,)) * 0.3
    lw = jax.random.normal(ks[7], (B, T, C))
    seed = jnp.array([12345], jnp.int32)

    m = np.asarray(dropout_mask(seed, shape=(B, T, C), rate=rate))
    keep_frac = (m > 0).mean()
    check(f"keep fraction {keep_frac:.4f} ~ {1 - rate}", abs(keep_frac - (1 - rate)) < 0.01)
    scale_vals = np.unique(m)
    check(f"mask values {{0, 1/(1-p)}}: {scale_vals}", np.allclose(scale_vals, [0.0, 1.0 / (1 - rate)]))

    m2 = np.asarray(dropout_mask(seed, shape=(B, T, C), rate=rate))
    check("same seed -> same mask", np.array_equal(m, m2))
    m3 = np.asarray(dropout_mask(jnp.array([54321], jnp.int32), shape=(B, T, C), rate=rate))
    check("different seed -> different mask", not np.array_equal(m, m3))

    y_pallas = np.asarray(
        dilated_residual_layer(x, wd, bd, w1, b1, gamma, beta, dilation=d, rate=rate, seed=seed)
    )
    y_xla = np.asarray(xla_forward(x, wd, bd, w1, b1, gamma, beta, jnp.asarray(m), d))
    err = np.abs(y_pallas - y_xla).max()
    # TPU matmuls at default precision truncate inputs to bf16; ~1e-3 skew
    # between the kernel and the XLA reference is precision, not a mask bug.
    check(f"forward matches XLA-with-extracted-mask (max err {err:.2e})", err < 3e-3)

    def loss_pallas(x, wd, bd, w1, b1, gamma, beta):
        y = dilated_residual_layer(x, wd, bd, w1, b1, gamma, beta, dilation=d, rate=rate, seed=seed)
        return (lw * y).sum()

    def loss_xla(x, wd, bd, w1, b1, gamma, beta):
        y = xla_forward(x, wd, bd, w1, b1, gamma, beta, jnp.asarray(m), d)
        return (lw * y).sum()

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2, 3, 4, 5, 6))(x, wd, bd, w1, b1, gamma, beta)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2, 3, 4, 5, 6))(x, wd, bd, w1, b1, gamma, beta)
    names = ["dx", "dwd", "dbd", "dw1", "db1", "dgamma", "dbeta"]
    for n, a, b in zip(names, gp, gx):
        a, b = np.asarray(a), np.asarray(b)
        rel = np.abs(a - b).max() / (np.abs(b).max() + 1e-9)
        check(f"grad {n} matches (rel err {rel:.2e})", rel < 5e-3)

    # rate=0 unchanged vs no-dropout call
    y0 = np.asarray(dilated_residual_layer(x, wd, bd, w1, b1, gamma, beta, dilation=d))
    y0b = np.asarray(
        dilated_residual_layer(x, wd, bd, w1, b1, gamma, beta, dilation=d, rate=0.0, seed=seed)
    )
    check("rate=0 identical to no-dropout path", np.array_equal(y0, y0b))

    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
