#!/usr/bin/python3
"""One-shot TPU verification of the fused MSTCN-stack backward kernels
(ops/pallas/dilated_conv.py::_stack_bwd).

Checks on the real chip (interpret mode cannot run the TPU PRNG):
  1. f32 grads (x + all layer params) == jax.grad of the XLA stack
     reference, use_ln True and False, dropout 0;
  2. dropout>0 grads == jax.grad of the XLA reference using the
     regenerated ``dropout_mask`` (bit-for-bit PRNG parity);
  3. bf16 grads finite, correct dtypes, cosine > 0.99 vs f32;
  4. dilation > tile case matches the reference.

Prints PASS/FAIL lines; exit code 0 iff all pass.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from fact_clip_tpu.ops.pallas.dilated_conv import (  # noqa: E402
    _stack2_reference, _stack_reference, dilated_residual2_stack,
    dilated_residual_stack,
)

ok = True


def check(name, cond, detail=""):
    global ok
    print(("PASS" if cond else "FAIL"), name, detail, flush=True)
    ok = ok and bool(cond)


def rand_layers(key, C, n):
    ks = jax.random.split(key, n * 6).reshape(n, 6, -1)
    out = []
    for i in range(n):
        out.append((
            jax.random.normal(ks[i, 0], (3, C, C)) * 0.08,
            jax.random.normal(ks[i, 1], (C,)) * 0.05,
            jax.random.normal(ks[i, 2], (C, C)) * 0.08,
            jax.random.normal(ks[i, 3], (C,)) * 0.05,
            jax.random.normal(ks[i, 4], (C,)) * 0.2 + 1.0,
            jax.random.normal(ks[i, 5], (C,)) * 0.2,
        ))
    return tuple(out)


def grads_close(ga, gb, tol, name):
    leaves_a = jax.tree_util.tree_leaves(ga)
    leaves_b = jax.tree_util.tree_leaves(gb)
    worst = 0.0
    for a, b in zip(leaves_a, leaves_b):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        scale = max(1.0, np.abs(b).max())
        worst = max(worst, float(np.abs(a - b).max() / scale))
    check(name, worst < tol, f"rel-err {worst:.2e}")


def main():
    assert jax.default_backend() == "tpu", f"need TPU, got {jax.default_backend()}"
    # f32 comparisons run under default_matmul_precision("float32"): the XLA
    # reference otherwise runs at the TPU default (bf16 mantissas), which is
    # LESS accurate than the fused kernels' f32-accumulating MXU ops and
    # shows ~1e-2 broadband noise.  (Scoped: the bf16 section must lower
    # bf16 Pallas matmuls, which reject an fp32 contract precision.)
    f32prec = jax.default_matmul_precision("float32")
    key = jax.random.PRNGKey(0)
    B, T, C = 4, 700, 256
    dil = (1, 4, 16, 64)
    x = jax.random.normal(key, (B, T, C), jnp.float32)
    mask = np.ones((B, T), bool)
    mask[2, 500:] = False
    mask = jnp.array(mask)
    layers = rand_layers(jax.random.PRNGKey(1), C, len(dil))
    lw = jax.random.normal(jax.random.PRNGKey(2), (B, T, C), jnp.float32)
    seeds = tuple(jnp.array([7 * i + 3], jnp.int32) for i in range(len(dil)))
    zero_seeds = tuple(jnp.zeros((1,), jnp.int32) for _ in dil)

    # 1. f32 no-dropout, LN on/off
    for use_ln in (True, False):
        def loss_f(x, layers):
            y = dilated_residual_stack(x, mask, layers, dil, use_ln=use_ln)
            return (lw * y).sum()

        def loss_r(x, layers):
            y = _stack_reference(x, mask, layers, dil, use_ln, 1e-5,
                                 (0.0,) * len(dil), zero_seeds, 512, False)
            return (lw * y).sum()

        with f32prec:
            gf = jax.jit(jax.grad(loss_f, argnums=(0, 1)))(x, layers)
            gr = jax.jit(jax.grad(loss_r, argnums=(0, 1)))(x, layers)
        if not use_ln:  # reference still computes LN-param grads as zeros
            pass
        grads_close(gf, gr, 2e-4, f"f32 grads ln={use_ln}")

    # 2. dropout>0: fused backward regenerates the identical keep mask
    rates = (0.3,) * len(dil)

    def loss_fd(x, layers):
        y = dilated_residual_stack(x, mask, layers, dil, rates=rates, seeds=seeds)
        return (lw * y).sum()

    def loss_rd(x, layers):
        y = _stack_reference(x, mask, layers, dil, True, 1e-5, rates, seeds,
                             512, False)
        return (lw * y).sum()

    with f32prec:
        gf = jax.jit(jax.grad(loss_fd, argnums=(0, 1)))(x, layers)
        gr = jax.jit(jax.grad(loss_rd, argnums=(0, 1)))(x, layers)
    grads_close(gf, gr, 2e-4, "dropout=0.3 grads")

    # 3. bf16
    bf = jnp.bfloat16
    x16 = x.astype(bf)
    layers16 = tuple((wd.astype(bf), bd, w1.astype(bf), b1, g, b)
                     for (wd, bd, w1, b1, g, b) in layers)

    def loss16(x, layers):
        y = dilated_residual_stack(x, mask, layers, dil, rates=rates, seeds=seeds)
        return (lw * y.astype(jnp.float32)).sum()

    g16 = jax.jit(jax.grad(loss16, argnums=(0, 1)))(x16, layers16)
    l16 = jax.tree_util.tree_leaves(g16)
    lf = jax.tree_util.tree_leaves(gf)
    check("bf16 dtypes", all(a.dtype == p.dtype for a, p in
                             zip(l16, jax.tree_util.tree_leaves((x16, layers16)))))
    check("bf16 finite", all(np.isfinite(np.asarray(a, np.float32)).all() for a in l16))
    va = np.concatenate([np.asarray(a, np.float32).ravel() for a in l16])
    vb = np.concatenate([np.asarray(b, np.float32).ravel() for b in lf])
    cos = float(va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb) + 1e-12))
    check("bf16 cosine vs f32", cos > 0.99, f"{cos:.5f}")

    # 4. dilation > tile (short bucket, deep tower)
    Ts, ds = 96, 64
    xs = jax.random.normal(jax.random.PRNGKey(3), (B, Ts, C), jnp.float32)
    ms = jnp.array(np.ones((B, Ts), bool))
    lws = jax.random.normal(jax.random.PRNGKey(4), (B, Ts, C), jnp.float32)
    lay_s = rand_layers(jax.random.PRNGKey(5), C, 2)
    zs = tuple(jnp.zeros((1,), jnp.int32) for _ in range(2))

    with f32prec:
        gf = jax.jit(jax.grad(lambda x, l: (lws * dilated_residual_stack(
            x, ms, l, (ds, ds))).sum(), argnums=(0, 1)))(xs, lay_s)
        gr = jax.jit(jax.grad(lambda x, l: (lws * _stack_reference(
            x, ms, l, (ds, ds), True, 1e-5, (0.0, 0.0), zs, 512, False)).sum(),
            argnums=(0, 1)))(xs, lay_s)
    grads_close(gf, gr, 2e-4, "dilation>tile grads")

    # 5. MS-TCN++ stack backward (dual dilation), f32 + dropout
    def rand2(k):
        ks = jax.random.split(k, 7)
        return (jax.random.normal(ks[0], (3, C, C)) * 0.08,
                jax.random.normal(ks[1], (C,)) * 0.05,
                jax.random.normal(ks[2], (3, C, C)) * 0.08,
                jax.random.normal(ks[3], (C,)) * 0.05,
                jax.random.normal(ks[4], (C, C)) * 0.08,
                jax.random.normal(ks[5], (C, C)) * 0.08,
                jax.random.normal(ks[6], (C,)) * 0.05)

    pairs = ((16, 1), (1, 16))
    lay2 = tuple(rand2(k) for k in jax.random.split(jax.random.PRNGKey(6), 2))
    seeds2 = tuple(jnp.array([11 * i + 5], jnp.int32) for i in range(2))
    rates2 = (0.3, 0.0)

    def loss2_f(x, layers):
        y = dilated_residual2_stack(x, mask, layers, pairs, rates=rates2,
                                    seeds=seeds2)
        return (lw * y).sum()

    def loss2_r(x, layers):
        y = _stack2_reference(x, mask, layers, pairs, rates2, seeds2, 512, False)
        return (lw * y).sum()

    with f32prec:
        gf = jax.jit(jax.grad(loss2_f, argnums=(0, 1)))(x, lay2)
        gr = jax.jit(jax.grad(loss2_r, argnums=(0, 1)))(x, lay2)
    grads_close(gf, gr, 2e-4, "mstcn2 dropout grads")

    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
