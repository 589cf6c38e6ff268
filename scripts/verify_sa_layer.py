#!/usr/bin/python3
"""One-shot TPU verification of the fused SA/FFN action-branch sublayer
kernels (ops/pallas/sa_layer.py) through the SALayer / SCALayer modules.

CI covers these kernels only in interpret mode on CPU
(tests/test_pallas_kernels.py); this script runs the Mosaic lowering on the
real chip at production shapes (flagship havid: M=40 tokens, E=512, H=8,
F=2048; breakfast: M=60):

  1. rate=0 fused SALayer fwd + grads == the XLA module path, shared params;
  2. same for SCALayer (self-attn + FFN fused around plain cross-attn);
  3. bf16 mixed-precision variant within bf16 tolerance;
  4. dropout mode: bit-exact in-kernel mask extraction (sa_dropout_masks /
     ffn_dropout_masks replay the kernels' PRNG draw sequence) feeds an XLA
     reference that fwd AND grads must match, proving the backward's mask
     regeneration equals the forward's draw; plus seed-sensitivity checks.

Prints PASS/FAIL lines; exit code 0 iff all pass.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

# Strict-f32 XLA reference: without this the XLA module path runs its f32
# matmuls as single-pass bf16 on the MXU and the "reference" is ~1e-3 off
# itself; the Pallas kernels' f32 dots are full-precision either way.
jax.config.update("jax_default_matmul_precision", "highest")

import jax.numpy as jnp
import numpy as np

from fact_clip_tpu.models.layers import SALayer, SCALayer

ok = True


def check(name, cond, detail=""):
    global ok
    print(("PASS" if cond else "FAIL"), name, detail, flush=True)
    ok = ok and bool(cond)


def grads_close(ga, gb, tol, name):
    worst = 0.0
    for a, b in zip(jax.tree_util.tree_leaves(ga), jax.tree_util.tree_leaves(gb)):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        scale = max(1.0, np.abs(b).max())
        worst = max(worst, float(np.abs(a - b).max() / scale))
    check(name, worst < tol, f"rel-err {worst:.2e}")


def grads_cosine(ga, gb, thresh, name):
    """bf16 comparison: elementwise error is dominated by bf16 rounding noise
    in both stacks, so compare direction of the concatenated grad vector."""
    va = np.concatenate([np.asarray(t, np.float32).ravel()
                         for t in jax.tree_util.tree_leaves(ga)])
    vb = np.concatenate([np.asarray(t, np.float32).ravel()
                         for t in jax.tree_util.tree_leaves(gb)])
    cos = float(va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb) + 1e-12))
    check(name, np.isfinite(va).all() and cos > thresh, f"cosine {cos:.5f}")


def sa_pair(E, H, F, dtype=None):
    plain = SALayer(E, H, F, dropout=0.2, attn_dropout=0.1, dtype=dtype)
    fused = SALayer(E, H, F, dropout=0.2, attn_dropout=0.1, dtype=dtype,
                    use_pallas_sa=True)
    return plain, fused


def run_sa(B, M, E, H, F, tag, dtype=None, tol=2e-5, gtol=1e-3, cosine=False):
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 3)
    x = jax.random.normal(ks[0], (B, M, E), jnp.float32)
    pos = jax.random.normal(ks[1], (M, E), jnp.float32)
    lw = jax.random.normal(ks[2], (B, M, E), jnp.float32)
    plain, fused = sa_pair(E, H, F, dtype)
    params = plain.init(jax.random.PRNGKey(1), x, x, x, query_pos=pos, key_pos=pos)

    def loss(mod):
        def f(p, xx):
            y = mod.apply(p, xx, xx, xx, query_pos=pos, key_pos=pos)
            return (y.astype(jnp.float32) * lw).sum()
        return jax.jit(jax.value_and_grad(f, argnums=(0, 1)))

    (lp, (gp, gx)) = loss(plain)(params, x)
    (lf, (gfp, gfx)) = loss(fused)(params, x)
    yp = jax.jit(lambda p: plain.apply(p, x, x, x, query_pos=pos, key_pos=pos))(params)
    yf = jax.jit(lambda p: fused.apply(p, x, x, x, query_pos=pos, key_pos=pos))(params)
    err = float(jnp.abs(yf.astype(jnp.float32) - yp.astype(jnp.float32)).max())
    check(f"SALayer fwd {tag}", err < (tol * 50 if dtype else 1e-4),
          f"max-err {err:.2e}")
    if cosine:
        grads_cosine((gfp, gfx), (gp, gx), gtol, f"SALayer grads {tag}")
    else:
        grads_close((gfp, gfx), (gp, gx), gtol, f"SALayer grads {tag}")


def run_sca(B, M, T, E, H, F, tag, tol=1e-4, gtol=1e-3):
    key = jax.random.PRNGKey(2)
    ks = jax.random.split(key, 5)
    tgt = jax.random.normal(ks[0], (B, M, E), jnp.float32)
    mem = jax.random.normal(ks[1], (B, T, E), jnp.float32)
    qpos = jax.random.normal(ks[2], (M, E), jnp.float32)
    mpos = jax.random.normal(ks[3], (T, E), jnp.float32)
    lw = jax.random.normal(ks[4], (B, M, E), jnp.float32)
    lens = np.full((B,), T)
    lens[-1] = T - 37
    mmask = jnp.array(np.arange(T)[None, :] < lens[:, None])

    plain = SCALayer(E, E, H, F, dropout=0.2, attn_dropout=0.1)
    fused = SCALayer(E, E, H, F, dropout=0.2, attn_dropout=0.1, use_pallas_sa=True)
    kw = dict(pos=mpos, query_pos=qpos, memory_mask=mmask)
    params = plain.init(jax.random.PRNGKey(3), tgt, mem, **kw)

    def loss(mod):
        def f(p, tt, mm):
            return (mod.apply(p, tt, mm, **kw).astype(jnp.float32) * lw).sum()
        return jax.jit(jax.value_and_grad(f, argnums=(0, 1, 2)))

    (lp, gp) = loss(plain)(params, tgt, mem)
    (lf, gf) = loss(fused)(params, tgt, mem)
    check(f"SCALayer loss {tag}", abs(float(lf - lp)) < 1e-3 * max(1.0, abs(float(lp))),
          f"{float(lp):.5f} vs {float(lf):.5f}")
    grads_close(gf, gp, gtol, f"SCALayer grads {tag}")


def _ln(res, s, b, eps=1e-6):
    mu = res.mean(axis=-1, keepdims=True)
    var = jnp.maximum((res * res).mean(axis=-1, keepdims=True) - mu * mu, 0.0)
    return (res - mu) * jax.lax.rsqrt(var + eps) * s + b


def run_dropout(B, M, E, H, F):
    """Dropout mode: extract the in-kernel masks bit-for-bit
    (sa_dropout_masks / ffn_dropout_masks mirror the kernels' PRNG draw
    sequence), build an XLA reference with those masks, and require fwd AND
    custom-VJP grads to match it — proving the backward regenerates the
    forward's masks exactly.  (A finite-difference check is hopeless here:
    f32 evaluation noise of the ~1e2-magnitude loss swamps the eps-scaled
    signal even at rate=0.)"""
    from fact_clip_tpu.ops.pallas.sa_layer import (
        ffn_dropout_masks, ffn_sublayer, sa_dropout_masks, sa_sublayer,
    )

    rate_attn, rate = 0.1, 0.2
    hd = E // H
    key = jax.random.PRNGKey(4)
    ks = jax.random.split(key, 16)
    x = jax.random.normal(ks[0], (B, M, E), jnp.float32)
    pos = jax.random.normal(ks[1], (1, M, E), jnp.float32)  # one shared table
    lw = jax.random.normal(ks[2], (B, M, E), jnp.float32)
    wq, wk, wv, wo = (jax.random.normal(ks[3 + i], (E, E)) * 0.05 for i in range(4))
    bq, bk, bv, bo = (jax.random.normal(ks[7 + i], (E,)) * 0.05 for i in range(4))
    ls = jax.random.normal(ks[11], (E,)) * 0.3 + 1.0
    lb = jax.random.normal(ks[12], (E,)) * 0.3
    w1 = jax.random.normal(ks[13], (E, F)) * 0.05
    b1 = jax.random.normal(ks[14], (F,)) * 0.02
    w2 = jax.random.normal(ks[15], (F, E)) * 0.05
    b2 = bo * 0.5
    seed = jnp.array([987654], jnp.int32)

    ka, ko = sa_dropout_masks(seed, B, M, E, H, rate_attn, rate)
    ka = np.asarray(ka).reshape(B, H, -1, ka.shape[-1])[:, :, :M, :M]
    ko = np.asarray(ko)[:, :M]
    k1, k2 = ffn_dropout_masks(seed, B, M, E, F, rate)
    k1, k2 = np.asarray(k1)[:, :M], np.asarray(k2)[:, :M]
    check("sa mask keep fraction ~ 0.9/0.8",
          abs(float((np.asarray(ka) > 0).mean()) - 0.9) < 0.01
          and abs(float((ko > 0).mean()) - 0.8) < 0.01)

    def sa_fused(args):
        x, wq, bq, wk, bk, wv, bv, wo, bo, ls, lb = args
        y = sa_sublayer(x, pos, wq, bq, wk, bk, wv, bv, wo, bo, ls, lb,
                        num_heads=H, rate_attn=rate_attn, rate=rate, seed=seed)
        return (y * lw).sum()

    def sa_xla(args):
        x, wq, bq, wk, bk, wv, bv, wo, bo, ls, lb = args
        a = x + pos
        q = (a @ wq + bq).reshape(B, M, H, hd)
        k = (a @ wk + bk).reshape(B, M, H, hd)
        v = (x @ wv + bv).reshape(B, M, H, hd)
        S = jnp.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(hd)
        P = jax.nn.softmax(S, axis=-1) * ka
        o = jnp.einsum("bhqk,bkhd->bqhd", P, v).reshape(B, M, E)
        out = (o @ wo + bo) * ko
        return (_ln(x + out, ls, lb) * lw).sum()

    args = (x, wq, bq, wk, bk, wv, bv, wo, bo, ls, lb)
    lf, gf = jax.jit(jax.value_and_grad(sa_fused))(args)
    lr, gr = jax.jit(jax.value_and_grad(sa_xla))(args)
    check("sa dropout fwd == XLA with extracted masks",
          abs(float(lf - lr)) < 1e-3 * max(1.0, abs(float(lr))),
          f"{float(lf):.5f} vs {float(lr):.5f}")
    grads_close(gf, gr, 2e-3, "sa dropout grads == XLA with extracted masks")

    def ffn_fused(args):
        x, w1, b1, w2, b2, ls, lb = args
        y = ffn_sublayer(x, w1, b1, w2, b2, ls, lb, rate=rate, seed=seed)
        return (y * lw).sum()

    def ffn_xla(args):
        x, w1, b1, w2, b2, ls, lb = args
        h = jnp.maximum(x @ w1 + b1, 0.0) * k1
        t2 = (h @ w2 + b2) * k2
        return (_ln(x + t2, ls, lb) * lw).sum()

    fargs = (x, w1, b1, w2, b2, ls, lb)
    lf, gf = jax.jit(jax.value_and_grad(ffn_fused))(fargs)
    lr, gr = jax.jit(jax.value_and_grad(ffn_xla))(fargs)
    check("ffn dropout fwd == XLA with extracted masks",
          abs(float(lf - lr)) < 1e-3 * max(1.0, abs(float(lr))),
          f"{float(lf):.5f} vs {float(lr):.5f}")
    grads_close(gf, gr, 2e-3, "ffn dropout grads == XLA with extracted masks")

    # determinism across applies (same seed), sensitivity to the seed
    y1 = jax.jit(lambda: sa_sublayer(x, pos, wq, bq, wk, bk, wv, bv, wo, bo,
                                     ls, lb, num_heads=H, rate_attn=rate_attn,
                                     rate=rate, seed=seed))()
    y2 = jax.jit(lambda s: sa_sublayer(x, pos, wq, bq, wk, bk, wv, bv, wo, bo,
                                       ls, lb, num_heads=H, rate_attn=rate_attn,
                                       rate=rate, seed=s))(seed + 1)
    check("dropout different seed -> different output",
          not bool(jnp.array_equal(y1, y2)))


def main():
    assert jax.default_backend() == "tpu", f"need TPU, got {jax.default_backend()}"
    run_sa(8, 40, 512, 8, 2048, "flagship f32")
    run_sa(8, 60, 512, 8, 2048, "breakfast-M f32")
    run_sa(8, 40, 512, 8, 2048, "flagship bf16", dtype=jnp.bfloat16, tol=2e-3,
           gtol=0.995, cosine=True)
    run_sca(8, 40, 512, 512, 8, 2048, "flagship f32")
    run_dropout(8, 40, 512, 8, 2048)
    print("ALL PASS" if ok else "FAILURES", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
