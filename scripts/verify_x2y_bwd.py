#!/usr/bin/python3
"""Verify the fused X2Y cross-attention BACKWARD kernels on real TPU
hardware against a strict-f32 XLA reference.

Covers both directions at production-like shapes:
  * flash (f2a): X = frames (large), one pass over X tiles emitting
    d_x / d_xpos / d_yq / d_wk / d_bk / d_wv / d_bv
  * small-X (a2f): Y = frames (large), one pass over Y tiles emitting
    d_y / d_ypos / d_xk / d_xv / d_wq / d_bq

CI runs these kernels only in interpret mode on CPU
(tests/test_pallas_kernels.py); this script is part of the
scripts/verify_hardware.py suite that writes VERIFY_r0N.json each round.

Prints PASS/FAIL lines; exit code 0 iff all pass.
"""

import math
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from fact_clip_tpu.ops.pallas.x2y_attn import x2y_attention

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


def xla_reference(y_in, y_pos, x_in, x_pos, wk, bk, wv, bv, wq, bq, x_len):
    d = wq.shape[1]
    yq = jnp.einsum("byc,cd->byd", y_in + y_pos, wq) + bq
    xk = jnp.einsum("bxc,cd->bxd", x_in + x_pos, wk) + bk
    xv = jnp.einsum("bxc,cd->bxd", x_in, wv) + bv
    logits = jnp.einsum("byd,bxd->byx", yq, xk) / math.sqrt(d)
    X = x_in.shape[1]
    colmask = jnp.arange(X)[None, None, :] < x_len[:, None, None]
    logits = jnp.where(colmask, logits, -1e9)
    probs = jax.nn.softmax(logits, axis=-1)
    attn = jnp.einsum("byx,bxd->byd", probs, xv)
    return attn, probs, logits


def run_case(name, B, X, Y, Cx, Cy, d, seed):
    rng = np.random.default_rng(seed)
    y_in = jnp.asarray(rng.normal(size=(B, Y, Cy)).astype(np.float32))
    y_pos = jnp.asarray(rng.normal(size=(1, Y, Cy)).astype(np.float32) * 0.1)
    x_in = jnp.asarray(rng.normal(size=(B, X, Cx)).astype(np.float32))
    x_pos = jnp.asarray(rng.normal(size=(1, X, Cx)).astype(np.float32) * 0.1)
    mk = lambda *s: jnp.asarray(rng.normal(size=s).astype(np.float32) * 0.05)  # noqa: E731
    wk, bk, wv, bv, wq, bq = mk(Cx, d), mk(d), mk(Cx, d), mk(d), mk(Cy, d), mk(d)
    x_len = jnp.asarray(np.full((B,), X, np.int32).copy())
    x_len = x_len.at[0].set(max(1, X - 5))
    wa = jnp.asarray(rng.normal(size=(B, Y, d)).astype(np.float32))
    wp = jnp.asarray(rng.normal(size=(B, Y, X)).astype(np.float32))

    args = (y_in, y_pos, x_in, x_pos, wk, bk, wv, bv, wq, bq)

    def loss_fused(*a):
        attn, probs, logits = x2y_attention(*a, x_len, tile=512)
        return ((wa * attn).sum() + (wp * probs).sum()
                + jnp.where(logits > -1e8, jnp.tanh(logits), 0.0).sum() * 0.01)

    def loss_ref(*a):
        attn, probs, logits = xla_reference(*a, x_len)
        return ((wa * attn).sum() + (wp * probs).sum()
                + jnp.where(logits > -1e8, jnp.tanh(logits), 0.0).sum() * 0.01)

    with jax.default_matmul_precision("float32"):
        gf = jax.jit(jax.grad(loss_fused, argnums=tuple(range(10))))(*args)
        gr = jax.jit(jax.grad(loss_ref, argnums=tuple(range(10))))(*args)
    grads_close(gf, gr, 2e-5, name)


def main():
    assert jax.default_backend() == "tpu", jax.default_backend()
    # flash direction: frames are keys (f2a); ragged final tile via X=3000
    run_case("x2y flash bwd (f2a, X=3000)", B=4, X=3000, Y=40, Cx=512, Cy=256, d=256, seed=0)
    # small-X direction: frames are queries (a2f)
    run_case("x2y small-X bwd (a2f, Y=3000)", B=4, X=40, Y=3000, Cx=256, Cy=512, d=256, seed=1)
    # bf16 stream dtypes stay bf16 and finite
    rng = np.random.default_rng(2)
    bf = jnp.bfloat16
    B, X, Y, Cx, Cy, d = 2, 1536, 16, 256, 128, 128
    y_in = jnp.asarray(rng.normal(size=(B, Y, Cy)).astype(np.float32)).astype(bf)
    y_pos = jnp.zeros((1, Y, Cy), bf)
    x_in = jnp.asarray(rng.normal(size=(B, X, Cx)).astype(np.float32)).astype(bf)
    x_pos = jnp.zeros((1, X, Cx), bf)
    mk = lambda *s: jnp.asarray(rng.normal(size=s).astype(np.float32) * 0.05)  # noqa: E731
    wk, wv = mk(Cx, d).astype(bf), mk(Cx, d).astype(bf)
    wq = mk(Cy, d).astype(bf)
    bk, bv, bq = mk(d), mk(d), mk(d)
    x_len = jnp.full((B,), X, jnp.int32)

    def loss16(y_in, x_in, wk, wv, wq):
        attn, probs, _ = x2y_attention(y_in, y_pos, x_in, x_pos, wk, bk, wv, bv,
                                       wq, bq, x_len, tile=512)
        return (attn.astype(jnp.float32) ** 2).sum() + probs.sum() * 0.1

    g = jax.jit(jax.grad(loss16, argnums=(0, 1, 2, 3, 4)))(y_in, x_in, wk, wv, wq)
    check("x2y bf16 bwd dtypes", all(a.dtype == bf for a in g))
    check("x2y bf16 bwd finite",
          all(bool(jnp.isfinite(a.astype(jnp.float32)).all()) for a in g))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
