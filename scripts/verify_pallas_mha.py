#!/usr/bin/python3
"""One-shot TPU verification of the fused multi-head cross-attention kernel
(ops/pallas/mha_attn.py), including the in-kernel attention-dropout path
(interpret mode cannot run the TPU PRNG, so this must run on the chip):

  1. forward(rate=0) == XLA reference;
  2. forward(rate>0) == XLA reference using the mask extracted via
     ``mha_dropout_mask`` (bit-for-bit mask regeneration);
  3. custom-VJP grads == jax.grad of that masked XLA forward;
  4. keep-fraction statistics match 1-rate; same seed -> same output,
     different seed -> different output.

Prints PASS/FAIL lines; exit code 0 iff all pass.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

# the XLA reference must run strict-f32 matmuls to be comparable with the
# kernel's f32-accumulated MXU ops
jax.config.update("jax_default_matmul_precision", "highest")

sys.path.insert(0, "/root/repo")

from fact_clip_tpu.ops.pallas.mha_attn import (  # noqa: E402
    _DEFAULT_TILE, _mha_reference, _pick_tile, _round8, mha_cross_attention,
    mha_dropout_mask,
)

ok = True


def check(name, cond):
    global ok
    print(("PASS" if cond else "FAIL"), name, flush=True)
    ok = ok and bool(cond)


def main():
    assert jax.default_backend() == "tpu", f"need TPU, got {jax.default_backend()}"
    B, M, X, E, Cx, H = 2, 20, 1500, 256, 256, 8
    rate = 0.3
    ks = jax.random.split(jax.random.PRNGKey(0), 8)
    q = jax.random.normal(ks[0], (B, M, E), jnp.float32)
    x = jax.random.normal(ks[1], (B, X, Cx), jnp.float32)
    pos = jax.random.normal(ks[2], (1, X, Cx), jnp.float32)
    wk = jax.random.normal(ks[3], (Cx, E), jnp.float32) * 0.05
    bk = jax.random.normal(ks[4], (E,), jnp.float32) * 0.05
    wv = jax.random.normal(ks[5], (Cx, E), jnp.float32) * 0.05
    bv = jax.random.normal(ks[6], (E,), jnp.float32) * 0.05
    x_len = jnp.array([X, X - 321], jnp.int32)
    seed = jnp.array([12345], jnp.int32)

    # 1. deterministic forward
    out0 = jax.jit(lambda *a: mha_cross_attention(*a, num_heads=H))(
        q, x, pos, wk, bk, wv, bv, x_len
    )
    ref0 = _mha_reference(q, x, pos, wk, bk, wv, bv, x_len, None, H)
    err = float(jnp.abs(out0 - ref0).max())
    check(f"fwd rate=0 matches XLA (max err {err:.2e})", err < 3e-4)

    # 2. dropout forward vs mask-regenerated XLA reference
    fwd = jax.jit(lambda *a: mha_cross_attention(
        *a[:-1], num_heads=H, rate=rate, seed=a[-1]))
    out1 = fwd(q, x, pos, wk, bk, wv, bv, x_len, seed)
    M8 = _round8(M)
    tile = _pick_tile(_DEFAULT_TILE, X, H * M8, E, bwd=True)  # the rate>0 fwd tile
    keep = mha_dropout_mask(seed, shape=(B, H * M8, X), rate=rate, tile=tile)
    keepr = keep.reshape(B, H, M8, X)[:, :, :M]
    ref1 = _mha_reference(q, x, pos, wk, bk, wv, bv, x_len, keepr, H)
    err = float(jnp.abs(out1 - ref1).max())
    check(f"fwd rate={rate} matches masked XLA (max err {err:.2e})", err < 3e-4)

    # 3. grads
    lw = jax.random.normal(ks[7], (B, M, E), jnp.float32)

    def loss_fused(q, x, wk, wv):
        return (lw * mha_cross_attention(q, x, pos, wk, bk, wv, bv, x_len,
                                         num_heads=H, rate=rate, seed=seed)).sum()

    def loss_ref(q, x, wk, wv):
        return (lw * _mha_reference(q, x, pos, wk, bk, wv, bv, x_len, keepr, H)).sum()

    gf = jax.jit(jax.grad(loss_fused, argnums=(0, 1, 2, 3)))(q, x, wk, wv)
    gr = jax.jit(jax.grad(loss_ref, argnums=(0, 1, 2, 3)))(q, x, wk, wv)
    for name, a, b in zip(("dq", "dx", "dwk", "dwv"), gf, gr):
        tol = 3e-4 * max(1.0, float(jnp.abs(b).max()))
        err = float(jnp.abs(a - b).max())
        check(f"grad {name} (max err {err:.2e})", err < tol)

    # 4. statistics + determinism
    frac = float((keep > 0).mean())
    check(f"keep fraction {frac:.3f} ~ {1-rate}", abs(frac - (1 - rate)) < 0.02)
    out1b = fwd(q, x, pos, wk, bk, wv, bv, x_len, seed)
    check("same seed -> same output", bool(jnp.all(out1 == out1b)))
    out2 = fwd(q, x, pos, wk, bk, wv, bv, x_len, seed + 1)
    check("different seed -> different output", bool(jnp.any(out1 != out2)))

    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
