import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fact_clip_tpu.models.layers import _dilated_conv
from fact_clip_tpu.ops.pallas.dilated_conv import dilated_residual_layer


@pytest.mark.parametrize("dilation", [1, 2, 8, 64, 512])
@pytest.mark.parametrize("use_ln", [True, False])
def test_fused_dilated_residual_matches_dense(rng, dilation, use_ln):
    """The fused kernel (interpret mode on CPU) must match the unfused ops."""
    B, T, C = 2, 100, 16
    x = rng.normal(size=(B, T, C)).astype(np.float32)
    wd = (rng.normal(size=(3, C, C)) * 0.1).astype(np.float32)
    bd = (rng.normal(size=(C,)) * 0.1).astype(np.float32)
    w1 = (rng.normal(size=(C, C)) * 0.1).astype(np.float32)
    b1 = (rng.normal(size=(C,)) * 0.1).astype(np.float32)
    g = rng.normal(size=(C,)).astype(np.float32)
    beta = rng.normal(size=(C,)).astype(np.float32)

    conv = np.array(_dilated_conv(jnp.array(x), jnp.array(wd), jnp.array(bd), dilation, 1))
    h = np.maximum(conv, 0) @ w1 + b1 + x
    if use_ln:
        mean = h.mean(-1, keepdims=True)
        var = ((h - mean) ** 2).mean(-1, keepdims=True)
        ref = (h - mean) / np.sqrt(var + 1e-5) * g + beta
    else:
        ref = h

    out = np.array(
        dilated_residual_layer(
            jnp.array(x), jnp.array(wd), jnp.array(bd), jnp.array(w1), jnp.array(b1),
            jnp.array(g), jnp.array(beta), dilation=dilation, use_ln=use_ln,
            tile=32, interpret=True,
        )
    )
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_fused_kernel_odd_lengths(rng):
    """Lengths that don't divide the tile: padding must not leak."""
    B, T, C = 1, 77, 8
    x = rng.normal(size=(B, T, C)).astype(np.float32)
    wd = (rng.normal(size=(3, C, C)) * 0.1).astype(np.float32)
    bd = np.zeros(C, np.float32)
    w1 = np.eye(C, dtype=np.float32)
    b1 = np.zeros(C, np.float32)
    g = np.ones(C, np.float32)
    beta = np.zeros(C, np.float32)

    conv = np.array(_dilated_conv(jnp.array(x), jnp.array(wd), jnp.array(bd), 4, 1))
    h = np.maximum(conv, 0) @ w1 + x
    mean = h.mean(-1, keepdims=True)
    var = ((h - mean) ** 2).mean(-1, keepdims=True)
    ref = (h - mean) / np.sqrt(var + 1e-5)

    out = np.array(
        dilated_residual_layer(
            jnp.array(x), jnp.array(wd), jnp.array(bd), jnp.array(w1), jnp.array(b1),
            jnp.array(g), jnp.array(beta), dilation=4, tile=32, interpret=True,
        )
    )
    assert out.shape == (B, T, C)
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_fused_kernel_custom_vjp_matches_autodiff(rng):
    """Gradients through the fused layer must match autodiff of the dense ops."""
    B, T, C, d = 2, 60, 8, 4
    args = [
        jnp.array(rng.normal(size=(B, T, C)).astype(np.float32)),
        jnp.array((rng.normal(size=(3, C, C)) * 0.1).astype(np.float32)),
        jnp.array((rng.normal(size=(C,)) * 0.1).astype(np.float32)),
        jnp.array((rng.normal(size=(C, C)) * 0.1).astype(np.float32)),
        jnp.array((rng.normal(size=(C,)) * 0.1).astype(np.float32)),
        jnp.array(rng.normal(size=(C,)).astype(np.float32)),
        jnp.array(rng.normal(size=(C,)).astype(np.float32)),
    ]

    def fused_loss(x, wd, bd, w1, b1, gamma, beta):
        y = dilated_residual_layer(x, wd, bd, w1, b1, gamma, beta, dilation=d, tile=32, interpret=True)
        return (y ** 2).sum()

    def ref_loss(x, wd, bd, w1, b1, gamma, beta):
        conv = _dilated_conv(x, wd, bd, d, 1)
        h = jax.nn.relu(conv) @ w1 + b1 + x
        mean = h.mean(-1, keepdims=True)
        var = ((h - mean) ** 2).mean(-1, keepdims=True)
        y = (h - mean) * jax.lax.rsqrt(var + 1e-5) * gamma + beta
        return (y ** 2).sum()

    g_fused = jax.grad(fused_loss, argnums=tuple(range(7)))(*args)
    g_ref = jax.grad(ref_loss, argnums=tuple(range(7)))(*args)
    for name, a, b in zip(["x", "wd", "bd", "w1", "b1", "gamma", "beta"], g_fused, g_ref):
        np.testing.assert_allclose(np.array(a), np.array(b), atol=1e-3, err_msg=name)
