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


@pytest.mark.slow
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


def _rand_layer(rng, C):
    wd = jnp.array(rng.normal(size=(3, C, C)).astype(np.float32) * 0.08)
    bd = jnp.array(rng.normal(size=(C,)).astype(np.float32) * 0.05)
    w1 = jnp.array(rng.normal(size=(C, C)).astype(np.float32) * 0.08)
    b1 = jnp.array(rng.normal(size=(C,)).astype(np.float32) * 0.05)
    g = jnp.array(rng.normal(size=(C,)).astype(np.float32) * 0.2 + 1.0)
    beta = jnp.array(rng.normal(size=(C,)).astype(np.float32) * 0.2)
    return (wd, bd, w1, b1, g, beta)


@pytest.mark.slow
@pytest.mark.parametrize("use_ln", [True, False])
def test_stack_matches_per_layer(rng, use_ln):
    """Pad-once fused stack == sequential masked per-layer computation."""
    from fact_clip_tpu.ops.pallas.dilated_conv import dilated_residual_stack

    B, T, C = 2, 70, 32
    dilations = [1, 2, 4, 8]
    x = jnp.array(rng.normal(size=(B, T, C)).astype(np.float32))
    mask = np.ones((B, T), bool)
    mask[1, 50:] = False
    mask = jnp.array(mask)
    layers = [_rand_layer(rng, C) for _ in dilations]

    got = dilated_residual_stack(
        x, mask, layers, dilations, use_ln=use_ln, tile=32, interpret=True
    )

    # reference: per-layer mask -> conv -> relu -> 1x1 -> residual -> LN,
    # with the stack's write-mask (zero padded frames after each layer)
    ref = x
    m = mask[:, :, None].astype(x.dtype)
    for (wd, bd, w1, b1, g, beta), d in zip(layers, dilations):
        xm = ref * m
        conv = jax.lax.conv_general_dilated(
            xm, wd, (1,), [(d, d)], rhs_dilation=(d,),
            dimension_numbers=("NWC", "WIO", "NWC")) + bd
        z = jax.nn.relu(conv) @ w1 + b1 + xm
        if use_ln:
            mu = z.mean(-1, keepdims=True)
            var = ((z - mu) ** 2).mean(-1, keepdims=True)
            z = (z - mu) * jax.lax.rsqrt(var + 1e-5) * g + beta
        ref = z * m
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


@pytest.mark.slow
def test_stack_grads_match_reference(rng):
    from fact_clip_tpu.ops.pallas.dilated_conv import dilated_residual_stack

    B, T, C = 2, 64, 32
    dilations = [1, 4]
    x = jnp.array(rng.normal(size=(B, T, C)).astype(np.float32))
    mask = np.ones((B, T), bool)
    mask[0, 40:] = False
    mask = jnp.array(mask)
    layers = tuple(_rand_layer(rng, C) for _ in dilations)
    lw = jnp.array(rng.normal(size=(B, T, C)).astype(np.float32))

    def loss_stack(x, layers):
        y = dilated_residual_stack(x, mask, layers, dilations, tile=32, interpret=True)
        return (lw * y).sum()

    def loss_ref(x, layers):
        ref = x
        m = mask[:, :, None].astype(x.dtype)
        for (wd, bd, w1, b1, g, beta), d in zip(layers, dilations):
            xm = ref * m
            conv = jax.lax.conv_general_dilated(
                xm, wd, (1,), [(d, d)], rhs_dilation=(d,),
                dimension_numbers=("NWC", "WIO", "NWC")) + bd
            z = jax.nn.relu(conv) @ w1 + b1 + xm
            mu = z.mean(-1, keepdims=True)
            var = ((z - mu) ** 2).mean(-1, keepdims=True)
            ref = ((z - mu) * jax.lax.rsqrt(var + 1e-5) * g + beta) * m
        return (lw * ref).sum()

    gx, gl = jax.grad(loss_stack, argnums=(0, 1))(x, layers)
    gx_r, gl_r = jax.grad(loss_ref, argnums=(0, 1))(x, layers)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_r), atol=3e-4)
    for a, b in zip(jax.tree_util.tree_leaves(gl), jax.tree_util.tree_leaves(gl_r)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-4)


def _vn_fixture(rng, n1=13, n2=29, n_act=97, B=2, T=200, M=7):
    pairs = set()
    while len(pairs) < n_act:
        pairs.add((int(rng.integers(0, n1)), int(rng.integers(0, n2))))
    pairs = sorted(pairs)
    vids = jnp.asarray([p[0] for p in pairs], jnp.int32)
    nids = jnp.asarray([p[1] for p in pairs], jnp.int32)
    lv = jnp.asarray(np.log(rng.dirichlet(np.ones(n1), size=(B, T))), jnp.float32)
    ln = jnp.asarray(np.log(rng.dirichlet(np.ones(n2), size=(B, T))), jnp.float32)
    return vids, nids, lv, ln


def test_compose_factored_argmax_kernel(rng):
    """The fused factored argmax equals the XLA factored form EXACTLY (same
    f32 max/add reductions) and the dense gather up to exact ties."""
    from fact_clip_tpu.ops.pallas.compose_decode import factored_argmax
    from fact_clip_tpu.ops.verbnoun_compose import (
        build_factored_tables, composed_argmax, composed_argmax_factored)

    vids, nids, lv, ln = _vn_fixture(rng)
    mvn, at = build_factored_tables(vids, nids, 13, 29)
    mvn, at = jnp.asarray(mvn), jnp.asarray(at)
    got = factored_argmax(lv, ln, mvn, at, tile=64, interpret=True)
    ref_fact = composed_argmax_factored(lv, ln, mvn, at)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref_fact))
    ref_dense = composed_argmax(lv, ln, vids, nids)
    agree = float((got == ref_dense).mean())
    assert agree >= 0.999, agree


def test_compose_mxu_argmax_kernel(rng):
    """The MXU one-hot composed argmax (the production TDU path) matches the
    dense gather argmax up to near-exact ties (in-kernel 3-term bf16 split)."""
    from fact_clip_tpu.ops.pallas.compose_decode import mxu_argmax
    from fact_clip_tpu.ops.verbnoun_compose import composed_argmax

    vids, nids, lv, ln = _vn_fixture(rng)
    got = mxu_argmax(lv, ln, vids, nids, tile=64, interpret=True)
    ref = composed_argmax(lv, ln, vids, nids)
    agree = float((got == ref).mean())
    assert agree >= 0.999, agree


def test_compose_mxu_argmax_under_autodiff(rng):
    """The TDU's composed argmax runs inside the differentiated train
    forward: grad through a loss that consumes the (integer) predictions'
    one-hot contraction must not try to linearize the kernel (stop_gradient
    on its inputs), and the primal must still match the dense path."""
    import unittest.mock as mock

    from fact_clip_tpu.ops.pallas import compose_decode as cd
    from fact_clip_tpu.ops.verbnoun_compose import composed_argmax

    vids, nids, lv, ln = _vn_fixture(rng)

    def interp(orig):
        def f(*a, **kw):
            kw["interpret"] = True
            kw["tile"] = 64
            return orig(*a, **kw)
        return f

    def loss(lv, ln):
        with mock.patch.object(cd, "mxu_argmax", interp(cd.mxu_argmax)):
            pred = composed_argmax(lv, ln, vids, nids, pallas=True)
        onehot = jax.nn.one_hot(pred, 97)
        # a loss that touches lv through BOTH a differentiable path and the
        # argmax-selected indices (exactly the TDU pooling pattern)
        return (onehot * lv[..., :1]).sum() + (lv ** 2).mean()

    g = jax.grad(loss)(lv, ln)
    assert np.isfinite(np.asarray(g)).all()
    with mock.patch.object(cd, "mxu_argmax", interp(cd.mxu_argmax)):
        pred = composed_argmax(lv, ln, vids, nids, pallas=True)
    ref = composed_argmax(lv, ln, vids, nids)
    assert float((pred == ref).mean()) >= 0.999

    # the train step also runs the BLEND decode inside the differentiated
    # loss_fn (logged predictions) — must not linearize either
    from fact_clip_tpu.ops.verbnoun_compose import composed_decode

    B, T, M, n_act = lv.shape[0], lv.shape[1], 7, 97
    rng2 = np.random.default_rng(5)
    alogp = jnp.asarray(np.log(rng2.dirichlet(np.ones(n_act + 1), size=(B, M))), jnp.float32)
    attn = jnp.asarray(rng2.standard_normal((B, T, M)), jnp.float32)
    tm = jnp.ones((B, M), bool)

    def loss2(lv, ln):
        with mock.patch.object(cd, "blend_argmax", interp(cd.blend_argmax)):
            pred = composed_decode(alogp, attn, lv, ln, vids, nids, 0.5, tm,
                                   pallas=True)
        return (jax.nn.one_hot(pred, n_act) * lv[..., :1]).sum() + (ln ** 2).mean()

    g2 = jax.grad(loss2, argnums=1)(lv, ln)
    assert np.isfinite(np.asarray(g2)).all()


@pytest.mark.parametrize("weight", [0.5, 0.0, 1.0])
def test_compose_blend_argmax_kernel(rng, weight):
    """The fused blend decode matches composed_decode's XLA path (in-kernel
    bf16 split compose: near-tie flips only -> >=99.9% agreement; measured
    1.000 on this fixture)."""
    import unittest.mock as mock

    from fact_clip_tpu.ops.pallas import compose_decode as cd
    from fact_clip_tpu.ops.verbnoun_compose import composed_decode

    vids, nids, lv, ln = _vn_fixture(rng)
    B, T, M, n_act = 2, 200, 7, 97
    alogp = jnp.asarray(np.log(rng.dirichlet(np.ones(n_act + 1), size=(B, M))), jnp.float32)
    attn = jnp.asarray(rng.standard_normal((B, T, M)), jnp.float32)
    token_mask = jnp.asarray(np.ones((B, M), bool))
    # make one video all-null to exercise the in-kernel fallback argmax
    alogp = alogp.at[1, :, :-1].add(-50.0)

    ref = composed_decode(alogp, attn, lv, ln, vids, nids, weight, token_mask)

    def interp(orig):
        def f(*a, **kw):
            kw["interpret"] = True
            kw["tile"] = 64
            return orig(*a, **kw)
        return f

    with mock.patch.object(cd, "blend_argmax", interp(cd.blend_argmax)):
        got = composed_decode(alogp, attn, lv, ln, vids, nids, weight,
                              token_mask, pallas=True)
    agree = float((got == ref).mean())
    assert agree >= 0.999, agree


@pytest.mark.parametrize("use_ln", [True, False])
def test_stack_fused_out_projection(rng, use_ln):
    """out_params folds the out dense into the last kernel: forward equals
    stack-then-dense exactly; all grads (incl. dow/dob) match the unfused
    composition; padded frames carry the bias row."""
    from fact_clip_tpu.ops.pallas.dilated_conv import dilated_residual_stack

    B, T, C, O = 2, 70, 32, 48
    dilations = [1, 2, 4]
    x = jnp.array(rng.normal(size=(B, T, C)).astype(np.float32))
    mask = np.ones((B, T), bool)
    mask[1, 50:] = False
    mask = jnp.array(mask)
    layers = tuple(_rand_layer(rng, C) for _ in dilations)
    ow = jnp.array(rng.normal(size=(C, O)).astype(np.float32) * 0.1)
    ob = jnp.array(rng.normal(size=(O,)).astype(np.float32) * 0.1)
    ct = jnp.array(rng.normal(size=(B, T, O)).astype(np.float32))

    def unfused(x, layers, ow, ob):
        y = dilated_residual_stack(x, mask, layers, dilations, use_ln=use_ln,
                                   tile=32, interpret=True)
        return y @ ow + ob

    def fused(x, layers, ow, ob):
        return dilated_residual_stack(x, mask, layers, dilations, use_ln=use_ln,
                                      tile=32, interpret=True,
                                      out_params=(ow, ob))

    a = unfused(x, layers, ow, ob)
    b = fused(x, layers, ow, ob)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
    # padded frames: dense(0-masked stream) == bias row
    np.testing.assert_allclose(np.asarray(b)[1, 60], np.asarray(ob), atol=1e-6)

    ga = jax.grad(lambda *a_: (unfused(*a_) * ct).sum(), argnums=(0, 1, 2, 3))(
        x, layers, ow, ob)
    gb = jax.grad(lambda *a_: (fused(*a_) * ct).sum(), argnums=(0, 1, 2, 3))(
        x, layers, ow, ob)
    for p, q in zip(jax.tree_util.tree_leaves(ga), jax.tree_util.tree_leaves(gb)):
        np.testing.assert_allclose(np.asarray(p), np.asarray(q), atol=5e-4)


def test_stack2_fused_out_projection(rng):
    from fact_clip_tpu.ops.pallas.dilated_conv import dilated_residual2_stack

    B, T, C, O = 2, 64, 32, 40
    dil_pairs = [(4, 1), (2, 2), (1, 4)]
    x = jnp.array(rng.normal(size=(B, T, C)).astype(np.float32))
    mask = np.ones((B, T), bool)
    mask[0, 44:] = False
    mask = jnp.array(mask)
    layers = tuple(_rand_layer2(rng, C) for _ in dil_pairs)
    ow = jnp.array(rng.normal(size=(C, O)).astype(np.float32) * 0.1)
    ob = jnp.array(rng.normal(size=(O,)).astype(np.float32) * 0.1)
    ct = jnp.array(rng.normal(size=(B, T, O)).astype(np.float32))

    def unfused(x, layers, ow, ob):
        y = dilated_residual2_stack(x, mask, layers, dil_pairs, tile=32,
                                    interpret=True)
        return y @ ow + ob

    def fused(x, layers, ow, ob):
        return dilated_residual2_stack(x, mask, layers, dil_pairs, tile=32,
                                       interpret=True, out_params=(ow, ob))

    a = unfused(x, layers, ow, ob)
    b = fused(x, layers, ow, ob)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
    np.testing.assert_allclose(np.asarray(b)[0, 50], np.asarray(ob), atol=1e-6)

    ga = jax.grad(lambda *a_: (unfused(*a_) * ct).sum(), argnums=(0, 1, 2, 3))(
        x, layers, ow, ob)
    gb = jax.grad(lambda *a_: (fused(*a_) * ct).sum(), argnums=(0, 1, 2, 3))(
        x, layers, ow, ob)
    for p, q in zip(jax.tree_util.tree_leaves(ga), jax.tree_util.tree_leaves(gb)):
        np.testing.assert_allclose(np.asarray(p), np.asarray(q), atol=5e-4)


@pytest.mark.slow
def test_mstcn_stack_path_matches_unfused(rng):
    """MSTCN with use_pallas (stack, interpret unavailable -> force interpret
    via monkeypatched flag) equals the unfused module path on valid frames."""
    from fact_clip_tpu.models.layers import MSTCN
    from fact_clip_tpu.ops.pallas import dilated_conv as dc

    B, T, D, H = 2, 60, 12, 32
    x = jnp.array(rng.normal(size=(B, T, D)).astype(np.float32))
    mask = np.ones((B, T), bool)
    mask[1, 44:] = False
    mask = jnp.array(mask)

    # interpret-mode shim: route the stack through interpret=True on CPU
    orig = dc.dilated_residual_stack

    def interp_stack(*a, **kw):
        kw["interpret"] = True
        kw["tile"] = 32
        return orig(*a, **kw)

    import unittest.mock as mock

    kw = dict(in_dim=D, hid_dim=H, out_dim=H, num_layers=3, dropout=0.0,
              ln=True, ngroup=1, in_map=True)
    m_fused = MSTCN(use_pallas=True, **kw)
    m_plain = MSTCN(use_pallas=False, **kw)
    params = m_plain.init({"params": jax.random.PRNGKey(0)}, x, mask, True)

    with mock.patch.object(dc, "dilated_residual_stack", interp_stack):
        y_fused = m_fused.apply(params, x, mask, True)
    y_plain = m_plain.apply(params, x, mask, True)
    # valid frames must agree (padded frames differ by design: the fused
    # stack write-masks, the plain path leaves LN(bias) there — masked later)
    mv = np.asarray(mask)
    np.testing.assert_allclose(
        np.asarray(y_fused)[mv], np.asarray(y_plain)[mv], atol=2e-5
    )


def _x2y_xla_reference(y_in, y_pos, x_in, x_pos, wk, bk, wv, bv, wq, bq, x_len):
    """Dense XLA reference of the fused X2Y attention (X2YMap math)."""
    import math as _m

    d = wq.shape[1]
    xk = (x_in + x_pos) @ wk + bk
    xv = x_in @ wv + bv
    yq = (y_in + y_pos) @ wq + bq
    logits = jnp.einsum("byd,bxd->byx", yq, xk) / _m.sqrt(d)
    X = x_in.shape[1]
    colmask = jnp.arange(X)[None, None, :] < x_len[:, None, None]
    logits = jnp.where(colmask, logits, -1e9)
    probs = jax.nn.softmax(logits, axis=-1)
    attn = jnp.einsum("byx,bxd->byd", probs, xv)
    return attn, probs, logits


@pytest.mark.slow
@pytest.mark.parametrize("X,Y", [(24, 70), (2000, 16)])  # small-X | flash
def test_x2y_attention_matches_xla(rng, X, Y):
    from fact_clip_tpu.ops.pallas.x2y_attn import x2y_attention

    B, Cx, Cy, d = 2, 32, 24, 128
    y_in = jnp.array(rng.normal(size=(B, Y, Cy)).astype(np.float32))
    y_pos = jnp.array(rng.normal(size=(1, Y, Cy)).astype(np.float32))
    x_in = jnp.array(rng.normal(size=(B, X, Cx)).astype(np.float32))
    x_pos = jnp.array(rng.normal(size=(1, X, Cx)).astype(np.float32))
    wk = jnp.array(rng.normal(size=(Cx, d)).astype(np.float32) * 0.1)
    bk = jnp.array(rng.normal(size=(d,)).astype(np.float32) * 0.1)
    wv = jnp.array(rng.normal(size=(Cx, d)).astype(np.float32) * 0.1)
    bv = jnp.array(rng.normal(size=(d,)).astype(np.float32) * 0.1)
    wq = jnp.array(rng.normal(size=(Cy, d)).astype(np.float32) * 0.1)
    bq = jnp.array(rng.normal(size=(d,)).astype(np.float32) * 0.1)
    x_len = jnp.array([X, X - 5], jnp.int32)

    attn, probs, logits = x2y_attention(
        y_in, y_pos, x_in, x_pos, wk, bk, wv, bv, wq, bq, x_len,
        tile=256, interpret=True,
    )
    ra, rp, rl = _x2y_xla_reference(
        y_in, jnp.broadcast_to(y_pos, y_in.shape), x_in,
        jnp.broadcast_to(x_pos, x_in.shape), wk, bk, wv, bv, wq, bq, x_len,
    )
    np.testing.assert_allclose(np.asarray(logits), np.asarray(rl), atol=2e-4)
    np.testing.assert_allclose(np.asarray(probs), np.asarray(rp), atol=1e-5)
    np.testing.assert_allclose(np.asarray(attn), np.asarray(ra), atol=2e-4)


@pytest.mark.slow
@pytest.mark.parametrize("X,Y", [(24, 70), (2000, 16)])
def test_x2y_attention_grads_match_xla(rng, X, Y):
    from fact_clip_tpu.ops.pallas.x2y_attn import x2y_attention

    B, Cx, Cy, d = 2, 16, 16, 64
    args = dict(
        y_in=jnp.array(rng.normal(size=(B, Y, Cy)).astype(np.float32)),
        y_pos=jnp.array(rng.normal(size=(1, Y, Cy)).astype(np.float32)),
        x_in=jnp.array(rng.normal(size=(B, X, Cx)).astype(np.float32)),
        x_pos=jnp.array(rng.normal(size=(1, X, Cx)).astype(np.float32)),
        wk=jnp.array(rng.normal(size=(Cx, d)).astype(np.float32) * 0.1),
        bk=jnp.array(rng.normal(size=(d,)).astype(np.float32) * 0.1),
        wv=jnp.array(rng.normal(size=(Cx, d)).astype(np.float32) * 0.1),
        bv=jnp.array(rng.normal(size=(d,)).astype(np.float32) * 0.1),
        wq=jnp.array(rng.normal(size=(Cy, d)).astype(np.float32) * 0.1),
        bq=jnp.array(rng.normal(size=(d,)).astype(np.float32) * 0.1),
    )
    x_len = jnp.array([X, X - 3], jnp.int32)
    wa = jnp.array(rng.normal(size=(B, Y, d)).astype(np.float32))
    wp = jnp.array(rng.normal(size=(B, Y, X)).astype(np.float32))
    wl = jnp.array(rng.normal(size=(B, Y, X)).astype(np.float32))

    names = list(args)

    def loss_fused(*vals):
        kw = dict(zip(names, vals))
        attn, probs, logits = x2y_attention(
            kw["y_in"], kw["y_pos"], kw["x_in"], kw["x_pos"], kw["wk"], kw["bk"],
            kw["wv"], kw["bv"], kw["wq"], kw["bq"], x_len, tile=256, interpret=True,
        )
        return (wa * attn).sum() + (wp * probs).sum() + (wl * logits).sum()

    def loss_ref(*vals):
        kw = dict(zip(names, vals))
        attn, probs, logits = _x2y_xla_reference(
            kw["y_in"], jnp.broadcast_to(kw["y_pos"], kw["y_in"].shape), kw["x_in"],
            jnp.broadcast_to(kw["x_pos"], kw["x_in"].shape), kw["wk"], kw["bk"],
            kw["wv"], kw["bv"], kw["wq"], kw["bq"], x_len,
        )
        return (wa * attn).sum() + (wp * probs).sum() + (wl * logits).sum()

    vals = tuple(args.values())
    gf = jax.grad(loss_fused, argnums=tuple(range(len(vals))))(*vals)
    gr = jax.grad(loss_ref, argnums=tuple(range(len(vals))))(*vals)
    for n, a, b in zip(names, gf, gr):
        a, b = np.asarray(a), np.asarray(b)
        if n == "y_pos":
            b = b.sum(axis=0, keepdims=True) if b.shape != a.shape else b
        if n == "x_pos":
            b = b.sum(axis=0, keepdims=True) if b.shape != a.shape else b
        tol = 3e-4 * max(1.0, np.abs(b).max())
        np.testing.assert_allclose(a, b, atol=tol, err_msg=n)


@pytest.mark.parametrize("X,Y", [(24, 70), (2000, 16)])
def test_x2y_grads_batched_pos_fallback(rng, X, Y):
    """Per-batch pos tensors take the XLA-recompute backward (the fused
    kernels batch-reduce the pos cotangent away); grads must still match."""
    from fact_clip_tpu.ops.pallas.x2y_attn import x2y_attention

    B, Cx, Cy, d = 2, 16, 16, 64
    y_in = jnp.array(rng.normal(size=(B, Y, Cy)).astype(np.float32))
    y_pos = jnp.array(rng.normal(size=(B, Y, Cy)).astype(np.float32))  # batched
    x_in = jnp.array(rng.normal(size=(B, X, Cx)).astype(np.float32))
    x_pos = jnp.array(rng.normal(size=(B, X, Cx)).astype(np.float32))  # batched
    mk = lambda *s: jnp.array(rng.normal(size=s).astype(np.float32) * 0.1)  # noqa: E731
    wk, bk, wv, bv, wq, bq = mk(Cx, d), mk(d), mk(Cx, d), mk(d), mk(Cy, d), mk(d)
    x_len = jnp.array([X, X - 3], jnp.int32)
    wa = jnp.array(rng.normal(size=(B, Y, d)).astype(np.float32))

    def loss_fused(y_in, y_pos, x_in, x_pos):
        attn, probs, _ = x2y_attention(
            y_in, y_pos, x_in, x_pos, wk, bk, wv, bv, wq, bq, x_len,
            tile=256, interpret=True)
        return (wa * attn).sum() + probs.sum() * 0.1

    def loss_ref(y_in, y_pos, x_in, x_pos):
        attn, probs, _ = _x2y_xla_reference(
            y_in, y_pos, x_in, x_pos, wk, bk, wv, bv, wq, bq, x_len)
        return (wa * attn).sum() + probs.sum() * 0.1

    gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(y_in, y_pos, x_in, x_pos)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(y_in, y_pos, x_in, x_pos)
    for n, a, b in zip(["y_in", "y_pos", "x_in", "x_pos"], gf, gr):
        a, b = np.asarray(a), np.asarray(b)
        np.testing.assert_allclose(a, b, atol=3e-4 * max(1.0, np.abs(b).max()),
                                   err_msg=n)


def test_mstcn2_stack_matches_unfused(rng):
    """MS-TCN++ pad-once fused stack == the module's unfused path."""
    from fact_clip_tpu.models.layers import MSTCN2
    from fact_clip_tpu.ops.pallas import dilated_conv as dc

    B, T, D, H = 2, 70, 12, 32
    x = jnp.array(rng.normal(size=(B, T, D)).astype(np.float32))
    mask = np.ones((B, T), bool)
    mask[1, 50:] = False
    mask = jnp.array(mask)

    orig = dc.dilated_residual2_stack

    def interp_stack(*a, **kw):
        kw["interpret"] = True
        kw["tile"] = 32
        return orig(*a, **kw)

    import unittest.mock as mock

    kw = dict(in_dim=D, hid_dim=H, out_dim=H, num_layers=3, dropout=0.0,
              ngroup=1, in_map=True)
    m_fused = MSTCN2(use_pallas=True, **kw)
    m_plain = MSTCN2(use_pallas=False, **kw)
    params = m_plain.init({"params": jax.random.PRNGKey(0)}, x, mask, True)

    with mock.patch.object(dc, "dilated_residual2_stack", interp_stack):
        y_fused = m_fused.apply(params, x, mask, True)
    y_plain = m_plain.apply(params, x, mask, True)
    mv = np.asarray(mask)
    np.testing.assert_allclose(
        np.asarray(y_fused)[mv], np.asarray(y_plain)[mv], atol=2e-5
    )


def test_mstcn2_stack_grads(rng):
    from fact_clip_tpu.ops.pallas.dilated_conv import dilated_residual2_stack

    B, T, C = 2, 64, 32
    dil_pairs = [(4, 1), (1, 4)]
    x = jnp.array(rng.normal(size=(B, T, C)).astype(np.float32))
    mask = jnp.array(np.ones((B, T), bool))
    layers = []
    for _ in dil_pairs:
        k1 = jnp.array(rng.normal(size=(3, C, C)).astype(np.float32) * 0.08)
        b1 = jnp.array(rng.normal(size=(C,)).astype(np.float32) * 0.05)
        k2 = jnp.array(rng.normal(size=(3, C, C)).astype(np.float32) * 0.08)
        b2 = jnp.array(rng.normal(size=(C,)).astype(np.float32) * 0.05)
        wt = jnp.array(rng.normal(size=(C, C)).astype(np.float32) * 0.08)
        wb = jnp.array(rng.normal(size=(C, C)).astype(np.float32) * 0.08)
        bf = jnp.array(rng.normal(size=(C,)).astype(np.float32) * 0.05)
        layers.append((k1, b1, k2, b2, wt, wb, bf))
    layers = tuple(layers)
    lw = jnp.array(rng.normal(size=(B, T, C)).astype(np.float32))

    def loss_stack(x, layers):
        y = dilated_residual2_stack(x, mask, layers, dil_pairs, tile=32, interpret=True)
        return (lw * y).sum()

    def loss_ref(x, layers):
        ref = x
        m = mask[:, :, None].astype(x.dtype)
        for (k1, b1, k2, b2, wt, wb, bf), (d1, d2) in zip(layers, dil_pairs):
            xm = ref * m

            def conv(k, bias, d):
                return jax.lax.conv_general_dilated(
                    xm, k, (1,), [(d, d)], rhs_dilation=(d,),
                    dimension_numbers=("NWC", "WIO", "NWC")) + bias

            h = jax.nn.relu(conv(k1, b1, d1) @ wt + conv(k2, b2, d2) @ wb + bf)
            ref = (h + xm) * m
        return (lw * ref).sum()

    gx, gl = jax.grad(loss_stack, argnums=(0, 1))(x, layers)
    gx_r, gl_r = jax.grad(loss_ref, argnums=(0, 1))(x, layers)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_r), atol=3e-4)
    for a, b in zip(jax.tree_util.tree_leaves(gl), jax.tree_util.tree_leaves(gl_r)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-4)


# ---------------------------------------------------------------------------
# fused multi-head cross-attention (ops/pallas/mha_attn.py)


def test_mha_cross_attention_matches_xla(rng):
    from fact_clip_tpu.ops.pallas.mha_attn import _mha_reference, mha_cross_attention

    B, M, X, E, Cx, H = 2, 10, 1500, 256, 256, 8
    q = jnp.array(rng.normal(size=(B, M, E)).astype(np.float32))
    x = jnp.array(rng.normal(size=(B, X, Cx)).astype(np.float32))
    pos = jnp.array(rng.normal(size=(1, X, Cx)).astype(np.float32))
    wk = jnp.array(rng.normal(size=(Cx, E)).astype(np.float32) * 0.05)
    bk = jnp.array(rng.normal(size=(E,)).astype(np.float32) * 0.05)
    wv = jnp.array(rng.normal(size=(Cx, E)).astype(np.float32) * 0.05)
    bv = jnp.array(rng.normal(size=(E,)).astype(np.float32) * 0.05)
    x_len = jnp.array([X, X - 321], jnp.int32)

    out = mha_cross_attention(q, x, pos, wk, bk, wv, bv, x_len, num_heads=H,
                              tile=256, interpret=True)
    ref = _mha_reference(q, x, pos, wk, bk, wv, bv, x_len, None, H)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-4)


@pytest.mark.slow
def test_mha_cross_attention_grads_match_xla(rng):
    from fact_clip_tpu.ops.pallas.mha_attn import _mha_reference, mha_cross_attention

    B, M, X, E, Cx, H = 2, 4, 700, 128, 128, 8
    args = dict(
        q=jnp.array(rng.normal(size=(B, M, E)).astype(np.float32)),
        x=jnp.array(rng.normal(size=(B, X, Cx)).astype(np.float32)),
        pos=jnp.array(rng.normal(size=(1, X, Cx)).astype(np.float32)),
        wk=jnp.array(rng.normal(size=(Cx, E)).astype(np.float32) * 0.05),
        bk=jnp.array(rng.normal(size=(E,)).astype(np.float32) * 0.05),
        wv=jnp.array(rng.normal(size=(Cx, E)).astype(np.float32) * 0.05),
        bv=jnp.array(rng.normal(size=(E,)).astype(np.float32) * 0.05),
    )
    x_len = jnp.array([X, X - 123], jnp.int32)
    lw = jnp.array(rng.normal(size=(B, M, E)).astype(np.float32))
    names = list(args)

    def loss_fused(*vals):
        kw = dict(zip(names, vals))
        out = mha_cross_attention(kw["q"], kw["x"], kw["pos"], kw["wk"], kw["bk"],
                                  kw["wv"], kw["bv"], x_len, num_heads=H,
                                  tile=256, interpret=True)
        return (lw * out).sum()

    def loss_ref(*vals):
        kw = dict(zip(names, vals))
        out = _mha_reference(kw["q"], kw["x"], kw["pos"], kw["wk"], kw["bk"],
                             kw["wv"], kw["bv"], x_len, None, H)
        return (lw * out).sum()

    vals = tuple(args.values())
    gf = jax.grad(loss_fused, argnums=tuple(range(len(vals))))(*vals)
    gr = jax.grad(loss_ref, argnums=tuple(range(len(vals))))(*vals)
    for n, a, b in zip(names, gf, gr):
        a, b = np.asarray(a), np.asarray(b)
        tol = 3e-4 * max(1.0, np.abs(b).max())
        np.testing.assert_allclose(a, b, atol=tol, err_msg=n)


def test_mha_pos_grad_false_skips_dpos_keeps_grads(rng):
    """pos_grad=False: identical output, zero d(pos), other grads unchanged."""
    from fact_clip_tpu.ops.pallas.mha_attn import _mha_reference, mha_cross_attention

    B, M, X, E, Cx, H = 2, 4, 700, 128, 128, 8
    q = jnp.array(rng.normal(size=(B, M, E)).astype(np.float32))
    x = jnp.array(rng.normal(size=(B, X, Cx)).astype(np.float32))
    pos = jnp.array(rng.normal(size=(1, X, Cx)).astype(np.float32))
    wk = jnp.array(rng.normal(size=(Cx, E)).astype(np.float32) * 0.05)
    bk = jnp.array(rng.normal(size=(E,)).astype(np.float32) * 0.05)
    wv = jnp.array(rng.normal(size=(Cx, E)).astype(np.float32) * 0.05)
    bv = jnp.array(rng.normal(size=(E,)).astype(np.float32) * 0.05)
    x_len = jnp.array([X, X - 123], jnp.int32)
    lw = jnp.array(rng.normal(size=(B, M, E)).astype(np.float32))

    def loss(pos_grad, q, x, pos, wk, wv):
        out = mha_cross_attention(q, x, pos, wk, bk, wv, bv, x_len, num_heads=H,
                                  tile=256, interpret=True, pos_grad=pos_grad)
        return (lw * out).sum()

    def loss_ref(q, x, pos, wk, wv):
        out = _mha_reference(q, x, pos, wk, bk, wv, bv, x_len, None, H)
        return (lw * out).sum()

    out_np = mha_cross_attention(q, x, pos, wk, bk, wv, bv, x_len, num_heads=H,
                                 tile=256, interpret=True, pos_grad=False)
    out_p = mha_cross_attention(q, x, pos, wk, bk, wv, bv, x_len, num_heads=H,
                                tile=256, interpret=True, pos_grad=True)
    np.testing.assert_array_equal(np.asarray(out_np), np.asarray(out_p))

    g_np = jax.grad(loss, argnums=(1, 2, 3, 4, 5))(False, q, x, pos, wk, wv)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(q, x, pos, wk, wv)
    names = ["q", "x", "pos", "wk", "wv"]
    assert not np.any(np.asarray(g_np[2]))  # dpos is a structural zero
    for n, a, b in zip(names, g_np, g_ref):
        if n == "pos":
            continue
        a, b = np.asarray(a), np.asarray(b)
        tol = 3e-4 * max(1.0, np.abs(b).max())
        np.testing.assert_allclose(a, b, atol=tol, err_msg=n)


def test_mha_module_fused_matches_plain(rng):
    """MultiHeadAttention(use_pallas) == the XLA module path, shared params."""
    from fact_clip_tpu.models.layers import MultiHeadAttention, add_pos

    B, M, X, E, H = 2, 8, 1200, 128, 8
    query = jnp.array(rng.normal(size=(B, M, E)).astype(np.float32))
    memory = jnp.array(rng.normal(size=(B, X, E)).astype(np.float32))
    pos = jnp.array(rng.normal(size=(X, E)).astype(np.float32))
    key_mask = np.ones((B, X), bool)
    key_mask[1, 900:] = False
    key_mask = jnp.array(key_mask)

    plain = MultiHeadAttention(E, H, dropout=0.0)
    fused = MultiHeadAttention(E, H, dropout=0.0, use_pallas=True,
                               pallas_interpret=True, pallas_min_keys=64)
    params = plain.init(jax.random.PRNGKey(0), query, memory, memory,
                        key_mask=key_mask, key_pos=pos)
    y_plain = plain.apply(params, query, memory, memory, key_mask=key_mask, key_pos=pos)
    y_fused = fused.apply(params, query, memory, memory, key_mask=key_mask, key_pos=pos)
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_plain), atol=3e-4)


# ---------------------------------------------------------------------------
# bf16 backward regressions.  Mixed-precision training feeds the fused
# kernels bf16 streams/weights with f32 biases/LN params; the custom VJPs
# must return cotangents in the primals' dtypes, and the stack backwards'
# recompute references must keep the inter-layer stream in the input dtype
# (bf16 under mixed precision) exactly like the fused forward does.
# Round-2 regression: bf16 + pallas + dropout crashed in the backward.
# The in-kernel PRNG has no CPU interpret rule, so these run rate=0 (the
# dtype handling is rate-independent); dropout mode is hardware-verified
# by scripts/verify_pallas_dropout.py.
# ---------------------------------------------------------------------------


def _grad_vec(tree):
    return np.concatenate(
        [np.asarray(t, np.float32).ravel() for t in jax.tree_util.tree_leaves(tree)]
    )


def _assert_cotangent_dtypes(primals, grads):
    for p, g in zip(jax.tree_util.tree_leaves(primals), jax.tree_util.tree_leaves(grads)):
        assert g.dtype == p.dtype, (g.dtype, p.dtype)
        assert np.isfinite(np.asarray(g, np.float32)).all()


def test_stack_bf16_backward(rng):
    from fact_clip_tpu.ops.pallas.dilated_conv import dilated_residual_stack

    B, T, C = 2, 64, 32
    dilations = [1, 4]
    x32 = jnp.array(rng.normal(size=(B, T, C)).astype(np.float32))
    mask = np.ones((B, T), bool)
    mask[0, 40:] = False
    mask = jnp.array(mask)
    layers32 = tuple(_rand_layer(rng, C) for _ in dilations)
    seeds = (jnp.array([3], jnp.int32), jnp.array([7], jnp.int32))
    lw = jnp.array(rng.normal(size=(B, T, C)).astype(np.float32))

    def loss(x, layers):
        y = dilated_residual_stack(
            x, mask, layers, dilations, seeds=seeds, tile=32, interpret=True,
        )
        return (lw * y.astype(jnp.float32)).sum()

    # module dtype mix: conv/1x1 kernels + stream bf16; biases/LN params f32
    x16 = x32.astype(jnp.bfloat16)
    layers16 = tuple(
        (wd.astype(jnp.bfloat16), bd, w1.astype(jnp.bfloat16), b1, g_, beta)
        for (wd, bd, w1, b1, g_, beta) in layers32
    )
    gx, gl = jax.grad(loss, argnums=(0, 1))(x16, layers16)
    _assert_cotangent_dtypes((x16, layers16), (gx, gl))
    gx32, gl32 = jax.grad(loss, argnums=(0, 1))(x32, layers32)
    v16, v32 = _grad_vec((gx, gl)), _grad_vec((gx32, gl32))
    cos = float(v16 @ v32 / (np.linalg.norm(v16) * np.linalg.norm(v32) + 1e-12))
    assert cos > 0.98, cos


@pytest.mark.slow
def test_stack2_bf16_backward(rng):
    from fact_clip_tpu.ops.pallas.dilated_conv import dilated_residual2_stack

    B, T, C = 2, 48, 32
    dil_pairs = [(4, 1), (1, 4)]
    x32 = jnp.array(rng.normal(size=(B, T, C)).astype(np.float32))
    mask = np.ones((B, T), bool)
    mask[1, 30:] = False
    mask = jnp.array(mask)

    def rand2(rng):
        mk = lambda *s: jnp.array(rng.normal(size=s).astype(np.float32) * 0.08)
        return (mk(3, C, C), mk(C), mk(3, C, C), mk(C), mk(C, C), mk(C, C), mk(C))

    layers32 = tuple(rand2(rng) for _ in dil_pairs)
    seeds = (jnp.array([11], jnp.int32), jnp.array([13], jnp.int32))
    lw = jnp.array(rng.normal(size=(B, T, C)).astype(np.float32))

    def loss(x, layers):
        y = dilated_residual2_stack(
            x, mask, layers, dil_pairs, seeds=seeds, tile=32, interpret=True,
        )
        return (lw * y.astype(jnp.float32)).sum()

    bf = jnp.bfloat16
    x16 = x32.astype(bf)
    layers16 = tuple(
        (k1.astype(bf), b1, k2.astype(bf), b2, wt.astype(bf), wb.astype(bf), bfu)
        for (k1, b1, k2, b2, wt, wb, bfu) in layers32
    )
    gx, gl = jax.grad(loss, argnums=(0, 1))(x16, layers16)
    _assert_cotangent_dtypes((x16, layers16), (gx, gl))
    gx32, gl32 = jax.grad(loss, argnums=(0, 1))(x32, layers32)
    v16, v32 = _grad_vec((gx, gl)), _grad_vec((gx32, gl32))
    cos = float(v16 @ v32 / (np.linalg.norm(v16) * np.linalg.norm(v32) + 1e-12))
    assert cos > 0.98, cos


def test_single_layer_bf16_backward(rng):
    """The single-layer hand-derived VJP must also cast its cotangents."""
    from fact_clip_tpu.ops.pallas.dilated_conv import dilated_residual_layer

    B, T, C = 2, 48, 32
    bf = jnp.bfloat16
    x = jnp.array(rng.normal(size=(B, T, C)).astype(np.float32)).astype(bf)
    wd = jnp.array(rng.normal(size=(3, C, C)).astype(np.float32) * 0.08).astype(bf)
    bd = jnp.array(rng.normal(size=(C,)).astype(np.float32) * 0.05)
    w1 = jnp.array(rng.normal(size=(C, C)).astype(np.float32) * 0.08).astype(bf)
    b1 = jnp.array(rng.normal(size=(C,)).astype(np.float32) * 0.05)
    g_ = jnp.array(rng.normal(size=(C,)).astype(np.float32) * 0.2 + 1.0)
    beta = jnp.array(rng.normal(size=(C,)).astype(np.float32) * 0.2)
    seed = jnp.array([5], jnp.int32)

    def loss(*p):
        y = dilated_residual_layer(
            *p, dilation=2, seed=seed, tile=32, interpret=True
        )
        return (y.astype(jnp.float32) ** 2).sum()

    grads = jax.grad(loss, argnums=tuple(range(7)))(x, wd, bd, w1, b1, g_, beta)
    _assert_cotangent_dtypes((x, wd, bd, w1, b1, g_, beta), grads)


@pytest.mark.parametrize("X,Y", [(24, 70), (2000, 16)])  # small-X | flash
def test_x2y_bf16_backward(rng, X, Y):
    from fact_clip_tpu.ops.pallas.x2y_attn import x2y_attention

    B, Cx, Cy, d = 2, 16, 16, 64
    bf = jnp.bfloat16
    # module mix: streams + projection kernels bf16, biases f32
    args = dict(
        y_in=jnp.array(rng.normal(size=(B, Y, Cy)).astype(np.float32)).astype(bf),
        y_pos=jnp.array(rng.normal(size=(1, Y, Cy)).astype(np.float32)).astype(bf),
        x_in=jnp.array(rng.normal(size=(B, X, Cx)).astype(np.float32)).astype(bf),
        x_pos=jnp.array(rng.normal(size=(1, X, Cx)).astype(np.float32)).astype(bf),
        wk=jnp.array(rng.normal(size=(Cx, d)).astype(np.float32) * 0.1).astype(bf),
        bk=jnp.array(rng.normal(size=(d,)).astype(np.float32) * 0.1),
        wv=jnp.array(rng.normal(size=(Cx, d)).astype(np.float32) * 0.1).astype(bf),
        bv=jnp.array(rng.normal(size=(d,)).astype(np.float32) * 0.1),
        wq=jnp.array(rng.normal(size=(Cy, d)).astype(np.float32) * 0.1).astype(bf),
        bq=jnp.array(rng.normal(size=(d,)).astype(np.float32) * 0.1),
    )
    x_len = jnp.array([X, X - 3], jnp.int32)
    lw = jnp.array(rng.normal(size=(B, Y, d)).astype(np.float32))
    names = list(args)

    def loss(*vals):
        kw = dict(zip(names, vals))
        attn, probs, logits = x2y_attention(
            kw["y_in"], kw["y_pos"], kw["x_in"], kw["x_pos"], kw["wk"], kw["bk"],
            kw["wv"], kw["bv"], kw["wq"], kw["bq"], x_len, tile=256, interpret=True,
        )
        return (lw * attn.astype(jnp.float32)).sum() + probs.sum() * 0.1

    vals = tuple(args.values())
    grads = jax.grad(loss, argnums=tuple(range(len(vals))))(*vals)
    _assert_cotangent_dtypes(vals, grads)


@pytest.mark.slow
def test_mha_bf16_backward(rng):
    from fact_clip_tpu.ops.pallas.mha_attn import mha_cross_attention

    B, M, X, E, H = 2, 8, 600, 64, 4
    bf = jnp.bfloat16
    q = jnp.array(rng.normal(size=(B, M, E)).astype(np.float32)).astype(bf)
    x = jnp.array(rng.normal(size=(B, X, E)).astype(np.float32)).astype(bf)
    pos = jnp.array(rng.normal(size=(1, X, E)).astype(np.float32)).astype(bf)
    wk = jnp.array(rng.normal(size=(E, E)).astype(np.float32) * 0.1).astype(bf)
    bk = jnp.array(rng.normal(size=(E,)).astype(np.float32) * 0.1)
    wv = jnp.array(rng.normal(size=(E, E)).astype(np.float32) * 0.1).astype(bf)
    bv = jnp.array(rng.normal(size=(E,)).astype(np.float32) * 0.1)
    x_len = jnp.array([X, X - 40], jnp.int32)
    seed = jnp.array([17], jnp.int32)
    lw = jnp.array(rng.normal(size=(B, M, E)).astype(np.float32))

    def loss(q, x, pos, wk, bk, wv, bv):
        out = mha_cross_attention(q, x, pos, wk, bk, wv, bv, x_len, num_heads=H,
                                  seed=seed, tile=256, interpret=True)
        return (lw * out.astype(jnp.float32)).sum()

    grads = jax.grad(loss, argnums=tuple(range(7)))(q, x, pos, wk, bk, wv, bv)
    _assert_cotangent_dtypes((q, x, pos, wk, bk, wv, bv), grads)


@pytest.mark.slow
def test_stack_dilation_larger_than_tile(rng):
    """Short buckets with deep towers: dilation > tile used to read unwritten
    halo garbage in tiles past the first/last (zeroing was edge-tile-only)."""
    from fact_clip_tpu.ops.pallas.dilated_conv import (
        _stack_reference, dilated_residual_stack)

    B, T, C, d, tile = 2, 100, 32, 64, 16
    x = jnp.array(rng.normal(size=(B, T, C)).astype(np.float32))
    mask = np.ones((B, T), bool)
    mask[1, 80:] = False
    mask = jnp.array(mask)
    layers = [_rand_layer(rng, C) for _ in range(2)]
    lw = jnp.array(rng.normal(size=(B, T, C)).astype(np.float32))
    seeds = (jnp.zeros((1,), jnp.int32),) * 2

    got = dilated_residual_stack(x, mask, layers, [d, d], tile=tile, interpret=True)
    ref = _stack_reference(x, mask, layers, (d, d), True, 1e-5, (0.0,) * 2,
                           seeds, tile, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-5)

    gx = jax.grad(lambda x: (lw * dilated_residual_stack(
        x, mask, layers, [d, d], tile=tile, interpret=True)).sum())(x)
    gr = jax.grad(lambda x: (lw * _stack_reference(
        x, mask, layers, (d, d), True, 1e-5, (0.0,) * 2, seeds, tile, True)).sum())(x)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gr), atol=3e-4)


@pytest.mark.slow
def test_stack_grads_no_ln(rng):
    """use_ln=False (the flagship f_ln: false recipe) through the fused
    backward kernels."""
    from fact_clip_tpu.ops.pallas.dilated_conv import dilated_residual_stack

    B, T, C = 2, 64, 32
    dilations = [1, 4]
    x = jnp.array(rng.normal(size=(B, T, C)).astype(np.float32))
    mask = np.ones((B, T), bool)
    mask[0, 40:] = False
    mask = jnp.array(mask)
    layers = tuple(_rand_layer(rng, C) for _ in dilations)
    lw = jnp.array(rng.normal(size=(B, T, C)).astype(np.float32))

    def loss_stack(x, layers):
        y = dilated_residual_stack(x, mask, layers, dilations, use_ln=False,
                                   tile=32, interpret=True)
        return (lw * y).sum()

    def loss_ref(x, layers):
        ref = x
        m = mask[:, :, None].astype(x.dtype)
        for (wd, bd, w1, b1, g, beta), d in zip(layers, dilations):
            xm = ref * m
            conv = jax.lax.conv_general_dilated(
                xm, wd, (1,), [(d, d)], rhs_dilation=(d,),
                dimension_numbers=("NWC", "WIO", "NWC")) + bd
            ref = (jax.nn.relu(conv) @ w1 + b1 + xm) * m
        return (lw * ref).sum()

    gx, gl = jax.grad(loss_stack, argnums=(0, 1))(x, layers)
    gx_r, gl_r = jax.grad(loss_ref, argnums=(0, 1))(x, layers)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_r), atol=3e-4)
    for a, b in zip(jax.tree_util.tree_leaves(gl), jax.tree_util.tree_leaves(gl_r)):
        if a.shape == ():  # gamma/beta grads are zero in no-LN mode
            continue
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-4)


@pytest.mark.slow
def test_full_model_grads_pallas_vs_xla(rng):
    """Integration guard: the whole FACT model's loss + grads with EVERY
    fused kernel engaged (stacks, MHA, X2Y — interpret mode, all custom
    backwards) match the plain-XLA path.  Catches interactions between the
    fused backwards inside one graph that per-kernel tests cannot."""
    import unittest.mock as mock

    from fact_clip_tpu.models import blocks as blocks_mod
    from fact_clip_tpu.models import losses, matching
    from fact_clip_tpu.models.blocks import build_fact
    from fact_clip_tpu.ops.pallas import dilated_conv as dc
    from fact_clip_tpu.ops.pallas import mha_attn as mha
    from fact_clip_tpu.ops.pallas import sa_layer as sal
    from fact_clip_tpu.ops.pallas import x2y_attn as x2y

    from test_model import make_batch, small_cfg

    batch = make_batch(rng)
    C = 5
    cfg = small_cfg("iuU")
    cfg.Bi.dropout = 0.0  # the CPU interpreter cannot run the TPU PRNG
    cfg.Bi.a = "sca"  # exercise the fused MHA path
    model = build_fact(cfg, 12, C, s_pred_cap=24)
    cfgp = small_cfg("iuU")
    cfgp.Bi.dropout = 0.0
    cfgp.Bi.a = "sca"
    cfgp.TPU.pallas = True
    model_p = build_fact(cfgp, 12, C, s_pred_cap=24)

    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
         "aug": jax.random.PRNGKey(2)},
        batch["feats"], batch["mask"], batch["lengths"], train=False,
    )

    def loss_for(m, p):
        saves, _ = m.apply(p, batch["feats"], batch["mask"], batch["lengths"], train=False)
        cprob = jax.nn.softmax(saves[-1]["action_clogit"], axis=-1)
        seg2tok = matching.match(
            cfg.Loss, cprob, saves[-1]["a2f_attn"], batch["transcript"],
            batch["seg_label"], batch["seg_mask"], batch["mask"],
            matcher="host", nclasses=C,
        )
        per_video = losses.fact_loss(
            saves, batch, seg2tok, jnp.ones((C + 1,)), cfg.Loss.sw, token_mask=None
        )
        return per_video.mean()

    def interp(fn, **extra):
        def wrapped(*a, **kw):
            kw["interpret"] = True
            kw.update(extra)
            return fn(*a, **kw)
        return wrapped

    l_plain, g_plain = jax.value_and_grad(lambda p: loss_for(model, p))(params)
    with mock.patch.object(blocks_mod, "_want_pallas", lambda cfg: True), \
         mock.patch.object(dc, "dilated_residual_stack", interp(dc.dilated_residual_stack, tile=32)), \
         mock.patch.object(dc, "dilated_residual2_stack", interp(dc.dilated_residual2_stack, tile=32)), \
         mock.patch.object(mha, "mha_cross_attention", interp(mha.mha_cross_attention, tile=256)), \
         mock.patch.object(x2y, "x2y_attention", interp(x2y.x2y_attention, tile=256)), \
         mock.patch.object(sal, "sa_sublayer", interp(sal.sa_sublayer)), \
         mock.patch.object(sal, "ffn_sublayer", interp(sal.ffn_sublayer)):
        model_p = build_fact(cfgp, 12, C, s_pred_cap=24)  # re-resolve block cfgs
        l_pallas, g_pallas = jax.value_and_grad(lambda p: loss_for(model_p, p))(params)

    assert abs(float(l_pallas) - float(l_plain)) < 1e-3 * max(1.0, abs(float(l_plain)))
    va = np.concatenate([np.asarray(t).ravel() for t in jax.tree_util.tree_leaves(g_pallas)])
    vb = np.concatenate([np.asarray(t).ravel() for t in jax.tree_util.tree_leaves(g_plain)])
    assert np.isfinite(va).all()
    cos = float(va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb) + 1e-12))
    assert cos > 0.9999, cos
    np.testing.assert_allclose(va, vb, atol=5e-3 * max(1.0, np.abs(vb).max()))


# fused frame CE + smoothing loss (ops/pallas/frame_loss.py)


def test_fused_frame_loss_matches_xla(rng):
    from fact_clip_tpu.models import losses
    from fact_clip_tpu.ops.pallas.frame_loss import fused_ce_smooth_sums, fused_smooth_sum

    B, T, C = 3, 100, 11
    logits = jnp.array(rng.normal(size=(B, T, C)).astype(np.float32) * 2.0)
    labels = jnp.array(rng.integers(0, C, size=(B, T)), jnp.int32)
    lengths = np.array([T, T - 17, 40])
    mask = jnp.array(np.arange(T)[None, :] < lengths[:, None])
    cweight = jnp.array(rng.uniform(0.5, 1.5, size=(C + 1,)).astype(np.float32))
    pair_mask = mask[:, 1:] & mask[:, :-1]

    ce_sum, sl_sum = fused_ce_smooth_sums(logits, labels, mask, cweight, interpret=True)
    fl = ce_sum / jnp.maximum(mask.astype(jnp.float32).sum(1), 1e-12)
    sl = sl_sum / jnp.maximum(pair_mask.sum(1) * C, 1e-12)
    fl_ref = losses.frame_loss(logits, labels, mask, cweight)
    sl_ref = losses.smooth_loss(logits, pair_mask)
    np.testing.assert_allclose(np.asarray(fl), np.asarray(fl_ref), rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(sl), np.asarray(sl_ref), rtol=2e-5, atol=1e-6)

    sl2 = fused_smooth_sum(logits, mask, interpret=True)
    np.testing.assert_allclose(np.asarray(sl2), np.asarray(sl_sum), rtol=1e-6)


@pytest.mark.slow
def test_fused_frame_loss_grads_match_xla(rng):
    from fact_clip_tpu.models import losses
    from fact_clip_tpu.ops.pallas.frame_loss import fused_ce_smooth_sums

    B, T, C = 2, 64, 7
    # amplified logits so some adjacent diffs saturate the clip at 16
    logits = jnp.array(rng.normal(size=(B, T, C)).astype(np.float32) * 3.0)
    labels = jnp.array(rng.integers(0, C, size=(B, T)), jnp.int32)
    mask = jnp.array(np.arange(T)[None, :] < np.array([T, T - 9])[:, None])
    cweight = jnp.array(rng.uniform(0.5, 1.5, size=(C + 1,)).astype(np.float32))
    pair_mask = mask[:, 1:] & mask[:, :-1]
    wce = jnp.array(rng.normal(size=(B,)).astype(np.float32))
    wsl = jnp.array(rng.normal(size=(B,)).astype(np.float32))

    def loss_fused(x):
        ce_sum, sl_sum = fused_ce_smooth_sums(x, labels, mask, cweight, interpret=True)
        fl = ce_sum / jnp.maximum(mask.astype(jnp.float32).sum(1), 1e-12)
        sl = sl_sum / jnp.maximum(pair_mask.sum(1) * C, 1e-12)
        return (wce * fl + wsl * sl).sum()

    def loss_ref(x):
        fl = losses.frame_loss(x, labels, mask, cweight)
        sl = losses.smooth_loss(x, pair_mask)
        return (wce * fl + wsl * sl).sum()

    assert abs(float(loss_fused(logits)) - float(loss_ref(logits))) < 1e-5
    gf = jax.grad(loss_fused)(logits)
    gr = jax.grad(loss_ref)(logits)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gr), atol=1e-5)


@pytest.mark.slow
def test_fused_frame_loss_multi_tile(rng, monkeypatch):
    """Tile-boundary pairs: force K=16 so T=100 spans 7 tiles (last partial)."""
    from fact_clip_tpu.models import losses
    from fact_clip_tpu.ops.pallas import frame_loss as fl_mod

    monkeypatch.setattr(fl_mod, "_K_MAX", 16)
    B, T, C = 3, 100, 11
    logits = jnp.array(rng.normal(size=(B, T, C)).astype(np.float32) * 3.0)
    labels = jnp.array(rng.integers(0, C, size=(B, T)), jnp.int32)
    lengths = np.array([T, T - 17, 40])
    mask = jnp.array(np.arange(T)[None, :] < lengths[:, None])
    cweight = jnp.array(rng.uniform(0.5, 1.5, size=(C + 1,)).astype(np.float32))
    pair_mask = mask[:, 1:] & mask[:, :-1]
    wce = jnp.array(rng.normal(size=(B,)).astype(np.float32))
    wsl = jnp.array(rng.normal(size=(B,)).astype(np.float32))

    def loss_fused(x):
        ce_sum, sl_sum = fl_mod.fused_ce_smooth_sums(
            x, labels, mask, cweight, interpret=True)
        fl = ce_sum / jnp.maximum(mask.astype(jnp.float32).sum(1), 1e-12)
        sl = sl_sum / jnp.maximum(pair_mask.sum(1) * C, 1e-12)
        return (wce * fl + wsl * sl).sum()

    def loss_ref(x):
        fl = losses.frame_loss(x, labels, mask, cweight)
        sl = losses.smooth_loss(x, pair_mask)
        return (wce * fl + wsl * sl).sum()

    assert abs(float(loss_fused(logits)) - float(loss_ref(logits))) < 1e-5
    gf = jax.grad(loss_fused)(logits)
    gr = jax.grad(loss_ref)(logits)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gr), atol=1e-5)


@pytest.mark.slow
def test_block_loss_fused_path_matches(rng):
    """block_loss with use_pallas=True (interpret-patched) == plain path."""
    from unittest import mock

    from fact_clip_tpu.models import losses
    from fact_clip_tpu.ops.pallas import frame_loss as fl_mod

    B, T, C, S, M = 2, 80, 6, 5, 8
    logits = jnp.array(rng.normal(size=(B, T, C)).astype(np.float32))
    labels = jnp.array(rng.integers(0, C, size=(B, T)), jnp.int32)
    mask = jnp.array(np.arange(T)[None, :] < np.array([T, T - 13])[:, None])
    batch = dict(
        labels=labels, mask=mask,
        seg_label=jnp.array(rng.integers(0, S, size=(B, T)), jnp.int32),
        transcript=jnp.array(rng.integers(0, C, size=(B, S)), jnp.int32),
        seg_mask=jnp.ones((B, S), bool),
    )
    saves = {
        "kind": "u",
        "frame_clogit": logits,
        "action_clogit": jnp.array(rng.normal(size=(B, M, C + 1)).astype(np.float32)),
        "f2a_attn_logit": jnp.array(rng.normal(size=(B, M, T)).astype(np.float32)),
        "a2f_attn_logit": jnp.array(rng.normal(size=(B, T, M)).astype(np.float32)),
    }
    seg2tok = jnp.array(rng.integers(0, M, size=(B, S)), jnp.int32)
    cw = jnp.ones((C + 1,), jnp.float32)

    plain = losses.block_loss(saves, batch, seg2tok, cw, 0.3, use_pallas=False)

    orig_ce, orig_sm = fl_mod.fused_ce_smooth_sums, fl_mod.fused_smooth_sum
    with mock.patch.object(fl_mod, "fused_ce_smooth_sums",
                           lambda *a, **k: orig_ce(*a, **{**k, "interpret": True})), \
         mock.patch.object(fl_mod, "fused_smooth_sum",
                           lambda *a, **k: orig_sm(*a, **{**k, "interpret": True})):
        fused = losses.block_loss(saves, batch, seg2tok, cw, 0.3, use_pallas=True)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(plain), rtol=2e-5, atol=1e-6)


# ---------------------------------------------------------------------------
# fused SA/FFN action-branch sublayer kernels (ops/pallas/sa_layer.py).
# Dropout uses the in-kernel PRNG (no CPU interpret rule), so these run
# deterministic; dropout mode is hardware-verified by
# scripts/verify_sa_layer.py.
# ---------------------------------------------------------------------------


def _sa_layer_pair(E, H, F, dtype=None):
    from fact_clip_tpu.models.layers import SALayer

    plain = SALayer(E, H, F, dropout=0.3, attn_dropout=0.2, dtype=dtype)
    fused = SALayer(E, H, F, dropout=0.3, attn_dropout=0.2, dtype=dtype,
                    use_pallas_sa=True, pallas_interpret=True)
    return plain, fused


def test_sa_layer_fused_matches_plain(rng):
    """SALayer(use_pallas_sa) == the XLA path with shared params, and the
    fused path initializes an identical parameter tree."""
    B, M, E, H, F = 3, 11, 128, 8, 96
    x = jnp.array(rng.normal(size=(B, M, E)).astype(np.float32))
    pos = jnp.array(rng.normal(size=(M, E)).astype(np.float32))
    plain, fused = _sa_layer_pair(E, H, F)

    params = plain.init(jax.random.PRNGKey(0), x, x, x, query_pos=pos, key_pos=pos)
    params_f = fused.init(jax.random.PRNGKey(0), x, x, x, query_pos=pos, key_pos=pos)
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(params_f)
    for a, b in zip(jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(params_f)):
        assert a.shape == b.shape and a.dtype == b.dtype

    y_plain = plain.apply(params, x, x, x, query_pos=pos, key_pos=pos)
    y_fused = fused.apply(params, x, x, x, query_pos=pos, key_pos=pos)
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_plain),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.slow
def test_sa_layer_fused_grads_match(rng):
    B, M, E, H, F = 2, 9, 64, 4, 48
    x = jnp.array(rng.normal(size=(B, M, E)).astype(np.float32))
    pos = jnp.array(rng.normal(size=(M, E)).astype(np.float32))
    plain, fused = _sa_layer_pair(E, H, F)
    params = plain.init(jax.random.PRNGKey(1), x, x, x, query_pos=pos, key_pos=pos)

    def loss(mod):
        def f(p, xx):
            y = mod.apply(p, xx, xx, xx, query_pos=pos, key_pos=pos)
            return (y * jnp.cos(y)).sum()
        return f

    gp, gx = jax.grad(loss(plain), argnums=(0, 1))(params, x)
    gfp, gfx = jax.grad(loss(fused), argnums=(0, 1))(params, x)
    np.testing.assert_allclose(_grad_vec(gfx), _grad_vec(gx), rtol=5e-4, atol=5e-5)
    ref = _grad_vec(gp)
    got = _grad_vec(gfp)
    np.testing.assert_allclose(got, ref, rtol=5e-4, atol=5e-4 * np.abs(ref).max())


@pytest.mark.slow
def test_sca_layer_fused_matches_plain(rng):
    """SCALayer(use_pallas_sa): fused self-attn + FFN sublayers around the
    unchanged cross-attention; identical tree, equal outputs and grads."""
    from fact_clip_tpu.models.layers import SCALayer

    B, M, T, E, H, F = 2, 10, 37, 64, 4, 80
    tgt = jnp.array(rng.normal(size=(B, M, E)).astype(np.float32))
    mem = jnp.array(rng.normal(size=(B, T, E)).astype(np.float32))
    qpos = jnp.array(rng.normal(size=(M, E)).astype(np.float32))
    mpos = jnp.array(rng.normal(size=(T, E)).astype(np.float32))
    mmask = jnp.array(np.arange(T)[None, :] < np.array([T, T - 9])[:, None])

    plain = SCALayer(E, E, H, F, dropout=0.1, attn_dropout=0.1)
    fused = SCALayer(E, E, H, F, dropout=0.1, attn_dropout=0.1,
                     use_pallas_sa=True, pallas_interpret=True)
    kw = dict(pos=mpos, query_pos=qpos, memory_mask=mmask)
    params = plain.init(jax.random.PRNGKey(0), tgt, mem, **kw)
    params_f = fused.init(jax.random.PRNGKey(0), tgt, mem, **kw)
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(params_f)

    y_plain = plain.apply(params, tgt, mem, **kw)
    y_fused = fused.apply(params, tgt, mem, **kw)
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_plain),
                               rtol=2e-5, atol=2e-5)

    def loss(mod):
        def f(p, tt, mm):
            y = mod.apply(p, tt, mm, **kw)
            return (y * jnp.sin(y)).sum()
        return f

    gp, gt, gm = jax.grad(loss(plain), argnums=(0, 1, 2))(params, tgt, mem)
    gfp, gft, gfm = jax.grad(loss(fused), argnums=(0, 1, 2))(params, tgt, mem)
    np.testing.assert_allclose(_grad_vec(gft), _grad_vec(gt), rtol=5e-4, atol=5e-5)
    np.testing.assert_allclose(_grad_vec(gfm), _grad_vec(gm), rtol=5e-4, atol=5e-5)
    ref, got = _grad_vec(gp), _grad_vec(gfp)
    np.testing.assert_allclose(got, ref, rtol=5e-4, atol=5e-4 * np.abs(ref).max())


@pytest.mark.slow
def test_sa_layer_fused_bf16(rng):
    """bf16 mixed precision through the fused sublayers: matches the XLA
    bf16 path within bf16 tolerance, cotangents finite and input-dtyped."""
    B, M, E, H, F = 2, 8, 64, 4, 64
    x = jnp.array(rng.normal(size=(B, M, E)).astype(np.float32))
    pos = jnp.array(rng.normal(size=(M, E)).astype(np.float32))
    plain, fused = _sa_layer_pair(E, H, F, dtype=jnp.bfloat16)
    params = plain.init(jax.random.PRNGKey(0), x, x, x, query_pos=pos, key_pos=pos)

    y_plain = plain.apply(params, x, x, x, query_pos=pos, key_pos=pos)
    y_fused = fused.apply(params, x, x, x, query_pos=pos, key_pos=pos)
    np.testing.assert_allclose(np.asarray(y_fused, np.float32),
                               np.asarray(y_plain, np.float32), rtol=0.05, atol=0.05)

    def f(p, xx):
        y = fused.apply(p, xx, xx, xx, query_pos=pos, key_pos=pos)
        return (y.astype(jnp.float32) ** 2).sum()

    gp, gx = jax.grad(f, argnums=(0, 1))(params, x)
    _assert_cotangent_dtypes((params, x), (gp, gx))


# ---------------------------------------------------------------------------
# int8-quantized inference stack (ops/pallas/quant_conv.py)


@pytest.mark.slow
@pytest.mark.parametrize("use_ln", [True, False])
def test_q8_stack_close_to_f32(rng, use_ln):
    """Int8 tower tracks the f32 fused tower within dynamic-quant tolerance
    (per-row activation + per-channel weight scales: ~0.5% relative)."""
    from fact_clip_tpu.ops.pallas.dilated_conv import dilated_residual_stack
    from fact_clip_tpu.ops.pallas.quant_conv import dilated_residual_stack_q8

    B, T, C = 2, 70, 32
    dilations = [1, 2, 4, 8]
    x = jnp.array(rng.normal(size=(B, T, C)).astype(np.float32))
    mask = np.ones((B, T), bool)
    mask[1, 50:] = False
    mask = jnp.array(mask)
    layers = [_rand_layer(rng, C) for _ in dilations]

    f32 = np.asarray(dilated_residual_stack(
        x, mask, layers, dilations, use_ln=use_ln, tile=32, interpret=True))
    q8 = np.asarray(dilated_residual_stack_q8(
        x, mask, layers, dilations, use_ln=use_ln, tile=32, interpret=True))

    assert np.all(np.isfinite(q8))
    rel = np.linalg.norm(q8 - f32) / np.linalg.norm(f32)
    assert rel < 0.02, f"relative error {rel:.4f}"
    # padded frames stay exactly zero (write-mask invariant)
    np.testing.assert_array_equal(q8[1, 50:], 0.0)


def test_q8_weight_roundtrip(rng):
    """Per-channel symmetric weight quantization: reconstruction error is at
    most half a quantization step of each channel's absmax."""
    from fact_clip_tpu.ops.pallas.quant_conv import quantize_weight

    w = jnp.array(rng.normal(size=(3, 32, 32)).astype(np.float32) * 0.08)
    q, s = quantize_weight(w)
    assert q.dtype == jnp.int8
    rec = np.asarray(q, np.float32) * np.asarray(s)[:, None, :] * 127.0
    step = np.abs(np.asarray(w)).max(axis=1, keepdims=True) / 127.0
    assert np.all(np.abs(rec - np.asarray(w)) <= 0.5 * step + 1e-7)


def test_q8_weight_joint_roundtrip(rng):
    """Joint-tap quantization (act_scale="tile" path): one scale per output
    channel across taps and C_in; reconstruction within half its step."""
    from fact_clip_tpu.ops.pallas.quant_conv import quantize_weight_joint

    w = jnp.array(rng.normal(size=(3, 32, 32)).astype(np.float32) * 0.08)
    q, s = quantize_weight_joint(w)
    assert q.dtype == jnp.int8 and s.shape == (32,)
    rec = np.asarray(q, np.float32) * np.asarray(s)[None, None, :] * 127.0
    step = np.abs(np.asarray(w)).max(axis=(0, 1), keepdims=True) / 127.0
    assert np.all(np.abs(rec - np.asarray(w)) <= 0.5 * step + 1e-7)


@pytest.mark.parametrize("act_scale", ["row", "tile"])
def test_q8_stack_act_scale_modes(rng, act_scale):
    """Both activation-scale formulations stay within quantization tolerance
    of the f32 tower and keep the padded-frame write-mask invariant."""
    from fact_clip_tpu.ops.pallas.dilated_conv import dilated_residual_stack
    from fact_clip_tpu.ops.pallas.quant_conv import dilated_residual_stack_q8

    B, T, C = 2, 70, 32
    dilations = [1, 2, 4, 8]
    x = jnp.array(rng.normal(size=(B, T, C)).astype(np.float32))
    mask = np.ones((B, T), bool)
    mask[1, 50:] = False
    mask = jnp.array(mask)
    layers = [_rand_layer(rng, C) for _ in dilations]

    f32 = np.asarray(dilated_residual_stack(
        x, mask, layers, dilations, tile=32, interpret=True))
    q8 = np.asarray(dilated_residual_stack_q8(
        x, mask, layers, dilations, tile=32, interpret=True,
        act_scale=act_scale))
    rel = np.linalg.norm(q8 - f32) / np.linalg.norm(f32)
    assert rel < 0.03, f"act_scale={act_scale}: relative error {rel:.4f}"
    np.testing.assert_array_equal(q8[1, 50:], 0.0)


@pytest.mark.slow
@pytest.mark.parametrize("act_scale", ["row", "tile"])
def test_q8_stack2_act_scale_modes(rng, act_scale):
    from fact_clip_tpu.ops.pallas.dilated_conv import dilated_residual2_stack
    from fact_clip_tpu.ops.pallas.quant_conv import dilated_residual2_stack_q8

    B, T, C = 2, 70, 32
    dpairs = [(8, 1), (4, 2), (2, 4), (1, 8)]
    x = jnp.array(rng.normal(size=(B, T, C)).astype(np.float32))
    mask = np.ones((B, T), bool)
    mask[1, 50:] = False
    mask = jnp.array(mask)
    layers = [_rand_layer2(rng, C) for _ in dpairs]

    f32 = np.asarray(dilated_residual2_stack(
        x, mask, layers, dpairs, tile=32, interpret=True))
    q8 = np.asarray(dilated_residual2_stack_q8(
        x, mask, layers, dpairs, tile=32, interpret=True,
        act_scale=act_scale))
    rel = np.linalg.norm(q8 - f32) / np.linalg.norm(f32)
    assert rel < 0.03, f"act_scale={act_scale}: relative error {rel:.4f}"
    np.testing.assert_array_equal(q8[1, 50:], 0.0)


@pytest.mark.slow
def test_mstcn_q8_path_close_to_unfused(rng):
    """MSTCN with quantize='int8' (eval) tracks the unfused f32 module; the
    same module under deterministic=False takes the differentiable path."""
    import unittest.mock as mock

    from fact_clip_tpu.models.layers import MSTCN
    from fact_clip_tpu.ops.pallas import dilated_conv as dc
    from fact_clip_tpu.ops.pallas import quant_conv as qc

    B, T, D, H = 2, 60, 12, 32
    x = jnp.array(rng.normal(size=(B, T, D)).astype(np.float32))
    mask = np.ones((B, T), bool)
    mask[1, 44:] = False
    mask = jnp.array(mask)

    def interp(orig):
        def f(*a, **kw):
            kw["interpret"] = True
            kw["tile"] = 32
            return orig(*a, **kw)
        return f

    # dropout 0: the interpret-mode shim cannot run the in-kernel PRNG on CPU
    kw = dict(in_dim=D, hid_dim=H, out_dim=H, num_layers=3, dropout=0.0,
              ln=True, ngroup=1, in_map=True)
    m_q8 = MSTCN(use_pallas=True, quantize="int8", **kw)
    m_plain = MSTCN(use_pallas=False, **kw)
    params = m_plain.init({"params": jax.random.PRNGKey(0)}, x, mask, True)

    with mock.patch.object(qc, "dilated_residual_stack_q8",
                           interp(qc.dilated_residual_stack_q8)):
        y_q8 = m_q8.apply(params, x, mask, True)
    y_plain = m_plain.apply(params, x, mask, True)
    mv = np.asarray(mask)
    a, b = np.asarray(y_q8)[mv], np.asarray(y_plain)[mv]
    assert np.all(np.isfinite(a))
    rel = np.linalg.norm(a - b) / np.linalg.norm(b)
    assert rel < 0.02, f"relative error {rel:.4f}"

    # training (deterministic=False) must stay on the differentiable fused
    # stack — int8 rounding has no gradient
    with mock.patch.object(dc, "dilated_residual_stack",
                           interp(dc.dilated_residual_stack)):
        def loss(p):
            y = m_q8.apply(p, x, mask, False, rngs={"dropout": jax.random.PRNGKey(1)})
            return (y ** 2).sum()

        g = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert leaves and all(np.all(np.isfinite(np.asarray(l))) for l in leaves)


def test_quantize_infer_config_plumbing():
    """cfg.TPU.quantize_infer reaches BlockCfg.quantize only when the Pallas
    backend is available; bogus values are rejected."""
    import unittest.mock as mock

    from fact_clip_tpu.configs.default import get_cfg_defaults
    from fact_clip_tpu.models import blocks as Bmod

    cfg = get_cfg_defaults()
    cfg.TPU.quantize_infer = "int8"
    with mock.patch.object(Bmod, "_PALLAS_PLATFORM_OVERRIDE", "tpu"):
        cfgs = Bmod.resolve_block_cfgs(cfg)
    assert all(c.quantize == "int8" for c in cfgs)
    with mock.patch.object(Bmod, "_PALLAS_PLATFORM_OVERRIDE", "cpu"):
        cfgs = Bmod.resolve_block_cfgs(cfg)
    assert all(c.quantize == "" for c in cfgs)
    cfg.TPU.quantize_infer = "int4"
    with mock.patch.object(Bmod, "_PALLAS_PLATFORM_OVERRIDE", "tpu"):
        with pytest.raises(AssertionError):
            Bmod.resolve_block_cfgs(cfg)


def _rand_layer2(rng, C):
    k1 = jnp.array(rng.normal(size=(3, C, C)).astype(np.float32) * 0.08)
    b1 = jnp.array(rng.normal(size=(C,)).astype(np.float32) * 0.05)
    k2 = jnp.array(rng.normal(size=(3, C, C)).astype(np.float32) * 0.08)
    b2 = jnp.array(rng.normal(size=(C,)).astype(np.float32) * 0.05)
    wt = jnp.array(rng.normal(size=(C, C)).astype(np.float32) * 0.08)
    wb = jnp.array(rng.normal(size=(C, C)).astype(np.float32) * 0.08)
    bf = jnp.array(rng.normal(size=(C,)).astype(np.float32) * 0.05)
    return (k1, b1, k2, b2, wt, wb, bf)


def test_q8_stack2_close_to_f32(rng):
    """Int8 MS-TCN++ tower tracks the f32 fused tower within dynamic-quant
    tolerance; padded frames stay zero."""
    from fact_clip_tpu.ops.pallas.dilated_conv import dilated_residual2_stack
    from fact_clip_tpu.ops.pallas.quant_conv import dilated_residual2_stack_q8

    B, T, C = 2, 70, 32
    dil_pairs = [(8, 1), (4, 2), (1, 8)]
    x = jnp.array(rng.normal(size=(B, T, C)).astype(np.float32))
    mask = np.ones((B, T), bool)
    mask[1, 50:] = False
    mask = jnp.array(mask)
    layers = [_rand_layer2(rng, C) for _ in dil_pairs]

    f32 = np.asarray(dilated_residual2_stack(
        x, mask, layers, dil_pairs, tile=32, interpret=True))
    q8 = np.asarray(dilated_residual2_stack_q8(
        x, mask, layers, dil_pairs, tile=32, interpret=True))

    assert np.all(np.isfinite(q8))
    rel = np.linalg.norm(q8 - f32) / np.linalg.norm(f32)
    assert rel < 0.02, f"relative error {rel:.4f}"
    np.testing.assert_array_equal(q8[1, 50:], 0.0)


def test_mstcn2_q8_path_close_to_unfused(rng):
    """MSTCN2 with quantize='int8' (eval) tracks the unfused f32 module."""
    import unittest.mock as mock

    from fact_clip_tpu.models.layers import MSTCN2
    from fact_clip_tpu.ops.pallas import quant_conv as qc

    B, T, D, H = 2, 60, 12, 32
    x = jnp.array(rng.normal(size=(B, T, D)).astype(np.float32))
    mask = np.ones((B, T), bool)
    mask[1, 44:] = False
    mask = jnp.array(mask)

    def interp(orig):
        def f(*a, **kw):
            kw["interpret"] = True
            kw["tile"] = 32
            return orig(*a, **kw)
        return f

    kw = dict(in_dim=D, hid_dim=H, out_dim=H, num_layers=3, dropout=0.0,
              ngroup=1, in_map=True)
    m_q8 = MSTCN2(use_pallas=True, quantize="int8", **kw)
    m_plain = MSTCN2(use_pallas=False, **kw)
    params = m_plain.init({"params": jax.random.PRNGKey(0)}, x, mask, True)

    with mock.patch.object(qc, "dilated_residual2_stack_q8",
                           interp(qc.dilated_residual2_stack_q8)):
        y_q8 = m_q8.apply(params, x, mask, True)
    y_plain = m_plain.apply(params, x, mask, True)
    mv = np.asarray(mask)
    a, b = np.asarray(y_q8)[mv], np.asarray(y_plain)[mv]
    assert np.all(np.isfinite(a))
    rel = np.linalg.norm(a - b) / np.linalg.norm(b)
    assert rel < 0.02, f"relative error {rel:.4f}"


def test_dense_q8_close_and_tree_compatible(rng):
    """Int8 dense tracks the f32 dense; _Q8Dense shares nn.Dense's exact
    param tree so checkpoints are interchangeable."""
    from fact_clip_tpu.models.layers import TorchDense
    from fact_clip_tpu.ops.pallas.quant_conv import dense_q8

    B, T, D, H = 2, 40, 64, 32
    x = jnp.array(rng.normal(size=(B, T, D)).astype(np.float32))
    m_plain = TorchDense(H)
    m_q8 = TorchDense(H, quantize="int8")
    params = m_plain.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(
        m_q8.init(jax.random.PRNGKey(0), x))

    y_plain = np.asarray(m_plain.apply(params, x))
    y_q8 = np.asarray(m_q8.apply(params, x))
    rel = np.linalg.norm(y_q8 - y_plain) / np.linalg.norm(y_plain)
    assert rel < 0.02, f"relative error {rel:.4f}"

    # direct helper agrees with the module path
    w = params["params"]["Dense_0"]["kernel"]
    b = params["params"]["Dense_0"]["bias"]
    np.testing.assert_allclose(np.asarray(dense_q8(x, w, b)), y_q8, atol=1e-6)


@pytest.mark.slow
def test_q8_stack_bf16_streams(rng):
    """Int8 tower under mixed precision: bf16 inter-layer streams in/out,
    quantization from the bf16 values, still tracks the f32 tower."""
    from fact_clip_tpu.ops.pallas.dilated_conv import dilated_residual_stack
    from fact_clip_tpu.ops.pallas.quant_conv import dilated_residual_stack_q8

    B, T, C = 2, 70, 32
    dilations = [1, 2, 4, 8]
    x = jnp.array(rng.normal(size=(B, T, C)).astype(np.float32))
    mask = jnp.array(np.ones((B, T), bool))
    layers = [_rand_layer(rng, C) for _ in dilations]
    layers_bf = [tuple(w.astype(jnp.bfloat16) if w.ndim > 1 else w for w in l)
                 for l in layers]

    f32 = np.asarray(dilated_residual_stack(
        x, mask, layers, dilations, tile=32, interpret=True))
    q8b = dilated_residual_stack_q8(
        x.astype(jnp.bfloat16), mask, layers_bf, dilations, tile=32, interpret=True)
    assert q8b.dtype == jnp.bfloat16  # stream keeps the compute dtype
    q8b = np.asarray(q8b, np.float32)
    assert np.all(np.isfinite(q8b))
    rel = np.linalg.norm(q8b - f32) / np.linalg.norm(f32)
    assert rel < 0.03, f"relative error {rel:.4f}"


@pytest.mark.parametrize("X,Y", [(24, 70), (2000, 16)])  # small-X | flash
def test_x2y_q8_close_to_xla(rng, X, Y):
    """Quantized-projection X2Y tracks the dense XLA reference: attn/logits
    within quantization tolerance, probs a valid distribution, masked keys
    at -1e9."""
    from fact_clip_tpu.ops.pallas.quant_conv import x2y_attention_q8

    B, Cx, Cy, d = 2, 32, 24, 128
    y_in = jnp.array(rng.normal(size=(B, Y, Cy)).astype(np.float32))
    y_pos = jnp.array(rng.normal(size=(1, Y, Cy)).astype(np.float32))
    x_in = jnp.array(rng.normal(size=(B, X, Cx)).astype(np.float32))
    x_pos = jnp.array(rng.normal(size=(1, X, Cx)).astype(np.float32))
    wk = jnp.array(rng.normal(size=(Cx, d)).astype(np.float32) * 0.1)
    bk = jnp.array(rng.normal(size=(d,)).astype(np.float32) * 0.05)
    wv = jnp.array(rng.normal(size=(Cx, d)).astype(np.float32) * 0.1)
    bv = jnp.array(rng.normal(size=(d,)).astype(np.float32) * 0.05)
    wq = jnp.array(rng.normal(size=(Cy, d)).astype(np.float32) * 0.1)
    bq = jnp.array(rng.normal(size=(d,)).astype(np.float32) * 0.05)
    x_len = jnp.array([X, X - 5], jnp.int32)

    attn, probs, logits = x2y_attention_q8(
        y_in, y_pos, x_in, x_pos, wk, bk, wv, bv, wq, bq, x_len,
        tile=256, interpret=True)
    ref_attn, ref_probs, ref_logits = _x2y_xla_reference(
        y_in, y_pos, x_in, x_pos, wk, bk, wv, bv, wq, bq, x_len)

    valid = np.arange(X)[None, None, :] < np.asarray(x_len)[:, None, None]
    for name, a, r in [("attn", attn, ref_attn), ("probs", probs, ref_probs)]:
        a, r = np.asarray(a), np.asarray(r)
        assert np.all(np.isfinite(a)), name
        rel = np.linalg.norm(a - r) / (np.linalg.norm(r) + 1e-12)
        assert rel < 0.05, f"{name} relative error {rel:.4f}"
    lg = np.asarray(logits)
    lr = np.asarray(ref_logits)
    vm = np.broadcast_to(valid, lg.shape)
    rel = np.linalg.norm((lg - lr)[vm]) / (np.linalg.norm(lr[vm]) + 1e-12)
    assert rel < 0.05, f"logits relative error {rel:.4f}"
    np.testing.assert_array_equal(lg[~vm], -1e9)
    s = np.asarray(probs).sum(-1)
    np.testing.assert_allclose(s, 1.0, atol=1e-5)


def test_mha_q8_close_to_xla(rng):
    """Quantized-K/V MHA twin tracks the XLA multi-head reference within
    dynamic-quant tolerance (projections int8, softmax/attend unchanged)."""
    from fact_clip_tpu.ops.pallas.mha_attn import _mha_reference
    from fact_clip_tpu.ops.pallas.quant_conv import mha_cross_attention_q8

    B, M, X, E, Cx, H = 2, 10, 1500, 256, 256, 8
    q = jnp.array(rng.normal(size=(B, M, E)).astype(np.float32))
    x = jnp.array(rng.normal(size=(B, X, Cx)).astype(np.float32))
    pos = jnp.array(rng.normal(size=(1, X, Cx)).astype(np.float32))
    wk = jnp.array(rng.normal(size=(Cx, E)).astype(np.float32) * 0.05)
    bk = jnp.array(rng.normal(size=(E,)).astype(np.float32) * 0.05)
    wv = jnp.array(rng.normal(size=(Cx, E)).astype(np.float32) * 0.05)
    bv = jnp.array(rng.normal(size=(E,)).astype(np.float32) * 0.05)
    x_len = jnp.array([X, X - 321], jnp.int32)

    out = mha_cross_attention_q8(q, x, pos, wk, bk, wv, bv, x_len, num_heads=H,
                                 tile=256, interpret=True)
    ref = _mha_reference(q, x, pos, wk, bk, wv, bv, x_len, None, H)
    out, ref = np.asarray(out), np.asarray(ref)
    assert np.all(np.isfinite(out))
    rel = np.linalg.norm(out - ref) / np.linalg.norm(ref)
    assert rel < 0.05, f"relative error {rel:.4f}"
