import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from fact_clip_tpu.parallel import mesh as mesh_lib
from fact_clip_tpu.parallel import seqpar

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")


def test_make_mesh_shapes():
    m = mesh_lib.make_mesh(n_data=4, n_seq=2)
    assert m.devices.shape == (4, 2)
    assert m.axis_names == ("data", "seq")
    m2 = mesh_lib.make_mesh()  # all devices on data
    assert m2.devices.shape == (8, 1)


def test_shard_and_replicate():
    m = mesh_lib.make_mesh(n_data=8)
    batch = {"x": np.arange(32, dtype=np.float32).reshape(8, 4)}
    sharded = mesh_lib.shard_batch(m, batch)
    assert sharded["x"].sharding.spec == P("data")
    params = {"w": np.ones((3, 3), np.float32)}
    rep = mesh_lib.replicate_tree(m, params)
    assert rep["w"].sharding.spec == P()


def test_dp_loss_mean_matches_single_device(rng):
    """A jitted loss over a data-sharded batch must equal the unsharded one."""
    m = mesh_lib.make_mesh(n_data=8)
    x = rng.normal(size=(8, 16)).astype(np.float32)
    w = rng.normal(size=(16, 4)).astype(np.float32)

    def loss(w, x):
        return jnp.mean(jnp.tanh(x @ w) ** 2)

    ref = jax.jit(loss)(w, x)
    xs = jax.device_put(x, NamedSharding(m, P("data")))
    ws = jax.device_put(w, NamedSharding(m, P()))
    out = jax.jit(loss)(ws, xs)
    np.testing.assert_allclose(float(out), float(ref), rtol=1e-6)
    # gradient too (this is the DP all-reduce path)
    g_ref = jax.jit(jax.grad(loss))(w, x)
    g = jax.jit(jax.grad(loss))(ws, xs)
    np.testing.assert_allclose(np.array(g), np.array(g_ref), atol=1e-5)


def test_sharded_dilated_conv_matches_dense(rng):
    from fact_clip_tpu.models.layers import _dilated_conv

    n_shards, T_local, C, d, g = 8, 16, 8, 3, 2
    T = n_shards * T_local
    x = rng.normal(size=(T, C)).astype(np.float32)
    kernel = rng.normal(size=(3, C // g, C)).astype(np.float32) * 0.1
    bias = rng.normal(size=(C,)).astype(np.float32) * 0.1

    dense = np.array(_dilated_conv(jnp.array(x)[None], jnp.array(kernel), jnp.array(bias), d, g))[0]

    m = mesh_lib.make_mesh(n_data=1, n_seq=8)
    fn = jax.shard_map(
        functools.partial(seqpar.sharded_dilated_conv, kernel=jnp.array(kernel),
                          bias=jnp.array(bias), dilation=d, ngroup=g, axis_name="seq"),
        mesh=m, in_specs=P("seq", None), out_specs=P("seq", None),
    )
    out = np.array(jax.jit(fn)(jnp.array(x)))
    np.testing.assert_allclose(out, dense, atol=1e-4)


def test_collective_cross_attention_matches_dense(rng):
    n_shards, T_local, M, D = 8, 12, 5, 16
    T = n_shards * T_local
    q = rng.normal(size=(M, D)).astype(np.float32)
    k = rng.normal(size=(T, D)).astype(np.float32)
    v = rng.normal(size=(T, D)).astype(np.float32)
    mask = np.ones(T, bool)
    mask[-20:] = False  # padding tail
    scale = 1.0 / np.sqrt(D)

    # dense reference
    logits = (q @ k.T) * scale
    logits = np.where(mask[None, :], logits, -np.inf)
    probs = np.exp(logits - logits.max(1, keepdims=True))
    probs = probs / probs.sum(1, keepdims=True)
    expected = probs @ v

    m = mesh_lib.make_mesh(n_data=1, n_seq=8)
    fn = jax.shard_map(
        functools.partial(seqpar.collective_cross_attention, axis_name="seq", scale=scale),
        mesh=m,
        in_specs=(P(), P("seq", None), P("seq", None), P("seq")),
        out_specs=(P(), P(None, "seq")),
    )
    out, probs_sharded = jax.jit(fn)(jnp.array(q), jnp.array(k), jnp.array(v), jnp.array(mask))
    np.testing.assert_allclose(np.array(out), expected, atol=1e-4)
    np.testing.assert_allclose(np.array(probs_sharded), probs, atol=1e-5)
