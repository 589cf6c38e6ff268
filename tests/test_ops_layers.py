import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from fact_clip_tpu.models import layers as L
from fact_clip_tpu.ops import masking, segments
from fact_clip_tpu.utils.segments import class_label_to_segment_data, parse_label


# ---------------------------------------------------------- positional enc
def test_pe_table_matches_formula():
    d, length = 16, 50
    pe = np.array(L.positional_encoding_table(length, d))
    pos = np.arange(length)[:, None]
    div = np.exp(np.arange(0, d, 2) * (-math.log(10000.0) / d))
    np.testing.assert_allclose(pe[:, 0::2], np.sin(pos * div), atol=1e-4)
    np.testing.assert_allclose(pe[:, 1::2], np.cos(pos * div), atol=1e-4)
    assert np.all(L.positional_encoding_table(10, 8, empty=True) == 0)


def test_add_pos_partial_channels():
    x = jnp.ones((2, 3, 8))
    pos = jnp.ones((3, 4))
    out = L.add_pos(x, pos)
    assert out.shape == (2, 3, 8)
    np.testing.assert_allclose(out[..., :4], 2.0)
    np.testing.assert_allclose(out[..., 4:], 1.0)


# ------------------------------------------------------------ segment ops
def test_segment_ids_match_host_rle(rng):
    pred = rng.integers(0, 4, size=37)
    mask = np.ones(37, bool)
    seg_id, n = segments.segment_ids_from_pred(jnp.array(pred), jnp.array(mask), s_max=64)
    _, host_seg = class_label_to_segment_data(pred)
    np.testing.assert_array_equal(np.array(seg_id), host_seg)
    assert int(n) == host_seg[-1] + 1


def test_segment_ids_with_padding(rng):
    pred = np.array([1, 1, 2, 2, 3, 0, 0, 0])  # last 3 are padding
    mask = np.array([1, 1, 1, 1, 1, 0, 0, 0], bool)
    seg_id, n = segments.segment_ids_from_pred(jnp.array(pred), jnp.array(mask), s_max=8)
    np.testing.assert_array_equal(np.array(seg_id)[:5], [0, 0, 1, 1, 2])
    assert int(n) == 3
    # padded frames inherit the running segment id (no new segments)
    assert np.array(seg_id)[5:].max() == 2


def test_segment_cap_merges_overflow():
    pred = np.arange(10)  # 10 alternating segments
    mask = np.ones(10, bool)
    seg_id, n = segments.segment_ids_from_pred(jnp.array(pred), jnp.array(mask), s_max=4)
    assert int(n) == 4
    np.testing.assert_array_equal(np.array(seg_id), [0, 1, 2, 3, 3, 3, 3, 3, 3, 3])


def test_pool_mean_and_unpool(rng):
    pred = np.array([0, 0, 1, 1, 1, 2])
    mask = np.ones(6, bool)
    feats = rng.normal(size=(6, 4)).astype(np.float32)
    seg_id, _ = segments.segment_ids_from_pred(jnp.array(pred), jnp.array(mask), s_max=5)
    P = segments.assignment_matrix(seg_id, jnp.array(mask), 5)
    pooled = np.array(segments.pool_mean(P, jnp.array(feats)))
    np.testing.assert_allclose(pooled[0], feats[:2].mean(0), rtol=1e-5)
    np.testing.assert_allclose(pooled[1], feats[2:5].mean(0), rtol=1e-5)
    np.testing.assert_allclose(pooled[2], feats[5:6].mean(0), rtol=1e-5)
    np.testing.assert_allclose(pooled[3:], 0.0)
    up = np.array(segments.unpool(jnp.array(pooled), seg_id))
    np.testing.assert_allclose(up[0], pooled[0])
    np.testing.assert_allclose(up[5], pooled[2])


def test_pool_excludes_padding(rng):
    feats = rng.normal(size=(8, 4)).astype(np.float32)
    pred = np.array([1, 1, 1, 1, 1, 9, 9, 9])
    mask = np.array([1, 1, 1, 1, 1, 0, 0, 0], bool)
    seg_id, _ = segments.segment_ids_from_pred(jnp.array(pred), jnp.array(mask), s_max=4)
    P = segments.assignment_matrix(seg_id, jnp.array(mask), 4)
    pooled = np.array(segments.pool_mean(P, jnp.array(feats)))
    np.testing.assert_allclose(pooled[0], feats[:5].mean(0), rtol=1e-5)


def test_segment_centers():
    pred = np.array([0, 0, 0, 1, 1, 2, 2, 2, 2])
    mask = np.ones(9, bool)
    seg_id, _ = segments.segment_ids_from_pred(jnp.array(pred), jnp.array(mask), s_max=5)
    P = segments.assignment_matrix(seg_id, jnp.array(mask), 5)
    centers = np.array(segments.segment_centers(P, 5))
    # reference: int((start+end)/2)
    segs = parse_label(pred)
    expected = [int((s.start + s.end) / 2) for s in segs]
    np.testing.assert_array_equal(centers[:3], expected)


def test_pool_onehot_labels():
    pred = np.array([0, 0, 1, 1])
    mask = np.ones(4, bool)
    labels = np.array([2, 3, 3, 3])
    seg_id, _ = segments.segment_ids_from_pred(jnp.array(pred), jnp.array(mask), s_max=3)
    P = segments.assignment_matrix(seg_id, jnp.array(mask), 3)
    oh = jax.nn.one_hot(jnp.array(labels), 4)
    zoomed = np.array(segments.pool_onehot_labels(P, oh))
    np.testing.assert_allclose(zoomed[0], [0, 0, 0.5, 0.5])
    np.testing.assert_allclose(zoomed[1], [0, 0, 0, 1.0])


# ------------------------------------------------------------- time mask
def test_time_mask_shapes_and_bounds(rng):
    feats = jnp.ones((3, 50, 8))
    lengths = jnp.array([50, 30, 10])
    out = masking.time_mask(jax.random.PRNGKey(0), feats, lengths, t_max=20, num_masks=2, p=0.3)
    out = np.array(out)
    assert out.shape == (3, 50, 8)
    # masked spans are zero, others untouched
    assert set(np.unique(out)) <= {0.0, 1.0}
    # no masking beyond a video's valid length scope for short videos:
    # spans start within [0, len - t], so frames >= len stay 1
    assert np.all(out[2, 30:] == 1.0)


def test_channel_mask(rng):
    feats = jnp.ones((2, 10, 64))
    out = np.array(masking.channel_mask(jax.random.PRNGKey(1), feats, 0.5))
    # whole channels zeroed, survivors scaled by 2
    per_channel = out.reshape(2, 10, 64)
    for b in range(2):
        col = per_channel[b, 0]
        assert set(np.round(np.unique(col), 5)) <= {0.0, 2.0}
        np.testing.assert_allclose(per_channel[b], np.broadcast_to(col, (10, 64)))


# ----------------------------------------------------- dilated conv parity
def test_dilated_conv_matches_torch(rng):
    B, T, C, d, g = 2, 20, 8, 4, 2
    x = rng.normal(size=(B, T, C)).astype(np.float32)
    tconv = torch.nn.Conv1d(C, C, 3, padding=d, dilation=d, groups=g)
    with torch.no_grad():
        ref = tconv(torch.from_numpy(x).permute(0, 2, 1)).permute(0, 2, 1).numpy()
    # torch weight (out, in/g, k) -> ours (k, in/g, out)
    kernel = jnp.array(tconv.weight.detach().numpy().transpose(2, 1, 0))
    bias = jnp.array(tconv.bias.detach().numpy())
    ours = np.array(L._dilated_conv(jnp.array(x), kernel, bias, d, g))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


@pytest.mark.slow
def test_mstcn_padding_invariance(rng):
    """Valid-frame outputs must be identical whether or not padding exists."""
    B, T, L_pad, C = 1, 33, 64, 16
    x = rng.normal(size=(B, T, C)).astype(np.float32)
    m = L.MSTCN(in_dim=C, hid_dim=C, out_dim=12, num_layers=4, dropout=0.0, ln=True, ngroup=1, in_map=True)
    params = m.init(jax.random.PRNGKey(0), jnp.zeros((B, L_pad, C)), jnp.ones((B, L_pad), bool), True)
    out_exact = m.apply(params, jnp.array(x), jnp.ones((B, T), bool), True)
    x_pad = np.zeros((B, L_pad, C), np.float32)
    x_pad[:, :T] = x
    mask = np.zeros((B, L_pad), bool)
    mask[:, :T] = True
    out_pad = m.apply(params, jnp.array(x_pad), jnp.array(mask), True)
    np.testing.assert_allclose(np.array(out_pad)[:, :T], np.array(out_exact), atol=1e-4)


def test_mstcn2_padding_invariance(rng):
    B, T, L_pad, C = 1, 40, 128, 16
    x = rng.normal(size=(B, T, C)).astype(np.float32)
    m = L.MSTCN2(in_dim=C, hid_dim=C, out_dim=12, num_layers=3, dropout=0.0, ngroup=1, in_map=True)
    params = m.init(jax.random.PRNGKey(0), jnp.zeros((B, L_pad, C)), jnp.ones((B, L_pad), bool), True)
    out_exact = m.apply(params, jnp.array(x), jnp.ones((B, T), bool), True)
    x_pad = np.zeros((B, L_pad, C), np.float32)
    x_pad[:, :T] = x
    mask = np.zeros((B, L_pad), bool)
    mask[:, :T] = True
    out_pad = m.apply(params, jnp.array(x_pad), jnp.array(mask), True)
    np.testing.assert_allclose(np.array(out_pad)[:, :T], np.array(out_exact), atol=1e-4)


# ------------------------------------------------------------- GRU parity
def test_gru_cell_matches_torch(rng):
    """One recurrent step (input gates precomputed) == torch GRUCell."""
    in_dim, H = 6, 8
    step = L._GRURecurStep(H)
    params = step.init(jax.random.PRNGKey(0),
                       jnp.zeros((2, H)), (jnp.zeros((2, 3 * H)), jnp.ones((2, 1))))
    tcell = torch.nn.GRUCell(in_dim, H)
    p = dict(params["params"])
    p["w_hh"] = jnp.array(tcell.weight_hh.detach().numpy().T)
    p["b_hh"] = jnp.array(tcell.bias_hh.detach().numpy())
    w_ih = tcell.weight_ih.detach().numpy().T
    b_ih = tcell.bias_ih.detach().numpy()

    x = rng.normal(size=(2, in_dim)).astype(np.float32)
    h = rng.normal(size=(2, H)).astype(np.float32)
    gi = jnp.array(x @ w_ih + b_ih)
    ours, _ = step.apply({"params": p}, jnp.array(h), (gi, jnp.ones((2, 1))))
    with torch.no_grad():
        ref = tcell(torch.from_numpy(x), torch.from_numpy(h)).numpy()
    np.testing.assert_allclose(np.array(ours), ref, atol=1e-5)


@pytest.mark.slow
def test_bigru_matches_torch_and_padding_invariant(rng):
    in_dim, H, layers, T = 6, 4, 2, 9
    tgru = torch.nn.GRU(in_dim, H, layers, bidirectional=True)
    x = rng.normal(size=(1, T, in_dim)).astype(np.float32)
    with torch.no_grad():
        ref, _ = tgru(torch.from_numpy(x).permute(1, 0, 2))
        ref = ref.permute(1, 0, 2).numpy()

    m = L.BiGRU(hidden=H, num_layers=layers, dropout=0.0)
    params = m.init(jax.random.PRNGKey(0), jnp.zeros((1, T, in_dim)), jnp.ones((1, T), bool))

    p = jax.tree_util.tree_map(lambda a: a, dict(params["params"]))
    for layer in range(layers):
        for direction, tag in [(0, "fwd"), (1, "bwd")]:
            suffix = "_reverse" if direction else ""
            p[f"l{layer}_{tag}"] = {
                "w_hh": jnp.array(getattr(tgru, f"weight_hh_l{layer}{suffix}").detach().numpy().T),
                "b_hh": jnp.array(getattr(tgru, f"bias_hh_l{layer}{suffix}").detach().numpy()),
            }
            p[f"l{layer}_{tag}_w_ih"] = jnp.array(
                getattr(tgru, f"weight_ih_l{layer}{suffix}").detach().numpy().T)
            p[f"l{layer}_{tag}_b_ih"] = jnp.array(
                getattr(tgru, f"bias_ih_l{layer}{suffix}").detach().numpy())

    ours = np.array(m.apply({"params": p}, jnp.array(x), jnp.ones((1, T), bool)))
    np.testing.assert_allclose(ours, ref, atol=1e-5)

    # padding invariance: pad to 16, valid prefix outputs identical
    x_pad = np.zeros((1, 16, in_dim), np.float32)
    x_pad[:, :T] = x
    mask = np.zeros((1, 16), bool)
    mask[:, :T] = True
    ours_pad = np.array(m.apply({"params": p}, jnp.array(x_pad), jnp.array(mask)))
    np.testing.assert_allclose(ours_pad[:, :T], ref, atol=1e-5)


# -------------------------------------------------------------- MHA parity
def test_mha_matches_torch(rng):
    E, H, Nq, Nk = 16, 4, 5, 7
    tmha = torch.nn.MultiheadAttention(E, H, dropout=0.0)
    q = rng.normal(size=(1, Nq, E)).astype(np.float32)
    k = rng.normal(size=(1, Nk, E)).astype(np.float32)
    v = rng.normal(size=(1, Nk, E)).astype(np.float32)
    with torch.no_grad():
        ref, _ = tmha(
            torch.from_numpy(q).permute(1, 0, 2),
            torch.from_numpy(k).permute(1, 0, 2),
            torch.from_numpy(v).permute(1, 0, 2),
        )
        ref = ref.permute(1, 0, 2).numpy()

    m = L.MultiHeadAttention(E, H, 0.0)
    params = m.init(jax.random.PRNGKey(0), jnp.array(q), jnp.array(k), jnp.array(v))
    w = tmha.in_proj_weight.detach().numpy()
    b = tmha.in_proj_bias.detach().numpy()
    p = {
        "q_proj": {"kernel": jnp.array(w[:E].T), "bias": jnp.array(b[:E])},
        "k_proj": {"kernel": jnp.array(w[E : 2 * E].T), "bias": jnp.array(b[E : 2 * E])},
        "v_proj": {"kernel": jnp.array(w[2 * E :].T), "bias": jnp.array(b[2 * E :])},
        "out_proj": {
            "kernel": jnp.array(tmha.out_proj.weight.detach().numpy().T),
            "bias": jnp.array(tmha.out_proj.bias.detach().numpy()),
        },
    }
    ours = np.array(m.apply({"params": p}, jnp.array(q), jnp.array(k), jnp.array(v)))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_mha_key_mask(rng):
    E, H = 8, 2
    m = L.MultiHeadAttention(E, H, 0.0)
    q = jnp.array(rng.normal(size=(1, 3, E)), jnp.float32)
    k = jnp.array(rng.normal(size=(1, 6, E)), jnp.float32)
    params = m.init(jax.random.PRNGKey(0), q, k, k)
    mask = jnp.array([[True, True, True, True, False, False]])
    out_masked = m.apply(params, q, k, k, key_mask=mask)
    out_trunc = m.apply(params, q, k[:, :4], k[:, :4])
    np.testing.assert_allclose(np.array(out_masked), np.array(out_trunc), atol=1e-5)


# ------------------------------------------------------------ X2Y mapping
def test_x2y_probs_and_mask(rng):
    m = L.X2YMap(x_dim=8, y_dim=8, y_outdim=6, head_dim=8, dropout=0.0, kq_pos=True)
    x = jnp.array(rng.normal(size=(1, 10, 8)), jnp.float32)
    y = jnp.array(rng.normal(size=(1, 4, 8)), jnp.float32)
    xpos = jnp.array(rng.normal(size=(10, 8)), jnp.float32)
    params = m.init(jax.random.PRNGKey(0), x, y, xpos, None, jnp.ones((1, 10), bool))
    x_mask = jnp.array([[1, 1, 1, 1, 1, 1, 1, 0, 0, 0]], bool)
    out, probs, logits = m.apply(params, x, y, xpos, None, x_mask)
    probs = np.array(probs)
    np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-5)
    assert probs[:, :, 7:].max() == 0.0
    # masked == truncated
    out_t, probs_t, _ = m.apply(params, x[:, :7], y, xpos[:7], None, jnp.ones((1, 7), bool))
    np.testing.assert_allclose(np.array(out), np.array(out_t), atol=1e-5)
    np.testing.assert_allclose(probs[:, :, :7], np.array(probs_t), atol=1e-5)


def test_sca_decoder_runs(rng):
    m = L.SCADecoder(in_dim=16, hid_dim=16, out_dim=12, frame_dim=16, num_layers=2, nhead=4, ffdim=32, dropout=0.0)
    tgt = jnp.array(rng.normal(size=(2, 5, 16)), jnp.float32)
    mem = jnp.array(rng.normal(size=(2, 20, 16)), jnp.float32)
    mmask = jnp.ones((2, 20), bool)
    params = m.init(jax.random.PRNGKey(0), tgt, mem, None, None, mmask)
    out = m.apply(params, tgt, mem, None, None, mmask)
    assert out.shape == (2, 5, 12)


def test_feature_projection_normalized(rng):
    m = L.FeatureProjection(clip_dim=32, hidden_dim=16, dropout=0.0)
    x = jnp.array(rng.normal(size=(2, 7, 24)), jnp.float32)
    params = m.init(jax.random.PRNGKey(0), x)
    out = np.array(m.apply(params, x))
    np.testing.assert_allclose(np.linalg.norm(out, axis=-1), 1.0, atol=1e-5)
