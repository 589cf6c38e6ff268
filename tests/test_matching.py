import jax
import jax.numpy as jnp
import numpy as np
from scipy.optimize import linear_sum_assignment

from fact_clip_tpu.configs.default import get_cfg_defaults
from fact_clip_tpu.models import matching


def _rand_attn(rng, B, T, M):
    logits = rng.normal(size=(B, T, M)).astype(np.float32)
    e = np.exp(logits - logits.max(-1, keepdims=True))
    return e / e.sum(-1, keepdims=True)


def test_soft_iou_matches_reference_formula(rng):
    """Closed-form union must equal the reference's min(a+b, 1).sum()."""
    B, T, M, S = 1, 12, 5, 3
    attn = _rand_attn(rng, B, T, M)
    seg_label = np.array([[0] * 4 + [1] * 5 + [2] * 3])
    frame_mask = np.ones((B, T), bool)
    seg_mask = np.ones((B, S), bool)

    iou = np.array(
        matching.soft_iou(jnp.array(attn), jnp.array(seg_label), jnp.array(seg_mask), jnp.array(frame_mask))
    )

    onehot = np.eye(S)[seg_label[0]]  # (T, S)
    a = attn[0][:, :, None]  # (T, M, 1)
    o = onehot[:, None, :]  # (T, 1, S)
    overlap = np.einsum("tm,ts->ms", attn[0], onehot)
    union = np.minimum(a + o, 1.0).sum(0)  # (M, S)
    ref = np.nan_to_num(overlap / union)
    np.testing.assert_allclose(iou[0], ref, atol=1e-5)


def test_soft_iou_padding(rng):
    B, T, M, S = 1, 10, 4, 4
    attn = _rand_attn(rng, B, T, M)
    seg_label = np.array([[0, 0, 1, 1, 1, 2, 2, 2, 2, 2]])
    frame_mask = np.array([[1] * 8 + [0] * 2], bool)
    seg_mask = np.array([[1, 1, 1, 0]], bool)
    iou = np.array(
        matching.soft_iou(jnp.array(attn), jnp.array(seg_label), jnp.array(seg_mask), jnp.array(frame_mask))
    )
    # padded segment column is zero
    assert iou[0, :, 3].max() == 0.0
    # equals unpadded computation on the valid prefix
    iou_t = np.array(
        matching.soft_iou(
            jnp.array(attn[:, :8]), jnp.array(seg_label[:, :8]),
            jnp.array(seg_mask), jnp.array(np.ones((1, 8), bool)),
        )
    )
    np.testing.assert_allclose(iou[0, :, :3], iou_t[0, :, :3], atol=1e-6)


def test_hungarian_matches_scipy(rng):
    B, M, S = 3, 8, 5
    cost = rng.normal(size=(B, M, S)).astype(np.float32)
    nsegs = np.array([5, 3, 1], np.int32)
    seg_mask = np.arange(S)[None] < nsegs[:, None]
    out = np.array(matching.run_match(jnp.array(cost), jnp.zeros((B, S), jnp.int32), jnp.array(seg_mask), "o2o"))
    for b in range(B):
        s = nsegs[b]
        rows, cols = linear_sum_assignment(cost[b, :, :s])
        expected = np.zeros(S, np.int32)
        expected[cols] = rows
        np.testing.assert_array_equal(out[b], expected)


def test_o2m_assigns_every_segment_a_same_class_token(rng):
    B, M, S = 1, 6, 5
    cost = rng.normal(size=(B, M, S)).astype(np.float32)
    transcript = np.array([[1, 2, 1, 3, 1]], np.int32)
    seg_mask = np.ones((B, S), bool)
    out = np.array(
        matching.run_match(jnp.array(cost), jnp.array(transcript), jnp.array(seg_mask), "o2m")
    )
    # Each token serves segments of a single class:
    tok_class = {}
    for s in range(S):
        t = out[0, s]
        c = transcript[0, s]
        assert tok_class.setdefault(t, c) == c


def test_seq_match_identity():
    cfg = get_cfg_defaults()
    cfg.Loss.match = "seq"
    out = matching.match(
        cfg.Loss,
        jnp.zeros((2, 6, 4)),
        jnp.zeros((2, 10, 6)),
        jnp.zeros((2, 5), jnp.int32),
        jnp.zeros((2, 10), jnp.int32),
        jnp.ones((2, 5), bool),
        jnp.ones((2, 10), bool),
    )
    np.testing.assert_array_equal(np.array(out), np.tile(np.arange(5), (2, 1)))


def test_match_under_jit_and_grad(rng):
    """pure_callback matching must work inside jit and not break AD."""
    cfg = get_cfg_defaults()
    B, M, S, T, C = 2, 6, 4, 12, 5
    transcript = jnp.array(rng.integers(0, C, (B, S)), jnp.int32)
    seg_label = jnp.array(np.minimum(np.arange(T)[None] // 3, S - 1).repeat(B, 0), jnp.int32)
    seg_mask = jnp.ones((B, S), bool)
    frame_mask = jnp.ones((B, T), bool)

    def loss_fn(params):
        cprob = jax.nn.softmax(params["logit"], -1)
        attn = jax.nn.softmax(params["attn"], -1)
        seg2tok = matching.match(cfg.Loss, cprob, attn, transcript, seg_label, seg_mask, frame_mask)
        # a trivial loss that consumes the matching through a gather
        gathered = jnp.take_along_axis(
            cprob, seg2tok[:, :, None].astype(jnp.int32), axis=1
        )
        return gathered.sum()

    params = {
        "logit": jnp.array(rng.normal(size=(B, M, C + 1)), jnp.float32),
        "attn": jnp.array(rng.normal(size=(B, T, M)), jnp.float32),
    }
    g = jax.jit(jax.grad(loss_fn))(params)
    assert np.isfinite(np.array(g["logit"])).all()
    assert np.isfinite(np.array(g["attn"])).all()


# ------------------------------------------------------------ auction solver
def test_auction_matches_scipy_optimal_cost(rng):
    from fact_clip_tpu.ops import assignment

    for trial in range(8):
        M = int(rng.integers(5, 40))
        S = int(rng.integers(1, M + 1))
        cost = rng.normal(size=(M, S)).astype(np.float32)
        col_valid = np.ones(S, bool)
        seg_tok = np.array(jax.jit(assignment.auction_assign)(jnp.array(cost), jnp.array(col_valid)))
        # valid permutation: distinct tokens
        assert len(set(seg_tok.tolist())) == S
        ours = cost[seg_tok, np.arange(S)].sum()
        rows, cols = linear_sum_assignment(cost)
        ref = cost[rows, cols].sum()
        np.testing.assert_allclose(ours, ref, atol=1e-3, err_msg=f"trial {trial} M={M} S={S}")


def test_auction_with_masked_columns(rng):
    from fact_clip_tpu.ops import assignment

    M, S = 10, 6
    cost = rng.normal(size=(M, S)).astype(np.float32)
    col_valid = np.array([1, 1, 1, 0, 0, 0], bool)
    seg_tok = np.array(assignment.auction_assign(jnp.array(cost), jnp.array(col_valid)))
    rows, cols = linear_sum_assignment(cost[:, :3])
    expected = np.zeros(3, np.int64)
    expected[cols] = rows
    ours = cost[seg_tok[:3], np.arange(3)].sum()
    ref = cost[expected, np.arange(3)].sum()
    np.testing.assert_allclose(ours, ref, atol=1e-3)


def test_o2m_device_matches_host(rng):
    from fact_clip_tpu.ops import assignment

    nclasses = 6
    for trial in range(6):
        M, S = 8, 5
        cost = rng.normal(size=(1, M, S)).astype(np.float32)
        transcript = rng.integers(0, nclasses, size=(1, S)).astype(np.int32)
        nsegs = np.array([S], np.int32)
        host = matching._o2m_host(cost, transcript, nsegs)
        dev = np.array(
            assignment.o2m_assign(jnp.array(cost[0]), jnp.array(transcript[0]), jnp.ones(S, bool), nclasses)
        )
        # stage-1 auction may differ from scipy on ties; compare achieved cost
        host_cost = cost[0][host[0], np.arange(S)].sum()
        dev_cost = cost[0][dev, np.arange(S)].sum()
        # device assignment must respect class grouping like the host one
        tok_class = {}
        for s in range(S):
            c = transcript[0, s]
            assert tok_class.setdefault(dev[s], c) == c
        assert dev_cost <= host_cost + 1e-3


def test_auction_at_production_scale(rng):
    """ntoken x segments at epic scale (300 x 165): the device solver must
    stay within a hair of scipy's optimum."""
    from fact_clip_tpu.ops import assignment

    M, S = 300, 165
    # realistic cost range: -(pc + a2fc) .. 0
    cost = (-rng.random(size=(M, S)) * 1.2).astype(np.float32)
    col_valid = np.ones(S, bool)
    seg_tok = np.array(jax.jit(assignment.auction_assign)(jnp.array(cost), jnp.array(col_valid)))
    assert len(set(seg_tok.tolist())) == S
    ours = cost[seg_tok, np.arange(S)].sum()
    rows, cols = linear_sum_assignment(cost)
    ref = cost[rows, cols].sum()
    # optimal within S * eps (eps = 1e-3 * spread)
    assert ours <= ref + S * 1.2e-3 + 1e-4, (ours, ref)
