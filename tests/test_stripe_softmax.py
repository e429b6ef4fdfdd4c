"""stripe_segment_softmax / squareplus vs the XLA segment composition.

The stripe path shifts by each row's first-edge score instead of the exact
segment max (softmax shift-invariance) and runs denominators on the f32
one-hot MXU kernels — values AND gradients must match segment_softmax, and
out-of-range scores must take the exact fallback cond.
"""

import jax
import jax.numpy as jnp
import numpy as np

from graph_neural_pde_tpu.ops.graph import make_graph
from graph_neural_pde_tpu.ops.pallas.stripe import (
    build_stripe_plan,
    first_slot_of_rows,
    stripe_segment_softmax,
    stripe_segment_squareplus,
)
from graph_neural_pde_tpu.ops.scatter import (
    segment_softmax,
    segment_squareplus,
)


def make_plan(seed=0, n=24, e=96, h=3):
    rng = np.random.default_rng(seed)
    row = np.sort(rng.integers(0, n, e)).astype(np.int32)
    col = rng.integers(0, n, e).astype(np.int32)
    g = make_graph(row, col, None, num_nodes=n, capacity=e)
    plan = build_stripe_plan(row, np.asarray(g.mask), num_nodes=n,
                             block_n=8, chunk=16)
    # scores in plan slot order: map via slot_of_edge
    scores = np.zeros((plan.capacity, h), np.float32)
    raw = rng.normal(size=(e, h)).astype(np.float32)
    scores[plan.slot_of_edge] = raw
    row_s = np.zeros(plan.capacity, np.int32)
    row_s[plan.slot_of_edge] = row
    return plan, jnp.asarray(scores), jnp.asarray(row_s)


def test_first_slot_of_rows():
    plan, scores, row_s = make_plan()
    first = first_slot_of_rows(plan)
    rows = np.asarray(row_s)
    valid = np.asarray(plan.valid)
    for r in np.unique(rows[valid]):
        slots = np.where(valid & (rows == r))[0]
        assert first[r] == slots.min()


def test_softmax_matches_exact():
    plan, scores, row_s = make_plan()
    mask = jnp.asarray(plan.valid)
    want = segment_softmax(scores, row_s, plan.num_nodes, mask=mask)
    got = stripe_segment_softmax(
        plan, scores,
        lambda: segment_softmax(scores, row_s, plan.num_nodes, mask=mask))
    m = np.asarray(mask)
    np.testing.assert_allclose(np.asarray(got)[m], np.asarray(want)[m],
                               rtol=1e-5, atol=1e-6)


def test_softmax_gradients_match():
    plan, scores, row_s = make_plan()
    mask = jnp.asarray(plan.valid)

    def loss_stripe(s):
        att = stripe_segment_softmax(
            plan, s,
            lambda: segment_softmax(s, row_s, plan.num_nodes, mask=mask))
        return jnp.sum(jnp.where(mask[:, None], att, 0.0) ** 2)

    def loss_exact(s):
        att = segment_softmax(s, row_s, plan.num_nodes, mask=mask)
        att = jnp.where(mask[:, None], att, 0.0)
        return jnp.sum(att ** 2)

    gs = jax.grad(loss_stripe)(scores)
    ge = jax.grad(loss_exact)(scores)
    m = np.asarray(mask)
    np.testing.assert_allclose(np.asarray(gs)[m], np.asarray(ge)[m],
                               rtol=1e-4, atol=1e-5)


def test_softmax_overflow_takes_exact_fallback():
    plan, scores, row_s = make_plan()
    mask = jnp.asarray(plan.valid)
    # spread one row's scores by 300: exp(s - first_edge_shift) overflows
    # f32, so the cond must return the exact composition's values
    s = scores.at[4, 0].add(300.0)
    want = segment_softmax(s, row_s, plan.num_nodes, mask=mask)
    got = stripe_segment_softmax(
        plan, s,
        lambda: segment_softmax(s, row_s, plan.num_nodes, mask=mask))
    m = np.asarray(mask)
    np.testing.assert_allclose(np.asarray(got)[m], np.asarray(want)[m],
                               rtol=1e-5, atol=1e-6)


def test_squareplus_matches_exact():
    plan, scores, row_s = make_plan(h=2)
    mask = jnp.asarray(plan.valid)
    want = segment_squareplus(scores, row_s, plan.num_nodes, mask=mask)
    got = stripe_segment_squareplus(plan, scores)
    m = np.asarray(mask)
    np.testing.assert_allclose(np.asarray(got)[m], np.asarray(want)[m],
                               rtol=1e-5, atol=1e-6)


def test_attention_block_rides_stripe_softmax():
    """apply_transformer_attention with a plan == without, on the
    stripe-reordered graph (the frozen-attention path of the attention/
    mixed/hard blocks)."""
    from graph_neural_pde_tpu.config import Config
    from graph_neural_pde_tpu.models.attention import (
        apply_transformer_attention, init_transformer_attention)
    from graph_neural_pde_tpu.models.blocks import (
        build_stripe_engine, prepare_graph)

    rng = np.random.default_rng(3)
    n, e, d = 20, 80, 8
    row = rng.integers(0, n, e).astype(np.int32)
    col = rng.integers(0, n, e).astype(np.int32)
    cfg = Config(function="laplacian", block="attention", hidden_dim=d,
                 attention_dim=d, heads=2, attention_norm_idx=0,
                 self_loop_weight=1.0, stripe_fused=True,
                 stripe_block_n=8, stripe_chunk=16)
    g = prepare_graph(cfg, make_graph(row, col, None, num_nodes=n,
                                      capacity=96))
    g2, plan = build_stripe_engine(cfg, g)
    assert plan is not None
    x = jnp.asarray(rng.normal(size=(g2.num_nodes, d)).astype(np.float32))
    params = init_transformer_attention(jax.random.PRNGKey(0), cfg, d)
    params["Q"]["w"] = 0.5 * jax.random.normal(jax.random.PRNGKey(1),
                                               params["Q"]["w"].shape)
    att_plain, _ = apply_transformer_attention(params, cfg, x, g2,
                                               edge_weight=g2.weight)
    att_stripe, _ = apply_transformer_attention(params, cfg, x, g2,
                                                edge_weight=g2.weight,
                                                stripe_plan=plan)
    m = np.asarray(g2.mask)
    np.testing.assert_allclose(np.asarray(att_stripe)[m],
                               np.asarray(att_plain)[m],
                               rtol=1e-5, atol=1e-6)
