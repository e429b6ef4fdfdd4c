"""Oracle tests for the graph core against dense numpy reimplementations.

Mirrors the reference's test strategy (numpy/sklearn oracles compared with
np.allclose — /root/reference/test/test_utils.py), extended with padding-mask
invariance checks the reference doesn't need.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from graph_neural_pde_tpu.ops import (
    Graph,
    add_remaining_self_loops,
    coalesce,
    dense_adjacency,
    gcn_norm_fill_val,
    get_rw_adj,
    make_graph,
    segment_max,
    segment_mean,
    segment_softmax,
    segment_squareplus,
    segment_sum,
    spmm,
    spmm_multihead,
    to_undirected,
)
from graph_neural_pde_tpu.ops.graph import dirichlet_energy


def tiny_graph(pad=0):
    # the 4-node test graph of /root/reference/test/test_gnn.py:24-29
    row = np.array([0, 2, 2, 1], np.int32)
    col = np.array([1, 0, 1, 2], np.int32)
    w = np.array([1.0, 2.0, 3.0, 4.0], np.float32)
    return make_graph(row, col, w, num_nodes=4, capacity=4 + pad)


def dense_of(g):
    return np.asarray(dense_adjacency(g))


class TestGraphConstruction:
    def test_padding_masked(self):
        g = tiny_graph(pad=5)
        assert g.capacity == 9
        assert int(g.num_edges) == 4
        a = dense_of(g)
        expected = np.zeros((4, 4), np.float32)
        expected[0, 1] = 1.0
        expected[2, 0] = 2.0
        expected[2, 1] = 3.0
        expected[1, 2] = 4.0
        np.testing.assert_allclose(a, expected)

    def test_padding_invariance(self):
        x = np.random.default_rng(0).normal(size=(4, 3)).astype(np.float32)
        y0 = spmm(tiny_graph(0), jnp.asarray(x))
        y1 = spmm(tiny_graph(7), jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), rtol=1e-6)


class TestSelfLoops:
    def test_adds_missing_loops(self):
        g = add_remaining_self_loops(tiny_graph(), 0.5)
        a = dense_of(g)
        np.testing.assert_allclose(np.diag(a), 0.5 * np.ones(4))
        assert a[2, 0] == 2.0

    def test_keeps_existing_loop_weight(self):
        row = np.array([0, 1, 1], np.int32)
        col = np.array([0, 2, 1], np.int32)
        w = np.array([7.0, 1.0, 9.0], np.float32)
        g = add_remaining_self_loops(make_graph(row, col, w, num_nodes=3), 0.5)
        a = dense_of(g)
        np.testing.assert_allclose(np.diag(a), [7.0, 9.0, 0.5])
        assert int(g.num_edges) == 4  # 1 non-loop + 3 loops


class TestNormalisation:
    def test_rw_norm_dim1_col_stochastic(self):
        """norm_dim=1: deg over col, w /= deg[col] — columns sum to 1."""
        g = get_rw_adj(tiny_graph(3), norm_dim=1, fill_value=1.0)
        a = dense_of(g)
        np.testing.assert_allclose(a.sum(axis=0), np.ones(4), rtol=1e-6)

    def test_rw_norm_dim0_row_stochastic(self):
        g = get_rw_adj(tiny_graph(), norm_dim=0, fill_value=1.0)
        a = dense_of(g)
        np.testing.assert_allclose(a.sum(axis=1), np.ones(4), rtol=1e-6)

    def test_rw_matches_dense_oracle(self):
        g0 = add_remaining_self_loops(tiny_graph(), 1.0)
        a = dense_of(g0)
        deg = a.sum(axis=0)  # over rows = column degree (deg over col index)
        oracle = a / deg[None, :]
        g = get_rw_adj(tiny_graph(), norm_dim=1, fill_value=1.0)
        np.testing.assert_allclose(dense_of(g), oracle, rtol=1e-6)

    def test_gcn_norm_matches_dense_oracle(self):
        g0 = add_remaining_self_loops(tiny_graph(), 1.0)
        a = dense_of(g0)
        deg = a.sum(axis=0)
        dis = 1.0 / np.sqrt(deg)
        oracle = dis[:, None] * a * dis[None, :]
        g = gcn_norm_fill_val(tiny_graph(), fill_value=1.0)
        np.testing.assert_allclose(dense_of(g), oracle, rtol=1e-6)

    def test_no_self_loop_when_fill_zero(self):
        g = get_rw_adj(tiny_graph(), norm_dim=1, fill_value=0.0)
        assert g.capacity == 4


class TestCoalesce:
    def test_sums_duplicates(self):
        row = np.array([0, 0, 1, 0], np.int32)
        col = np.array([1, 1, 2, 1], np.int32)
        w = np.array([1.0, 2.0, 5.0, 3.0], np.float32)
        g = coalesce(make_graph(row, col, w, num_nodes=3, capacity=6))
        a = dense_of(g)
        assert a[0, 1] == 6.0 and a[1, 2] == 5.0
        assert int(g.num_edges) == 2

    def test_to_undirected(self):
        g = to_undirected(tiny_graph())
        a = dense_of(g)
        np.testing.assert_allclose(a, a.T)
        # 0->1 and 2->1, 1->2 pre-existing: (1,2) & (2,1) both become 4+3=7? no:
        # edges: (0,1,1),(2,0,2),(2,1,3),(1,2,4); reversed: (1,0,1),(0,2,2),(1,2,3),(2,1,4)
        assert a[1, 2] == 7.0 and a[2, 1] == 7.0


class TestScatter:
    def test_segment_sum_mask(self):
        idx = jnp.array([0, 0, 1, 1], jnp.int32)
        v = jnp.array([1.0, 2.0, 3.0, 4.0])
        m = jnp.array([True, True, True, False])
        np.testing.assert_allclose(np.asarray(segment_sum(v, idx, 2, m)), [3.0, 3.0])

    def test_segment_max_mean(self):
        idx = jnp.array([0, 0, 1], jnp.int32)
        v = jnp.array([1.0, 5.0, 2.0])
        np.testing.assert_allclose(np.asarray(segment_max(v, idx, 2)), [5.0, 2.0])
        np.testing.assert_allclose(np.asarray(segment_mean(v, idx, 2)), [3.0, 2.0])

    def test_segment_softmax_sums_to_one(self):
        rng = np.random.default_rng(1)
        scores = jnp.asarray(rng.normal(size=(10, 3)).astype(np.float32))
        idx = jnp.asarray(rng.integers(0, 4, size=10).astype(np.int32))
        att = segment_softmax(scores, idx, 4)
        sums = np.asarray(segment_sum(att, idx, 4))
        present = np.asarray(segment_sum(jnp.ones((10, 3)), idx, 4)) > 0
        np.testing.assert_allclose(sums[present], 1.0, rtol=1e-5)
        assert (np.asarray(att) > 0).all() and (np.asarray(att) <= 1).all()

    def test_segment_softmax_oracle(self):
        scores = jnp.array([1.0, 2.0, 3.0, 0.5])
        idx = jnp.array([0, 0, 1, 1], jnp.int32)
        att = np.asarray(segment_softmax(scores, idx, 2))
        e = np.exp([1.0, 2.0])
        np.testing.assert_allclose(att[:2], e / e.sum(), rtol=1e-5)

    def test_segment_softmax_mask_excludes_padding(self):
        scores = jnp.array([1.0, 2.0, 100.0])
        idx = jnp.array([0, 0, 0], jnp.int32)
        m = jnp.array([True, True, False])
        att = np.asarray(segment_softmax(scores, idx, 1, m))
        e = np.exp([1.0 - 2.0, 0.0])
        np.testing.assert_allclose(att[:2], e / e.sum(), rtol=1e-5)
        assert att[2] == 0.0

    def test_squareplus_oracle(self):
        # reference formula: /root/reference/src/utils.py:196-208
        scores_np = np.array([1.0, 2.0, 3.0, 0.5], np.float32)
        idx_np = np.array([0, 0, 1, 1])
        out = scores_np - scores_np.max()
        out = (out + np.sqrt(out ** 2 + 4)) / 2
        denom = np.array([out[:2].sum(), out[2:].sum()])
        oracle = out / (denom[idx_np] + 1e-16)
        got = np.asarray(segment_squareplus(jnp.asarray(scores_np),
                                            jnp.asarray(idx_np, jnp.int32), 2))
        np.testing.assert_allclose(got, oracle, rtol=1e-6)


class TestSpmm:
    def test_spmm_dense_oracle(self, rng):
        g = get_rw_adj(tiny_graph(3), norm_dim=1, fill_value=1.0)
        x = rng.normal(size=(4, 5)).astype(np.float32)
        got = np.asarray(spmm(g, jnp.asarray(x)))
        np.testing.assert_allclose(got, dense_of(g) @ x, rtol=1e-5)

    def test_spmm_multihead_oracle(self, rng):
        g = tiny_graph(2)
        h, dk = 3, 2
        att = rng.random(size=(g.capacity, h)).astype(np.float32)
        v = rng.normal(size=(4, h, dk)).astype(np.float32)
        got = np.asarray(spmm_multihead(g, jnp.asarray(att), jnp.asarray(v)))
        expected = np.zeros((4, h, dk), np.float32)
        mask = np.asarray(g.mask)
        for e in range(g.capacity):
            if mask[e]:
                expected[g.row[e]] += att[e][:, None] * v[g.col[e]]
        np.testing.assert_allclose(got, expected, rtol=1e-5)

    def test_dirichlet_energy(self):
        g = make_graph([0, 1], [1, 0], [1.0, 1.0], num_nodes=2)
        x = jnp.array([[0.0], [2.0]])
        assert float(dirichlet_energy(g, x)) == pytest.approx(4.0)
