"""Blocked-plan + Pallas SpMM/SDDMM tests (interpret mode on CPU).

Oracles: dense numpy matmul and the XLA gather/segment-sum spmm.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graph_neural_pde_tpu.ops.pallas.plan import build_block_plan, transpose_plan
from graph_neural_pde_tpu.ops.pallas.spmm_blocked import (
    _sddmm_call,
    _spmm_call,
    make_plan_pair,
    make_spmm,
)


def random_graph(n=300, e=900, seed=0):
    rng = np.random.default_rng(seed)
    row = rng.integers(0, n, size=e).astype(np.int64)
    col = rng.integers(0, n, size=e).astype(np.int64)
    w = rng.random(e).astype(np.float32)
    return row, col, w


def dense_oracle(row, col, w, n_pad, x):
    a = np.zeros((n_pad, n_pad), np.float32)
    np.add.at(a, (row, col), w)
    return a @ x


class TestPlan:
    def test_plan_covers_all_edges(self):
        row, col, w = random_graph()
        plan = build_block_plan(row, col, w, num_nodes=300, block_n=128,
                                chunk=128)
        assert plan.num_nodes == 384
        assert int(plan.valid.sum()) == 900
        # reconstruct each edge
        got = sorted(zip(plan.row[plan.valid].tolist(),
                         plan.col[plan.valid].tolist(),
                         plan.weight[plan.valid].tolist()))
        want = sorted(zip(row.tolist(), col.tolist(), w.tolist()))
        for (r1, c1, w1), (r2, c2, w2) in zip(got, want):
            assert (r1, c1) == (r2, c2) and w1 == pytest.approx(w2)

    def test_local_ids_consistent(self):
        row, col, w = random_graph()
        plan = build_block_plan(row, col, w, num_nodes=300, block_n=128,
                                chunk=128)
        nc = plan.n_chunks
        rl = plan.row_local.reshape(nc, plan.chunk)
        cl = plan.col_local.reshape(nc, plan.chunk)
        rg = plan.row.reshape(nc, plan.chunk)
        cg = plan.col.reshape(nc, plan.chunk)
        v = plan.valid.reshape(nc, plan.chunk)
        for c in range(nc):
            rb, cb = plan.chunk_rows[c], plan.chunk_cols[c]
            assert (rg[c][v[c]] == rl[c][v[c]] + rb * 128).all()
            assert (cg[c][v[c]] == cl[c][v[c]] + cb * 128).all()

    def test_row_blocks_contiguous_and_complete(self):
        row, col, w = random_graph(n=50, e=40)  # sparse: some blocks empty
        plan = build_block_plan(row, col, w, num_nodes=50, block_n=8, chunk=16)
        crs = plan.chunk_rows
        # every row block present
        assert set(crs.tolist()) == set(range(plan.num_nodes // 8))
        # contiguous stripes
        changes = (np.diff(crs) != 0).sum()
        assert changes == len(set(crs.tolist())) - 1

    def test_transpose_perm(self):
        row, col, w = random_graph()
        plan = build_block_plan(row, col, w, num_nodes=300, block_n=128,
                                chunk=128)
        plan_t, t_perm, t_valid = transpose_plan(plan)
        # transposed slot i's (row, col) == forward slot's (col, row)
        assert (plan_t.row[t_valid] == plan.col[t_perm[t_valid]]).all()
        assert (plan_t.col[t_valid] == plan.row[t_perm[t_valid]]).all()
        np.testing.assert_allclose(plan_t.weight[t_valid],
                                   plan.weight[t_perm[t_valid]])


class TestSpmmKernel:
    def test_matches_dense_oracle(self):
        row, col, w = random_graph()
        plan = build_block_plan(row, col, w, num_nodes=300, block_n=128,
                                chunk=128)
        rng = np.random.default_rng(1)
        x = rng.normal(size=(plan.num_nodes, 64)).astype(np.float32)
        got = np.asarray(_spmm_call(plan, jnp.asarray(x),
                                    jnp.asarray(plan.weight)))
        want = dense_oracle(row, col, w, plan.num_nodes, x)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def test_empty_blocks_zeroed(self):
        # graph with an entire empty node block: output rows must be zero
        row = np.array([0, 1], np.int64)
        col = np.array([1, 0], np.int64)
        w = np.ones(2, np.float32)
        plan = build_block_plan(row, col, w, num_nodes=40, block_n=8, chunk=8)
        x = np.ones((plan.num_nodes, 8), np.float32)
        got = np.asarray(_spmm_call(plan, jnp.asarray(x),
                                    jnp.asarray(plan.weight)))
        assert got[0, 0] == 1.0 and got[1, 0] == 1.0
        np.testing.assert_allclose(got[2:], 0.0)

    def test_sddmm_matches_oracle(self):
        row, col, w = random_graph(n=200, e=500)
        plan = build_block_plan(row, col, w, num_nodes=200, block_n=128,
                                chunk=128)
        rng = np.random.default_rng(2)
        a = rng.normal(size=(plan.num_nodes, 32)).astype(np.float32)
        b = rng.normal(size=(plan.num_nodes, 32)).astype(np.float32)
        got = np.asarray(_sddmm_call(plan, jnp.asarray(a), jnp.asarray(b)))
        v = plan.valid
        want = np.sum(a[plan.row[v]] * b[plan.col[v]], axis=1)
        np.testing.assert_allclose(got[v], want, rtol=1e-4, atol=1e-4)

    def test_gradients_match_xla_spmm(self):
        row, col, w = random_graph(n=150, e=400, seed=3)
        plans = make_plan_pair(row, col, w, num_nodes=150, block_n=128,
                               chunk=128)
        spmm_fn = make_spmm(plans)
        rng = np.random.default_rng(4)
        x = jnp.asarray(rng.normal(size=(plans.fwd.num_nodes, 16)).astype(np.float32))
        w_j = jnp.asarray(plans.fwd.weight)

        def loss_pallas(x_, w_):
            return jnp.sum(spmm_fn(x_, w_) ** 2)

        def loss_xla(x_, w_):
            out = jax.ops.segment_sum(
                x_[jnp.asarray(plans.fwd.col)] * w_[:, None],
                jnp.asarray(plans.fwd.row),
                num_segments=plans.fwd.num_nodes)
            return jnp.sum(out ** 2)

        gx_p, gw_p = jax.grad(loss_pallas, argnums=(0, 1))(x, w_j)
        gx_x, gw_x = jax.grad(loss_xla, argnums=(0, 1))(x, w_j)
        np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_x),
                                   rtol=1e-3, atol=1e-3)
        v = plans.fwd.valid
        np.testing.assert_allclose(np.asarray(gw_p)[v], np.asarray(gw_x)[v],
                                   rtol=1e-3, atol=1e-3)
