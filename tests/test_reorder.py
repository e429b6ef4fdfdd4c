"""Node-reordering pass (ops/reorder.py): permutation validity, relabeling
semantics (spmm + full model forward are permutation-equivariant), and the
block-plan locality win the pass exists for.

No reference analogue — torch_sparse's CUDA gather is labeling-indifferent;
block locality is a TPU-plan concern (ops/pallas/plan.py docstring).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from graph_neural_pde_tpu.config import Config
from graph_neural_pde_tpu.data.synthetic import make_sbm_dataset
from graph_neural_pde_tpu.ops.graph import make_graph
from graph_neural_pde_tpu.ops.pallas.plan import build_block_plan
from graph_neural_pde_tpu.ops.reorder import (
    _rcm_numpy,
    _symmetric_csr,
    bandwidth,
    degree_order,
    invert_order,
    node_order,
    plan_occupancy,
    rcm_order,
    relabel_graph,
    reorder_dataset,
)


def _community_graph(n_comm=8, comm_size=128, deg_in=12, n_inter=None,
                     seed=0):
    """Planted-partition edges under a RANDOM node labeling (the layout a
    real loader produces; contiguous-by-construction labels would leave RCM
    nothing to do). ``n_inter`` inter-community edges total (default: one
    per node). Returns (row, col, num_nodes) undirected."""
    rng = np.random.default_rng(seed)
    n = n_comm * comm_size
    if n_inter is None:
        n_inter = n
    rows, cols = [], []
    for c in range(n_comm):
        members = np.arange(c * comm_size, (c + 1) * comm_size)
        for u in members:
            nb_in = rng.choice(members, size=deg_in, replace=False)
            rows.append(np.full(deg_in, u)), cols.append(nb_in)
    rows.append(rng.integers(0, n, size=n_inter))
    cols.append(rng.integers(0, n, size=n_inter))
    row = np.concatenate(rows)
    col = np.concatenate(cols)
    keep = row != col
    row, col = row[keep], col[keep]
    # scramble the labeling
    perm = rng.permutation(n)
    row, col = perm[row], perm[col]
    # symmetrise
    return (np.concatenate([row, col]), np.concatenate([col, row]), n)


class TestOrders:
    def test_rcm_is_valid_permutation_and_reduces_bandwidth(self):
        row, col, n = _community_graph(n_comm=4, comm_size=32, seed=1)
        order = rcm_order(row, col, n)
        assert sorted(order.tolist()) == list(range(n))
        assert bandwidth(row, col, order) < bandwidth(row, col)

    def test_numpy_rcm_matches_scipy_quality(self):
        # tie-breaking differs between implementations; the invariant is
        # the objective: both cut bandwidth by a comparable factor
        row, col, n = _community_graph(n_comm=4, comm_size=32, seed=2)
        indptr, idx = _symmetric_csr(row, col, n)
        o_np = _rcm_numpy(indptr, idx, n)
        assert sorted(o_np.tolist()) == list(range(n))
        bw_np = bandwidth(row, col, o_np)
        bw_sp = bandwidth(row, col, rcm_order(row, col, n))
        assert bw_np < bandwidth(row, col)
        assert bw_np <= 2 * bw_sp + 16

    def test_degree_order(self):
        row = np.array([0, 0, 0, 1, 2])
        col = np.array([1, 2, 3, 2, 3])
        order = degree_order(row, col, 5)
        assert sorted(order.tolist()) == list(range(5))
        assert order[0] == 0          # degree-3 hub leads
        assert order[-1] == 4         # isolated node last

    def test_unknown_method_raises(self):
        with pytest.raises(ValueError):
            node_order("metis", np.zeros(0), np.zeros(0), 1)


class TestRelabeling:
    def test_spmm_equivariance(self):
        rng = np.random.default_rng(3)
        row, col, n = _community_graph(n_comm=4, comm_size=32, seed=3)
        w = rng.random(row.shape[0]).astype(np.float32)
        g = make_graph(row, col, w, num_nodes=n, pad_multiple=64)
        order = rcm_order(row, col, n)
        g2 = relabel_graph(g, order)
        x = rng.normal(size=(n, 7)).astype(np.float32)

        from graph_neural_pde_tpu.ops.spmm import spmm
        out1 = np.asarray(spmm(g, jnp.asarray(x)))
        out2 = np.asarray(spmm(g2, jnp.asarray(x[order])))
        np.testing.assert_allclose(out2, out1[order], rtol=1e-5, atol=1e-5)

    def test_reorder_dataset_semantics(self):
        ds = make_sbm_dataset(num_nodes=120, num_classes=3, num_features=9,
                              seed=4)
        d2, order = reorder_dataset(ds, "rcm")
        assert d2.reorder is not None
        np.testing.assert_array_equal(np.asarray(d2.y),
                                      np.asarray(ds.y)[order])
        np.testing.assert_array_equal(np.asarray(d2.x),
                                      np.asarray(ds.x)[order])
        for a, b in ((d2.train_mask, ds.train_mask),
                     (d2.val_mask, ds.val_mask), (d2.test_mask, ds.test_mask)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b)[order])
        # edge multiset is the relabeled original
        inv = invert_order(order)
        m = np.asarray(ds.graph.mask)
        e_old = {(int(inv[r]), int(inv[c]))
                 for r, c in zip(np.asarray(ds.graph.row)[m],
                                 np.asarray(ds.graph.col)[m])}
        m2 = np.asarray(d2.graph.mask)
        e_new = {(int(r), int(c))
                 for r, c in zip(np.asarray(d2.graph.row)[m2],
                                 np.asarray(d2.graph.col)[m2])}
        assert e_old == e_new

    def test_model_forward_equivariance(self):
        from graph_neural_pde_tpu.models.gnn import GNNModel
        ds = make_sbm_dataset(num_nodes=90, num_classes=3, num_features=10,
                              seed=5)
        d2, order = reorder_dataset(ds, "rcm")
        cfg = Config(block="constant", function="laplacian", method="rk4",
                     step_size=0.5, time=2.0, hidden_dim=12,
                     input_dropout=0.0, dropout=0.0)
        outs = []
        for d in (ds, d2):
            model = GNNModel(cfg, d.num_features, d.num_classes, d.graph)
            params, state = model.init(jax.random.PRNGKey(0))
            logits, _, _, _ = model.apply(params, state, d.x, training=False)
            outs.append(np.asarray(logits))
        np.testing.assert_allclose(outs[1], outs[0][order],
                                   rtol=2e-4, atol=2e-4)

    def test_get_dataset_wiring(self, tmp_path):
        from graph_neural_pde_tpu.data.datasets import get_dataset
        base = Config(dataset="Cora", seed=7)
        d0 = get_dataset(base, str(tmp_path))
        d1 = get_dataset(base.replace(node_reorder="rcm"), str(tmp_path))
        assert d0.reorder is None and d1.reorder is not None
        np.testing.assert_array_equal(np.asarray(d1.y),
                                      np.asarray(d0.y)[d1.reorder])
        assert int(d1.train_mask.sum()) == int(d0.train_mask.sum())


class TestLocality:
    def test_rcm_concentrates_block_plan(self):
        # the win regime is MANY node blocks with sparse inter-community
        # traffic: a scrambled labeling pays the one-chunk-per-bucket floor
        # on all blocks^2 buckets, a clustered one on ~blocks diagonal
        # buckets plus the few genuine inter edges (32 blocks here)
        row, col, n = _community_graph(n_comm=32, comm_size=128,
                                       n_inter=256, seed=6)    # 4096 nodes
        plan0 = build_block_plan(row, col, num_nodes=n, block_n=128,
                                 chunk=1024)
        order = rcm_order(row, col, n)
        inv = invert_order(order)
        plan1 = build_block_plan(inv[row], inv[col], num_nodes=n,
                                 block_n=128, chunk=1024)
        occ0, occ1 = plan_occupancy(plan0), plan_occupancy(plan1)
        assert occ0["valid_edges"] == occ1["valid_edges"]
        assert occ1["buckets"] < 0.6 * occ0["buckets"]
        assert occ1["n_chunks"] < 0.7 * occ0["n_chunks"]
        assert occ1["fill"] > 1.4 * occ0["fill"]
