"""Round 5 (VERDICT r4 #4): edge_sampling and fa_layer ride the stripe
engine instead of disabling it wholesale.

Same machinery that carried rewire_KNN in round 4 (plans rebuilt in the
between-epoch hook, compiled steps keyed by plan identity, col-content-free
plans so traced graphs carry the edge content), extended to the remaining
two runtime-rewiring configs (reference graph_rewiring.py:150-241,
GNN_KNN.py:65-83). Includes the staleness detectors: post-surgery trainer
output must equal a from-scratch model on the surged graph, and a
content-swap at stable capacity must NOT be served by a stale executable.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from graph_neural_pde_tpu.config import Config  # noqa: E402
from graph_neural_pde_tpu.data.synthetic import make_sbm_dataset  # noqa: E402


def _mean_att_fn(model, params, state, x, cfg):
    """Host-side head-mean attention per edge slot (the run.py hook's)."""
    from graph_neural_pde_tpu.models.attention import (
        apply_transformer_attention)

    def mean_att(graph):
        x0, _ = model.encode(params, state, x, None, False,
                             jax.random.PRNGKey(0))
        if graph.num_nodes > x0.shape[0]:
            x0 = jnp.pad(x0, ((0, graph.num_nodes - x0.shape[0]), (0, 0)))
        att_params = params["block"].get(
            "att", params["block"]["func"].get("att"))
        att, _ = apply_transformer_attention(att_params, cfg, x0, graph,
                                             edge_weight=graph.weight)
        return np.asarray(jnp.mean(att, axis=1))

    return mean_att


class TestEdgeSamplingStripeEngine:
    def _setup(self):
        from graph_neural_pde_tpu.models.gnn import GNNModel
        from graph_neural_pde_tpu.training.train import Trainer

        ds = make_sbm_dataset(num_nodes=48, num_classes=3, num_features=8,
                              seed=7)
        cfg = Config(block="attention", function="laplacian",
                     attention_type="scaled_dot", heads=2, attention_dim=8,
                     hidden_dim=8, edge_sampling=True,
                     edge_sampling_epoch=2, edge_sampling_add=0.3,
                     edge_sampling_add_type="random",
                     edge_sampling_rmv=0.25, no_early=True,
                     method="rk4", step_size=1.0, time=2.0,
                     input_dropout=0.0, dropout=0.0,
                     stripe_fused=True, stripe_block_n=8, stripe_chunk=16,
                     stripe_chunk_auto=False, epoch=6)
        model = GNNModel(cfg, ds.num_features, ds.num_classes, ds.graph)
        trainer = Trainer(model)
        return ds, cfg, model, trainer

    def test_engine_active_and_survives_sampling(self):
        from graph_neural_pde_tpu.rewiring.edges import apply_edge_sampling

        ds, cfg, model, trainer = self._setup()
        assert model.stripe_plan is not None, "engine must be ON"
        assert model.stripe_plan.col_plan is None  # content-swap safe
        plan0 = model.stripe_plan

        params, state = model.init(jax.random.PRNGKey(0))
        opt_state = trainer.optimizer.init(params)
        rng = jax.random.PRNGKey(1)
        losses = []
        for epoch in range(1, 5):
            if epoch % 2 == 0:
                model.graph = apply_edge_sampling(
                    model.graph, cfg,
                    _mean_att_fn(model, params, state, ds.x, cfg),
                    np.random.default_rng(epoch),
                    capacity=model.graph.capacity).sort_by_row()
                model._build_engines()
            rng, k = jax.random.split(rng)
            params, state, opt_state, loss, _ = trainer._train_step(
                params, state, opt_state, ds.x, None, ds.y, ds.train_mask,
                k, model.graph)
            losses.append(float(loss))
        assert all(np.isfinite(losses)), losses
        assert model.stripe_plan is not None
        assert plan0 is not model.stripe_plan or len(trainer._step_cache) == 1

    def test_post_sampling_matches_fresh_model(self):
        """Staleness detector (the round-4 rewire_KNN oracle, applied to
        edge_sampling): after the hook's surgery + engine rebuild, the
        trainer-driven eval equals a model built from scratch on the
        sampled graph."""
        from graph_neural_pde_tpu.models.gnn import GNNModel
        from graph_neural_pde_tpu.rewiring.edges import apply_edge_sampling

        ds, cfg, model, trainer = self._setup()
        params, state = model.init(jax.random.PRNGKey(0))
        # prime the caches on the original graph, then rewire
        trainer._eval_step(params, state, ds.x, None, ds.y,
                           (ds.train_mask, ds.val_mask, ds.test_mask),
                           model.graph)
        model.graph = apply_edge_sampling(
            model.graph, cfg, _mean_att_fn(model, params, state, ds.x, cfg),
            np.random.default_rng(3),
            capacity=model.graph.capacity).sort_by_row()
        model._build_engines()
        (_, logits, _) = trainer._eval_step(
            params, state, ds.x, None, ds.y,
            (ds.train_mask, ds.val_mask, ds.test_mask), model.graph)
        # engine-free oracle on the EXACT surged graph (a fresh construction
        # would re-run prepare_graph's normalisation on it — different
        # semantics, not a staleness signal)
        fresh = GNNModel(cfg.replace(stripe_fused=False), ds.num_features,
                         ds.num_classes, ds.graph)
        f_logits, _, _, _ = fresh.apply(params, state, ds.x, None,
                                        training=False, graph=model.graph)
        np.testing.assert_allclose(np.asarray(logits), np.asarray(f_logits),
                                   rtol=2e-2, atol=2e-2)


class TestFALayerStripeEngine:
    def _setup(self, stripe=True):
        from graph_neural_pde_tpu.models.gnn_knn import GNNKNNModel
        from graph_neural_pde_tpu.training.train import Trainer

        ds = make_sbm_dataset(num_nodes=48, num_classes=3, num_features=8,
                              seed=9)
        cfg = Config(block="attention", function="laplacian",
                     attention_type="scaled_dot", heads=2, attention_dim=8,
                     hidden_dim=8, fa_layer=True,
                     fa_layer_edge_sampling_rmv=0.4, no_early=True,
                     method="rk4", step_size=1.0, time=2.0,
                     input_dropout=0.0, dropout=0.0,
                     stripe_fused=stripe, stripe_block_n=8, stripe_chunk=16,
                     stripe_chunk_auto=False, epoch=4)
        model = GNNKNNModel(cfg, ds.num_features, ds.num_classes, ds.graph)
        trainer = Trainer(model)
        return ds, cfg, model, trainer

    def test_fa_solve_rides_its_own_plan(self):
        ds, cfg, model, trainer = self._setup()
        assert model.stripe_plan is not None
        params, state = model.init(jax.random.PRNGKey(0))
        model.build_fa_graph(np.random.default_rng(0), add_frac=0.4)
        assert model.fa_plan is not None, "explicit stripe_fused=True " \
            "must give the fa solve its own engine"
        opt_state = trainer.optimizer.init(params)
        params, state, opt_state, loss, _ = trainer._train_step(
            params, state, opt_state, ds.x, None, ds.y, ds.train_mask,
            jax.random.PRNGKey(1), model.graph)
        assert np.isfinite(float(loss))

    def test_fa_output_matches_engine_free_oracle(self):
        """The fa solve through (stripe plan + stripe spmm) equals the same
        two-solve forward with every engine off."""
        ds, cfg, model, trainer = self._setup()
        params, state = model.init(jax.random.PRNGKey(0))
        model.build_fa_graph(np.random.default_rng(0), add_frac=0.4)
        logits, _, _, _ = model.apply(params, state, ds.x, None,
                                      training=False, graph=model.graph,
                                      fa_graph=model.fa_graph)
        from graph_neural_pde_tpu.models.gnn_knn import GNNKNNModel
        oracle = GNNKNNModel(cfg.replace(stripe_fused=False),
                             ds.num_features, ds.num_classes, ds.graph)
        # same fa EDGES, engine-free: reuse the engine model's fa graph
        oracle.set_fa_graph(model.fa_graph)
        assert oracle.fa_plan is None
        o_logits, _, _, _ = oracle.apply(params, state, ds.x, None,
                                         training=False)
        n = min(logits.shape[0], o_logits.shape[0])
        np.testing.assert_allclose(np.asarray(logits)[:n],
                                   np.asarray(o_logits)[:n],
                                   rtol=2e-2, atol=2e-2)

    def test_fa_graph_traced_not_stale(self):
        """Content-swap staleness detector: with the fa engine OFF (auto
        mode) the fa graph reaches the compiled step as a TRACED argument —
        swapping its edge content at stable capacity must change the output
        WITHOUT a rebuild (a baked closure would keep serving epoch-1
        edges)."""
        from graph_neural_pde_tpu.rewiring.edges import add_random_edges

        ds, cfg, model, trainer = self._setup(stripe=None)
        params, state = model.init(jax.random.PRNGKey(0))
        g_fa1 = model.set_fa_graph(
            add_random_edges(model.graph, 0.4, np.random.default_rng(0),
                             capacity=None))
        (_, logits1, _) = trainer._eval_step(
            params, state, ds.x, None, ds.y,
            (ds.train_mask, ds.val_mask, ds.test_mask), model.graph)
        # swap fa content at the SAME capacity, no engine rebuild (slightly
        # smaller add fraction: random dedup variance must not overflow the
        # pinned capacity)
        g_fa2 = model.set_fa_graph(
            add_random_edges(model.graph, 0.3, np.random.default_rng(5),
                             capacity=g_fa1.capacity))
        assert g_fa2.capacity == g_fa1.capacity
        (_, logits2, _) = trainer._eval_step(
            params, state, ds.x, None, ds.y,
            (ds.train_mask, ds.val_mask, ds.test_mask), model.graph)
        assert not np.allclose(np.asarray(logits1), np.asarray(logits2)), \
            "stale fa graph: content swap did not change the output"
        # and the swapped output equals a fresh jit on the new fa graph
        f_logits, _, _, _ = model.apply(params, state, ds.x, None,
                                        training=False, graph=model.graph,
                                        fa_graph=g_fa2)
        np.testing.assert_allclose(np.asarray(logits2),
                                   np.asarray(f_logits), rtol=2e-2,
                                   atol=2e-2)
