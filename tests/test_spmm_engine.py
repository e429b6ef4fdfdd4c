"""The Pallas blocked aggregation engine must match the XLA engine exactly
through the full model (forward, gradient, training), including the padded
node layout."""

import jax
import numpy as np
import pytest

from graph_neural_pde_tpu.config import Config
from graph_neural_pde_tpu.data.synthetic import make_sbm_dataset
from graph_neural_pde_tpu.models.gnn import GNNModel
from graph_neural_pde_tpu.training.train import Trainer
import jax.numpy as jnp
from graph_neural_pde_tpu.ops.graph import make_graph


@pytest.fixture(scope="module")
def dataset():
    return make_sbm_dataset(num_nodes=90, num_classes=3, num_features=10,
                            seed=21)


def cfg_pair(**kw):
    base = dict(hidden_dim=12, attention_dim=12, heads=3, method="rk4",
                step_size=0.5, time=1.5, input_dropout=0.0, dropout=0.0,
                add_source=True, lr=0.05, spmm_block_n=128, spmm_chunk=128)
    base.update(kw)
    return (Config(**base, spmm_impl="xla"),
            Config(**base, spmm_impl="pallas_blocked"))


class TestEngineEquivalence:
    @pytest.mark.parametrize("block", ["constant", "attention"])
    def test_forward_matches(self, dataset, block):
        cfg_x, cfg_p = cfg_pair(block=block)
        m_x = GNNModel(cfg_x, dataset.num_features, dataset.num_classes,
                       dataset.graph)
        m_p = GNNModel(cfg_p, dataset.num_features, dataset.num_classes,
                       dataset.graph)
        assert m_p.spmm_fn is not None
        assert m_p.graph.num_nodes % cfg_p.spmm_block_n == 0
        params, state = m_x.init(jax.random.PRNGKey(0))
        lo_x, _, _, _ = m_x.apply(params, state, dataset.x, training=False)
        lo_p, _, _, _ = m_p.apply(params, state, dataset.x, training=False)
        np.testing.assert_allclose(np.asarray(lo_p), np.asarray(lo_x),
                                   rtol=2e-4, atol=2e-5)

    def test_training_matches(self, dataset):
        cfg_x, cfg_p = cfg_pair(block="attention")
        results = []
        for cfg in (cfg_x, cfg_p):
            model = GNNModel(cfg, dataset.num_features, dataset.num_classes,
                             dataset.graph)
            trainer = Trainer(model)
            _, _, best, logs = trainer.fit(dataset, epochs=6, verbose=False)
            results.append(logs[-1].loss)
        assert results[0] == pytest.approx(results[1], rel=2e-2)

    def test_cheby_with_pallas_engine(self, dataset):
        _, cfg_p = cfg_pair(block="attention", method="cheby", time=3.0)
        model = GNNModel(cfg_p, dataset.num_features, dataset.num_classes,
                         dataset.graph)
        params, state = model.init(jax.random.PRNGKey(0))
        logits, _, stats, _ = model.apply(params, state, dataset.x,
                                          training=False)
        assert np.isfinite(np.asarray(logits)).all()


class TestPallasEngineEarlyStop:
    def test_apply_early_with_plan_layout(self, dataset):
        from graph_neural_pde_tpu.models.gnn_early import GNNEarlyModel
        _, cfg_p = cfg_pair(block="attention", method="rk4",
                            no_early=False, max_test_steps=10,
                            earlystopxT=2.0)
        model = GNNEarlyModel(cfg_p, dataset.num_features,
                              dataset.num_classes, dataset.graph)
        params, state = model.init(jax.random.PRNGKey(0))
        logits, best, stats = model.apply_early(
            params, state, dataset.x, dataset.y,
            (dataset.train_mask, dataset.val_mask, dataset.test_mask))
        assert logits.shape == (90, 3)
        assert np.isfinite(np.asarray(logits)).all()
        assert 0.0 <= float(best.val) <= 1.0


class TestStripeSpmm:
    def test_matches_xla_spmm_and_gradients(self):
        """make_stripe_spmm == spmm over the stripe-reordered graph."""
        import jax
        from graph_neural_pde_tpu.config import Config
        from graph_neural_pde_tpu.models.blocks import (build_stripe_engine,
                                                        prepare_graph)
        from graph_neural_pde_tpu.ops.spmm import make_stripe_spmm, spmm
        rng = np.random.default_rng(0)
        n, e, d = 40, 160, 16
        g0 = make_graph(rng.integers(0, n, e).astype(np.int32),
                        rng.integers(0, n, e).astype(np.int32), None,
                        num_nodes=n)
        cfg = Config(function="laplacian", block="constant",
                     stripe_fused=True, stripe_block_n=8, stripe_chunk=16,
                     self_loop_weight=1.0)
        g = prepare_graph(cfg, g0)
        g2, plan = build_stripe_engine(cfg, g)
        assert plan is not None
        f = make_stripe_spmm(g2, plan)
        x = jnp.asarray(rng.normal(
            size=(g2.num_nodes, d)).astype(np.float32))
        w = jnp.asarray(np.where(np.asarray(g2.mask),
                        rng.random(g2.capacity), 0.0).astype(np.float32))
        got = np.asarray(f(x, w))
        want = np.asarray(spmm(g2, x, weight=w))
        np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)

        # gradients flow through both the gather and the scatter
        def loss(x, w):
            return jnp.sum(f(x, w) ** 2)

        gx, gw = jax.grad(loss, argnums=(0, 1))(x, w)

        def loss_ref(x, w):
            return jnp.sum(spmm(g2, x, weight=w) ** 2)

        rx, rw = jax.grad(loss_ref, argnums=(0, 1))(x, w)
        np.testing.assert_allclose(np.asarray(gx), np.asarray(rx),
                                   rtol=3e-2, atol=3e-2)
        m = np.asarray(g2.mask)
        np.testing.assert_allclose(np.asarray(gw)[m], np.asarray(rw)[m],
                                   rtol=3e-2, atol=3e-2)

    def test_model_with_stripe_laplacian(self):
        """GNNModel(function=laplacian, stripe_fused) trains end to end and
        matches the XLA engine forward."""
        import jax
        from graph_neural_pde_tpu.config import Config
        from graph_neural_pde_tpu.data.synthetic import make_sbm_dataset
        from graph_neural_pde_tpu.models.gnn import GNNModel
        ds = make_sbm_dataset(num_nodes=50, num_classes=3, num_features=8,
                              seed=11)
        cfg = Config(function="laplacian", block="attention", hidden_dim=8,
                     attention_dim=8, heads=2, method="rk4", step_size=0.5,
                     time=1.0, input_dropout=0.0, dropout=0.0,
                     stripe_fused=True, stripe_block_n=8, stripe_chunk=16,
                     self_loop_weight=1.0)
        m1 = GNNModel(cfg, ds.num_features, ds.num_classes, ds.graph)
        assert m1.spmm_fn is not None and m1.stripe_plan is not None
        m2 = GNNModel(cfg.replace(stripe_fused=False), ds.num_features,
                      ds.num_classes, ds.graph)
        p, s = m1.init(jax.random.PRNGKey(0))
        l1, _, _, _ = m1.apply(p, s, ds.x, training=False)
        l2, _, _, _ = m2.apply(p, s, ds.x, training=False)
        scale = float(jnp.abs(l2).max()) + 1e-9
        assert float(jnp.abs(l1 - l2).max()) / scale < 3e-2

    def test_hard_attention_with_stripe_laplacian(self):
        """Tuned Computers/Photo/arxiv shape: hard_attention block +
        laplacian function, stripe engine on vs off (dropped edges carry
        zero weights, so the static-mask stripe scatter stays exact)."""
        import jax
        from graph_neural_pde_tpu.config import Config
        from graph_neural_pde_tpu.data.synthetic import make_sbm_dataset
        from graph_neural_pde_tpu.models.gnn import GNNModel
        ds = make_sbm_dataset(num_nodes=60, num_classes=3, num_features=8,
                              seed=13)
        cfg = Config(function="laplacian", block="hard_attention",
                     att_samp_pct=0.6, hidden_dim=8, attention_dim=8,
                     heads=2, method="rk4", step_size=0.5, time=1.0,
                     input_dropout=0.0, dropout=0.0, stripe_fused=True,
                     stripe_block_n=8, stripe_chunk=16, self_loop_weight=1.0)
        m1 = GNNModel(cfg, ds.num_features, ds.num_classes, ds.graph)
        m2 = GNNModel(cfg.replace(stripe_fused=False), ds.num_features,
                      ds.num_classes, ds.graph)
        assert m1.spmm_fn is not None
        p, s = m1.init(jax.random.PRNGKey(0))
        l1, _, _, _ = m1.apply(p, s, ds.x, training=True,
                               rng=jax.random.PRNGKey(1))
        l2, _, _, _ = m2.apply(p, s, ds.x, training=True,
                               rng=jax.random.PRNGKey(1))
        scale = float(jnp.abs(l2).max()) + 1e-9
        assert float(jnp.abs(l1 - l2).max()) / scale < 3e-2
