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
