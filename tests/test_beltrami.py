"""BLEND (Beltrami) end-to-end: joint feature+positional diffusion."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graph_neural_pde_tpu.config import Config
from graph_neural_pde_tpu.data.synthetic import make_sbm_dataset
from graph_neural_pde_tpu.models.gnn import GNNModel
from graph_neural_pde_tpu.rewiring.positional import apply_beltrami
from graph_neural_pde_tpu.training.train import Trainer


@pytest.fixture(scope="module")
def dataset():
    ds = make_sbm_dataset(num_nodes=70, num_classes=3, num_features=9, seed=11)
    cfg = Config(dataset="toy", pos_enc_type="GDC", gdc_method="ppr",
                 ppr_alpha=0.1, exact=True, self_loop_weight=1.0)
    pe = apply_beltrami(ds.graph, cfg, None)
    ds.pos_encoding = jnp.asarray(pe)
    return ds


def beltrami_cfg(**kw):
    base = dict(beltrami=True, attention_type="exp_kernel",
                feat_hidden_dim=8, pos_enc_hidden_dim=4, pos_enc_dim=70,
                attention_dim=8, heads=2, block="attention",
                function="laplacian", method="rk4", step_size=0.5, time=2.0,
                input_dropout=0.0, dropout=0.0, lr=0.05, add_source=True)
    base.update(kw)
    return Config(**base)


class TestBeltrami:
    def test_dual_encoder_dims(self, dataset):
        cfg = beltrami_cfg()
        model = GNNModel(cfg, dataset.num_features, dataset.num_classes,
                         dataset.graph)
        assert model.enc_dim == 12  # feat 8 + pos 4
        params, state = model.init(jax.random.PRNGKey(0))
        assert params["mx"]["w"].shape == (9, 8)
        assert params["mp"]["w"].shape == (70, 4)
        logits, _, stats, _ = model.apply(params, state, dataset.x,
                                          dataset.pos_encoding,
                                          training=True,
                                          rng=jax.random.PRNGKey(1))
        assert logits.shape == (70, 3)
        assert np.isfinite(np.asarray(logits)).all()

    def test_blend_learns(self, dataset):
        cfg = beltrami_cfg()
        model = GNNModel(cfg, dataset.num_features, dataset.num_classes,
                         dataset.graph)
        trainer = Trainer(model)
        _, _, best, _ = trainer.fit(dataset, epochs=25, verbose=False)
        assert best["val_acc"] > 0.6, best

    def test_beltrami_with_labels(self, dataset):
        """features ‖ positional ‖ labels split inside the attention layer
        (function_transformer_attention.py:133-136)."""
        cfg = beltrami_cfg(use_labels=True)
        model = GNNModel(cfg, dataset.num_features, dataset.num_classes,
                         dataset.graph)
        trainer = Trainer(model)
        _, _, best, logs = trainer.fit(dataset, epochs=6, verbose=False)
        assert np.isfinite(logs[-1].loss)

    def test_blend_transformer_function(self, dataset):
        """Beltrami attention recomputed every RHS eval (GRAND-nl + BLEND)."""
        cfg = beltrami_cfg(function="transformer")
        model = GNNModel(cfg, dataset.num_features, dataset.num_classes,
                         dataset.graph)
        params, state = model.init(jax.random.PRNGKey(0))
        logits, _, _, _ = model.apply(params, state, dataset.x,
                                      dataset.pos_encoding, training=True,
                                      rng=jax.random.PRNGKey(1))
        assert np.isfinite(np.asarray(logits)).all()
