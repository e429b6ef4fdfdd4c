"""Vmapped multi-seed ensemble training (one jit trains all seeds)."""

import numpy as np
import pytest

from graph_neural_pde_tpu.config import Config
from graph_neural_pde_tpu.data.synthetic import make_sbm_dataset
from graph_neural_pde_tpu.models.gnn import GNNModel
from graph_neural_pde_tpu.training.train import Trainer


class TestEnsemble:
    def test_three_seeds_learn(self):
        ds = make_sbm_dataset(num_nodes=80, num_classes=3, num_features=10,
                              seed=17)
        cfg = Config(hidden_dim=12, method="rk4", step_size=0.5, time=1.5,
                     input_dropout=0.0, dropout=0.0, lr=0.05,
                     add_source=True)
        model = GNNModel(cfg, ds.num_features, ds.num_classes, ds.graph)
        trainer = Trainer(model)
        params, state, best, summary = trainer.fit_ensemble(
            ds, num_seeds=3, epochs=15)
        assert len(best) == 3
        assert summary["val"]["n"] == 3
        assert summary["val"]["mean"] > 0.6, summary
        # seeds genuinely differ
        leaf = np.asarray(params["m1"]["w"])
        assert leaf.shape[0] == 3
        assert not np.allclose(leaf[0], leaf[1])

    def test_ensemble_adaptive_solver(self):
        ds = make_sbm_dataset(num_nodes=60, num_classes=3, num_features=8,
                              seed=18)
        cfg = Config(hidden_dim=8, attention_dim=8, heads=2,
                     block="attention", method="dopri5", tol_scale=100.0,
                     time=1.0, input_dropout=0.0, dropout=0.0, lr=0.05,
                     max_nfe=600)
        model = GNNModel(cfg, ds.num_features, ds.num_classes, ds.graph)
        trainer = Trainer(model)
        _, _, best, summary = trainer.fit_ensemble(ds, num_seeds=2, epochs=5)
        assert all(np.isfinite(b["val_acc"]) for b in best)
