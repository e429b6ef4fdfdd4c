"""Label diffusion, solver experiment, visualisation smoke tests."""

import numpy as np
import pytest

from graph_neural_pde_tpu.config import Config
from graph_neural_pde_tpu.data.synthetic import make_sbm_dataset
from graph_neural_pde_tpu.models.gnn import GNNModel
from graph_neural_pde_tpu.training.train import Trainer


@pytest.fixture(scope="module")
def dataset():
    return make_sbm_dataset(num_nodes=80, num_classes=3, num_features=8,
                            seed=5)


class TestUseLabels:
    def test_label_diffusion_trains(self, dataset):
        cfg = Config(hidden_dim=10, use_labels=True, label_rate=0.5,
                     method="rk4", step_size=0.5, time=1.5,
                     input_dropout=0.0, dropout=0.0, lr=0.05,
                     add_source=True)
        model = GNNModel(cfg, dataset.num_features, dataset.num_classes,
                         dataset.graph)
        assert model.core_dim == 10 + 3
        trainer = Trainer(model)
        _, _, best, _ = trainer.fit(dataset, epochs=15, verbose=False)
        assert best["val_acc"] > 0.5, best


class TestSolverExperiment:
    def test_sweep_runs(self, tmp_path):
        from graph_neural_pde_tpu.training.run_solver_exp import run_experiment
        cfg = Config(dataset="Citeseer", hidden_dim=8, time=1.0,
                     input_dropout=0.0, dropout=0.0, lr=0.05)
        out = str(tmp_path / "res.npz")
        res = run_experiment(cfg, str(tmp_path), step_sizes=[0.5],
                             epochs=4, out_path=out, verbose=False)
        assert set(res) == {"explicit_adams_h0.5", "implicit_adams_h0.5"}
        assert (tmp_path / "res.npz").exists()
        loaded = np.load(out)
        assert "explicit_adams_h0.5__loss" in loaded


class TestVisualise:
    def test_attention_graph_and_heatmap(self, dataset):
        import matplotlib
        matplotlib.use("Agg")
        import jax
        from graph_neural_pde_tpu.models.attention import (
            apply_transformer_attention, init_transformer_attention)
        from graph_neural_pde_tpu.models.blocks import prepare_graph
        from graph_neural_pde_tpu.utils.visualise import (
            attention_graph, attention_heatmap, plot_image_trajectory)
        cfg = Config(hidden_dim=8, attention_dim=8, heads=2)
        g = prepare_graph(cfg, dataset.graph)
        params = init_transformer_attention(jax.random.PRNGKey(0), cfg, 8)
        import jax.numpy as jnp
        x = jnp.asarray(np.random.default_rng(0).normal(size=(80, 8)).astype(np.float32))
        att, _ = apply_transformer_attention(params, cfg, x, g)
        gr = attention_graph(g, att)
        assert gr.number_of_nodes() == 80
        ax = attention_heatmap(g, att, max_nodes=16)
        assert ax is not None
        paths = np.random.default_rng(0).random((2, 3, 16))
        fig = plot_image_trajectory(paths, 4, 4)
        assert fig is not None


class TestGeomGcnSplits:
    def test_cli_loads_fixed_split(self, tmp_path):
        """--geom_gcn_splits reads {data_dir}/splits/{ds}_split_0.6_0.2_k.npz."""
        import jax.numpy as jnp
        from graph_neural_pde_tpu.run import main
        n = 183  # cornell synthetic stand-in size
        rng = np.random.default_rng(0)
        d = tmp_path / "splits"
        d.mkdir()
        tm = np.zeros(n, bool); tm[:100] = True
        vm = np.zeros(n, bool); vm[100:140] = True
        sm = np.zeros(n, bool); sm[140:] = True
        np.savez(d / "cornell_split_0.6_0.2_0.npz", train_mask=tm,
                 val_mask=vm, test_mask=sm)
        cfg = Config(dataset="cornell", geom_gcn_splits=True, hidden_dim=8,
                     method="rk4", step_size=0.5, time=1.0, epoch=3,
                     input_dropout=0.0, dropout=0.0, seed=0)
        tr, va, te = main(cfg, str(tmp_path), verbose=False)
        assert 0.0 <= va <= 1.0


class TestAdjointWithRegularizers:
    def test_tuple_state_adjoint_trains(self):
        from graph_neural_pde_tpu.data.synthetic import make_sbm_dataset
        from graph_neural_pde_tpu.models.gnn import GNNModel
        from graph_neural_pde_tpu.training.train import Trainer
        ds = make_sbm_dataset(num_nodes=60, num_classes=3, num_features=8,
                              seed=23)
        cfg = Config(hidden_dim=8, method="rk4", step_size=0.5, time=1.0,
                     adjoint=True, adjoint_method="rk4",
                     kinetic_energy=0.05, directional_penalty=0.01,
                     input_dropout=0.0, dropout=0.0, lr=0.05)
        model = GNNModel(cfg, ds.num_features, ds.num_classes, ds.graph)
        trainer = Trainer(model)
        _, _, best, logs = trainer.fit(ds, epochs=5, verbose=False)
        assert np.isfinite(logs[-1].loss)
