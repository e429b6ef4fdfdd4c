"""Adams solvers, sweep runner, checkpointing, stats."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graph_neural_pde_tpu.config import Config
from graph_neural_pde_tpu.data.synthetic import make_sbm_dataset
from graph_neural_pde_tpu.solvers.api import SolverOptions, odeint
from graph_neural_pde_tpu.solvers.multistep import odeint_adams
from graph_neural_pde_tpu.training.tuning import (
    run_best,
    run_sweep,
    sample_config,
    set_search_space,
)
from graph_neural_pde_tpu.utils.checkpoint import load_checkpoint, save_checkpoint
from graph_neural_pde_tpu.utils.stats import aggregate_runs, mean_confidence_interval


def linear_func(params, t, y):
    return y @ params.T


def make_problem():
    a = np.array([[-0.6, 0.4], [0.1, -0.3]], np.float32)
    y0 = np.array([[1.0, -0.5], [0.2, 0.8], [0.0, 1.0]], np.float32)
    return jnp.asarray(a), jnp.asarray(y0)


def exact(a, y0, T):
    import scipy.linalg
    return np.asarray(y0) @ scipy.linalg.expm(np.asarray(a).T * T)


class TestAdams:
    @pytest.mark.parametrize("implicit,tol", [(False, 5e-5), (True, 2e-5)])
    def test_accuracy(self, implicit, tol):
        a, y0 = make_problem()
        T = 2.0
        y1, stats = odeint_adams(linear_func, a, y0, 0.0, T, step_size=0.05,
                                 implicit=implicit)
        np.testing.assert_allclose(np.asarray(y1), exact(a, y0, T),
                                   atol=tol, rtol=tol)
        assert int(stats["nfe"]) > 0

    def test_fourth_order_convergence(self):
        a, y0 = make_problem()
        T = 1.0
        errs = []
        for h in (0.25, 0.125):  # truncation >> f32 roundoff, AB dominates RK4 startup
            y1, _ = odeint_adams(linear_func, a, y0, 0.0, T, step_size=h)
            errs.append(np.abs(np.asarray(y1) - exact(a, y0, T)).max())
        # AB4: halving h should cut the error by ~16x
        assert errs[0] / max(errs[1], 1e-12) > 8

    def test_via_api_dispatch(self):
        a, y0 = make_problem()
        for method in ("explicit_adams", "implicit_adams"):
            opts = SolverOptions(method=method, step_size=0.1)
            y1, _ = odeint(linear_func, a, y0, 0.0, 1.0, opts)
            np.testing.assert_allclose(np.asarray(y1), exact(a, y0, 1.0),
                                       atol=1e-3, rtol=1e-3)

    def test_differentiable(self):
        a, y0 = make_problem()

        def loss(a_):
            y1, _ = odeint_adams(linear_func, a_, y0, 0.0, 1.0,
                                 step_size=0.1)
            return jnp.sum(y1)

        g = jax.grad(loss)(a)
        assert np.isfinite(np.asarray(g)).all()


class TestSweep:
    def test_sweep_and_replay(self, tmp_path):
        ds = make_sbm_dataset(num_nodes=60, num_classes=3, num_features=8,
                              seed=4)
        base = Config(dataset="Cora", hidden_dim=8, attention_dim=8, heads=2,
                      method="rk4", step_size=0.5, time=1.0,
                      input_dropout=0.0, dropout=0.0, max_nfe=2000)
        space = {
            "lr": lambda rng: float(rng.uniform(0.01, 0.05)),
            "time": lambda rng: float(rng.choice([1.0, 2.0])),
        }
        trials = run_sweep(base, ds, num_samples=3, max_epochs=8,
                           grace_period=4, num_splits=1, space=space,
                           checkpoint_dir=str(tmp_path), verbose=False)
        assert len(trials) == 3
        assert trials[0].val_acc >= trials[-1].val_acc
        assert (tmp_path / "trial_0.npz").exists()
        out = run_best(trials[0].cfg, ds, reps=2, num_splits=1, epochs=6)
        assert 0.0 <= out["val"]["mean"] <= 1.0 and out["val"]["n"] == 2

    def test_search_space_sampling(self):
        space = set_search_space("Cora")
        rng = np.random.default_rng(0)
        cfg = sample_config(Config(), space, rng)
        assert cfg.attention_dim % cfg.heads == 0
        assert 0.01 <= cfg.lr <= 0.2          # ray_tune.py:210

    def test_per_dataset_spaces_match_reference_ranges(self):
        """Translated ranges of ray_tune.py:203-544 per dataset."""
        rng = np.random.default_rng(1)
        # Cora, attention base: norm_idx pinned to 0, hidden in {64,128}
        base = Config(dataset="Cora", block="attention")
        for _ in range(8):
            c = sample_config(base, set_search_space(base), rng)
            assert c.attention_norm_idx == 0
            assert c.hidden_dim in (64, 128)
            assert c.input_dropout == 0.5
            assert c.optimizer in ("adam", "adamax")
            assert 0.0 <= c.dropout <= 0.15
            assert c.self_loop_weight in (0.0, 1.0)
        # Cora constant block: self-loop becomes uniform(0, 3)
        base_c = Config(dataset="Cora", block="constant")
        sls = [sample_config(base_c, set_search_space(base_c), rng)
               .self_loop_weight for _ in range(16)]
        assert any(s not in (0.0, 1.0) for s in sls)
        # Citeseer pins norm_idx=1 and decay=0.1
        base2 = Config(dataset="Citeseer", block="attention")
        c2 = sample_config(base2, set_search_space(base2), rng)
        assert c2.attention_norm_idx == 1 and c2.decay == 0.1
        assert c2.hidden_dim == 128
        # Pubmed requires adjoint
        import pytest as _pt
        with _pt.raises(ValueError, match="adjoint"):
            set_search_space(Config(dataset="Pubmed", adjoint=False))
        c3 = sample_config(
            Config(dataset="Pubmed", adjoint=True, block="attention"),
            set_search_space(Config(dataset="Pubmed", adjoint=True,
                                    block="attention")), rng)
        assert c3.adjoint_method in ("dopri5", "adaptive_heun")
        # arxiv space only fixes decay=0
        s4 = set_search_space(Config(dataset="ogbn-arxiv"))
        assert list(s4) == ["decay"]
        # gdc rewiring branch adds diffusion params
        base5 = Config(dataset="Citeseer", block="attention", rewiring="gdc")
        s5 = set_search_space(base5)
        assert "gdc_method" in s5 and "ppr_alpha" in s5

    def test_warm_resume_matches_fresh_run(self):
        """A 4-epoch fit resumed to 8 epochs takes the same steps as a fresh
        8-epoch fit (ASHA rung resume, ray_tune.py:128-134)."""
        import jax
        from graph_neural_pde_tpu.models.gnn import GNNModel
        from graph_neural_pde_tpu.training.train import Trainer
        ds = make_sbm_dataset(num_nodes=50, num_classes=3, num_features=8,
                              seed=31)
        cfg = Config(hidden_dim=8, method="rk4", step_size=0.5, time=1.0,
                     input_dropout=0.0, dropout=0.0, lr=0.05,
                     block="constant", function="laplacian")
        model = GNNModel(cfg, ds.num_features, ds.num_classes, ds.graph)
        tr = Trainer(model)
        p_fresh, *_ = tr.fit(ds, epochs=8, seed=3, verbose=False)
        _, _, _, _, carry = tr.fit(ds, epochs=4, seed=3, verbose=False,
                                   return_carry=True)
        p_res, *_ = tr.fit(ds, epochs=8, seed=3, verbose=False, carry=carry)
        for a, b in zip(jax.tree_util.tree_leaves(p_fresh),
                        jax.tree_util.tree_leaves(p_res)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-7)

    def test_sweep_rungs_resume_not_retrain(self):
        """run_sweep rung 2 continues from rung 1's carried epoch."""
        from graph_neural_pde_tpu.training.tuning import run_sweep
        ds = make_sbm_dataset(num_nodes=50, num_classes=3, num_features=8,
                              seed=32)
        base = Config(dataset="synthetic", hidden_dim=8, method="rk4",
                      step_size=0.5, time=1.0, input_dropout=0.0, dropout=0.0,
                      block="constant", function="laplacian")
        trials = run_sweep(base, ds, num_samples=2, max_epochs=6,
                           grace_period=3, reduction_factor=2, seed=0,
                           verbose=False)
        winner = trials[0]
        assert winner.epochs_run == 6
        # the carried state records the cumulative epoch, not a fresh run
        assert winner.carries[0]["epoch"] == 6


class TestCheckpoint:
    def test_roundtrip(self, tmp_path):
        tree = {"a": jnp.arange(5.0), "b": {"c": jnp.ones((2, 3))}}
        p = str(tmp_path / "ck.npz")
        save_checkpoint(p, tree, metadata={"val_acc": 0.9})
        restored, meta = load_checkpoint(p, tree)
        np.testing.assert_allclose(np.asarray(restored["b"]["c"]),
                                   np.ones((2, 3)))
        assert meta["val_acc"] == 0.9


class TestStats:
    def test_ci_matches_reference_formula(self):
        import scipy.stats
        data = [0.8, 0.82, 0.79, 0.85]
        h = mean_confidence_interval(data)
        se = scipy.stats.sem(np.array(data))
        want = se * scipy.stats.t.ppf(0.975, 3)
        assert h == pytest.approx(want)

    def test_aggregate(self):
        out = aggregate_runs([1.0, 2.0, 3.0])
        assert out["mean"] == 2.0 and out["n"] == 3

    def test_trial_with_early_stop_selection(self, tmp_path):
        """train_ray_int semantics: trials with no_early=False report the
        in-integrator best-val snapshot."""
        from graph_neural_pde_tpu.training.tuning import _run_trial
        ds = make_sbm_dataset(num_nodes=60, num_classes=3, num_features=8,
                              seed=25)
        cfg = Config(dataset="Cora", hidden_dim=8, attention_dim=8, heads=2,
                     method="rk4", step_size=0.5, time=1.0, no_early=False,
                     max_test_steps=8, earlystopxT=2.0, input_dropout=0.0,
                     dropout=0.0, lr=0.05, block="attention",
                     function="laplacian", max_nfe=2000)
        m = _run_trial(cfg, ds, epochs=5, num_splits=1, seed=0,
                       checkpoint_dir=None, trial_idx=0)
        assert 0.0 <= m["accuracy"] <= 1.0


class TestCheckpointRoundtrip:
    def test_path_without_extension(self, tmp_path):
        """save('ckpt') / load('ckpt') agree despite np.savez appending .npz
        (ADVICE round 1)."""
        import jax.numpy as jnp
        from graph_neural_pde_tpu.utils.checkpoint import (load_checkpoint,
                                                           save_checkpoint)
        tree = {"a": jnp.arange(3.0), "b": {"c": jnp.ones((2, 2))}}
        p = str(tmp_path / "ckpt")
        save_checkpoint(p, tree, metadata={"epoch": 3})
        got, meta = load_checkpoint(p, tree)
        assert meta == {"epoch": 3}
        np.testing.assert_allclose(np.asarray(got["b"]["c"]), 1.0)

    def test_treedef_mismatch_raises(self, tmp_path):
        import jax.numpy as jnp
        import pytest
        from graph_neural_pde_tpu.utils.checkpoint import (load_checkpoint,
                                                           save_checkpoint)
        tree = {"a": jnp.arange(3.0), "b": jnp.arange(3.0)}
        p = str(tmp_path / "ck.npz")
        save_checkpoint(p, tree)
        other = {"x": jnp.zeros(3), "y": jnp.zeros(3)}   # same leaf shapes
        with pytest.raises(ValueError, match="treedef mismatch"):
            load_checkpoint(p, other)
