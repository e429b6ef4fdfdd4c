"""Early-stop integrator tests (mirrors /root/reference/test/test_early_stop.py).

Both dopri5 and rk4 variants must populate the best-val snapshot with a
plausible diffusion time, and the snapshot's val accuracy must be at least
that of the plain endpoint evaluation (it maximises over step times).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graph_neural_pde_tpu.config import Config
from graph_neural_pde_tpu.data.synthetic import make_sbm_dataset
from graph_neural_pde_tpu.models.gnn_early import GNNEarlyModel
from graph_neural_pde_tpu.solvers.api import SolverOptions
from graph_neural_pde_tpu.solvers.early_stop import odeint_early_stop
from graph_neural_pde_tpu.training.train import Trainer, accuracy


@pytest.fixture(scope="module")
def dataset():
    return make_sbm_dataset(num_nodes=90, num_classes=3, num_features=10,
                            seed=2)


def cfg_for(method, **kw):
    base = dict(hidden_dim=12, attention_dim=12, heads=3, method=method,
                step_size=0.5, time=2.0, input_dropout=0.0, dropout=0.0,
                max_nfe=5000, epoch=12, lr=0.05, tol_scale=100.0,
                earlystopxT=3.0, max_test_steps=50, no_early=False,
                block="attention", function="laplacian", add_source=True)
    base.update(kw)
    return Config(**base)


class TestSolverLevel:
    def test_tracks_best_over_linear_decay(self):
        """y' = -y from y0>0: a synthetic evaluate that peaks at t≈1 must be
        found by the per-step tracker."""
        a = jnp.asarray(np.diag([-1.0, -1.0]).astype(np.float32))
        y0 = jnp.ones((3, 2))

        def func(p, t, y):
            return y @ p.T

        def evaluate(y):
            # proxy "accuracy" peaked where mean(y) ≈ exp(-1)
            m = jnp.mean(y)
            score = 1.0 - jnp.abs(m - float(np.exp(-1.0)))
            return score, score, score

        opts = SolverOptions(method="dopri5", rtol=1e-6, atol=1e-7,
                             max_steps=500)
        yT, best, stats = odeint_early_stop(func, a, y0, 0.0, 4.0, opts,
                                            evaluate, max_test_steps=100)
        assert 0.3 < float(best.time) < 2.5
        assert float(best.val) > 0.95
        assert int(stats["accepted"]) > 0

    def test_max_test_steps_bounds(self):
        a = jnp.asarray(np.eye(2, dtype=np.float32) * -1)
        y0 = jnp.ones((2, 2))
        opts = SolverOptions(method="dopri5", rtol=1e-12, atol=1e-13,
                             max_steps=10000)
        _, _, stats = odeint_early_stop(
            lambda p, t, y: y @ p.T, a, y0, 0.0, 100.0, opts,
            lambda y: (jnp.zeros(()),) * 3, max_test_steps=7)
        assert int(stats["accepted"]) + int(stats["rejected"]) <= 7
        assert bool(stats["hit_max_steps"])


class TestModelLevel:
    @pytest.mark.parametrize("method", ["dopri5", "rk4"])
    def test_best_snapshot_populated(self, dataset, method):
        cfg = cfg_for(method)
        model = GNNEarlyModel(cfg, dataset.num_features, dataset.num_classes,
                              dataset.graph)
        trainer = Trainer(model)
        params, state, _, _ = trainer.fit(dataset, epochs=10, verbose=False)
        logits, best, stats = model.apply_early(
            params, state, dataset.x, dataset.y,
            (dataset.train_mask, dataset.val_mask, dataset.test_mask))
        assert logits.shape == (90, 3)
        assert float(best.val) > 0.4
        assert 0.0 < float(best.time) <= cfg.earlystopxT * cfg.time + 1e-5
        # the per-step maximum dominates the plain endpoint evaluation at T
        (tr, va, te), _, _ = trainer._eval_step(
            params, state, dataset.x, None, dataset.y,
            (dataset.train_mask, dataset.val_mask, dataset.test_mask))
        assert float(best.val) >= float(va) - 1e-6
