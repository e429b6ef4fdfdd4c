"""Multi-chip sharding tests on the 8-device virtual CPU mesh.

Validates the edge-sharded design: the full training step jits and executes
over a jax.sharding.Mesh with the padded edge arrays split across devices
and node states/params replicated, and produces the same numbers as the
single-device run.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graph_neural_pde_tpu.config import Config
from graph_neural_pde_tpu.data.synthetic import make_sbm_dataset
from graph_neural_pde_tpu.models.gnn import GNNModel
from graph_neural_pde_tpu.parallel.mesh import make_mesh, replicate, shard_graph
from graph_neural_pde_tpu.training.train import Trainer


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices (see conftest)")
    return make_mesh(8)


@pytest.fixture(scope="module")
def dataset():
    return make_sbm_dataset(num_nodes=64, num_classes=3, num_features=8,
                            avg_degree=6, seed=7, edge_pad_multiple=64)


class TestShardedTraining:
    def test_matches_single_device(self, mesh, dataset):
        cfg = Config(block="attention", function="laplacian", method="rk4",
                     step_size=0.5, time=1.0, hidden_dim=8, attention_dim=8,
                     heads=2, input_dropout=0.0, dropout=0.0, max_nfe=500,
                     lr=0.05)

        def one_step(graph, x, y, tm):
            model = GNNModel(cfg, dataset.num_features, dataset.num_classes,
                             graph)
            trainer = Trainer(model)
            params, state = model.init(jax.random.PRNGKey(0))
            opt_state = trainer.optimizer.init(params)
            params, state, opt_state, loss, stats = trainer._train_step(
                params, state, opt_state, x, None, y, tm,
                jax.random.PRNGKey(1))
            (tr, va, te), logits, _ = trainer._eval_step(
                params, state, x, None, y,
                (tm, dataset.val_mask, dataset.test_mask))
            return float(loss), np.asarray(logits)

        loss_1, logits_1 = one_step(dataset.graph, dataset.x, dataset.y,
                                    dataset.train_mask)

        g_sharded = shard_graph(mesh, dataset.graph)
        x = replicate(mesh, dataset.x)
        y = replicate(mesh, dataset.y)
        tm = replicate(mesh, dataset.train_mask)
        loss_8, logits_8 = one_step(g_sharded, x, y, tm)

        assert loss_1 == pytest.approx(loss_8, rel=1e-4)
        np.testing.assert_allclose(logits_1, logits_8, rtol=1e-3, atol=1e-4)

    def test_graph_actually_sharded(self, mesh, dataset):
        g = shard_graph(mesh, dataset.graph)
        shards = g.row.addressable_shards
        assert len(shards) == 8
        assert shards[0].data.shape[0] == dataset.graph.capacity // 8

    def test_adaptive_solver_sharded(self, mesh, dataset):
        cfg = Config(block="constant", function="laplacian", method="dopri5",
                     tol_scale=100.0, time=2.0, hidden_dim=8,
                     input_dropout=0.0, dropout=0.0, max_nfe=1000)
        g = shard_graph(mesh, dataset.graph)
        model = GNNModel(cfg, dataset.num_features, dataset.num_classes, g)
        params, state = model.init(jax.random.PRNGKey(0))
        logits, _, stats, _ = model.apply(
            replicate(mesh, params), replicate(mesh, state),
            replicate(mesh, dataset.x), training=False)
        assert np.isfinite(np.asarray(logits)).all()
        assert int(stats["nfe"]) > 0


class TestExplicitCollectives:
    def test_shard_map_spmm_matches(self, mesh, dataset):
        """Explicit shard_map+psum aggregation == single-device spmm."""
        import jax.numpy as jnp
        from graph_neural_pde_tpu.ops.spmm import spmm
        from graph_neural_pde_tpu.parallel.mesh import shard_graph
        from graph_neural_pde_tpu.parallel.shard_spmm import make_sharded_spmm

        g = dataset.graph
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(g.num_nodes, 16)).astype(np.float32))
        want = np.asarray(spmm(g, x))

        g_sh = shard_graph(mesh, g)
        spmm_fn = make_sharded_spmm(mesh, g_sh)
        got = np.asarray(jax.jit(spmm_fn)(x, g_sh.weight))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_shard_map_spmm_in_model(self, mesh, dataset):
        """The explicit-collective engine plugs into block_forward."""
        import jax.numpy as jnp
        from graph_neural_pde_tpu.models.blocks import (
            block_forward, init_block, prepare_graph)
        from graph_neural_pde_tpu.parallel.mesh import shard_graph
        from graph_neural_pde_tpu.parallel.shard_spmm import make_sharded_spmm

        cfg = Config(block="constant", function="laplacian", method="rk4",
                     step_size=0.5, time=1.0, hidden_dim=8,
                     self_loop_weight=1.0)
        g = prepare_graph(cfg, dataset.graph)
        g_sh = shard_graph(mesh, g)
        spmm_fn = make_sharded_spmm(mesh, g_sh)
        bparams = init_block(jax.random.PRNGKey(0), cfg, 8)
        x = jnp.ones((g.num_nodes, 8))
        z_ref, _, _ = block_forward(bparams, cfg, g, x, False)
        z_sh, _, _ = block_forward(bparams, cfg, g_sh, x, False,
                                   spmm_fn=spmm_fn)
        np.testing.assert_allclose(np.asarray(z_sh), np.asarray(z_ref),
                                   rtol=1e-4, atol=1e-5)


class TestShardedStripeSpmm:
    def test_matches_single_device(self, mesh, dataset):
        """Per-shard stripe-MXU aggregation + psum == single-device spmm."""
        from graph_neural_pde_tpu.models.blocks import prepare_graph
        from graph_neural_pde_tpu.ops.spmm import spmm
        from graph_neural_pde_tpu.parallel.shard_spmm import (
            make_sharded_stripe_spmm)

        cfg = Config(block="constant", function="laplacian",
                     self_loop_weight=1.0)
        g = prepare_graph(cfg, dataset.graph)    # row-sorted
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.normal(size=(g.num_nodes, 16)).astype(np.float32))
        want = np.asarray(spmm(g, x))

        f = make_sharded_stripe_spmm(mesh, g, block_n=8, chunk=16)
        got = np.asarray(jax.jit(f)(x, g.weight))
        np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)

    def test_gradients_flow(self, mesh, dataset):
        from graph_neural_pde_tpu.models.blocks import prepare_graph
        from graph_neural_pde_tpu.ops.spmm import spmm
        from graph_neural_pde_tpu.parallel.shard_spmm import (
            make_sharded_stripe_spmm)

        cfg = Config(block="constant", function="laplacian",
                     self_loop_weight=1.0)
        g = prepare_graph(cfg, dataset.graph)
        f = make_sharded_stripe_spmm(mesh, g, block_n=8, chunk=16)
        rng = np.random.default_rng(4)
        x = jnp.asarray(rng.normal(size=(g.num_nodes, 8)).astype(np.float32))

        gx = jax.grad(lambda xx: jnp.sum(f(xx, g.weight) ** 2))(x)
        rx = jax.grad(lambda xx: jnp.sum(spmm(g, xx) ** 2))(x)
        np.testing.assert_allclose(np.asarray(gx), np.asarray(rx),
                                   rtol=3e-2, atol=3e-2)


class TestStreamFusedRhs:
    """Ring-attention-style exact edge streaming for the GRAND-nl attention
    RHS (make_sharded_fused_rhs_stream): equality vs the AllReduce shard_map
    schedule and a direct segment-sum oracle, forward and gradients, both
    score nonlinearities, on the 8-device CPU mesh. The two schedules must
    agree to f32 roundoff — only the summation order over column blocks
    differs."""

    def _graph(self, n=67, e=400, seed=3):
        from graph_neural_pde_tpu.ops.graph import make_graph
        rng = np.random.default_rng(seed)
        return make_graph(rng.integers(0, n, e).astype(np.int32),
                          rng.integers(0, n, e).astype(np.int32), None,
                          num_nodes=n, pad_multiple=8)

    @staticmethod
    def _oracle(g, qw, qb, kw, kb, x, heads, square_plus=False):
        import math
        h = heads
        d_k = qw.shape[1] // h
        d = x.shape[1]
        q = x @ qw + qb
        x_g = x[g.col]
        k_e = x_g @ kw + kb
        s = jnp.sum(q[g.row].reshape(-1, h, d_k) * k_e.reshape(-1, h, d_k),
                    axis=-1) / math.sqrt(d_k)
        u = ((s + jnp.sqrt(s * s + 4.0)) * 0.5 if square_plus
             else jnp.exp(s))
        u = jnp.where(g.mask[:, None], u, 0.0)
        vals = (u[:, :, None] * x_g[:, None, :]).reshape(-1, h * d)
        num = jax.ops.segment_sum(vals, g.row, num_segments=g.num_nodes)
        den = jax.ops.segment_sum(u, g.row, num_segments=g.num_nodes)
        num = num.reshape(g.num_nodes, h, d)
        return jnp.mean(num / (den[:, :, None] + 1e-16), axis=1)

    def _params(self, d=8, att=8, seed=0):
        rng = np.random.default_rng(seed)
        return (jnp.asarray(rng.normal(size=(d, att)) * 0.3, jnp.float32),
                jnp.asarray(rng.normal(size=(att,)) * 0.1, jnp.float32),
                jnp.asarray(rng.normal(size=(d, att)) * 0.3, jnp.float32),
                jnp.asarray(rng.normal(size=(att,)) * 0.1, jnp.float32))

    @pytest.mark.parametrize("square_plus", [False, True])
    def test_matches_allreduce_and_oracle(self, mesh, square_plus):
        from graph_neural_pde_tpu.parallel.shard_spmm import (
            make_sharded_fused_rhs, make_sharded_fused_rhs_stream)

        g = self._graph()
        heads = 2
        qw, qb, kw, kb = self._params()
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(size=(g.num_nodes, 8)), jnp.float32)

        want = self._oracle(g, qw, qb, kw, kb, x, heads,
                            square_plus=square_plus)
        f_ar = jax.jit(make_sharded_fused_rhs(
            mesh, g, heads=heads, square_plus=square_plus))
        f_st = jax.jit(make_sharded_fused_rhs_stream(
            mesh, g, heads=heads, square_plus=square_plus))
        got_ar = f_ar(qw, qb, kw, kb, x)
        got_st = f_st(qw, qb, kw, kb, x)
        np.testing.assert_allclose(np.asarray(got_st), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(got_st), np.asarray(got_ar),
                                   rtol=1e-5, atol=1e-5)

    def test_gradients_match(self, mesh):
        from graph_neural_pde_tpu.parallel.shard_spmm import (
            make_sharded_fused_rhs_stream)

        g = self._graph(n=41, e=200, seed=5)
        heads = 2
        qw, qb, kw, kb = self._params(seed=2)
        rng = np.random.default_rng(4)
        x = jnp.asarray(rng.normal(size=(g.num_nodes, 8)), jnp.float32)
        probe = jnp.asarray(rng.normal(size=(g.num_nodes, 8)), jnp.float32)
        f_st = make_sharded_fused_rhs_stream(mesh, g, heads=heads)

        g_st = jax.jit(jax.grad(
            lambda qw_, kw_, x_: jnp.sum(f_st(qw_, qb, kw_, kb, x_) * probe),
            argnums=(0, 1, 2)))(qw, kw, x)
        g_or = jax.jit(jax.grad(
            lambda qw_, kw_, x_: jnp.sum(
                self._oracle(g, qw_, qb, kw_, kb, x_, heads) * probe),
            argnums=(0, 1, 2)))(qw, kw, x)
        for a, b in zip(g_st, g_or):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5)

    def test_chained_evals(self, mesh):
        """The schedule's reason to exist: the output lands row-sharded, so
        chained RHS evals (a fixed-grid solve) never rebuild a replicated
        [N, D] state between steps."""
        from graph_neural_pde_tpu.parallel.shard_spmm import (
            make_sharded_fused_rhs_stream)

        g = self._graph(n=32, e=150, seed=9)
        heads = 2
        qw, qb, kw, kb = self._params(seed=3)
        rng = np.random.default_rng(6)
        x = jnp.asarray(rng.normal(size=(g.num_nodes, 8)), jnp.float32)
        f_st = make_sharded_fused_rhs_stream(mesh, g, heads=heads)

        @jax.jit
        def chain(x_):
            for _ in range(3):
                x_ = x_ + 0.25 * (f_st(qw, qb, kw, kb, x_) - x_)
            return x_

        want = x
        for _ in range(3):
            want = want + 0.25 * (
                self._oracle(g, qw, qb, kw, kb, want, heads) - want)
        np.testing.assert_allclose(np.asarray(chain(x)), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)


class TestMeshCLI:
    """--mesh_devices N (run.py): the full CLI epoch loop over an edge-
    sharded graph matches the single-device run on the same cached
    stand-in dataset (same seeds, same split)."""

    def test_run_main_mesh_matches_single(self, mesh, tmp_path_factory):
        from graph_neural_pde_tpu.run import main

        data_dir = str(tmp_path_factory.mktemp("meshcli"))
        cfg = Config(dataset="Cora", planetoid_split=True, epoch=2,
                     block="attention", function="laplacian", method="rk4",
                     step_size=0.5, time=1.0, hidden_dim=8, attention_dim=8,
                     heads=2, input_dropout=0.0, dropout=0.0, no_early=True,
                     max_nfe=500)
        tr1, va1, te1 = main(cfg, data_dir=data_dir, verbose=False)
        tr8, va8, te8 = main(cfg.replace(mesh_devices=8),
                             data_dir=data_dir, verbose=False)
        # identical data/seeds; only f32 reduction order differs, so the
        # quantised accuracies should agree to well under a percent
        assert abs(tr8 - tr1) <= 0.02
        assert abs(va8 - va1) <= 0.02
        assert abs(te8 - te1) <= 0.02

    def test_mesh_devices_exceeding_visible_raises(self, mesh):
        from graph_neural_pde_tpu.run import main

        cfg = Config(dataset="Cora", planetoid_split=True, epoch=2,
                     mesh_devices=4096)
        with pytest.raises(ValueError, match="mesh_devices"):
            main(cfg, data_dir="/tmp/nodata_mesh_err", verbose=False)


class TestShardSpmmModeDispatch:
    """Config.shard_spmm_mode selects the collective schedule: the two
    modes build different programs (psum vs ppermute ring) that compute
    the same numbers, for both the matvec and the attention RHS."""

    def _graph(self, n=48, e=220, seed=11):
        from graph_neural_pde_tpu.ops.graph import make_graph
        rng = np.random.default_rng(seed)
        return make_graph(rng.integers(0, n, e).astype(np.int32),
                          rng.integers(0, n, e).astype(np.int32), None,
                          num_nodes=n, pad_multiple=8)

    def test_spmm_modes_agree(self, mesh):
        from graph_neural_pde_tpu.config import Config
        from graph_neural_pde_tpu.parallel.shard_spmm import (
            make_sharded_spmm_for)

        g = self._graph()
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(g.num_nodes, 8)), jnp.float32)
        w = jnp.asarray(rng.normal(size=(g.row.shape[0],)) ** 2, jnp.float32)
        outs = {}
        for mode in ("allreduce", "stream"):
            f = make_sharded_spmm_for(
                Config(shard_spmm_mode=mode), mesh, g)
            outs[mode] = np.asarray(jax.jit(f)(x, w))
        np.testing.assert_allclose(outs["stream"], outs["allreduce"],
                                   rtol=1e-5, atol=1e-5)

    def test_fused_rhs_modes_agree(self, mesh):
        from graph_neural_pde_tpu.config import Config
        from graph_neural_pde_tpu.parallel.shard_spmm import (
            make_sharded_fused_rhs_for)

        g = self._graph(seed=12)
        rng = np.random.default_rng(1)
        d, att, heads = 8, 8, 2
        qw = jnp.asarray(rng.normal(size=(d, att)) * 0.3, jnp.float32)
        qb = jnp.asarray(rng.normal(size=(att,)) * 0.1, jnp.float32)
        kw = jnp.asarray(rng.normal(size=(d, att)) * 0.3, jnp.float32)
        kb = jnp.asarray(rng.normal(size=(att,)) * 0.1, jnp.float32)
        x = jnp.asarray(rng.normal(size=(g.num_nodes, d)), jnp.float32)
        outs = {}
        for mode in ("allreduce", "stream"):
            f = make_sharded_fused_rhs_for(
                Config(shard_spmm_mode=mode), mesh, g, heads=heads)
            outs[mode] = np.asarray(jax.jit(f)(qw, qb, kw, kb, x))
        np.testing.assert_allclose(outs["stream"], outs["allreduce"],
                                   rtol=1e-5, atol=1e-5)

    def test_unknown_mode_raises(self, mesh):
        from graph_neural_pde_tpu.config import Config
        from graph_neural_pde_tpu.parallel.shard_spmm import (
            make_sharded_fused_rhs_for, make_sharded_spmm_for)

        g = self._graph(seed=13)
        cfg = Config(shard_spmm_mode="nope")
        with pytest.raises(ValueError, match="shard_spmm_mode"):
            make_sharded_spmm_for(cfg, mesh, g)
        with pytest.raises(ValueError, match="shard_spmm_mode"):
            make_sharded_fused_rhs_for(cfg, mesh, g, heads=2)


class TestStreamSpmm:
    """Edge-streaming ring spmm (VERDICT r4 #9, Config.shard_spmm_mode
    'stream'): equality vs the single-device oracle and the AllReduce
    shard_map path, forward and gradients, on the 8-device CPU mesh."""

    def _graph(self, n=67, e=400, seed=3):
        from graph_neural_pde_tpu.ops.graph import make_graph
        rng = np.random.default_rng(seed)
        return make_graph(rng.integers(0, n, e).astype(np.int32),
                          rng.integers(0, n, e).astype(np.int32), None,
                          num_nodes=n, pad_multiple=8)

    def test_matches_allreduce_and_oracle(self, mesh):
        from graph_neural_pde_tpu.ops.spmm import spmm
        from graph_neural_pde_tpu.parallel.shard_spmm import (
            make_sharded_spmm, make_sharded_spmm_stream)

        g = self._graph()
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(g.num_nodes, 16)), jnp.float32)
        w = jnp.asarray(rng.normal(size=(g.row.shape[0],)) ** 2, jnp.float32)
        want = spmm(g, x, weight=w)
        f_ar = jax.jit(make_sharded_spmm(mesh, g))
        f_st = jax.jit(make_sharded_spmm_stream(mesh, g))
        got_ar = f_ar(x, w)
        got_st = f_st(x, w)
        np.testing.assert_allclose(np.asarray(got_st), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(got_st), np.asarray(got_ar),
                                   rtol=1e-5, atol=1e-5)

    def test_gradients_match(self, mesh):
        from graph_neural_pde_tpu.ops.spmm import spmm
        from graph_neural_pde_tpu.parallel.shard_spmm import (
            make_sharded_spmm_stream)

        g = self._graph(n=41, e=200, seed=5)
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(size=(g.num_nodes, 8)), jnp.float32)
        w = jnp.asarray(rng.normal(size=(g.row.shape[0],)) ** 2, jnp.float32)
        probe = jnp.asarray(rng.normal(size=(g.num_nodes, 8)), jnp.float32)
        f_st = make_sharded_spmm_stream(mesh, g)

        g_st = jax.jit(jax.grad(
            lambda x_, w_: jnp.sum(f_st(x_, w_) * probe),
            argnums=(0, 1)))(x, w)
        g_or = jax.jit(jax.grad(
            lambda x_, w_: jnp.sum(spmm(g, x_, weight=w_) * probe),
            argnums=(0, 1)))(x, w)
        for a, b in zip(g_st, g_or):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-5)

    def test_chained_matvecs(self, mesh):
        """The stream path's reason to exist: chained matvecs (the cheby
        term scan / fixed-grid solve) with no replication rebuild between
        evaluations."""
        from graph_neural_pde_tpu.ops.spmm import spmm
        from graph_neural_pde_tpu.parallel.shard_spmm import (
            make_sharded_spmm_stream)

        g = self._graph(n=32, e=150, seed=9)
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.normal(size=(g.num_nodes, 8)), jnp.float32)
        w = jnp.asarray(rng.normal(size=(g.row.shape[0],)) ** 2, jnp.float32)
        f_st = make_sharded_spmm_stream(mesh, g)

        @jax.jit
        def chain(x_):
            for _ in range(3):
                x_ = f_st(x_, w) + 0.1 * x_
            return x_

        want = x
        for _ in range(3):
            want = spmm(g, want, weight=w) + 0.1 * want
        np.testing.assert_allclose(np.asarray(chain(x)), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)
