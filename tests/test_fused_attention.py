"""Fused attention-aggregation RHS must match the exact normalised path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graph_neural_pde_tpu.config import Config
from graph_neural_pde_tpu.models.blocks import prepare_graph
from graph_neural_pde_tpu.models.functions import FuncAux, init_func_params, make_rhs
from graph_neural_pde_tpu.ops.graph import make_graph


def setup(att_type, square_plus, seed=0):
    rng = np.random.default_rng(seed)
    n, e, d = 30, 120, 12
    row = rng.integers(0, n, e).astype(np.int32)
    col = rng.integers(0, n, e).astype(np.int32)
    g0 = make_graph(row, col, None, num_nodes=n, capacity=160)
    cfg = Config(function="transformer", block="constant", hidden_dim=d,
                 attention_dim=d, heads=3, attention_type=att_type,
                 square_plus=square_plus, attention_norm_idx=0,
                 self_loop_weight=1.0, add_source=True)
    g = prepare_graph(cfg, g0)
    x = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    params = init_func_params(jax.random.PRNGKey(seed), cfg, d)
    # non-trivial weights so scores differ across edges
    params["att"]["Q"]["w"] = 0.3 * jax.random.normal(jax.random.PRNGKey(1),
                                                      params["att"]["Q"]["w"].shape)
    params["att"]["K"]["w"] = 0.3 * jax.random.normal(jax.random.PRNGKey(2),
                                                      params["att"]["K"]["w"].shape)
    aux = FuncAux(attention=None, x0=x, edge_weight=g.weight)
    return cfg, g, x, params, aux


class TestFusedEquivalence:
    @pytest.mark.parametrize("att_type,square_plus", [
        ("scaled_dot", True), ("scaled_dot", False),
        ("cosine_sim", False), ("exp_kernel", False), ("pearson", True),
    ])
    def test_matches_exact_path(self, att_type, square_plus):
        cfg, g, x, params, aux = setup(att_type, square_plus)
        rhs_fused = make_rhs(cfg.replace(fused_attention_agg=True), g)
        rhs_exact = make_rhs(cfg.replace(fused_attention_agg=False), g)
        f1 = np.asarray(rhs_fused(params, aux, 0.0, x))
        f2 = np.asarray(rhs_exact(params, aux, 0.0, x))
        np.testing.assert_allclose(f1, f2, rtol=2e-4, atol=2e-5)

    def test_norm_idx1_falls_back(self):
        cfg, g, x, params, aux = setup("scaled_dot", False)
        cfg1 = cfg.replace(attention_norm_idx=1, fused_attention_agg=True)
        cfg2 = cfg.replace(attention_norm_idx=1, fused_attention_agg=False)
        f1 = np.asarray(make_rhs(cfg1, g)(params, aux, 0.0, x))
        f2 = np.asarray(make_rhs(cfg2, g)(params, aux, 0.0, x))
        np.testing.assert_allclose(f1, f2, rtol=1e-6)

    def test_gradients_match(self):
        cfg, g, x, params, aux = setup("scaled_dot", True)
        def loss(p, fused):
            rhs = make_rhs(cfg.replace(fused_attention_agg=fused), g)
            return jnp.sum(rhs(p, aux, 0.0, x) ** 2)
        g1 = jax.grad(lambda p: loss(p, True))(params)
        g2 = jax.grad(lambda p: loss(p, False))(params)
        for k in ("alpha_train", "beta_train"):
            np.testing.assert_allclose(np.asarray(g1[k]), np.asarray(g2[k]),
                                       rtol=1e-3, atol=1e-6)
        np.testing.assert_allclose(np.asarray(g1["att"]["Q"]["w"]),
                                   np.asarray(g2["att"]["Q"]["w"]),
                                   rtol=1e-3, atol=1e-6)

    def test_sorted_graph_invariance(self):
        """prepare_graph's row sort must not change spmm results."""
        from graph_neural_pde_tpu.ops.spmm import spmm
        rng = np.random.default_rng(3)
        n, e = 20, 60
        g = make_graph(rng.integers(0, n, e).astype(np.int32),
                       rng.integers(0, n, e).astype(np.int32),
                       rng.random(e).astype(np.float32), num_nodes=n,
                       capacity=80)
        x = jnp.asarray(rng.normal(size=(n, 5)).astype(np.float32))
        np.testing.assert_allclose(np.asarray(spmm(g, x)),
                                   np.asarray(spmm(g.sort_by_row(), x)),
                                   rtol=1e-5, atol=1e-6)


class TestGATFused:
    def test_gat_fused_matches_exact(self):
        rng = np.random.default_rng(7)
        n, e, d = 30, 120, 12
        g0 = make_graph(rng.integers(0, n, e).astype(np.int32),
                        rng.integers(0, n, e).astype(np.int32), None,
                        num_nodes=n, capacity=160)
        cfg = Config(function="GAT", block="constant", hidden_dim=d,
                     attention_dim=d, heads=3, attention_norm_idx=0,
                     self_loop_weight=1.0, add_source=True,
                     leaky_relu_slope=0.2)
        from graph_neural_pde_tpu.models.blocks import prepare_graph
        g = prepare_graph(cfg, g0)
        x = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
        params = init_func_params(jax.random.PRNGKey(1), cfg, d)
        aux = FuncAux(attention=None, x0=x, edge_weight=g.weight)
        f1 = np.asarray(make_rhs(cfg.replace(fused_attention_agg=True), g)(
            params, aux, 0.0, x))
        f2 = np.asarray(make_rhs(cfg.replace(fused_attention_agg=False), g)(
            params, aux, 0.0, x))
        np.testing.assert_allclose(f1, f2, rtol=2e-4, atol=2e-5)

    def test_gat_fused_gradients(self):
        rng = np.random.default_rng(8)
        n, e, d = 20, 60, 8
        g0 = make_graph(rng.integers(0, n, e).astype(np.int32),
                        rng.integers(0, n, e).astype(np.int32), None,
                        num_nodes=n, capacity=64)
        cfg = Config(function="GAT", block="constant", hidden_dim=d,
                     attention_dim=d, heads=2, attention_norm_idx=0,
                     self_loop_weight=1.0)
        from graph_neural_pde_tpu.models.blocks import prepare_graph
        g = prepare_graph(cfg, g0)
        x = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
        params = init_func_params(jax.random.PRNGKey(2), cfg, d)
        aux = FuncAux(attention=None, x0=x, edge_weight=g.weight)

        def loss(p, fused):
            rhs = make_rhs(cfg.replace(fused_attention_agg=fused), g)
            return jnp.sum(rhs(p, aux, 0.0, x) ** 2)

        g1 = jax.grad(lambda p: loss(p, True))(params)
        g2 = jax.grad(lambda p: loss(p, False))(params)
        np.testing.assert_allclose(np.asarray(g1["att"]["W"]),
                                   np.asarray(g2["att"]["W"]),
                                   rtol=1e-3, atol=1e-5)
        np.testing.assert_allclose(np.asarray(g1["att"]["a"]),
                                   np.asarray(g2["att"]["a"]),
                                   rtol=1e-3, atol=1e-5)


class TestStripeEngine:
    def _model_pair(self, function, seed=31):
        from graph_neural_pde_tpu.data.synthetic import make_sbm_dataset
        from graph_neural_pde_tpu.models.gnn import GNNModel
        ds = make_sbm_dataset(num_nodes=90, num_classes=3, num_features=10,
                              seed=seed)
        base = dict(hidden_dim=12, attention_dim=12, heads=3, method="rk4",
                    step_size=0.5, time=1.5, input_dropout=0.0, dropout=0.0,
                    block="constant", function=function, add_source=True,
                    attention_norm_idx=0, spmm_block_n=128, spmm_chunk=128)
        m0 = GNNModel(Config(**base, stripe_fused=False), ds.num_features,
                      ds.num_classes, ds.graph)
        m1 = GNNModel(Config(**base, stripe_fused=True), ds.num_features,
                      ds.num_classes, ds.graph)
        return ds, m0, m1

    @pytest.mark.parametrize("function", ["transformer", "GAT"])
    def test_forward_matches(self, function):
        ds, m0, m1 = self._model_pair(function)
        assert m1.stripe_plan is not None
        params, state = m0.init(jax.random.PRNGKey(0))
        lo0, _, _, _ = m0.apply(params, state, ds.x, training=False)
        lo1, _, _, _ = m1.apply(params, state, ds.x, training=False)
        # stripe kernels run in bf16 on the MXU; f32 reference within bf16 tol
        np.testing.assert_allclose(np.asarray(lo1), np.asarray(lo0),
                                   rtol=3e-2, atol=3e-3)

    def test_training_step_runs(self):
        from graph_neural_pde_tpu.training.train import Trainer
        ds, _, m1 = self._model_pair("transformer")
        trainer = Trainer(m1)
        _, _, best, logs = trainer.fit(ds, epochs=5, verbose=False)
        assert np.isfinite(logs[-1].loss)

    def test_stripe_gradients_match_xla(self):
        """Gradients through the stripe kernels == XLA fused gradients."""
        ds, m0, m1 = self._model_pair("transformer", seed=33)
        params, state = m0.init(jax.random.PRNGKey(0))

        def loss(model, p):
            lo, _, _, _ = model.apply(p, state, ds.x, training=False)
            return jnp.sum(lo ** 2)

        g0 = jax.grad(lambda p: loss(m0, p))(params)
        g1 = jax.grad(lambda p: loss(m1, p))(params)
        for k in ("m1", "m2"):
            np.testing.assert_allclose(np.asarray(g1[k]["w"]),
                                       np.asarray(g0[k]["w"]),
                                       rtol=5e-2, atol=5e-3)
        np.testing.assert_allclose(
            np.asarray(g1["block"]["func"]["att"]["Q"]["w"]),
            np.asarray(g0["block"]["func"]["att"]["Q"]["w"]),
            rtol=5e-2, atol=5e-3)


class TestUnderflowGuard:
    def test_widely_spread_scores_poison_then_exact_recovers(self):
        """Scores spread >88 apart in f32: the global-max substitution alone
        would zero whole segments. The fast path must POISON its output with
        NaN (elementwise select — a lax.cond inside the solver loop measured
        151 vs 11 ms/eval on v5e), and make_rhs(exact_softmax=True) — the
        re-solve path block_forward dispatches to — must recover the exact
        per-segment softmax (ADVICE round 1)."""
        from graph_neural_pde_tpu.models.functions import rhs_may_poison
        cfg, g, x, params, aux = setup("scaled_dot", False, seed=7)
        # blow up Q so some segments sit ~hundreds below the global max
        params["att"]["Q"]["w"] = params["att"]["Q"]["w"] * 400.0
        cfg_f = cfg.replace(fused_attention_agg=True)
        assert rhs_may_poison(cfg_f)
        rhs_fused = make_rhs(cfg_f, g)
        rhs_fallback = make_rhs(cfg_f, g, exact_softmax=True)
        rhs_exact = make_rhs(cfg.replace(fused_attention_agg=False), g)
        f1 = np.asarray(jax.jit(rhs_fused)(params, aux, 0.0, x))
        assert np.isnan(f1).all(), "underflow must poison the fast path"
        f_fb = np.asarray(jax.jit(rhs_fallback)(params, aux, 0.0, x))
        f2 = np.asarray(rhs_exact(params, aux, 0.0, x))
        assert np.isfinite(f_fb).all()
        np.testing.assert_allclose(f_fb, f2, rtol=2e-3, atol=2e-4)

    def test_block_forward_resolves_poisoned_solve(self):
        """End to end: a solve whose fast RHS underflows must come back
        finite (and equal to the never-fused solve) through block_forward's
        one-shot exact re-solve."""
        from graph_neural_pde_tpu.models.blocks import block_forward
        cfg, g, x, params, aux = setup("scaled_dot", False, seed=7)
        bparams = {"func": params}
        bparams["func"]["att"]["Q"]["w"] = bparams["func"]["att"]["Q"]["w"] * 400.0
        cfg_fast = cfg.replace(fused_attention_agg=True, block="constant",
                               method="euler", step_size=0.5, time=1.0)
        cfg_exact = cfg_fast.replace(fused_attention_agg=False)
        z1, stats1, _ = jax.jit(
            lambda p, y: block_forward(p, cfg_fast, g, y, False))(bparams, x)
        z2, _, _ = block_forward(bparams, cfg_exact, g, x, False)
        z1, z2 = np.asarray(z1), np.asarray(z2)
        assert np.isfinite(z1).all(), "block_forward must resolve the poison"
        np.testing.assert_allclose(z1, z2, rtol=2e-3, atol=2e-4)

    def test_guard_scores_actually_underflow(self):
        """Sanity: the fixture really triggers the underflow branch."""
        import jax.numpy as jnp
        from graph_neural_pde_tpu.models.attention import _scores
        from graph_neural_pde_tpu.models.layers import linear_apply
        cfg, g, x, params, aux = setup("scaled_dot", False, seed=7)
        params["att"]["Q"]["w"] = params["att"]["Q"]["w"] * 400.0
        q = linear_apply(params["att"]["Q"], x)
        k = linear_apply(params["att"]["K"], x)
        h, dk = cfg.heads, cfg.attention_dim // cfg.heads
        src = q[g.row].reshape(-1, h, dk)
        dst = k[g.col].reshape(-1, h, dk)
        prods = np.asarray(_scores(cfg, src, dst, dk, params["att"]))
        m = np.asarray(g.mask)
        spread = prods[m].max() - prods[m].min()
        assert spread > 200.0, spread


class TestDualStripeKernels:
    def _plan_and_data(self, seed=0, n=40, e=150, d=16, hp=8):
        from graph_neural_pde_tpu.ops.pallas.stripe import build_stripe_plan
        rng = np.random.default_rng(seed)
        row = np.sort(rng.integers(0, n, e).astype(np.int32))
        plan = build_stripe_plan(row, num_nodes=n, block_n=8, chunk=16)
        vals = rng.normal(size=(plan.capacity, d)).astype(np.float32)
        u = np.abs(rng.normal(size=(plan.capacity, hp))).astype(np.float32)
        vals[~plan.valid] = 0.0
        u[~plan.valid] = 0.0
        return plan, jnp.asarray(vals), jnp.asarray(u), row

    def test_scatter2_matches_segment_sum(self):
        from graph_neural_pde_tpu.ops.pallas.stripe import stripe_scatter_add2
        plan, vals, u, row = self._plan_and_data()
        num, den = stripe_scatter_add2(plan, vals, u)
        # oracle: dense segment sums over the plan's slot rows
        rows_of_slot = np.zeros(plan.capacity, np.int64)
        # reconstruct slot rows from block id + local id
        nb = plan.num_nodes // plan.block_n
        for ci in range(plan.n_chunks):
            s = ci * plan.chunk
            rows_of_slot[s:s + plan.chunk] = (plan.chunk_rows[ci]
                                              * plan.block_n
                                              + plan.row_local[s:s + plan.chunk])
        want_num = np.zeros((plan.num_nodes, vals.shape[1]))
        want_den = np.zeros((plan.num_nodes, u.shape[1]))
        np.add.at(want_num, rows_of_slot[plan.valid],
                  np.asarray(vals)[plan.valid])
        np.add.at(want_den, rows_of_slot[plan.valid],
                  np.asarray(u)[plan.valid])
        np.testing.assert_allclose(np.asarray(num), want_num, rtol=2e-2,
                                   atol=2e-2)
        np.testing.assert_allclose(np.asarray(den), want_den, rtol=2e-2,
                                   atol=2e-2)

    def test_weighted_scatter_matches_and_grads(self):
        """stripe_scatter_add_weighted == segment-sum of w·vals, and its VJP
        matches jax.grad of the unfused formulation."""
        from graph_neural_pde_tpu.ops.pallas.stripe import (
            stripe_scatter_add, stripe_scatter_add_weighted)
        plan, vals, u, row = self._plan_and_data()
        rng = np.random.default_rng(3)
        w = rng.normal(size=(plan.capacity,)).astype(np.float32)
        w[~plan.valid] = 0.0
        w = jnp.asarray(w)
        got = stripe_scatter_add_weighted(plan, w, vals)
        want = stripe_scatter_add(plan, vals * w[:, None])
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-2, atol=2e-2)

        ct = jnp.asarray(rng.normal(size=got.shape).astype(np.float32))

        def loss_fused(w, vals):
            return jnp.sum(stripe_scatter_add_weighted(plan, w, vals) * ct)

        def loss_ref(w, vals):
            return jnp.sum(stripe_scatter_add(plan, vals * w[:, None]) * ct)

        dw1, dv1 = jax.grad(loss_fused, argnums=(0, 1))(w, vals)
        dw2, dv2 = jax.grad(loss_ref, argnums=(0, 1))(w, vals)
        m = plan.valid
        np.testing.assert_allclose(np.asarray(dw1)[m], np.asarray(dw2)[m],
                                   rtol=5e-2, atol=5e-2)
        np.testing.assert_allclose(np.asarray(dv1)[m], np.asarray(dv2)[m],
                                   rtol=5e-2, atol=5e-2)

    def test_scatter2_gather2_vjp_duality(self):
        """grad of sum(num*A)+sum(den*B) == gather2(A, B) on valid slots."""
        from graph_neural_pde_tpu.ops.pallas.stripe import (
            stripe_scatter_add2, stripe_gather2)
        plan, vals, u, _ = self._plan_and_data(seed=1)
        A = jnp.asarray(np.random.default_rng(2).normal(
            size=(plan.num_nodes, vals.shape[1])).astype(np.float32))
        B = jnp.asarray(np.random.default_rng(3).normal(
            size=(plan.num_nodes, u.shape[1])).astype(np.float32))

        def f(v, uu):
            num, den = stripe_scatter_add2(plan, v, uu)
            return jnp.sum(num * A) + jnp.sum(den * B)

        dv, du = jax.grad(f, argnums=(0, 1))(vals, u)
        ga, gb = stripe_gather2(plan, A, B)
        m = np.asarray(plan.valid)
        np.testing.assert_allclose(np.asarray(dv)[m], np.asarray(ga)[m],
                                   rtol=2e-2, atol=2e-2)
        np.testing.assert_allclose(np.asarray(du)[m], np.asarray(gb)[m],
                                   rtol=2e-2, atol=2e-2)
        assert (np.asarray(dv)[~m] == 0).all()


class TestBf16Payload:
    def test_bf16_engine_close_to_f32(self):
        cfg, g, x, params, aux = setup("scaled_dot", False)
        rhs_32 = make_rhs(cfg, g)
        rhs_16 = make_rhs(cfg.replace(rhs_payload_dtype="bfloat16"), g)
        f32 = np.asarray(rhs_32(params, aux, 0.0, x))
        f16 = np.asarray(rhs_16(params, aux, 0.0, x))
        scale = np.abs(f32).max() + 1e-9
        assert np.abs(f16 - f32).max() / scale < 0.03


class TestBf16State:
    def test_bf16_fixed_step_close_to_f32(self):
        """cfg.dtype='bfloat16' + rk4: solve in bf16 state tracks f32."""
        import jax
        from graph_neural_pde_tpu.models.blocks import (block_forward,
                                                        init_block,
                                                        prepare_graph)
        rng = np.random.default_rng(0)
        n, e, d = 40, 160, 16
        g0 = make_graph(rng.integers(0, n, e).astype(np.int32),
                        rng.integers(0, n, e).astype(np.int32), None,
                        num_nodes=n)
        cfg = Config(function="transformer", block="constant", hidden_dim=d,
                     attention_dim=d, heads=2, method="rk4", step_size=0.5,
                     time=2.0, self_loop_weight=1.0)
        g = prepare_graph(cfg, g0)
        bp = init_block(jax.random.PRNGKey(0), cfg, d)
        x = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
        z32, s32, _ = block_forward(bp, cfg, g, x, training=False)
        cfg16 = cfg.replace(dtype="bfloat16")
        z16, s16, _ = block_forward(bp, cfg16, g, x, training=False)
        assert z16.dtype == jnp.float32          # cast back after the solve
        assert int(s16["nfe"]) == int(s32["nfe"])
        scale = float(jnp.abs(z32).max()) + 1e-9
        assert float(jnp.abs(z16 - z32).max()) / scale < 0.05

    def test_bf16_ignored_for_adaptive(self):
        import jax
        from graph_neural_pde_tpu.models.blocks import (block_forward,
                                                        init_block,
                                                        prepare_graph)
        rng = np.random.default_rng(1)
        n, e, d = 30, 100, 8
        g0 = make_graph(rng.integers(0, n, e).astype(np.int32),
                        rng.integers(0, n, e).astype(np.int32), None,
                        num_nodes=n)
        cfg = Config(function="laplacian", block="constant", hidden_dim=d,
                     method="dopri5", time=1.0, tol_scale=100.0,
                     dtype="bfloat16", self_loop_weight=1.0)
        g = prepare_graph(cfg, g0)
        bp = init_block(jax.random.PRNGKey(0), cfg, d)
        x = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
        z, _, _ = block_forward(bp, cfg, g, x, training=False)
        assert z.dtype == jnp.float32


class TestMegaKernelGradients:
    def _setup(self, square_plus=False):
        cfg, g, x, params, aux = setup("scaled_dot", square_plus)
        cfg = cfg.replace(stripe_fused=True, stripe_block_n=8,
                          stripe_chunk=16)
        from graph_neural_pde_tpu.models.blocks import build_stripe_engine
        g2 = g.sort_by_row()
        g3, plan = build_stripe_engine(cfg, g2)
        assert plan is not None
        return cfg, g3, plan, x, params, aux

    def test_forward_matches_composition(self):
        cfg, g3, plan, x, params, aux = self._setup()
        aux = aux._replace(edge_weight=g3.weight)
        rhs_mega = make_rhs(cfg, g3, stripe_plan=plan)
        rhs_ref = make_rhs(cfg.replace(stripe_fused=False), g3)
        n = g3.num_nodes
        xp = jnp.pad(x, ((0, n - x.shape[0]), (0, 0)))
        aux = aux._replace(x0=xp)
        f1 = np.asarray(rhs_mega(params, aux, 0.0, xp))
        f2 = np.asarray(rhs_ref(params, aux, 0.0, xp))
        scale = np.abs(f2).max() + 1e-9
        assert np.abs(f1 - f2).max() / scale < 3e-2   # bf16 MXU internals

    def test_gradients_match_composition(self):
        """Hand-derived VJP of the fused kernel vs autodiff of the exact
        composition, for params AND state."""
        cfg, g3, plan, x, params, aux = self._setup()
        aux = aux._replace(edge_weight=g3.weight)
        rhs_mega = make_rhs(cfg, g3, stripe_plan=plan)
        rhs_ref = make_rhs(cfg.replace(stripe_fused=False), g3)
        n = g3.num_nodes
        xp = jnp.pad(x, ((0, n - x.shape[0]), (0, 0)))
        ct = jnp.asarray(np.random.default_rng(4).normal(
            size=(n, x.shape[1])).astype(np.float32))

        aux = aux._replace(x0=xp)

        def loss(rhs):
            def f(p, xx):
                return jnp.sum(rhs(p, aux, 0.0, xx) * ct)
            return jax.grad(f, argnums=(0, 1))(params, xp)

        gm, gr = loss(rhs_mega), loss(rhs_ref)
        # normalise by the GLOBAL gradient scale: K.b's true gradient is
        # analytically zero (its per-segment-constant score term cancels
        # under softmax normalisation), so per-leaf relative error there is
        # bf16 cancellation noise around zero
        gscale = max(np.abs(np.asarray(l)).max()
                     for l in jax.tree_util.tree_leaves(gr)) + 1e-9
        for a, b in zip(jax.tree_util.tree_leaves(gm),
                        jax.tree_util.tree_leaves(gr)):
            assert (np.abs(np.asarray(a) - np.asarray(b)).max() / gscale
                    < 5e-2)

    def test_adaptive_solve_with_mega_engine(self):
        """dopri5 discrete adjoint through the fused kernel RHS."""
        import jax
        from graph_neural_pde_tpu.models.blocks import (block_forward,
                                                        init_block,
                                                        prepare_graph)
        rng = np.random.default_rng(2)
        n, e, d = 30, 100, 8
        g0 = make_graph(rng.integers(0, n, e).astype(np.int32),
                        rng.integers(0, n, e).astype(np.int32), None,
                        num_nodes=n)
        cfg = Config(function="transformer", block="constant", hidden_dim=d,
                     attention_dim=8, heads=2, method="dopri5", time=0.5,
                     tol_scale=100.0, stripe_fused=True, stripe_block_n=8,
                     stripe_chunk=16, self_loop_weight=1.0)
        g = prepare_graph(cfg, g0)
        from graph_neural_pde_tpu.models.blocks import build_stripe_engine
        g, plan = build_stripe_engine(cfg, g)
        assert plan is not None
        bp = init_block(jax.random.PRNGKey(0), cfg, d)
        x = jnp.asarray(rng.normal(
            size=(g.num_nodes, d)).astype(np.float32))

        def loss(bp):
            z, stats, _ = block_forward(bp, cfg, g, x, training=True,
                                        stripe_plan=plan)
            return jnp.sum(z ** 2)

        val, grads = jax.value_and_grad(loss)(bp)
        assert np.isfinite(float(val))
        flat = jax.tree_util.tree_leaves(grads)
        assert all(np.isfinite(np.asarray(l)).all() for l in flat)
        assert any(np.abs(np.asarray(l)).max() > 0 for l in flat)

    def test_overflow_poisons_and_exact_mode_recovers(self):
        """Scores beyond f32's exp range: the mega path (which runs exp
        unshifted — no max pass) must poison its output with NaN, and the
        exact_softmax re-solve mode must recover the exact per-segment
        softmax."""
        cfg, g3, plan, x, params, aux = self._setup()
        params = dict(params)
        params["att"] = dict(params["att"])
        params["att"]["Q"] = {k: v * 40.0 for k, v in
                              params["att"]["Q"].items()}
        n = g3.num_nodes
        xp = jnp.pad(x * 3.0, ((0, n - x.shape[0]), (0, 0)))
        aux = aux._replace(edge_weight=g3.weight, x0=xp)
        rhs_mega = make_rhs(cfg, g3, stripe_plan=plan)
        rhs_fallback = make_rhs(cfg, g3, stripe_plan=plan,
                                exact_softmax=True)
        # the unfused composition path ALSO poisons on underflow now, so the
        # oracle must run in exact mode too
        rhs_ref = make_rhs(cfg.replace(stripe_fused=False), g3,
                           exact_softmax=True)
        f1 = np.asarray(jax.jit(rhs_mega)(params, aux, 0.0, xp))
        assert np.isnan(f1).all(), "overflow must poison the mega path"
        f_fb = np.asarray(jax.jit(rhs_fallback)(params, aux, 0.0, xp))
        f2 = np.asarray(rhs_ref(params, aux, 0.0, xp))
        assert np.isfinite(f_fb).all()
        scale = np.abs(f2).max() + 1e-9
        assert np.abs(f_fb - f2).max() / scale < 3e-2

    def test_bf16_state_training_grad(self):
        """bf16 ODE state + bf16 payloads + mega kernel + value_and_grad —
        the full production training configuration (cotangent dtypes must
        match the bf16 primals through every custom VJP)."""
        import jax
        from graph_neural_pde_tpu.data.synthetic import make_sbm_dataset
        from graph_neural_pde_tpu.models.gnn import GNNModel
        from graph_neural_pde_tpu.training.train import Trainer
        ds = make_sbm_dataset(num_nodes=40, num_classes=3, num_features=8,
                              seed=5)
        cfg = Config(function="transformer", block="constant", hidden_dim=8,
                     attention_dim=8, heads=2, method="rk4", step_size=0.5,
                     time=1.0, input_dropout=0.0, dropout=0.0,
                     stripe_fused=True, stripe_block_n=8, stripe_chunk=16,
                     rhs_payload_dtype="bfloat16", dtype="bfloat16",
                     self_loop_weight=1.0)
        model = GNNModel(cfg, ds.num_features, ds.num_classes, ds.graph)
        tr = Trainer(model)
        p, s = model.init(jax.random.PRNGKey(0))
        o = tr.optimizer.init(p)
        p, s, o, loss, stats = tr._train_step(
            p, s, o, ds.x, None, ds.y, ds.train_mask, jax.random.PRNGKey(1))
        assert np.isfinite(float(loss))


class TestFoldEpilogue:
    """Config.fold_epilogue: the f = alpha·(ax − x) epilogue + per-row den
    guard folded into the eval kernel's final write (fused_rhs_f). Eval
    forwards must match the unfolded engine; training gradients must be
    untouched (blocks.py gates the fold on `not training`)."""

    def _pair(self, att_type="scaled_dot", seed=41):
        from graph_neural_pde_tpu.data.synthetic import make_sbm_dataset
        from graph_neural_pde_tpu.models.gnn import GNNModel
        ds = make_sbm_dataset(num_nodes=90, num_classes=3, num_features=10,
                              seed=seed)
        base = dict(hidden_dim=12, attention_dim=12, heads=3, method="rk4",
                    step_size=0.5, time=1.5, input_dropout=0.0, dropout=0.0,
                    block="constant", function="transformer",
                    attention_type=att_type, add_source=True,
                    attention_norm_idx=0, stripe_fused=True,
                    stripe_block_n=8, stripe_chunk=16)
        m0 = GNNModel(Config(**base), ds.num_features, ds.num_classes,
                      ds.graph)
        m1 = GNNModel(Config(**base, fold_epilogue=True), ds.num_features,
                      ds.num_classes, ds.graph)
        return ds, m0, m1

    @pytest.mark.parametrize("att_type", ["scaled_dot", "cosine_sim",
                                          "pearson", "exp_kernel"])
    def test_eval_forward_matches(self, att_type):
        ds, m0, m1 = self._pair(att_type)
        assert m1.stripe_plan is not None
        params, state = m0.init(jax.random.PRNGKey(0))
        lo0, _, _, _ = m0.apply(params, state, ds.x, training=False)
        lo1, _, _, _ = m1.apply(params, state, ds.x, training=False)
        # identical kernel up to the final-write epilogue (f32 both sides)
        np.testing.assert_allclose(np.asarray(lo1), np.asarray(lo0),
                                   rtol=2e-3, atol=2e-4)

    def test_training_unaffected(self):
        """fold_epilogue=True must leave the training step (gradient path)
        running the unfolded custom-VJP engine."""
        from graph_neural_pde_tpu.training.train import Trainer
        ds, _, m1 = self._pair()
        tr = Trainer(m1)
        p, s = m1.init(jax.random.PRNGKey(0))
        o = tr.optimizer.init(p)
        p, s, o, loss, stats = tr._train_step(
            p, s, o, ds.x, None, ds.y, ds.train_mask, jax.random.PRNGKey(1))
        assert np.isfinite(float(loss))

    def test_isolated_node_stays_finite(self):
        """deg==0 rows must NOT be poisoned by the in-kernel per-row guard
        (den==0 there is structural, not underflow)."""
        from graph_neural_pde_tpu.models.blocks import prepare_graph
        from graph_neural_pde_tpu.models.functions import (
            init_func_params, make_rhs, FuncAux)
        rng = np.random.default_rng(7)
        n, e = 24, 60
        row = rng.integers(0, n - 4, e).astype(np.int32)   # last 4 isolated
        col = rng.integers(0, n - 4, e).astype(np.int32)
        g0 = make_graph(row, col, None, num_nodes=n, capacity=64)
        cfg = Config(function="transformer", block="constant", hidden_dim=8,
                     attention_dim=8, heads=2, attention_norm_idx=0,
                     input_dropout=0.0, dropout=0.0, stripe_fused=True,
                     stripe_block_n=8, stripe_chunk=16, fold_epilogue=True,
                     self_loop_weight=0.0)
        g = prepare_graph(cfg, g0)
        from graph_neural_pde_tpu.models.blocks import build_stripe_engine
        g, plan = build_stripe_engine(cfg, g)
        assert plan is not None
        key = jax.random.PRNGKey(0)
        params = init_func_params(key, cfg, 8)
        x = jnp.asarray(rng.normal(size=(n, 8)), jnp.float32)
        aux = FuncAux(attention=None, edge_weight=g.weight, x0=x)
        f_fold = make_rhs(cfg, g, stripe_plan=plan, eval_fold=True)(
            params, aux, 0.0, x)
        f_ref = make_rhs(cfg, g, stripe_plan=plan)(params, aux, 0.0, x)
        assert np.isfinite(np.asarray(f_fold)).all()
        np.testing.assert_allclose(np.asarray(f_fold), np.asarray(f_ref),
                                   rtol=2e-3, atol=2e-4)

    def test_grad_through_eval_falls_back(self):
        """jax.grad over an eval-mode (training=False) forward with
        fold_epilogue=True must match the unfolded engine's gradients —
        the folded op's vjp falls back to the unfolded composition
        instead of erroring on the Pallas call."""
        ds, m0, m1 = self._pair()
        params, state = m0.init(jax.random.PRNGKey(0))

        def loss(model, p):
            lo, _, _, _ = model.apply(p, state, ds.x, training=False)
            return jnp.sum(lo ** 2)

        g0 = jax.grad(lambda p: loss(m0, p))(params)
        g1 = jax.grad(lambda p: loss(m1, p))(params)
        # m0 rides the col-plan backward (bf16 packed tables), the fold
        # fallback rides fused_rhs_ax's stripe backward — same math,
        # different kernels; engine-comparison tolerance as elsewhere
        np.testing.assert_allclose(
            np.asarray(g1["block"]["func"]["att"]["Q"]["w"]),
            np.asarray(g0["block"]["func"]["att"]["Q"]["w"]),
            rtol=5e-2, atol=2e-3)
        np.testing.assert_allclose(
            np.asarray(g1["block"]["func"]["alpha_train"]),
            np.asarray(g0["block"]["func"]["alpha_train"]),
            rtol=5e-2, atol=2e-3)
