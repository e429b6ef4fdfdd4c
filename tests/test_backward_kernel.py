"""Round-3 backward engine: column-plan dx scatter + the backward mega-kernel.

The training step's dominant round-2 cost was the backward of the fused
attention RHS: an unsorted XLA scatter-add for dx[col] plus a chain of
stripe-transpose kernels. Round 3 replaces them with
  * stripe.make_col_gather — x[col] whose VJP rides a static permutation
    gather + the column-plan MXU stripe scatter, and
  * fused_rhs._bwd_kernel — one Mosaic pass for the ct gathers, score
    recompute, per-edge gradient algebra, dq scatter and dkw/dkb/dgmax
    reductions.
These tests pin both against the previous composition (the oracle,
_fused_bwd_composition) and against plain XLA autodiff.
"""

import numpy as np
import jax
import jax.flatten_util
import jax.numpy as jnp
import pytest

from graph_neural_pde_tpu.ops.pallas.stripe import (
    attach_col_plan,
    build_stripe_plan,
    make_col_gather,
)


def _small_plan(rng, n=48, e=400, block_n=8, chunk=16):
    row = np.sort(rng.integers(0, n, e).astype(np.int64))
    plan = build_stripe_plan(row, num_nodes=n, block_n=block_n, chunk=chunk)
    col = np.zeros(plan.capacity, np.int32)
    col[np.asarray(plan.slot_of_edge)] = rng.integers(0, n, e)
    plan = attach_col_plan(plan, col)
    rows_of_slot = (np.repeat(np.asarray(plan.chunk_rows), plan.chunk)
                    * plan.block_n + np.asarray(plan.row_local))
    return plan, col, rows_of_slot


class TestColGather:
    def test_forward_matches_indexing(self, rng):
        plan, col, _ = _small_plan(rng)
        x = jnp.asarray(rng.normal(size=(plan.num_nodes, 8)), jnp.float32)
        out = make_col_gather(plan, jnp.asarray(col))(x)
        want = np.asarray(x)[col]
        m = np.asarray(plan.valid)
        np.testing.assert_allclose(np.asarray(out)[m], want[m], rtol=1e-6)

    def test_vjp_matches_unsorted_scatter(self, rng):
        plan, col, _ = _small_plan(rng)
        x = jnp.asarray(rng.normal(size=(plan.num_nodes, 8)), jnp.float32)
        cg = make_col_gather(plan, jnp.asarray(col))
        ct = rng.normal(size=(plan.capacity, 8)).astype(np.float32)
        ct[~np.asarray(plan.valid)] = 0.0
        _, vjp = jax.vjp(cg, x)
        (dx,) = vjp(jnp.asarray(ct))
        want = np.zeros((plan.num_nodes, 8), np.float32)
        m = np.asarray(plan.valid)
        np.add.at(want, col[m], ct[m])
        np.testing.assert_allclose(np.asarray(dx), want, atol=3e-2)

    def test_payload_cast_folds_into_op(self, rng):
        plan, col, _ = _small_plan(rng)
        x = jnp.asarray(rng.normal(size=(plan.num_nodes, 8)), jnp.float32)
        out = make_col_gather(plan, jnp.asarray(col),
                              out_dtype=jnp.bfloat16)(x)
        assert out.dtype == jnp.bfloat16
        # cotangent comes back in the primal dtype
        cg = make_col_gather(plan, jnp.asarray(col), out_dtype=jnp.bfloat16)
        (dx,) = jax.vjp(cg, x)[1](out)
        assert dx.dtype == x.dtype

    def test_col_plan_attached_by_engine(self, rng):
        from graph_neural_pde_tpu.config import Config
        from graph_neural_pde_tpu.data.synthetic import make_sbm_dataset
        from graph_neural_pde_tpu.models.blocks import (
            build_stripe_engine, prepare_graph)
        ds = make_sbm_dataset(num_nodes=40, num_classes=3, num_features=8,
                              seed=0)
        cfg = Config(block="constant", function="laplacian",
                     stripe_fused=True, stripe_block_n=8, stripe_chunk=16,
                     stripe_chunk_auto=False)
        g = prepare_graph(cfg, ds.graph)
        _, plan = build_stripe_engine(cfg, g)
        assert plan is not None and plan.col_plan is not None
        assert plan.col_src_slot.shape[0] == plan.col_plan.capacity


class TestMegaBackward:
    """The _bwd_kernel mega-pass vs the stripe-composition oracle."""

    def _setup(self, rng, heads=2, d=8, att=8, n=48, e=400):
        from graph_neural_pde_tpu.ops.pallas.fused_rhs import (
            fused_rhs_aggregate)
        plan, col, rows = _small_plan(rng, n=n, e=e)
        x_n = jnp.asarray(rng.normal(size=(plan.num_nodes, d)) * 0.4,
                          jnp.float32)
        x_g = jnp.asarray(rng.normal(size=(plan.capacity, d)) * 0.4,
                          jnp.float32)
        qw = jnp.asarray(rng.normal(size=(d, att)) * 0.2, jnp.float32)
        qb = jnp.asarray(rng.normal(size=(att,)) * 0.1, jnp.float32)
        kw = jnp.asarray(rng.normal(size=(d, att)) * 0.2, jnp.float32)
        kb = jnp.asarray(rng.normal(size=(att,)) * 0.1, jnp.float32)
        gmax = jnp.zeros((), jnp.float32)
        return plan, (qw, qb, kw, kb, x_n, x_g, gmax), fused_rhs_aggregate

    @pytest.mark.parametrize("square_plus", [False, True])
    def test_mega_matches_composition(self, rng, square_plus):
        from graph_neural_pde_tpu.ops.pallas.fused_rhs import (
            _fused_bwd, _fused_bwd_composition)
        heads = 2
        plan, operands, _ = self._setup(rng, heads=heads)
        d = operands[5].shape[1]
        hp = max(8, heads)
        res = operands + (None, ())
        ct_num = jnp.asarray(rng.normal(size=(plan.num_nodes, heads * d)),
                             jnp.float32)
        ct_den = jnp.asarray(rng.normal(size=(plan.num_nodes, hp)),
                             jnp.float32)
        got = _fused_bwd(plan, heads, square_plus, "scaled_dot", res,
                         (ct_num, ct_den))[:7]
        want = _fused_bwd_composition(plan, heads, square_plus, res,
                                      (ct_num, ct_den))
        names = ["dqw", "dqb", "dkw", "dkb", "dx_n", "dx_g", "dgmax"]
        for name, a, b in zip(names, got, want):
            a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
            scale = np.abs(b).max() + 1e-6
            assert np.abs(a - b).max() / scale < 5e-2, (
                name, np.abs(a - b).max(), scale)

    def test_mega_with_shifts_matches_composition(self, rng):
        """EXACT-softmax mode: per-edge row-max shifts thread through."""
        from graph_neural_pde_tpu.ops.pallas.fused_rhs import (
            _fused_bwd, _fused_bwd_composition)
        heads = 2
        plan, operands, _ = self._setup(rng, heads=heads)
        d = operands[5].shape[1]
        hp = max(8, heads)
        shifts = tuple(
            jnp.asarray(rng.normal(size=(plan.capacity,)) * 0.3, jnp.float32)
            for _ in range(heads))
        res = operands + (shifts, ())
        ct_num = jnp.asarray(rng.normal(size=(plan.num_nodes, heads * d)),
                             jnp.float32)
        ct_den = jnp.asarray(rng.normal(size=(plan.num_nodes, hp)),
                             jnp.float32)
        got = _fused_bwd(plan, heads, False, "scaled_dot", res,
                         (ct_num, ct_den))[:7]
        want = _fused_bwd_composition(plan, heads, False, res,
                                      (ct_num, ct_den))
        for a, b in zip(got, want):
            a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
            scale = np.abs(b).max() + 1e-6
            assert np.abs(a - b).max() / scale < 5e-2

    def test_sbm_plan_is_symmetric_and_directed_is_not(self, rng):
        """Engine-level symmetry detection: SBM stand-ins (to_undirected)
        enable the reverse-edge backward; directed graphs keep the
        column-plan path."""
        from graph_neural_pde_tpu.config import Config
        from graph_neural_pde_tpu.data.synthetic import make_sbm_dataset
        from graph_neural_pde_tpu.models.blocks import (
            build_stripe_engine, prepare_graph)
        from graph_neural_pde_tpu.ops.graph import make_graph
        cfg = Config(block="constant", function="transformer",
                     stripe_fused=True, stripe_block_n=8, stripe_chunk=16,
                     stripe_chunk_auto=False, heads=2, attention_dim=8,
                     hidden_dim=8)
        ds = make_sbm_dataset(num_nodes=40, num_classes=3, num_features=8,
                              seed=0)
        _, plan_sym = build_stripe_engine(cfg, prepare_graph(cfg, ds.graph))
        assert plan_sym.symmetric
        g_dir = make_graph(rng.integers(0, 40, 200).astype(np.int32),
                           rng.integers(0, 40, 200).astype(np.int32), None,
                           num_nodes=40)
        _, plan_dir = build_stripe_engine(
            cfg.replace(self_loop_weight=0.0), prepare_graph(
                cfg.replace(self_loop_weight=0.0), g_dir))
        assert not plan_dir.symmetric

    @pytest.mark.parametrize("score", ["scaled_dot", "exp_kernel"])
    def test_rhs_gradient_directed_colplan_path(self, rng, score):
        """Directed (asymmetric) graphs keep the column-plan backward; its
        end-to-end gradients must still match the XLA composition."""
        from graph_neural_pde_tpu.config import Config
        from graph_neural_pde_tpu.models.blocks import (
            build_stripe_engine, init_block, prepare_graph)
        from graph_neural_pde_tpu.models.functions import FuncAux, make_rhs
        from graph_neural_pde_tpu.ops.graph import make_graph

        cfg = Config(block="constant", function="transformer",
                     attention_type=score, heads=2, attention_dim=8,
                     hidden_dim=8, add_source=True, stripe_fused=True,
                     stripe_block_n=8, stripe_chunk=16,
                     stripe_chunk_auto=False, self_loop_weight=0.0)
        g0 = make_graph(rng.integers(0, 40, 200).astype(np.int32),
                        rng.integers(0, 40, 200).astype(np.int32), None,
                        num_nodes=40)
        g = prepare_graph(cfg, g0)
        g2, plan = build_stripe_engine(cfg, g)
        assert plan is not None and not plan.symmetric
        params = init_block(jax.random.PRNGKey(0), cfg, 8)["func"]
        params = jax.tree_util.tree_map(
            lambda p: p + 0.1 * jax.random.normal(
                jax.random.PRNGKey(1), p.shape), params)
        x = jnp.asarray(rng.normal(size=(g2.num_nodes, 8)), jnp.float32)
        aux = FuncAux(attention=None, x0=x, edge_weight=g2.weight)
        rhs_fast = make_rhs(cfg, g2, stripe_plan=plan)
        rhs_ref = make_rhs(cfg.replace(stripe_fused=False), g2)

        def loss(rhs):
            def f(p, xx):
                out = rhs(p, aux, 0.0, xx)
                return jnp.sum(out * jnp.cos(jnp.arange(out.size)
                                             .reshape(out.shape) * 0.1))
            return f

        gf = jax.grad(loss(rhs_fast), argnums=(0, 1))(params, x)
        gr = jax.grad(loss(rhs_ref), argnums=(0, 1))(params, x)
        flat_f, _ = jax.flatten_util.ravel_pytree(gf)
        flat_r, _ = jax.flatten_util.ravel_pytree(gr)
        scale = float(jnp.abs(flat_r).max()) + 1e-6
        assert float(jnp.abs(flat_f - flat_r).max()) / scale < 5e-2

    @pytest.mark.parametrize("score", ["scaled_dot", "cosine_sim",
                                       "pearson", "exp_kernel"])
    def test_rhs_forward_matches_xla_composition(self, rng, score):
        """Forward RHS values of the mega kernel vs the XLA composition for
        every score family."""
        from graph_neural_pde_tpu.config import Config
        from graph_neural_pde_tpu.data.synthetic import make_sbm_dataset
        from graph_neural_pde_tpu.models.blocks import (
            build_stripe_engine, init_block, prepare_graph)
        from graph_neural_pde_tpu.models.functions import FuncAux, make_rhs

        ds = make_sbm_dataset(num_nodes=40, num_classes=3, num_features=8,
                              seed=3)
        cfg = Config(block="constant", function="transformer",
                     attention_type=score, heads=2, attention_dim=8,
                     hidden_dim=8, add_source=True, stripe_fused=True,
                     stripe_block_n=8, stripe_chunk=16,
                     stripe_chunk_auto=False)
        g = prepare_graph(cfg, ds.graph)
        g2, plan = build_stripe_engine(cfg, g)
        params = init_block(jax.random.PRNGKey(0), cfg, 8)["func"]
        params = jax.tree_util.tree_map(
            lambda p: p + 0.1 * jax.random.normal(
                jax.random.PRNGKey(2), p.shape), params)
        x = jnp.asarray(rng.normal(size=(g2.num_nodes, 8)), jnp.float32)
        aux = FuncAux(attention=None, x0=x, edge_weight=g2.weight)
        out_f = make_rhs(cfg, g2, stripe_plan=plan)(params, aux, 0.0, x)
        out_r = make_rhs(cfg.replace(stripe_fused=False), g2)(
            params, aux, 0.0, x)
        scale = float(jnp.abs(out_r).max()) + 1e-6
        assert float(jnp.abs(out_f - out_r).max()) / scale < 5e-2

    @pytest.mark.parametrize("symmetric", [True, False])
    def test_rhs_beltrami_exp_kernel_fused(self, rng, symmetric):
        """Round-4: the BLEND split-space exp_kernel rides the one-pass
        kernel (score 'exp_kernel_beltrami' over packed (Qx‖Qp)/(Kx‖Kp)
        projections with the block-diagonal selector) — forward AND
        end-to-end gradients vs the XLA composition, on both the symmetric
        (sym backward) and directed (col-plan backward) engines.
        Ref: function_transformer_attention.py:133-171."""
        from graph_neural_pde_tpu.config import Config
        from graph_neural_pde_tpu.data.synthetic import make_sbm_dataset
        from graph_neural_pde_tpu.models.blocks import (
            build_stripe_engine, init_block, prepare_graph)
        from graph_neural_pde_tpu.models.functions import FuncAux, make_rhs
        from graph_neural_pde_tpu.ops.graph import make_graph

        fh, ph = 6, 4
        in_dim = fh + ph
        cfg = Config(block="constant", function="transformer",
                     attention_type="exp_kernel", beltrami=True,
                     feat_hidden_dim=fh, pos_enc_hidden_dim=ph,
                     heads=2, attention_dim=8, hidden_dim=in_dim,
                     add_source=True, stripe_fused=True, stripe_block_n=8,
                     stripe_chunk=16, stripe_chunk_auto=False)
        if symmetric:
            ds = make_sbm_dataset(num_nodes=40, num_classes=3,
                                  num_features=8, seed=5)
            g = prepare_graph(cfg, ds.graph)
        else:
            g0 = make_graph(rng.integers(0, 40, 200).astype(np.int32),
                            rng.integers(0, 40, 200).astype(np.int32),
                            None, num_nodes=40)
            g = prepare_graph(cfg.replace(self_loop_weight=0.0), g0)
        g2, plan = build_stripe_engine(cfg, g)
        assert plan is not None and plan.symmetric == symmetric
        params = init_block(jax.random.PRNGKey(0), cfg, in_dim)["func"]
        params = jax.tree_util.tree_map(
            lambda p: p + 0.1 * jax.random.normal(
                jax.random.PRNGKey(1), p.shape), params)
        x = jnp.asarray(rng.normal(size=(g2.num_nodes, in_dim)),
                        jnp.float32)
        aux = FuncAux(attention=None, x0=x, edge_weight=g2.weight)
        rhs_fast = make_rhs(cfg, g2, stripe_plan=plan)
        rhs_ref = make_rhs(cfg.replace(stripe_fused=False), g2)
        out_f = rhs_fast(params, aux, 0.0, x)
        out_r = rhs_ref(params, aux, 0.0, x)
        scale = float(jnp.abs(out_r).max()) + 1e-6
        assert float(jnp.abs(out_f - out_r).max()) / scale < 5e-2

        def loss(rhs):
            def f(p, xx):
                out = rhs(p, aux, 0.0, xx)
                return jnp.sum(out * jnp.cos(jnp.arange(out.size)
                                             .reshape(out.shape) * 0.1))
            return f

        gf = jax.grad(loss(rhs_fast), argnums=(0, 1))(params, x)
        gr = jax.grad(loss(rhs_ref), argnums=(0, 1))(params, x)
        flat_f, _ = jax.flatten_util.ravel_pytree(gf)
        flat_r, _ = jax.flatten_util.ravel_pytree(gr)
        gscale = float(jnp.abs(flat_r).max()) + 1e-6
        assert float(jnp.abs(flat_f - flat_r).max()) / gscale < 5e-2

    @pytest.mark.parametrize("score", ["scaled_dot", "exp_kernel"])
    def test_rhs_gradient_sym_backward(self, rng, score):
        """Opt-in symmetric backward (reverse-edge relocation,
        Config.sym_backward) end-to-end vs the XLA composition."""
        from graph_neural_pde_tpu.config import Config
        from graph_neural_pde_tpu.data.synthetic import make_sbm_dataset
        from graph_neural_pde_tpu.models.blocks import (
            build_stripe_engine, init_block, prepare_graph)
        from graph_neural_pde_tpu.models.functions import FuncAux, make_rhs

        ds = make_sbm_dataset(num_nodes=40, num_classes=3, num_features=8,
                              seed=4)
        cfg = Config(block="constant", function="transformer",
                     attention_type=score, heads=2, attention_dim=8,
                     hidden_dim=8, add_source=True, stripe_fused=True,
                     stripe_block_n=8, stripe_chunk=16,
                     stripe_chunk_auto=False, sym_backward=True)
        g = prepare_graph(cfg, ds.graph)
        g2, plan = build_stripe_engine(cfg, g)
        assert plan is not None and plan.symmetric
        params = init_block(jax.random.PRNGKey(0), cfg, 8)["func"]
        params = jax.tree_util.tree_map(
            lambda p: p + 0.1 * jax.random.normal(
                jax.random.PRNGKey(1), p.shape), params)
        x = jnp.asarray(rng.normal(size=(g2.num_nodes, 8)), jnp.float32)
        aux = FuncAux(attention=None, x0=x, edge_weight=g2.weight)
        rhs_fast = make_rhs(cfg, g2, stripe_plan=plan)
        rhs_ref = make_rhs(cfg.replace(stripe_fused=False), g2)

        def loss(rhs):
            def f(p, xx):
                out = rhs(p, aux, 0.0, xx)
                return jnp.sum(out * jnp.cos(jnp.arange(out.size)
                                             .reshape(out.shape) * 0.1))
            return f

        gf = jax.grad(loss(rhs_fast), argnums=(0, 1))(params, x)
        gr = jax.grad(loss(rhs_ref), argnums=(0, 1))(params, x)
        flat_f, _ = jax.flatten_util.ravel_pytree(gf)
        flat_r, _ = jax.flatten_util.ravel_pytree(gr)
        scale = float(jnp.abs(flat_r).max()) + 1e-6
        assert float(jnp.abs(flat_f - flat_r).max()) / scale < 5e-2

    @pytest.mark.parametrize("score", ["scaled_dot", "cosine_sim",
                                       "pearson", "exp_kernel"])
    def test_rhs_gradient_vs_xla_composition(self, rng, score):
        """End-to-end: grad of a scalar loss through the fused stripe RHS
        (mega backward + col-plan dx scatter) matches the plain XLA RHS —
        for every score family the mega kernel computes in-kernel."""
        from graph_neural_pde_tpu.config import Config
        from graph_neural_pde_tpu.data.synthetic import make_sbm_dataset
        from graph_neural_pde_tpu.models.blocks import (
            build_stripe_engine, init_block, prepare_graph)
        from graph_neural_pde_tpu.models.functions import FuncAux, make_rhs

        ds = make_sbm_dataset(num_nodes=40, num_classes=3, num_features=8,
                              seed=1)
        cfg = Config(block="constant", function="transformer",
                     attention_type=score, heads=2, attention_dim=8,
                     hidden_dim=8, add_source=True, stripe_fused=True,
                     stripe_block_n=8, stripe_chunk=16,
                     stripe_chunk_auto=False)
        g = prepare_graph(cfg, ds.graph)
        g2, plan = build_stripe_engine(cfg, g)
        assert plan is not None and plan.col_plan is not None
        params = init_block(jax.random.PRNGKey(0), cfg, 8)["func"]
        # non-degenerate attention weights (init is 1e-5 constant)
        params = jax.tree_util.tree_map(
            lambda p: p + 0.1 * jax.random.normal(
                jax.random.PRNGKey(1), p.shape), params)
        x = jnp.asarray(rng.normal(size=(g2.num_nodes, 8)), jnp.float32)
        aux = FuncAux(attention=None, x0=x, edge_weight=g2.weight)

        rhs_fast = make_rhs(cfg, g2, stripe_plan=plan)
        rhs_ref = make_rhs(cfg.replace(stripe_fused=False), g2)

        def loss(rhs):
            def f(p, xx):
                out = rhs(p, aux, 0.0, xx)
                return jnp.sum(out * jnp.cos(jnp.arange(out.size)
                                             .reshape(out.shape) * 0.1))
            return f

        gf = jax.grad(loss(rhs_fast), argnums=(0, 1))(params, x)
        gr = jax.grad(loss(rhs_ref), argnums=(0, 1))(params, x)
        flat_f, _ = jax.flatten_util.ravel_pytree(gf)
        flat_r, _ = jax.flatten_util.ravel_pytree(gr)
        scale = float(jnp.abs(flat_r).max()) + 1e-6
        err = float(jnp.abs(flat_f - flat_r).max()) / scale
        assert err < 5e-2, err
