"""The whole-matvec symmetric VJP (ops.spmm._make_stripe_spmm_sym) must
match the XLA spmm's value and gradients on undirected graphs — including
asymmetric per-edge weights, duplicate multi-edges and the Chebyshev solve
it accelerates (the backward of every tuned GRAND-l config's hot loop)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graph_neural_pde_tpu.config import Config
from graph_neural_pde_tpu.models.blocks import (build_stripe_engine,
                                                prepare_graph)
from graph_neural_pde_tpu.ops.graph import make_graph
from graph_neural_pde_tpu.ops.spmm import make_stripe_spmm, spmm


def _sym_engine(seed=0, n=40, e=70, chunk=16):
    """Build a stripe engine over an UNDIRECTED random graph."""
    rng = np.random.default_rng(seed)
    r = rng.integers(0, n, e).astype(np.int32)
    c = rng.integers(0, n, e).astype(np.int32)
    row = np.concatenate([r, c])
    col = np.concatenate([c, r])
    g0 = make_graph(row, col, None, num_nodes=n)
    cfg = Config(function="laplacian", block="constant", stripe_fused=True,
                 stripe_block_n=8, stripe_chunk=chunk, self_loop_weight=1.0)
    g = prepare_graph(cfg, g0)
    g2, plan = build_stripe_engine(cfg, g)
    assert plan is not None
    return g2, plan


class TestSymVjp:
    def test_plan_carries_rev_slots(self):
        g2, plan = _sym_engine()
        assert plan.symmetric
        assert plan.rev_slot is not None
        # rev is a bijection pairing (row, col) with (col, row)
        rev = np.asarray(plan.rev_slot)
        valid = np.asarray(plan.valid)
        row = np.asarray(g2.row)
        col = np.asarray(g2.col)
        vs = np.where(valid)[0]
        assert sorted(rev[vs]) == sorted(vs)          # bijection on valid
        np.testing.assert_array_equal(row[rev[vs]], col[vs])
        np.testing.assert_array_equal(col[rev[vs]], row[vs])

    @pytest.mark.parametrize("payload", [None, jnp.bfloat16])
    def test_fwd_and_grads_match_xla(self, payload):
        g2, plan = _sym_engine(seed=1)
        f = make_stripe_spmm(g2, plan, payload)
        rng = np.random.default_rng(3)
        d = 16
        x = jnp.asarray(rng.normal(size=(g2.num_nodes, d)), jnp.float32)
        # ASYMMETRIC weights: w[e] != w[rev(e)] — the VJP must permute them
        w = jnp.asarray(np.where(np.asarray(g2.mask),
                                 rng.random(g2.capacity), 0.0), jnp.float32)
        probe = jnp.asarray(rng.normal(size=(g2.num_nodes, d)), jnp.float32)

        got = np.asarray(f(x, w))
        want = np.asarray(spmm(g2, x, weight=w))
        np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)

        def loss_op(x_, w_):
            return jnp.sum(f(x_, w_) * probe)

        def loss_xla(x_, w_):
            return jnp.sum(spmm(g2, x_, weight=w_) * probe)

        gx, gw = jax.grad(loss_op, argnums=(0, 1))(x, w)
        rx, rw = jax.grad(loss_xla, argnums=(0, 1))(x, w)
        np.testing.assert_allclose(np.asarray(gx), np.asarray(rx),
                                   rtol=3e-2, atol=3e-2)
        m = np.asarray(g2.mask)
        np.testing.assert_allclose(np.asarray(gw)[m], np.asarray(rw)[m],
                                   rtol=3e-2, atol=3e-2)
        # padding slots stay grad-free
        assert np.all(np.asarray(gw)[~m] == 0.0)

    def test_duplicate_multi_edges(self):
        """Duplicate (u, v) pairs: any rev bijection is valid — gradients
        must still match the XLA oracle edge-for-edge in aggregate."""
        n = 10
        r = np.array([0, 0, 1, 1, 2, 3], np.int32)
        c = np.array([1, 1, 0, 0, 3, 2], np.int32)
        g0 = make_graph(r, c, None, num_nodes=n)
        cfg = Config(function="laplacian", block="constant",
                     stripe_fused=True, stripe_block_n=8, stripe_chunk=16,
                     self_loop_weight=1.0)
        g = prepare_graph(cfg, g0)
        g2, plan = build_stripe_engine(cfg, g)
        assert plan.symmetric and plan.rev_slot is not None
        f = make_stripe_spmm(g2, plan)
        rng = np.random.default_rng(5)
        x = jnp.asarray(rng.normal(size=(g2.num_nodes, 8)), jnp.float32)
        w = jnp.asarray(np.where(np.asarray(g2.mask),
                                 rng.random(g2.capacity), 0.0), jnp.float32)

        def l_op(x_, w_):
            return jnp.sum(jnp.sin(f(x_, w_)))

        def l_xla(x_, w_):
            return jnp.sum(jnp.sin(spmm(g2, x_, weight=w_)))

        gx, gw = jax.grad(l_op, argnums=(0, 1))(x, w)
        rx, rw = jax.grad(l_xla, argnums=(0, 1))(x, w)
        np.testing.assert_allclose(np.asarray(gx), np.asarray(rx),
                                   rtol=3e-2, atol=3e-2)
        # duplicate edges share (row, col): their dw is interchangeable
        # only in aggregate per (row, col) pair — compare segment sums
        key = np.asarray(g2.row) * n + np.asarray(g2.col)
        m = np.asarray(g2.mask)
        agg_got = np.bincount(key[m], weights=np.asarray(gw)[m],
                              minlength=n * n)
        agg_ref = np.bincount(key[m], weights=np.asarray(rw)[m],
                              minlength=n * n)
        np.testing.assert_allclose(agg_got, agg_ref, rtol=3e-2, atol=3e-2)

    def test_cheby_solve_grads_match(self):
        """The accelerated path end-to-end: gradient of a loss through
        linear_diffusion_solve with the sym-VJP matvec vs the XLA matvec."""
        from graph_neural_pde_tpu.solvers.chebyshev import (
            linear_diffusion_solve)
        g2, plan = _sym_engine(seed=7)
        f = make_stripe_spmm(g2, plan)
        rng = np.random.default_rng(9)
        d = 8
        x0 = jnp.asarray(rng.normal(size=(g2.num_nodes, d)), jnp.float32)
        w = jnp.asarray(np.where(np.asarray(g2.mask),
                                 rng.random(g2.capacity), 0.0), jnp.float32)
        probe = jnp.asarray(rng.normal(size=(g2.num_nodes, d)), jnp.float32)
        alpha = jnp.asarray(0.8, jnp.float32)

        def run(matvec_maker):
            def loss(x_, w_):
                z, _ = linear_diffusion_solve(
                    lambda y: matvec_maker(y, w_), x_, alpha, 0.1, x_, 2.0,
                    num_terms=12)
                return jnp.sum(z * probe)
            return jax.value_and_grad(loss, argnums=(0, 1))(x0, w)

        v_op, (gx_op, gw_op) = run(f)
        v_x, (gx_x, gw_x) = run(lambda y, w_: spmm(g2, y, weight=w_))
        np.testing.assert_allclose(float(v_op), float(v_x),
                                   rtol=2e-2, atol=2e-2)
        np.testing.assert_allclose(np.asarray(gx_op), np.asarray(gx_x),
                                   rtol=4e-2, atol=4e-2)
        m = np.asarray(g2.mask)
        np.testing.assert_allclose(np.asarray(gw_op)[m],
                                   np.asarray(gw_x)[m],
                                   rtol=4e-2, atol=4e-2)

    def test_asymmetric_graph_keeps_col_plan_path(self):
        """Directed multisets must NOT take the sym VJP (rev_slot absent)."""
        rng = np.random.default_rng(11)
        n, e = 30, 80
        g0 = make_graph(rng.integers(0, n, e).astype(np.int32),
                        rng.integers(0, n, e).astype(np.int32), None,
                        num_nodes=n)
        cfg = Config(function="laplacian", block="constant",
                     stripe_fused=True, stripe_block_n=8, stripe_chunk=16,
                     self_loop_weight=1.0)
        g = prepare_graph(cfg, g0)
        g2, plan = build_stripe_engine(cfg, g)
        if plan.symmetric:          # random digraph: vanishingly unlikely
            pytest.skip("random digraph happened to be symmetric")
        assert plan.rev_slot is None
        # and the spmm still differentiates correctly via the col plan
        f = make_stripe_spmm(g2, plan)
        x = jnp.asarray(rng.normal(size=(g2.num_nodes, 8)), jnp.float32)
        w = jnp.asarray(np.where(np.asarray(g2.mask),
                                 rng.random(g2.capacity), 0.0), jnp.float32)
        gx = jax.grad(lambda x_: jnp.sum(f(x_, w) ** 2))(x)
        rx = jax.grad(lambda x_: jnp.sum(spmm(g2, x_, weight=w) ** 2))(x)
        np.testing.assert_allclose(np.asarray(gx), np.asarray(rx),
                                   rtol=3e-2, atol=3e-2)
