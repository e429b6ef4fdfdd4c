"""norm_idx=1 (column-normalised softmax) fused engine — the mirror trick.

The reference normalises attention over edge_index[attention_norm_idx]
(/root/reference/src/function_transformer_attention.py:210-213); norm_idx=1
groups the softmax by COLUMN while aggregation reduces by ROW, which the
norm0 fused path cannot express. fused_rhs.make_fused_ax_norm1 computes the
column denominators with a reverse-score row-plan pass (symmetric edge
multisets) and rides recip on the u32-packed x|recip gather. These tests pin
forward values AND end-to-end gradients against the XLA composition
(apply_transformer_attention + spmm — the exact reference semantics), and
check the engine gating.
"""

import jax
import jax.flatten_util
import jax.numpy as jnp
import numpy as np
import pytest

from graph_neural_pde_tpu.config import Config
from graph_neural_pde_tpu.data.synthetic import make_sbm_dataset
from graph_neural_pde_tpu.models.blocks import (
    build_stripe_engine,
    init_block,
    prepare_graph,
)
from graph_neural_pde_tpu.models.functions import FuncAux, make_rhs

SCORES = ["scaled_dot", "cosine_sim", "pearson", "exp_kernel"]


def _setup(score, heads=2, d=8, seed=3, beltrami=False, fh=6, ph=4):
    kw = {}
    if beltrami:
        d = fh + ph
        kw = dict(beltrami=True, feat_hidden_dim=fh, pos_enc_hidden_dim=ph)
    cfg = Config(block="constant", function="transformer",
                 attention_type=score, heads=heads, attention_dim=8,
                 hidden_dim=d, add_source=True, stripe_fused=True,
                 stripe_block_n=8, stripe_chunk=16, stripe_chunk_auto=False,
                 attention_norm_idx=1, rhs_payload_dtype="bfloat16", **kw)
    ds = make_sbm_dataset(num_nodes=40, num_classes=3, num_features=8,
                          seed=seed)
    g = prepare_graph(cfg, ds.graph)
    g2, plan = build_stripe_engine(cfg, g)
    assert plan is not None and plan.symmetric
    params = init_block(jax.random.PRNGKey(0), cfg, d)["func"]
    params = jax.tree_util.tree_map(
        lambda p: p + 0.1 * jax.random.normal(jax.random.PRNGKey(1), p.shape),
        params)
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(g2.num_nodes, d)), jnp.float32)
    aux = FuncAux(attention=None, x0=x, edge_weight=g2.weight)
    return cfg, g2, plan, params, x, aux


class TestNorm1Fused:
    @pytest.mark.parametrize("score", SCORES)
    def test_forward_matches_composition(self, score):
        cfg, g2, plan, params, x, aux = _setup(score)
        out_f = make_rhs(cfg, g2, stripe_plan=plan)(params, aux, 0.0, x)
        out_r = make_rhs(cfg.replace(stripe_fused=False), g2)(
            params, aux, 0.0, x)
        assert np.all(np.isfinite(np.asarray(out_f)))
        scale = float(jnp.abs(out_r).max()) + 1e-6
        assert float(jnp.abs(out_f - out_r).max()) / scale < 5e-2

    @pytest.mark.parametrize("score", SCORES)
    def test_gradients_match_composition(self, score):
        cfg, g2, plan, params, x, aux = _setup(score)
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

    def test_heads_and_odd_dim(self):
        """Odd state dim exercises the pack's zero-pad column; heads=4 the
        per-head recip lanes."""
        cfg, g2, plan, params, x, aux = _setup("scaled_dot", heads=4, d=9,
                                               seed=5)
        out_f = make_rhs(cfg, g2, stripe_plan=plan)(params, aux, 0.0, x)
        out_r = make_rhs(cfg.replace(stripe_fused=False), g2)(
            params, aux, 0.0, x)
        scale = float(jnp.abs(out_r).max()) + 1e-6
        assert float(jnp.abs(out_f - out_r).max()) / scale < 5e-2

    def test_beltrami_exp_kernel_norm1(self):
        """BLEND split-space kernel + norm_idx=1 — the packed (Qx‖Qp)
        projections compose with the mirror-trick engine."""
        cfg, g2, plan, params, x, aux = _setup("exp_kernel", beltrami=True)
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
        scale = float(jnp.abs(flat_r).max()) + 1e-6
        assert float(jnp.abs(flat_f - flat_r).max()) / scale < 5e-2

    def test_den_output_matches_column_softmax_mass(self):
        """The op's den output must be the per-COLUMN score mass (the
        norm_idx=1 denominator), pinned against a segment sum over g.col."""
        from graph_neural_pde_tpu.ops.pallas.fused_rhs import (
            make_fused_ax_norm1)
        cfg, g2, plan, params, x, aux = _setup("scaled_dot")
        ap = params["att"]
        op = make_fused_ax_norm1(plan, cfg.heads, False, "scaled_dot",
                                 g2.col)
        _ax, den = op(ap["Q"]["w"], ap["Q"]["b"], ap["K"]["w"], ap["K"]["b"],
                      x, jnp.zeros((), jnp.float32), ())
        # composition denominator with the same bf16 payload rounding
        h = cfg.heads
        d_k = cfg.attention_dim // h
        xg = x.astype(jnp.bfloat16).astype(jnp.float32)[g2.col]
        q = (x @ ap["Q"]["w"] + ap["Q"]["b"])[g2.row]
        k = xg @ ap["K"]["w"] + ap["K"]["b"]
        s = jnp.sum(q.reshape(-1, h, d_k) * k.reshape(-1, h, d_k),
                    axis=2) / np.sqrt(d_k)
        u = jnp.where(jnp.asarray(g2.mask)[:, None], jnp.exp(s), 0.0)
        want = jax.ops.segment_sum(u, g2.col, num_segments=g2.num_nodes)
        np.testing.assert_allclose(np.asarray(den[:, :h]), np.asarray(want),
                                   rtol=5e-2, atol=1e-4)

    def test_engine_gating(self):
        """norm_idx=1 builds the stripe engine only for the mega-eligible
        transformer configs; square_plus and f32 payload fall back."""
        cfg, g2, plan, params, x, aux = _setup("scaled_dot")
        ds = make_sbm_dataset(num_nodes=40, num_classes=3, num_features=8,
                              seed=3)
        for bad in (cfg.replace(square_plus=True),
                    cfg.replace(rhs_payload_dtype="float32"),
                    cfg.replace(function="GAT")):
            g = prepare_graph(bad, ds.graph)
            _g2, p = build_stripe_engine(bad, g)
            assert p is None

    def test_directed_graph_falls_back_to_composition(self):
        """A non-symmetric plan cannot use the mirror trick: make_rhs must
        produce the exact composition (identical values)."""
        from graph_neural_pde_tpu.ops.graph import make_graph
        rng = np.random.default_rng(11)
        cfg = Config(block="constant", function="transformer",
                     attention_type="scaled_dot", heads=2, attention_dim=8,
                     hidden_dim=8, add_source=True, stripe_fused=True,
                     stripe_block_n=8, stripe_chunk=16,
                     stripe_chunk_auto=False, attention_norm_idx=1,
                     rhs_payload_dtype="bfloat16", self_loop_weight=0.0)
        g0 = make_graph(rng.integers(0, 40, 200).astype(np.int32),
                        rng.integers(0, 40, 200).astype(np.int32),
                        None, num_nodes=40)
        g = prepare_graph(cfg, g0)
        g2, plan = build_stripe_engine(cfg, g)
        assert plan is not None and not plan.symmetric
        params = init_block(jax.random.PRNGKey(0), cfg, 8)["func"]
        x = jnp.asarray(rng.normal(size=(g2.num_nodes, 8)), jnp.float32)
        aux = FuncAux(attention=None, x0=x, edge_weight=g2.weight)
        out_f = make_rhs(cfg, g2, stripe_plan=plan)(params, aux, 0.0, x)
        out_r = make_rhs(cfg.replace(stripe_fused=False), g2)(
            params, aux, 0.0, x)
        np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_r),
                                   rtol=1e-5, atol=1e-6)

    def test_poison_and_exact_resolve_end_to_end(self):
        """Overflowing scores poison the fused norm1 output with NaN and
        block_forward re-solves on the exact composition — the solved state
        stays finite."""
        from graph_neural_pde_tpu.models.blocks import block_forward
        from graph_neural_pde_tpu.models.functions import rhs_may_poison
        cfg, g2, plan, params, x, aux = _setup("scaled_dot")
        cfg = cfg.replace(method="rk4", step_size=0.25, time=1.0)
        assert rhs_may_poison(cfg)
        bparams = {"func": jax.tree_util.tree_map(lambda p: p, params)}
        bparams["func"]["att"]["Q"]["w"] = (
            bparams["func"]["att"]["Q"]["w"] * 400.0)  # drive exp past f32
        z, stats, _ = block_forward(bparams, cfg, g2, x, training=False,
                                    stripe_plan=plan)
        assert np.all(np.isfinite(np.asarray(z)))
