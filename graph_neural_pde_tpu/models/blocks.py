"""ODE blocks: couple an ODE function with a solver and graph preprocessing.

Re-designs of the reference's block layer (/root/reference/src/base_classes.py:32-74
and block_*.py) with every dynamic-shape trick replaced by a static-shape
equivalent:

  * constant        — ConstantODEblock (block_constant.py): fixed normalised
    adjacency weights
  * attention       — AttODEblock (block_transformer_attention.py): multihead
    attention computed ONCE per forward at t=0 and frozen into the RHS
  * mixed           — MixedODEblock (block_mixed.py): learnable convex combo
    of frozen attention and the rw adjacency
  * hard_attention  — HardAttODEblock (block_transformer_hard_attention.py):
    training-time edge subsampling by attention quantile; here the kept edges
    are a *mask + renormalised weights at fixed capacity* instead of a
    shrunken edge_index, so the solve never recompiles

The graph normalisation each reference block performs at __init__
(rw norm_dim=1 with self-loop fill, or gcn) happens once in
``prepare_graph``; the returned Graph is the static structure every solve
uses.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from graph_neural_pde_tpu.config import Config
from graph_neural_pde_tpu.models.attention import (
    apply_transformer_attention,
    init_transformer_attention,
)
from graph_neural_pde_tpu.models.functions import (
    FuncAux,
    active_regularizers,
    init_func_params,
    make_rhs,
    wrap_regularized,
)
from graph_neural_pde_tpu.ops.graph import Graph, gcn_norm_fill_val, get_rw_adj
from graph_neural_pde_tpu.ops.scatter import normalize_attention
from graph_neural_pde_tpu.solvers.api import SolverOptions, odeint

BLOCK_NAMES = ("constant", "attention", "mixed", "hard_attention",
               "rewire_attention")


def prepare_graph(cfg: Config, g: Graph) -> Graph:
    """Apply the block's one-off adjacency normalisation.

    constant: rw or gcn by cfg.data_norm (block_constant.py:12-21); all other
    blocks: rw with norm_dim=1 (block_transformer_attention.py:13-16 etc.).
    """
    if cfg.block == "constant" and cfg.data_norm != "rw":
        g = gcn_norm_fill_val(g, fill_value=cfg.self_loop_weight)
    else:
        g = get_rw_adj(g, norm_dim=1, fill_value=cfg.self_loop_weight)
    # row-sorted edges let every per-row segment reduction take XLA's sorted
    # fast path; order is irrelevant to all block/function semantics
    return g.sort_by_row()


def build_spmm_engine(cfg: Config, g: Graph):
    """Optionally reorder the (prepared) graph into the Pallas block-plan
    layout and return (graph, spmm_fn | None). spmm_fn(x, w) aggregates with
    the one-hot MXU kernels (see ops/pallas) — block-local graphs only."""
    if cfg.spmm_impl != "pallas_blocked" or cfg.function != "laplacian":
        return g, None
    if cfg.rewire_KNN or cfg.edge_sampling or cfg.fa_layer:
        import sys
        print("[spmm] pallas_blocked disabled: runtime rewiring would stale "
              "the static block plan", file=sys.stderr)
        return g, None
    import numpy as np
    from graph_neural_pde_tpu.ops.pallas.spmm_blocked import (
        make_plan_pair, make_spmm)
    m = np.asarray(g.mask)
    plans = make_plan_pair(
        np.asarray(g.row)[m], np.asarray(g.col)[m], np.asarray(g.weight)[m],
        num_nodes=g.num_nodes, block_n=cfg.spmm_block_n, chunk=cfg.spmm_chunk)
    f = plans.fwd
    g2 = Graph(row=jnp.asarray(f.row), col=jnp.asarray(f.col),
               weight=jnp.asarray(f.weight), mask=jnp.asarray(f.valid),
               num_nodes=f.num_nodes, rows_sorted=False)
    return g2, make_spmm(plans)


def build_stripe_engine(cfg: Config, g: Graph):
    """Reorder a row-sorted graph into the stripe-plan slot layout and build
    the plan for the MXU row-gather/scatter kernels (ops/pallas/stripe.py).

    Returns (g_stripe, plan | None). Applies when cfg.stripe_fused is set
    and either the fused attention RHS is active (function transformer/GAT,
    attention_norm_idx 0) or the function is the linear laplacian (whose
    spmm routes through make_stripe_spmm); node count pads to block_n
    (callers pad x)."""
    from graph_neural_pde_tpu.models.functions import norm1_fused_ok
    fused_att = (cfg.fused_attention_agg
                 and cfg.function in ("transformer", "GAT")
                 and not cfg.mix_features
                 and (cfg.attention_norm_idx == 0
                      # norm_idx=1: the transformer mirror-trick engine
                      # (fused_rhs.make_fused_ax_norm1); needs the plan's
                      # symmetry bit, so rewire_KNN configs (which skip it)
                      # fall back to the composition in make_rhs
                      or (norm1_fused_ok(cfg) and not cfg.rewire_KNN)))
    lap = (cfg.function == "laplacian"
           and cfg.spmm_impl != "pallas_blocked")   # blocked engine owns it
    enabled = cfg.stripe_fused
    if enabled is None:
        # AUTO: the compiled Mosaic kernels are a TPU fast path; interpret
        # mode on CPU is a correctness harness, not an engine
        from graph_neural_pde_tpu.ops.pallas.stripe import _on_tpu
        enabled = _on_tpu()
    if not enabled or not (fused_att or lap):
        return g, None
    import numpy as np
    from graph_neural_pde_tpu.ops.pallas.stripe import build_stripe_plan
    assert g.rows_sorted, "prepare_graph must run before build_stripe_engine"
    chunk = cfg.stripe_chunk
    if cfg.stripe_chunk_auto and chunk >= 128:
        # capacity-minimising chunk from the degree distribution, bounded
        # above by the configured (measured-best) chunk
        from graph_neural_pde_tpu.ops.pallas.stripe import auto_chunk
        chunk = auto_chunk(np.asarray(g.row), np.asarray(g.mask),
                           num_nodes=g.num_nodes, block_n=cfg.stripe_block_n,
                           lo=min(512, chunk), hi=chunk)
    plan = build_stripe_plan(np.asarray(g.row), np.asarray(g.mask),
                             num_nodes=g.num_nodes,
                             block_n=cfg.stripe_block_n, chunk=chunk)
    idx = np.where(np.asarray(g.mask))[0]
    slots = np.asarray(plan.slot_of_edge)[idx]
    cap = plan.capacity
    row_s = np.zeros(cap, np.int32)
    col_s = np.zeros(cap, np.int32)
    w_s = np.zeros(cap, np.float32)
    row_s[slots] = np.asarray(g.row)[idx]
    col_s[slots] = np.asarray(g.col)[idx]
    w_s[slots] = np.asarray(g.weight)[idx]
    # dual column plan: backward dx[col] scatter rides a static permutation
    # gather + the MXU stripe scatter instead of XLA's unsorted scatter-add;
    # symmetric edge sets additionally unlock the reverse-edge backward
    # (no permutation at all — see fused_rhs._bwd_sym_kernel).
    # RUNTIME-REWIRING configs (rewire_KNN, edge_sampling, fa_layer — all
    # between-epoch graph surgery, round 5 extends the round-4 rewire_KNN
    # machinery to the other two) SKIP both: their hooks swap edge CONTENT
    # (traced) under plans rebuilt per surgery, and col_plan/symmetric are
    # col-content-dependent — a layout_equal rebuild keeps the old plan
    # OBJECT for the Trainer's executable cache, which would alias stale
    # col structure. Without them the fused RHS takes the row-plan-only
    # fused_rhs_ax path whose backward handles the col side with traced
    # indices, so one plan serves every rewire of an identical layout
    # (k-regular kNN: one retrace at the first rewire only; edge_sampling:
    # one retrace per distinct sampled layout, LRU-bounded).
    if not (cfg.rewire_KNN or cfg.edge_sampling or cfg.fa_layer):
        import dataclasses as _dc
        from graph_neural_pde_tpu.ops.pallas.stripe import (
            attach_col_plan, attach_rev_slots, edges_symmetric)
        plan = attach_col_plan(plan, col_s)
        plan = _dc.replace(plan, symmetric=edges_symmetric(
            row_s, col_s, plan.valid))
        if plan.symmetric:
            # reverse-edge slot map: unlocks the whole-matvec symmetric
            # VJP for the laplacian/cheby spmm (ops.spmm.make_stripe_spmm)
            plan = attach_rev_slots(plan, row_s, col_s)
    g2 = Graph(row=jnp.asarray(row_s), col=jnp.asarray(col_s),
               weight=jnp.asarray(w_s), mask=jnp.asarray(plan.valid),
               num_nodes=plan.num_nodes, rows_sorted=True)
    return g2, plan


def init_block(key, cfg: Config, in_dim: int):
    """Learnable block parameters: the ODE function's params, plus a
    block-level attention layer / gamma where the reference has one."""
    k_f, k_a = jax.random.split(key)
    p = {"func": init_func_params(k_f, cfg, in_dim)}
    needs_block_attention = (
        cfg.block in ("attention", "mixed", "rewire_attention")
        or (cfg.block == "hard_attention" and cfg.function not in ("GAT", "transformer"))
    )
    if needs_block_attention:
        p["att"] = init_transformer_attention(k_a, cfg, in_dim)
    if cfg.block == "mixed":
        p["gamma"] = jnp.zeros((1,))  # MixedODEblock gamma=0 default
    return p


def _block_attention(bparams, cfg: Config, g: Graph, x, stripe_plan=None):
    """The attention weights a block freezes at t=0. With a stripe plan the
    per-segment normalisation rides the MXU kernels (stripe_segment_softmax)
    instead of XLA scatter-max/add — ~7x cheaper per forward at arxiv
    scale."""
    if "att" in bparams:
        att, _v = apply_transformer_attention(bparams["att"], cfg, x, g,
                                              edge_weight=g.weight,
                                              stripe_plan=stripe_plan)
        return att
    # hard_attention with function in {GAT, transformer}: reuse the function's
    # own attention layer (block_transformer_hard_attention.py:36-41)
    from graph_neural_pde_tpu.models.attention import apply_gat_attention
    if cfg.function == "GAT":
        att, _ = apply_gat_attention(bparams["func"]["att"], cfg, x, g,
                                     stripe_plan=stripe_plan)
    else:
        att, _ = apply_transformer_attention(bparams["func"]["att"], cfg, x, g,
                                             edge_weight=g.weight,
                                             stripe_plan=stripe_plan)
    return att


def masked_quantile(values: jax.Array, mask: jax.Array, q: jax.Array) -> jax.Array:
    """Linear-interpolated quantile over the masked entries (static shape).

    Equivalent of torch.quantile(mean_att, q) over the valid edges
    (block_transformer_hard_attention.py:60).
    """
    big = jnp.finfo(values.dtype).max
    sorted_vals = jnp.sort(jnp.where(mask, values, big))
    n = jnp.sum(mask.astype(jnp.int32))
    rank = q * (n.astype(values.dtype) - 1.0)
    lo = jnp.clip(jnp.floor(rank).astype(jnp.int32), 0, values.shape[0] - 1)
    hi = jnp.clip(lo + 1, 0, values.shape[0] - 1)
    frac = rank - lo.astype(values.dtype)
    v_lo = sorted_vals[lo]
    v_hi = jnp.where(hi < n, sorted_vals[hi], v_lo)
    return v_lo + frac * (v_hi - v_lo)


def build_aux(bparams, cfg: Config, g: Graph, x, training: bool,
              stripe_plan=None) -> Tuple[FuncAux, Graph]:
    """Per-forward precomputation: frozen attention / edge masking.

    Returns the solve's FuncAux and the (possibly re-masked) graph.
    """
    x0 = jax.lax.stop_gradient(x)  # set_x0 detaches (base_classes.py:52-54)

    if cfg.block == "constant":
        return FuncAux(attention=None, x0=x0, edge_weight=g.weight), g

    if cfg.block in ("attention", "rewire_attention"):
        # rewire_attention solves exactly like the attention block (attention
        # recomputed per forward as the transition matrix,
        # block_transformer_rewiring.py:185-241); its densify/sparsify graph
        # surgery runs as between-epoch host hooks (rewiring.edges) because
        # resizing edge_index inside the solve would recompile every epoch.
        if cfg.function == "laplacian":
            # GRAND-l (every tuned best_params config) consumes only the
            # HEAD-MEAN attention (sparse_multiply dispatch,
            # function_laplacian_diffusion.py:28-36). Reduce to the 1-D [E]
            # mean HERE and rematerialise the freeze in backward: [E, H]-
            # and [E, heads_pad]-shaped f32 intermediates HBM-tile at
            # 16-128x their logical bytes on TPU, and keeping them out of
            # the training residual set is the difference between bench-
            # scale GRAND-l training fitting (measured round 5) and OOMing
            # at 18.7 GB / 15.75 GB.
            from graph_neural_pde_tpu.models.attention import (
                frozen_mean_attention)

            def _frozen_mean_att(bp, xx):
                return frozen_mean_attention(bp["att"], cfg, xx, g,
                                             edge_weight=g.weight,
                                             stripe_plan=stripe_plan)

            att = jax.checkpoint(_frozen_mean_att)(bparams, x)
            if stripe_plan is not None and not cfg.square_plus:
                # stripe fast path poisons w with NaN when a row fully
                # underflows its global-max shift; ONE cond outside the
                # freeze re-runs the exact 1-D composition (same
                # poison-and-resolve discipline as the solver fast path —
                # the branch's buffers are padding-free 1-D)
                def _frozen_exact(bp, xx):
                    return frozen_mean_attention(bp["att"], cfg, xx, g,
                                                 edge_weight=g.weight)

                bad = jnp.any(~jnp.isfinite(att))
                att = jax.lax.cond(
                    bad,
                    lambda a: jax.checkpoint(_frozen_exact)(*a),
                    lambda a: att, (bparams, x))
        else:
            att = _block_attention(bparams, cfg, g, x, stripe_plan)  # [E, H]
        return FuncAux(attention=att, x0=x0, edge_weight=g.weight), g

    if cfg.block == "mixed":
        att = _block_attention(bparams, cfg, g, x, stripe_plan)
        gamma = jax.nn.sigmoid(bparams["gamma"][0])
        mixed = jnp.mean(att, axis=1) * (1.0 - gamma) + g.weight * gamma
        return FuncAux(attention=mixed, x0=x0, edge_weight=g.weight), g

    if cfg.block == "hard_attention":
        att = _block_attention(bparams, cfg, g, x, stripe_plan)          # [E, H]
        if training:
            # the reference computes the subsampled weights under no_grad
            # (block_transformer_hard_attention.py:52-65)
            mean_att = jax.lax.stop_gradient(jnp.mean(att, axis=1))
            if cfg.use_flux:
                delta = jnp.linalg.norm(x[g.row] - x[g.col], axis=1)
                mean_att = mean_att * jax.lax.stop_gradient(delta)
            thresh = masked_quantile(mean_att, g.mask, 1.0 - cfg.att_samp_pct)
            keep = (mean_att > thresh) & g.mask
            norm_index = g.row if cfg.attention_norm_idx == 0 else g.col
            sampled = normalize_attention(mean_att, norm_index, g.num_nodes,
                                          mask=keep)
            g2 = g.with_edges(g.row, g.col, g.weight, keep)
            return FuncAux(attention=sampled, x0=x0, edge_weight=g.weight), g2
        mean_att = jnp.mean(att, axis=1)
        return FuncAux(attention=mean_att, x0=x0, edge_weight=g.weight), g

    raise NotImplementedError(f"block '{cfg.block}' not implemented yet")


def block_forward(bparams, cfg: Config, g: Graph, x, training: bool,
                  spmm_fn=None, stripe_plan=None):
    """Solve the IVP over [0, T]. Returns (z, stats, reg_states).

    Training uses cfg.method with cfg.adjoint's gradient path; evaluation
    always runs the plain (non-adjoint) primal (block_constant.py:35-70).
    ``spmm_fn(x, w)`` overrides the laplacian aggregation engine.
    """
    aux, g_run = build_aux(bparams, cfg, g, x, training, stripe_plan)

    reg_names, _ = active_regularizers(cfg)
    use_reg = training and len(reg_names) > 0

    if cfg.method == "cheby":
        # exact Chebyshev expm solve — only valid for the linear
        # frozen-attention laplacian RHS (see solvers.chebyshev)
        assert cfg.function == "laplacian" and not use_reg, (
            "method='cheby' requires function='laplacian' without "
            "regularisers (the RHS must be linear)")
        # the Chebyshev interval assumes spec(alpha*(A-I)) within [-2, 0],
        # i.e. alpha in [0, 1]; an unbounded learned alpha silently breaks it
        assert not cfg.no_alpha_sigmoid, (
            "method='cheby' requires sigmoid-bounded alpha "
            "(no_alpha_sigmoid=False): the expansion interval assumes "
            "alpha <= 1")
        from graph_neural_pde_tpu.ops.spmm import spmm
        from graph_neural_pde_tpu.solvers.chebyshev import linear_diffusion_solve

        if aux.attention is not None:
            w = (jnp.mean(aux.attention, axis=1)
                 if aux.attention.ndim == 2 else aux.attention)
        else:
            w = aux.edge_weight
        fp = bparams["func"]
        alpha = (fp["alpha_train"] if cfg.no_alpha_sigmoid
                 else jax.nn.sigmoid(fp["alpha_train"]))
        beta = fp["beta_train"] if cfg.add_source else 0.0
        matvec = ((lambda y: spmm_fn(y, w)) if spmm_fn is not None
                  else (lambda y: spmm(g_run, y, weight=w)))
        z, nfe = linear_diffusion_solve(
            matvec, x, alpha, beta, aux.x0,
            cfg.time, num_terms=cfg.cheby_terms or None)
        stats = {"nfe": nfe, "accepted": nfe,
                 "rejected": jnp.asarray(0, jnp.int32),
                 "hit_max_steps": jnp.asarray(False),
                 "t_final": jnp.asarray(cfg.time, jnp.float32)}
        return z, stats, ()

    rhs = make_rhs(cfg, g_run, spmm_fn=spmm_fn, stripe_plan=stripe_plan,
                   eval_fold=cfg.fold_epilogue and not training
                   and not use_reg)
    if use_reg:
        rhs_run = wrap_regularized(rhs, reg_names)
        state0 = (x,) + tuple(jnp.zeros((x.shape[0],)) for _ in reg_names)
    else:
        rhs_run = rhs
        state0 = x

    # bf16 ODE state for fixed-grid solves: the state (and thus the gathers
    # and aggregation payloads inside the RHS) carries in bfloat16, halving
    # the HBM traffic of the hot loop. Fixed-step only — an adaptive
    # controller's error estimate in bf16 (~3 decimal digits) would thrash
    # the step size. Error accumulates per step, so this fits the tuned
    # short fixed-grid solves (e.g. ogbn-arxiv rk4 with 4 steps).
    from graph_neural_pde_tpu.solvers.api import FIXED_METHODS
    lowp = cfg.dtype == "bfloat16" and cfg.method in FIXED_METHODS

    def func(p, t, y):
        out = rhs_run(p["f"], p["aux"], t, y)
        if lowp:
            out = jax.tree_util.tree_map(
                lambda o, yy: o.astype(yy.dtype), out, y)
        return out

    if lowp:
        state0 = jax.tree_util.tree_map(
            lambda s: s.astype(jnp.bfloat16), state0)

    params = {"f": bparams["func"], "aux": aux}
    opts = SolverOptions.from_config(cfg)
    adj_opts = SolverOptions.from_config(cfg, adjoint=True)
    stateT, stats = odeint(func, params, state0, 0.0, cfg.time, opts,
                           adjoint=cfg.adjoint and training,
                           adjoint_opts=adj_opts)

    from graph_neural_pde_tpu.models.functions import rhs_may_poison
    if rhs_may_poison(cfg):
        # The fast softmax path NaN-poisons its output on f32 exp
        # under/overflow instead of branching per evaluation (a lax.cond
        # inside the solver loop blocks cross-iteration pipelining of the
        # Pallas kernels: 151 vs 11 ms/eval measured at arxiv scale). Detect
        # the poison — or an adaptive controller driven into its step cap by
        # NaN error estimates — ONCE per solve and re-solve with the exact
        # per-segment softmax.
        rhs_exact = make_rhs(cfg, g_run, spmm_fn=spmm_fn,
                             stripe_plan=stripe_plan, exact_softmax=True)
        rhs_exact_run = (wrap_regularized(rhs_exact, reg_names) if use_reg
                         else rhs_exact)

        def func_exact(p, t, y):
            out = rhs_exact_run(p["f"], p["aux"], t, y)
            if lowp:
                out = jax.tree_util.tree_map(
                    lambda o, yy: o.astype(yy.dtype), out, y)
            return out

        leaves = jax.tree_util.tree_leaves(stateT)
        bad = jnp.any(jnp.stack(
            [jnp.any(~jnp.isfinite(l)) for l in leaves]))
        bad = bad | stats["hit_max_steps"]

        def resolve(_):
            return odeint(func_exact, params, state0, 0.0, cfg.time, opts,
                          adjoint=cfg.adjoint and training,
                          adjoint_opts=adj_opts)

        stateT, stats = jax.lax.cond(bad, resolve,
                                     lambda _: (stateT, stats), None)
    if lowp:
        stateT = jax.tree_util.tree_map(
            lambda s: s.astype(jnp.float32), stateT)
    if use_reg:
        z = stateT[0]
        reg_states = stateT[1:]
    else:
        z = stateT
        reg_states = ()
    return z, stats, reg_states
