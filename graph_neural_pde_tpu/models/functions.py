"""ODE right-hand sides: dx/dt = f(x(t), G).

Re-designs of the reference's ODEFunc family as *pure functions*
``rhs(fparams, aux, t, x) -> dx/dt`` where ``fparams`` are learnable
parameters and ``aux`` carries per-solve constants (frozen attention, x0):

  * laplacian   — LaplacianODEFunc (/root/reference/src/function_laplacian_diffusion.py:15-51)
  * transformer — ODEFuncTransformerAtt (function_transformer_attention.py:12-53),
    recomputing multihead attention at every RHS evaluation (GRAND-nl)
  * GAT         — ODEFuncAtt (function_GAT_attention.py:11-65)

plus the regulariser augmentation of regularized_ODE_function.py:36-81 as
jvp/vjp transforms of the RHS instead of torch.autograd.grad calls.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from graph_neural_pde_tpu.config import Config
from graph_neural_pde_tpu.models.attention import (
    apply_gat_attention,
    apply_transformer_attention,
    init_gat_attention,
    init_transformer_attention,
)
from graph_neural_pde_tpu.models.layers import linear_apply
from graph_neural_pde_tpu.ops.graph import Graph
from graph_neural_pde_tpu.ops.spmm import spmm, spmm_multihead


# score families the one-pass Mosaic kernels compute in-kernel
# (function_transformer_attention.py:193-206)
FUSED_MEGA_SCORES = ("scaled_dot", "cosine_sim", "pearson", "exp_kernel")


def norm1_fused_ok(cfg: Config) -> bool:
    """True when the column-normalised (attention_norm_idx=1) transformer
    RHS can ride the fused mirror-trick engine (fused_rhs.make_fused_ax_norm1)
    — still subject to the runtime checks: a SYMMETRIC stripe plan and
    state dim <= 128."""
    return (cfg.fused_attention_agg and not cfg.mix_features
            and cfg.attention_norm_idx == 1
            and cfg.function == "transformer"
            and cfg.attention_type in FUSED_MEGA_SCORES
            and not cfg.square_plus
            and not cfg.reweight_attention
            and cfg.rhs_payload_dtype == "bfloat16")


class FuncAux(NamedTuple):
    """Per-solve constants threaded through the solver's params pytree so the
    custom-VJP solvers can propagate gradients into them.

    attention : [E, H] (attention block) or [E] (mixed / hard_attention) or None
    x0        : source-term state, detached (the reference's set_x0 clones and
                detaches — /root/reference/src/base_classes.py:52-54)
    edge_weight: normalised adjacency weights (grad-free data constants)
    """

    attention: Optional[jax.Array]
    x0: jax.Array
    edge_weight: jax.Array


def init_func_params(key, cfg: Config, in_dim: int):
    """Learnable parameters shared by all ODE functions:
    alpha_train/beta_train scalars initialised to 0
    (/root/reference/src/base_classes.py:87-88), plus the attention layer's
    parameters when the function recomputes attention."""
    p = {
        "alpha_train": jnp.zeros(()),
        "beta_train": jnp.zeros(()),
        # Inert scalar whose COTANGENT carries the continuous adjoint's
        # measured backward NFE out of the custom-VJP backward solve
        # (solvers/api._adj_bwd): the reference meters backward function
        # evaluations with a host-side counter around loss.backward()
        # (/root/reference/src/run_GNN.py:90-95, utils.py:212-233), which
        # can't cross jit — a gradient side channel can. Never read by any
        # RHS; Trainer zeroes its gradient before the optimizer update.
        "adjoint_nfe_probe": jnp.zeros(()),
    }
    if cfg.function == "transformer":
        p["att"] = init_transformer_attention(key, cfg, in_dim)
    elif cfg.function == "GAT":
        p["att"] = init_gat_attention(key, cfg, in_dim)
    elif cfg.function != "laplacian":
        raise ValueError(f"unknown function '{cfg.function}'")
    return p


def _alpha(cfg: Config, fparams) -> jax.Array:
    a = fparams["alpha_train"]
    return a if cfg.no_alpha_sigmoid else jax.nn.sigmoid(a)


def _source(cfg: Config, fparams, f, aux: FuncAux):
    if cfg.add_source:
        return f + fparams["beta_train"] * aux.x0
    return f


def _col_gather(g: Graph, stripe_plan, x, pay_dt):
    """x[col] as the RHS payload. With a dual column plan the backward
    scatter rides the MXU stripe kernels (stripe.make_col_gather) instead of
    XLA's unsorted scatter-add — the round-2 train step's dominant cost."""
    if stripe_plan is not None and stripe_plan.col_plan is not None:
        from graph_neural_pde_tpu.ops.pallas.stripe import make_col_gather
        return make_col_gather(stripe_plan, g.col, out_dtype=pay_dt)(x)
    return x.astype(pay_dt)[g.col]


def _transformer_rhs_fused(fparams, aux: FuncAux, t, x, cfg: Config,
                           g: Graph, stripe_plan=None, exact_softmax=False,
                           eval_fold=False):
    """GRAND-nl RHS with the normalisation folded into the aggregation.

    For attention_norm_idx == 0 the softmax groups coincide with the SpMM
    output rows, so per-head numerator aggregates and denominators come out
    of ONE scatter by appending a ones column to the gathered features:

        agg[r, h, :] = Σ_e u_eh · [x[col_e] ‖ 1]
        ax[r]        = mean_h agg[r, h, :D] / (agg[r, h, D] + 1e-16)

    u uses the squareplus numerator verbatim (its max is global by reference
    semantics, utils.py:196-208) or exp with a global max (softmax up to f32
    underflow). Cuts ~6 indexed ops per RHS eval to ~3 — the dominant cost on
    TPU is per-index latency, not bandwidth.
    """
    from graph_neural_pde_tpu.models.attention import _scores, transformer_scores
    from graph_neural_pde_tpu.models.layers import linear_apply as _lin

    h = cfg.heads
    d = x.shape[1]
    d_k = cfg.attention_dim // h
    ap = fparams["att"]
    pay_dt = jnp.bfloat16 if cfg.rhs_payload_dtype == "bfloat16" else x.dtype
    beltrami_exp = cfg.beltrami and cfg.attention_type == "exp_kernel"

    # one-pass Mosaic kernel: scores + softmax numerators/denominators fused
    # with the aggregation, so only the x[col] gather touches HBM per eval.
    # All four score families (function_transformer_attention.py:193-206)
    # compute in-kernel from the same src/k_e operands; softmax
    # normalisation only (the global-max shift is gradient-free by
    # invariance; squareplus differentiates through the max and keeps the
    # composition). EXACT-softmax row-max shifts exist for scaled_dot; the
    # other families are bounded (cosine/pearson in [-1,1]; exp_kernel in
    # (0, var^2]) so the exact mode routes through the composition path in
    # the rare var-blowup case.
    use_mega = (stripe_plan is not None
                and cfg.attention_type in ("scaled_dot", "cosine_sim",
                                           "pearson", "exp_kernel")
                and not cfg.square_plus and not cfg.reweight_attention
                and not (exact_softmax
                         and cfg.attention_type != "scaled_dot"))
    if use_mega:
        from graph_neural_pde_tpu.ops.pallas.fused_rhs import (
            fused_rhs_ax, fused_rowmax)

        score = cfg.attention_type
        score_params = ()
        if beltrami_exp:
            # BLEND split-space kernel in-kernel (round-4; was excluded):
            # the (Qx over feature columns ‖ Qp over positional columns)
            # pair is ONE block-structured [D, 2·ATT] projection — feature
            # columns of x map to Qx rows in the left half, positional
            # columns to Qp rows in the right half, zeros elsewhere — so
            # the packed q/k operands cost the kernel exactly one extra
            # MXU column block and the score runs as "exp_kernel_beltrami"
            # with the block-diagonal head selector
            # (ref function_transformer_attention.py:133-171).
            score = "exp_kernel_beltrami"
            fh = cfg.feat_hidden_dim
            li = fh + cfg.pos_enc_hidden_dim
            ad = cfg.attention_dim

            def _pack_proj(px, pp):
                zx = jnp.zeros((li - fh, ad), px["w"].dtype)
                left = jnp.concatenate([px["w"][:fh], zx, px["w"][fh:]], 0)
                right = jnp.concatenate(
                    [jnp.zeros((fh, ad), pp["w"].dtype), pp["w"],
                     jnp.zeros((d - li, ad), pp["w"].dtype)], 0)
                return (jnp.concatenate([left, right], axis=1),
                        jnp.concatenate([px["b"], pp["b"]]))

            qw_big, qb_big = _pack_proj(ap["Qx"], ap["Qp"])
            kw_big, kb_big = _pack_proj(ap["Kx"], ap["Kp"])
            ap = dict(ap)
            ap["Q"] = {"w": qw_big, "b": qb_big}
            ap["K"] = {"w": kw_big, "b": kb_big}
            score_params = (ap["output_var_x"].reshape(()),
                            ap["lengthscale_x"].reshape(()),
                            ap["output_var_p"].reshape(()),
                            ap["lengthscale_p"].reshape(()))
        elif score == "exp_kernel":
            score_params = (ap["output_var"].reshape(()),
                            ap["lengthscale"].reshape(()))
        if cfg.attention_norm_idx == 1:
            # column-normalised softmax (norm_idx=1): the mirror-trick
            # engine — den_col from a reverse-score row-plan pass, recip
            # riding the u32-packed x|recip gather (make_fused_ax_norm1).
            # Gated by make_rhs: symmetric plan, mega score family,
            # softmax, bf16 payload, D <= 128.
            from graph_neural_pde_tpu.ops.pallas.fused_rhs import (
                make_fused_ax_norm1)
            op = make_fused_ax_norm1(stripe_plan, h, False, score, g.col)
            gmax = jnp.zeros((), jnp.float32)
            ax, den = op(ap["Q"]["w"], ap["Q"]["b"], ap["K"]["w"],
                         ap["K"]["b"], x, gmax, score_params)
            den_h = den[:, :h]
            deg = jnp.asarray(stripe_plan.node_degree)
            # symmetric edge set: in-degree == out-degree, so the row
            # degrees guard the COLUMN denominators
            bad = jnp.any(((den_h <= 0.0) & (deg[:, None] > 0))
                          | ~jnp.isfinite(den_h))
            ax = jnp.where(bad, jnp.asarray(jnp.nan, ax.dtype), ax)
            f = _alpha(cfg, fparams) * (ax - x)
            return _source(cfg, fparams, f, aux)
        if eval_fold and not exact_softmax:
            # eval/no-grad solve: the whole f = alpha·(ax − x) epilogue +
            # per-row guard folds into the kernel's final write — the
            # solver axpy consumes f with no XLA-side ax/x/guard passes
            # (fused_rhs.fused_rhs_f; never differentiated, see blocks.py
            # gating on `training`).
            from graph_neural_pde_tpu.ops.pallas.fused_rhs import fused_rhs_f
            f = fused_rhs_f(stripe_plan, h, score,
                            ap["Q"]["w"], ap["Q"]["b"],
                            ap["K"]["w"], ap["K"]["b"], x, g.col,
                            jnp.bfloat16
                            if cfg.rhs_payload_dtype == "bfloat16" else None,
                            _alpha(cfg, fparams), score_params)
            return _source(cfg, fparams, f, aux)
        use_sym = (cfg.sym_backward if cfg.sym_backward is not None
                   else True)
        if use_sym and stripe_plan.symmetric and not exact_softmax:
            # symmetric edge set: the end-to-end op whose backward relocates
            # each edge's x[col] cotangent to its reverse edge — no
            # permutation gather, no column plan (fused_rhs.make_fused_ax_sym).
            # Opt-in: see Config.sym_backward for the measured trade.
            from graph_neural_pde_tpu.ops.pallas.fused_rhs import (
                make_fused_ax_sym)
            op = make_fused_ax_sym(stripe_plan, h, False, score, g.col,
                                   jnp.bfloat16
                                   if cfg.rhs_payload_dtype == "bfloat16"
                                   else None)
            gmax = jnp.zeros((), jnp.float32)
            ax, den = op(ap["Q"]["w"], ap["Q"]["b"], ap["K"]["w"],
                         ap["K"]["b"], x, gmax, score_params)
            den_h = den[:, :h]
            deg = jnp.asarray(stripe_plan.node_degree)
            bad = jnp.any(((den_h <= 0.0) & (deg[:, None] > 0))
                          | ~jnp.isfinite(den_h))
            ax = jnp.where(bad, jnp.asarray(jnp.nan, ax.dtype), ax)
            f = _alpha(cfg, fparams) * (ax - x)
            return _source(cfg, fparams, f, aux)
        if stripe_plan.col_plan is not None and not exact_softmax:
            # col-plan backward (default): dx recomputed on the column side
            # from ONE hot gather of a packed node table — the per-edge
            # cotangent never exists in HBM (no 33.8 ms cold permutation;
            # see fused_rhs.make_fused_ax_colplan).
            from graph_neural_pde_tpu.ops.pallas.fused_rhs import (
                make_fused_ax_colplan)
            op = make_fused_ax_colplan(stripe_plan, h, False, score, g.col,
                                       jnp.bfloat16
                                       if cfg.rhs_payload_dtype == "bfloat16"
                                       else None)
            gmax = jnp.zeros((), jnp.float32)
            ax, den = op(ap["Q"]["w"], ap["Q"]["b"], ap["K"]["w"],
                         ap["K"]["b"], x, gmax, score_params)
            den_h = den[:, :h]
            deg = jnp.asarray(stripe_plan.node_degree)
            bad = jnp.any(((den_h <= 0.0) & (deg[:, None] > 0))
                          | ~jnp.isfinite(den_h))
            ax = jnp.where(bad, jnp.asarray(jnp.nan, ax.dtype), ax)
            f = _alpha(cfg, fparams) * (ax - x)
            return _source(cfg, fparams, f, aux)
        x_g = _col_gather(g, stripe_plan, x, pay_dt)
        # softmax is shift-invariant, so NO max pass is needed: exp runs
        # unshifted (exact while scores stay within f32's ±88 exp range).
        # Both failure modes — a whole segment underflowing to 0 OR any
        # score overflowing to inf — poison the output with NaN via an
        # elementwise select; block_forward re-solves with exact_softmax
        # once, OUTSIDE the solver loop. (A lax.cond here, inside the
        # solver's scan/while body, measured 151 ms/eval vs 11 ms without —
        # the branch kills XLA's ability to pipeline the Pallas kernel
        # across loop iterations.)
        gmax = jnp.zeros((), jnp.float32)   # f32: its cotangent is f32
        shifts = None
        if exact_softmax:
            # EXACT mode: shift every edge by its row's true score max
            # (fused_rowmax) — exp can no longer leave f32 range and ax is
            # invariant to per-row shifts, so this equals the per-segment
            # softmax composition without its [cap, ·]-padded HBM buffers
            # (~5 GB at arxiv scale in the training step). Shifts carry no
            # gradient (shift-invariance) — 1-D [cap] gathers, stop_grad.
            sg = jax.lax.stop_gradient
            q = sg(x.astype(jnp.float32) @ ap["Q"]["w"] + ap["Q"]["b"])
            smax = fused_rowmax(stripe_plan, q, sg(ap["K"]["w"]),
                                sg(ap["K"]["b"]), heads=h, x_g=sg(x_g))
            shifts = tuple(smax[:, hh][g.row] for hh in range(h))
        # undifferentiated forward = scratch-accumulator kernel (the [N,H·D]
        # numerators never reach HBM); under vjp the same kernel also
        # flushes the bf16 num residual
        ax, den = fused_rhs_ax(stripe_plan, h, False, score,
                               ap["Q"]["w"], ap["Q"]["b"],
                               ap["K"]["w"], ap["K"]["b"],
                               x, x_g, gmax, shifts, score_params)
        if not exact_softmax:
            den_h = den[:, :h]
            deg = jnp.asarray(stripe_plan.node_degree)
            bad = jnp.any(((den_h <= 0.0) & (deg[:, None] > 0))
                          | ~jnp.isfinite(den_h))
            ax = jnp.where(bad, jnp.asarray(jnp.nan, ax.dtype), ax)
        f = _alpha(cfg, fparams) * (ax - x)
        return _source(cfg, fparams, f, aux)

    if not beltrami_exp:
        # Column side: ONE 128-aligned gather of x[col], then project
        # k_e = x[col] @ K per edge. (x@K)[col] and x[col]@K are the same
        # contraction; measured on v5e the unaligned 192-wide packed gather
        # costs 50 ms vs 13.5 ms for the aligned 128-wide one, and the E-row
        # projection is ~1 ms of MXU.
        q = _lin(ap["Q"], x)
        gathered = _col_gather(g, stripe_plan, x, pay_dt)     # [E, D]
        k_e = (gathered @ ap["K"]["w"].astype(gathered.dtype)
               + ap["K"]["b"].astype(gathered.dtype))
        if stripe_plan is not None:
            from graph_neural_pde_tpu.ops.pallas.stripe import stripe_gather
            src = stripe_gather(stripe_plan, q).reshape(-1, h, d_k)
        else:
            src = q[g.row].reshape(-1, h, d_k)
        dst = k_e.astype(x.dtype).reshape(-1, h, d_k)
        prods = _scores(cfg, src, dst, d_k, ap)
        if cfg.reweight_attention:
            prods = prods * aux.edge_weight[:, None]
    else:
        prods, _v = transformer_scores(ap, cfg, x, g,
                                       edge_weight=aux.edge_weight)
        gathered = _col_gather(g, stripe_plan, x, pay_dt)

    gmax = jnp.max(jnp.where(g.mask[:, None], prods, -jnp.inf))
    gmax = jnp.where(jnp.isfinite(gmax), gmax, 0.0)
    s = prods - gmax
    if cfg.square_plus:
        u = (s + jnp.sqrt(s * s + 4.0)) / 2.0
        u = jnp.where(g.mask[:, None], u, 0.0)               # [E, H]
        ax = _fused_normalized_aggregate(cfg, g, u, gathered, x, stripe_plan)
    else:
        u = jnp.where(g.mask[:, None], jnp.exp(s), 0.0)
        ax = _softmax_aggregate_guarded(cfg, g, prods, u, gathered, x,
                                        stripe_plan, exact_softmax)
    f = _alpha(cfg, fparams) * (ax - x)
    return _source(cfg, fparams, f, aux)


def _softmax_aggregate_guarded(cfg: Config, g: Graph, prods, u, gathered_x,
                               x, stripe_plan=None, exact_softmax=False):
    """Softmax aggregation, exact up to a NaN-poisoned underflow escape.

    The fused path substitutes ONE global max for the per-segment softmax
    maxes — identical result unless a whole segment's exp underflows in f32
    (all its scores ≥ ~88 below the global max), where 0/(0+eps) would
    silently zero that node instead of averaging. With ``exact_softmax``
    the per-segment softmax runs directly (the fallback path). Otherwise
    any exact-zero exp on a valid edge (only possible via underflow)
    poisons the output with NaN — an elementwise select, NOT a lax.cond:
    a cond inside the solver's scan/while body blocks cross-iteration
    pipelining of the Pallas kernels (measured 151 vs 11 ms/eval).
    block_forward detects the NaN after the solve and re-solves once with
    the exact RHS.
    """
    from graph_neural_pde_tpu.ops.scatter import segment_softmax

    if exact_softmax:
        att = segment_softmax(prods, g.row, g.num_nodes, mask=g.mask)
        att = jnp.where(g.mask[:, None], att, 0.0)
        return _fused_normalized_aggregate(cfg, g, att, gathered_x, x,
                                           stripe_plan)

    underflowed = jnp.any((u == 0.0) & g.mask[:, None])
    ax = _fused_normalized_aggregate(cfg, g, u, gathered_x, x, stripe_plan)
    return jnp.where(underflowed, jnp.asarray(jnp.nan, ax.dtype), ax)


def _fused_normalized_aggregate(cfg: Config, g: Graph, u, gathered_x, x,
                                stripe_plan=None):
    """Shared tail of the fused RHS paths: per-head numerators and
    denominators from one aggregation pass, then mean over heads.

    u: [E, H] unnormalised positive scores (masked); gathered_x: x[col].

    Stripe engine: the dual-output MXU kernel keeps the wide operand at the
    128-aligned width H·D and lets the narrow denominators share its one-hot
    (a ones column would make it H·(D+1) — lane-misaligned, measured 2.3x
    slower). XLA engine: ones-column single segment-sum (one indexed op).
    """
    h = cfg.heads
    d = x.shape[1]
    if stripe_plan is not None:
        from graph_neural_pde_tpu.ops.pallas.stripe import stripe_scatter_add2
        pay_dt = gathered_x.dtype
        vals = (u[:, :, None].astype(pay_dt)
                * gathered_x[:, None, :]).reshape(-1, h * d)
        hp = max(8, h)                       # narrow operand, lane-padded
        u_pad = jnp.zeros((u.shape[0], hp), pay_dt).at[:, :h].set(
            u.astype(pay_dt))
        num, den = stripe_scatter_add2(stripe_plan, vals, u_pad)
        # 2D-slice divide: the [N, h, d] reshape+broadcast form costs 2.4x
        # more on v5e (3.54 vs 1.44 ms at arxiv scale — the middle dim of 2
        # forces a relayout)
        recip = 1.0 / (den[:, :h] + 1e-16)
        out = num[:, :d] * recip[:, 0:1]
        for hh in range(1, h):
            out = out + num[:, hh * d:(hh + 1) * d] * recip[:, hh:hh + 1]
        return out * (1.0 / h)
    ones = jnp.ones((gathered_x.shape[0], 1), x.dtype)
    feat1 = jnp.concatenate([gathered_x.astype(x.dtype), ones], axis=1)
    vals = (u[:, :, None] * feat1[:, None, :]).reshape(-1, h * (d + 1))
    agg = jax.ops.segment_sum(vals, g.row, num_segments=g.num_nodes,
                              indices_are_sorted=g.rows_sorted)
    agg = agg.reshape(g.num_nodes, h, d + 1)
    return jnp.mean(agg[:, :, :d] / (agg[:, :, d:] + 1e-16), axis=1)


def _gat_rhs_fused(fparams, aux: FuncAux, t, x, cfg: Config, g: Graph,
                   stripe_plan=None, exact_softmax=False):
    """GAT RHS with separable scores and folded normalisation.

    The GAT score a·[Wx_row ‖ Wx_col] (function_GAT_attention.py:110-113)
    splits into s_src[row] + s_dst[col], so the per-edge work is two scalar
    gathers — s_dst packs into the x[col] gather table, leaving the same
    3-indexed-op structure as the fused transformer path.
    """
    ap = fparams["att"]
    h = cfg.heads
    d = x.shape[1]
    d_k = cfg.attention_dim // h
    pay_dt = jnp.bfloat16 if cfg.rhs_payload_dtype == "bfloat16" else x.dtype
    wx = x @ ap["W"]                                          # [N, att_dim]
    hh = wx.reshape(-1, h, d_k)
    a_vec = ap["a"][:, 0]
    s_src = jnp.einsum("nhd,d->nh", hh, a_vec[:d_k])          # [N, H]
    # s_dst[col] = x[col] @ (W·a_dst folded per head) — lets the column side
    # stay ONE 128-aligned gather of x (an [H+D]-wide pack is lane-misaligned)
    w_dst = jnp.einsum("dhf,f->dh", ap["W"].reshape(d, h, d_k),
                       a_vec[d_k:])

    gathered = _col_gather(g, stripe_plan, x, pay_dt)         # [E, D]
    s_dst_e = (gathered @ w_dst.astype(gathered.dtype)).astype(x.dtype)
    if stripe_plan is not None:
        from graph_neural_pde_tpu.ops.pallas.stripe import stripe_gather
        s_src_e = stripe_gather(stripe_plan, s_src)
    else:
        s_src_e = s_src[g.row]
    scores = jax.nn.leaky_relu(s_src_e + s_dst_e,
                               cfg.leaky_relu_slope)          # [E, H]

    gmax = jnp.max(jnp.where(g.mask[:, None], scores, -jnp.inf))
    gmax = jnp.where(jnp.isfinite(gmax), gmax, 0.0)
    u = jnp.where(g.mask[:, None], jnp.exp(scores - gmax), 0.0)
    ax = _softmax_aggregate_guarded(cfg, g, scores, u, gathered, x,
                                    stripe_plan, exact_softmax)
    f = _alpha(cfg, fparams) * (ax - x)
    return _source(cfg, fparams, f, aux)


def rhs_may_poison(cfg: Config) -> bool:
    """True when make_rhs's default path can NaN-poison its output on
    softmax under/overflow — i.e. the caller must re-solve with
    make_rhs(..., exact_softmax=True) if the solved state is non-finite."""
    fused0 = (cfg.fused_attention_agg and not cfg.mix_features
              and cfg.attention_norm_idx == 0)
    if cfg.function in ("transformer", "GAT") and fused0:
        return not cfg.square_plus
    # norm_idx=1 transformer mega path (may be plan-gated off at runtime —
    # then the exact composition runs and the poison cond never fires)
    return norm1_fused_ok(cfg)


def make_rhs(cfg: Config, g: Graph, spmm_fn: Optional[Callable] = None,
             stripe_plan=None, exact_softmax: bool = False,
             eval_fold: bool = False) -> Callable:
    """Build rhs(fparams, aux, t, x) for cfg.function over graph structure g.

    g's row/col/mask are static-shaped index data; all differentiable inputs
    flow through (fparams, aux). ``spmm_fn(x, w)`` overrides the aggregation
    engine (e.g. the Pallas blocked kernel over a plan-ordered graph).

    ``exact_softmax``: normalise attention with the exact per-segment
    softmax instead of the global-shift fast path. The default fast path
    poisons its output with NaN if f32 exp under/overflowed (see
    rhs_may_poison); callers re-solve with this flag set when that happens.
    """
    if spmm_fn is None:
        def spmm_fn(x, w):
            return spmm(g, x, weight=w)

    if cfg.function == "laplacian":

        def rhs(fparams, aux: FuncAux, t, x):
            # adjacency source: frozen attention (mean-head or scalar) or
            # normalised edge weights — sparse_multiply dispatch semantics of
            # function_laplacian_diffusion.py:28-36
            if aux.attention is not None:
                w = (jnp.mean(aux.attention, axis=1)
                     if aux.attention.ndim == 2 else aux.attention)
            else:
                w = aux.edge_weight
            ax = spmm_fn(x, w)
            f = _alpha(cfg, fparams) * (ax - x)
            return _source(cfg, fparams, f, aux)

        return rhs

    if cfg.function == "transformer":
        use_fused = (cfg.fused_attention_agg and not cfg.mix_features
                     and cfg.attention_norm_idx == 0)
        # norm_idx=1 rides the fused mirror-trick engine only on a symmetric
        # stripe plan with the fast (non-exact) softmax; the exact re-solve
        # and every other norm1 config take the composition below, whose
        # segment softmax normalises over g.col (models/attention.py).
        use_fused1 = (norm1_fused_ok(cfg) and not exact_softmax
                      and stripe_plan is not None
                      and getattr(stripe_plan, "symmetric", False))

        def rhs(fparams, aux: FuncAux, t, x):
            if use_fused or (use_fused1 and x.shape[1] <= 128):
                return _transformer_rhs_fused(fparams, aux, t, x, cfg, g,
                                              stripe_plan, exact_softmax,
                                              eval_fold)
            attention, v = apply_transformer_attention(
                fparams["att"], cfg, x, g, edge_weight=aux.edge_weight)
            if cfg.mix_features:
                vx = jnp.mean(spmm_multihead(g, attention, v), axis=1)  # [N, d_k]
                ax = linear_apply(fparams["att"]["Wout"], vx)
            else:
                ax = spmm(g, x, weight=jnp.mean(attention, axis=1))
            f = _alpha(cfg, fparams) * (ax - x)
            return _source(cfg, fparams, f, aux)

        return rhs

    if cfg.function == "GAT":
        use_fused_gat = (cfg.fused_attention_agg and not cfg.mix_features
                         and cfg.attention_norm_idx == 0)

        def rhs(fparams, aux: FuncAux, t, x):
            if use_fused_gat:
                return _gat_rhs_fused(fparams, aux, t, x, cfg, g, stripe_plan,
                                      exact_softmax)
            attention, wx = apply_gat_attention(fparams["att"], cfg, x, g)
            # GAT aggregates the SAME value matrix under every head
            # (function_GAT_attention.py:32-44), and spmm is linear in the
            # weights, so mean_h spmm(att_h, V) == spmm(mean_h att, V):
            # one spmm instead of materialising [E, H, D]
            mean_att = jnp.mean(attention, axis=1)
            if cfg.mix_features:
                ax = spmm(g, wx, weight=mean_att) @ fparams["att"]["Wout"]
            else:
                ax = spmm(g, x, weight=mean_att)
            f = _alpha(cfg, fparams) * (ax - x)
            return _source(cfg, fparams, f, aux)

        return rhs

    raise ValueError(f"unknown function '{cfg.function}'")


# ---------------------------------------------------------------------------
# regularisers (integrated alongside the state)
# ---------------------------------------------------------------------------

def quadratic_cost(x, t, dx, rhs_x):
    """kinetic energy 0.5·mean(dx², per node) — regularized_ODE_function.py:66-69."""
    return 0.5 * jnp.mean(dx * dx, axis=-1)


def directional_derivative(x, t, dx, rhs_x):
    """0.5·mean(((∂f/∂x)ᵀ f)², per node) — regularized_ODE_function.py:57-63."""
    _, vjp_fn = jax.vjp(rhs_x, x)
    (ddx,) = vjp_fn(dx)
    return 0.5 * jnp.mean(ddx * ddx, axis=-1)


def total_derivative(x, t, dx, rhs_x):
    """Directional derivative plus ∂f/∂t — regularized_ODE_function.py:36-54.
    All shipped RHS are autonomous, so the time term vanishes identically."""
    _, vjp_fn = jax.vjp(rhs_x, x)
    (ddx,) = vjp_fn(dx)
    return 0.5 * jnp.mean(ddx * ddx, axis=-1)


def jacobian_frobenius(x, t, dx, rhs_x):
    """Per-node divergence trace(∂f/∂x) by brute force over feature dims —
    the actual computation of divergence_bf (regularized_ODE_function.py:72-81)."""
    d = x.shape[1]

    def diag_entry(i):
        basis = jnp.zeros_like(x).at[:, i].set(1.0)
        _, jvp_out = jax.jvp(rhs_x, (x,), (basis,))
        return jvp_out[:, i]

    cols = jax.vmap(diag_entry)(jnp.arange(d))          # [D, N]
    return jnp.sum(cols, axis=0)


REGULARIZATION_FNS = {
    "kinetic_energy": quadratic_cost,
    "jacobian_norm2": jacobian_frobenius,
    "total_deriv": total_derivative,
    "directional_penalty": directional_derivative,
}


def active_regularizers(cfg: Config):
    """(names, coeffs) of enabled regularisers, in registry order
    (base_classes.py:10-29)."""
    names, coeffs = [], []
    for name in REGULARIZATION_FNS:
        coeff = getattr(cfg, name)
        if coeff is not None:
            names.append(name)
            coeffs.append(coeff)
    return tuple(names), tuple(coeffs)


def wrap_regularized(rhs: Callable, reg_names):
    """Lift rhs to tuple states (x, r_1..r_k): dr_i/dt = reg_i(x, dx)
    (regularized_ODE_function.py:17-29)."""
    if not reg_names:
        return rhs
    fns = [REGULARIZATION_FNS[n] for n in reg_names]

    def reg_rhs(fparams, aux, t, state):
        x = state[0]

        def rhs_x(xx):
            return rhs(fparams, aux, t, xx)

        dx = rhs_x(x)
        rdots = tuple(fn(x, t, dx, rhs_x) for fn in fns)
        return (dx,) + rdots

    return reg_rhs
