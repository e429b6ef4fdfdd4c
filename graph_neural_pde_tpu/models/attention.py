"""Graph attention layers computed over padded edge arrays.

TPU-native re-design of the reference's sparse attention:
  * ``transformer_attention``  — SpGraphTransAttentionLayer
    (/root/reference/src/function_transformer_attention.py:59-214): multihead
    Q/K/V with four score types (scaled_dot, cosine_sim, pearson, exp_kernel)
    and the BLEND Beltrami split-space exp_kernel over (feature, positional)
    channels; softmax or squareplus normalisation over edge[attention_norm_idx].
  * ``gat_attention`` — SpGraphAttentionLayer
    (/root/reference/src/function_GAT_attention.py:71-115).

All scores are computed for every padded edge slot in one fused batch of
gathers + MXU matmuls; the per-destination normalisation is a masked segment
softmax — replacing PyG's scatter-softmax CUDA kernel.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp

from graph_neural_pde_tpu.config import Config
from graph_neural_pde_tpu.ops.graph import Graph
from graph_neural_pde_tpu.ops.scatter import (
    segment_softmax,
    segment_squareplus,
    segment_sum,
)
from graph_neural_pde_tpu.models.layers import linear_apply, linear_init


def _heads(x: jax.Array, h: int, d_k: int) -> jax.Array:
    """[N, h*d_k] -> [N, h, d_k] (contiguous per-head slices, matching the
    reference's view(-1, h, d_k) before its transpose)."""
    return x.reshape(x.shape[0], h, d_k)


def init_transformer_attention(key, cfg: Config, in_dim: int):
    h = cfg.heads
    att_dim = cfg.attention_dim
    assert att_dim % h == 0, (
        f"Number of heads ({h}) must be a factor of the dimension size ({att_dim})")
    d_k = att_dim // h
    keys = jax.random.split(key, 8)
    p = {}
    if cfg.beltrami and cfg.attention_type == "exp_kernel":
        feat_dim = in_dim - cfg.pos_enc_hidden_dim
        p["output_var_x"] = jnp.ones((1,))
        p["lengthscale_x"] = jnp.ones((1,))
        p["output_var_p"] = jnp.ones((1,))
        p["lengthscale_p"] = jnp.ones((1,))
        p["Qx"] = linear_init(keys[0], feat_dim, att_dim, "const1e-5")
        p["Vx"] = linear_init(keys[1], feat_dim, att_dim, "const1e-5")
        p["Kx"] = linear_init(keys[2], feat_dim, att_dim, "const1e-5")
        p["Qp"] = linear_init(keys[3], cfg.pos_enc_hidden_dim, att_dim, "const1e-5")
        p["Vp"] = linear_init(keys[4], cfg.pos_enc_hidden_dim, att_dim, "const1e-5")
        p["Kp"] = linear_init(keys[5], cfg.pos_enc_hidden_dim, att_dim, "const1e-5")
    else:
        if cfg.attention_type == "exp_kernel":
            p["output_var"] = jnp.ones((1,))
            p["lengthscale"] = jnp.ones((1,))
        p["Q"] = linear_init(keys[0], in_dim, att_dim, "const1e-5")
        p["V"] = linear_init(keys[1], in_dim, att_dim, "const1e-5")
        p["K"] = linear_init(keys[2], in_dim, att_dim, "const1e-5")
    p["Wout"] = linear_init(keys[6], d_k, in_dim, "const1e-5")
    return p


def _scores(cfg: Config, src: jax.Array, dst: jax.Array, d_k: int,
            params) -> jax.Array:
    """Per-edge, per-head raw scores [E, H] from gathered q/k [E, H, d_k]."""
    at = cfg.attention_type
    if at == "exp_kernel":
        var = params["output_var"]
        ls = params["lengthscale"]
        sq = jnp.sum((src - dst) ** 2, axis=-1)
        return var ** 2 * jnp.exp(-sq / (2.0 * ls ** 2))
    if at == "scaled_dot":
        return jnp.sum(src * dst, axis=-1) / math.sqrt(d_k)
    if at == "cosine_sim":
        eps = 1e-5
        num = jnp.sum(src * dst, axis=-1)
        den = jnp.maximum(jnp.linalg.norm(src, axis=-1), eps) * \
            jnp.maximum(jnp.linalg.norm(dst, axis=-1), eps)
        return num / den
    if at == "pearson":
        src_c = src - jnp.mean(src, axis=-1, keepdims=True)
        dst_c = dst - jnp.mean(dst, axis=-1, keepdims=True)
        eps = 1e-5
        num = jnp.sum(src_c * dst_c, axis=-1)
        den = jnp.maximum(jnp.linalg.norm(src_c, axis=-1), eps) * \
            jnp.maximum(jnp.linalg.norm(dst_c, axis=-1), eps)
        return num / den
    raise ValueError(f"unknown attention_type '{at}'")


def transformer_scores(params, cfg: Config, x: jax.Array, g: Graph,
                       edge_weight: Optional[jax.Array] = None,
                       stripe_plan=None):
    """Raw per-edge, per-head scores (pre-normalisation) and values.

    Gathers happen on the *flat* [N, attention_dim] projections and reshape
    per-head afterwards — on TPU an indexed gather's cost is set by the index
    count, so wide contiguous rows are the efficient granule; gathering
    [N, d_k, H] slices (the reference's layout) wastes most of each vector
    load. Returns (prods [E, H], v [N, H, d_k] | None).
    """
    h = cfg.heads
    d_k = cfg.attention_dim // h

    if cfg.beltrami and cfg.attention_type == "exp_kernel":
        label_index = cfg.feat_hidden_dim + cfg.pos_enc_hidden_dim
        pos = x[:, cfg.feat_hidden_dim:label_index]
        feat = jnp.concatenate([x[:, :cfg.feat_hidden_dim], x[:, label_index:]],
                               axis=1)
        # pack the row-side (Qx‖Qp) and col-side (Kx‖Kp) projections so each
        # side costs one gather
        q_pack = jnp.concatenate([linear_apply(params["Qx"], feat),
                                  linear_apply(params["Qp"], pos)], axis=1)
        k_pack = jnp.concatenate([linear_apply(params["Kx"], feat),
                                  linear_apply(params["Kp"], pos)], axis=1)
        src = q_pack[g.row]
        dst = k_pack[g.col]
        ad = cfg.attention_dim
        sx = jnp.sum((src[:, :ad].reshape(-1, h, d_k)
                      - dst[:, :ad].reshape(-1, h, d_k)) ** 2, axis=-1)
        sp = jnp.sum((src[:, ad:].reshape(-1, h, d_k)
                      - dst[:, ad:].reshape(-1, h, d_k)) ** 2, axis=-1)
        prods = (params["output_var_x"] ** 2
                 * jnp.exp(-sx / (2.0 * params["lengthscale_x"] ** 2))
                 * params["output_var_p"] ** 2
                 * jnp.exp(-sp / (2.0 * params["lengthscale_p"] ** 2)))
        v = None
    else:
        q = linear_apply(params["Q"], x)            # [N, att_dim]
        k = linear_apply(params["K"], x)
        v = _heads(linear_apply(params["V"], x), h, d_k)
        if (stripe_plan is not None and g.rows_sorted
                and g.row.shape[0] == stripe_plan.capacity):
            # row side rides the one-hot MXU gather (~4x the XLA gather's
            # issue-rate cost at arxiv scale); column side stays XLA. f32
            # one-hot: this path feeds the EXACT frozen attention
            from graph_neural_pde_tpu.ops.pallas.stripe import (
                stripe_gather_f32)
            src = stripe_gather_f32(stripe_plan, q).reshape(-1, h, d_k)
        else:
            src = q[g.row].reshape(-1, h, d_k)
        dst = k[g.col].reshape(-1, h, d_k)
        prods = _scores(cfg, src, dst, d_k, params)

    if cfg.reweight_attention and edge_weight is not None:
        prods = prods * edge_weight[:, None]
    return prods, v


def _normalize_scores(prods, cfg: Config, g: Graph, stripe_plan=None):
    """Per-segment softmax/squareplus of raw scores, on the stripe MXU
    kernels when a plan covers the row-softmax case (~25x the XLA scatter
    path at arxiv scale; exact, with a one-cond fallback)."""
    norm_index = g.row if cfg.attention_norm_idx == 0 else g.col
    use_stripe = (stripe_plan is not None and cfg.attention_norm_idx == 0
                  and g.rows_sorted
                  and prods.shape[0] == stripe_plan.capacity)
    if cfg.square_plus:
        if use_stripe:
            from graph_neural_pde_tpu.ops.pallas.stripe import (
                stripe_segment_squareplus)
            return stripe_segment_squareplus(stripe_plan, prods)
        return segment_squareplus(prods, norm_index, g.num_nodes, g.mask)
    if use_stripe:
        from graph_neural_pde_tpu.ops.pallas.stripe import (
            stripe_segment_softmax)
        return stripe_segment_softmax(
            stripe_plan, prods,
            lambda: segment_softmax(prods, norm_index, g.num_nodes, g.mask))
    return segment_softmax(prods, norm_index, g.num_nodes, g.mask)


def frozen_mean_attention(params, cfg: Config, x: jax.Array, g: Graph,
                          edge_weight: Optional[jax.Array] = None,
                          stripe_plan=None):
    """Head-MEAN attention as one padding-free 1-D [E] f32 array.

    Numerically equal to ``jnp.mean(apply_transformer_attention(...)[0],
    axis=1)`` (softmax is shift-invariant). The frozen-attention freeze is
    what GRAND-l training (every tuned best_params config,
    function_laplacian_diffusion.py:28-36) runs once per step.

    Two engines, one residual discipline (the caller checkpoints this, so
    only the [E] output survives into the training residual set — [E, H]
    f32 HBM buffers tile at 16-128x their logical bytes on v5e and OOMed
    the 16 GB chip when kept):

    * stripe (plan given, row-normalised): scores through the MXU one-hot
      row gather, exp/denominator through the stripe scatter/gather f32
      kernels, a GLOBAL stop-gradient max shift (no per-row first-slot
      gather, no in-checkpoint exact branch). A row whose every score
      underflows the global shift yields den=0 → w poisoned to NaN, and
      ONE lax.cond outside re-runs the exact 1-D composition — the same
      poison-and-resolve discipline as the solver fast path. Measured
      (probe15): the 1-D XLA composition below costs 317 ms fwd + 742 ms
      grad at arxiv scale — ~45% of the whole GRAND-l train step; the
      stripe path's ops measure in single-digit ms.
    * composition (no plan / norm_idx=1 / CPU): every per-edge array after
      the raw scores is 1-D [E]; normalisation uses the exact per-segment
      max, so it never needs a fallback. This is also the oracle the
      stripe path is verified against on device (bench.py).
    """
    norm_index = g.row if cfg.attention_norm_idx == 0 else g.col
    use_stripe = (stripe_plan is not None and cfg.attention_norm_idx == 0
                  and g.rows_sorted
                  and g.row.shape[0] == stripe_plan.capacity)
    if use_stripe:
        from graph_neural_pde_tpu.ops.pallas.stripe import (
            stripe_gather_f32, stripe_scatter_add_f32)
        prods, _ = transformer_scores(params, cfg, x, g, edge_weight,
                                      stripe_plan=stripe_plan)
        h = prods.shape[1]
        s = prods.astype(jnp.float32)
        v1 = jnp.asarray(stripe_plan.valid, jnp.float32)[:, None]
        gmax = jax.lax.stop_gradient(
            jnp.max(jnp.where(v1 > 0, s, -jnp.inf)))
        gmax = jnp.where(jnp.isfinite(gmax), gmax, 0.0)
        if cfg.square_plus:
            sm = s - gmax
            u = (sm + jnp.sqrt(sm * sm + 4.0)) * 0.5 * v1
        else:
            u = jnp.exp(s - gmax) * v1
        hp = max(8, h)
        if hp > h:
            u = jnp.pad(u, ((0, 0), (0, hp - h)))
        den = stripe_scatter_add_f32(stripe_plan, u)        # [N, hp]
        den_e = stripe_gather_f32(stripe_plan, den)
        # poison semantics: a valid row with den=0 (full underflow of the
        # global shift — impossible for squareplus, which is why it takes
        # the same expression) must NOT silently zero its weights; 0/0=NaN
        # propagates to the caller's finite-check. Invalid slots divide by
        # a sanitised 1 (the double-where: dividing by their true den=0
        # would poison the GRADIENT through the untaken where-branch).
        den_safe = jnp.where(v1 > 0, den_e[:, :h], 1.0)
        w2 = jnp.where(v1 > 0, u[:, :h], 0.0) / den_safe
        return jnp.mean(w2, axis=1)
    prods, _ = transformer_scores(params, cfg, x, g, edge_weight)
    h = prods.shape[1]
    if cfg.square_plus:
        # GLOBAL max over valid scores, all heads (reference utils.py:196)
        gmax = jnp.max(jnp.where(g.mask[:, None], prods, -jnp.inf))
        gmax = jnp.where(jnp.isfinite(gmax), gmax, 0.0)
    w = jnp.zeros((prods.shape[0],), jnp.float32)
    for i in range(h):
        s = prods[:, i].astype(jnp.float32)
        if cfg.square_plus:
            sm = s - gmax
            u = (sm + jnp.sqrt(sm * sm + 4.0)) * 0.5
            u = jnp.where(g.mask, u, 0.0)
            den = segment_sum(u, norm_index, g.num_nodes)
            w = w + u / (den[norm_index] + 1e-16)
        else:
            w = w + segment_softmax(s, norm_index, g.num_nodes, g.mask)
    return w / h


def apply_transformer_attention(params, cfg: Config, x: jax.Array, g: Graph,
                                edge_weight: Optional[jax.Array] = None,
                                stripe_plan=None):
    """Returns (attention [E, H], values [N, H, d_k] | None).

    x may be [features ‖ positional ‖ labels] in the Beltrami regime
    (function_transformer_attention.py:128-171).
    """
    prods, v = transformer_scores(params, cfg, x, g, edge_weight,
                                  stripe_plan=stripe_plan)
    attention = _normalize_scores(prods, cfg, g, stripe_plan)
    return attention, v


# ---------------------------------------------------------------------------
# GAT attention
# ---------------------------------------------------------------------------

def init_gat_attention(key, cfg: Config, in_dim: int):
    h = cfg.heads
    att_dim = cfg.attention_dim
    assert att_dim % h == 0, "Number of heads must be a factor of the dimension size"
    d_k = att_dim // h
    k1, k2, k3 = jax.random.split(key, 3)
    std_w = 1.414 * math.sqrt(2.0 / (in_dim + att_dim))
    std_wo = 1.414 * math.sqrt(2.0 / (att_dim + in_dim))
    std_a = 1.414 * math.sqrt(2.0 / (2 * d_k + 1))
    return {
        "W": std_w * jax.random.normal(k1, (in_dim, att_dim)),
        "Wout": std_wo * jax.random.normal(k2, (att_dim, in_dim)),
        "a": std_a * jax.random.normal(k3, (2 * d_k, 1)),
    }


def apply_gat_attention(params, cfg: Config, x: jax.Array, g: Graph,
                        stripe_plan=None):
    """Returns (attention [E, H], wx [N, att_dim]).

    GAT scoring a·[Wx_src ‖ Wx_dst] + LeakyReLU + segment softmax
    (function_GAT_attention.py:105-115).
    """
    h = cfg.heads
    d_k = cfg.attention_dim // h
    wx = x @ params["W"]                                # [N, att_dim]
    hh = _heads(wx, h, d_k)                             # [N, H, d_k]
    edge_h = jnp.concatenate([hh[g.row], hh[g.col]], axis=-1)  # [E, H, 2d_k]
    scores = jnp.einsum("ehd,d->eh", edge_h, params["a"][:, 0])
    scores = jax.nn.leaky_relu(scores, cfg.leaky_relu_slope)
    sp_cfg = dataclasses.replace(cfg, square_plus=False) \
        if cfg.square_plus else cfg
    attention = _normalize_scores(scores, sp_cfg, g, stripe_plan)
    return attention, wx
