"""One-pass fused attention-RHS kernel: score + exp + aggregate in Mosaic.

The v2 composition (ops/pallas/stripe.py + XLA elementwise) still makes
three HBM round trips per RHS evaluation beyond the unavoidable x[col]
gather: the stripe q-gather's [E, ATT] output, the [E, H·D] vals operand of
the scatter, and the score/exp intermediates. This kernel performs, per
edge chunk, entirely in VMEM:

    src   = onehot(row) @ q_block            (row-side gather, MXU)
    k_e   = x_e @ K_w + K_b                  (column-side projection, MXU)
    s     = (src ⊙ k_e) @ head_selector / √d_k          [chunk, H]
    u     = exp(s − gmax)  or  squareplus(s − gmax)
    num  += onehotᵀ @ (u_h ⊙ x_e)   (per head)           [block_n, H·D]
    den  += onehotᵀ @ u                                  [block_n, Hp]

so the only per-RHS HBM traffic is reading x_e once and writing the node
aggregates. Scaled-dot scores only (the ogbn-arxiv tuned family); the other
score types keep the composition path. Backward is a hand-derived VJP over
the existing stripe primitives (see _fused_bwd) — gradients match the
composition, pinned by tests.

Reference behaviour being fused: one RHS evaluation of GRAND-nl
(/root/reference/src/function_transformer_attention.py:38-53 — attention
recomputed per eval + spmm aggregation + PyG scatter softmax).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from graph_neural_pde_tpu.ops.pallas.stripe import (
    StripePlan,
    _on_tpu,
    _stripe_gather2_call,
    _stripe_scatter_call,
    _stripe_gather_call,
)


def _head_selector(att_dim: int, heads: int, hp: int) -> np.ndarray:
    """[ATT, Hp] 0/1 matrix summing per-head feature slices."""
    sel = np.zeros((att_dim, hp), np.float32)
    d_k = att_dim // heads
    for h in range(heads):
        sel[h * d_k:(h + 1) * d_k, h] = 1.0
    return sel


# score families carrying learnable scalar extras through the kernels:
# exp_kernel (output_var, lengthscale); exp_kernel_beltrami — the BLEND
# split-space product kernel (function_transformer_attention.py:133-171) —
# (output_var_x, lengthscale_x, output_var_p, lengthscale_p)
_N_SCORE_EXTRAS = {"exp_kernel": 2, "exp_kernel_beltrami": 4}


def _score_selector(score: str, att_dim: int, heads: int, hp: int):
    """The head selector for a score family. For exp_kernel_beltrami the
    operand rows are the PACKED (x-projection ‖ p-projection) — att_dim is
    2·ATT — and the selector is the [2·ATT, 2·Hp] block diagonal: columns
    [0:Hp] sum the x-space head slices, [Hp:2Hp] the p-space ones."""
    if score == "exp_kernel_beltrami":
        assert att_dim % 2 == 0
        half = _head_selector(att_dim // 2, heads, hp)
        sel = np.zeros((att_dim, 2 * hp), np.float32)
        sel[: att_dim // 2, :hp] = half
        sel[att_dim // 2:, hp:] = half
        return sel
    return _head_selector(att_dim, heads, hp)


def _shift_matrix(shift_refs, chunk, heads, hp):
    """[chunk, hp] per-edge shift from per-head 1-D refs (1-D [cap] f32
    arrays tile padding-free in HBM; a [cap, hp] form would pad 16x)."""
    cols = [shift_refs[h][:][:, None] for h in range(heads)]
    if hp > heads:
        cols.append(jnp.zeros((chunk, hp - heads), jnp.float32))
    return jnp.concatenate(cols, axis=1)


_EPS_NORM = 1e-5        # reference cosine/pearson eps (models.attention._scores)


def _kernel_scores(src, k_e, sel, d_k, score, sp_extra, dtype):
    """Per-head scores [chunk, hp] from src/k_e [chunk, ATT] — all four
    reference score families (function_transformer_attention.py:193-206)
    via head-selector MXU contractions.

    Returns (s, aux) where ``aux`` carries the per-head intermediates the
    backward needs. sp_extra: (var, ls) scalars for exp_kernel.
    """
    def selmm(a):
        return jnp.dot(a.astype(dtype), sel.astype(dtype),
                       preferred_element_type=jnp.float32)

    sp = selmm((src * k_e).astype(dtype))                # Σ_h src·k
    if score == "scaled_dot":
        return sp / math.sqrt(d_k), (sp,)
    ss = selmm((src * src).astype(dtype))
    kk = selmm((k_e * k_e).astype(dtype))
    if score == "cosine_sim":
        ns = jnp.maximum(jnp.sqrt(jnp.maximum(ss, 0.0)), _EPS_NORM)
        nk = jnp.maximum(jnp.sqrt(jnp.maximum(kk, 0.0)), _EPS_NORM)
        return sp / (ns * nk), (sp, ss, kk, ns, nk)
    if score == "pearson":
        ms = selmm(src) / d_k
        mk = selmm(k_e) / d_k
        spc = sp - d_k * ms * mk
        ssc = jnp.maximum(ss - d_k * ms * ms, 0.0)
        kkc = jnp.maximum(kk - d_k * mk * mk, 0.0)
        ns = jnp.maximum(jnp.sqrt(ssc), _EPS_NORM)
        nk = jnp.maximum(jnp.sqrt(kkc), _EPS_NORM)
        return spc / (ns * nk), (spc, ssc, kkc, ns, nk, ms, mk)
    if score == "exp_kernel":
        var, ls = sp_extra
        dist = jnp.maximum(ss - 2.0 * sp + kk, 0.0)
        s = var * var * jnp.exp(-dist / (2.0 * ls * ls))
        return s, (dist, s)
    if score == "exp_kernel_beltrami":
        # BLEND split-space product kernel over packed (x ‖ p) operands
        # [chunk, 2·ATT] with the block-diagonal selector [2·ATT, 2·Hp]
        # (function_transformer_attention.py:133-171):
        #   s_h = varx²·exp(−|Δx_h|²/2lsx²) · varp²·exp(−|Δp_h|²/2lsp²)
        varx, lsx, varp, lsp = sp_extra
        hp = sel.shape[1] // 2
        dist2 = jnp.maximum(ss - 2.0 * sp + kk, 0.0)     # [chunk, 2·Hp]
        sx, sp2 = dist2[:, :hp], dist2[:, hp:]
        s = ((varx * varx) * jnp.exp(-sx / (2.0 * lsx * lsx))
             * (varp * varp) * jnp.exp(-sp2 / (2.0 * lsp * lsp)))
        return s, (sx, sp2, s)
    raise ValueError(f"unknown score '{score}'")


def _kernel_scores_bwd(ds, src, k_e, sel, selT_mm, d_k, score, sp_extra,
                       aux):
    """Map d/ds [chunk, hp] back to (dsrc, dk_e [chunk, ATT], extras).

    ``selT_mm(a)`` expands per-head [chunk, hp] scalars over head feature
    slices ([chunk, ATT]). Returns (dsrc, dke, dextras) — dextras is a
    tuple of scalar accumulands matching _N_SCORE_EXTRAS[score] (empty for
    the parameter-free families).
    """
    if score == "scaled_dot":
        dse = selT_mm(ds) / math.sqrt(d_k)
        return dse * k_e, dse * src, ()
    if score == "cosine_sim":
        sp, ss, kk, ns, nk = aux
        s = sp / (ns * nk)
        gs = (jnp.sqrt(jnp.maximum(ss, 0.0)) > _EPS_NORM).astype(jnp.float32)
        gk = (jnp.sqrt(jnp.maximum(kk, 0.0)) > _EPS_NORM).astype(jnp.float32)
        a = ds / (ns * nk)
        bs = ds * s * gs / jnp.maximum(ss, _EPS_NORM * _EPS_NORM)
        bk = ds * s * gk / jnp.maximum(kk, _EPS_NORM * _EPS_NORM)
        dsrc = selT_mm(a) * k_e - selT_mm(bs) * src
        dke = selT_mm(a) * src - selT_mm(bk) * k_e
        return dsrc, dke, ()
    if score == "pearson":
        spc, ssc, kkc, ns, nk, ms, mk = aux
        s = spc / (ns * nk)
        gs = (jnp.sqrt(ssc) > _EPS_NORM).astype(jnp.float32)
        gk = (jnp.sqrt(kkc) > _EPS_NORM).astype(jnp.float32)
        a = ds / (ns * nk)
        bs = ds * s * gs / jnp.maximum(ssc, _EPS_NORM * _EPS_NORM)
        bk = ds * s * gk / jnp.maximum(kkc, _EPS_NORM * _EPS_NORM)
        src_c = src - selT_mm(ms)
        k_c = k_e - selT_mm(mk)
        v_src = selT_mm(a) * k_c - selT_mm(bs) * src_c
        v_ke = selT_mm(a) * src_c - selT_mm(bk) * k_c
        # centering projection: subtract the per-head mean of each gradient
        def center(v):
            m = jnp.dot(v.astype(jnp.float32), sel.astype(jnp.float32),
                        preferred_element_type=jnp.float32) / d_k
            return v - selT_mm(m)
        return center(v_src), center(v_ke), ()
    if score == "exp_kernel":
        var, ls = sp_extra
        dist, s = aux
        c = ds * s / (ls * ls)                       # [chunk, hp]
        diff = src - k_e
        dsrc = -selT_mm(c) * diff
        dvar = jnp.sum(ds * (2.0 * s / var))
        dls = jnp.sum(ds * s * dist) / (ls ** 3)
        return dsrc, -dsrc, (dvar, dls)
    if score == "exp_kernel_beltrami":
        varx, lsx, varp, lsp = sp_extra
        sx, sp2, s = aux
        # ∂s/∂sx = −s/(2lsx²); ∂sx/∂src = 2(src−k_e) over the x half —
        # symmetric in the p half; selT_mm expands both via the
        # block-diagonal selector
        cx = ds * s / (lsx * lsx)                    # [chunk, hp]
        cp = ds * s / (lsp * lsp)
        c2 = jnp.concatenate([cx, cp], axis=1)       # [chunk, 2·Hp]
        dsrc = -selT_mm(c2) * (src - k_e)
        dvarx = jnp.sum(ds * (2.0 * s / varx))
        dlsx = jnp.sum(ds * s * sx) / (lsx ** 3)
        dvarp = jnp.sum(ds * (2.0 * s / varp))
        dlsp = jnp.sum(ds * s * sp2) / (lsp ** 3)
        return dsrc, -dsrc, (dvarx, dlsx, dvarp, dlsp)
    raise ValueError(f"unknown score '{score}'")


def _rhs_kernel(cr_ref, rowl_ref, valid_ref, xe_ref, xt_ref, qw_ref, qb_ref,
                kw_ref, kb_ref, sel_ref, gmax_ref, *rest,
                chunk, block_n, d, att, heads, hp, d_k, square_plus, dtype,
                with_shift=False, score="scaled_dot"):
    n_ex = _N_SCORE_EXTRAS.get(score, 0)
    sp_extra = tuple(r[0, 0] for r in rest[:n_ex]) or None
    rest = rest[n_ex:]
    if with_shift:
        shift_refs = rest[:heads]
        num_ref, den_ref = rest[heads:]
    else:
        shift_refs = None
        num_ref, den_ref = rest
    i = pl.program_id(0)
    prev = cr_ref[jnp.maximum(i - 1, 0)]

    @pl.when((i == 0) | (cr_ref[i] != prev))
    def _():
        num_ref[:] = jnp.zeros_like(num_ref)
        den_ref[:] = jnp.zeros_like(den_ref)

    rowl = rowl_ref[:]
    xe = xe_ref[:].astype(dtype)

    # q projection computed in-kernel from the block's x rows — the q table
    # never exists in HBM and the standalone [N,D]@[D,ATT] pass disappears;
    # the per-chunk [block_n,D]@[D,ATT] replacement is ~128 MXU K-cycles
    q_blk = (jnp.dot(xt_ref[:].astype(dtype), qw_ref[:].astype(dtype),
                     preferred_element_type=jnp.float32)
             + qb_ref[:]).astype(dtype)                        # [block_n, ATT]

    # ONE one-hot in the scatter orientation [block_n, chunk]; the row-side
    # gather contracts its dim 0 via dot_general. The [chunk, block_n]
    # M-streaming layout of a dedicated gather one-hot measured 2.4x slower
    # (7.0 vs 2.9 ms standalone; 8.1 -> 7.1 ms for this whole kernel).
    iota_n = jax.lax.broadcasted_iota(jnp.int32, (block_n, chunk), 0)
    pt = (rowl[None, :] == iota_n).astype(dtype)
    src = jax.lax.dot_general(
        pt, q_blk, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                    # [chunk, ATT]

    # column-side projection k_e = x_e @ K + b
    k_e = jnp.dot(xe, kw_ref[:].astype(dtype),
                  preferred_element_type=jnp.float32) + kb_ref[:]

    # per-head scores via head-selector matmuls (all 4 reference families)
    s, _saux = _kernel_scores(src, k_e, sel_ref[:], d_k, score, sp_extra,
                              dtype)

    sm = s - gmax_ref[0, 0]
    if with_shift:
        sm = sm - _shift_matrix(shift_refs, chunk, heads, hp)
    if square_plus:
        u = (sm + jnp.sqrt(sm * sm + 4.0)) * 0.5
    else:
        u = jnp.exp(sm)
    # zero the padded head columns (selector gives s=0 there -> u nonzero)
    hmask = (jax.lax.broadcasted_iota(jnp.int32, (1, hp), 1) < heads)
    u = u * hmask.astype(u.dtype) * valid_ref[:][:, None]

    den_ref[:] += jnp.dot(pt, u.astype(dtype),
                          preferred_element_type=jnp.float32)
    # numerators: fold u into the one-hot itself (select u where the plain
    # one-hot had 1) instead of materialising u⊙x_e values — saves the
    # [chunk, D] VPU multiply+cast per head
    for h in range(heads):
        pt_h = jnp.where(rowl[None, :] == iota_n, u[:, h][None, :],
                         0.0).astype(dtype)
        num_ref[:, h * d:(h + 1) * d] += jnp.dot(
            pt_h, xe, preferred_element_type=jnp.float32)


def _rhs_kernel_ax(cr_ref, rowl_ref, valid_ref, xe_ref, xt_ref, qw_ref,
                   qb_ref, kw_ref, kb_ref, sel_ref, gmax_ref, *rest,
                   chunk, block_n, d, att, heads, hp,
                   d_k, square_plus, dtype, with_shift=False,
                   with_num=False, score="scaled_dot", with_fold=False):
    """Evaluation variant: the [N, H·D] numerators accumulate in VMEM
    scratch and only the per-head-averaged ax = (1/H)·Σ_h num_h/(den_h+eps)
    (plus the small den, for the underflow guard) is written to HBM —
    removing the num write + re-read + epilogue division that cost ~0.8 ms
    per RHS eval at arxiv scale. The division runs on the running partials
    every chunk (cheap VPU) so the block's final write is complete.

    ``with_num``: additionally flush the scratch numerators to a bf16 HBM
    output — the vjp-mode forward's residual (the backward mega-kernel's
    ct_den update needs num), replacing the separate full-precision num/den
    kernel (measured 12.7 vs 7.7 ms per eval at bench scale).

    ``with_fold``: fold the WHOLE RHS epilogue into the final write — the
    kernel emits f = alpha·(ax − x) with the per-row underflow/overflow
    guard (NaN poison where den ≤ 0 with deg > 0, or den non-finite)
    applied in-kernel, so the XLA side consumes f directly in the solver
    axpy with no intermediate ax read, x re-read, or guard pass. Poison
    granularity changes from global (any bad row poisons all rows) to
    per-row — equivalent downstream, because the re-solve trigger is
    any(~isfinite(stateT)) over the whole state (blocks.py). Eval/no-grad
    path only: the vjp fwd keeps the unfolded form."""
    n_ex = _N_SCORE_EXTRAS.get(score, 0)
    sp_extra = tuple(r[0, 0] for r in rest[:n_ex]) or None
    rest = rest[n_ex:]
    if with_shift:
        shift_refs = rest[:heads]
        rest = rest[heads:]
    else:
        shift_refs = None
    if with_fold:
        alpha_ref = rest[0]
        rest = rest[1:]
    if with_num:
        ax_ref, den_ref, num_out_ref, num_scr = rest
    else:
        ax_ref, den_ref, num_scr = rest
    i = pl.program_id(0)
    prev = cr_ref[jnp.maximum(i - 1, 0)]

    @pl.when((i == 0) | (cr_ref[i] != prev))
    def _():
        num_scr[:] = jnp.zeros_like(num_scr)
        den_ref[:] = jnp.zeros_like(den_ref)

    rowl = rowl_ref[:]
    xe = xe_ref[:].astype(dtype)
    q_blk = (jnp.dot(xt_ref[:].astype(dtype), qw_ref[:].astype(dtype),
                     preferred_element_type=jnp.float32)
             + qb_ref[:]).astype(dtype)
    iota_n = jax.lax.broadcasted_iota(jnp.int32, (block_n, chunk), 0)
    pt = (rowl[None, :] == iota_n).astype(dtype)
    src = jax.lax.dot_general(
        pt, q_blk, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    k_e = jnp.dot(xe, kw_ref[:].astype(dtype),
                  preferred_element_type=jnp.float32) + kb_ref[:]
    s, _saux = _kernel_scores(src, k_e, sel_ref[:], d_k, score, sp_extra,
                              dtype)
    sm = s - gmax_ref[0, 0]
    if with_shift:
        sm = sm - _shift_matrix(shift_refs, chunk, heads, hp)
    if square_plus:
        u = (sm + jnp.sqrt(sm * sm + 4.0)) * 0.5
    else:
        u = jnp.exp(sm)
    hiota = jax.lax.broadcasted_iota(jnp.int32, (1, hp), 1)
    hmask = (hiota < heads)
    if with_fold:
        # spare den column `heads` accumulates the per-row VALID-EDGE COUNT
        # (the pt @ u matmul already spans hp lanes, so the in-kernel
        # degree costs nothing) — replaces a 1-D s32 node-degree operand,
        # whose (block_n,) window Mosaic rejects (XLA 1-D layouts tile at
        # T(512)/T(1024), not T(128)).
        cnt_col = (hiota == heads).astype(u.dtype)
        u = (u * hmask.astype(u.dtype) + cnt_col) * valid_ref[:][:, None]
    else:
        u = u * hmask.astype(u.dtype) * valid_ref[:][:, None]
    den_ref[:] += jnp.dot(pt, u.astype(dtype),
                          preferred_element_type=jnp.float32)
    for h in range(heads):
        pt_h = jnp.where(rowl[None, :] == iota_n, u[:, h][None, :],
                         0.0).astype(dtype)
        num_scr[:, h * d:(h + 1) * d] += jnp.dot(
            pt_h, xe, preferred_element_type=jnp.float32)
    recip = 1.0 / (den_ref[:, :heads] + 1e-16)                 # [block_n, H]
    acc = num_scr[:, 0:d] * recip[:, 0:1]
    for h in range(1, heads):
        acc = acc + num_scr[:, h * d:(h + 1) * d] * recip[:, h:h + 1]
    axm = acc * (1.0 / heads)
    if with_fold:
        # per-row guard on the RUNNING den partials: correct at each
        # block's last chunk (the write that survives); earlier chunks'
        # possibly-spurious poison is overwritten.
        den_h = den_ref[:, :heads]
        deg_blk = den_ref[:, heads:heads + 1]        # in-kernel edge count
        bad = jnp.any(((den_h <= 0.0) & (deg_blk > 0.0))
                      | ~jnp.isfinite(den_h), axis=1, keepdims=True)
        f = alpha_ref[0, 0] * (axm - xt_ref[:].astype(jnp.float32))
        ax_ref[:] = jnp.where(bad, jnp.asarray(jnp.nan, jnp.float32), f)
    else:
        ax_ref[:] = axm
    if with_num:
        num_out_ref[:] = num_scr[:].astype(num_out_ref.dtype)


def _fused_ax_call(plan: StripePlan, qw, qb, kw, kb, x_n, x_g, gmax, *,
                   heads: int, square_plus: bool, dtype=jnp.bfloat16,
                   interpret: bool | None = None, shifts=None,
                   want_num: bool = False, score: str = "scaled_dot",
                   score_params=(), fold=None):
    """(ax [N, D], den [N, Hp]) via the scratch-accumulator kernel, plus a
    bf16 num [N, H·D] residual when ``want_num`` (the vjp-mode forward).

    ``fold``: optional alpha scalar — the kernel then emits the guarded
    f = alpha·(ax − x) in slot 0 instead of ax, with the per-row guard's
    node degree counted IN-KERNEL into den column ``heads`` (see
    _rhs_kernel_ax with_fold). Eval-only; incompatible with want_num.

    ``shifts``: optional per-head tuple of 1-D [cap] f32 per-edge score
    shifts (e.g. each edge's row max) — makes the in-kernel softmax exact
    for arbitrarily spread scores (ax is invariant to any per-row shift)."""
    cap, d = x_g.shape
    att = qw.shape[1]
    assert cap == plan.capacity and kw.shape == (d, att)
    assert x_n.shape == (plan.num_nodes, d)
    # fold mode needs one spare den column for the in-kernel edge count
    hp = max(8, heads + 1) if fold is not None else max(8, heads)
    d_k = att // heads
    chunk, block_n, nc = plan.chunk, plan.block_n, plan.n_chunks
    if interpret is None:
        interpret = not _on_tpu()
    sel = jnp.asarray(_score_selector(score, att, heads, hp))
    valid = jnp.asarray(plan.valid, jnp.float32)
    gmax2 = jnp.reshape(gmax.astype(jnp.float32), (1, 1))
    kb2 = jnp.reshape(kb.astype(jnp.float32), (1, att))
    qb2 = jnp.reshape(qb.astype(jnp.float32), (1, att))

    with_shift = shifts is not None
    if with_shift:
        # EXACT mode: widely spread scores are the very reason this mode
        # runs — bf16 score rounding (~0.5% relative) would be magnified
        # through exp, so the whole in-kernel pipeline stays f32
        dtype = jnp.float32
    in_specs = [
        pl.BlockSpec((chunk,), lambda i, cr: (i,)),          # rowl
        pl.BlockSpec((chunk,), lambda i, cr: (i,)),          # valid
        pl.BlockSpec((chunk, d), lambda i, cr: (i, 0)),      # x_e
        pl.BlockSpec((block_n, d), lambda i, cr: (cr[i], 0)),  # x rows
        pl.BlockSpec((d, att), lambda i, cr: (0, 0)),        # Q_w
        pl.BlockSpec((1, att), lambda i, cr: (0, 0)),        # Q_b
        pl.BlockSpec((d, att), lambda i, cr: (0, 0)),        # K_w
        pl.BlockSpec((1, att), lambda i, cr: (0, 0)),        # K_b
        pl.BlockSpec(tuple(sel.shape), lambda i, cr: (0, 0)),  # selector
        pl.BlockSpec((1, 1), lambda i, cr: (0, 0),
                     memory_space=pltpu.SMEM),               # gmax
    ]
    args = [jnp.asarray(plan.chunk_rows), jnp.asarray(plan.row_local),
            valid, x_g, x_n, qw, qb2, kw, kb2, sel, gmax2]
    for v in tuple(score_params or ())[:_N_SCORE_EXTRAS.get(score, 0)]:
        in_specs.append(pl.BlockSpec((1, 1), lambda i, cr: (0, 0),
                                     memory_space=pltpu.SMEM))
        args.append(jnp.reshape(v.astype(jnp.float32), (1, 1)))
    if with_shift:
        for sh in shifts:
            assert sh.shape == (cap,)
            in_specs.append(pl.BlockSpec((chunk,), lambda i, cr: (i,)))
            args.append(sh.astype(jnp.float32))
    if fold is not None:
        assert not want_num, "fold is an eval-only epilogue"
        in_specs.append(pl.BlockSpec((1, 1), lambda i, cr: (0, 0),
                                     memory_space=pltpu.SMEM))
        args.append(jnp.reshape(
            jnp.asarray(fold).astype(jnp.float32), (1, 1)))
    out_specs = [
        pl.BlockSpec((block_n, d), lambda i, cr: (cr[i], 0)),
        pl.BlockSpec((block_n, hp), lambda i, cr: (cr[i], 0)),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((plan.num_nodes, d), jnp.float32),
        jax.ShapeDtypeStruct((plan.num_nodes, hp), jnp.float32),
    ]
    if want_num:
        out_specs.append(
            pl.BlockSpec((block_n, heads * d), lambda i, cr: (cr[i], 0)))
        out_shape.append(
            jax.ShapeDtypeStruct((plan.num_nodes, heads * d), jnp.bfloat16))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nc,),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        scratch_shapes=[pltpu.VMEM((block_n, heads * d), jnp.float32)],
    )
    kernel = functools.partial(
        _rhs_kernel_ax, chunk=chunk, block_n=block_n, d=d, att=att,
        heads=heads, hp=hp, d_k=d_k, square_plus=square_plus, dtype=dtype,
        with_shift=with_shift, with_num=want_num, score=score,
        with_fold=fold is not None)
    flops = 2 * nc * chunk * (block_n * (att + heads * d + hp) + d * att)
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=tuple(out_shape),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=nc * chunk * d * 2,
            transcendentals=nc * chunk * hp),
        interpret=interpret,
    )(*args)


def _fused_call(plan: StripePlan, qw, qb, kw, kb, x_n, x_g, gmax, *,
                heads: int, square_plus: bool, dtype=jnp.bfloat16,
                interpret: bool | None = None, shifts=None,
                score: str = "scaled_dot", score_params=()):
    cap, d = x_g.shape
    att = qw.shape[1]
    assert cap == plan.capacity and kw.shape == (d, att)
    assert x_n.shape == (plan.num_nodes, d)
    hp = max(8, heads)
    d_k = att // heads
    chunk, block_n, nc = plan.chunk, plan.block_n, plan.n_chunks
    if interpret is None:
        interpret = not _on_tpu()
    sel = jnp.asarray(_score_selector(score, att, heads, hp))
    valid = jnp.asarray(plan.valid, jnp.float32)
    gmax2 = jnp.reshape(gmax.astype(jnp.float32), (1, 1))
    kb2 = jnp.reshape(kb.astype(jnp.float32), (1, att))
    qb2 = jnp.reshape(qb.astype(jnp.float32), (1, att))

    with_shift = shifts is not None
    if with_shift:
        # EXACT mode: widely spread scores are the very reason this mode
        # runs — bf16 score rounding (~0.5% relative) would be magnified
        # through exp, so the whole in-kernel pipeline stays f32
        dtype = jnp.float32
    in_specs = [
        pl.BlockSpec((chunk,), lambda i, cr: (i,)),          # rowl
        pl.BlockSpec((chunk,), lambda i, cr: (i,)),          # valid
        pl.BlockSpec((chunk, d), lambda i, cr: (i, 0)),      # x_e
        pl.BlockSpec((block_n, d), lambda i, cr: (cr[i], 0)),  # x rows
        pl.BlockSpec((d, att), lambda i, cr: (0, 0)),        # Q_w
        pl.BlockSpec((1, att), lambda i, cr: (0, 0)),        # Q_b
        pl.BlockSpec((d, att), lambda i, cr: (0, 0)),        # K_w
        pl.BlockSpec((1, att), lambda i, cr: (0, 0)),        # K_b
        pl.BlockSpec(tuple(sel.shape), lambda i, cr: (0, 0)),  # selector
        pl.BlockSpec((1, 1), lambda i, cr: (0, 0),
                     memory_space=pltpu.SMEM),               # gmax
    ]
    args = [jnp.asarray(plan.chunk_rows), jnp.asarray(plan.row_local),
            valid, x_g, x_n, qw, qb2, kw, kb2, sel, gmax2]
    for v in tuple(score_params or ())[:_N_SCORE_EXTRAS.get(score, 0)]:
        in_specs.append(pl.BlockSpec((1, 1), lambda i, cr: (0, 0),
                                     memory_space=pltpu.SMEM))
        args.append(jnp.reshape(v.astype(jnp.float32), (1, 1)))
    if with_shift:
        for sh in shifts:
            assert sh.shape == (cap,)
            in_specs.append(pl.BlockSpec((chunk,), lambda i, cr: (i,)))
            args.append(sh.astype(jnp.float32))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nc,),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((block_n, heads * d), lambda i, cr: (cr[i], 0)),
            pl.BlockSpec((block_n, hp), lambda i, cr: (cr[i], 0)),
        ),
    )
    kernel = functools.partial(
        _rhs_kernel, chunk=chunk, block_n=block_n, d=d, att=att, heads=heads,
        hp=hp, d_k=d_k, square_plus=square_plus, dtype=dtype,
        with_shift=with_shift, score=score)
    flops = 2 * nc * chunk * (block_n * (att + heads * d + hp) + d * att)
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((plan.num_nodes, heads * d), jnp.float32),
            jax.ShapeDtypeStruct((plan.num_nodes, hp), jnp.float32)),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=nc * chunk * d * 2,
            transcendentals=nc * chunk * hp),
        interpret=interpret,
    )(*args)


def _max_kernel(cr_ref, rowl_ref, valid_ref, xe_ref, qt_ref, kw_ref, kb_ref,
                sel_ref, out_ref, *, chunk, block_n, att, heads, hp, d_k,
                dtype):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.full_like(out_ref, -jnp.inf)

    rowl = rowl_ref[:]
    xe = xe_ref[:].astype(dtype)
    iota_n = jax.lax.broadcasted_iota(jnp.int32, (block_n, chunk), 0)
    pt = (rowl[None, :] == iota_n).astype(dtype)
    src = jax.lax.dot_general(
        pt, qt_ref[:].astype(dtype), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    k_e = jnp.dot(xe, kw_ref[:].astype(dtype),
                  preferred_element_type=jnp.float32) + kb_ref[:]
    prod = (src * k_e).astype(dtype)
    s = jnp.dot(prod, sel_ref[:].astype(dtype),
                preferred_element_type=jnp.float32) / math.sqrt(d_k)
    hmask = (jax.lax.broadcasted_iota(jnp.int32, (1, hp), 1) < heads)
    ok = (valid_ref[:][:, None] > 0) & hmask
    s = jnp.where(ok, s, -jnp.inf)
    # running max in one (8, hp_pad) accumulator block shared by the whole
    # sequential grid (a (1, hp) per-chunk output block violates the (8, 128)
    # tiling rule)
    cm = jnp.max(s, axis=0, keepdims=True)               # [1, hp]
    out_ref[:] = jnp.maximum(out_ref[:],
                             jnp.broadcast_to(cm, out_ref.shape))


def _fused_score_max_impl(plan: StripePlan, q, kw, kb, *, heads: int, x_g,
                          dtype=jnp.bfloat16, interpret: bool | None = None):
    """Global max of the valid scaled-dot scores (pass 1 of the fused RHS).

    The shift constant the softmax/squareplus normalisations subtract
    (reference utils.py:196 uses the GLOBAL max) must exist before the fused
    aggregation pass; this light kernel recomputes scores per chunk (x_e is
    re-read sequentially — bandwidth, not latency) and reduces per-chunk
    maxes on the host side of the pallas boundary. Treated as a constant
    shift (stop-gradient applied by the caller for softmax)."""
    cap, d = x_g.shape
    att = q.shape[1]
    hp = max(8, heads)
    d_k = att // heads
    chunk, block_n, nc = plan.chunk, plan.block_n, plan.n_chunks
    if interpret is None:
        interpret = not _on_tpu()
    sel = jnp.asarray(_head_selector(att, heads, hp))
    valid = jnp.asarray(plan.valid, jnp.float32)
    kb2 = jnp.reshape(kb.astype(jnp.float32), (1, att))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nc,),
        in_specs=[
            pl.BlockSpec((chunk,), lambda i, cr: (i,)),
            pl.BlockSpec((chunk,), lambda i, cr: (i,)),
            pl.BlockSpec((chunk, d), lambda i, cr: (i, 0)),
            pl.BlockSpec((block_n, att), lambda i, cr: (cr[i], 0)),
            pl.BlockSpec((d, att), lambda i, cr: (0, 0)),
            pl.BlockSpec((1, att), lambda i, cr: (0, 0)),
            pl.BlockSpec((att, hp), lambda i, cr: (0, 0)),
        ],
        out_specs=pl.BlockSpec((8, hp), lambda i, cr: (0, 0)),
    )
    kernel = functools.partial(_max_kernel, chunk=chunk, block_n=block_n,
                               att=att, heads=heads, hp=hp, d_k=d_k,
                               dtype=dtype)
    maxes = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((8, hp), jnp.float32),
        interpret=interpret,
    )(jnp.asarray(plan.chunk_rows), jnp.asarray(plan.row_local), valid, x_g,
      q, kw, kb2, sel)
    gmax = jnp.max(maxes)
    return jnp.where(jnp.isfinite(gmax), gmax, 0.0)


# NOTE: the RHS no longer runs a max pass (softmax is shift-invariant, so it
# integrates with gmax=0 and an inf/underflow guard); _fused_score_max_impl
# stays as the on-device verification oracle's shift source (bench.py) and
# for a future squareplus mega path, which needs the true global max.


def _rowmax_kernel(cr_ref, rowl_ref, valid_ref, xe_ref, qt_ref, kw_ref,
                   kb_ref, sel_ref, out_ref, *, chunk, block_n, att, heads,
                   hp, d_k, dtype):
    """Per-ROW maxima of the scaled-dot scores, accumulated per node block."""
    i = pl.program_id(0)
    prev = cr_ref[jnp.maximum(i - 1, 0)]

    @pl.when((i == 0) | (cr_ref[i] != prev))
    def _():
        out_ref[:] = jnp.full_like(out_ref, -jnp.inf)

    rowl = rowl_ref[:]
    xe = xe_ref[:].astype(dtype)
    iota_n = jax.lax.broadcasted_iota(jnp.int32, (block_n, chunk), 0)
    onehot = rowl[None, :] == iota_n
    pt = onehot.astype(dtype)
    src = jax.lax.dot_general(
        pt, qt_ref[:].astype(dtype), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    k_e = jnp.dot(xe, kw_ref[:].astype(dtype),
                  preferred_element_type=jnp.float32) + kb_ref[:]
    prod = (src * k_e).astype(dtype)
    s = jnp.dot(prod, sel_ref[:].astype(dtype),
                preferred_element_type=jnp.float32) / math.sqrt(d_k)
    s = jnp.where(valid_ref[:][:, None] > 0, s, -jnp.inf)
    cols = [jnp.max(jnp.where(onehot, s[:, h][None, :], -jnp.inf),
                    axis=1, keepdims=True) for h in range(hp)]
    out_ref[:] = jnp.maximum(out_ref[:], jnp.concatenate(cols, axis=1))


def fused_rowmax(plan: StripePlan, q, kw, kb, *, heads: int, x_g,
                 dtype=jnp.bfloat16, interpret: bool | None = None):
    """[num_nodes, Hp] per-row score maxima (edgeless rows -> 0).

    The shift source for the EXACT in-kernel softmax: ax is invariant to
    any per-row shift, and shifting by the true row max keeps every exp in
    f32 range, so fused_rhs_ax with these shifts equals the per-segment
    softmax composition with none of its [cap, ·]-padded HBM buffers
    (~5 GB at arxiv scale in the training step)."""
    cap, d = x_g.shape
    att = q.shape[1]
    hp = max(8, heads)
    d_k = att // heads
    chunk, block_n, nc = plan.chunk, plan.block_n, plan.n_chunks
    if interpret is None:
        interpret = not _on_tpu()
    sel = jnp.asarray(_head_selector(att, heads, hp))
    valid = jnp.asarray(plan.valid, jnp.float32)
    kb2 = jnp.reshape(kb.astype(jnp.float32), (1, att))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nc,),
        in_specs=[
            pl.BlockSpec((chunk,), lambda i, cr: (i,)),
            pl.BlockSpec((chunk,), lambda i, cr: (i,)),
            pl.BlockSpec((chunk, d), lambda i, cr: (i, 0)),
            pl.BlockSpec((block_n, att), lambda i, cr: (cr[i], 0)),
            pl.BlockSpec((d, att), lambda i, cr: (0, 0)),
            pl.BlockSpec((1, att), lambda i, cr: (0, 0)),
            pl.BlockSpec((att, hp), lambda i, cr: (0, 0)),
        ],
        out_specs=pl.BlockSpec((block_n, hp), lambda i, cr: (cr[i], 0)),
    )
    kernel = functools.partial(_rowmax_kernel, chunk=chunk, block_n=block_n,
                               att=att, heads=heads, hp=hp, d_k=d_k,
                               dtype=dtype)
    smax = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((plan.num_nodes, hp), jnp.float32),
        interpret=interpret,
    )(jnp.asarray(plan.chunk_rows), jnp.asarray(plan.row_local), valid, x_g,
      q, kw, kb2, sel)
    return jnp.where(jnp.isfinite(smax), smax, 0.0)


# ---------------------------------------------------------------------------
# backward mega-kernel
# ---------------------------------------------------------------------------
# One Mosaic pass fusing the whole _fused_bwd composition except the final
# node-level matmuls: the ct_num/ct_den row gathers (previously a dedicated
# stripe gather2 writing [cap, H·D] to HBM), the score/u recompute, the
# per-edge gradient algebra (du/ds/dsrc/dk_e), the dq row scatter (previously
# a dedicated stripe scatter), and the dkw/dkb/dgmax reductions. Per-edge HBM
# traffic drops from ~6 [cap, ·]-wide round trips to reading x_e once and
# writing dxg once. The dx[col] scatter then rides the column plan
# (stripe.make_col_gather) instead of XLA's unsorted scatter-add.


def _bwd_kernel(cr_ref, rowl_ref, valid_ref, xe_ref, xt_ref, qw_ref, qb_ref,
                kw_ref, kb_ref, sel_ref, gmax_ref, ctn_ref, ctd_ref, *rest,
                chunk, block_n, d, att, heads, hp, d_k, square_plus, dtype,
                with_shift=False, score="scaled_dot", want_dxg=True,
                separable=False):
    n_ex = _N_SCORE_EXTRAS.get(score, 0)
    sp_extra = tuple(r[0, 0] for r in rest[:n_ex]) or None
    rest = rest[n_ex:]
    if with_shift:
        shift_refs = rest[:heads]
        rest = rest[heads:]
    else:
        shift_refs = None
    if separable:
        rcp_ref = rest[0]
        rest = rest[1:]
    else:
        rcp_ref = None
    if want_dxg:
        dq_ref, dxg_ref = rest[:2]
        rest = rest[2:]
    else:
        dq_ref = rest[0]
        dxg_ref = None
        rest = rest[1:]
    if n_ex:
        dkw_ref, dkb_ref, dgm_ref, dex_ref = rest
    else:
        dkw_ref, dkb_ref, dgm_ref = rest
        dex_ref = None
    i = pl.program_id(0)
    prev = cr_ref[jnp.maximum(i - 1, 0)]

    @pl.when(i == 0)
    def _():
        dkw_ref[:] = jnp.zeros_like(dkw_ref)
        dkb_ref[:] = jnp.zeros_like(dkb_ref)
        dgm_ref[:] = jnp.zeros_like(dgm_ref)
        if dex_ref is not None:
            dex_ref[:] = jnp.zeros_like(dex_ref)

    @pl.when((i == 0) | (cr_ref[i] != prev))
    def _():
        dq_ref[:] = jnp.zeros_like(dq_ref)

    rowl = rowl_ref[:]
    xe = xe_ref[:].astype(dtype)
    xe_f = xe_ref[:].astype(jnp.float32)

    # ---- recompute the forward (identical math to _rhs_kernel) ----------
    q_blk = (jnp.dot(xt_ref[:].astype(dtype), qw_ref[:].astype(dtype),
                     preferred_element_type=jnp.float32)
             + qb_ref[:]).astype(dtype)
    iota_n = jax.lax.broadcasted_iota(jnp.int32, (block_n, chunk), 0)
    pt = (rowl[None, :] == iota_n).astype(dtype)
    dims0 = (((0,), (0,)), ((), ()))
    src = jax.lax.dot_general(pt, q_blk, dims0,
                              preferred_element_type=jnp.float32)
    k_e = jnp.dot(xe, kw_ref[:].astype(dtype),
                  preferred_element_type=jnp.float32) + kb_ref[:]
    s, saux = _kernel_scores(src, k_e, sel_ref[:], d_k, score, sp_extra,
                             dtype)
    sm = s - gmax_ref[0, 0]
    if with_shift:
        sm = sm - _shift_matrix(shift_refs, chunk, heads, hp)
    if square_plus:
        r = jnp.sqrt(sm * sm + 4.0)
        u = (sm + r) * 0.5
        duds = (1.0 + sm / r) * 0.5
    else:
        u = jnp.exp(sm)
        duds = u
    hmask = (jax.lax.broadcasted_iota(jnp.int32, (1, hp), 1) < heads)
    vmask = hmask.astype(jnp.float32) * valid_ref[:][:, None]
    u = u * vmask
    duds = duds * vmask

    # ---- cotangent gathers (the former stripe gather2, fused) -----------
    dup = jax.lax.dot_general(pt, ctd_ref[:].astype(dtype), dims0,
                              preferred_element_type=jnp.float32)
    if separable:
        # ctn_ref holds ct_ax [block_n, D] node rows and rcp_ref the
        # per-head scalars recip/H [block_n, Hp] (pad cols zero): the
        # per-head cotangent ctn_h = ct_ax ⊙ recip_h is separable, so
        #   du_h    = recip_h · ⟨ct_ax, x_e⟩      (one row-dot)
        #   dxg_acc = (Σ_h u_h·recip_h) ⊙ ct_ax   (one row-sum)
        # replacing `heads` [block_n, chunk, D] gather matmuls with one
        # wide + one thin and the [N, H·D] ct_num HBM operand entirely.
        ct_ax_e = jax.lax.dot_general(pt, ctn_ref[:].astype(dtype), dims0,
                                      preferred_element_type=jnp.float32)
        rg = jax.lax.dot_general(pt, rcp_ref[:].astype(dtype), dims0,
                                 preferred_element_type=jnp.float32)
        # lane reduction on the MXU (ones-matmul): the VPU tree-reduce over
        # D lanes is a multi-pass shuffle chain and these kernels are
        # VPU-bound (measured −1.9 ms/eval on the sym kernel at bench scale)
        dot = jnp.dot((ct_ax_e * xe_f).astype(dtype), jnp.ones((d, 8), dtype),
                      preferred_element_type=jnp.float32)[:, :1]
        du = rg * dot + dup
        dxg_acc = (jnp.sum(u * rg, axis=1, keepdims=True) * ct_ax_e
                   if want_dxg else None)
    else:
        du_cols = []
        dxg_acc = None
        for h in range(heads):
            dv_h = jax.lax.dot_general(
                pt, ctn_ref[:, h * d:(h + 1) * d].astype(dtype), dims0,
                preferred_element_type=jnp.float32)            # [chunk, D]
            du_cols.append(jnp.sum(dv_h * xe_f, axis=1, keepdims=True))
            if want_dxg:
                term = u[:, h][:, None] * dv_h
                dxg_acc = term if dxg_acc is None else dxg_acc + term
        if hp > heads:
            du_cols.append(jnp.zeros((chunk, hp - heads), jnp.float32))
        du = jnp.concatenate(du_cols, axis=1) + dup            # [chunk, hp]
    ds = du * duds                                             # masked via duds

    # ---- per-edge gradients ---------------------------------------------
    # expand per-head scalars over head feature slices with the selector
    # transpose, per score family
    def selT_mm(a):
        return jax.lax.dot_general(
            a, sel_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    dsrc_f, dke, dextras = _kernel_scores_bwd(
        ds, src, k_e, sel_ref[:], selT_mm, d_k, score, sp_extra, saux)
    dsrc = dsrc_f.astype(dtype)

    dq_ref[:] += jnp.dot(pt, dsrc, preferred_element_type=jnp.float32)
    dke_l = dke.astype(dtype)
    dkw_ref[:] += jax.lax.dot_general(xe, dke_l, dims0,
                                      preferred_element_type=jnp.float32)
    dkb_ref[:] += jnp.broadcast_to(jnp.sum(dke, axis=0, keepdims=True),
                                   dkb_ref.shape)
    dgm_ref[:] += jnp.broadcast_to(jnp.sum(ds, axis=0, keepdims=True),
                                   dgm_ref.shape)
    if dex_ref is not None:
        cid = jax.lax.broadcasted_iota(jnp.int32, dex_ref.shape, 1)
        val = jnp.zeros(dex_ref.shape, jnp.float32)
        for ci, dv in enumerate(dextras):
            val = jnp.where(cid == ci, dv, val)
        dex_ref[:] += val
    if dxg_ref is not None:
        dxg_ref[:] = dxg_acc + jax.lax.dot_general(
            dke_l, kw_ref[:].astype(dtype), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)


def _fused_bwd_mega_call(plan: StripePlan, qw, qb, kw, kb, x_n, x_g, gmax,
                         ct_num, ct_den, *, heads: int, square_plus: bool,
                         dtype=jnp.bfloat16, interpret: bool | None = None,
                         shifts=None, score: str = "scaled_dot",
                         score_params=(), want_dxg: bool = True,
                         recip_p=None):
    """(dq [N, ATT], dxg [cap, D], dkw [D, ATT], dkb [ATT], dgmax scalar,
    dextra) — dextra = (dvar, dls) for exp_kernel, else ().

    want_dxg=False skips the [cap, D] per-edge dxg output entirely (its
    HBM write and the in-kernel accumulation) — the col-plan backward
    (make_fused_ax_colplan) recomputes dx on the column side instead, so
    the per-edge cotangent never exists in HBM; dxg is returned as None.

    recip_p: optional [N, Hp] per-head scalars (recip·(1/H), pad cols
    zero). When given, ``ct_num`` is the SHARED [N, D] head-average
    cotangent ct_ax and the kernel uses the separable form (the per-head
    cotangent ct_ax ⊙ recip_h never materialises — see _bwd_kernel)."""
    cap, d = x_g.shape
    att = qw.shape[1]
    separable = recip_p is not None
    if separable:
        assert cap == plan.capacity and ct_num.shape == (plan.num_nodes, d)
    else:
        assert (cap == plan.capacity
                and ct_num.shape == (plan.num_nodes, heads * d))
    hp = max(8, heads)
    assert ct_den.shape == (plan.num_nodes, hp)
    d_k = att // heads
    chunk, block_n, nc = plan.chunk, plan.block_n, plan.n_chunks
    if interpret is None:
        interpret = not _on_tpu()
    sel = jnp.asarray(_score_selector(score, att, heads, hp))
    valid = jnp.asarray(plan.valid, jnp.float32)
    gmax2 = jnp.reshape(gmax.astype(jnp.float32), (1, 1))
    kb2 = jnp.reshape(kb.astype(jnp.float32), (1, att))
    qb2 = jnp.reshape(qb.astype(jnp.float32), (1, att))
    with_shift = shifts is not None
    if with_shift:
        dtype = jnp.float32          # EXACT mode stays f32 (see _fused_call)
    in_specs = [
        pl.BlockSpec((chunk,), lambda i, cr: (i,)),          # rowl
        pl.BlockSpec((chunk,), lambda i, cr: (i,)),          # valid
        pl.BlockSpec((chunk, d), lambda i, cr: (i, 0)),      # x_e
        pl.BlockSpec((block_n, d), lambda i, cr: (cr[i], 0)),  # x rows
        pl.BlockSpec((d, att), lambda i, cr: (0, 0)),        # Q_w
        pl.BlockSpec((1, att), lambda i, cr: (0, 0)),        # Q_b
        pl.BlockSpec((d, att), lambda i, cr: (0, 0)),        # K_w
        pl.BlockSpec((1, att), lambda i, cr: (0, 0)),        # K_b
        pl.BlockSpec(tuple(sel.shape), lambda i, cr: (0, 0)),  # selector
        pl.BlockSpec((1, 1), lambda i, cr: (0, 0),
                     memory_space=pltpu.SMEM),               # gmax
        pl.BlockSpec((block_n, d if separable else heads * d),
                     lambda i, cr: (cr[i], 0)),                # ct_num/ct_ax
        pl.BlockSpec((block_n, hp), lambda i, cr: (cr[i], 0)),         # ct_den
    ]
    args = [jnp.asarray(plan.chunk_rows), jnp.asarray(plan.row_local),
            valid, x_g, x_n, qw, qb2, kw, kb2, sel, gmax2,
            ct_num, ct_den]
    for v in tuple(score_params or ())[:_N_SCORE_EXTRAS.get(score, 0)]:
        in_specs.append(pl.BlockSpec((1, 1), lambda i, cr: (0, 0),
                                     memory_space=pltpu.SMEM))
        args.append(jnp.reshape(v.astype(jnp.float32), (1, 1)))
    if with_shift:
        for sh in shifts:
            assert sh.shape == (cap,)
            in_specs.append(pl.BlockSpec((chunk,), lambda i, cr: (i,)))
            args.append(sh.astype(jnp.float32))
    if separable:
        assert recip_p.shape == (plan.num_nodes, hp)
        in_specs.append(pl.BlockSpec((block_n, hp),
                                     lambda i, cr: (cr[i], 0)))  # recip_p
        args.append(recip_p)
    out_specs = [
        pl.BlockSpec((block_n, att), lambda i, cr: (cr[i], 0)),  # dq
    ]
    out_shape = [
        jax.ShapeDtypeStruct((plan.num_nodes, att), jnp.float32),
    ]
    if want_dxg:
        out_specs.append(pl.BlockSpec((chunk, d), lambda i, cr: (i, 0)))
        out_shape.append(jax.ShapeDtypeStruct((cap, d), jnp.float32))
    out_specs += [
        pl.BlockSpec((d, att), lambda i, cr: (0, 0)),            # dkw
        pl.BlockSpec((8, att), lambda i, cr: (0, 0)),            # dkb
        pl.BlockSpec((8, hp), lambda i, cr: (0, 0)),             # dgm
    ]
    out_shape += [
        jax.ShapeDtypeStruct((d, att), jnp.float32),
        jax.ShapeDtypeStruct((8, att), jnp.float32),
        jax.ShapeDtypeStruct((8, hp), jnp.float32),
    ]
    if _N_SCORE_EXTRAS.get(score, 0):
        out_specs.append(pl.BlockSpec((8, 8), lambda i, cr: (0, 0)))  # dex
        out_shape.append(jax.ShapeDtypeStruct((8, 8), jnp.float32))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nc,),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
    )
    kernel = functools.partial(
        _bwd_kernel, chunk=chunk, block_n=block_n, d=d, att=att, heads=heads,
        hp=hp, d_k=d_k, square_plus=square_plus, dtype=dtype,
        with_shift=with_shift, score=score, want_dxg=want_dxg,
        separable=separable)
    gat_d = (d + hp) if separable else heads * d
    flops = 2 * nc * chunk * block_n * (att + 2 * gat_d + hp + att) \
        + 2 * nc * chunk * (d * att * 2 + att * hp * 2)
    outs = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=tuple(out_shape),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=nc * chunk * d * 8,
            transcendentals=nc * chunk * hp),
        interpret=interpret,
    )(*args)
    if want_dxg:
        dq, dxg, dkw, dkb8, dgm8 = outs[:5]
        rest_outs = outs[5:]
    else:
        dq, dkw, dkb8, dgm8 = outs[:4]
        dxg = None
        rest_outs = outs[4:]
    dkb = dkb8[0]
    dgmax = -jnp.sum(dgm8[0, :heads])
    dextra = ()
    if _N_SCORE_EXTRAS.get(score, 0):
        dex = rest_outs[0]
        dextra = tuple(dex[0, ci].astype(v.dtype).reshape(v.shape)
                       for ci, v in enumerate(score_params))
    return dq, dxg, dkw, dkb, dgmax, dextra


# ---------------------------------------------------------------------------
# col-plan backward: recompute dx on the column side
# ---------------------------------------------------------------------------
# The x[col] cotangent scatter is the training step's dominant cost when done
# by relocation: the mega kernel emits dxg [cap, D] in ROW-plan slot order,
# and permuting it into col-plan order is a random gather over the cold
# per-edge table (measured 33.8 ms at bench scale, ~12.4 ns/row — no row
# reuse), while the same gather from a NODE table runs at 2.15 ns/row (hot).
# So: never materialise the per-edge cotangent at all. Pack every per-node
# operand the backward needs into ONE wide node table
#     W[n] = [ q[n] (ATT) | ct_ax[n] (D) | recip[n]/H (Hp) | ct_den[n] (Hp) ]
# gather it once per edge in col-plan slot order by the edge's ROW id (hot,
# ~6 ms), and recompute the per-edge cotangent inside a col-plan Mosaic
# kernel where the destination (the edge's col) is block-local:
#     k_e     = (onehot(col) @ x_blk) @ K + kb       (MXU, exact fwd replay)
#     s, u    = scores(q_g, k_e), exp/squareplus     (same math as _bwd_kernel)
#     ctn_h   = ct_ax_g ⊙ recip_g[:, h]              (VPU)
#     ds      = (Σ_d ctn_h·x_col + ct_den_g) · du/ds
#     dxg_e   = Σ_h u_h·ctn_h + dke(ds) @ Kᵀ
#     dx_blk += onehot(col) @ dxg_e                  (MXU scatter)
# One hot gather + one kernel pass replaces permute + scatter.


def _bwd_dx_col_kernel(cr_ref, coll_ref, valid_ref, wg_ref, xt_ref, kw_ref,
                       kb_ref, sel_ref, gmax_ref, *rest, chunk, block_n, d,
                       att, heads, hp, d_k, square_plus, dtype,
                       score="scaled_dot", packed=False):
    n_ex = _N_SCORE_EXTRAS.get(score, 0)
    sp_extra = tuple(r[0, 0] for r in rest[:n_ex]) or None
    rest = rest[n_ex:]
    dx_ref, = rest
    i = pl.program_id(0)
    prev = cr_ref[jnp.maximum(i - 1, 0)]

    @pl.when((i == 0) | (cr_ref[i] != prev))
    def _():
        dx_ref[:] = jnp.zeros_like(dx_ref)

    coll = coll_ref[:]
    iota_n = jax.lax.broadcasted_iota(jnp.int32, (block_n, chunk), 0)
    pt = (coll[None, :] == iota_n).astype(dtype)
    dims0 = (((0,), (0,)), ((), ()))
    # x[col_e]: block-local on the column side
    x_col = jax.lax.dot_general(pt, xt_ref[:].astype(dtype), dims0,
                                preferred_element_type=jnp.float32)
    x_col_l = x_col.astype(dtype)
    k_e = jnp.dot(x_col_l, kw_ref[:].astype(dtype),
                  preferred_element_type=jnp.float32) + kb_ref[:]
    if packed:
        # u32 pair decode: lane j carries ct_ax[j] bf16 bits in the LOW
        # half and hi-field[j] (q | recip/H | ct_den) bits in the HIGH
        # half — shift/mask + same-width bitcast, no relayout (the gather
        # moved one 128-lane block instead of two; see make table pack).
        # The table arrives f32-BITCAST: a u32 array through the XLA-side
        # barrier + gather + adjoint while_loop sent the TPU compiler into
        # a >30-min compile (remat mode was fine); as f32 bits it compiles
        # in the normal time and the gather moves the same 4 B/lane.
        w_u = jax.lax.bitcast_convert_type(wg_ref[:], jnp.uint32)
        lo_f = jax.lax.bitcast_convert_type(w_u << 16, jnp.float32)
        hi_f = jax.lax.bitcast_convert_type(w_u & jnp.uint32(0xFFFF0000),
                                            jnp.float32)
        src = hi_f[:, :att]
        ct_ax_g = lo_f[:, :d]
        recip_g = hi_f[:, att:att + hp]
        ctd_g = hi_f[:, att + hp:att + 2 * hp]
    else:
        wg = wg_ref[:]
        src = wg[:, :att].astype(jnp.float32)
        ct_ax_g = wg[:, att:att + d].astype(jnp.float32)
        recip_g = wg[:, att + d:att + d + hp].astype(jnp.float32)
        ctd_g = wg[:, att + d + hp:att + d + 2 * hp].astype(jnp.float32)
    s, saux = _kernel_scores(src, k_e, sel_ref[:], d_k, score, sp_extra,
                             dtype)
    sm = s - gmax_ref[0, 0]
    if square_plus:
        r = jnp.sqrt(sm * sm + 4.0)
        u = (sm + r) * 0.5
        duds = (1.0 + sm / r) * 0.5
    else:
        u = jnp.exp(sm)
        duds = u
    hmask = (jax.lax.broadcasted_iota(jnp.int32, (1, hp), 1) < heads)
    vmask = hmask.astype(jnp.float32) * valid_ref[:][:, None]
    u = u * vmask
    duds = duds * vmask

    # ctn_h = ct_ax ⊙ recip_h is SEPARABLE (per-head scalar × shared [D]
    # row): both head reductions collapse to one row-dot / one row-sum —
    #   du_h    = Σ_d ctn_h·x_col = recip_h · ⟨ct_ax, x_col⟩
    #   dxg_acc = Σ_h u_h·ctn_h   = (Σ_h u_h·recip_h) ⊙ ct_ax
    # (recip_g's pad columns are zero, so full-hp sums are exact).
    # Lane reduction on the MXU (ones-matmul) — see _bwd_kernel.
    dot = jnp.dot((ct_ax_g * x_col).astype(dtype), jnp.ones((d, 8), dtype),
                  preferred_element_type=jnp.float32)[:, :1]   # [chunk, 1]
    dxg_acc = jnp.sum(u * recip_g, axis=1, keepdims=True) * ct_ax_g
    ds = (dot * recip_g + ctd_g) * duds

    def selT_mm(a):
        return jax.lax.dot_general(
            a, sel_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    _dsrc, dke, _dex = _kernel_scores_bwd(
        ds, src, k_e, sel_ref[:], selT_mm, d_k, score, sp_extra, saux)
    dxg_e = dxg_acc + jax.lax.dot_general(
        dke.astype(dtype), kw_ref[:].astype(dtype),
        (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    dx_ref[:] += jnp.dot(pt, dxg_e.astype(dtype),
                         preferred_element_type=jnp.float32)


def _bwd_dx_col_call(plan: StripePlan, w_g, x_n, kw, kb, gmax, *,
                     heads: int, square_plus: bool, dtype=jnp.bfloat16,
                     interpret: bool | None = None, score: str = "scaled_dot",
                     score_params=()):
    """dx [N, D] — x's aggregation gradient, computed per COL-plan chunk.

    w_g: pre-gathered wide per-node rows (by each edge's row id, in
    col-plan slot order; layout documented above) — either [cap, wpad]
    bf16 or, when int32/uint32, the [cap, 128] u32 PAIR-PACKED table
    (ct_ax bits low, q|recip|ct_den bits high — one lane-block gathered
    instead of two)."""
    cplan = plan.col_plan
    n, d = x_n.shape
    att = kw.shape[1]
    hp = max(8, heads)
    d_k = att // heads
    chunk, block_n, nc = cplan.chunk, cplan.block_n, cplan.n_chunks
    assert w_g.shape[0] == cplan.capacity
    # packed tables are f32-bitcast u32 pairs, distinguished by width+dtype
    # (the unpacked table is bf16 [cap, wpad])
    packed = w_g.dtype == jnp.float32 and w_g.shape[1] == 128
    if interpret is None:
        interpret = not _on_tpu()
    sel = jnp.asarray(_score_selector(score, att, heads, hp))
    valid = jnp.asarray(cplan.valid, jnp.float32)
    gmax2 = jnp.reshape(gmax.astype(jnp.float32), (1, 1))
    kb2 = jnp.reshape(kb.astype(jnp.float32), (1, att))
    wpad = w_g.shape[1]
    in_specs = [
        pl.BlockSpec((chunk,), lambda i, cr: (i,)),            # col_local
        pl.BlockSpec((chunk,), lambda i, cr: (i,)),            # valid
        pl.BlockSpec((chunk, wpad), lambda i, cr: (i, 0)),     # W_g
        pl.BlockSpec((block_n, d), lambda i, cr: (cr[i], 0)),  # x rows
        pl.BlockSpec((d, att), lambda i, cr: (0, 0)),          # K_w
        pl.BlockSpec((1, att), lambda i, cr: (0, 0)),          # K_b
        pl.BlockSpec(tuple(sel.shape), lambda i, cr: (0, 0)),    # selector
        pl.BlockSpec((1, 1), lambda i, cr: (0, 0),
                     memory_space=pltpu.SMEM),                 # gmax
    ]
    args = [jnp.asarray(cplan.chunk_rows), jnp.asarray(cplan.row_local),
            valid, w_g, x_n, kw, kb2, sel, gmax2]
    for v in tuple(score_params or ())[:_N_SCORE_EXTRAS.get(score, 0)]:
        in_specs.append(pl.BlockSpec((1, 1), lambda i, cr: (0, 0),
                                     memory_space=pltpu.SMEM))
        args.append(jnp.reshape(v.astype(jnp.float32), (1, 1)))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nc,),
        in_specs=in_specs,
        out_specs=(pl.BlockSpec((block_n, d), lambda i, cr: (cr[i], 0)),),
    )
    kernel = functools.partial(
        _bwd_dx_col_kernel, chunk=chunk, block_n=block_n, d=d, att=att,
        heads=heads, hp=hp, d_k=d_k, square_plus=square_plus, dtype=dtype,
        score=score, packed=packed)
    flops = 2 * nc * chunk * (2 * block_n * d + d * att * 2 + att * hp * 2
                              + heads * d * 3)
    (dx,) = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((cplan.num_nodes, d), jnp.float32),),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=nc * chunk * (wpad + d) * 4,
            transcendentals=nc * chunk * hp),
        interpret=interpret,
    )(*args)
    return dx[:n]


def make_fused_ax_colplan(plan: StripePlan, heads: int, square_plus: bool,
                          score: str, col: jax.Array, pay_dt):
    """End-to-end fused RHS aggregate over x with the COL-PLAN backward.

    op(qw, qb, kw, kb, x, gmax, score_params) -> (ax, den). The x[col]
    gather lives inside the op; the backward returns x's TOTAL gradient
    with the per-edge cotangent never materialised in HBM: the row-plan
    mega kernel (want_dxg=False) produces dq/dkw/dkb/dgmax, and dx comes
    from _bwd_dx_col_call over one hot gather of the packed node table.
    Works for ANY graph with a col plan (directed included) — unlike the
    symmetric reverse-edge form. Factory pattern: closure constants stay
    numpy/traced-safe (cf. make_col_gather).
    """
    cplan = plan.col_plan
    # static: each col-plan slot's ROW id (the gather index into the packed
    # node table). row id of a ROW-plan slot = chunk's node-block base +
    # block-local row; col_src_slot maps col-plan slot -> row-plan slot.
    chunk = plan.chunk
    row_of_slot = (np.repeat(np.asarray(plan.chunk_rows), chunk)
                   * plan.block_n + np.asarray(plan.row_local))
    rowv_np = row_of_slot[np.asarray(plan.col_src_slot)]
    rowv_np = np.where(np.asarray(cplan.valid), rowv_np, 0).astype(np.int32)

    def _gather(x):
        xd = x if pay_dt is None else x.astype(pay_dt)
        return xd[col]

    @jax.custom_vjp
    def op(qw, qb, kw, kb, x, gmax, score_params=()):
        x_g = _gather(x)
        return _fused_ax_call(plan, qw, qb, kw, kb, x, x_g, gmax,
                              heads=heads, square_plus=square_plus,
                              score=score, score_params=score_params)

    def fwd(qw, qb, kw, kb, x, gmax, score_params=()):
        x_g = _gather(x)
        ax, den, num = _fused_ax_call(plan, qw, qb, kw, kb, x, x_g, gmax,
                                      heads=heads, square_plus=square_plus,
                                      want_num=True, score=score,
                                      score_params=score_params)
        # x_g stays a residual: a bwd-side regather was measured (round 4)
        # at +427 ms/step in remat mode — jax.checkpoint marks rematted ops
        # non-CSE-able, so the regather cannot merge with the recomputed
        # forward's own gather and is paid on top of it. Full no-remat
        # taping (which the regather would enable) was also measured
        # SLOWER per NFE (80 ms/NFE at 8 NFE vs remat's 56) before running
        # out of HBM at 16 NFE — XLA's scan partial_eval saves far more
        # than the minimal (x, num, den) tape.
        return (ax, den), (qw, qb, kw, kb, x, x_g, gmax, num, den,
                           score_params)

    def bwd(res, cts):
        qw, qb, kw, kb, x, x_g, gmax, num, den, score_params = res
        ct_ax, ct_den_in = cts
        d = x_g.shape[1]
        att = qw.shape[1]
        hp = max(8, heads)
        recip = 1.0 / (den[:, :heads] + 1e-16)
        upd = [-(jnp.sum(ct_ax * num[:, h * d:(h + 1) * d]
                         .astype(jnp.float32), axis=1)
                 * recip[:, h] ** 2) / heads for h in range(heads)]
        ct_den = ct_den_in.at[:, :heads].add(jnp.stack(upd, axis=1))
        rpad = jnp.zeros((ct_ax.shape[0], hp - heads), jnp.float32)
        recip_p = jnp.concatenate([recip * (1.0 / heads), rpad], axis=1)
        dq, _, dkw, dkb, dgmax, dextra = _fused_bwd_mega_call(
            plan, qw, qb, kw, kb, x, x_g, gmax, ct_ax, ct_den,
            heads=heads, square_plus=square_plus, score=score,
            score_params=score_params, want_dxg=False, recip_p=recip_p)
        # pack the node table and gather it once by row id (hot)
        xn_f = x.astype(jnp.float32)
        q = xn_f @ qw + qb                                    # [N, ATT]
        nrow = q.shape[0]
        if d <= 128 and att + 2 * hp <= 128:
            # u32 PAIR PACK: the [cap]-row gather is lane-block-bound
            # (measured [cap,128]f32 8.9 ms ≈ [cap,128]bf16 8.7 vs
            # [cap,256]bf16 12.6), so carry both 128-lane halves in ONE
            # u32 block: lo bits = ct_ax bf16, hi bits = q|recip|ct_den
            # bf16. Pure elementwise shift/mask pack (+0x8000 = round
            # half-up to bf16) — no interleave relayout on either side.
            lo = ct_ax.astype(jnp.float32)
            if d < 128:
                lo = jnp.concatenate(
                    [lo, jnp.zeros((nrow, 128 - d), jnp.float32)], axis=1)
            hi = jnp.concatenate(
                [q, recip_p, ct_den,
                 jnp.zeros((nrow, 128 - att - 2 * hp), jnp.float32)],
                axis=1)
            rnd = jnp.uint32(0x8000)
            hi_b = ((jax.lax.bitcast_convert_type(hi, jnp.uint32) + rnd)
                    & jnp.uint32(0xFFFF0000))
            lo_b = ((jax.lax.bitcast_convert_type(lo, jnp.uint32) + rnd)
                    >> 16)
            # ship as f32 bits: a u32 array through barrier+gather+adjoint
            # while_loop stalls the TPU compiler (see _bwd_dx_col_kernel)
            w_tab = jax.lax.bitcast_convert_type(hi_b | lo_b, jnp.float32)
        else:
            w_tab32 = jnp.concatenate(
                [q, ct_ax.astype(jnp.float32), recip_p, ct_den], axis=1)
            wbase = att + d + 2 * hp
            wpad = -(-wbase // 128) * 128
            if wpad > wbase:
                w_tab32 = jnp.concatenate(
                    [w_tab32, jnp.zeros((nrow, wpad - wbase), jnp.float32)],
                    axis=1)
            w_tab = w_tab32.astype(jnp.bfloat16)
        # Barrier: without it XLA fuses the pack (concat+matmul epilogue)
        # into the [cap]-row gather and re-evaluates it per gathered row —
        # measured 38 ms fused vs 5 (pack) + 13 (gather) ms materialised.
        w_g = jax.lax.optimization_barrier(w_tab)[jnp.asarray(rowv_np)]
        dx_col = _bwd_dx_col_call(plan, w_g, x, kw, kb, gmax, heads=heads,
                                  square_plus=square_plus, score=score,
                                  score_params=score_params)
        dqw = xn_f.T @ dq
        dqb = jnp.sum(dq, axis=0)
        dx = (dx_col + dq @ qw.T).astype(x.dtype)
        return (dqw, dqb, dkw, dkb, dx, dgmax, dextra)

    op.defvjp(fwd, bwd)
    return op


# ---------------------------------------------------------------------------
# symmetric backward: the reverse-edge relocation
# ---------------------------------------------------------------------------
# For a symmetric edge multiset (to_undirected, reference data.py:90-94),
# the x[col] cotangent satisfies  Σ_{e: col_e=n} C_e = Σ_{e: row_e=n} C_rev(e)
# — each edge's column-side contribution can be computed AT ITS REVERSE EDGE
# and scattered through the row plan's block-local one-hot. This removes the
# training step's cold [capacity]-wide permutation gather (measured ~12
# ns/row: the per-edge table has no row reuse) and the column-plan scatter.
# The reverse edge's quantities are all reachable from row-plan operands:
#   src_rev = q[col_e]  = x_g @ Q          (in-kernel MXU)
#   k_rev   = k[row_e]  = one-hot @ (x_blk @ K)
#   x_g_rev = x[row_e]  = one-hot @ x_blk
#   dv_rev  = ct_num[col_e], dup_rev = ct_den[col_e]   (hot node-table
#             gathers fed per chunk — the only new HBM traffic)


def _bwd_sym_kernel(cr_ref, rowl_ref, valid_ref, xe_ref, xt_ref, qw_ref,
                    qb_ref, kw_ref, kb_ref, sel_ref, gmax_ref, cta_ref,
                    rcp_ref, ctd_ref, wg_ref, *rest,
                    chunk, block_n, d, att, heads, hp, d_k, square_plus,
                    dtype, score="scaled_dot", packed=False):
    """One-pass symmetric backward (round-4 separable/packed form).

    Node-side cotangent operands arrive SEPARABLY (ct_ax [·, D] + the
    per-head scalars recip/H and ct_den [·, Hp]) instead of the
    materialised [·, H·D] ct_num: the row side reads them as resident
    block rows (cta/rcp/ctd), and the reverse side reads them per edge
    from ONE u32 pair-packed gathered table wg (lo bits = ct_ax bf16,
    hi bits = recip|ct_den bf16) — one lane-block gather where the
    round-3 form needed a [cap, H·D] + a [cap, Hp] gather."""
    n_ex = _N_SCORE_EXTRAS.get(score, 0)
    sp_extra = tuple(r[0, 0] for r in rest[:n_ex]) or None
    rest = rest[n_ex:]
    if n_ex:
        dq_ref, dxr_ref, dkw_ref, dkb_ref, dgm_ref, dex_ref = rest
    else:
        dq_ref, dxr_ref, dkw_ref, dkb_ref, dgm_ref = rest
        dex_ref = None
    i = pl.program_id(0)
    prev = cr_ref[jnp.maximum(i - 1, 0)]

    @pl.when(i == 0)
    def _():
        dkw_ref[:] = jnp.zeros_like(dkw_ref)
        dkb_ref[:] = jnp.zeros_like(dkb_ref)
        dgm_ref[:] = jnp.zeros_like(dgm_ref)
        if dex_ref is not None:
            dex_ref[:] = jnp.zeros_like(dex_ref)

    @pl.when((i == 0) | (cr_ref[i] != prev))
    def _():
        dq_ref[:] = jnp.zeros_like(dq_ref)
        dxr_ref[:] = jnp.zeros_like(dxr_ref)

    rowl = rowl_ref[:]
    xe = xe_ref[:].astype(dtype)
    xe_f = xe_ref[:].astype(jnp.float32)
    xt_l = xt_ref[:].astype(dtype)
    hmask = (jax.lax.broadcasted_iota(jnp.int32, (1, hp), 1) < heads)
    vmask = hmask.astype(jnp.float32) * valid_ref[:][:, None]
    iota_n = jax.lax.broadcasted_iota(jnp.int32, (block_n, chunk), 0)
    pt = (rowl[None, :] == iota_n).astype(dtype)
    dims0 = (((0,), (0,)), ((), ()))
    gmax = gmax_ref[0, 0]

    def selT_mm(a):
        return jax.lax.dot_general(
            a, sel_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    def u_duds(sm):
        if square_plus:
            r = jnp.sqrt(sm * sm + 4.0)
            return (sm + r) * 0.5 * vmask, (1.0 + sm / r) * 0.5 * vmask
        u = jnp.exp(sm)
        return u * vmask, u * vmask

    # ---- FORWARD edges: dq / dkw / dkb / dgmax (as in _bwd_kernel) -------
    q_blk = (jnp.dot(xt_l, qw_ref[:].astype(dtype),
                     preferred_element_type=jnp.float32)
             + qb_ref[:]).astype(dtype)
    src = jax.lax.dot_general(pt, q_blk, dims0,
                              preferred_element_type=jnp.float32)
    k_e = jnp.dot(xe, kw_ref[:].astype(dtype),
                  preferred_element_type=jnp.float32) + kb_ref[:]
    s, saux = _kernel_scores(src, k_e, sel_ref[:], d_k, score, sp_extra,
                             dtype)
    u, duds = u_duds(s - gmax)
    dup = jax.lax.dot_general(pt, ctd_ref[:].astype(dtype), dims0,
                              preferred_element_type=jnp.float32)
    ct_ax_e = jax.lax.dot_general(pt, cta_ref[:].astype(dtype), dims0,
                                  preferred_element_type=jnp.float32)
    rg = jax.lax.dot_general(pt, rcp_ref[:].astype(dtype), dims0,
                             preferred_element_type=jnp.float32)
    # lane reduction on the MXU (ones-matmul) — a VPU tree-reduce over 128
    # lanes is a multi-pass shuffle chain; the kernel is VPU-bound
    ones_d8 = jnp.ones((d, 8), dtype)
    dot = jnp.dot((ct_ax_e * xe_f).astype(dtype), ones_d8,
                  preferred_element_type=jnp.float32)[:, :1]
    du = rg * dot + dup
    ds = du * duds
    dsrc_f, dke, dextras = _kernel_scores_bwd(
        ds, src, k_e, sel_ref[:], selT_mm, d_k, score, sp_extra, saux)
    dq_ref[:] += jnp.dot(pt, dsrc_f.astype(dtype),
                         preferred_element_type=jnp.float32)
    dke_l = dke.astype(dtype)
    dkw_ref[:] += jax.lax.dot_general(xe, dke_l, dims0,
                                      preferred_element_type=jnp.float32)
    dkb_ref[:] += jnp.broadcast_to(jnp.sum(dke, axis=0, keepdims=True),
                                   dkb_ref.shape)
    dgm_ref[:] += jnp.broadcast_to(jnp.sum(ds, axis=0, keepdims=True),
                                   dgm_ref.shape)
    if dex_ref is not None:
        cid = jax.lax.broadcasted_iota(jnp.int32, dex_ref.shape, 1)
        val = jnp.zeros(dex_ref.shape, jnp.float32)
        for ci, dv in enumerate(dextras):
            val = jnp.where(cid == ci, dv, val)
        dex_ref[:] += val

    # ---- REVERSE edges: relocate the x[col] cotangent to row_e -----------
    if packed:
        # u32 pair decode (see make_fused_ax_sym): lo 16 bits = ct_ax[col]
        # bf16, hi 16 bits = (recip/H | ct_den)[col] bf16
        w_u = jax.lax.bitcast_convert_type(wg_ref[:], jnp.uint32)
        lo_f = jax.lax.bitcast_convert_type(w_u << 16, jnp.float32)
        hi_f = jax.lax.bitcast_convert_type(w_u & jnp.uint32(0xFFFF0000),
                                            jnp.float32)
        ct_ax_g = lo_f[:, :d]
        recip_g = hi_f[:, :hp]
        ctdg = hi_f[:, hp:2 * hp]
    else:
        wg = wg_ref[:]
        ct_ax_g = wg[:, :d].astype(jnp.float32)
        recip_g = wg[:, d:d + hp].astype(jnp.float32)
        ctdg = wg[:, d + hp:d + 2 * hp].astype(jnp.float32)
    src_rev = (jnp.dot(xe, qw_ref[:].astype(dtype),
                       preferred_element_type=jnp.float32)
               + qb_ref[:])                                  # q[col_e]
    k_blk = (jnp.dot(xt_l, kw_ref[:].astype(dtype),
                     preferred_element_type=jnp.float32)
             + kb_ref[:]).astype(dtype)
    k_rev = jax.lax.dot_general(pt, k_blk, dims0,
                                preferred_element_type=jnp.float32)
    xe_rev = jax.lax.dot_general(pt, xt_l, dims0,
                                 preferred_element_type=jnp.float32)
    s_r, saux_r = _kernel_scores(src_rev, k_rev, sel_ref[:], d_k, score,
                                 sp_extra, dtype)
    u_r, duds_r = u_duds(s_r - gmax)
    # separable reverse cotangent: ctn_h[col] = recip_h[col] ⊙ ct_ax[col]
    dot_r = jnp.dot((ct_ax_g * xe_rev).astype(dtype), ones_d8,
                    preferred_element_type=jnp.float32)[:, :1]
    ds_r = (dot_r * recip_g + ctdg) * duds_r
    dxr_acc = jnp.sum(u_r * recip_g, axis=1, keepdims=True) * ct_ax_g
    _dsrc_r, dke_r, _dex_r = _kernel_scores_bwd(
        ds_r, src_rev, k_rev, sel_ref[:], selT_mm, d_k, score, sp_extra,
        saux_r)
    c_rev = dxr_acc + jax.lax.dot_general(
        dke_r.astype(dtype), kw_ref[:].astype(dtype),
        (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    dxr_ref[:] += jnp.dot(pt, c_rev.astype(dtype),
                          preferred_element_type=jnp.float32)


def _fused_bwd_mega_sym_call(plan: StripePlan, qw, qb, kw, kb, x_n, x_g,
                             gmax, ct_ax, recip_p, ct_den, w_g, *,
                             heads: int, square_plus: bool,
                             dtype=jnp.bfloat16,
                             interpret: bool | None = None,
                             score: str = "scaled_dot", score_params=()):
    """(dq [N, ATT], dxrow [N, D], dkw, dkb, dgmax, dextra) — the symmetric
    backward (separable/packed form). ct_ax [N, D] + recip_p [N, Hp]
    (recip/H, pad cols zero) + ct_den [N, Hp] are the separable node-side
    cotangent factors; w_g is the per-slot gathered reverse-edge table (by
    col id): either the [cap, 128] u32 pair pack (f32-bitcast) or the
    unpacked bf16 [cap, wpad] (ct_ax | recip_p | ct_den) fallback."""
    cap, d = x_g.shape
    att = qw.shape[1]
    assert cap == plan.capacity and ct_ax.shape == (plan.num_nodes, d)
    hp = max(8, heads)
    assert ct_den.shape == (plan.num_nodes, hp)
    assert recip_p.shape == (plan.num_nodes, hp)
    assert w_g.shape[0] == cap
    packed = w_g.dtype == jnp.float32 and w_g.shape[1] == 128 and d <= 128
    wpad = w_g.shape[1]
    d_k = att // heads
    chunk, block_n, nc = plan.chunk, plan.block_n, plan.n_chunks
    if interpret is None:
        interpret = not _on_tpu()
    sel = jnp.asarray(_score_selector(score, att, heads, hp))
    valid = jnp.asarray(plan.valid, jnp.float32)
    gmax2 = jnp.reshape(gmax.astype(jnp.float32), (1, 1))
    kb2 = jnp.reshape(kb.astype(jnp.float32), (1, att))
    qb2 = jnp.reshape(qb.astype(jnp.float32), (1, att))
    in_specs = [
        pl.BlockSpec((chunk,), lambda i, cr: (i,)),          # rowl
        pl.BlockSpec((chunk,), lambda i, cr: (i,)),          # valid
        pl.BlockSpec((chunk, d), lambda i, cr: (i, 0)),      # x_e
        pl.BlockSpec((block_n, d), lambda i, cr: (cr[i], 0)),  # x rows
        pl.BlockSpec((d, att), lambda i, cr: (0, 0)),        # Q_w
        pl.BlockSpec((1, att), lambda i, cr: (0, 0)),        # Q_b
        pl.BlockSpec((d, att), lambda i, cr: (0, 0)),        # K_w
        pl.BlockSpec((1, att), lambda i, cr: (0, 0)),        # K_b
        pl.BlockSpec(tuple(sel.shape), lambda i, cr: (0, 0)),  # selector
        pl.BlockSpec((1, 1), lambda i, cr: (0, 0),
                     memory_space=pltpu.SMEM),               # gmax
        pl.BlockSpec((block_n, d), lambda i, cr: (cr[i], 0)),   # ct_ax
        pl.BlockSpec((block_n, hp), lambda i, cr: (cr[i], 0)),  # recip_p
        pl.BlockSpec((block_n, hp), lambda i, cr: (cr[i], 0)),  # ct_den
        pl.BlockSpec((chunk, wpad), lambda i, cr: (i, 0)),      # w_g
    ]
    args = [jnp.asarray(plan.chunk_rows), jnp.asarray(plan.row_local),
            valid, x_g, x_n, qw, qb2, kw, kb2, sel, gmax2,
            ct_ax, recip_p, ct_den, w_g]
    for v in tuple(score_params or ())[:_N_SCORE_EXTRAS.get(score, 0)]:
        in_specs.append(pl.BlockSpec((1, 1), lambda i, cr: (0, 0),
                                     memory_space=pltpu.SMEM))
        args.append(jnp.reshape(v.astype(jnp.float32), (1, 1)))
    out_specs = [
        pl.BlockSpec((block_n, att), lambda i, cr: (cr[i], 0)),  # dq
        pl.BlockSpec((block_n, d), lambda i, cr: (cr[i], 0)),    # dxrow
        pl.BlockSpec((d, att), lambda i, cr: (0, 0)),            # dkw
        pl.BlockSpec((8, att), lambda i, cr: (0, 0)),            # dkb
        pl.BlockSpec((8, hp), lambda i, cr: (0, 0)),             # dgm
    ]
    out_shape = [
        jax.ShapeDtypeStruct((plan.num_nodes, att), jnp.float32),
        jax.ShapeDtypeStruct((plan.num_nodes, d), jnp.float32),
        jax.ShapeDtypeStruct((d, att), jnp.float32),
        jax.ShapeDtypeStruct((8, att), jnp.float32),
        jax.ShapeDtypeStruct((8, hp), jnp.float32),
    ]
    if _N_SCORE_EXTRAS.get(score, 0):
        out_specs.append(pl.BlockSpec((8, 8), lambda i, cr: (0, 0)))
        out_shape.append(jax.ShapeDtypeStruct((8, 8), jnp.float32))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nc,),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
    )
    kernel = functools.partial(
        _bwd_sym_kernel, chunk=chunk, block_n=block_n, d=d, att=att,
        heads=heads, hp=hp, d_k=d_k, square_plus=square_plus, dtype=dtype,
        score=score, packed=packed)
    flops = 4 * nc * chunk * block_n * (att + 2 * heads * d + hp + att)
    outs = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=tuple(out_shape),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=nc * chunk * d * 8,
            transcendentals=2 * nc * chunk * hp),
        interpret=interpret,
    )(*args)
    dq, dxrow, dkw, dkb8, dgm8 = outs[:5]
    dkb = dkb8[0]
    dgmax = -jnp.sum(dgm8[0, :heads])
    dextra = ()
    if _N_SCORE_EXTRAS.get(score, 0):
        dex = outs[5]
        dextra = tuple(dex[0, ci].astype(v.dtype).reshape(v.shape)
                       for ci, v in enumerate(score_params))
    return dq, dxrow, dkw, dkb, dgmax, dextra


def make_fused_ax_sym(plan: StripePlan, heads: int, square_plus: bool,
                      score: str, col: jax.Array, pay_dt):
    """End-to-end fused RHS aggregate over x for SYMMETRIC edge sets.

    op(qw, qb, kw, kb, x, gmax, score_params) -> (ax, den); the x[col]
    gather lives inside the op, and the backward returns x's TOTAL gradient
    directly (reverse-edge relocation — no permutation, no column plan).
    Factory pattern: closure constants stay numpy/traced-safe
    (cf. make_col_gather).
    """

    def _gather(x):
        xd = x if pay_dt is None else x.astype(pay_dt)
        return xd[col]

    @jax.custom_vjp
    def op(qw, qb, kw, kb, x, gmax, score_params=()):
        x_g = _gather(x)
        return _fused_ax_call(plan, qw, qb, kw, kb, x, x_g, gmax,
                              heads=heads, square_plus=square_plus,
                              score=score, score_params=score_params)

    def fwd(qw, qb, kw, kb, x, gmax, score_params=()):
        x_g = _gather(x)
        ax, den, num = _fused_ax_call(plan, qw, qb, kw, kb, x, x_g, gmax,
                                      heads=heads, square_plus=square_plus,
                                      want_num=True, score=score,
                                      score_params=score_params)
        # x_g stays a residual — see make_fused_ax_colplan.fwd
        return (ax, den), (qw, qb, kw, kb, x, x_g, gmax, num, den,
                           score_params)

    def bwd(res, cts):
        qw, qb, kw, kb, x, x_g, gmax, num, den, score_params = res
        ct_ax_in, ct_den_in = cts
        d = x_g.shape[1]
        hp = max(8, heads)
        nrow = x.shape[0]
        ct_ax = ct_ax_in.astype(jnp.float32)
        recip = 1.0 / (den[:, :heads] + 1e-16)
        upd = [-(jnp.sum(ct_ax * num[:, h * d:(h + 1) * d]
                         .astype(jnp.float32), axis=1)
                 * recip[:, h] ** 2) / heads for h in range(heads)]
        ct_den = ct_den_in.at[:, :heads].add(jnp.stack(upd, axis=1))
        rpad = jnp.zeros((nrow, hp - heads), jnp.float32)
        recip_p = jnp.concatenate([recip * (1.0 / heads), rpad], axis=1)
        # ONE reverse-edge table gather (by col id): u32 pair pack — lo
        # bits ct_ax bf16, hi bits (recip/H | ct_den) bf16 — one lane
        # block where the round-3 form gathered [cap, H·D] + [cap, Hp].
        # Shipped as f32 bits (a u32 array through barrier + gather +
        # the adjoint while_loop stalls the TPU compiler; see
        # _bwd_dx_col_kernel).
        if d <= 128 and 2 * hp <= 128:
            lo = ct_ax
            if d < 128:
                lo = jnp.concatenate(
                    [lo, jnp.zeros((nrow, 128 - d), jnp.float32)], axis=1)
            hi = jnp.concatenate(
                [recip_p, ct_den,
                 jnp.zeros((nrow, 128 - 2 * hp), jnp.float32)], axis=1)
            rnd = jnp.uint32(0x8000)
            hi_b = ((jax.lax.bitcast_convert_type(hi, jnp.uint32) + rnd)
                    & jnp.uint32(0xFFFF0000))
            lo_b = ((jax.lax.bitcast_convert_type(lo, jnp.uint32) + rnd)
                    >> 16)
            w_tab = jax.lax.bitcast_convert_type(hi_b | lo_b, jnp.float32)
        else:
            w_tab32 = jnp.concatenate([ct_ax, recip_p, ct_den], axis=1)
            wbase = d + 2 * hp
            wpad = -(-wbase // 128) * 128
            if wpad > wbase:
                w_tab32 = jnp.concatenate(
                    [w_tab32, jnp.zeros((nrow, wpad - wbase), jnp.float32)],
                    axis=1)
            w_tab = w_tab32.astype(jnp.bfloat16)
        # barrier: stop XLA fusing the pack into the gather (re-evaluated
        # per gathered row otherwise — see make_fused_ax_colplan)
        w_g = jax.lax.optimization_barrier(w_tab)[col]
        dq, dxrow, dkw, dkb, dgmax, dextra = _fused_bwd_mega_sym_call(
            plan, qw, qb, kw, kb, x, x_g, gmax, ct_ax, recip_p, ct_den,
            w_g, heads=heads, square_plus=square_plus, score=score,
            score_params=score_params)
        xn_f = x.astype(jnp.float32)
        dqw = xn_f.T @ dq
        dqb = jnp.sum(dq, axis=0)
        dx = (dxrow + dq @ qw.T).astype(x.dtype)
        return (dqw, dqb, dkw, dkb, dx, dgmax, dextra)

    op.defvjp(fwd, bwd)
    return op


def _scores_u(plan, q, kw, kb, x_g, gmax, heads, square_plus, shifts=None):
    """Composition replica of the in-kernel math (for the backward pass).

    Returns (src [cap, ATT], k_e [cap, ATT], us, dudsms) with ``us`` and
    ``dudsms`` per-head LISTS of 1-D [cap] arrays. Shapes are deliberate:
    TPU HBM tiling pads a trailing dim to 128 lanes and the second-minor to
    8 sublanes, so a [cap, H] array costs 64x its logical bytes and a
    [cap, H, d_k] rank-3 costs 4-8x — at arxiv scale (cap = 2.7M) those
    paddings alone overflowed HBM in the training step. 1-D [cap] arrays
    tile padding-free."""
    att = q.shape[1]
    d_k = att // heads
    src = _stripe_gather_call(
        plan, q, dtype=jnp.float32 if shifts is not None else jnp.bfloat16)
    k_e = x_g.astype(jnp.float32) @ kw + kb
    v1 = jnp.asarray(plan.valid, jnp.float32)
    us, dudsms = [], []
    for h in range(heads):
        sl = slice(h * d_k, (h + 1) * d_k)
        s = jnp.sum(src[:, sl] * k_e[:, sl], axis=1) / math.sqrt(d_k)
        sm = s - gmax
        if shifts is not None:
            sm = sm - shifts[h]
        if square_plus:
            u = (sm + jnp.sqrt(sm * sm + 4.0)) * 0.5
            dudsm = (1.0 + sm / jnp.sqrt(sm * sm + 4.0)) * 0.5
        else:
            u = jnp.exp(sm)
            dudsm = u
        us.append(u * v1)
        dudsms.append(dudsm * v1)
    return src, k_e, us, dudsms


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def fused_rhs_aggregate(plan: StripePlan, heads: int, square_plus: bool,
                        score: str, qw, qb, kw, kb, x_n, x_g, gmax,
                        score_params=()):
    """(num [N, H·D], den [N, Hp]) of the fused attention RHS.

    qw/qb: Q projection (computed in-kernel from x_n's block rows — the q
    table never exists in HBM); kw/kb: K projection; x_n: [N, D] node
    states in plan node order; x_g: x[col] per plan slot (payload dtype);
    gmax: scalar score shift. ``score``: any of the 4 reference score
    families; ``score_params``: (output_var, lengthscale) scalars for
    exp_kernel, else ().
    """
    return _fused_call(plan, qw, qb, kw, kb, x_n, x_g, gmax, heads=heads,
                       square_plus=square_plus, score=score,
                       score_params=score_params)


def _fused_fwd(plan, heads, square_plus, score, qw, qb, kw, kb, x_n, x_g,
               gmax, score_params=()):
    out = _fused_call(plan, qw, qb, kw, kb, x_n, x_g, gmax, heads=heads,
                      square_plus=square_plus, score=score,
                      score_params=score_params)
    return out, (qw, qb, kw, kb, x_n, x_g, gmax, None, score_params)


def _fused_bwd(plan, heads, square_plus, score, res, cts):
    """Backward of the fused aggregate — the round-3 mega kernel.

    One Mosaic pass (_bwd_kernel) produces dq/dxg/dkw/dkb/dgmax (+ the
    exp_kernel var/lengthscale grads); only the cheap node-level matmuls
    (dqw, dqb, dx_n) remain outside. The hand-derived stripe composition
    (_fused_bwd_composition, scaled_dot) and jax.grad of the XLA RHS remain
    the oracles these gradients are pinned against in tests and in bench's
    on-device verification."""
    qw, qb, kw, kb, x_n, x_g, gmax, shifts, score_params = res
    ct_num, ct_den = cts
    dq, dxg, dkw, dkb, dgmax, dextra = _fused_bwd_mega_call(
        plan, qw, qb, kw, kb, x_n, x_g, gmax, ct_num, ct_den,
        heads=heads, square_plus=square_plus, shifts=shifts, score=score,
        score_params=score_params)
    xn_f = x_n.astype(jnp.float32)
    dqw = xn_f.T @ dq
    dqb = jnp.sum(dq, axis=0)
    dx_n = (dq @ qw.T).astype(x_n.dtype)
    return (dqw, dqb, dkw, dkb, dx_n, dxg.astype(x_g.dtype), dgmax,
            dextra)


def _fused_bwd_composition(plan, heads, square_plus, res, cts):
    """Hand-derived backward over per-head 1-D [cap] intermediates
    (scaled_dot scores — the independent oracle the mega kernel is pinned
    against; the other score families are verified against jax.grad of the
    XLA composition in tests).

    The [cap, H(, D)]-shaped forms of these arrays pad 4-64x under TPU HBM
    tiling (see _scores_u); the headwise slicing keeps every materialised
    per-edge buffer either 128-wide (padding-free) or 1-D."""
    if len(res) == 9:
        qw, qb, kw, kb, x_n, x_g, gmax, shifts, _sp = res
        res = (qw, qb, kw, kb, x_n, x_g, gmax) + (
            (shifts,) if shifts is not None else ())
    if len(res) == 8:
        qw, qb, kw, kb, x_n, x_g, gmax, shifts = res
    else:
        qw, qb, kw, kb, x_n, x_g, gmax = res
        shifts = None
    ct_num, ct_den = cts
    att = qw.shape[1]
    d = x_g.shape[1]
    d_k = att // heads

    xn_f = x_n.astype(jnp.float32)
    q = xn_f @ qw + qb
    src, k_e, us, dudsms = _scores_u(plan, q, kw, kb, x_g, gmax, heads,
                                     square_plus, shifts=shifts)
    dvals, dup = _stripe_gather2_call(plan, ct_num, ct_den)    # [cap, H·D]
    m1 = jnp.asarray(plan.valid, jnp.float32)

    xf = x_g.astype(jnp.float32)
    dgmax = jnp.zeros((), jnp.float32)
    dsrc_cols, dke_cols = [], []
    dxg_acc = None
    for h in range(heads):
        sl = slice(h * d_k, (h + 1) * d_k)
        dv_h = dvals[:, h * d:(h + 1) * d] * m1[:, None]       # [cap, D]
        du = jnp.sum(dv_h * xf, axis=1) + dup[:, h] * m1       # [cap]
        ds = du * dudsms[h]                                    # [cap]
        dgmax = dgmax - jnp.sum(ds)
        c = (ds / math.sqrt(d_k))[:, None]
        dsrc_cols.append(c * k_e[:, sl])
        dke_cols.append(c * src[:, sl])
        term = us[h][:, None] * dv_h
        dxg_acc = term if dxg_acc is None else dxg_acc + term
    dsrc = jnp.concatenate(dsrc_cols, axis=1)                  # [cap, ATT]
    dk_e = jnp.concatenate(dke_cols, axis=1)
    dq = _stripe_scatter_call(plan, dsrc)[: q.shape[0]]
    dqw = xn_f.T @ dq
    dqb = jnp.sum(dq, axis=0)
    dx_n = (dq @ qw.T).astype(x_n.dtype)
    dkw = xf.T @ dk_e
    dkb = jnp.sum(dk_e, axis=0)
    dx_g = (dxg_acc + dk_e @ kw.T).astype(x_g.dtype)
    return dqw, dqb, dkw, dkb, dx_n, dx_g, dgmax


fused_rhs_aggregate.defvjp(_fused_fwd, _fused_bwd)


def _ax_from_numden(num, den, heads, d):
    """Exactly the in-kernel head average: (1/H)·Σ_h num_h/(den_h+1e-16)."""
    recip = 1.0 / (den[:, :heads] + 1e-16)
    ax = num[:, :d] * recip[:, 0:1]
    for h in range(1, heads):
        ax = ax + num[:, h * d:(h + 1) * d] * recip[:, h:h + 1]
    return ax * (1.0 / heads)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def fused_rhs_ax(plan: StripePlan, heads: int, square_plus: bool, score: str,
                 qw, qb, kw, kb, x_n, x_g, gmax, shifts=None,
                 score_params=()):
    """(ax [N, D], den [N, Hp]) — the head-averaged normalised aggregate.

    The undifferentiated primal runs the scratch-accumulator kernel
    (_rhs_kernel_ax): numerators never touch HBM. Under vjp the fwd rule
    runs the same kernel with an extra bf16 numerator flush as the backward
    residual.

    ``score``: scaled_dot / cosine_sim / pearson / exp_kernel — all four
    reference families (function_transformer_attention.py:193-206) computed
    in-kernel from the same src/k_e operands via head-selector matmuls.
    ``score_params``: (output_var, lengthscale) scalars for exp_kernel.
    ``shifts``: optional per-head tuple of 1-D [cap] per-edge score shifts
    (the EXACT-softmax mode: pass each edge's row max via fused_rowmax —
    ax is shift-invariant per row, so gradients w.r.t. shifts are
    identically zero and are returned as zeros).
    """
    ax, den = _fused_ax_call(plan, qw, qb, kw, kb, x_n, x_g, gmax,
                             heads=heads, square_plus=square_plus,
                             shifts=shifts, score=score,
                             score_params=score_params)
    return ax, den


def fused_rhs_f(plan: StripePlan, heads: int, score: str, qw, qb, kw, kb,
                x, col, pay_dt, alpha, score_params=()):
    """f [N, D] f32 = alpha·(ax − x) with the per-row den guard — the WHOLE
    GRAND-nl RHS epilogue folded into the eval kernel's final write
    (_rhs_kernel_ax with_fold). The solver axpy consumes f directly: no
    intermediate ax read, x re-read, or XLA guard pass per eval.

    Built for eval/no-grad paths (bench forwards, Trainer eval steps,
    inference) — training rides the custom-VJP forms
    (make_fused_ax_colplan/_sym, fused_rhs_ax) via blocks.py's gating.
    Differentiating through THIS op is nonetheless safe: its vjp falls
    back to the unfolded fused_rhs_ax composition (same kernel, epilogue
    in XLA), so a stray jax.grad over an eval-mode model gets the same
    gradients as the unfolded engine rather than a Pallas AD error.
    Ref semantics: the f = alpha(A(x)−I)x + b·x0 epilogue of
    /root/reference/src/function_transformer_attention.py:60-69 (the
    source term stays outside — one fused XLA pass, off in most tuned
    configs)."""
    # closure constants stay NUMPY (traced-safe — a jnp array created here
    # would leak the enclosing trace into the custom_vjp's bwd replay)
    deg_np = np.asarray(plan.node_degree)

    def _ref(qw_, qb_, kw_, kb_, x_, alpha_, sp):
        # unfolded composition with the SAME per-row guard semantics as
        # the kernel epilogue (gradient path only)
        xd = x_ if pay_dt is None else x_.astype(pay_dt)
        x_g = xd[col]
        gmax = jnp.zeros((), jnp.float32)
        ax, den = fused_rhs_ax(plan, heads, False, score, qw_, qb_, kw_,
                               kb_, x_, x_g, gmax, None, sp)
        den_h = den[:, :heads]
        deg = jnp.asarray(deg_np)
        bad = jnp.any(((den_h <= 0.0) & (deg[:, None] > 0))
                      | ~jnp.isfinite(den_h), axis=1, keepdims=True)
        axg = jnp.where(bad, jnp.asarray(jnp.nan, ax.dtype), ax)
        return alpha_ * (axg - x_)

    @jax.custom_vjp
    def op(qw_, qb_, kw_, kb_, x_, alpha_, sp):
        xd = x_ if pay_dt is None else x_.astype(pay_dt)
        x_g = xd[col]
        gmax = jnp.zeros((), jnp.float32)
        f, _den = _fused_ax_call(plan, qw_, qb_, kw_, kb_, x_, x_g, gmax,
                                 heads=heads, square_plus=False,
                                 score=score, score_params=sp,
                                 fold=alpha_)
        return f

    def op_fwd(qw_, qb_, kw_, kb_, x_, alpha_, sp):
        return (_ref(qw_, qb_, kw_, kb_, x_, alpha_, sp),
                (qw_, qb_, kw_, kb_, x_, alpha_, sp))

    def op_bwd(res, ct):
        _, pull = jax.vjp(_ref, *res)
        return pull(ct)

    op.defvjp(op_fwd, op_bwd)
    return op(qw, qb, kw, kb, x, alpha, tuple(score_params))


def _ax_fwd(plan, heads, square_plus, score, qw, qb, kw, kb, x_n, x_g, gmax,
            shifts=None, score_params=()):
    # vjp-mode forward = the same scratch kernel as the primal, plus a bf16
    # flush of the numerators (the residual _ax_bwd's ct_den term needs) —
    # replacing the separate full-precision num/den kernel (12.7 -> ~8 ms
    # per eval at bench scale) and making fwd-under-vjp bit-identical to
    # the undifferentiated primal.
    ax, den, num = _fused_ax_call(plan, qw, qb, kw, kb, x_n, x_g, gmax,
                                  heads=heads, square_plus=square_plus,
                                  shifts=shifts, want_num=True, score=score,
                                  score_params=score_params)
    return (ax, den), (qw, qb, kw, kb, x_n, x_g, gmax, num, den, shifts,
                       score_params)


def _ax_bwd(plan, heads, square_plus, score, res, cts):
    qw, qb, kw, kb, x_n, x_g, gmax, num, den, shifts, score_params = res
    ct_ax, ct_den_in = cts
    d = x_g.shape[1]
    hp = max(8, heads)
    recip = 1.0 / (den[:, :heads] + 1e-16)
    upd = [-(jnp.sum(ct_ax * num[:, h * d:(h + 1) * d].astype(jnp.float32),
                     axis=1) * recip[:, h] ** 2) / heads
           for h in range(heads)]
    ct_den = ct_den_in.at[:, :heads].add(jnp.stack(upd, axis=1))
    # separable mega-kernel path: the per-head cotangent ct_ax ⊙ recip_h
    # never materialises (no [N, H·D] ct_num operand — see _bwd_kernel)
    rpad = jnp.zeros((ct_ax.shape[0], hp - heads), jnp.float32)
    recip_p = jnp.concatenate([recip * (1.0 / heads), rpad], axis=1)
    dq, dxg, dkw, dkb, dgmax, dextra = _fused_bwd_mega_call(
        plan, qw, qb, kw, kb, x_n, x_g, gmax, ct_ax.astype(jnp.float32),
        ct_den, heads=heads, square_plus=square_plus, shifts=shifts,
        score=score, score_params=score_params, recip_p=recip_p)
    xn_f = x_n.astype(jnp.float32)
    dqw = xn_f.T @ dq
    dqb = jnp.sum(dq, axis=0)
    dx_n = (dq @ qw.T).astype(x_n.dtype)
    ct_shifts = (None if shifts is None
                 else tuple(jnp.zeros_like(s) for s in shifts))
    return (dqw, dqb, dkw, dkb, dx_n, dxg.astype(x_g.dtype), dgmax,
            ct_shifts, dextra)


fused_rhs_ax.defvjp(_ax_fwd, _ax_bwd)


# ---------------------------------------------------------------------------
# norm_idx=1 (column-normalised softmax): the mirror-trick engine
# ---------------------------------------------------------------------------
# The reference normalises attention over edge_index[attention_norm_idx]
# (function_transformer_attention.py:210-213); norm_idx=1 groups the softmax
# by COLUMN while the aggregation still reduces by ROW, so the fused norm0
# trick (denominators share the aggregation scatter) does not apply. For the
# SYMMETRIC edge multisets the reference trains on (to_undirected,
# data.py:90-94) the column denominators are nonetheless reachable from the
# row plan: edges INTO node n are exactly the reverses of node n's row-plan
# edges, so
#
#     den_col[n, h] = Σ_{e: col_e=n} u_eh
#                   = Σ_{row-plan edges (n,c)} f(S(q[c], k[n]) − gmax)
#
# — a row-plan pass computing the REVERSE-edge scores (q[c] = x_e @ Q from
# the already-gathered payload, k[n] from the resident block rows). The
# aggregation pass then needs recip = 1/den_col at each edge's COLUMN
# endpoint; an extra [cap]-row gather would cost the full per-row issue rate
# (~2.2 ns/row), so recip rides the one existing payload gather instead:
# the x|recip pack stores x's columns as bf16 pairs in u32 lanes 0..63 and
# the per-head recip f32 raw in lanes 64..64+Hp ("u32-packed x|recip
# gather"). Decoding the pairs emits x's columns in even-then-odd order, so
# every node-side operand enters these kernels pre-permuted to that order
# (x_E = x @ Pm, Q_E = Pmᵀ Q, ...; _norm1_perm) and the outputs are
# un-permuted by the same constant matmul — no in-kernel lane shuffles.
#
# Backward (hand-derived, verified against jax.grad of the composition in
# tests/test_norm1_fused.py): with A = ct_ax/H, a_e = u_e·recip[c_e],
# ct_a_e = ⟨A[r_e], x[c_e]⟩,
#   ct_den[n]  = −recip[n]²/H · Σ_{e: col_e=n} u_e·⟨ct[r_e], x[n]⟩   (pass B1,
#                mirror again: u_rev·⟨ct_g, x_resident⟩ in the row plan)
#   ct_s_e     = (⟨ct[r_e], x[c_e]⟩·recip[c_e]/H + ct_den[c_e])·f'(s_e)
#   dx         = payload Σ a_e·A[r_e] at col (relocated to reverse edges)
#                + dke@Kᵀ at col (relocated) + dq@Qᵀ at row
# Pass B2 is the norm-1 twin of _bwd_sym_kernel with the resident/gathered
# roles of (recip, ct_den) swapped: the forward side reads them per edge
# (recip from the x|recip pack, ct_den from a narrow [cap, Hp] gather), the
# reverse side reads them as resident node rows.


def _norm1_perm(dpad: int = 128) -> np.ndarray:
    """[dpad, dpad] 0/1 matrix mapping natural column order to the pair-
    decode order (even columns then odd): x_E = x_pad @ Pm."""
    e = np.concatenate([np.arange(0, dpad, 2), np.arange(1, dpad, 2)])
    pm = np.zeros((dpad, dpad), np.float32)
    pm[e, np.arange(dpad)] = 1.0
    return pm


def _pack_pairs64(a: jax.Array, width: int = 64) -> jax.Array:
    """bf16 pair-pack the columns of ``a`` [N, D<=2*width] f32 into
    [N, width] f32-bitcast u32 lanes: lane j = (a[:,2j] | a[:,2j+1]<<16).
    Shipped as f32 bits — a u32 array through barrier + gather + the
    adjoint while_loop stalls the TPU compiler (see _bwd_dx_col_kernel)."""
    n, d = a.shape
    if d % 2:
        a = jnp.concatenate([a, jnp.zeros((n, 1), a.dtype)], axis=1)
    rnd = jnp.uint32(0x8000)
    af = a.astype(jnp.float32)
    lo = (jax.lax.bitcast_convert_type(af[:, 0::2], jnp.uint32) + rnd) >> 16
    hi = ((jax.lax.bitcast_convert_type(af[:, 1::2], jnp.uint32) + rnd)
          & jnp.uint32(0xFFFF0000))
    w = hi | lo
    pairs = w.shape[1]
    if pairs < width:
        w = jnp.concatenate(
            [w, jnp.zeros((n, width - pairs), jnp.uint32)], axis=1)
    return jax.lax.bitcast_convert_type(w, jnp.float32)


def _pack_x_recip(x: jax.Array, recip, hp: int) -> jax.Array:
    """[N, 128] f32 gather table: lanes 0..63 = bf16 pairs of x's columns,
    lanes 64..64+hp = per-head recip f32 RAW (zeros when recip is None)."""
    n = x.shape[0]
    w = _pack_pairs64(x)
    if recip is None:
        r = jnp.zeros((n, 64), jnp.float32)
    else:
        r = recip.astype(jnp.float32)
        if r.shape[1] < 64:
            r = jnp.concatenate(
                [r, jnp.zeros((n, 64 - r.shape[1]), jnp.float32)], axis=1)
    return jnp.concatenate([w, r], axis=1)


def _decode_pairs(w_f32: jax.Array) -> jax.Array:
    """[chunk, W] f32-bitcast pair lanes -> [chunk, 2W] f32 in even-then-odd
    (E) column order."""
    w_u = jax.lax.bitcast_convert_type(w_f32, jnp.uint32)
    lo = jax.lax.bitcast_convert_type(w_u << 16, jnp.float32)
    hi = jax.lax.bitcast_convert_type(w_u & jnp.uint32(0xFFFF0000),
                                      jnp.float32)
    return jnp.concatenate([lo, hi], axis=1)


def _norm1_u_duds(sm, vmask, square_plus):
    if square_plus:
        r = jnp.sqrt(sm * sm + 4.0)
        return (sm + r) * 0.5 * vmask, (1.0 + sm / r) * 0.5 * vmask
    u = jnp.exp(sm)
    return u * vmask, u * vmask


def _norm1_rev_kernel(cr_ref, rowl_ref, valid_ref, wg_ref, xt_ref, qw_ref,
                      qb_ref, kw_ref, kb_ref, sel_ref, gmax_ref, *rest,
                      chunk, block_n, att, heads, hp, d_k, square_plus,
                      dtype, score, with_ct):
    """Reverse-edge row-plan reduction: out[n, h] = Σ_{row edges (n,c)}
    u(S(q[c], k[n])) [· ⟨ct[c], x[n]⟩ when with_ct] — the column
    denominators (den_col) respectively the ct_den numerators (pass B1)."""
    n_ex = _N_SCORE_EXTRAS.get(score, 0)
    sp_extra = tuple(r[0, 0] for r in rest[:n_ex]) or None
    rest = rest[n_ex:]
    if with_ct:
        ctg_ref = rest[0]
        rest = rest[1:]
    out_ref, = rest
    i = pl.program_id(0)
    prev = cr_ref[jnp.maximum(i - 1, 0)]

    @pl.when((i == 0) | (cr_ref[i] != prev))
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    rowl = rowl_ref[:]
    xe = _decode_pairs(wg_ref[:][:, :64]).astype(dtype)      # x[col], E order
    iota_n = jax.lax.broadcasted_iota(jnp.int32, (block_n, chunk), 0)
    pt = (rowl[None, :] == iota_n).astype(dtype)
    dims0 = (((0,), (0,)), ((), ()))
    xt_l = xt_ref[:].astype(dtype)
    # reverse-edge operands: q at the gathered endpoint, k at the resident
    src_rev = (jnp.dot(xe, qw_ref[:].astype(dtype),
                       preferred_element_type=jnp.float32) + qb_ref[:])
    k_blk = (jnp.dot(xt_l, kw_ref[:].astype(dtype),
                     preferred_element_type=jnp.float32)
             + kb_ref[:]).astype(dtype)
    k_rev = jax.lax.dot_general(pt, k_blk, dims0,
                                preferred_element_type=jnp.float32)
    s_r, _aux = _kernel_scores(src_rev, k_rev, sel_ref[:], d_k, score,
                               sp_extra, dtype)
    hmask = (jax.lax.broadcasted_iota(jnp.int32, (1, hp), 1) < heads)
    vmask = hmask.astype(jnp.float32) * valid_ref[:][:, None]
    u, _duds = _norm1_u_duds(s_r - gmax_ref[0, 0], vmask, square_plus)
    if with_ct:
        ct_g = _decode_pairs(ctg_ref[:])                     # [chunk, 128]
        xe_rev = jax.lax.dot_general(pt, xt_l, dims0,
                                     preferred_element_type=jnp.float32)
        dot_r = jnp.dot((ct_g * xe_rev).astype(dtype),
                        jnp.ones((ct_g.shape[1], 8), dtype),
                        preferred_element_type=jnp.float32)[:, :1]
        u = u * dot_r
    out_ref[:] += jnp.dot(pt, u.astype(dtype),
                          preferred_element_type=jnp.float32)


def _norm1_rev_call(plan: StripePlan, qw, qb, kw, kb, x_e128, xg_pack, gmax,
                    *, heads: int, square_plus: bool, score: str,
                    score_params=(), ct_g=None, dtype=jnp.bfloat16,
                    interpret: bool | None = None):
    """out [N, Hp]: den_col (ct_g=None) or the B1 ct_den numerators.

    x_e128: [N, 128] node states in pair-decode (E) column order; xg_pack:
    the [cap, 128] x|recip pack per plan slot; qw/kw: [128, ATT] E-row
    projections; ct_g: optional [cap, 64] bf16 pair pack of the output
    cotangent (E order)."""
    att = qw.shape[1]
    hp = max(8, heads)
    d_k = att // heads
    chunk, block_n, nc = plan.chunk, plan.block_n, plan.n_chunks
    if interpret is None:
        interpret = not _on_tpu()
    sel = jnp.asarray(_score_selector(score, att, heads, hp))
    valid = jnp.asarray(plan.valid, jnp.float32)
    gmax2 = jnp.reshape(gmax.astype(jnp.float32), (1, 1))
    kb2 = jnp.reshape(kb.astype(jnp.float32), (1, att))
    qb2 = jnp.reshape(qb.astype(jnp.float32), (1, att))
    in_specs = [
        pl.BlockSpec((chunk,), lambda i, cr: (i,)),            # rowl
        pl.BlockSpec((chunk,), lambda i, cr: (i,)),            # valid
        pl.BlockSpec((chunk, 128), lambda i, cr: (i, 0)),      # x|recip pack
        pl.BlockSpec((block_n, 128), lambda i, cr: (cr[i], 0)),  # x_E rows
        pl.BlockSpec((128, att), lambda i, cr: (0, 0)),        # Q_E
        pl.BlockSpec((1, att), lambda i, cr: (0, 0)),          # Q_b
        pl.BlockSpec((128, att), lambda i, cr: (0, 0)),        # K_E
        pl.BlockSpec((1, att), lambda i, cr: (0, 0)),          # K_b
        pl.BlockSpec(tuple(sel.shape), lambda i, cr: (0, 0)),  # selector
        pl.BlockSpec((1, 1), lambda i, cr: (0, 0),
                     memory_space=pltpu.SMEM),                 # gmax
    ]
    args = [jnp.asarray(plan.chunk_rows), jnp.asarray(plan.row_local),
            valid, xg_pack, x_e128, qw, qb2, kw, kb2, sel, gmax2]
    for v in tuple(score_params or ())[:_N_SCORE_EXTRAS.get(score, 0)]:
        in_specs.append(pl.BlockSpec((1, 1), lambda i, cr: (0, 0),
                                     memory_space=pltpu.SMEM))
        args.append(jnp.reshape(v.astype(jnp.float32), (1, 1)))
    if ct_g is not None:
        in_specs.append(pl.BlockSpec((chunk, 64), lambda i, cr: (i, 0)))
        args.append(ct_g)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nc,),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((block_n, hp), lambda i, cr: (cr[i], 0)),
        ),
    )
    kernel = functools.partial(
        _norm1_rev_kernel, chunk=chunk, block_n=block_n, att=att,
        heads=heads, hp=hp, d_k=d_k, square_plus=square_plus, dtype=dtype,
        score=score, with_ct=ct_g is not None)
    flops = 2 * nc * chunk * (block_n * (att + hp) + 128 * att)
    (out,) = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((plan.num_nodes, hp), jnp.float32),),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=nc * chunk * 128 * 4,
            transcendentals=nc * chunk * hp),
        interpret=interpret,
    )(*args)
    return out


def _norm1_fwd_kernel(cr_ref, rowl_ref, valid_ref, wg_ref, xt_ref, qw_ref,
                      qb_ref, kw_ref, kb_ref, sel_ref, gmax_ref, *rest,
                      chunk, block_n, att, heads, hp, d_k, square_plus,
                      dtype, score):
    """Column-normalised aggregation: ax[r] = (1/H)Σ_h Σ_e u_eh·recip_eh·
    x[c_e] with recip decoded from the x|recip pack — no row division."""
    n_ex = _N_SCORE_EXTRAS.get(score, 0)
    sp_extra = tuple(r[0, 0] for r in rest[:n_ex]) or None
    rest = rest[n_ex:]
    ax_ref, num_scr = rest
    i = pl.program_id(0)
    prev = cr_ref[jnp.maximum(i - 1, 0)]

    @pl.when((i == 0) | (cr_ref[i] != prev))
    def _():
        num_scr[:] = jnp.zeros_like(num_scr)

    rowl = rowl_ref[:]
    wg = wg_ref[:]
    xe = _decode_pairs(wg[:, :64]).astype(dtype)             # [chunk, 128]
    recip_e = wg[:, 64:64 + hp]                              # f32 raw
    q_blk = (jnp.dot(xt_ref[:].astype(dtype), qw_ref[:].astype(dtype),
                     preferred_element_type=jnp.float32)
             + qb_ref[:]).astype(dtype)
    iota_n = jax.lax.broadcasted_iota(jnp.int32, (block_n, chunk), 0)
    pt = (rowl[None, :] == iota_n).astype(dtype)
    src = jax.lax.dot_general(pt, q_blk, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    k_e = jnp.dot(xe, kw_ref[:].astype(dtype),
                  preferred_element_type=jnp.float32) + kb_ref[:]
    s, _aux = _kernel_scores(src, k_e, sel_ref[:], d_k, score, sp_extra,
                             dtype)
    hmask = (jax.lax.broadcasted_iota(jnp.int32, (1, hp), 1) < heads)
    vmask = hmask.astype(jnp.float32) * valid_ref[:][:, None]
    u, _duds = _norm1_u_duds(s - gmax_ref[0, 0], vmask, square_plus)
    a = u * recip_e                                          # normalised att
    for h in range(heads):
        pt_h = jnp.where(rowl[None, :] == iota_n, a[:, h][None, :],
                         0.0).astype(dtype)
        num_scr[:, h * 128:(h + 1) * 128] += jnp.dot(
            pt_h, xe, preferred_element_type=jnp.float32)
    acc = num_scr[:, 0:128]
    for h in range(1, heads):
        acc = acc + num_scr[:, h * 128:(h + 1) * 128]
    ax_ref[:] = acc * (1.0 / heads)


def _norm1_fwd_call(plan: StripePlan, qw, qb, kw, kb, x_e128, xg_pack, gmax,
                    *, heads: int, square_plus: bool, score: str,
                    score_params=(), dtype=jnp.bfloat16,
                    interpret: bool | None = None):
    """ax_E [N, 128] — the head-averaged column-normalised aggregate in
    pair-decode column order."""
    att = qw.shape[1]
    hp = max(8, heads)
    d_k = att // heads
    chunk, block_n, nc = plan.chunk, plan.block_n, plan.n_chunks
    if interpret is None:
        interpret = not _on_tpu()
    sel = jnp.asarray(_score_selector(score, att, heads, hp))
    valid = jnp.asarray(plan.valid, jnp.float32)
    gmax2 = jnp.reshape(gmax.astype(jnp.float32), (1, 1))
    kb2 = jnp.reshape(kb.astype(jnp.float32), (1, att))
    qb2 = jnp.reshape(qb.astype(jnp.float32), (1, att))
    in_specs = [
        pl.BlockSpec((chunk,), lambda i, cr: (i,)),
        pl.BlockSpec((chunk,), lambda i, cr: (i,)),
        pl.BlockSpec((chunk, 128), lambda i, cr: (i, 0)),      # x|recip pack
        pl.BlockSpec((block_n, 128), lambda i, cr: (cr[i], 0)),  # x_E rows
        pl.BlockSpec((128, att), lambda i, cr: (0, 0)),
        pl.BlockSpec((1, att), lambda i, cr: (0, 0)),
        pl.BlockSpec((128, att), lambda i, cr: (0, 0)),
        pl.BlockSpec((1, att), lambda i, cr: (0, 0)),
        pl.BlockSpec(tuple(sel.shape), lambda i, cr: (0, 0)),
        pl.BlockSpec((1, 1), lambda i, cr: (0, 0),
                     memory_space=pltpu.SMEM),
    ]
    args = [jnp.asarray(plan.chunk_rows), jnp.asarray(plan.row_local),
            valid, xg_pack, x_e128, qw, qb2, kw, kb2, sel, gmax2]
    for v in tuple(score_params or ())[:_N_SCORE_EXTRAS.get(score, 0)]:
        in_specs.append(pl.BlockSpec((1, 1), lambda i, cr: (0, 0),
                                     memory_space=pltpu.SMEM))
        args.append(jnp.reshape(v.astype(jnp.float32), (1, 1)))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nc,),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((block_n, 128), lambda i, cr: (cr[i], 0)),
        ),
        scratch_shapes=[pltpu.VMEM((block_n, heads * 128), jnp.float32)],
    )
    kernel = functools.partial(
        _norm1_fwd_kernel, chunk=chunk, block_n=block_n, att=att,
        heads=heads, hp=hp, d_k=d_k, square_plus=square_plus, dtype=dtype,
        score=score)
    flops = 2 * nc * chunk * (block_n * (att + heads * 128 + hp) + 128 * att)
    (ax,) = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((plan.num_nodes, 128), jnp.float32),),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=nc * chunk * 128 * 4,
            transcendentals=nc * chunk * hp),
        interpret=interpret,
    )(*args)
    return ax


def _norm1_bwd_kernel(cr_ref, rowl_ref, valid_ref, wg_ref, ctg_ref, ctdg_ref,
                      xt_ref, qw_ref, qb_ref, kw_ref, kb_ref, sel_ref,
                      gmax_ref, cta_ref, rcp_ref, ctd_ref, *rest,
                      chunk, block_n, att, heads, hp, d_k, square_plus,
                      dtype, score):
    """One-pass norm-1 backward — the _bwd_sym_kernel twin with the
    resident/gathered roles of (recip, ct_den) swapped (see section header).

    Forward edges (n,c):  ct_s = (⟨ct[n], x[c]⟩·recip[c]/H + ct_den[c])·f'
      → dq (row scatter), dkw/dkb/dgmax reductions; recip[c] decoded from
      the x|recip pack, ct_den[c] from the narrow [cap, Hp] gather.
    Reverse edges (c,n):  ct_s_rev uses the RESIDENT recip[n]/ct_den[n];
      payload Σ_h u_rev·recip[n]/H ⊙ ct[c] plus dke_rev@Kᵀ relocate the
      column-side x gradient to n's resident rows.
    """
    n_ex = _N_SCORE_EXTRAS.get(score, 0)
    sp_extra = tuple(r[0, 0] for r in rest[:n_ex]) or None
    rest = rest[n_ex:]
    if n_ex:
        dq_ref, dxr_ref, dkw_ref, dkb_ref, dgm_ref, dex_ref = rest
    else:
        dq_ref, dxr_ref, dkw_ref, dkb_ref, dgm_ref = rest
        dex_ref = None
    i = pl.program_id(0)
    prev = cr_ref[jnp.maximum(i - 1, 0)]

    @pl.when(i == 0)
    def _():
        dkw_ref[:] = jnp.zeros_like(dkw_ref)
        dkb_ref[:] = jnp.zeros_like(dkb_ref)
        dgm_ref[:] = jnp.zeros_like(dgm_ref)
        if dex_ref is not None:
            dex_ref[:] = jnp.zeros_like(dex_ref)

    @pl.when((i == 0) | (cr_ref[i] != prev))
    def _():
        dq_ref[:] = jnp.zeros_like(dq_ref)
        dxr_ref[:] = jnp.zeros_like(dxr_ref)

    rowl = rowl_ref[:]
    wg = wg_ref[:]
    xe = _decode_pairs(wg[:, :64]).astype(dtype)             # x[col], E order
    xe_f = xe.astype(jnp.float32)
    recip_g = wg[:, 64:64 + hp] * (1.0 / heads)              # recip[col]/H
    ctd_g = ctdg_ref[:]                                      # ct_den[col]
    xt_l = xt_ref[:].astype(dtype)
    hmask = (jax.lax.broadcasted_iota(jnp.int32, (1, hp), 1) < heads)
    vmask = hmask.astype(jnp.float32) * valid_ref[:][:, None]
    iota_n = jax.lax.broadcasted_iota(jnp.int32, (block_n, chunk), 0)
    pt = (rowl[None, :] == iota_n).astype(dtype)
    dims0 = (((0,), (0,)), ((), ()))
    gmax = gmax_ref[0, 0]
    ones_d8 = jnp.ones((128, 8), dtype)

    def selT_mm(a):
        return jax.lax.dot_general(
            a, sel_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    # ---- FORWARD edges: dq / dkw / dkb / dgmax ---------------------------
    q_blk = (jnp.dot(xt_l, qw_ref[:].astype(dtype),
                     preferred_element_type=jnp.float32)
             + qb_ref[:]).astype(dtype)
    src = jax.lax.dot_general(pt, q_blk, dims0,
                              preferred_element_type=jnp.float32)
    k_e = jnp.dot(xe, kw_ref[:].astype(dtype),
                  preferred_element_type=jnp.float32) + kb_ref[:]
    s, saux = _kernel_scores(src, k_e, sel_ref[:], d_k, score, sp_extra,
                             dtype)
    _u, duds = _norm1_u_duds(s - gmax, vmask, square_plus)
    ct_ax_e = jax.lax.dot_general(pt, cta_ref[:].astype(dtype), dims0,
                                  preferred_element_type=jnp.float32)
    dot = jnp.dot((ct_ax_e * xe_f).astype(dtype), ones_d8,
                  preferred_element_type=jnp.float32)[:, :1]
    ds = (dot * recip_g + ctd_g) * duds
    dsrc_f, dke, dextras = _kernel_scores_bwd(
        ds, src, k_e, sel_ref[:], selT_mm, d_k, score, sp_extra, saux)
    dq_ref[:] += jnp.dot(pt, dsrc_f.astype(dtype),
                         preferred_element_type=jnp.float32)
    dke_l = dke.astype(dtype)
    dkw_ref[:] += jax.lax.dot_general(xe, dke_l, dims0,
                                      preferred_element_type=jnp.float32)
    dkb_ref[:] += jnp.broadcast_to(jnp.sum(dke, axis=0, keepdims=True),
                                   dkb_ref.shape)
    dgm_ref[:] += jnp.broadcast_to(jnp.sum(ds, axis=0, keepdims=True),
                                   dgm_ref.shape)
    if dex_ref is not None:
        cid = jax.lax.broadcasted_iota(jnp.int32, dex_ref.shape, 1)
        val = jnp.zeros(dex_ref.shape, jnp.float32)
        for ci, dv in enumerate(dextras):
            val = jnp.where(cid == ci, dv, val)
        dex_ref[:] += val

    # ---- REVERSE edges: relocate the column-side x gradient --------------
    ct_g = _decode_pairs(ctg_ref[:])                         # ct[col], E
    src_rev = (jnp.dot(xe, qw_ref[:].astype(dtype),
                       preferred_element_type=jnp.float32) + qb_ref[:])
    k_blk = (jnp.dot(xt_l, kw_ref[:].astype(dtype),
                     preferred_element_type=jnp.float32)
             + kb_ref[:]).astype(dtype)
    k_rev = jax.lax.dot_general(pt, k_blk, dims0,
                                preferred_element_type=jnp.float32)
    xe_rev = jax.lax.dot_general(pt, xt_l, dims0,
                                 preferred_element_type=jnp.float32)
    s_r, saux_r = _kernel_scores(src_rev, k_rev, sel_ref[:], d_k, score,
                                 sp_extra, dtype)
    u_r, duds_r = _norm1_u_duds(s_r - gmax, vmask, square_plus)
    rg = jax.lax.dot_general(pt, rcp_ref[:].astype(dtype), dims0,
                             preferred_element_type=jnp.float32)
    ctd_res = jax.lax.dot_general(pt, ctd_ref[:].astype(dtype), dims0,
                                  preferred_element_type=jnp.float32)
    dot_r = jnp.dot((ct_g * xe_rev).astype(dtype), ones_d8,
                    preferred_element_type=jnp.float32)[:, :1]
    ds_r = (dot_r * rg + ctd_res) * duds_r
    dxr_acc = jnp.sum(u_r * rg, axis=1, keepdims=True) * ct_g
    _dsrc_r, dke_r, _dex_r = _kernel_scores_bwd(
        ds_r, src_rev, k_rev, sel_ref[:], selT_mm, d_k, score, sp_extra,
        saux_r)
    c_rev = dxr_acc + jax.lax.dot_general(
        dke_r.astype(dtype), kw_ref[:].astype(dtype),
        (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    dxr_ref[:] += jnp.dot(pt, c_rev.astype(dtype),
                          preferred_element_type=jnp.float32)


def _norm1_bwd_call(plan: StripePlan, qw, qb, kw, kb, x_e128, xg_pack, ct_g,
                    ctd_g, gmax, ct_e128, rcp_p, ctd, *, heads: int,
                    square_plus: bool, score: str, score_params=(),
                    dtype=jnp.bfloat16, interpret: bool | None = None):
    """(dq [N, ATT], dxr_E [N, 128], dkw_E [128, ATT], dkb, dgmax, dextra).

    xg_pack: the forward's x|recip pack (residual); ct_g: [cap, 64] bf16
    pair pack of the output cotangent (E order); ctd_g: [cap, Hp] f32
    ct_den[col]; ct_e128/rcp_p/ctd: resident node tables (ct in E order,
    recip/H, ct_den)."""
    att = qw.shape[1]
    hp = max(8, heads)
    d_k = att // heads
    chunk, block_n, nc = plan.chunk, plan.block_n, plan.n_chunks
    if interpret is None:
        interpret = not _on_tpu()
    sel = jnp.asarray(_score_selector(score, att, heads, hp))
    valid = jnp.asarray(plan.valid, jnp.float32)
    gmax2 = jnp.reshape(gmax.astype(jnp.float32), (1, 1))
    kb2 = jnp.reshape(kb.astype(jnp.float32), (1, att))
    qb2 = jnp.reshape(qb.astype(jnp.float32), (1, att))
    in_specs = [
        pl.BlockSpec((chunk,), lambda i, cr: (i,)),            # rowl
        pl.BlockSpec((chunk,), lambda i, cr: (i,)),            # valid
        pl.BlockSpec((chunk, 128), lambda i, cr: (i, 0)),      # x|recip pack
        pl.BlockSpec((chunk, 64), lambda i, cr: (i, 0)),       # ct pack
        pl.BlockSpec((chunk, hp), lambda i, cr: (i, 0)),       # ct_den[col]
        pl.BlockSpec((block_n, 128), lambda i, cr: (cr[i], 0)),  # x_E rows
        pl.BlockSpec((128, att), lambda i, cr: (0, 0)),        # Q_E
        pl.BlockSpec((1, att), lambda i, cr: (0, 0)),          # Q_b
        pl.BlockSpec((128, att), lambda i, cr: (0, 0)),        # K_E
        pl.BlockSpec((1, att), lambda i, cr: (0, 0)),          # K_b
        pl.BlockSpec(tuple(sel.shape), lambda i, cr: (0, 0)),  # selector
        pl.BlockSpec((1, 1), lambda i, cr: (0, 0),
                     memory_space=pltpu.SMEM),                 # gmax
        pl.BlockSpec((block_n, 128), lambda i, cr: (cr[i], 0)),  # ct_E rows
        pl.BlockSpec((block_n, hp), lambda i, cr: (cr[i], 0)),   # recip/H
        pl.BlockSpec((block_n, hp), lambda i, cr: (cr[i], 0)),   # ct_den
    ]
    args = [jnp.asarray(plan.chunk_rows), jnp.asarray(plan.row_local),
            valid, xg_pack, ct_g, ctd_g, x_e128, qw, qb2, kw, kb2, sel,
            gmax2, ct_e128, rcp_p, ctd]
    for v in tuple(score_params or ())[:_N_SCORE_EXTRAS.get(score, 0)]:
        in_specs.append(pl.BlockSpec((1, 1), lambda i, cr: (0, 0),
                                     memory_space=pltpu.SMEM))
        args.append(jnp.reshape(v.astype(jnp.float32), (1, 1)))
    out_specs = [
        pl.BlockSpec((block_n, att), lambda i, cr: (cr[i], 0)),  # dq
        pl.BlockSpec((block_n, 128), lambda i, cr: (cr[i], 0)),  # dxr_E
        pl.BlockSpec((128, att), lambda i, cr: (0, 0)),          # dkw_E
        pl.BlockSpec((8, att), lambda i, cr: (0, 0)),            # dkb
        pl.BlockSpec((8, hp), lambda i, cr: (0, 0)),             # dgm
    ]
    out_shape = [
        jax.ShapeDtypeStruct((plan.num_nodes, att), jnp.float32),
        jax.ShapeDtypeStruct((plan.num_nodes, 128), jnp.float32),
        jax.ShapeDtypeStruct((128, att), jnp.float32),
        jax.ShapeDtypeStruct((8, att), jnp.float32),
        jax.ShapeDtypeStruct((8, hp), jnp.float32),
    ]
    if _N_SCORE_EXTRAS.get(score, 0):
        out_specs.append(pl.BlockSpec((8, 8), lambda i, cr: (0, 0)))
        out_shape.append(jax.ShapeDtypeStruct((8, 8), jnp.float32))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nc,),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
    )
    kernel = functools.partial(
        _norm1_bwd_kernel, chunk=chunk, block_n=block_n, att=att,
        heads=heads, hp=hp, d_k=d_k, square_plus=square_plus, dtype=dtype,
        score=score)
    flops = 4 * nc * chunk * block_n * (att + 2 * 128 + hp + att)
    outs = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=tuple(out_shape),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=nc * chunk * 128 * 8,
            transcendentals=2 * nc * chunk * hp),
        interpret=interpret,
    )(*args)
    dq, dxr, dkw, dkb8, dgm8 = outs[:5]
    dkb = dkb8[0]
    dgmax = -jnp.sum(dgm8[0, :heads])
    dextra = ()
    if _N_SCORE_EXTRAS.get(score, 0):
        dex = outs[5]
        dextra = tuple(dex[0, ci].astype(v.dtype).reshape(v.shape)
                       for ci, v in enumerate(score_params))
    return dq, dxr, dkw, dkb, dgmax, dextra


def make_fused_ax_norm1(plan: StripePlan, heads: int, square_plus: bool,
                        score: str, col: jax.Array):
    """Column-normalised (attention_norm_idx=1) fused RHS aggregate for
    SYMMETRIC edge multisets: op(qw, qb, kw, kb, x, gmax, score_params) ->
    (ax [N, D], den_col [N, Hp]).

    ax[r] = (1/H)·Σ_h Σ_{e: row_e=r} u_eh / den_col[col_e, h] · x[col_e]
    with den_col the per-COLUMN score mass — the reference's norm_idx=1
    semantics (function_transformer_attention.py:210-213) that the norm0
    fused path cannot express. Design and backward derivation: see the
    section header above. The payload rides bf16 (the x|recip pack packs x
    as bf16 pairs); requires D <= 128 and plan.symmetric.
    """
    assert plan.symmetric, "make_fused_ax_norm1 requires a symmetric plan"
    hp = max(8, heads)
    pm_np = _norm1_perm(128)

    def _prep(qw, kw, x):
        n, d = x.shape
        assert d <= 128, "norm1 fused path requires D <= 128"
        att = qw.shape[1]
        pm = jnp.asarray(pm_np)
        x128 = x.astype(jnp.float32)
        if d < 128:
            x128 = jnp.concatenate(
                [x128, jnp.zeros((n, 128 - d), jnp.float32)], axis=1)
        x_e = x128 @ pm                      # resident states, E order
        qpad = qw.astype(jnp.float32)
        kpad = kw.astype(jnp.float32)
        if d < 128:
            zp = jnp.zeros((128 - d, att), jnp.float32)
            qpad = jnp.concatenate([qpad, zp], axis=0)
            kpad = jnp.concatenate([kpad, zp], axis=0)
        qw_e = pm.T @ qpad                   # E-row projections
        kw_e = pm.T @ kpad
        return x_e, qw_e, kw_e, pm

    def _fwd_core(qw, qb, kw, kb, x, gmax, sp):
        d = x.shape[1]
        x_e, qw_e, kw_e, pm = _prep(qw, kw, x)
        pack0 = _pack_x_recip(x.astype(jnp.float32), None, hp)
        g1 = jax.lax.optimization_barrier(pack0)[col]
        den = _norm1_rev_call(plan, qw_e, qb, kw_e, kb, x_e, g1, gmax,
                              heads=heads, square_plus=square_plus,
                              score=score, score_params=sp)
        recip = 1.0 / (den[:, :heads] + 1e-16)
        pack1 = _pack_x_recip(x.astype(jnp.float32), recip, hp)
        g2 = jax.lax.optimization_barrier(pack1)[col]
        ax_e = _norm1_fwd_call(plan, qw_e, qb, kw_e, kb, x_e, g2, gmax,
                               heads=heads, square_plus=square_plus,
                               score=score, score_params=sp)
        ax = (ax_e @ pm.T)[:, :d]
        return ax, den, (x_e, g2, qw_e, kw_e, pm)

    @jax.custom_vjp
    def op(qw, qb, kw, kb, x, gmax, score_params=()):
        ax, den, _ = _fwd_core(qw, qb, kw, kb, x, gmax, score_params)
        return ax, den

    def fwd(qw, qb, kw, kb, x, gmax, score_params=()):
        ax, den, aux = _fwd_core(qw, qb, kw, kb, x, gmax, score_params)
        return (ax, den), (qw, qb, kw, kb, x, gmax, den, aux, score_params)

    def bwd(res, cts):
        qw, qb, kw, kb, x, gmax, den, aux, sp = res
        x_e, g2, qw_e, kw_e, pm = aux
        ct_ax_in, ct_den_in = cts
        n, d = x.shape
        ct = ct_ax_in.astype(jnp.float32)
        ct128 = ct
        if d < 128:
            ct128 = jnp.concatenate(
                [ct128, jnp.zeros((n, 128 - d), jnp.float32)], axis=1)
        ct_e = ct128 @ pm                                   # resident, E
        recip = 1.0 / (den[:, :heads] + 1e-16)
        # B1: ct_den numerators via the mirror (needs ct at the column side)
        ct_pack = _pack_pairs64(ct128)                      # [N, 64]
        g_ct = jax.lax.optimization_barrier(ct_pack)[col]
        m = _norm1_rev_call(plan, qw_e, qb, kw_e, kb, x_e, g2, gmax,
                            heads=heads, square_plus=square_plus,
                            score=score, score_params=sp, ct_g=g_ct)
        ctd = ct_den_in.astype(jnp.float32).at[:, :heads].add(
            -(m[:, :heads] * recip * recip) / heads)
        g_ctd = jax.lax.optimization_barrier(ctd)[col]      # [cap, Hp]
        rcp_p = jnp.concatenate(
            [recip * (1.0 / heads),
             jnp.zeros((n, hp - heads), jnp.float32)], axis=1)
        dq, dxr_e, dkw_e, dkb, dgmax, dextra = _norm1_bwd_call(
            plan, qw_e, qb, kw_e, kb, x_e, g2, g_ct, g_ctd, gmax, ct_e,
            rcp_p, ctd, heads=heads, square_plus=square_plus, score=score,
            score_params=sp)
        pmj = jnp.asarray(pm_np)
        dx = ((dxr_e @ pmj.T)[:, :d] + dq @ qw.T).astype(x.dtype)
        dqw = (x.astype(jnp.float32).T @ dq).astype(qw.dtype)
        dqb = jnp.sum(dq, axis=0)
        dkw = ((pmj @ dkw_e)[:d]).astype(kw.dtype)
        return (dqw, dqb, dkw, dkb, dx, dgmax, dextra)

    op.defvjp(fwd, bwd)
    return op
