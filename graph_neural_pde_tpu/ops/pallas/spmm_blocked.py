"""Blocked SpMM / SDDMM Pallas kernels: sparse aggregation on the MXU.

out[row] += w·x[col] with edges laid out by ops.pallas.plan.BlockPlan.
Each grid step processes one chunk of edges whose rows fall in one node
block and cols in another; the gather and the scatter both become one-hot
matmuls against VMEM-resident node blocks:

    P[e, j] = (col_local[e] == j)      gather:  G = P @ x_block   (MXU)
    S[i, e] = (row_local[e] == i)      scatter: out_block += S @ (w ⊙ G)

Chunks of one row block are contiguous, so the output block accumulates in
VMEM across its whole stripe (matmul k-loop pattern) and is written back
once. This replaces XLA's index-latency-bound gather/scatter (~10ns/edge on
v5e) with dense MXU work — the TPU-native equivalent of torch_sparse.spmm
(/root/reference/src/function_laplacian_diffusion.py:28-36).

Gradients: custom VJP — dx = Aᵀ·ct via the same kernel on the transposed
plan; dw = SDDMM(ct, x) (per-edge dot of two gathered blocks).

When to use: the one-hot matmuls cost 4·block_n·D FLOPs per edge slot, and
bucket padding grows as buckets empty out — so this kernel wins on graphs
with strong block locality (pixel grids, community-clustered graphs after
RCM reordering, kNN graphs on low-dim embeddings) and loses to the XLA
gather/segment-sum path (ops.spmm) on uniformly sparse graphs, where XLA's
~11ns/edge indexed access is near the hardware's random-access limit
(measured v5e). ops.spmm stays the default; this is the specialised path.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from graph_neural_pde_tpu.ops.pallas.plan import (
    BlockPlan,
    build_block_plan,
    transpose_plan,
)


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def _edges_1d(plan: BlockPlan):
    """Edge slot arrays as flat 1D vectors — Mosaic accepts (chunk,) blocks
    on 1D arrays where it rejects (1, chunk) tiles of a 2D layout."""
    return (jnp.asarray(plan.row_local), jnp.asarray(plan.col_local))


def _onehot_cols(coll, chunk, block_n, dtype):
    """P[e, j] = (col_local[e] == j) — [chunk, block_n]."""
    iota = jax.lax.broadcasted_iota(jnp.int32, (chunk, block_n), 1)
    return (coll[:, None] == iota).astype(dtype)


def _onehot_rows_t(rowl, chunk, block_n, dtype):
    """S[i, e] = (row_local[e] == i) — [block_n, chunk]."""
    iota = jax.lax.broadcasted_iota(jnp.int32, (block_n, chunk), 0)
    return (rowl[None, :] == iota).astype(dtype)


# ---------------------------------------------------------------------------
# SpMM
# ---------------------------------------------------------------------------

def _spmm_kernel(cr_ref, cc_ref, rowl_ref, coll_ref, w_ref, x_ref, out_ref,
                 *, chunk, block_n, dtype):
    i = pl.program_id(0)
    prev = cr_ref[jnp.maximum(i - 1, 0)]

    @pl.when((i == 0) | (cr_ref[i] != prev))
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    rowl = rowl_ref[:]
    coll = coll_ref[:]
    p = _onehot_cols(coll, chunk, block_n, dtype)
    s = _onehot_rows_t(rowl, chunk, block_n, dtype)
    gathered = jnp.dot(p, x_ref[:].astype(dtype),
                       preferred_element_type=jnp.float32)      # [C, D]
    vals = (gathered * w_ref[:][:, None]).astype(dtype)
    out_ref[:] += jnp.dot(s, vals, preferred_element_type=jnp.float32)


def _spmm_call(plan: BlockPlan, x: jax.Array, w: jax.Array,
               dtype=jnp.float32, interpret: bool | None = None) -> jax.Array:
    """Raw kernel invocation: x [N_pad, D], w [capacity] -> out [N_pad, D]."""
    n_pad, d = x.shape
    assert n_pad == plan.num_nodes, (n_pad, plan.num_nodes)
    chunk, block_n = plan.chunk, plan.block_n
    nc = plan.n_chunks
    if interpret is None:
        interpret = not _on_tpu()
    rowl1, coll1 = _edges_1d(plan)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nc,),
        in_specs=[
            pl.BlockSpec((chunk,), lambda i, cr, cc: (i,)),
            pl.BlockSpec((chunk,), lambda i, cr, cc: (i,)),
            pl.BlockSpec((chunk,), lambda i, cr, cc: (i,)),
            pl.BlockSpec((block_n, d), lambda i, cr, cc: (cc[i], 0)),
        ],
        out_specs=pl.BlockSpec((block_n, d), lambda i, cr, cc: (cr[i], 0)),
    )
    kernel = functools.partial(_spmm_kernel, chunk=chunk, block_n=block_n,
                               dtype=dtype)
    flops = 2 * 2 * nc * chunk * block_n * d
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, d), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=nc * block_n * d * 8, transcendentals=0),
        interpret=interpret,
    )(jnp.asarray(plan.chunk_rows), jnp.asarray(plan.chunk_cols),
      rowl1, coll1, w, x)


# ---------------------------------------------------------------------------
# SDDMM (per-edge dot of gathered rows/cols — the SpMM weight gradient)
# ---------------------------------------------------------------------------

def _sddmm_kernel(cr_ref, cc_ref, rowl_ref, coll_ref, a_ref, b_ref, out_ref,
                  *, chunk, block_n, dtype):
    rowl = rowl_ref[:]
    coll = coll_ref[:]
    p_row = _onehot_cols(rowl, chunk, block_n, dtype)   # [C, B] one-hot rows
    p_col = _onehot_cols(coll, chunk, block_n, dtype)
    a_rows = jnp.dot(p_row, a_ref[:].astype(dtype),
                     preferred_element_type=jnp.float32)        # [C, D]
    b_cols = jnp.dot(p_col, b_ref[:].astype(dtype),
                     preferred_element_type=jnp.float32)
    out_ref[:] = jnp.sum(a_rows * b_cols, axis=1)


def _sddmm_call(plan: BlockPlan, a: jax.Array, b: jax.Array,
                dtype=jnp.float32, interpret: bool | None = None) -> jax.Array:
    """out[e] = a[row[e]] · b[col[e]] per edge slot — [capacity] float32."""
    n_pad, d = a.shape
    chunk, block_n = plan.chunk, plan.block_n
    nc = plan.n_chunks
    if interpret is None:
        interpret = not _on_tpu()
    rowl1, coll1 = _edges_1d(plan)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nc,),
        in_specs=[
            pl.BlockSpec((chunk,), lambda i, cr, cc: (i,)),
            pl.BlockSpec((chunk,), lambda i, cr, cc: (i,)),
            pl.BlockSpec((block_n, d), lambda i, cr, cc: (cr[i], 0)),
            pl.BlockSpec((block_n, d), lambda i, cr, cc: (cc[i], 0)),
        ],
        out_specs=pl.BlockSpec((chunk,), lambda i, cr, cc: (i,)),
    )
    kernel = functools.partial(_sddmm_kernel, chunk=chunk, block_n=block_n,
                               dtype=dtype)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((plan.capacity,), jnp.float32),
        interpret=interpret,
    )(jnp.asarray(plan.chunk_rows), jnp.asarray(plan.chunk_cols),
      rowl1, coll1, a, b)
    return out


# ---------------------------------------------------------------------------
# differentiable public op
# ---------------------------------------------------------------------------

class PlanPair(NamedTuple):
    """Forward plan + transposed plan + the slot permutation between them."""

    fwd: BlockPlan
    bwd: BlockPlan
    t_perm: np.ndarray
    t_valid: np.ndarray


def make_plan_pair(row, col, weight=None, mask=None, *, num_nodes: int,
                   block_n: int = 1024, chunk: int = 1024) -> PlanPair:
    fwd = build_block_plan(row, col, weight, mask, num_nodes=num_nodes,
                           block_n=block_n, chunk=chunk)
    bwd, t_perm, t_valid = transpose_plan(fwd)
    return PlanPair(fwd=fwd, bwd=bwd, t_perm=t_perm, t_valid=t_valid)


def make_spmm(plans: PlanPair):
    """Build a differentiable spmm(x, w) over a fixed plan pair.

    The plans live in the closure (static per graph); (x, w) are traced.
    """

    @jax.custom_vjp
    def spmm_fn(x, w):
        return _spmm_call(plans.fwd, x, w)

    def fwd(x, w):
        return _spmm_call(plans.fwd, x, w), (x, w)

    def bwd(res, ct):
        x, w = res
        w_t = jnp.where(jnp.asarray(plans.t_valid),
                        w[jnp.asarray(plans.t_perm)], 0.0)
        dx = _spmm_call(plans.bwd, ct, w_t)
        dw = _sddmm_call(plans.fwd, ct, x)
        dw = jnp.where(jnp.asarray(plans.fwd.valid), dw, 0.0)
        return dx, dw

    spmm_fn.defvjp(fwd, bwd)
    return spmm_fn


def spmm_blocked(plans: PlanPair, x: jax.Array, w: jax.Array) -> jax.Array:
    """A @ x with per-edge-slot weights (plan order); differentiable in (x, w)."""
    return make_spmm(plans)(x, w)
