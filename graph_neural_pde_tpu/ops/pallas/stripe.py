"""Row-stripe Pallas kernels: MXU gather/scatter along the sorted-row axis.

The general blocked kernel (spmm_blocked) buckets edges by (row_block,
col_block) and pays padding whenever buckets are sparse. But two of the three
indexed ops in the fused attention RHS only index the ROW side:

  * gathering q[row]  (narrow: attention_dim floats per edge)
  * scattering per-edge values into out[row]

and edges sorted by row are *perfectly* stripe-local: every edge in a chunk
has its row inside one node block, so a one-hot matmul against the
VMEM-resident block replaces the indexed op with MXU work and the only
padding is one partial chunk per node block (<10% on real graphs).

FLOP cost per edge: block_n · width · 2 — with block_n=1024 and width ≤ 258
that is ≤ 0.5 MFLOP/edge ≈ 0.3–2.7 ns/edge on a v5e MXU, versus ~12 ns/edge
for an XLA indexed op. The column-side gather keeps the XLA path (column
indices are not stripe-local).

Measured (v5e, 2.33M-edge arxiv-scale bench; round 2-3 results — the round-1
"gather only ties XLA / net gain ≈ 3%" finding was superseded once the
kernels fused): the dual scatter at the 128-aligned width H·D=256 runs
9.9 ms vs 23 ms for the lane-misaligned ones-column form and ~60 ms for
XLA's sorted segment-sum; composed into the one-pass fused RHS
(ops/pallas/fused_rhs.py) these kernels took the forward headline from
25.2M (round-1 composition) to 260M edge·NFE/s. The per-edge floor is the
x[col] gather's issue rate: 2.15 ns/row on v5e, independent of width
(32-128), dtype (bf16/f32) and index locality. Round 3 adds the column
plan (attach_col_plan/make_col_gather) and the backward mega-kernel
(fused_rhs._bwd_kernel), which replace the training step's unsorted dx
scatter + stripe-transpose chain.
"""

from __future__ import annotations

import dataclasses
import functools
from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


@partial(jax.tree_util.register_dataclass,
         data_fields=("row_local", "valid", "chunk_rows", "slot_of_edge",
                      "node_degree", "col_plan", "col_src_slot", "rev_slot"),
         meta_fields=("block_n", "chunk", "num_nodes", "symmetric"))
@dataclass(frozen=True)
class StripePlan:
    """Edges sorted by row, chunked without crossing node-block boundaries.

    row_local    : int32[capacity] — row id within the chunk's node block
    valid        : bool[capacity]
    chunk_rows   : int32[n_chunks] — node-block id per chunk
    slot_of_edge : int32[E_in] — plan slot of each input edge (for scattering
                   per-edge values computed in input order into plan order)
    node_degree  : int32[num_nodes] — valid out-edges per row (lets the
                   softmax-underflow guard distinguish a zeroed denominator
                   from a genuinely edgeless node)
    col_plan     : optional dual StripePlan over the COLUMN index (edges
                   sorted by col), used to turn the backward pass's
                   dx[col[e]] += ct[e] — an unsorted XLA scatter, the
                   dominant training cost — into a static permutation gather
                   + MXU stripe scatter (see attach_col_plan / col_gather)
    col_src_slot : int32[col_plan.capacity] — for each col-plan slot, the
                   ROW-plan slot holding the same edge (0 on padding)
    """

    row_local: np.ndarray
    valid: np.ndarray
    chunk_rows: np.ndarray
    slot_of_edge: np.ndarray
    node_degree: np.ndarray
    block_n: int
    chunk: int
    num_nodes: int
    col_plan: "StripePlan | None" = None
    col_src_slot: "np.ndarray | None" = None
    # True when the valid edge multiset equals its transpose (to_undirected
    # graphs): enables the symmetric backward, which relocates each edge's
    # x[col] cotangent to its reverse edge's row and eliminates the cold
    # [capacity]-sized permutation gather (measured ~12 ns/row — no row
    # reuse) plus the column-plan scatter from the training step
    symmetric: bool = False
    # int32[capacity] — for symmetric edge multisets, a bijection pairing
    # each valid slot's (row, col) edge with a slot holding (col, row)
    # (padding maps to itself). Unlocks the whole-matvec symmetric VJP in
    # ops.spmm.make_stripe_spmm: dx = Σ_{e: row=n} w[rev(e)]·ct[col[e]] is
    # a FORWARD stripe matvec with statically permuted weights — one
    # gather + one MXU scatter, versus the col-plan backward's recomputed
    # forward + row gather + [cap, D] permutation gather + col scatter
    # (measured 5.1× the forward per Chebyshev term; see attach_rev_slots)
    rev_slot: "np.ndarray | None" = None

    @property
    def n_chunks(self) -> int:
        return self.chunk_rows.shape[0]

    def layout_equal(self, other: "StripePlan") -> bool:
        """True when ``other`` has the identical slot layout, so compiled
        steps traced against this plan stay valid for graphs built against
        ``other`` (edge CONTENT is traced; only the layout is baked).
        Plans carrying col-content-dependent structure (col_plan /
        col_src_slot / symmetric) only compare equal when that structure
        matches too — rewiring paths build plans without it."""
        if (self.block_n, self.chunk, self.num_nodes, self.symmetric) != \
                (other.block_n, other.chunk, other.num_nodes,
                 other.symmetric):
            return False
        if not (np.array_equal(self.row_local, other.row_local)
                and np.array_equal(self.valid, other.valid)
                and np.array_equal(self.chunk_rows, other.chunk_rows)
                and np.array_equal(self.node_degree, other.node_degree)):
            return False
        if (self.col_plan is None) != (other.col_plan is None):
            return False
        if self.col_plan is not None:
            if not (self.col_plan.layout_equal(other.col_plan)
                    and np.array_equal(self.col_src_slot,
                                       other.col_src_slot)):
                return False
        if (self.rev_slot is None) != (other.rev_slot is None):
            return False
        if self.rev_slot is not None and not np.array_equal(
                self.rev_slot, other.rev_slot):
            return False
        return True

    @property
    def capacity(self) -> int:
        return self.row_local.shape[0]


def auto_chunk(row, mask=None, *, num_nodes: int, block_n: int,
               lo: int = 512, hi: int = 4096,
               per_chunk_overhead_slots: int = 256) -> int:
    """Pick the chunk size minimising padded capacity + per-chunk overhead.

    Every slot costs gather issue (~2.15 ns/row measured on v5e — width,
    dtype and locality independent) plus stream/MXU work, and every chunk
    carries a fixed score-stage cost (~1 µs ≈ 250 slot-equivalents), so the
    objective is cap + overhead·n_chunks over the valid candidates.

    Candidates are multiples of 1024: Mosaic windows a 1-D [capacity]
    operand (rowl/col_local/valid in every stripe/fused kernel) with
    tiling (1024,), and a (chunk,) block must divide it evenly — chunk
    1280 at Cora scale fails to compile ("block shape (1280) is not
    divisible by tiling"); 2048 at arxiv scale compiles. Finer-grained
    capacity tuning (the 128-step grid measured ~6% at arxiv scale)
    would need the 1-D operands reshaped to (cap/128, 128) with 8-row
    blocks — same 1024 granularity, so nothing is actually lost."""
    row = np.asarray(row, np.int64)
    if mask is not None:
        row = row[np.asarray(mask, bool)]
    n_pad = ((num_nodes + block_n - 1) // block_n) * block_n
    counts = np.bincount(row // block_n, minlength=n_pad // block_n)
    lo = max(1024, -(-lo // 1024) * 1024)
    hi = max(lo, (hi // 1024) * 1024)
    best, best_cost = hi, float("inf")
    for c in range(lo, hi + 1, 1024):
        nc = int(np.maximum(1, -(-counts // c)).sum())
        cost = nc * (c + per_chunk_overhead_slots)
        if cost < best_cost:
            best, best_cost = c, cost
    return best


def build_stripe_plan(row, mask=None, *, num_nodes: int, block_n: int = 1024,
                      chunk: int | None = 1024) -> StripePlan:
    """Host-side builder. ``row`` must already be sorted ascending over the
    valid entries (Graph.sort_by_row guarantees this). ``chunk=None``
    selects the capacity-minimising chunk via auto_chunk."""
    row = np.asarray(row, np.int64)
    e_in = row.shape[0]
    valid_in = (np.ones(e_in, bool) if mask is None
                else np.asarray(mask, bool))
    idx = np.where(valid_in)[0]
    r = row[idx]
    assert (np.diff(r) >= 0).all(), "rows must be sorted (Graph.sort_by_row)"
    if chunk is None:
        chunk = auto_chunk(r, num_nodes=num_nodes, block_n=block_n)
    elif _on_tpu() and chunk % 1024:
        # Mosaic windows rank-1 [capacity] operands (rowl/valid/col_local)
        # with tiling (1024,): a (chunk,) block that isn't a 1024-multiple
        # fails TPU lowering (measured: chunk 16 → "block shape must be a
        # multiple of the tiling size"; chunk 1280 → "not divisible by
        # tiling"). Interpret mode (CPU tests) keeps the requested chunk.
        chunk = -(-chunk // 1024) * 1024

    # native planner (runtime/graphcore.cpp) — same layout, C++ speed for
    # very large edge lists; the numpy path below is the reference/fallback
    from graph_neural_pde_tpu import runtime as _rt
    native = _rt.build_stripe_plan_native(r, num_nodes, block_n, chunk)
    if native is not None:
        row_local, valid, chunk_rows, slot_sub, node_degree, n_pad = native
        slot_of_edge = np.zeros(e_in, np.int32)
        slot_of_edge[idx] = slot_sub
        return StripePlan(row_local=row_local, valid=valid,
                          chunk_rows=chunk_rows, slot_of_edge=slot_of_edge,
                          node_degree=node_degree, block_n=block_n,
                          chunk=chunk, num_nodes=n_pad)

    n_pad = ((num_nodes + block_n - 1) // block_n) * block_n
    nblocks = n_pad // block_n
    rb = r // block_n

    chunks = []          # (block_id, src_start, n_valid)
    for b in range(nblocks):
        lo, hi = np.searchsorted(rb, [b, b + 1])
        cnt = hi - lo
        pc = max(1, -(-cnt // chunk))
        for j in range(pc):
            s = lo + j * chunk
            chunks.append((b, s, min(chunk, max(hi - s, 0))))

    nc = len(chunks)
    cap = nc * chunk
    row_local = np.zeros(cap, np.int32)
    valid = np.zeros(cap, bool)
    chunk_rows = np.zeros(nc, np.int32)
    slot_of_edge = np.zeros(e_in, np.int64)
    for ci, (b, s, nv) in enumerate(chunks):
        chunk_rows[ci] = b
        if nv:
            dst = slice(ci * chunk, ci * chunk + nv)
            row_local[dst] = (r[s:s + nv] - b * block_n).astype(np.int32)
            valid[dst] = True
            slot_of_edge[idx[s:s + nv]] = np.arange(ci * chunk,
                                                    ci * chunk + nv)
    return StripePlan(row_local=row_local, valid=valid,
                      chunk_rows=chunk_rows,
                      slot_of_edge=slot_of_edge.astype(np.int32),
                      node_degree=np.bincount(
                          r, minlength=n_pad).astype(np.int32),
                      block_n=block_n, chunk=chunk, num_nodes=n_pad)


def edges_symmetric(row, col, mask=None) -> bool:
    """True iff the valid edge MULTISET equals its transpose — the
    to_undirected invariant (reference data.py:90-94) the symmetric
    backward relies on."""
    row = np.asarray(row, np.int64)
    col = np.asarray(col, np.int64)
    if mask is not None:
        m = np.asarray(mask, bool)
        row, col = row[m], col[m]
    if row.size == 0:
        return True
    base = int(max(row.max(), col.max())) + 1
    fwd = np.sort(row * base + col)
    rev = np.sort(col * base + row)
    return bool(np.array_equal(fwd, rev))


def attach_col_plan(plan: StripePlan, col) -> StripePlan:
    """Build the dual COLUMN plan: the row plan's edges re-sorted by column,
    plus the slot map col-plan-slot -> row-plan-slot.

    ``col`` is the column id per ROW-plan slot (invalid slots ignored). The
    dual plan turns the backward pass's dx[col[e]] += ct[e] — an unsorted
    XLA scatter-add, the dominant cost of the round-2 train step — into a
    static permutation gather (per-row issue rate, ~2.15 ns/row on v5e) plus
    the MXU stripe scatter. Used by make_col_gather.
    """
    col = np.asarray(col, np.int64)
    assert col.shape[0] == plan.capacity
    valid = np.asarray(plan.valid, bool)
    slots = np.where(valid)[0]
    order = np.argsort(col[slots], kind="stable")
    sorted_slots = slots[order].astype(np.int64)   # row slots, col-sorted
    cplan = build_stripe_plan(col[sorted_slots], num_nodes=plan.num_nodes,
                              block_n=plan.block_n, chunk=plan.chunk)
    src = np.zeros(cplan.capacity, np.int32)
    src[np.asarray(cplan.slot_of_edge)] = sorted_slots.astype(np.int32)
    return dataclasses.replace(plan, col_plan=cplan, col_src_slot=src)


def attach_rev_slots(plan: StripePlan, row, col) -> StripePlan:
    """Pair every valid slot's (row, col) edge with a slot holding the
    reverse edge (col, row) — any bijection works, including for duplicate
    multi-edges, since the symmetric VJP only needs the reverse-edge weight
    multiset per row (see StripePlan.rev_slot). Returns the plan unchanged
    when the valid edge multiset is not symmetric.

    ``row``/``col`` are per-SLOT ids ([capacity], padding ignored)."""
    row = np.asarray(row, np.int64)
    col = np.asarray(col, np.int64)
    valid = np.asarray(plan.valid, bool)
    slots = np.where(valid)[0]
    if slots.size == 0:
        return dataclasses.replace(
            plan, rev_slot=np.arange(plan.capacity, dtype=np.int32))
    base = int(max(row[slots].max(), col[slots].max())) + 1
    fwd_key = row[slots] * base + col[slots]
    rev_key = col[slots] * base + row[slots]
    of = np.argsort(fwd_key, kind="stable")
    orv = np.argsort(rev_key, kind="stable")
    if not np.array_equal(fwd_key[of], rev_key[orv]):
        return plan                      # multiset not symmetric
    rev = np.arange(plan.capacity, dtype=np.int32)   # padding -> itself
    rev[slots[of]] = slots[orv].astype(np.int32)
    return dataclasses.replace(plan, rev_slot=rev)


def make_col_gather(plan: StripePlan, col: jax.Array, out_dtype=None):
    """Differentiable out[e] = x[col[e]] ([N_pad, D] -> [capacity, D] in
    row-plan slot order) whose BACKWARD rides the column plan: cotangents
    are permuted to col-plan slot order by a static-index gather and
    segment-summed by the one-hot MXU scatter, replacing XLA's unsorted
    scatter-add (which serialises on the random write stream).

    ``out_dtype`` folds the payload cast (e.g. bf16) into the op so the
    cotangent accumulates in the stripe scatter's f32 accumulator.
    Requires plan.col_plan (attach_col_plan).
    """
    cplan = plan.col_plan
    assert cplan is not None, "attach_col_plan must run first"
    # closure constants stay NUMPY: the factory runs inside traced code
    # (every RHS eval), and a traced op here (e.g. a [:, None] reshape)
    # would capture a stale forward-trace tracer in the bwd closure
    src_np = np.asarray(plan.col_src_slot)
    vmask_np = np.asarray(cplan.valid, np.float32)

    def _impl(x):
        xd = x if out_dtype is None else x.astype(out_dtype)
        return xd[col]

    @jax.custom_vjp
    def cg(x):
        return _impl(x)

    def fwd(x):
        return _impl(x), jnp.zeros((0,), x.dtype)

    def bwd(dt, ct):
        # permute to col-plan slot order (static indices, issue-rate bound)
        # in the cotangent's own dtype — no f32 materialisation — and fold
        # the padding mask into the weighted one-hot (invalid slots carry
        # w=0, so their garbage values never contribute)
        ct_c = ct[jnp.asarray(src_np)]
        dx = _stripe_scatter_w_call(cplan, jnp.asarray(vmask_np), ct_c)
        return (dx.astype(dt.dtype),)

    cg.defvjp(fwd, bwd)
    return cg


# ---------------------------------------------------------------------------
# stripe gather: out[e] = table[row[e]]  (per-edge copies of node rows)
# ---------------------------------------------------------------------------

def _gather_kernel(cr_ref, rowl_ref, tab_ref, out_ref, *, chunk, block_n,
                   dtype):
    # scatter-orientation one-hot [block_n, chunk] contracted over dim 0:
    # the [chunk, block_n] M-streaming layout costs 2.4x more on v5e
    # (7.0 vs 2.9 ms at arxiv scale) — K-streaming matmuls are the MXU's
    # fast path, M-tall ones are not
    iota = jax.lax.broadcasted_iota(jnp.int32, (block_n, chunk), 0)
    pt = (rowl_ref[:][None, :] == iota).astype(dtype)
    # f32 inputs still run the MXU's single bf16 pass at DEFAULT precision
    # (measured: ~3e-3 relative error on the "full-precision" gather);
    # HIGHEST forces the multi-pass f32 emulation for the exact paths
    prec = (jax.lax.Precision.HIGHEST if dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    out_ref[:] = jax.lax.dot_general(
        pt, tab_ref[:].astype(dtype), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)


def _stripe_gather_call(plan: StripePlan, table: jax.Array,
                        dtype=jnp.bfloat16, interpret: bool | None = None
                        ) -> jax.Array:
    """[capacity, D] = table[row] in plan slot order. table: [num_nodes, D]."""
    n_pad, d = table.shape
    assert n_pad == plan.num_nodes
    chunk, block_n, nc = plan.chunk, plan.block_n, plan.n_chunks
    if interpret is None:
        interpret = not _on_tpu()
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nc,),
        in_specs=[
            pl.BlockSpec((chunk,), lambda i, cr: (i,)),
            pl.BlockSpec((block_n, d), lambda i, cr: (cr[i], 0)),
        ],
        out_specs=pl.BlockSpec((chunk, d), lambda i, cr: (i, 0)),
    )
    kernel = functools.partial(_gather_kernel, chunk=chunk, block_n=block_n,
                               dtype=dtype)
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((plan.capacity, d), jnp.float32),
        interpret=interpret,
    )(jnp.asarray(plan.chunk_rows), jnp.asarray(plan.row_local), table)


# ---------------------------------------------------------------------------
# stripe scatter-add: out[row[e]] += vals[e]
# ---------------------------------------------------------------------------

def _scatter_kernel(cr_ref, rowl_ref, vals_ref, out_ref, *, chunk, block_n,
                    dtype):
    i = pl.program_id(0)
    prev = cr_ref[jnp.maximum(i - 1, 0)]

    @pl.when((i == 0) | (cr_ref[i] != prev))
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    # s[i, e] = (row_local[e] == i): compare against the ROW index
    iota = jax.lax.broadcasted_iota(jnp.int32, (block_n, chunk), 0)
    s = (rowl_ref[:][None, :] == iota).astype(dtype)
    prec = (jax.lax.Precision.HIGHEST if dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    out_ref[:] += jnp.dot(s, vals_ref[:].astype(dtype),
                          preferred_element_type=jnp.float32,
                          precision=prec)


def _stripe_scatter_call(plan: StripePlan, vals: jax.Array,
                         dtype=jnp.bfloat16, interpret: bool | None = None
                         ) -> jax.Array:
    """[num_nodes, D] = segment-sum of vals [capacity, D] by plan rows.

    Invalid slots must carry zero values (mask upstream)."""
    cap, d = vals.shape
    assert cap == plan.capacity
    chunk, block_n, nc = plan.chunk, plan.block_n, plan.n_chunks
    if interpret is None:
        interpret = not _on_tpu()
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nc,),
        in_specs=[
            pl.BlockSpec((chunk,), lambda i, cr: (i,)),
            pl.BlockSpec((chunk, d), lambda i, cr: (i, 0)),
        ],
        out_specs=pl.BlockSpec((block_n, d), lambda i, cr: (cr[i], 0)),
    )
    kernel = functools.partial(_scatter_kernel, chunk=chunk, block_n=block_n,
                               dtype=dtype)
    flops = 2 * nc * chunk * block_n * d
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((plan.num_nodes, d), jnp.float32),
        cost_estimate=pl.CostEstimate(flops=flops,
                                      bytes_accessed=nc * chunk * d * 4,
                                      transcendentals=0),
        interpret=interpret,
    )(jnp.asarray(plan.chunk_rows), jnp.asarray(plan.row_local), vals)


# ---------------------------------------------------------------------------
# differentiable wrappers: gather and scatter-add are each other's transpose
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def stripe_gather(plan: StripePlan, table: jax.Array) -> jax.Array:
    """Differentiable out[e] = table[row[e]] (plan slot order)."""
    return _stripe_gather_call(plan, table)


def _sg_fwd(plan, table):
    return _stripe_gather_call(plan, table), jnp.zeros((0,), table.dtype)


def _sg_bwd(plan, dt, ct):
    return (_stripe_scatter_call(plan, ct).astype(dt.dtype),)


stripe_gather.defvjp(_sg_fwd, _sg_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def stripe_scatter_add(plan: StripePlan, vals: jax.Array) -> jax.Array:
    """Differentiable out[n] = sum_e∈rows(n) vals[e]. Invalid slots must be 0."""
    return _stripe_scatter_call(plan, vals)


def _ss_fwd(plan, vals):
    return _stripe_scatter_call(plan, vals), jnp.zeros((0,), vals.dtype)


def _ss_bwd(plan, dt, ct):
    # mask the gathered cotangent so padding slots stay grad-free
    g = _stripe_gather_call(plan, ct)
    return ((g * jnp.asarray(plan.valid, g.dtype)[:, None])
            .astype(dt.dtype),)


stripe_scatter_add.defvjp(_ss_fwd, _ss_bwd)


# ---------------------------------------------------------------------------
# weighted scatter-add: out[row[e]] += w[e]·vals[e], weight inside the one-hot
# ---------------------------------------------------------------------------
# Folding the per-edge weight into the one-hot selector (select w where the
# plain selector had 1) skips materialising w·vals — one VPU pass and one
# [cap, D] HBM round-trip less per SpMM. This is the laplacian matvec of
# every tuned best_params config (function_laplacian_diffusion.py:28-36).

def _scatter_w_kernel(cr_ref, rowl_ref, w_ref, vals_ref, out_ref, *,
                      chunk, block_n, dtype):
    i = pl.program_id(0)
    prev = cr_ref[jnp.maximum(i - 1, 0)]

    @pl.when((i == 0) | (cr_ref[i] != prev))
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    iota = jax.lax.broadcasted_iota(jnp.int32, (block_n, chunk), 0)
    sw = jnp.where(rowl_ref[:][None, :] == iota, w_ref[:][None, :],
                   0.0).astype(dtype)
    out_ref[:] += jnp.dot(sw, vals_ref[:].astype(dtype),
                          preferred_element_type=jnp.float32)


def _stripe_scatter_w_call(plan: StripePlan, w: jax.Array, vals: jax.Array,
                           dtype=jnp.bfloat16, interpret: bool | None = None
                           ) -> jax.Array:
    """[num_nodes, D] = segment-sum of w[e]·vals[e] by plan rows.

    Invalid slots must carry zero WEIGHTS (vals may be anything there)."""
    cap, d = vals.shape
    assert cap == plan.capacity and w.shape == (cap,)
    chunk, block_n, nc = plan.chunk, plan.block_n, plan.n_chunks
    if interpret is None:
        interpret = not _on_tpu()
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nc,),
        in_specs=[
            pl.BlockSpec((chunk,), lambda i, cr: (i,)),
            pl.BlockSpec((chunk,), lambda i, cr: (i,)),
            pl.BlockSpec((chunk, d), lambda i, cr: (i, 0)),
        ],
        out_specs=pl.BlockSpec((block_n, d), lambda i, cr: (cr[i], 0)),
    )
    kernel = functools.partial(_scatter_w_kernel, chunk=chunk,
                               block_n=block_n, dtype=dtype)
    flops = 2 * nc * chunk * block_n * d
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((plan.num_nodes, d), jnp.float32),
        cost_estimate=pl.CostEstimate(flops=flops,
                                      bytes_accessed=nc * chunk * d * 2,
                                      transcendentals=0),
        interpret=interpret,
    )(jnp.asarray(plan.chunk_rows), jnp.asarray(plan.row_local),
      w.astype(jnp.float32), vals)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def stripe_scatter_add_weighted(plan: StripePlan, w: jax.Array,
                                vals: jax.Array) -> jax.Array:
    """Differentiable out[n] = Σ_{e∈rows(n)} w[e]·vals[e].

    Invalid slots must carry w = 0."""
    return _stripe_scatter_w_call(plan, w, vals)


def _ssw_fwd(plan, w, vals):
    return _stripe_scatter_w_call(plan, w, vals), (w, vals)


def _ssw_bwd(plan, res, ct):
    w, vals = res
    g = _stripe_gather_call(plan, ct)          # ct[row[e]] per slot, f32
    m = jnp.asarray(plan.valid, g.dtype)
    dw = (jnp.sum(g * vals.astype(g.dtype), axis=1) * m).astype(w.dtype)
    dvals = (g * (w.astype(g.dtype) * m)[:, None]).astype(vals.dtype)
    return dw, dvals


stripe_scatter_add_weighted.defvjp(_ssw_fwd, _ssw_bwd)


# ---------------------------------------------------------------------------
# dual scatter / gather: numerators + denominators share ONE one-hot
# ---------------------------------------------------------------------------
# The fused attention RHS needs Σ_e u_eh·x_e (wide, H·D) AND Σ_e u_eh (narrow)
# per row. Appending a ones column makes the wide operand H·(D+1) — and a
# 128-misaligned lane width costs ~2.3x on Mosaic (measured: 23 ms vs 9.9 ms
# at 2.7M slots). Instead both sums ride one kernel: the one-hot selector is
# built once and feeds two MXU matmuls, keeping the wide side 128-aligned;
# the narrow side adds ~3% FLOPs.

def _scatter2_kernel(cr_ref, rowl_ref, vals_ref, u_ref, num_ref, den_ref, *,
                     chunk, block_n, dtype):
    i = pl.program_id(0)
    prev = cr_ref[jnp.maximum(i - 1, 0)]

    @pl.when((i == 0) | (cr_ref[i] != prev))
    def _():
        num_ref[:] = jnp.zeros_like(num_ref)
        den_ref[:] = jnp.zeros_like(den_ref)

    iota = jax.lax.broadcasted_iota(jnp.int32, (block_n, chunk), 0)
    s = (rowl_ref[:][None, :] == iota).astype(dtype)
    num_ref[:] += jnp.dot(s, vals_ref[:].astype(dtype),
                          preferred_element_type=jnp.float32)
    den_ref[:] += jnp.dot(s, u_ref[:].astype(dtype),
                          preferred_element_type=jnp.float32)


def _stripe_scatter2_call(plan: StripePlan, vals: jax.Array, u: jax.Array,
                          dtype=jnp.bfloat16, interpret: bool | None = None):
    """(num [N, D], den [N, Hp]) = per-row sums of vals [cap, D], u [cap, Hp].

    Invalid slots must carry zeros in BOTH operands."""
    cap, d = vals.shape
    hp = u.shape[1]
    assert cap == plan.capacity and u.shape[0] == cap
    chunk, block_n, nc = plan.chunk, plan.block_n, plan.n_chunks
    if interpret is None:
        interpret = not _on_tpu()
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nc,),
        in_specs=[
            pl.BlockSpec((chunk,), lambda i, cr: (i,)),
            pl.BlockSpec((chunk, d), lambda i, cr: (i, 0)),
            pl.BlockSpec((chunk, hp), lambda i, cr: (i, 0)),
        ],
        out_specs=(
            pl.BlockSpec((block_n, d), lambda i, cr: (cr[i], 0)),
            pl.BlockSpec((block_n, hp), lambda i, cr: (cr[i], 0)),
        ),
    )
    kernel = functools.partial(_scatter2_kernel, chunk=chunk,
                               block_n=block_n, dtype=dtype)
    flops = 2 * nc * chunk * block_n * (d + hp)
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((plan.num_nodes, d), jnp.float32),
                   jax.ShapeDtypeStruct((plan.num_nodes, hp), jnp.float32)),
        cost_estimate=pl.CostEstimate(flops=flops,
                                      bytes_accessed=nc * chunk * (d + hp) * 4,
                                      transcendentals=0),
        interpret=interpret,
    )(jnp.asarray(plan.chunk_rows), jnp.asarray(plan.row_local), vals, u)


def _gather2_kernel(cr_ref, rowl_ref, t1_ref, t2_ref, o1_ref, o2_ref, *,
                    chunk, block_n, dtype):
    # K-streaming orientation (see _gather_kernel)
    iota = jax.lax.broadcasted_iota(jnp.int32, (block_n, chunk), 0)
    pt = (rowl_ref[:][None, :] == iota).astype(dtype)
    dims = (((0,), (0,)), ((), ()))
    o1_ref[:] = jax.lax.dot_general(pt, t1_ref[:].astype(dtype), dims,
                                    preferred_element_type=jnp.float32)
    o2_ref[:] = jax.lax.dot_general(pt, t2_ref[:].astype(dtype), dims,
                                    preferred_element_type=jnp.float32)


def _stripe_gather2_call(plan: StripePlan, t1: jax.Array, t2: jax.Array,
                         dtype=jnp.bfloat16, interpret: bool | None = None):
    """(t1[row], t2[row]) in plan slot order — one one-hot, two tables."""
    n_pad, d1 = t1.shape
    d2 = t2.shape[1]
    assert n_pad == plan.num_nodes and t2.shape[0] == n_pad
    chunk, block_n, nc = plan.chunk, plan.block_n, plan.n_chunks
    if interpret is None:
        interpret = not _on_tpu()
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nc,),
        in_specs=[
            pl.BlockSpec((chunk,), lambda i, cr: (i,)),
            pl.BlockSpec((block_n, d1), lambda i, cr: (cr[i], 0)),
            pl.BlockSpec((block_n, d2), lambda i, cr: (cr[i], 0)),
        ],
        out_specs=(
            pl.BlockSpec((chunk, d1), lambda i, cr: (i, 0)),
            pl.BlockSpec((chunk, d2), lambda i, cr: (i, 0)),
        ),
    )
    kernel = functools.partial(_gather2_kernel, chunk=chunk, block_n=block_n,
                               dtype=dtype)
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((plan.capacity, d1), jnp.float32),
                   jax.ShapeDtypeStruct((plan.capacity, d2), jnp.float32)),
        interpret=interpret,
    )(jnp.asarray(plan.chunk_rows), jnp.asarray(plan.row_local), t1, t2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def stripe_scatter_add2(plan: StripePlan, vals: jax.Array, u: jax.Array):
    """Differentiable (num, den) = (Σ_rows vals, Σ_rows u). Zeros on padding."""
    return _stripe_scatter2_call(plan, vals, u)


def _ss2_fwd(plan, vals, u):
    return _stripe_scatter2_call(plan, vals, u), (
        jnp.zeros((0,), vals.dtype), jnp.zeros((0,), u.dtype))


def _ss2_bwd(plan, dts, cts):
    ct_num, ct_den = cts
    gv, gu = _stripe_gather2_call(plan, ct_num, ct_den)
    m = jnp.asarray(plan.valid, gv.dtype)[:, None]
    return ((gv * m).astype(dts[0].dtype), (gu * m).astype(dts[1].dtype))


stripe_scatter_add2.defvjp(_ss2_fwd, _ss2_bwd)


def make_traced_scatter_add(block_n: int, chunk: int, num_nodes: int,
                            vals_dtype=jnp.float32):
    """Scatter-add whose plan arrays are TRACED operands (for shard_map:
    per-shard plans arrive as sliced array arguments, which custom_vjp's
    nondiff_argnums cannot hold). Index/mask arguments get zero cotangents;
    callers must zero invalid slots of ``vals`` (their gradient contributions
    there are multiplied by the same zeros upstream)."""

    def _call(rl, cr, vals):
        cap, d = vals.shape
        nc = cr.shape[0]
        interpret = not _on_tpu()
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nc,),
            in_specs=[
                pl.BlockSpec((chunk,), lambda i, cr_: (i,)),
                pl.BlockSpec((chunk, d), lambda i, cr_: (i, 0)),
            ],
            out_specs=pl.BlockSpec((block_n, d), lambda i, cr_: (cr_[i], 0)),
        )
        # the one-hot/vals MXU dtype follows the caller's payload choice:
        # f32 payloads keep the whole scatter f32-exact (the sharded-spmm
        # oracle checks at 1e-3 relative), bf16 payloads keep the fast path
        kernel = functools.partial(_scatter_kernel, chunk=chunk,
                                   block_n=block_n, dtype=vals_dtype)
        return pl.pallas_call(
            kernel, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((num_nodes, d), jnp.float32),
            interpret=interpret,
        )(cr, rl, vals)

    def _gather_call(rl, cr, table):
        d = table.shape[1]
        nc = cr.shape[0]
        interpret = not _on_tpu()
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nc,),
            in_specs=[
                pl.BlockSpec((chunk,), lambda i, cr_: (i,)),
                pl.BlockSpec((block_n, d), lambda i, cr_: (cr_[i], 0)),
            ],
            out_specs=pl.BlockSpec((chunk, d), lambda i, cr_: (i, 0)),
        )
        kernel = functools.partial(_gather_kernel, chunk=chunk,
                                   block_n=block_n, dtype=vals_dtype)
        return pl.pallas_call(
            kernel, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((nc * chunk, d), jnp.float32),
            interpret=interpret,
        )(cr, rl, table)

    @jax.custom_vjp
    def scatter(rl, cr, vals):
        return _call(rl, cr, vals)

    def fwd(rl, cr, vals):
        return _call(rl, cr, vals), (rl, cr)

    def bwd(res, ct):
        # ``vals_dtype`` is a factory-time constant: residuals created inside
        # a shard_map body cannot carry fresh (replicated) arrays
        rl, cr = res
        return (jnp.zeros_like(rl), jnp.zeros_like(cr),
                _gather_call(rl, cr, ct).astype(vals_dtype))

    scatter.defvjp(fwd, bwd)
    return scatter


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def stripe_gather2(plan: StripePlan, t1: jax.Array, t2: jax.Array):
    """Differentiable (t1[row], t2[row]) in plan slot order."""
    return _stripe_gather2_call(plan, t1, t2)


def _sg2_fwd(plan, t1, t2):
    return _stripe_gather2_call(plan, t1, t2), (
        jnp.zeros((0,), t1.dtype), jnp.zeros((0,), t2.dtype))


def _sg2_bwd(plan, dts, cts):
    o1, o2 = _stripe_scatter2_call(plan, cts[0], cts[1])
    return (o1.astype(dts[0].dtype), o2.astype(dts[1].dtype))


stripe_gather2.defvjp(_sg2_fwd, _sg2_bwd)


# ---------------------------------------------------------------------------
# stripe segment softmax / squareplus (frozen-attention normalisation)
# ---------------------------------------------------------------------------
# The attention/mixed/hard/rewire blocks freeze per-edge attention once per
# forward via a per-segment softmax (block_transformer_attention.py:36-39 /
# PyG softmax). XLA's scatter-max + scatter-add cost ~40 + 37 ms at arxiv
# scale (2.7M edges) even with sorted-index hints (31 ms each) — ~25x the
# stripe MXU kernels. Softmax is shift-invariant per segment under ANY
# per-row constant, so instead of an exact segment max this path shifts by
# each row's FIRST edge score (a static-index gather — the plan knows every
# row's first slot), composes exp / denominator / division from the f32
# stripe gather+scatter primitives, and falls back to the exact XLA
# composition through one lax.cond if any exp left f32 range. Runs OUTSIDE
# the solver loop (frozen attention), where a cond costs nothing.


def first_slot_of_rows(plan: StripePlan) -> np.ndarray:
    """int32[num_nodes]: the first plan slot of each row (0 if edgeless)."""
    slots = np.arange(plan.capacity)
    rows = (plan.chunk_rows[slots // plan.chunk] * plan.block_n
            + plan.row_local)
    rv = rows[plan.valid]
    sv = slots[plan.valid]
    first = np.zeros(plan.num_nodes, np.int32)
    uniq, idx = np.unique(rv, return_index=True)
    first[uniq] = sv[idx]
    return first


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def stripe_gather_f32(plan: StripePlan, table: jax.Array) -> jax.Array:
    """Differentiable f32 out[e] = table[row[e]] (full-precision one-hot)."""
    return _stripe_gather_call(plan, table, dtype=jnp.float32)


def _sgf_fwd(plan, table):
    return (_stripe_gather_call(plan, table, dtype=jnp.float32),
            jnp.zeros((0,), table.dtype))


def _sgf_bwd(plan, dt, ct):
    return (_stripe_scatter_call(plan, ct, dtype=jnp.float32)
            .astype(dt.dtype),)


stripe_gather_f32.defvjp(_sgf_fwd, _sgf_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def stripe_scatter_add_f32(plan: StripePlan, vals: jax.Array) -> jax.Array:
    """Differentiable f32 out[n] = Σ_e∈rows(n) vals[e]. Invalid slots = 0."""
    return _stripe_scatter_call(plan, vals, dtype=jnp.float32)


def _ssf_fwd(plan, vals):
    return (_stripe_scatter_call(plan, vals, dtype=jnp.float32),
            jnp.zeros((0,), vals.dtype))


def _ssf_bwd(plan, dt, ct):
    g = _stripe_gather_call(plan, ct, dtype=jnp.float32)
    return ((g * jnp.asarray(plan.valid, g.dtype)[:, None])
            .astype(dt.dtype),)


stripe_scatter_add_f32.defvjp(_ssf_fwd, _ssf_bwd)


def stripe_segment_softmax(plan: StripePlan, scores: jax.Array,
                           exact_fn) -> jax.Array:
    """Per-row softmax of scores [capacity, H] in plan slot order.

    Exactly segment_softmax over rows (PyG semantics) while every exp stays
    inside f32 range of the row's first-edge shift; otherwise one lax.cond
    re-runs ``exact_fn()`` (the XLA composition). Gradients flow through
    the stripe custom VJPs; the shift is stop_gradient (shift-invariance
    makes the true softmax gradient shift-free)."""
    cap, h = scores.shape
    hp = max(8, h)
    s = scores.astype(jnp.float32)
    if hp > h:
        s = jnp.pad(s, ((0, 0), (0, hp - h)))
    first = jnp.asarray(first_slot_of_rows(plan))
    c = jax.lax.stop_gradient(s)[first]                       # [N, hp]
    c_e = jax.lax.stop_gradient(stripe_gather_f32(plan, c))   # [cap, hp]
    v = jnp.asarray(plan.valid, jnp.float32)[:, None]
    ex = jnp.exp(s - c_e) * v
    den = stripe_scatter_add_f32(plan, ex)                    # [N, hp]
    den_e = stripe_gather_f32(plan, den)
    att = ex / (den_e + 1e-16)
    # The shift is a member score, so den >= exp(0) = 1 for every row with
    # edges: per-edge UNDERFLOW relative to the shift means a true softmax
    # weight <= exp(-87)/1 — exactly 0 in f32 either way. Only OVERFLOW
    # (score > shift + 88 -> ex = inf -> den = inf) needs the fallback, and
    # den [N, hp] carries it — no [capacity]-sized reduction required.
    bad = jnp.any(~jnp.isfinite(den))
    return jax.lax.cond(bad, lambda _: exact_fn(),
                        lambda _: att[:, :h], None)


def stripe_segment_squareplus(plan: StripePlan, scores: jax.Array
                              ) -> jax.Array:
    """Per-row squareplus normalisation (reference utils.py:179-208: global
    max shift, which squareplus differentiates through) with the denominator
    on the stripe kernels. Exact up to f32 — squareplus never under/overflows
    after the global shift, so no fallback is needed."""
    cap, h = scores.shape
    hp = max(8, h)
    v = jnp.asarray(plan.valid, jnp.float32)[:, None]
    s = scores.astype(jnp.float32)
    smax = jnp.max(jnp.where(v > 0, s, -jnp.inf))
    smax = jnp.where(jnp.isfinite(smax), smax, 0.0)
    sm = s - smax
    u = (sm + jnp.sqrt(sm * sm + 4.0)) * 0.5 * v
    if hp > h:
        u = jnp.pad(u, ((0, 0), (0, hp - h)))
    den = stripe_scatter_add_f32(plan, u)
    den_e = stripe_gather_f32(plan, den)
    return (u / (den_e + 1e-16))[:, :h]
