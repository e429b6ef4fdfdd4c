"""Probe 6: why is the col-plan cotangent scatter 41 ms (expected ~9)?

Decomposes make_col_gather's backward at bench scale:
  permute gather alone (bf16 / f32, with and without the mask-where)
  col-plan stripe scatter alone (bf16 / f32 one-hot)
  XLA sorted segment-sum over the col-sorted order (alternative)
  XLA UNSORTED scatter-add (the round-2 baseline this replaced)
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

import sys
sys.path.insert(0, "/root/repo")

from bench import build_benchmark, _sync  # noqa: E402


def timeit(fn, *args, reps=10, label=""):
    out = fn(*args)
    _sync(jax.tree_util.tree_leaves(out)[0])
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    _sync(jax.tree_util.tree_leaves(out)[0])
    dt = (time.time() - t0) / reps * 1000
    print(f"{label}: {dt:.2f} ms", flush=True)
    return dt


def main():
    model, params, state, x, g_raw, nf, nc = build_benchmark()
    g = model.graph
    plan = model.stripe_plan
    cplan = plan.col_plan
    rng = np.random.default_rng(0)
    d = 128
    cap = plan.capacity
    print(f"cap_row={cap} cap_col={cplan.capacity} "
          f"nchunks_row={plan.n_chunks} nchunks_col={cplan.n_chunks} "
          f"chunk={plan.chunk}/{cplan.chunk}", flush=True)

    from graph_neural_pde_tpu.ops.pallas.stripe import _stripe_scatter_call

    src = jnp.asarray(plan.col_src_slot)
    vmask = jnp.asarray(np.asarray(cplan.valid)[:, None])
    ct_bf = jnp.asarray(rng.normal(size=(cap, d)), jnp.bfloat16)
    ct_f32 = ct_bf.astype(jnp.float32)
    ctc_f32 = jnp.asarray(rng.normal(size=(cplan.capacity, d)), jnp.float32)
    ctc_bf = ctc_f32.astype(jnp.bfloat16)

    timeit(jax.jit(lambda c: c[src]), ct_bf, label="perm_gather_bf16")
    timeit(jax.jit(lambda c: c[src]), ct_f32, label="perm_gather_f32")
    timeit(jax.jit(lambda c: jnp.where(vmask, c.astype(jnp.float32)[src],
                                       0.0)),
           ct_bf, label="perm_astype_f32_gather_where (current)")
    timeit(jax.jit(lambda c: jnp.where(vmask, c[src],
                                       jnp.bfloat16(0))), ct_bf,
           label="perm_gather_bf16_where")

    timeit(jax.jit(lambda v: _stripe_scatter_call(cplan, v)),
           ctc_f32, label="col_scatter_bf16onehot_f32vals")
    timeit(jax.jit(lambda v: _stripe_scatter_call(cplan, v.astype(
        jnp.float32))), ctc_bf, label="col_scatter_from_bf16vals")

    # sorted segment-sum alternative (values already in col-sorted order)
    rows_of_slot = (np.repeat(np.asarray(cplan.chunk_rows), cplan.chunk)
                    * cplan.block_n + np.asarray(cplan.row_local))
    seg = jnp.asarray(rows_of_slot)
    timeit(jax.jit(lambda v: jax.ops.segment_sum(
        v, seg, num_segments=cplan.num_nodes, indices_are_sorted=True)),
        ctc_f32, label="xla_sorted_segment_sum")

    # the round-2 baseline: unsorted scatter-add by col
    col = g.col
    timeit(jax.jit(lambda c: jnp.zeros((plan.num_nodes, d)).at[col].add(
        jnp.where(jnp.asarray(np.asarray(plan.valid)[:, None]), c, 0.0)
        .astype(jnp.float32))), ct_bf, label="xla_unsorted_scatter (r2)")

    # old round-3.0 bwd composition (f32 materialise + where + scatter)
    def full_old(c):
        ct_c = jnp.where(vmask, c.astype(jnp.float32)[src], 0.0)
        return _stripe_scatter_call(cplan, ct_c)

    timeit(jax.jit(full_old), ct_bf, label="full_old_bwd(f32+where)")

    # new bwd: dtype-preserving permute + mask folded into weighted one-hot
    from graph_neural_pde_tpu.ops.pallas.stripe import _stripe_scatter_w_call
    vmask_f = jnp.asarray(np.asarray(cplan.valid, np.float32))

    def full_new(c):
        return _stripe_scatter_w_call(cplan, vmask_f, c[src])

    timeit(jax.jit(full_new), ct_bf, label="full_new_bwd(bf16+wscatter)")


if __name__ == "__main__":
    main()
