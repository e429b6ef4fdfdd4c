"""Probe 10: is the [cap]-row gather lane-block-bound or byte-bound?

The col-plan backward gathers a [cap, 256]bf16 packed node table (512 B/row,
two 128-lane blocks) at ~12.9 ms; a [cap, 128]bf16 gather (256 B/row, one
block) costs ~8.8 ms. If a [cap, 128]f32 gather (512 B/row, ONE block) costs
~8.8 ms too, the cost is lane-block-bound and bitcast-packing the bf16 table
into f32 pairs saves ~4 ms/eval; if it costs ~12.9 ms it is byte-bound and
packing wins nothing.

Also times the separable mega/col kernels and the e2e grad after the
separable-cotangent rewrite, for the before/after record (probe9 baseline:
mega_no_dxg 10.2, col_kernel 14.5, full_op_grad 42.6 ms).
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
    rng = np.random.default_rng(0)
    d, heads = 128, model.cfg.heads
    att = model.cfg.attention_dim
    hp = max(8, heads)
    n_pad = plan.num_nodes
    cap = plan.capacity

    chunk = plan.chunk
    row_of_slot = (np.repeat(np.asarray(plan.chunk_rows), chunk)
                   * plan.block_n + np.asarray(plan.row_local))
    rowv_np = row_of_slot[np.asarray(plan.col_src_slot)]
    rowv_np = np.where(np.asarray(plan.col_plan.valid), rowv_np,
                       0).astype(np.int32)
    rowv = jnp.asarray(rowv_np)

    t16 = jnp.asarray(rng.normal(size=(n_pad, 256)), jnp.bfloat16)
    t32 = jnp.asarray(rng.normal(size=(n_pad, 128)), jnp.float32)
    t16n = jnp.asarray(rng.normal(size=(n_pad, 128)), jnp.bfloat16)
    timeit(jax.jit(lambda t: t[rowv]), t16, label="gather [cap,256]bf16")
    timeit(jax.jit(lambda t: t[rowv]), t32, label="gather [cap,128]f32")
    timeit(jax.jit(lambda t: t[rowv]), t16n, label="gather [cap,128]bf16")

    # bitcast pack/unpack costs (outside the kernel)
    def pack_pairs(t):
        return jax.lax.bitcast_convert_type(
            t.reshape(t.shape[0], 128, 2), jnp.float32)

    timeit(jax.jit(pack_pairs), t16, label="bitcast pack 256b16->128f32")
    t32p = jax.jit(pack_pairs)(t16)

    def unpack_pairs(t):
        return jax.lax.bitcast_convert_type(t, jnp.bfloat16).reshape(
            t.shape[0], 256)

    timeit(jax.jit(unpack_pairs), t32p, label="bitcast unpack 128f32->256b16")

    def pg_bitcast(t):
        return jax.lax.optimization_barrier(pack_pairs(t))[rowv]

    timeit(jax.jit(pg_bitcast), t16, label="pack+gather [cap,128]f32")

    # --- separable backward after the rewrite -----------------------------
    from graph_neural_pde_tpu.ops.pallas.fused_rhs import (
        _bwd_dx_col_call, _fused_ax_call, _fused_bwd_mega_call,
        make_fused_ax_colplan)

    qw = jnp.asarray(rng.normal(size=(d, att)) * 0.1, jnp.float32)
    qb = jnp.asarray(rng.normal(size=(att,)) * 0.1, jnp.float32)
    kw = jnp.asarray(rng.normal(size=(d, att)) * 0.1, jnp.float32)
    kb = jnp.asarray(rng.normal(size=(att,)) * 0.1, jnp.float32)
    xn = jnp.asarray(rng.normal(size=(n_pad, d)) * 0.5, jnp.float32)
    x_g = xn.astype(jnp.bfloat16)[g.col]
    gmax = jnp.zeros((), jnp.float32)
    ct_ax = jnp.asarray(rng.normal(size=(n_pad, d)), jnp.float32)
    recip_p = jnp.asarray(rng.normal(size=(n_pad, hp)), jnp.float32)
    ct_den = jnp.asarray(rng.normal(size=(n_pad, hp)), jnp.float32)

    timeit(jax.jit(lambda *a: _fused_bwd_mega_call(
        plan, *a, heads=heads, square_plus=False, want_dxg=False,
        recip_p=recip_p)[0]),
        qw, qb, kw, kb, xn, x_g, gmax, ct_ax, ct_den,
        label="mega_no_dxg separable")

    w_g16 = jnp.asarray(rng.normal(size=(cap, 256)), jnp.bfloat16)
    timeit(jax.jit(lambda *a: _bwd_dx_col_call(
        plan, *a, heads=heads, square_plus=False)),
        w_g16, xn, kw, kb, gmax, label="col_kernel separable")

    op = make_fused_ax_colplan(plan, heads, False, "scaled_dot", g.col,
                               jnp.bfloat16)

    def loss(qw, qb, kw, kb, xn):
        ax, _ = op(qw, qb, kw, kb, xn, gmax, ())
        return jnp.sum(ax * ct_ax)

    timeit(jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3, 4))),
           qw, qb, kw, kb, xn, label="full_op_grad(fwd+bwd) separable")


if __name__ == "__main__":
    main()
