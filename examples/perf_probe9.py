"""Probe 9: decompose the ~42 ms col-plan backward eval at bench scale.

Pieces of make_fused_ax_colplan.bwd, each jitted separately:
  mega call (want_dxg=False)      dq/dkw/dkb/dgmax over the row plan
  ct prep                         ct_num concat + ct_den update (node side)
  W pack + hot gather             packed node table -> [cap, wpad] bf16
  col kernel                      _bwd_dx_col_call
  node matmuls                    dqw/dqb/dx epilogue
  full op vjp                     end-to-end (fwd + bwd)
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
    ct_den_in = jnp.zeros((n_pad, hp), jnp.float32)

    # residuals from the fwd
    ax, den, num = _fused_ax_call(plan, qw, qb, kw, kb, xn, x_g, gmax,
                                  heads=heads, square_plus=False,
                                  want_num=True)

    def ct_prep(ct_ax, den, num):
        recip = 1.0 / (den[:, :heads] + 1e-16)
        ct_num = jnp.concatenate(
            [ct_ax * (recip[:, h:h + 1] / heads) for h in range(heads)],
            axis=1)
        upd = [-(jnp.sum(ct_ax * num[:, h * d:(h + 1) * d]
                         .astype(jnp.float32), axis=1)
                 * recip[:, h] ** 2) / heads for h in range(heads)]
        ct_den = ct_den_in.at[:, :heads].add(jnp.stack(upd, axis=1))
        return ct_num, ct_den, recip

    timeit(jax.jit(ct_prep), ct_ax, den, num, label="ct_prep")
    ct_num, ct_den, recip = jax.jit(ct_prep)(ct_ax, den, num)

    timeit(jax.jit(lambda *a: _fused_bwd_mega_call(
        plan, *a, heads=heads, square_plus=False, want_dxg=False)[0]),
        qw, qb, kw, kb, xn, x_g, gmax, ct_num, ct_den,
        label="mega_no_dxg")
    timeit(jax.jit(lambda *a: _fused_bwd_mega_call(
        plan, *a, heads=heads, square_plus=False, want_dxg=True)[1]),
        qw, qb, kw, kb, xn, x_g, gmax, ct_num, ct_den,
        label="mega_with_dxg")

    chunk = plan.chunk
    row_of_slot = (np.repeat(np.asarray(plan.chunk_rows), chunk)
                   * plan.block_n + np.asarray(plan.row_local))
    rowv_np = row_of_slot[np.asarray(plan.col_src_slot)]
    rowv_np = np.where(np.asarray(plan.col_plan.valid), rowv_np,
                       0).astype(np.int32)
    rowv = jnp.asarray(rowv_np)

    def pack_gather(ct_ax, recip, ct_den, xn, qw, qb):
        xn_f = xn.astype(jnp.float32)
        q = xn_f @ qw + qb
        rpad = jnp.zeros((q.shape[0], hp - heads), jnp.float32)
        w_tab = jnp.concatenate(
            [q, ct_ax.astype(jnp.float32),
             jnp.concatenate([recip * (1.0 / heads), rpad], axis=1),
             ct_den], axis=1)
        wbase = att + d + 2 * hp
        wpad = -(-wbase // 128) * 128
        if wpad > wbase:
            w_tab = jnp.concatenate(
                [w_tab, jnp.zeros((q.shape[0], wpad - wbase), jnp.float32)],
                axis=1)
        return w_tab.astype(jnp.bfloat16)[rowv]

    timeit(jax.jit(pack_gather), ct_ax, recip, ct_den, xn, qw, qb,
           label="pack_plus_gather")
    w_g = jax.jit(pack_gather)(ct_ax, recip, ct_den, xn, qw, qb)

    timeit(jax.jit(lambda *a: _bwd_dx_col_call(
        plan, *a, heads=heads, square_plus=False)),
        w_g, xn, kw, kb, gmax, label="col_kernel")

    dq = jnp.asarray(rng.normal(size=(n_pad, att)), jnp.float32)
    dx_col = jnp.asarray(rng.normal(size=(n_pad, d)), jnp.float32)

    def epilogue(xn, dq, dx_col, qw):
        xn_f = xn.astype(jnp.float32)
        return xn_f.T @ dq, jnp.sum(dq, axis=0), dx_col + dq @ qw.T

    timeit(jax.jit(epilogue), xn, dq, dx_col, qw, label="node_epilogue")

    # end to end
    op = make_fused_ax_colplan(plan, heads, False, "scaled_dot", g.col,
                               jnp.bfloat16)

    def loss(qw, qb, kw, kb, xn):
        ax, _ = op(qw, qb, kw, kb, xn, gmax, ())
        return jnp.sum(ax * ct_ax)

    timeit(jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3, 4))),
           qw, qb, kw, kb, xn, label="full_op_grad(fwd+bwd)")


if __name__ == "__main__":
    main()
