"""Probe 14: decompose the training backward at bench scale (VERDICT r3 #2).

Round-3 books: op-level fwd+bwd 35.1 ms/eval = mega 9.3 + pack/gather 8.9
+ col kernel 11.6 + node matmuls + fwd recompute. Times each piece in
carry-dependent chains on this session's chip to find the real target
order, then the candidates:
  - half-precision/packed variants of the [cap,128] row-side table gather
  - col kernel with fewer recompute passes
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp


def _sync(a):
    _ = float(jax.device_get(a.reshape(-1)[:1])[0])


ITERS = 16


def timed(name, fn, *args):
    out = fn(*args)
    _sync(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        out = fn(*args)
        _sync(out)
        best = min(best, time.time() - t0)
    print(f"{name:>22}: {best/ITERS*1e3:.2f} ms/eval "
          f"({best*1e3:.0f} ms/{ITERS})", flush=True)
    return best / ITERS


def chain(body, *extra):
    @jax.jit
    def run(y, *ex):
        def step(y, _):
            y = jax.lax.optimization_barrier(y)
            out = body(y, *ex)
            y = y + 1e-6 * out[: y.shape[0]][:, None].astype(y.dtype)
            return y, None
        y, _ = jax.lax.scan(step, y, None, length=ITERS)
        return y
    return lambda y: run(y, *extra)


def main():
    from graph_neural_pde_tpu.utils.compile_cache import (
        enable_persistent_cache)
    enable_persistent_cache()
    from bench import build_benchmark
    from graph_neural_pde_tpu.models.blocks import build_stripe_engine
    from graph_neural_pde_tpu.ops.pallas.fused_rhs import (
        _bwd_dx_col_call, _fused_ax_call, _fused_bwd_mega_call,
        make_fused_ax_colplan)

    model, params, state, x, g_raw, nf, nc = build_benchmark()
    g2, plan = build_stripe_engine(model.cfg, model.graph)
    heads, att, d = model.cfg.heads, model.cfg.attention_dim, 128
    hp = max(8, heads)
    rng = np.random.default_rng(0)
    qw = jnp.asarray(rng.normal(size=(d, att)) * 0.1, jnp.float32)
    qb = jnp.asarray(rng.normal(size=(att,)) * 0.1, jnp.float32)
    kw = jnp.asarray(rng.normal(size=(d, att)) * 0.1, jnp.float32)
    kb = jnp.asarray(rng.normal(size=(att,)) * 0.1, jnp.float32)
    gmax = jnp.zeros((), jnp.float32)
    col = g2.col
    x0 = jnp.asarray(x, jnp.bfloat16)
    if x0.shape[0] < plan.num_nodes:
        x0 = jnp.concatenate(
            [x0, jnp.zeros((plan.num_nodes - x0.shape[0], x0.shape[1]),
                           x0.dtype)], axis=0)
    n = plan.num_nodes
    cap = plan.capacity

    op = make_fused_ax_colplan(plan, heads, False, "scaled_dot", col,
                               jnp.bfloat16)

    # full op-level vjp (fwd + bwd) — the production gradient path
    def fwd_bwd(y):
        def f(xx):
            ax, den = op(qw, qb, kw, kb, xx, gmax)
            return jnp.sum(ax.astype(jnp.float32) ** 2)
        val, grad = jax.value_and_grad(f)(y)
        return grad[:, 0]
    t_fb = timed("op fwd+bwd (vjp)", chain(fwd_bwd), x0)

    # forward alone (vjp-mode: want_num)
    def fwd_only(y):
        ax, den, num = _fused_ax_call(plan, qw, qb, kw, kb, y, y[col], gmax,
                                      heads=heads, square_plus=False,
                                      want_num=True, interpret=False)
        return ax[:, 0]
    t_f = timed("fwd (want_num)", chain(fwd_only), x0)

    # mega kernel alone (want_dxg=False), fixed residuals
    x_g = x0[col]
    ct_ax = jnp.asarray(rng.normal(size=(n, d)), jnp.float32)
    ct_den = jnp.asarray(rng.normal(size=(n, hp)), jnp.float32)
    recip_p = jnp.abs(jnp.asarray(rng.normal(size=(n, hp)), jnp.float32))

    def mega_only(y, xg):
        dq, _, dkw, dkb, dgmax, _ = _fused_bwd_mega_call(
            plan, qw, qb, kw, kb, y, xg, gmax, ct_ax, ct_den,
            heads=heads, square_plus=False, score="scaled_dot",
            want_dxg=False, recip_p=recip_p)
        return dq[:, 0]
    t_m = timed("mega (want_dxg=F)", chain(mega_only, x_g), x0)

    # pack + packed-table row gather (the node-side XLA between kernels)
    chunkp = plan.chunk
    row_of_slot = (np.repeat(np.asarray(plan.chunk_rows), chunkp)
                   * plan.block_n + np.asarray(plan.row_local))
    rowv_np = row_of_slot[np.asarray(plan.col_src_slot)]
    rowv_np = np.where(np.asarray(plan.col_plan.valid), rowv_np,
                       0).astype(np.int32)
    rowv = jnp.asarray(rowv_np)

    def pack_gather(y):
        xn_f = y.astype(jnp.float32)
        q = xn_f @ qw + qb
        lo = ct_ax
        hi = jnp.concatenate(
            [q, recip_p, ct_den,
             jnp.zeros((n, 128 - att - 2 * hp), jnp.float32)], axis=1)
        rnd = jnp.uint32(0x8000)
        hi_b = ((jax.lax.bitcast_convert_type(hi, jnp.uint32) + rnd)
                & jnp.uint32(0xFFFF0000))
        lo_b = ((jax.lax.bitcast_convert_type(lo, jnp.uint32) + rnd) >> 16)
        w_tab = jax.lax.bitcast_convert_type(hi_b | lo_b, jnp.float32)
        w_g = jax.lax.optimization_barrier(w_tab)[rowv]
        return w_g[: y.shape[0], 0]
    t_pg = timed("pack+gather", chain(pack_gather), x0)

    # gather only (pre-packed table as traced arg)
    w_tab_const = jnp.asarray(rng.normal(size=(n, 128)), jnp.float32)

    def gather_only(y, wt):
        w_g = jax.lax.optimization_barrier(wt + y[:1, :1])[rowv]
        return w_g[: y.shape[0], 0]
    t_g = timed("packed gather only", chain(gather_only, w_tab_const), x0)

    # col kernel alone (fixed packed w_g as traced arg)
    w_g_const = jnp.asarray(
        rng.normal(size=(plan.col_plan.capacity, 128)), jnp.float32)

    def col_only(y, wg):
        dx = _bwd_dx_col_call(plan, wg, y, kw, kb, gmax, heads=heads,
                              square_plus=False)
        return dx[:, 0]
    t_c = timed("col kernel", chain(col_only, w_g_const), x0)

    print(f"\npieces: fwd {t_f*1e3:.2f} + mega {t_m*1e3:.2f} + "
          f"pack/gather {t_pg*1e3:.2f} + col {t_c*1e3:.2f} "
          f"= {1e3*(t_f+t_m+t_pg+t_c):.2f} vs measured op fwd+bwd "
          f"{t_fb*1e3:.2f} ms/eval", flush=True)


if __name__ == "__main__":
    main()
