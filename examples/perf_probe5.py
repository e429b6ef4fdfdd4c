"""Probe 5: decompose the round-3 backward cost at bench scale.

Times, on the real chip, each piece of one backward RHS evaluation:
  fwd          — fused_rhs_ax primal (scratch kernel)
  fwd_numden   — the vjp-mode forward (_fused_call num/den kernel)
  mega_bwd     — the _bwd_kernel mega pass (via _fused_bwd)
  colscatter   — permutation gather + col-plan stripe scatter (dx path)
  rhs_vjp      — one full jax.vjp through the RHS (everything composed)
to find where the measured ~110 ms/bwd-eval goes.
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
    print(f"{label}: {dt:.2f} ms")
    return dt


def main():
    model, params, state, x, g_raw, nf, nc = build_benchmark()
    g = model.graph
    plan = model.stripe_plan
    cfg = model.cfg
    rng = np.random.default_rng(0)

    from graph_neural_pde_tpu.models.functions import FuncAux, make_rhs
    from graph_neural_pde_tpu.ops.pallas.fused_rhs import (
        _fused_bwd, _fused_call, fused_rhs_ax)
    from graph_neural_pde_tpu.ops.pallas.stripe import make_col_gather

    d = 128
    heads = cfg.heads
    hp = max(8, heads)
    n_pad = plan.num_nodes
    cap = plan.capacity
    xs = jnp.asarray(rng.normal(size=(n_pad, d)) * 0.3, jnp.float32)
    ap = params["block"]["func"]["att"]
    qw, qb = ap["Q"]["w"], ap["Q"]["b"]
    kw, kb = ap["K"]["w"], ap["K"]["b"]
    gmax = jnp.zeros((), jnp.float32)

    cg = make_col_gather(plan, g.col, out_dtype=jnp.bfloat16)
    x_g = jax.jit(cg)(xs)
    _sync(x_g)

    # fwd primal (scratch kernel)
    f_ax = jax.jit(lambda xg: fused_rhs_ax(plan, heads, False, "scaled_dot",
                                           qw, qb, kw, kb, xs, xg, gmax))
    timeit(f_ax, x_g, label="fwd_ax_scratch_kernel")

    # vjp-mode forward (num/den kernel)
    f_nd = jax.jit(lambda xg: _fused_call(plan, qw, qb, kw, kb, xs, xg, gmax,
                                          heads=heads, square_plus=False))
    timeit(f_nd, x_g, label="fwd_numden_kernel")

    # mega backward alone (operands as ARGS — huge captured constants blow
    # the remote-compile request size)
    ct_num = jnp.asarray(rng.normal(size=(n_pad, heads * d)), jnp.float32)
    ct_den = jnp.asarray(rng.normal(size=(n_pad, hp)), jnp.float32)

    def mega(xn, xg, ctn, ctd):
        return _fused_bwd(plan, heads, False, "scaled_dot",
                          (qw, qb, kw, kb, xn, xg, gmax, None, ()),
                          (ctn, ctd))

    timeit(jax.jit(mega), xs, x_g, ct_num, ct_den,
           label="mega_bwd(+node matmuls)")

    # col gather fwd and vjp
    timeit(jax.jit(cg), xs, label="col_gather_fwd")
    ct = jnp.asarray(rng.normal(size=(cap, d)), jnp.bfloat16)

    def col_vjp(xn, c):
        return jax.vjp(cg, xn)[1](c)[0]

    timeit(jax.jit(col_vjp), xs, ct, label="col_gather_vjp(perm+scatter)")

    # full RHS vjp (one eval)
    rhs = make_rhs(cfg, g, stripe_plan=plan)
    fp = params["block"]["func"]
    ct_x = jnp.asarray(rng.normal(size=(n_pad, d)), jnp.float32)

    def rhs_vjp(p, xn, ctx):
        aux = FuncAux(attention=None, x0=xn, edge_weight=g.weight)
        out, vjp = jax.vjp(lambda pp, xx: rhs(pp, aux, 0.0, xx), p, xn)
        return vjp(ctx)

    timeit(jax.jit(rhs_vjp), fp, xs, ct_x, label="full_rhs_vjp")

    def rhs_fwd(p, xn):
        aux = FuncAux(attention=None, x0=xn, edge_weight=g.weight)
        return rhs(p, aux, 0.0, xn)

    timeit(jax.jit(rhs_fwd), fp, xs, label="full_rhs_fwd")


if __name__ == "__main__":
    main()
