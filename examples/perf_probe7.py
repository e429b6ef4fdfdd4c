"""Probe 7: decompose the symmetric backward (regressed the train step).

Times: sym op forward, full sym vjp, the mega_sym kernel alone, the ctn[col]
gather alone — against the col-plan path's numbers.
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
    print("symmetric:", plan.symmetric, flush=True)
    rng = np.random.default_rng(0)
    d, heads = 128, model.cfg.heads
    hp = max(8, heads)
    n_pad = plan.num_nodes
    cap = plan.capacity
    xs = jnp.asarray(rng.normal(size=(n_pad, d)) * 0.3, jnp.float32)
    ap = params["block"]["func"]["att"]
    qw, qb = ap["Q"]["w"], ap["Q"]["b"]
    kw, kb = ap["K"]["w"], ap["K"]["b"]
    gmax = jnp.zeros((), jnp.float32)

    from graph_neural_pde_tpu.ops.pallas.fused_rhs import (
        _fused_bwd_mega_sym_call, make_fused_ax_sym)

    op = make_fused_ax_sym(plan, heads, False, "scaled_dot", g.col,
                           jnp.bfloat16)
    timeit(jax.jit(lambda xx: op(qw, qb, kw, kb, xx, gmax)), xs,
           label="sym_op_fwd")

    ct_ax = jnp.asarray(rng.normal(size=(n_pad, d)), jnp.float32)
    ct_dn = jnp.asarray(rng.normal(size=(n_pad, hp)), jnp.float32)

    def full_vjp(xx, ca, cd):
        out, vjp = jax.vjp(
            lambda q1, k1, xv: op(q1["w"], q1["b"], k1["w"], k1["b"], xv,
                                  gmax), ap["Q"], ap["K"], xx)
        return vjp((ca, cd))

    timeit(jax.jit(full_vjp), xs, ct_ax, ct_dn, label="sym_full_vjp")

    # mega_sym kernel alone
    ct_num = jnp.asarray(rng.normal(size=(n_pad, heads * d)), jnp.float32)
    ct_den = jnp.asarray(rng.normal(size=(n_pad, hp)), jnp.float32)
    x_g = jax.jit(lambda xx: xx.astype(jnp.bfloat16)[g.col])(xs)
    _sync(x_g)

    def gathers(cn, cd):
        return cn.astype(jnp.bfloat16)[g.col], cd.astype(jnp.bfloat16)[g.col]

    timeit(jax.jit(gathers), ct_num, ct_den, label="ctn_ctd_col_gathers")
    ctn_g, ctd_g = jax.jit(gathers)(ct_num, ct_den)
    _sync(ctn_g)

    def mega_sym(xn, xg, cn, cd, cng, cdg):
        return _fused_bwd_mega_sym_call(
            plan, qw, qb, kw, kb, xn, xg, gmax, cn, cd, cng, cdg,
            heads=heads, square_plus=False)

    timeit(jax.jit(mega_sym), xs, x_g, ct_num, ct_den, ctn_g, ctd_g,
           label="mega_sym_kernel")


if __name__ == "__main__":
    main()
