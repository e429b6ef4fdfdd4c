"""Probe 13b: does the x[col] gather overlap with the fused kernel?

VERDICT r3 #1 asks either for a pipelined gather/kernel overlap (>=400M
fwd) or a measurement showing the hardware cannot overlap them. Round 3's
books say gather 4.7 ms + kernel 3.6 + tail 1.3 = 9.6 ms/eval SERIAL; but
probe13a measures the SAME standalone gather at 8.4-9.0 ms — the two
claims cannot both hold. This probe times, at bench scale, in identical
carry-dependent scan chains (32 iters, nothing hoistable):

  gather        x_g = x[col]                     (the indexed op alone)
  kernel        fused ax kernel on a FIXED x_g   (kernel alone)
  gather+kernel the production composition
  g+k+tail      + the rk4-stage axpy/guard tail

If gather+kernel ~= max(gather, kernel), XLA is ALREADY overlapping the
gather's DMA traffic with the Mosaic kernel (the gather is issued async);
if ~= sum, they serialise and pipelining is the open lever.
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp


def _sync(a):
    _ = float(jax.device_get(a.reshape(-1)[:1])[0])


def timed(name, fn, *args, iters=32):
    out = fn(*args)
    _sync(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        out = fn(*args)
        _sync(out)
        best = min(best, time.time() - t0)
    print(f"{name:>14}: {best/iters*1e3:.2f} ms/eval "
          f"({best*1e3:.0f} ms/{iters})", flush=True)
    return best / iters


def main():
    from graph_neural_pde_tpu.utils.compile_cache import (
        enable_persistent_cache)
    enable_persistent_cache()
    from bench import build_benchmark
    from graph_neural_pde_tpu.ops.pallas.fused_rhs import (
        _fused_ax_call, make_fused_ax_colplan)

    model, params, state, x, g_raw, nf, nc = build_benchmark()
    plan = model.odeblock_plan if hasattr(model, "odeblock_plan") else None
    # dig the plan + graph out of the built model's block closure
    from graph_neural_pde_tpu.models.blocks import build_stripe_engine
    g2, plan = build_stripe_engine(model.cfg, model.graph)
    assert plan is not None
    heads = model.cfg.heads
    att = model.cfg.attention_dim
    d = 128
    rng = np.random.default_rng(0)
    qw = jnp.asarray(rng.normal(size=(d, att)) * 0.1, jnp.float32)
    qb = jnp.asarray(rng.normal(size=(att,)) * 0.1, jnp.float32)
    kw = jnp.asarray(rng.normal(size=(d, att)) * 0.1, jnp.float32)
    kb = jnp.asarray(rng.normal(size=(att,)) * 0.1, jnp.float32)
    gmax = jnp.zeros((), jnp.float32)
    col = g2.col
    x0 = jnp.asarray(x, jnp.bfloat16)
    if x0.shape[0] < plan.num_nodes:            # plan pads N to block_n
        x0 = jnp.concatenate(
            [x0, jnp.zeros((plan.num_nodes - x0.shape[0], x0.shape[1]),
                           x0.dtype)], axis=0)
    x_g_const = x0[col]
    ITERS = 32

    def chain(body):
        @jax.jit
        def run(y, *extra):
            def step(y, _):
                y = jax.lax.optimization_barrier(y)
                out = body(y, *extra)
                # fold a cheap carry update so every iter depends on the last
                y = y + 1e-6 * out[: y.shape[0]][:, None].astype(y.dtype)
                return y, None
            y, _ = jax.lax.scan(step, y, None, length=ITERS)
            return y
        return run

    # 1. gather alone: barrier forces full materialisation, then a cheap
    # slice consume (a full-table reduce would add ~1-2 ms of its own)
    def gather_only(y):
        x_g = jax.lax.optimization_barrier(y[col])
        return x_g[: y.shape[0], 0].astype(jnp.float32)
    t_gather = timed("gather", chain(gather_only), x0, iters=ITERS)

    # 2. kernel alone (x_g fixed, passed as a traced arg so the 690 MB
    # table is not baked into the shipped HLO; node table is the carry)
    def kernel_only(y, xg):
        ax, den = _fused_ax_call(plan, qw, qb, kw, kb, y, xg, gmax,
                                 heads=heads, square_plus=False,
                                 score="scaled_dot", interpret=False)
        return ax[:, 0]
    t_kernel = timed("kernel", chain(kernel_only), x0, x_g_const,
                     iters=ITERS)

    # 3. production composition
    def gather_kernel(y):
        x_g = y[col]
        ax, den = _fused_ax_call(plan, qw, qb, kw, kb, y, x_g, gmax,
                                 heads=heads, square_plus=False,
                                 score="scaled_dot", interpret=False)
        return ax[:, 0]
    t_both = timed("gather+kernel", chain(gather_kernel), x0, iters=ITERS)

    print(f"\nserial predicts {1e3*(t_gather+t_kernel):.2f} ms, "
          f"full overlap predicts {1e3*max(t_gather, t_kernel):.2f} ms, "
          f"measured {1e3*t_both:.2f} ms", flush=True)

    # 4. SPLIT pipeline candidate: two half-edge plans; gather_B is
    # independent of kernel_A, so IF the runtime can overlap an XLA gather
    # with a Mosaic kernel, this should beat the monolithic composition.
    from graph_neural_pde_tpu.ops.pallas.stripe import build_stripe_plan
    rows_np = np.asarray(g2.row)
    mask_np = np.asarray(g2.mask)
    halves = []
    for par in (0, 1):
        sel_e = mask_np & ((np.arange(rows_np.shape[0]) % 2) == par)
        idx = np.where(sel_e)[0]
        ph = build_stripe_plan(rows_np[idx], num_nodes=plan.num_nodes,
                               block_n=plan.block_n, chunk=plan.chunk)
        colh = np.zeros(ph.capacity, np.int32)
        colh[np.asarray(ph.slot_of_edge)] = np.asarray(g2.col)[idx]
        halves.append((ph, jnp.asarray(colh)))

    def split2(y):
        outs = []
        for ph, colh in halves:
            x_gh = y[colh]
            axh, denh = _fused_ax_call(ph, qw, qb, kw, kb, y, x_gh, gmax,
                                       heads=heads, square_plus=False,
                                       score="scaled_dot", interpret=False)
            outs.append(axh[:, 0])
        return outs[0] + outs[1]
    t_split = timed("split2", chain(split2), x0, iters=ITERS)
    print(f"split2 vs monolithic: {1e3*t_split:.2f} vs {1e3*t_both:.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
