"""Probe 16 (round 5, VERDICT r4 #3): why is the norm_idx=1 engine 2.3x
the scaled_dot headline — and is that reducible?

norm1 (column-normalised softmax, reference
function_transformer_attention.py:210-213) cannot fuse the denominator
into the aggregation scatter the way norm0 does: den_col must be COMPLETE
before any edge divides by it, and den_col needs the reverse-edge scores,
whose q side lives at the gathered endpoint. The engine is therefore two
kernel passes, each with its own [cap, 128] payload gather (the recip
rides the second gather as packed lanes — a separate narrow gather would
cost the same, the gather is ISSUE-RATE bound, width-independent,
probe13). The single-chip floor for ONE gather+kernel pass is the
scaled_dot eval (~9.6 ms at this scale); two passes put norm1's floor at
~2x. This probe measures each stage to pin how much of the measured
2.3x is that structural 2x vs pack/permute overhead.

Run: python examples/perf_probe16_norm1.py          (TPU)
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from bench import build_benchmark, _sync  # noqa: E402


def timeit(fn, *args, reps=3, batches=2):
    out = fn(*args)
    _sync(jax.tree_util.tree_leaves(out)[0])
    best = float("inf")
    for _ in range(batches):
        t0 = time.time()
        for _ in range(reps):
            out = fn(*args)
        _sync(jax.tree_util.tree_leaves(out)[0])
        best = min(best, (time.time() - t0) / reps)
    return best


def main():
    from graph_neural_pde_tpu.ops.pallas import fused_rhs as FR

    model, params, state, x, g, nf, nc = build_benchmark()
    gp, plan = model.graph, model.stripe_plan
    heads, att, d = model.cfg.heads, model.cfg.attention_dim, 128
    hp = max(8, heads)
    cap = plan.capacity
    rng = np.random.default_rng(0)
    xh = jnp.asarray(rng.normal(size=(gp.num_nodes, d)), jnp.float32)
    qw = jnp.asarray(rng.normal(size=(d, att)) * 0.1, jnp.float32)
    qb = jnp.zeros((att,))
    kw = jnp.asarray(rng.normal(size=(d, att)) * 0.1, jnp.float32)
    kb = jnp.zeros((att,))
    gmax = jnp.zeros(())
    col = gp.col
    print(f"cap={cap} nodes={gp.num_nodes}", file=sys.stderr)

    op = FR.make_fused_ax_norm1(plan, heads, False, "scaled_dot", col)

    @jax.jit
    def full(xx):
        ax, den = op(qw, qb, kw, kb, xx, gmax, ())
        return ax

    t_full = timeit(full, xh)
    print(f"norm1 full fwd eval: {t_full*1000:.2f} ms "
          f"({cap/t_full/1e6:.1f}M edges/s)", file=sys.stderr)

    # stage decomposition (mirrors _fwd_core)
    pm = jnp.asarray(FR._norm1_perm(128))

    @jax.jit
    def prep(xx):
        x_e = xx @ pm
        qw_e = pm.T @ qw
        kw_e = pm.T @ kw
        return x_e, qw_e, kw_e

    x_e, qw_e, kw_e = prep(xh)

    @jax.jit
    def stage_pack0_gather(xx):
        pack0 = FR._pack_x_recip(xx, None, hp)
        return jax.lax.optimization_barrier(pack0)[col]

    t = timeit(stage_pack0_gather, xh)
    print(f"  pack0 + gather g1:   {t*1000:.2f} ms", file=sys.stderr)
    g1 = stage_pack0_gather(xh)

    @jax.jit
    def stage_den(g1):
        return FR._norm1_rev_call(plan, qw_e, qb, kw_e, kb, x_e, g1, gmax,
                                  heads=heads, square_plus=False,
                                  score="scaled_dot", score_params=())

    t = timeit(stage_den, g1)
    print(f"  den pass (rev kernel): {t*1000:.2f} ms", file=sys.stderr)
    den = stage_den(g1)

    @jax.jit
    def stage_pack1_gather(xx, den):
        recip = 1.0 / (den[:, :heads] + 1e-16)
        pack1 = FR._pack_x_recip(xx, recip, hp)
        return jax.lax.optimization_barrier(pack1)[col]

    t = timeit(stage_pack1_gather, xh, den)
    print(f"  pack1 + gather g2:   {t*1000:.2f} ms", file=sys.stderr)
    g2 = stage_pack1_gather(xh, den)

    @jax.jit
    def stage_ax(g2):
        ax_e = FR._norm1_fwd_call(plan, qw_e, qb, kw_e, kb, x_e, g2, gmax,
                                  heads=heads, square_plus=False,
                                  score="scaled_dot", score_params=())
        return (ax_e @ pm.T)[:, :128]

    t = timeit(stage_ax, g2)
    print(f"  ax pass (+unpermute): {t*1000:.2f} ms", file=sys.stderr)

    # reference: the norm0 scaled_dot eval on the same plan
    from graph_neural_pde_tpu.ops.pallas.stripe import make_col_gather
    cg = make_col_gather(plan, col, out_dtype=jnp.bfloat16)

    @jax.jit
    def norm0(xx):
        x_g = cg(xx)
        ax, _ = FR.fused_rhs_ax(plan, heads, False, "scaled_dot", qw, qb,
                                kw, kb, xx, x_g, gmax)
        return ax

    t0n = timeit(norm0, xh)
    print(f"norm0 scaled_dot eval: {t0n*1000:.2f} ms "
          f"({cap/t0n/1e6:.1f}M edges/s)  ratio={t_full/t0n:.2f}x",
          file=sys.stderr)


if __name__ == "__main__":
    main()
