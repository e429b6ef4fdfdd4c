"""Probe 20 (round 5): can Chebyshev TRAINING approach its 292M forward
matvec rate? (VERDICT r4 #2's closing question for the tuned GRAND-l family.)

bench r5: grand_l_cheby forward 292M edge·NFE/s, but train_grand_l[cheby]
2140 ms/step = 43.2M. Decompose where the 6.8x sits, at bench scale on the
same stripe-spmm engine the train step uses:

  a) ONE weighted stripe matvec fwd (the per-term cost: 1 gather + 1
     weight-folded MXU scatter)
  b) the full Clenshaw solve fwd (K terms) — should be ~K * (a)
  c) grad wrt x only, w CONSTANT (stop_gradient): the checkpointed scan's
     backward recomputes each term's matvec and pulls the cotangent back
     through the col-plan scatter — the LINEAR part of the backward
  d) grad wrt (x, w): adds the per-edge dw cotangent (recomputed gather
     of the term carry * cotangent, reduced per edge) every term
  e) the bench train step (encoder/decoder/frozen-attention/optimizer on
     top of (d)) — quoted from BENCH_r05, not re-measured here

Structural model (probe14's gather-issue floor, 2.15 ns/row): the forward
term is 1 indexed op; the backward term is >=3 (recomputed gather for the
residual, col-plan permutation gather for dx, plus the dw reduce kernel) —
so fwd+bwd per term is bounded below by ~4x the forward's indexed-op time
and the "290M trained" reading of the forward rate was never reachable.
What IS reachable is (b)+(c)+(d) at their measured sum; anything above
that in (e) is per-STEP (not per-term) overhead that amortises with T.

Run: python examples/perf_probe20_cheby_train.py          (TPU)
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from bench import build_benchmark, build_grand_l_cheby, _sync  # noqa: E402


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
    from graph_neural_pde_tpu.utils.compile_cache import (
        enable_persistent_cache)
    enable_persistent_cache()
    model, params, state, x, g_raw, nf, nc = build_benchmark()
    m2, p2, s2 = build_grand_l_cheby(g_raw, nf, nc)
    cfg = m2.cfg
    gp, plan = m2.graph, m2.stripe_plan
    e_valid = int(jax.device_get(gp.num_edges))

    from graph_neural_pde_tpu.ops.spmm import make_stripe_spmm, spmm
    from graph_neural_pde_tpu.solvers.chebyshev import (
        default_num_terms, linear_diffusion_solve)

    if plan is not None:
        spmm_fn = make_stripe_spmm(gp, plan,
                                   payload_dtype=cfg.rhs_payload_dtype)
    else:
        spmm_fn = lambda y, w: spmm(gp, y, weight=w)  # noqa: E731
    w = gp.weight
    k_terms = cfg.cheby_terms or default_num_terms(cfg.time)
    print(f"terms={k_terms} edges={e_valid} plan="
          f"{'stripe' if plan is not None else 'xla'}", file=sys.stderr)

    rng = np.random.default_rng(0)
    xh = jnp.asarray(rng.normal(size=(gp.num_nodes, cfg.hidden_dim)),
                     jnp.float32)
    probe = jnp.asarray(rng.normal(size=xh.shape), jnp.float32)
    alpha = jnp.asarray(0.9, jnp.float32)

    @jax.jit
    def one_matvec(xx):
        return spmm_fn(xx, w)

    t_a = timeit(one_matvec, xh)
    print(f"a) one stripe matvec fwd: {t_a*1000:.2f} ms "
          f"({e_valid/t_a/1e6:.0f}M edges/s)", file=sys.stderr)

    def solve(xx, ww):
        z, nfe = linear_diffusion_solve(
            lambda y: spmm_fn(y, ww), xx, alpha, 0.0, xx, cfg.time,
            num_terms=k_terms)
        return z

    t_b = timeit(jax.jit(solve), xh, w)
    print(f"b) solve fwd ({k_terms} terms): {t_b*1000:.1f} ms "
          f"= {t_b/k_terms*1000:.2f} ms/term "
          f"({t_b/k_terms/t_a:.2f}x one matvec)", file=sys.stderr)

    @jax.jit
    def grad_x(xx):
        return jax.grad(lambda x_: jnp.sum(
            solve(x_, jax.lax.stop_gradient(w)) * probe))(xx)

    t_c = timeit(grad_x, xh)
    print(f"c) fwd+bwd wrt x only (w const): {t_c*1000:.1f} ms "
          f"= {t_c/k_terms*1000:.2f} ms/term "
          f"({t_c/t_b:.2f}x fwd)", file=sys.stderr)

    @jax.jit
    def grad_xw(xx, ww):
        return jax.grad(lambda x_, w_: jnp.sum(solve(x_, w_) * probe),
                        argnums=(0, 1))(xx, ww)

    t_d = timeit(grad_xw, xh, w)
    print(f"d) fwd+bwd wrt (x, w): {t_d*1000:.1f} ms "
          f"= {t_d/k_terms*1000:.2f} ms/term "
          f"({t_d/t_b:.2f}x fwd; dw adds {(t_d-t_c)*1000:.1f} ms)",
          file=sys.stderr)

    rate_d = k_terms * e_valid / t_d
    print(f"solve-only trained rate: {rate_d/1e6:.1f}M edge·NFE/s "
          f"(vs 292M fwd-only, vs 43.2M full bench step) — "
          f"the full step adds per-STEP work (frozen attention fwd+bwd, "
          f"enc/dec, adamax) that amortises over terms",
          file=sys.stderr)


if __name__ == "__main__":
    main()
