"""Probe 15 (round 5): where do GRAND-l training's 2382 ms/step go?

Every tuned best_params config is GRAND-l (frozen attention + laplacian,
reference function_laplacian_diffusion.py:28-51). After the round-5 OOM
fixes it trains at bench scale — but 2382 ms/step (remat) vs GRAND-nl's
812 ms, despite strictly cheaper per-eval work (one weighted spmm vs a
full attention recompute). Decompose:

  a) frozen_mean_attention fwd alone (XLA 1-D segment_softmax per head)
  b) jax.grad through (a)
  c) one laplacian RHS eval (stripe spmm) fwd
  d) grad of a 4-step rk4 chain (16 evals) with CONSTANT w — the solve's
     fwd+bwd without the attention freeze
  e) the full train step (reference number)

Run: python examples/perf_probe15_grand_l.py          (TPU)
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from bench import build_benchmark, _sync, _time_train  # noqa: E402


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
    model, params, state, x, g, nf, nc = build_benchmark()
    from graph_neural_pde_tpu.models.gnn import GNNModel
    from graph_neural_pde_tpu.models.attention import frozen_mean_attention
    from graph_neural_pde_tpu.models.functions import FuncAux, make_rhs

    cfg = model.cfg.replace(block="attention", function="laplacian",
                            method="rk4", step_size=1.0, remat=True)
    m_l = GNNModel(cfg, nf, nc, g)
    p_l, s_l = m_l.init(jax.random.PRNGKey(11))
    gp, plan = m_l.graph, m_l.stripe_plan
    print(f"plan capacity={getattr(plan, 'capacity', None)}",
          file=sys.stderr)
    bp = p_l["block"] if "block" in p_l else p_l
    att_p = bp["att"]

    xh = jnp.asarray(
        np.random.default_rng(0).normal(size=(gp.num_nodes, cfg.hidden_dim)),
        jnp.float32)

    @jax.jit
    def frozen_fwd(ap, xx):
        return frozen_mean_attention(ap, cfg, xx, gp, edge_weight=gp.weight)

    t = timeit(frozen_fwd, att_p, xh)
    print(f"a) frozen_mean_attention fwd: {t*1000:.1f} ms", file=sys.stderr)

    # random cotangent: sum(w) is ~constant (softmax weights sum to 1 per
    # row), so a plain-sum loss has a ~zero true gradient and would compare
    # rounding noise
    wprobe = jnp.asarray(
        np.random.default_rng(7).normal(size=(gp.row.shape[0],)), jnp.float32)

    @jax.jit
    def frozen_grad(ap, xx):
        return jax.grad(
            lambda a, x_: jnp.sum(
                frozen_mean_attention(a, cfg, x_, gp,
                                      edge_weight=gp.weight) * wprobe),
            argnums=(0, 1))(ap, xx)

    t = timeit(frozen_grad, att_p, xh)
    print(f"b) grad(frozen_mean_attention) wrt (att, x): {t*1000:.1f} ms",
          file=sys.stderr)

    @jax.jit
    def frozen_fwd_stripe(ap, xx):
        return frozen_mean_attention(ap, cfg, xx, gp, edge_weight=gp.weight,
                                     stripe_plan=plan)

    t = timeit(frozen_fwd_stripe, att_p, xh)
    print(f"a2) frozen_mean_attention[stripe] fwd: {t*1000:.1f} ms",
          file=sys.stderr)

    @jax.jit
    def frozen_grad_stripe(ap, xx):
        return jax.grad(
            lambda a, x_: jnp.sum(
                frozen_mean_attention(a, cfg, x_, gp, edge_weight=gp.weight,
                                      stripe_plan=plan) * wprobe),
            argnums=(0, 1))(ap, xx)

    t = timeit(frozen_grad_stripe, att_p, xh)
    print(f"b2) grad(frozen_mean_attention[stripe]): {t*1000:.1f} ms",
          file=sys.stderr)
    # on-device oracle: stripe vs exact composition, fwd + grad
    wf = jax.device_get(frozen_fwd_stripe(att_p, xh))
    we = jax.device_get(frozen_fwd(att_p, xh))
    err = float(np.abs(wf - we).max())
    gf = jax.device_get(frozen_grad_stripe(att_p, xh))
    ge = jax.device_get(frozen_grad(att_p, xh))
    fl_f = jax.tree_util.tree_leaves(gf)
    fl_e = jax.tree_util.tree_leaves(ge)
    scale = max(float(np.abs(l).max()) for l in fl_e) + 1e-12
    worst = max(float(np.abs(np.asarray(a, np.float64)
                             - np.asarray(b, np.float64)).max())
                for a, b in zip(fl_f, fl_e))
    print(f"   stripe-vs-exact on device: fwd |Δ|max {err:.2e}, "
          f"grad |Δ|/scale {worst/scale:.2e}", file=sys.stderr)
    assert err < 1e-4 and worst / scale < 1e-3

    rhs = make_rhs(cfg, gp, spmm_fn=m_l.spmm_fn, stripe_plan=plan)
    w_const = jax.lax.stop_gradient(frozen_fwd(att_p, xh))
    aux = FuncAux(attention=w_const, x0=jax.lax.stop_gradient(xh),
                  edge_weight=gp.weight)
    fp = bp["func"]

    @jax.jit
    def rhs_fwd(xx):
        return rhs(fp, aux, 0.0, xx)

    t = timeit(rhs_fwd, xh)
    print(f"c) one laplacian RHS eval fwd: {t*1000:.2f} ms", file=sys.stderr)

    @jax.jit
    def solve_grad(xx):
        def loss(x0):
            def step(carry, _):
                h = 1.0

                def f(z):
                    return rhs(fp, aux, 0.0, z)

                k1 = f(carry)
                k2 = f(carry + 0.5 * h * k1)
                k3 = f(carry + 0.5 * h * k2)
                k4 = f(carry + h * k3)
                return carry + (h / 6) * (k1 + 2 * k2 + 2 * k3 + k4), None

            y, _ = jax.lax.scan(jax.checkpoint(step), x0, None, length=4)
            return jnp.sum(y)

        return jax.grad(loss)(xx)

    t = timeit(solve_grad, xh)
    print(f"d) grad(4-step rk4, const w) [16 evals fwd]: {t*1000:.1f} ms",
          file=sys.stderr)

    y = jnp.asarray(np.random.default_rng(1).integers(0, nc, g.num_nodes),
                    jnp.int32)
    mask = jnp.asarray(np.random.default_rng(2).random(g.num_nodes) < 0.5)
    nfe, dt, comp, bwd = _time_train(m_l, p_l, s_l, x, y, mask)
    print(f"e) full GRAND-l train step: {dt*1000:.0f} ms "
          f"(fwd_nfe={nfe}, bwd_nfe={bwd}, compile={comp:.0f}s)",
          file=sys.stderr)


if __name__ == "__main__":
    main()
