"""On-chip smoke test for the norm_idx=1 mirror-trick engine.

Builds a mid-size symmetric SBM, runs the fused norm1 RHS (Mosaic kernels)
against the XLA composition on the real TPU, checks forward and gradient
agreement, and times both paths — the measured basis for the bench norm1
secondary. Run: python examples/smoke_norm1_tpu.py [n_nodes]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from graph_neural_pde_tpu.config import Config
from graph_neural_pde_tpu.data.synthetic import make_sbm_dataset
from graph_neural_pde_tpu.models.blocks import (
    build_stripe_engine, init_block, prepare_graph)
from graph_neural_pde_tpu.models.functions import FuncAux, make_rhs


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    d, heads = 128, 4
    cfg = Config(block="constant", function="transformer",
                 attention_type="scaled_dot", heads=heads, attention_dim=128,
                 hidden_dim=d, add_source=True, stripe_fused=True,
                 attention_norm_idx=1, rhs_payload_dtype="bfloat16")
    ds = make_sbm_dataset(num_nodes=n, num_classes=5, num_features=16,
                          avg_degree=16, seed=0)
    g = prepare_graph(cfg, ds.graph)
    g2, plan = build_stripe_engine(cfg, g)
    assert plan is not None and plan.symmetric, "need a symmetric plan"
    print(f"nodes={g2.num_nodes} cap={plan.capacity} chunk={plan.chunk}")
    params = init_block(jax.random.PRNGKey(0), cfg, d)["func"]
    params = jax.tree_util.tree_map(
        lambda p: p + 0.05 * jax.random.normal(jax.random.PRNGKey(1),
                                               p.shape), params)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(g2.num_nodes, d)), jnp.float32)
    aux = FuncAux(attention=None, x0=x, edge_weight=g2.weight)
    rhs_fast = jax.jit(make_rhs(cfg, g2, stripe_plan=plan),
                       static_argnums=(2,))
    rhs_ref = jax.jit(make_rhs(cfg.replace(stripe_fused=False), g2),
                      static_argnums=(2,))

    t0 = time.time()
    out_f = jax.block_until_ready(rhs_fast(params, aux, 0.0, x))
    print(f"fused compile+run {time.time()-t0:.1f}s")
    t0 = time.time()
    out_r = jax.block_until_ready(rhs_ref(params, aux, 0.0, x))
    print(f"composition compile+run {time.time()-t0:.1f}s")
    scale = float(jnp.abs(out_r).max()) + 1e-6
    err = float(jnp.abs(out_f - out_r).max()) / scale
    print(f"forward rel max err: {err:.2e}")

    def timeit(f, *a, reps=20):
        jax.block_until_ready(f(*a))
        t0 = time.time()
        for _ in range(reps):
            r = f(*a)
        jax.block_until_ready(r)
        return (time.time() - t0) / reps * 1000

    ms_f = timeit(rhs_fast, params, aux, 0.0, x)
    ms_r = timeit(rhs_ref, params, aux, 0.0, x)
    e_valid = int(np.asarray(plan.valid).sum())
    print(f"fwd: fused {ms_f:.2f} ms vs composition {ms_r:.2f} ms "
          f"({ms_r/ms_f:.2f}x, {e_valid/ms_f/1e3:.1f}M edge/s fused)")

    def loss_of(rhs):
        def f(p, xx):
            out = rhs(p, aux, 0.0, xx)
            return jnp.sum(out * jnp.cos(jnp.arange(out.size)
                                         .reshape(out.shape) * 0.1))
        return f

    gf_fn = jax.jit(jax.grad(loss_of(make_rhs(cfg, g2, stripe_plan=plan)),
                             argnums=(0, 1)))
    gr_fn = jax.jit(jax.grad(loss_of(make_rhs(cfg.replace(
        stripe_fused=False), g2)), argnums=(0, 1)))
    t0 = time.time()
    gf = jax.block_until_ready(gf_fn(params, x))
    print(f"fused grad compile+run {time.time()-t0:.1f}s")
    gr = jax.block_until_ready(gr_fn(params, x))
    ff, _ = jax.flatten_util.ravel_pytree(gf)
    fr, _ = jax.flatten_util.ravel_pytree(gr)
    gerr = float(jnp.abs(ff - fr).max()) / (float(jnp.abs(fr).max()) + 1e-6)
    print(f"grad rel max err: {gerr:.2e}")
    ms_gf = timeit(gf_fn, params, x)
    ms_gr = timeit(gr_fn, params, x)
    print(f"grad: fused {ms_gf:.2f} ms vs composition {ms_gr:.2f} ms "
          f"({ms_gr/ms_gf:.2f}x)")


if __name__ == "__main__":
    import jax.flatten_util  # noqa: F401
    main()
