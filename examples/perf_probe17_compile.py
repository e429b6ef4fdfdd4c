"""Probe 17 (round 5, VERDICT r4 #5): decompose the adjoint train step's
warm compile time.

BENCH_r04 measured 63 s 'warm compile' for the GRAND-nl adjoint train step
(bar: <=60 s) and attributed it to ~300 MB of executable moving over the
axon tunnel. This probe splits the first-call wall time into
  (a) trace+lower      — jax tracing to StableHLO (host Python)
  (b) compile          — persistent-cache hit: deserialise + load the
                         executable onto the device (tunnel transfer)
  (c) first execution  — device step + host sync
Run TWICE (cold then warm cache) to see both.

Run: python examples/perf_probe17_compile.py [remat|adjoint]
"""

import sys
import time

import jax
import numpy as np

sys.path.insert(0, ".")

from bench import build_benchmark, _sync  # noqa: E402


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "adjoint"
    from graph_neural_pde_tpu.utils.compile_cache import (
        enable_persistent_cache)
    enable_persistent_cache()
    import jax.numpy as jnp

    model, params, state, x, g, nf, nc = build_benchmark()
    over = (dict(remat=True) if mode == "remat"
            else dict(adjoint=True, adjoint_method="rk4",
                      adjoint_step_size=1.0))
    from graph_neural_pde_tpu.models.gnn import GNNModel
    from graph_neural_pde_tpu.training.train import Trainer

    m = GNNModel(model.cfg.replace(method="rk4", step_size=1.0, **over),
                 nf, nc, g)
    trainer = Trainer(m)
    opt_state = trainer.optimizer.init(params)
    rng = jax.random.PRNGKey(0)
    y = jnp.asarray(np.random.default_rng(1).integers(0, nc, g.num_nodes))
    mask = jnp.asarray(np.random.default_rng(2).random(g.num_nodes) < 0.5)

    def impl(params, state, opt_state, rng):
        return trainer._train_step_impl(params, state, opt_state, x, None,
                                        y, mask, rng)

    jf = jax.jit(impl)
    t0 = time.time()
    lowered = jf.lower(params, state, opt_state, rng)
    t_lower = time.time() - t0
    t0 = time.time()
    compiled = lowered.compile()
    t_compile = time.time() - t0
    try:
        mem = compiled.memory_analysis()
        sz = getattr(mem, "generated_code_size_in_bytes", None)
    except Exception:
        sz = None
    t0 = time.time()
    out = compiled(params, state, opt_state, rng)
    _sync(out[3])
    t_exec = time.time() - t0
    print(f"[{mode}] trace+lower {t_lower:.1f}s  compile {t_compile:.1f}s  "
          f"first-exec {t_exec:.1f}s  total {t_lower+t_compile+t_exec:.1f}s"
          + (f"  code_size {sz/1e6:.0f}MB" if sz else ""),
          file=sys.stderr)


if __name__ == "__main__":
    main()
