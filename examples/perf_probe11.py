"""Probe 11: adjoint train-step compile time with the packed-u32 table.

bench.py's adjoint train mode compiled in 51 s with the bf16 table and
hung >30 min after the u32 pair-pack landed (remat mode: 61 s, fine).
The difference: in adjoint mode the packed ops run inside the adjoint
solve's lax.while_loop body. This probe times exactly that compile with
a hard alarm so variants can be A/B'd by editing fused_rhs and re-running.
"""

import signal
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from bench import build_benchmark, _sync  # noqa: E402


def main():
    timeout_s = int(sys.argv[1]) if len(sys.argv) > 1 else 420
    model, params, state, x, g_raw, nf, nc = build_benchmark()
    rng_t = np.random.default_rng(1)
    y = jnp.asarray(rng_t.integers(0, nc, size=x.shape[0]), jnp.int32)
    mask = jnp.asarray(rng_t.random(x.shape[0]) < 0.5)

    from graph_neural_pde_tpu.models.gnn import GNNModel
    from graph_neural_pde_tpu.training.train import Trainer

    m_t = GNNModel(model.cfg.replace(adjoint=True, adjoint_method="rk4",
                                     adjoint_step_size=1.0), nf, nc, g_raw)
    trainer = Trainer(m_t)
    opt_state = trainer.optimizer.init(params)
    rng = jax.random.PRNGKey(0)

    def on_alarm(signum, frame):
        print(f"COMPILE TIMEOUT after {timeout_s}s", flush=True)
        sys.exit(2)

    signal.signal(signal.SIGALRM, on_alarm)
    signal.alarm(timeout_s)
    t0 = time.time()
    out = trainer._train_step(params, state, opt_state, x, None, y, mask, rng)
    _sync(out[3])
    signal.alarm(0)
    print(f"adjoint compile+first-step: {time.time() - t0:.0f}s", flush=True)
    t0 = time.time()
    for _ in range(3):
        out = trainer._train_step(params, state, opt_state, x, None, y, mask,
                                  rng)
    _sync(out[3])
    print(f"steady: {(time.time() - t0) / 3 * 1000:.0f} ms/step", flush=True)


if __name__ == "__main__":
    main()
