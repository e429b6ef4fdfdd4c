"""Probe 4: full TRAIN-step timing at bench scale (round-3 backward work).

Times one optimizer step of the GRAND-nl bench model (transformer RHS,
rk4 x 4 steps = 16 fwd NFE, arxiv-scale graph) under
  (a) remat   — discrete backprop through the scan, steps rematerialised
  (b) adjoint — continuous adjoint (rk4 backward)
and reports seconds/step + train edge.NFE/s, to compare against the
forward-only headline. Round-2 baseline (PARITY.md): remat 2.9 s,
adjoint 3.2 s => ~13-14M edge.NFE/s trained vs 260M forward.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

import sys
sys.path.insert(0, "/root/repo")

from bench import build_benchmark, _sync  # noqa: E402


def time_train(model, params, state, x, y, mask, reps=3, label=""):
    from graph_neural_pde_tpu.training.train import Trainer

    trainer = Trainer(model)
    opt_state = trainer.optimizer.init(params)
    rng = jax.random.PRNGKey(0)

    t0 = time.time()
    p2, s2, o2, loss, stats = trainer._train_step(
        params, state, opt_state, x, None, y, mask, rng)
    _sync(loss)
    compile_s = time.time() - t0
    nfe = int(jax.device_get(stats["nfe"]))

    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        for _ in range(reps):
            p2, s2, o2, loss, stats = trainer._train_step(
                params, state, opt_state, x, None, y, mask, rng)
        _sync(loss)
        best = min(best, (time.time() - t0) / reps)
    return nfe, best, compile_s, float(jax.device_get(loss))


def main():
    model, params, state, x, g_raw, nf, nc = build_benchmark()
    g = model.graph
    e_valid = int(jax.device_get(g.num_edges))
    n = x.shape[0]
    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.integers(0, nc, size=n), jnp.int32)
    mask = jnp.asarray(rng.random(n) < 0.5)

    cfg = model.cfg
    for mode, over in [("remat", dict(remat=True, adjoint=False)),
                       ("adjoint", dict(adjoint=True, adjoint_method="rk4",
                                        adjoint_step_size=1.0))]:
        from graph_neural_pde_tpu.models.gnn import GNNModel
        m = GNNModel(cfg.replace(**over), nf, nc, g_raw)
        nfe, dt, comp, loss = time_train(m, params, state, x, y, mask,
                                         label=mode)
        rate = nfe * e_valid / dt
        print(f"{mode}: {dt*1000:.0f} ms/step  fwd_nfe={nfe} "
              f"train_rate={rate/1e6:.1f}M edge.NFE/s  "
              f"compile={comp:.0f}s loss={loss:.3f}")


if __name__ == "__main__":
    main()
