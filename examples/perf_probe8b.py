"""Probe 8b: isolate the ~600 ms between value_and_grad+update (1249 ms)
and the full Trainer._train_step (1851 ms) at bench scale.

Candidates: has_aux (new_state/stats) residuals, the regulariser branch,
the optimizer composition inside one jit, cross_entropy masking.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

import sys
sys.path.insert(0, "/root/repo")

from bench import build_benchmark, _sync  # noqa: E402


def timeit(fn, *args, reps=5, label=""):
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
    from graph_neural_pde_tpu.models.gnn import GNNModel
    from graph_neural_pde_tpu.training.train import (Trainer,
                                                     cross_entropy_loss)

    m = GNNModel(model.cfg.replace(remat=True), nf, nc, g_raw)
    rng_t = np.random.default_rng(1)
    y = jnp.asarray(rng_t.integers(0, nc, size=x.shape[0]), jnp.int32)
    mask = jnp.asarray(rng_t.random(x.shape[0]) < 0.5)
    rng = jax.random.PRNGKey(0)
    trainer = Trainer(m)
    opt_state = trainer.optimizer.init(params)
    print("reg_coeffs:", trainer.reg_coeffs, flush=True)

    # (a) value_and_grad WITH aux — the trainer's exact loss_fn
    def loss_fn(p):
        logits, new_state, stats, regs = m.apply(p, state, x, None,
                                                 training=True, rng=rng)
        loss = cross_entropy_loss(logits, y, mask)
        for coeff, rs in zip(trainer.reg_coeffs, regs):
            if coeff:
                loss = loss + coeff * jnp.mean(rs)
        return loss, (new_state, stats)

    vg_aux = jax.jit(lambda p: jax.value_and_grad(loss_fn, has_aux=True)(p))
    timeit(vg_aux, params, label="value_and_grad_with_aux")

    # (b) vg + optimizer composed in ONE jit (my own composition)
    def step(p, os):
        (loss, (ns, st)), grads = jax.value_and_grad(loss_fn,
                                                     has_aux=True)(p)
        updates, os2 = trainer.optimizer.update(grads, os, p)
        p2 = optax.apply_updates(p, updates)
        return p2, os2, loss

    timeit(jax.jit(step), params, opt_state, label="vg_aux_plus_update_1jit")

    # (c) the trainer's own jitted step
    timeit(trainer._train_step, params, state, opt_state, x, None, y,
           mask, rng, label="trainer_train_step")


if __name__ == "__main__":
    main()
