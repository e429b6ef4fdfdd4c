"""Probe 8c: the 600 ms gap is closure-constants vs traced arguments.

Same computation three ways:
  (a) everything closed over (probe8b's 1240 ms form)
  (b) all data traced as jit arguments (the Trainer's 1851 ms form)
  (c) traced, but with x pre-converted to the ODE dtype outside the jit
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

    def make_loss(xx, yy, mm, st, rr):
        def loss_fn(p):
            logits, ns, stats, regs = m.apply(p, st, xx, None,
                                              training=True, rng=rr)
            return cross_entropy_loss(logits, yy, mm), (ns, stats)
        return loss_fn

    def step_closed(p, os):
        (loss, aux), grads = jax.value_and_grad(
            make_loss(x, y, mask, state, rng), has_aux=True)(p)
        u, os2 = trainer.optimizer.update(grads, os, p)
        return optax.apply_updates(p, u), os2, loss

    timeit(jax.jit(step_closed), params, opt_state, label="closed_consts")

    def step_traced(p, os, xx, yy, mm, st, rr):
        (loss, aux), grads = jax.value_and_grad(
            make_loss(xx, yy, mm, st, rr), has_aux=True)(p)
        u, os2 = trainer.optimizer.update(grads, os, p)
        return optax.apply_updates(p, u), os2, loss

    timeit(jax.jit(step_traced), params, opt_state, x, y, mask, state, rng,
           label="all_traced")

    # halfway: only x traced
    def step_x(p, os, xx):
        (loss, aux), grads = jax.value_and_grad(
            make_loss(xx, y, mask, state, rng), has_aux=True)(p)
        u, os2 = trainer.optimizer.update(grads, os, p)
        return optax.apply_updates(p, u), os2, loss

    timeit(jax.jit(step_x), params, opt_state, x, label="only_x_traced")

    # only rng traced
    def step_rng(p, os, rr):
        (loss, aux), grads = jax.value_and_grad(
            make_loss(x, y, mask, state, rr), has_aux=True)(p)
        u, os2 = trainer.optimizer.update(grads, os, p)
        return optax.apply_updates(p, u), os2, loss

    timeit(jax.jit(step_rng), params, opt_state, rng, label="only_rng_traced")

    # only state traced
    def step_state(p, os, st):
        (loss, aux), grads = jax.value_and_grad(
            make_loss(x, y, mask, st, rng), has_aux=True)(p)
        u, os2 = trainer.optimizer.update(grads, os, p)
        return optax.apply_updates(p, u), os2, loss

    timeit(jax.jit(step_state), params, opt_state, state,
           label="only_state_traced")


if __name__ == "__main__":
    main()
