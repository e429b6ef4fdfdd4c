"""Probe 8: decompose the 1855 ms remat train step at bench scale.

Times, all jitted separately on the same GRAND-nl remat config bench.py uses:
  loss forward only            (expected ~ fwd 154 ms + head/loss)
  value_and_grad of the loss   (the train step minus the optax update)
  the optax update alone
  one RHS forward eval
  one RHS vjp backward eval    (the per-step cost the backward solve pays)
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

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

    def loss_fn(p):
        logits, new_state, stats, regs = m.apply(p, state, x, None,
                                                 training=True, rng=rng)
        return cross_entropy_loss(logits, y, mask), stats

    timeit(jax.jit(lambda p: loss_fn(p)[0]), params, label="loss_fwd_only")
    vg = jax.jit(lambda p: jax.value_and_grad(
        lambda q: loss_fn(q)[0])(p))
    timeit(vg, params, label="value_and_grad")

    trainer = Trainer(m)
    opt_state = trainer.optimizer.init(params)
    grads = vg(params)[1]

    def upd(g, os, p):
        import optax
        u, os2 = trainer.optimizer.update(g, os, p)
        return optax.apply_updates(p, u)

    timeit(jax.jit(upd), grads, opt_state, params, label="optax_update")

    timeit(trainer._train_step, params, state, opt_state, x, None, y,
           mask, rng, label="full_train_step")

    # one RHS eval: forward + vjp-backward
    from graph_neural_pde_tpu.models.functions import FuncAux, make_rhs
    plan = m.stripe_plan
    g = m.graph
    rhs = make_rhs(m.cfg.replace(remat=True), g, stripe_plan=plan)
    enc = jnp.asarray(rng_t.normal(size=(g.num_nodes, m.cfg.hidden_dim)),
                      jnp.float32)
    aux = FuncAux(attention=None, x0=enc, edge_weight=g.weight)
    from graph_neural_pde_tpu.models.blocks import init_block
    fp = init_block(jax.random.PRNGKey(0), m.cfg, m.cfg.hidden_dim)["func"]

    f_fwd = jax.jit(lambda p, xx: rhs(p, aux, 0.0, xx))
    timeit(f_fwd, fp, enc, label="rhs_fwd_eval")

    def vjp_once(p, xx, ct):
        out, pull = jax.vjp(lambda q, z: rhs(q, aux, 0.0, z), p, xx)
        return pull(ct)

    ct = jnp.ones_like(enc)
    timeit(jax.jit(vjp_once), fp, enc, ct, label="rhs_vjp_fwd_plus_bwd")

    def bwd_only(p, xx, ct):
        _, pull = jax.vjp(lambda q, z: rhs(q, aux, 0.0, z), p, xx)
        return pull(ct)

    # vjp fwd+bwd minus fwd ~= bwd; also time linearized transpose alone
    print("# bwd-only ~= vjp_fwd_plus_bwd - rhs_fwd_eval", flush=True)


if __name__ == "__main__":
    main()
