"""Probe 8d: minimal repro of the traced-x backward penalty.

grad wrt W of sum(relu(x @ W) @ V) at bench scale (x [169k, 128]) with x
traced vs closed-over — isolates the d_enc^T accumulation XLA strategy.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

import sys
sys.path.insert(0, "/root/repo")


def _sync(arr):
    _ = float(jax.device_get(arr.reshape(-1)[:1])[0])


def timeit(fn, *args, reps=10, label=""):
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
    rng = np.random.default_rng(0)
    n, d = 169_984, 128
    x = jnp.asarray(rng.normal(size=(n, d)), jnp.float32)
    W = jnp.asarray(rng.normal(size=(d, d)) * 0.1, jnp.float32)
    V = jnp.asarray(rng.normal(size=(d, 8)) * 0.1, jnp.float32)

    def loss(W, xx):
        h = jax.nn.relu(xx @ W)
        return jnp.sum(h @ V)

    timeit(jax.jit(lambda W: jax.grad(loss)(W, x)), W,
           label="grad_W_x_const")
    timeit(jax.jit(lambda W, xx: jax.grad(loss)(W, xx)), W, x,
           label="grad_W_x_traced")

    # pure transposed matmul: x^T @ g
    g = jnp.asarray(rng.normal(size=(n, d)), jnp.float32)
    timeit(jax.jit(lambda g: x.T @ g), g, label="xT_at_g_x_const")
    timeit(jax.jit(lambda xx, g: xx.T @ g), x, g, label="xT_at_g_x_traced")

    # is it a per-call HOST->DEVICE transfer? time an op that just reads x
    timeit(jax.jit(lambda xx: jnp.sum(xx)), x, label="sum_x_traced")
    timeit(jax.jit(lambda: jnp.sum(x)), label="sum_x_const")


if __name__ == "__main__":
    main()
