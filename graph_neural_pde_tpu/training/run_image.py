"""Image-diffusion training CLI (run_image.py equivalent).

``python -m graph_neural_pde_tpu.training.run_image --dataset MNIST``
Trains GNN_image on batched pixel-grid graphs (/root/reference/src/run_image.py:84-219).
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from graph_neural_pde_tpu.config import Config
from graph_neural_pde_tpu.data.image import load_image_dataset
from graph_neural_pde_tpu.models.gnn_image import GNNImageModel
from graph_neural_pde_tpu.training.train import (
    accuracy,
    cross_entropy_loss,
    make_optimizer,
)


def train_image(cfg: Config, data_dir: str = "./data", dataset: str = "MNIST",
                batch_size: int = 64, epochs: int = 3, diagonals: bool = False,
                max_batches: int | None = None, verbose: bool = True):
    data = load_image_dataset(data_dir, dataset, batch_size,
                              diagonals=diagonals)
    num_classes = int(data.y.max()) + 1
    model = GNNImageModel(cfg, data.graph, data.h, data.w, data.c,
                          num_classes, batch_size)
    optimizer = make_optimizer(cfg)
    params, state = model.init(jax.random.PRNGKey(cfg.seed))
    opt_state = optimizer.init(params)

    @jax.jit
    def step(params, opt_state, x, y, rng):
        def loss_fn(p):
            logits, _, stats, _ = model.apply(p, state, x, training=True,
                                              rng=rng)
            mask = jnp.ones_like(y, jnp.float32)
            return cross_entropy_loss(logits, y, mask), (logits, stats)

        (loss, (logits, stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        acc = accuracy(logits, y, jnp.ones_like(y, jnp.float32))
        return params, opt_state, loss, acc

    key = jax.random.PRNGKey(cfg.seed + 1)
    history = []
    for epoch in range(epochs):
        t0 = time.time()
        losses, accs = [], []
        for bi, (x, y) in enumerate(data.batches(seed=epoch)):
            if max_batches is not None and bi >= max_batches:
                break
            key, k = jax.random.split(key)
            params, opt_state, loss, acc = step(
                params, opt_state, jnp.asarray(x), jnp.asarray(y), k)
            losses.append(float(loss))
            accs.append(float(acc))
        history.append((np.mean(losses), np.mean(accs)))
        if verbose:
            print(f"Epoch {epoch}: loss {np.mean(losses):.4f} "
                  f"train acc {np.mean(accs):.4f} ({time.time()-t0:.1f}s)")
    return params, history


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", default="MNIST")
    p.add_argument("--data_dir", default="./data")
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--epochs", type=int, default=3)
    p.add_argument("--time", type=float, default=3.0)
    p.add_argument("--diags", action="store_true")
    args = p.parse_args()
    cfg = Config(block="constant", function="laplacian", method="rk4",
                 step_size=1.0, time=args.time, input_dropout=0.0,
                 dropout=0.0, lr=0.01, decay=0.0, self_loop_weight=1.0)
    train_image(cfg, args.data_dir, args.dataset, args.batch_size,
                args.epochs, args.diags)
