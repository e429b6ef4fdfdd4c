"""Diagnose the Cora reproduction collapse (VERDICT r2 #4).

reproduce_results.json round 2: Cora test 0.586 +/- 0.41 over 5 reps — a
bimodal 2-of-5 training collapse under the flagship tuned config (dopri5,
T=18.29, tol_scale 822, squareplus attention, adamax lr 0.023) on the
synthetic SBM stand-in. This instruments per-rep, per-epoch: loss, val acc,
forward NFE, hit_max_steps, solver t_final, and the attention/alpha params'
scales — to find where the diverging reps depart.

Usage: python examples/diag_cora.py [--reps 5] [--epochs 60]
"""

import argparse
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from graph_neural_pde_tpu.config import best_params  # noqa: E402
from graph_neural_pde_tpu.data.datasets import (  # noqa: E402
    get_dataset, set_train_val_test_split)
from graph_neural_pde_tpu.run import select_model  # noqa: E402
from graph_neural_pde_tpu.training.train import Trainer  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--reps", type=int, default=5)
    p.add_argument("--epochs", type=int, default=60)
    p.add_argument("--data_dir", default="/tmp/nodata")
    args = p.parse_args()

    cfg = best_params["Cora"].replace(epoch=args.epochs + 1)
    dataset = get_dataset(cfg, args.data_dir, use_lcc=cfg.not_lcc)
    for rep in range(args.reps):
        y_np = np.asarray(dataset.y)
        tm, vm, sm = set_train_val_test_split(rep, y_np, 1500)
        dataset.train_mask = jnp.asarray(tm)
        dataset.val_mask = jnp.asarray(vm)
        dataset.test_mask = jnp.asarray(sm)
        model = select_model(cfg, dataset.num_features, dataset.num_classes,
                             dataset.graph)
        trainer = Trainer(model)
        params, state = model.init(jax.random.PRNGKey(rep))
        opt_state = trainer.optimizer.init(params)
        key = jax.random.PRNGKey(rep)
        print(f"=== rep {rep} ===", flush=True)
        for epoch in range(1, args.epochs + 1):
            key, k = jax.random.split(key)
            params, state, opt_state, loss, st = trainer._train_step(
                params, state, opt_state, dataset.x, None, dataset.y,
                dataset.train_mask, k)
            (tr, va, te), _, est = trainer._eval_step(
                params, state, dataset.x, None, dataset.y,
                (dataset.train_mask, dataset.val_mask, dataset.test_mask))
            fp = params["block"]["func"]
            ap = params["block"]["att"]
            qn = float(jnp.abs(ap["Q"]["w"]).max())
            kn = float(jnp.abs(ap["K"]["w"]).max())
            alpha = float(fp["alpha_train"])
            if epoch % 2 == 1 or epoch <= 10:
                print(f"rep {rep} ep {epoch:3d}: loss {float(loss):8.4f} "
                      f"val {float(va):.3f} nfe {int(st['nfe']):5d} "
                      f"cap {bool(st['hit_max_steps'])} "
                      f"tF {float(st['t_final']):7.3f} "
                      f"eval_nfe {int(est['nfe']):5d} "
                      f"eval_cap {bool(est['hit_max_steps'])} "
                      f"|Q| {qn:.3f} |K| {kn:.3f} alpha {alpha:.3f}",
                      flush=True)


if __name__ == "__main__":
    main()
