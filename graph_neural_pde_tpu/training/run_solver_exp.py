"""Explicit/implicit Adams step-size sweep (run_explicit_implicit_exp.py).

For each solver in {explicit_adams, implicit_adams} and each step size,
train GRAND-l for a few epochs and record per-epoch loss/accuracy/NFE;
results are saved as npz (the reference pickles per-epoch dicts,
run_explicit_implicit_exp.py:123-184).
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from graph_neural_pde_tpu.config import Config
from graph_neural_pde_tpu.data.datasets import get_dataset
from graph_neural_pde_tpu.models.gnn import GNNModel
from graph_neural_pde_tpu.training.train import Trainer


def run_experiment(cfg: Config, data_dir: str, step_sizes, methods=None,
                   epochs: int = 10, out_path: str | None = None,
                   verbose: bool = True):
    methods = methods or ["explicit_adams", "implicit_adams"]
    dataset = get_dataset(cfg, data_dir)
    results = {}
    for method in methods:
        for h in step_sizes:
            c = cfg.replace(method=method, step_size=float(h))
            model = GNNModel(c, dataset.num_features, dataset.num_classes,
                             dataset.graph)
            trainer = Trainer(model)
            _, _, best, logs = trainer.fit(dataset, epochs=epochs,
                                           verbose=False)
            key = f"{method}_h{h}"
            results[key] = {
                "loss": np.array([l.loss for l in logs]),
                "val_acc": np.array([l.val_acc for l in logs]),
                "test_acc": np.array([l.test_acc for l in logs]),
                "nfe": np.array([l.fwd_nfe for l in logs]),
            }
            if verbose:
                print(f"{key}: best val {best['val_acc']:.4f} "
                      f"test {best['test_acc']:.4f} "
                      f"nfe/epoch {logs[-1].fwd_nfe}")
    if out_path:
        os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
        flat = {f"{k}__{m}": v for k, d in results.items()
                for m, v in d.items()}
        np.savez(out_path, **flat)
    return results


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", default="Cora")
    p.add_argument("--data_dir", default="./data")
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--out", default="solver_exp_results.npz")
    args = p.parse_args()
    cfg = Config(dataset=args.dataset, hidden_dim=32, time=4.0,
                 input_dropout=0.2, dropout=0.0, add_source=True)
    run_experiment(cfg, args.data_dir, step_sizes=[1.0, 0.5, 0.25],
                   epochs=args.epochs, out_path=args.out)
