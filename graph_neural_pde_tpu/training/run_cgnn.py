"""CGNN baseline CLI (the reference's ``python CGNN.py`` entry, CGNN.py:440-488).

``python -m graph_neural_pde_tpu.training.run_cgnn --dataset Cora``
Runs the Continuous-GNN baseline with its hand-tuned per-dataset options.
"""

from __future__ import annotations

import argparse
import time

import jax

from graph_neural_pde_tpu.config import Config
from graph_neural_pde_tpu.data.datasets import get_dataset
from graph_neural_pde_tpu.models.cgnn import CGNNModel, cgnn_best_params
from graph_neural_pde_tpu.training.train import Trainer


def main(dataset: str = "Cora", data_dir: str = "./data",
         epochs: int | None = None, verbose: bool = True):
    tuned = cgnn_best_params.get(dataset, {})
    cfg = Config(dataset=dataset, **{k: v for k, v in tuned.items()
                                     if k != "augment"})
    ds = get_dataset(cfg, data_dir)
    model = CGNNModel(cfg, ds.num_features, ds.num_classes, ds.graph)
    trainer = Trainer(model)
    t0 = time.time()
    params, state, best, logs = trainer.fit(
        ds, epochs=epochs or cfg.epoch, verbose=verbose)
    if verbose:
        print(f"CGNN {dataset}: best val {best['val_acc']:.4f} test "
              f"{best['test_acc']:.4f} ({time.time()-t0:.0f}s)")
    return best


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", default="Cora")
    p.add_argument("--data_dir", default="./data")
    p.add_argument("--epoch", type=int, default=None)
    a = p.parse_args()
    main(a.dataset, a.data_dir, a.epoch)
