"""Train a GRAND model and draw its attention graph + heatmap.

Script equivalent of /root/reference/src/visualise_attention.py and
notebooks/visualise_attention.ipynb.

    python examples/visualise_attention.py --dataset Cora --out attention.png
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


import jax
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

from graph_neural_pde_tpu.config import Config
from graph_neural_pde_tpu.data.datasets import get_dataset
from graph_neural_pde_tpu.models.attention import apply_transformer_attention
from graph_neural_pde_tpu.models.gnn import GNNModel
from graph_neural_pde_tpu.training.train import Trainer
from graph_neural_pde_tpu.utils.visualise import (
    attention_heatmap,
    draw_attention_graph,
)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", default="Cora")
    p.add_argument("--data_dir", default="./data")
    p.add_argument("--epochs", type=int, default=20)
    p.add_argument("--out", default="attention.png")
    args = p.parse_args()

    cfg = Config(dataset=args.dataset, block="attention",
                 function="laplacian", method="rk4", step_size=0.5, time=3.0,
                 hidden_dim=32, attention_dim=32, heads=4, add_source=True,
                 input_dropout=0.3, dropout=0.1)
    ds = get_dataset(cfg, args.data_dir)
    model = GNNModel(cfg, ds.num_features, ds.num_classes, ds.graph)
    params, state, best, _ = Trainer(model).fit(ds, epochs=args.epochs,
                                                verbose=False)
    print(f"trained: val {best['val_acc']:.3f} test {best['test_acc']:.3f}")

    x0, _ = model.encode(params, state, ds.x, None, False,
                         jax.random.PRNGKey(0))
    att, _ = apply_transformer_attention(params["block"]["att"], cfg, x0,
                                         model.graph,
                                         edge_weight=model.graph.weight)

    fig, axes = plt.subplots(1, 2, figsize=(16, 8))
    draw_attention_graph(model.graph, att, ax=axes[0])
    axes[0].set_title("attention graph (width ∝ head-mean attention)")
    attention_heatmap(model.graph, att, max_nodes=64, ax=axes[1])
    axes[1].set_title("attention heatmap (first 64 nodes)")
    fig.savefig(args.out, bbox_inches="tight", dpi=120)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
