"""Attention-visualisation walkthrough — the runnable equivalent of the
reference's notebooks/visualise_attention.ipynb.

Trains a small GRAND model, extracts the frozen attention weights the ODE
block computes at t=0, prints their distribution (the notebook's min/mean/
max + histograms), and renders the attention graph + heatmap via
utils.visualise. Saves PNGs next to the script.

Run: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python examples/visualise_attention_demo.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import matplotlib  # noqa: E402

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

from graph_neural_pde_tpu.config import Config  # noqa: E402
from graph_neural_pde_tpu.data.synthetic import make_sbm_dataset  # noqa: E402
from graph_neural_pde_tpu.models.blocks import build_aux  # noqa: E402
from graph_neural_pde_tpu.models.gnn import GNNModel  # noqa: E402
from graph_neural_pde_tpu.training.train import Trainer  # noqa: E402
from graph_neural_pde_tpu.utils.visualise import (  # noqa: E402
    attention_heatmap, draw_attention_graph)


def main(out_dir="/tmp/att_demo"):
    os.makedirs(out_dir, exist_ok=True)
    ds = make_sbm_dataset(num_nodes=80, num_classes=4, num_features=16,
                          seed=0)
    cfg = Config(block="attention", function="laplacian", method="rk4",
                 step_size=0.5, time=2.0, hidden_dim=16, attention_dim=16,
                 heads=4, input_dropout=0.2, dropout=0.1, lr=0.02,
                 self_loop_weight=1.0)
    model = GNNModel(cfg, ds.num_features, ds.num_classes, ds.graph)
    trainer = Trainer(model)
    params, state, best, logs = trainer.fit(ds, epochs=15, verbose=False)
    print(f"trained: best val {best['val_acc']:.3f} "
          f"test {best['test_acc']:.3f} @ epoch {best['epoch']}")

    # the attention the block freezes at t=0 (odefunc.attention_weights in
    # the reference notebook)
    x0, _ = model.encode(params, state, ds.x, None, training=False,
                         rng=jax.random.PRNGKey(0))
    aux, g2 = build_aux(params["block"], cfg, model.graph, x0,
                        training=False, stripe_plan=model.stripe_plan)
    att = np.asarray(aux.attention)
    m = np.asarray(g2.mask)
    print(f"edges {int(m.sum())}, attention shape {att.shape}, "
          f"min {att[m].min():.4f} mean {att[m].mean():.4f} "
          f"max {att[m].max():.4f}")

    fig, axes = plt.subplots(1, 2, figsize=(10, 4))
    axes[0].hist(att[m].mean(axis=-1) if att.ndim == 2 else att[m],
                 bins=np.linspace(0, 1, 21))
    axes[0].set_title("attention histogram [0, 1]")
    axes[1].hist(att[m].mean(axis=-1) if att.ndim == 2 else att[m],
                 bins=np.linspace(0, 0.1, 21))
    axes[1].set_title("attention histogram [0, 0.1]")
    fig.savefig(f"{out_dir}/attention_hist.png", bbox_inches="tight")

    ax = draw_attention_graph(g2, aux.attention)
    ax.figure.savefig(f"{out_dir}/attention_graph.png", bbox_inches="tight")
    ax2 = attention_heatmap(g2, aux.attention, max_nodes=80)
    ax2.figure.savefig(f"{out_dir}/attention_heat.png", bbox_inches="tight")
    print(f"wrote {out_dir}/attention_{{hist,graph,heat}}.png")


if __name__ == "__main__":
    main()
