"""Sweep-analysis walkthrough — the runnable equivalent of the reference's
notebooks/ray_analysis.ipynb.

Runs a small ASHA sweep with training.tuning.run_sweep, assembles the
per-trial results into a table (the notebook's Analysis(...).dataframe),
prints it sorted by validation accuracy, writes a CSV, and plots accuracy
against the sampled hyperparameters.

Run: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python examples/sweep_analysis_demo.py
"""

import csv
import os
import sys

sys.path.insert(0, "/root/repo")

import matplotlib  # noqa: E402

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

from graph_neural_pde_tpu.config import Config  # noqa: E402
from graph_neural_pde_tpu.data.synthetic import make_sbm_dataset  # noqa: E402
from graph_neural_pde_tpu.training.tuning import run_sweep  # noqa: E402

COLS = ("idx", "val_acc", "test_acc", "epochs_run", "lr", "decay",
        "hidden_dim", "time", "method", "block", "attention_type")


def main(out_dir="/tmp/sweep_demo"):
    os.makedirs(out_dir, exist_ok=True)
    ds = make_sbm_dataset(num_nodes=80, num_classes=4, num_features=16,
                          seed=1)
    base = Config(dataset="Cora", hidden_dim=16, attention_dim=16, heads=4,
                  input_dropout=0.2, dropout=0.0)
    trials = run_sweep(base, ds, num_samples=4, max_epochs=8,
                       grace_period=3, num_splits=1, verbose=True)

    rows = []
    for t in trials:
        rows.append({
            "idx": t.idx, "val_acc": round(t.val_acc, 4),
            "test_acc": round(t.test_acc, 4), "epochs_run": t.epochs_run,
            "lr": round(t.cfg.lr, 5), "decay": round(t.cfg.decay, 5),
            "hidden_dim": t.cfg.hidden_dim, "time": round(t.cfg.time, 2),
            "method": t.cfg.method, "block": t.cfg.block,
            "attention_type": t.cfg.attention_type,
        })
    widths = {c: max(len(c), *(len(str(r[c])) for r in rows)) for c in COLS}
    print(" | ".join(c.ljust(widths[c]) for c in COLS))
    for r in rows:
        print(" | ".join(str(r[c]).ljust(widths[c]) for c in COLS))

    with open(f"{out_dir}/sweep_results.csv", "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=COLS)
        w.writeheader()
        w.writerows(rows)

    fig, axes = plt.subplots(1, 3, figsize=(12, 3.2))
    for ax, key in zip(axes, ("lr", "time", "hidden_dim")):
        ax.scatter([r[key] for r in rows], [r["val_acc"] for r in rows])
        ax.set_xlabel(key)
        ax.set_ylabel("val acc")
        if key == "lr":
            ax.set_xscale("log")
    fig.savefig(f"{out_dir}/sweep_scatter.png", bbox_inches="tight")
    print(f"wrote {out_dir}/sweep_results.csv and sweep_scatter.png")


if __name__ == "__main__":
    main()
