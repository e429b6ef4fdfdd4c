"""Positional-encoding batch tools.

CLI equivalents of the reference's PE pipeline scripts:
  * ``generate`` — train DeepWalk encodings over datasets × dims, score each
    by a logistic-probe accuracy, and keep the best per (dataset, dim) under
    the canonical name ``{ds}_DW{dim}.npz`` (deepwalk_embeddings.py +
    deepwalk_gen.sh + deepwalk_gen_symlinks.py)
  * ``compress`` — NMF-compress a dense GDC PE to embedding_dim
    (pos_enc_factorisation.py)
  * ``hyperbolize`` — distance-matrix generation from cached encodings
    (hyperbolic_distances.py CLI)
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from graph_neural_pde_tpu.config import Config, best_params
from graph_neural_pde_tpu.data.datasets import get_dataset
from graph_neural_pde_tpu.rewiring.positional import (
    deepwalk_embeddings,
    nmf_compress,
)
from graph_neural_pde_tpu.rewiring.knn import hyperbolize


def probe_accuracy(emb: np.ndarray, y: np.ndarray, train_mask, test_mask
                   ) -> float:
    """Logistic-regression probe — the quality score the reference's
    symlink picker ranks DW pickles by (deepwalk_gen_symlinks.py:22-47)."""
    from sklearn.linear_model import LogisticRegression
    clf = LogisticRegression(max_iter=500)
    clf.fit(emb[np.asarray(train_mask)], y[np.asarray(train_mask)])
    return float(clf.score(emb[np.asarray(test_mask)],
                           y[np.asarray(test_mask)]))


def generate(datasets, dims, data_dir, out_dir=None, seeds=(0, 1),
             verbose=True):
    out_dir = out_dir or os.path.join(data_dir, "pos_encodings")
    os.makedirs(out_dir, exist_ok=True)
    for name in datasets:
        cfg = best_params.get(name, Config(dataset=name))
        ds = get_dataset(cfg, data_dir)
        m = np.asarray(ds.graph.mask)
        r = np.asarray(ds.graph.row)[m]
        c = np.asarray(ds.graph.col)[m]
        y = np.asarray(ds.y)
        for dim in dims:
            best_acc, best_emb = -1.0, None
            for seed in seeds:
                emb = deepwalk_embeddings(r, c, ds.graph.num_nodes, dim=dim,
                                          seed=seed)
                acc = probe_accuracy(emb, y, ds.train_mask, ds.test_mask)
                if acc > best_acc:
                    best_acc, best_emb = acc, emb
                if verbose:
                    print(f"{name} DW{dim} seed{seed}: probe acc {acc:.4f}")
            np.savez(os.path.join(out_dir, f"{name}_DW{dim}.npz"),
                     pe=best_emb, acc=best_acc)


def compress(pe_path: str, dim: int, out_path: str):
    pe = np.load(pe_path)["pe"]
    np.savez(out_path, pe=nmf_compress(pe, dim))


def hyperbolize_cached(pe_path: str, out_path: str):
    pe = np.load(pe_path)["pe"]
    np.savez(out_path, dist=hyperbolize(pe))


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="cmd", required=True)
    g = sub.add_parser("generate")
    g.add_argument("--datasets", nargs="+", default=["Cora", "Citeseer"])
    g.add_argument("--dims", nargs="+", type=int, default=[64, 128])
    g.add_argument("--data_dir", default="./data")
    c = sub.add_parser("compress")
    c.add_argument("pe_path")
    c.add_argument("--dim", type=int, default=64)
    c.add_argument("--out", required=True)
    h = sub.add_parser("hyperbolize")
    h.add_argument("pe_path")
    h.add_argument("--out", required=True)
    args = p.parse_args()
    if args.cmd == "generate":
        generate(args.datasets, args.dims, args.data_dir)
    elif args.cmd == "compress":
        compress(args.pe_path, args.dim, args.out)
    else:
        hyperbolize_cached(args.pe_path, args.out)
