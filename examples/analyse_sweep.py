"""Summarise a hyperparameter sweep (the ray_analysis notebook equivalent).

    python examples/analyse_sweep.py --checkpoint_dir ./sweeps

Reads trial checkpoints written by training.tuning (trial_*.npz metadata) and
prints the leaderboard; with --plot writes a val-accuracy histogram.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import glob
import json
import os

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint_dir", default="./sweeps")
    p.add_argument("--plot", default=None)
    args = p.parse_args()

    rows = []
    for path in sorted(glob.glob(os.path.join(args.checkpoint_dir,
                                              "trial_*.npz"))):
        with np.load(path) as f:
            meta = (json.loads(bytes(f["__meta__"]).decode())
                    if "__meta__" in f else {})
        rows.append((os.path.basename(path), meta.get("val_acc", float("nan"))))
    rows.sort(key=lambda r: -(r[1] if r[1] == r[1] else -1))

    print("| trial | best val acc |")
    print("|---|---|")
    for name, va in rows:
        print(f"| {name} | {va:.4f} |")
    if not rows:
        print("(no trial checkpoints found)")
        return
    vals = np.array([v for _, v in rows if v == v])
    print(f"\nn={len(vals)} mean={vals.mean():.4f} best={vals.max():.4f}")

    if args.plot:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig, ax = plt.subplots()
        ax.hist(vals, bins=min(20, max(3, len(vals))))
        ax.set_xlabel("best val accuracy")
        ax.set_ylabel("trials")
        fig.savefig(args.plot, bbox_inches="tight")
        print(f"wrote {args.plot}")


if __name__ == "__main__":
    main()
