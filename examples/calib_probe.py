"""Stand-in calibration probe (round 5): torch-replica-only accuracy on the
synthetic SBM stand-ins, per dataset row.

The full reproduce.py --vs_torch run owns the host's single CPU core for
hours; this probe answers the only question that gates launching it — does
each row's stand-in land in the 0.35-0.90 discriminative band under the
shipped calibration (sqrt(log C) feature term + constant intra-edge-fraction
homophily)? The torch replica tracks the jax side to within the run-to-run
CI (reproduce_results.json, rounds 3-4), so one torch run per row is a
sufficient band estimate at ~1/6 the cost of a jax+torch rep.

Usage: python examples/calib_probe.py Pubmed CoauthorCS ogbn-arxiv --epochs 50
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from reproduce import torch_replica_run  # noqa: E402
from graph_neural_pde_tpu.config import best_params  # noqa: E402
from graph_neural_pde_tpu.data.datasets import (  # noqa: E402
    get_dataset, set_train_val_test_split)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("datasets", nargs="+")
    p.add_argument("--epochs", type=int, default=50)
    p.add_argument("--data_dir", default="/tmp/nodata")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    for name in args.datasets:
        cfg = best_params[name].replace(no_early=True)
        ds = get_dataset(cfg, args.data_dir, use_lcc=cfg.not_lcc)
        if cfg.dataset in ("Cora", "Citeseer", "Pubmed") \
                and not cfg.planetoid_split:
            y_np = np.asarray(ds.y)
            tm, vm, sm = set_train_val_test_split(args.seed, y_np, 1500)
            masks = (tm, vm, sm)
        else:
            masks = (np.asarray(ds.train_mask), np.asarray(ds.val_mask),
                     np.asarray(ds.test_mask))
        t0 = time.time()
        val, test = torch_replica_run(cfg, ds, masks, args.seed, args.epochs)
        band = "in-band" if 0.35 <= test <= 0.90 else "OUT-OF-BAND"
        print(f"[calib] {name}: torch val {val:.4f} test {test:.4f} "
              f"({band}, {time.time()-t0:.0f}s, C={ds.num_classes}, "
              f"N={int(ds.x.shape[0])})", flush=True)


if __name__ == "__main__":
    main()
