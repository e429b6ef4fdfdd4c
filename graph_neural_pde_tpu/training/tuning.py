"""Hyperparameter sweeps: the Ray Tune replacement.

Re-designs /root/reference/src/ray_tune.py for a single-host TPU world:

  * per-dataset search spaces (set_search_space, ray_tune.py:203-544) as
    samplers over Config fields
  * trial execution = train over multiple random splits, reporting the mean
    validation metric (train_ray_rand, ray_tune.py:40-93), with per-trial
    best-model checkpoints and trial-failure tolerance (max_failures)
  * an ASHA-style successive-halving scheduler: trials run in rungs; at each
    rung the bottom (1 − 1/reduction_factor) fraction stops
  * replay of a finished sweep's best config over reps×splits with
    mean/sem/95%-CI aggregation (run_best_ray.py:13-74)

Trial parallelism: the reference spreads trials over fractional GPUs; on one
TPU chip trials run sequentially inside the same process (each trial is one
jit), and the sweep runner is deterministic given its seed.
"""

from __future__ import annotations

import json
import math
import os
import time
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional

import numpy as np

from graph_neural_pde_tpu.config import Config
from graph_neural_pde_tpu.data.synthetic import NodeDataset
from graph_neural_pde_tpu.utils.stats import aggregate_runs


# ---------------------------------------------------------------------------
# search spaces
# ---------------------------------------------------------------------------

def loguniform(lo, hi):
    return lambda rng: float(np.exp(rng.uniform(np.log(lo), np.log(hi))))


def uniform(lo, hi):
    return lambda rng: float(rng.uniform(lo, hi))


def choice(options):
    return lambda rng: options[int(rng.integers(len(options)))]


def set_search_space(dataset: str) -> Dict[str, Callable]:
    """Per-dataset sampler dict (semantics of ray_tune.py:203-544)."""
    common = {
        "decay": loguniform(1e-3, 1e-2),
        "lr": loguniform(1e-3, 0.1),
        "input_dropout": uniform(0.2, 0.8),
        "dropout": uniform(0.0, 0.8),
        "self_loop_weight": choice([0.0, 1.0]),
        "time": uniform(2.0, 30.0),
        "tol_scale": loguniform(1.0, 1e4),
        "optimizer": choice(["adam", "adamax", "rmsprop"]),
        "hidden_dim": choice([16, 32, 64, 80, 128]),
        "block": choice(["constant", "attention"]),
        "attention_type": choice(["scaled_dot", "cosine_sim", "exp_kernel"]),
        "heads": choice([1, 2, 4, 8]),
        "attention_norm_idx": choice([0, 1]),
        "square_plus": choice([True, False]),
        "add_source": choice([True, False]),
        "method": choice(["dopri5", "rk4"]),
    }
    if dataset in ("Computers", "Photo", "ogbn-arxiv"):
        common.update({
            "block": choice(["hard_attention"]),
            "att_samp_pct": uniform(0.5, 1.0),
            "adjoint": choice([True]),
            "adjoint_method": choice(["rk4", "adaptive_heun", "dopri5"]),
            "max_nfe": choice([500]),
        })
    return common


def sample_config(base: Config, space: Dict[str, Callable],
                  rng: np.random.Generator) -> Config:
    # attention_dim must stay divisible by heads
    cfg = base.replace(**{k: fn(rng) for k, fn in space.items()})
    if cfg.attention_dim % cfg.heads != 0:
        cfg = cfg.replace(attention_dim=cfg.heads *
                          max(1, cfg.attention_dim // cfg.heads))
    return cfg


# ---------------------------------------------------------------------------
# trials + ASHA
# ---------------------------------------------------------------------------

@dataclass
class Trial:
    idx: int
    cfg: Config
    val_acc: float = 0.0
    test_acc: float = 0.0
    train_acc: float = 0.0
    epochs_run: int = 0
    failed: bool = False
    error: str = ""


def _run_trial(cfg: Config, dataset: NodeDataset, epochs: int,
               num_splits: int, seed: int, checkpoint_dir: Optional[str],
               trial_idx: int) -> Dict[str, float]:
    """Train on num_splits random splits; return mean metrics
    (train_ray_rand semantics, ray_tune.py:40-93)."""
    import jax.numpy as jnp
    from graph_neural_pde_tpu.data.datasets import set_train_val_test_split
    from graph_neural_pde_tpu.models.gnn import GNNModel
    from graph_neural_pde_tpu.training.train import Trainer

    vals, tests, trains = [], [], []
    for split in range(num_splits):
        ds = dataset
        if num_splits > 1:
            y_np = np.asarray(dataset.y)
            tm, vm, sm = set_train_val_test_split(seed + split, y_np,
                                                  min(1500, len(y_np) // 2))
            import copy
            ds = copy.copy(dataset)
            ds.train_mask = jnp.asarray(tm)
            ds.val_mask = jnp.asarray(vm)
            ds.test_mask = jnp.asarray(sm)
        if cfg.no_early:
            model = GNNModel(cfg, ds.num_features, ds.num_classes, ds.graph)
        else:
            # in-integrator model selection inside trials (train_ray_int,
            # ray_tune.py:149-200)
            from graph_neural_pde_tpu.models.gnn_early import GNNEarlyModel
            model = GNNEarlyModel(cfg, ds.num_features, ds.num_classes,
                                  ds.graph)
        trainer = Trainer(model)
        params, state, best, _ = trainer.fit(ds, epochs=epochs,
                                             seed=seed + split,
                                             verbose=False)
        if not cfg.no_early:
            _, snap, _ = model.apply_early(
                params, state, ds.x, ds.y,
                (ds.train_mask, ds.val_mask, ds.test_mask))
            if float(snap.val) > best["val_acc"]:
                best = {"val_acc": float(snap.val),
                        "test_acc": float(snap.test),
                        "train_acc": float(snap.train)}
        vals.append(best["val_acc"])
        tests.append(best["test_acc"])
        trains.append(best["train_acc"])
        if checkpoint_dir is not None and split == 0:
            from graph_neural_pde_tpu.utils.checkpoint import save_checkpoint
            save_checkpoint(
                os.path.join(checkpoint_dir, f"trial_{trial_idx}.npz"),
                {"params": params, "state": state},
                metadata={"val_acc": best["val_acc"]})
    return {"accuracy": float(np.mean(vals)),
            "test_acc": float(np.mean(tests)),
            "train_acc": float(np.mean(trains))}


def run_sweep(base_cfg: Config, dataset: NodeDataset, *, num_samples: int = 16,
              max_epochs: int = 60, grace_period: int = 10,
              reduction_factor: int = 3, num_splits: int = 1, seed: int = 0,
              max_failures: int = 2, checkpoint_dir: Optional[str] = None,
              space: Optional[Dict[str, Callable]] = None,
              verbose: bool = True) -> List[Trial]:
    """ASHA successive halving over sampled configs.

    Rungs at grace_period · reduction_factor^k epochs; survivors = top
    1/reduction_factor by validation accuracy at each rung.
    """
    rng = np.random.default_rng(seed)
    space = space or set_search_space(base_cfg.dataset)
    trials = [Trial(i, sample_config(base_cfg, space, rng))
              for i in range(num_samples)]

    rungs = []
    e = grace_period
    while e < max_epochs:
        rungs.append(e)
        e *= reduction_factor
    rungs.append(max_epochs)

    alive = list(trials)
    for rung_epochs in rungs:
        for t in alive:
            fails = 0
            while True:
                try:
                    metrics = _run_trial(t.cfg, dataset, rung_epochs,
                                         num_splits, seed, checkpoint_dir,
                                         t.idx)
                    t.val_acc = metrics["accuracy"]
                    t.test_acc = metrics["test_acc"]
                    t.train_acc = metrics["train_acc"]
                    t.epochs_run = rung_epochs
                    break
                except Exception as ex:  # trial fault tolerance
                    fails += 1
                    if fails > max_failures:
                        t.failed = True
                        t.error = str(ex)[:500]
                        break
            if verbose:
                status = "FAILED" if t.failed else (
                    f"val {t.val_acc:.4f} test {t.test_acc:.4f}")
                print(f"[sweep] trial {t.idx:3d} @ {rung_epochs:3d} epochs: "
                      f"{status}")
        survivors = [t for t in alive if not t.failed]
        survivors.sort(key=lambda t: -t.val_acc)
        keep = max(1, math.ceil(len(survivors) / reduction_factor))
        alive = survivors[:keep]
        if rung_epochs >= max_epochs:
            break
    trials.sort(key=lambda t: -t.val_acc)
    return trials


def run_best(cfg: Config, dataset: NodeDataset, *, reps: int = 4,
             num_splits: int = 2, epochs: int = 100, seed: int = 0) -> dict:
    """Re-run a tuned config over reps×splits and aggregate
    (run_best_ray.py:13-74 semantics)."""
    vals, tests = [], []
    for rep in range(reps):
        m = _run_trial(cfg, dataset, epochs, num_splits, seed + 1000 * rep,
                       None, rep)
        vals.append(m["accuracy"])
        tests.append(m["test_acc"])
    return {"val": aggregate_runs(vals), "test": aggregate_runs(tests)}


def _main():
    """``python -m graph_neural_pde_tpu.training.tuning --dataset Cora``
    (ray_tune.py main equivalent)."""
    import argparse
    from graph_neural_pde_tpu.data.datasets import get_dataset

    p = argparse.ArgumentParser()
    p.add_argument("--dataset", default="Cora")
    p.add_argument("--data_dir", default="./data")
    p.add_argument("--num_samples", type=int, default=16)
    p.add_argument("--max_epochs", type=int, default=60)
    p.add_argument("--grace_period", type=int, default=10)
    p.add_argument("--reduction_factor", type=int, default=3)
    p.add_argument("--num_splits", type=int, default=1)
    p.add_argument("--checkpoint_dir", default="./sweeps")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    base = Config(dataset=args.dataset)
    ds = get_dataset(base, args.data_dir)
    trials = run_sweep(base, ds, num_samples=args.num_samples,
                       max_epochs=args.max_epochs,
                       grace_period=args.grace_period,
                       reduction_factor=args.reduction_factor,
                       num_splits=args.num_splits, seed=args.seed,
                       checkpoint_dir=args.checkpoint_dir)
    best = trials[0]
    print(f"\nbest trial {best.idx}: val {best.val_acc:.4f} "
          f"test {best.test_acc:.4f}")
    print(json.dumps({k: getattr(best.cfg, k) for k in
                      ("lr", "decay", "hidden_dim", "time", "block",
                       "attention_type", "method", "tol_scale")}, indent=2))
    out = run_best(best.cfg, ds, reps=2, num_splits=max(args.num_splits, 2),
                   epochs=args.max_epochs, seed=args.seed)
    print("replay:", json.dumps(out, indent=2))


if __name__ == "__main__":
    _main()
