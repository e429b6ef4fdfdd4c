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


def const(v):
    return lambda rng: v


def pow2(lo, hi):
    """2**randint(lo, hi) — the reference's tune.sample_from lambdas."""
    return lambda rng: int(2 ** rng.integers(lo, hi))


def _uses_attention(base: Config) -> bool:
    # the reference's branch condition (e.g. ray_tune.py:218)
    return (base.block in ("attention", "mixed")
            or base.function in ("GAT", "transformer"))


def _self_loop_mixed(base: Config):
    return (choice([0.0, 0.5, 1.0, 2.0]) if base.block == "mixed"
            else choice([0.0, 1.0]))


def set_search_space(base: Config, regularise: bool = False
                     ) -> Dict[str, Callable]:
    """Per-dataset sampler dicts, translated 1:1 from the reference's
    set_{cora,pubmed,citeseer,computers,coauthors,photo,arxiv}_search_space
    (/root/reference/src/ray_tune.py:203-544) including the attention /
    adjoint / gdc-rewiring conditional branches. Conditionals consult the
    *base* config, exactly as the reference consults the pre-sampled opt."""
    if isinstance(base, str):          # convenience: dataset name only
        base = Config(dataset=base)
    ds = base.dataset
    att = _uses_attention(base)
    s: Dict[str, Callable] = {}

    if ds == "Cora":
        s["decay"] = loguniform(1e-3, 0.1)
        if regularise:
            s["kinetic_energy"] = loguniform(1e-3, 10.0)
            s["directional_penalty"] = loguniform(1e-3, 10.0)
        s["hidden_dim"] = pow2(6, 8)
        s["lr"] = uniform(0.01, 0.2)
        s["input_dropout"] = const(0.5)
        s["optimizer"] = choice(["adam", "adamax"])
        s["dropout"] = uniform(0.0, 0.15)
        s["time"] = uniform(2.0, 30.0)
        if att:
            s["heads"] = pow2(0, 4)
            s["attention_dim"] = pow2(4, 8)
            s["attention_norm_idx"] = const(0)
            s["leaky_relu_slope"] = const(0.2)
            s["self_loop_weight"] = choice([0.0, 1.0])
        else:
            s["self_loop_weight"] = uniform(0.0, 3.0)
        s["tol_scale"] = loguniform(1.0, 1000.0)
        if base.adjoint:
            s["adjoint_method"] = choice(["dopri5", "adaptive_heun"])
            s["tol_scale_adjoint"] = loguniform(100.0, 10000.0)
        s["add_source"] = choice([True, False])
        s["att_samp_pct"] = uniform(0.3, 1.0)
        s["batch_norm"] = choice([True, False])
        if base.rewiring == "gdc":
            s["gdc_k"] = pow2(4, 10)
            s["ppr_alpha"] = uniform(0.01, 0.2)
    elif ds == "Pubmed":
        if not base.adjoint:
            raise ValueError(
                "Can't train on PubMed without the adjoint method.")
        s["decay"] = uniform(1e-3, 0.1)
        if regularise:
            s["kinetic_energy"] = loguniform(0.01, 1.0)
            s["directional_penalty"] = loguniform(0.01, 1.0)
        s["hidden_dim"] = const(128)
        s["lr"] = loguniform(0.02, 0.1)
        s["input_dropout"] = const(0.4)
        s["dropout"] = uniform(0.0, 0.5)
        s["time"] = uniform(5.0, 20.0)
        s["optimizer"] = choice(["rmsprop", "adam", "adamax"])
        if att:
            s["heads"] = pow2(0, 4)
            s["attention_dim"] = pow2(4, 8)
            s["attention_norm_idx"] = choice([0, 1])
            s["leaky_relu_slope"] = uniform(0.0, 0.8)
            s["self_loop_weight"] = _self_loop_mixed(base)
        else:
            s["self_loop_weight"] = uniform(0.0, 3.0)
        s["tol_scale"] = loguniform(1.0, 1e4)
        s["tol_scale_adjoint"] = loguniform(1.0, 1e4)
        s["adjoint_method"] = choice(["dopri5", "adaptive_heun"])
    elif ds == "Citeseer":
        s["decay"] = const(0.1)
        if regularise:
            s["kinetic_energy"] = loguniform(1e-3, 10.0)
            s["directional_penalty"] = loguniform(1e-3, 10.0)
        s["hidden_dim"] = const(128)
        s["lr"] = loguniform(2e-3, 0.01)
        s["input_dropout"] = uniform(0.4, 0.8)
        s["dropout"] = uniform(0.0, 0.8)
        s["time"] = uniform(0.5, 8.0)
        s["optimizer"] = choice(["rmsprop", "adam", "adamax"])
        if att:
            s["heads"] = pow2(1, 4)
            s["attention_dim"] = pow2(3, 8)
            s["attention_norm_idx"] = const(1)
            s["leaky_relu_slope"] = uniform(0.0, 0.7)
            s["self_loop_weight"] = _self_loop_mixed(base)
        else:
            s["self_loop_weight"] = uniform(0.0, 3.0)
        s["tol_scale"] = loguniform(1.0, 2e3)
        if base.adjoint:
            s["tol_scale_adjoint"] = loguniform(1.0, 1e5)
            s["adjoint_method"] = choice(["dopri5", "adaptive_heun"])
        if base.rewiring == "gdc":
            s["gdc_sparsification"] = const("topk")
            s["gdc_method"] = choice(["ppr", "heat"])
            s["gdc_k"] = pow2(4, 8)
            s["ppr_alpha"] = uniform(0.01, 0.2)
            s["heat_time"] = uniform(1.0, 5.0)
    elif ds in ("Computers", "CoauthorCS"):
        if ds == "Computers":
            s["decay"] = loguniform(2e-3, 1e-2)
            s["lr"] = loguniform(5e-5, 5e-3)
            s["hidden_dim"] = pow2(4, 8)
            reg_lo = 0.01
        else:
            s["decay"] = loguniform(1e-3, 2e-2)
            s["lr"] = loguniform(1e-5, 0.1)
            s["hidden_dim"] = pow2(4, 6)
            reg_lo = 0.01
        if regularise:
            s["kinetic_energy"] = loguniform(reg_lo, 10.0)
            s["directional_penalty"] = loguniform(
                1e-3 if ds == "Computers" else 0.01, 10.0)
        s["input_dropout"] = uniform(0.4, 0.8)
        s["dropout"] = uniform(0.0, 0.8)
        s["self_loop_weight"] = choice([0.0, 1.0])
        s["time"] = uniform(0.5, 10.0)
        s["optimizer"] = choice(["adam", "adamax", "rmsprop"])
        if att:
            s["heads"] = pow2(0, 4)
            s["attention_dim"] = pow2(3, 8)
            s["attention_norm_idx"] = (const(1) if ds == "Computers"
                                       else choice([0, 1]))
            s["leaky_relu_slope"] = uniform(0.0, 0.8)
            s["self_loop_weight"] = _self_loop_mixed(base)
        else:
            s["self_loop_weight"] = uniform(0.0, 3.0)
        s["tol_scale"] = loguniform(1e1, 1e4)
        if base.adjoint:
            s["tol_scale_adjoint"] = loguniform(1.0, 1e5)
            s["adjoint_method"] = choice(["dopri5", "adaptive_heun", "rk4"])
        if base.rewiring == "gdc":
            s["gdc_sparsification"] = const("threshold")
            s["exact"] = const(False)
            s["gdc_method"] = const("ppr")
            if ds == "Computers":
                s["gdc_threshold"] = loguniform(1e-5, 1e-2)
                s["ppr_alpha"] = uniform(0.01, 0.2)
            else:
                s["gdc_threshold"] = loguniform(1e-4, 5e-4)
                s["ppr_alpha"] = uniform(0.1, 0.25)
    elif ds == "Photo":
        s["decay"] = loguniform(1e-3, 1e-2)
        if regularise:
            s["kinetic_energy"] = loguniform(0.01, 5.0)
            s["directional_penalty"] = loguniform(1e-3, 10.0)
        s["hidden_dim"] = pow2(3, 7)
        s["lr"] = loguniform(1e-3, 0.1)
        s["input_dropout"] = uniform(0.4, 0.8)
        s["dropout"] = uniform(0.0, 0.8)
        s["time"] = uniform(0.5, 7.0)
        s["optimizer"] = choice(["adam", "adamax", "rmsprop"])
        if att:
            s["heads"] = pow2(0, 3)
            s["attention_dim"] = pow2(3, 6)
            s["attention_norm_idx"] = choice([0, 1])
            s["self_loop_weight"] = _self_loop_mixed(base)
            s["leaky_relu_slope"] = uniform(0.0, 0.8)
        else:
            s["self_loop_weight"] = uniform(0.0, 3.0)
        s["tol_scale"] = loguniform(100.0, 1e5)
        if base.adjoint:
            s["tol_scale_adjoint"] = loguniform(100.0, 1e5)
            s["adjoint_method"] = choice(["dopri5", "adaptive_heun"])
        if base.rewiring == "gdc":
            s["gdc_sparsification"] = const("threshold")
            s["exact"] = const(False)
            s["gdc_method"] = const("ppr")
            s["gdc_threshold"] = loguniform(1e-4, 5e-4)
            s["ppr_alpha"] = uniform(0.1, 0.25)
    elif ds == "ogbn-arxiv":
        # the reference's arxiv space fixes decay=0 and leaves everything
        # else at the (best-params) base — its whole body is commented out
        # (ray_tune.py:479-544)
        s["decay"] = const(0.0)
    else:
        # datasets the reference never tuned: a generic space
        s = {
            "decay": loguniform(1e-3, 1e-2),
            "lr": loguniform(1e-3, 0.1),
            "input_dropout": uniform(0.2, 0.8),
            "dropout": uniform(0.0, 0.8),
            "self_loop_weight": choice([0.0, 1.0]),
            "time": uniform(2.0, 30.0),
            "tol_scale": loguniform(1.0, 1e4),
            "optimizer": choice(["adam", "adamax", "rmsprop"]),
            "hidden_dim": choice([16, 32, 64, 80, 128]),
            "heads": choice([1, 2, 4, 8]),
            "square_plus": choice([True, False]),
            "add_source": choice([True, False]),
        }
    return s


def cgnn_space(base: Config) -> Dict[str, Callable]:
    """CGNN's ray path replays the hand-tuned per-dataset config over random
    splits (tune.run with scheduler=None, num_samples=num_splits,
    CGNN.py:409-428) — so the 'space' is the tuned constants; trial-to-trial
    variation comes from the split/seed, exactly as in the reference."""
    from graph_neural_pde_tpu.models.cgnn import cgnn_best_params
    tuned = cgnn_best_params.get(base.dataset, {})
    return {k: const(v) for k, v in tuned.items()}


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
    # per-split training carry for warm rung resume (params/opt state/rng);
    # dropped when the trial is culled
    carries: dict = field(default_factory=dict)


def _run_trial(cfg: Config, dataset: NodeDataset, epochs: int,
               num_splits: int, seed: int, checkpoint_dir: Optional[str],
               trial_idx: int, carries: Optional[dict] = None,
               model: str = "gnn") -> Dict[str, float]:
    """Train on num_splits random splits; return mean metrics
    (train_ray_rand semantics, ray_tune.py:40-93).

    ``carries`` (mutated in place) holds per-split training state so a trial
    surviving to a later ASHA rung *resumes* instead of retraining from
    scratch — the reference restores per-trial torch checkpoints the same way
    (ray_tune.py:128-134).

    ``model``: 'gnn' (GNN/GNNEarly by cfg.no_early) or 'cgnn' — the CGNN
    baseline's own ray path (train_ray/train_ray_icml, CGNN.py:336-428)
    drives the CGNN model through the same trial machinery."""
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
        if model == "cgnn":
            from graph_neural_pde_tpu.models.cgnn import CGNNModel
            model_obj = CGNNModel(cfg, ds.num_features, ds.num_classes,
                                  ds.graph)
        elif cfg.no_early:
            model_obj = GNNModel(cfg, ds.num_features, ds.num_classes,
                                 ds.graph)
        else:
            # in-integrator model selection inside trials (train_ray_int,
            # ray_tune.py:149-200)
            from graph_neural_pde_tpu.models.gnn_early import GNNEarlyModel
            model_obj = GNNEarlyModel(cfg, ds.num_features, ds.num_classes,
                                      ds.graph)
        trainer = Trainer(model_obj)
        carry = carries.get(split) if carries is not None else None
        params, state, best, _, carry = trainer.fit(
            ds, epochs=epochs, seed=seed + split, verbose=False,
            carry=carry, return_carry=True)
        if carries is not None:
            carries[split] = carry
        if not cfg.no_early and model != "cgnn":
            _, snap, _ = model_obj.apply_early(
                params, state, ds.x, ds.y,
                (ds.train_mask, ds.val_mask, ds.test_mask))
            if float(snap.val) > best["val_acc"]:
                best = {"val_acc": float(snap.val),
                        "test_acc": float(snap.test),
                        "train_acc": float(snap.train)}
                if carries is not None:
                    carries[split]["best"] = dict(best)
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
              model: str = "gnn", verbose: bool = True) -> List[Trial]:
    """ASHA successive halving over sampled configs.

    Rungs at grace_period · reduction_factor^k epochs; survivors = top
    1/reduction_factor by validation accuracy at each rung.
    """
    rng = np.random.default_rng(seed)
    if space is None:
        space = (cgnn_space(base_cfg) if model == "cgnn"
                 else set_search_space(base_cfg))
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
                                         t.idx, carries=t.carries,
                                         model=model)
                    t.val_acc = metrics["accuracy"]
                    t.test_acc = metrics["test_acc"]
                    t.train_acc = metrics["train_acc"]
                    t.epochs_run = rung_epochs
                    break
                except Exception as ex:  # trial fault tolerance
                    fails += 1
                    t.carries.clear()   # retry from scratch, not partial state
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
        for t in survivors[keep:]:
            t.carries.clear()          # culled: free the training state
        alive = survivors[:keep]
        if rung_epochs >= max_epochs:
            break
    trials.sort(key=lambda t: -t.val_acc)
    return trials


def run_best(cfg: Config, dataset: NodeDataset, *, reps: int = 4,
             num_splits: int = 2, epochs: int = 100, seed: int = 0,
             model: str = "gnn") -> dict:
    """Re-run a tuned config over reps×splits and aggregate
    (run_best_ray.py:13-74 semantics; model='cgnn' covers CGNN's
    run_best_params replay, CGNN.py:409-437)."""
    vals, tests = [], []
    for rep in range(reps):
        m = _run_trial(cfg, dataset, epochs, num_splits, seed + 1000 * rep,
                       None, rep, model=model)
        vals.append(m["accuracy"])
        tests.append(m["test_acc"])
    return {"val": aggregate_runs(vals), "test": aggregate_runs(tests)}


def _main():
    """``python -m graph_neural_pde_tpu.training.tuning --dataset Cora``
    (ray_tune.py main equivalent)."""
    import argparse
    from graph_neural_pde_tpu.data.datasets import get_dataset
    from graph_neural_pde_tpu.utils.compile_cache import (
        enable_persistent_cache)
    enable_persistent_cache()

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
    p.add_argument("--adjoint", action="store_true",
                   help="sweep adjoint-gradient configs (required for the "
                        "Pubmed space, ray_tune.py:280)")
    p.add_argument("--block", default=None)
    p.add_argument("--function", default=None)
    p.add_argument("--rewiring", default=None)
    p.add_argument("--model", default="gnn", choices=("gnn", "cgnn"),
                   help="cgnn = the CGNN baseline's own ray path "
                        "(CGNN.py:336-428): tuned config over random splits")
    args = p.parse_args()

    over = {k: v for k, v in (("adjoint", args.adjoint or None),
                              ("block", args.block),
                              ("function", args.function),
                              ("rewiring", args.rewiring)) if v is not None}
    base = Config(dataset=args.dataset, **over)
    ds = get_dataset(base, args.data_dir)
    trials = run_sweep(base, ds, num_samples=args.num_samples,
                       max_epochs=args.max_epochs,
                       grace_period=args.grace_period,
                       reduction_factor=args.reduction_factor,
                       num_splits=args.num_splits, seed=args.seed,
                       checkpoint_dir=args.checkpoint_dir, model=args.model)
    best = trials[0]
    print(f"\nbest trial {best.idx}: val {best.val_acc:.4f} "
          f"test {best.test_acc:.4f}")
    print(json.dumps({k: getattr(best.cfg, k) for k in
                      ("lr", "decay", "hidden_dim", "time", "block",
                       "attention_type", "method", "tol_scale")}, indent=2))
    out = run_best(best.cfg, ds, reps=2, num_splits=max(args.num_splits, 2),
                   epochs=args.max_epochs, seed=args.seed, model=args.model)
    print("replay:", json.dumps(out, indent=2))


if __name__ == "__main__":
    _main()
