"""Probe 18 — bisect the Pubmed vs_torch gap (round-5 table's one EXCEEDS row).

Round-5 n=5 table: jax 0.4864±0.0111 vs torch 0.4474±0.0027 (test), gap
0.039 > 2·SEM bar 0.0228, jax ABOVE torch, jax std 4× torch's. The
loss-parity harness (tests/test_torch_training_parity.py) proves per-epoch
loss parity at the Pubmed axes (cosine_sim, heads=1, squareplus, adamax)
from IDENTICAL weights — so forward, gradient and optimizer are exact, and
the systematic gap can only enter through the stochastic streams: the
encoder/decoder init draw (each side draws its own torch-uniform sample)
or the dropout masks (input_dropout=0.5, dropout=0.072).

This probe re-runs the exact vs_torch Pubmed protocol (euler-13 grid,
reference split per rep, best-val selection, 50 epochs) but feeds the
TORCH oracle the JAX side's exact init weights (reproduce.torch_replica_run
init_w hook), so the init axis is held fixed and only dropout streams
differ. Interpretation:
  * matched-init gap ~0  -> the published gap is init-draw realization on a
    chaotic config (benign: same distribution, different basins);
  * matched-init gap persists -> dropout-stream semantics differ somewhere
    (a real defect; bisect further with dropout off).

Ref protocol: run_GNN.py:215-279; Pubmed config best_params.py:3.
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")        # run from the repo root

import jax
import jax.numpy as jnp

from graph_neural_pde_tpu.config import best_params
from graph_neural_pde_tpu.data.datasets import (get_dataset,
                                                set_train_val_test_split)
from graph_neural_pde_tpu.run import select_model
from graph_neural_pde_tpu.training.train import Trainer
from reproduce import torch_replica_run

REPS = 5
EPOCHS = 50
SEED = 0


def main():
    cfg = best_params["Pubmed"].replace(epoch=EPOCHS)
    steps = max(4, int(round(float(cfg.time))))
    cfg = cfg.replace(no_early=True, method="euler",
                      step_size=float(cfg.time) / steps, adjoint=False)
    dataset = get_dataset(cfg, "./data", use_lcc=cfg.not_lcc)

    rows = []
    for rep in range(REPS):
        y_np = np.asarray(dataset.y)
        tm, vm, sm = set_train_val_test_split(SEED + rep, y_np, 1500)
        dataset.train_mask = jnp.asarray(tm)
        dataset.val_mask = jnp.asarray(vm)
        dataset.test_mask = jnp.asarray(sm)
        model = select_model(cfg, dataset.num_features, dataset.num_classes,
                             dataset.graph, pos_enc_dim=cfg.pos_enc_dim)
        trainer = Trainer(model)

        # replicate fit()'s key derivation so the jax run below is step-for-
        # step identical to the published reproduce.py run at this seed
        key = jax.random.PRNGKey(SEED + rep)
        k_init, key = jax.random.split(key)
        params, state = model.init(k_init)
        init_w = {
            "m1_w": params["m1"]["w"], "m1_b": params["m1"]["b"],
            "m2_w": params["m2"]["w"], "m2_b": params["m2"]["b"],
        }
        carry = {"params": params, "state": state,
                 "opt_state": trainer.optimizer.init(params), "key": key,
                 "epoch": 1,
                 "best": {"val_acc": 0.0, "test_acc": 0.0, "train_acc": 0.0,
                          "epoch": 0}}

        t0 = time.time()
        _, _, best, _ = trainer.fit(dataset, seed=SEED + rep, verbose=False,
                                    carry=carry)
        jv, jt = best["val_acc"], best["test_acc"]
        tj = time.time() - t0

        t0 = time.time()
        tv, tt = torch_replica_run(
            cfg, dataset,
            (dataset.train_mask, dataset.val_mask, dataset.test_mask),
            SEED + rep, EPOCHS, init_w=init_w)
        tt_s = time.time() - t0
        rows.append((jv, jt, tv, tt))
        print(f"rep {rep}: jax val {jv:.4f} test {jt:.4f} ({tj:.0f}s) | "
              f"torch[jax-init] val {tv:.4f} test {tt:.4f} ({tt_s:.0f}s)",
              flush=True)

    jt_arr = np.array([r[1] for r in rows])
    tt_arr = np.array([r[3] for r in rows])
    gap = abs(jt_arr.mean() - tt_arr.mean())
    sem = np.sqrt(jt_arr.std(ddof=1) ** 2 / REPS
                  + tt_arr.std(ddof=1) ** 2 / REPS)
    print(f"\nmatched-init test acc: jax {jt_arr.mean():.4f}"
          f"±{jt_arr.std(ddof=1)/np.sqrt(REPS):.4f} "
          f"torch {tt_arr.mean():.4f}±{tt_arr.std(ddof=1)/np.sqrt(REPS):.4f} "
          f"gap {gap:.4f} vs 2·SEM bar {2*sem:.4f} "
          f"({'within' if gap <= 2*sem else 'EXCEEDS'})")


if __name__ == "__main__":
    main()
