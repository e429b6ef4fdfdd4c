"""Probe 18b — localize the Pubmed vs_torch gap to a stochastic axis.

Probe 18 showed the gap persists with MATCHED init (torch consuming the
jax init draw), and the extended loss-parity harness proves exact
per-epoch parity at the Pubmed axes with dropout off — so the two
remaining hypotheses are (a) a full-scale deterministic divergence the
tiny harness graph cannot expose (edge-set / self-loop / f32-accumulation
effects at N=19717), or (b) a dropout-semantics difference.

Two experiments, both at the exact Pubmed stand-in + tuned config:

  1. matched init, input_dropout=0, dropout=0, 10 epochs: per-epoch
     losses from both frameworks printed side by side. Any deterministic
     difference shows here immediately (epoch-1 loss = data/graph/init
     plumbing; later epochs = optimizer trajectory).
  2. identical weights, training-mode LOSS DISTRIBUTION under dropout:
     K samples of the masked train loss on each side (fresh masks per
     sample, no optimizer). If the two Monte-Carlo distributions differ
     in mean beyond joint SEM, the dropout semantics differ; re-run with
     each dropout zeroed separately to localize input vs decoder.

Ref: run_GNN.py:215-279 protocol; GNN.py:30 (input dropout), GNN.py:61-72
(decoder dropout); Pubmed config best_params.py:3.
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from graph_neural_pde_tpu.config import best_params
from graph_neural_pde_tpu.data.datasets import (get_dataset,
                                                set_train_val_test_split)
from graph_neural_pde_tpu.run import select_model
from graph_neural_pde_tpu.training.train import Trainer

SEED = 0


def build(cfg):
    dataset = get_dataset(cfg, "./data", use_lcc=cfg.not_lcc)
    y_np = np.asarray(dataset.y)
    tm, vm, sm = set_train_val_test_split(SEED, y_np, 1500)
    dataset.train_mask = jnp.asarray(tm)
    dataset.val_mask = jnp.asarray(vm)
    dataset.test_mask = jnp.asarray(sm)
    return dataset


def jax_losses(cfg, dataset, epochs):
    model = select_model(cfg, dataset.num_features, dataset.num_classes,
                         dataset.graph, pos_enc_dim=cfg.pos_enc_dim)
    trainer = Trainer(model)
    key = jax.random.PRNGKey(SEED)
    k_init, key = jax.random.split(key)
    params, state = model.init(k_init)
    init_w = {"m1_w": params["m1"]["w"], "m1_b": params["m1"]["b"],
              "m2_w": params["m2"]["w"], "m2_b": params["m2"]["b"]}
    opt_state = trainer.optimizer.init(params)
    losses = []
    for _ in range(epochs):
        key, k = jax.random.split(key)
        params, state, opt_state, loss, _ = trainer._train_step(
            params, state, opt_state, dataset.x, None, dataset.y,
            dataset.train_mask, k)
        losses.append(float(loss))
    return losses, init_w, model, params, state


def torch_losses(cfg, dataset, epochs, init_w):
    """Replay reproduce.torch_replica_run but return per-epoch losses."""
    import torch
    from reproduce import torch_replica_run  # noqa: F401  (init_w hook)
    # reuse the replica verbatim via a loss-capturing monkey monkeypatch-
    # free path: reimplementing the 20-line loop here would re-introduce
    # drift, so instead run the replica with a patched cross_entropy that
    # records train losses.
    rec = []
    orig = torch.nn.functional.cross_entropy

    def recording_ce(inp, tgt, *a, **k):
        out = orig(inp, tgt, *a, **k)
        if inp.requires_grad:          # train call, not the no_grad eval
            rec.append(float(out))
        return out

    torch.nn.functional.cross_entropy = recording_ce
    try:
        torch_replica_run(cfg, dataset,
                          (dataset.train_mask, dataset.val_mask,
                           dataset.test_mask),
                          SEED, epochs, init_w=init_w)
    finally:
        torch.nn.functional.cross_entropy = orig
    return rec


def loss_distribution_jax(cfg2, dataset, k_samples):
    """Training-mode masked loss at the INIT weights under fresh dropout
    masks: call the train step k times without keeping its updates (the
    returned loss is evaluated at the pre-update params)."""
    model2 = select_model(cfg2, dataset.num_features, dataset.num_classes,
                          dataset.graph, pos_enc_dim=cfg2.pos_enc_dim)
    trainer = Trainer(model2)
    k_init, _ = jax.random.split(jax.random.PRNGKey(SEED))
    params, state = model2.init(k_init)     # same m1/m2 draw as init_w
    opt_state = trainer.optimizer.init(params)
    vals = []
    key = jax.random.PRNGKey(123)
    for _ in range(k_samples):
        key, k = jax.random.split(key)
        _, _, _, loss, _ = trainer._train_step(
            params, state, opt_state, dataset.x, None, dataset.y,
            dataset.train_mask, k)
        vals.append(float(loss))
    return np.array(vals)


def main():
    cfg = best_params["Pubmed"]
    steps = max(4, int(round(float(cfg.time))))
    cfg = cfg.replace(no_early=True, method="euler",
                      step_size=float(cfg.time) / steps, adjoint=False)

    # ---- experiment 1: dropout OFF, matched init, deterministic ---------
    cfg0 = cfg.replace(input_dropout=0.0, dropout=0.0, epoch=11)
    dataset = build(cfg0)
    t0 = time.time()
    jl, init_w, model, params, state = jax_losses(cfg0, dataset, 10)
    print(f"jax deterministic 10 epochs ({time.time()-t0:.0f}s)", flush=True)
    t0 = time.time()
    tl = torch_losses(cfg0, dataset, 10, init_w)
    print(f"torch deterministic 10 epochs ({time.time()-t0:.0f}s)",
          flush=True)
    print("epoch |   jax loss |  torch loss |     |diff|")
    worst = 0.0
    for e, (a, b) in enumerate(zip(jl, tl)):
        worst = max(worst, abs(a - b) / max(1.0, abs(b)))
        print(f"{e:5d} | {a:10.6f} | {b:11.6f} | {abs(a-b):9.2e}")
    print(f"worst relative diff: {worst:.2e} "
          f"({'DETERMINISTIC PARITY' if worst < 5e-3 else 'DIVERGES'})",
          flush=True)

    # ---- experiment 2: loss distribution under dropout ------------------
    import torch
    from reproduce import torch_replica_run  # noqa: F401
    for label, over in (("both dropouts", {}),
                        ("input only", dict(dropout=0.0)),
                        ("decoder only", dict(input_dropout=0.0))):
        cfg2 = cfg.replace(epoch=2, **over)
        jd = loss_distribution_jax(cfg2, dataset, 32)

        # torch side: same weights, K fresh-mask train losses (epochs=K,
        # lr=0 so weights never move -> K iid samples of the same loss)
        rec = []
        orig = torch.nn.functional.cross_entropy

        def recording_ce(inp, tgt, *a, **k):
            out = orig(inp, tgt, *a, **k)
            if inp.requires_grad:
                rec.append(float(out))
            return out

        torch.nn.functional.cross_entropy = recording_ce
        try:
            torch_replica_run(cfg2.replace(lr=0.0, decay=0.0), dataset,
                              (dataset.train_mask, dataset.val_mask,
                               dataset.test_mask),
                              SEED, 32, init_w=init_w)
        finally:
            torch.nn.functional.cross_entropy = orig
        td = np.array(rec)
        sem = np.sqrt(jd.std(ddof=1) ** 2 / len(jd)
                      + td.std(ddof=1) ** 2 / len(td))
        gap = abs(jd.mean() - td.mean())
        print(f"[{label}] train-loss dist @identical weights: "
              f"jax {jd.mean():.4f}±{jd.std(ddof=1):.4f} "
              f"torch {td.mean():.4f}±{td.std(ddof=1):.4f} "
              f"gap {gap:.4f} vs 2·SEM {2*sem:.4f} "
              f"({'match' if gap <= 2*sem else 'DIFFER'})", flush=True)


if __name__ == "__main__":
    main()
