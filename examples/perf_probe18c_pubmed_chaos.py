"""Probe 18c — prove the Pubmed config is chaotic using the torch oracle
against ITSELF (no jax involved).

Probe 18b showed: identical-weights loss distributions match under
dropout (gap 1e-4), epoch-0 deterministic forward matches to 2.4e-4, yet
deterministic trajectories separate from the FIRST adamax step onward.
Mechanism hypothesis: the reference initialises Q=K to the 1e-5 constant
(function_transformer_attention.py:126), which collapses every head
vector to c_i·ones with c_i = 1e-5·Σ_h x0[i,h]; cosine_sim then returns
exactly sign(c_i)·sign(c_j) ∈ {±1}, adamax's first update is
lr·sign(gradient) elementwise (u₁ = |g₁|), and the euler-13 rollout at
dt≈1 feeds any flipped component back through 13 more sign functions —
i.e. the loss trajectory is a sign function of f32 rounding noise, and
ANY two IEEE implementations (or the same one with a different BLAS
accumulation order) separate at the observed rate.

Test: run the torch oracle twice from identical weights, deterministic
config (dropout off), with run B perturbing ONE weight by 1e-6. If the
A/B loss separation matches the jax-vs-torch separation profile from
probe 18b, the divergence is chaos intrinsic to the config on this
stand-in, not a framework difference.
"""

import sys

import numpy as np

sys.path.insert(0, ".")

import jax  # noqa: F401  (keeps platform init consistent with 18b)

from graph_neural_pde_tpu.config import best_params
from graph_neural_pde_tpu.data.datasets import (get_dataset,
                                                set_train_val_test_split)

SEED = 0
EPOCHS = 10


def main():
    import jax.numpy as jnp
    import torch

    from reproduce import torch_replica_run

    cfg = best_params["Pubmed"]
    steps = max(4, int(round(float(cfg.time))))
    cfg = cfg.replace(no_early=True, method="euler",
                      step_size=float(cfg.time) / steps, adjoint=False,
                      input_dropout=0.0, dropout=0.0, epoch=EPOCHS + 1)
    dataset = get_dataset(cfg, "./data", use_lcc=cfg.not_lcc)
    y_np = np.asarray(dataset.y)
    tm, vm, sm = set_train_val_test_split(SEED, y_np, 1500)
    dataset.train_mask = jnp.asarray(tm)
    dataset.val_mask = jnp.asarray(vm)
    dataset.test_mask = jnp.asarray(sm)

    rng = np.random.default_rng(3)
    F, HID = dataset.num_features, cfg.hidden_dim
    C = dataset.num_classes
    b1, b2 = 1.0 / np.sqrt(F), 1.0 / np.sqrt(HID)
    base = {
        "m1_w": rng.uniform(-b1, b1, (F, HID)).astype(np.float32),
        "m1_b": rng.uniform(-b1, b1, HID).astype(np.float32),
        "m2_w": rng.uniform(-b2, b2, (HID, C)).astype(np.float32),
        "m2_b": rng.uniform(-b2, b2, C).astype(np.float32),
    }
    pert = {k: v.copy() for k, v in base.items()}
    pert["m1_w"][0, 0] += 1e-6

    def run(init_w):
        rec = []
        orig = torch.nn.functional.cross_entropy

        def recording_ce(inp, tgt, *a, **k):
            out = orig(inp, tgt, *a, **k)
            if inp.requires_grad:
                rec.append(float(out))
            return out

        torch.nn.functional.cross_entropy = recording_ce
        try:
            torch_replica_run(cfg, dataset,
                              (dataset.train_mask, dataset.val_mask,
                               dataset.test_mask),
                              SEED, EPOCHS, init_w=init_w)
        finally:
            torch.nn.functional.cross_entropy = orig
        return rec

    la = run(base)
    lb = run(pert)
    print("epoch | torch A loss | torch A+1e-6 loss |   |diff|")
    for e, (a, b) in enumerate(zip(la, lb)):
        print(f"{e:5d} | {a:12.6f} | {b:17.6f} | {abs(a-b):9.2e}")
    worst = max(abs(a - b) / max(1.0, abs(a)) for a, b in zip(la, lb))
    print(f"worst relative A/B separation under a 1e-6 single-weight "
          f"perturbation: {worst:.2e} "
          f"({'CHAOTIC' if worst > 1e-2 else 'stable'})")


if __name__ == "__main__":
    main()
