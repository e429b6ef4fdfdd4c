"""Cora-collapse cross-check: the independent TORCH replica on the SAME
synthetic stand-in with the SAME tuned hyperparameters.

If the torch reimplementation of the reference semantics (GRAND-l: frozen
squareplus attention over norm_idx=1, laplacian RHS, adamax + coupled decay,
tuned lr 0.0229) shows the same bimodal collapse across seeds on the SBM
stand-in, the round-2 Cora reproduction variance is a property of the
stand-in's loss landscape under the tuned (real-Cora) hyperparameters —
not a defect of this framework's solver or gradients.

Run: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python examples/diag_cora_torch.py
"""

import math
import sys

import numpy as np
import torch

sys.path.insert(0, "/root/repo")

from graph_neural_pde_tpu.config import best_params  # noqa: E402
from graph_neural_pde_tpu.data.datasets import (  # noqa: E402
    get_dataset, set_train_val_test_split)

cfg = best_params["Cora"]
HID, ATT, HEADS = cfg.hidden_dim, cfg.attention_dim, cfg.heads
STEPS = 18                      # euler grid ~ dopri5 trajectory, dt ~ 1


def torch_squareplus_by(src, idx, n):
    out = src - src.max()
    out = (out + torch.sqrt(out ** 2 + 4)) / 2
    den = torch.zeros((n, src.shape[1])).index_add(0, idx, out)
    return out / (den[idx] + 1e-16)


def train_rep(rep, ds, epochs=20):
    N = int(ds.x.shape[0])
    F = int(ds.x.shape[1])
    C = ds.num_classes
    y_np = np.asarray(ds.y)
    tm, vm, sm = set_train_val_test_split(rep, y_np, 1500)
    row = np.asarray(ds.graph.row)[np.asarray(ds.graph.mask)]
    col = np.asarray(ds.graph.col)[np.asarray(ds.graph.mask)]
    edge = torch.tensor(np.stack([row, col]).astype(np.int64))
    xt = torch.tensor(np.asarray(ds.x))
    yt = torch.tensor(y_np.astype(np.int64))
    mt = torch.tensor(tm)
    vmask = torch.tensor(vm)

    g = torch.Generator().manual_seed(rep)
    p = {
        "m1_w": torch.empty(F, HID).uniform_(
            -1 / math.sqrt(F), 1 / math.sqrt(F), generator=g
        ).requires_grad_(),
        "m1_b": torch.zeros(HID, requires_grad=True),
        "Q_w": (1e-5 * torch.ones(HID, ATT)).requires_grad_(),
        "Q_b": torch.zeros(ATT, requires_grad=True),
        "K_w": (1e-5 * torch.ones(HID, ATT)).requires_grad_(),
        "K_b": torch.zeros(ATT, requires_grad=True),
        "m2_w": torch.empty(HID, C).uniform_(
            -1 / math.sqrt(HID), 1 / math.sqrt(HID), generator=g
        ).requires_grad_(),
        "m2_b": torch.zeros(C, requires_grad=True),
        "alpha": torch.zeros((), requires_grad=True),
        "beta": torch.zeros((), requires_grad=True),
    }
    opt = torch.optim.Adamax(list(p.values()), lr=cfg.lr,
                             weight_decay=cfg.decay, betas=(0.9, 0.999),
                             eps=1e-8)
    h, d_k = HEADS, ATT // HEADS
    torch.manual_seed(rep)

    def forward(training):
        x0 = xt
        if training and cfg.input_dropout:
            x0 = torch.nn.functional.dropout(x0, cfg.input_dropout)
        x0 = x0 @ p["m1_w"] + p["m1_b"]
        x0_det = x0.detach()
        alpha = torch.sigmoid(p["alpha"])
        q = (x0 @ p["Q_w"] + p["Q_b"]).view(-1, h, d_k)
        k = (x0 @ p["K_w"] + p["K_b"]).view(-1, h, d_k)
        prods = (q[edge[0]] * k[edge[1]]).sum(-1) / math.sqrt(d_k)
        att = torch_squareplus_by(prods, edge[cfg.attention_norm_idx], N)
        mean_att = att.mean(dim=1)
        yy = x0
        dt = cfg.time / STEPS
        for _ in range(STEPS):
            ax = torch.zeros_like(yy).index_add(
                0, edge[0], mean_att[:, None] * yy[edge[1]])
            yy = yy + dt * (alpha * (ax - yy) + p["beta"] * x0_det)
        z = torch.relu(yy)
        if training and cfg.dropout:
            z = torch.nn.functional.dropout(z, cfg.dropout)
        return z @ p["m2_w"] + p["m2_b"]

    for ep in range(1, epochs + 1):
        opt.zero_grad()
        loss = torch.nn.functional.cross_entropy(forward(True)[mt], yt[mt])
        loss.backward()
        opt.step()
        with torch.no_grad():
            logits = forward(False)
            va = float((logits[vmask].argmax(1) == yt[vmask]).float().mean())
        if ep % 2 == 1:
            print(f"rep {rep} ep {ep:3d}: loss {float(loss):8.4f} "
                  f"val {va:.3f} alpha {float(p['alpha']):.3f}", flush=True)
    return va


def main():
    ds = get_dataset(cfg, "/tmp/nodata", use_lcc=cfg.not_lcc)
    finals = []
    for rep in range(5):
        print(f"=== rep {rep} ===", flush=True)
        finals.append(train_rep(rep, ds))
    print("final vals:", [f"{v:.3f}" for v in finals])


if __name__ == "__main__":
    main()
