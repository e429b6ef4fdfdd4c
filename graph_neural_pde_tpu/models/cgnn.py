"""CGNN baseline (Continuous Graph Neural Networks, Xhonneux et al. ICML'20).

Re-design of the reference's self-contained reimplementation
(/root/reference/src/CGNN.py:67-169): always-augmented encoder, RHS
``dx/dt = σ(α)·½·(Âx − x) + x₀`` with a *per-node* learnable α vector over a
symmetric gcn-normalised adjacency, default dopri5 tolerances, linear decode.
Per-dataset hand-tuned configs of CGNN.py:170-266 included.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from graph_neural_pde_tpu.config import Config
from graph_neural_pde_tpu.models.layers import dropout, linear_apply, linear_init
from graph_neural_pde_tpu.ops.graph import Graph, gcn_norm_fill_val
from graph_neural_pde_tpu.ops.spmm import spmm
from graph_neural_pde_tpu.solvers.api import SolverOptions, odeint

# CGNN.py:170-266 (the num_splits>0 branch)
cgnn_best_params = {
    "Cora": dict(hidden_dim=16, input_dropout=0.5, dropout=0.0,
                 optimizer="rmsprop", decay=5e-4, lr=0.00147,
                 self_loop_weight=0.595, alpha=0.885, time=23.9, epoch=100,
                 augment=True),
    "Citeseer": dict(hidden_dim=16, input_dropout=0.5, dropout=0.0,
                     optimizer="rmsprop", decay=5e-4, lr=0.00298,
                     self_loop_weight=0.459, alpha=0.936, time=17.1,
                     epoch=100, augment=True),
    "Pubmed": dict(hidden_dim=16, input_dropout=0.5, dropout=0.0,
                   optimizer="adam", decay=5e-4, lr=0.00551,
                   self_loop_weight=0.752, alpha=0.947, time=22.0, epoch=100,
                   augment=True),
}


class CGNNModel:
    """Always-augmented continuous GNN with per-node α (CGNN.py:73-169)."""

    def __init__(self, cfg: Config, num_features: int, num_classes: int,
                 graph: Graph):
        self.cfg = cfg
        self.num_features = num_features
        self.num_classes = num_classes
        # symmetric normalisation (get_sym_adj, CGNN.py:280-284 / utils.py:86-91)
        self.graph = gcn_norm_fill_val(graph, fill_value=cfg.self_loop_weight)

    def init(self, key):
        cfg = self.cfg
        k1, k2 = jax.random.split(key)
        params = {
            "m1": linear_init(k1, self.num_features, cfg.hidden_dim),
            "m2": linear_init(k2, cfg.hidden_dim, self.num_classes),
            # per-node alpha initialised to cfg.alpha (CGNN.py:84-85)
            "alpha_train": cfg.alpha * jnp.ones((self.graph.num_nodes,)),
        }
        return params, {}

    def apply(self, params, state, x, pos_encoding=None, training=False,
              rng: Optional[jax.Array] = None, graph: Optional[Graph] = None):
        cfg = self.cfg
        if rng is None:
            rng = jax.random.PRNGKey(0)
        k1, k2 = jax.random.split(rng)
        g = graph if graph is not None else self.graph

        x = dropout(k1, x, cfg.input_dropout, training)
        x = linear_apply(params["m1"], x)
        x = jnp.concatenate([x, jnp.zeros_like(x)], axis=1)   # always augment
        x0 = jax.lax.stop_gradient(x)

        def rhs(p, t, y):
            alph = jax.nn.sigmoid(p["alpha"])[:, None]
            ax = spmm(g, y)
            return alph * 0.5 * (ax - y) + p["x0"]

        # default torchdiffeq tolerances (odeint with no atol/rtol, CGNN.py:111)
        opts = SolverOptions(method="dopri5", rtol=1e-7, atol=1e-9,
                             max_steps=max(cfg.max_nfe // 6, 4))
        z, stats = odeint(rhs, {"alpha": params["alpha_train"], "x0": x0},
                          x, 0.0, cfg.time, opts)
        z = z[:, : cfg.hidden_dim]
        z = jax.nn.relu(z)
        z = dropout(k2, z, cfg.dropout, training)
        logits = linear_apply(params["m2"], z)
        return logits, state, stats, ()
