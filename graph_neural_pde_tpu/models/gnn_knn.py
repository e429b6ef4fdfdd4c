"""GNN_KNN: GNN with kNN epoch rewiring and an optional 'fa layer'.

Re-design of /root/reference/src/GNN_KNN.py and GNN_KNN_early.py:

  * ``encode`` / ``solve_ode`` expose the Z(0) / Z(T) embeddings the kNN
    rewiring probes need (forward_encoder / forward_ODE, GNN_KNN.py:106-182)
  * ``rewire`` rebuilds the graph from a kNN search over those embeddings
    every ``rewire_KNN_epoch`` epochs (apply_KNN semantics, run_GNN.py:252-254)
  * ``fa_layer``: after the main solve, a second short solve (rk4, T=1) on a
    densified graph — the bottleneck-paper style final aggregation layer
    (GNN_KNN.py:65-83). The reference mutates opt/method/time temporarily;
    here the fa solve has its own static Config.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from graph_neural_pde_tpu.config import Config
from graph_neural_pde_tpu.models.blocks import block_forward
from graph_neural_pde_tpu.models.gnn import GNNModel
from graph_neural_pde_tpu.models.gnn_early import GNNEarlyModel
from graph_neural_pde_tpu.ops.graph import Graph
from graph_neural_pde_tpu.rewiring.edges import apply_knn_rewire, add_random_edges


class GNNKNNModel(GNNModel):
    """GNNModel + kNN rewiring hooks + fa_layer."""

    def __init__(self, cfg: Config, num_features: int, num_classes: int,
                 graph: Graph, pos_enc_dim: int = 0):
        super().__init__(cfg, num_features, num_classes, graph, pos_enc_dim)
        # fa layer runs rk4 over [0, 1] regardless of the main solver
        # (GNN_KNN.py:65-71)
        self.fa_cfg = cfg.replace(method="rk4", time=1.0, step_size=1.0,
                                  adjoint=False)

    # -- rewiring probes ---------------------------------------------------
    def solve_ode(self, params, state, x, pos_encoding=None, rng=None,
                  graph: Optional[Graph] = None):
        """Z(T): encoder output evolved by the ODE block (forward_ODE)."""
        if rng is None:
            rng = jax.random.PRNGKey(0)
        g = graph if graph is not None else self.graph
        x0, _ = self.encode(params, state, x, pos_encoding, False, rng)
        z, _, _ = block_forward(params["block"], self.cfg, g, x0, False)
        return z

    def embeddings_for_rewiring(self, params, state, x, pos_encoding=None):
        """Z per cfg.rewire_KNN_T ∈ {raw, T0, TN} (apply_KNN,
        graph_rewiring.py:137-147)."""
        mode = self.cfg.rewire_KNN_T
        if mode == "raw":
            return x
        rng = jax.random.PRNGKey(0)
        if mode == "T0":
            z, _ = self.encode(params, state, x, pos_encoding, False, rng)
            return z
        if mode == "TN":
            return self.solve_ode(params, state, x, pos_encoding, rng)
        raise ValueError("Need to set rewire_KNN_T")

    def rewire(self, params, state, x, pos_encoding=None) -> Graph:
        """New kNN graph from the evolved embeddings; swap via self.graph.

        The rewired edges are re-normalised through prepare_graph (the
        reference leaves stale edge weights in the odefunc after swapping
        edge_index; the attention path recomputes weights either way). The
        capacity stays constant so no solve recompiles.
        """
        from graph_neural_pde_tpu.models.blocks import prepare_graph
        z = self.embeddings_for_rewiring(params, state, x, pos_encoding)
        loops = self.graph.num_nodes if self.cfg.self_loop_weight > 0 else 0
        # the raw capacity is pinned at the FIRST rewire so every kNN
        # rewiring produces the identical (k-regular) row layout — the
        # rebuilt stripe plan then compares layout_equal to the previous
        # one and the Trainer's compiled step (keyed by plan identity) is
        # reused: one retrace at the first rewire, none after.
        if not hasattr(self, "_rewire_cap"):
            self._rewire_cap = max(
                self.graph.capacity - loops,
                self.graph.num_nodes * self.cfg.rewire_KNN_k)
        raw = apply_knn_rewire(np.asarray(z), self.cfg, self.graph,
                               capacity=self._rewire_cap)
        self.graph = prepare_graph(self.cfg, raw)
        # rebuild the Pallas engines against the rewired graph (round 4:
        # rewire_KNN rides the stripe engine across the plan swap)
        self._build_engines()
        return self.graph

    # -- forward with fa layer ----------------------------------------------
    def apply(self, params, state, x, pos_encoding=None, training=False,
              rng=None, graph: Optional[Graph] = None):
        cfg = self.cfg
        if rng is None:
            rng = jax.random.PRNGKey(0)
        k_enc, k_dec = jax.random.split(rng)
        g = graph if graph is not None else self.graph
        x0, new_state = self.encode(params, state, x, pos_encoding, training,
                                    k_enc)
        z, stats, regs = block_forward(params["block"], cfg, g, x0, training)
        if cfg.fa_layer:
            g_fa = getattr(self, "fa_graph", None) or g
            z, _, _ = block_forward(params["block"], self.fa_cfg, g_fa, z,
                                    False)
        logits = self.decode(params, z, training, k_dec)
        return logits, new_state, stats, regs

    def build_fa_graph(self, rng: np.random.Generator, add_frac: float = 0.5):
        """Densified graph for the fa layer (add_edges at GNN_KNN.py:73-76)."""
        self.fa_graph = add_random_edges(self.graph, add_frac, rng,
                                         capacity=None)
        return self.fa_graph


class GNNKNNEarlyModel(GNNKNNModel, GNNEarlyModel):
    """kNN rewiring + early-stopped evaluation (GNN_KNN_early.py)."""
    pass
