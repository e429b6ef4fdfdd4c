"""The GRAND/BLEND model: encoder → continuous-time ODE block → decoder.

Re-design of BaseGNN + GNN (/root/reference/src/base_classes.py:98-146,
GNN.py:9-72) as an explicit-parameter functional model:

  * encoder: dropout → m1 (or the Beltrami dual encoder mx ‖ mp), optional
    residual MLP, optional label concat, optional batch norm, optional
    augmentation zero-padding
  * ODE block: see models.blocks — one jittable IVP solve
  * decoder: relu → optional fc → dropout → m2

Everything (including the solve and its NFE counters) lives in one jit.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from graph_neural_pde_tpu.config import Config
from graph_neural_pde_tpu.models.blocks import (
    block_forward,
    init_block,
    prepare_graph,
)
from graph_neural_pde_tpu.models.layers import (
    bn_apply,
    bn_init,
    dropout,
    linear_apply,
    linear_init,
)
from graph_neural_pde_tpu.ops.graph import Graph


class GNNModel:
    """Static model description; parameters are explicit pytrees.

    Usage:
        model = GNNModel(cfg, num_features, num_classes, graph)
        params, state = model.init(key)
        logits, state, stats, regs = model.apply(params, state, x, pos, True, rng)
    """

    def __init__(self, cfg: Config, num_features: int, num_classes: int,
                 graph: Graph, pos_enc_dim: int = 0):
        if cfg.beltrami and pos_enc_dim:
            cfg = cfg.replace(pos_enc_dim=pos_enc_dim)
        self.cfg = cfg
        self.num_features = num_features
        self.num_classes = num_classes
        self.graph = prepare_graph(cfg, graph)
        self.num_nodes = self.graph.num_nodes

        # optional Pallas engines: blocked spmm (laplacian, block-local
        # graphs) or stripe row-gather/scatter for the fused attention RHS
        self._build_engines()

        # width bookkeeping (the reference mutates opt['hidden_dim'] at
        # base_classes.py:110-124; here the widths are explicit)
        self.enc_dim = (cfg.feat_hidden_dim + cfg.pos_enc_hidden_dim
                        if cfg.beltrami else cfg.hidden_dim)
        self.core_dim = self.enc_dim + (num_classes if cfg.use_labels else 0)
        self.ode_dim = 2 * self.core_dim if cfg.augment else self.core_dim

    # ------------------------------------------------------------------
    def _build_engines(self):
        """(Re)build the Pallas engines for the CURRENT self.graph.

        Called at construction and from between-epoch graph surgery
        (GNNKNNModel.rewire): the stripe plan's index arrays are trace-time
        constants, so a rewired graph needs a matching plan. When the new
        plan's layout equals the old one array-for-array (kNN rewiring is
        k-regular, so every post-first-rewire layout matches), the OLD plan
        object is kept — the Trainer keys compiled steps by plan identity
        (id(model.stripe_plan)) and reuses the executable."""
        cfg = self.cfg
        from graph_neural_pde_tpu.models.blocks import (
            build_spmm_engine, build_stripe_engine)
        old_plan = getattr(self, "stripe_plan", None)
        self.graph, self.spmm_fn = build_spmm_engine(cfg, self.graph)
        self.graph, self.stripe_plan = build_stripe_engine(cfg, self.graph)
        if (old_plan is not None and self.stripe_plan is not None
                and old_plan.layout_equal(self.stripe_plan)):
            self.stripe_plan = old_plan
        if (self.stripe_plan is not None and cfg.function == "laplacian"
                and self.spmm_fn is None):
            # route the laplacian aggregation (the only op of every tuned
            # config's RHS, and the cheby solver's matvec) through the
            # stripe MXU scatter
            import jax.numpy as _jnp
            from graph_neural_pde_tpu.ops.spmm import make_stripe_spmm
            pay = (_jnp.bfloat16 if cfg.rhs_payload_dtype == "bfloat16"
                   else None)
            self.spmm_fn = make_stripe_spmm(self.graph, self.stripe_plan,
                                            pay)

    def _spmm_for(self, g, graph_arg):
        """The laplacian aggregation engine for one apply() call.

        When the caller passes a TRACED graph (run.py always does; the
        between-epoch rewiring hooks — kNN / edge_sampling — swap edge
        CONTENT under a layout-stable plan), the stripe spmm closure must
        read col/mask/weight from THAT graph: ``self.spmm_fn`` closes over
        the arrays captured at the last ``_build_engines()``, and a
        layout_equal plan rebuild keeps the old plan object (so the
        Trainer's compiled step is reused) — a baked closure would alias
        the PRE-surgery columns. Only safe to rebuild per-call when the
        plan carries no col-content-dependent structure (col_plan is
        skipped for every runtime-rewiring config, see
        build_stripe_engine)."""
        if (graph_arg is None or self.spmm_fn is None
                or self.stripe_plan is None
                or self.stripe_plan.col_plan is not None):
            return self.spmm_fn
        from graph_neural_pde_tpu.ops.spmm import make_stripe_spmm
        pay = (jnp.bfloat16 if self.cfg.rhs_payload_dtype == "bfloat16"
               else None)
        return make_stripe_spmm(g, self.stripe_plan, pay)

    def init(self, key):
        cfg = self.cfg
        ks = jax.random.split(key, 8)
        p = {}
        if cfg.beltrami:
            p["mx"] = linear_init(ks[0], self.num_features, cfg.feat_hidden_dim)
            p["mp"] = linear_init(ks[1], cfg.pos_enc_dim, cfg.pos_enc_hidden_dim)
        else:
            p["m1"] = linear_init(ks[0], self.num_features, cfg.hidden_dim)
        if cfg.use_mlp:
            p["m11"] = linear_init(ks[2], self.enc_dim, self.enc_dim)
            p["m12"] = linear_init(ks[3], self.enc_dim, self.enc_dim)
        if cfg.fc_out:
            p["fc"] = linear_init(ks[4], self.core_dim, self.core_dim)
        p["m2"] = linear_init(ks[5], self.core_dim, self.num_classes)
        p["block"] = init_block(ks[6], cfg, self.ode_dim)

        state = {}
        if cfg.batch_norm:
            p["bn_in"], state["bn_in"] = bn_init(self.core_dim)
        return p, state

    # ------------------------------------------------------------------
    def encode(self, params, state, x, pos_encoding, training: bool, rng):
        """Everything before the ODE solve (forward_encoder of
        /root/reference/src/GNN_early.py:103-124). Returns (x0, new_state)."""
        cfg = self.cfg
        ks = jax.random.split(rng, 6)

        labels = None
        if cfg.use_labels:
            labels = x[:, -self.num_classes:]
            x = x[:, :-self.num_classes]

        if cfg.beltrami:
            x = dropout(ks[0], x, cfg.input_dropout, training)
            x = linear_apply(params["mx"], x)
            p_enc = dropout(ks[1], pos_encoding, cfg.input_dropout, training)
            p_enc = linear_apply(params["mp"], p_enc)
            x = jnp.concatenate([x, p_enc], axis=1)
        else:
            x = dropout(ks[0], x, cfg.input_dropout, training)
            x = linear_apply(params["m1"], x)

        if cfg.use_mlp:
            x = dropout(ks[2], x, cfg.dropout, training)
            x = dropout(ks[3], x + linear_apply(params["m11"], jax.nn.relu(x)),
                        cfg.dropout, training)
            x = dropout(ks[4], x + linear_apply(params["m12"], jax.nn.relu(x)),
                        cfg.dropout, training)

        if cfg.use_labels:
            x = jnp.concatenate([x, labels], axis=-1)

        new_state = dict(state)
        if cfg.batch_norm:
            x, new_state["bn_in"] = bn_apply(params["bn_in"], state["bn_in"],
                                             x, training)

        if cfg.augment:
            x = jnp.concatenate([x, jnp.zeros_like(x)], axis=1)
        return x, new_state

    def decode(self, params, z, training: bool, rng):
        """relu → fc → dropout → m2 (GNN.py:57-72)."""
        cfg = self.cfg
        if cfg.augment:
            z = z[:, : self.core_dim]
        z = jax.nn.relu(z)
        if cfg.fc_out:
            z = jax.nn.relu(linear_apply(params["fc"], z))
        z = dropout(rng, z, cfg.dropout, training)
        return linear_apply(params["m2"], z)

    # ------------------------------------------------------------------
    def apply(self, params, state, x, pos_encoding=None, training: bool = False,
              rng: Optional[jax.Array] = None, graph: Optional[Graph] = None,
              fa_graph: Optional[Graph] = None):
        """Full forward. Returns (logits, new_state, solver_stats, reg_states).

        ``fa_graph`` is accepted for Trainer-signature compatibility with
        the kNN models (which consume it); plain GNNModel ignores it."""
        if rng is None:
            rng = jax.random.PRNGKey(0)
        k_enc, k_dec = jax.random.split(rng)
        g = graph if graph is not None else self.graph
        x0, new_state = self.encode(params, state, x, pos_encoding, training, k_enc)
        n = x0.shape[0]
        if g.num_nodes > n:  # plan layout pads the node count to block_n
            x0 = jnp.pad(x0, ((0, g.num_nodes - n), (0, 0)))
        z, stats, reg_states = block_forward(params["block"], self.cfg, g,
                                             x0, training,
                                             spmm_fn=self._spmm_for(g, graph),
                                             stripe_plan=self.stripe_plan)
        z = z[:n]
        logits = self.decode(params, z, training, k_dec)
        return logits, new_state, stats, reg_states
