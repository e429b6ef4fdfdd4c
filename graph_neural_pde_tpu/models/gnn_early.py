"""GNNEarly: GNN whose test-time integrator evaluates accuracy per step.

Re-design of /root/reference/src/GNN_early.py: at evaluation the ODE block
integrates to ``earlystopxT · T`` with the early-stop solver, decoding the
state with the classifier head after every accepted step and tracking the
best-validation snapshot (and its diffusion time t*). Training is identical
to the plain GNN.

The reference pushes decoder weights into the solver object each forward
(GNN_early.py:31-33, 78-79); here the evaluate closure simply reads the same
params pytree — no weight copies, no object mutation.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from graph_neural_pde_tpu.models.blocks import build_aux, make_rhs
from graph_neural_pde_tpu.models.gnn import GNNModel
from graph_neural_pde_tpu.models.layers import linear_apply
from graph_neural_pde_tpu.ops.graph import Graph
from graph_neural_pde_tpu.solvers.api import SolverOptions
from graph_neural_pde_tpu.solvers.early_stop import BestSnapshot, odeint_early_stop
from graph_neural_pde_tpu.training.train import accuracy


class GNNEarlyModel(GNNModel):
    """GNNModel + early-stopped evaluation (run_GNN.py:266-271 consumers)."""

    def apply_early(self, params, state, x, y, masks, pos_encoding=None,
                    rng: Optional[jax.Array] = None,
                    graph: Optional[Graph] = None):
        """Evaluation forward with in-integrator model selection.

        y: int labels [N]; masks: (train_mask, val_mask, test_mask).
        Returns (logits_at_extended_T, best: BestSnapshot, stats).
        """
        cfg = self.cfg
        if rng is None:
            rng = jax.random.PRNGKey(0)
        k_enc, k_dec = jax.random.split(rng)
        g = graph if graph is not None else self.graph
        x0, _ = self.encode(params, state, x, pos_encoding, False, k_enc)
        n = x0.shape[0]
        if g.num_nodes > n:  # pallas plan layout pads the node count
            x0 = jnp.pad(x0, ((0, g.num_nodes - n), (0, 0)))

        aux, g_run = build_aux(params["block"], cfg, g, x0, training=False,
                               stripe_plan=(self.stripe_plan if graph is None
                                            else None))
        # the model's engines belong to self.graph; a graph override must
        # fall back to the XLA path
        rhs = make_rhs(cfg, g_run,
                       spmm_fn=self.spmm_fn if graph is None else None,
                       stripe_plan=(self.stripe_plan if graph is None
                                    else None))

        def func(p, t, yy):
            return rhs(p["f"], p["aux"], t, yy)

        m2 = params["m2"]
        train_mask, val_mask, test_mask = masks

        def evaluate(z):
            # relu -> m2 only — the early-stop evaluator ignores fc_out and
            # dropout (early_stop_solver.py:105-122)
            z = z[:n]
            if cfg.augment:
                z = z[:, : self.core_dim]
            logits = linear_apply(m2, jax.nn.relu(z))
            return (accuracy(logits, y, train_mask),
                    accuracy(logits, y, val_mask),
                    accuracy(logits, y, test_mask))

        # the early-stop integrator needs a stepping method (the reference's
        # EarlyStopInt likewise supports only rk4/dopri5,
        # early_stop_solver.py:288); the expm solve has no steps to evaluate
        es_cfg = cfg.replace(method="dopri5") if cfg.method == "cheby" else cfg
        opts = SolverOptions.from_config(es_cfg)
        t_ext = cfg.earlystopxT * cfg.time   # EarlyStopInt t (early_stop_solver.py:244)
        p = {"f": params["block"]["func"], "aux": aux}
        zT, best, stats = odeint_early_stop(
            func, p, x0, 0.0, float(t_ext), opts, evaluate,
            max_test_steps=cfg.max_test_steps)

        from graph_neural_pde_tpu.models.functions import rhs_may_poison
        if rhs_may_poison(cfg):
            # fast softmax path NaN-poisons on exp under/overflow (see
            # block_forward); re-run the early-stop solve once with the
            # exact per-segment softmax if the poison (or a NaN-driven
            # step-cap stall) surfaced
            rhs_exact = make_rhs(
                cfg, g_run,
                spmm_fn=self.spmm_fn if graph is None else None,
                stripe_plan=(self.stripe_plan if graph is None else None),
                exact_softmax=True)

            def func_exact(pp, t, yy):
                return rhs_exact(pp["f"], pp["aux"], t, yy)

            bad = jnp.any(~jnp.isfinite(zT)) | stats["hit_max_steps"]

            def resolve(_):
                return odeint_early_stop(
                    func_exact, p, x0, 0.0, float(t_ext), opts, evaluate,
                    max_test_steps=cfg.max_test_steps)

            zT, best, stats = jax.lax.cond(
                bad, resolve, lambda _: (zT, best, stats), None)

        logits = self.decode(params, zT[:n], False, k_dec)
        return logits, best, stats
