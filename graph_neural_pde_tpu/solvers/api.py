"""Public ODE solve API: method dispatch + continuous-adjoint gradients.

Mirrors the capability surface the reference gets from torchdiffeq's
``odeint`` / ``odeint_adjoint`` (/root/reference/src/base_classes.py:44-48,
block_constant.py:45-62): fixed-grid euler/midpoint/rk4/heun2, adaptive
dopri5/adaptive_heun/bosh3, and an O(1)-memory continuous adjoint whose
backward solve may use a *different* method, step size and tolerances
(adjoint_method / adjoint_step_size / tol_scale_adjoint).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from graph_neural_pde_tpu.solvers.adaptive import odeint_adaptive
from graph_neural_pde_tpu.solvers.fixed import odeint_fixed
from graph_neural_pde_tpu.solvers.tableaus import TABLEAUS, Tableau
from graph_neural_pde_tpu.solvers.tree_math import tree_zeros_like

FIXED_METHODS = ("euler", "midpoint", "heun2", "rk4")
ADAPTIVE_METHODS = ("dopri5", "adaptive_heun", "bosh3")
MULTISTEP_METHODS = ("explicit_adams", "implicit_adams")


@dataclass(frozen=True)
class SolverOptions:
    """Static solver configuration (hashable — participates in jit keys)."""

    method: str = "dopri5"
    rtol: float = 1e-9          # note reference convention: atol > rtol
    atol: float = 1e-7
    step_size: float = 1.0      # fixed-grid methods
    max_steps: int = 1000       # adaptive trip bound (≈ max_nfe / evals_per_step)
    first_step: Optional[float] = None
    remat: bool = False         # rematerialise fixed-grid steps in backprop

    @property
    def tableau(self) -> Tableau:
        return TABLEAUS[self.method]

    @property
    def is_adaptive(self) -> bool:
        return self.method in ADAPTIVE_METHODS

    @staticmethod
    def from_config(cfg, adjoint: bool = False) -> "SolverOptions":
        """Build from a Config, applying the reference's max_nfe → trip bound."""
        method = cfg.adjoint_method if adjoint else cfg.method
        evals = TABLEAUS[method].evals_per_step if method in TABLEAUS else 2
        max_steps = max(cfg.max_nfe // max(evals, 1), 4)
        return SolverOptions(
            method=method,
            rtol=cfg.rtol_adjoint if adjoint else cfg.rtol,
            atol=cfg.atol_adjoint if adjoint else cfg.atol,
            step_size=cfg.adjoint_step_size if adjoint else cfg.step_size,
            max_steps=max_steps,
            remat=getattr(cfg, "remat", False) and not adjoint,
        )


def _solve(func: Callable, opts: SolverOptions, t0: float, t1: float,
           params, y0):
    """Dispatch one IVP solve. Differentiable (scan backprop for fixed-grid,
    discrete adjoint for adaptive)."""
    if opts.method in FIXED_METHODS:
        return odeint_fixed(func, params, y0, t0, t1,
                            step_size=opts.step_size, tab=opts.tableau,
                            remat=opts.remat)
    if opts.method in ADAPTIVE_METHODS:
        return odeint_adaptive(func, opts.tableau, t0, t1, opts.rtol,
                               opts.atol, opts.max_steps, opts.first_step,
                               params, y0)
    if opts.method in MULTISTEP_METHODS:
        from graph_neural_pde_tpu.solvers.multistep import odeint_adams
        return odeint_adams(func, params, y0, t0, t1,
                            step_size=opts.step_size,
                            implicit=(opts.method == "implicit_adams"))
    raise ValueError(f"unknown solver method '{opts.method}'")


# ---------------------------------------------------------------------------
# continuous adjoint
# ---------------------------------------------------------------------------

def _set_probe_leaves(tree, value):
    """Replace every dict leaf named ``adjoint_nfe_probe`` with ``value``."""
    jtu = jax.tree_util

    def fn(path, leaf):
        if path and isinstance(path[-1], jtu.DictKey) \
                and path[-1].key == "adjoint_nfe_probe":
            return jnp.asarray(value, leaf.dtype).reshape(leaf.shape)
        return leaf

    return jtu.tree_map_with_path(fn, tree)


@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4))
def _odeint_adjoint(func, fwd_opts: SolverOptions, bwd_opts: SolverOptions,
                    t0: float, t1: float, params, y0):
    y1, stats = _solve(func, fwd_opts, t0, t1, params, y0)
    return y1, stats


def _adj_fwd(func, fwd_opts, bwd_opts, t0, t1, params, y0):
    y1, stats = _solve(func, fwd_opts, t0, t1, params, y0)
    return (y1, stats), (params, y1)


def _adj_bwd(func, fwd_opts, bwd_opts, t0, t1, res, ct):
    """Solve the augmented adjoint ODE backwards from t1 to t0.

    State (y, a, p̄) integrated in s ∈ [0, t1-t0] with t = t1 - s:
        dy/ds = -f(t, y),  da/ds = aᵀ ∂f/∂y,  dp̄/ds = aᵀ ∂f/∂p.
    """
    ct_y1, _ct_stats = ct
    params, y1 = res
    span = t1 - t0

    def aug_func(p, s, state):
        y, a, _pbar = state
        t = jnp.asarray(t1, jnp.float32) - s

        def f_of(p_, y_):
            return func(p_, t, y_)

        f_val, vjp_fn = jax.vjp(f_of, p, y)
        pbar_dot, a_dot = vjp_fn(a)
        y_dot = jax.tree_util.tree_map(lambda v: -v, f_val)
        return (y_dot, a_dot, pbar_dot)

    aug0 = (y1, ct_y1, tree_zeros_like(params))
    aug_T, bwd_stats = _solve(aug_func, bwd_opts, 0.0, span, params, aug0)
    _y0_rec, a0, pbar = aug_T
    # Side channel for the measured backward NFE (the reference's bm meter,
    # run_GNN.py:93-95): any params leaf named "adjoint_nfe_probe" gets the
    # adjoint solve's RHS-eval count as its cotangent instead of the zero
    # the aug solve accumulated (the probe is inert in every RHS, so its
    # true cotangent is exactly 0). Each aug-func eval calls the user RHS
    # once under jax.vjp — the same count torchdiffeq's adjoint adds to
    # odefunc.nfe during backward.
    pbar = _set_probe_leaves(pbar, bwd_stats["nfe"])
    return pbar, a0


_odeint_adjoint.defvjp(_adj_fwd, _adj_bwd)


# ---------------------------------------------------------------------------
# public entry point
# ---------------------------------------------------------------------------

def odeint(func: Callable, params, y0, t0: float, t1: float,
           opts: SolverOptions, *, adjoint: bool = False,
           adjoint_opts: Optional[SolverOptions] = None):
    """Integrate ``dy/dt = func(params, t, y)`` from t0 to t1.

    Returns ``(y(t1), stats)`` with stats = {nfe, accepted, rejected,
    hit_max_steps, t_final}. All counters live on-device so the whole train
    step stays in one jit (the reference meters NFE on the host,
    /root/reference/src/run_GNN.py:90-95).
    """
    t0, t1 = float(t0), float(t1)
    if adjoint or opts.is_adaptive:
        # The adaptive and adjoint paths are custom-VJP functions: any value
        # the RHS closes over that carries derivatives must become an explicit
        # argument. closure_convert hoists exactly those (perturbed) captures;
        # non-differentiated captures (edge indices, masks) legitimately stay
        # in the closure — the jax.experimental.ode pattern.
        t_ex = jnp.zeros((), jnp.float32)
        converted, consts = jax.closure_convert(func, params, t_ex, y0)

        def func2(pc, t, y):
            p, cs = pc
            return converted(p, t, y, *cs)

        params2 = (params, tuple(consts))
    else:
        func2, params2 = func, params

    if adjoint:
        return _odeint_adjoint(func2, opts, adjoint_opts or opts,
                               t0, t1, params2, y0)
    return _solve(func2, opts, t0, t1, params2, y0)
