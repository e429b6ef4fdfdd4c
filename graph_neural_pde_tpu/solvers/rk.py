"""Single explicit Runge-Kutta step + quartic dense-output interpolation.

Pure functions over pytree states; used by both the fixed-grid scan solver
and the adaptive while_loop solver.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from graph_neural_pde_tpu.solvers.tableaus import Tableau
from graph_neural_pde_tpu.solvers.tree_math import (
    tree_axpy,
    tree_lincomb,
    tree_scale,
    tree_sub,
)

# func signature everywhere: func(params, t, y) -> dy/dt
Func = Callable


def rk_step(func: Func, params, t0, y0, f0, h, tab: Tableau):
    """One explicit RK step.

    Returns (y1, f1, err, ks). ``f0`` is stage 1 (FSAL reuse); ``f1`` is
    f(t1, y1) — taken from the last stage for FSAL tableaus, recomputed
    otherwise. ``err`` is None for non-embedded tableaus.
    Extra RHS evals: num_stages-1 (+1 if not FSAL).
    """
    ks = [f0]
    for i, (a, brow) in enumerate(zip(tab.alpha, tab.beta)):
        ti = t0 + a * h
        yi = y0
        for bj, kj in zip(brow, ks):
            if bj != 0.0:
                yi = tree_axpy(h * bj, kj, yi)
        # Materialise the stage input so XLA can't fuse the stage
        # combination into the RHS's edge gather (re-evaluated per gathered
        # row — measured 1.6x whole-solve slowdown; see fixed.py).
        yi = jax.lax.optimization_barrier(yi)
        ks.append(func(params, ti, yi))

    y1 = y0
    for cj, kj in zip(tab.c_sol, ks):
        if cj != 0.0:
            y1 = tree_axpy(h * cj, kj, y1)
    y1 = jax.lax.optimization_barrier(y1)

    if tab.fsal:
        f1 = ks[-1]
    else:
        f1 = func(params, t0 + h, y1)

    err = None
    if tab.c_err is not None:
        nz = [(c, k) for c, k in zip(tab.c_err, ks) if c != 0.0]
        err = tree_lincomb([h * c for c, _ in nz], [k for _, k in nz])
    return y1, f1, err, ks


def interp_fit(y0, y1, y_mid, f0, f1, h):
    """Fit p(x) = y0 + h f0 x + c2 x^2 + c3 x^3 + c4 x^4 on x in [0,1] with
    p(0)=y0, p(1)=y1, p(1/2)=y_mid, p'(0)=h f0, p'(1)=h f1.

    Returns coefficient pytrees (c2, c3, c4). Same quartic family torchdiffeq
    fits for dense output (used for the final overshoot interpolation and the
    early-stop evaluator, /root/reference/src/early_stop_solver.py:84).
    """
    def abc(y0_, y1_, ym_, f0_, f1_):
        A = y1_ - y0_ - h * f0_
        B = h * (f1_ - f0_)
        C = 16.0 * ym_ - 16.0 * y0_ - 8.0 * h * f0_
        return A, B, C

    c2 = jax.tree_util.tree_map(
        lambda *xs: (lambda A, B, C: -5.0 * A + B + C)(*abc(*xs)),
        y0, y1, y_mid, f0, f1)
    c3 = jax.tree_util.tree_map(
        lambda *xs: (lambda A, B, C: 14.0 * A - 3.0 * B - 2.0 * C)(*abc(*xs)),
        y0, y1, y_mid, f0, f1)
    c4 = jax.tree_util.tree_map(
        lambda *xs: (lambda A, B, C: C - 8.0 * A + 2.0 * B)(*abc(*xs)),
        y0, y1, y_mid, f0, f1)
    return c2, c3, c4


def interp_eval(y0, f0, coeffs, h, x):
    """Evaluate the fitted quartic at relative position x in [0, 1]."""
    c2, c3, c4 = coeffs
    def ev(y0_, f0_, c2_, c3_, c4_):
        return y0_ + x * (h * f0_ + x * (c2_ + x * (c3_ + x * c4_)))
    return jax.tree_util.tree_map(ev, y0, f0, c2, c3, c4)


def y_mid_from_stages(y0, ks, h, tab: Tableau):
    """Dense-output midpoint y(t0 + h/2) from stage derivatives (c_mid)."""
    assert tab.c_mid is not None
    nz = [(c, k) for c, k in zip(tab.c_mid, ks) if c != 0.0]
    return tree_axpy(1.0, tree_lincomb([h * c for c, _ in nz],
                                       [k for _, k in nz]), y0)


def hermite_mid(y0, y1, f0, f1, h):
    """Cubic-Hermite midpoint for tableaus without c_mid (adaptive_heun, bosh3)."""
    def mid(a, b, fa, fb):
        return 0.5 * (a + b) + 0.125 * h * (fa - fb)
    return jax.tree_util.tree_map(mid, y0, y1, f0, f1)
