"""Adaptive embedded Runge-Kutta integration as a jittable lax.while_loop.

From-scratch replacement for torchdiffeq's RKAdaptiveStepsizeODESolver
(dopri5 / adaptive_heun / bosh3) used throughout the reference
(/root/reference/src/block_constant.py:56-62, base_classes.py:44-47):

  * Hairer initial-step selection (matching torchdiffeq `_select_initial_step`)
  * accept/reject with error_ratio = rms(err / (atol + rtol·max|y|)) <= 1
  * step controller h' = h · clip(safety/ratio^(1/order), dfactor, ifactor)
    with safety=0.9, ifactor=10, dfactor=0.2 (dfactor=1 on accepted steps)
  * overshoot-and-interpolate at t1 via the quartic dense-output fit
  * NFE / accepted / rejected counters carried in the loop state — the
    reference's MaxNFEException (utils.py:18) becomes a carried
    ``hit_max_steps`` flag and a bounded trip count, because exceptions
    cannot cross a jit boundary.

Gradients: reverse-differentiating a while_loop is impossible in JAX, so
``odeint_adaptive`` carries a custom VJP implementing the *discrete adjoint*:
the forward pass records the accepted step plan (t_i, h_i) and the state at
the start of every accepted step; the backward pass walks the plan in reverse
with one jax.vjp per step (a second while_loop with a dynamic trip count —
no wasted iterations). This matches torch's backprop-through-the-solver
semantics (gradients do not flow through step-size selection) at the same
O(steps · state) memory. The primal (inference) path stores nothing. For
O(1) memory training use solvers.adjoint (the reference's odeint_adjoint).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from graph_neural_pde_tpu.solvers.rk import (
    hermite_mid,
    interp_eval,
    interp_fit,
    rk_step,
    y_mid_from_stages,
)
from graph_neural_pde_tpu.solvers.tableaus import Tableau
from graph_neural_pde_tpu.solvers.tree_math import (
    error_ratio,
    tree_axpy,
    tree_rms,
    tree_where,
)


def _optimal_step_size(h, ratio, order):
    """torchdiffeq `_optimal_step_size` semantics."""
    safety, ifactor, dfactor = 0.9, 10.0, 0.2
    dfac = jnp.where(ratio < 1.0, 1.0, dfactor)
    ratio_c = jnp.maximum(ratio, 1e-10)
    factor = jnp.minimum(ifactor,
                         jnp.maximum(safety * ratio_c ** (-1.0 / order), dfac))
    factor = jnp.where(ratio == 0.0, ifactor, factor)
    return h * factor


def select_initial_step(func, params, t0, y0, f0, order, rtol, atol):
    """Hairer II.4 starting-step heuristic (torchdiffeq `_select_initial_step`)."""
    def scaled_rms(tree, ref):
        return tree_rms(jax.tree_util.tree_map(
            lambda x, r: x / (atol + rtol * jnp.abs(r)), tree, ref))

    d0 = scaled_rms(y0, y0)
    d1 = scaled_rms(f0, y0)
    h0 = jnp.where((d0 < 1e-5) | (d1 < 1e-5), 1e-6,
                   0.01 * d0 / jnp.maximum(d1, 1e-30))
    y1 = tree_axpy(h0, f0, y0)
    f1 = func(params, t0 + h0, y1)
    d2 = scaled_rms(jax.tree_util.tree_map(jnp.subtract, f1, f0), y0) / h0
    h1 = jnp.where((d1 <= 1e-15) & (d2 <= 1e-15),
                   jnp.maximum(1e-6, h0 * 1e-3),
                   (0.01 / jnp.maximum(d1, d2)) ** (1.0 / (order + 1)))
    return jnp.minimum(100.0 * h0, h1)


class _Carry(NamedTuple):
    t: jax.Array
    y: object                # current state y(t)
    f: object                # f(t, y) — FSAL seed
    h: jax.Array             # next trial step size
    n_acc: jax.Array
    n_rej: jax.Array
    nfe: jax.Array
    # snapshot of the most recent *accepted* step (for final interpolation)
    t_la: jax.Array
    h_la: jax.Array
    y_la: object             # state at the START of that step
    # optional plan buffers for the discrete adjoint
    ts: Optional[jax.Array]
    hs: Optional[jax.Array]
    ys: Optional[object]


def _plan_loop(func, tab: Tableau, params, y0, t0, t1, rtol, atol,
               max_steps: int, first_step, record: bool):
    t0_ = jnp.asarray(t0, jnp.float32)
    t1_ = jnp.asarray(t1, jnp.float32)
    f0 = func(params, t0_, y0)
    nfe0 = jnp.asarray(1, jnp.int32)
    if first_step is None:
        h0 = select_initial_step(func, params, t0_, y0, f0, tab.order - 1,
                                 rtol, atol)
        nfe0 = nfe0 + 1
    else:
        h0 = jnp.asarray(first_step, jnp.float32)

    if record:
        ts = jnp.zeros((max_steps,), jnp.float32)
        hs = jnp.zeros((max_steps,), jnp.float32)
        ys = jax.tree_util.tree_map(
            lambda x: jnp.zeros((max_steps,) + x.shape, x.dtype), y0)
    else:
        ts = hs = ys = None

    init = _Carry(t=t0_, y=y0, f=f0, h=h0,
                  n_acc=jnp.asarray(0, jnp.int32),
                  n_rej=jnp.asarray(0, jnp.int32), nfe=nfe0,
                  t_la=t0_, h_la=jnp.asarray(1.0, jnp.float32), y_la=y0,
                  ts=ts, hs=hs, ys=ys)

    def cond(c: _Carry):
        return (c.t < t1_) & (c.n_acc + c.n_rej < max_steps)

    def body(c: _Carry):
        y1, f1, err, _ks = rk_step(func, params, c.t, c.y, c.f, c.h, tab)
        ratio = error_ratio(err, c.y, y1, rtol, atol)
        accept = ratio <= 1.0
        acc_i = accept.astype(jnp.int32)

        if record:
            idx = c.n_acc
            ts_n = jnp.where(accept, c.ts.at[idx].set(c.t), c.ts)
            hs_n = jnp.where(accept, c.hs.at[idx].set(c.h), c.hs)
            ys_n = jax.tree_util.tree_map(
                lambda buf, yy: jnp.where(accept, buf.at[idx].set(yy), buf),
                c.ys, c.y)
        else:
            ts_n = hs_n = ys_n = None

        return _Carry(
            t=jnp.where(accept, c.t + c.h, c.t),
            y=tree_where(accept, y1, c.y),
            f=tree_where(accept, f1, c.f),
            h=_optimal_step_size(c.h, ratio, tab.order),
            n_acc=c.n_acc + acc_i,
            n_rej=c.n_rej + (1 - acc_i),
            nfe=c.nfe + tab.evals_per_step,
            t_la=jnp.where(accept, c.t, c.t_la),
            h_la=jnp.where(accept, c.h, c.h_la),
            y_la=tree_where(accept, c.y, c.y_la),
            ts=ts_n, hs=hs_n, ys=ys_n)

    out = jax.lax.while_loop(cond, body, init)
    return out, (out.t < t1_) & (out.n_acc + out.n_rej >= max_steps)


def _final_interp(func, tab: Tableau, params, t_start, h, y_start, t1):
    """Redo the last accepted step and evaluate its dense output at t1.

    The controller overshoots t1 and interpolates back (torchdiffeq
    semantics, relied on at /root/reference/src/early_stop_solver.py:69-86).
    """
    f0 = func(params, t_start, y_start)
    y1, f1, _err, ks = rk_step(func, params, t_start, y_start, f0, h, tab)
    if tab.c_mid is not None:
        y_mid = y_mid_from_stages(y_start, ks, h, tab)
    else:
        y_mid = hermite_mid(y_start, y1, f0, f1, h)
    coeffs = interp_fit(y_start, y1, y_mid, f0, f1, h)
    x = jnp.clip((t1 - t_start) / h, 0.0, 1.0)
    return interp_eval(y_start, f0, coeffs, h, x)


def _gather_tree(bufs, i):
    return jax.tree_util.tree_map(lambda b: b[i], bufs)


def _stats(plan, hit_max):
    return {
        "nfe": plan.nfe,
        "accepted": plan.n_acc,
        "rejected": plan.n_rej,
        "hit_max_steps": hit_max,
        "t_final": plan.t,
    }


@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4, 5, 6, 7))
def odeint_adaptive(func: Callable, tab: Tableau, t0: float, t1: float,
                    rtol: float, atol: float, max_steps: int,
                    first_step: Optional[float], params, y0):
    """Adaptive solve from t0 to t1. Returns (y(t1), stats dict).

    ``func(params, t, y) -> dy/dt`` must be pure. Differentiable w.r.t.
    (params, y0) via the discrete adjoint over recorded steps.
    """
    plan, hit_max = _plan_loop(func, tab, params, y0, t0, t1, rtol, atol,
                               max_steps, first_step, record=False)
    y_t1 = _final_interp(func, tab, params, plan.t_la,
                         jnp.maximum(plan.h_la, 1e-30), plan.y_la,
                         jnp.asarray(t1, jnp.float32))
    y_t1 = tree_where(plan.n_acc > 0, y_t1, y0)
    return y_t1, _stats(plan, hit_max)


def _fwd(func, tab, t0, t1, rtol, atol, max_steps, first_step, params, y0):
    plan, hit_max = _plan_loop(func, tab, params, y0, t0, t1, rtol, atol,
                               max_steps, first_step, record=True)
    y_t1 = _final_interp(func, tab, params, plan.t_la,
                         jnp.maximum(plan.h_la, 1e-30), plan.y_la,
                         jnp.asarray(t1, jnp.float32))
    y_t1 = tree_where(plan.n_acc > 0, y_t1, y0)
    res = (params, y0, plan.ts, plan.hs, plan.ys, plan.n_acc)
    return (y_t1, _stats(plan, hit_max)), res


def _bwd(func, tab, t0, t1, rtol, atol, max_steps, first_step, res, ct):
    ct_y1, _ct_stats = ct
    params, y0, ts, hs, ys, n_acc = res
    t1_ = jnp.asarray(t1, jnp.float32)

    def step_fn(p, t, h, y):
        y1, _f1, _err, _ks = rk_step(func, p, t, y, func(p, t, y), h, tab)
        return y1

    def last_step_fn(p, t, h, y):
        return _final_interp(func, tab, p, t, jnp.maximum(h, 1e-30), y, t1_)

    zero_pgrad = jax.tree_util.tree_map(jnp.zeros_like, params)

    # last accepted step: RK + dense-output interpolation
    last = jnp.maximum(n_acc - 1, 0)
    y_last = _gather_tree(ys, last)
    _, vjp_last = jax.vjp(
        lambda p, y: last_step_fn(p, ts[last], hs[last], y), params, y_last)
    dp, a = vjp_last(ct_y1)

    def cond(c):
        i, _a, _dp = c
        return i >= 0

    def body(c):
        i, a_i, dp_i = c
        y_i = _gather_tree(ys, i)
        _, vjp_i = jax.vjp(lambda p, y: step_fn(p, ts[i], hs[i], y),
                           params, y_i)
        dpi, ai = vjp_i(a_i)
        dp_n = jax.tree_util.tree_map(jnp.add, dp_i, dpi)
        return (i - 1, ai, dp_n)

    _, a_fin, dp_fin = jax.lax.while_loop(cond, body, (n_acc - 2, a, dp))
    # no accepted steps => identity map
    a_fin = tree_where(n_acc > 0, a_fin, ct_y1)
    dp_fin = tree_where(n_acc > 0, dp_fin, zero_pgrad)
    return dp_fin, a_fin


odeint_adaptive.defvjp(_fwd, _bwd)
