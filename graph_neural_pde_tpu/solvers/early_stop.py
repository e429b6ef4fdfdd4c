"""Early-stop test integrator: per-step on-device evaluation.

Re-design of /root/reference/src/early_stop_solver.py (EarlyStopDopri5,
EarlyStopRK4, EarlyStopInt): at test time the IVP is integrated to
``earlystopxT · T`` and after every accepted step the state is decoded with
the classifier head and train/val/test accuracies are computed; the snapshot
with the best validation accuracy (and its diffusion time t*) is returned.

The reference does this with host-side torch evaluation inside a subclassed
torchdiffeq solver; here the evaluation (a matmul + masked argmax counts) is
part of the while_loop carry, so the entire early-stopped solve remains one
XLA program. ``max_test_steps`` bounds the loop (early_stop_solver.py:76).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from graph_neural_pde_tpu.solvers.fixed import time_grid
from graph_neural_pde_tpu.solvers.rk import rk_step
from graph_neural_pde_tpu.solvers.tableaus import Tableau
from graph_neural_pde_tpu.solvers.adaptive import (
    _final_interp,
    _optimal_step_size,
    select_initial_step,
)
from graph_neural_pde_tpu.solvers.api import SolverOptions
from graph_neural_pde_tpu.solvers.tree_math import error_ratio, tree_where


class BestSnapshot(NamedTuple):
    train: jax.Array
    val: jax.Array
    test: jax.Array
    time: jax.Array


def _update_best(best: BestSnapshot, evaluate, y, t) -> BestSnapshot:
    tr, va, te = evaluate(y)
    better = va > best.val
    return BestSnapshot(
        train=jnp.where(better, tr, best.train),
        val=jnp.where(better, va, best.val),
        test=jnp.where(better, te, best.test),
        time=jnp.where(better, t, best.time),
    )


def odeint_early_stop(func: Callable, params, y0, t0: float, t1: float,
                      opts: SolverOptions, evaluate: Callable,
                      max_test_steps: int = 100):
    """Integrate to t1 evaluating each accepted step.

    evaluate(y) -> (train_acc, val_acc, test_acc), all traced scalars.
    Returns (y(t1), best: BestSnapshot, stats dict). Inference-only
    (no gradient path — matches the reference's @torch.no_grad evaluate).
    """
    tab = opts.tableau
    best0 = BestSnapshot(train=jnp.zeros(()), val=jnp.zeros(()),
                         test=jnp.zeros(()), time=jnp.zeros(()))
    if tab.is_adaptive:
        return _adaptive_early_stop(func, params, y0, t0, t1, opts, tab,
                                    evaluate, max_test_steps, best0)
    return _fixed_early_stop(func, params, y0, t0, t1, opts, tab, evaluate,
                             best0)


def _fixed_early_stop(func, params, y0, t0, t1, opts, tab, evaluate, best0):
    """EarlyStopRK4 semantics (early_stop_solver.py:131-184): fixed grid,
    evaluate after every step."""
    ts = time_grid(t0, t1, opts.step_size)
    t_arr = jnp.asarray(ts, jnp.float32)
    dt_arr = t_arr[1:] - t_arr[:-1]
    n_steps = len(ts) - 1

    def one_step(carry, t_dt):
        y, best = carry
        t, dt = t_dt
        y1, _f1, _err, _ks = rk_step(func, params, t, y,
                                     func(params, t, y), dt, tab)
        best = _update_best(best, evaluate, y1, t + dt)
        return (y1, best), None

    (yT, best), _ = jax.lax.scan(one_step, (y0, best0), (t_arr[:-1], dt_arr))
    stats = {
        "nfe": jnp.asarray(n_steps * tab.num_stages, jnp.int32),
        "accepted": jnp.asarray(n_steps, jnp.int32),
        "rejected": jnp.asarray(0, jnp.int32),
        "hit_max_steps": jnp.asarray(False),
        "t_final": jnp.asarray(t1, jnp.float32),
    }
    return yT, best, stats


def _adaptive_early_stop(func, params, y0, t0, t1, opts, tab: Tableau,
                         evaluate, max_test_steps, best0):
    """EarlyStopDopri5 semantics (early_stop_solver.py:69-86): adaptive steps
    to t1, evaluating each accepted state, bounded by max_test_steps."""
    rtol, atol = opts.rtol, opts.atol
    t0_ = jnp.asarray(t0, jnp.float32)
    t1_ = jnp.asarray(t1, jnp.float32)
    f0 = func(params, t0_, y0)
    nfe0 = jnp.asarray(1, jnp.int32)
    if opts.first_step is None:
        h0 = select_initial_step(func, params, t0_, y0, f0, tab.order - 1,
                                 rtol, atol)
        nfe0 = nfe0 + 1
    else:
        h0 = jnp.asarray(opts.first_step, jnp.float32)

    # carry: t, y, f, h, steps, acc, nfe, best, last-accepted snapshot
    init = (t0_, y0, f0, h0, jnp.asarray(0, jnp.int32),
            jnp.asarray(0, jnp.int32), nfe0, best0,
            (t0_, jnp.asarray(1.0, jnp.float32), y0))

    def cond(c):
        t, *_rest = c
        steps = c[4]
        return (t < t1_) & (steps < max_test_steps)

    def body(c):
        t, y, f, h, steps, acc, nfe, best, last = c
        y1, f1, err, _ks = rk_step(func, params, t, y, f, h, tab)
        ratio = error_ratio(err, y, y1, rtol, atol)
        accept = ratio <= 1.0
        best = jax.lax.cond(
            accept,
            lambda b: _update_best(b, evaluate, y1, t + h),
            lambda b: b, best)
        last = (jnp.where(accept, t, last[0]),
                jnp.where(accept, h, last[1]),
                tree_where(accept, y, last[2]))
        return (jnp.where(accept, t + h, t),
                tree_where(accept, y1, y),
                tree_where(accept, f1, f),
                _optimal_step_size(h, ratio, tab.order),
                steps + 1,
                acc + accept.astype(jnp.int32),
                nfe + tab.evals_per_step,
                best, last)

    t_f, y_f, _f, _h, steps, acc, nfe, best, last = jax.lax.while_loop(
        cond, body, init)
    t_la, h_la, y_la = last
    y_t1 = _final_interp(func, tab, params, t_la, jnp.maximum(h_la, 1e-30),
                         y_la, t1_)
    y_t1 = tree_where(acc > 0, y_t1, y0)
    # if max_test_steps was hit before reaching t1, report the state reached
    # (the reference interpolates to rk_state.t1, early_stop_solver.py:86)
    y_out = tree_where(t_f >= t1_, y_t1, y_f)
    stats = {
        "nfe": nfe,
        "accepted": acc,
        "rejected": steps - acc,
        "hit_max_steps": (t_f < t1_),
        "t_final": t_f,
    }
    return y_out, best, stats
