"""Fixed-step Adams multistep solvers (explicit AB4, implicit ABM4 PECE).

Covers the reference's 'explicit_adams' / 'implicit_adams' torchdiffeq
methods exercised by the explicit/implicit solver experiment
(/root/reference/src/run_explicit_implicit_exp.py): Adams–Bashforth order 4
and Adams–Bashforth–Moulton predictor-corrector, both as a lax.scan with an
RK4 startup and an f-history carry — differentiable by backprop through the
scan like the other fixed-grid methods.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from graph_neural_pde_tpu.solvers.fixed import time_grid
from graph_neural_pde_tpu.solvers.rk import rk_step
from graph_neural_pde_tpu.solvers.tableaus import RK4

# Adams–Bashforth orders 1..4 (leading coefficient first = f_n)
_AB = {
    1: (1.0,),
    2: (3.0 / 2.0, -1.0 / 2.0),
    3: (23.0 / 12.0, -16.0 / 12.0, 5.0 / 12.0),
    4: (55.0 / 24.0, -59.0 / 24.0, 37.0 / 24.0, -9.0 / 24.0),
}
# Adams–Moulton order 4 corrector: coefficient of f_{n+1} first
_AM4 = (9.0 / 24.0, 19.0 / 24.0, -5.0 / 24.0, 1.0 / 24.0)


def _stack_history(trees):
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *trees)


def _hist_get(hist, i):
    return jax.tree_util.tree_map(lambda h: h[i], hist)


def _hist_push(hist, new):
    """Shift history down and insert `new` at index 0."""
    return jax.tree_util.tree_map(
        lambda h, x: jnp.concatenate([x[None], h[:-1]], axis=0), hist, new)


def _lincomb_hist(y, h, coeffs, hist, extra=None):
    out = y
    if extra is not None:
        c0, rest = coeffs[0], coeffs[1:]
        out = jax.tree_util.tree_map(lambda o, f: o + h * c0 * f, out, extra)
    else:
        rest = coeffs
    for i, c in enumerate(rest):
        fi = _hist_get(hist, i)
        out = jax.tree_util.tree_map(lambda o, f: o + h * c * f, out, fi)
    return out


def odeint_adams(func: Callable, params, y0, t0: float, t1: float, *,
                 step_size: float, order: int = 4, implicit: bool = False,
                 corrector_iters: int = 1):
    """Integrate with AB{order} (or ABM{order} PECE when implicit=True).

    Returns (y(t1), stats). The grid matches torchdiffeq's fixed-grid
    construction; the first order-1 steps run RK4 to build the f history.
    """
    assert 1 <= order <= 4
    ts = time_grid(t0, t1, step_size)
    t_arr = jnp.asarray(ts, jnp.float32)
    dt_arr = t_arr[1:] - t_arr[:-1]
    n_steps = len(ts) - 1
    startup = min(order - 1, n_steps)

    nfe = 0
    y = y0
    fs = []
    # startup: RK4 steps, recording f at each grid point
    for i in range(startup):
        f_i = func(params, t_arr[i], y)
        fs.append(f_i)
        y, _f1, _e, _ks = rk_step(func, params, t_arr[i], y, f_i,
                                  dt_arr[i], RK4)
        nfe += 4
    f_cur = func(params, t_arr[startup], y)
    nfe += 1
    hist = _stack_history([f_cur] + fs[::-1][: order - 1] +
                          [f_cur] * max(0, order - 1 - len(fs)))

    ab = _AB[order]

    def step(carry, t_dt):
        y, hist, nfe = carry
        t, dt = t_dt
        # predict (AB). Barrier each state fed to func so the history
        # combination can't fuse into the RHS's edge gather (see fixed.py).
        y_pred = jax.lax.optimization_barrier(_lincomb_hist(y, dt, ab, hist))
        if implicit:
            y_next = y_pred
            for _ in range(corrector_iters):
                f_new = func(params, t + dt, y_next)
                y_next = _lincomb_hist(y, dt, _AM4[1:], hist, extra=None)
                y_next = jax.tree_util.tree_map(
                    lambda o, f: o + dt * _AM4[0] * f, y_next, f_new)
                y_next = jax.lax.optimization_barrier(y_next)
            f_next = func(params, t + dt, y_next)
            nfe = nfe + corrector_iters + 1
        else:
            y_next = y_pred
            f_next = func(params, t + dt, y_next)
            nfe = nfe + 1
        return (y_next, _hist_push(hist, f_next), nfe), None

    (yT, _hist, nfe_scan), _ = jax.lax.scan(
        step, (y, hist, jnp.asarray(nfe, jnp.int32)),
        (t_arr[startup:-1], dt_arr[startup:]))
    stats = {
        "nfe": nfe_scan,
        "accepted": jnp.asarray(n_steps, jnp.int32),
        "rejected": jnp.asarray(0, jnp.int32),
        "hit_max_steps": jnp.asarray(False),
        "t_final": jnp.asarray(t1, jnp.float32),
    }
    return yT, stats
