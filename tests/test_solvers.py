"""Solver-accuracy tests against closed-form solutions and scipy.

The reference outsources solver correctness to torchdiffeq's own suite; here
the integrators are from scratch, so they are tested directly (SURVEY.md §4):
linear ODEs with exact exponential solutions, dense-output interpolation
identities, gradient checks for all three gradient paths (scan backprop,
discrete adjoint through the adaptive plan, continuous adjoint).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graph_neural_pde_tpu.solvers.api import SolverOptions, odeint
from graph_neural_pde_tpu.solvers.fixed import time_grid
from graph_neural_pde_tpu.solvers.rk import hermite_mid, interp_eval, interp_fit
from graph_neural_pde_tpu.solvers.tableaus import TABLEAUS


def linear_func(params, t, y):
    # dy/dt = A y with A = params
    return y @ params.T


def make_problem():
    a = np.array([[-0.6, 0.4], [0.1, -0.3]], np.float32)
    y0 = np.array([[1.0, -0.5], [0.2, 0.8], [0.0, 1.0]], np.float32)
    return jnp.asarray(a), jnp.asarray(y0)


def exact(a, y0, T):
    import scipy.linalg
    return np.asarray(y0) @ scipy.linalg.expm(np.asarray(a).T * T)


class TestTimeGrid:
    def test_exact_multiple(self):
        assert time_grid(0.0, 5.0, 1.0) == [0.0, 1.0, 2.0, 3.0, 4.0, 5.0]

    def test_overshoot_clamped(self):
        ts = time_grid(0.0, 18.29, 1.0)
        assert len(ts) == 20 and ts[-1] == 18.29 and ts[18] == 18.0


class TestFixedSolvers:
    @pytest.mark.parametrize("method,tol", [
        ("euler", 2e-2), ("midpoint", 2e-4), ("heun2", 2e-4), ("rk4", 1e-6),
    ])
    def test_linear_system(self, method, tol):
        a, y0 = make_problem()
        T = 2.0
        opts = SolverOptions(method=method, step_size=0.05)
        y1, stats = odeint(linear_func, a, y0, 0.0, T, opts)
        np.testing.assert_allclose(np.asarray(y1), exact(a, y0, T),
                                   atol=tol, rtol=tol)
        assert int(stats["nfe"]) == int(stats["accepted"]) * TABLEAUS[method].num_stages

    def test_trajectory_output(self):
        from graph_neural_pde_tpu.solvers.fixed import odeint_fixed
        a, y0 = make_problem()
        traj, _ = odeint_fixed(linear_func, a, y0, 0.0, 1.0, step_size=0.25,
                               tab=TABLEAUS["rk4"], return_trajectory=True)
        assert traj.shape[0] == 5
        np.testing.assert_allclose(np.asarray(traj[0]), np.asarray(y0))
        np.testing.assert_allclose(np.asarray(traj[-1]), exact(a, y0, 1.0),
                                   rtol=1e-5, atol=1e-6)


class TestAdaptiveSolvers:
    @pytest.mark.parametrize("method,tol", [
        ("dopri5", 1e-5), ("bosh3", 1e-4), ("adaptive_heun", 1e-3),
    ])
    def test_linear_system(self, method, tol):
        a, y0 = make_problem()
        T = 3.0
        opts = SolverOptions(method=method, rtol=1e-7, atol=1e-8, max_steps=5000)
        y1, stats = odeint(linear_func, a, y0, 0.0, T, opts)
        np.testing.assert_allclose(np.asarray(y1), exact(a, y0, T),
                                   atol=tol, rtol=tol)
        assert not bool(stats["hit_max_steps"])
        assert float(stats["t_final"]) >= T

    def test_nfe_accounting_dopri5(self):
        a, y0 = make_problem()
        opts = SolverOptions(method="dopri5", rtol=1e-6, atol=1e-6, max_steps=1000)
        _, stats = odeint(linear_func, a, y0, 0.0, 1.0, opts)
        # 1 (f0) + 1 (init-step probe) + 6 per attempted step (FSAL)
        attempts = int(stats["accepted"]) + int(stats["rejected"])
        assert int(stats["nfe"]) == 2 + 6 * attempts

    def test_max_steps_flag(self):
        a, y0 = make_problem()
        opts = SolverOptions(method="dopri5", rtol=1e-12, atol=1e-14, max_steps=5)
        _, stats = odeint(linear_func, a, y0, 0.0, 50.0, opts)
        assert bool(stats["hit_max_steps"])

    def test_tuple_state(self):
        # integrate (y, r) with r' = mean(y^2) — the regulariser pattern
        a, y0 = make_problem()

        def func(params, t, state):
            y, r = state
            return (y @ params.T, jnp.mean(y * y, axis=1))

        r0 = jnp.zeros((y0.shape[0],))
        opts = SolverOptions(method="dopri5", rtol=1e-7, atol=1e-8, max_steps=2000)
        (y1, r1), _ = odeint(func, a, (y0, r0), 0.0, 1.0, opts)
        np.testing.assert_allclose(np.asarray(y1), exact(a, y0, 1.0),
                                   rtol=1e-4, atol=1e-5)
        assert (np.asarray(r1) > 0).all()


class TestInterpolation:
    def test_quartic_identities(self):
        rng = np.random.default_rng(0)
        y0, y1, ym, f0, f1 = [jnp.asarray(rng.normal(size=(4,)).astype(np.float32))
                              for _ in range(5)]
        h = 0.7
        coeffs = interp_fit(y0, y1, ym, f0, f1, h)
        np.testing.assert_allclose(np.asarray(interp_eval(y0, f0, coeffs, h, 0.0)),
                                   np.asarray(y0), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(interp_eval(y0, f0, coeffs, h, 1.0)),
                                   np.asarray(y1), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(interp_eval(y0, f0, coeffs, h, 0.5)),
                                   np.asarray(ym), rtol=1e-4, atol=1e-5)
    def test_reproduces_known_quartic(self):
        """Fitting data sampled from a quartic must reproduce it everywhere."""
        h = 0.8
        c = np.array([0.3, -1.2, 0.7, 2.0, -0.5], np.float32)  # c0..c4 in x

        def p(x):
            return sum(ci * x ** i for i, ci in enumerate(c))

        def dp_dx(x):
            return sum(i * ci * x ** (i - 1) for i, ci in enumerate(c) if i > 0)

        y0 = jnp.array([p(0.0)]); y1 = jnp.array([p(1.0)])
        ym = jnp.array([p(0.5)])
        f0 = jnp.array([dp_dx(0.0) / h]); f1 = jnp.array([dp_dx(1.0) / h])
        coeffs = interp_fit(y0, y1, ym, f0, f1, h)
        for x in (0.13, 0.42, 0.77, 0.95):
            got = float(interp_eval(y0, f0, coeffs, h, x)[0])
            assert got == pytest.approx(p(x), rel=1e-4, abs=1e-4)

    def test_final_interp_matches_exact(self):
        """y(T) from overshoot+interp should still be accurate."""
        a, y0 = make_problem()
        for T in (0.37, 1.83, 2.5):
            opts = SolverOptions(method="dopri5", rtol=1e-7, atol=1e-8,
                                 max_steps=2000)
            y1, _ = odeint(linear_func, a, y0, 0.0, T, opts)
            np.testing.assert_allclose(np.asarray(y1), exact(a, y0, T),
                                       rtol=1e-4, atol=1e-5)


class TestGradients:
    def analytic_grad(self, a, y0, T):
        """d sum(y(T)) / d y0 = ones @ expm(A^T T)^T; d/dA via finite diff."""
        import scipy.linalg
        e = scipy.linalg.expm(np.asarray(a).T * T)
        return np.ones_like(np.asarray(y0)) @ e.T

    @pytest.mark.parametrize("method", ["rk4", "dopri5"])
    def test_grad_y0(self, method):
        a, y0 = make_problem()
        T = 1.5
        opts = SolverOptions(method=method, step_size=0.05, rtol=1e-7,
                             atol=1e-8, max_steps=2000)

        def loss(y0_):
            y1, _ = odeint(linear_func, a, y0_, 0.0, T, opts)
            return jnp.sum(y1)

        g = jax.grad(loss)(y0)
        np.testing.assert_allclose(np.asarray(g), self.analytic_grad(a, y0, T),
                                   rtol=1e-3, atol=1e-4)

    @pytest.mark.parametrize("method", ["rk4", "dopri5"])
    def test_grad_params_fd(self, method):
        a, y0 = make_problem()
        T = 1.0
        opts = SolverOptions(method=method, step_size=0.1, rtol=1e-7,
                             atol=1e-8, max_steps=2000)

        def loss(a_):
            y1, _ = odeint(linear_func, a_, y0, 0.0, T, opts)
            return jnp.sum(y1 * y1)

        g = np.asarray(jax.grad(loss)(a))
        # central finite differences
        fd = np.zeros_like(g)
        eps = 1e-3
        for i in range(2):
            for j in range(2):
                ap = np.asarray(a).copy(); ap[i, j] += eps
                am = np.asarray(a).copy(); am[i, j] -= eps
                fd[i, j] = (float(loss(jnp.asarray(ap))) -
                            float(loss(jnp.asarray(am)))) / (2 * eps)
        np.testing.assert_allclose(g, fd, rtol=2e-2, atol=2e-3)

    @pytest.mark.parametrize("fwd,bwd", [
        ("dopri5", "dopri5"), ("rk4", "rk4"), ("dopri5", "adaptive_heun"),
    ])
    def test_continuous_adjoint(self, fwd, bwd):
        a, y0 = make_problem()
        T = 1.5
        opts = SolverOptions(method=fwd, step_size=0.05, rtol=1e-7, atol=1e-8,
                             max_steps=2000)
        # low-order adaptive bwd methods need a large step budget at tight tol
        bwd_opts = SolverOptions(method=bwd, step_size=0.05, rtol=1e-8,
                                 atol=1e-9, max_steps=40000)

        def loss(y0_):
            y1, _ = odeint(linear_func, a, y0_, 0.0, T, opts,
                           adjoint=True, adjoint_opts=bwd_opts)
            return jnp.sum(y1)

        g = jax.grad(loss)(y0)
        np.testing.assert_allclose(np.asarray(g), self.analytic_grad(a, y0, T),
                                   rtol=1e-3, atol=1e-3)

    def test_adjoint_params_matches_direct(self):
        a, y0 = make_problem()
        T = 1.0
        opts = SolverOptions(method="dopri5", rtol=1e-8, atol=1e-9, max_steps=4000)

        def loss_direct(a_):
            y1, _ = odeint(linear_func, a_, y0, 0.0, T, opts)
            return jnp.sum(y1 * y1)

        def loss_adj(a_):
            y1, _ = odeint(linear_func, a_, y0, 0.0, T, opts, adjoint=True,
                           adjoint_opts=opts)
            return jnp.sum(y1 * y1)

        gd = np.asarray(jax.grad(loss_direct)(a))
        ga = np.asarray(jax.grad(loss_adj)(a))
        np.testing.assert_allclose(gd, ga, rtol=1e-3, atol=1e-4)

    def test_grad_inside_jit(self):
        a, y0 = make_problem()
        opts = SolverOptions(method="dopri5", rtol=1e-6, atol=1e-7, max_steps=1000)

        @jax.jit
        def step(a_):
            def loss(a__):
                y1, _ = odeint(linear_func, a__, y0, 0.0, 1.0, opts)
                return jnp.sum(y1)
            return jax.grad(loss)(a_)

        g1 = step(a)
        g2 = jax.grad(lambda a_: jnp.sum(odeint(linear_func, a_, y0, 0.0, 1.0, opts)[0]))(a)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-5)


class TestHermiteMid:
    def test_cubic_exact(self):
        # for a cubic polynomial trajectory the hermite midpoint is exact
        h = 1.0
        y0 = jnp.array([0.0]); f0 = jnp.array([1.0])   # y = t + t^2
        y1 = jnp.array([2.0]); f1 = jnp.array([3.0])
        ym = hermite_mid(y0, y1, f0, f1, h)
        np.testing.assert_allclose(np.asarray(ym), [0.75], atol=1e-6)
