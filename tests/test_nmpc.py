"""NMPC engine: ODE/integrator accuracy vs scipy LSODA, steady state,
closed-loop tracking with the reference's committed tuned parameters
(N=3, Nu=[2 2], delta=[0.0930 0.1133], lambda=[0.2460 0.1231] from
VanDeVusse_NMPC_Tuning_25Jul2023_11_04.mat, BASELINE.md)."""

import numpy as np
import pytest
import jax.numpy as jnp

from mpc_tuning_tpu.cases import vandevusse
from mpc_tuning_tpu.models.ode import (
    VDV_U0, VDV_X0, integrate, integrate_rk4, newton_steady_state,
    vandevusse_rhs,
)


def test_steady_state_matches_fsolve():
    x0 = np.asarray(newton_steady_state(vandevusse_rhs, VDV_X0, VDV_U0))
    # residual is zero
    f = np.asarray(vandevusse_rhs(jnp.array(x0), VDV_U0))
    np.testing.assert_allclose(f, 0.0, atol=1e-9)
    # fsolve moves from the guess [5.1, 1.1163, 130] to the true equilibrium
    # for u0=[20,130]: Ca ~ 1.25, Cb ~ 0.91, T ~ 135 (the reference's fsolve
    # at VanDeVusse_NMPC.m:72-79 lands on the same root)
    assert 0.8 < x0[1] < 1.2
    assert 125.0 < x0[2] < 140.0


def test_rk4_matches_scipy_lsoda():
    from scipy.integrate import solve_ivp

    x0 = np.array([5.1, 1.1163, 130.0])
    u = np.array([30.0, 120.0])
    Ts = 0.05
    sol = solve_ivp(
        lambda t, x: np.asarray(vandevusse_rhs(jnp.array(x), jnp.array(u))),
        [0, Ts], x0, method="LSODA", rtol=1e-10, atol=1e-12,
    )
    # convergence: default 10 substeps ~1e-4 rel (matches ode15s default
    # tolerances); 40 substeps tight
    x_10 = np.asarray(integrate_rk4(vandevusse_rhs, jnp.array(x0), jnp.array(u), Ts, 10))
    x_40 = np.asarray(integrate_rk4(vandevusse_rhs, jnp.array(x0), jnp.array(u), Ts, 40))
    np.testing.assert_allclose(x_10, sol.y[:, -1], rtol=2e-4)
    np.testing.assert_allclose(x_40, sol.y[:, -1], rtol=1e-6)


def test_tr_bdf2_matches_scipy_lsoda():
    from scipy.integrate import solve_ivp

    x0 = np.array([5.1, 1.1163, 130.0])
    u = np.array([30.0, 120.0])
    Ts = 0.05
    sol = solve_ivp(
        lambda t, x: np.asarray(vandevusse_rhs(jnp.array(x), jnp.array(u))),
        [0, Ts], x0, method="LSODA", rtol=1e-10, atol=1e-12,
    )
    x_10 = np.asarray(integrate(vandevusse_rhs, jnp.array(x0), jnp.array(u),
                                Ts, 10, "tr_bdf2"))
    x_40 = np.asarray(integrate(vandevusse_rhs, jnp.array(x0), jnp.array(u),
                                Ts, 40, "tr_bdf2"))
    # 2nd-order method: 10 substeps sits inside MATLAB's default RelTol=1e-3
    # ballpark for ode23t; 4x the substeps must cut the error ~16x
    err_10 = np.max(np.abs(x_10 - sol.y[:, -1]) / np.abs(sol.y[:, -1]))
    err_40 = np.max(np.abs(x_40 - sol.y[:, -1]) / np.abs(sol.y[:, -1]))
    assert err_10 < 1e-2
    assert err_40 < err_10 / 8.0


def test_tr_bdf2_stable_on_stiff_ode_where_rk4_blows_up():
    # dx/dt = -2000 x + u: explicit RK4 at dt=0.01 (lambda*dt = -20) diverges,
    # the L-stable TR-BDF2 step must decay monotonically to u/2000
    rhs = lambda x, u: -2000.0 * x + u
    x0 = jnp.array([1.0])
    u = jnp.array([1.0])
    x_imp = np.asarray(integrate(rhs, x0, u, 0.1, 10, "tr_bdf2"))
    x_exp = np.asarray(integrate(rhs, x0, u, 0.1, 10, "rk4"))
    assert abs(x_imp[0] - 1.0 / 2000.0) < 1e-6
    assert not np.all(np.abs(x_exp) < 1.0)  # RK4 diverged


def test_integrate_rejects_unknown_method():
    with pytest.raises(ValueError):
        integrate(vandevusse_rhs, VDV_X0, VDV_U0, 0.05, 10, "dopri")


@pytest.mark.slow
def test_nmpc_closed_loop_stiff_integrator():
    # same closed loop as the reference-tuning test but with the implicit
    # TR-BDF2 path (init.integrator=@ode15s slot, VanDeVusse_NMPC.m:85)
    case = vandevusse.make_case(nit=30, substeps=4, sqp_iters=3, qp_iters=20,
                                integrator="tr_bdf2")
    problem = vandevusse.build_problem(case)
    y, u = problem.loop.simulate(
        case.r[:30], problem.v, 30, 3, 2,
        np.array([0.0930, 0.1133]), np.array([0.2460, 0.1231]),
    )
    assert np.all(np.isfinite(y)) and np.all(np.isfinite(u))
    assert abs(y[-1, 0] - 1.0) < 0.1


@pytest.mark.slow
def test_nmpc_closed_loop_with_reference_tuning():
    case = vandevusse.make_case(nit=60, substeps=8, sqp_iters=4, qp_iters=25)
    problem = vandevusse.build_problem(case)
    # committed reference tuning artifacts (BASELINE.md)
    y, u = problem.loop.simulate(
        case.r, problem.v, case.nit, 3, 2,
        np.array([0.0930, 0.1133]), np.array([0.2460, 0.1231]),
    )
    assert np.all(np.isfinite(y)) and np.all(np.isfinite(u))
    # MV bounds respected
    assert np.all(u[:, 0] >= -1e-6) and np.all(u[:, 0] <= 150 + 1e-6)
    assert np.all(u[:, 1] >= 40 - 1e-6) and np.all(u[:, 1] <= 150 + 1e-6)
    # tracks Cb -> 1.0 after the step at k=10 and T -> 130
    assert abs(y[35, 0] - 1.0) < 0.05
    assert abs(y[-1, 0] - 1.0) < 0.05
    assert abs(y[-1, 1] - 130.0) < 2.0


@pytest.mark.slow
def test_vdv_tuning_reduced(tmp_path):
    case, res, (y, u) = vandevusse.run(
        nit=40, checkpoint_dir=str(tmp_path), verbose=False,
        gam_popsize=6, gam_generations=2, max_alternations=1,
    )
    assert res["N"] > int(np.max(res["Nu"])) >= 2
    assert np.all(np.isfinite(y))
