"""Toolbox-equivalent linear MPC loop: analytic unconstrained QP check,
offset-free tracking (with and without model error), constraint activity,
open-loop vs closed-loop horizon sanity (WoodBerry.m:186-232 semantics)."""

import numpy as np
import pytest
import jax.numpy as jnp

from mpc_tuning_tpu.models import plants
from mpc_tuning_tpu.ops import condmin as cm
from mpc_tuning_tpu.ops.mpc_qp import (
    MPCSpec, build_controller, controller_arrays, assemble_candidate, qp_step_data,
)
from mpc_tuning_tpu.ops.qp import solve_qp
from mpc_tuning_tpu.sim.mpc_loop import MPCLoop


def _wb_loop(p_max=32, m_max=8, deltak=0.0, rest=True):
    """Conditioned Wood-Berry MPC setup following WoodBerry.m:118-125 and
    MPCTuning.m:152-200 (CondMin over the full [G D] gain matrix)."""
    nominal = plants.wood_berry()
    real = plants.wood_berry(deltak=deltak)
    K = nominal.full.dcgain()
    L, R, _ = cm.condmin(K)
    Ru = np.diag(R)[:2]

    model_c = nominal.full.scaled(L, R).c2d(1.0).to_ss()
    plant_c = real.full.scaled(L, R).c2d(1.0).to_ss()

    big = 1e30
    if rest:
        umax = 0.5 / Ru
        dumax = 0.05 / Ru
    else:
        umax = np.full(2, big)
        dumax = np.full(2, big)
    spec = MPCSpec(
        model=model_c, n_mv=2, n_md=1, p_max=p_max, m_max=m_max,
        umin=-umax, umax=umax, dumin=-dumax, dumax=dumax,
        ymin=np.full(2, -np.inf), ymax=np.full(2, np.inf),
    )
    ctl = build_controller(spec)
    return MPCLoop(ctl=ctl, plant_ss=plant_c), L, Ru


def test_unconstrained_qp_matches_least_squares():
    loop, L, _ = _wb_loop(rest=False)
    c = loop.arrays()
    d = loop.dims
    N, Nu = 20, 4
    delta = jnp.array([1.0, 1.0]); lam = jnp.array([0.3, 0.3])
    cand = assemble_candidate(c, N, Nu, delta, lam, d["p_max"], d["m_max"],
                              d["ny"], d["nu"], d["rho"], d["with_y"])
    rng = np.random.default_rng(0)
    x_hat = jnp.array(rng.standard_normal(c["A"].shape[0]) * 0.1)
    u_prev = jnp.array(rng.standard_normal(2) * 0.1)
    r_s = jnp.array([0.4, 0.2]); v_s = jnp.zeros(1)
    f, h, _ = qp_step_data(c, cand, x_hat, u_prev, r_s, v_s,
                           d["p_max"], d["m_max"], d["ny"], d["nu"], d["with_y"])
    z, _, _ = solve_qp(cand["H"], f, cand["G"], h)
    # analytic unconstrained optimum of the du block
    H = np.asarray(cand["H"])[:-1, :-1]
    z_ref = np.linalg.solve(H, -np.asarray(f)[:-1])
    np.testing.assert_allclose(np.asarray(z)[:-1], z_ref, atol=1e-6)


def test_offset_free_tracking_nominal():
    loop, L, _ = _wb_loop()
    nit = 250
    r = np.zeros((nit, 2))
    r[10:, 0] = (L @ [0.8, 0.0])[0]
    r[120:, 1] = (L @ [0.0, 0.5])[1]
    r[120:, 0] = (L @ [0.8, 0.0])[0]
    v = np.zeros((nit, 1))
    y, u = loop.simulate(r, v, nit, 20, 4, [1.0, 1.0], [0.1, 0.1])
    np.testing.assert_allclose(y[-1], r[-1], atol=1e-4)


def test_offset_free_under_model_error():
    # 15% gain error on the true plant: the output-disturbance Kalman must
    # still deliver offset-free steady state
    loop, L, _ = _wb_loop(deltak=0.15)
    nit = 300
    r = np.zeros((nit, 2))
    r[10:, 0] = (L @ [0.5, 0.0])[0]
    v = np.zeros((nit, 1))
    y, u = loop.simulate(r, v, nit, 20, 4, [1.0, 1.0], [0.1, 0.1])
    np.testing.assert_allclose(y[-1], r[-1], atol=1e-4)


def test_disturbance_rejection_md():
    loop, L, _ = _wb_loop()
    nit = 300
    r = np.zeros((nit, 2))
    v = np.zeros((nit, 1))
    v[50:, 0] = -0.25  # conditioned md step
    y, u = loop.simulate(r, v, nit, 20, 4, [1.0, 1.0], [0.1, 0.1])
    assert np.abs(y[60]).max() > 1e-3  # disturbance visibly hits
    np.testing.assert_allclose(y[-1], [0.0, 0.0], atol=1e-4)


def test_rate_and_amplitude_constraints_respected():
    loop, L, Ru = _wb_loop()
    nit = 120
    r = np.zeros((nit, 2))
    r[5:, 0] = (L @ [0.8, 0.0])[0]
    r[5:, 1] = (L @ [0.0, 0.5])[1]
    v = np.zeros((nit, 1))
    y, u = loop.simulate(r, v, nit, 20, 4, [1.0, 1.0], [0.01, 0.01])
    du = np.diff(u, axis=0, prepend=0.0)
    assert np.all(np.abs(u) <= 0.5 / Ru + 1e-6)
    assert np.all(np.abs(du) <= 0.05 / Ru + 1e-6)
    # rate constraint actually active somewhere in the transient
    assert np.any(np.abs(du) > 0.05 / Ru - 1e-4)


def test_no_preview_non_anticipatory():
    """sim()-semantics pin (PARITY.md 'preview question'): the reference's
    active path holds r/v constant over the horizon (the author's
    equivalent manual loop passes single rows to mpcmove,
    closedloop_toolbox.m:72), so the closed loop must NOT move before the
    first nonzero setpoint sample reaches the controller.  A previewing
    controller acts up to p steps early (measured |dU| = 0.88 on this
    exact setup) — this test discriminates the two semantics."""
    loop, L, _ = _wb_loop()
    nit = 60
    kstep = 25
    r = np.zeros((nit, 2))
    r[kstep:, 0] = (L @ [0.8, 0.0])[0]
    v = np.zeros((nit, 1))
    y, u = loop.simulate(r, v, nit, 20, 4, [1.0, 1.0], [0.1, 0.1])
    # PDIP returns denormal-level (~1e-46) residue on the all-zero QP; a
    # previewing controller would act at ~1e-1 up to p steps early
    assert np.abs(u[:kstep]).max() < 1e-20
    assert np.abs(y[: kstep + 1]).max() < 1e-20  # y(k) measured before u(k) acts
    assert np.abs(u[kstep]).max() > 1e-3  # and it does move AT the step


def test_open_loop_matches_closed_loop_good_horizons():
    # WoodBerry.m:186-232: with generous horizons the single-shot optimal
    # sequence played out should nearly coincide with the receding-horizon
    # response
    loop, L, _ = _wb_loop(p_max=40, m_max=16)
    nit = 80
    r_fin = np.asarray(L @ np.array([1.0, 1.0]))
    r = np.tile(r_fin, (nit, 1))
    v = np.zeros((nit, 1))
    N, Nu = 35, 10
    y, u = loop.simulate(r, v, nit, N, Nu, [1.0, 1.0], [0.1, 0.1])
    ys, uopt = loop.open_loop(r_fin, np.zeros(1), v, nit, N, Nu, [1.0, 1.0], [0.1, 0.1])
    # same shape of response (loose tolerance: receding horizon corrects)
    err = np.abs(y - ys).max()
    scale = np.abs(ys).max()
    assert err < 0.15 * scale, (err, scale)
