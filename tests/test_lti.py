"""L1 tests: ZOH discretization (incl. fractional delays), state-space
aggregation, rollout equivalence, dc gains."""

import numpy as np
import pytest

from mpc_tuning_tpu.models import lti, plants, simulate


def fo_analytic(K, tau, Ts):
    p = np.exp(-Ts / tau)
    return -p, K * (1 - p)  # a1, b1


def test_c2d_first_order_integer_delay():
    K, tau, Ts, theta = 12.8, 16.7, 1.0, 1.0
    ch = lti.c2d_channel([K], [tau, 1.0], theta, Ts)
    a1, b1 = fo_analytic(K, tau, Ts)
    assert ch.l == 1 and ch.frac == 0.0
    np.testing.assert_allclose(ch.a, [1.0, a1], rtol=1e-12)
    np.testing.assert_allclose(ch.b, [0.0, b1], rtol=1e-12)


def test_c2d_fractional_delay_matches_fine_grid():
    # discretize K/(tau s+1) with theta=8.1 at Ts=1 and compare with a
    # fine-grid (Ts/100) simulation of the same ZOH input
    K, tau, Ts, theta = 3.8, 14.9, 1.0, 8.1
    sub = 100
    ch = lti.c2d_channel([K], [tau, 1.0], theta, Ts)
    assert ch.l == 8 and abs(ch.frac - 0.1) < 1e-9

    rng = np.random.default_rng(0)
    T = 60
    u = rng.standard_normal(T)

    # coarse: aggregated SS
    dtf = lti.DiscreteTF([[ch]], Ts)
    ss = dtf.to_ss()
    y_coarse = simulate.dlsim(ss, u.reshape(-1, 1))[:, 0]

    # fine grid: delay is an integer number of fine steps (8.1*100 = 810)
    chf = lti.c2d_channel([K], [tau, 1.0], theta, Ts / sub)
    ssf = lti.DiscreteTF([[chf]], Ts / sub).to_ss()
    uf = np.repeat(u, sub).reshape(-1, 1)
    y_fine = simulate.dlsim(ssf, uf)[:, 0][::sub]

    np.testing.assert_allclose(y_coarse, y_fine, atol=1e-9)


def test_step_response_polynomials_vs_ss():
    ch = lti.c2d_channel([4.05], [50.0, 1.0], 27.0, 4.0)  # fractional (6.75)
    n = 30
    y_poly = ch.step(n)
    ss = lti.DiscreteTF([[ch]], 4.0).to_ss()
    y_ss = simulate.dlsim(ss, np.ones((n + 1, 1)))[:, 0]
    np.testing.assert_allclose(y_poly, y_ss, atol=1e-10)
    # delay: first nonzero sample strictly after floor(27/4)=6
    assert np.all(np.abs(y_poly[:7]) < 1e-12)
    assert abs(y_poly[8]) > 0


def test_wood_berry_dcgain():
    p = plants.wood_berry()
    np.testing.assert_allclose(
        p.G.dcgain(), [[12.8, -18.9], [6.6, -19.4]], rtol=1e-12
    )
    full = p.full
    assert full.shape == (2, 3)
    np.testing.assert_allclose(full.dcgain()[:, 2], [3.8, 4.9], rtol=1e-12)


def test_mimo_aggregate_equals_channel_sum():
    p = plants.wood_berry()
    dtf = p.full.c2d(1.0)
    ss = dtf.to_ss()
    rng = np.random.default_rng(1)
    T = 80
    U = rng.standard_normal((T, 3))
    Y = simulate.dlsim(ss, U)
    # channel-by-channel superposition
    Yref = np.zeros((T, 2))
    for i in range(2):
        for j in range(3):
            chan = lti.DiscreteTF([[dtf.channels[i][j]]], 1.0).to_ss()
            Yref[:, i] += simulate.dlsim(chan, U[:, j : j + 1])[:, 0]
    np.testing.assert_allclose(Y, Yref, atol=1e-9)


def test_dlsim_jax_matches_numpy():
    import jax.numpy as jnp

    p = plants.shell3x3()
    ss = p.G.c2d(4.0).to_ss()
    rng = np.random.default_rng(2)
    U = rng.standard_normal((50, 3))
    Y_np = simulate.dlsim(ss, U)
    Y_jax, _ = simulate.dlsim_jax(
        jnp.array(ss.A), jnp.array(ss.B), jnp.array(ss.C), jnp.array(ss.D), jnp.array(U)
    )
    np.testing.assert_allclose(np.asarray(Y_jax), Y_np, atol=1e-9)


def test_scaled_conditioning():
    p = plants.wood_berry()
    L = np.diag([0.5, 2.0])
    R = np.diag([1.5, 0.25])
    K = p.G.scaled(L, R).dcgain()
    np.testing.assert_allclose(K, L @ p.G.dcgain() @ R, rtol=1e-12)


def test_descomp_zero_gain_row_max_delay():
    z = lti.tf([0.0], [1.0, 1.0])
    g = lti.tf([1.0], [10.0, 1.0], 5.0)
    P = lti.TransferFunction([[g, z]])
    dtf = P.c2d(1.0)
    _, _, d = dtf.descomp()
    assert d[0, 1] == d[0, 0] == 5
