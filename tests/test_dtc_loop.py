"""DTC-GPC closed loop: the scan engine must match the literal O(nit^2)
replay oracle, and the Wood-Berry loop must track its setpoints
(configuration of /root/reference/DTC-GPC/DTC_GPC_WW.m:17-125)."""

import numpy as np
import pytest

from mpc_tuning_tpu.models import plants
from mpc_tuning_tpu.ops import condmin as cm
from mpc_tuning_tpu.sim.gpc_loop import DTCGPC


@pytest.fixture(scope="module")
def wb_controller():
    plant = plants.wood_berry()
    K = plant.G.dcgain()
    L, R, _ = cm.condmin(K)
    ctl = DTCGPC.build(
        plant=plant.G,
        model=plant.G,
        Ts=1.0,
        p=np.array([3, 3]),
        m=np.array([3, 3]),
        delta=np.array([1.0, 1.0]),
        lam=np.array([1.0, 1.0]),
        L=L,
        R=R,
        n_md=1,
        disturbance=plant.D,
    )
    return ctl


def _signals(nit=200):
    r = np.zeros((nit, 2))
    r[10:, 0] = 0.8
    r[60:, 1] = 0.5
    q = np.zeros((nit, 1))
    q[140:, 0] = -0.25
    return r, q


def test_scan_matches_reference_replay(wb_controller):
    nit = 120
    r, q = _signals(nit)
    y_ref, u_ref = wb_controller.simulate_ref(r, q, nit)
    y_scan, u_scan = wb_controller.simulate_scan(r, q, nit)
    np.testing.assert_allclose(y_scan, y_ref, atol=1e-8)
    np.testing.assert_allclose(u_scan, u_ref, atol=1e-8)


def test_scan_batch_matches_single(wb_controller):
    """The batched scenario-sweep scan (one lane per (r, q) profile — the
    on-chip GPC benchmark path) must equal per-scenario single scans."""
    ctl = wb_controller
    nit = 80
    rng = np.random.default_rng(0)
    B = 3
    r_b = np.zeros((B, nit, 2))
    q_b = np.zeros((B, nit, 1))
    for b in range(B):
        r_b[b, 5 + 10 * b:, 0] = 0.5 + 0.2 * b
        r_b[b, 40:, 1] = 0.3
        q_b[b, 60:, 0] = -0.1 * b
    Yb, Ub = ctl.simulate_scan_batch(r_b, q_b, nit)
    for b in range(B):
        y1, u1 = ctl.simulate_scan(r_b[b], q_b[b], nit)
        assert np.abs(np.asarray(Yb)[b] - y1).max() < 1e-12
        assert np.abs(np.asarray(Ub)[b] - u1).max() < 1e-12


def test_predictor_validation_flags_unstable_model():
    """mimofilter.m:48-64 equivalent: an unstable model pole must surface
    as a predictor-stability warning at build time; the nominal Wood-Berry
    build must not warn."""
    import warnings

    from mpc_tuning_tpu.models.lti import tf, tfm

    # unstable 2x2: one channel with a RHP pole (tau < 0 -> z-pole > 1)
    G_bad = tfm([
        [tf([1.0], [-5.0, 1.0], 1.0), tf([0.5], [8.0, 1.0], 1.0)],
        [tf([0.4], [6.0, 1.0], 1.0), tf([1.2], [7.0, 1.0], 1.0)],
    ])
    with pytest.warns(UserWarning, match="unstable"):
        DTCGPC.build(plant=G_bad, model=G_bad, Ts=1.0,
                     p=np.array([3, 3]), m=np.array([3, 3]),
                     delta=np.array([1.0, 1.0]), lam=np.array([1.0, 1.0]),
                     L=np.eye(2), R=np.eye(2))

    # nominal Wood-Berry: no predictor warnings (DC gain OK + stable)
    plant = plants.wood_berry()
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        DTCGPC.build(plant=plant.G, model=plant.G, Ts=1.0,
                     p=np.array([3, 3]), m=np.array([3, 3]),
                     delta=np.array([1.0, 1.0]), lam=np.array([1.0, 1.0]),
                     L=np.eye(2), R=np.eye(2), n_md=1, disturbance=plant.D)


def test_wood_berry_tracking_and_disturbance_rejection(wb_controller):
    nit = 200
    r, q = _signals(nit)
    y, u = wb_controller.simulate_scan(r, q, nit)
    # settled before the disturbance hits
    np.testing.assert_allclose(y[135], [0.8, 0.5], atol=5e-3)
    # recovers from the q=-0.25 feed disturbance by the end
    np.testing.assert_allclose(y[-1], [0.8, 0.5], atol=2e-2)
    # control stays bounded and converges
    assert np.all(np.abs(u) < 2.0)
    assert np.all(np.abs(u[-1] - u[-5]) < 1e-3)
