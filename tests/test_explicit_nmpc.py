"""Explicit NMPC demo engine: tracks the main.m staircase under state
measurement noise with the reference's fixed tuning."""

import numpy as np
import pytest

from mpc_tuning_tpu.cases import vandevusse_explicit as vex


@pytest.mark.slow
def test_explicit_nmpc_tracks_staircase():
    r, y, u = vex.run(nit=100, seed=0, substeps=6, sqp_iters=4, qp_iters=20)
    assert np.all(np.isfinite(y)) and np.all(np.isfinite(u))
    # bounds (main.m:42-48)
    assert np.all(u[:, 0] >= -1e-6) and np.all(u[:, 0] <= 150 + 1e-6)
    assert np.all(u[:, 1] >= 40 - 1e-6) and np.all(u[:, 1] <= 150 + 1e-6)
    # the 1.2 mol/l Cb setpoint is beyond the reactor's reachable maximum
    # (~1.09 at this operating region) — the demo commands it deliberately;
    # the controller must push toward it without instability
    assert np.mean(y[38:48, 0]) > 1.05
    # after the step down at k=50, tracks the reachable 1.0 setpoint
    assert abs(np.mean(y[90:, 0]) - 1.0) < 0.05
    # temperature loop reaches 130 after its step at k=81
    assert abs(np.mean(y[95:, 1]) - 130.0) < 0.5


@pytest.mark.slow
def test_explicit_nmpc_noise_free_deterministic():
    r1, y1, u1 = vex.run(nit=40, seed=1, noise=0.0, substeps=6, sqp_iters=4,
                         qp_iters=20)
    r2, y2, u2 = vex.run(nit=40, seed=2, noise=0.0, substeps=6, sqp_iters=4,
                         qp_iters=20)
    # with zero noise the seed must not matter (determinism check)
    np.testing.assert_allclose(y1, y2, atol=0)
