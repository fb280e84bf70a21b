"""Parity utilities: misc helpers, demos with reference tunings, the
horizon-sanity verification protocol, checkpoint roundtrip."""

import numpy as np
import pytest

from mpc_tuning_tpu.ops.misc import col2row, dnml, nml, precon, row2col
from mpc_tuning_tpu.utils.io import load_tuning, save_tuning


def test_precon():
    assert precon([10, 20, 30], [5, 10, 20]) is False  # min(N)=10 !> max=20
    assert precon([25, 25], [5, 10]) is True
    assert precon([25, 0], [5, 2]) is False


def test_nml_roundtrip():
    x = np.array([1.0, 2.5, 4.0])
    n = nml(x, 1.0, 4.0)
    np.testing.assert_allclose(n, [0, 0.5, 1.0])
    np.testing.assert_allclose(dnml(n, 1.0, 4.0), x)


def test_orientation_helpers():
    a = np.ones((5, 2))
    assert col2row(a).shape == (2, 5)
    assert row2col(col2row(a)).shape == (5, 2)


def test_checkpoint_roundtrip(tmp_path):
    p = save_tuning(tmp_path, "Case", 24, [6, 2, 2], [0.1, 0.2, 0.3],
                    [1e-4, 2e-4, 3e-4], np.eye(3), np.eye(3), [1.0, 2.0])
    d = load_tuning(p)
    assert int(np.max(d["N"])) == 24
    np.testing.assert_array_equal(d["Nu"], [6, 2, 2])


@pytest.mark.slow
def test_shell3x3_demo_reference_tuning():
    """MPC_Lineal_Shell3x3.m: run the committed tuned values in closed loop;
    must track the staircase offset-free in raw units."""
    from mpc_tuning_tpu.cases.demos import shell3x3_demo

    case, t, (y, u) = shell3x3_demo(nit=300)
    assert np.all(np.isfinite(y))
    # first staircase level 0.2 tracked before the setpoint change at k=80
    np.testing.assert_allclose(y[75], case.Xsp[75], atol=0.02)
    # hard input bounds respected (scaled by the committed R)
    assert np.all(u <= 0.5 + 1e-6) and np.all(u >= -1.0 - 1e-6)


@pytest.mark.slow
def test_vdv_demo_reference_tuning():
    from mpc_tuning_tpu.cases.demos import vandevusse_demo

    case, t, (y, u) = vandevusse_demo(nit=60)
    assert abs(y[-1, 0] - 1.0) < 0.05
    assert abs(y[35, 0] - 1.0) < 0.05


@pytest.mark.slow
def test_horizon_verification_protocol():
    """WoodBerry.m:186-232: good horizons -> open and closed loop coincide;
    absurdly short horizons -> visible mismatch."""
    import jax.numpy as jnp
    from mpc_tuning_tpu.cases import woodberry
    from mpc_tuning_tpu.cases.verify_horizons import verify_horizons
    from mpc_tuning_tpu.tuning.api import build_problem

    case = woodberry.make_case(nit=100, nbp=6, nbc=3)
    problem, (L, R, *_ ) = build_problem(case, dtype=jnp.float64)
    good = verify_horizons(problem.loop, L, N=30, Nu=8,
                           delta=[1.0, 1.0], lam=[0.1, 0.1], nit=60)
    bad = verify_horizons(problem.loop, L, N=4, Nu=2,
                          delta=[1.0, 1.0], lam=[0.1, 0.1], nit=60)
    assert good.ok, good.mismatch
    assert bad.mismatch.max() > good.mismatch.max()


def test_profiling_rate_and_stopwatch():
    """utils/profiling: honest device-synced timing helpers."""
    import jax.numpy as jnp

    from mpc_tuning_tpu.utils.profiling import Stopwatch, rate_of

    def f(x):
        return jnp.sin(x) @ x

    x = jnp.ones((64, 64))
    rate, dt = rate_of(f, x, reps=2, items=64)
    assert rate > 0 and dt > 0
    sw = Stopwatch().tic()
    y = f(x)
    assert sw.toc(sync_on=y) > 0
