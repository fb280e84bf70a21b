"""Golden-trajectory regression pins (f64, CPU, deterministic).

Values frozen from the cross-validated implementation (DTC scan == literal
replay oracle to 1e-8; MPC loop == native active-set/f64 oracle).  These
catch silent numerical regressions in the full pipeline; loosen only with
an explicit re-validation against the oracles.
"""

import numpy as np
import pytest
import jax.numpy as jnp


@pytest.fixture(scope="module")
def dtc_run():
    from mpc_tuning_tpu.models import plants
    from mpc_tuning_tpu.ops.condmin import condmin
    from mpc_tuning_tpu.sim.gpc_loop import DTCGPC

    p = plants.wood_berry()
    L, R, S = condmin(p.G.dcgain())
    ctl = DTCGPC.build(plant=p.G, model=p.G, Ts=1.0,
                       p=np.array([3, 3]), m=np.array([3, 3]),
                       delta=np.ones(2), lam=np.ones(2), L=L, R=R,
                       n_md=1, disturbance=p.D)
    nit = 200
    r = np.zeros((nit, 2)); r[10:, 0] = 0.8; r[60:, 1] = 0.5
    q = np.zeros((nit, 1)); q[140:, 0] = -0.25
    y, u = ctl.simulate_scan(r, q, nit)
    return S, y, u


def test_condmin_golden(dtc_run):
    S, _, _ = dtc_run
    assert abs(S - 5.867104709382211) < 1e-6


def test_dtc_gpc_golden_trajectory(dtc_run):
    _, y, u = dtc_run
    golden_y = {
        20: [0.8442005638573443, -0.015721227082513],
        50: [0.7990676117264964, 0.0005700740602708754],
        100: [0.8006072207849793, 0.4996495290593158],
        150: [0.7818510394774294, 0.4910333786335758],
        199: [0.8003533859202205, 0.49984117073221146],
    }
    golden_u = {
        199: [0.01427702144219719, -0.08438679974599059],
    }
    for k, v in golden_y.items():
        np.testing.assert_allclose(y[k], v, atol=1e-6)
    for k, v in golden_u.items():
        np.testing.assert_allclose(u[k], v, atol=1e-6)


def test_toolbox_mpc_golden_trajectory():
    from mpc_tuning_tpu.cases import woodberry
    from mpc_tuning_tpu.tuning.api import build_problem

    case = woodberry.make_case(nit=200, nbp=6, nbc=3)
    problem, _ = build_problem(case, dtype=jnp.float64)
    y, u = problem.loop.simulate(problem.r, problem.v, 200, 20, 4,
                                 [1.0, 1.0], [0.1, 0.1], qp_iters=40)
    golden = {
        30: [0.3484025172843933, 0.0001996043561890426],
        100: [0.34858939109083287, 2.693270297532413e-06],
        199: [0.3485919719663405, 4.085759916505616e-08],
    }
    for k, v in golden.items():
        np.testing.assert_allclose(y[k], v, atol=1e-6)
