"""Case-study smoke runs with reduced budgets (full-budget runs are the
TPU bench/driver's job). Exercises: Shell3x3 square 3x3 tuning path,
Shell7x5 non-square band control with soft constraints + ScaleFactors."""

import numpy as np
import pytest

from mpc_tuning_tpu.cases import shell3x3, shell7x5, woodberry
from mpc_tuning_tpu.tuning.api import mpc_tuning


@pytest.mark.slow
def test_shell3x3_reduced(tmp_path):
    case = shell3x3.make_case(nit=150, nbp=5, nbc=3)
    res = mpc_tuning(case, qp_iters=20, gam_popsize=8, gam_generations=3,
                     max_alternations=1, checkpoint_dir=str(tmp_path),
                     verbose=False)
    assert res.N > int(np.max(res.Nu)) >= 2
    # conditioning should beat the committed reference artifacts' cond
    K = case.plant.dcgain()
    c_ref = np.linalg.cond(
        np.diag([0.4358, 0.4206, 0.5933]) @ K @ np.diag([0.6619, 0.2756, 0.4117])
    )
    assert res.cond_after <= c_ref + 1e-6
    y, u = shell3x3.final_simulation(case, res)
    assert np.all(np.isfinite(y)) and np.all(np.isfinite(u))
    # tracks the final staircase level in raw units
    assert np.abs(y[148] - case.Xsp[148]).max() < 0.15


@pytest.mark.slow
def test_shell7x5_band_control_reduced(tmp_path):
    case = shell7x5.make_case(nit=100, nbp=5, nbc=3)
    res = mpc_tuning(case, qp_iters=60, gam_popsize=8, gam_generations=3,
                     max_alternations=1, checkpoint_dir=str(tmp_path),
                     verbose=False)
    # band control: delta stays all-zero (Shell7x5 OV weights are zero)
    assert np.all(res.delta == 0.0)
    assert res.N > int(np.max(res.Nu)) >= 2
    y, u = shell7x5.final_simulation(case, res)
    assert np.all(np.isfinite(y))
    # MVs respect their hard bounds
    assert np.all(np.abs(u) <= 0.5 + 1e-6)
    # band outputs y1, y2 end inside (or near) their tight bands
    assert np.abs(y[-1, 0]) < 0.01
    assert np.abs(y[-1, 1]) < 0.01


def test_woodberry_case_shapes():
    case = woodberry.make_case()
    assert case.Xsp.shape == (400, 2)
    assert case.Yref.shape == (400, 2)
    assert case.mdv[299, 0] == -0.25
    assert case.mdv[298, 0] == 0.0
    # Yref follows first-order dynamics toward the setpoints
    assert 0.75 < case.Yref[180, 0] <= 0.8
