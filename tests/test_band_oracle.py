"""Independent full-loop oracle for the Shell7x5 BAND case (round-3
VERDICT missing item 3 / next item 6).

Two chaos-immune STEPWISE pins along the production trajectory (a
free-running trajectory comparison cannot hold tight tolerances here:
the band loop amplifies ulps ~100x/step once the tight +-0.005 bands
activate, tests/test_caps.py):

  1. PLANT replay — an independent FOPDT channel-bank plant (analytic ZOH
     incl. the fractional 27/4-sample delays) driven by the production U
     must reproduce the production Y at every step (measured 1.6e-15);
  2. CONTROL replay — an independent estimator (closed-form DARE gain) +
     step-response prediction (the MatG construction) + band/ECR QP
     assembled from the documented MATLAB formulation, solved by the
     native Goldfarb-Idnani active set WITH an independent KKT
     certificate, must reproduce the production control move at every
     CERTIFIED step (measured 3e-9 with the production eps-split engine;
     the joint engines stalled 5e-2 away before round 4's split).

GI cycles on the remaining degenerate steps (large optimal ECR slack,
near-parallel band rows — PARITY.md band-QP notes).  Round 5 closes that
coverage gap with the LP+frozen-QP arbiter (ops/band_cert.py): scipy's
exact LP certifies the ECR slack on EVERY step, du is certified where it
is well-posed (its sensitivity to the frozen slack is ~1e4-1e6 on the
degenerate steps — the same degeneracy that cycles GI — so du there is
gated by feasibility + objective optimality instead).  The GI stepwise
gate below is kept for the steps GI can still certify with eps == 0 (the
well-conditioned joint QPs, where 1e-6 exactness is meaningful).

Reference semantics: Shell7x5.m:296-310 closed loop with the
Shell7x5.m:100-189 band/ECR/ScaleFactor settings via the toolbox `sim`
(closedloop_toolbox.m:50).
"""

import numpy as np
import pytest
import jax.numpy as jnp

from mpc_tuning_tpu.cases import shell7x5
from mpc_tuning_tpu.cases.cross_eval import REF_TUNED
from mpc_tuning_tpu.ops.native_qp import qp_solve_exact
from mpc_tuning_tpu.tuning.api import build_problem

from wb_oracle import (ChannelBank, M_GAIN, band_qp_assemble,
                       shell7x5_conditioned_data)

NIT = 80  # covers the MD entry at k=20 and the band-active phase
MIN_CERTIFIED = 12  # GI certifies ~20/80 steps on this workload


def _gi_certified(H, f, G, h):
    """Native GI solve + independent KKT certificate; None if either
    fails (the certificate never trusts the solver)."""
    try:
        z, lam, status = qp_solve_exact(H, f, G, h)
    except Exception:
        return None
    if status != 0:
        return None
    kkt = H @ z + f + G.T @ np.maximum(lam, 0.0)
    if (np.linalg.norm(kkt) < 1e-6 * (1 + np.linalg.norm(f))
            and np.all(G @ z - h <= 1e-7 * (1 + np.abs(h)))):
        return z
    return None


def _production_run(problem, ref, mismatch: bool, nit: int):
    loop = problem.loop
    if mismatch:
        from mpc_tuning_tpu.models import plants
        from mpc_tuning_tpu.sim.mpc_loop import MPCLoop

        real = plants.shell7x5(0.2, 0.2, 0.3, 0.5, 0.5)
        plant_c = real.full.scaled(np.diag(ref.L), np.diag(ref.R)).c2d(
            4.0).to_ss()
        loop = MPCLoop(ctl=loop.ctl, plant_ss=plant_c)
    y, u = loop.simulate(problem.r, problem.v, nit, int(ref.N),
                         int(ref.Nu.max()), ref.delta, ref.lam,
                         qp_method="pdip_ws_lanes+lp20+split12", qp_iters=60)
    return np.asarray(y), np.asarray(u)


def _stepwise_errors(problem, ref, mismatch: bool, nit: int = NIT):
    Yp, Up = _production_run(problem, ref, mismatch, nit)
    spec = problem.loop.ctl.spec
    N, Nu = int(ref.N), int(ref.Nu.max())
    ny, nu = 7, 3
    Lc, Rc = np.asarray(ref.L), np.asarray(ref.R)

    model = ChannelBank(*shell7x5_conditioned_data(Lc, Rc), 4.0)
    plant = ChannelBank(*shell7x5_conditioned_data(Lc, Rc,
                                                   mismatch=mismatch), 4.0)
    # scaled->conditioned maps (the spec carries conditioned-frame
    # ScaleFactors already: sf_u = case.sf_u/Ru, sf_y = case.sf_y*diag(L))
    lam_eff = np.asarray(ref.lam) / np.asarray(spec.sf_u)
    v_eff = np.asarray(spec.v_ymax) * np.asarray(spec.sf_y)
    umax_c = 0.5 / Rc[:nu]
    ymin_c = Lc * shell7x5.YMN
    ymax_c = Lc * shell7x5.YMX

    # dynamic matrix from model step responses (MatG.m construction)
    s = np.stack([model.step_response(j, N) for j in range(nu)], axis=-1)
    Theta = np.zeros((N, ny, Nu, nu))
    for i in range(N):
        for t in range(min(i + 1, Nu)):
            Theta[i, :, t, :] = s[i - t]
    Theta = Theta.reshape(N * ny, Nu * nu)

    v = np.asarray(problem.v[:nit])
    r = np.asarray(problem.r[:nit])
    dhat = np.zeros(ny)
    u_prev = np.zeros(nu)
    e_plant = 0.0
    e_u = 0.0
    n_cert = 0
    for k in range(nit):
        yk = Yp[k]
        e_plant = max(e_plant, float(np.abs(plant.output() - yk).max()))
        innov = yk - (model.output() + dhat)
        dhat = dhat + M_GAIN * innov
        free = model.free_response(np.concatenate([u_prev, v[k]]), N) \
            + dhat[None, :]
        H, f, G, h = band_qp_assemble(
            Theta, free, r[k], u_prev, lam_eff, umax_c, v_eff,
            ymin_c, ymax_c, spec.rho_eps, N, Nu, ny, nu)
        z = _gi_certified(H, f, G, h)
        # tight e_u gate only where the joint QP is well-conditioned
        # (eps == 0): with a positive optimal slack, du's sensitivity to
        # eps is ~1e4-1e6 (ops/band_cert.py) and 1e-6 exactness is not a
        # meaningful bar — those steps are certified by the LP arbiter
        # test instead.
        if z is not None and abs(float(z[-1])) <= 1e-9:
            n_cert += 1
            u = u_prev + z[:nu]
            e_u = max(e_u, float(np.abs(u - Up[k]).max()))
        # follow the PRODUCTION trajectory (stepwise pin, no compounding)
        u_prev = Up[k]
        uin = np.concatenate([u_prev, v[k]])
        model.step(uin)
        plant.step(uin)
    return e_plant, e_u, n_cert


@pytest.fixture(scope="module")
def band_problem():
    ref = REF_TUNED["Shell7x5"]
    case = shell7x5.make_case(nit=NIT)
    problem, _ = build_problem(case, dtype=jnp.float64, qp_iters=60,
                               L=np.diag(ref.L), R=np.diag(ref.R))
    return problem, ref


def test_band_full_loop_oracle_nominal(band_problem):
    problem, ref = band_problem
    e_plant, e_u, n_cert = _stepwise_errors(problem, ref, mismatch=False)
    assert e_plant < 1e-6, f"plant replay mismatch {e_plant}"
    assert n_cert >= MIN_CERTIFIED, f"only {n_cert} certified steps"
    assert e_u < 1e-6, f"control-move mismatch {e_u} over {n_cert} steps"


def test_band_full_loop_oracle_mismatch_plant(band_problem):
    problem, ref = band_problem
    e_plant, e_u, n_cert = _stepwise_errors(problem, ref, mismatch=True)
    assert e_plant < 1e-6, f"plant replay mismatch {e_plant}"
    assert n_cert >= MIN_CERTIFIED, f"only {n_cert} certified steps"
    assert e_u < 1e-6, f"control-move mismatch {e_u} over {n_cert} steps"


def test_band_lp_certified_every_step(band_problem):
    """Round-5 full-coverage gate (ops/band_cert.py): along the
    production trajectory, the production '+lp20+split12' chain must pin
    the ECR slack to the EXACT LP minimum on every step (<= 1e-6
    relative), reproduce the certified du where du is well-posed, and be
    objective-optimal on the degenerate (ill-posed-du) steps."""
    from mpc_tuning_tpu.ops.band_cert import engine_step_errors, harvest_qps

    problem, ref = band_problem
    _, Up = _production_run(problem, ref, mismatch=False, nit=NIT)
    qps, c, cand = harvest_qps(problem, int(ref.N), int(ref.Nu.max()),
                               ref.delta, ref.lam, Up, NIT)
    out = engine_step_errors(problem, qps, c, cand, lp_iters=20,
                             s2_iters=12)
    assert out["n_steps"] == NIT
    assert out["n_eps_pos"] > 20, out  # the band-active phase is covered
    assert out["deps_rel"] < 1e-6, out
    assert out["du_well_posed"] < 1e-3, out
    assert out["dobj_ill_posed"] < 1e-6, out
