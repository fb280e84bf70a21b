"""Shell 7x5 non-square band-control case — configuration transcribed from
/root/reference/MPC-Tuning/Shell7x5.m:28-204.

7 outputs, 3 MVs, 2 MDs; all OV weights zero => pure band control through
soft output constraints with per-output ECR softening and ScaleFactors.
"""

from __future__ import annotations

import numpy as np

from mpc_tuning_tpu.cases._common import ref_trajectory
from mpc_tuning_tpu.models import lti, plants
from mpc_tuning_tpu.tuning.api import LinearCase, TuningResult, mpc_tuning

NIT = 200
TS = 4.0
INK = 10
TMD = 20  # measured-disturbance entry step (Shell7x5.m:121)
NBP, NBC = 7, 4
W_PARETO = np.array([1e-4, 1e-4, 1.0, 0.5, 1.0, 0.5, 1.0])  # Shell7x5.m:202

YMN = np.array([-0.005, -0.005, -0.5, -0.5, -0.5, -0.5, -0.5])
YMX = np.array([0.005, 0.005, 0.5, 0.5, 0.5, 0.5, 0.5])
UMX = np.array([0.5, 0.5, 0.5])


def make_case(nit: int = NIT, nbp: int = NBP, nbc: int = NBC) -> LinearCase:
    p = plants.shell7x5()

    Xsp = np.zeros((nit, 7))  # band control: no setpoints (Shell7x5.m:117)
    mdv = np.zeros((nit, 2))
    mdv[TMD - 1 :, :] = 0.5  # Shell7x5.m:122-123

    # impulse-shaped Yref from the expected MD rejection (Shell7x5.m:125-133)
    pref_rows = [[lti.tf([1.0], [50.0, 1.0]) if i == j else lti.tf([0.0], [1.0])
                  for j in range(7)] for i in range(7)]
    # Pref.iodelay = diag(min over the FULL [G D] row delays) (Shell7x5.m:115)
    pref = lti.TransferFunction(pref_rows).set_iodelay(
        np.diag(p.full.iodelay.min(axis=1))
    )
    Xref = np.zeros((nit, 7))
    for i in range(7):
        Xref[TMD - 1 : TMD + 5, i] = YMX[i]
    Yref = ref_trajectory(pref, Xref, TS)

    # ECR softening (Shell7x5.m:155-165)
    v_ecr = np.ones(7)
    v_ecr[0] = 0.1
    v_ecr[1] = 0.5

    return LinearCase(
        name="Shell7x5",
        plant=p.full, n_mv=3, n_md=2, Ts=TS,
        Xsp=Xsp, Yref=Yref, mdv=mdv, nit=nit,
        w=W_PARETO,
        umin=-UMX, umax=UMX,
        dumin=np.full(3, -1e30), dumax=np.full(3, 1e30),  # no rate limits set
        ymin=YMN, ymax=YMX,
        v_ymin=v_ecr, v_ymax=v_ecr,
        ov_weight0=np.zeros(7),  # pure band control (Shell7x5.m:188)
        mvrate_weight0=np.array([0.1, 0.1, 0.1]),
        rho_eps=10000.0,  # Shell7x5.m:189
        sf_u=UMX - (-UMX),  # ScaleFactors from ranges (Shell7x5.m:168-183)
        sf_y=YMX - YMN,
        sf_v=np.array([0.5, 0.5]),
        nbp=nbp, nbc=nbc,
    )


def final_simulation(case: LinearCase, res: TuningResult, nominal: bool = True,
                     nit: int | None = None):
    nit = nit or case.nit
    real = plants.shell7x5() if nominal else plants.shell7x5(0.2, 0.2, 0.3, 0.5, 0.5)
    prob = res.problem
    plant_c = real.full.scaled(res.L, res.R).c2d(case.Ts).to_ss()
    from mpc_tuning_tpu.sim.mpc_loop import MPCLoop

    loop = MPCLoop(ctl=prob.loop.ctl, plant_ss=plant_c)
    # simulate at the tuner's own QP budget (prob.qp_iters — e.g. the band
    # case tunes at 60 iters; the 30-iter cold default under-converges the
    # degenerate band QP at aggressive tuned lambda and can violate hard
    # MV bounds)
    y_c, u_c = loop.simulate(prob.r, prob.v, nit, res.N, int(np.max(res.Nu)),
                             res.delta, res.lam, qp_iters=prob.qp_iters,
                             qp_method="pdip_ws_lanes+lp20+split12")
    y = (np.linalg.inv(res.L) @ y_c.T).T
    u = u_c * res.Ru[None, :]
    return y, u


def run(nominal: bool = True, nit: int = NIT, **tuner_kwargs):
    """Driver = tune -> final sim -> open-vs-closed horizon verification
    (non-square pulse protocol, Shell7x5.m:242-291)."""
    from mpc_tuning_tpu.cases.verify_horizons import verify_horizons

    # the band-control QP (tight +-0.005 bands, ~600 soft rows) needs more
    # interior-point iterations than the tracking cases
    tuner_kwargs.setdefault("qp_iters", 60)
    case = make_case(nit=nit)
    res = mpc_tuning(case, **tuner_kwargs)
    y, u = final_simulation(case, res, nominal=nominal)
    check = verify_horizons(res.problem.loop, res.L, res.N,
                            int(np.max(res.Nu)), res.delta, res.lam,
                            v_const=res.problem.v[-1])
    return case, res, (y, u), check
