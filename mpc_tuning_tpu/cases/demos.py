"""Standalone controller demos with the reference's hardcoded tuned values
(checkpoint-reproduction path, no tuner in the loop).

 * Shell 3x3 linear MPC with the committed tuning N=24, Nu=[6 2 2],
   delta=[0.0107 0.0040 0.0008], lambda=[1e-4 6e-4 1.5e-3]
   (/root/reference/Matlab-Toolbox/MPC/MPC_Lineal_Shell3x3.m:152-155,
   matching Shell3x3_Tuning_25Jul2023_12_06.mat — BASELINE.md).
 * Van de Vusse NMPC with N=3, Nu=[2 2], delta=[0.0930 0.1133],
   lambda=[0.2460 0.1231]
   (/root/reference/Matlab-Toolbox/NMPC/VanDeVusse_NMPC.m:168-171).

These double as the reproduction path of the reference's `tuning=false`
reload branch (WoodBerry.m:163-178) when pointed at a saved checkpoint.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from mpc_tuning_tpu.utils.io import load_tuning

SHELL3X3_REF_TUNING = dict(
    N=24, Nu=np.array([6, 2, 2]),
    delta=np.array([0.010655, 0.0040421, 0.00079143]),
    lam=np.array([9.2519e-05, 0.00055259, 0.0015191]),
    L=np.diag([0.4358, 0.4206, 0.5933]),
    R=np.diag([0.6619, 0.2756, 0.4117]),
)

VDV_REF_TUNING = dict(
    N=3, Nu=np.array([2, 2]),
    delta=np.array([0.0930, 0.1133]),
    lam=np.array([0.2460, 0.1231]),
)


def shell3x3_demo(nit: int = 500, tuning: dict | None = None,
                  checkpoint: str | None = None, nominal: bool = True,
                  dtype=jnp.float64):
    """MPC_Lineal_Shell3x3.m equivalent: fixed tuning, closed loop, raw units."""
    from mpc_tuning_tpu.cases import shell3x3
    from mpc_tuning_tpu.sim.mpc_loop import MPCLoop
    from mpc_tuning_tpu.models import plants
    from mpc_tuning_tpu.tuning.api import build_problem

    t = dict(SHELL3X3_REF_TUNING)
    if checkpoint is not None:
        d = load_tuning(checkpoint)
        t.update(N=int(np.max(d["N"])), Nu=d["Nu"], delta=d["delta"],
                 lam=d["lam"], L=d["L"], R=d["R"])
    if tuning is not None:
        t.update(tuning)

    case = shell3x3.make_case(nit=nit)
    problem, _ = build_problem(case, dtype=dtype, L=t["L"], R=t["R"])
    real = plants.shell3x3() if nominal else plants.shell3x3(0.2, 0.2, 0.3)
    plant_c = real.G.scaled(t["L"], t["R"]).c2d(case.Ts).to_ss()
    loop = MPCLoop(ctl=problem.loop.ctl, plant_ss=plant_c)
    y_c, u_c = loop.simulate(problem.r, problem.v, nit,
                             int(t["N"]), int(np.max(t["Nu"])),
                             t["delta"], t["lam"], dtype=dtype)
    Ru = np.diag(t["R"])
    y = (np.linalg.inv(t["L"]) @ y_c.T).T
    u = u_c * Ru[None, :]
    return case, t, (y, u)


def vandevusse_demo(nit: int = 60, tuning: dict | None = None,
                    checkpoint: str | None = None, dtype=jnp.float64):
    """Matlab-Toolbox/NMPC/VanDeVusse_NMPC.m equivalent with fixed tuning."""
    from mpc_tuning_tpu.cases import vandevusse

    t = dict(VDV_REF_TUNING)
    if checkpoint is not None:
        d = load_tuning(checkpoint)
        t.update(N=int(np.max(d["N"])), Nu=d["Nu"], delta=d["delta"], lam=d["lam"])
    if tuning is not None:
        t.update(tuning)

    case = vandevusse.make_case(nit=nit)
    problem = vandevusse.build_problem(case, dtype)
    y, u = problem.loop.simulate(case.r, problem.v, nit,
                                 int(t["N"]), int(np.max(t["Nu"])),
                                 t["delta"], t["lam"], dtype=dtype)
    return case, t, (y, u)
