"""LP-certified band-QP arbiter + teacher-forced step harvester.

Closes the round-4 oracle coverage gap: the Goldfarb-Idnani arbiter
cycles on the degenerate Shell7x5 band steps (large optimal ECR slack,
near-parallel band rows), leaving them "recorded but ungated".  This
module certifies EVERY step:

  * eps (the ECR slack) via scipy HiGHS linprog — exact.  Band cases run
    all OV weights at zero (GAM_fun.m:58-72), so the per-step QP
    objective is lam^2-scale move suppression + rho_eps*eps^2
    (rho_eps >= 1e4, Shell7x5.m:189) and the joint optimum's slack
    equals the LP minimum:  measured against GI on every certifiable
    step, eps_gi == eps_min to machine precision except in the
    crossover regime (eps* = g/(2 rho_eps) slightly above an eps_min of
    0), which the engine's dual-based refinement pass covers
    (sim/mpc_loop._eps_split_stage2 refine_iters).
  * du via the slack-frozen QP re-solve — strictly convex, except that
    on the degenerate steps du's sensitivity to the frozen slack is
    ~1e4-1e6 (near-parallel band rows: the same degeneracy that cycles
    GI), so du there is genuinely ill-posed at any fixed tolerance.
    ``certify`` therefore also returns du_sens (|du(ehat) -
    du(ehat*(1+1e-6))|): engines are gated on du where du_sens is
    small and on eps + feasibility + OBJECTIVE optimality elsewhere.

Reference semantics: the per-step QP of
/root/reference/MPC-Tuning/MPC_Tuning/closedloop_toolbox.m:50 at the
Shell7x5.m:100-189 band/ECR/ScaleFactor settings.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from mpc_tuning_tpu.ops.mpc_qp import assemble_candidate, qp_step_data
from mpc_tuning_tpu.ops.qp import solve_qp_masked

__all__ = ["harvest_qps", "certify", "engine_step_errors"]


def harvest_qps(problem, N, Nu, delta, lam, u_traj, nit):
    """Teacher-force ``u_traj`` (unconditioned, e.g. a production run's U)
    through a host-side replica of sim/mpc_loop.closed_loop_core's step
    recursion; every visited QP is then exactly the one the production
    loop solved.  Returns (qps, c, cand) with qps = [(f, h)] per step."""
    loop = problem.loop
    d = loop.dims
    c = {k: np.asarray(v) for k, v in loop.arrays(jnp.float64).items()}
    cj = {k: jnp.asarray(v) for k, v in c.items()}
    cand = assemble_candidate(
        cj, jnp.asarray(int(N)), jnp.asarray(int(Nu)),
        jnp.asarray(delta, jnp.float64), jnp.asarray(lam, jnp.float64),
        d["p_max"], d["m_max"], d["ny"], d["nu"], d["rho"], d["with_y"])
    cand = {k: np.asarray(v) if not isinstance(v, tuple) else v
            for k, v in cand.items()}
    candj = {k: jnp.asarray(v) for k, v in cand.items() if k != "admm"}

    nxp = c["A_pl"].shape[0]
    nxa = c["A"].shape[0]
    nu_ = d["nu"]
    x_pl = np.zeros(nxp)
    x_hat_pred = np.zeros(nxa)
    u_prev = np.zeros(nu_)
    r = np.asarray(problem.r[:nit])
    v = np.asarray(problem.v[:nit])
    sf_y, sf_u, sf_v = c["sf_y"], c["sf_u"], c["sf_v"]
    qps = []
    for k in range(nit):
        y = c["C_pl"] @ x_pl
        y_s = y / sf_y
        v_s = v[k] / sf_v if v.shape[1] else v[k]
        r_s = r[k] / sf_y
        innov = y_s - c["C"] @ x_hat_pred - (
            c["Dv"] @ v_s if v.shape[1] else 0.0)
        x_hat = x_hat_pred + c["M"] @ innov
        f, h, _ = qp_step_data(
            cj, candj, jnp.asarray(x_hat), jnp.asarray(u_prev),
            jnp.asarray(r_s), jnp.asarray(v_s), d["p_max"], d["m_max"],
            d["ny"], d["nu"], d["with_y"])
        qps.append((np.asarray(f), np.asarray(h)))
        u_s = np.asarray(u_traj[k]) / sf_u
        x_hat_pred = c["A"] @ x_hat + c["Bu"] @ u_s + (
            c["Bv"] @ v_s if v.shape[1] else 0.0)
        x_pl = c["A_pl"] @ x_pl + c["B_pl"] @ np.concatenate(
            [np.asarray(u_traj[k]), v[k]])
        u_prev = u_s
    return qps, c, cand


def certify(c, cand, f, h, nu):
    """LP+frozen-QP certified optimum: (z_star, eps_min, du_sens), or
    (None, None, None) if the LP solver fails (never observed)."""
    from scipy.optimize import linprog

    G0 = c["G0"]
    rmask, cmask = cand["rmask"], cand["cmask_z"]
    Gd = rmask[:, None] * G0 * cmask[None, :]
    n = G0.shape[1]
    cobj = np.zeros(n)
    cobj[-1] = 1.0
    res = linprog(cobj, A_ub=Gd, b_ub=h, bounds=[(None, None)] * n,
                  method="highs")
    if res.status != 0:
        return None, None, None
    eps_min = float(res.x[-1])
    slack_col = G0[:, -1]
    cmask2 = cmask.copy()
    cmask2[-1] = 0.0

    def frozen(ehat):
        h2 = h - slack_col * rmask * ehat
        z, _, _ = solve_qp_masked(
            jnp.asarray(cand["H"]), jnp.asarray(f), jnp.asarray(G0),
            jnp.asarray(c["T2"]), jnp.asarray(rmask), jnp.asarray(cmask2),
            jnp.asarray(h2), iters=200)
        return np.asarray(z)

    e0 = max(eps_min, 0.0) * (1.0 + 1e-9) + 1e-11
    e1 = max(eps_min, 0.0) * (1.0 + 1e-6) + 1e-8
    z = frozen(e0)
    z1 = frozen(e1)
    du_sens = float(np.abs(z[:nu] - z1[:nu]).max())
    return z, eps_min, du_sens


def engine_step_errors(problem, qps, c, cand, lp_iters, s2_iters,
                       du_sens_bar=1e-4):
    """Replay the production '+lp' engine chain over the harvested QPs
    (teacher-forced, so per-step accuracy is measured chaos-free) and
    score it against the certified arbiter.

    Returns a dict with: max relative eps error over ALL steps; max du
    error over well-posed steps (du_sens < du_sens_bar); max objective
    excess over ill-posed steps; step counts."""
    from mpc_tuning_tpu.sim.mpc_loop import (_LP_REFINE_ITERS,
                                             _eps_split_stage2, _seed_slack)

    d = problem.loop.dims
    nu_ = d["nu"]
    G0j = jnp.asarray(c["G0"])
    T2j = jnp.asarray(c["T2"])
    rm = jnp.asarray(cand["rmask"])
    cm = jnp.asarray(cand["cmask_z"])
    Hj = jnp.asarray(cand["H"])
    Hlp = jnp.asarray(cand["H_lp"])
    flp = jnp.asarray(cand["f_lp"])
    H_np = np.asarray(cand["H"])
    n = c["G0"].shape[1]
    mc = c["G0"].shape[0]
    cj = {"G0": G0j}
    candj = {"rmask": rm, "cmask_z": cm, "H": Hj}

    state = (jnp.zeros(n), jnp.ones(mc), jnp.ones(mc))
    out = {"deps_rel": 0.0, "du_well_posed": 0.0, "dobj_ill_posed": 0.0,
           "n_steps": len(qps), "n_well_posed": 0, "n_eps_pos": 0}
    for f, h in qps:
        z_star, eps_min, du_sens = certify(c, cand, f, h, nu_)
        if z_star is None:
            continue
        well = du_sens < du_sens_bar
        out["n_well_posed"] += int(well)
        out["n_eps_pos"] += int(eps_min > 1e-9)
        hj = jnp.asarray(h)
        fj = jnp.asarray(f)

        def solve_true(h_, cmask_, init_, iters_):
            return solve_qp_masked(Hj, fj, G0j, T2j, rm, cmask_, h_,
                                   iters=iters_, init=init_)

        z0, l0, s0 = state
        z0, l0 = _seed_slack(z0, l0, cj, candj, hj)
        z1, l1, s1 = solve_qp_masked(Hlp, flp, G0j, T2j, rm, cm, hj,
                                     iters=lp_iters, init=(z0, l0, s0))
        state = (z1, l1, s1)
        z2 = _eps_split_stage2(solve_true, z1, l1, s1, cj, candj, hj,
                               s2_iters, refine_iters=_LP_REFINE_ITERS)
        out["deps_rel"] = max(
            out["deps_rel"],
            abs(float(z1[-1]) - eps_min) / (1.0 + abs(eps_min)))
        if well:
            out["du_well_posed"] = max(
                out["du_well_posed"],
                float(np.abs(np.asarray(z2[:nu_]) - z_star[:nu_]).max()))
        else:
            z2n = np.asarray(z2)
            obj_e = 0.5 * z2n @ H_np @ z2n + f @ z2n
            zs = np.asarray(z_star)
            obj_a = 0.5 * zs @ H_np @ zs + f @ zs
            out["dobj_ill_posed"] = max(out["dobj_ill_posed"],
                                        float(obj_e - obj_a))
    return out
