"""Per-step band-QP diagnostic along the production Shell7x5 trajectory.

Teacher-forces the PRODUCTION (split15, f64) control trajectory through a
host-side replica of sim/mpc_loop.closed_loop_core's step recursion, so
every visited QP is exactly the production one, then at every step:

  * certifies the optimum with the LP+frozen-QP arbiter: scipy linprog
    (HiGHS) gives the minimal ECR slack eps_min (exact — the band QP's
    objective is lam^2-move-suppression + rho_eps*eps^2 with
    rho_eps>=1e4, so its optimal slack equals eps_min to
    O(lam^2/rho_eps); see ops/mpc_qp assemble_candidate H_lp notes), and
    the slack-frozen QP re-solve is strictly convex in the remaining
    coordinates — THIS certifies the degenerate steps the
    Goldfarb-Idnani arbiter cycles on (tests/test_band_oracle.py);
  * measures how many warm-started stage-0 LP iterations the production
    PDIP needs to pin eps to eps_min, and how many warm-started stage-2
    iterations to reproduce the certified du — the data that sets the
    '+lp<K>+split<S>' production budgets.

Reference semantics: the per-step QP of closedloop_toolbox.m:50 at the
Shell7x5.m:100-189 band/ECR settings.
"""
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from scipy.optimize import linprog  # noqa: E402

from mpc_tuning_tpu.cases import shell7x5  # noqa: E402
from mpc_tuning_tpu.cases.cross_eval import REF_TUNED  # noqa: E402
from mpc_tuning_tpu.ops.mpc_qp import assemble_candidate, qp_step_data  # noqa: E402
from mpc_tuning_tpu.ops.qp import solve_qp_masked  # noqa: E402
from mpc_tuning_tpu.tuning.api import build_problem  # noqa: E402

NIT = 80


def harvest_qps(problem, ref, nit=NIT):
    """Replicate the production step recursion (teacher-forced U) and
    yield (f, h) per step plus shared (c, cand)."""
    loop = problem.loop
    y_p, u_p = loop.simulate(problem.r, problem.v, nit, int(ref.N),
                             int(ref.Nu.max()), ref.delta, ref.lam,
                             qp_method="pdip_ws_lanes+split15", qp_iters=60)
    d = loop.dims
    c = {k: np.asarray(v) for k, v in loop.arrays(jnp.float64).items()}
    cand = assemble_candidate(
        {k: jnp.asarray(v) for k, v in c.items()}, jnp.asarray(int(ref.N)),
        jnp.asarray(int(ref.Nu.max())), jnp.asarray(ref.delta, jnp.float64),
        jnp.asarray(ref.lam, jnp.float64), d["p_max"], d["m_max"], d["ny"],
        d["nu"], d["rho"], d["with_y"])
    cand = {k: np.asarray(v) if not isinstance(v, tuple) else v
            for k, v in cand.items()}

    nxp = c["A_pl"].shape[0]
    nxa = c["A"].shape[0]
    nu = d["nu"]
    x_pl = np.zeros(nxp)
    x_hat_pred = np.zeros(nxa)
    u_prev = np.zeros(nu)
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
            {k2: jnp.asarray(v2) for k2, v2 in c.items()},
            {k2: jnp.asarray(v2) for k2, v2 in cand.items()
             if k2 != "admm"},
            jnp.asarray(x_hat), jnp.asarray(u_prev), jnp.asarray(r_s),
            jnp.asarray(v_s), d["p_max"], d["m_max"], d["ny"], d["nu"],
            d["with_y"])
        qps.append((np.asarray(f), np.asarray(h)))
        # teacher-force the production move
        u_s = np.asarray(u_p[k]) / sf_u
        x_hat_pred = c["A"] @ x_hat + c["Bu"] @ u_s + (
            c["Bv"] @ v_s if v.shape[1] else 0.0)
        x_pl = c["A_pl"] @ x_pl + c["B_pl"] @ np.concatenate(
            [np.asarray(u_p[k]), v[k]])
        u_prev = u_s
    return qps, c, cand, np.asarray(u_p)


def certify(c, cand, f, h, sigma=0.0):
    """LP+frozen-QP certified optimum: (z_star, eps_min).  Exact up to
    O(lam^2/rho_eps) in eps and solver tolerance in du."""
    G0 = c["G0"]
    rmask, cmask = cand["rmask"], cand["cmask_z"]
    Gd = rmask[:, None] * G0 * cmask[None, :]
    n = G0.shape[1]
    cobj = np.zeros(n)
    cobj[-1] = 1.0
    res = linprog(cobj, A_ub=Gd, b_ub=h, bounds=[(None, None)] * n,
                  method="highs")
    if res.status != 0:
        return None, None
    eps_min = float(res.x[-1])
    # frozen-slack QP re-solve (strictly convex in du)
    ehat = max(eps_min, 0.0) * (1.0 + 1e-10) + 1e-12
    slack_col = G0[:, -1]
    h2 = h - slack_col * rmask * ehat
    cmask2 = cmask.copy()
    cmask2[-1] = 0.0
    z, _, _ = solve_qp_masked(
        jnp.asarray(cand["H"]), jnp.asarray(f), jnp.asarray(G0),
        jnp.asarray(c["T2"]), jnp.asarray(rmask), jnp.asarray(cmask2),
        jnp.asarray(h2), iters=200)
    return np.asarray(z), eps_min


def main():
    ref = REF_TUNED["Shell7x5"]
    case = shell7x5.make_case(nit=NIT)
    problem, _ = build_problem(case, dtype=jnp.float64, qp_iters=60,
                               L=np.diag(ref.L), R=np.diag(ref.R))
    qps, c, cand, u_p = harvest_qps(problem, ref)
    d = problem.loop.dims
    nu = d["nu"]

    G0j = jnp.asarray(c["G0"])
    T2j = jnp.asarray(c["T2"])
    rm = jnp.asarray(cand["rmask"])
    cm = jnp.asarray(cand["cmask_z"])
    Hj = jnp.asarray(cand["H"])
    Hlp = jnp.asarray(cand["H_lp"])
    flp = jnp.asarray(cand["f_lp"])

    n = c["G0"].shape[1]
    mc = c["G0"].shape[0]

    lp_budgets = (8, 12, 16, 20, 30)
    s2_budgets = (8, 15, 25, 40)
    ws_lp = (jnp.zeros(n), jnp.ones(mc), jnp.ones(mc))
    ws_lp_k = {K: ws_lp for K in lp_budgets}
    ws_s2_k = {S: ws_lp for S in s2_budgets}
    rows = []
    for k, (f, h) in enumerate(qps):
        z_star, eps_min = certify(c, cand, f, h)
        du_star = None if z_star is None else z_star[:nu]
        hj = jnp.asarray(h)
        fj = jnp.asarray(f)
        rec = {"k": k, "eps_min": eps_min}
        # warm LP accuracy per budget
        for K in lp_budgets:
            z1, l1, s1 = solve_qp_masked(Hlp, flp, G0j, T2j, rm, cm, hj,
                                         iters=K, init=ws_lp_k[K])
            ws_lp_k[K] = (z1, l1, s1)
            if eps_min is not None:
                rec[f"lp{K}_deps"] = float(abs(float(z1[-1]) - eps_min))
        # warm stage-2 accuracy per budget, using the CERTIFIED ehat
        if eps_min is not None:
            ehat = max(eps_min, 0.0) * (1.0 + 1e-6) + 1e-8
            slack_col = c["G0"][:, -1]
            h2 = jnp.asarray(h - slack_col * cand["rmask"] * ehat)
            cm2 = jnp.asarray(
                np.concatenate([cand["cmask_z"][:-1], [0.0]]))
            for S in s2_budgets:
                z2, l2, s2 = solve_qp_masked(Hj, fj, G0j, T2j, rm, cm2, h2,
                                             iters=S, init=ws_s2_k[S])
                ws_s2_k[S] = (z2, l2, s2)
                if du_star is not None:
                    rec[f"s2_{S}_du"] = float(
                        np.abs(np.asarray(z2[:nu]) - du_star).max())
        rows.append(rec)

    # summary
    out = {"nit": len(rows),
           "n_certified": sum(r["eps_min"] is not None for r in rows),
           "eps_pos_steps": sum(1 for r in rows
                                if r["eps_min"] and r["eps_min"] > 1e-9)}
    for K in lp_budgets:
        vals = [r.get(f"lp{K}_deps") for r in rows
                if r.get(f"lp{K}_deps") is not None]
        out[f"lp{K}_max_deps"] = max(vals) if vals else None
    for S in s2_budgets:
        vals = [r.get(f"s2_{S}_du") for r in rows
                if r.get(f"s2_{S}_du") is not None]
        out[f"s2_{S}_max_du"] = max(vals) if vals else None
    print(json.dumps(out, indent=1))
    worst = sorted(rows, key=lambda r: -(r.get("lp12_deps") or 0))[:8]
    for r in worst:
        print(json.dumps({k2: (round(v, 10) if isinstance(v, float) else v)
                          for k2, v in r.items()}))


if __name__ == "__main__":
    main()
