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


def certify(c, cand, f, h, nu=3):
    """LP+frozen-QP certified optimum: (z_star, eps_min, du_sens).

    eps_min is EXACT (scipy HiGHS LP; the band QP's optimal slack equals
    it to O(lam^2/rho_eps)).  du is certified by the frozen-slack QP
    re-solve; du_sens measures |du(ehat) - du(ehat(1+1e-6))| — on the
    degenerate steps near-parallel band rows make du's sensitivity to
    the frozen slack ~1e6, so du there is genuinely ill-posed at any
    fixed tolerance (the same degeneracy that cycles Goldfarb-Idnani);
    engines are gated on du only where du_sens is small, and on
    eps + feasibility + objective elsewhere."""
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

    from mpc_tuning_tpu.sim.mpc_loop import _eps_split_stage2, _seed_slack

    slack_col = c["G0"][:, -1]
    cj = {"G0": G0j}
    candj = {"rmask": rm, "cmask_z": cm, "H": Hj}

    # engine-chain emulations along the production QP sequence: the
    # '+lp<K>+split<S>' chain (seeded warm LP -> own-ehat freeze ->
    # stage 2 from the LP state) and the production '+split15' chain
    # (warm joint stage 1 -> own-ehat -> stage 2 from stage-1 state)
    chains = {f"lp{K}s{S}": {"K": K, "S": S}
              for K in (8, 10, 12, 16) for S in (8, 10, 12)}
    chains["split15"] = {"K": None, "S": 15}
    ws0 = (jnp.zeros(n), jnp.ones(mc), jnp.ones(mc))
    state = {name: ws0 for name in chains}
    Gd = np.asarray(rm_ := np.asarray(rm))[:, None] * np.asarray(G0j) \
        * np.asarray(cm)[None, :]
    H_np = np.asarray(Hj)
    rows = []
    for k, (f, h) in enumerate(qps):
        z_star, eps_min, du_sens = certify(c, cand, f, h)
        well_posed = du_sens is not None and du_sens < 1e-4
        du_star = None if z_star is None else z_star[:nu]
        hj = jnp.asarray(h)
        fj = jnp.asarray(f)
        rec = {"k": k, "eps_min": eps_min, "du_sens": du_sens,
               "well_posed": well_posed}

        def solve_true(h_, cmask_, init_, iters_):
            return solve_qp_masked(Hj, fj, G0j, T2j, rm, cmask_, h_,
                                   iters=iters_, init=init_)

        for name, cfg in chains.items():
            z0, l0, s0 = state[name]
            if cfg["K"] is None:  # production joint stage 1 (60 warm)
                z1, l1, s1 = solve_true(hj, cm, (z0, l0, s0), 60)
            else:
                z0, l0 = _seed_slack(z0, l0, cj, candj, hj)
                z1, l1, s1 = solve_qp_masked(Hlp, flp, G0j, T2j, rm, cm,
                                             hj, iters=cfg["K"],
                                             init=(z0, l0, s0))
            state[name] = (z1, l1, s1)
            z2 = _eps_split_stage2(solve_true, z1, l1, s1, cj, candj, hj,
                                   cfg["S"])
            if du_star is not None and well_posed:
                rec[f"{name}_du"] = float(
                    np.abs(np.asarray(z2[:nu]) - du_star).max())
            elif du_star is not None:
                # ill-posed du: gate optimality by OBJECTIVE + feasibility
                # at the engine's own slack (immune to du multiplicity)
                z2n = np.asarray(z2)
                obj_e = 0.5 * z2n @ H_np @ z2n + f @ z2n
                zs = np.asarray(z_star)
                obj_a = 0.5 * zs @ H_np @ zs + f @ zs
                rec[f"{name}_dobj"] = float(obj_e - obj_a)
            if cfg["K"] is not None and eps_min is not None:
                rec[f"{name}_deps"] = float(
                    abs(float(z1[-1]) - eps_min) / (1.0 + abs(eps_min)))
        rows.append(rec)

    # summary
    out = {"nit": len(rows),
           "n_certified": sum(r["eps_min"] is not None for r in rows),
           "eps_pos_steps": sum(1 for r in rows
                                if r["eps_min"] and r["eps_min"] > 1e-9)}
    out["well_posed_steps"] = sum(1 for r in rows if r.get("well_posed"))
    for name in chains:
        for suff in ("du", "deps", "dobj"):
            vals = [r.get(f"{name}_{suff}") for r in rows
                    if r.get(f"{name}_{suff}") is not None]
            if vals:
                out[f"{name}_max_{suff}"] = max(vals)
    print(json.dumps(out, indent=1))
    worst = sorted(rows, key=lambda r: -(r.get("lp12s10_du") or 0))[:8]
    for r in worst:
        print(json.dumps({k2: (round(v, 10) if isinstance(v, float) else v)
                          for k2, v in r.items()}))


if __name__ == "__main__":
    main()
