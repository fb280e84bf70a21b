"""QP-engine accuracy qualification at the TUNING-DECISION level.

The tuner never consumes trajectories directly — it consumes the VNS
objective F = sum(j21+j22) + N + sum(Jnu) (VNS2.m:171-195) and the GAM
per-output SSE (GAM_fun.m:109-117), and makes *ordering* decisions
(first-improving acceptance in VNS, rank-based CMA-ES updates in GAM).
An engine is therefore qualified for a tuning stage iff, across a
candidate grid, it (a) preserves the argmin and (b) flips pairwise
orderings only between candidates whose objective gap is inside the
production engine's own precision noise (the f32-vs-f64 bar measured on
the same grid).

Evidence produced (checkpoints/qp_engine_qualification.json):
  * Wood-Berry + Shell3x3 VNS grids: F per engine, max relative dF vs the
    f64 pdip_ws15 truth, argmin agreement, pairwise-flip analysis with the
    worst flipped relative gap, against the f32 noise bar;
  * GAM SSE populations on both cases: same metrics (documents that ADMM
    is NOT qualified for the GAM stage — rank flips at meaningful gaps);
  * closed-loop trajectory error vs the f64 truth loop at reference-tuned
    parameters (the VERDICT round-2 trajectory gate, for the record);
  * the reduced-iteration warm-PDIP DISQUALIFICATION (pdip_ws12 explodes
    by 1e6 on a Shell3x3 grid candidate — why iteration cuts are not the
    production lever).

Run on CPU (f64 available): python scripts/qualify_engines.py
"""

import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import jax.numpy as jnp

from mpc_tuning_tpu.tuning.api import build_problem
from mpc_tuning_tpu.tuning.objectives import gam_sse_batch, vns_objective_batch

ENGINES = [("pdip_ws", 15), ("pdip_ws", 12), ("pdip_ws", 10),
           ("admm", 40), ("admm", 60), ("admm", 80)]


def pairwise_flips(F, F_ref):
    """Pairs whose ordering disagrees with the truth engine, and the worst
    relative truth-gap among them (flips confined to tiny gaps = ties)."""
    n = len(F)
    i, j = np.triu_indices(n, 1)
    s = np.sign(F[i] - F[j])
    s_ref = np.sign(F_ref[i] - F_ref[j])
    flip = s != s_ref
    gaps = np.abs(F_ref[i] - F_ref[j]) / np.maximum(
        np.abs(F_ref[i]), np.abs(F_ref[j]))
    return int(flip.sum()), len(i), float(gaps[flip].max()) if flip.any() else 0.0


def vns_table(problem, N_b, Nu_b, delta, lam):
    rows = {}

    def eval_F(method, iters, dtype=jnp.float64):
        problem.qp_method = method
        problem.vns_qp_method = method
        problem.qp_iters = iters
        problem.admm_iters = iters  # explicit admm engines honor `iters`
        problem.dtype = dtype
        return vns_objective_batch(problem, N_b, Nu_b, delta, lam)

    F_ref = eval_F("pdip_ws", 15)
    # precision-noise bar: the SAME production engine at f32
    F_noise = eval_F("pdip_ws", 15, jnp.float32)
    nflip, npair, gbar = pairwise_flips(F_noise, F_ref)
    rows["pdip_ws15_f32_noise_bar"] = {
        "max_rel_dF": float((np.abs(F_noise - F_ref) / np.abs(F_ref)).max()),
        "argmin_same": bool(F_noise.argmin() == F_ref.argmin()),
        "flipped_pairs": nflip, "pairs": npair,
        "worst_flipped_rel_gap": gbar,
    }
    for method, iters in ENGINES:
        F = eval_F(method, iters)
        nflip, npair, g = pairwise_flips(F, F_ref)
        rows[f"{method}{iters}"] = {
            "max_rel_dF": float((np.abs(F - F_ref) / np.abs(F_ref)).max()),
            "argmin_same": bool(F.argmin() == F_ref.argmin()),
            "flipped_pairs": nflip, "pairs": npair,
            "worst_flipped_rel_gap": g,
        }
    problem.qp_method = "auto"
    problem.vns_qp_method = "auto"
    problem.qp_iters = 30
    problem.admm_iters = 40
    problem.dtype = jnp.float64
    return rows, F_ref


def gam_table(problem, N, Nu, X):
    rows = {}

    def eval_S(method, iters):
        problem.qp_method = method
        problem.qp_iters = iters
        problem.admm_iters = iters
        return gam_sse_batch(problem, N, Nu, X).sum(axis=1)

    F_ref = eval_S("pdip_ws", 15)
    for method, iters in (("admm", 40), ("admm", 80), ("hybrid", 40),
                          ("hybrid", 60)):
        F = eval_S(method, iters)
        nflip, npair, g = pairwise_flips(F, F_ref)
        rows[f"{method}{iters}"] = {
            "max_rel_dF": float((np.abs(F - F_ref) / np.abs(F_ref)).max()),
            "argmin_same": bool(F.argmin() == F_ref.argmin()),
            "flipped_pairs": nflip, "pairs": npair,
            "worst_flipped_rel_gap": g,
        }
    problem.qp_method = "auto"
    problem.qp_iters = 30
    return rows


def cma_trajectory_table(problem, N, Nu, x0, popsize=12, generations=8,
                         seed=3):
    """Qualify GAM-stage engines against the weight-vector DISTRIBUTION
    the CMA-ES search actually visits (round-4 verdict item 6: grids are
    not the search's distribution).  Harvests every generation's
    population from a real gam_solve run, then checks per-generation
    gamma ORDERINGS (CMA consumes rankings) per engine vs the f64
    pdip_ws15 truth."""
    from mpc_tuning_tpu.tuning import gam as gam_mod

    pops = []
    orig = gam_mod.gam_sse_batch

    def rec(problem_, N_, Nu_, X):
        pops.append(np.asarray(X).copy())
        return orig(problem_, N_, Nu_, X)

    gam_mod.gam_sse_batch = rec
    try:
        gam_mod.gam_solve(problem, N, Nu, x0, popsize=popsize,
                          generations=generations, seed=seed)
    finally:
        gam_mod.gam_sse_batch = orig

    w = np.asarray(problem.w)

    def gamma_of(S):
        return np.max((S - problem.goal) / w[None, :], axis=1)

    def eval_g(method, iters, X):
        problem.qp_method = method
        problem.qp_iters = iters
        problem.admm_iters = iters
        S = gam_sse_batch(problem, N, Nu, X)
        S = np.where(np.isfinite(S), S, 1e30)
        return gamma_of(S)

    rows = {}
    for method, iters in (("hybrid", 40), ("admm", 40)):
        worst_gap = 0.0
        argmin_ok = True
        tot_flips = 0
        tot_pairs = 0
        max_rel = 0.0
        for X in pops:
            g_ref = eval_g("pdip_ws", 15, X)
            g = eval_g(method, iters, X)
            nflip, npair, gap = pairwise_flips(g, g_ref)
            tot_flips += nflip
            tot_pairs += npair
            worst_gap = max(worst_gap, gap)
            argmin_ok &= bool(g.argmin() == g_ref.argmin())
            max_rel = max(max_rel, float(np.max(
                np.abs(g - g_ref) / np.maximum(np.abs(g_ref), 1e-9))))
        rows[f"{method}{iters}"] = {
            "generations": len(pops), "popsize": popsize,
            "argmin_same_every_generation": argmin_ok,
            "flipped_pairs": tot_flips, "pairs": tot_pairs,
            "worst_flipped_rel_gap": worst_gap, "max_rel_dgamma": max_rel,
        }
    problem.qp_method = "auto"
    problem.qp_iters = 30
    return rows


def traj_errors(problem, N, Nu, delta, lam, nit):
    loop = problem.loop
    y_t, u_t = loop.simulate(problem.r, problem.v, nit, N, Nu, delta, lam,
                             qp_method="pdip", qp_iters=40)
    out = {}
    for method, iters in (("admm", 40), ("admm", 60), ("admm", 80)):
        y, u = loop.simulate(problem.r, problem.v, nit, N, Nu, delta, lam,
                             qp_method=method, qp_iters=iters)
        out[f"{method}{iters}"] = {
            "max_dY": float(np.abs(y - y_t).max()),
            "max_dU": float(np.abs(u - u_t).max()),
        }
    return out


def main():
    out = {"truth_engine": "pdip_ws 15 iters, f64 (== cold pdip 40 to 1e-10, "
                           "tests/test_production_qp.py)",
           "criterion": "argmin preserved AND pairwise flips confined to "
                        "relative gaps <= the production engine's own "
                        "f32-vs-f64 noise bar on the same grid"}

    # ---- Wood-Berry (tracking, 2x2)
    from mpc_tuning_tpu.cases import woodberry

    case = woodberry.make_case(nit=400)
    problem, _ = build_problem(case)
    grid = [(N, Nu) for N in (8, 12, 16, 20, 24, 28, 32, 40, 48, 64)
            for Nu in (2, 4, 6)]
    N_b = np.array([g[0] for g in grid])
    Nu_b = np.array([g[1] for g in grid])
    vns, _ = vns_table(problem, N_b, Nu_b,
                       np.array([1.0, 1.0]), np.array([0.1, 0.1]))
    rng = np.random.default_rng(0)
    gam = gam_table(problem, 20, 4,
                    np.abs(rng.uniform(0.02, 2.0, size=(24, 4))))
    traj = traj_errors(problem, 20, 4, np.array([1.0, 1.0]),
                       np.array([0.1, 0.1]), 400)
    cma = cma_trajectory_table(problem, 20, 4,
                               np.array([1.0, 1.0, 0.1, 0.1]))
    out["WoodBerry"] = {"vns_grid": vns, "gam_population": gam,
                        "gam_cma_trajectory": cma,
                        "trajectory_vs_f64_truth": traj, "grid_size": len(grid)}

    # ---- Shell3x3 (tracking, 3x3, the harder conditioning)
    from mpc_tuning_tpu.cases import shell3x3
    from mpc_tuning_tpu.cases.cross_eval import REF_TUNED

    ref = REF_TUNED["Shell3x3"]
    case3 = shell3x3.make_case(nit=500)
    problem3, _ = build_problem(case3, L=np.diag(ref.L), R=np.diag(ref.R))
    grid3 = [(N, Nu) for N in (8, 12, 16, 24, 32, 48) for Nu in (2, 4, 6)]
    N3 = np.array([g[0] for g in grid3])
    Nu3 = np.array([g[1] for g in grid3])
    vns3, _ = vns_table(problem3, N3, Nu3, ref.delta, ref.lam)
    rng = np.random.default_rng(1)
    gam3 = gam_table(problem3, 24, 6,
                     np.abs(rng.uniform(0.0005, 0.1, size=(16, 6))))
    traj3 = traj_errors(problem3, 24, 6, ref.delta, ref.lam, 500)
    cma3 = cma_trajectory_table(
        problem3, 24, 6, np.concatenate([ref.delta, ref.lam]))
    out["Shell3x3"] = {"vns_grid": vns3, "gam_population": gam3,
                       "gam_cma_trajectory": cma3,
                       "trajectory_vs_f64_truth": traj3,
                       "grid_size": len(grid3)}

    # ---- verdicts the production policy implements
    wb_ok = (vns["admm40"]["argmin_same"]
             and vns["admm40"]["worst_flipped_rel_gap"]
             <= max(1e-2, 3 * vns["pdip_ws15_f32_noise_bar"]
                    ["worst_flipped_rel_gap"]))
    s3_ok = (vns3["admm40"]["argmin_same"]
             and vns3["admm40"]["worst_flipped_rel_gap"]
             <= max(1e-2, 3 * vns3["pdip_ws15_f32_noise_bar"]
                    ["worst_flipped_rel_gap"]))
    hyb_ok = True
    for case_rows in (out["WoodBerry"], out["Shell3x3"]):
        r = case_rows["gam_cma_trajectory"]["hybrid40"]
        p = case_rows["gam_population"]["hybrid40"]
        hyb_ok &= (r["argmin_same_every_generation"]
                   and r["worst_flipped_rel_gap"] <= 1e-2
                   and p["argmin_same"]
                   and p["worst_flipped_rel_gap"] <= 1e-2)
    out["verdicts"] = {
        "admm40_vns_tracking_qualified": bool(wb_ok and s3_ok),
        "hybrid40_gam_qualified": bool(hyb_ok),
        "admm_gam_qualified": False,
        "admm_band_qualified": False,
        "reduced_iter_pdip_qualified": False,
        "notes": [
            "ADMM 40-iter warm qualifies for the VNS stage on tracking "
            "cases: argmin preserved, rank flips confined to near-ties.",
            "GAM stays on PDIP: ADMM rank flips at large gaps on extreme "
            "weight vectors (max_rel_dF up to ~0.4).",
            "Band cases stay on PDIP: documented ADMM stall on the ECR "
            "band QP (tests/test_production_qp.py).",
            "Reduced-iteration warm PDIP is DISQUALIFIED: pdip_ws12 "
            "explodes by ~1e6 relative on a Shell3x3 grid candidate.",
            "Round 5: the hybrid (warm-ADMM prefix + short PDIP polish) "
            "passes every STATIC grid (0 flips) but is DISQUALIFIED on "
            "the CMA weight-trajectory distribution: argmin flips and "
            "top-mu ordering flips at 12% gamma gaps on generations "
            "visiting extreme weights, and neither polish 5->8 nor "
            "ADMM 40->60 helps — the error is closed-loop compounding "
            "from under-converged extreme-weight steps (the pdip_ws12 "
            "mechanism), not iteration starvation.  GAM stays on the "
            "fused PDIP.",
        ],
    }

    p = pathlib.Path("checkpoints/qp_engine_qualification.json")
    p.write_text(json.dumps(out, indent=1))
    print(json.dumps(out["verdicts"], indent=1))
    print("wrote", p)
    if not (wb_ok and s3_ok):
        sys.exit(1)


if __name__ == "__main__":
    main()
