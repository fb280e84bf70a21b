"""On-chip qualification + timing of the whole-sim PDIP kernel
('pdip_sim_fused') — the GAM-stage adoption gate.

The kernel is algorithm-identical to the production GAM engine
('pdip_ws_fused': 4e-15 at f64 interpret,
tests/test_round5_engines.py::test_whole_sim_pdip_kernel_matches_scan),
so what this measures is its ON-CHIP f32 arithmetic at the DECISION
level — per-generation gamma orderings over the weight-vector
distribution a REAL CMA-ES GAM search visits (the round-4/5 criterion
that disqualified the warm-ADMM hybrid), side by side with the
incumbent — plus wall-clock at the GAM bench shape.

Writes checkpoints/sim_pdip_qualification.json; exits nonzero if the
kernel's decisions are worse than the incumbent's gate.
"""
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import numpy as np
import jax.numpy as jnp

from mpc_tuning_tpu.cases import woodberry
from mpc_tuning_tpu.tuning.api import build_problem
from mpc_tuning_tpu.tuning.objectives import gam_sse_batch


def pairwise(F, Fr):
    i, j = np.triu_indices(len(F), 1)
    fl = np.sign(F[i] - F[j]) != np.sign(Fr[i] - Fr[j])
    g = np.abs(Fr[i] - Fr[j]) / np.maximum(np.abs(Fr[i]), np.abs(Fr[j]))
    return int(fl.sum()), len(i), float(g[fl].max()) if fl.any() else 0.0


def harvest_pops(problem, N, Nu, x0, popsize, generations, seed):
    """Record every generation's weight population from a REAL on-chip
    gam_solve run (the distribution the stage actually visits)."""
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
    return pops


def main():
    assert jax.default_backend() != "cpu"
    cpu = jax.devices("cpu")[0]
    case = woodberry.make_case(nit=400)
    problem, _ = build_problem(case, dtype=jnp.float32, qp_iters=15)
    N, Nu = 20, 4
    x0 = np.array([1.0, 1.0, 0.1, 0.1])

    problem.qp_method = "pdip_ws_fused"
    pops = harvest_pops(problem, N, Nu, x0, popsize=12, generations=8,
                        seed=3)
    w = np.asarray(problem.w)

    def gamma_of(S):
        return np.max((S - problem.goal) / w[None, :], axis=1)

    def eval_g(method, dtype, X, dev=None):
        import contextlib
        problem.qp_method = method
        problem.qp_iters = 15
        problem.dtype = dtype
        x64 = dtype == jnp.float64
        if x64:
            jax.config.update("jax_enable_x64", True)
        try:
            ctx = jax.default_device(dev) if dev is not None else (
                contextlib.nullcontext())
            with ctx:
                S = gam_sse_batch(problem, N, Nu, X)
        finally:
            if x64:
                jax.config.update("jax_enable_x64", False)
        S = np.where(np.isfinite(S), S, 1e30)
        return gamma_of(S)

    rows = {}
    for method in ("pdip_ws_fused", "pdip_sim_fused@128"):
        tot = dict(flips=0, pairs=0, worst=0.0, max_rel=0.0, argmin=True)
        for X in pops:
            g_ref = eval_g("pdip_ws", jnp.float64, X, cpu)
            g = eval_g(method, jnp.float32, X)
            nf, npair, gap = pairwise(g, g_ref)
            tot["flips"] += nf
            tot["pairs"] += npair
            tot["worst"] = max(tot["worst"], gap)
            tot["argmin"] &= bool(g.argmin() == g_ref.argmin())
            tot["max_rel"] = max(tot["max_rel"], float(np.max(
                np.abs(g - g_ref) / np.maximum(np.abs(g_ref), 1e-9))))
        rows[method] = {
            "generations": len(pops), "popsize": 12,
            "argmin_same_every_generation": tot["argmin"],
            "flipped_pairs": tot["flips"], "pairs": tot["pairs"],
            "worst_flipped_rel_gap": tot["worst"],
            "max_rel_dgamma": tot["max_rel"],
        }
    problem.qp_method = "auto"
    problem.dtype = jnp.float32

    # ---- wall-clock at the GAM bench shape (B=2048, caps (32,4),
    # fixed (N,Nu)=(20,4), varying weights) — the bench.py GAM row
    loop = problem.loop
    B = 2048
    rng = np.random.default_rng(0)
    r_b = np.broadcast_to(problem.r[:400], (B, 400, 2))
    N_b = np.full(B, N)
    Nu_b = np.full(B, Nu)
    d_b = rng.uniform(0.2, 2.0, (B, 2))
    l_b = rng.uniform(0.01, 0.5, (B, 2))
    timing = {}
    for method in ("pdip_ws_fused", "pdip_sim_fused@128",
                   "pdip_sim_fused@256", "pdip_sim_fused@512"):
        def run():
            Y, _ = loop.closed_batch(r_b, problem.v, N_b, Nu_b, d_b, l_b,
                                     400, jnp.float32, 15,
                                     qp_method=method)
            return float(jnp.sum(Y))

        run()
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            run()
            ts.append(time.perf_counter() - t0)
        ts.sort()
        timing[method] = {
            "sims_per_s_median": round(B / ts[len(ts) // 2], 1),
            "sims_per_s_best": round(B / ts[0], 1),
            "rep_seconds": [round(t, 4) for t in ts],
        }

    inc, new = rows["pdip_ws_fused"], rows["pdip_sim_fused@128"]
    ok = (new["argmin_same_every_generation"]
          and new["worst_flipped_rel_gap"]
          <= max(1e-2, 3 * inc["worst_flipped_rel_gap"]))
    out = {"truth": "CPU f64 pdip_ws15 (x64 toggled, jax.default_device)",
           "population": "CMA weight trajectories, popsize 12 x 8 gens, "
                         "(N,Nu)=(20,4), WB nit=400",
           "decisions": rows, "timing_gam_shape": timing,
           "qualified_vs_incumbent_gate": bool(ok)}
    p = pathlib.Path("checkpoints/sim_pdip_qualification.json")
    p.write_text(json.dumps(out, indent=1))
    print(json.dumps(out, indent=1))
    if not ok:
        sys.exit(1)


if __name__ == "__main__":
    main()
