"""On-chip VNS-decision qualification of the EXPERIMENTAL whole-sim
kernel ('admm_sim_fused') against the CPU f64 pdip_ws15 truth, on the
same candidate grids scripts/qualify_engines.py uses — the adoption
gate for making it the VNS-stage production engine.

The kernel is algorithm-identical to the qualified warm-ADMM engine
(1e-14 at f64, tests/test_round5_engines.py), so what this measures is
its ON-CHIP f32 arithmetic at the DECISION level, side by side with the
incumbent admm_fused scan engine.

Writes checkpoints/sim_fused_qualification.json; exits nonzero if the
kernel's decisions are worse than the incumbent's gate.
"""
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import numpy as np
import jax.numpy as jnp

from mpc_tuning_tpu.cases import shell3x3, woodberry
from mpc_tuning_tpu.cases.cross_eval import REF_TUNED
from mpc_tuning_tpu.tuning.api import build_problem
from mpc_tuning_tpu.tuning.objectives import vns_objective_batch


def pairwise(F, Fr):
    i, j = np.triu_indices(len(F), 1)
    fl = np.sign(F[i] - F[j]) != np.sign(Fr[i] - Fr[j])
    g = np.abs(Fr[i] - Fr[j]) / np.maximum(np.abs(Fr[i]), np.abs(Fr[j]))
    return int(fl.sum()), len(i), float(g[fl].max()) if fl.any() else 0.0


def table(problem, N_b, Nu_b, delta, lam):
    cpu = jax.devices("cpu")[0]
    rows = {}

    def eval_F(method, iters, dtype, dev=None):
        problem.qp_method = "pdip_ws"
        problem.vns_qp_method = method
        problem.qp_iters = 15
        problem.admm_iters = iters
        problem.dtype = dtype
        import contextlib
        ctx = jax.default_device(dev) if dev is not None else (
            contextlib.nullcontext())
        # true 53-bit truth on the CPU leg: x64 toggles ON only around
        # it (never while tracing f32 Pallas kernels — CLAUDE.md /
        # scripts/check_engines_tpu.py pattern).  Without this the
        # requested float64 silently truncated to f32.
        x64 = dtype == jnp.float64
        if x64:
            jax.config.update("jax_enable_x64", True)
        try:
            with ctx:
                return vns_objective_batch(problem, N_b, Nu_b, delta, lam)
        finally:
            if x64:
                jax.config.update("jax_enable_x64", False)

    F_ref = eval_F("pdip_ws", 15, jnp.float64, cpu)
    for method in ("admm_fused@512", "admm_sim_fused@512"):
        F = eval_F(method, 40, jnp.float32)
        nf, npair, g = pairwise(np.asarray(F), np.asarray(F_ref))
        rows[method] = {
            "argmin_same": bool(np.argmin(F) == np.argmin(F_ref)),
            "flipped_pairs": nf, "pairs": npair,
            "worst_flipped_rel_gap": g,
            "max_rel_dF": float(np.max(np.abs(F - F_ref)
                                       / np.abs(F_ref))),
        }
    problem.qp_method = problem.vns_qp_method = "auto"
    problem.dtype = jnp.float32
    problem.qp_iters = 30
    problem.admm_iters = 40
    return rows


def main():
    assert jax.default_backend() != "cpu"
    out = {"truth": "CPU f64 pdip_ws15 via jax.default_device",
           "note": "f32 on-chip decision comparison; the kernel is "
                   "algorithm-identical to admm at f64 (1e-14)"}

    case = woodberry.make_case(nit=400)
    problem, _ = build_problem(case, dtype=jnp.float32)
    grid = [(N, Nu) for N in (8, 12, 16, 20, 24, 28, 32, 40, 48, 64)
            for Nu in (2, 4, 6)]
    out["WoodBerry"] = table(problem, np.array([g[0] for g in grid]),
                             np.array([g[1] for g in grid]),
                             np.array([1.0, 1.0]), np.array([0.1, 0.1]))

    ref = REF_TUNED["Shell3x3"]
    case3 = shell3x3.make_case(nit=500)
    problem3, _ = build_problem(case3, dtype=jnp.float32,
                                L=np.diag(ref.L), R=np.diag(ref.R))
    grid3 = [(N, Nu) for N in (8, 12, 16, 24, 32, 48) for Nu in (2, 4, 6)]
    out["Shell3x3"] = table(problem3, np.array([g[0] for g in grid3]),
                            np.array([g[1] for g in grid3]),
                            ref.delta, ref.lam)

    ok = True
    for c in ("WoodBerry", "Shell3x3"):
        inc = out[c]["admm_fused@512"]
        new = out[c]["admm_sim_fused@512"]
        ok &= (new["argmin_same"]
               and new["worst_flipped_rel_gap"]
               <= max(1e-2, 3 * inc["worst_flipped_rel_gap"]))
    out["qualified_vs_incumbent_gate"] = bool(ok)
    p = pathlib.Path("checkpoints/sim_fused_qualification.json")
    p.write_text(json.dumps(out, indent=1))
    print(json.dumps(out, indent=1))
    if not ok:
        sys.exit(1)


if __name__ == "__main__":
    main()
