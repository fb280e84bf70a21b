"""Decision-level qualification of the TPU-resident f64 band path
(VERDICT round-4 item 1).

The Shell7x5 band DECISIONS (weight retunes, the f64 VNS polish) ran on
CPU/f64 at ~15 sims/s because f32 band loops are screening-grade.  XLA
on this TPU executes true 53-bit float64 (scripts/probe_f64_tpu.py:
2^-52 residual exact), so the same f64 evaluation can run on-chip —
THIS script qualifies it at the decision level, against the CPU/f64
truth, on the committed decision grids:

  * the retune script's 46-point log-lambda grid (gamma over per-output
    SSE, scripts/retune_shell7x5_weights.py phase 1): argmin + pairwise
    orderings;
  * the F_vns shortlist values (phase 2);
and records the on-chip vs CPU wall-clock for the grid evaluation.

NOTE (band chaos): the TPU f64 trajectory is a different fixed
evaluation context than the CPU one (reduction order), so objective
VALUES may differ at the documented band sensitivity; the gate is the
DECISIONS — argmin preserved and pairwise flips confined to gaps inside
the context-sensitivity band measured in PARITY.md (~7%).

Writes checkpoints/band_decision_qualification.json; exits nonzero if
the TPU path is not decision-qualified.
"""
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from mpc_tuning_tpu.cases import shell7x5  # noqa: E402
from mpc_tuning_tpu.cases.cross_eval import (REF_TUNED,  # noqa: E402
                                             REPO_TUNED_REFSCALE,
                                             load_repo_point)
from mpc_tuning_tpu.tuning.api import build_problem  # noqa: E402
from mpc_tuning_tpu.tuning.objectives import (gam_sse_batch,  # noqa: E402
                                              vns_objective_batch)


def gamma_of(problem, S):
    w = np.asarray(problem.w)
    return np.max((S - problem.goal) / w[None, :], axis=1)


def pairwise_flips(F, F_ref):
    n = len(F)
    i, j = np.triu_indices(n, 1)
    s = np.sign(F[i] - F[j])
    s_ref = np.sign(F_ref[i] - F_ref[j])
    flip = s != s_ref
    gaps = np.abs(F_ref[i] - F_ref[j]) / np.maximum(
        np.abs(F_ref[i]), np.abs(F_ref[j]))
    return (int(flip.sum()), len(i),
            float(gaps[flip].max()) if flip.any() else 0.0)


def main():
    assert jax.default_backend() != "cpu", \
        "run on the TPU session (the CPU leg runs via default_device)"
    ref = REF_TUNED["Shell7x5"]
    repo = load_repo_point(REPO_TUNED_REFSCALE["Shell7x5"])
    case = shell7x5.make_case()
    problem, _ = build_problem(case, dtype=jnp.float64, qp_iters=60,
                               L=np.diag(ref.L), R=np.diag(ref.R))
    N, Numax = int(repo.N), int(np.max(repo.Nu))
    delta0 = np.zeros(7)

    # the committed retune grid (scripts/retune_shell7x5_weights.py)
    rng = np.random.default_rng(7)
    anchors = [np.asarray(ref.lam), np.asarray(repo.lam),
               np.array([0.1, 0.1, 0.1])]
    lams = []
    for a in anchors:
        lams.append(a)
        for _ in range(16):
            lams.append(np.exp(np.log(np.maximum(a, 1e-4))
                               + rng.normal(0, 1.0, 3)))
    for _ in range(13):
        lams.append(np.exp(rng.uniform(np.log(1e-3), np.log(5.0), 3)))
    lams = np.clip(np.asarray(lams), 1e-4, 50.0)
    X = np.hstack([np.tile(delta0, (len(lams), 1)), lams])

    out = {"grid_size": len(lams), "device": str(jax.devices()[0])}

    def eval_grid():
        S = gam_sse_batch(problem, N, Numax, X)
        S = np.where(np.isfinite(S), S, 1e30)
        return gamma_of(problem, S)

    # TPU leg (compile + timed)
    t0 = time.perf_counter()
    g_tpu = eval_grid()
    out["tpu_first_wall_s"] = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    g_tpu = eval_grid()
    out["tpu_wall_s"] = round(time.perf_counter() - t0, 2)

    # CPU truth leg (timed)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        t0 = time.perf_counter()
        g_cpu = eval_grid()
        out["cpu_first_wall_s"] = round(time.perf_counter() - t0, 2)
        t0 = time.perf_counter()
        g_cpu = eval_grid()
        out["cpu_wall_s"] = round(time.perf_counter() - t0, 2)

    nflip, npair, worst_gap = pairwise_flips(g_tpu, g_cpu)
    out["gamma_grid"] = {
        "argmin_same": bool(np.argmin(g_tpu) == np.argmin(g_cpu)),
        "max_rel_dgamma": float(np.max(np.abs(g_tpu - g_cpu)
                                       / np.maximum(np.abs(g_cpu), 1e-9))),
        "flipped_pairs": nflip, "pairs": npair,
        "worst_flipped_rel_gap": worst_gap,
    }

    # F_vns on the CPU-shortlist (decision stage 2) — per-point calls
    order = np.argsort(g_cpu)
    short = sorted(set(list(order[:8]) + [0, 1]))

    def eval_F(idx):
        # ONE batched device call over the lambda shortlist
        F = vns_objective_batch(problem, np.full(len(idx), N),
                                np.full(len(idx), Numax),
                                np.tile(delta0, (len(idx), 1)),
                                lams[np.asarray(idx)])
        return np.where(np.isfinite(F), F, 1e30)

    t0 = time.perf_counter()
    F_tpu = eval_F(short)
    out["tpu_fvns_wall_s"] = round(time.perf_counter() - t0, 2)
    with jax.default_device(cpu):
        t0 = time.perf_counter()
        F_cpu = eval_F(short)
        out["cpu_fvns_wall_s"] = round(time.perf_counter() - t0, 2)
    nflip, npair, worst_gap = pairwise_flips(F_tpu, F_cpu)
    out["fvns_shortlist"] = {
        "argmin_same": bool(np.argmin(F_tpu) == np.argmin(F_cpu)),
        "max_rel_dF": float(np.max(np.abs(F_tpu - F_cpu)
                                   / np.maximum(np.abs(F_cpu), 1e-9))),
        "flipped_pairs": nflip, "pairs": npair,
        "worst_flipped_rel_gap": worst_gap,
    }

    # the PARITY.md band context-sensitivity bar (~7% measured across
    # evaluation contexts): flips must stay inside it
    bar = 0.07
    ok = (out["gamma_grid"]["argmin_same"]
          and out["gamma_grid"]["worst_flipped_rel_gap"] <= bar
          and out["fvns_shortlist"]["argmin_same"]
          and out["fvns_shortlist"]["worst_flipped_rel_gap"] <= bar)
    out["speedup_grid"] = round(out["cpu_wall_s"] / out["tpu_wall_s"], 2)
    out["qualified"] = bool(ok)
    p = pathlib.Path("checkpoints/band_decision_qualification.json")
    p.write_text(json.dumps(out, indent=1))
    print(json.dumps(out, indent=1))
    if not ok:
        sys.exit(1)


if __name__ == "__main__":
    main()
