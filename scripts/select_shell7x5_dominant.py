"""Final Shell7x5 refscale selection: goal-attainment step against the
reference's committed artifact.

Under the corrected (+lp20+split12) band engine the reference's tuned
quadruple scores HONESTLY (its round-4 "gamma 35" was a stalled-solver
artifact — it re-scores 6.889 here) and sits essentially on the Pareto
frontier of (F_vns, gamma) — strong convergent evidence both tuners
optimize the same landscape.  This script runs the tuner's last
selection stage as a GOAL-ATTAINMENT search (the reference semantics:
fgoalattain minimizes max_i (SSE_i - goal_i)/w_i; here the goal point is
the reference artifact's own (F, gamma)): a deterministic ES over
(lambda, N) minimizing s = max(F/F_ref, gamma/gamma_ref), anchored at
the round-4/5 retune weights.  s < 1 == strict dominance on BOTH tuner
objectives in the committed evaluation frame (CPU/f64, B=1 — the same
frame cross_eval scores both sides in; measured: the pick's F is
bit-stable across batch contexts B in {1,2,3,4,8} under the lp engine,
which pins the ECR slack exactly per step and removes the round-4
context chaos).

Writes the checkpoint + prints the row; update
cases/cross_eval.REPO_TUNED_REFSCALE to the new file.
"""
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402

from mpc_tuning_tpu.cases import shell7x5  # noqa: E402
from mpc_tuning_tpu.cases.cross_eval import (REF_TUNED,  # noqa: E402
                                             _linear_problem, eval_point)
from mpc_tuning_tpu.utils.io import save_tuning  # noqa: E402


def main():
    ref = REF_TUNED["Shell7x5"]
    case, problem = _linear_problem(shell7x5, ref)
    problem.qp_iters = 60
    delta0 = np.zeros(7)

    ref_row = eval_point(problem, ref.N, ref.Nu, ref.delta, ref.lam)
    F_ref, g_ref = ref_row["F_vns"], ref_row["gamma"]
    print(f"goal point (reference artifact): F={F_ref:.4f} "
          f"gamma={g_ref:.4f}", flush=True)

    rng = np.random.default_rng(23)
    # anchor: the round-4 f64 retune weights (independently converged
    # next to the reference's own lambda — PARITY.md)
    best_lam = np.array([0.0500, 0.0187, 1.7162])
    best = (np.inf, None, None, None, best_lam)

    def score(N, lam):
        row = eval_point(problem, N, np.array([2, 2, 2]), delta0, lam)
        return row["F_vns"], row["gamma"]

    t0 = time.time()
    for it in range(36):
        sig = 0.06 if it < 18 else 0.03
        lam = (best[4] if best[1] is not None else best_lam)
        lam = np.exp(np.log(lam) + rng.normal(0, sig, 3))
        for N in (27, 28, 29):
            F, g = score(N, lam)
            s = max(F / F_ref, g / g_ref)
            if s < best[0]:
                best = (s, F, g, N, lam)
                print(f"s={s:.6f} N={N} F={F:.4f} gamma={g:.4f} "
                      f"lam={np.round(lam, 6).tolist()}", flush=True)
        if best[0] < 0.9993 and it >= 18:
            break
    s, F, g, N, lam = best
    assert s < 1.0, f"no strictly dominating point found (best s={s})"
    ck = save_tuning("checkpoints", "Shell7x5_refscale_round5", N,
                     np.array([2, 2, 2]), delta0, lam,
                     np.diag(ref.L), np.diag(ref.R), [F, g])
    out = {"case": "Shell7x5",
           "stage": "goal-attainment selection vs the reference artifact "
                    "(corrected band engine)",
           "wall_s": round(time.time() - t0, 1),
           "N": int(N), "Nu": [2, 2, 2], "lambda": lam.tolist(),
           "F_vns": F, "gamma": g,
           "ref_F_vns": F_ref, "ref_gamma": g_ref,
           "attainment_s": s, "checkpoint": ck}
    with open("checkpoints/Shell7x5_refscale_run.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
