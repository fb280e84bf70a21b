"""Shell7x5 weight retune under the corrected (eps-split) band engine.

Round 4 fixed the band engine's per-step accuracy (the joint PDIP stalled
~5e-2 from the QP optimum on degenerate band steps — PARITY.md round-4
note).  Under the corrected engine the previously committed artifact's
gamma advantage evaporated (it was scored on stalled trajectories), so
this script re-searches the MVRate weights lambda at the incumbent
horizons, on BOTH tuner objectives:

  phase 1: log-space lambda sweep, batched per-output SSE ->
          gamma = max_i (SSE_i - goal)/w_i  (MPC_TFob.m:61-67);
  phase 2: F_vns (VNS2.m:195) for the gamma-shortlist (per-lambda calls);
  phase 3: Chebyshev knee selection vs the run's own ideal point
          (the tuner's joint polish criterion, tuning/api);
  phase 4: save the refscale checkpoint (cross-eval re-scores both sides
          fresh on the same engine).

Everything runs on CPU/f64: the f32 band loop is screening-grade only
(PARITY.md round-4 note — it can diverge where f64 is stable).

Run:  python scripts/retune_shell7x5_weights.py
"""

import sys, pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import json
import time

import numpy as np
import jax

# Band decisions are finalized at f64 (PARITY.md): the f32 band loop can
# DIVERGE where f64 is stable (measured round 4: SSE_y1 5615 at f32 vs
# 0.0028 at f64 on the same point).  Round 5: pass --tpu to run the SAME
# f64 search ON the chip — XLA:TPU executes true 53-bit float64 and the
# lanes engine with the unrolled jnp factor/solve is decision-grade
# there (qualified by scripts/qualify_band_decisions_tpu.py).
ON_TPU = "--tpu" in sys.argv
if not ON_TPU:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp

from mpc_tuning_tpu.cases import shell7x5
from mpc_tuning_tpu.cases.cross_eval import REF_TUNED, REPO_TUNED_REFSCALE, load_repo_point
from mpc_tuning_tpu.tuning.api import build_problem
from mpc_tuning_tpu.tuning.objectives import gam_sse_batch, vns_objective_batch
from mpc_tuning_tpu.utils.io import save_tuning


def gamma_of(problem, S):
    w = np.asarray(problem.w)
    return np.max((S - problem.goal) / w[None, :], axis=1)


def main():
    ref = REF_TUNED["Shell7x5"]
    repo = load_repo_point(REPO_TUNED_REFSCALE["Shell7x5"])
    case = shell7x5.make_case()
    dtype = jnp.float64  # decision-grade everywhere (x64 on; TPU runs true f64)
    problem, _ = build_problem(case, dtype=dtype, qp_iters=60,
                               L=np.diag(ref.L), R=np.diag(ref.R))
    N, Nu = int(repo.N), repo.Nu
    Numax = int(np.max(Nu))
    delta0 = np.zeros(7)

    # ---- phase 1: log-space lambda sweep (gamma, batched)
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
    t0 = time.time()
    S = gam_sse_batch(problem, N, Numax, X)
    S = np.where(np.isfinite(S), S, 1e30)
    g = gamma_of(problem, S)
    print(f"phase1: {len(lams)} lambdas in {time.time()-t0:.1f}s; "
          f"gamma min={g.min():.2f} (ref artifact gamma target ~35)",
          flush=True)

    # ---- phase 2: F_vns for the gamma shortlist + anchors (ONE batched
    # device call over the lambda shortlist — per-candidate weights,
    # tuning/objectives.vns_objective_batch)
    order = np.argsort(g)
    short = sorted(set(list(order[:10]) + [0, 1]))  # + anchors ref/repo
    t0 = time.time()
    Fb = vns_objective_batch(problem, np.full(len(short), N),
                             np.full(len(short), Numax),
                             np.tile(delta0, (len(short), 1)),
                             lams[short])
    F = {i: (float(Fb[j]) if np.isfinite(Fb[j]) else 1e30)
         for j, i in enumerate(short)}
    print(f"phase2: {len(short)} F_vns in {time.time()-t0:.1f}s", flush=True)
    for i in short:
        print(f"  lam={np.round(lams[i],4).tolist()} gamma={g[i]:.2f} "
              f"F={F[i]:.2f}", flush=True)

    # ---- phase 3: knee (Chebyshev w.r.t. this run's ideal point)
    Fs = np.array([F[i] for i in short])
    gs = np.array([g[i] for i in short])
    Fstar = max(Fs.min(), 1e-9)
    gstar = max(gs.min(), 1e-9)
    s = np.maximum(Fs / Fstar, gs / gstar)
    knee = short[int(np.argmin(s))]
    lam_knee = lams[knee]
    print(f"knee: lam={np.round(lam_knee,5).tolist()} "
          f"F={F[knee]:.2f} gamma={g[knee]:.2f}", flush=True)

    out = {
        "case": "Shell7x5", "stage": "weight retune (corrected band engine)",
        "N": N, "Nu": np.asarray(Nu).tolist(),
        "lambda": lam_knee.tolist(),
        "accel": {"F_vns": F[knee], "gamma": float(g[knee]),
                  "ref_lambda_F": F.get(0), "ref_lambda_gamma": float(g[0]),
                  "device": str(jax.devices()[0])},
    }
    ck = save_tuning("checkpoints", "Shell7x5_refscale_retune", N, Nu,
                     delta0, lam_knee, np.diag(ref.L), np.diag(ref.R),
                     [F[knee], float(g[knee])])
    out["checkpoint"] = ck
    with open("checkpoints/Shell7x5_weight_retune.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
