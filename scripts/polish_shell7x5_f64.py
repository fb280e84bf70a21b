"""Shell7x5 f64 polish stage: the tight +-0.005 band loop is the one case
where f32-on-TPU and f64 objective values diverge enough to flip VNS
decisions (f32 scored the N=10 incumbent 88.7; f64 re-scores it 152.4).
This stage re-runs the final VNS descent in float64 on CPU at the SHIPPED
weights, starting from the TPU run's incumbent bits — the hybrid tuner's
precision-polish step.

Writes checkpoints/Shell7x5_refscale_f64polish.npz (+ updates the run json).
"""

import sys, pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax

# --tpu: run the same f64 VNS descent ON the chip (true-53-bit XLA f64;
# qualified by scripts/qualify_band_decisions_tpu.py)
ON_TPU = "--tpu" in sys.argv
if ON_TPU:
    sys.argv.remove("--tpu")
else:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import json
import time

import numpy as np

from mpc_tuning_tpu.cases import shell7x5
from mpc_tuning_tpu.cases.cross_eval import REF_TUNED, REPO_TUNED_REFSCALE, load_repo_point
from mpc_tuning_tpu.tuning.api import build_problem
from mpc_tuning_tpu.tuning.objectives import vns_objective_batch
from mpc_tuning_tpu.tuning.vns import int_to_bits, vns_search
from mpc_tuning_tpu.utils.io import save_tuning


def main():
    ref = REF_TUNED["Shell7x5"]
    # optional CLI arg: the raw (pre-polish) tuning npz to start from;
    # default = the committed pointer.  The polish runs in the SOURCE
    # artifact's own conditioning frame (its committed L/R — the refscale
    # chain carries the reference's, the own-scale chain its CondMin's).
    src = sys.argv[1] if len(sys.argv) > 1 else REPO_TUNED_REFSCALE["Shell7x5"]
    repo = load_repo_point(src)
    # TunedPoint carries L/R as diag VECTORS (cross_eval.load_repo_point)
    L = np.diag(repo.L if repo.L is not None else ref.L)
    R = np.diag(repo.R if repo.R is not None else ref.R)
    refscale = np.allclose(np.diag(L), ref.L)
    case = shell7x5.make_case()
    problem, _ = build_problem(case, L=L, R=R, qp_iters=60)

    Xv1 = int_to_bits(int(repo.N), case.nbp)
    Xv2 = np.stack([int_to_bits(int(v), case.nbc) for v in repo.Nu])
    F0 = float(vns_objective_batch(
        problem, np.array([int(repo.N)]), np.array([int(repo.Nu.max())]),
        repo.delta, repo.lam)[0])
    print(f"incumbent N={repo.N} Nu={repo.Nu.tolist()} F64={F0:.4f}", flush=True)

    t0 = time.time()
    vr = vns_search(problem, Xv1, Xv2, repo.delta, repo.lam, F0, verbose=True)
    wall = time.time() - t0
    N, Nu, F = (vr.N, vr.Nu, vr.Fv) if vr.Fv < F0 else (int(repo.N), repo.Nu, F0)
    tag = "Shell7x5_refscale_f64polish" if refscale else "Shell7x5_f64polish"
    ck = save_tuning("checkpoints", tag, N, Nu,
                     repo.delta, repo.lam, L, R, [F, F0])
    out = {
        "case": "Shell7x5",
        "stage": "f64 polish (%s)" % ("TPU" if ON_TPU else "CPU"),
        "frame": "refscale" if refscale else "own CondMin scale",
        "wall_s": round(wall, 1),
        "from": {"N": int(repo.N), "Nu": repo.Nu.tolist(), "F_f64": F0},
        "N": int(N), "Nu": np.asarray(Nu).tolist(),
        "delta": repo.delta.tolist(), "lambda": repo.lam.tolist(),
        "Fvns_f64": F, "evals": vr.evals,
        "reference_F_vns_f64": 122.41,
        "checkpoint": ck,
    }
    runp = ("checkpoints/Shell7x5_f64polish_run.json" if refscale
            else "checkpoints/Shell7x5_ownscale_f64polish_run.json")
    with open(runp, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
