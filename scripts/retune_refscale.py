"""Tuning-outcome parity runs: re-run the hybrid tuner with the conditioning
scale PINNED to the reference's committed L/R (BASELINE.md), so the tuned
(N, Nu, delta, lambda) land in the exact conditioned frame of the reference's
.mat artifacts and the VNS/GAM objectives are directly comparable numbers.

Usage:  python scripts/retune_refscale.py [shell3x3 shell3x3_caso2 shell7x5 vdv]
Writes checkpoints/<case>_refscale_run.json artifacts consumed by
mpc_tuning_tpu/cases/cross_eval.py.
"""

import sys, pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import json
import time

import numpy as np
import jax
import jax.numpy as jnp

from mpc_tuning_tpu.cases.cross_eval import REF_TUNED


def _dtype():
    return jnp.float32 if jax.default_backend() != "cpu" else jnp.float64


def run_linear(tag: str, case, ref, **kw):
    from mpc_tuning_tpu.tuning.api import mpc_tuning

    t0 = time.time()
    res = mpc_tuning(
        case, dtype=_dtype(),
        L=np.diag(ref.L), R=np.diag(ref.R),
        checkpoint_dir="checkpoints", verbose=True, **kw,
    )
    out = {
        "case": tag, "frame": "reference L/R", "wall_s": round(time.time() - t0, 1),
        "N": res.N, "Nu": np.asarray(res.Nu).tolist(),
        "delta": np.round(res.delta, 8).tolist(),
        "lambda": np.round(res.lam, 8).tolist(),
        "Fvns": res.Fvns, "Fgam": res.Fgam,
        "reference_artifact": {"N": ref.N, "Nu": ref.Nu.tolist(),
                               "delta": ref.delta.tolist(), "lam": ref.lam.tolist()},
        "checkpoint": res.checkpoint,
        "device": str(jax.devices()[0]),
    }
    with open(f"checkpoints/{tag}_refscale_run.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    return out


def run_shell3x3(caso: int):
    from mpc_tuning_tpu.cases import shell3x3

    tag = "Shell3x3" if caso == 1 else "Shell3x3_caso2"
    ref = REF_TUNED[tag]
    case = shell3x3.make_case(caso=caso)
    case.name = tag + "_refscale"
    return run_linear(tag, case, ref, qp_iters=15,
                      gam_popsize=16, gam_generations=20, max_alternations=6)


def run_shell7x5():
    from mpc_tuning_tpu.cases import shell7x5

    ref = REF_TUNED["Shell7x5"]
    case = shell7x5.make_case()
    case.name = "Shell7x5_refscale"
    return run_linear("Shell7x5", case, ref, qp_iters=60,
                      gam_popsize=16, gam_generations=20, max_alternations=6)


def run_vdv():
    from mpc_tuning_tpu.cases import vandevusse
    from mpc_tuning_tpu.tuning.api import hybrid_tune
    from mpc_tuning_tpu.utils.io import save_tuning

    ref = REF_TUNED["VanDeVusse_NMPC"]
    case = vandevusse.make_case()
    problem = vandevusse.build_problem(case, _dtype())
    x0 = np.array([1.0, 1.0, 0.1, 0.1])
    t0 = time.time()
    best, delta, lam, Fva, Fvf, history = hybrid_tune(
        problem, case.nbp, case.nbc, x0,
        gam_popsize=16, gam_generations=20, max_alternations=6, verbose=True,
    )
    ck = save_tuning("checkpoints", "VanDeVusse_NMPC_refscale", best["N"],
                     best["Nu"], delta, lam, np.eye(2), np.eye(2), [Fva, Fvf])
    out = {
        "case": "VanDeVusse_NMPC", "frame": "unscaled (nonlinear)",
        "wall_s": round(time.time() - t0, 1),
        "N": int(best["N"]), "Nu": np.asarray(best["Nu"]).tolist(),
        "delta": np.round(delta, 8).tolist(), "lambda": np.round(lam, 8).tolist(),
        "Fvns": Fva, "Fgam": Fvf,
        "reference_artifact": {"N": ref.N, "Nu": ref.Nu.tolist(),
                               "delta": ref.delta.tolist(), "lam": ref.lam.tolist()},
        "checkpoint": ck, "device": str(jax.devices()[0]),
    }
    with open("checkpoints/VanDeVusse_NMPC_refscale_run.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    return out


RUNNERS = {
    "shell3x3": lambda: run_shell3x3(1),
    "shell3x3_caso2": lambda: run_shell3x3(2),
    "shell7x5": run_shell7x5,
    "vdv": run_vdv,
}


if __name__ == "__main__":
    names = sys.argv[1:] or list(RUNNERS)
    for nm in names:
        print(f"=== {nm} ===", flush=True)
        RUNNERS[nm]()
