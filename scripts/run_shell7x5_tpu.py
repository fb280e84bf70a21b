"""Full-budget Shell 7x5 band-control hybrid tuning on the attached
accelerator.

The committed reference artifact (Shell7x5_Tuning_25Jul2023_12_18.mat,
BASELINE.md) has N=27, Nu=[2 2 2], delta=[0 x7] (pure band control),
lambda=[0.0559 0.0167 1.6102] — the comparison target for tuner parity.
"""

import sys, pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import json
import time

import numpy as np
import jax
import jax.numpy as jnp

from mpc_tuning_tpu.cases import shell7x5
from mpc_tuning_tpu.tuning.api import mpc_tuning


def main():
    dtype = jnp.float32 if jax.default_backend() != "cpu" else jnp.float64
    case = shell7x5.make_case()  # nit=200, nbp=7, nbc=4
    t0 = time.time()
    res = mpc_tuning(
        case, dtype=dtype, qp_iters=60,
        gam_popsize=16, gam_generations=20, max_alternations=6,
        checkpoint_dir="checkpoints", verbose=True,
    )
    wall = time.time() - t0
    y, u = shell7x5.final_simulation(case, res)
    ref = dict(N=27, Nu=[2, 2, 2], lam=[0.0559, 0.0167, 1.6102])
    # band-control acceptance: tight outputs y1/y2 must return inside the
    # +-0.005 band after the MD rejection transient (Shell7x5.m:102-103)
    tail = slice(150, 200)
    out = {
        "case": "Shell7x5", "wall_s": round(wall, 1),
        "N": res.N, "Nu": res.Nu.tolist(),
        "delta": np.round(res.delta, 6).tolist(),
        "lambda": np.round(res.lam, 6).tolist(),
        "Fvns": res.Fvns, "Fgam": res.Fgam,
        "cond_after": res.cond_after,
        "reference_artifact": ref,
        "tail_max_abs_y1": float(np.max(np.abs(y[tail, 0]))),
        "tail_max_abs_y2": float(np.max(np.abs(y[tail, 1]))),
        "tail_max_abs_y_rest": float(np.max(np.abs(y[tail, 2:]))),
        "checkpoint": res.checkpoint,
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(out, indent=1))
    with open("checkpoints/Shell7x5_tpu_run.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
