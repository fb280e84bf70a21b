"""Full-budget Wood-Berry hybrid tuning on the attached accelerator.

Produces a committed checkpoint + result summary (the TPU-native analogue
of the reference's WoodBerry.m tuning=true run with nbp=7, nbc=4, nit=400).
"""

import sys, pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import json
import time

import numpy as np
import jax
import jax.numpy as jnp

from mpc_tuning_tpu.cases import woodberry
from mpc_tuning_tpu.tuning.api import mpc_tuning


def main():
    dtype = jnp.float32 if jax.default_backend() != "cpu" else jnp.float64
    case = woodberry.make_case()  # nit=400, nbp=7, nbc=4
    t0 = time.time()
    res = mpc_tuning(
        case, dtype=dtype, qp_iters=15,
        gam_popsize=16, gam_generations=20, max_alternations=6,
        checkpoint_dir="checkpoints", verbose=True,
    )
    wall = time.time() - t0
    y, u = woodberry.final_simulation(case, res)
    out = {
        "case": "WoodBerry", "wall_s": round(wall, 1),
        "N": res.N, "Nu": res.Nu.tolist(),
        "delta": np.round(res.delta, 6).tolist(),
        "lambda": np.round(res.lam, 6).tolist(),
        "Fvns": res.Fvns, "Fgam": res.Fgam,
        "cond_before": res.cond_before, "cond_after": res.cond_after,
        "final_y_at_setpoints": {
            "y@295": np.round(y[295], 4).tolist(),
            "y@399": np.round(y[399], 4).tolist(),
        },
        "checkpoint": res.checkpoint,
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(out, indent=1))
    with open("checkpoints/WoodBerry_tpu_run.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
