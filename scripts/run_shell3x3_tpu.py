"""Full-budget Shell 3x3 hybrid tuning on the attached accelerator.

The committed reference artifact (Shell3x3_Tuning_25Jul2023_12_06.mat,
BASELINE.md) has N=24, Nu=[6 2 2], delta=[0.0107 0.0040 0.0008],
lambda=[9.3e-5 5.5e-4 1.5e-3] — the comparison target for tuner parity.
"""

import sys, pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import json
import time

import numpy as np
import jax
import jax.numpy as jnp

from mpc_tuning_tpu.cases import shell3x3
from mpc_tuning_tpu.tuning.api import mpc_tuning


def main():
    dtype = jnp.float32 if jax.default_backend() != "cpu" else jnp.float64
    case = shell3x3.make_case()  # nit=500, nbp=7, nbc=4, caso 1
    t0 = time.time()
    res = mpc_tuning(
        case, dtype=dtype, qp_iters=15,
        gam_popsize=16, gam_generations=20, max_alternations=6,
        checkpoint_dir="checkpoints", verbose=True,
    )
    wall = time.time() - t0
    y, u = shell3x3.final_simulation(case, res)
    ref = dict(N=24, Nu=[6, 2, 2])
    out = {
        "case": "Shell3x3", "wall_s": round(wall, 1),
        "N": res.N, "Nu": res.Nu.tolist(),
        "delta": np.round(res.delta, 6).tolist(),
        "lambda": np.round(res.lam, 6).tolist(),
        "Fvns": res.Fvns, "Fgam": res.Fgam,
        "cond_after": res.cond_after,
        "reference_artifact": ref,
        "final_y_at_k398": np.round(y[398], 4).tolist(),
        "setpoint_at_k398": case.Xsp[398].tolist(),
        "checkpoint": res.checkpoint,
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(out, indent=1))
    with open("checkpoints/Shell3x3_tpu_run.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
