"""Full-budget Van de Vusse NMPC hybrid tuning on the attached accelerator.

The committed reference artifact (VanDeVusse_NMPC_Tuning_25Jul2023_11_04.mat,
BASELINE.md) has N=3, Nu=[2 2], delta=[0.0930 0.1133],
lambda=[0.2460 0.1231] — the comparison target for tuner parity.
Reference run config: Ts=0.05, nit=60, nbp=5, nbc=4, w=[0.7 0.3]
(VanDeVusse_NMPC.m:35-36,202-204).
"""

import sys, pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import json
import time

import numpy as np
import jax
import jax.numpy as jnp

from mpc_tuning_tpu.cases import vandevusse


def main():
    dtype = jnp.float32 if jax.default_backend() != "cpu" else jnp.float64
    t0 = time.time()
    case, res, (y, u) = vandevusse.run(
        nit=60, dtype=dtype, checkpoint_dir="checkpoints", verbose=True,
        gam_popsize=16, gam_generations=20, max_alternations=6,
    )
    wall = time.time() - t0
    ref = dict(N=3, Nu=[2, 2], delta=[0.0930, 0.1133], lam=[0.2460, 0.1231])
    out = {
        "case": "VanDeVusse_NMPC", "wall_s": round(wall, 1),
        "N": res["N"], "Nu": np.asarray(res["Nu"]).tolist(),
        "delta": np.round(res["delta"], 6).tolist(),
        "lambda": np.round(res["lam"], 6).tolist(),
        "Fvns": res["Fvns"], "Fgam": res["Fgam"],
        "reference_artifact": ref,
        # tracking: Cb -> 1.0 after the step at k=10, T -> 130
        "y_cb_final": float(y[-1, 0]),
        "y_T_final": float(y[-1, 1]),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(out, indent=1))
    with open("checkpoints/VanDeVusse_tpu_run.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
