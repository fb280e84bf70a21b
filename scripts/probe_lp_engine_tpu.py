"""On-chip throughput of the round-5 band engine (+lp20+split12):
  * f32 fused (screening/tuning engine) at the bench band shape —
    VERDICT item 2's >= 1,000 sims/s target;
  * f64 lanes (decision-grade path) at B in {256, 1024} — VERDICT
    item 1's >= 10x-CPU target (~150 sims/s).
"""
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import os

import jax

MODE = os.environ.get("MODE", "f32")
if MODE == "f64":
    # x64 must stay OFF for the f32 fused-Pallas runs: weak f64 scalars
    # inside Mosaic kernels hit an unsupported conversion path
    jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from mpc_tuning_tpu.cases import shell7x5  # noqa: E402
from mpc_tuning_tpu.cases.cross_eval import REF_TUNED  # noqa: E402
from mpc_tuning_tpu.sim.mpc_loop import closed_loop_batch, horizon_caps  # noqa: E402
from mpc_tuning_tpu.tuning.api import build_problem  # noqa: E402

out = {"backend": jax.default_backend()}
ref = REF_TUNED["Shell7x5"]


def bench_band(B, nit, dtype, method, iters, use_pallas, bench_shape=False):
    case = shell7x5.make_case(nit=nit)
    problem, _ = build_problem(case, dtype=dtype,
                               L=np.diag(ref.L), R=np.diag(ref.R))
    loop = problem.loop
    rng = np.random.default_rng(1)
    if bench_shape:  # bench.py's band row population (caps (48, 4))
        N_np = rng.integers(8, 40, size=B)
        Nu_np = rng.integers(2, 5, size=B)
        d_b = np.broadcast_to(ref.delta, (B, 7)).astype(np.float64)
        l_b = rng.uniform(0.02, 2.0, size=(B, 3))
    else:  # decision-path population: fixed tuned horizons, weight grid
        N_np = np.full(B, int(ref.N))
        Nu_np = np.full(B, int(ref.Nu.max()))
        d_b = np.broadcast_to(ref.delta, (B, 7)).astype(np.float64)
        l_b = np.asarray(ref.lam)[None, :] * np.exp(
            0.3 * rng.standard_normal((B, 3)))
    loop = loop.capped(*horizon_caps(loop.dims["p_max"], loop.dims["m_max"],
                                     N_np, Nu_np))
    c = loop.arrays(dtype)
    d = loop.dims
    r_b = jnp.asarray(np.broadcast_to(problem.r[:nit], (B, nit, 7)), dtype)
    v = jnp.asarray(problem.v[:nit], dtype)
    args = (jnp.asarray(N_np), jnp.asarray(Nu_np),
            jnp.asarray(d_b, dtype), jnp.asarray(l_b, dtype))
    statics = (d["p_max"], d["m_max"], d["ny"], d["nu"], d["with_y"],
               d["rho"], iters)

    def run():
        with jax.default_matmul_precision("highest"):
            Y, _ = closed_loop_batch(c, r_b, v, *args, *statics, method,
                                     use_pallas)
        return float(jnp.sum(Y))

    t0 = time.perf_counter()
    run()
    first = time.perf_counter() - t0
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        run()
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))
    return {"sims_per_s": round(B / dt, 2),
            "best_sims_per_s": round(B / min(times), 2),
            "first_call_s": round(first, 1), "caps": [d["p_max"], d["m_max"]]}


if MODE == "f32":
    # screening engine at the bench band shape (item 2 target >= 1000)
    for method in ("pdip_ws_fused+lp20+split12", "pdip_ws_fused+split15"):
        out[f"f32_B256_{method}"] = bench_band(
            256, 200, jnp.float32, method, 60, True, bench_shape=True)
else:
    # f64 decision path (item 1 target >= ~150)
    for B in (256, 1024):
        out[f"f64_B{B}_lp20s12"] = bench_band(
            B, 200, jnp.float64, "pdip_ws_lanes+lp20+split12", 60, False)

print(json.dumps(out, indent=1))
