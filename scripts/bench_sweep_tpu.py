"""Performance sweep on the attached accelerator: batch-size scaling,
Pallas-vs-XLA Cholesky, ADMM-vs-PDIP iteration cost, single-QP latency.

Feeds BENCH round metrics + the speed-of-light analysis (VERDICT round-1
weak item 1).  Writes checkpoints/bench_sweep.json.
"""

import sys, pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import json
import time

import numpy as np
import jax
import jax.numpy as jnp

from mpc_tuning_tpu.cases import woodberry
from mpc_tuning_tpu.sim.mpc_loop import closed_loop_batch
from mpc_tuning_tpu.tuning.api import build_problem

NIT = 400
QP_ITERS = 15


def sync(x):
    return float(jnp.sum(x))


def build(dtype=jnp.float32):
    case = woodberry.make_case(nit=NIT)
    problem, _ = build_problem(case, dtype=dtype, qp_iters=QP_ITERS)
    loop = problem.loop
    return problem, loop.arrays(dtype), loop.dims


def batch_args(problem, B, dtype=jnp.float32):
    rng = np.random.default_rng(0)
    r_b = jnp.asarray(np.broadcast_to(problem.r[:NIT], (B, NIT, 2)), dtype)
    v = jnp.asarray(problem.v[:NIT], dtype)
    N_b = jnp.asarray(rng.integers(16, 64, size=B))
    Nu_b = jnp.asarray(rng.integers(2, 7, size=B))
    delta_b = jnp.asarray(rng.uniform(0.2, 2.0, size=(B, 2)), dtype)
    lam_b = jnp.asarray(rng.uniform(0.01, 0.5, size=(B, 2)), dtype)
    return r_b, v, N_b, Nu_b, delta_b, lam_b


def time_loop(problem, c, d, B, qp_method, use_pallas, qp_iters=QP_ITERS,
              reps=3):
    args = batch_args(problem, B)
    statics = (d["p_max"], d["m_max"], d["ny"], d["nu"], d["with_y"], d["rho"],
               qp_iters)

    def run():
        with jax.default_matmul_precision("highest"):
            Y, _ = closed_loop_batch(c, *args, *statics, qp_method, use_pallas)
        return sync(Y)

    t0 = time.perf_counter()
    run()
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(reps):
        run()
    dt = (time.perf_counter() - t0) / reps
    return dict(B=B, qp_method=qp_method, pallas=use_pallas,
                qp_iters=qp_iters, sims_per_s=round(B / dt, 2),
                seconds_per_batch=round(dt, 4), compile_s=round(compile_s, 1))


def qp_latency(problem, c, d, reps=50):
    """p50 latency of ONE warm-started masked QP solve (B=1)."""
    from mpc_tuning_tpu.ops.mpc_qp import assemble_candidate, qp_step_data
    from mpc_tuning_tpu.ops.qp import solve_qp_masked

    dtype = jnp.float32
    cand = assemble_candidate(c, jnp.asarray(20), jnp.asarray(4),
                              jnp.asarray([1.0, 1.0], dtype),
                              jnp.asarray([0.1, 0.1], dtype),
                              d["p_max"], d["m_max"], d["ny"], d["nu"],
                              d["rho"], d["with_y"])
    nxa = c["A"].shape[0]
    f, h, _ = qp_step_data(c, cand, jnp.zeros(nxa, dtype), jnp.zeros(2, dtype),
                           jnp.asarray(problem.r[10], dtype), jnp.zeros(1, dtype),
                           d["p_max"], d["m_max"], d["ny"], d["nu"], d["with_y"])

    def solve():
        z, lam, s = solve_qp_masked(cand["H"], f, c["G0"], c["T2"],
                                    cand["rmask"], cand["cmask_z"], h,
                                    iters=QP_ITERS)
        return sync(z)

    solve()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        solve()
        ts.append(time.perf_counter() - t0)
    return dict(p50_us=round(1e6 * float(np.median(ts)), 1),
                p90_us=round(1e6 * float(np.percentile(ts, 90)), 1))


def flops_per_sim(d, qp_iters=QP_ITERS):
    """Analytic FLOP count of one closed-loop sim (dominant terms)."""
    n = d["m_max"] * d["nu"] + 1
    mc = 4 * d["m_max"] * d["nu"] + 1  # WB: no y rows
    per_iter = (
        2 * mc * n * n        # (w @ T2) normal-matrix matmul
        + n ** 3 / 3          # Cholesky
        + 4 * n * n           # 4 triangular solves (2 rhs x fwd+bwd)
        + 8 * mc * n          # Gmat/GTmat products (4x matvec)
    )
    per_step = qp_iters * per_iter + 2 * d["p_max"] * d["ny"] * n  # + free resp
    return per_step * NIT


def main():
    dev = jax.devices()[0]
    problem, c, d = build()
    out = {"device": str(dev), "nit": NIT, "qp_iters": QP_ITERS, "runs": []}

    for B in (512, 1024, 2048, 4096):
        r = time_loop(problem, c, d, B, "pdip_ws", True)
        out["runs"].append(r)
        print(json.dumps(r), flush=True)

    # pallas vs xla at the best batch so far
    best = max(out["runs"], key=lambda r: r["sims_per_s"])
    r = time_loop(problem, c, d, best["B"], "pdip_ws", False)
    out["runs"].append(r)
    print(json.dumps(r), flush=True)

    # ADMM (approximate fallback) at matched batch, 40 iters
    r = time_loop(problem, c, d, best["B"], "admm", False, qp_iters=40)
    out["runs"].append(r)
    print(json.dumps(r), flush=True)

    out["qp_latency"] = qp_latency(problem, c, d)
    print(json.dumps(out["qp_latency"]), flush=True)

    fl = flops_per_sim(d)
    best_all = max(out["runs"], key=lambda r: r["sims_per_s"])
    flops_rate = fl * best_all["sims_per_s"]
    peak_f32 = 197e12 / 4  # v5e bf16 peak / 4 ~ f32 'highest' 6-pass estimate
    out["est_flops_per_sim"] = fl
    out["est_flops_per_s"] = flops_rate
    out["est_mfu_pct_f32"] = round(100 * flops_rate / peak_f32, 2)
    print(json.dumps({k: out[k] for k in
                      ("est_flops_per_sim", "est_flops_per_s", "est_mfu_pct_f32")}))

    with open("checkpoints/bench_sweep.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
