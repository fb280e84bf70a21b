"""Headline benchmark: batched closed-loop GPC/MPC tuning simulations/s.

Workload = the inner loop of the hybrid tuner at REAL tuning shapes:
Wood-Berry 2x2 constrained MPC, nit=400 steps, p_max=127 / m_max=15
(nbp=7 / nbc=4 bit-widths), f32, 30 PDIP iterations per step — one lane
per tuning candidate, vmapped, on whatever accelerator JAX exposes.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sims/s", "vs_baseline": N/10000}
Baseline: >= 10,000 batched closed-loop GPC tuning sims/s on v5p-16
(BASELINE.md).
"""

from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from mpc_tuning_tpu.cases import woodberry
    from mpc_tuning_tpu.sim.mpc_loop import closed_loop_batch
    from mpc_tuning_tpu.tuning.api import build_problem

    dev = jax.devices()[0]
    nit = 400
    B = int(__import__("os").environ.get("BENCH_BATCH", "512"))
    # warm-started PDIP at 15 iterations matches a cold 40-iteration solve
    # to ~1e-9 on the benchmark loop (validated vs the f64 oracle)
    qp_iters = 15
    qp_method = "pdip_ws"
    use_pallas = jax.default_backend() != "cpu"

    case = woodberry.make_case(nit=nit)  # nbp=7, nbc=4 -> p_max=127, m_max=15
    problem, _ = build_problem(case, dtype=jnp.float32, qp_iters=qp_iters)
    loop = problem.loop
    c = loop.arrays(jnp.float32)
    d = loop.dims

    rng = np.random.default_rng(0)
    r_b = jnp.asarray(np.broadcast_to(problem.r[:nit], (B, nit, 2)), jnp.float32)
    v = jnp.asarray(problem.v[:nit], jnp.float32)
    N_b = jnp.asarray(rng.integers(16, 64, size=B))
    Nu_b = jnp.asarray(rng.integers(2, 7, size=B))
    delta_b = jnp.asarray(rng.uniform(0.2, 2.0, size=(B, 2)), jnp.float32)
    lam_b = jnp.asarray(rng.uniform(0.01, 0.5, size=(B, 2)), jnp.float32)

    statics = (d["p_max"], d["m_max"], d["ny"], d["nu"], d["with_y"], d["rho"],
               qp_iters)

    def run():
        with jax.default_matmul_precision("highest"):
            Y, U = closed_loop_batch(c, r_b, v, N_b, Nu_b, delta_b, lam_b,
                                     *statics, qp_method, use_pallas)
        # force full execution + device->host sync (block_until_ready alone
        # does not synchronize on the axon tunnel backend)
        return float(jnp.sum(Y))

    run()  # compile + warmup
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        run()
    dt = (time.perf_counter() - t0) / reps

    sims_per_s = B / dt
    print(json.dumps({
        "metric": "wb_constrained_closedloop_tuning_sims_per_s",
        "value": round(sims_per_s, 2),
        "unit": "sims/s",
        "vs_baseline": round(sims_per_s / 10000.0, 4),
        "detail": {
            "device": str(dev), "batch": B, "nit": nit,
            "p_max": d["p_max"], "m_max": d["m_max"],
            "qp_iters": qp_iters, "qp_method": qp_method, "dtype": "float32",
            "qp_kernel": "pallas" if use_pallas else "xla",
            "matmul_precision": "highest",
            "seconds_per_batch": round(dt, 4),
        },
    }))


if __name__ == "__main__":
    main()
