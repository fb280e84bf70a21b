"""Headline benchmark: batched closed-loop GPC/MPC tuning simulations/s,
plus the full BASELINE.md metric set (QP solves/s/chip, single-QP p50
latency, estimated MFU).

Workload = the inner loop of the hybrid tuner at REAL tuning shapes:
Wood-Berry 2x2 constrained MPC, nit=400 steps, p_max=127 / m_max=15
(nbp=7 / nbc=4 bit-widths), f32, warm-started 15-iteration PDIP per step —
one lane per tuning candidate, vmapped, on whatever accelerator JAX
exposes.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sims/s", "vs_baseline": N/10000,
   "detail": {... qp_solves_per_s, qp_p50_us, est_mfu_pct ...}}
Baseline: >= 10,000 batched closed-loop GPC tuning sims/s on v5p-16
(BASELINE.md; this machine exposes ONE v5-lite chip).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

NIT = 400
QP_ITERS = int(os.environ.get("BENCH_QP_ITERS", "15"))
# production tuning engine: the fused whole-PDIP Pallas kernel
# (ops/pallas_kernels.pdip_fused_lanes); override with BENCH_METHOD
QP_METHOD = os.environ.get("BENCH_METHOD", "pdip_ws_fused")


def _flops_per_sim(d, qp_iters=QP_ITERS):
    """Analytic FLOPs of one closed-loop sim (dominant interior-point
    terms): normal-matrix matmul (w@T2), Cholesky, triangular solves,
    masked G products, free-response contraction."""
    n = d["m_max"] * d["nu"] + 1
    mc = 4 * d["m_max"] * d["nu"] + 1  # Wood-Berry: no output rows
    per_iter = (
        2 * mc * n * n          # (w @ T2) -> (n, n)
        + n ** 3 / 3            # Cholesky
        + 4 * n * n             # 4 triangular solves
        + 8 * mc * n            # Gmat/GTmat matvecs
    )
    per_step = qp_iters * per_iter + 2 * d["p_max"] * d["ny"] * n
    return per_step * NIT


def main():
    import jax
    import jax.numpy as jnp

    from mpc_tuning_tpu.cases import woodberry
    from mpc_tuning_tpu.ops.mpc_qp import assemble_candidate, qp_step_data
    from mpc_tuning_tpu.ops.qp import solve_qp_masked
    from mpc_tuning_tpu.sim.mpc_loop import closed_loop_batch
    from mpc_tuning_tpu.tuning.api import build_problem

    dev = jax.devices()[0]
    on_tpu = jax.default_backend() != "cpu"
    B = int(os.environ.get("BENCH_BATCH", "2048" if on_tpu else "64"))
    use_pallas = on_tpu

    case = woodberry.make_case(nit=NIT)  # nbp=7, nbc=4 -> p_max=127, m_max=15
    problem, _ = build_problem(case, dtype=jnp.float32, qp_iters=QP_ITERS)
    loop = problem.loop
    c = loop.arrays(jnp.float32)
    d = loop.dims

    rng = np.random.default_rng(0)
    r_b = jnp.asarray(np.broadcast_to(problem.r[:NIT], (B, NIT, 2)), jnp.float32)
    v = jnp.asarray(problem.v[:NIT], jnp.float32)
    N_b = jnp.asarray(rng.integers(16, 64, size=B))
    Nu_b = jnp.asarray(rng.integers(2, 7, size=B))
    delta_b = jnp.asarray(rng.uniform(0.2, 2.0, size=(B, 2)), jnp.float32)
    lam_b = jnp.asarray(rng.uniform(0.01, 0.5, size=(B, 2)), jnp.float32)

    statics = (d["p_max"], d["m_max"], d["ny"], d["nu"], d["with_y"], d["rho"],
               QP_ITERS)

    def run():
        with jax.default_matmul_precision("highest"):
            Y, U = closed_loop_batch(c, r_b, v, N_b, Nu_b, delta_b, lam_b,
                                     *statics, QP_METHOD, use_pallas)
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

    # ---- single-QP p50 latency (warm-started masked solve, B=1)
    cand = assemble_candidate(c, jnp.asarray(20), jnp.asarray(4),
                              jnp.asarray([1.0, 1.0], jnp.float32),
                              jnp.asarray([0.1, 0.1], jnp.float32),
                              d["p_max"], d["m_max"], d["ny"], d["nu"],
                              d["rho"], d["with_y"])
    nxa = c["A"].shape[0]
    f1, h1, _ = qp_step_data(c, cand, jnp.zeros(nxa, jnp.float32),
                             jnp.zeros(2, jnp.float32),
                             jnp.asarray(problem.r[10], jnp.float32),
                             jnp.zeros(1, jnp.float32),
                             d["p_max"], d["m_max"], d["ny"], d["nu"],
                             d["with_y"])

    def qsolve():
        z, _, _ = solve_qp_masked(cand["H"], f1, c["G0"], c["T2"],
                                  cand["rmask"], cand["cmask_z"], h1,
                                  iters=QP_ITERS)
        return float(jnp.sum(z))

    qsolve()
    lat = []
    for _ in range(30):
        t0 = time.perf_counter()
        qsolve()
        lat.append(time.perf_counter() - t0)
    qp_p50_us = 1e6 * float(np.median(lat))

    # ---- derived metrics
    qp_solves_per_s = sims_per_s * NIT
    fl = _flops_per_sim(d)
    # v5e peak: 197 TFLOP/s bf16; f32-'highest' (6-pass) effective ~ /4
    peak = 197e12 / 4 if on_tpu else 1e12
    est_mfu_pct = 100.0 * fl * sims_per_s / peak

    print(json.dumps({
        "metric": "wb_constrained_closedloop_tuning_sims_per_s",
        "value": round(sims_per_s, 2),
        "unit": "sims/s",
        "vs_baseline": round(sims_per_s / 10000.0, 4),
        "detail": {
            "device": str(dev), "batch": B, "nit": NIT,
            "p_max": d["p_max"], "m_max": d["m_max"],
            "qp_iters": QP_ITERS, "qp_method": QP_METHOD, "dtype": "float32",
            "qp_kernel": "pallas" if use_pallas else "xla",
            "matmul_precision": "highest",
            "seconds_per_batch": round(dt, 4),
            "qp_solves_per_s_chip": round(qp_solves_per_s, 0),
            "qp_p50_latency_us": round(qp_p50_us, 1),
            # single-QP p50 is host-observed: on the axon backend each call
            # pays the tunnel round-trip, so this upper-bounds device time;
            # the batched-path per-QP cost is 1/qp_solves_per_s_chip.
            "qp_p50_includes_dispatch_rtt": True,
            "est_flops_per_sim": round(fl),
            "est_mfu_pct": round(est_mfu_pct, 2),
        },
    }))


if __name__ == "__main__":
    main()
