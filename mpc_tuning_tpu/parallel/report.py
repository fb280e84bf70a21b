"""Scaling-efficiency report for the candidate-sharded tuning sweep.

BASELINE.md asks for tuning-sweep evals/s at 1 chip / 1 host / N hosts.
This environment exposes ONE physical TPU chip; multi-device scaling
mechanics are exercised on a virtual CPU mesh
(--xla_force_host_platform_device_count), which validates the sharding /
collective structure but NOT absolute multi-chip throughput — the report
labels each row accordingly.

Usage:  python -m mpc_tuning_tpu.parallel.report
"""

from __future__ import annotations

import json
import time

import numpy as np


def measure(problem, B, nit, mesh=None, reps=2):
    import jax.numpy as jnp
    from mpc_tuning_tpu.tuning.objectives import gam_sse_batch

    rng = np.random.default_rng(0)
    X = rng.uniform(0.05, 2.0, size=(B, problem.my + problem.nu))
    problem.mesh = mesh
    F = gam_sse_batch(problem, 12, 3, X)  # compile + warm
    t0 = time.perf_counter()
    for _ in range(reps):
        F = gam_sse_batch(problem, 12, 3, X)
    dt = (time.perf_counter() - t0) / reps
    return B / dt, float(np.sum(F))


def main():
    import os
    import jax

    # default to the virtual CPU mesh: the report's purpose is scaling
    # MECHANICS (the single-chip absolute number is bench.py's job), and
    # this environment has exactly one physical chip anyway
    if os.environ.get("REPORT_BACKEND", "cpu") == "cpu":
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + " --xla_force_host_platform_device_count=8"
            ).strip()
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from mpc_tuning_tpu.cases import woodberry
    from mpc_tuning_tpu.parallel.sweep import candidate_mesh
    from mpc_tuning_tpu.tuning.api import build_problem

    backend = jax.default_backend()
    devices = jax.devices()
    nit = 100
    case = woodberry.make_case(nit=nit, nbp=6, nbc=3)
    dtype = jnp.float32 if backend != "cpu" else jnp.float64
    problem, _ = build_problem(case, dtype=dtype, qp_iters=15)

    rows = []
    B = 64 if backend == "cpu" else 256
    r1, _ = measure(problem, B, nit, mesh=None)
    rows.append({"devices": 1, "kind": backend, "sims_per_s": round(r1, 1),
                 "note": "single device"})

    if len(devices) > 1:
        for nd in (2, len(devices)):
            mesh = candidate_mesh(devices[:nd])
            r, _ = measure(problem, B, nit, mesh=mesh)
            rows.append({
                "devices": nd, "kind": backend, "sims_per_s": round(r, 1),
                "efficiency_vs_1": round(r / (r1 * nd), 3),
                "note": "virtual host-platform mesh (mechanics, not absolute perf)"
                if backend == "cpu" else "device mesh",
            })
    doc = {"scaling_report": rows, "batch": B, "nit": nit}
    print(json.dumps(doc, indent=1))
    out = os.environ.get("REPORT_OUT")
    if out:
        with open(out, "w") as fh:
            json.dump(doc, fh, indent=1)


if __name__ == "__main__":
    main()
