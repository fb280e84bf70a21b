"""Ablation timing of the closed-loop tuning workload: which component
dominates?  Each variant runs in ITS OWN subprocess (the axon TPU worker
sometimes crashes; isolation keeps the sweep alive) and appends one JSON
line to checkpoints/bench_ablate.jsonl.

Variants (all B=2048, nit=400 unless noted):
  pallas15   — production: pdip_ws, 15 iters, Pallas Cholesky
  xla15      — same but XLA Cholesky/triangular solves
  pallas5    — 5 PDIP iters (iteration-count linearity)
  default_mm — matmul precision 'default' (bf16 1-pass) instead of 'highest'
  admm40     — ADMM fallback, 40 warm iters
"""

import json
import os
import pathlib
import subprocess
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

VARIANTS = {
    "lanes15": dict(method="pdip_ws_lanes", pallas=True, iters=15, prec="highest"),
    "fused15": dict(method="pdip_ws_fused", pallas=True, iters=15, prec="highest"),
    "lanes10": dict(method="pdip_ws_lanes", pallas=True, iters=10, prec="highest"),
    "lanes15_bf16": dict(method="pdip_ws_lanes", pallas=True, iters=15, prec="default"),
    "pallas15": dict(method="pdip_ws", pallas=True, iters=15, prec="highest"),
    "xla15": dict(method="pdip_ws", pallas=False, iters=15, prec="highest"),
    "pallas5": dict(method="pdip_ws", pallas=True, iters=5, prec="highest"),
    "default_mm": dict(method="pdip_ws", pallas=True, iters=15, prec="default"),
    "admm40": dict(method="admm", pallas=False, iters=40, prec="highest"),
    "admm40_fused": dict(method="admm_fused", pallas=True, iters=40, prec="highest"),
    "admm60_fused": dict(method="admm_fused", pallas=True, iters=60, prec="highest"),
    "admm40_fused256": dict(method="admm_fused@256", pallas=True, iters=40, prec="highest"),
    "admm40_fused512": dict(method="admm_fused@512", pallas=True, iters=40, prec="highest"),
    "admm80_fused": dict(method="admm_fused", pallas=True, iters=80, prec="highest"),
    "admm60_fused256": dict(method="admm_fused@256", pallas=True, iters=60, prec="highest"),
    "admm40_fused256_B4096": dict(method="admm_fused@256", pallas=True, iters=40,
                                  prec="highest", B=4096),
    "fused15_256chunk": dict(method="pdip_ws_fused@256", pallas=True, iters=15,
                             prec="highest"),
    "admm40_fused512_B4096": dict(method="admm_fused@512", pallas=True, iters=40,
                                  prec="highest", B=4096),
    "admm40_fused512_B8192": dict(method="admm_fused@512", pallas=True, iters=40,
                                  prec="highest", B=8192),
    "admm40_fused512_B16384": dict(method="admm_fused@512", pallas=True, iters=40,
                                   prec="highest", B=16384),
    "admm40_fused1024_B4096": dict(method="admm_fused@1024", pallas=True, iters=40,
                                   prec="highest", B=4096),
    # round-5 MFU levers (verdict item 8): wider blocks at the headline
    # batch, and the 40-vs-80-iteration pair whose extrapolation to
    # iters=0 measures the per-step FIXED cost (kernel launch + the
    # whole Minv HBM read) — an upper bound on any Minv-compression gain
    "admm40_fused1024_B8192": dict(method="admm_fused@1024", pallas=True, iters=40,
                                   prec="highest", B=8192),
    "admm40_fused2048_B8192": dict(method="admm_fused@2048", pallas=True, iters=40,
                                   prec="highest", B=8192),
    "admm80_fused512_B8192": dict(method="admm_fused@512", pallas=True, iters=80,
                                  prec="highest", B=8192),
}


def worker(name: str):
    import time

    import numpy as np
    import jax
    import jax.numpy as jnp

    from mpc_tuning_tpu.cases import woodberry
    from mpc_tuning_tpu.sim.mpc_loop import closed_loop_batch
    from mpc_tuning_tpu.tuning.api import build_problem

    cfg = VARIANTS[name]
    NIT = 400
    B = int(cfg.get("B", os.environ.get("BENCH_BATCH", "2048")))
    case = woodberry.make_case(nit=NIT)
    problem, _ = build_problem(case, dtype=jnp.float32, qp_iters=cfg["iters"])
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
               cfg["iters"])

    def run():
        with jax.default_matmul_precision(cfg["prec"]):
            Y, _ = closed_loop_batch(c, r_b, v, N_b, Nu_b, delta_b, lam_b,
                                     *statics, cfg["method"], cfg["pallas"])
        return float(jnp.sum(Y))

    run()
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        run()
    dt = (time.perf_counter() - t0) / reps
    rec = {"variant": name, "B": B, "sims_per_s": round(B / dt, 2),
           "seconds_per_batch": round(dt, 4), **cfg}
    if "fused" in cfg["method"]:
        from mpc_tuning_tpu.sim.mpc_loop import parse_qp_method

        _, rec["fused_lanes"], rec["fused_solve"], _, _ = parse_qp_method(
            cfg["method"])
    print(json.dumps(rec))


def main():
    out = pathlib.Path("checkpoints/bench_ablate.jsonl")
    with out.open("a") as fh:
        for name in sys.argv[1:] or list(VARIANTS):
            r = subprocess.run(
                [sys.executable, __file__, "--worker", name],
                capture_output=True, text=True, timeout=1800,
            )
            line = next((l for l in r.stdout.splitlines()
                         if l.startswith("{")), None)
            if line is None:
                line = json.dumps({"variant": name, "error": "crashed",
                                   "tail": r.stdout[-200:] + r.stderr[-300:]})
            print(line, flush=True)
            fh.write(line + "\n")
            fh.flush()


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(sys.argv[2])
    else:
        main()
