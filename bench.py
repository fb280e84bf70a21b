"""Headline benchmark: batched closed-loop MPC tuning simulations/s on the
PRODUCTION engine policy, plus the full BASELINE.md metric set (closed-loop
GPC solves/s/chip, band-case and NMPC engine rows, single-QP p50 latency,
estimated MFU).

Headline workload = the inner loop of the hybrid tuner at REAL tuning
shapes: Wood-Berry 2x2 constrained MPC, nit=400 steps, p_max=127 /
m_max=15 (nbp=7 / nbc=4 bit-widths), f32 — one lane per tuning candidate,
vmapped.  Engine = the VNS-stage production pick of
tuning.objectives.resolve_qp_method ('auto'): on TPU the whole-SIM fused
ADMM kernel (the ENTIRE 400-step closed loop — Kalman update, f/h
assembly, 40 warm ADMM iterations, plant step — in ONE Pallas call per
512-lane candidate block; decision-level qualification in
checkpoints/sim_fused_qualification.json — decision-identical to the
step-fused scan engine vs the f64 PDIP truth).

Extra rows (detail.extra_metrics):
  * wb_gam_pdip_fused     — the GAM-stage engine (fused whole-PDIP kernel)
  * shell7x5_band         — band-control case (fused whole-PDIP at the
                            capacity-bucketed shape, always PDIP)
  * vdv_nmpc              — nonlinear SQP engine (closedloop_toolbox_nmpc
                            equivalent workload)
  * dtc_gpc               — DTC-GPC recursive scan engine (the literal
                            "closed-loop GPC solves/s/chip" of BASELINE.md)

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sims/s", "vs_baseline": N/10000,
   "detail": {...}}
Baseline: >= 10,000 batched closed-loop GPC tuning sims/s on v5p-16
(BASELINE.md; this machine exposes ONE v5-lite chip).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

NIT = 400


def _flops_per_sim_pdip(d, iters, nit=NIT):
    """Dominant interior-point terms per closed-loop sim."""
    n = d["m_max"] * d["nu"] + 1
    mc_rows = 4 * d["m_max"] * d["nu"] + 1
    if d["with_y"]:
        mc_rows += 2 * d["p_max"] * d["ny"]
    per_iter = (
        2 * mc_rows * n * n      # (w @ T2) normal-matrix matmul
        + n ** 3 / 3             # Cholesky
        + 4 * n * n              # triangular solves
        + 8 * mc_rows * n        # G products
    )
    per_step = iters * per_iter + 2 * d["p_max"] * d["ny"] * n
    return per_step * nit


def _flops_per_sim_admm(d, iters, nit=NIT):
    """Dominant warm-ADMM terms per closed-loop sim (no factorization:
    Minv is precomputed once per candidate)."""
    n = d["m_max"] * d["nu"] + 1
    mc_rows = 4 * d["m_max"] * d["nu"] + 1
    if d["with_y"]:
        mc_rows += 2 * d["p_max"] * d["ny"]
    per_iter = 4 * mc_rows * n + 2 * n * n + 8 * mc_rows
    per_step = iters * per_iter + 2 * d["p_max"] * d["ny"] * n
    return per_step * nit


def _sync(x):
    """Force full execution + device->host sync (block_until_ready alone
    does not synchronize on the axon tunnel backend)."""
    import jax.numpy as jnp

    return float(jnp.sum(x))


def _time_reps(fn, reps=5):
    """Run fn reps times after warmup; returns (median, best, times).

    Repeat-and-report: host/tunnel noise on the axon backend can move a
    single timing by tens of percent (the round-4 DTC-GPC row read 36%
    below round 3 on one sample) — the MEDIAN is the reported value and
    BEST bounds the machine's capability; all samples are recorded."""
    fn()  # compile + warmup
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    return float(np.median(times)), float(np.min(times)), times


def bench_wb(problem, B, method, iters, dtype, N_fix=None, Nu_fix=None):
    import jax
    import jax.numpy as jnp

    from mpc_tuning_tpu.sim.mpc_loop import closed_loop_batch, horizon_caps

    loop = problem.loop
    rng = np.random.default_rng(0)
    ny = loop.dims["ny"]
    N_np = (np.full(B, N_fix) if N_fix else rng.integers(16, 64, size=B))
    Nu_np = (np.full(B, Nu_fix) if Nu_fix else rng.integers(2, 7, size=B))
    # capacity bucket = the production path's shape for this batch
    # (sim/mpc_loop.capped: exact, masked rows beyond the bucket are zeros)
    loop = loop.capped(*horizon_caps(loop.dims["p_max"], loop.dims["m_max"],
                                     N_np, Nu_np))
    c = loop.arrays(dtype)
    d = loop.dims
    r_b = jnp.asarray(
        np.broadcast_to(problem.r[:NIT], (B, NIT, ny)), dtype)
    v = jnp.asarray(problem.v[:NIT], dtype)
    N_b = jnp.asarray(N_np)
    Nu_b = jnp.asarray(Nu_np)
    delta_b = jnp.asarray(rng.uniform(0.2, 2.0, size=(B, ny)), dtype)
    lam_b = jnp.asarray(rng.uniform(0.01, 0.5, size=(B, d["nu"])), dtype)
    statics = (d["p_max"], d["m_max"], ny, d["nu"], d["with_y"], d["rho"],
               iters)

    on_tpu = jax.default_backend() != "cpu"

    if method.split("@")[0] in ("admm_sim_fused", "pdip_sim_fused"):
        # round-5 production VNS engine: dispatch through MPCLoop so the
        # whole-sim kernel path (and its envelope fallback) is exactly
        # the production call
        def run():
            Y, _ = loop.closed_batch(r_b, v, N_b, Nu_b, delta_b, lam_b,
                                     NIT, dtype, iters, qp_method=method,
                                     caps=(d["p_max"], d["m_max"]))
            return _sync(Y)
    else:
        def run():
            with jax.default_matmul_precision("highest"):
                Y, _ = closed_loop_batch(c, r_b, v, N_b, Nu_b, delta_b,
                                         lam_b, *statics, method, on_tpu)
            return _sync(Y)

    dt, dt_best, dts = _time_reps(run)
    stats = {"best_sims_per_s": round(B / dt_best, 2),
             "rep_seconds": [round(t, 4) for t in dts]}
    return B / dt, dt, d, stats


def bench_shell7x5(B, iters, dtype):
    import jax
    import jax.numpy as jnp

    from mpc_tuning_tpu.cases import shell7x5
    from mpc_tuning_tpu.cases.cross_eval import REF_TUNED
    from mpc_tuning_tpu.sim.mpc_loop import closed_loop_batch, horizon_caps
    from mpc_tuning_tpu.tuning.api import build_problem

    ref = REF_TUNED["Shell7x5"]
    case = shell7x5.make_case()
    problem, _ = build_problem(case, dtype=dtype,
                               L=np.diag(ref.L), R=np.diag(ref.R))
    loop = problem.loop
    nit = case.nit
    rng = np.random.default_rng(1)
    B = int(B)
    N_np = rng.integers(8, 40, size=B)
    Nu_np = rng.integers(2, 5, size=B)
    # capacity bucket: the y-band constraint rows and the Cholesky size
    # shrink to the batch's max horizons (exact; sim/mpc_loop.capped)
    loop = loop.capped(*horizon_caps(loop.dims["p_max"], loop.dims["m_max"],
                                     N_np, Nu_np))
    c = loop.arrays(dtype)
    d = loop.dims
    r_b = jnp.asarray(np.broadcast_to(problem.r[:nit], (B, nit, 7)), dtype)
    v = jnp.asarray(problem.v[:nit], dtype)
    N_b = jnp.asarray(N_np)
    Nu_b = jnp.asarray(Nu_np)
    delta_b = jnp.asarray(np.broadcast_to(ref.delta, (B, 7)), dtype)
    lam_b = jnp.asarray(rng.uniform(0.02, 2.0, size=(B, 3)), dtype)
    statics = (d["p_max"], d["m_max"], d["ny"], d["nu"], d["with_y"],
               d["rho"], iters)

    on_tpu = jax.default_backend() != "cpu"
    if on_tpu:
        from mpc_tuning_tpu.tuning.objectives import resolve_qp_method

        # auto band-engine at the CAPPED shape: the fused whole-PDIP kernel
        # (the 18 MB full-shape T2T 'VMEM wall' of round 3 was Mosaic's
        # default scoped limit, not the hardware - and the capped table is
        # far smaller anyway)
        band_method = resolve_qp_method("auto", band=True, stage="vns",
                                        dims=d)
    else:
        band_method = "pdip_ws"

    if band_method.split("@")[0].split("+")[0] == "pdip_sim_fused":
        # round-5 whole-sim band engine: dispatch through the production
        # MPCLoop path (kernel + envelope fallback)
        def run():
            Y, _ = loop.closed_batch(r_b, v, N_b, Nu_b, delta_b, lam_b,
                                     nit, dtype, iters,
                                     qp_method=band_method,
                                     caps=(d["p_max"], d["m_max"]))
            return _sync(Y)
    else:
        def run():
            with jax.default_matmul_precision("highest"):
                Y, _ = closed_loop_batch(c, r_b, v, N_b, Nu_b, delta_b,
                                         lam_b, *statics, band_method,
                                         on_tpu)
            return _sync(Y)

    dt, dt_best, dts = _time_reps(run)
    stats = {"best_sims_per_s": round(B / dt_best, 2),
             "rep_seconds": [round(t, 4) for t in dts]}
    return B / dt, nit, band_method, stats


def bench_vdv(B, dtype):
    import jax.numpy as jnp

    from mpc_tuning_tpu.cases import vandevusse

    case = vandevusse.make_case()
    problem = vandevusse.build_problem(case, dtype=dtype)
    nit = case.nit
    rng = np.random.default_rng(2)
    B = int(B)
    r_b = np.broadcast_to(problem.r[:nit], (B, nit, 2))
    N_b = rng.integers(3, 12, size=B)
    Nu_b = rng.integers(2, 3, size=B)
    d_b = np.broadcast_to([0.0930, 0.1133], (B, 2))
    l_b = np.broadcast_to([0.2460, 0.1231], (B, 2))

    def run():
        Y, _ = problem.loop.closed_batch(
            jnp.asarray(r_b, dtype), problem.v, jnp.asarray(N_b),
            jnp.asarray(Nu_b), jnp.asarray(d_b, dtype),
            jnp.asarray(l_b, dtype), nit, dtype, case.spec.qp_iters)
        return _sync(Y)

    dt, dt_best, dts = _time_reps(run)
    stats = {"best_sims_per_s": round(B / dt_best, 2),
             "rep_seconds": [round(t, 4) for t in dts]}
    return B / dt, nit, stats


def bench_dtc_gpc(B, dtype):
    from mpc_tuning_tpu.models import plants
    from mpc_tuning_tpu.ops import condmin as cm
    from mpc_tuning_tpu.sim.gpc_loop import DTCGPC

    plant = plants.wood_berry()
    L, R, _ = cm.condmin(plant.G.dcgain())
    ctl = DTCGPC.build(plant=plant.G, model=plant.G, Ts=1.0,
                       p=np.array([3, 3]), m=np.array([3, 3]),
                       delta=np.array([1.0, 1.0]), lam=np.array([1.0, 1.0]),
                       L=L, R=R, n_md=1, disturbance=plant.D)
    nit = NIT
    B = int(B)
    r = np.zeros((nit, 2))
    r[10:, 0] = 0.8
    r[200:, 1] = 0.5
    q = np.zeros((nit, 1))
    q[300:, 0] = -0.25
    r_b = np.broadcast_to(r, (B, nit, 2))
    q_b = np.broadcast_to(q, (B, nit, 1))

    def run():
        Y, _ = ctl.simulate_scan_batch(r_b, q_b, nit, dtype=dtype)
        return _sync(Y)

    dt, dt_best, dts = _time_reps(run)
    stats = {"best_sims_per_s": round(B / dt_best, 2),
             "rep_seconds": [round(t, 4) for t in dts]}
    return B / dt, nit, stats


def main():
    import jax
    import jax.numpy as jnp

    from mpc_tuning_tpu.cases import woodberry
    from mpc_tuning_tpu.ops.mpc_qp import assemble_candidate, qp_step_data
    from mpc_tuning_tpu.ops.qp import solve_qp_masked
    from mpc_tuning_tpu.tuning.api import build_problem
    from mpc_tuning_tpu.tuning.objectives import resolve_qp_method

    dev = jax.devices()[0]
    on_tpu = jax.default_backend() != "cpu"
    dtype = jnp.float32
    B = int(os.environ.get("BENCH_BATCH", "8192" if on_tpu else "64"))

    # production VNS-stage engine (tracking): fused whole-ADMM on TPU;
    # resolve at the CAPPED WB bench shape (N<64, Nu<7 -> caps (64, 8)),
    # exactly what bench_wb will simulate at
    _wb_dims = dict(p_max=64, m_max=8, ny=2, nu=2, with_y=False, rho=1e5)
    method = os.environ.get(
        "BENCH_METHOD",
        resolve_qp_method("auto", band=False, stage="vns", dims=_wb_dims))
    is_admm = method.split("@")[0].split("/")[0] in (
        "admm", "admm_fused", "admm_sim_fused")
    iters = int(os.environ.get("BENCH_QP_ITERS", "40" if is_admm else "15"))

    case = woodberry.make_case(nit=NIT)  # nbp=7, nbc=4 -> p_max=127
    problem, _ = build_problem(case, dtype=dtype, qp_iters=iters)

    # ---- DTC-GPC scan row FIRST (the literal closed-loop GPC engine):
    # measured before the heavy rows because in-process interference
    # (host memory pressure + tunnel state after 5 compiled workloads)
    # halves its measured rate — the round-4 "36% DTC regression" was
    # exactly this ordering artifact (solo reruns reproduce the round-3
    # rate; rep spread is recorded either way)
    extra = []
    try:
        gpcB = 1024 if on_tpu else 8
        gpc_sims, gpc_nit, gpc_stats = bench_dtc_gpc(gpcB, dtype)
        extra.append({"metric": "dtc_gpc_closedloop_sims_per_s",
                      "value": round(gpc_sims, 2), "unit": "sims/s",
                      "nit": gpc_nit, "batch": gpcB,
                      "gpc_solves_per_s_chip": round(gpc_sims * gpc_nit),
                      **gpc_stats})
    except Exception as exc:
        extra.append({"metric": "dtc_gpc_closedloop_sims_per_s",
                      "error": repr(exc)[:200]})

    sims_per_s, dt, d, wb_stats = bench_wb(problem, B, method, iters, dtype)

    # ---- GAM-stage engine row (fused whole-PDIP, 15 warm iters) at the
    # REAL GAM population shape: the whole CMA population shares the
    # incumbent horizons (gam_sse_batch broadcasts one (N, Nu)), so the
    # capacity bucket is tight — here (N, Nu) = (20, 4) -> caps (32, 4)
    try:
        gam_iters = 15
        gB = min(B, 2048) if on_tpu else 8
        gam_method = (resolve_qp_method("auto", band=False, stage="gam",
                                        dims=dict(_wb_dims, p_max=32,
                                                  m_max=4))
                      if on_tpu else "pdip_ws")
        g_sims, _, gd, g_stats = bench_wb(problem, gB, gam_method,
                                          gam_iters, dtype, N_fix=20,
                                          Nu_fix=4)
        extra.append({"metric": "wb_gam_pdip_fused_sims_per_s",
                      "value": round(g_sims, 2), "unit": "sims/s",
                      "qp_method": gam_method,
                      "qp_iters": gam_iters, "batch": gB,
                      "caps": [gd["p_max"], gd["m_max"]],
                      "population": "fixed (N,Nu)=(20,4), varying weights",
                      **g_stats})
    except Exception as exc:  # pragma: no cover - bench resilience
        extra.append({"metric": "wb_gam_pdip_fused_sims_per_s",
                      "error": repr(exc)[:200]})

    # ---- band-control row (Shell7x5: mc=601 rows incl. soft bands + ECR)
    try:
        sB = 256 if on_tpu else 2
        s_sims, s_nit, s_meth, s_stats = bench_shell7x5(sB, 60, dtype)
        extra.append({"metric": "shell7x5_band_closedloop_sims_per_s",
                      "value": round(s_sims, 2), "unit": "sims/s",
                      "qp_method": s_meth, "qp_iters": 60,
                      "nit": s_nit, "batch": sB,
                      "qp_solves_per_s_chip": round(s_sims * s_nit),
                      **s_stats})
    except Exception as exc:
        extra.append({"metric": "shell7x5_band_closedloop_sims_per_s",
                      "error": repr(exc)[:200]})

    # ---- nonlinear engine row (Van de Vusse SQP NMPC)
    try:
        vB = 256 if on_tpu else 2
        v_sims, v_nit, v_stats = bench_vdv(vB, dtype)
        extra.append({"metric": "vdv_nmpc_sims_per_s",
                      "value": round(v_sims, 2), "unit": "sims/s",
                      "nit": v_nit, "batch": vB,
                      "nlp_solves_per_s_chip": round(v_sims * v_nit),
                      **v_stats})
    except Exception as exc:
        extra.append({"metric": "vdv_nmpc_sims_per_s",
                      "error": repr(exc)[:200]})

    # ---- end-to-end hybrid-tuner wall clock (complete small-budget
    # Wood-Berry mpc_tuning on the production policy, BOTH stages +
    # polish): guards the stage-rate rows from masking an end-to-end
    # regression (reference analogue: the tic/toc around MPCTuning at
    # WoodBerry.m:155-157).  Includes this process's compiles for any
    # bucket the tuner visits that the rows above did not.
    try:
        from mpc_tuning_tpu.tuning.api import mpc_tuning

        t0 = time.perf_counter()
        res = mpc_tuning(case, dtype=dtype, qp_iters=15, gam_popsize=8,
                         gam_generations=4, max_alternations=2, seed=0,
                         checkpoint_dir=None, verbose=False)
        tune_wall = time.perf_counter() - t0
        extra.append({"metric": "wb_hybrid_tune_wall_s",
                      "value": round(tune_wall, 2), "unit": "s",
                      "budget": "popsize 8 x 4 gens x <=2 alternations, "
                                "qp_iters 15, nit 400, nbp 7/nbc 4",
                      "includes_compiles": True,
                      "N": int(res.N), "Nu": res.Nu.tolist(),
                      "Fvns": round(float(res.Fvns), 4)})
    except Exception as exc:
        extra.append({"metric": "wb_hybrid_tune_wall_s",
                      "error": repr(exc)[:200]})

    # ---- single-QP p50 latency (warm-started masked PDIP solve, B=1) at
    # the same capped shape bench_wb ran at (d is the capped dims dict)
    loop = problem.loop.capped(d["p_max"], d["m_max"])
    c = loop.arrays(dtype)
    cand = assemble_candidate(c, jnp.asarray(20), jnp.asarray(4),
                              jnp.asarray([1.0, 1.0], dtype),
                              jnp.asarray([0.1, 0.1], dtype),
                              d["p_max"], d["m_max"], d["ny"], d["nu"],
                              d["rho"], d["with_y"])
    nxa = c["A"].shape[0]
    f1, h1, _ = qp_step_data(c, cand, jnp.zeros(nxa, dtype),
                             jnp.zeros(2, dtype),
                             jnp.asarray(problem.r[10], dtype),
                             jnp.zeros(1, dtype),
                             d["p_max"], d["m_max"], d["ny"], d["nu"],
                             d["with_y"])

    def qsolve():
        z, _, _ = solve_qp_masked(cand["H"], f1, c["G0"], c["T2"],
                                  cand["rmask"], cand["cmask_z"], h1,
                                  iters=15)
        return _sync(z)

    qsolve()
    lat = []
    for _ in range(30):
        t0 = time.perf_counter()
        qsolve()
        lat.append(time.perf_counter() - t0)
    qp_p50_us = 1e6 * float(np.median(lat))

    # ---- derived metrics (engine-correct FLOPs model, est only)
    qp_solves_per_s = sims_per_s * NIT
    fl = (_flops_per_sim_admm(d, iters) if is_admm
          else _flops_per_sim_pdip(d, iters))
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
            "qp_iters": iters, "qp_method": method, "dtype": "float32",
            "matmul_precision": "highest",
            "engine_policy": "production auto: VNS tracking = whole-SIM "
                             "fused ADMM (entire closed loop in one Pallas "
                             "kernel; checkpoints/"
                             "sim_fused_qualification.json); GAM = fused "
                             "whole-PDIP; band = fused PDIP +lp20+split12 "
                             "(f32 band rows are engine-throughput only; "
                             "band decisions finalize at f64, PARITY.md)",
            "seconds_per_batch": round(dt, 4),
            **wb_stats,
            "qp_solves_per_s_chip": round(qp_solves_per_s, 0),
            "qp_p50_latency_us": round(qp_p50_us, 1),
            # single-QP p50 is host-observed: on the axon backend each call
            # pays the tunnel round-trip, so this upper-bounds device time;
            # the batched-path per-QP cost is 1/qp_solves_per_s_chip.
            "qp_p50_includes_dispatch_rtt": True,
            "est_flops_per_sim": round(fl),
            "flops_model": "admm" if is_admm else "pdip",
            "est_mfu_pct": round(est_mfu_pct, 2),
            "extra_metrics": extra,
        },
    }))


if __name__ == "__main__":
    main()
