"""TPU-side QP-engine agreement CHECK (asserting, exits nonzero on
regression): runs candidate-batched constrained closed loops through every
production engine ON THE REAL CHIP at f32 and gates the pairwise
trajectory deltas against the baseline engine's own f32-vs-f64 error.

Workloads:
  * Wood-Berry tuning shape (n=31 vars, mc=121 rows): pdip_ws (per-lane
    reference), pdip_ws_lanes, pdip_ws_fused, admm_fused@512 (the VNS
    production engine; checked against its OWN f64 CPU ADMM loop — the
    admm-vs-pdip approximation gap is recorded, not gated: it is
    decision-level qualified, checkpoints/qp_engine_qualification.json);
  * Shell7x5 band shape (n=46 -> n_pad=48 non-power-of-two, mc=1959 rows
    at the tuning shape incl. tight +-0.005 soft bands + ECR): pdip_ws vs
    pdip_ws_lanes (the auto engine here — the fused kernel's T2T table
    exceeds VMEM at this shape, ops/qp.fused_pdip_viable) — precisely the
    shape where PARITY.md concedes f32/f64 divergence can flip VNS
    decisions (band decisions are finalized at f64; this gate keeps the
    f32 engines mutually consistent).

Gate: max engine-pair delta <= max(2x the baseline engine's own f32 error
vs the f64 truth loop, 1e-5 absolute floor).  Artifact:
checkpoints/qp_engine_agreement_tpu.json.
"""

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp

from mpc_tuning_tpu.sim.mpc_loop import closed_loop_batch
from mpc_tuning_tpu.tuning.api import build_problem

ITERS = 15
FAILS = []


def run_case(out, tag, problem, B, nit, iters, methods, f64_method,
             rng_seed=0, delta_ref=None, lam_lo=0.01, lam_hi=0.5):
    from mpc_tuning_tpu.sim.mpc_loop import horizon_caps

    loop = problem.loop
    rng = np.random.default_rng(rng_seed)
    N_np = rng.integers(8, 48, size=B)
    Nu_np = rng.integers(2, 5, size=B)
    # production capacity bucket (sim/mpc_loop.capped)
    loop = loop.capped(*horizon_caps(loop.dims["p_max"], loop.dims["m_max"],
                                     N_np, Nu_np))
    c = loop.arrays(jnp.float32)
    d = loop.dims
    ny, nu = d["ny"], d["nu"]
    r_np = np.broadcast_to(problem.r[:nit], (B, nit, ny))
    r_b = jnp.asarray(r_np, jnp.float32)
    v = jnp.asarray(problem.v[:nit], jnp.float32)
    N_b = jnp.asarray(N_np)
    Nu_b = jnp.asarray(Nu_np)
    if delta_ref is None:
        delta_np = rng.uniform(0.2, 2.0, size=(B, ny))
    else:
        delta_np = np.broadcast_to(delta_ref, (B, ny))
    delta_b = jnp.asarray(delta_np, jnp.float32)
    lam_np = rng.uniform(lam_lo, lam_hi, size=(B, nu))
    lam_b = jnp.asarray(lam_np, jnp.float32)
    statics = (d["p_max"], d["m_max"], ny, nu, d["with_y"], d["rho"], iters)

    Ys = {}
    for method in methods:
        t0 = time.perf_counter()
        with jax.default_matmul_precision("highest"):
            Y, U = closed_loop_batch(c, r_b, v, N_b, Nu_b, delta_b, lam_b,
                                     *statics, method, True)
        Ys[method] = (np.asarray(Y), np.asarray(U))
        out[f"{tag}_{method}_wall_s"] = round(time.perf_counter() - t0, 2)
        print(tag, method, "done", out[f"{tag}_{method}_wall_s"], flush=True)

    # f64 CPU ground truth for the baseline engine family.  x64 is toggled
    # ONLY around this block: enabling it before a TPU Pallas kernel run
    # sends Mosaic's convert_element_type lowering into infinite recursion.
    cpu = jax.devices("cpu")[0]
    jax.config.update("jax_enable_x64", True)
    try:
        with jax.default_device(cpu):
            c64 = loop.arrays(jnp.float64)
            with jax.default_matmul_precision("highest"):
                Yt, Ut = closed_loop_batch(
                    c64, jnp.asarray(r_np, jnp.float64),
                    jnp.asarray(np.asarray(v), jnp.float64),
                    jnp.asarray(np.asarray(N_b)),
                    jnp.asarray(np.asarray(Nu_b)),
                    jnp.asarray(delta_np, jnp.float64),
                    jnp.asarray(lam_np, jnp.float64),
                    *statics, f64_method, False)
            Yt, Ut = np.asarray(Yt), np.asarray(Ut)
    finally:
        jax.config.update("jax_enable_x64", False)

    base = methods[0]
    for m, (Ym, Um) in Ys.items():
        out[f"{tag}_max_dY_vs_f64truth_{m}"] = float(np.abs(Ym - Yt).max())
        out[f"{tag}_max_dU_vs_f64truth_{m}"] = float(np.abs(Um - Ut).max())
    noise_y = out[f"{tag}_max_dY_vs_f64truth_{base}"]
    noise_u = out[f"{tag}_max_dU_vs_f64truth_{base}"]
    gate_y = max(2 * noise_y, 1e-5)
    gate_u = max(2 * noise_u, 1e-5)
    out[f"{tag}_gate_dY"] = gate_y
    out[f"{tag}_gate_dU"] = gate_u

    for i, a in enumerate(methods):
        for b in methods[i + 1:]:
            dy = float(np.abs(Ys[a][0] - Ys[b][0]).max())
            du = float(np.abs(Ys[a][1] - Ys[b][1]).max())
            out[f"{tag}_max_dY_{a}_vs_{b}"] = dy
            out[f"{tag}_max_dU_{a}_vs_{b}"] = du
            if dy > gate_y or du > gate_u:
                FAILS.append(f"{tag}: {a} vs {b} dY={dy:.3e} dU={du:.3e} "
                             f"exceeds gate ({gate_y:.3e}/{gate_u:.3e})")
    return Ys, (Yt, Ut), (r_np, N_b, Nu_b, delta_np, lam_np, statics, c)


def main():
    out = {"device": str(jax.devices()[0]), "iters": ITERS,
           "dtype": "float32",
           "gate": "pairwise engine delta <= max(2x baseline f32-vs-f64 "
                   "error, 1e-5)"}

    # ---------------- Wood-Berry tuning shape (PDIP engine family)
    from mpc_tuning_tpu.cases import woodberry

    case = woodberry.make_case(nit=400)
    problem, _ = build_problem(case, dtype=jnp.float32, qp_iters=ITERS)
    run_case(out, "wb", problem, 128, 400, ITERS,
             ["pdip_ws", "pdip_ws_lanes", "pdip_ws_fused"], "pdip_ws")

    # admm_fused vs its OWN f64 dense-ADMM truth (kernel-correctness gate;
    # 40 warm iters = the production VNS config)
    loop = problem.loop
    c = loop.arrays(jnp.float32)
    d = loop.dims
    rng = np.random.default_rng(0)
    B, nit = 128, 400
    r_np = np.broadcast_to(problem.r[:nit], (B, nit, 2))
    N_b = rng.integers(8, 48, size=B)
    Nu_b = rng.integers(2, 5, size=B)
    delta_np = rng.uniform(0.2, 2.0, size=(B, 2))
    lam_np = rng.uniform(0.01, 0.5, size=(B, 2))
    statics = (d["p_max"], d["m_max"], 2, 2, d["with_y"], d["rho"], 40)
    with jax.default_matmul_precision("highest"):
        Ya, Ua = closed_loop_batch(
            c, jnp.asarray(r_np, jnp.float32),
            jnp.asarray(problem.v[:nit], jnp.float32),
            jnp.asarray(N_b), jnp.asarray(Nu_b),
            jnp.asarray(delta_np, jnp.float32),
            jnp.asarray(lam_np, jnp.float32),
            *statics, "admm_fused@512", True)
    Ya, Ua = np.asarray(Ya), np.asarray(Ua)
    cpu = jax.devices("cpu")[0]
    jax.config.update("jax_enable_x64", True)
    try:
        with jax.default_device(cpu):
            c64 = loop.arrays(jnp.float64)
            with jax.default_matmul_precision("highest"):
                Yat, Uat = closed_loop_batch(
                    c64, jnp.asarray(r_np, jnp.float64),
                    jnp.asarray(problem.v[:nit], jnp.float64),
                    jnp.asarray(N_b), jnp.asarray(Nu_b),
                    jnp.asarray(delta_np, jnp.float64),
                    jnp.asarray(lam_np, jnp.float64),
                    *statics, "admm", False)
    finally:
        jax.config.update("jax_enable_x64", False)
    dy = float(np.abs(Ya - np.asarray(Yat)).max())
    du = float(np.abs(Ua - np.asarray(Uat)).max())
    out["wb_admm_fused512_f32_vs_f64_dense_admm_dY"] = dy
    out["wb_admm_fused512_f32_vs_f64_dense_admm_dU"] = du
    # f32 kernel vs its own f64 algorithm: same gate structure as PDIP
    if dy > max(2 * out["wb_max_dY_vs_f64truth_pdip_ws"] * 10, 5e-3):
        FAILS.append(f"admm_fused f32 kernel drifted from its f64 "
                     f"algorithm: dY={dy:.3e}")
    print("wb admm_fused kernel-correctness:", dy, du, flush=True)

    # ---------------- whole-SIM kernels vs their scan counterparts
    # (round 5: the entire closed loop in ONE Pallas call per lane
    # block).  Both sides run through the PUBLIC MPCLoop.closed_batch
    # dispatch at auto caps; gate = the scan baseline's own f32 noise
    # class (the round-5 bf16-table bug read 8.6e-2 here — two orders
    # over this gate — before the precision fix)
    sim_gate = max(2 * out["wb_max_dY_vs_f64truth_pdip_ws"], 1e-4)
    out["wb_sim_kernel_gate_dY"] = sim_gate
    for sim_m, scan_m, its in (("admm_sim_fused@512", "admm_fused@512", 40),
                               ("pdip_sim_fused@128", "pdip_ws_fused",
                                ITERS)):
        t0 = time.perf_counter()
        Y1, U1 = loop.closed_batch(r_np, problem.v[:nit], N_b, Nu_b,
                                   delta_np, lam_np, nit, jnp.float32,
                                   its, qp_method=sim_m)
        out[f"wb_{sim_m}_wall_s"] = round(time.perf_counter() - t0, 2)
        Y2, U2 = loop.closed_batch(r_np, problem.v[:nit], N_b, Nu_b,
                                   delta_np, lam_np, nit, jnp.float32,
                                   its, qp_method=scan_m)
        dy = float(np.abs(np.asarray(Y1) - np.asarray(Y2)).max())
        du = float(np.abs(np.asarray(U1) - np.asarray(U2)).max())
        out[f"wb_max_dY_{sim_m}_vs_{scan_m}"] = dy
        out[f"wb_max_dU_{sim_m}_vs_{scan_m}"] = du
        if dy > sim_gate:
            FAILS.append(f"whole-sim kernel {sim_m} drifted from {scan_m}: "
                         f"dY={dy:.3e} > {sim_gate:.3e}")
        print("wb whole-sim agreement:", sim_m, dy, du, flush=True)

    # ---------------- Shell7x5 band shape (n_pad=48, mc=601)
    from mpc_tuning_tpu.cases import shell7x5
    from mpc_tuning_tpu.cases.cross_eval import REF_TUNED

    ref = REF_TUNED["Shell7x5"]
    case7 = shell7x5.make_case()
    problem7, _ = build_problem(case7, dtype=jnp.float32,
                                L=np.diag(ref.L), R=np.diag(ref.R))
    # round 5: the production band engine is the fused whole-PDIP with
    # the slack-LP eps-split (+lp20+split12, sim/mpc_loop.parse_qp_method)
    # at the capacity-bucketed shape — the stage-0 LP pins the ECR slack
    # exactly (certified per step against scipy's LP in
    # tests/test_band_oracle.py) where round 4's 60-iteration joint
    # stage 1 erred up to ~0.4 in du on degenerate steps.  The pairwise
    # gate auto-scales with the baseline engine's own f32-vs-f64 error,
    # which on this chaotic band workload IS large — f32 band sims are
    # screening-grade by policy.
    out["shell7x5_auto_engine"] = "pdip_ws_fused+lp20+split12"
    run_case(out, "shell7x5", problem7, 32, case7.nit, 60,
             ["pdip_ws+lp20+split12", "pdip_ws_lanes+lp20+split12",
              "pdip_ws_fused+lp20+split12"], "pdip_ws+lp20+split12",
             rng_seed=1, delta_ref=ref.delta, lam_lo=0.02, lam_hi=2.0)

    out["failures"] = FAILS
    p = pathlib.Path("checkpoints/qp_engine_agreement_tpu.json")
    p.write_text(json.dumps(out, indent=1))
    print(json.dumps(out))
    if FAILS:
        print("ENGINE AGREEMENT FAILURES:", *FAILS, sep="\n  ", flush=True)
        sys.exit(1)
    print("ALL ENGINE-AGREEMENT GATES PASSED", flush=True)


if __name__ == "__main__":
    main()
