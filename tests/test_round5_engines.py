"""Round-5 engine additions: the 'hybrid' (ADMM-prefix + PDIP-polish)
engine, per-candidate-weight batching in the VNS objective, and the
unrolled lane-major factor/solve used by the TPU f64 decision path."""

import numpy as np
import pytest
import jax.numpy as jnp

from mpc_tuning_tpu.cases import woodberry
from mpc_tuning_tpu.ops.qp import _factor_lanes_unrolled, _solve_lanes_unrolled
from mpc_tuning_tpu.tuning.api import build_problem
from mpc_tuning_tpu.tuning.objectives import vns_objective_batch


@pytest.fixture(scope="module")
def wb_problem():
    case = woodberry.make_case(nit=120)
    problem, _ = build_problem(case, dtype=jnp.float64, qp_iters=15)
    return problem


def test_hybrid_engine_tracks_pdip_truth(wb_problem):
    """admm40 prefix + 5-iter PDIP polish stays within trajectory
    tolerance of the f64 PDIP truth on the tracking workload (it is NOT
    the GAM production engine — CMA-trajectory disqualification recorded
    in scripts/qualify_engines.py — but must remain a correct solver)."""
    loop = wb_problem.loop
    y_t, u_t = loop.simulate(wb_problem.r, wb_problem.v, 120, 20, 4,
                             [1.0, 1.0], [0.1, 0.1],
                             qp_method="pdip_ws", qp_iters=15)
    y_h, u_h = loop.simulate(wb_problem.r, wb_problem.v, 120, 20, 4,
                             [1.0, 1.0], [0.1, 0.1],
                             qp_method="hybrid", qp_iters=40)
    assert np.abs(np.asarray(y_h) - np.asarray(y_t)).max() < 5e-3
    assert np.abs(np.asarray(u_h) - np.asarray(u_t)).max() < 5e-2


def test_vns_objective_per_candidate_weights(wb_problem):
    """A (B, nu) lambda batch must reproduce the per-call shared-weight
    evaluations exactly (the batched band weight-search path)."""
    N_b = np.array([16, 16, 16])
    Nu_b = np.array([4, 4, 4])
    delta = np.array([1.0, 1.0])
    lams = np.array([[0.1, 0.1], [0.5, 0.05], [0.02, 0.8]])
    F_batch = vns_objective_batch(wb_problem, N_b, Nu_b,
                                  np.tile(delta, (3, 1)), lams)
    for j in range(3):
        F_one = vns_objective_batch(wb_problem, N_b[j:j + 1], Nu_b[j:j + 1],
                                    delta, lams[j])
        np.testing.assert_allclose(F_batch[j], F_one[0], rtol=1e-12)


def test_unrolled_lane_factor_solve_matches_lapack():
    rng = np.random.default_rng(3)
    B, n = 32, 8
    A = rng.standard_normal((B, n, n))
    M = A @ A.transpose(0, 2, 1) + n * np.eye(n)
    Mt = jnp.asarray(M.transpose(1, 2, 0))
    Lt = _factor_lanes_unrolled(Mt)
    np.testing.assert_allclose(np.asarray(Lt).transpose(2, 0, 1),
                               np.linalg.cholesky(M), atol=1e-10)
    rhs = rng.standard_normal((n, B))
    x = _solve_lanes_unrolled(Lt, jnp.asarray(rhs))
    xref = np.linalg.solve(M, rhs.T[..., None])[..., 0].T
    np.testing.assert_allclose(np.asarray(x), xref, atol=1e-10)


def test_whole_sim_fused_kernel_matches_admm_scan():
    """EXPERIMENTAL whole-sim kernel (the entire closed loop in ONE
    Pallas call — interpret mode here): must reproduce the dense
    warm-ADMM scan path exactly at f64 (same algorithm, same constants;
    measured 1e-14) — the basis for its on-chip 25.4k sims/s headline
    candidate (PERF.md round-5; adoption pends decision-level
    qualification)."""
    from mpc_tuning_tpu.sim.mpc_loop import (closed_loop_batch,
                                             closed_loop_batch_sim_fused,
                                             horizon_caps)
    import jax

    NIT, B = 60, 4
    case = woodberry.make_case(nit=NIT)
    problem, _ = build_problem(case, dtype=jnp.float64, qp_iters=40)
    loop = problem.loop
    rng = np.random.default_rng(0)
    N_np = rng.integers(16, 64, size=B)
    Nu_np = rng.integers(2, 7, size=B)
    loop = loop.capped(*horizon_caps(loop.dims["p_max"],
                                     loop.dims["m_max"], N_np, Nu_np))
    c = loop.arrays(jnp.float64)
    d = loop.dims
    r_b = jnp.asarray(np.broadcast_to(problem.r[:NIT], (B, NIT, 2)))
    v = jnp.asarray(problem.v[:NIT])
    args = (jnp.asarray(N_np), jnp.asarray(Nu_np),
            jnp.asarray(rng.uniform(0.2, 2.0, size=(B, 2))),
            jnp.asarray(rng.uniform(0.01, 0.5, size=(B, 2))))
    statics = (d["p_max"], d["m_max"], d["ny"], d["nu"], d["with_y"],
               d["rho"], 40)
    with jax.default_matmul_precision("highest"):
        Yr, Ur = closed_loop_batch(c, r_b, v, *args, *statics, "admm",
                                   False)
    Ys, Us = closed_loop_batch_sim_fused(c, r_b, v, *args, *statics[:-1],
                                         40, block_lanes=128)
    np.testing.assert_allclose(np.asarray(Ys), np.asarray(Yr), atol=1e-12)
    np.testing.assert_allclose(np.asarray(Us), np.asarray(Ur), atol=1e-12)


def test_whole_sim_pdip_kernel_matches_scan():
    """Whole-sim PDIP kernel (GAM-stage speed path): must reproduce the
    'pdip_ws_fused' scan engine exactly at f64 (same warm-started masked
    PDIP per step, same best-iterate selection; measured 4e-15) — the
    correctness basis for its on-chip GAM adoption
    (checkpoints/sim_pdip_qualification.json)."""
    NIT, B = 60, 4
    case = woodberry.make_case(nit=NIT, nbp=5, nbc=2)
    problem, _ = build_problem(case, dtype=jnp.float64, qp_iters=15)
    loop = problem.loop
    rng = np.random.default_rng(0)
    r_b = np.broadcast_to(problem.r[:NIT], (B, NIT, 2))
    args = (r_b, problem.v, np.array([8, 12, 16, 20]), np.full(B, 2),
            rng.uniform(0.2, 2.0, (B, 2)), rng.uniform(0.01, 0.5, (B, 2)),
            NIT, jnp.float64, 15)
    Yk, Uk = loop.closed_batch(*args, qp_method="pdip_sim_fused@128")
    Ys, Us = loop.closed_batch(*args, qp_method="pdip_ws_fused")
    np.testing.assert_allclose(np.asarray(Yk), np.asarray(Ys), atol=1e-12)
    np.testing.assert_allclose(np.asarray(Uk), np.asarray(Us), atol=1e-12)


def test_whole_sim_band_kernel_matches_scan():
    """Whole-sim BAND kernel ('pdip_sim_fused+lp20+split12'): slack
    seeding + stage-0 slack LP + slack-frozen stage-2 PDIP per step, all
    inside one Pallas call — must reproduce the production scan band
    engine at f64 (algorithm-identical; measured 2.6e-10 over 30 steps
    of the Shell7x5 configuration)."""
    from mpc_tuning_tpu.cases import shell7x5
    from mpc_tuning_tpu.cases.cross_eval import REF_TUNED

    ref = REF_TUNED["Shell7x5"]
    case = shell7x5.make_case()
    problem, _ = build_problem(case, dtype=jnp.float64,
                               L=np.diag(ref.L), R=np.diag(ref.R))
    loop = problem.loop
    B, NIT = 2, 25
    r_b = np.broadcast_to(problem.r[:NIT], (B, NIT, 7))
    args = (r_b, problem.v, np.array([10, 14]), np.array([2, 2]),
            np.zeros((B, 7)), np.broadcast_to(ref.lam, (B, 3)).copy(),
            NIT, jnp.float64, 12)
    Yk, Uk = loop.closed_batch(*args,
                               qp_method="pdip_sim_fused@128+lp20+split12")
    Ys, Us = loop.closed_batch(*args,
                               qp_method="pdip_ws_fused+lp20+split12")
    np.testing.assert_allclose(np.asarray(Yk), np.asarray(Ys), atol=1e-8)
    np.testing.assert_allclose(np.asarray(Uk), np.asarray(Us), atol=1e-8)


def test_sim_fused_dispatch_and_mesh_fallback():
    """'admm_sim_fused' is the round-5 production VNS engine (adopted at
    zero decision flips after the candidate-table precision fix,
    checkpoints/sim_fused_qualification.json).  MPCLoop.closed_batch
    must (a) dispatch it through the whole-sim kernel, and (b) fall back
    to the algorithm-identical step-fused scan engine when the call is
    outside the kernel's envelope (candidate-mesh sharding here) — same
    trajectories either way."""
    import jax
    from jax.sharding import Mesh

    NIT, B = 40, 4
    case = woodberry.make_case(nit=NIT, nbp=4, nbc=2)
    problem, _ = build_problem(case, dtype=jnp.float32, qp_iters=10)
    loop = problem.loop
    r_b = np.broadcast_to(problem.r[:NIT], (B, NIT, 2))
    args = (r_b, problem.v, np.full(B, 6), np.full(B, 2),
            np.ones((B, 2)), 0.1 * np.ones((B, 2)), NIT, jnp.float32, 10)
    Yk, Uk = loop.closed_batch(*args, qp_method="admm_sim_fused@512")
    Ys, Us = loop.closed_batch(*args, qp_method="admm_fused@512")
    np.testing.assert_allclose(np.asarray(Yk), np.asarray(Ys), atol=2e-5)
    mesh = Mesh(np.array(jax.devices()[:1]), ("cand",))
    Ym, _ = loop.closed_batch(*args, qp_method="admm_sim_fused@512",
                              mesh=mesh)
    np.testing.assert_allclose(np.asarray(Ym), np.asarray(Ys), atol=2e-5)
