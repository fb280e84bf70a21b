"""Capacity bucketing (sim/mpc_loop.capped / horizon_caps): simulating a
candidate batch at the smallest covering (p_cap, m_cap) bucket is EXACT —
the discarded constraint rows / move columns were fully-masked zeros, and
the PDIP engines pin masked-row duals to zero with mu normalized by the
active-row count, so the iterate trajectory itself is shape-independent
(ops/qp.solve_qp_masked docstring)."""

import numpy as np
import pytest
import jax.numpy as jnp

from mpc_tuning_tpu.sim.mpc_loop import horizon_caps
from mpc_tuning_tpu.tuning.api import build_problem


def test_horizon_caps_buckets():
    assert horizon_caps(127, 15, [5, 8], [2, 2]) == (8, 2)
    assert horizon_caps(127, 15, [30], [3]) == (32, 4)
    assert horizon_caps(127, 15, [40, 63], [5]) == (64, 8)
    assert horizon_caps(127, 15, [41], [3]) == (48, 4)
    assert horizon_caps(127, 15, [80], [3]) == (96, 4)
    assert horizon_caps(127, 15, [100], [9]) == (127, 15)
    assert horizon_caps(127, 15, [127], [15]) == (127, 15)
    # caps never exceed the maxima even for small maxima
    assert horizon_caps(15, 3, [7], [2]) == (8, 2)


@pytest.mark.parametrize("qp_method,iters", [("pdip", 20),
                                             ("pdip_ws_lanes", 15),
                                             ("admm", 40)])
def test_wb_capped_matches_full(qp_method, iters):
    from mpc_tuning_tpu.cases import woodberry

    case = woodberry.make_case(nit=60)
    problem, _ = build_problem(case, dtype=jnp.float64, qp_iters=iters)
    loop = problem.loop
    rng = np.random.default_rng(0)
    B = 4
    r_b = np.broadcast_to(problem.r[:60], (B, 60, 2))
    N_b = rng.integers(8, 30, size=B)
    Nu_b = rng.integers(2, 4, size=B)
    d_b = rng.uniform(0.2, 2.0, (B, 2))
    l_b = rng.uniform(0.02, 0.5, (B, 2))
    kw = dict(qp_method=qp_method)
    Yf, Uf = loop.closed_batch(r_b, problem.v, N_b, Nu_b, d_b, l_b, 60,
                               jnp.float64, iters, caps=(127, 15), **kw)
    Yc, Uc = loop.closed_batch(r_b, problem.v, N_b, Nu_b, d_b, l_b, 60,
                               jnp.float64, iters, **kw)
    tol = 1e-6 if qp_method == "admm" else 1e-9  # admm rho sees n_pad
    np.testing.assert_allclose(np.asarray(Yc), np.asarray(Yf), atol=tol)
    np.testing.assert_allclose(np.asarray(Uc), np.asarray(Uf), atol=tol)

    Yfo, Ufo = loop.open_batch(r_b[:, -1], problem.v, N_b, Nu_b, d_b, l_b,
                               60, jnp.float64, 20, caps=(127, 15))
    Yco, Uco = loop.open_batch(r_b[:, -1], problem.v, N_b, Nu_b, d_b, l_b,
                               60, jnp.float64, 20)
    np.testing.assert_allclose(np.asarray(Yco), np.asarray(Yfo), atol=1e-9)


def test_band_capped_matches_full_until_activation():
    """Shell7x5 band case: capped and full agree to fp noise while the
    tight bands are inactive; once they activate the loop amplifies ulps
    chaotically (measured ~100x/step — the full-shape engine family
    already differs by O(0.5) among its own members there), so the gate
    stops at the pre-activation window."""
    from mpc_tuning_tpu.cases import shell7x5
    from mpc_tuning_tpu.cases.cross_eval import REF_TUNED

    ref = REF_TUNED["Shell7x5"]
    nit = 18
    case = shell7x5.make_case(nit=nit)
    problem, _ = build_problem(case, dtype=jnp.float64, qp_iters=30,
                               L=np.diag(ref.L), R=np.diag(ref.R))
    loop = problem.loop
    rng = np.random.default_rng(0)
    B = 3
    r_b = np.broadcast_to(problem.r[:nit], (B, nit, 7))
    N_b = np.array([10, 20, 38])
    Nu_b = np.array([2, 3, 4])
    d_b = np.broadcast_to(ref.delta, (B, 7))
    l_b = rng.uniform(0.05, 1.5, (B, 3))
    Yf, _ = loop.closed_batch(r_b, problem.v, N_b, Nu_b, d_b, l_b, nit,
                              jnp.float64, 30, qp_method="pdip",
                              caps=(127, 15))
    Yc, _ = loop.closed_batch(r_b, problem.v, N_b, Nu_b, d_b, l_b, nit,
                              jnp.float64, 30, qp_method="pdip")
    np.testing.assert_allclose(np.asarray(Yc), np.asarray(Yf), atol=1e-8)


def test_nmpc_capped_matches_full():
    from mpc_tuning_tpu.cases import vandevusse

    case = vandevusse.make_case(nit=12, substeps=3, sqp_iters=2,
                                qp_iters=12)
    problem = vandevusse.build_problem(case, dtype=jnp.float64)
    loop = problem.loop
    B = 3
    r_b = np.broadcast_to(case.r[:12], (B, 12, 2))
    N_b = np.array([3, 5, 7])
    Nu_b = np.array([2, 2, 3])
    d_b = np.broadcast_to([0.093, 0.1133], (B, 2))
    l_b = np.broadcast_to([0.246, 0.1231], (B, 2))
    s = loop.spec
    Yf, Uf = loop.closed_batch(r_b, problem.v, N_b, Nu_b, d_b, l_b, 12,
                               jnp.float64, None,
                               caps=(s.p_max, s.m_max))
    Yc, Uc = loop.closed_batch(r_b, problem.v, N_b, Nu_b, d_b, l_b, 12,
                               jnp.float64, None)
    np.testing.assert_allclose(np.asarray(Yc), np.asarray(Yf), atol=1e-7)
    np.testing.assert_allclose(np.asarray(Uc), np.asarray(Uf), atol=1e-5)
