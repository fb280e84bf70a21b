"""Native C++ dual active-set QP oracle vs the jax PDIP solver."""

import numpy as np
import pytest
import jax.numpy as jnp

from mpc_tuning_tpu.ops.native_qp import native_available, qp_solve_exact
from mpc_tuning_tpu.ops.qp import solve_qp

pytestmark = pytest.mark.skipif(not native_available(), reason="no g++")


def _random_qp(rng, n, m):
    A = rng.standard_normal((n, n))
    H = A @ A.T + n * np.eye(n)
    f = rng.standard_normal(n)
    G = rng.standard_normal((m, n))
    h = np.abs(rng.standard_normal(m)) + 0.3
    return H, f, G, h


@pytest.mark.parametrize("seed", range(8))
def test_native_matches_pdip(seed):
    rng = np.random.default_rng(seed)
    H, f, G, h = _random_qp(rng, 10, 24)
    x, lam, status = qp_solve_exact(H, f, G, h)
    assert status == 0
    # KKT of the native solution
    assert np.linalg.norm(H @ x + f + G.T @ lam) < 1e-8
    assert np.max(G @ x - h) < 1e-8
    assert np.all(lam >= -1e-10)
    # agreement with the fixed-iteration PDIP
    z, *_ = solve_qp(jnp.array(H), jnp.array(f), jnp.array(G), jnp.array(h))
    np.testing.assert_allclose(np.asarray(z), x, atol=1e-6)


def test_native_unconstrained_interior():
    # optimum strictly inside the feasible set: active set stays empty
    rng = np.random.default_rng(99)
    H, f, G, h = _random_qp(rng, 6, 10)
    h = h + 100.0
    x, lam, status = qp_solve_exact(H, f, G, h)
    assert status == 0
    np.testing.assert_allclose(x, np.linalg.solve(H, -f), atol=1e-10)
    assert np.all(lam == 0)


def test_native_on_mpc_qp():
    """The real condensed MPC QP shape (masked rows included)."""
    import jax.numpy as jnp
    from mpc_tuning_tpu.cases import woodberry
    from mpc_tuning_tpu.ops.mpc_qp import assemble_candidate, qp_step_data
    from mpc_tuning_tpu.tuning.api import build_problem

    case = woodberry.make_case(nit=50, nbp=5, nbc=3)
    problem, _ = build_problem(case, dtype=jnp.float64)
    loop = problem.loop
    c = loop.arrays(jnp.float64)
    d = loop.dims
    cand = assemble_candidate(c, 12, 3, jnp.array([1.0, 1.0]), jnp.array([0.1, 0.1]),
                              d["p_max"], d["m_max"], d["ny"], d["nu"],
                              d["rho"], d["with_y"])
    rng = np.random.default_rng(5)
    x_hat = jnp.array(rng.standard_normal(c["A"].shape[0]) * 0.05)
    f, h, _ = qp_step_data(c, cand, x_hat, jnp.array([0.1, -0.05]),
                           jnp.array([0.4, 0.2]), jnp.zeros(1),
                           d["p_max"], d["m_max"], d["ny"], d["nu"], d["with_y"])
    H = np.asarray(cand["H"]) + 1e-9 * np.eye(cand["H"].shape[0])
    x, lam, status = qp_solve_exact(H, np.asarray(f), np.asarray(cand["G"]),
                                    np.asarray(h), max_iter=500)
    assert status == 0
    z, *_ = solve_qp(cand["H"], jnp.asarray(f), cand["G"], jnp.asarray(h), iters=40)
    np.testing.assert_allclose(np.asarray(z), x, atol=1e-5)
