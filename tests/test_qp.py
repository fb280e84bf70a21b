"""QP solver: random problems vs scipy SLSQP, KKT residuals, batching,
masked (disabled) rows."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from scipy.optimize import minimize

from mpc_tuning_tpu.ops.qp import solve_qp, qp_kkt_residuals


def _random_qp(rng, n, m):
    A = rng.standard_normal((n, n))
    H = A @ A.T + n * np.eye(n)
    f = rng.standard_normal(n)
    G = rng.standard_normal((m, n))
    # z=0 strictly feasible -> the random polyhedron is guaranteed nonempty
    h = np.abs(rng.standard_normal(m)) + 0.3
    return H, f, G, h


def _slsqp(H, f, G, h, x0=None):
    res = minimize(
        lambda z: 0.5 * z @ H @ z + f @ z,
        np.zeros(len(f)) if x0 is None else x0,
        jac=lambda z: H @ z + f,
        constraints=[{"type": "ineq", "fun": lambda z: h - G @ z,
                      "jac": lambda z: -G}],
        method="SLSQP",
        options={"maxiter": 400, "ftol": 1e-14},
    )
    return res.x


def _active_set_polish(H, f, G, h, lam, tol=1e-6):
    """Exact KKT solve on the active set identified by the IP solver: for a
    convex QP this is the definitive optimum if the resulting multipliers
    are >= 0 and the inactive constraints hold."""
    act = np.where(np.asarray(lam) > tol)[0]
    n = len(f)
    Ga = G[act]
    KKT = np.block([[H, Ga.T], [Ga, np.zeros((len(act), len(act)))]])
    rhs = np.concatenate([-f, h[act]])
    sol = np.linalg.lstsq(KKT, rhs, rcond=None)[0]
    z = sol[:n]
    mults = sol[n:]
    assert np.all(mults > -1e-8), mults
    assert np.all(G @ z - h <= 1e-7)
    return z


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_qp_matches_slsqp(seed):
    rng = np.random.default_rng(seed)
    H, f, G, h = _random_qp(rng, 8, 20)
    z, lam, s = solve_qp(jnp.array(H), jnp.array(f), jnp.array(G), jnp.array(h))
    z_ref = _active_set_polish(H, f, G, h, lam)
    np.testing.assert_allclose(np.asarray(z), z_ref, atol=1e-6)
    rd, rp, comp = qp_kkt_residuals(
        jnp.array(H), jnp.array(f), jnp.array(G), jnp.array(h), z, lam, s
    )
    assert float(rd) < 1e-7 and float(rp) < 1e-8 and float(comp) < 1e-7


def test_qp_infeasible_start():
    # constraints violated at z=0: z >= 1 elementwise (as -z <= -1)
    n = 5
    H = np.eye(n)
    f = np.zeros(n)
    G = -np.eye(n)
    h = -np.ones(n)
    z, *_ = solve_qp(jnp.array(H), jnp.array(f), jnp.array(G), jnp.array(h))
    np.testing.assert_allclose(np.asarray(z), np.ones(n), atol=1e-7)


def test_qp_masked_rows_ignored():
    rng = np.random.default_rng(7)
    H, f, G, h = _random_qp(rng, 6, 12)
    # solve with 4 extra *disabled* rows (G=0, h=1): must not change solution
    G2 = np.vstack([G, np.zeros((4, 6))])
    h2 = np.concatenate([h, np.ones(4)])
    z1, *_ = solve_qp(jnp.array(H), jnp.array(f), jnp.array(G), jnp.array(h))
    z2, *_ = solve_qp(jnp.array(H), jnp.array(f), jnp.array(G2), jnp.array(h2))
    np.testing.assert_allclose(np.asarray(z1), np.asarray(z2), atol=1e-8)


def test_qp_vmap_batch():
    rng = np.random.default_rng(11)
    B, n, m = 16, 8, 20
    Hs, fs, Gs, hs = [], [], [], []
    for _ in range(B):
        H, f, G, h = _random_qp(rng, n, m)
        Hs.append(H); fs.append(f); Gs.append(G); hs.append(h)
    Hs, fs, Gs, hs = map(np.stack, (Hs, fs, Gs, hs))
    zb, lamb, _ = jax.vmap(solve_qp)(jnp.array(Hs), jnp.array(fs), jnp.array(Gs), jnp.array(hs))
    for i in range(B):
        z_ref = _active_set_polish(Hs[i], fs[i], Gs[i], hs[i], lamb[i])
        np.testing.assert_allclose(np.asarray(zb[i]), z_ref, atol=1e-5)


@pytest.mark.parametrize("n,mc", [(46, 96), (23, 40)])
def test_fused_trinv_non_power_of_two_n(n, mc):
    """Fused whole-PDIP kernel at NON-power-of-two padded sizes: n=46 pads
    to n_pad=48 (the Shell3x3/7x5 decision size m_max*nu+1 with nu=3) and
    n=23 to 24.  The blocked L^{-1} doubling must clamp its trailing ragged
    blocks instead of slicing past n_pad (regression: trace-time
    'Out of bound slice' crash that disabled TPU tuning of the Shell cases).
    Both solve modes must match the per-lane reference engine."""
    from mpc_tuning_tpu.ops.qp import solve_qp_masked, solve_qp_masked_fused

    rng = np.random.default_rng(n)
    B = 4
    A = rng.standard_normal((B, n, n))
    H = A @ A.transpose(0, 2, 1) + n * np.eye(n)
    f = rng.standard_normal((B, n))
    G0 = rng.standard_normal((mc, n))
    h = np.abs(rng.standard_normal((B, mc))) + 0.3
    T2 = np.einsum("ki,kj->kij", G0, G0).reshape(mc, n * n)
    rmask = (rng.uniform(size=(B, mc)) < 0.8).astype(np.float64)
    cmask = np.ones((B, n))
    cmask[:, n - 3:] = rng.integers(0, 2, size=(B, 3))
    h = np.where(rmask > 0, h, 1.0)

    args = [jnp.asarray(x) for x in (H, f, rmask, cmask, h)]
    G0j, T2j = jnp.asarray(G0), jnp.asarray(T2)
    z0 = jnp.zeros((B, n)); l0 = jnp.ones((B, mc)); s0 = jnp.ones((B, mc))

    z_ref, lam_ref, s_ref = jax.vmap(
        lambda H, f, rm, cm, h, z, l, s: solve_qp_masked(
            H, f, G0j, T2j, rm, cm, h, iters=15, init=(z, l, s)),
        in_axes=(0, 0, 0, 0, 0, 0, 0, 0))(*args, z0, l0, s0)

    for mode in ("trinv", "subst"):
        z, lam, s = solve_qp_masked_fused(
            args[0], args[1], G0j, T2j, args[2], args[3], args[4],
            15, (z0, l0, s0), solve_mode=mode)
        np.testing.assert_allclose(np.asarray(z), np.asarray(z_ref),
                                   atol=1e-9, err_msg=mode)
        np.testing.assert_allclose(np.asarray(lam), np.asarray(lam_ref),
                                   atol=1e-9, err_msg=mode)


def test_admm_fused_lane_clamp_small_batch():
    """block_lanes=512 with a small batch (a VNS neighborhood) must clamp
    to one right-sized 128-lane block and still match the dense per-lane
    ADMM exactly."""
    import jax
    from mpc_tuning_tpu.ops.qp import (
        admm_precompute, solve_qp_admm, solve_qp_admm_fast)

    rng = np.random.default_rng(11)
    n, mc, B = 9, 14, 5
    A = rng.standard_normal((B, n, n))
    Hs = A @ A.transpose(0, 2, 1) + n * np.eye(n)
    G0 = rng.standard_normal((mc, n))
    f = rng.standard_normal((B, n))
    h = np.abs(rng.standard_normal((B, mc))) + 0.3
    rmask = np.ones((B, mc))
    cmask = np.ones((B, n))

    pres = [admm_precompute(jnp.asarray(Hs[i]),
                            jnp.asarray(rmask[i, :, None] * G0 * cmask[i]))
            for i in range(B)]
    z_ref = np.stack([
        np.asarray(solve_qp_admm(pres[i], jnp.asarray(f[i]),
                                 jnp.asarray(h[i]),
                                 (jnp.zeros(n), jnp.zeros(mc),
                                  jnp.zeros(mc)), iters=60)[0])
        for i in range(B)])

    pre_b = {k: jnp.stack([p[k] for p in pres]) for k in
             ("Minv", "rho", "Dinv", "e")}

    def one(Minv, rho, Dinv, e, f1, h1, rm, cm):
        pre = {"Minv": Minv, "rho": rho, "Dinv": Dinv, "e": e}
        z, _ = solve_qp_admm_fast(pre, f1, h1, rm, cm, jnp.asarray(G0),
                                  (jnp.zeros(n), jnp.zeros(mc),
                                   jnp.zeros(mc)), 60, block_lanes=512)
        return z

    z = jax.vmap(one)(pre_b["Minv"], pre_b["rho"], pre_b["Dinv"],
                      pre_b["e"], jnp.asarray(f), jnp.asarray(h),
                      jnp.asarray(rmask), jnp.asarray(cmask))
    np.testing.assert_allclose(np.asarray(z), z_ref, atol=1e-12)


def test_qp_float32():
    rng = np.random.default_rng(5)
    H, f, G, h = _random_qp(rng, 8, 16)
    z32, lam32, _ = solve_qp(
        jnp.array(H, dtype=jnp.float32), jnp.array(f, dtype=jnp.float32),
        jnp.array(G, dtype=jnp.float32), jnp.array(h, dtype=jnp.float32),
    )
    z_ref = _active_set_polish(H, f, G, h, np.asarray(lam32, dtype=np.float64), tol=1e-4)
    np.testing.assert_allclose(np.asarray(z32), z_ref, atol=5e-4)
