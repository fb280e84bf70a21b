"""Batched dense QP solver: infeasible-start Mehrotra predictor-corrector
primal-dual interior point with a FIXED iteration count.

    min_z  1/2 z'Hz + f'z   s.t.  G z <= h

This is the TPU-native replacement for the MATLAB MPC Toolbox's built-in
active-set QP inside ``sim``/``mpcmove`` (SURVEY.md section 2.5; the per-step
constrained QP of /root/reference/MPC-Tuning/MPC_Tuning/closedloop_toolbox.m:50).
Active-set methods branch data-dependently; a fixed-iteration PDIP is pure,
shape-static, and vmaps across thousands of tuning candidates — every step
is batched matmuls + one Cholesky solve on the MXU.

Design notes
 * infeasible start (z=0 may violate soft output constraints), standard
   residual formulation with slacks s = h - Gz.
 * reduced system: (H + G' diag(lam/s) G) dz = rhs, solved by Cholesky with
   a tiny ridge for robustness at f32.
 * fraction-to-boundary 0.995, sigma = (mu_aff/mu)^3 Mehrotra centering.
 * rows can be disabled per-candidate by setting that row of G to 0 and
   h to 1 (trivially satisfied) — used to mask horizon-dependent
   constraints so one shape serves the whole candidate batch.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["solve_qp", "solve_qp_masked", "qp_kkt_residuals"]

# warm-start re-centering: slacks/duals are floored at _WS_EPS and duals
# capped at _WS_LAM_CAP so a stale active set (e.g. right after a setpoint
# step) cannot start the Newton iteration nearly singular
_WS_EPS = 1e-4
_WS_LAM_CAP = None


@partial(jax.jit, static_argnames=("iters", "use_pallas"))
def solve_qp(H, f, G, h, iters: int = 30, use_pallas: bool = False,
             init=None):
    """Solve one QP.  H (n,n), f (n,), G (m,n), h (m,).  Returns (z, lam, s).

    vmap over leading batch axes for the candidate-parallel version.
    use_pallas routes the reduced-system solves through the lane-batched
    Pallas Cholesky kernel (ops/pallas_kernels.py) — essential on TPU where
    XLA's batched small Cholesky is the bottleneck of the whole tuning
    workload.
    """
    n = H.shape[0]
    m = G.shape[0]
    dtype = H.dtype

    if init is None:
        z = jnp.zeros(n, dtype)
        s = jnp.maximum(h - G @ z, jnp.asarray(1.0, dtype))
        lam = jnp.ones(m, dtype)
    else:
        # warm start (successive MPC QPs differ only in f and h): reuse the
        # previous solution, re-centred away from the boundary so the first
        # Newton steps are well-conditioned
        z0, lam0, s0 = init
        z = z0
        eps_c = jnp.asarray(_WS_EPS, dtype)
        s = jnp.maximum(h - G @ z, eps_c)
        lam = jnp.clip(lam0, eps_c, _WS_LAM_CAP)

    ridge = jnp.asarray(1e-9 if dtype == jnp.float64 else 1e-6, dtype)
    eyen = jnp.eye(n, dtype=dtype)

    # a fixed-count loop keeps iterating after convergence, where the KKT
    # system goes singular (lam/s -> inf) and steps turn to garbage/NaN; we
    # therefore track the best iterate by KKT merit and return that.  The
    # comparison is NaN-safe: NaN merit never beats the incumbent.
    w_cap = jnp.asarray(1e13 if dtype == jnp.float64 else 1e7, dtype)

    def merit_of(z, lam, s):
        r_d = H @ z + f + G.T @ lam
        r_p = G @ z + s - h
        return jnp.linalg.norm(r_d) + jnp.linalg.norm(r_p) + jnp.dot(lam, s)

    def body(carry, _):
        z, lam, s, best = carry
        r_d = H @ z + f + G.T @ lam  # dual residual
        r_p = G @ z + s - h  # primal residual
        gap = jnp.dot(lam, s)
        mu = gap / m

        # best-iterate tracking from the residuals just computed (the merit
        # of the INCOMING iterate) — no extra G products per iteration; the
        # final iterate is scored once after the scan.  NaN never wins.
        zb, lamb, sb, mb = best
        mnew = jnp.linalg.norm(r_d) + jnp.linalg.norm(r_p) + gap
        take = mnew < mb
        best = (
            jnp.where(take, z, zb),
            jnp.where(take, lam, lamb),
            jnp.where(take, s, sb),
            jnp.where(take, mnew, mb),
        )

        w = jnp.minimum(lam / s, w_cap)  # (m,)
        M = H + (G.T * w) @ G + ridge * eyen
        if use_pallas:
            from mpc_tuning_tpu.ops.pallas_kernels import spd_factor, spd_factor_solve

            Lp = spd_factor(M)

            def solve(rhs):
                return spd_factor_solve(Lp, rhs)
        else:
            Lc = jnp.linalg.cholesky(M)

            def solve(rhs):
                y1 = jax.scipy.linalg.solve_triangular(Lc, rhs, lower=True)
                return jax.scipy.linalg.solve_triangular(Lc.T, y1, lower=False)

        # affine (predictor) step: r_cent = lam*s, so r_cent/s = lam
        # reduced rhs: -r_d + G'((r_cent - lam*r_p)/s)
        rhs_aff = -r_d + G.T @ (lam - w * r_p)
        dz_aff = solve(rhs_aff)
        ds_aff = -(r_p + G @ dz_aff)
        dlam_aff = -(lam * s + lam * ds_aff) / s

        def max_step(v, dv):
            ratio = jnp.where(dv < 0, -v / dv, jnp.inf)
            return jnp.minimum(1.0, 0.995 * jnp.min(ratio))

        a_aff = jnp.minimum(max_step(s, ds_aff), max_step(lam, dlam_aff))
        mu_aff = jnp.dot(lam + a_aff * dlam_aff, s + a_aff * ds_aff) / m
        sigma = (mu_aff / (mu + 1e-30)) ** 3

        # corrector: r_cent = lam*s - sigma*mu + dlam_aff*ds_aff
        r_cent = lam * s - sigma * mu + dlam_aff * ds_aff
        rhs = -r_d + G.T @ (r_cent / s - w * r_p)
        dz = solve(rhs)
        ds = -(r_p + G @ dz)
        dlam = -(r_cent + lam * ds) / s

        a = jnp.minimum(max_step(s, ds), max_step(lam, dlam))
        z = z + a * dz
        s = s + a * ds
        lam = lam + a * dlam
        return (z, lam, s, best), None

    inf_m = jnp.asarray(jnp.inf, dtype)
    best0 = (z, lam, s, inf_m)
    (z, lam, s, best), _ = jax.lax.scan(
        body, (z, lam, s, best0), None, length=iters)
    zb, lamb, sb, mb = best
    mlast = merit_of(z, lam, s)
    take = mlast < mb
    z = jnp.where(take, z, zb)
    lam = jnp.where(take, lam, lamb)
    s = jnp.where(take, s, sb)
    return z, lam, s


@partial(jax.jit, static_argnames=("iters", "use_pallas"))
def solve_qp_masked(H, f, G0, T2, rmask, cmask_z, h, iters: int = 30,
                    use_pallas: bool = False, init=None):
    """PDIP for the masked-constraint MPC QP:  G = diag(rmask) G0 diag(cmask_z).

    The MPC candidate batch shares ONE constraint matrix G0 (mc, n) — a
    candidate (N, Nu) enters only through the 0/1 row mask ``rmask`` (mc,)
    and variable mask ``cmask_z`` (n,) (ops/mpc_qp.assemble_candidate).
    Exploiting that factorization turns every G product of the interior
    point into a matmul against the SHARED G0, so under ``vmap`` over
    candidates XLA emits single large MXU matmuls instead of a batch of
    (mc, n)-sized ones (which tile the 128x128 systolic array at a few
    percent utilization and dominated the closed-loop tuning workload):

      G z        -> rmask * (G0 @ (cmask_z * z))
      G' y       -> cmask_z * (G0' @ (rmask * y))
      G' W G     -> reshape((w * rmask) @ T2) * outer(cmask_z, cmask_z)

    with T2[k] = vec(G0[k] G0[k]') precomputed (mc, n*n) — the normal-matrix
    formation becomes one (B, mc) @ (mc, n*n) matmul per iteration.

    Same algorithm/constants as ``solve_qp`` (Mehrotra predictor-corrector,
    fixed iteration count, best-iterate-by-merit return, warm-start
    re-centering); results agree to solver tolerance.
    """
    n = H.shape[0]
    m = G0.shape[0]
    dtype = H.dtype

    def Gmat(z):
        return rmask * (G0 @ (cmask_z * z))

    def GTmat(y):
        return cmask_z * ((rmask * y) @ G0)

    if init is None:
        z = jnp.zeros(n, dtype)
        s = jnp.maximum(h - Gmat(z), jnp.asarray(1.0, dtype))
        lam = jnp.ones(m, dtype)
    else:
        z0, lam0, s0 = init
        z = z0
        eps_c = jnp.asarray(_WS_EPS, dtype)
        s = jnp.maximum(h - Gmat(z), eps_c)
        lam = jnp.clip(lam0, eps_c, _WS_LAM_CAP)

    ridge = jnp.asarray(1e-9 if dtype == jnp.float64 else 1e-6, dtype)
    eyen = jnp.eye(n, dtype=dtype)
    cc = cmask_z[:, None] * cmask_z[None, :]
    w_cap = jnp.asarray(1e13 if dtype == jnp.float64 else 1e7, dtype)

    def merit_of(z, lam, s):
        r_d = H @ z + f + GTmat(lam)
        r_p = Gmat(z) + s - h
        return jnp.linalg.norm(r_d) + jnp.linalg.norm(r_p) + jnp.dot(lam, s)

    def body(carry, _):
        z, lam, s, best = carry
        r_d = H @ z + f + GTmat(lam)
        r_p = Gmat(z) + s - h
        gap = jnp.dot(lam, s)
        mu = gap / m

        zb, lamb, sb, mb = best
        mnew = jnp.linalg.norm(r_d) + jnp.linalg.norm(r_p) + gap
        take = mnew < mb
        best = (
            jnp.where(take, z, zb),
            jnp.where(take, lam, lamb),
            jnp.where(take, s, sb),
            jnp.where(take, mnew, mb),
        )

        w = jnp.minimum(lam / s, w_cap) * rmask  # (m,) — masked rows drop out
        M = H + (w @ T2).reshape(n, n) * cc + ridge * eyen
        if use_pallas:
            from mpc_tuning_tpu.ops.pallas_kernels import spd_factor, spd_factor_solve

            Lp = spd_factor(M)

            def solve(rhs):
                return spd_factor_solve(Lp, rhs)
        else:
            Lc = jnp.linalg.cholesky(M)

            def solve(rhs):
                y1 = jax.scipy.linalg.solve_triangular(Lc, rhs, lower=True)
                return jax.scipy.linalg.solve_triangular(Lc.T, y1, lower=False)

        rhs_aff = -r_d + GTmat(lam - w * r_p)
        dz_aff = solve(rhs_aff)
        ds_aff = -(r_p + Gmat(dz_aff))
        dlam_aff = -(lam * s + lam * ds_aff) / s

        def max_step(v, dv):
            ratio = jnp.where(dv < 0, -v / dv, jnp.inf)
            return jnp.minimum(1.0, 0.995 * jnp.min(ratio))

        a_aff = jnp.minimum(max_step(s, ds_aff), max_step(lam, dlam_aff))
        mu_aff = jnp.dot(lam + a_aff * dlam_aff, s + a_aff * ds_aff) / m
        sigma = (mu_aff / (mu + 1e-30)) ** 3

        r_cent = lam * s - sigma * mu + dlam_aff * ds_aff
        rhs = -r_d + GTmat(r_cent / s - w * r_p)
        dz = solve(rhs)
        ds = -(r_p + Gmat(dz))
        dlam = -(r_cent + lam * ds) / s

        a = jnp.minimum(max_step(s, ds), max_step(lam, dlam))
        z = z + a * dz
        s = s + a * ds
        lam = lam + a * dlam
        return (z, lam, s, best), None

    inf_m = jnp.asarray(jnp.inf, dtype)
    best0 = (z, lam, s, inf_m)
    (z, lam, s, best), _ = jax.lax.scan(
        body, (z, lam, s, best0), None, length=iters)
    zb, lamb, sb, mb = best
    mlast = merit_of(z, lam, s)
    take = mlast < mb
    z = jnp.where(take, z, zb)
    lam = jnp.where(take, lam, lamb)
    s = jnp.where(take, s, sb)
    return z, lam, s


def admm_precompute(H, G, sigma: float = 1e-6):
    """Per-candidate constants for the ADMM solver.

    The MPC QP is badly scaled out of the box (the ECR slack penalty puts
    ~1e5 on one Hessian entry while masked-move ridges sit at 1), so we
    equilibrate first (Ruiz-lite):
      * variable scaling  Dinv = 1/sqrt(diag(H))  ->  Hs = Dinv H Dinv
      * constraint row scaling e = 1/||row||      ->  Gs = e G Dinv
    and then invert  M = Hs + sigma I + rho Gs'Gs  ONCE per candidate.
    Every timestep / ADMM iteration of a closed-loop simulation reuses Minv,
    so iterations contain only (batched) matmuls and clips — the
    TPU-friendly shape (cf. OSQP / the ReLU-QP formulation, PAPERS.md).

    Returns a dict {Minv, rho, Dinv, e, Hs, Gs}.
    """
    n = H.shape[0]
    dh = jnp.sqrt(jnp.clip(jnp.diag(H), 1e-8, None))
    Dinv = 1.0 / dh
    Hs = H * Dinv[:, None] * Dinv[None, :]
    Gs0 = G * Dinv[None, :]
    rn = jnp.linalg.norm(Gs0, axis=1)
    e = 1.0 / jnp.clip(rn, 1e-8, None)
    e = jnp.where(rn < 1e-12, 1.0, e)  # disabled rows keep scale 1
    Gs = Gs0 * e[:, None]
    GtG = Gs.T @ Gs
    # 0.1x the curvature ratio: empirically near-optimal on the MPC tracking
    # QP class (WB/Shell3x3 sweeps; rho=1x stalls an order of magnitude
    # slower) — see tests/test_production_qp.py
    rho = 0.1 * jnp.linalg.norm(Hs) / (jnp.linalg.norm(GtG) + 1e-12)
    rho = jnp.clip(rho, 1e-3, 1e2)
    M = Hs + sigma * jnp.eye(n, dtype=H.dtype) + rho * GtG
    Minv = jnp.linalg.inv(M)
    return {"Minv": Minv, "rho": rho, "Dinv": Dinv, "e": e, "Hs": Hs, "Gs": Gs}


def solve_qp_admm(pre, f, h, state, iters: int, sigma: float = 1e-6,
                  over_relax: float = 1.6):
    """Fixed-iteration equilibrated ADMM for min 1/2 z'Hz + f'z, Gz <= h.

    ``pre`` is the admm_precompute dict; ``state = (x, zc, y)`` is the warm
    start in SCALED coordinates (carry it across closed-loop timesteps:
    successive MPC QPs differ only in f and h, so a handful of iterations
    re-converges).  Returns (z_unscaled, new_state).
    """
    Minv, rho, Dinv, e, Gs = pre["Minv"], pre["rho"], pre["Dinv"], pre["e"], pre["Gs"]
    fs = f * Dinv
    hs = h * e
    x0, zc0, y0 = state

    def body(carry, _):
        x, zc, y = carry
        rhs = sigma * x - fs + Gs.T @ (rho * zc - y)
        x = Minv @ rhs
        Gx = Gs @ x
        Gx_r = over_relax * Gx + (1.0 - over_relax) * zc
        z_new = jnp.minimum(Gx_r + y / rho, hs)
        y = y + rho * (Gx_r - z_new)
        return (x, z_new, y), None

    (x, zc, y), _ = jax.lax.scan(body, (x0, zc0, y0), None, length=iters)
    return x * Dinv, (x, zc, y)


def qp_kkt_residuals(H, f, G, h, z, lam, s):
    """Diagnostics: (stationarity, primal, complementarity) residual norms."""
    r_d = H @ z + f + G.T @ lam
    r_p = jnp.maximum(G @ z - h, 0.0)
    comp = jnp.abs(lam * s)
    return jnp.linalg.norm(r_d), jnp.linalg.norm(r_p), jnp.max(comp)
