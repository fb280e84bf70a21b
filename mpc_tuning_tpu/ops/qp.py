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

Engine family (see PERF.md ladder + tuning/objectives.resolve_qp_method
for the accuracy-qualified production policy):
 * solve_qp / solve_qp_masked — per-candidate PDIP (vmap-able);
 * solve_qp_masked_lanes / _fused — lane-major batched PDIP, the fused
   variant running ALL iterations in one Pallas kernel per solve;
 * solve_qp_admm / solve_qp_admm_fused / _fast — equilibrated warm ADMM
   (matmul-only iterations, per-candidate precomputed inverse); the fused
   kernel is the VNS-stage tracking-case speed path (14k sims/s/chip);
 * fused_pdip_viable / admm_fused_max_lanes — VMEM-viability guards the
   'auto' policy consults per MPC shape.
"""

from __future__ import annotations

import functools
from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["solve_qp", "solve_qp_masked", "solve_qp_masked_lanes",
           "solve_qp_masked_fused", "solve_qp_masked_fast",
           "admm_precompute", "solve_qp_admm", "solve_qp_admm_fused",
           "solve_qp_admm_fast", "fused_pdip_viable",
           "admm_fused_max_lanes", "qp_kkt_residuals"]

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

    Masked rows are EXACT no-ops: their duals are pinned to zero and the
    centering parameter mu normalizes by the ACTIVE row count, so the
    iterate trajectory is identical whether masked rows are present or
    sliced away (the capacity-bucketing contract, sim/mpc_loop.capped;
    phantom rows used to bias mu downward and could throttle step lengths
    on the Shell7x5 band shape).
    """
    n = H.shape[0]
    m = G0.shape[0]
    dtype = H.dtype

    def Gmat(z):
        return rmask * (G0 @ (cmask_z * z))

    def GTmat(y):
        return cmask_z * ((rmask * y) @ G0)

    nact = jnp.maximum(jnp.sum(rmask), 1.0)
    if init is None:
        z = jnp.zeros(n, dtype)
        s = jnp.maximum(h - Gmat(z), jnp.asarray(1.0, dtype))
        lam = jnp.ones(m, dtype) * rmask
    else:
        z0, lam0, s0 = init
        z = z0
        eps_c = jnp.asarray(_WS_EPS, dtype)
        s = jnp.maximum(h - Gmat(z), eps_c)
        lam = jnp.clip(lam0, eps_c, _WS_LAM_CAP) * rmask

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
        mu = gap / nact

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
        mu_aff = jnp.dot(lam + a_aff * dlam_aff, s + a_aff * ds_aff) / nact
        sigma = (mu_aff / (mu + 1e-30)) ** 3

        # r_cent carries -sigma*mu on EVERY row; pin masked rows so their
        # (zero) duals stay exactly zero
        r_cent = (lam * s - sigma * mu + dlam_aff * ds_aff) * rmask
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


def _factor_lanes_unrolled(Mt):
    """Lane-major Cholesky, explicitly unrolled over the (static, small)
    matrix dimension: Mt (n, n, B) -> lower L (n, n, B).  Every operation
    is elementwise over the B lanes — the same algorithm as the Pallas
    spd_factor kernel, expressed in jnp for dtypes/backends the kernels
    don't cover (notably emulated f64 on TPU)."""
    n = Mt.shape[0]
    L = [[None] * n for _ in range(n)]
    for j in range(n):
        d = Mt[j, j]
        for k in range(j):
            d = d - L[j][k] * L[j][k]
        Ljj = jnp.sqrt(d)
        L[j][j] = Ljj
        inv = 1.0 / Ljj
        for i in range(j + 1, n):
            v = Mt[i, j]
            for k in range(j):
                v = v - L[i][k] * L[j][k]
            L[i][j] = v * inv
    zero = jnp.zeros_like(Mt[0, 0])
    rows = [jnp.stack([L[i][j] if j <= i else zero for j in range(n)])
            for i in range(n)]
    return jnp.stack(rows)


def _solve_lanes_unrolled(Lt, rhs):
    """Lane-major SPD solve from the unrolled factor: Lt (n, n, B) lower,
    rhs (n, B) -> x (n, B) with L L^T x = rhs (forward + back
    substitution unrolled over the static n)."""
    n = Lt.shape[0]
    y = [None] * n
    for i in range(n):
        v = rhs[i]
        for k in range(i):
            v = v - Lt[i, k] * y[k]
        y[i] = v / Lt[i, i]
    x = [None] * n
    for i in range(n - 1, -1, -1):
        v = y[i]
        for k in range(i + 1, n):
            v = v - Lt[k, i] * x[k]
        x[i] = v / Lt[i, i]
    return jnp.stack(x)


def solve_qp_masked_lanes(H_b, f_b, G0, T2, rmask_b, cmask_b, h_b,
                          iters: int, init_b, use_pallas: bool = True):
    """Explicitly-batched LANE-MAJOR masked PDIP — the TPU speed path.

    Same algorithm and constants as ``solve_qp_masked`` but the whole
    interior-point loop runs with the candidate batch on the trailing
    (lane) axis: vectors (k, B), normal matrices (n_pad, n_pad, B) — the
    native layout of the Pallas factor/solve kernels
    (ops/pallas_kernels.factor_lanes / solve_lanes).  The batch-major
    custom_vmap path pays a transpose + padded-scatter HBM round-trip per
    kernel call (3+ per iteration); here every iteration is
      one (n_pad^2, mc) @ (mc, B) normal-matrix matmul (MXU),
      one lane-batched Cholesky + two lane-batched triangular solve pairs,
      four (mc, n) @ (n/mc, B) G-products (MXU),
      and elementwise (k, B) vector work,
    with zero layout changes.

    H_b (B, n, n), f_b (B, n), rmask_b (B, mc), cmask_b (B, n), h_b (B, mc),
    init_b = (z0 (B, n), lam0 (B, mc), s0 (B, mc)); G0 (mc, n), T2
    (mc, n*n) shared.  Returns (z, lam, s) batch-major.
    """
    B, n = f_b.shape
    mc = G0.shape[0]
    dtype = f_b.dtype
    n_pad = max(8, -(-n // 8) * 8)
    # lane padding is a kernel-layout requirement; the jnp fallback path
    # (CPU/debug) runs at the true batch size
    B_pad = -(-B // 128) * 128 if use_pallas else B
    pb = B_pad - B

    # ---- one-time layout: batched -> lane-major (+ batch padding)
    def lanes(x, fill=0.0):
        x = x.T  # (k, B)
        if pb:
            x = jnp.concatenate(
                [x, jnp.full((x.shape[0], pb), fill, dtype)], axis=1)
        return x

    f_l = lanes(f_b)
    h_l = lanes(h_b, 1.0)
    rmask_l = lanes(rmask_b)          # padded lanes: all rows masked
    cmask_l = lanes(cmask_b)
    Hp = jnp.zeros((n_pad, n_pad, B_pad), dtype)
    Hp = Hp.at[jnp.arange(n_pad), jnp.arange(n_pad), :].set(1.0)
    Hp = Hp.at[:n, :n, :B].set(H_b.transpose(1, 2, 0))
    # padded batch lanes keep the identity diagonal (nonsingular no-ops)
    if pb:
        Hp = Hp.at[jnp.arange(n), jnp.arange(n), B:].set(1.0)

    # padded T2^T: (n_pad*n_pad, mc), zeros in padded rows/cols
    T2p = jnp.zeros((mc, n_pad, n_pad), dtype)
    T2p = T2p.at[:, :n, :n].set(T2.reshape(mc, n, n))
    T2T = T2p.reshape(mc, n_pad * n_pad).T

    cc = cmask_l[:, None, :] * cmask_l[None, :, :]  # (n, n, B_pad)
    cc_pad = jnp.zeros((n_pad, n_pad, B_pad), dtype).at[:n, :n, :].set(cc)

    z0_b, lam0_b, s0_b = init_b
    eps_c = jnp.asarray(_WS_EPS, dtype)
    z = lanes(z0_b)

    def Gmat(z):  # (n, B) -> (mc, B)
        return rmask_l * (G0 @ (cmask_l * z[:n]))

    def GTmat(y):  # (mc, B) -> (n, B)
        return cmask_l * (G0.T @ (rmask_l * y))

    s = jnp.maximum(h_l - Gmat(z), eps_c)
    lam = jnp.clip(lanes(lam0_b, 1.0), eps_c, _WS_LAM_CAP) * rmask_l
    nact = jnp.maximum(jnp.sum(rmask_l, axis=0), 1.0)  # (B_pad,)

    ridge = jnp.asarray(1e-9 if dtype == jnp.float64 else 1e-6, dtype)
    w_cap = jnp.asarray(1e13 if dtype == jnp.float64 else 1e7, dtype)

    def merit_of(z, lam, s):
        r_d = jnp.einsum("ijB,jB->iB", Hp[:n, :n], z) + f_l + GTmat(lam)
        r_p = Gmat(z) + s - h_l
        return (jnp.linalg.norm(r_d, axis=0) + jnp.linalg.norm(r_p, axis=0)
                + jnp.sum(lam * s, axis=0))  # (B_pad,)

    if use_pallas:
        from mpc_tuning_tpu.ops.pallas_kernels import factor_lanes, solve_lanes
    elif jax.default_backend() != "cpu" and n_pad <= 32:
        # TPU non-Pallas path (the decision-grade f64 band engine): XLA
        # lowers batched jnp.linalg cholesky/triangular_solve to a near-
        # scalar loop on TPU (the round-2 "46 sims/s" finding — and at
        # f64 it is ~40x off); the explicit unrolled elimination below is
        # pure (B,)-lane elementwise work that XLA vectorizes fine in
        # both f32 and emulated f64.  Size-gated: the unrolling emits
        # ~n_pad^3/6 statements INSIDE the closed-loop scan body, and at
        # n_pad=48 (a full-m VNS exploration bucket) the remote compile
        # helper is OOM-killed; every decision-path bucket (m_cap <= 8,
        # n_pad <= 32) stays on the fast unrolled path.
        factor_lanes = _factor_lanes_unrolled
        solve_lanes = _solve_lanes_unrolled
    else:  # CPU/debug: LAPACK path in the same layout (keeps the f64
        # parity/cross-eval trajectories bit-stable round over round)
        def factor_lanes(Mt):
            return jnp.linalg.cholesky(Mt.transpose(2, 0, 1)).transpose(1, 2, 0)

        def solve_lanes(Lt, rhs):
            L = Lt.transpose(2, 0, 1)
            r = rhs.T[..., None]
            y1 = jax.scipy.linalg.solve_triangular(L, r, lower=True)
            x = jax.scipy.linalg.solve_triangular(
                jnp.swapaxes(L, -1, -2), y1, lower=False)
            return x[..., 0].T

    def pad_n(v):  # (n, B) -> (n_pad, B) zeros below
        return jnp.concatenate(
            [v, jnp.zeros((n_pad - n, B_pad), dtype)], axis=0) if n_pad > n else v

    def body(carry, _):
        z, lam, s, best = carry
        r_d = jnp.einsum("ijB,jB->iB", Hp[:n, :n], z) + f_l + GTmat(lam)
        r_p = Gmat(z) + s - h_l
        gap = jnp.sum(lam * s, axis=0)
        mu = gap / nact

        zb, lamb, sb, mb = best
        mnew = (jnp.linalg.norm(r_d, axis=0) + jnp.linalg.norm(r_p, axis=0)
                + gap)
        take = mnew < mb
        best = (jnp.where(take[None, :], z, zb),
                jnp.where(take[None, :], lam, lamb),
                jnp.where(take[None, :], s, sb),
                jnp.where(take, mnew, mb))

        w = jnp.minimum(lam / s, w_cap) * rmask_l  # (mc, B)
        M = Hp + (T2T @ w).reshape(n_pad, n_pad, B_pad) * cc_pad
        M = M.at[jnp.arange(n_pad), jnp.arange(n_pad), :].add(ridge)
        Lt = factor_lanes(M)

        rhs_aff = pad_n(-r_d + GTmat(lam - w * r_p))
        dz_aff = solve_lanes(Lt, rhs_aff)[:n]
        ds_aff = -(r_p + Gmat(dz_aff))
        dlam_aff = -(lam * s + lam * ds_aff) / s

        def max_step(v, dv):
            ratio = jnp.where(dv < 0, -v / dv, jnp.inf)
            return jnp.minimum(1.0, 0.995 * jnp.min(ratio, axis=0))  # (B,)

        a_aff = jnp.minimum(max_step(s, ds_aff), max_step(lam, dlam_aff))
        mu_aff = jnp.sum((lam + a_aff * dlam_aff) * (s + a_aff * ds_aff),
                         axis=0) / nact
        sigma = (mu_aff / (mu + 1e-30)) ** 3

        # masked rows pinned: their duals stay exactly zero (capacity-
        # bucket equivalence, see solve_qp_masked)
        r_cent = (lam * s - sigma[None, :] * mu[None, :]
                  + dlam_aff * ds_aff) * rmask_l
        rhs = pad_n(-r_d + GTmat(r_cent / s - w * r_p))
        dz = solve_lanes(Lt, rhs)[:n]
        ds = -(r_p + Gmat(dz))
        dlam = -(r_cent + lam * ds) / s

        a = jnp.minimum(max_step(s, ds), max_step(lam, dlam))[None, :]
        z = z + a * dz
        s = s + a * ds
        lam = lam + a * dlam
        return (z, lam, s, best), None

    inf_m = jnp.full((B_pad,), jnp.inf, dtype)
    best0 = (z, lam, s, inf_m)
    (z, lam, s, best), _ = jax.lax.scan(
        body, (z, lam, s, best0), None, length=iters)
    zb, lamb, sb, mb = best
    mlast = merit_of(z, lam, s)
    take = (mlast < mb)[None, :]
    z = jnp.where(take, z, zb)
    lam = jnp.where(take, lam, lamb)
    s = jnp.where(take, s, sb)
    return z[:, :B].T, lam[:, :B].T, s[:, :B].T


def solve_qp_masked_fused(H_b, f_b, G0, T2, rmask_b, cmask_b, h_b,
                          iters: int, init_b, block_lanes: int = 128,
                          solve_mode: str = "trinv"):
    """Explicitly-batched masked PDIP through ONE fused Pallas kernel call
    (ops/pallas_kernels.pdip_fused_lanes): the entire `iters`-iteration
    interior point for each 128-lane candidate block runs out of VMEM, so
    HBM is touched once per QP solve instead of 6+ times per iteration.
    Same layout contract and algorithm as solve_qp_masked_lanes; constraint rows
    are padded mc -> mc_pad (multiple of 8) with rmask=0 / h=1 / duals
    pinned to 0, which leaves gap, merit and every step length unchanged.

    block_lanes — VMEM-residency knob (candidate lanes per kernel block);
    solve_mode — 'trinv' (explicit blocked L^{-1}, short critical path —
    production) or 'subst' (serial substitution, bitwise-matches
    solve_qp_masked_lanes).  Both are EXPLICIT compile-time arguments
    threaded from the caller (e.g. qp_method='pdip_ws_fused@256/subst' in
    sim/mpc_loop.py); there are no environment reads on this path.
    """
    from mpc_tuning_tpu.ops.pallas_kernels import pdip_fused_lanes

    B, n = f_b.shape
    mc = G0.shape[0]
    dtype = f_b.dtype
    n_pad = max(8, -(-n // 8) * 8)
    mcp = max(8, -(-mc // 8) * 8)
    # small batches run one right-sized block (see solve_qp_admm_fused)
    block_lanes = min(block_lanes, -(-B // 128) * 128)
    B_pad = -(-B // block_lanes) * block_lanes
    pb = B_pad - B

    def lanes(x, fill=0.0):
        x = x.T
        if pb:
            x = jnp.concatenate(
                [x, jnp.full((x.shape[0], pb), fill, dtype)], axis=1)
        return x

    def pad_rows(x, rows, fill=0.0):
        if x.shape[0] == rows:
            return x
        return jnp.concatenate(
            [x, jnp.full((rows - x.shape[0], x.shape[1]), fill, dtype)],
            axis=0)

    f_l = pad_rows(lanes(f_b), n_pad)
    h_l = pad_rows(lanes(h_b, 1.0), mcp, 1.0)
    rmask_l = pad_rows(lanes(rmask_b), mcp)
    cmask_l = pad_rows(lanes(cmask_b), n_pad)

    Hp = jnp.zeros((n_pad, n_pad, B_pad), dtype)
    Hp = Hp.at[jnp.arange(n_pad), jnp.arange(n_pad), :].set(1.0)
    Hp = Hp.at[:n, :n, :B].set(H_b.transpose(1, 2, 0))
    if pb:
        Hp = Hp.at[jnp.arange(n), jnp.arange(n), B:].set(1.0)

    T2p = jnp.zeros((mcp, n_pad, n_pad), dtype)
    T2p = T2p.at[:mc, :n, :n].set(T2.reshape(mc, n, n))
    T2T = T2p.reshape(mcp, n_pad * n_pad).T
    G0p = jnp.zeros((mcp, n_pad), dtype).at[:mc, :n].set(G0)

    z0_b, lam0_b, _ = init_b
    z0_l = pad_rows(lanes(z0_b), n_pad)
    lam0_l = pad_rows(lanes(lam0_b, 1.0), mcp)

    ridge = 1e-9 if dtype == jnp.float64 else 1e-6
    w_cap = 1e13 if dtype == jnp.float64 else 1e7

    z, lam, s = pdip_fused_lanes(
        Hp, T2T, G0p, f_l, h_l, rmask_l, cmask_l, z0_l, lam0_l,
        n=n, mc=mc, iters=int(iters), eps_c=float(_WS_EPS),
        ridge=float(ridge), w_cap=float(w_cap), block_lanes=block_lanes,
        solve_mode=solve_mode)
    return z[:n, :B].T, lam[:mc, :B].T, s[:mc, :B].T


@functools.lru_cache(maxsize=None)
def _masked_fast(iters: int, use_pallas: bool, engine: str = "lanes",
                 block_lanes: int = 128, solve_mode: str = "trinv"):
    """custom_vmap wrapper: per-lane calls fall back to solve_qp_masked;
    the candidate-batched call (the tuning hot path) runs the lane-major
    implementation — engine='lanes' (per-component Pallas kernels) or
    'fused' (one whole-PDIP kernel per solve).  block_lanes/solve_mode
    configure the fused kernel (part of the cache key, so distinct configs
    compile distinct programs)."""
    from jax.custom_batching import custom_vmap

    @custom_vmap
    def fast(H, f, G0, T2, rmask, cmask_z, h, z0, lam0, s0):
        return solve_qp_masked(H, f, G0, T2, rmask, cmask_z, h, iters=iters,
                               use_pallas=use_pallas, init=(z0, lam0, s0))

    @fast.def_vmap
    def _rule(axis_size, in_batched, H, f, G0, T2, rmask, cmask_z, h,
              z0, lam0, s0):
        bH, bf, bG0, bT2, brm, bcm, bh, bz, bl, bs = in_batched
        assert not bG0 and not bT2, "G0/T2 are shared constants"

        def bcast(x, b, shape):
            return x if b else jnp.broadcast_to(x, (axis_size,) + shape)

        H = bcast(H, bH, H.shape)
        f = bcast(f, bf, f.shape)
        rmask = bcast(rmask, brm, rmask.shape)
        cmask_z = bcast(cmask_z, bcm, cmask_z.shape)
        h = bcast(h, bh, h.shape)
        z0 = bcast(z0, bz, z0.shape)
        lam0 = bcast(lam0, bl, lam0.shape)
        s0 = bcast(s0, bs, s0.shape)
        if engine == "fused":
            out = solve_qp_masked_fused(H, f, G0, T2, rmask, cmask_z, h,
                                        iters, (z0, lam0, s0),
                                        block_lanes=block_lanes,
                                        solve_mode=solve_mode)
        else:
            out = solve_qp_masked_lanes(H, f, G0, T2, rmask, cmask_z, h,
                                        iters, (z0, lam0, s0),
                                        use_pallas=use_pallas)
        return out, (True, True, True)

    return fast


def solve_qp_masked_fast(H, f, G0, T2, rmask, cmask_z, h, iters: int,
                         use_pallas: bool, init, engine: str = "lanes",
                         block_lanes: int = 128, solve_mode: str = "trinv"):
    """Masked PDIP that auto-switches to the lane-major batched engine
    under vmap (the closed-loop tuning path).  init is required (pass
    zeros/ones for a cold start)."""
    z0, lam0, s0 = init
    return _masked_fast(int(iters), bool(use_pallas), str(engine),
                        int(block_lanes), str(solve_mode))(
        H, f, G0, T2, rmask, cmask_z, h, z0, lam0, s0)


def admm_precompute(H, G, sigma: float = 1e-6, cmask=None):
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
    # slower) — see tests/test_production_qp.py.  With cmask given, the
    # Hs norm excludes masked-variable identity entries so rho (and hence
    # the fixed-iteration trajectory) is capacity-bucket invariant
    # (sim/mpc_loop.capped); GtG is invariant already (masked rows/cols
    # of Gs are exact zeros).
    Hn = Hs if cmask is None else Hs * cmask[:, None] * cmask[None, :]
    rho = 0.1 * jnp.linalg.norm(Hn) / (jnp.linalg.norm(GtG) + 1e-12)
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


def solve_qp_admm_fused(Minv_b, rho_b, Dinv_b, e_b, f_b, h_b, rmask_b,
                        cmask_b, G0, state_b, iters: int,
                        sigma: float = 1e-6, over_relax: float = 1.6,
                        block_lanes: int = 128):
    """Explicitly-batched warm ADMM through ONE fused Pallas kernel call
    (ops/pallas_kernels.admm_fused_lanes).  Exploits the exact
    factorization Gs = diag(e*rmask) G0 diag(cmask*Dinv) of the
    equilibrated constraint matrix over the shared table, so per-candidate
    (mc, n) matrices never materialize inside the kernel.  Returns
    (z_unscaled (B, n), new_state) matching solve_qp_admm."""
    from mpc_tuning_tpu.ops.pallas_kernels import admm_fused_lanes

    B, n = f_b.shape
    mc = G0.shape[0]
    dtype = f_b.dtype
    n_pad = max(8, -(-n // 8) * 8)
    mcp = max(8, -(-mc // 8) * 8)
    # clamp the block to the padded batch: small batches (VNS neighborhoods
    # are ~30-130 lanes) run one right-sized block instead of padding to a
    # full 512-lane block
    block_lanes = min(block_lanes, -(-B // 128) * 128)
    B_pad = -(-B // block_lanes) * block_lanes
    pb = B_pad - B

    def lanes(x, fill=0.0):
        x = x.T
        if pb:
            x = jnp.concatenate(
                [x, jnp.full((x.shape[0], pb), fill, dtype)], axis=1)
        return x

    def pad_rows(x, rows, fill=0.0):
        if x.shape[0] == rows:
            return x
        return jnp.concatenate(
            [x, jnp.full((rows - x.shape[0], x.shape[1]), fill, dtype)],
            axis=0)

    fs_l = pad_rows(lanes(f_b * Dinv_b), n_pad)
    hs_l = pad_rows(lanes(h_b * e_b, 1.0), mcp, 1.0)
    arow_l = pad_rows(lanes(e_b * rmask_b), mcp)
    acol_l = pad_rows(lanes(Dinv_b * cmask_b), n_pad)

    Mp = jnp.zeros((B_pad, n_pad, n_pad), dtype)
    # identity diagonal everywhere first: padded batch entries and padded
    # rows of real entries stay nonsingular no-ops
    Mp = Mp.at[:, jnp.arange(n_pad), jnp.arange(n_pad)].set(1.0)
    Mp = Mp.at[:B, :n, :n].set(Minv_b)
    Minv_t = Mp.transpose(1, 2, 0)

    G0p = jnp.zeros((mcp, n_pad), dtype).at[:mc, :n].set(G0)

    rho_v = rho_b.reshape(-1).astype(dtype)
    par_l = jnp.ones((8, B_pad), dtype)  # padded lanes keep rho = 1/rho = 1
    par_l = par_l.at[0, :B].set(rho_v)
    par_l = par_l.at[1, :B].set(1.0 / rho_v)

    x0_b, zc0_b, y0_b = state_b
    x0_l = pad_rows(lanes(x0_b), n_pad)
    zc0_l = pad_rows(lanes(zc0_b), mcp)
    y0_l = pad_rows(lanes(y0_b), mcp)

    x, zc, y = admm_fused_lanes(
        Minv_t, G0p, fs_l, hs_l, arow_l, acol_l, par_l, x0_l, zc0_l, y0_l,
        iters=int(iters), sigma=float(sigma), over_relax=float(over_relax),
        block_lanes=block_lanes)
    x_b = x[:n, :B].T
    z_un = x_b * Dinv_b
    return z_un, (x_b, zc[:mc, :B].T, y[:mc, :B].T)


@functools.lru_cache(maxsize=None)
def _admm_fast(iters: int, sigma: float, over_relax: float,
               block_lanes: int):
    """custom_vmap wrapper for warm ADMM: per-lane calls run the dense
    solve_qp_admm; the candidate-batched call (the tracking-case tuning hot
    path) runs the whole iteration loop in ONE fused Pallas kernel."""
    from jax.custom_batching import custom_vmap

    @custom_vmap
    def fast(Minv, rho, Dinv, e, f, h, rmask, cmask_z, G0, x0, zc0, y0):
        Gs = (e * rmask)[:, None] * G0 * (cmask_z * Dinv)[None, :]
        pre = {"Minv": Minv, "rho": rho, "Dinv": Dinv, "e": e, "Gs": Gs}
        z, (x, zc, y) = solve_qp_admm(pre, f, h, (x0, zc0, y0), iters,
                                      sigma=sigma, over_relax=over_relax)
        return z, x, zc, y

    @fast.def_vmap
    def _rule(axis_size, in_batched, Minv, rho, Dinv, e, f, h, rmask,
              cmask_z, G0, x0, zc0, y0):
        assert not in_batched[8], "G0 is a shared constant"

        def bcast(x, b):
            return x if b else jnp.broadcast_to(x, (axis_size,) + x.shape)

        (Minv, rho, Dinv, e, f, h, rmask, cmask_z, x0, zc0, y0) = [
            bcast(a, b) for a, b in zip(
                (Minv, rho, Dinv, e, f, h, rmask, cmask_z, x0, zc0, y0),
                in_batched[:8] + in_batched[9:])]
        z, (x, zc, y) = solve_qp_admm_fused(
            Minv, rho, Dinv, e, f, h, rmask, cmask_z, G0, (x0, zc0, y0),
            iters, sigma=sigma, over_relax=over_relax,
            block_lanes=block_lanes)
        return (z, x, zc, y), (True, True, True, True)

    return fast


def solve_qp_admm_fast(pre, f, h, rmask, cmask_z, G0, state, iters: int,
                       sigma: float = 1e-6, over_relax: float = 1.6,
                       block_lanes: int = 128):
    """Warm ADMM that auto-switches to the fused lane-major Pallas kernel
    under vmap (the tracking-case closed-loop tuning path).  ``pre`` is the
    admm_precompute dict; only its Minv/rho/Dinv/e enter (Gs is
    reconstructed from the shared G0 + masks).  Returns (z, new_state)."""
    x0, zc0, y0 = state
    z, x, zc, y = _admm_fast(int(iters), float(sigma), float(over_relax),
                             int(block_lanes))(
        pre["Minv"], pre["rho"], pre["Dinv"], pre["e"], f, h, rmask,
        cmask_z, G0, x0, zc0, y0)
    return z, (x, zc, y)


def _qp_shape(p_max, m_max, ny, nu, with_y):
    n = m_max * nu + 1
    mc = 4 * m_max * nu + 1 + (2 * p_max * ny if with_y else 0)
    n_pad = max(8, -(-n // 8) * 8)
    mcp = max(8, -(-mc // 8) * 8)
    return n_pad, mcp


# Fused-kernel VMEM budget.  Round-3 sized this against a presumed 16 MB
# scoped limit; a round-4 on-chip probe showed the v5e's physical VMEM is
# ~128 MB/core (a 110 MB Pallas scratch compiles and runs), and the fused
# kernels now raise Mosaic's limit explicitly
# (pallas_kernels._fused_params).  96 MB here leaves headroom for Mosaic's
# own temporaries under the 112 MB kernel limit.
_FUSED_VMEM_BUDGET = 96 * 2 ** 20


def fused_pdip_viable(p_max, m_max, ny, nu, with_y,
                      block_lanes: int = 128,
                      vmem_budget: int = _FUSED_VMEM_BUDGET) -> bool:
    """Can the fused whole-PDIP kernel's working set fit VMEM at this MPC
    shape?  The shared normal-matrix table T2T is (n_pad^2, mc_pad) — 18 MB
    at the Shell7x5 tuning shape (n_pad=48, mc_pad=1960), which fits the
    real ~128 MB VMEM once the Mosaic limit is raised (it exceeded the old
    default scoped budget, the round-3 'VMEM wall')."""
    n_pad, mcp = _qp_shape(p_max, m_max, ny, nu, with_y)
    Bt = block_lanes
    shared = (n_pad * n_pad * mcp + 2 * mcp * n_pad) * 4
    per_lane = (3 * n_pad * n_pad * Bt + 3 * n_pad * Bt + 8 * mcp * Bt) * 4
    temps = 3 * 2 * 2 ** 20  # chunked tril_invert bmm temporaries (~2 MB
    # each, see pallas_kernels._pdip_fused_kernel.bmm) + headroom
    return shared + per_lane + temps <= vmem_budget


def admm_fused_max_lanes(p_max, m_max, ny, nu, with_y,
                         vmem_budget: int = _FUSED_VMEM_BUDGET) -> int:
    """Largest viable block_lanes (512/256/128) for the fused ADMM kernel
    at this shape, or 0 if even 128 lanes don't fit.  512 stays the cap:
    wider blocks are now VMEM-viable (see _FUSED_VMEM_BUDGET) but 1024
    lanes must re-qualify on-chip before 'auto' may pick them."""
    n_pad, mcp = _qp_shape(p_max, m_max, ny, nu, with_y)
    for Bt in (512, 256, 128):
        shared = 2 * mcp * n_pad * 4
        per_lane = (n_pad * n_pad * Bt + 3 * n_pad * Bt + 7 * mcp * Bt) * 4
        if shared + per_lane <= vmem_budget:
            return Bt
    return 0


def qp_kkt_residuals(H, f, G, h, z, lam, s):
    """Diagnostics: (stationarity, primal, complementarity) residual norms."""
    r_d = H @ z + f + G.T @ lam
    r_p = jnp.maximum(G @ z - h, 0.0)
    comp = jnp.abs(lam * s)
    return jnp.linalg.norm(r_d), jnp.linalg.norm(r_p), jnp.max(comp)
