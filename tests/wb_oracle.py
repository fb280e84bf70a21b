"""Implementation-independent Wood-Berry constrained closed-loop oracle.

The production stack (models/lti -> ops/mpc_qp -> ops/qp -> sim/mpc_loop)
is pinned against THIS module, which composes only primitives outside it:

 * analytic first-order-plus-deadtime zero-order-hold discretization (exact,
   including fractional delays) instead of models/lti's augmented-expm path;
 * prediction matrices built from simulated step responses of those
   difference equations (the MatG construction, /root/reference/DTC-GPC/MatG.m)
   instead of ops/mpc_qp's augmented-state-space prediction tensors;
 * the closed-form output-disturbance Kalman gain m = phi/(phi+1) with
   phi = (1+sqrt(5))/2 — the exact solution of the per-output scalar DARE
   p^2 = p + 1 for unit integrator noise / unit measurement noise, which is
   what the MATLAB MPC Toolbox default estimator reduces to when the model
   declares no unmeasured plant disturbances (SURVEY.md section 2.5) —
   instead of scipy's DARE on the augmented realization;
 * the native C++ dual active-set QP (ops/native_qp) instead of the
   fixed-iteration interior point.

Semantics being arbitrated: the per-step loop of MATLAB `sim(mpcobj,...)`
as the reference drives it (/root/reference/MPC-Tuning/MPC_Tuning/
closedloop_toolbox.m:36-50): estimator update -> condensed QP over du ->
apply first move -> plant step.
"""

from __future__ import annotations

import dataclasses
import math

import numpy as np

from mpc_tuning_tpu.ops.native_qp import qp_solve_exact

PHI = (1.0 + math.sqrt(5.0)) / 2.0
M_GAIN = PHI / (PHI + 1.0)  # 0.618... current-form innovation gain


@dataclasses.dataclass
class FOPDT:
    """One channel K e^{-Ls}/(tau s + 1), ZOH-discretized analytically."""

    a: float   # e^{-Ts/tau}
    b0: float  # coefficient on u(k-d)
    b1: float  # coefficient on u(k-d-1)
    d: int     # integer delay floor(L/Ts)

    @staticmethod
    def make(K: float, tau: float, L: float, Ts: float) -> "FOPDT":
        a = math.exp(-Ts / tau)
        d = int(math.floor(L / Ts + 1e-12))
        gam = L / Ts - d
        if gam < 1e-12:
            return FOPDT(a=a, b0=K * (1.0 - a), b1=0.0, d=d)
        e1g = math.exp(-(1.0 - gam) * Ts / tau)
        return FOPDT(a=a, b0=K * (1.0 - e1g), b1=K * (e1g - a), d=d)


class ChannelBank:
    """MIMO plant/model as independent FOPDT channels + input history."""

    def __init__(self, K, tau, L, Ts):
        K, tau, L = map(np.asarray, (K, tau, L))
        self.ny, self.nin = K.shape
        self.ch = [[FOPDT.make(K[i, j], tau[i, j], L[i, j], Ts)
                    for j in range(self.nin)] for i in range(self.ny)]
        self.dmax = max(c.d for row in self.ch for c in row) + 2
        self.reset()

    def reset(self):
        self.x = np.zeros((self.ny, self.nin))  # per-channel outputs
        self.hist = np.zeros((self.dmax + 1, self.nin))  # hist[q] = u(k-q)

    def clone(self) -> "ChannelBank":
        o = object.__new__(ChannelBank)
        o.ny, o.nin, o.ch, o.dmax = self.ny, self.nin, self.ch, self.dmax
        o.x = self.x.copy()
        o.hist = self.hist.copy()
        return o

    def output(self) -> np.ndarray:
        return self.x.sum(axis=1)

    def step(self, u: np.ndarray):
        """Advance one sample with input u(k) applied over [k, k+1)."""
        self.hist = np.roll(self.hist, 1, axis=0)
        self.hist[0] = u
        for i in range(self.ny):
            for j in range(self.nin):
                c = self.ch[i][j]
                self.x[i, j] = (c.a * self.x[i, j]
                                + c.b0 * self.hist[c.d][j]
                                + c.b1 * self.hist[c.d + 1][j])

    def step_response(self, j: int, nsamp: int) -> np.ndarray:
        """y(1..nsamp) for a unit step on input j from rest."""
        b = self.clone()
        b.x = np.zeros_like(b.x)
        b.hist = np.zeros_like(b.hist)
        u = np.zeros(self.nin)
        u[j] = 1.0
        out = np.zeros((nsamp, self.ny))
        for k in range(nsamp):
            b.step(u)
            out[k] = b.output()
        return out

    def free_response(self, u_hold: np.ndarray, nsamp: int) -> np.ndarray:
        """y(k+1..k+nsamp) from the CURRENT state with input held."""
        b = self.clone()
        out = np.zeros((nsamp, self.ny))
        for k in range(nsamp):
            b.step(u_hold)
            out[k] = b.output()
        return out


def wb_conditioned_data(Lc: np.ndarray, Rc: np.ndarray, deltak=0.0, deltaL=0.0):
    """Wood-Berry [G D] FOPDT data (WoodBerry.m:44-53), conditioned K' = L K R.

    (K, tau, L) matrices for model (nominal) and plant (optionally
    mismatched via deltak/deltaL, WoodBerry.m:33-42)."""
    K0 = np.array([[12.8, -18.9, 3.8], [6.6, -19.4, 4.9]])
    tau = np.array([[16.7, 21.0, 14.9], [10.9, 14.4, 13.2]])
    L0 = np.array([[1.0, 2.0, 8.1], [2.0, 1.0, 3.4]])
    Kp = K0.copy()
    Lp = L0.copy()
    Kp[:, :2] *= 1.0 + deltak
    Lp[:, :2] += deltaL
    scale = np.outer(Lc, Rc)
    return (K0 * scale, tau, L0), (Kp * scale, tau, Lp)


def simulate_fopdt_oracle(
    model_data, plant_data,  # (K, tau, L) triples, already conditioned
    r: np.ndarray,           # (nit, ny) conditioned setpoints
    v: np.ndarray,           # (nit, n_md) conditioned measured disturbance
    nit: int, N: int, Nu: int,
    delta: np.ndarray, lam: np.ndarray,
    umin: np.ndarray, umax: np.ndarray, dumax: np.ndarray,  # conditioned (nu,)
    Ts: float,
):
    """Generic constrained MIMO closed-loop oracle over independent FOPDT
    channels (any ny x (nu + n_md) plant with first-order rows — covers
    Wood-Berry AND the Shell fractionator cases, incl. fractional delays
    like 27/4 = 6.75 samples).  Returns (y, u) conditioned."""
    model = ChannelBank(*model_data, Ts)
    plant = ChannelBank(*plant_data, Ts)
    ny = model.ny
    nu = len(umax)

    # dynamic matrix from step responses (Theta[(i,yo),(t,uj)] = s[i-t])
    s = np.stack([model.step_response(j, N) for j in range(nu)], axis=-1)  # (N, ny, nu)
    Theta = np.zeros((N, ny, Nu, nu))
    for i in range(N):
        for t in range(min(i + 1, Nu)):
            Theta[i, :, t, :] = s[i - t]
    Theta = Theta.reshape(N * ny, Nu * nu)

    Q = np.diag(np.tile(np.asarray(delta) ** 2, N))
    Rw = np.diag(np.tile(np.asarray(lam) ** 2, Nu))
    H = 2.0 * (Theta.T @ Q @ Theta + Rw)
    Tcum = np.kron(np.tril(np.ones((Nu, Nu))), np.eye(nu))
    G = np.vstack([
        np.eye(Nu * nu), -np.eye(Nu * nu),   # |du| <= dumax
        Tcum, -Tcum,                         # umin <= u <= umax
    ])

    dhat = np.zeros(ny)
    u_prev = np.zeros(nu)
    Y = np.zeros((nit, ny))
    U = np.zeros((nit, nu))
    for k in range(nit):
        yk = plant.output()
        Y[k] = yk
        # current-form output-disturbance Kalman update (closed-form gain)
        innov = yk - (model.output() + dhat)
        dhat = dhat + M_GAIN * innov

        # free response: model rollout with u held, v held at current value
        u_hold = np.concatenate([u_prev, v[k]])
        free = model.free_response(u_hold, N) + dhat[None, :]
        e = (r[k][None, :] - free).reshape(-1)
        f = -2.0 * (Theta.T @ Q @ e)
        h = np.concatenate([
            np.tile(dumax, Nu), np.tile(dumax, Nu),
            np.tile(umax - u_prev, Nu), np.tile(u_prev - umin, Nu),
        ])
        z, _, status = qp_solve_exact(H, f, G, h)
        assert status == 0, f"oracle QP failed at k={k}"
        u = u_prev + z[:nu]
        U[k] = u
        model.step(np.concatenate([u, v[k]]))
        plant.step(np.concatenate([u, v[k]]))
        u_prev = u
    return Y, U


def simulate_wb_oracle(
    r: np.ndarray,       # (nit, 2) conditioned setpoints
    v: np.ndarray,       # (nit, 1) conditioned measured disturbance
    nit: int,
    N: int,
    Nu: int,
    delta: np.ndarray,
    lam: np.ndarray,
    Lc: np.ndarray,
    Rc: np.ndarray,      # (3,) incl. the MD column
    umax=0.5, dumax=0.05,
    deltak: float = 0.0, deltaL: float = 0.0,
    Ts: float = 1.0,
):
    """Wood-Berry constrained closed loop; returns (y, u) conditioned."""
    mdl, plt = wb_conditioned_data(Lc, Rc, deltak, deltaL)
    nu = 2
    umax_c = np.broadcast_to(np.asarray(umax, np.float64) / Rc[:nu], (nu,))
    dumax_c = np.broadcast_to(np.asarray(dumax, np.float64) / Rc[:nu], (nu,))
    return simulate_fopdt_oracle(mdl, plt, r, v, nit, N, Nu, delta, lam,
                                 -umax_c, umax_c, dumax_c, Ts)


def shell3x3_conditioned_data(Lc: np.ndarray, Rc: np.ndarray):
    """Shell 3x3 fractionator FOPDT data (Shell3x3.m:43-58), conditioned
    K' = L K R.  Delays 27/28/... samples at Ts=4 are FRACTIONAL
    (27/4 = 6.75) — exercised analytically by FOPDT.make."""
    K0 = np.array([[4.05, 1.77, 5.88],
                   [5.39, 5.72, 6.90],
                   [4.38, 4.42, 7.20]])
    tau = np.array([[50.0, 60.0, 50.0],
                    [50.0, 60.0, 40.0],
                    [33.0, 44.0, 19.0]])
    L0 = np.array([[27.0, 28.0, 27.0],
                   [18.0, 14.0, 15.0],
                   [20.0, 22.0, 0.0]])
    scale = np.outer(Lc, Rc)
    return (K0 * scale, tau, L0)


def shell7x5_conditioned_data(Lc: np.ndarray, Rc: np.ndarray,
                              mismatch: bool = False):
    """Shell 7x5 [G D] FOPDT data (Shell7x5.m:46-86), conditioned
    K' = L K R over the FULL 7x5 input set (3 MV + 2 MD).  ``mismatch``
    applies the model-error case e1..e5 = (0.2, 0.2, 0.3, 0.5, 0.5)
    (Shell7x5.m:37-42) to the GAINS (delays/poles unchanged)."""
    e1 = e2 = e3 = e4 = e5 = 0.0
    if mismatch:
        e1, e2, e3, e4, e5 = 0.2, 0.2, 0.3, 0.5, 0.5
    K0 = np.array([
        [4.05 + 2.11 * e1, 1.77 + 0.39 * e2, 5.88 + 0.59 * e3,
         1.20 + 0.12 * e4, 1.44 + 0.16 * e5],
        [5.39 + 3.29 * e1, 5.72 + 0.57 * e2, 6.90 + 0.89 * e3,
         1.52 + 0.13 * e4, 1.83 + 0.13 * e5],
        [3.66 + 2.29 * e1, 1.65 + 0.35 * e2, 5.53 + 0.67 * e3,
         1.16 + 0.08 * e4, 1.27 + 0.08 * e5],
        [5.92 + 2.34 * e1, 2.54 + 0.24 * e2, 8.10 + 0.32 * e3,
         1.73 + 0.02 * e4, 1.79 + 0.04 * e5],
        [4.13 + 1.71 * e1, 2.38 + 0.93 * e2, 6.23 + 0.30 * e3,
         1.31 + 0.03 * e4, 1.26 + 0.02 * e5],
        [4.06 + 2.39 * e1, 4.18 + 0.35 * e2, 6.53 + 0.72 * e3,
         1.19 + 0.08 * e4, 1.17 + 0.01 * e5],
        [4.38 + 3.11 * e1, 4.42 + 0.73 * e2, 7.20 + 1.33 * e3,
         1.14 + 0.18 * e4, 1.26 + 0.10 * e5],
    ])
    tau = np.array([
        [50.0, 60.0, 50.0, 45.0, 40.0],
        [50.0, 60.0, 40.0, 25.0, 20.0],
        [9.0, 30.0, 40.0, 11.0, 6.0],
        [12.0, 27.0, 20.0, 5.0, 19.0],
        [8.0, 19.0, 10.0, 2.0, 22.0],
        [13.0, 33.0, 9.0, 19.0, 24.0],
        [33.0, 44.0, 19.0, 24.0, 32.0],
    ])
    L0 = np.array([
        [27.0, 28.0, 27.0, 27.0, 27.0],
        [18.0, 14.0, 15.0, 15.0, 15.0],
        [2.0, 20.0, 2.0, 0.0, 0.0],
        [11.0, 12.0, 2.0, 0.0, 0.0],
        [5.0, 7.0, 2.0, 0.0, 0.0],
        [8.0, 4.0, 1.0, 0.0, 0.0],
        [20.0, 22.0, 0.0, 0.0, 0.0],
    ])
    scale = np.outer(Lc, Rc)
    return (K0 * scale, tau, L0)


def band_qp_assemble(Theta, free, r_k, u_prev, lam_eff, umax_c, v_eff,
                     ymin_c, ymax_c, rho_eps, N, Nu, ny, nu,
                     delta_eff=None):
    """Condensed band-control QP in CONDITIONED units, assembled from the
    documented MATLAB MPC formulation (soft output bands with a single ECR
    slack, hard u box, moves blocked after Nu; Shell7x5.m:100-189
    settings).  Decision z = [du (Nu*nu); eps].

    Scaled->conditioned weight map: the toolbox weights act on
    ScaleFactor-scaled variables, so lam_eff = lam/sf_u, v_eff = V*sf_y,
    delta_eff = delta/sf_y (band case: delta == 0).
    Returns (H, f, G, h)."""
    nz = Nu * nu + 1
    Rw = np.diag(np.tile(np.asarray(lam_eff) ** 2, Nu))
    H = np.zeros((nz, nz))
    if delta_eff is not None and np.any(np.asarray(delta_eff) != 0.0):
        Q = np.diag(np.tile(np.asarray(delta_eff) ** 2, N))
        H[:-1, :-1] = 2.0 * (Theta.T @ Q @ Theta + Rw)
        e = (r_k[None, :] - free).reshape(-1)
        f_du = -2.0 * (Theta.T @ Q @ e)
    else:
        H[:-1, :-1] = 2.0 * Rw
        f_du = np.zeros(Nu * nu)
    H[-1, -1] = 2.0 * rho_eps
    f = np.concatenate([f_du, [0.0]])

    Tcum = np.kron(np.tril(np.ones((Nu, Nu))), np.eye(nu))
    zc = np.zeros((Nu * nu, 1))
    vmax_col = np.tile(v_eff, N).reshape(-1, 1)
    free_flat = free.reshape(-1)
    G = np.vstack([
        np.hstack([Tcum, zc]),                       # u <= umax
        np.hstack([-Tcum, zc]),                      # -u <= umax
        np.hstack([Theta, -vmax_col]),               # y <= ymax + eps*V
        np.hstack([-Theta, -vmax_col]),              # -y <= -ymin + eps*V
        np.zeros((1, nz)),                           # -eps <= 0
    ])
    G[-1, -1] = -1.0
    h = np.concatenate([
        np.tile(umax_c - u_prev, Nu),
        np.tile(umax_c + u_prev, Nu),
        np.tile(ymax_c, N) - free_flat,
        free_flat - np.tile(ymin_c, N),
        [0.0],
    ])
    return H, f, G, h
