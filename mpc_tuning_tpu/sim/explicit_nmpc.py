"""Explicit single-shooting NMPC demo engine.

Re-design of /root/reference/Explicit NMPC/{NMPC_Controller.m,
ClosedLoopNMPC.m, main.m}: the hand-rolled fmincon NMPC with

 * per-input control horizons Nu_j (decision = du blocks stacked per input,
   NMPC_Controller.m:15-28),
 * additive output-disturbance (model-error offset) correction: the
   predicted trajectory is shifted by the gap between the measured
   controlled states and a one-step model propagation under u(k-1)
   (NMPC_Controller.m:108-127),
 * hard du bounds derived from absolute MV bounds (li = lb - u(k-1)),
 * closed loop with plant integration + 0.01*randn measurement noise on the
   states (ClosedLoopNMPC.m:77-87).

Solved by the same fixed-iteration Gauss-Newton + PDIP machinery as the
toolbox-style engine; deterministic noise via jax PRNG.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from mpc_tuning_tpu.models.ode import integrate
from mpc_tuning_tpu.ops.qp import solve_qp

__all__ = ["ExplicitNMPC"]


@dataclasses.dataclass
class ExplicitNMPC:
    rhs: object
    nx: int
    ny: int
    nu: int
    xc: tuple
    Ts: float
    N: int  # prediction horizon (fixed, e.g. 5 — main.m:57)
    Nu: tuple  # per-input control horizons, e.g. (2, 2)
    Q: np.ndarray  # tracking weights (main.m:60: [1.0214 0.9999])
    W: np.ndarray  # du weights (main.m:61: [1e-4 1e-4])
    ub: np.ndarray
    lb: np.ndarray
    substeps: int = 10
    sqp_iters: int = 5
    qp_iters: int = 25
    noise: float = 0.01  # ClosedLoopNMPC.m:77
    # 'rk4' or 'tr_bdf2' (the reference predicts with stiff ode23t,
    # NMPC_Controller.m:99, and integrates the plant with ode45,
    # ClosedLoopNMPC.m:84)
    integrator: str = "rk4"

    def simulate(self, x0, u0, r, nit, inK: int = 10, seed: int = 0,
                 dtype=jnp.float64):
        """Closed loop (ClosedLoopNMPC.m:80-109).  Returns (y, u)."""
        y, u = _explicit_closed(
            self.rhs, jnp.asarray(x0, dtype), jnp.asarray(u0, dtype),
            jnp.asarray(r[:nit], dtype),
            jnp.asarray(self.Q, dtype), jnp.asarray(self.W, dtype),
            jnp.asarray(self.ub, dtype), jnp.asarray(self.lb, dtype),
            jax.random.PRNGKey(seed),
            self.N, tuple(int(v) for v in self.Nu), self.ny, self.nu,
            self.substeps, self.sqp_iters, self.qp_iters,
            float(self.Ts), tuple(self.xc), inK, float(self.noise),
            self.integrator,
        )
        return np.asarray(y), np.asarray(u)


def _col_mask_per_input(Nu: tuple, m_max: int, nu: int, dtype):
    mask = np.zeros((m_max, nu))
    for j, nuj in enumerate(Nu):
        mask[:nuj, j] = 1.0
    return jnp.asarray(mask, dtype)


def _explicit_control(rhs, x_meas, u_prev, rk, Q, W, ub, lb,
                      N, Nu, ny, nu, substeps, sqp_iters, qp_iters, Ts, xc,
                      method):
    """One NMPC_Controller.m solve: returns first du per input."""
    dtype = x_meas.dtype
    m_max = max(Nu)
    cmask = _col_mask_per_input(Nu, m_max, nu, dtype)  # (m_max, nu)
    cmask_flat = cmask.reshape(-1)
    xc_arr = jnp.array(xc)

    # offset correction n: measured controlled states minus one-step model
    # propagation under u(k-1) (NMPC_Controller.m:108-127)
    x_one = integrate(rhs, x_meas, u_prev, Ts, substeps, method)
    offset = x_meas[xc_arr] - x_one[xc_arr]  # (ny,)

    def y_of(du_flat):
        du = du_flat.reshape(m_max, nu) * cmask
        u_seq = u_prev[None, :] + jnp.cumsum(du, axis=0)

        def body(xk, i):
            u = u_seq[jnp.minimum(i, m_max - 1)]
            xn = integrate(rhs, xk, u, Ts, substeps, method)
            return xn, xn[xc_arr]

        _, Y = jax.lax.scan(body, x_meas, jnp.arange(N))
        return (Y + offset[None, :]).reshape(-1)  # corrected predictions

    q_flat = jnp.tile(Q, (N,)).reshape(N, ny).reshape(-1)
    r_flat = (jnp.tile(W, (m_max, 1)) * cmask).reshape(-1)
    Tcum = jnp.kron(jnp.tril(jnp.ones((m_max, m_max), dtype)), jnp.eye(nu, dtype=dtype))
    rk_flat = jnp.tile(rk, (N,))
    nz = m_max * nu

    def sqp_body(du_flat, _):
        Yf = y_of(du_flat)
        J = jax.jacfwd(y_of)(du_flat)
        e = Yf - rk_flat
        JQ = J * q_flat[:, None]
        H = 2.0 * (J.T @ JQ + jnp.diag(r_flat + (1.0 - cmask_flat)))
        f = 2.0 * (JQ.T @ e + r_flat * du_flat)
        # bounds on absolute u over active moves (li/ls of NMPC_Controller)
        u_seq_flat = Tcum @ (du_flat * cmask_flat) + jnp.tile(u_prev, (m_max,))
        G = jnp.vstack([Tcum * cmask_flat[:, None], -Tcum * cmask_flat[:, None]])
        h = jnp.concatenate([
            (jnp.tile(ub, (m_max,)) - u_seq_flat) * cmask_flat + (1 - cmask_flat),
            (u_seq_flat - jnp.tile(lb, (m_max,))) * cmask_flat + (1 - cmask_flat),
        ])
        z, _, _ = solve_qp(H, f, G, h, iters=qp_iters)
        return du_flat + z * cmask_flat, None

    du_flat, _ = jax.lax.scan(sqp_body, jnp.zeros(nz, dtype), None,
                              length=sqp_iters)
    du = du_flat.reshape(m_max, nu) * cmask
    return du[0]  # first move per input (ClosedLoopNMPC.m:96-105)


@partial(jax.jit, static_argnums=(0,) + tuple(range(9, 19)) + (20,))
def _explicit_closed(rhs, x0, u0, r, Q, W, ub, lb, key,
                     N, Nu, ny, nu, substeps, sqp_iters, qp_iters, Ts, xc,
                     inK, noise, method="rk4"):
    dtype = x0.dtype
    nit = r.shape[0]
    xc_arr = jnp.array(xc)

    def step(state, inp):
        x_plant, u_prev, key = state
        rk, k = inp
        # plant one Ts + state measurement noise (ClosedLoopNMPC.m:84-87)
        x_next = integrate(rhs, x_plant, u_prev, Ts, substeps, method)
        key, sub = jax.random.split(key)
        x_meas = x_next + noise * jax.random.normal(sub, x_next.shape, dtype)

        du0 = _explicit_control(rhs, x_meas, u_prev, rk, Q, W, ub, lb,
                                N, Nu, ny, nu, substeps, sqp_iters, qp_iters,
                                Ts, xc, method)
        active = (k >= inK - 1).astype(dtype)  # loop starts at inK
        u = u_prev + active * du0
        return (x_meas, u, key), (x_meas[xc_arr], u)

    ks = jnp.arange(nit)
    (xf, uf, _), (Y, U) = jax.lax.scan(step, (x0, u0, key), (r, ks))
    return Y, U
