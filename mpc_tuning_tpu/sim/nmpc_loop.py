"""Direct single-shooting NMPC — TPU-native equivalent of the MATLAB
``nlmpc``/``nlmpcmove`` path driven by
/root/reference/MPC-Tuning/MPC_Tuning/closedloop_toolbox_nmpc.m:67-94 and of
the hand-rolled fmincon controller in
/root/reference/Explicit NMPC/NMPC_Controller.m.

Per control step: decision variables are the control increments over the
control horizon (held after), the prediction is a fixed-substep RK4 rollout
of the explicit model, and the NLP is solved by a fixed number of
Gauss-Newton SQP iterations whose QP subproblem (hard MV bounds, soft OV
bounds with slack) reuses the batched PDIP kernel.  jacfwd supplies the
rollout sensitivities.  Everything is shape-static at (p_max, m_max) with
candidate horizons entering through masks — the same batching contract as
the linear engine, so GAM/VNS vmap over NMPC candidates identically.

State feedback is direct (the reference passes the true plant state to
nlmpcmove, closedloop_toolbox_nmpc.m:69) — no observer.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from mpc_tuning_tpu.models.ode import integrate
from mpc_tuning_tpu.ops.qp import solve_qp

__all__ = ["NMPCSpec", "NMPCLoop"]


@dataclasses.dataclass
class NMPCSpec:
    rhs: object  # rhs(x, u) -> dx/dt
    nx: int
    ny: int
    nu: int
    xc: tuple  # indices of controlled states (init.xc - 1, 0-based)
    Ts: float
    p_max: int
    m_max: int
    umin: np.ndarray
    umax: np.ndarray
    ymin: np.ndarray
    ymax: np.ndarray
    sf_u: np.ndarray
    sf_y: np.ndarray
    x0: np.ndarray
    u0: np.ndarray
    rho_eps: float = 1e5
    substeps: int = 10
    sqp_iters: int = 4
    qp_iters: int = 25
    # plant/prediction integrator: 'rk4' or 'tr_bdf2' (the init.integrator
    # slot of the reference, VanDeVusse_NMPC.m:85 uses @ode15s)
    integrator: str = "rk4"


@dataclasses.dataclass
class NMPCLoop:
    spec: NMPCSpec
    _cap_cache: dict = dataclasses.field(default_factory=dict, repr=False,
                                         compare=False)

    def capped(self, p_cap: int, m_cap: int) -> "NMPCLoop":
        """Capacity-restricted view (see mpc_loop.MPCLoop.capped): the
        rollout length and move count shrink to the batch's bucket — the
        steps beyond max(N)/max(Nu) were fully-masked, so results are
        unchanged while every candidate solve integrates p_cap (not p_max)
        ODE steps and factors an (m_cap*nu+1)-sized QP."""
        s = self.spec
        if (p_cap, m_cap) == (s.p_max, s.m_max):
            return self
        assert p_cap <= s.p_max and m_cap <= s.m_max, (p_cap, m_cap)
        key = (p_cap, m_cap)
        hit = self._cap_cache.get(key)
        if hit is None:
            hit = NMPCLoop(spec=dataclasses.replace(s, p_max=p_cap,
                                                    m_max=m_cap))
            self._cap_cache[key] = hit
        return hit

    # ------------------------------------------------------------ internals
    def _consts(self, dtype):
        s = self.spec
        fin = lambda x: np.where(np.isfinite(x) & (np.abs(x) < 1e20), x, 0.0)
        en = lambda x: (np.isfinite(x) & (np.abs(x) < 1e20)).astype(np.float64)
        return {
            "umin": jnp.asarray(s.umin, dtype), "umax": jnp.asarray(s.umax, dtype),
            "ymin": jnp.asarray(fin(s.ymin), dtype), "ymax": jnp.asarray(fin(s.ymax), dtype),
            "en_y_lo": jnp.asarray(en(s.ymin), dtype), "en_y_hi": jnp.asarray(en(s.ymax), dtype),
            "sf_u": jnp.asarray(s.sf_u, dtype), "sf_y": jnp.asarray(s.sf_y, dtype),
            "x0": jnp.asarray(s.x0, dtype), "u0": jnp.asarray(s.u0, dtype),
        }

    def _statics(self):
        import jax as _jax

        s = self.spec
        # use_pallas: QP factor/solves ride the lane-major Pallas kernels
        # under the candidate vmap on TPU (ops/pallas_kernels.spd_factor)
        return (s.p_max, s.m_max, s.ny, s.nu, float(s.rho_eps), s.substeps,
                s.sqp_iters, s.qp_iters, float(s.Ts), tuple(s.xc),
                s.integrator, _jax.default_backend() != "cpu")

    @staticmethod
    def _check_no_md(v):
        """The NMPC engine has no measured-disturbance channel — the
        reference nonlinear path has none either (closedloop_toolbox_nmpc.m
        passes no v into nlmpcmove; Van de Vusse declares n_md=0).  Reject
        loudly instead of silently dropping a disturbance trajectory."""
        if v is not None and np.asarray(v).ndim >= 2 and np.asarray(v).shape[-1] != 0:
            raise ValueError(
                "NMPCLoop does not support measured disturbances (v must "
                "have 0 columns); thread them through the model rhs instead"
            )

    # ------------------------------------------------------------- API
    def simulate(self, r, v, nit, N, Nu, delta, lam, dtype=jnp.float64,
                 qp_iters=None):
        self._check_no_md(v)
        c = self._consts(dtype)
        with jax.default_matmul_precision("highest"):
            y, u = _nmpc_closed(
            self.spec.rhs, c, jnp.asarray(r[:nit], dtype),
            jnp.asarray(N), jnp.asarray(Nu),
            jnp.asarray(delta, dtype), jnp.asarray(lam, dtype),
            *self._statics(),
        )
        return np.asarray(y), np.asarray(u)

    def closed_batch(self, r_b, v, N_b, Nu_b, delta_b, lam_b, nit, dtype,
                     qp_iters, mesh=None, caps=None):
        self._check_no_md(v)
        from mpc_tuning_tpu.sim.mpc_loop import _shard_mapped, horizon_caps

        if caps is None:
            caps = horizon_caps(self.spec.p_max, self.spec.m_max, N_b, Nu_b)
        loop = self.capped(*caps)
        c = loop._consts(dtype)
        args = (jnp.asarray(r_b, dtype)[:, :nit],
                jnp.asarray(N_b), jnp.asarray(Nu_b),
                jnp.asarray(delta_b, dtype), jnp.asarray(lam_b, dtype))
        with jax.default_matmul_precision("highest"):
            if mesh is None:
                return _nmpc_closed_batch(loop.spec.rhs, c, *args,
                                          *loop._statics())
            fn = partial(_nmpc_closed_batch, loop.spec.rhs)
            return _shard_mapped(fn, mesh, loop._statics(),
                                 batched_dims=(3, 1, 1, 2, 2),
                                 out_dims=(3, 3))(c, *args)

    def open_batch(self, rfin_b, v, N_b, Nu_b, delta_b, lam_b, nit, dtype,
                   qp_iters, mesh=None, caps=None):
        self._check_no_md(v)
        from mpc_tuning_tpu.sim.mpc_loop import _shard_mapped, horizon_caps

        if caps is None:
            caps = horizon_caps(self.spec.p_max, self.spec.m_max, N_b, Nu_b)
        loop = self.capped(*caps)
        c = loop._consts(dtype)
        args = (jnp.asarray(rfin_b, dtype),
                jnp.asarray(N_b), jnp.asarray(Nu_b),
                jnp.asarray(delta_b, dtype), jnp.asarray(lam_b, dtype))
        statics = (nit,) + loop._statics()
        with jax.default_matmul_precision("highest"):
            if mesh is None:
                return _nmpc_open_batch(loop.spec.rhs, c, args[0], *args[1:],
                                        nit, *loop._statics())

            def fn(c_, rfin, N, Nu, d, l, nit_, *st):
                return _nmpc_open_batch(loop.spec.rhs, c_, rfin, N, Nu, d, l,
                                        nit_, *st)

            return _shard_mapped(fn, mesh, statics,
                                 batched_dims=(2, 1, 1, 2, 2),
                                 out_dims=(3, 3))(c, *args)


# ------------------------------------------------------------------ kernels


def _u_sequence(du_flat, u_prev, col_mask, m_max, nu):
    du = (du_flat.reshape(m_max, nu)) * col_mask[:, None]
    return u_prev[None, :] + jnp.cumsum(du, axis=0)  # (m_max, nu)


def _rollout_y(rhs, x, u_seq, p_max, m_max, substeps, Ts, xc, method):
    """p_max-step prediction; input held at u_seq[-1] beyond the horizon."""

    def body(xk, i):
        u = u_seq[jnp.minimum(i, m_max - 1)]
        xn = integrate(rhs, xk, u, Ts, substeps, method)
        return xn, xn[jnp.array(xc)]

    _, Y = jax.lax.scan(body, x, jnp.arange(p_max))
    return Y  # (p_max, ny)


def _nmpc_control(rhs, c, x, u_prev, rk, N, Nu, delta, lam,
                  p_max, m_max, ny, nu, rho, substeps, sqp_iters, qp_iters,
                  Ts, xc, method, use_pallas=False):
    """One nlmpcmove-equivalent solve.  Returns the full du sequence."""
    dtype = x.dtype
    i_idx = jnp.arange(1, p_max + 1)
    row_mask = (i_idx <= N).astype(dtype)
    col_mask = (jnp.arange(m_max) < Nu).astype(dtype)
    cmask_flat = jnp.repeat(col_mask, 1) if nu == 1 else jnp.tile(col_mask[:, None], (1, nu)).reshape(-1)

    q_flat = ((delta / c["sf_y"])[None, :] ** 2 * row_mask[:, None]).reshape(-1)
    r_flat = ((lam / c["sf_u"])[None, :] ** 2 * jnp.ones((m_max, nu), dtype)).reshape(-1) * cmask_flat

    nz = m_max * nu + 1

    def y_of(du_flat):
        u_seq = _u_sequence(du_flat, u_prev, col_mask, m_max, nu)
        return _rollout_y(rhs, x, u_seq, p_max, m_max, substeps, Ts, xc,
                          method).reshape(-1)

    Tcum = jnp.kron(jnp.tril(jnp.ones((m_max, m_max), dtype)), jnp.eye(nu, dtype=dtype))

    def sqp_body(du_flat, _):
        Yf = y_of(du_flat)
        J = jax.jacfwd(y_of)(du_flat)  # (p_max*ny, m_max*nu)
        e = Yf - jnp.tile(rk, (p_max,))
        # QP over dz = [d(du); eps]
        JQ = J * q_flat[:, None]
        Hdu = 2.0 * (J.T @ JQ + jnp.diag(r_flat + (1.0 - cmask_flat)))
        H = jnp.zeros((nz, nz), dtype).at[:-1, :-1].set(Hdu).at[-1, -1].set(2.0 * rho)
        f = jnp.concatenate([2.0 * (JQ.T @ e + r_flat * du_flat), jnp.zeros(1, dtype)])

        u_seq_flat = (Tcum @ (du_flat * cmask_flat)) + jnp.tile(u_prev, (m_max,))
        zero_col = jnp.zeros((m_max * nu, 1), dtype)
        en_y_hi = (jnp.repeat(row_mask, ny) * jnp.tile(c["en_y_hi"], (p_max,)))[:, None]
        en_y_lo = (jnp.repeat(row_mask, ny) * jnp.tile(c["en_y_lo"], (p_max,)))[:, None]
        G = jnp.vstack([
            jnp.hstack([Tcum, zero_col]) * cmask_flat[:, None],
            jnp.hstack([-Tcum, zero_col]) * cmask_flat[:, None],
            jnp.hstack([J, -jnp.ones((p_max * ny, 1), dtype)]) * en_y_hi,
            jnp.hstack([-J, -jnp.ones((p_max * ny, 1), dtype)]) * en_y_lo,
            jnp.zeros((1, nz), dtype).at[0, -1].set(-1.0),
        ])
        h = jnp.concatenate([
            (jnp.tile(c["umax"], (m_max,)) - u_seq_flat) * cmask_flat + (1 - cmask_flat),
            (u_seq_flat - jnp.tile(c["umin"], (m_max,))) * cmask_flat + (1 - cmask_flat),
            (jnp.tile(c["ymax"], (p_max,)) - Yf) * en_y_hi[:, 0] + (1 - en_y_hi[:, 0]),
            (Yf - jnp.tile(c["ymin"], (p_max,))) * en_y_lo[:, 0] + (1 - en_y_lo[:, 0]),
            jnp.zeros(1, dtype),
        ])
        z, _, _ = solve_qp(H, f, G, h, iters=qp_iters,
                           use_pallas=use_pallas)
        return du_flat + z[:-1] * cmask_flat, None

    du0 = jnp.zeros(m_max * nu, dtype)
    du_flat, _ = jax.lax.scan(sqp_body, du0, None, length=sqp_iters)
    return du_flat, col_mask


def nmpc_closed_core(rhs, c, r, N, Nu, delta, lam,
                     p_max, m_max, ny, nu, rho, substeps, sqp_iters, qp_iters,
                     Ts, xc, method="rk4", use_pallas=False):
    """closedloop_toolbox_nmpc.m:60-75: u(i) from state x(i-1), then
    integrate; Y(:,1) = x0(xc)."""
    dtype = r.dtype
    nit = r.shape[0]

    def step(state, rk):
        x, u_prev = state
        du_flat, col_mask = _nmpc_control(
            rhs, c, x, u_prev, rk, N, Nu, delta, lam,
            p_max, m_max, ny, nu, rho, substeps, sqp_iters, qp_iters, Ts, xc,
            method, use_pallas)
        du0 = (du_flat.reshape(m_max, nu) * col_mask[:, None])[0]
        u = u_prev + du0
        x_next = integrate(rhs, x, u, Ts, substeps, method)
        return (x_next, u), (x_next[jnp.array(xc)], u)

    init = (c["x0"], c["u0"])
    _, (Y, U) = jax.lax.scan(step, init, r[1:])
    y0 = c["x0"][jnp.array(xc)][None, :]
    u0 = c["u0"][None, :]
    return jnp.vstack([y0, Y]), jnp.vstack([u0, U])


def nmpc_open_core(rhs, c, r_final, N, Nu, delta, lam, nit,
                   p_max, m_max, ny, nu, rho, substeps, sqp_iters, qp_iters,
                   Ts, xc, method="rk4", use_pallas=False):
    """closedloop_toolbox_nmpc.m:77-94: one solve at (x0, u0) with the final
    setpoint; play MVopt (held) through the ODE."""
    dtype = r_final.dtype
    du_flat, col_mask = _nmpc_control(
        rhs, c, c["x0"], c["u0"], r_final, N, Nu, delta, lam,
        p_max, m_max, ny, nu, rho, substeps, sqp_iters, qp_iters, Ts, xc,
        method, use_pallas)
    u_seq = _u_sequence(du_flat, c["u0"], col_mask, m_max, nu)
    idx = jnp.clip(jnp.arange(nit - 1), 0, m_max - 1)
    # hold beyond the control horizon: clamp to the last *active* move
    last_active = jnp.maximum(Nu - 1, 0)
    idx = jnp.minimum(idx, last_active)
    uopt = u_seq[idx]  # (nit-1, nu)

    def body(x, u):
        xn = integrate(rhs, x, u, Ts, substeps, method)
        return xn, xn[jnp.array(xc)]

    _, Y = jax.lax.scan(body, c["x0"], uopt)
    y0 = c["x0"][jnp.array(xc)][None, :]
    yopt = jnp.vstack([y0, Y])
    uopt_full = jnp.vstack([c["u0"][None, :], uopt])
    return yopt, uopt_full


_nmpc_closed = partial(jax.jit, static_argnums=(0,) + tuple(range(7, 19)))(nmpc_closed_core)

_nmpc_closed_batch = partial(jax.jit, static_argnums=(0,) + tuple(range(7, 19)))(
    jax.vmap(nmpc_closed_core,
             in_axes=(None, None, 0, 0, 0, 0, 0) + (None,) * 12)
)


def _open_with_nit(rhs, c, rfin, N, Nu, delta, lam, nit, *statics):
    return nmpc_open_core(rhs, c, rfin, N, Nu, delta, lam, nit, *statics)


_nmpc_open_batch = partial(jax.jit, static_argnums=(0,) + tuple(range(7, 20)))(
    jax.vmap(_open_with_nit,
             in_axes=(None, None, 0, 0, 0, 0, 0) + (None,) * 13)
)
