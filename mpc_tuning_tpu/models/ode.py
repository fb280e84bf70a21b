"""Nonlinear ODE models and fixed-step integrators (JAX).

Van de Vusse non-isothermal CSTR, parameters transcribed from
/root/reference/MPC-Tuning/vandevusse_model.m:39-77 (identical physics in
nmpc_vandevusse_state.m and Explicit NMPC/plant_model.m).

The reference integrates with adaptive ode45/ode15s/ode23t
(closedloop_toolbox_nmpc.m:71, NMPC_Controller.m:99).  On TPU we use
fixed-substep RK4 inside `lax.scan`: at Ts = 0.05 h the fastest eigenvalue
of the VdV dynamics is ~60/h, so dt = Ts/10 = 0.005 h is deep inside the
RK4 stability region and tolerance-matched to the reference (validated in
tests against scipy.solve_ivp LSODA).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["vandevusse_rhs", "rk4_step", "tr_bdf2_step", "integrate",
           "integrate_rk4", "newton_steady_state", "VDV_X0", "VDV_U0"]

VDV_X0 = jnp.array([5.1, 1.1163, 130.0])  # [Ca, Cb, T] steady guess
VDV_U0 = jnp.array([20.0, 130.0])  # [fov (1/h), Tk (C)] (VanDeVusse_NMPC.m:70)


def vandevusse_rhs(x, u):
    """dx/dt for the Van de Vusse CSTR (vandevusse_model.m:39-77)."""
    k10 = 1.287e12
    k20 = 1.287e12
    k30 = 9.043e9
    E1 = -9758.3
    E2 = -9758.3
    E3 = -8560.0
    dAB = -4.20
    dBC = 11.00
    dAD = 41.85
    rho = 0.9342
    cp = 3.01
    Kw = 4032.0
    Ar = 0.215
    V = 10.0
    T0 = 130.0
    Ca0 = 5.10

    fov, Tk = u[0], u[1]
    ca, cb, T = x[0], x[1], x[2]
    k1 = k10 * jnp.exp(E1 / (T + 273.15))
    k2 = k20 * jnp.exp(E2 / (T + 273.15))
    k3 = k30 * jnp.exp(E3 / (T + 273.15))
    dca = fov * (Ca0 - ca) - k1 * ca - k3 * ca * ca
    dcb = -fov * cb + k1 * ca - k2 * cb
    dT = (
        (1.0 / (rho * cp)) * (k1 * ca * dAB + k2 * cb * dBC + k3 * ca**2 * dAD)
        + fov * (T0 - T)
        + (Kw * Ar / (rho * cp * V)) * (Tk - T)
    )
    return jnp.stack([dca, dcb, dT])


def rk4_step(rhs, x, u, dt):
    k1 = rhs(x, u)
    k2 = rhs(x + 0.5 * dt * k1, u)
    k3 = rhs(x + 0.5 * dt * k2, u)
    k4 = rhs(x + dt * k3, u)
    return x + (dt / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4)


_TRBDF2_GAMMA = 2.0 - 2.0 ** 0.5  # the standard L-stable choice


def _newton_solve(res, x_guess, iters):
    """Fixed-iteration Newton on res(x)=0 with exact jacfwd Jacobians."""

    def body(x, _):
        F = res(x)
        J = jax.jacfwd(res)(x)
        return x - jnp.linalg.solve(J, F), None

    x, _ = jax.lax.scan(body, x_guess, None, length=iters)
    return x


def tr_bdf2_step(rhs, x, u, dt, newton_iters: int = 6):
    """One TR-BDF2 step — the implicit stiff integrator standing in for the
    reference's adaptive ``ode23t``/``ode15s`` calls
    (Explicit NMPC/NMPC_Controller.m:99,115; MPC-Tuning/VanDeVusse_NMPC.m:85).

    Trapezoidal stage to t+g*dt followed by a BDF2 stage to t+dt with
    g = 2-sqrt(2) (L-stable, 2nd order).  Both implicit stages are solved by
    a fixed number of full-Newton iterations so the step is jit/vmap/scan
    friendly (no data-dependent control flow).
    """
    g = _TRBDF2_GAMMA
    f0 = rhs(x, u)

    def res_tr(xg):
        return xg - x - 0.5 * g * dt * (f0 + rhs(xg, u))

    xg = _newton_solve(res_tr, x + g * dt * f0, newton_iters)

    c1 = 1.0 / (g * (2.0 - g))
    c2 = (1.0 - g) ** 2 / (g * (2.0 - g))
    c3 = (1.0 - g) / (2.0 - g)

    def res_bdf(xn):
        return xn - c1 * xg + c2 * x - c3 * dt * rhs(xn, u)

    return _newton_solve(res_bdf, xg, newton_iters)


def integrate(rhs, x0, u, Ts, substeps: int = 10, method: str = "rk4",
              newton_iters: int = 6):
    """Integrate one sample interval with ZOH input u (jit/vmap friendly).

    method: 'rk4' (explicit, matches ode45-quality at small substeps) or
    'tr_bdf2' (implicit L-stable, the ode15s/ode23t equivalent for stiff
    plants).  ``method`` must be static under jit.
    """
    dt = Ts / substeps
    if method == "rk4":
        stepper = lambda x: rk4_step(rhs, x, u, dt)
    elif method == "tr_bdf2":
        stepper = lambda x: tr_bdf2_step(rhs, x, u, dt, newton_iters)
    else:
        raise ValueError(f"unknown integrator method {method!r}")

    def body(x, _):
        return stepper(x), None

    x, _ = jax.lax.scan(body, x0, None, length=substeps)
    return x


def integrate_rk4(rhs, x0, u, Ts, substeps: int = 10):
    """Back-compat alias: fixed-substep RK4 over one sample interval."""
    return integrate(rhs, x0, u, Ts, substeps, "rk4")


def newton_steady_state(rhs, x0, u, iters: int = 50, tol: float = 1e-12):
    """fsolve equivalent (VanDeVusse_NMPC.m:72-79): Newton on rhs(x,u)=0."""
    x = jnp.asarray(x0, dtype=jnp.float64)

    def body(x, _):
        f = rhs(x, u)
        J = jax.jacfwd(lambda xx: rhs(xx, u))(x)
        dx = jnp.linalg.solve(J, -f)
        return x + dx, None

    x, _ = jax.lax.scan(body, x, None, length=iters)
    return x
