"""Trajectory rollout for discrete state-space models.

``dlsim`` is the float64 NumPy reference; ``dlsim_jax`` is the
`lax.scan` version used inside jitted/vmapped closed-loop engines.
Equivalent of MATLAB ``lsim(P, u, t, 'zoh')`` sampled at kTs (used all over
the reference, e.g. /root/reference/DTC-GPC/DTC_GPC_WW.m:129-133 and
/root/reference/MPC-Tuning/WoodBerry.m:98) — but O(T) recursive instead of
the reference's O(T^2) full-history replay per step.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["dlsim", "dlsim_jax"]


def dlsim(ss, U: np.ndarray, x0: np.ndarray | None = None) -> np.ndarray:
    """Simulate y(k) for k=0..T-1 given inputs U (T, nu). Host float64."""
    U = np.asarray(U, dtype=np.float64)
    T = U.shape[0]
    x = np.zeros(ss.nx) if x0 is None else np.asarray(x0, dtype=np.float64)
    Y = np.zeros((T, ss.ny))
    for k in range(T):
        Y[k] = ss.C @ x + ss.D @ U[k]
        x = ss.A @ x + ss.B @ U[k]
    return Y


def dlsim_jax(A, B, C, D, U, x0=None):
    """jit/vmap-friendly rollout: returns (Y, x_final).

    A,B,C,D are jnp arrays (any float dtype); U is (T, nu).
    """
    if x0 is None:
        x0 = jnp.zeros((A.shape[0],), dtype=A.dtype)

    def step(x, u):
        y = C @ x + D @ u
        x_next = A @ x + B @ u
        return x_next, y

    x_last, Y = jax.lax.scan(step, x0, U)
    return Y, x_last
