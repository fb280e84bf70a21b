"""Pallas TPU kernels for the QP hot path.

XLA's batched small dense Cholesky/triangular solves lower to scalar-ish
loops that run ~1000x off peak on TPU and dominate the closed-loop MPC
scan (profiled: they are the entire bottleneck of the tuning workload).
These kernels batch the candidates onto the VPU LANE dimension instead:

  layout (n, n, B) / (n, B) with B on the 128-wide lane axis, so every
  unrolled elimination step is a full-width vector op in VMEM.

`spd_solve(M, rhs)` is exposed through `jax.custom_batching.custom_vmap`:
 * unbatched call (plain jnp fallback) keeps the per-candidate API;
 * under `vmap` (the tuning candidate batch) the batched rule invokes the
   Pallas kernel with the batch inside the block.

n is padded to a multiple of 8 (sublane) and B to 128 (lane).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.custom_batching import custom_vmap
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["spd_solve"]


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


# ---------------------------------------------------------------- kernel


def _cholsolve_kernel(n: int, M_ref, rhs_ref, x_ref, L_ref, y_ref):
    """Factor M = L L^T and solve M x = rhs for one (n, n, Bt) block.

    M_ref: (n, n, Bt); rhs_ref: (n, Bt); x_ref out: (n, Bt).
    L_ref, y_ref: VMEM scratch (n, n, Bt), (n, Bt).
    Fully unrolled over n (static); every statement is a (Bt,)- or
    (n, Bt)-wide vector op.
    """
    A = M_ref[...]  # (n, n, Bt) working copy in registers/VMEM
    row_idx = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)

    for j in range(n):
        d = jnp.sqrt(A[j, j, :])  # (Bt,)
        inv_d = 1.0 / d
        mask = (row_idx > j).astype(A.dtype)  # (n, 1)
        col = A[:, j, :] * mask * inv_d[None, :]  # strictly-below-diag / d
        L_ref[:, j, :] = col
        L_ref[j, j, :] = d
        # trailing submatrix rank-1 update (rows/cols <= j untouched: col=0)
        A = A - col[:, None, :] * col[None, :, :]

    # forward substitution L y = rhs; y_ref rows >= j are zero so the masked
    # full-row dot only picks up already-computed entries (ref stores avoid
    # scatter lowering)
    y_ref[...] = jnp.zeros_like(rhs_ref[...])
    for j in range(n):
        acc = jnp.sum(L_ref[j, :, :] * y_ref[...], axis=0)  # (Bt,)
        y_ref[j, :] = (rhs_ref[j, :] - acc) / L_ref[j, j, :]

    # back substitution L^T x = y
    x_ref[...] = jnp.zeros_like(rhs_ref[...])
    for j in range(n - 1, -1, -1):
        acc = jnp.sum(L_ref[:, j, :] * x_ref[...], axis=0)
        x_ref[j, :] = (y_ref[j, :] - acc) / L_ref[j, j, :]


def _spd_solve_batched_impl(M: jnp.ndarray, rhs: jnp.ndarray) -> jnp.ndarray:
    """M (B, n, n), rhs (B, n) -> x (B, n) via the lane-major kernel."""
    B, n, _ = M.shape
    dtype = M.dtype
    n_pad = max(8, -(-n // 8) * 8)
    Bt = 128
    B_pad = -(-B // Bt) * Bt

    # pad: identity diagonal on padded rows keeps the factorization valid
    Mp = jnp.zeros((B_pad, n_pad, n_pad), dtype)
    Mp = Mp.at[:, jnp.arange(n, n_pad), jnp.arange(n, n_pad)].set(1.0)
    Mp = Mp.at[:B, :n, :n].set(M)
    Mp = Mp.at[B:, jnp.arange(n), jnp.arange(n)].set(1.0)
    rp = jnp.zeros((B_pad, n_pad), dtype).at[:B, :n].set(rhs)

    Mt = Mp.transpose(1, 2, 0)  # (n, n, B_pad) lane-major batch
    rt = rp.transpose(1, 0)  # (n, B_pad)

    grid = (B_pad // Bt,)
    out = pl.pallas_call(
        functools.partial(_cholsolve_kernel, n_pad),
        grid=grid,
        in_specs=[
            pl.BlockSpec((n_pad, n_pad, Bt), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_pad, Bt), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n_pad, Bt), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, B_pad), dtype),
        scratch_shapes=[
            pltpu.VMEM((n_pad, n_pad, Bt), dtype),
            pltpu.VMEM((n_pad, Bt), dtype),
        ],
        interpret=_interpret(),
    )(Mt, rt)
    return out.transpose(1, 0)[:B, :n]


@custom_vmap
def spd_solve(M: jnp.ndarray, rhs: jnp.ndarray) -> jnp.ndarray:
    """Solve the SPD system M x = rhs (single instance: jnp fallback)."""
    L = jnp.linalg.cholesky(M)
    y = jax.scipy.linalg.solve_triangular(L, rhs, lower=True)
    return jax.scipy.linalg.solve_triangular(L.T, y, lower=False)


@spd_solve.def_vmap
def _spd_solve_vmap(axis_size, in_batched, M, rhs):
    M_b, r_b = in_batched
    if not (M_b and r_b):
        # broadcast the unbatched operand
        if not M_b:
            M = jnp.broadcast_to(M, (axis_size,) + M.shape)
        if not r_b:
            rhs = jnp.broadcast_to(rhs, (axis_size,) + rhs.shape)
    if M.ndim > 3:
        # nested vmap: flatten leading axes
        lead = M.shape[:-2]
        x = _spd_solve_batched_impl(M.reshape((-1,) + M.shape[-2:]),
                                    rhs.reshape((-1, rhs.shape[-1])))
        return x.reshape(lead + (rhs.shape[-1],)), True
    return _spd_solve_batched_impl(M, rhs), True
