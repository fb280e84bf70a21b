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

__all__ = ["spd_solve", "spd_factor", "spd_factor_solve",
           "factor_lanes", "solve_lanes", "pdip_fused_lanes",
           "admm_fused_lanes"]


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


# The v5e's physical VMEM is ~128 MB/core — far above Mosaic's conservative
# default scoped budget.  The fused whole-solve kernels legitimately hold
# multi-MB shared tables (the Shell7x5 band shape's T2T alone is 18 MB), so
# they raise the limit explicitly; measured on-chip: a 110 MB scratch
# compiles and runs (round-4 probe).  Per-shape viability is still guarded
# by ops/qp.fused_pdip_viable / admm_fused_max_lanes against this budget.
_VMEM_LIMIT = 112 * 2 ** 20


def _fused_params():
    return pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT)


# ---------------------------------------------------------------- kernel


def _cholsolve_kernel(n: int, M_ref, rhs_ref, x_ref, L_ref, y_ref):
    """Factor M = L L^T and solve M x = rhs for one (n, n, Bt) block.

    M_ref: (n, n, Bt); rhs_ref: (n, Bt); x_ref out: (n, Bt).
    L_ref: VMEM scratch (n, n, Bt) — holds the working matrix, updated in
    place so it ends as L (strictly lower + diagonal; upper junk is masked
    out by the substitution passes).  y_ref: (n, Bt) scratch.

    fori_loop + dynamic slices (NOT unrolled — Mosaic compile time of the
    unrolled version was ~18 min); every step is a (Bt,)- or (n, Bt)-wide
    lane-vector op.
    """
    dtype = M_ref.dtype
    row_idx = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)

    L_ref[...] = M_ref[...]

    def chol_step(j, _):
        d = jnp.sqrt(L_ref[pl.ds(j, 1), pl.ds(j, 1), :])[0, 0, :]  # (Bt,)
        col_raw = L_ref[:, pl.ds(j, 1), :][:, 0, :]  # (n, Bt)
        below = (row_idx > j).astype(dtype)  # (n, 1)
        col = col_raw * below / d[None, :]
        # write the finished column: strictly-below entries / d, diagonal d
        diag = (row_idx == j).astype(dtype)
        L_ref[:, pl.ds(j, 1), :] = (col + diag * d[None, :])[:, None, :]
        # trailing submatrix rank-1 update (col zero for rows <= j)
        L_ref[...] = L_ref[...] - col[:, None, :] * col[None, :, :]
        # restore the just-written column (the rank-1 update touched it
        # only at rows > j where col*col[j]=col*0 — col[j]=0 — so it is
        # actually untouched; nothing to do)
        return 0

    jax.lax.fori_loop(0, n, chol_step, 0)

    # forward substitution L y = rhs; rows >= j of y_ref are zero, and a
    # (col < j) mask keeps only the strictly-lower part of row j
    iota_col = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)

    y_ref[...] = jnp.zeros_like(rhs_ref[...])

    def fwd_step(j, _):
        Lrow = L_ref[pl.ds(j, 1), :, :][0]  # (n, Bt)
        mask = (iota_col < j).astype(dtype)  # (n, 1)
        acc = jnp.sum(Lrow * mask * y_ref[...], axis=0)
        d = L_ref[pl.ds(j, 1), pl.ds(j, 1), :][0, 0, :]
        y_ref[pl.ds(j, 1), :] = ((rhs_ref[pl.ds(j, 1), :][0] - acc) / d)[None, :]
        return 0

    jax.lax.fori_loop(0, n, fwd_step, 0)

    # back substitution L^T x = y: row j of L^T = column j of L (rows > j)
    x_ref[...] = jnp.zeros_like(rhs_ref[...])

    def bwd_step(jj, _):
        j = n - 1 - jj
        Lcol = L_ref[:, pl.ds(j, 1), :][:, 0, :]  # (n, Bt)
        mask = (iota_col > j).astype(dtype)
        acc = jnp.sum(Lcol * mask * x_ref[...], axis=0)
        d = L_ref[pl.ds(j, 1), pl.ds(j, 1), :][0, 0, :]
        x_ref[pl.ds(j, 1), :] = ((y_ref[pl.ds(j, 1), :][0] - acc) / d)[None, :]
        return 0

    jax.lax.fori_loop(0, n, bwd_step, 0)


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


# ------------------------------------------------- split factor / solve


def _factor_kernel(n: int, M_ref, L_ref, scratch_ref):
    """Cholesky factor only: L_ref (n, n, Bt) output."""
    dtype = M_ref.dtype
    row_idx = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    L_ref[...] = M_ref[...]

    def chol_step(j, _):
        d = jnp.sqrt(L_ref[pl.ds(j, 1), pl.ds(j, 1), :])[0, 0, :]
        col_raw = L_ref[:, pl.ds(j, 1), :][:, 0, :]
        below = (row_idx > j).astype(dtype)
        col = col_raw * below / d[None, :]
        diag = (row_idx == j).astype(dtype)
        L_ref[:, pl.ds(j, 1), :] = (col + diag * d[None, :])[:, None, :]
        L_ref[...] = L_ref[...] - col[:, None, :] * col[None, :, :]
        return 0

    jax.lax.fori_loop(0, n, chol_step, 0)


def _solve_kernel(n: int, L_ref, rhs_ref, x_ref, y_ref):
    """Two triangular solves with a precomputed factor."""
    dtype = L_ref.dtype
    iota_col = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)

    y_ref[...] = jnp.zeros_like(rhs_ref[...])

    def fwd_step(j, _):
        Lrow = L_ref[pl.ds(j, 1), :, :][0]
        mask = (iota_col < j).astype(dtype)
        acc = jnp.sum(Lrow * mask * y_ref[...], axis=0)
        d = L_ref[pl.ds(j, 1), pl.ds(j, 1), :][0, 0, :]
        y_ref[pl.ds(j, 1), :] = ((rhs_ref[pl.ds(j, 1), :][0] - acc) / d)[None, :]
        return 0

    jax.lax.fori_loop(0, n, fwd_step, 0)

    x_ref[...] = jnp.zeros_like(rhs_ref[...])

    def bwd_step(jj, _):
        j = n - 1 - jj
        Lcol = L_ref[:, pl.ds(j, 1), :][:, 0, :]
        mask = (iota_col > j).astype(dtype)
        acc = jnp.sum(Lcol * mask * x_ref[...], axis=0)
        d = L_ref[pl.ds(j, 1), pl.ds(j, 1), :][0, 0, :]
        x_ref[pl.ds(j, 1), :] = ((y_ref[pl.ds(j, 1), :][0] - acc) / d)[None, :]
        return 0

    jax.lax.fori_loop(0, n, bwd_step, 0)


def _pad_dims(n: int, B: int):
    return max(8, -(-n // 8) * 8), -(-B // 128) * 128


def _factor_batched_impl(M: jnp.ndarray) -> jnp.ndarray:
    """(B, n, n) -> lower factor (B, n, n) via the lane-major kernel."""
    B, n, _ = M.shape
    dtype = M.dtype
    n_pad, B_pad = _pad_dims(n, B)
    Bt = 128
    Mp = jnp.zeros((B_pad, n_pad, n_pad), dtype)
    Mp = Mp.at[:, jnp.arange(n_pad), jnp.arange(n_pad)].set(1.0)
    Mp = Mp.at[:B, :n, :n].set(M)
    Mt = Mp.transpose(1, 2, 0)
    grid = (B_pad // Bt,)
    L = pl.pallas_call(
        functools.partial(_factor_kernel, n_pad),
        grid=grid,
        in_specs=[pl.BlockSpec((n_pad, n_pad, Bt), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((n_pad, n_pad, Bt), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, n_pad, B_pad), dtype),
        scratch_shapes=[pltpu.VMEM((n_pad, n_pad, Bt), dtype)],
        interpret=_interpret(),
    )(Mt)
    return L.transpose(2, 0, 1)[:B, :n, :n]


def _solve_batched_impl(L: jnp.ndarray, rhs: jnp.ndarray) -> jnp.ndarray:
    """L (B, n, n) lower factor, rhs (B, n) -> x (B, n)."""
    B, n, _ = L.shape
    dtype = rhs.dtype
    n_pad, B_pad = _pad_dims(n, B)
    Bt = 128
    Lp = jnp.zeros((B_pad, n_pad, n_pad), dtype)
    Lp = Lp.at[:, jnp.arange(n_pad), jnp.arange(n_pad)].set(1.0)
    Lp = Lp.at[:B, :n, :n].set(L)
    Lt = Lp.transpose(1, 2, 0)
    rp = jnp.zeros((B_pad, n_pad), dtype).at[:B, :n].set(rhs)
    rt = rp.transpose(1, 0)
    grid = (B_pad // Bt,)
    out = pl.pallas_call(
        functools.partial(_solve_kernel, n_pad),
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
        scratch_shapes=[pltpu.VMEM((n_pad, Bt), dtype)],
        interpret=_interpret(),
    )(Lt, rt)
    return out.transpose(1, 0)[:B, :n]


# ------------------------------------------------ lane-major entry points
#
# The custom_vmap entry points below take/return (B, n, n) batch-major
# arrays, so every factor/solve call pays a transpose + padded-scatter
# round-trip through HBM.  The lane-major entry points keep EVERYTHING in
# the kernel's native layout — matrices (n, n, B), vectors (n, B), batch on
# the 128-wide lane axis — so the interior-point loop that calls them
# (ops/qp.solve_qp_masked_lanes) does zero layout changes per iteration.
# Requirements: n % 8 == 0, B % 128 == 0 (the caller pads once per solve).


def factor_lanes(Mt: jnp.ndarray) -> jnp.ndarray:
    """Cholesky of (n, n, B) lane-major SPD batch -> (n, n, B) factor."""
    n, n2, B = Mt.shape
    assert n == n2 and n % 8 == 0 and B % 128 == 0, (n, n2, B)
    Bt = 128
    return pl.pallas_call(
        functools.partial(_factor_kernel, n),
        grid=(B // Bt,),
        in_specs=[pl.BlockSpec((n, n, Bt), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((n, n, Bt), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, n, B), Mt.dtype),
        scratch_shapes=[pltpu.VMEM((n, n, Bt), Mt.dtype)],
        interpret=_interpret(),
    )(Mt)


def solve_lanes(Lt: jnp.ndarray, rhs: jnp.ndarray) -> jnp.ndarray:
    """Two triangular solves with a lane-major factor: rhs (n, B) -> (n, B)."""
    n, n2, B = Lt.shape
    assert rhs.shape == (n, B), (Lt.shape, rhs.shape)
    Bt = 128
    return pl.pallas_call(
        functools.partial(_solve_kernel, n),
        grid=(B // Bt,),
        in_specs=[
            pl.BlockSpec((n, n, Bt), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, Bt), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n, Bt), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, B), rhs.dtype),
        scratch_shapes=[pltpu.VMEM((n, Bt), rhs.dtype)],
        interpret=_interpret(),
    )(Lt, rhs)


# ------------------------------------------------- fused full-PDIP kernel
#
# One pallas_call per QP SOLVE (all `iters` Mehrotra iterations), not per
# factor/solve: the whole interior point for a block of Bt candidate lanes
# runs out of VMEM — normal-matrix assembly ((n_pad^2, mc_pad) @ (mc_pad,
# Bt) on the MXU), in-place Cholesky, four triangular substitutions, and
# every elementwise vector op — with HBM touched only once per solve for
# the per-candidate constants and the warm-start state.  The per-iteration
# HBM round-trips of the factor/solve-kernel path (M, L, rhs, x each 3+
# times per iteration) are what dominated its runtime; here they are gone.
# Algorithm and constants mirror ops/qp.solve_qp_masked_lanes exactly
# (same update order, best-iterate-by-merit tracking, fraction-to-boundary
# 0.995, sigma = (mu_aff/mu)^3), replacing the MATLAB toolbox active-set
# QP of /root/reference/MPC-Tuning/MPC_Tuning/closedloop_toolbox.m:50.


def _pdip_fused_kernel(n: int, mc: int, iters: int, eps_c: float,
                       ridge: float, w_cap: float, solve_mode: str,
                       Hp_ref, T2T_ref, G0_ref, G0T_ref, f_ref, h_ref,
                       rmask_ref, cmask_ref, z0_ref, lam0_ref,
                       z_out, lam_out, s_out, L_ref, y_ref, x_ref, r_ref,
                       Xi_ref):
    """One Bt-lane block: full warm-started masked PDIP in VMEM.

    Shapes (per block): Hp (n_pad, n_pad, Bt) per-lane Hessians (identity
    diagonal on padded rows), T2T (n_pad^2, mc_pad) shared vec-outer-product
    constraint table, G0/G0T (mc_pad, n_pad)/(n_pad, mc_pad) shared, vectors
    (n_pad, Bt) / (mc_pad, Bt).  Rows >= mc are padding: rmask 0, h 1 —
    their duals are pinned to zero (rmask is 0 there, like every masked
    row) so gap/merit match the unpadded engine bit-for-bit in exact
    arithmetic.
    """
    dtype = f_ref.dtype
    n_pad = Hp_ref.shape[0]
    mcp = h_ref.shape[0]
    HIGH = jax.lax.Precision.HIGHEST
    dn = (((1,), (0,)), ((), ()))

    f = f_ref[...]
    h = h_ref[...]
    rmask = rmask_ref[...]
    cmask = cmask_ref[...]
    Hp = Hp_ref[...]
    G0 = G0_ref[...]
    G0T = G0T_ref[...]
    T2T = T2T_ref[...]
    cc = cmask[:, None, :] * cmask[None, :, :]          # (n_pad, n_pad, Bt)
    diag = (jax.lax.broadcasted_iota(jnp.int32, (n_pad, n_pad, 1), 0)
            == jax.lax.broadcasted_iota(jnp.int32, (n_pad, n_pad, 1), 1)
            ).astype(dtype)

    def Gmat(z):                                        # (n_pad,Bt)->(mcp,Bt)
        return rmask * jax.lax.dot_general(
            G0, cmask * z, dn, precision=HIGH, preferred_element_type=dtype)

    def GTmat(yv):                                      # (mcp,Bt)->(n_pad,Bt)
        return cmask * jax.lax.dot_general(
            G0T, rmask * yv, dn, precision=HIGH, preferred_element_type=dtype)

    def Hz(z):
        return jnp.sum(Hp * z[None, :, :], axis=1)

    row_idx = jax.lax.broadcasted_iota(jnp.int32, (n_pad, 1), 0)

    def factor(M):
        """In-place Cholesky of M (value) into L_ref."""
        L_ref[...] = M

        def chol_step(j, _):
            d = jnp.sqrt(L_ref[pl.ds(j, 1), pl.ds(j, 1), :])[0, 0, :]
            col_raw = L_ref[:, pl.ds(j, 1), :][:, 0, :]
            below = (row_idx > j).astype(dtype)
            col = col_raw * below / d[None, :]
            dsel = (row_idx == j).astype(dtype)
            L_ref[:, pl.ds(j, 1), :] = (col + dsel * d[None, :])[:, None, :]
            L_ref[...] = L_ref[...] - col[:, None, :] * col[None, :, :]
            return 0

        jax.lax.fori_loop(0, n_pad, chol_step, 0)

    def tril_invert():
        """Explicit L^{-1} into Xi_ref by STATIC blocked doubling.

        Substitution is a 2*n_pad-long serial chain of tiny (1, Bt) vector
        ops per solve — the measured latency wall of the whole fused kernel
        (4 substitution passes x 15 iterations x n_pad steps).  Inverting L
        once per iteration instead costs log2(n_pad) levels of per-lane
        block products (X21 = -X22 L21 X11, all blocks static slices), after
        which every solve collapses to two one-pass batched contractions.

        n_pad need NOT be a power of two (Shell shapes give n_pad = 24/48):
        when the trailing block is ragged the merge is clamped to n_pad —
        the blocked recursion is valid for ragged X22 (k' x k' with k' < k),
        and a block whose right half would start past n_pad is already fully
        inverted from the previous level, so it is skipped.
        """
        L = L_ref[...]
        dinv = 1.0 / jnp.sum(L * diag, axis=1)          # (n_pad, Bt)
        Xi_ref[...] = dinv[:, None, :] * diag

        Bt = L.shape[-1]

        def bmm(A, Bm):  # per-lane (p,q,Bt) @ (q,r,Bt) -> (p,r,Bt)
            return jnp.sum(A[:, :, None, :] * Bm[None, :, :, :], axis=1)

        k = 1
        while k < n_pad:
            for o in range(0, n_pad, 2 * k):
                if o + k >= n_pad:  # trailing block <= k: already inverted
                    continue
                hi = min(o + 2 * k, n_pad)
                kp = hi - (o + k)
                # column-chunk the merge so the (*, *, chunk, Bt) broadcast
                # temporaries stay ~2 MB and results are written IN PLACE
                # (at n_pad=48 the unchunked last-level temp is
                # (16,32,32,128) = 8.4 MB, which alone blew the 16 MB
                # scoped-VMEM budget — measured compile OOM on the
                # Shell3x3 tuning shape)
                per_col = max(kp * k, kp * kp) * Bt * 4
                chunk = max(1, min(k, (2 * 2 ** 20) // max(1, per_col)))
                L21 = L[o + k:hi, o:o + k, :]
                X22 = Xi_ref[o + k:hi, o + k:hi, :]
                for c0 in range(0, k, chunk):
                    c1 = min(c0 + chunk, k)
                    X11c = Xi_ref[o:o + k, o + c0:o + c1, :]
                    T = bmm(L21, X11c)                   # (kp, c, Bt)
                    Xi_ref[o + k:hi, o + c0:o + c1, :] = -bmm(X22, T)
            k *= 2

    def tri_solve_inv(rhs):
        """x = L^{-T} L^{-1} rhs via the explicit inverse — two batched
        one-pass contractions, no serial substitution chain."""
        Xi = Xi_ref[...]
        yv = jnp.sum(Xi * rhs[None, :, :], axis=1)       # L^{-1} rhs
        return jnp.sum(Xi * yv[:, None, :], axis=0)      # L^{-T} y

    def tri_solve_subst(rhs):
        """L L^T x = rhs with the factor in L_ref; rhs (n_pad, Bt) value.
        rhs is staged through r_ref: Mosaic cannot dynamic_slice a VALUE
        with a traced row index, but ref indexing via pl.ds lowers fine."""
        r_ref[...] = rhs
        y_ref[...] = jnp.zeros_like(rhs)

        def fwd_step(j, _):
            Lrow = L_ref[pl.ds(j, 1), :, :][0]
            mask = (row_idx < j).astype(dtype)
            acc = jnp.sum(Lrow * mask * y_ref[...], axis=0)
            d = L_ref[pl.ds(j, 1), pl.ds(j, 1), :][0, 0, :]
            r_j = r_ref[pl.ds(j, 1), :][0]
            y_ref[pl.ds(j, 1), :] = ((r_j - acc) / d)[None, :]
            return 0

        jax.lax.fori_loop(0, n_pad, fwd_step, 0)

        x_ref[...] = jnp.zeros_like(rhs)

        def bwd_step(jj, _):
            j = n_pad - 1 - jj
            Lcol = L_ref[:, pl.ds(j, 1), :][:, 0, :]
            mask = (row_idx > j).astype(dtype)
            acc = jnp.sum(Lcol * mask * x_ref[...], axis=0)
            d = L_ref[pl.ds(j, 1), pl.ds(j, 1), :][0, 0, :]
            x_ref[pl.ds(j, 1), :] = ((y_ref[pl.ds(j, 1), :][0] - acc) / d
                                     )[None, :]
            return 0

        jax.lax.fori_loop(0, n_pad, bwd_step, 0)
        return x_ref[...]

    tri_solve = tri_solve_inv if solve_mode == "trinv" else tri_solve_subst

    # ---- warm start (identical re-centering to solve_qp_masked_lanes);
    # masked rows (rmask 0, incl. the mcp padding) carry EXACTLY zero duals
    # throughout and mu normalizes by the ACTIVE row count, so the iterate
    # trajectory matches the capacity-bucketed (sliced) shape bit-for-bit
    # in exact arithmetic (sim/mpc_loop.capped contract)
    z = z0_ref[...]
    lam = jnp.maximum(lam0_ref[...], eps_c) * rmask
    s = jnp.maximum(h - Gmat(z), eps_c)
    nact = jnp.maximum(jnp.sum(rmask, axis=0, keepdims=True), 1.0)  # (1,Bt)

    inf = jnp.asarray(jnp.inf, dtype)

    def max_step(v, dv):
        ratio = jnp.where(dv < 0, -v / dv, inf)
        return jnp.minimum(1.0, 0.995 * jnp.min(ratio, axis=0,
                                                keepdims=True))  # (1, Bt)

    def body(_, carry):
        z, lam, s, bz, blam, bs, bm = carry
        r_d = Hz(z) + f + GTmat(lam)
        r_p = Gmat(z) + s - h
        gap = jnp.sum(lam * s, axis=0, keepdims=True)   # (1, Bt)
        mu = gap / nact

        mnew = (jnp.sqrt(jnp.sum(r_d * r_d, axis=0, keepdims=True))
                + jnp.sqrt(jnp.sum(r_p * r_p, axis=0, keepdims=True)) + gap)
        take = mnew < bm
        bz = jnp.where(take, z, bz)
        blam = jnp.where(take, lam, blam)
        bs = jnp.where(take, s, bs)
        bm = jnp.where(take, mnew, bm)

        w = jnp.minimum(lam / s, w_cap) * rmask         # (mcp, Bt)
        Mw = jax.lax.dot_general(T2T, w, dn, precision=HIGH,
                                 preferred_element_type=dtype)
        M = Hp + Mw.reshape(n_pad, n_pad, -1) * cc + ridge * diag
        factor(M)
        if solve_mode == "trinv":
            tril_invert()

        rhs_aff = -r_d + GTmat(lam - w * r_p)
        dz_aff = tri_solve(rhs_aff)
        ds_aff = -(r_p + Gmat(dz_aff))
        dlam_aff = -(lam * s + lam * ds_aff) / s * rmask

        a_aff = jnp.minimum(max_step(s, ds_aff), max_step(lam, dlam_aff))
        mu_aff = jnp.sum((lam + a_aff * dlam_aff) * (s + a_aff * ds_aff),
                         axis=0, keepdims=True) / nact
        sig_r = mu_aff / (mu + 1e-30)
        sigma = sig_r * sig_r * sig_r

        r_cent = (lam * s - sigma * mu + dlam_aff * ds_aff) * rmask
        dz = tri_solve(-r_d + GTmat(r_cent / s - w * r_p))
        ds = -(r_p + Gmat(dz))
        dlam = -(r_cent + lam * ds) / s * rmask

        a = jnp.minimum(max_step(s, ds), max_step(lam, dlam))
        return (z + a * dz, lam + a * dlam, s + a * ds, bz, blam, bs, bm)

    bm0 = jnp.full(s[:1].shape, jnp.inf, dtype)         # (1, Bt)
    z, lam, s, bz, blam, bs, bm = jax.lax.fori_loop(
        0, iters, body, (z, lam, s, z, lam, s, bm0))

    r_d = Hz(z) + f + GTmat(lam)
    r_p = Gmat(z) + s - h
    mlast = (jnp.sqrt(jnp.sum(r_d * r_d, axis=0, keepdims=True))
             + jnp.sqrt(jnp.sum(r_p * r_p, axis=0, keepdims=True))
             + jnp.sum(lam * s, axis=0, keepdims=True))
    take = mlast < bm
    z_out[...] = jnp.where(take, z, bz)
    lam_out[...] = jnp.where(take, lam, blam)
    s_out[...] = jnp.where(take, s, bs)


def pdip_fused_lanes(Hp, T2T, G0p, f_l, h_l, rmask_l, cmask_l, z0_l, lam0_l,
                     *, n: int, mc: int, iters: int, eps_c: float,
                     ridge: float, w_cap: float, block_lanes: int = 128,
                     solve_mode: str = "trinv"):
    """Lane-major fused PDIP over the candidate batch.

    Hp (n_pad, n_pad, B), T2T (n_pad^2, mc_pad), G0p (mc_pad, n_pad);
    vectors lane-major (rows, B) with B % block_lanes == 0.  Returns
    (z, lam, s) lane-major.
    """
    n_pad, _, B = Hp.shape
    mcp = G0p.shape[0]
    dtype = f_l.dtype
    Bt = block_lanes
    assert B % Bt == 0 and Bt % 128 == 0, (B, Bt)
    grid = (B // Bt,)

    def vec(rows):
        return pl.BlockSpec((rows, Bt), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    shared2 = lambda r, c: pl.BlockSpec((r, c), lambda i: (0, 0),
                                        memory_space=pltpu.VMEM)
    zs, lams, ss = pl.pallas_call(
        functools.partial(_pdip_fused_kernel, n, mc, iters, eps_c, ridge,
                          w_cap, solve_mode),
        grid=grid,
        in_specs=[
            pl.BlockSpec((n_pad, n_pad, Bt), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            shared2(n_pad * n_pad, mcp),
            shared2(mcp, n_pad),
            shared2(n_pad, mcp),
            vec(n_pad), vec(mcp), vec(mcp), vec(n_pad), vec(n_pad), vec(mcp),
        ],
        out_specs=(vec(n_pad), vec(mcp), vec(mcp)),
        out_shape=(
            jax.ShapeDtypeStruct((n_pad, B), dtype),
            jax.ShapeDtypeStruct((mcp, B), dtype),
            jax.ShapeDtypeStruct((mcp, B), dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((n_pad, n_pad, Bt), dtype),
            pltpu.VMEM((n_pad, Bt), dtype),
            pltpu.VMEM((n_pad, Bt), dtype),
            pltpu.VMEM((n_pad, Bt), dtype),
            pltpu.VMEM((n_pad, n_pad, Bt), dtype),
        ],
        compiler_params=_fused_params(),
        interpret=_interpret(),
    )(Hp, T2T, G0p, jnp.transpose(G0p), f_l, h_l, rmask_l, cmask_l,
      z0_l, lam0_l)
    return zs, lams, ss


# ------------------------------------------------- fused full-ADMM kernel
#
# One pallas_call per ADMM SOLVE (all iterations): unlike PDIP there is no
# factorization — the per-candidate inverse Minv = (Hs + sigma I + rho
# Gs'Gs)^{-1} is precomputed ONCE per candidate (ops/qp.admm_precompute),
# so an iteration is only
#   rhs = sigma x - fs + Gs'(rho zc - y)          (one MXU matmul)
#   x   = Minv rhs                                (one lane-batched contraction)
#   Gx  = Gs x                                    (one MXU matmul)
#   zc  = min(relaxed Gx + y/rho, hs);  y += rho (relaxed Gx - zc)
# — a ~6-op serial chain per iteration vs the fused PDIP's ~70 (Cholesky
# columns + substitutions), which is why this kernel is the tracking-case
# tuning speed path.  The equilibrated constraint matrix factorizes over
# the shared table exactly: Gs = diag(e*rmask) G0 diag(cmask*Dinv), so the
# matvecs ride the MXU against the SAME shared G0 as the PDIP kernels.
# Replaces the toolbox QP of
# /root/reference/MPC-Tuning/MPC_Tuning/closedloop_toolbox.m:50 for
# tracking-only cases (band cases stay on PDIP — documented stall,
# tests/test_production_qp.py).


def _admm_fused_kernel(iters: int, sigma: float, over_relax: float,
                       Minv_ref, G0_ref, G0T_ref, fs_ref, hs_ref,
                       arow_ref, acol_ref, par_ref, x0_ref, zc0_ref, y0_ref,
                       x_out, zc_out, y_out):
    """One Bt-lane block: `iters` warm-started ADMM iterations in VMEM.

    Shapes: Minv (n_pad, n_pad, Bt) per-lane inverses (identity diagonal on
    padded rows/lanes); G0/G0T (mcp, n_pad)/(n_pad, mcp) shared; vectors
    lane-major (rows, Bt).  par (8, Bt): row 0 = rho, row 1 = 1/rho.
    Padded constraint rows carry arow 0 / hs 1 and zero state, padded
    variable rows carry acol 0 / fs 0 and zero state — both stay exactly
    zero through every iteration, so the result matches the per-lane dense
    solver (ops/qp.solve_qp_admm) in exact arithmetic.
    """
    dtype = fs_ref.dtype
    HIGH = jax.lax.Precision.HIGHEST
    dn = (((1,), (0,)), ((), ()))

    Minv = Minv_ref[...]
    G0 = G0_ref[...]
    G0T = G0T_ref[...]
    fs = fs_ref[...]
    hs = hs_ref[...]
    arow = arow_ref[...]
    acol = acol_ref[...]
    rho = par_ref[0:1, :]          # (1, Bt)
    rho_inv = par_ref[1:2, :]

    def Gs(x):                      # (n_pad, Bt) -> (mcp, Bt)
        return arow * jax.lax.dot_general(
            G0, acol * x, dn, precision=HIGH, preferred_element_type=dtype)

    def GsT(t):                     # (mcp, Bt) -> (n_pad, Bt)
        return acol * jax.lax.dot_general(
            G0T, arow * t, dn, precision=HIGH, preferred_element_type=dtype)

    def body(_, carry):
        x, zc, y = carry
        rhs = sigma * x - fs + GsT(rho * zc - y)
        x = jnp.sum(Minv * rhs[None, :, :], axis=1)
        Gx = Gs(x)
        Gx_r = over_relax * Gx + (1.0 - over_relax) * zc
        z_new = jnp.minimum(Gx_r + y * rho_inv, hs)
        y = y + rho * (Gx_r - z_new)
        return (x, z_new, y)

    x, zc, y = jax.lax.fori_loop(
        0, iters, body, (x0_ref[...], zc0_ref[...], y0_ref[...]))
    x_out[...] = x
    zc_out[...] = zc
    y_out[...] = y


def admm_fused_lanes(Minv_t, G0p, fs_l, hs_l, arow_l, acol_l, par_l,
                     x0_l, zc0_l, y0_l, *, iters: int, sigma: float,
                     over_relax: float, block_lanes: int = 128):
    """Lane-major fused ADMM over the candidate batch.

    Minv_t (n_pad, n_pad, B), G0p (mcp, n_pad); vectors (rows, B) with
    B % block_lanes == 0.  Returns (x, zc, y) lane-major (scaled coords,
    the warm state carried across closed-loop timesteps)."""
    n_pad, _, B = Minv_t.shape
    mcp = G0p.shape[0]
    dtype = fs_l.dtype
    Bt = block_lanes
    assert B % Bt == 0 and Bt % 128 == 0, (B, Bt)

    def vec(rows):
        return pl.BlockSpec((rows, Bt), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    shared2 = lambda r, c: pl.BlockSpec((r, c), lambda i: (0, 0),
                                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_admm_fused_kernel, iters, sigma, over_relax),
        grid=(B // Bt,),
        in_specs=[
            pl.BlockSpec((n_pad, n_pad, Bt), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            shared2(mcp, n_pad),
            shared2(n_pad, mcp),
            vec(n_pad), vec(mcp), vec(mcp), vec(n_pad), vec(8),
            vec(n_pad), vec(mcp), vec(mcp),
        ],
        out_specs=(vec(n_pad), vec(mcp), vec(mcp)),
        out_shape=(
            jax.ShapeDtypeStruct((n_pad, B), dtype),
            jax.ShapeDtypeStruct((mcp, B), dtype),
            jax.ShapeDtypeStruct((mcp, B), dtype),
        ),
        compiler_params=_fused_params(),
        interpret=_interpret(),
    )(Minv_t, G0p, jnp.transpose(G0p), fs_l, hs_l, arow_l, acol_l, par_l,
      x0_l, zc0_l, y0_l)


@custom_vmap
def spd_factor(M: jnp.ndarray) -> jnp.ndarray:
    """Cholesky lower factor (kernel-batched under vmap)."""
    return jnp.linalg.cholesky(M)


@spd_factor.def_vmap
def _spd_factor_vmap(axis_size, in_batched, M):
    if M.ndim > 3:
        raise NotImplementedError("nested vmap over spd_factor")
    return _factor_batched_impl(M), True


@custom_vmap
def spd_factor_solve(L: jnp.ndarray, rhs: jnp.ndarray) -> jnp.ndarray:
    """Solve M x = rhs given the lower factor L (kernel-batched under vmap)."""
    y = jax.scipy.linalg.solve_triangular(L, rhs, lower=True)
    return jax.scipy.linalg.solve_triangular(L.T, y, lower=False)


@spd_factor_solve.def_vmap
def _spd_factor_solve_vmap(axis_size, in_batched, L, rhs):
    L_b, r_b = in_batched
    if not L_b:
        L = jnp.broadcast_to(L, (axis_size,) + L.shape)
    if not r_b:
        rhs = jnp.broadcast_to(rhs, (axis_size,) + rhs.shape)
    if L.ndim > 3:
        raise NotImplementedError("nested vmap over spd_factor_solve")
    return _solve_batched_impl(L, rhs), True


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


# ------------------------------------------------------------------------
# EXPERIMENTAL round-5 whole-SIM kernel: the ENTIRE nit-step closed loop
# (Kalman update -> f/h assembly -> warm equilibrated ADMM -> plant step)
# for one candidate lane block runs inside ONE pallas_call, with all state
# resident in VMEM across steps.  Motivation (PERF.md round-5 roofline):
# 57% of the headline wall is the ~40-op scan body OUTSIDE the fused QP
# kernel — per-op overhead x 400 sequential steps.  Tracking cases only
# (with_y=False, the bench headline shape); not yet the production engine
# (qualification pending).  Replaces the full step recursion of
# /root/reference/MPC-Tuning/MPC_Tuning/closedloop_toolbox.m:50-81.


def _closed_sim_admm_kernel(nit: int, iters: int, sigma: float,
                            over_relax: float, ny: int, nu: int, n: int,
                            mc: int, m_max: int,
                            # shared tables
                            Cpl_ref, Apl_ref, Bplu_ref, C_ref, Mk_ref,
                            A_ref, Bu_ref, SxF_ref, SstF_ref, ThT_ref,
                            G0_ref, G0T_ref, Vt_ref, oh_ref,
                            # per-lane constants
                            r_ref, q_ref, hbase_ref, su_ref, arow_ref,
                            acol_ref, Dinv_ref, e_ref, par_ref, sfy_ref,
                            sfu_ref,
                            # per-lane Minv
                            Minv_ref,
                            # outputs
                            Y_ref, U_ref):
    """One Bt-lane block, all `nit` steps in VMEM.

    Shapes (lane-major, Bt lanes): r (nit, ny, Bt) conditioned setpoints
    PRE-SCALED by 1/sf_y; q (pny, Bt) OV weight diag (row-masked);
    hbase/su/arow/e (mcp, Bt); acol/Dinv (n_pad, Bt); par (8, Bt) rows
    0/1 = rho / 1/rho; Minv (n_pad, n_pad, Bt).  Vt (nit, nv) packs the
    SHARED v-dependent per-step columns [Dv v_s | Bv v_s | Bpl_v v_raw |
    Sv v_s] — read per step via a one-hot MXU matvec (oh (nit, nit)
    identity; dynamic lane indexing is not Mosaic-friendly, a (nit,1)
    one-hot contraction is).  Outputs Y (nit, ny, Bt) RAW plant outputs,
    U (nit, nu, Bt) applied inputs, exactly closed_loop_core's streams.
    """
    dtype = r_ref.dtype
    HIGH = jax.lax.Precision.HIGHEST
    dn = (((1,), (0,)), ((), ()))

    Cpl = Cpl_ref[...]
    Apl = Apl_ref[...]
    Bplu = Bplu_ref[...]
    Cm = C_ref[...]
    Mk = Mk_ref[...]
    Am = A_ref[...]
    Bu = Bu_ref[...]
    SxF = SxF_ref[...]
    SstF = SstF_ref[...]
    ThT = ThT_ref[...]
    G0 = G0_ref[...]
    G0T = G0T_ref[...]
    Vt = Vt_ref[...]          # (nv, nit)
    q = q_ref[...]
    hbase = hbase_ref[...]
    su = su_ref[...]
    arow = arow_ref[...]
    acol = acol_ref[...]
    Dinv = Dinv_ref[...]
    ev = e_ref[...]
    rho = par_ref[0:1, :]
    rho_inv = par_ref[1:2, :]
    sfy = sfy_ref[...]        # (ny, 1) broadcast columns
    sfu = sfu_ref[...]        # (nu, 1)
    Minv = Minv_ref[...]

    nxp = Apl.shape[0]
    nxa = Am.shape[0]
    pny = SxF.shape[0]
    p = pny // ny

    def mm(Mat, X):
        return jax.lax.dot_general(Mat, X, dn, precision=HIGH,
                                   preferred_element_type=dtype)

    def Gs(x):
        return arow * mm(G0, acol * x)

    def GsT(t):
        return acol * mm(G0T, arow * t)

    Bt = q.shape[1]

    def step(k, carry):
        x_pl, x_hat_pred, u_prev, xa, zc, yd = carry
        # shared per-step v columns via one-hot contraction: (nv, 1)
        ohk = oh_ref[pl.ds(k, 1), :]          # (1, nit)
        vcols = jax.lax.dot_general(Vt, ohk, (((1,), (1,)), ((), ())),
                                    precision=HIGH,
                                    preferred_element_type=dtype)  # (nv,1)
        dv_k = vcols[0:ny]
        bv_k = vcols[ny:ny + nxa]
        bpl_k = vcols[ny + nxa:ny + nxa + nxp]
        sv_k = vcols[ny + nxa + nxp:ny + nxa + nxp + pny]

        y = mm(Cpl, x_pl)                     # (ny, Bt) RAW output
        Y_ref[pl.ds(k, 1)] = y[None]
        y_s = y / sfy
        innov = y_s - mm(Cm, x_hat_pred) - dv_k
        x_hat = x_hat_pred + mm(Mk, innov)

        free = mm(SxF, x_hat) + mm(SstF, u_prev) + sv_k   # (pny, Bt)
        r_k = r_ref[pl.ds(k, 1)][0]           # (ny, Bt), pre-scaled
        r_t = jnp.broadcast_to(r_k[None], (p, ny, Bt)).reshape(pny, Bt)
        err = q * (r_t - free)
        f_du = -2.0 * mm(ThT, err)            # (n_pad, Bt); masked cols 0
        fs = f_du * Dinv                      # f_eps = 0; Dinv pads 0

        u_t = jnp.broadcast_to(u_prev[None], (4 * m_max, nu, Bt)).reshape(
            4 * m_max * nu, Bt)
        mcp = hbase.shape[0]
        u_t = jnp.concatenate(
            [u_t, jnp.zeros((mcp - 4 * m_max * nu, Bt), dtype)], axis=0)
        hs = (hbase + su * u_t) * ev

        def admm_body(_, st):
            xx, zz, yy = st
            rhs = sigma * xx - fs + GsT(rho * zz - yy)
            xx = jnp.sum(Minv * rhs[None, :, :], axis=1)
            Gx = Gs(xx)
            Gx_r = over_relax * Gx + (1.0 - over_relax) * zz
            z_new = jnp.minimum(Gx_r + yy * rho_inv, hs)
            yy = yy + rho * (Gx_r - z_new)
            return (xx, z_new, yy)

        xa, zc, yd = jax.lax.fori_loop(0, iters, admm_body, (xa, zc, yd))

        du = (xa * Dinv)[0:nu]
        u_s = u_prev + du
        u_out = u_s * sfu
        U_ref[pl.ds(k, 1)] = u_out[None]
        x_hat_pred = mm(Am, x_hat) + mm(Bu, u_s) + bv_k
        x_pl = mm(Apl, x_pl) + mm(Bplu, u_out) + bpl_k
        return (x_pl, x_hat_pred, u_s, xa, zc, yd)

    n_pad = acol.shape[0]
    mcp = arow.shape[0]
    init = (jnp.zeros((nxp, Bt), dtype), jnp.zeros((nxa, Bt), dtype),
            jnp.zeros((nu, Bt), dtype), jnp.zeros((n_pad, Bt), dtype),
            jnp.zeros((mcp, Bt), dtype), jnp.zeros((mcp, Bt), dtype))
    jax.lax.fori_loop(0, nit, step, init)


def closed_sim_admm_lanes(tables, lane_consts, Minv_t, r_l, *, nit: int,
                          iters: int, sigma: float, over_relax: float,
                          dims, block_lanes: int = 512):
    """Whole-sim fused ADMM closed loop (EXPERIMENTAL, tracking cases).

    tables: dict of shared 2-D arrays (see kernel docstring);
    lane_consts: dict of (rows, B) per-lane constants; Minv_t
    (n_pad, n_pad, B); r_l (nit, ny, B) pre-scaled setpoints.
    Returns (Y (nit, ny, B) raw outputs, U (nit, nu, B))."""
    n_pad, _, B = Minv_t.shape
    dtype = r_l.dtype
    ny, nu, n, mc, m_max = (dims["ny"], dims["nu"], dims["n"], dims["mc"],
                            dims["m_max"])
    Bt = min(block_lanes, B)
    assert B % Bt == 0, (B, Bt)
    mcp = lane_consts["hbase"].shape[0]

    shared = lambda a: pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim,
                                    memory_space=pltpu.VMEM)
    lane2 = lambda rows: pl.BlockSpec((rows, Bt), lambda i: (0, i),
                                      memory_space=pltpu.VMEM)

    oh = jnp.eye(nit, dtype=dtype)
    t_names = ("Cpl", "Apl", "Bplu", "C", "Mk", "A", "Bu", "SxF", "SstF",
               "ThT", "G0", "G0T", "Vt")
    c_names = ("q", "hbase", "su", "arow", "acol", "Dinv", "e", "par",
               "sfy", "sfu")
    in_specs = ([shared(tables[k]) for k in t_names] + [shared(oh)]
                + [pl.BlockSpec((nit, ny, Bt), lambda i: (0, 0, i),
                                memory_space=pltpu.VMEM)]
                + [lane2(lane_consts[k].shape[0]) for k in c_names]
                + [pl.BlockSpec((n_pad, n_pad, Bt), lambda i: (0, 0, i),
                                memory_space=pltpu.VMEM)])
    Y, U = pl.pallas_call(
        functools.partial(_closed_sim_admm_kernel, nit, iters, sigma,
                          over_relax, ny, nu, n, mc, m_max),
        grid=(B // Bt,),
        in_specs=in_specs,
        out_specs=(pl.BlockSpec((nit, ny, Bt), lambda i: (0, 0, i),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((nit, nu, Bt), lambda i: (0, 0, i),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((nit, ny, B), dtype),
                   jax.ShapeDtypeStruct((nit, nu, B), dtype)),
        compiler_params=_fused_params(),
        interpret=_interpret(),
    )(*([tables[k] for k in t_names] + [oh, r_l]
        + [lane_consts[k] for k in c_names] + [Minv_t]))
    return Y, U


# ------------------------------------------------ whole-SIM PDIP kernel
#
# GAM-stage analogue of the whole-sim ADMM kernel: the entire nit-step
# closed loop -- Kalman update, f/h assembly, WARM-STARTED masked PDIP
# (the algorithm of _pdip_fused_kernel, trinv solves), plant step -- in
# ONE pallas_call per lane block.  The GAM stage cannot run ADMM
# (rank-flips on extreme CMA weight vectors, PERF.md engine policy), so
# cutting its per-step scan overhead -- the same fixed cost the round-5
# roofline measured at >50% of the VNS wall -- needs the PDIP iteration
# inside the sim kernel.  Replaces the per-step toolbox QP of
# /root/reference/MPC-Tuning/MPC_Tuning/closedloop_toolbox.m:50 inside
# the fgoalattain objective loop (MPC_TFob.m:67, GAM_fun.m:79-91).

# warm-start recentering floor -- keep in sync with ops/qp._WS_EPS (not
# imported at module top to avoid a circular import)
_WS_EPS_KERNEL = 1e-4


def _closed_sim_pdip_kernel(nit: int, iters: int, eps_c: float,
                            ridge: float, w_cap: float, ny: int, nu: int,
                            n: int, mc: int, m_max: int,
                            # shared tables
                            Cpl_ref, Apl_ref, Bplu_ref, C_ref, Mk_ref,
                            A_ref, Bu_ref, SxF_ref, SstF_ref, ThT_ref,
                            G0_ref, G0T_ref, T2T_ref, Vt_ref, oh_ref,
                            # per-lane constants
                            r_ref, q_ref, hbase_ref, su_ref, rmask_ref,
                            cmask_ref, sfy_ref, sfu_ref,
                            # per-lane Hessians
                            Hp_ref,
                            # outputs
                            Y_ref, U_ref,
                            # scratch
                            L_ref, Xi_ref):
    """One Bt-lane block, all `nit` steps in VMEM; per-step QP = the
    warm-started masked PDIP of _pdip_fused_kernel (same recentering,
    best-iterate selection, Mehrotra corrector, blocked-L^{-1} solves),
    with the (z, lam) warm pair carried across timesteps exactly like
    the scan path's ws triple (sim/mpc_loop.closed_loop_core,
    'pdip_ws_fused' branch; s is recomputed from the step's own h, as
    the solve itself does).  Assembly mirrors _closed_sim_admm_kernel;
    f/h stay UNSCALED (the PDIP conditions internally via w = lam/s)."""
    dtype = r_ref.dtype
    HIGH = jax.lax.Precision.HIGHEST
    dn = (((1,), (0,)), ((), ()))

    Cpl = Cpl_ref[...]
    Apl = Apl_ref[...]
    Bplu = Bplu_ref[...]
    Cm = C_ref[...]
    Mk = Mk_ref[...]
    Am = A_ref[...]
    Bu = Bu_ref[...]
    SxF = SxF_ref[...]
    SstF = SstF_ref[...]
    ThT = ThT_ref[...]
    G0 = G0_ref[...]
    G0T = G0T_ref[...]
    T2T = T2T_ref[...]
    Vt = Vt_ref[...]
    q = q_ref[...]
    hbase = hbase_ref[...]
    su = su_ref[...]
    rmask = rmask_ref[...]
    cmask = cmask_ref[...]
    sfy = sfy_ref[...]
    sfu = sfu_ref[...]
    Hp = Hp_ref[...]

    nxp = Apl.shape[0]
    nxa = Am.shape[0]
    pny = SxF.shape[0]
    p = pny // ny
    n_pad = cmask.shape[0]
    mcp = rmask.shape[0]
    Bt = q.shape[1]

    cc = cmask[:, None, :] * cmask[None, :, :]
    diag = (jax.lax.broadcasted_iota(jnp.int32, (n_pad, n_pad, 1), 0)
            == jax.lax.broadcasted_iota(jnp.int32, (n_pad, n_pad, 1), 1)
            ).astype(dtype)
    row_idx = jax.lax.broadcasted_iota(jnp.int32, (n_pad, 1), 0)
    nact = jnp.maximum(jnp.sum(rmask, axis=0, keepdims=True), 1.0)
    inf = jnp.asarray(jnp.inf, dtype)

    def mm(Mat, X):
        return jax.lax.dot_general(Mat, X, dn, precision=HIGH,
                                   preferred_element_type=dtype)

    def Gmat(z):
        return rmask * mm(G0, cmask * z)

    def GTmat(yv):
        return cmask * mm(G0T, rmask * yv)

    def Hz(z):
        return jnp.sum(Hp * z[None, :, :], axis=1)

    def factor(M):
        L_ref[...] = M

        def chol_step(j, _):
            d = jnp.sqrt(L_ref[pl.ds(j, 1), pl.ds(j, 1), :])[0, 0, :]
            col_raw = L_ref[:, pl.ds(j, 1), :][:, 0, :]
            below = (row_idx > j).astype(dtype)
            col = col_raw * below / d[None, :]
            dsel = (row_idx == j).astype(dtype)
            L_ref[:, pl.ds(j, 1), :] = (col + dsel * d[None, :])[:, None, :]
            L_ref[...] = L_ref[...] - col[:, None, :] * col[None, :, :]
            return 0

        jax.lax.fori_loop(0, n_pad, chol_step, 0)

    def tril_invert():
        # blocked-doubling explicit L^{-1} (see _pdip_fused_kernel)
        L = L_ref[...]
        dinv = 1.0 / jnp.sum(L * diag, axis=1)
        Xi_ref[...] = dinv[:, None, :] * diag

        def bmm(Am_, Bm):
            return jnp.sum(Am_[:, :, None, :] * Bm[None, :, :, :], axis=1)

        k = 1
        while k < n_pad:
            for o in range(0, n_pad, 2 * k):
                if o + k >= n_pad:
                    continue
                hi = min(o + 2 * k, n_pad)
                kp = hi - (o + k)
                per_col = max(kp * k, kp * kp) * Bt * 4
                chunk = max(1, min(k, (2 * 2 ** 20) // max(1, per_col)))
                L21 = L[o + k:hi, o:o + k, :]
                X22 = Xi_ref[o + k:hi, o + k:hi, :]
                for c0 in range(0, k, chunk):
                    c1 = min(c0 + chunk, k)
                    X11c = Xi_ref[o:o + k, o + c0:o + c1, :]
                    T = bmm(L21, X11c)
                    Xi_ref[o + k:hi, o + c0:o + c1, :] = -bmm(X22, T)
            k *= 2

    def tri_solve(rhs):
        Xi = Xi_ref[...]
        yv = jnp.sum(Xi * rhs[None, :, :], axis=1)
        return jnp.sum(Xi * yv[:, None, :], axis=0)

    def max_step(v, dv):
        ratio = jnp.where(dv < 0, -v / dv, inf)
        return jnp.minimum(1.0, 0.995 * jnp.min(ratio, axis=0,
                                                keepdims=True))

    def step(k, carry):
        x_pl, x_hat_pred, u_prev, z_w, lam_w = carry
        ohk = oh_ref[pl.ds(k, 1), :]
        vcols = jax.lax.dot_general(Vt, ohk, (((1,), (1,)), ((), ())),
                                    precision=HIGH,
                                    preferred_element_type=dtype)
        dv_k = vcols[0:ny]
        bv_k = vcols[ny:ny + nxa]
        bpl_k = vcols[ny + nxa:ny + nxa + nxp]
        sv_k = vcols[ny + nxa + nxp:ny + nxa + nxp + pny]

        y = mm(Cpl, x_pl)
        Y_ref[pl.ds(k, 1)] = y[None]
        y_s = y / sfy
        innov = y_s - mm(Cm, x_hat_pred) - dv_k
        x_hat = x_hat_pred + mm(Mk, innov)

        free = mm(SxF, x_hat) + mm(SstF, u_prev) + sv_k
        r_k = r_ref[pl.ds(k, 1)][0]
        r_t = jnp.broadcast_to(r_k[None], (p, ny, Bt)).reshape(pny, Bt)
        err = q * (r_t - free)
        f = cmask * (-2.0 * mm(ThT, err))     # masked cols exactly 0

        u_t = jnp.broadcast_to(u_prev[None], (4 * m_max, nu, Bt)).reshape(
            4 * m_max * nu, Bt)
        u_t = jnp.concatenate(
            [u_t, jnp.zeros((mcp - 4 * m_max * nu, Bt), dtype)], axis=0)
        h = hbase + su * u_t

        # ---- warm-started masked PDIP (the _pdip_fused_kernel body)
        z = z_w
        lam = jnp.maximum(lam_w, eps_c) * rmask
        s = jnp.maximum(h - Gmat(z), eps_c)

        def body(_, st):
            z, lam, s, bz, blam, bm = st
            r_d = Hz(z) + f + GTmat(lam)
            r_p = Gmat(z) + s - h
            gap = jnp.sum(lam * s, axis=0, keepdims=True)
            mu = gap / nact

            mnew = (jnp.sqrt(jnp.sum(r_d * r_d, axis=0, keepdims=True))
                    + jnp.sqrt(jnp.sum(r_p * r_p, axis=0, keepdims=True))
                    + gap)
            take = mnew < bm
            bz = jnp.where(take, z, bz)
            blam = jnp.where(take, lam, blam)
            bm = jnp.where(take, mnew, bm)

            w = jnp.minimum(lam / s, w_cap) * rmask
            Mw = mm(T2T, w)
            M = Hp + Mw.reshape(n_pad, n_pad, -1) * cc + ridge * diag
            factor(M)
            tril_invert()

            rhs_aff = -r_d + GTmat(lam - w * r_p)
            dz_aff = tri_solve(rhs_aff)
            ds_aff = -(r_p + Gmat(dz_aff))
            dlam_aff = -(lam * s + lam * ds_aff) / s * rmask

            a_aff = jnp.minimum(max_step(s, ds_aff),
                                max_step(lam, dlam_aff))
            mu_aff = jnp.sum((lam + a_aff * dlam_aff)
                             * (s + a_aff * ds_aff),
                             axis=0, keepdims=True) / nact
            sig_r = mu_aff / (mu + 1e-30)
            sigma = sig_r * sig_r * sig_r

            r_cent = (lam * s - sigma * mu + dlam_aff * ds_aff) * rmask
            dz = tri_solve(-r_d + GTmat(r_cent / s - w * r_p))
            ds = -(r_p + Gmat(dz))
            dlam = -(r_cent + lam * ds) / s * rmask

            a = jnp.minimum(max_step(s, ds), max_step(lam, dlam))
            return (z + a * dz, lam + a * dlam, s + a * ds, bz, blam, bm)

        bm0 = jnp.full((1, Bt), jnp.inf, dtype)
        z, lam, s, bz, blam, bm = jax.lax.fori_loop(
            0, iters, body, (z, lam, s, z, lam, bm0))

        r_d = Hz(z) + f + GTmat(lam)
        r_p = Gmat(z) + s - h
        mlast = (jnp.sqrt(jnp.sum(r_d * r_d, axis=0, keepdims=True))
                 + jnp.sqrt(jnp.sum(r_p * r_p, axis=0, keepdims=True))
                 + jnp.sum(lam * s, axis=0, keepdims=True))
        take = mlast < bm
        z_b = jnp.where(take, z, bz)
        lam_b = jnp.where(take, lam, blam)

        du = z_b[0:nu]
        u_s = u_prev + du
        u_out = u_s * sfu
        U_ref[pl.ds(k, 1)] = u_out[None]
        x_hat_pred = mm(Am, x_hat) + mm(Bu, u_s) + bv_k
        x_pl = mm(Apl, x_pl) + mm(Bplu, u_out) + bpl_k
        return (x_pl, x_hat_pred, u_s, z_b, lam_b)

    init = (jnp.zeros((nxp, Bt), dtype), jnp.zeros((nxa, Bt), dtype),
            jnp.zeros((nu, Bt), dtype), jnp.zeros((n_pad, Bt), dtype),
            jnp.ones((mcp, Bt), dtype))
    jax.lax.fori_loop(0, nit, step, init)


def closed_sim_pdip_lanes(tables, lane_consts, Hp_t, r_l, *, nit: int,
                          iters: int, dims, block_lanes: int = 128):
    """Whole-sim fused PDIP closed loop (GAM-stage speed path).

    tables: shared 2-D arrays incl. the (n_pad^2, mcp) T2T constraint
    table; lane_consts: (rows, B) per-lane constants incl. rmask/cmask;
    Hp_t (n_pad, n_pad, B) per-lane Hessians (identity diagonal on
    padded rows); r_l (nit, ny, B) pre-scaled setpoints.  Returns
    (Y (nit, ny, B) raw outputs, U (nit, nu, B))."""
    n_pad, _, B = Hp_t.shape
    dtype = r_l.dtype
    ny, nu, n, mc, m_max = (dims["ny"], dims["nu"], dims["n"], dims["mc"],
                            dims["m_max"])
    Bt = min(block_lanes, B)
    assert B % Bt == 0, (B, Bt)
    ridge = 1e-9 if dtype == jnp.float64 else 1e-6
    w_cap = 1e13 if dtype == jnp.float64 else 1e7

    shared = lambda a: pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim,
                                    memory_space=pltpu.VMEM)
    lane2 = lambda rows: pl.BlockSpec((rows, Bt), lambda i: (0, i),
                                      memory_space=pltpu.VMEM)

    oh = jnp.eye(nit, dtype=dtype)
    t_names = ("Cpl", "Apl", "Bplu", "C", "Mk", "A", "Bu", "SxF", "SstF",
               "ThT", "G0", "G0T", "T2T", "Vt")
    c_names = ("q", "hbase", "su", "rmask", "cmask", "sfy", "sfu")
    in_specs = ([shared(tables[k]) for k in t_names] + [shared(oh)]
                + [pl.BlockSpec((nit, ny, Bt), lambda i: (0, 0, i),
                                memory_space=pltpu.VMEM)]
                + [lane2(lane_consts[k].shape[0]) for k in c_names]
                + [pl.BlockSpec((n_pad, n_pad, Bt), lambda i: (0, 0, i),
                                memory_space=pltpu.VMEM)])
    Y, U = pl.pallas_call(
        functools.partial(_closed_sim_pdip_kernel, nit, iters,
                          float(_WS_EPS_KERNEL), float(ridge),
                          float(w_cap), ny, nu, n, mc, m_max),
        grid=(B // Bt,),
        in_specs=in_specs,
        out_specs=(pl.BlockSpec((nit, ny, Bt), lambda i: (0, 0, i),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((nit, nu, Bt), lambda i: (0, 0, i),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((nit, ny, B), dtype),
                   jax.ShapeDtypeStruct((nit, nu, B), dtype)),
        scratch_shapes=[
            pltpu.VMEM((n_pad, n_pad, Bt), dtype),
            pltpu.VMEM((n_pad, n_pad, Bt), dtype),
        ],
        compiler_params=_fused_params(),
        interpret=_interpret(),
    )(*([tables[k] for k in t_names] + [oh, r_l]
        + [lane_consts[k] for k in c_names] + [Hp_t]))
    return Y, U


# ------------------------------------------------ whole-SIM band kernel
#
# The band-case (with_y) analogue: the entire nit-step Shell7x5-class
# closed loop — Kalman update, f/h assembly incl. the 2*p*ny soft band
# rows whose rhs depends on the step's free response, the stage-0 slack
# LP with transition-aware slack seeding, and the slack-frozen stage-2
# PDIP of the production '+lp20+split12' band engine — in ONE
# pallas_call per lane block.  Algorithm-identical to the
# closed_loop_core band branch (sim/mpc_loop: _seed_slack +
# _eps_split_stage2 around solve_qp_masked_fast); the f32 band row is
# engine-throughput/screening only (band DECISIONS stay on the f64
# lanes path, PARITY.md).  Replaces the per-step toolbox band QP of
# /root/reference/MPC-Tuning/MPC_Tuning/closedloop_toolbox.m:50 at
# Shell7x5.m:155-189 settings.


def _closed_sim_band_kernel(nit: int, lp_iters: int, s2_iters: int,
                            eps_c: float, ridge: float, w_cap: float,
                            m_rel: float, m_abs: float,
                            ny: int, nu: int, n: int, mc: int, m_max: int,
                            # shared tables
                            Cpl_ref, Apl_ref, Bplu_ref, C_ref, Mk_ref,
                            A_ref, Bu_ref, SxF_ref, SstF_ref, ThT_ref,
                            G0_ref, G0T_ref, T2T_ref, Vt_ref, oh_ref,
                            # per-lane constants
                            r_ref, q_ref, hbu_ref, su_ref, hbyh_ref,
                            rmyh_ref, hbyl_ref, rmyl_ref, rmask_ref,
                            cmask_ref, cmask2_ref, lpd_ref, sfy_ref,
                            sfu_ref,
                            # per-lane Hessians
                            Hp_ref,
                            # outputs
                            Y_ref, U_ref,
                            # scratch
                            L_ref, Xi_ref):
    """One Bt-lane block, all `nit` band-control steps in VMEM.

    h rows follow assemble_candidate's block order
    [du_hi | du_lo | u_hi | u_lo | y_hi | y_lo | eps | pad]:
    hbu/su cover the 4*m_max*nu input blocks (h = hbu + su*u_t), the
    band blocks are hb_yhi - rm_yhi*free and hb_ylo + rm_ylo*free
    (hb_* fold the enable masks and ymax/ymin tiles), the eps row is 0
    and padded rows are 1 with rmask 0.  The stage-0 LP runs against
    the diagonal H_lp (lpd lane const) with f_lp = e_slack; stage 2
    re-solves the full Hessian with the slack FROZEN into the band
    rows' rhs (ehat = LP slack + residual violation + margin) and the
    slack column masked (cmask2) — matching _eps_split_stage2's fused
    path op for op (s recomputed from h, best-iterate selection)."""
    dtype = r_ref.dtype
    HIGH = jax.lax.Precision.HIGHEST
    dn = (((1,), (0,)), ((), ()))

    Cpl = Cpl_ref[...]
    Apl = Apl_ref[...]
    Bplu = Bplu_ref[...]
    Cm = C_ref[...]
    Mk = Mk_ref[...]
    Am = A_ref[...]
    Bu = Bu_ref[...]
    SxF = SxF_ref[...]
    SstF = SstF_ref[...]
    ThT = ThT_ref[...]
    G0 = G0_ref[...]
    G0T = G0T_ref[...]
    T2T = T2T_ref[...]
    Vt = Vt_ref[...]
    q = q_ref[...]
    hbu = hbu_ref[...]
    su = su_ref[...]
    hbyh = hbyh_ref[...]
    rmyh = rmyh_ref[...]
    hbyl = hbyl_ref[...]
    rmyl = rmyl_ref[...]
    rmask = rmask_ref[...]
    cmask = cmask_ref[...]
    cmask2 = cmask2_ref[...]
    lpd = lpd_ref[...]
    sfy = sfy_ref[...]
    sfu = sfu_ref[...]
    Hp = Hp_ref[...]

    nxp = Apl.shape[0]
    nxa = Am.shape[0]
    pny = SxF.shape[0]
    p = pny // ny
    n_pad = cmask.shape[0]
    mcp = rmask.shape[0]
    ndu4 = hbu.shape[0]
    Bt = q.shape[1]

    diag = (jax.lax.broadcasted_iota(jnp.int32, (n_pad, n_pad, 1), 0)
            == jax.lax.broadcasted_iota(jnp.int32, (n_pad, n_pad, 1), 1)
            ).astype(dtype)
    row_idx = jax.lax.broadcasted_iota(jnp.int32, (n_pad, 1), 0)
    e_slack = (row_idx == n - 1).astype(dtype)       # (n_pad, 1)
    f_lp = jnp.broadcast_to(e_slack, (n_pad, Bt))
    nact = jnp.maximum(jnp.sum(rmask, axis=0, keepdims=True), 1.0)
    inf = jnp.asarray(jnp.inf, dtype)
    slack_col = G0[:, n - 1:n]                       # (mcp, 1)
    Vcol = jnp.maximum(-slack_col, 0.0)

    def mm(Mat, X):
        return jax.lax.dot_general(Mat, X, dn, precision=HIGH,
                                   preferred_element_type=dtype)

    def Gmat(z, cm):
        return rmask * mm(G0, cm * z)

    def GTmat(yv, cm):
        return cm * mm(G0T, rmask * yv)

    def factor(M):
        L_ref[...] = M

        def chol_step(j, _):
            d = jnp.sqrt(L_ref[pl.ds(j, 1), pl.ds(j, 1), :])[0, 0, :]
            col_raw = L_ref[:, pl.ds(j, 1), :][:, 0, :]
            below = (row_idx > j).astype(dtype)
            col = col_raw * below / d[None, :]
            dsel = (row_idx == j).astype(dtype)
            L_ref[:, pl.ds(j, 1), :] = (col + dsel * d[None, :])[:, None, :]
            L_ref[...] = L_ref[...] - col[:, None, :] * col[None, :, :]
            return 0

        jax.lax.fori_loop(0, n_pad, chol_step, 0)

    def tril_invert():
        L = L_ref[...]
        dinv = 1.0 / jnp.sum(L * diag, axis=1)
        Xi_ref[...] = dinv[:, None, :] * diag

        def bmm(Am_, Bm):
            return jnp.sum(Am_[:, :, None, :] * Bm[None, :, :, :], axis=1)

        k = 1
        while k < n_pad:
            for o in range(0, n_pad, 2 * k):
                if o + k >= n_pad:
                    continue
                hi = min(o + 2 * k, n_pad)
                kp = hi - (o + k)
                per_col = max(kp * k, kp * kp) * Bt * 4
                chunk = max(1, min(k, (2 * 2 ** 20) // max(1, per_col)))
                L21 = L[o + k:hi, o:o + k, :]
                X22 = Xi_ref[o + k:hi, o + k:hi, :]
                for c0 in range(0, k, chunk):
                    c1 = min(c0 + chunk, k)
                    X11c = Xi_ref[o:o + k, o + c0:o + c1, :]
                    T = bmm(L21, X11c)
                    Xi_ref[o + k:hi, o + c0:o + c1, :] = -bmm(X22, T)
            k *= 2

    def tri_solve(rhs):
        Xi = Xi_ref[...]
        yv = jnp.sum(Xi * rhs[None, :, :], axis=1)
        return jnp.sum(Xi * yv[:, None, :], axis=0)

    def max_step(v, dv):
        ratio = jnp.where(dv < 0, -v / dv, inf)
        return jnp.minimum(1.0, 0.995 * jnp.min(ratio, axis=0,
                                                keepdims=True))

    def pdip(Mbase, hz, f, h, cm, z0, lam0, iters):
        """Warm-started masked PDIP (the _pdip_fused_kernel body) with a
        pluggable quadratic term: Mbase (n_pad, n_pad, Bt) value and
        hz(z) matching it."""
        cc = cm[:, None, :] * cm[None, :, :]
        z = z0
        lam = jnp.maximum(lam0, eps_c) * rmask
        s = jnp.maximum(h - Gmat(z, cm), eps_c)

        def body(_, st):
            z, lam, s, bz, blam, bm = st
            r_d = hz(z) + f + GTmat(lam, cm)
            r_p = Gmat(z, cm) + s - h
            gap = jnp.sum(lam * s, axis=0, keepdims=True)
            mu = gap / nact

            mnew = (jnp.sqrt(jnp.sum(r_d * r_d, axis=0, keepdims=True))
                    + jnp.sqrt(jnp.sum(r_p * r_p, axis=0, keepdims=True))
                    + gap)
            take = mnew < bm
            bz = jnp.where(take, z, bz)
            blam = jnp.where(take, lam, blam)
            bm = jnp.where(take, mnew, bm)

            w = jnp.minimum(lam / s, w_cap) * rmask
            Mw = mm(T2T, w)
            M = Mbase + Mw.reshape(n_pad, n_pad, -1) * cc + ridge * diag
            factor(M)
            tril_invert()

            rhs_aff = -r_d + GTmat(lam - w * r_p, cm)
            dz_aff = tri_solve(rhs_aff)
            ds_aff = -(r_p + Gmat(dz_aff, cm))
            dlam_aff = -(lam * s + lam * ds_aff) / s * rmask

            a_aff = jnp.minimum(max_step(s, ds_aff),
                                max_step(lam, dlam_aff))
            mu_aff = jnp.sum((lam + a_aff * dlam_aff)
                             * (s + a_aff * ds_aff),
                             axis=0, keepdims=True) / nact
            sig_r = mu_aff / (mu + 1e-30)
            sigma = sig_r * sig_r * sig_r

            r_cent = (lam * s - sigma * mu + dlam_aff * ds_aff) * rmask
            dz = tri_solve(-r_d + GTmat(r_cent / s - w * r_p, cm))
            ds = -(r_p + Gmat(dz, cm))
            dlam = -(r_cent + lam * ds) / s * rmask

            a = jnp.minimum(max_step(s, ds), max_step(lam, dlam))
            return (z + a * dz, lam + a * dlam, s + a * ds, bz, blam, bm)

        bm0 = jnp.full((1, Bt), jnp.inf, dtype)
        z, lam, s, bz, blam, bm = jax.lax.fori_loop(
            0, iters, body, (z, lam, s, z, lam, bm0))
        r_d = hz(z) + f + GTmat(lam, cm)
        r_p = Gmat(z, cm) + s - h
        mlast = (jnp.sqrt(jnp.sum(r_d * r_d, axis=0, keepdims=True))
                 + jnp.sqrt(jnp.sum(r_p * r_p, axis=0, keepdims=True))
                 + jnp.sum(lam * s, axis=0, keepdims=True))
        take = mlast < bm
        return (jnp.where(take, z, bz), jnp.where(take, lam, blam))

    Mlp = lpd[:, None, :] * diag                      # diagonal H_lp

    def hz_lp(z):
        return lpd * z

    def hz_qp(z):
        return jnp.sum(Hp * z[None, :, :], axis=1)

    def _extra(z, h):
        """max residual soft-row violation per unit of slack (the shared
        core of _seed_slack and _eps_split_stage2)."""
        Gz = Gmat(z, cmask)
        viol = jnp.maximum(Gz - h, 0.0)
        r = jnp.where(Vcol > 1e-12, viol / jnp.maximum(Vcol, 1e-12), 0.0)
        return jnp.max(r, axis=0, keepdims=True)      # (1, Bt)

    def step(k, carry):
        x_pl, x_hat_pred, u_prev, z_w, lam_w = carry
        ohk = oh_ref[pl.ds(k, 1), :]
        vcols = jax.lax.dot_general(Vt, ohk, (((1,), (1,)), ((), ())),
                                    precision=HIGH,
                                    preferred_element_type=dtype)
        dv_k = vcols[0:ny]
        bv_k = vcols[ny:ny + nxa]
        bpl_k = vcols[ny + nxa:ny + nxa + nxp]
        sv_k = vcols[ny + nxa + nxp:ny + nxa + nxp + pny]

        y = mm(Cpl, x_pl)
        Y_ref[pl.ds(k, 1)] = y[None]
        y_s = y / sfy
        innov = y_s - mm(Cm, x_hat_pred) - dv_k
        x_hat = x_hat_pred + mm(Mk, innov)

        free = mm(SxF, x_hat) + mm(SstF, u_prev) + sv_k
        r_k = r_ref[pl.ds(k, 1)][0]
        r_t = jnp.broadcast_to(r_k[None], (p, ny, Bt)).reshape(pny, Bt)
        err = q * (r_t - free)
        f = cmask * (-2.0 * mm(ThT, err))

        u_t = jnp.broadcast_to(u_prev[None], (4 * m_max, nu, Bt)).reshape(
            4 * m_max * nu, Bt)
        h_u = hbu + su * u_t                          # (4*m*nu, Bt)
        h_yh = hbyh - rmyh * free                     # (pny, Bt)
        h_yl = hbyl + rmyl * free
        h = jnp.concatenate(
            [h_u, h_yh, h_yl, jnp.zeros((1, Bt), dtype),
             jnp.ones((mcp - ndu4 - 2 * pny - 1, Bt), dtype)], axis=0)

        # ---- transition-aware slack seeding (_seed_slack)
        extra0 = _extra(z_w, h)
        eps_w = jnp.maximum(jnp.sum(z_w * e_slack, axis=0, keepdims=True),
                            0.0)
        z_new_slack = eps_w + extra0 + 1e-6
        z0 = z_w * (1.0 - e_slack) + e_slack * z_new_slack
        jumped = extra0 > 1e-3 * (1.0 + eps_w)        # (1, Bt)
        lam0 = jnp.where(jumped, jnp.ones_like(lam_w), lam_w)

        # ---- stage 0: slack LP (lp_iters)
        z1, lam1 = pdip(Mlp, hz_lp, f_lp, h, cmask, z0, lam0, lp_iters)

        # ---- stage 2: slack-frozen re-solve (_eps_split_stage2)
        extra1 = _extra(z1, h)
        z1_slack = jnp.maximum(jnp.sum(z1 * e_slack, axis=0,
                                       keepdims=True), 0.0)
        ehat = (z1_slack + extra1) * (1.0 + m_rel) + m_abs
        h2 = h - slack_col * rmask * ehat
        z2, _ = pdip(Hp, hz_qp, f, h2, cmask2,
                     z1 * (1.0 - e_slack), lam1, s2_iters)

        du = z2[0:nu]
        u_s = u_prev + du
        u_out = u_s * sfu
        U_ref[pl.ds(k, 1)] = u_out[None]
        x_hat_pred = mm(Am, x_hat) + mm(Bu, u_s) + bv_k
        x_pl = mm(Apl, x_pl) + mm(Bplu, u_out) + bpl_k
        return (x_pl, x_hat_pred, u_s, z1, lam1)

    init = (jnp.zeros((nxp, Bt), dtype), jnp.zeros((nxa, Bt), dtype),
            jnp.zeros((nu, Bt), dtype), jnp.zeros((n_pad, Bt), dtype),
            jnp.ones((mcp, Bt), dtype))
    jax.lax.fori_loop(0, nit, step, init)


def closed_sim_band_lanes(tables, lane_consts, Hp_t, r_l, *, nit: int,
                          lp_iters: int, s2_iters: int, dims,
                          block_lanes: int = 128):
    """Whole-sim band closed loop ('+lp+split' engine in ONE kernel).

    Same calling convention as closed_sim_pdip_lanes plus the band lane
    constants (hb_yhi/rm_yhi/hb_ylo/rm_ylo/cmask2/lpd)."""
    n_pad, _, B = Hp_t.shape
    dtype = r_l.dtype
    ny, nu, n, mc, m_max = (dims["ny"], dims["nu"], dims["n"], dims["mc"],
                            dims["m_max"])
    Bt = min(block_lanes, B)
    assert B % Bt == 0, (B, Bt)
    ridge = 1e-9 if dtype == jnp.float64 else 1e-6
    w_cap = 1e13 if dtype == jnp.float64 else 1e7

    shared = lambda a: pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim,
                                    memory_space=pltpu.VMEM)
    lane2 = lambda rows: pl.BlockSpec((rows, Bt), lambda i: (0, i),
                                      memory_space=pltpu.VMEM)

    oh = jnp.eye(nit, dtype=dtype)
    t_names = ("Cpl", "Apl", "Bplu", "C", "Mk", "A", "Bu", "SxF", "SstF",
               "ThT", "G0", "G0T", "T2T", "Vt")
    c_names = ("q", "hbu", "su", "hbyh", "rmyh", "hbyl", "rmyl", "rmask",
               "cmask", "cmask2", "lpd", "sfy", "sfu")
    in_specs = ([shared(tables[k]) for k in t_names] + [shared(oh)]
                + [pl.BlockSpec((nit, ny, Bt), lambda i: (0, 0, i),
                                memory_space=pltpu.VMEM)]
                + [lane2(lane_consts[k].shape[0]) for k in c_names]
                + [pl.BlockSpec((n_pad, n_pad, Bt), lambda i: (0, 0, i),
                                memory_space=pltpu.VMEM)])
    Y, U = pl.pallas_call(
        functools.partial(_closed_sim_band_kernel, nit, lp_iters, s2_iters,
                          float(_WS_EPS_KERNEL), float(ridge),
                          float(w_cap),
                          1e-9 if dtype == jnp.float64 else 1e-6,
                          1e-11 if dtype == jnp.float64 else 1e-8,
                          ny, nu, n, mc, m_max),
        grid=(B // Bt,),
        in_specs=in_specs,
        out_specs=(pl.BlockSpec((nit, ny, Bt), lambda i: (0, 0, i),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((nit, nu, Bt), lambda i: (0, 0, i),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((nit, ny, B), dtype),
                   jax.ShapeDtypeStruct((nit, nu, B), dtype)),
        scratch_shapes=[
            pltpu.VMEM((n_pad, n_pad, Bt), dtype),
            pltpu.VMEM((n_pad, n_pad, Bt), dtype),
        ],
        compiler_params=_fused_params(),
        interpret=_interpret(),
    )(*([tables[k] for k in t_names] + [oh, r_l]
        + [lane_consts[k] for k in c_names] + [Hp_t]))
    return Y, U
