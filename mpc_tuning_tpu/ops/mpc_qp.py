"""Condensed linear MPC QP — the TPU-native equivalent of the MATLAB MPC
Toolbox controller the reference drives through ``sim``/``mpcmove``
(/root/reference/MPC-Tuning/MPC_Tuning/closedloop_toolbox.m:36-50).

Implements the documented MATLAB formulation:
  cost      J = sum_i |Q^(1/2) (r - y(k+i|k))|^2            i = 1..p
              + sum_t |R^(1/2) du(k+t)|^2                   t = 0..m-1
              + rho_eps * eps^2
  s.t.      dumin <= du <= dumax                 (hard)
            umin  <= u(k+t) <= umax              (hard)
            ymin - eps*Vmin <= y <= ymax + eps*Vmax   (soft, ECR)
            eps >= 0
  with Q_j = (w_OV_j)^2, R_j = (w_dMV_j)^2 in ScaleFactor units, reference
  and measured disturbance held constant over the horizon (look-ahead off,
  closedloop_toolbox caller semantics), and moves blocked to zero after the
  control horizon.

Batching design: everything is built at MAX horizons (p_max, m_max) decided
by the tuner's bit widths (2^nbp-1, 2^nbc-1, MPCTuning.m:270-289); a
candidate (N, Nu, delta, lambda) enters purely through masks and diagonal
weights, so one compiled program evaluates an entire VNS neighborhood /
GAM population via vmap.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax.numpy as jnp

from mpc_tuning_tpu.models.lti import DiscreteSS
from mpc_tuning_tpu.ops.observer import AugmentedModel, augment_with_output_disturbance

__all__ = ["MPCSpec", "MPCController", "build_controller", "assemble_candidate", "qp_step_data"]


@dataclasses.dataclass
class MPCSpec:
    """Case-static MPC definition, in (conditioned) model units.

    Mirrors the mpc-object configuration of the reference drivers
    (WoodBerry.m:118-148, Shell7x5.m:100-189): bounds, ECR softening,
    ScaleFactors, max horizons.
    """

    model: DiscreteSS  # conditioned prediction model, inputs [MV, MD]
    n_mv: int
    n_md: int
    p_max: int
    m_max: int
    umin: np.ndarray
    umax: np.ndarray
    dumin: np.ndarray
    dumax: np.ndarray
    ymin: np.ndarray  # +-inf where unconstrained
    ymax: np.ndarray
    v_ymin: np.ndarray | None = None  # MinECR per output (default 1)
    v_ymax: np.ndarray | None = None
    rho_eps: float = 1e5
    sf_u: np.ndarray | None = None  # MV ScaleFactors
    sf_y: np.ndarray | None = None  # OV ScaleFactors
    sf_v: np.ndarray | None = None  # MD ScaleFactors

    def __post_init__(self):
        ny = self.model.ny
        nu = self.n_mv
        nd = self.n_md
        if self.v_ymin is None:
            self.v_ymin = np.ones(ny)
        if self.v_ymax is None:
            self.v_ymax = np.ones(ny)
        if self.sf_u is None:
            self.sf_u = np.ones(nu)
        if self.sf_y is None:
            self.sf_y = np.ones(ny)
        if self.sf_v is None:
            self.sf_v = np.ones(nd)

    @property
    def has_y_constraints(self) -> bool:
        return bool(np.any(np.isfinite(self.ymin)) or np.any(np.isfinite(self.ymax)))


@dataclasses.dataclass
class MPCController:
    """Host-precomputed controller data (numpy float64).  The jax loops
    convert to device arrays once per case."""

    spec: MPCSpec
    aug: AugmentedModel
    # scaled-unit augmented model
    A: np.ndarray
    Bu: np.ndarray
    Bv: np.ndarray
    C: np.ndarray
    Dv: np.ndarray
    M: np.ndarray
    # prediction tensors at max horizons (scaled units)
    Sx: np.ndarray  # (p_max, ny, nxa)
    Sstep: np.ndarray  # (p_max+1, ny, nu): sum_{j<q} C A^j Bu
    Sv: np.ndarray  # (p_max, ny, nd)
    Theta: np.ndarray  # (p_max*ny, m_max*nu) Toeplitz of Sstep
    Tcum: np.ndarray  # (m_max*nu, m_max*nu) cumulative-sum map du -> u-u_prev
    # scaled bounds
    umin_s: np.ndarray
    umax_s: np.ndarray
    dumin_s: np.ndarray
    dumax_s: np.ndarray
    ymin_s: np.ndarray
    ymax_s: np.ndarray


def build_controller(spec: MPCSpec, q_plant: float = 0.0) -> MPCController:
    ss = spec.model
    nu, nd, ny = spec.n_mv, spec.n_md, ss.ny
    Bu_r, Bv_r = ss.B[:, :nu], ss.B[:, nu:]
    Dv_r = ss.D[:, nu:]
    if np.any(np.abs(ss.D[:, :nu]) > 0):
        raise ValueError("direct MV feedthrough unsupported (plants are strictly proper)")

    # ScaleFactor units: u = sf_u*u_s, y = sf_y*y_s, v = sf_v*v_s
    Bu = Bu_r * spec.sf_u[None, :]
    Bv = Bv_r * spec.sf_v[None, :] if nd else Bv_r
    C = ss.C / spec.sf_y[:, None]
    Dv = (Dv_r * spec.sf_v[None, :]) / spec.sf_y[:, None] if nd else Dv_r

    aug = augment_with_output_disturbance(ss.A, Bu, Bv, C, Dv, q_plant=q_plant)

    p_max, m_max = spec.p_max, spec.m_max
    nxa = aug.nx
    Sx = np.zeros((p_max, ny, nxa))
    Sstep = np.zeros((p_max + 1, ny, nu))
    Sv = np.zeros((p_max, ny, nd))
    Ai = np.eye(nxa)
    acc_u = np.zeros((ny, nu))
    acc_v = np.zeros((ny, nd))
    for i in range(1, p_max + 1):
        acc_u = acc_u + aug.C @ Ai @ aug.Bu
        acc_v = acc_v + aug.C @ Ai @ aug.Bv
        Ai = aug.A @ Ai  # A^i
        Sx[i - 1] = aug.C @ Ai
        Sstep[i] = acc_u
        Sv[i - 1] = acc_v + aug.Dv

    Theta = np.zeros((p_max, ny, m_max, nu))
    for i in range(1, p_max + 1):
        for t in range(min(i, m_max)):
            Theta[i - 1, :, t, :] = Sstep[i - t]
    Theta = Theta.reshape(p_max * ny, m_max * nu)

    # cumulative map: (u(k+t) - u(k-1))_j = sum_{tau<=t} du_j(tau)
    Tc = np.kron(np.tril(np.ones((m_max, m_max))), np.eye(nu))

    return MPCController(
        spec=spec, aug=aug,
        A=aug.A, Bu=aug.Bu, Bv=aug.Bv, C=aug.C, Dv=aug.Dv, M=aug.M,
        Sx=Sx, Sstep=Sstep, Sv=Sv, Theta=Theta, Tcum=Tc,
        umin_s=spec.umin / spec.sf_u, umax_s=spec.umax / spec.sf_u,
        dumin_s=spec.dumin / spec.sf_u, dumax_s=spec.dumax / spec.sf_u,
        ymin_s=spec.ymin / spec.sf_y, ymax_s=spec.ymax / spec.sf_y,
    )


def controller_arrays(ctl: MPCController, dtype=jnp.float64) -> dict:
    """Device-ready constant dict."""
    spec = ctl.spec
    def fin(x, alt=0.0):
        m = np.isfinite(x) & (np.abs(x) < 1e20)
        return np.where(m, x, alt), m.astype(np.float64)

    umin_f, en_u_lo = fin(ctl.umin_s)
    umax_f, en_u_hi = fin(ctl.umax_s)
    dumin_f, en_du_lo = fin(ctl.dumin_s)
    dumax_f, en_du_hi = fin(ctl.dumax_s)
    ymin_f, en_y_lo = fin(ctl.ymin_s)
    ymax_f, en_y_hi = fin(ctl.ymax_s)
    out = {
        "A": ctl.A, "Bu": ctl.Bu, "Bv": ctl.Bv, "C": ctl.C, "Dv": ctl.Dv,
        "M": ctl.M, "Sx": ctl.Sx, "Sstep": ctl.Sstep, "Sv": ctl.Sv,
        "Theta": ctl.Theta, "Tcum": ctl.Tcum,
        "umin": umin_f, "umax": umax_f,
        "dumin": dumin_f, "dumax": dumax_f,
        "ymin": ymin_f, "ymax": ymax_f,
        # finite-bound row enables: +-inf bounds become disabled QP rows so
        # no huge h values reach the interior-point arithmetic (f32-safe)
        "en_u_lo": en_u_lo, "en_u_hi": en_u_hi,
        "en_du_lo": en_du_lo, "en_du_hi": en_du_hi,
        "en_y_lo": en_y_lo, "en_y_hi": en_y_hi,
        "vymin": spec.v_ymin, "vymax": spec.v_ymax,
        "sf_u": spec.sf_u, "sf_y": spec.sf_y,
        "sf_v": spec.sf_v if spec.n_md else np.zeros(0),
    }

    # shared constraint matrix G0 (candidate masks applied as row/variable
    # 0/1 vectors at solve time — ops/qp.solve_qp_masked) and its row outer
    # products T2[k] = vec(G0[k] G0[k]^T), the one-matmul normal-matrix form
    p_max, m_max, nu = spec.p_max, spec.m_max, spec.n_mv
    n = m_max * nu + 1
    I_du = np.eye(m_max * nu)
    Tc = ctl.Tcum
    zero_col = np.zeros((m_max * nu, 1))
    ones_m = np.ones(m_max)
    blocks = [
        np.hstack([I_du, zero_col]) * np.kron(ones_m, en_du_hi)[:, None],
        np.hstack([-I_du, zero_col]) * np.kron(ones_m, en_du_lo)[:, None],
        np.hstack([Tc, zero_col]) * np.kron(ones_m, en_u_hi)[:, None],
        np.hstack([-Tc, zero_col]) * np.kron(ones_m, en_u_lo)[:, None],
    ]
    if spec.has_y_constraints:
        vmax_col = np.tile(spec.v_ymax, p_max).reshape(-1, 1)
        vmin_col = np.tile(spec.v_ymin, p_max).reshape(-1, 1)
        blocks.append(np.hstack([ctl.Theta, -vmax_col]) * np.tile(en_y_hi, p_max)[:, None])
        blocks.append(np.hstack([-ctl.Theta, -vmin_col]) * np.tile(en_y_lo, p_max)[:, None])
    eps_row = np.zeros((1, n))
    eps_row[0, -1] = -1.0
    blocks.append(eps_row)
    G0 = np.vstack(blocks)
    out["G0"] = G0
    out["T2"] = np.einsum("ki,kj->kij", G0, G0).reshape(G0.shape[0], n * n)

    return {k: jnp.asarray(v, dtype=dtype) for k, v in out.items()}


def assemble_candidate(c: dict, N, Nu, delta, lam, p_max: int, m_max: int,
                       ny: int, nu: int, rho_eps: float, with_y: bool):
    """Per-candidate QP data (jax; vmap over candidates).

    N, Nu: scalar int arrays (shared horizon maxima, as the reference applies
    max(N)/max(Nu) to the toolbox object, closedloop_toolbox.m:39-43).
    delta (ny,), lam (nu,): OV / MVRate weights.
    Returns dict with H (n,n), G (mc,n), QTheta (p_max*ny, m_max*nu), masks.
    """
    dtype = c["Theta"].dtype
    i_idx = jnp.arange(1, p_max + 1)
    t_idx = jnp.arange(m_max)
    row_mask = (i_idx <= N).astype(dtype)  # (p_max,)
    col_mask = (t_idx < Nu).astype(dtype)  # (m_max,)

    q_diag = (jnp.tile(delta, (p_max, 1)) ** 2) * row_mask[:, None]  # (p_max, ny)
    q_flat = q_diag.reshape(-1)
    r_flat = ((jnp.tile(lam, (m_max, 1)) ** 2) * col_mask[:, None]).reshape(-1)
    cmask_flat = jnp.repeat(col_mask, nu)

    Theta = c["Theta"] * cmask_flat[None, :]
    QTheta = Theta * q_flat[:, None]
    Hdu = 2.0 * (Theta.T @ QTheta + jnp.diag(r_flat + (1.0 - cmask_flat)))

    n = m_max * nu + 1
    H = jnp.zeros((n, n), dtype)
    H = H.at[:-1, :-1].set(Hdu)
    H = H.at[-1, -1].set(2.0 * rho_eps)

    # constraint matrix; rows for +-inf bounds are disabled via en_* masks
    ones_m = jnp.ones(m_max, dtype)
    en_du_hi = cmask_flat * jnp.kron(ones_m, c["en_du_hi"])
    en_du_lo = cmask_flat * jnp.kron(ones_m, c["en_du_lo"])
    en_u_hi = cmask_flat * jnp.kron(ones_m, c["en_u_hi"])
    en_u_lo = cmask_flat * jnp.kron(ones_m, c["en_u_lo"])
    I_du = jnp.eye(m_max * nu, dtype=dtype)
    Tcum = c["Tcum"] * cmask_flat[None, :]
    zero_col = jnp.zeros((m_max * nu, 1), dtype)
    blocks = [
        jnp.hstack([I_du, zero_col]) * en_du_hi[:, None],   # du <= dumax
        jnp.hstack([-I_du, zero_col]) * en_du_lo[:, None],  # -du <= -dumin
        jnp.hstack([Tcum, zero_col]) * en_u_hi[:, None],    # u <= umax
        jnp.hstack([-Tcum, zero_col]) * en_u_lo[:, None],   # -u <= -umin
    ]
    if with_y:
        vmax_col = jnp.tile(c["vymax"], (p_max,)).reshape(-1, 1)
        vmin_col = jnp.tile(c["vymin"], (p_max,)).reshape(-1, 1)
        en_y_hi = (jnp.repeat(row_mask, ny) * jnp.tile(c["en_y_hi"], (p_max,)))[:, None]
        en_y_lo = (jnp.repeat(row_mask, ny) * jnp.tile(c["en_y_lo"], (p_max,)))[:, None]
        blocks.append(jnp.hstack([Theta, -vmax_col]) * en_y_hi)
        blocks.append(jnp.hstack([-Theta, -vmin_col]) * en_y_lo)
    eps_row = jnp.zeros((1, n), dtype).at[0, -1].set(-1.0)
    blocks.append(eps_row)  # -eps <= 0
    G = jnp.vstack(blocks)

    # masks for the shared-G0 structured solver (ops/qp.solve_qp_masked):
    # G == diag(rmask) @ c["G0"] @ diag(cmask_z) exactly (the column masking
    # of the Tcum blocks is redundant on rows rmask keeps: an active row t
    # only reaches columns tau <= t, all active)
    rparts = [cmask_flat] * 4
    if with_y:
        rparts += [jnp.repeat(row_mask, ny)] * 2
    rparts.append(jnp.ones(1, dtype))
    rmask = jnp.concatenate(rparts)
    cmask_z = jnp.concatenate([cmask_flat, jnp.ones(1, dtype)])

    from mpc_tuning_tpu.ops.qp import admm_precompute

    admm = admm_precompute(H, G, cmask=cmask_z)

    # Stage-0 slack LP of the eps-split band solve (sim/mpc_loop
    # parse_qp_method, '+lp' suffix): minimize eps + (sigma/2)||du||^2
    # over the SAME constraint set.  Band cases run all OV weights at 0
    # (GAM_fun.m:58-72 forces delta=0 there), so the true QP objective is
    # lam^2-scale move suppression + rho_eps*eps^2 with rho_eps >= 1e4
    # (Shell7x5.m:189) — its optimal slack equals this LP's minimum to
    # O(lam^2/rho_eps) relative, while the LP itself has NO rho/lambda
    # scale spread (the ~1e10 spread is what stalls every joint interior
    # point on degenerate band steps, PARITY.md round-4 notes).
    # sigma biases the LP's eps by ~sigma*||du||^2/2 per unit slack-cost —
    # keep it at the precision's noise floor (measured: 1e-4 leaves a
    # ~1.5e-5 du bias vs the GI-certified optimum; 1e-6 clears the 1e-6
    # oracle gate at f64)
    sigma_lp = jnp.asarray(1e-6 if dtype == jnp.float64 else 1e-4, dtype)
    lp_diag = jnp.concatenate([
        2.0 * (sigma_lp * cmask_flat + (1.0 - cmask_flat)),
        2.0 * sigma_lp[None],
    ])
    H_lp = jnp.diag(lp_diag)
    f_lp = jnp.zeros(n, dtype).at[-1].set(1.0)

    return {
        "admm": admm, "H_lp": H_lp, "f_lp": f_lp,
        "H": H, "G": G, "Theta": Theta, "QTheta": QTheta,
        "row_mask": row_mask, "col_mask": col_mask,
        "cmask_flat": cmask_flat, "rmask": rmask, "cmask_z": cmask_z,
        "en_du_hi": en_du_hi, "en_du_lo": en_du_lo,
        "en_u_hi": en_u_hi, "en_u_lo": en_u_lo,
    }


def qp_step_data(c: dict, cand: dict, x_hat, u_prev, r_s, v_s,
                 p_max: int, m_max: int, ny: int, nu: int, with_y: bool):
    """Per-timestep QP linear term f and rhs h (jax).

    free response: y(k+i|k) with du=0 = Sx[i] x_hat + Sstep[i] u_prev + Sv[i] v.
    """
    dtype = x_hat.dtype
    free = (
        jnp.einsum("pij,j->pi", c["Sx"], x_hat)
        + jnp.einsum("pij,j->pi", c["Sstep"][1:], u_prev)
        + (jnp.einsum("pij,j->pi", c["Sv"], v_s) if v_s.shape[0] else 0.0)
    )  # (p_max, ny)
    e = (r_s[None, :] - free).reshape(-1)
    f_du = -2.0 * (cand["QTheta"].T @ e)
    f = jnp.concatenate([f_du, jnp.zeros(1, dtype)])

    ones_m = jnp.ones(m_max, dtype)
    h_list = [
        jnp.kron(ones_m, c["dumax"]) * cand["en_du_hi"] + (1.0 - cand["en_du_hi"]),
        -jnp.kron(ones_m, c["dumin"]) * cand["en_du_lo"] + (1.0 - cand["en_du_lo"]),
        jnp.kron(ones_m, c["umax"] - u_prev) * cand["en_u_hi"] + (1.0 - cand["en_u_hi"]),
        jnp.kron(ones_m, u_prev - c["umin"]) * cand["en_u_lo"] + (1.0 - cand["en_u_lo"]),
    ]
    if with_y:
        rmask_hi = jnp.repeat(cand["row_mask"], ny) * jnp.tile(c["en_y_hi"], (p_max,))
        rmask_lo = jnp.repeat(cand["row_mask"], ny) * jnp.tile(c["en_y_lo"], (p_max,))
        free_flat = free.reshape(-1)
        ymax_flat = jnp.tile(c["ymax"], (p_max,))
        ymin_flat = jnp.tile(c["ymin"], (p_max,))
        h_list.append((ymax_flat - free_flat) * rmask_hi + (1.0 - rmask_hi))
        h_list.append((free_flat - ymin_flat) * rmask_lo + (1.0 - rmask_lo))
    h_list.append(jnp.zeros(1, dtype))
    h = jnp.concatenate(h_list)
    return f, h, free
