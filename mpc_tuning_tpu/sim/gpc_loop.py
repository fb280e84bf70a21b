"""MIMO DTC-GPC closed loop.

TPU-native equivalent of the online loop of
/root/reference/DTC-GPC/DTC_GPC_WW.m:127-164 with the optimal predictor of
OptimalPredictor2.m:26-40:

  measure -> conditioned output -> optimal predictor (fast model + filtered
  model error) -> free response (past controls + past predictor outputs) ->
  unconstrained first-move gain -> integrate control -> advance plant.

Two implementations:
 * ``DTCGPC.simulate_ref``   — literal host replica (NumPy, O(nit^2) like the
   reference's full-history lsim replay) used as a cross-check oracle;
 * ``DTCGPC.simulate_scan``  — `lax.scan` engine, O(nit), pure and
   shape-static, jit/vmap-able (the production path).
"""

from __future__ import annotations

import dataclasses
import warnings
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from mpc_tuning_tpu.models.lti import DiscreteSS, DiscreteTF, TransferFunction
from mpc_tuning_tpu.models.simulate import dlsim
from mpc_tuning_tpu.ops.filters import FilterBank, mimo_filter, predictor_diagnostics
from mpc_tuning_tpu.ops.gpc import GPCMatrices, build_gpc

__all__ = ["DTCGPC"]


def _block_shift_inject(duM: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Matrices implementing the past-control register update
    up <- Shift@up + Inj@dU  (DTC_GPC_WW.m:151-155: newest increment at the
    head of each input's block)."""
    total = int(np.sum(duM))
    nu = len(duM)
    Shift = np.zeros((total, total))
    Inj = np.zeros((total, nu))
    off = 0
    for j, w in enumerate(np.asarray(duM, dtype=np.int64)):
        w = int(w)
        for m in range(1, w):
            Shift[off + m, off + m - 1] = 1.0
        Inj[off, j] = 1.0
        off += w
    return Shift, Inj


def _ref_selector(N: np.ndarray) -> np.ndarray:
    """(sum N, ny) matrix repeating the current reference over each output's
    prediction window (DTC_GPC_WW.m:142-145)."""
    ny = len(N)
    E = np.zeros((int(np.sum(N)), ny))
    off = 0
    for i, n in enumerate(np.asarray(N, dtype=np.int64)):
        E[off : off + int(n), i] = 1.0
        off += int(n)
    return E


def _pad_S(S: np.ndarray, na: np.ndarray, width: int) -> np.ndarray:
    """Pad the per-output F-blocks of S to a uniform (na_max+1) column width
    so Yd can be a dense (ny, width) rolling buffer."""
    ny = len(na)
    rows = S.shape[0]
    out = np.zeros((rows, ny * width))
    c_in = 0
    for i in range(ny):
        w = int(na[i]) + 1
        out[:, i * width : i * width + w] = S[:, c_in : c_in + w]
        c_in += w
    return out


@dataclasses.dataclass
class DTCGPC:
    """Offline-assembled DTC-GPC controller + closed-loop simulators."""

    plant_ss: DiscreteSS  # real plant [P D] (unconditioned)
    model_ss: DiscreteSS  # conditioned nominal model Pnz (driven by ue)
    fast_ss: DiscreteSS  # conditioned fast model Gnz (delays - dmin)
    fr: FilterBank
    mats: GPCMatrices
    L: np.ndarray
    R: np.ndarray
    n_mv: int
    n_md: int
    Shift: np.ndarray
    Inj: np.ndarray
    Eref: np.ndarray
    S_pad: np.ndarray
    yd_width: int

    @staticmethod
    def build(
        plant: TransferFunction,
        model: TransferFunction,
        Ts: float,
        p: np.ndarray,
        m: np.ndarray,
        delta: np.ndarray,
        lam: np.ndarray,
        L: np.ndarray,
        R: np.ndarray,
        n_md: int = 0,
        disturbance: TransferFunction | None = None,
        alfa: float = 0.7,
        raio: float = 0.8,
    ) -> "DTCGPC":
        """Offline section of DTC_GPC_WW.m:34-108 for a general MIMO plant."""
        ny, nu = model.shape
        Pne = model.scaled(L, R)  # conditioned nominal model
        Pnz = Pne.c2d(Ts)
        Gnz = Pnz.fast_model()

        full = plant if disturbance is None else plant.hcat(disturbance)
        plant_ss = full.c2d(Ts).to_ss()

        mats = build_gpc(Pnz, p, m, delta, lam, use_dtc=True)
        filters, _ = mimo_filter(Pnz, alfa, raio)
        fr = FilterBank.from_filters(filters)

        # predictor validation at build time (mimofilter.m:48-64): Fr DC
        # gain = I and S = G_fast - Fr*Pd stable; warn like the reference's
        # validation prints — an unstable predictor corrupts every DTC run
        diag = predictor_diagnostics(filters, fr, Gnz.to_ss(), Pnz.to_ss())
        if not diag["dc_ok"]:
            warnings.warn(
                f"Fr(z) static gain wrong (dcgain={diag['dc']}) — predictor "
                "will not be offset-free", stacklevel=2)
        if not diag["stable"]:
            warnings.warn(
                f"predictor S(z) unstable (spectral radius {diag['rho']:.4f}"
                " >= 1)", stacklevel=2)

        Shift, Inj = _block_shift_inject(mats.duM)
        Eref = _ref_selector(mats.N)
        yd_width = int(np.max(mats.na)) + 1
        S_pad = _pad_S(mats.S, mats.na, yd_width)

        return DTCGPC(
            plant_ss=plant_ss,
            model_ss=Pnz.to_ss(),
            fast_ss=Gnz.to_ss(),
            fr=fr,
            mats=mats,
            L=np.asarray(L, dtype=np.float64),
            R=np.asarray(R, dtype=np.float64),
            n_mv=nu,
            n_md=n_md,
            Shift=Shift,
            Inj=Inj,
            Eref=Eref,
            S_pad=S_pad,
            yd_width=yd_width,
        )

    # ------------------------------------------------------------------
    # host oracle (literal structure of the reference loop)
    # ------------------------------------------------------------------
    def simulate_ref(self, r: np.ndarray, q: np.ndarray, nit: int, k0: int = 3):
        """O(nit^2) replica: full-history replay each step like
        DTC_GPC_WW.m:128-164 (loop starts at k=4, i.e. index 3)."""
        ny, nu = self.L.shape[0], self.n_mv
        u = np.zeros((nit, nu))
        ue = np.zeros((nit, nu))
        y = np.zeros((nit, ny))
        up = np.zeros(int(np.sum(self.mats.duM)))
        na_w = self.yd_width

        fr_ss = DiscreteSS(self.fr.A, self.fr.B, self.fr.C, self.fr.D, self.plant_ss.Ts)
        for k in range(k0, nit):
            # plant replay: dlsim computes Y[t] before applying U[t], so a
            # (k+1)-row history (whose last input row is still zero/unused)
            # yields the time-k measurement
            U_hist = np.hstack([u[: k + 1, :], q[: k + 1, :]])
            y_hist = dlsim(self.plant_ss, U_hist)
            y[k] = y_hist[k]
            ye_hist = (self.L @ y_hist.T).T

            # optimal predictor by replay (OptimalPredictor2.m:26-40)
            ypz = dlsim(self.model_ss, ue[: k + 1, :])
            ygz = dlsim(self.fast_ss, ue[: k + 1, :])
            eM = ye_hist - ypz
            yfr = dlsim(fr_ss, eM)
            yp_hist = ygz + yfr  # rows 0..k

            # free response from past predictor outputs
            Yd = np.zeros(ny * na_w)
            for i in range(ny):
                for mlag in range(na_w):
                    idx = k - mlag
                    Yd[i * na_w + mlag] = yp_hist[idx, i] if idx >= 0 else 0.0
            re = self.L @ r[k]
            yf = self.mats.Hp @ up + self.S_pad @ Yd
            dU = self.mats.Km @ (self.Eref @ re - yf)

            up = self.Shift @ up + self.Inj @ dU
            ue[k] = ue[k - 1] + dU
            u[k] = self.R @ ue[k]
        return y, u

    # ------------------------------------------------------------------
    # production scan engine
    # ------------------------------------------------------------------
    def scan_constants(self, dtype=jnp.float64):
        c = {
            "A_pl": self.plant_ss.A, "B_pl": self.plant_ss.B,
            "C_pl": self.plant_ss.C, "D_pl": self.plant_ss.D,
            "A_m": self.model_ss.A, "B_m": self.model_ss.B, "C_m": self.model_ss.C,
            "A_g": self.fast_ss.A, "B_g": self.fast_ss.B, "C_g": self.fast_ss.C,
            "A_f": self.fr.A, "B_f": self.fr.B, "C_f": self.fr.C, "D_f": self.fr.D,
            "Hp": self.mats.Hp, "S": self.S_pad, "Km": self.mats.Km,
            "Shift": self.Shift, "Inj": self.Inj, "Eref": self.Eref,
            "L": self.L, "R": self.R,
        }
        return {k: jnp.asarray(v, dtype=dtype) for k, v in c.items()}

    def simulate_scan(self, r: np.ndarray, q: np.ndarray, nit: int, dtype=jnp.float64):
        """O(nit) recursive loop; same trajectory as ``simulate_ref``."""
        c = self.scan_constants(dtype)
        rj = jnp.asarray(r[:nit], dtype=dtype)
        qj = jnp.asarray(q[:nit], dtype=dtype)
        y, u = _scan_impl(c, rj, qj, self.yd_width, int(np.sum(self.mats.duM)),
                          self.n_mv, self.L.shape[0])
        return np.asarray(y), np.asarray(u)

    def simulate_scan_batch(self, r_b: np.ndarray, q_b: np.ndarray, nit: int,
                            dtype=jnp.float64):
        """Batched scan: one lane per (setpoint, disturbance) scenario —
        the production scenario-sweep / on-chip benchmark path.  r_b
        (B, nit, ny), q_b (B, nit, nq).  Returns device arrays (B, nit, *)."""
        c = self.scan_constants(dtype)
        rj = jnp.asarray(r_b[:, :nit], dtype=dtype)
        qj = jnp.asarray(q_b[:, :nit], dtype=dtype)
        return _scan_batch(c, rj, qj, self.yd_width,
                           int(np.sum(self.mats.duM)), self.n_mv,
                           self.L.shape[0])


def _scan_batch_impl(c, r, q, yd_width, up_len, nu, ny):
    return jax.vmap(
        lambda rb, qb: _scan_core(c, rb, qb, yd_width, up_len, nu, ny)
    )(r, q)


_scan_batch = partial(jax.jit, static_argnums=(3, 4, 5, 6))(_scan_batch_impl)


@partial(jax.jit, static_argnums=(3, 4, 5, 6))
def _scan_impl(c, r, q, yd_width, up_len, nu, ny):
    return _scan_core(c, r, q, yd_width, up_len, nu, ny)


def _scan_core(c, r, q, yd_width, up_len, nu, ny):
    dtype = r.dtype
    nx_pl = c["A_pl"].shape[0]
    nx_m = c["A_m"].shape[0]
    nx_g = c["A_g"].shape[0]
    nx_f = c["A_f"].shape[0]

    init = (
        jnp.zeros(nx_pl, dtype),  # plant state
        jnp.zeros(nx_m, dtype),  # model state
        jnp.zeros(nx_g, dtype),  # fast-model state
        jnp.zeros(nx_f, dtype),  # Fr filter state
        jnp.zeros(up_len, dtype),  # past-control register
        jnp.zeros(nu, dtype),  # integrated conditioned control ue
        jnp.zeros((ny, yd_width), dtype),  # predictor output history
    )

    def step(state, inp):
        x_pl, x_m, x_g, x_f, up, ue, ydb = state
        rk, qk = inp
        y = c["C_pl"] @ x_pl  # strictly proper plants: D ignored at measure
        ye = c["L"] @ y
        eM = ye - c["C_m"] @ x_m
        yfr = c["C_f"] @ x_f + c["D_f"] @ eM
        yp = c["C_g"] @ x_g + yfr

        ydb = jnp.concatenate([yp[:, None], ydb[:, :-1]], axis=1)
        Yd = ydb.reshape(-1)
        yf = c["Hp"] @ up + c["S"] @ Yd
        ref = c["Eref"] @ (c["L"] @ rk)
        dU = c["Km"] @ (ref - yf)

        up = c["Shift"] @ up + c["Inj"] @ dU
        ue = ue + dU
        u = c["R"] @ ue

        x_pl = c["A_pl"] @ x_pl + c["B_pl"] @ jnp.concatenate([u, qk])
        x_m = c["A_m"] @ x_m + c["B_m"] @ ue
        x_g = c["A_g"] @ x_g + c["B_g"] @ ue
        x_f = c["A_f"] @ x_f + c["B_f"] @ eM
        return (x_pl, x_m, x_g, x_f, up, ue, ydb), (y, u)

    _, (Y, U) = jax.lax.scan(step, init, (r, q))
    return Y, U
