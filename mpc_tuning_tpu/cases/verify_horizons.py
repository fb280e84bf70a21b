"""Open-loop vs closed-loop horizon-sanity verification.

The reference's built-in physical check (WoodBerry.m:186-232, commentary at
:186-202; same protocol in Shell3x3.m:195-241): solve the MPC once at rest
toward a unit setpoint, play out the whole optimal sequence, and compare
with the receding-horizon closed loop — if the horizons are well chosen the
two nearly coincide.  Square systems run the per-output selector protocol;
non-square/band systems run the reference's pulse protocol
(Shell7x5.m:242-261: unit setpoint pulse on the first 5 samples, measured
disturbances held constant, one sim).

Returns per-output data + a mismatch score usable as a regression signal.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from mpc_tuning_tpu.sim.mpc_loop import MPCLoop, parse_qp_method

__all__ = ["verify_horizons", "HorizonCheck"]


@dataclasses.dataclass
class HorizonCheck:
    y_closed: np.ndarray  # (ny, nit) closed loop, output i under selector i
    y_open: np.ndarray  # (ny, nit) single-shot playback
    u_closed: np.ndarray
    u_open: np.ndarray
    mismatch: np.ndarray  # (ny,) normalized L2 mismatch per output

    @property
    def ok(self) -> bool:
        return bool(np.all(self.mismatch < 0.2))

    def as_json(self) -> dict:
        return {"mismatch": [round(float(x), 4) for x in self.mismatch],
                "ok": self.ok}


def verify_horizons(loop: MPCLoop, L: np.ndarray, N: int, Nu: int,
                    delta, lam, nit: int | None = None,
                    dtype=None, v_const: np.ndarray | None = None,
                    pulse: int = 5, qp_method: str = "pdip",
                    qp_iters: int = 30) -> HorizonCheck:
    """Run the protocol at the tuned horizons (conditioned units)."""
    import jax.numpy as jnp

    dtype = dtype or jnp.float64
    ny = loop.ctl.spec.model.ny
    nu = loop.ctl.spec.n_mv
    nd = loop.ctl.spec.n_md
    nit = nit or (N + 30)  # WoodBerry.m:203 / Shell7x5.m:242

    # The open-loop leg must run the SAME split policy as the closed loop:
    # "+split15" (band production spec) does not literally end with
    # "+split", and silently dropping the split puts the open leg on the
    # joint PDIP that stalls ~5e-2 on degenerate band steps (PARITY.md).
    _, _, _, _split, qp_lp = parse_qp_method(qp_method)
    qp_split = _split != 0

    r_unit = np.asarray(L @ np.ones(ny))
    if v_const is None:
        v = np.zeros((nit, nd))
    else:
        v = np.tile(np.asarray(v_const, dtype=np.float64), (nit, 1))

    if ny == nu:
        # per-output selector protocol (WoodBerry.m:203-232)
        y_c = np.zeros((ny, nit))
        y_o = np.zeros((ny, nit))
        u_c = np.zeros((ny, nit))
        u_o = np.zeros((ny, nit))
        for i in range(ny):
            sel = np.zeros(ny)
            sel[i] = 1.0
            r = np.tile(r_unit * sel, (nit, 1))
            yc, uc = loop.simulate(r, v, nit, N, Nu, delta, lam,
                                   dtype=dtype, qp_method=qp_method,
                                   qp_iters=qp_iters)
            yo, uo = loop.open_loop(r_unit * sel, v[-1], v, nit, N, Nu,
                                    delta, lam, dtype=dtype,
                                    qp_iters=qp_iters, qp_split=qp_split,
                                    qp_lp=qp_lp)
            y_c[i] = yc[:, i]
            y_o[i] = yo[:, i]
            j = min(i, nu - 1)
            u_c[i] = uc[:, j]
            u_o[i] = uo[:, j]
    else:
        # non-square pulse protocol (Shell7x5.m:242-261): unit setpoint on
        # the first `pulse` samples, MD held, ONE closed + open sim
        r = np.zeros((nit, ny))
        r[:pulse] = r_unit
        yc, uc = loop.simulate(r, v, nit, N, Nu, delta, lam, dtype=dtype,
                               qp_method=qp_method, qp_iters=qp_iters)
        yo, uo = loop.open_loop(r[-1], v[-1], v, nit, N, Nu, delta, lam,
                                dtype=dtype, qp_iters=qp_iters,
                                qp_split=qp_split, qp_lp=qp_lp)
        y_c, y_o = yc.T, yo.T
        u_c, u_o = uc.T, uo.T

    mismatch = np.linalg.norm(y_c - y_o, axis=1) / (
        np.linalg.norm(y_o, axis=1) + 1e-12
    )
    return HorizonCheck(y_closed=y_c, y_open=y_o, u_closed=u_c, u_open=u_o,
                        mismatch=mismatch)
