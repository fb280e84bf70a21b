"""Open-loop vs closed-loop horizon-sanity verification.

The reference's built-in physical check (WoodBerry.m:186-232, commentary at
:186-202; same protocol in Shell3x3.m:195-241 and Shell7x5.m:242-291):
solve the MPC once at rest toward a unit setpoint, play out the whole
optimal sequence, and compare with the receding-horizon closed loop — if
the horizons are well chosen the two nearly coincide.

Returns per-output data + a mismatch score usable as a regression signal.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from mpc_tuning_tpu.sim.mpc_loop import MPCLoop

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


def verify_horizons(loop: MPCLoop, L: np.ndarray, N: int, Nu: int,
                    delta, lam, nit: int | None = None,
                    dtype=None) -> HorizonCheck:
    """Run the per-output selector protocol at the tuned horizons."""
    import jax.numpy as jnp

    dtype = dtype or jnp.float64
    ny = loop.ctl.spec.model.ny
    nu = loop.ctl.spec.n_mv
    nd = loop.ctl.spec.n_md
    nit = nit or (N + 30)  # WoodBerry.m:203

    r_unit = np.asarray(L @ np.ones(ny))
    v = np.zeros((nit, nd))

    y_c = np.zeros((ny, nit))
    y_o = np.zeros((ny, nit))
    u_c = np.zeros((ny, nit))
    u_o = np.zeros((ny, nit))
    for i in range(ny):
        sel = np.zeros(ny)
        sel[i] = 1.0
        r = np.tile(r_unit * sel, (nit, 1))
        yc, uc = loop.simulate(r, v, nit, N, Nu, delta, lam, dtype=dtype)
        yo, uo = loop.open_loop(r_unit * sel, np.zeros(nd), v, nit, N, Nu,
                                delta, lam, dtype=dtype)
        y_c[i] = yc[:, i]
        y_o[i] = yo[:, i]
        j = min(i, nu - 1)
        u_c[i] = uc[:, j]
        u_o[i] = uo[:, j]

    scale = np.maximum(np.abs(y_o).max(axis=1), 1e-9)
    mismatch = np.linalg.norm(y_c - y_o, axis=1) / (
        np.linalg.norm(y_o, axis=1) + 1e-12
    )
    return HorizonCheck(y_closed=y_c, y_open=y_o, u_closed=u_c, u_open=u_o,
                        mismatch=mismatch)
