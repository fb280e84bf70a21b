"""ctypes binding for the native C++ dual active-set QP oracle.

Builds native/qp_active_set.cpp on first use (g++ -O2 -shared), caches the
.so next to the source.  Used as the machine-precision arbiter for the
fixed-iteration device solvers and for host-side exact solves.
"""

from __future__ import annotations

import ctypes
import pathlib
import subprocess

import numpy as np

__all__ = ["qp_solve_exact", "native_available"]

_ROOT = pathlib.Path(__file__).resolve().parents[2] / "native"
_SRC = _ROOT / "qp_active_set.cpp"
_SO = _ROOT / "libqpactiveset.so"
_lib = None


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O2", "-fPIC", "-shared", str(_SRC), "-o", str(_SO)],
            check=True, capture_output=True,
        )
        return True
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not _SO.exists() or _SO.stat().st_mtime < _SRC.stat().st_mtime:
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(str(_SO))
    except OSError:
        return None
    lib.qp_solve_gi.restype = ctypes.c_int
    lib.qp_solve_gi.argtypes = [
        ctypes.c_int, ctypes.c_int,
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        ctypes.c_int,
    ]
    _lib = lib
    return lib


def native_available() -> bool:
    return _load() is not None


def qp_solve_exact(H, f, G, h, max_iter: int = 200, anti_cycle: bool = True):
    """Exact dual active-set solve.  Returns (x, lam, status).

    anti_cycle: degenerate QPs (more than n tied/active rows, e.g. the
    Shell7x5 soft-band QP) can cycle the active-set method.  The standard
    remedy is applied at this layer: perturb h by a tiny random amount to
    break ties almost surely, solve the perturbed problem, then POLISH on
    the original data — exact KKT solve on the identified active set,
    verified against primal feasibility and dual nonnegativity."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native QP library unavailable (g++ missing?)")
    H = np.ascontiguousarray(H, dtype=np.float64)
    f = np.ascontiguousarray(f, dtype=np.float64)
    G = np.ascontiguousarray(G, dtype=np.float64)
    h = np.ascontiguousarray(h, dtype=np.float64)
    n, m = len(f), len(h)
    x = np.zeros(n)
    lam = np.zeros(m)
    status = lib.qp_solve_gi(n, m, H, f, G, h, x, lam, max_iter)
    if status != 1 or not anti_cycle:
        return x, lam, int(status)

    rng = np.random.default_rng(0)
    scale = 1e-7 * (1.0 + np.abs(h))
    for _ in range(4):
        hp = np.ascontiguousarray(h + scale * rng.uniform(0.5, 1.5, size=m))
        xp = np.zeros(n)
        lp = np.zeros(m)
        sp = lib.qp_solve_gi(n, m, H, f, G, hp, xp, lp, max(max_iter, 5000))
        if sp != 0:
            scale = scale * 10.0
            continue
        act = np.where(lp > 1e-10)[0]
        Ga = G[act]
        KKT = np.block([[H, Ga.T], [Ga, np.zeros((len(act), len(act)))]])
        rhs = np.concatenate([-f, h[act]])
        sol = np.linalg.lstsq(KKT, rhs, rcond=None)[0]
        xs, mu = sol[:n], sol[n:]
        tol = 1e-7 * (1.0 + np.abs(h))
        if np.all(G @ xs - h <= tol) and np.all(mu >= -1e-7):
            lam = np.zeros(m)
            lam[act] = np.maximum(mu, 0.0)
            return xs, lam, 0
        scale = scale * 10.0
    return x, lam, int(status)
