"""Single-step isolation of the whole-sim kernel's deviation.

diag_sim_fused_tpu.py: U departs >1e-4 at the FIRST active step (state
exactly zero before it), worst on large-N candidates.  Running both
engines for nit=1 with r = the first active setpoint reproduces that
solve from a bitwise-identical state — du differences here are pure
single-QP-solve differences between the in-kernel assembly+ADMM and the
XLA-assembled + fused-ADMM scan step.
"""
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import numpy as np
import jax.numpy as jnp

from mpc_tuning_tpu.cases import woodberry
from mpc_tuning_tpu.tuning.api import build_problem


def main():
    assert jax.default_backend() != "cpu"
    case = woodberry.make_case(nit=400)
    problem, _ = build_problem(case, dtype=jnp.float32)
    grid = [(N, Nu) for N in (8, 12, 16, 20, 24, 28, 32, 40, 48, 64)
            for Nu in (2, 4, 6)]
    N_b = np.array([g[0] for g in grid])
    Nu_b = np.array([g[1] for g in grid])
    B = len(grid)
    delta = np.tile(np.array([1.0, 1.0]), (B, 1))
    lam = np.tile(np.array([0.1, 0.1]), (B, 1))
    # first active setpoint row, repeated (the k=9 solve of the full run)
    r_act = problem.r[np.abs(problem.r).sum(axis=1) > 0][0]
    print("r_act:", r_act)
    r_b = np.tile(r_act[None, None], (B, 2, 1))  # nit=2 keeps caps logic
    v = np.zeros((2, problem.v.shape[1]))

    loop = problem.loop

    def run(method, nit):
        Y, U = loop.closed_batch(r_b[:, :nit], v[:nit], N_b, Nu_b, delta,
                                 lam, nit, jnp.float32, 40,
                                 qp_method=method,
                                 caps=(64, 8))
        return np.asarray(jax.device_get(U), np.float64)

    Us = run("admm_fused@512", 1)
    Uf = run("admm_sim_fused@512", 1)
    d = np.abs(Uf[:, 0] - Us[:, 0]).max(axis=1)
    print("single-step |dU| per candidate:")
    for i in np.argsort(d)[::-1][:10]:
        print(f"  N={N_b[i]:3d} Nu={Nu_b[i]} dU {d[i]:.3e} "
              f"u_scan {Us[i,0]} u_fused {Uf[i,0]}")
    print("median dU:", float(np.median(d)), "max:", float(d.max()))


if __name__ == "__main__":
    main()
