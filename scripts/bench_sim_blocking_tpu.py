"""Lane-width sweep for the whole-sim ADMM kernel at the headline shape
(B=8192, caps (64,8), nit=400, i40): does widening past the qualified
@512 blocking buy anything?  (The step-fused scan kernel was flat
512->2048, PERF.md round-5 MFU levers; per-lane results are
blocking-invariant — the same values at @512/@256 — so a faster width
could adopt under the existing qualification.)"""
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import numpy as np
import jax.numpy as jnp

from mpc_tuning_tpu.cases import woodberry
from mpc_tuning_tpu.tuning.api import build_problem


def main():
    assert jax.default_backend() != "cpu"
    case = woodberry.make_case(nit=400)
    problem, _ = build_problem(case, dtype=jnp.float32, qp_iters=40)
    loop = problem.loop
    rng = np.random.default_rng(0)
    B = 8192
    N_b = rng.integers(16, 64, size=B)
    Nu_b = rng.integers(2, 7, size=B)
    r_b = np.broadcast_to(problem.r[:400], (B, 400, 2))
    d_b = rng.uniform(0.2, 2.0, (B, 2))
    l_b = rng.uniform(0.01, 0.5, (B, 2))
    ref = None
    for method in ("admm_sim_fused@512", "admm_sim_fused@1024",
                   "admm_sim_fused@2048"):
        try:
            def run():
                Y, _ = loop.closed_batch(r_b, problem.v, N_b, Nu_b, d_b,
                                         l_b, 400, jnp.float32, 40,
                                         qp_method=method)
                return Y

            Y = run()
            float(jnp.sum(Y))
            ts = []
            for _ in range(5):
                t0 = time.perf_counter()
                Y = run()
                float(jnp.sum(Y))
                ts.append(time.perf_counter() - t0)
            ts.sort()
            med = ts[len(ts) // 2]
            Ynp = np.asarray(Y)
            d = (0.0 if ref is None
                 else float(np.abs(Ynp - ref).max()))
            if ref is None:
                ref = Ynp
            print(f"{method:22s} median {med:.4f} s "
                  f"({B/med:8.1f} sims/s) best {B/ts[0]:8.1f} "
                  f"dY_vs_512 {d:.2e}", flush=True)
        except Exception as exc:
            print(f"{method:22s} FAILED: {repr(exc)[:160]}", flush=True)


if __name__ == "__main__":
    main()
