"""Small-batch (production tuner shape) timing of whole-sim kernels vs
the scan engines: GAM populations are ~12 lanes and VNS neighborhoods
~19-30 — the latency-bound regime where the scan path pays 400 steps of
per-step dispatch and the whole-sim kernel launches ONCE."""
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
    problem, _ = build_problem(case, dtype=jnp.float32, qp_iters=15)
    loop = problem.loop
    rng = np.random.default_rng(0)

    for B, pairs in ((12, (("pdip_ws_fused", 15), ("pdip_sim_fused@128", 15),
                           ("admm_fused@512", 40), ("admm_sim_fused@512", 40))),
                     (24, (("pdip_ws_fused", 15), ("pdip_sim_fused@128", 15),
                           ("admm_fused@512", 40), ("admm_sim_fused@512", 40)))):
        r_b = np.broadcast_to(problem.r[:400], (B, 400, 2))
        N_b = np.full(B, 20)
        Nu_b = np.full(B, 4)
        d_b = rng.uniform(0.2, 2.0, (B, 2))
        l_b = rng.uniform(0.01, 0.5, (B, 2))
        for method, iters in pairs:
            def run():
                Y, _ = loop.closed_batch(r_b, problem.v, N_b, Nu_b, d_b,
                                         l_b, 400, jnp.float32, iters,
                                         qp_method=method)
                return float(jnp.sum(Y))

            run()
            ts = []
            for _ in range(7):
                t0 = time.perf_counter()
                run()
                ts.append(time.perf_counter() - t0)
            ts.sort()
            med = ts[len(ts) // 2]
            print(f"B={B:3d} {method:22s} iters={iters:2d} "
                  f"median {med*1e3:7.1f} ms  ({B/med:7.1f} sims/s) "
                  f"best {ts[0]*1e3:7.1f} ms", flush=True)


if __name__ == "__main__":
    main()
