"""On-chip agreement + timing of the whole-sim BAND kernel
('pdip_sim_fused+lp20+split12') vs the production scan band engine at
the bench band shape (Shell7x5, B=256, caps (48,4), nit=200, f32).

Gate context: f32 band rows are SCREENING-grade (PARITY.md) — the scan
engine family's own pairwise f32 deltas at this shape are O(5-20) in
dY/dU (checkpoints/qp_engine_agreement_tpu.json) because tiny-lambda
band loops amplify noise; the kernel's agreement is judged against that
class, and its correctness anchor is the 2.6e-10 f64-interpret match
with the scan split engine (tests/test_round5_engines.py).
"""
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import numpy as np
import jax.numpy as jnp

from mpc_tuning_tpu.cases import shell7x5
from mpc_tuning_tpu.cases.cross_eval import REF_TUNED
from mpc_tuning_tpu.tuning.api import build_problem


def main():
    assert jax.default_backend() != "cpu"
    ref = REF_TUNED["Shell7x5"]
    case = shell7x5.make_case()
    problem, _ = build_problem(case, dtype=jnp.float32,
                               L=np.diag(ref.L), R=np.diag(ref.R))
    loop = problem.loop
    nit = case.nit
    rng = np.random.default_rng(1)
    B = 256
    N_b = rng.integers(8, 40, size=B)
    Nu_b = rng.integers(2, 5, size=B)
    r_b = np.broadcast_to(problem.r[:nit], (B, nit, 7))
    d_b = np.broadcast_to(ref.delta, (B, 7)).copy()
    l_b = rng.uniform(0.02, 2.0, (B, 3))
    args = (r_b, problem.v, N_b, Nu_b, d_b, l_b, nit, jnp.float32, 60)

    out = {}
    Ys = {}
    for method in ("pdip_ws_fused+lp20+split12",
                   "pdip_sim_fused@128+lp20+split12",
                   "pdip_sim_fused@256+lp20+split12"):
        def run():
            Y, U = loop.closed_batch(*args, qp_method=method)
            return Y, U

        Y, U = run()
        Ys[method] = (np.asarray(Y), np.asarray(U))
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            Y, U = run()
            float(jnp.sum(Y))
            ts.append(time.perf_counter() - t0)
        ts.sort()
        med = ts[len(ts) // 2]
        print(f"{method:36s} median {med*1e3:7.1f} ms "
              f"({B/med:7.1f} sims/s) best {B/ts[0]:7.1f}", flush=True)

    base = "pdip_ws_fused+lp20+split12"
    for m in list(Ys):
        if m == base:
            continue
        dy = float(np.abs(Ys[m][0] - Ys[base][0]).max())
        du = float(np.abs(Ys[m][1] - Ys[base][1]).max())
        # fraction of lanes within tight agreement (band noise is
        # concentrated on a few tiny-lambda lanes)
        per_lane = np.abs(Ys[m][0] - Ys[base][0]).max(axis=(1, 2))
        frac = float((per_lane < 1e-3).mean())
        print(f"{m} vs scan: dY {dy:.3e} dU {du:.3e} "
              f"lanes<1e-3: {100*frac:.1f}%")


if __name__ == "__main__":
    main()
