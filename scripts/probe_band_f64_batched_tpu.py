"""Probe 3: batched Shell7x5 band closed-loop at FLOAT64 on the TPU —
the candidate decision-grade path (VERDICT round-4 item 1).  Measures
sims/s at B in {64, 256} with the lanes engine (XLA f64; Pallas kernels
stay f32-only) and compares a batch row against the CPU/f64 loop.
"""
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from mpc_tuning_tpu.cases import shell7x5  # noqa: E402
from mpc_tuning_tpu.cases.cross_eval import REF_TUNED  # noqa: E402
from mpc_tuning_tpu.tuning.api import build_problem  # noqa: E402

NIT = 200
out = {"backend": jax.default_backend(), "nit": NIT}

ref = REF_TUNED["Shell7x5"]
case = shell7x5.make_case(nit=NIT)
problem, _ = build_problem(case, dtype=jnp.float64, qp_iters=60,
                           L=np.diag(ref.L), R=np.diag(ref.R))
loop = problem.loop

rng = np.random.default_rng(0)
for B in (64, 256):
    N_b = np.full(B, int(ref.N))
    Nu_b = np.full(B, int(ref.Nu.max()))
    d_b = np.tile(ref.delta, (B, 1))
    l_b = np.asarray(ref.lam)[None, :] * np.exp(
        0.3 * rng.standard_normal((B, 3)))
    r_b = np.tile(np.asarray(problem.r)[None, :NIT], (B, 1, 1))
    t0 = time.perf_counter()
    Y, U = loop.closed_batch(r_b, problem.v, N_b, Nu_b, d_b, l_b, NIT,
                             jnp.float64, 60,
                             qp_method="pdip_ws_lanes+split15",
                             use_pallas=False)
    s = float(jnp.sum(Y))  # axon sync
    out[f"B{B}_first_call_s"] = round(time.perf_counter() - t0, 2)
    reps = 2
    t0 = time.perf_counter()
    for _ in range(reps):
        Y, U = loop.closed_batch(r_b, problem.v, N_b, Nu_b, d_b, l_b, NIT,
                                 jnp.float64, 60,
                                 qp_method="pdip_ws_lanes+split15",
                                 use_pallas=False)
        s = float(jnp.sum(Y))
    dt = (time.perf_counter() - t0) / reps
    out[f"B{B}_sims_per_s"] = round(B / dt, 2)
    out[f"B{B}_checksum"] = s

print(json.dumps(out, indent=1))
