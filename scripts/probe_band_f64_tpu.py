"""Probe 2: (a) is TPU 'f64' true 53-bit double or a ~48-bit two-float
emulation; (b) does the Shell7x5 band closed loop at f64 on the TPU
reproduce the CPU/f64 trajectory; (c) at what throughput.

Decides VERDICT round-4 item 1 (TPU-resident decision-grade band eval).
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

out = {"backend": jax.default_backend()}

# (a) mantissa-depth probe: 1 + 2^-k survives iff k <= mantissa bits
for k in (40, 45, 48, 50, 52):
    r = jax.jit(lambda: (jnp.float64(1.0) + jnp.float64(2.0 ** -k))
                - jnp.float64(1.0))()
    out[f"resid_2^-{k}"] = float(r)

# serial-dependency probe: compensated summation only survives on true f64
def dotk(a, b):
    return jnp.sum(a * b)

rng = np.random.default_rng(0)
a = rng.standard_normal(4096)
ill = a - a.mean()
x64 = jnp.asarray(ill)
ref = float(np.sum(ill.astype(np.float64) * ill.astype(np.float64)))
tpu = float(jax.jit(dotk)(x64, x64))
out["dot_rel_err_vs_numpy_f64"] = abs(tpu - ref) / abs(ref)

# (b)+(c) Shell7x5 band loop f64 on-chip vs CPU f64
from mpc_tuning_tpu.cases import shell7x5  # noqa: E402
from mpc_tuning_tpu.cases.cross_eval import REF_TUNED  # noqa: E402
from mpc_tuning_tpu.tuning.api import build_problem  # noqa: E402

NIT = 80
ref_pt = REF_TUNED["Shell7x5"]
case = shell7x5.make_case(nit=NIT)
problem, _ = build_problem(case, dtype=jnp.float64, qp_iters=60,
                           L=np.diag(ref_pt.L), R=np.diag(ref_pt.R))
loop = problem.loop

t0 = time.perf_counter()
y_tpu, u_tpu = loop.simulate(problem.r, problem.v, NIT, int(ref_pt.N),
                             int(ref_pt.Nu.max()), ref_pt.delta, ref_pt.lam,
                             qp_method="pdip_ws_lanes+split15", qp_iters=60,
                             dtype=jnp.float64, use_pallas=False)
out["tpu_f64_first_call_s"] = time.perf_counter() - t0

# CPU reference in a subprocess? cheaper: run the same thing on cpu backend
cpu = jax.devices("cpu")[0]
with jax.default_device(cpu):
    y_cpu, u_cpu = loop.simulate(problem.r, problem.v, NIT, int(ref_pt.N),
                                 int(ref_pt.Nu.max()), ref_pt.delta,
                                 ref_pt.lam,
                                 qp_method="pdip_ws_lanes+split15",
                                 qp_iters=60, dtype=jnp.float64,
                                 use_pallas=False)

out["max_dY_tpu_vs_cpu_f64"] = float(np.abs(y_tpu - y_cpu).max())
out["max_dU_tpu_vs_cpu_f64"] = float(np.abs(u_tpu - u_cpu).max())

# SSE-style objective deltas (what decisions integrate)
sse_t = float(np.sum(np.asarray(y_tpu) ** 2))
sse_c = float(np.sum(np.asarray(y_cpu) ** 2))
out["sse_rel_delta"] = abs(sse_t - sse_c) / max(abs(sse_c), 1e-30)

# timing: repeat solo runs (axon sync via scalar readback happens in
# simulate's np.asarray conversion)
t0 = time.perf_counter()
reps = 3
for _ in range(reps):
    loop.simulate(problem.r, problem.v, NIT, int(ref_pt.N),
                  int(ref_pt.Nu.max()), ref_pt.delta, ref_pt.lam,
                  qp_method="pdip_ws_lanes+split15", qp_iters=60,
                  dtype=jnp.float64, use_pallas=False)
dt = (time.perf_counter() - t0) / reps
out["tpu_f64_B1_sims_per_s_nit80"] = 1.0 / dt

print(json.dumps(out, indent=1))
