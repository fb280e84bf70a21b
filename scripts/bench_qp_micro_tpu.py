"""Microbenchmark of the batched masked-PDIP QP components on the
accelerator: full solve vs factor-only vs solve-only vs normal-matrix
matmul vs elementwise remainder.  Isolates where the 388us/iteration of
the closed-loop scan goes.  Appends JSON lines to
checkpoints/bench_qp_micro.jsonl; each variant in its own subprocess.
"""

import json
import os
import pathlib
import subprocess
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

B = int(os.environ.get("BENCH_BATCH", "2048"))
ITERS = 15


def _setup():
    import numpy as np
    import jax.numpy as jnp

    from mpc_tuning_tpu.cases import woodberry
    from mpc_tuning_tpu.ops.mpc_qp import assemble_candidate, qp_step_data
    from mpc_tuning_tpu.tuning.api import build_problem
    import jax

    case = woodberry.make_case(nit=40)
    problem, _ = build_problem(case, dtype=jnp.float32, qp_iters=ITERS)
    loop = problem.loop
    c = loop.arrays(jnp.float32)
    d = loop.dims
    rng = np.random.default_rng(0)

    def one(nn, dd, ll):
        cand = assemble_candidate(c, jnp.asarray(nn), jnp.asarray(4),
                                  jnp.asarray(dd, jnp.float32),
                                  jnp.asarray(ll, jnp.float32),
                                  d["p_max"], d["m_max"], d["ny"], d["nu"],
                                  d["rho"], d["with_y"])
        nxa = c["A"].shape[0]
        f, h, _ = qp_step_data(c, cand, jnp.zeros(nxa, jnp.float32),
                               jnp.zeros(2, jnp.float32),
                               jnp.asarray(problem.r[10], jnp.float32),
                               jnp.zeros(1, jnp.float32),
                               d["p_max"], d["m_max"], d["ny"], d["nu"],
                               d["with_y"])
        return cand, f, h

    cands, fs, hs = [], [], []
    for i in range(B):
        pass
    # build ONE candidate and broadcast (content identical across lanes —
    # timing only)
    cand, f, h = one(20, [1.0, 1.0], [0.1, 0.1])
    import jax.numpy as jnp

    Hb = jnp.broadcast_to(cand["H"], (B,) + cand["H"].shape)
    fb = jnp.broadcast_to(f, (B,) + f.shape)
    hb = jnp.broadcast_to(h, (B,) + h.shape)
    rmask_b = jnp.broadcast_to(cand["rmask"], (B,) + cand["rmask"].shape)
    cmask_b = jnp.broadcast_to(cand["cmask_z"], (B,) + cand["cmask_z"].shape)
    return c, cand, Hb, fb, hb, rmask_b, cmask_b


def timeit(fn, reps=10):
    import jax.numpy as jnp

    def sync(x):
        import jax

        leaf = jax.tree_util.tree_leaves(x)[0]
        return float(jnp.sum(leaf))

    sync(fn())
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    sync(out)
    return (time.perf_counter() - t0) / reps


def worker(name):
    import jax
    import jax.numpy as jnp

    c, cand, Hb, fb, hb, rmask_b, cmask_b = _setup()
    from mpc_tuning_tpu.ops.pallas_kernels import spd_factor, spd_factor_solve
    from mpc_tuning_tpu.ops.qp import solve_qp_masked

    n = Hb.shape[-1]
    mc = hb.shape[-1]

    if name == "full_solve":
        @jax.jit
        def run():
            with jax.default_matmul_precision("highest"):
                return jax.vmap(
                    lambda H, f, h, rm, cm: solve_qp_masked(
                        H, f, c["G0"], c["T2"], rm, cm, h, iters=ITERS,
                        use_pallas=True)
                )(Hb, fb, hb, rmask_b, cmask_b)[0]
        dt = timeit(run)
        per_iter = dt / ITERS
    elif name == "factor":
        M = Hb + 1e-3 * jnp.eye(n)[None]
        @jax.jit
        def run():
            return jax.vmap(spd_factor)(M)
        dt = timeit(run)
        per_iter = dt
    elif name == "factor_solve2":
        M = Hb + 1e-3 * jnp.eye(n)[None]
        @jax.jit
        def run():
            L = jax.vmap(spd_factor)(M)
            x1 = jax.vmap(spd_factor_solve)(L, fb)
            x2 = jax.vmap(spd_factor_solve)(L, fb + x1)
            return x2
        dt = timeit(run)
        per_iter = dt
    elif name == "t2_matmul":
        W = jnp.broadcast_to(cand["rmask"], (B, mc))
        @jax.jit
        def run():
            with jax.default_matmul_precision("highest"):
                return (W @ c["T2"]).reshape(B, n, n)
        dt = timeit(run)
        per_iter = dt
    elif name == "iters_chain":
        # 15 dependent factor+solve pairs (models the scan's serialization)
        M = Hb + 1e-3 * jnp.eye(n)[None]
        @jax.jit
        def run():
            x = fb
            for _ in range(ITERS):
                L = jax.vmap(spd_factor)(M)
                x = jax.vmap(spd_factor_solve)(L, x)
                x = jax.vmap(spd_factor_solve)(L, x)
            return x
        dt = timeit(run, reps=3)
        per_iter = dt / ITERS
    else:
        raise KeyError(name)
    print(json.dumps({"variant": name, "B": B, "seconds": round(dt, 5),
                      "per_iter_us": round(1e6 * per_iter, 1)}))


def main():
    out = pathlib.Path("checkpoints/bench_qp_micro.jsonl")
    with out.open("a") as fh:
        for name in sys.argv[1:] or ["full_solve", "iters_chain", "factor",
                                     "factor_solve2", "t2_matmul"]:
            r = subprocess.run([sys.executable, __file__, "--worker", name],
                               capture_output=True, text=True, timeout=1800)
            line = next((l for l in r.stdout.splitlines() if l.startswith("{")),
                        None) or json.dumps({"variant": name, "error":
                                             r.stdout[-150:] + r.stderr[-250:]})
            print(line, flush=True)
            fh.write(line + "\n")
            fh.flush()


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(sys.argv[2])
    else:
        main()
