"""Multi-host tuning sweeps: ``jax.distributed`` + a DCN x ICI device mesh.

The reference is a single MATLAB process ('UseParallel',false,
MPCTuning.m:89); this is the scale-out half the TPU framework adds
(SURVEY.md section 2.6 / build-plan step 7).  The tuning workload is an
embarrassingly parallel candidate grid whose only cross-device traffic is
the final objective argmin, so the layout is:

 * mesh axes ("host", "ici"): hosts over DCN, each host's chips over ICI;
 * candidates sharded over BOTH axes flattened — every chip evaluates
   B / (n_hosts * chips_per_host) closed-loop simulations;
 * the incumbent reduction is a pmin/pmax pair over ("host", "ici") —
   one scalar each over ICI first (fast), then DCN, inserted by XLA from
   the same shard_map the single-host path uses.

Every process must call :func:`initialize` first (standard JAX multi-host
contract), then build identical global candidate grids (deterministic
host code) — :func:`multihost_candidate_argmin` materializes only the
addressable shards on each process.

Validation without real multi-host hardware: ``python -m
mpc_tuning_tpu.parallel.multihost --two-process-selftest`` spawns two
CPU processes (4 virtual devices each via
--xla_force_host_platform_device_count) that jax.distributed-initialize
against a local coordinator and run one sharded sweep step;
__graft_entry__.dryrun_multichip invokes this as part of the driver check.
"""

from __future__ import annotations

import argparse
import os
import socket
import subprocess
import sys

import numpy as np

__all__ = [
    "initialize",
    "host_mesh",
    "multihost_candidate_argmin",
    "run_two_process_cpu_selftest",
]


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """jax.distributed.initialize wrapper (no-op args on TPU pods, where
    JAX discovers the topology itself)."""
    import jax

    kw = {}
    if coordinator_address is not None:
        kw.update(coordinator_address=coordinator_address,
                  num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kw)


def host_mesh(axis_host: str = "host", axis_ici: str = "ici"):
    """(n_processes, local_device_count) mesh: hosts over DCN, chips over
    ICI.  Candidate shardings use P((axis_host, axis_ici))."""
    import jax
    from jax.sharding import Mesh

    n_proc = jax.process_count()
    devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    per = len(devs) // n_proc
    grid = np.array(devs).reshape(n_proc, per)
    return Mesh(grid, (axis_host, axis_ici))


def _shard_global(mesh, spec_axes, a):
    """Materialize a deterministic global host array as a sharded
    jax.Array, building only this process's addressable shards."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    a = np.asarray(a)
    spec = P(spec_axes, *([None] * (a.ndim - 1)))
    sharding = NamedSharding(mesh, spec)
    return jax.make_array_from_callback(a.shape, sharding, lambda idx: a[idx])


def multihost_candidate_argmin(mesh, local_eval_fn, global_args, B_true: int):
    """Evaluate a candidate grid sharded over the full DCN x ICI mesh and
    reduce to the global (min value, argmin index) with in-mesh collectives.

    local_eval_fn(*local_shards) -> (B_local,) objective values.
    global_args: list of np arrays with the candidate axis first, IDENTICAL
    on every process (deterministic grid construction).  Padded lanes
    (index >= B_true) are masked to +inf before the reduction.
    Returns (vmin, gidx) as python scalars, identical on every process.
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    axes = mesh.axis_names  # ("host", "ici")
    nd = mesh.devices.size
    padded = []
    for a in global_args:
        a = np.asarray(a)
        pad = (-a.shape[0]) % nd
        if pad:
            a = np.concatenate([a, np.repeat(a[-1:], pad, axis=0)], axis=0)
        padded.append(a)

    def body(*sharded):
        F = local_eval_fn(*sharded)
        base = sum(
            jax.lax.axis_index(ax) * st
            for ax, st in zip(axes, (F.shape[0] * mesh.shape[axes[1]], F.shape[0]))
        )
        gidx_lane = base + jnp.arange(F.shape[0])
        F = jnp.where(gidx_lane < B_true, F, jnp.inf)
        li = jnp.argmin(F)
        lv = F[li]
        gi = gidx_lane[li]
        vmin = jax.lax.pmin(lv, axes[1])          # ICI first
        vmin = jax.lax.pmin(vmin, axes[0])        # then DCN
        winner = jnp.where(lv == vmin, gi, -1)
        gidx = jax.lax.pmax(jax.lax.pmax(winner, axes[1]), axes[0])
        return vmin[None, None], gidx[None, None]

    in_specs = tuple(
        P(axes, *([None] * (np.ndim(a) - 1))) for a in padded
    )
    out_spec = P(axes[0], axes[1])
    f = jax.jit(jax.shard_map(body, mesh=mesh, in_specs=in_specs,
                              out_specs=(out_spec, out_spec), check_vma=False))
    args_dev = [_shard_global(mesh, axes, a) for a in padded]
    vmin, gidx = f(*args_dev)
    # the reduction already made every shard identical; read a LOCAL shard
    # (the global array spans non-addressable devices on multi-host)
    vmin = float(np.asarray(vmin.addressable_shards[0].data).ravel()[0])
    gidx = int(np.asarray(gidx.addressable_shards[0].data).ravel()[0])
    return vmin, gidx


# ----------------------------------------------------------- selftest


def _alternation_worker(coordinator: str, nprocs: int, pid: int,
                        bench: bool = False) -> None:
    """One process of the 2-process PRODUCTION-TUNER validation: one full
    GAM <-> VNS alternation of the Wood-Berry case (small budget,
    tuning/api.hybrid_tune — the MPC_TFob.m:56-132 loop) runs twice —
    unsharded, then with problem.mesh = the global (host, ici) mesh — and
    the tuned incumbents (N, Nu, delta, lambda) must be BIT-identical
    (the recorded objective to machine precision).
    This exercises the exact entry point users get via
    mpc_tuning(case, mesh=...) / `mpc-tuning-run --mesh auto`.

    ``bench``: run the PRODUCTION-SHAPE workload instead of the toy one
    (nit=400, nbp=7/nbc=4 -> p_max=127, qp_iters=15, popsize 8 x 2
    generations, f32 — the bench.py tuning shape) and TIME both legs so
    the scaling report records the mesh's tuner-level overhead at real
    shapes (round-4 verdict item 7; the virtual-CPU mesh adds no
    compute, so overhead-vs-unsharded is the signal, not speedup)."""
    import time

    import jax

    if not bench:
        jax.config.update("jax_enable_x64", True)  # f64 evaluation grade
    initialize(coordinator, nprocs, pid)
    assert jax.process_count() == nprocs, jax.process_count()

    import jax.numpy as jnp

    from mpc_tuning_tpu.cases import woodberry
    from mpc_tuning_tpu.tuning.api import build_problem, hybrid_tune

    if bench:
        case = woodberry.make_case(nit=400)  # nbp=7, nbc=4 (bench shape)
        problem, _ = build_problem(case, dtype=jnp.float32, qp_iters=15)
        kw = dict(gam_popsize=8, gam_generations=2, max_alternations=1,
                  seed=0, verbose=False, final_polish=False,
                  joint_polish=False)
    else:
        case = woodberry.make_case(nit=40, nbp=4, nbc=2)
        problem, _ = build_problem(case, dtype=jnp.float64, qp_iters=10)
        kw = dict(gam_popsize=4, gam_generations=2, max_alternations=1,
                  seed=0, verbose=False, final_polish=False,
                  joint_polish=False)
    x0 = np.concatenate([case.ov_weight0, case.mvrate_weight0])
    t0 = time.perf_counter()
    best_r, d_r, l_r, F_r, _, _ = hybrid_tune(problem, case.nbp, case.nbc,
                                              x0, **kw)
    t_ref = time.perf_counter() - t0
    problem.mesh = host_mesh()
    t0 = time.perf_counter()
    best_s, d_s, l_s, F_s, _, _ = hybrid_tune(problem, case.nbp, case.nbc,
                                              x0, **kw)
    t_mesh = time.perf_counter() - t0
    # incumbents (the tuner's DECISIONS) must be bit-identical; the
    # recorded objective may differ by a few ulps because XLA tiles the
    # per-shard batch shapes differently (measured 7e-16 relative)
    assert best_s["N"] == best_r["N"], (best_s["N"], best_r["N"])
    assert np.array_equal(best_s["Nu"], best_r["Nu"]), (best_s["Nu"],
                                                        best_r["Nu"])
    assert np.array_equal(d_s, d_r), (d_s, d_r)
    assert np.array_equal(l_s, l_r), (l_s, l_r)
    # objective agreement: per-shard XLA tiling differs, so the recorded
    # value carries the working precision's reduction noise (measured
    # 7e-16 rel at f64, 9e-8 rel at the f32 production shape)
    ftol = 1e-12 if not bench else 1e-6
    assert abs(F_s - F_r) <= ftol * max(1.0, abs(F_r)), (F_s, F_r)
    if pid == 0:
        extra = (f" wall_unsharded_s={t_ref:.1f} wall_mesh_s={t_mesh:.1f} "
                 f"mesh_overhead_x={t_mesh / max(t_ref, 1e-9):.2f}"
                 if bench else "")
        print(f"MULTIHOST_TUNE_OK procs={nprocs} "
              f"devices={jax.device_count()} N={best_s['N']} "
              f"Nu={np.asarray(best_s['Nu']).tolist()} "
              f"objective={F_s:.6g} bitwise_identical=1"
              f"{extra}", flush=True)


def _selftest_worker(coordinator: str, nprocs: int, pid: int,
                     bench_B: int = 0, bench_nit: int = 0) -> None:
    """One process of the 2-process CPU validation: Wood-Berry sweep over
    the global (nprocs x 4)-device mesh.  Default shape is tiny (the
    __graft_entry__.dryrun_multichip workload); pass bench_B/bench_nit to
    run + TIME the bench shape for the scaling report (parallel/report)."""
    import time

    import jax

    initialize(coordinator, nprocs, pid)
    assert jax.process_count() == nprocs, jax.process_count()

    import jax.numpy as jnp

    from mpc_tuning_tpu.cases import woodberry
    from mpc_tuning_tpu.sim.mpc_loop import closed_loop_core
    from mpc_tuning_tpu.tuning.api import build_problem

    mesh = host_mesh()
    nd = mesh.devices.size

    bench = bench_B > 0
    nit = bench_nit if bench else 20
    if bench:
        case = woodberry.make_case(nit=nit)  # bench shape p_max=127
        qp_iters = 15
    else:
        case = woodberry.make_case(nit=nit, nbp=4, nbc=2)
        qp_iters = 10
    problem, _ = build_problem(case, dtype=jnp.float32, qp_iters=qp_iters)
    loop = problem.loop
    c = loop.arrays(jnp.float32)
    d = loop.dims
    v = jnp.asarray(problem.v[:nit], jnp.float32)
    Yref = jnp.asarray(problem.Yref[:nit], jnp.float32)
    statics = (d["p_max"], d["m_max"], d["ny"], d["nu"], d["with_y"],
               d["rho"], qp_iters)

    B = bench_B if bench else 2 * nd
    rng = np.random.default_rng(0)
    r_b = np.broadcast_to(np.asarray(problem.r[:nit], np.float32), (B, nit, 2))
    N_b = (rng.integers(16, 64, size=B) if bench else np.arange(B) % 4 + 8)
    Nu_b = np.full(B, 3)
    delta_b = np.ones((B, 2), np.float32)
    lam_b = np.full((B, 2), 0.1, np.float32)

    def local_eval(r_l, N_l, Nu_l, delta_l, lam_l):
        Y, _ = jax.vmap(
            closed_loop_core,
            in_axes=(None, 0, None, 0, 0, 0, 0) + (None,) * 9,
        )(c, r_l, v, N_l, Nu_l, delta_l, lam_l, *statics, "pdip_ws", False)
        err = Y - Yref[None]
        return jnp.sum(err * err, axis=(1, 2))

    argl = [r_b, N_b, Nu_b, delta_b, lam_b]
    vmin, gidx = multihost_candidate_argmin(mesh, local_eval, argl, B)
    rate = ""
    if bench:  # timed second pass (first included compile)
        t0 = time.perf_counter()
        vmin, gidx = multihost_candidate_argmin(mesh, local_eval, argl, B)
        rate = f" sims_per_s={B / (time.perf_counter() - t0):.1f}"
    assert np.isfinite(vmin), vmin
    assert 0 <= gidx < B, gidx
    if pid == 0:
        print(f"MULTIHOST_OK procs={nprocs} devices={nd} "
              f"best={gidx} objective={vmin:.6g}{rate}", flush=True)


def run_two_process_cpu_selftest(nprocs: int = 2, per_proc_devices: int = 4,
                                 timeout: float = 900.0, bench_B: int = 0,
                                 bench_nit: int = 0,
                                 mode: str = "sweep") -> str:
    """Spawn nprocs CPU processes that jax.distributed-initialize against a
    local coordinator and run one sharded step.  ``mode``: 'sweep' = one
    sharded sweep + argmin collective; 'alternation' = one full GAM<->VNS
    tuner alternation with bit-identical-incumbent assertion
    (_alternation_worker).  Returns the OK line."""
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "").split("--xla_force_host_platform_device_count")[0]
                        + f" --xla_force_host_platform_device_count={per_proc_devices}").strip()
    # clean CPU interpreters: drop any accelerator-plugin sitecustomize
    # hook (it would initialize a backend before jax.distributed can)
    env["PYTHONPATH"] = str(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))))
    env.pop("PALLAS_AXON_POOL_IPS", None)
    procs = []
    for pid in range(nprocs):
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "mpc_tuning_tpu.parallel.multihost",
             "--worker", "--coordinator", coord,
             "--nprocs", str(nprocs), "--pid", str(pid),
             "--bench-B", str(bench_B), "--bench-nit", str(bench_nit),
             "--mode", mode],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        ))
    outs = []
    ok = True
    for p in procs:
        try:
            out, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
            ok = False
        outs.append(out)
        ok = ok and (p.returncode == 0)
    joined = "\n".join(outs)
    tag = ("MULTIHOST_TUNE_OK" if mode.startswith("alternation")
           else "MULTIHOST_OK")
    if not ok or tag not in joined:
        raise RuntimeError(f"multihost selftest failed:\n{joined}")
    return next(l for l in joined.splitlines() if l.startswith(tag))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", action="store_true")
    ap.add_argument("--two-process-selftest", action="store_true")
    ap.add_argument("--coordinator", default=None)
    ap.add_argument("--nprocs", type=int, default=2)
    ap.add_argument("--pid", type=int, default=0)
    ap.add_argument("--bench-B", type=int, default=0)
    ap.add_argument("--bench-nit", type=int, default=0)
    ap.add_argument("--mode",
                    choices=["sweep", "alternation", "alternation_bench"],
                    default="sweep")
    args = ap.parse_args(argv)
    if args.worker:
        if args.mode.startswith("alternation"):
            _alternation_worker(args.coordinator, args.nprocs, args.pid,
                                bench=args.mode == "alternation_bench")
        else:
            _selftest_worker(args.coordinator, args.nprocs, args.pid,
                             args.bench_B, args.bench_nit)
    elif args.two_process_selftest:
        print(run_two_process_cpu_selftest(nprocs=args.nprocs,
                                           bench_B=args.bench_B,
                                           bench_nit=args.bench_nit,
                                           mode=args.mode))
    else:
        ap.error("choose --worker or --two-process-selftest")


if __name__ == "__main__":
    main()
