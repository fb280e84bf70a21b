"""Command-line entry points.

  mpc-tuning-run <case> [--nit N] [--nbp B] [--nbc B] [--budget small|full]
      run the hybrid tuner on a benchmark case and print the result JSON
      (cases: woodberry, shell3x3, shell7x5, vandevusse)
  mpc-tuning-bench
      run the headline benchmark (same as python bench.py)
"""

from __future__ import annotations

import argparse
import json

import numpy as np


def run_main(argv=None):
    ap = argparse.ArgumentParser(description="hybrid MPC tuning")
    ap.add_argument("case", choices=["woodberry", "shell3x3", "shell7x5",
                                     "vandevusse"])
    ap.add_argument("--nit", type=int, default=None)
    ap.add_argument("--nbp", type=int, default=None)
    ap.add_argument("--nbc", type=int, default=None)
    ap.add_argument("--budget", choices=["small", "full"], default="small")
    ap.add_argument("--checkpoint-dir", default="checkpoints")
    ap.add_argument("--state-path", default=None,
                    help="tuning-state JSON for mid-run checkpointing "
                         "(default: <checkpoint-dir>/<case>_tuning_state.json)")
    ap.add_argument("--resume", action="store_true",
                    help="continue a killed run from the state file; "
                         "reproduces the uninterrupted result exactly")
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    ap.add_argument("--report", default=None, metavar="OUT.html|OUT.png",
                    help="write the reference drivers' figure sets at the "
                         "tuned parameters (closed loop, open-vs-closed "
                         "horizon verification, tuning history) — "
                         "mpc_tuning_tpu/report.py")
    ap.add_argument("--mesh", default=None, metavar="auto|N",
                    help="shard every candidate evaluation over a device "
                         "mesh: 'auto' = all visible devices, an integer = "
                         "the first N devices (tuning/api.mpc_tuning mesh=)")
    args = ap.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    mesh = None
    if args.mesh:
        from mpc_tuning_tpu.parallel.sweep import candidate_mesh

        devs = jax.devices()
        if args.mesh != "auto":
            devs = devs[: int(args.mesh)]
        mesh = candidate_mesh(devs)
        print(f"# candidate mesh: {len(devs)} x {devs[0].platform}")

    dtype = jnp.float64 if jax.default_backend() == "cpu" else jnp.float32
    budget = (dict(gam_popsize=8, gam_generations=5, max_alternations=2)
              if args.budget == "small"
              else dict(gam_popsize=16, gam_generations=20, max_alternations=6))

    kw = {}
    if args.nit:
        kw["nit"] = args.nit
    if args.nbp:
        kw["nbp"] = args.nbp
    if args.nbc:
        kw["nbc"] = args.nbc

    state_path = args.state_path
    if state_path is None and args.checkpoint_dir:
        import os

        os.makedirs(args.checkpoint_dir, exist_ok=True)
        state_path = os.path.join(args.checkpoint_dir,
                                  f"{args.case}_tuning_state.json")

    if args.case == "vandevusse":
        from mpc_tuning_tpu.cases import vandevusse

        case, res, (y, u) = vandevusse.run(
            checkpoint_dir=args.checkpoint_dir, dtype=dtype, **budget,
            state_path=state_path, resume=args.resume, mesh=mesh,
            **({"nit": args.nit} if args.nit else {}),
        )
        out = dict(case=args.case, **{k: (v.tolist() if isinstance(v, np.ndarray) else v)
                                      for k, v in res.items() if k != "history"})
        if args.report:
            from mpc_tuning_tpu.report import generate_report

            t = np.arange(len(y)) * case.spec.Ts
            p = generate_report(
                args.report, args.case, t, y, u, r=case.r[: len(y)],
                Yref=case.Yref[: len(y)], history=res["history"],
                summary=dict(N=res["N"], Nu=list(map(int, res["Nu"])),
                             delta=np.round(res["delta"], 4).tolist(),
                             lam=np.round(res["lam"], 4).tolist(),
                             Fvns=res["Fvns"], Fgam=res["Fgam"]))
            out["report"] = p
    else:
        from mpc_tuning_tpu.cases import shell3x3, shell7x5, woodberry
        from mpc_tuning_tpu.tuning.api import mpc_tuning

        mod = {"woodberry": woodberry, "shell3x3": shell3x3,
               "shell7x5": shell7x5}[args.case]
        case = mod.make_case(**kw)
        tkw = dict(budget)
        if args.case == "shell7x5":
            tkw["qp_iters"] = 60
        res = mpc_tuning(case, dtype=dtype,
                         checkpoint_dir=args.checkpoint_dir,
                         state_path=state_path, resume=args.resume,
                         mesh=mesh, **tkw)
        out = dict(case=args.case, N=res.N, Nu=res.Nu.tolist(),
                   delta=res.delta.tolist(), lam=res.lam.tolist(),
                   Fvns=res.Fvns, Fgam=res.Fgam, checkpoint=res.checkpoint)
        if args.report:
            from mpc_tuning_tpu.report import generate_report

            nit = case.nit
            y, u = mod.final_simulation(case, res)
            prob = res.problem
            Linv = np.linalg.inv(res.L)
            Numax = int(np.max(res.Nu))
            # Band cases must run the production eps-split engine at the
            # tuner's iteration budget: the default joint pdip@30 stalls
            # ~5e-2 on degenerate band steps (PARITY.md) and would show
            # solver artifacts as horizon mismatch in the verify panel.
            band = bool(np.any(prob.band_mask))
            qp_m = "pdip_ws_lanes+lp20+split12" if band else "pdip"
            yc, _ = prob.loop.simulate(prob.r, prob.v, nit, res.N, Numax,
                                       res.delta, res.lam,
                                       qp_method=qp_m, qp_iters=prob.qp_iters)
            vf = prob.v[nit - 1] if prob.v.shape[1] else np.zeros(0)
            yo, _ = prob.loop.open_loop(prob.r[nit - 1], vf, prob.v, nit,
                                        res.N, Numax, res.delta, res.lam,
                                        qp_iters=prob.qp_iters, qp_split=band,
                                        qp_lp=20 if band else 0)
            t = np.arange(nit) * case.Ts
            p = generate_report(
                args.report, args.case, t, y, u,
                r=case.Xsp[:nit], Yref=case.Yref[:nit],
                ymin=case.ymin, ymax=case.ymax,
                Yc=(Linv @ np.asarray(yc).T).T,
                Yo=(Linv @ np.asarray(yo).T).T,
                history=res.history,
                summary=dict(N=res.N, Nu=res.Nu.tolist(),
                             delta=np.round(res.delta, 4).tolist(),
                             lam=np.round(res.lam, 4).tolist(),
                             Fvns=res.Fvns, Fgam=res.Fgam))
            out["report"] = p
    print(json.dumps(out, indent=1))


def bench_main(argv=None):
    import pathlib
    import runpy
    import sys

    root = pathlib.Path(__file__).resolve().parents[1]
    sys.path.insert(0, str(root))
    runpy.run_path(str(root / "bench.py"), run_name="__main__")


if __name__ == "__main__":
    run_main()
