"""On-chip diagnosis of the whole-sim kernel's trajectory deviation
(PERF.md round-5: ~0.07 vs the f64 truth where the scan engine reads
~1e-4-class noise; the SAME 6 WB decision pairs flip at @512 and @256).

Measures, at the WB qualification shape (nit=400, caps (64,8)):
  per-step max-over-lanes |Y| deviation profiles
    scan_f32   vs cpu_f64   (the incumbent's own f32 noise growth)
    fused_f32  vs cpu_f64   (the kernel's noise growth)
    fused_f32  vs scan_f32  (the kernel-vs-incumbent split)
If the fused curve departs early (k < 50) at >> ulp scale, a specific
in-kernel op has super-ulp error; if both curves grow together and only
separate late, it is closed-loop amplification of association-order ulp
noise and the fix is matching the scan path's op associations.

Usage: python scripts/diag_sim_fused_tpu.py [--nit 400] [--b 30]
"""
import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import numpy as np
import jax.numpy as jnp

from mpc_tuning_tpu.cases import woodberry
from mpc_tuning_tpu.tuning.api import build_problem


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nit", type=int, default=400)
    ap.add_argument("--b", type=int, default=0,
                    help="use the first b grid candidates (0 = all 30)")
    args = ap.parse_args()
    assert jax.default_backend() != "cpu"

    case = woodberry.make_case(nit=args.nit)
    problem, _ = build_problem(case, dtype=jnp.float32)
    grid = [(N, Nu) for N in (8, 12, 16, 20, 24, 28, 32, 40, 48, 64)
            for Nu in (2, 4, 6)]
    if args.b:
        grid = grid[:args.b]
    N_b = np.array([g[0] for g in grid])
    Nu_b = np.array([g[1] for g in grid])
    B = len(grid)
    delta = np.tile(np.array([1.0, 1.0]), (B, 1))
    lam = np.tile(np.array([0.1, 0.1]), (B, 1))
    r_b = np.tile(problem.r[None], (B, 1, 1))
    nit = args.nit

    loop = problem.loop

    def run(method, dtype, dev=None, iters=40):
        import contextlib
        ctx = jax.default_device(dev) if dev is not None else (
            contextlib.nullcontext())
        with ctx:
            Y, U = loop.closed_batch(r_b, problem.v, N_b, Nu_b, delta, lam,
                                     nit, dtype, iters, qp_method=method)
            Y = np.asarray(jax.device_get(Y), np.float64)
            U = np.asarray(jax.device_get(U), np.float64)
        return Y, U

    cpu = jax.devices("cpu")[0]
    print("running scan f32 on-chip ...", flush=True)
    Ys, Us = run("admm_fused@512", jnp.float32)
    print("running sim-fused f32 on-chip ...", flush=True)
    Yf, Uf = run("admm_sim_fused@512", jnp.float32)
    print("running scan f64 on CPU (admm truth) ...", flush=True)
    Yt, Ut = run("admm", jnp.float64, cpu)

    def prof(A, Bm):
        # per-step max deviation over lanes/outputs
        return np.abs(A - Bm).max(axis=(0, 2))

    p_scan = prof(Ys, Yt)
    p_fused = prof(Yf, Yt)
    p_split = prof(Yf, Ys)
    ks = [1, 3, 5, 10, 20, 30, 50, 75, 100, 150, 200, 300, nit - 1]
    print(f"{'k':>5} {'scan-vs-f64':>12} {'fused-vs-f64':>13} "
          f"{'fused-vs-scan':>14}")
    for k in ks:
        if k < nit:
            print(f"{k:5d} {p_scan[k]:12.3e} {p_fused[k]:13.3e} "
                  f"{p_split[k]:14.3e}")
    print("max over steps:",
          f"scan {p_scan.max():.3e} fused {p_fused.max():.3e} "
          f"split {p_split.max():.3e}")
    # SSE-level comparison (what the decisions integrate)
    sse = lambda Y: ((Y - problem.Yref[None, :nit]) ** 2).sum(axis=(1, 2))
    Fs, Ff, Ft = sse(Ys), sse(Yf), sse(Yt)
    rd = lambda F: np.abs(F - Ft) / np.abs(Ft)
    print("SSE rel dev: scan", float(rd(Fs).max()),
          "fused", float(rd(Ff).max()))

    # ---- structure of the split -------------------------------------
    # one-step shift? (stream-indexing bug would make Yf[k] ~ Ys[k-1])
    print("shift tests: |Yf[k]-Ys[k]|", float(np.abs(Yf - Ys).max()),
          " |Yf[k]-Ys[k-1]|",
          float(np.abs(Yf[:, 1:] - Ys[:, :-1]).max()),
          " |Yf[k]-Ys[k+1]|",
          float(np.abs(Yf[:, :-1] - Ys[:, 1:]).max()))
    print("U split:", float(np.abs(Uf - Us).max()),
          " U shift-1:", float(np.abs(Uf[:, 1:] - Us[:, :-1]).max()))
    # per-candidate deviation: concentrated on specific (N, Nu) lanes?
    dev = np.abs(Yf - Ys).max(axis=(1, 2))
    order = np.argsort(dev)[::-1]
    print("per-candidate max dev (worst 10):")
    for i in order[:10]:
        print(f"  N={N_b[i]:3d} Nu={Nu_b[i]} dev {dev[i]:.3e} "
              f"Frel {abs(Ff[i]-Ft[i])/abs(Ft[i]):.3e}")
    print("best 5:")
    for i in order[-5:]:
        print(f"  N={N_b[i]:3d} Nu={Nu_b[i]} dev {dev[i]:.3e}")
    # earliest step where each candidate's U departs at >1e-4
    dU = np.abs(Uf - Us).max(axis=2)
    for i in order[:3]:
        ks_bad = np.where(dU[i] > 1e-4)[0]
        print(f"  cand N={N_b[i]} Nu={Nu_b[i]} first bad U step:",
              ks_bad[:8].tolist())
    np.save("/tmp/diag_Ys.npy", Ys)
    np.save("/tmp/diag_Yf.npy", Yf)
    np.save("/tmp/diag_Us.npy", Us)
    np.save("/tmp/diag_Uf.npy", Uf)
    np.save("/tmp/diag_Yt.npy", Yt)


if __name__ == "__main__":
    main()
