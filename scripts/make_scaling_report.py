"""Assemble checkpoints/scaling_report.json from the three measurement
phases of mpc_tuning_tpu/parallel/report.py, each in its own clean
subprocess (the TPU phase needs the axon backend; the CPU-mesh and
2-process phases need a fresh interpreter with
--xla_force_host_platform_device_count before jax initializes).

Usage: python scripts/make_scaling_report.py [--skip-tpu]
"""

import argparse
import json
import os
import pathlib
import subprocess
import sys

ROOT = pathlib.Path(__file__).resolve().parents[1]


def run_phase(args, env_extra=None, timeout=3600, keep_pythonpath=False):
    env = dict(os.environ)
    if keep_pythonpath:
        # the TPU phase needs the axon plugin's sitecustomize, which rides
        # the inherited PYTHONPATH — append the repo instead of replacing
        env["PYTHONPATH"] = os.pathsep.join(
            [p for p in [env.get("PYTHONPATH"), str(ROOT)] if p])
    else:
        env["PYTHONPATH"] = str(ROOT)
    if env_extra:
        env.update(env_extra)
    out = ROOT / "checkpoints" / f"_scaling_{args[0].lstrip('-')}.json"
    cmd = [sys.executable, "-m", "mpc_tuning_tpu.parallel.report",
           *args, "--out", str(out)]
    r = subprocess.run(cmd, env=env, capture_output=True, text=True,
                       timeout=timeout, cwd=ROOT)
    if r.returncode != 0 or not out.exists():
        return {"phase": args[0], "error": (r.stdout[-300:] + r.stderr[-500:])}
    doc = json.loads(out.read_text())
    out.unlink()
    return doc


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-tpu", action="store_true")
    ap.add_argument("--batch", type=int, default=1024)
    args = ap.parse_args()

    rows = []
    meta = {}
    if not args.skip_tpu:
        doc = run_phase(["--tpu"], keep_pythonpath=True)
        rows += doc.get("rows", [doc])
        meta.update({k: v for k, v in doc.items() if k != "rows"})
    cpu_env = {"JAX_PLATFORMS": "cpu",
               "XLA_FLAGS": "--xla_force_host_platform_device_count=8"}
    doc = run_phase(["--cpu-mesh", "--batch", str(args.batch)], cpu_env)
    rows += doc.get("rows", [doc])
    meta.update({k: v for k, v in doc.items() if k != "rows"})
    doc = run_phase(["--two-process", "--batch", str(args.batch)], cpu_env)
    rows += doc.get("rows", [doc])

    final = {"rows": rows, **meta,
             "host": {"physical_cores": os.cpu_count()},
             "reading_guide": "real_tpu_chip rows are absolute "
             "production-engine throughput + candidate weak scaling on "
             "the one attached chip; virtual_cpu_mesh rows validate "
             "sharding MECHANICS and are normalized by the 2-core bound "
             "(8 virtual devices share 2 physical cores, so "
             "efficiency_vs_1 is core-limited by construction); the "
             "jax_distributed_2proc row validates multi-host "
             "orchestration end-to-end on the same workload shape."}
    p = ROOT / "checkpoints" / "scaling_report.json"
    p.write_text(json.dumps(final, indent=1))
    print(json.dumps(final, indent=1))


if __name__ == "__main__":
    main()
