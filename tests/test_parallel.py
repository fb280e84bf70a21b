"""Sharded candidate sweeps on the virtual 8-device CPU mesh."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mpc_tuning_tpu.parallel.sweep import (
    candidate_mesh, pad_to_multiple, shard_candidates,
)


def test_mesh_has_8_devices():
    mesh = candidate_mesh()
    assert mesh.devices.size == 8


def test_pad_to_multiple():
    a = np.arange(10).reshape(10, 1)
    p, n = pad_to_multiple(a, 8)
    assert p.shape == (16, 1) and n == 10
    assert np.all(p[10:] == a[-1])


def test_sharded_tuning_problem_matches_unsharded():
    """GAM objective evaluation with problem.mesh set must equal the
    single-device result (pure data parallelism)."""
    from mpc_tuning_tpu.cases import woodberry
    from mpc_tuning_tpu.tuning.api import build_problem
    from mpc_tuning_tpu.tuning.objectives import gam_sse_batch

    case = woodberry.make_case(nit=60, nbp=5, nbc=3)
    problem, _ = build_problem(case, dtype=jnp.float64, qp_iters=15)
    rng = np.random.default_rng(0)
    X = rng.uniform(0.05, 2.0, size=(6, 4))  # 6 candidates (pads to 8)

    F0 = gam_sse_batch(problem, 12, 3, X)
    problem.mesh = candidate_mesh()
    F1 = gam_sse_batch(problem, 12, 3, X)
    np.testing.assert_allclose(F1, F0, rtol=1e-10)


def test_global_argmin_shard_map():
    from mpc_tuning_tpu.parallel.sweep import global_argmin_shard_map

    mesh = candidate_mesh()
    vals = jnp.asarray(np.array([5.0, 3.0, 9.0, 1.5, 7.0, 2.0, 8.0, 4.0]))

    def local_fn(v):
        return v  # objective is the value itself

    vmin, gidx = global_argmin_shard_map(mesh, local_fn, (vals,), 8)
    assert vmin == 1.5 and gidx == 3


def test_mesh_hybrid_tune_alternation_matches_unsharded():
    """One full GAM<->VNS alternation with problem.mesh set over the
    virtual 8-device mesh must reproduce the unsharded incumbents
    bit-identically (the production path behind mpc_tuning(mesh=...) /
    `mpc-tuning-run --mesh auto`)."""
    from mpc_tuning_tpu.cases import woodberry
    from mpc_tuning_tpu.tuning.api import build_problem, hybrid_tune

    case = woodberry.make_case(nit=40, nbp=4, nbc=2)
    problem, _ = build_problem(case, dtype=jnp.float64, qp_iters=10)
    x0 = np.concatenate([case.ov_weight0, case.mvrate_weight0])
    kw = dict(gam_popsize=4, gam_generations=2, max_alternations=1,
              seed=0, verbose=False, final_polish=False, joint_polish=False)
    best_r, d_r, l_r, F_r, _, _ = hybrid_tune(problem, case.nbp, case.nbc,
                                              x0, **kw)
    problem.mesh = candidate_mesh()
    best_s, d_s, l_s, F_s, _, _ = hybrid_tune(problem, case.nbp, case.nbc,
                                              x0, **kw)
    assert best_s["N"] == best_r["N"]
    assert np.array_equal(best_s["Nu"], best_r["Nu"])
    assert np.array_equal(d_s, d_r)
    assert np.array_equal(l_s, l_r)
    # objective to machine precision (per-shard XLA tilings differ by ulps)
    assert abs(F_s - F_r) <= 1e-12 * max(1.0, abs(F_r))


def test_mesh_build_problem_and_cli_flag():
    """mpc_tuning's mesh= parameter reaches the TuningProblem."""
    from mpc_tuning_tpu.cases import woodberry
    from mpc_tuning_tpu.tuning.api import build_problem

    mesh = candidate_mesh()
    case = woodberry.make_case(nit=20, nbp=4, nbc=2)
    problem, _ = build_problem(case, dtype=jnp.float64, qp_iters=5,
                               mesh=mesh)
    assert problem.mesh is mesh
