"""Tuning-outcome parity: the repo's tuned artifacts must achieve a VNS
objective F (VNS2.m:195 semantics) at least as low as the reference's
committed tuned artifacts — evaluated on the SAME engine, SAME objective,
SAME conditioned frame (the reference's L/R).  f64 CPU evaluation.

This is the cross-evaluation demanded by round-1 VERDICT item 1; the
committed table lives in checkpoints/parity_cross_eval.json / PARITY.md.
"""

import numpy as np
import pytest

from mpc_tuning_tpu.cases.cross_eval import cross_eval_case

CASES = ["Shell3x3", "Shell3x3_caso2", "Shell7x5", "VanDeVusse_NMPC"]


@pytest.mark.parametrize("name", CASES)
def test_repo_tuning_beats_reference_on_vns_objective(name):
    r = cross_eval_case(name)
    assert "repo" in r, f"no committed repo artifact for {name}"
    assert np.isfinite(r["repo"]["F_vns"]) and np.isfinite(r["ref"]["F_vns"])
    assert r["repo"]["F_vns"] <= r["ref"]["F_vns"], (
        f"{name}: repo F_vns {r['repo']['F_vns']:.2f} > "
        f"ref {r['ref']['F_vns']:.2f}"
    )
