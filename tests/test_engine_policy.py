"""Production engine policy: stage/band/shape-aware 'auto' resolution,
VMEM-viability guards, and qp_method spec parsing."""

from mpc_tuning_tpu.ops.qp import admm_fused_max_lanes, fused_pdip_viable
from mpc_tuning_tpu.sim.mpc_loop import parse_qp_method
from mpc_tuning_tpu.tuning.objectives import resolve_qp_method

WB = dict(p_max=127, m_max=15, ny=2, nu=2, with_y=False, rho=1e5)
S3 = dict(p_max=127, m_max=15, ny=3, nu=3, with_y=False, rho=1e5)
S7 = dict(p_max=127, m_max=15, ny=7, nu=3, with_y=True, rho=1e5)


def test_parse_qp_method_specs():
    assert parse_qp_method("pdip_ws_fused") == ("pdip_ws_fused", 128, "trinv", 0, 0)
    assert parse_qp_method("pdip_ws_fused@256") == ("pdip_ws_fused", 256, "trinv", 0, 0)
    assert parse_qp_method("pdip_ws_fused/subst") == ("pdip_ws_fused", 128, "subst", 0, 0)
    assert parse_qp_method("pdip_ws_fused@256/subst") == ("pdip_ws_fused", 256, "subst", 0, 0)
    assert parse_qp_method("admm_fused@512") == ("admm_fused", 512, "trinv", 0, 0)
    assert parse_qp_method("admm_sim_fused@512") == ("admm_sim_fused", 512,
                                                     "trinv", 0, 0)
    assert parse_qp_method("admm") == ("admm", 128, "trinv", 0, 0)
    # +split = two-stage eps-split: -1 reuses qp_iters for stage 2,
    # +splitN runs N stage-2 iterations
    assert parse_qp_method("pdip_ws_fused+split") == ("pdip_ws_fused", 128, "trinv", -1, 0)
    assert parse_qp_method("pdip_ws_lanes+split15") == ("pdip_ws_lanes", 128, "trinv", 15, 0)
    assert parse_qp_method("pdip_ws_fused@256/subst+split") == ("pdip_ws_fused", 256, "subst", -1, 0)
    # +lp[N] = stage-0 slack LP replaces the joint stage 1 (implies the
    # split; default 12 LP iterations); order-independent with +split
    assert parse_qp_method("pdip_ws_fused+lp") == ("pdip_ws_fused", 128, "trinv", -1, 12)
    assert parse_qp_method("pdip_ws_fused+lp20+split15") == ("pdip_ws_fused", 128, "trinv", 15, 20)
    assert parse_qp_method("pdip_ws_lanes+split15+lp20") == ("pdip_ws_lanes", 128, "trinv", 15, 20)
    assert parse_qp_method("pdip_ws_fused@256+lp8+split10") == ("pdip_ws_fused", 256, "trinv", 10, 8)


def test_fused_pdip_vmem_viability():
    """Against the real ~128 MB v5e VMEM (round-4 on-chip probe; the
    round-3 '16 MB wall' was Mosaic's default scoped limit) every tuning
    shape fits, including Shell7x5's 18 MB T2T table; the guard still
    rejects a shape engineered past the 96 MB budget."""
    assert fused_pdip_viable(**{k: WB[k] for k in
                                ("p_max", "m_max", "ny", "nu", "with_y")})
    assert fused_pdip_viable(**{k: S3[k] for k in
                                ("p_max", "m_max", "ny", "nu", "with_y")})
    assert fused_pdip_viable(**{k: S7[k] for k in
                                ("p_max", "m_max", "ny", "nu", "with_y")})
    # a deliberately absurd shape still trips the guard
    assert not fused_pdip_viable(1023, 63, 8, 8, True)


def test_admm_fused_lane_autosizing():
    assert admm_fused_max_lanes(127, 15, 2, 2, False) == 512
    assert admm_fused_max_lanes(127, 15, 3, 3, False) == 512
    # Shell7x5's mc_pad=1960 row vectors fit at the real VMEM budget
    # (512 stays the cap until wider blocks requalify on-chip)
    assert admm_fused_max_lanes(127, 15, 7, 3, True) == 512


def test_auto_resolution_on_tpu_backend(monkeypatch):
    """The TPU policy branch (exercised on CPU via a backend monkeypatch):
    VNS tracking -> fused ADMM with shape-sized lanes; GAM -> fused PDIP
    where VMEM-viable, lanes at the Shell7x5 shape; band -> never ADMM."""
    import jax

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    # round 5: VNS tracking resolves to the whole-SIM fused ADMM kernel
    # (decision-qualified at zero flips after the candidate-table
    # precision fix, checkpoints/sim_fused_qualification.json);
    # MPCLoop.closed_batch falls back to admm_fused@lanes outside its
    # envelope (mesh / with_y / VMEM-infeasible (nit, shape) blocks)
    assert resolve_qp_method("auto", stage="vns",
                             dims=WB) == "admm_sim_fused@512"
    assert resolve_qp_method("auto", stage="vns",
                             dims=S3) == "admm_sim_fused@512"
    assert resolve_qp_method("auto", stage="vns",
                             dims=S7) == "admm_sim_fused@512"
    # band control never runs ADMM (documented stall on the ECR band QP)
    # and always two-stage eps-splits (joint IPMs stall on the band scale
    # mix — sim/mpc_loop.parse_qp_method); round 5: the whole-sim band
    # kernel carries the same '+lp20+split12' algorithm in one Pallas
    # call (f64-identical to the scan split)
    assert resolve_qp_method("auto", stage="vns", band=True,
                             dims=S7) == "pdip_sim_fused+lp20+split12"
    assert resolve_qp_method("auto", stage="gam", band=True,
                             dims=S7) == "pdip_sim_fused+lp20+split12"
    # round 5: tracking GAM resolves to the whole-SIM PDIP kernel
    # (CMA-trajectory-qualified, checkpoints/sim_pdip_qualification.json)
    assert resolve_qp_method("auto", stage="gam",
                             dims=WB) == "pdip_sim_fused@128"
    assert resolve_qp_method("auto", stage="gam",
                             dims=S3) == "pdip_sim_fused@128"
    # Shell7x5 is with_y: outside the whole-sim envelope, stays on the
    # step-fused PDIP (VMEM-viable since the round-4 probe + raised
    # Mosaic limit)
    assert resolve_qp_method("auto", stage="gam", dims=S7) == "pdip_ws_fused"


def test_auto_resolution_on_cpu_backend():
    """On the CPU test backend every stage resolves to the f64-grade
    lane-major jnp engine (the parity/cross-eval frame)."""
    for stage in ("gam", "vns"):
        assert resolve_qp_method("auto", band=False, stage=stage,
                                 dims=WB) == "pdip_ws_lanes"
        assert resolve_qp_method("auto", band=True, stage=stage,
                                 dims=WB) == "pdip_ws_lanes+lp20+split12"
    # explicit names always pass through
    assert resolve_qp_method("admm", stage="vns") == "admm"
    assert resolve_qp_method("pdip_ws_fused@256") == "pdip_ws_fused@256"
