"""Linear MPC closed-loop + single-shot open-loop evaluators.

TPU-native equivalent of
/root/reference/MPC-Tuning/MPC_Tuning/closedloop_toolbox.m:
 * closed loop = per-step [Kalman update -> condensed QP -> first move ->
   plant step] as a pure `lax.scan` (the reference calls the toolbox
   ``sim(mpcobj,nit,r,v)``, line 50);
 * open loop = solve the QP once from rest with the final setpoint, play
   the full optimal sequence through the model (lines 83-100) — the
   horizon-sanity signal used by the VNS objective (VNS2.m:171-177).

All signals here are in CONDITIONED units (the L/R conditioning of
MPCTuning.m:152-200 is applied by the caller); ScaleFactor scaling is
internal to the controller.  Everything is shape-static at (p_max, m_max)
so `vmap` over candidates (N, Nu, delta, lambda) compiles once.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from mpc_tuning_tpu.models.lti import DiscreteSS
from mpc_tuning_tpu.ops.mpc_qp import (
    MPCController,
    assemble_candidate,
    controller_arrays,
    qp_step_data,
)
from mpc_tuning_tpu.ops.qp import (
    solve_qp, solve_qp_admm, solve_qp_admm_fast, solve_qp_masked,
    solve_qp_masked_fast)

__all__ = ["MPCLoop"]


def _auto_pallas(use_pallas):
    if use_pallas is None:
        return jax.default_backend() != "cpu"
    return bool(use_pallas)


_SHARD_MAPPED_CACHE: dict = {}


def _shard_mapped(batch_fn, mesh, statics, batched_dims, out_dims):
    """Wrap a jitted candidate-batched evaluator in shard_map over ``mesh``.

    batched_dims: per positional arg (after the constants dict), the ndim of
    a candidate-axis-0 sharded input, or None for a replicated input.
    The candidate axis is split over ALL mesh axes flattened, so the same
    wrapper serves a 1-D device mesh and the multihost (host, ici) grid.
    Inside the shard body every device sees only its local candidate shard,
    which is exactly what the Pallas lane-major engines expect.

    Memoized on the full wrapper identity: jax.jit's executable cache is
    keyed on function identity, so building a fresh closure per call would
    retrace + recompile every candidate-batch evaluation (GAM/VNS make
    hundreds per run; TPU compiles through the tunnel cost minutes)."""
    key = (batch_fn, mesh, statics, batched_dims, out_dims)
    cached = _SHARD_MAPPED_CACHE.get(key)
    if cached is not None:
        return cached

    from jax.sharding import PartitionSpec as P

    from mpc_tuning_tpu.parallel.sweep import _cand_spec

    def body(c_, *args):
        return batch_fn(c_, *args, *statics)

    in_specs = (P(),) + tuple(
        P() if nd is None else _cand_spec(mesh, nd) for nd in batched_dims)
    out_specs = tuple(_cand_spec(mesh, nd) for nd in out_dims)
    wrapped = jax.jit(jax.shard_map(body, mesh=mesh, in_specs=in_specs,
                                    out_specs=out_specs, check_vma=False))
    _SHARD_MAPPED_CACHE[key] = wrapped
    return wrapped


# Capacity buckets: a candidate batch whose horizons all fit (p_cap, m_cap)
# is simulated with the controller tensors SLICED to that capacity — the
# rows/columns beyond max(N)/max(Nu) are fully-masked exact zeros, so the
# result is unchanged while the per-step QP cost (Cholesky n^3, normal-
# matrix table matmul, constraint-row vector work) scales with the bucket
# instead of the tuner's bit-width maxima (2^nbp-1, 2^nbc-1,
# MPCTuning.m:270-289).  A small fixed bucket set keeps recompiles bounded.
_P_BUCKETS = (8, 16, 32, 48, 64, 96)
_M_BUCKETS = (2, 4, 8)


def horizon_caps(p_max, m_max, N_b, Nu_b):
    """Smallest (p_cap, m_cap) bucket covering the batch, or the maxima.
    Returns (p_max, m_max) unchanged when the batch is not host-readable
    (e.g. non-addressable multi-host shards)."""
    try:
        n_need = int(np.max(np.asarray(N_b)))
        m_need = int(np.max(np.asarray(Nu_b)))
    except Exception:
        return p_max, m_max
    p_cap = next((b for b in _P_BUCKETS if n_need <= b < p_max), p_max)
    m_cap = next((b for b in _M_BUCKETS if m_need <= b < m_max), m_max)
    return p_cap, m_cap


@dataclasses.dataclass
class MPCLoop:
    """Bound pair of (controller, true plant) ready to simulate."""

    ctl: MPCController
    plant_ss: DiscreteSS  # conditioned true plant, inputs [MV, MD]
    _cap_cache: dict = dataclasses.field(default_factory=dict, repr=False,
                                         compare=False)

    # static ints for jit
    @property
    def dims(self):
        s = self.ctl.spec
        return dict(
            p_max=s.p_max, m_max=s.m_max, ny=s.model.ny, nu=s.n_mv,
            nd=s.n_md, with_y=s.has_y_constraints, rho=float(s.rho_eps),
        )

    def capped(self, p_cap: int, m_cap: int) -> "MPCLoop":
        """Capacity-restricted view: controller prediction tensors sliced
        to (p_cap, m_cap).  EXACT for every candidate with N <= p_cap and
        Nu <= m_cap (the discarded rows/cols were fully-masked zeros)."""
        s = self.ctl.spec
        if (p_cap, m_cap) == (s.p_max, s.m_max):
            return self
        assert p_cap <= s.p_max and m_cap <= s.m_max, (p_cap, m_cap)
        key = (p_cap, m_cap)
        hit = self._cap_cache.get(key)
        if hit is None:
            ctl = self.ctl
            ny, nu = s.model.ny, s.n_mv
            spec2 = dataclasses.replace(s, p_max=p_cap, m_max=m_cap)
            Theta4 = ctl.Theta.reshape(s.p_max, ny, s.m_max, nu)
            ctl2 = MPCController(
                spec=spec2, aug=ctl.aug,
                A=ctl.A, Bu=ctl.Bu, Bv=ctl.Bv, C=ctl.C, Dv=ctl.Dv, M=ctl.M,
                Sx=ctl.Sx[:p_cap], Sstep=ctl.Sstep[: p_cap + 1],
                Sv=ctl.Sv[:p_cap],
                Theta=Theta4[:p_cap, :, :m_cap].reshape(p_cap * ny,
                                                        m_cap * nu),
                Tcum=np.kron(np.tril(np.ones((m_cap, m_cap))), np.eye(nu)),
                umin_s=ctl.umin_s, umax_s=ctl.umax_s,
                dumin_s=ctl.dumin_s, dumax_s=ctl.dumax_s,
                ymin_s=ctl.ymin_s, ymax_s=ctl.ymax_s,
            )
            hit = MPCLoop(ctl=ctl2, plant_ss=self.plant_ss)
            self._cap_cache[key] = hit
        return hit

    def arrays(self, dtype=jnp.float64):
        c = controller_arrays(self.ctl, dtype)
        c["A_pl"] = jnp.asarray(self.plant_ss.A, dtype)
        c["B_pl"] = jnp.asarray(self.plant_ss.B, dtype)
        c["C_pl"] = jnp.asarray(self.plant_ss.C, dtype)
        # conditioned internal model for the open-loop playback
        mss = self.ctl.spec.model
        c["A_pl_model"] = jnp.asarray(mss.A, dtype)
        c["B_pl_model"] = jnp.asarray(mss.B, dtype)
        c["C_pl_model"] = jnp.asarray(mss.C, dtype)
        return c

    @staticmethod
    def _sim_fused_viable(loop, nit, block_lanes) -> bool:
        """VMEM feasibility of the whole-sim kernel's per-block working
        set (trajectory streams + one-hot table are nit-dependent; the
        QP tables mirror the step-fused ADMM kernel's)."""
        s = loop.ctl.spec
        ny, nu, nd = s.model.ny, s.n_mv, s.n_md
        n = s.m_max * nu + 1
        n_pad = max(8, -(-n // 8) * 8)
        pny = s.p_max * ny
        mc = 4 * s.m_max * nu + 1 + (2 * pny if s.has_y_constraints else 0)
        mcp = max(8, -(-mc // 8) * 8)
        nxa = loop.ctl.A.shape[0]
        nxp = loop.plant_ss.A.shape[0]
        nv = ny + nxa + nxp + pny
        Bt = block_lanes
        fl = 4  # bytes, f32
        words = (
            nit * (2 * ny + nu) * Bt          # r + Y + U blocks
            + nit * nit + nv * nit            # one-hot + Vt tables
            + 3 * n_pad * n_pad * Bt          # Minv/Hp + factor scratch
            + (4 * n_pad + 4 * mcp + 5 * pny + 2 * ny + 2 * nu) * Bt
            + 2 * mcp * n_pad + pny * (nxa + nu + n_pad)     # G0/SxF/ThT
            + mcp * n_pad * n_pad             # T2T (PDIP/band kernels)
            + 2 * nxa * nxa + 2 * nxp * nxp   # model/plant tables (bound)
            + (3 * n_pad + 3 * mcp + 2 * pny + 8) * Bt       # working set
        )
        from mpc_tuning_tpu.ops.qp import _FUSED_VMEM_BUDGET

        return words * fl <= _FUSED_VMEM_BUDGET

    # ------------------------------------------------- batched tuning API
    def closed_batch(self, r_b, v, N_b, Nu_b, delta_b, lam_b, nit, dtype,
                     qp_iters, qp_method="pdip", use_pallas=None, mesh=None,
                     caps=None):
        """``mesh``: shard the candidate axis over a jax.sharding.Mesh —
        the eval runs under shard_map so every device (or host process)
        simulates only its candidate shard and the Pallas engines see
        per-device local batches (the scale-out axis of SURVEY.md §2.6;
        the reference evaluates candidates serially, MPCTuning.m:89).
        ``caps``: explicit (p_cap, m_cap) capacity bucket (default: derived
        from the batch via horizon_caps) — see ``capped``."""
        s = self.ctl.spec
        if caps is None:
            caps = horizon_caps(s.p_max, s.m_max, N_b, Nu_b)
        loop = self.capped(*caps)
        c = loop.arrays(dtype)
        d = loop.dims
        base, lanes, _, split_, lp_ = parse_qp_method(qp_method)
        if base == "pdip_sim_fused" and d["with_y"] and lp_ and split_ > 0:
            # whole-sim BAND engine: '+lpN+splitM' slack-LP split, the
            # entire loop in one kernel (closed_loop_batch_sim_band);
            # same envelope/fallback contract as the tracking kernels
            if mesh is not None or not self._sim_fused_viable(loop, nit,
                                                              lanes):
                qp_method = qp_method.replace("pdip_sim_fused",
                                              "pdip_ws_fused")
            else:
                args = (jnp.asarray(r_b, dtype)[:, :nit],
                        jnp.asarray(v[:nit], dtype),
                        jnp.asarray(N_b), jnp.asarray(Nu_b),
                        jnp.asarray(delta_b, dtype),
                        jnp.asarray(lam_b, dtype))
                return _closed_sim_band_jit(
                    c, *args, d["p_max"], d["m_max"], d["ny"], d["nu"],
                    d["with_y"], d["rho"], lp_, split_, lanes)
        if base == "admm_sim_fused":
            # whole-sim kernel: the entire closed loop in one Pallas call
            # per lane block (closed_loop_batch_sim_fused).  Outside its
            # envelope — mesh sharding (shard_map wrapping a single
            # full-trajectory pallas_call is untested), y-constrained
            # cases (band cases stay on PDIP anyway), or a VMEM-infeasible
            # (nit, shape) block — fall back to the step-fused ADMM scan
            # engine, which is algorithm-identical (same warm ADMM, same
            # constants; the whole-sim kernel only removes the per-step
            # XLA op overhead).
            if (mesh is not None or d["with_y"]
                    or not self._sim_fused_viable(loop, nit, lanes)):
                qp_method = f"admm_fused@{lanes}"
            else:
                args = (jnp.asarray(r_b, dtype)[:, :nit],
                        jnp.asarray(v[:nit], dtype),
                        jnp.asarray(N_b), jnp.asarray(Nu_b),
                        jnp.asarray(delta_b, dtype),
                        jnp.asarray(lam_b, dtype))
                return _closed_sim_fused_jit(
                    c, *args, d["p_max"], d["m_max"], d["ny"], d["nu"],
                    d["with_y"], d["rho"], qp_iters, lanes)
        elif base == "pdip_sim_fused":
            # whole-sim PDIP (GAM-stage speed path) — same envelope and
            # fallback contract as the whole-sim ADMM engine
            if (mesh is not None or d["with_y"]
                    or not self._sim_fused_viable(loop, nit, lanes)):
                qp_method = f"pdip_ws_fused@{min(lanes, 128)}"
            else:
                args = (jnp.asarray(r_b, dtype)[:, :nit],
                        jnp.asarray(v[:nit], dtype),
                        jnp.asarray(N_b), jnp.asarray(Nu_b),
                        jnp.asarray(delta_b, dtype),
                        jnp.asarray(lam_b, dtype))
                return _closed_sim_pdip_jit(
                    c, *args, d["p_max"], d["m_max"], d["ny"], d["nu"],
                    d["with_y"], d["rho"], qp_iters, lanes)
        statics = (d["p_max"], d["m_max"], d["ny"], d["nu"], d["with_y"],
                   d["rho"], qp_iters, qp_method, _auto_pallas(use_pallas))
        args = (jnp.asarray(r_b, dtype)[:, :nit], jnp.asarray(v[:nit], dtype),
                jnp.asarray(N_b), jnp.asarray(Nu_b),
                jnp.asarray(delta_b, dtype), jnp.asarray(lam_b, dtype))
        with jax.default_matmul_precision("highest"):
            if mesh is None:
                return closed_loop_batch(c, *args, *statics)
            return _shard_mapped(
                closed_loop_batch, mesh, statics,
                batched_dims=(3, None, 1, 1, 2, 2), out_dims=(3, 3),
            )(c, *args)

    def open_batch(self, rfin_b, v, N_b, Nu_b, delta_b, lam_b, nit, dtype,
                   qp_iters, use_pallas=None, mesh=None, caps=None,
                   qp_split=False, qp_lp=0):
        s = self.ctl.spec
        if caps is None:
            caps = horizon_caps(s.p_max, s.m_max, N_b, Nu_b)
        loop = self.capped(*caps)
        c = loop.arrays(dtype)
        d = loop.dims
        statics = (d["p_max"], d["m_max"], d["ny"], d["nu"], d["with_y"],
                   d["rho"], qp_iters, _auto_pallas(use_pallas),
                   bool(qp_split), int(qp_lp))
        args = (jnp.asarray(rfin_b, dtype), jnp.asarray(v[nit - 1], dtype),
                jnp.asarray(v[:nit], dtype),
                jnp.asarray(N_b), jnp.asarray(Nu_b),
                jnp.asarray(delta_b, dtype), jnp.asarray(lam_b, dtype))
        with jax.default_matmul_precision("highest"):
            if mesh is None:
                return open_loop_batch(c, *args, *statics)
            return _shard_mapped(
                open_loop_batch, mesh, statics,
                batched_dims=(2, None, None, 1, 1, 2, 2), out_dims=(3, 3),
            )(c, *args)

    # -------------------------------------------------------------- API
    def simulate(self, r, v, nit, N, Nu, delta, lam, dtype=jnp.float64,
                 qp_iters: int = 30, qp_method: str = "pdip",
                 use_pallas=None):
        """Closed loop.  r (nit, ny), v (nit, nd) conditioned units.
        Returns (y, u) conditioned, shapes (nit, ny), (nit, nu)."""
        c = self.arrays(dtype)
        d = self.dims
        with jax.default_matmul_precision("highest"):
            y, u = _closed_loop(
            c, jnp.asarray(r[:nit], dtype), jnp.asarray(v[:nit], dtype),
            jnp.asarray(N), jnp.asarray(Nu),
            jnp.asarray(delta, dtype), jnp.asarray(lam, dtype),
            d["p_max"], d["m_max"], d["ny"], d["nu"], d["with_y"], d["rho"],
            qp_iters, qp_method, _auto_pallas(use_pallas),
        )
        return np.asarray(y), np.asarray(u)

    def open_loop(self, r_final, v_final, v_traj, nit, N, Nu, delta, lam,
                  dtype=jnp.float64, qp_iters: int = 30,
                  qp_split: bool = False, qp_lp: int = 0):
        """Single-shot optimal sequence from rest played through the model.
        Returns (ys, uopt) conditioned, shapes (nit, ny), (nit, nu)."""
        c = self.arrays(dtype)
        d = self.dims
        with jax.default_matmul_precision("highest"):
            ys, uopt = _open_loop(
            c, jnp.asarray(r_final, dtype), jnp.asarray(v_final, dtype),
            jnp.asarray(v_traj[:nit], dtype),
            jnp.asarray(N), jnp.asarray(Nu),
            jnp.asarray(delta, dtype), jnp.asarray(lam, dtype),
            d["p_max"], d["m_max"], d["ny"], d["nu"], d["with_y"], d["rho"],
            qp_iters, False, bool(qp_split), int(qp_lp),
        )
        return np.asarray(ys), np.asarray(uopt)


# ---------------------------------------------------------------- kernels


def parse_qp_method(qp_method: str):
    """Split a qp_method spec into (base, fused_lanes, fused_solve, split,
    lp).

    The fused engine's compile-time knobs are threaded EXPLICITLY through
    the method string (no environment reads on the solver path):
      'pdip_ws_fused'            -> 128 lanes, 'trinv' solves (production)
      'pdip_ws_fused@256'        -> 256-lane blocks
      'pdip_ws_fused/subst'      -> serial-substitution solves
      'pdip_ws_fused@256/subst'  -> both
      '<any pdip engine>+split[N]' -> two-stage eps-split solve (band
          cases; N = stage-2 iteration count, default = qp_iters):
          stage 1 = the joint QP (pins the ECR slack, which lives in the
          well-conditioned rho_eps subspace); stage 2 re-solves with the
          slack FROZEN into the band rows' rhs and its column masked.
          Joint interior points stall ~5e-2 from the optimum on band
          steps where a large optimal slack (rho*eps^2 ~ 1e6) coexists
          with tiny move curvature (lambda^2 ~ 3e-4) — the split solves
          each scale in its own subproblem (measured 2e-8 vs the
          KKT-certified exact solution on the stall instance).
    """
    import re

    base = qp_method
    split = 0
    lp = 0
    m = re.search(r"\+lp(\d*)", base)
    if m:
        # '+lp[N]' replaces the joint stage 1 by the stage-0 SLACK LP
        # (minimize eps over the same constraint set, N PDIP iterations,
        # default 12; ops/mpc_qp assemble_candidate H_lp/f_lp docstring) —
        # the LP has no rho_eps/lambda^2 scale spread, so it pins the ECR
        # slack in far fewer iterations than the stalling joint solve
        # needs, and scipy's exact LP certifies it independently
        # (tests/test_band_oracle.py).  Implies the split; stage-2 count
        # comes from '+split<N>' (default qp_iters).
        lp = int(m.group(1)) if m.group(1) else 12
        base = base[:m.start()] + base[m.end():]
    m = re.search(r"\+split(\d*)", base)
    if m:
        split = int(m.group(1)) if m.group(1) else -1  # -1: reuse qp_iters
        base = base[:m.start()] + base[m.end():]
    if lp and split == 0:
        split = -1
    lanes, solve = 128, "trinv"
    if "/" in base:
        base, solve = base.split("/", 1)
    if "@" in base:
        base, lanes_s = base.split("@", 1)
        lanes = int(lanes_s)
    return base, lanes, solve, split, lp


# Dual-based slack-refinement pass for the '+lp' stage-2 — MEASURED
# DEAD-END, kept at 0: eps* = g/(2 rho) with g = sum lam_i|slack_col_i|
# (envelope theorem) would close the crossover regime's ~1e-5 du bias
# (eps* slightly positive while the LP minimum is 0), but on
# dual-degenerate steps the dual set is non-unique (near-parallel band
# rows break LICQ), g is dual-choice-dependent, and the pass introduced
# a 6.7e-5 du error on a GI-certified eps=0 step while fixing a 6.5e-5
# one elsewhere.  The crossover bias is bounded by g/(2 rho) ~ 1e-5 —
# far below the f32 noise floor and the old split15 chain's ~0.4 error
# on degenerate steps (tests/test_band_oracle.py gates the rest).
_LP_REFINE_ITERS = 0

# PDIP polish length of the 'hybrid[_fused]' GAM-stage engine
_HYBRID_POLISH_ITERS = 5


def _seed_slack(z0, lam0, c, cand, h):
    """Transition-aware warm start for the stage-0 slack LP: raise the
    iterate's ECR slack to the CURRENT step's own violation level (one
    shared-G0 matvec), and COLD-RESTART the duals on lanes where the
    slack scale jumped.  Disturbance entries jump the optimal slack
    discontinuously (Shell7x5: 0 -> 33.4 at the k=20 MD step); a warm
    interior point spends ~30 iterations escaping the stale slack scale
    and its committed duals (scripts/band_step_diag.py)."""
    Gz = cand["rmask"] * ((cand["cmask_z"] * z0) @ c["G0"].T)
    viol = jnp.maximum(Gz - h, 0.0)
    V = jnp.maximum(-c["G0"][:, -1], 0.0)
    extra = jnp.max(jnp.where(V > 1e-12, viol / jnp.maximum(V, 1e-12), 0.0),
                    axis=-1)
    eps_w = jnp.maximum(z0[..., -1], 0.0)
    z0 = z0.at[..., -1].set(eps_w + extra + 1e-6)
    jumped = extra > 1e-3 * (1.0 + eps_w)
    lam0 = jnp.where(jumped[..., None] if lam0.ndim > 1 else jumped,
                     jnp.ones_like(lam0), lam0)
    return z0, lam0


def _eps_split_stage2(solve_fn, z1, lam1, s1, c, cand, h, stage2_iters,
                      init2=None, full_state=False, refine_iters=0):
    """Stage 2 of the eps-split band solve (see parse_qp_method): freeze
    the ECR slack, fold it into the constraint rhs via the shared G0
    slack column, mask the slack variable, and re-solve warm-started.

    The frozen value ehat is stage 1's slack PLUS stage 1's own residual
    soft-row violation mapped through the ECR coefficients — so the point
    (du_1, ehat) is feasible for stage 2 BY CONSTRUCTION even when
    stage 1 stalled with its slack underestimated (the degenerate band
    steps where every joint interior point in the family stalls;
    measured: freezing the raw slack left stage 2 ~0.2 infeasible there).
    Exact up to the margin: the slack lives in the well-conditioned
    rho_eps subspace, and du re-solves without the ~1e10 objective-scale
    spread (2e-8 vs the KKT-certified exact solution on the stall
    instance)."""
    slack_col = c["G0"][:, -1]
    # stage-1 residual violation of the soft rows, per unit of slack
    Gz1 = cand["rmask"] * ((cand["cmask_z"] * z1) @ c["G0"].T)
    viol = jnp.maximum(Gz1 - h, 0.0)
    V = jnp.maximum(-slack_col, 0.0)
    extra = jnp.max(jnp.where(V > 1e-12, viol / jnp.maximum(V, 1e-12), 0.0),
                    axis=-1)
    # feasibility margin at the precision noise floor: the relative part
    # feeds straight into the frozen band rows' rhs, so an oversized
    # margin IS the stage-2 du error floor (measured 2.6e-5 at 1e-6
    # relative on the eps=33.4 Shell7x5 steps; 1e-9 clears the oracle
    # gate at f64)
    if z1.dtype == jnp.float64:
        m_rel, m_abs = 1e-9, 1e-11
    else:
        m_rel, m_abs = 1e-6, 1e-8
    ehat = ((jnp.maximum(z1[..., -1], 0.0) + extra) * (1.0 + m_rel) + m_abs)
    # masked rows keep h unchanged only in effect (rmask zeroes their G
    # rows; their h shift is harmless and keeps s = h2 > 0)
    h2 = h - slack_col * cand["rmask"] * ehat[..., None]
    cmask2 = cand["cmask_z"].at[-1].set(0.0)
    if init2 is None:
        # default: warm-start from stage 1's own iterate (slack zeroed)
        init2 = (z1.at[..., -1].set(0.0), lam1, s1)
    z2, lam2, s2 = solve_fn(h2, cmask2, init2, stage2_iters)
    if refine_iters:
        # Dual-based slack refinement — see the _LP_REFINE_ITERS note
        # (kept for instrumentation; unsound as a default because g is
        # dual-choice-dependent on the LICQ-violating band steps).
        g = -jnp.sum(lam2 * cand["rmask"] * slack_col, axis=-1)
        eps_star = g / cand["H"][..., -1, -1]  # H[-1,-1] = 2 rho_eps
        ehat2 = jnp.maximum(ehat, eps_star)
        h2b = h - slack_col * cand["rmask"] * ehat2[..., None]
        z2, lam2, s2 = solve_fn(h2b, cmask2, (z2, lam2, s2), refine_iters)
    if full_state:
        return z2, lam2, s2
    return z2


def closed_loop_core(c, r, v, N, Nu, delta, lam,
                     p_max, m_max, ny, nu, with_y, rho, qp_iters,
                     qp_method="pdip", use_pallas=False):
    """Un-jitted closed-loop scan — vmap over (N, Nu, delta, lam) for the
    candidate-batched tuning path.

    qp_method:
      'pdip' — fixed-iteration interior point per step (high accuracy,
               reference path);
      'admm' — OSQP-style ADMM with a per-candidate precomputed inverse and
               the (x, z, y) state WARM-STARTED across timesteps; matmul-only
               iterations, the TPU-fast path (qp_iters = ADMM iterations).
    """
    dtype = r.dtype
    (qp_method, fused_lanes, fused_solve, qp_split,
     qp_lp) = parse_qp_method(qp_method)
    if qp_lp and qp_method not in ("pdip", "pdip_ws", "pdip_ws_lanes",
                                   "pdip_ws_fused"):
        raise ValueError(f"'+lp' requires a pdip engine, got {qp_method!r}")
    cand = assemble_candidate(c, N, Nu, delta, lam, p_max, m_max, ny, nu,
                              rho, with_y)
    nxa = c["A"].shape[0]
    nxp = c["A_pl"].shape[0]
    nz = cand["H"].shape[0]
    mc = cand["G"].shape[0]
    sf_y, sf_u, sf_v = c["sf_y"], c["sf_u"], c["sf_v"]

    def step(state, inp):
        x_pl, x_hat_pred, u_prev, ws = state
        rk, vk = inp
        y = c["C_pl"] @ x_pl
        y_s = y / sf_y
        v_s = vk / sf_v if vk.shape[0] else vk
        r_s = rk / sf_y

        innov = y_s - c["C"] @ x_hat_pred - (c["Dv"] @ v_s if vk.shape[0] else 0.0)
        x_hat = x_hat_pred + c["M"] @ innov

        f, h, _ = qp_step_data(c, cand, x_hat, u_prev, r_s, v_s,
                               p_max, m_max, ny, nu, with_y)
        if qp_method == "admm":
            z, ws = solve_qp_admm(cand["admm"], f, h, ws, iters=qp_iters)
        elif qp_method == "admm_fused":
            # warm ADMM with ALL iterations in ONE Pallas kernel call per
            # step (ops/pallas_kernels.admm_fused_lanes) — the tracking-case
            # tuning speed path (band cases stay on PDIP)
            z, ws = solve_qp_admm_fast(
                cand["admm"], f, h, cand["rmask"], cand["cmask_z"], c["G0"],
                ws, qp_iters, block_lanes=fused_lanes)
        elif qp_method in ("hybrid", "hybrid_fused"):
            # GAM-stage hybrid (round-3 verdict item, qualified round 5):
            # a warm whole-ADMM prefix (qp_iters iterations; matmul-only,
            # ~6-op dependency chain per iteration) followed by a SHORT
            # warm PDIP polish initialized at the ADMM point with the
            # ADMM duals.  ADMM alone rank-flips the GAM objective at
            # large gaps on extreme weight vectors (PERF.md engine
            # policy); the polish restores PDIP-grade accuracy at a
            # fraction of the fused PDIP's serial-Cholesky chain.
            z_a, ws = solve_qp_admm_fast(
                cand["admm"], f, h, cand["rmask"], cand["cmask_z"],
                c["G0"], ws, qp_iters, block_lanes=fused_lanes)
            y_a = ws[2]
            z, _, _ = solve_qp_masked_fast(
                cand["H"], f, c["G0"], c["T2"], cand["rmask"],
                cand["cmask_z"], h, _HYBRID_POLISH_ITERS, use_pallas,
                (z_a, y_a, jnp.ones_like(y_a)),
                engine="fused" if qp_method == "hybrid_fused" else "lanes",
                block_lanes=fused_lanes, solve_mode=fused_solve)
        elif qp_method in ("pdip_ws_lanes", "pdip_ws_fused"):
            # warm-started PDIP through the lane-major batched engine: under
            # vmap over candidates the custom_vmap rule runs the whole
            # interior point in the Pallas kernels' native (k, B) layout —
            # zero transposes per iteration (ops/qp.solve_qp_masked_lanes);
            # 'pdip_ws_fused' runs ALL iterations inside ONE Pallas kernel
            # call per step (ops/pallas_kernels.pdip_fused_lanes)
            eng = "fused" if qp_method == "pdip_ws_fused" else "lanes"

            def _solve(h_, cmask_, init_, iters_=qp_iters):
                return solve_qp_masked_fast(
                    cand["H"], f, c["G0"], c["T2"], cand["rmask"],
                    cmask_, h_, iters_, use_pallas, init_,
                    engine=eng, block_lanes=fused_lanes,
                    solve_mode=fused_solve)

            if qp_lp:
                # stage 0 slack LP replaces the joint stage 1 (band
                # engine, '+lp' in parse_qp_method): slack-seeded warm
                # start across steps; stage 2 inits from the SAME-step LP
                # state (cross-step stage-2 warm starts measurably stall
                # at disturbance entries — scripts/band_step_diag.py)
                def _solve_lp(h_, cmask_, init_, iters_):
                    return solve_qp_masked_fast(
                        cand["H_lp"], cand["f_lp"], c["G0"], c["T2"],
                        cand["rmask"], cmask_, h_, iters_, use_pallas,
                        init_, engine=eng, block_lanes=fused_lanes,
                        solve_mode=fused_solve)

                z0l, lam0l, s0l = ws
                z0l, lam0l = _seed_slack(z0l, lam0l, c, cand, h)
                z1, lam1, s1 = _solve_lp(h, cand["cmask_z"],
                                         (z0l, lam0l, s0l), qp_lp)
                ws = (z1, lam1, s1)
                z = _eps_split_stage2(
                    _solve, z1, lam1, s1, c, cand, h,
                    qp_split if qp_split > 0 else qp_iters,
                    refine_iters=_LP_REFINE_ITERS)
            else:
                z, lam_w, s_w = _solve(h, cand["cmask_z"], ws)
                ws = (z, lam_w, s_w)
                if qp_split:
                    z = _eps_split_stage2(
                        _solve, z, lam_w, s_w, c, cand, h,
                        qp_split if qp_split > 0 else qp_iters)
        elif qp_method == "pdip_ws":
            def _solve(h_, cmask_, init_, iters_=qp_iters):
                return solve_qp_masked(
                    cand["H"], f, c["G0"], c["T2"], cand["rmask"],
                    cmask_, h_, iters=iters_, use_pallas=use_pallas,
                    init=init_)

            if qp_lp:
                def _solve_lp(h_, cmask_, init_, iters_):
                    return solve_qp_masked(
                        cand["H_lp"], cand["f_lp"], c["G0"], c["T2"],
                        cand["rmask"], cmask_, h_, iters=iters_,
                        use_pallas=use_pallas, init=init_)

                z0l, lam0l, s0l = ws
                z0l, lam0l = _seed_slack(z0l, lam0l, c, cand, h)
                z1, lam1, s1 = _solve_lp(h, cand["cmask_z"],
                                         (z0l, lam0l, s0l), qp_lp)
                ws = (z1, lam1, s1)
                z = _eps_split_stage2(
                    _solve, z1, lam1, s1, c, cand, h,
                    qp_split if qp_split > 0 else qp_iters,
                    refine_iters=_LP_REFINE_ITERS)
            else:
                z, lam_w, s_w = _solve(h, cand["cmask_z"], ws)
                ws = (z, lam_w, s_w)
                if qp_split:
                    z = _eps_split_stage2(
                        _solve, z, lam_w, s_w, c, cand, h,
                        qp_split if qp_split > 0 else qp_iters)
        elif qp_method == "pdip_dense":
            z, _, _ = solve_qp(cand["H"], f, cand["G"], h, iters=qp_iters,
                               use_pallas=use_pallas)
        elif qp_method == "pdip":  # cold-start structured PDIP (reference-accurate)
            def _solve(h_, cmask_, init_, iters_=qp_iters):
                return solve_qp_masked(
                    cand["H"], f, c["G0"], c["T2"], cand["rmask"],
                    cmask_, h_, iters=iters_, use_pallas=use_pallas,
                    init=init_)

            if qp_lp:
                z1, lam1, s1 = solve_qp_masked(
                    cand["H_lp"], cand["f_lp"], c["G0"], c["T2"],
                    cand["rmask"], cand["cmask_z"], h, iters=qp_lp,
                    use_pallas=use_pallas, init=None)
                z = _eps_split_stage2(_solve, z1, lam1, s1, c, cand, h,
                                      qp_split if qp_split > 0 else qp_iters,
                                      refine_iters=_LP_REFINE_ITERS)
            else:
                z, lam1, s1 = _solve(h, cand["cmask_z"], None)
                if qp_split:
                    z = _eps_split_stage2(
                        _solve, z, lam1, s1, c, cand, h,
                        qp_split if qp_split > 0 else qp_iters)
        else:  # trace-time guard: a typo'd engine must not silently run pdip
            raise ValueError(
                f"unknown qp_method {qp_method!r}; use 'auto' via "
                "TuningProblem or one of pdip/pdip_dense/pdip_ws/"
                "pdip_ws_lanes/pdip_ws_fused[@lanes][/mode]/hybrid[_fused]/admm/"
                "admm_fused[@lanes]")
        du = z[:nu]
        u_s = u_prev + du

        x_hat_pred = c["A"] @ x_hat + c["Bu"] @ u_s + (
            c["Bv"] @ v_s if vk.shape[0] else 0.0
        )
        u_out = u_s * sf_u
        x_pl = c["A_pl"] @ x_pl + c["B_pl"] @ jnp.concatenate([u_out, vk])
        return (x_pl, x_hat_pred, u_s, ws), (y, u_out)

    if qp_method in ("pdip_ws", "pdip_ws_lanes", "pdip_ws_fused"):
        ws0 = (jnp.zeros(nz, dtype), jnp.ones(mc, dtype), jnp.ones(mc, dtype))
    else:
        ws0 = (jnp.zeros(nz, dtype), jnp.zeros(mc, dtype), jnp.zeros(mc, dtype))
    init = (jnp.zeros(nxp, dtype), jnp.zeros(nxa, dtype), jnp.zeros(nu, dtype), ws0)
    _, (Y, U) = jax.lax.scan(step, init, (r, v))
    return Y, U


_closed_loop = partial(jax.jit, static_argnums=tuple(range(7, 16)))(closed_loop_core)

# candidate batch over (N, Nu, delta, lam); r per-candidate too (the VNS
# square-system selector sims use per-candidate setpoints, VNS2.m:148-165)
closed_loop_batch = partial(jax.jit, static_argnums=tuple(range(7, 16)))(
    jax.vmap(closed_loop_core,
             in_axes=(None, 0, None, 0, 0, 0, 0) + (None,) * 9)
)


def open_loop_core(c, r_final, v_final, v_traj, N, Nu, delta, lam,
                   p_max, m_max, ny, nu, with_y, rho, qp_iters,
                   use_pallas=False, qp_split=False, qp_lp=0):
    dtype = r_final.dtype
    cand = assemble_candidate(c, N, Nu, delta, lam, p_max, m_max, ny, nu,
                              rho, with_y)
    nxa = c["A"].shape[0]
    nit = v_traj.shape[0]

    # from rest (all case setpoints are zero at k=0, so the reference's
    # 1-step priming sim is a no-op)
    x_hat = jnp.zeros(nxa, dtype)
    u_prev = jnp.zeros(nu, dtype)
    r_s = r_final / c["sf_y"]
    v_s = v_final / c["sf_v"] if v_final.shape[0] else v_final

    f, h, _ = qp_step_data(c, cand, x_hat, u_prev, r_s, v_s,
                           p_max, m_max, ny, nu, with_y)

    def _solve(h_, cmask_, init_, iters_=qp_iters):
        return solve_qp_masked(cand["H"], f, c["G0"], c["T2"],
                               cand["rmask"], cmask_, h_, iters=iters_,
                               use_pallas=use_pallas, init=init_)

    if qp_lp:  # stage-0 slack LP variant of the split (parse_qp_method)
        z, lam1, s1 = solve_qp_masked(
            cand["H_lp"], cand["f_lp"], c["G0"], c["T2"], cand["rmask"],
            cand["cmask_z"], h, iters=int(qp_lp), use_pallas=use_pallas,
            init=None)
        z = _eps_split_stage2(_solve, z, lam1, s1, c, cand, h, qp_iters,
                              refine_iters=_LP_REFINE_ITERS)
    else:
        z, lam1, s1 = _solve(h, cand["cmask_z"], None)
        if qp_split:  # band cases: two-stage eps-split (parse_qp_method)
            z = _eps_split_stage2(_solve, z, lam1, s1, c, cand, h, qp_iters)
    du_seq = (z[:-1] * cand["cmask_flat"]).reshape(m_max, nu)
    u_seq = jnp.cumsum(du_seq, axis=0) * c["sf_u"][None, :]  # (m_max, nu)

    # pad/hold to nit samples (closedloop_toolbox.m:94-97)
    t_idx = jnp.arange(nit)
    idx = jnp.clip(t_idx, 0, m_max - 1)
    uopt = u_seq[idx] * (1.0)  # held after the control horizon
    # model rollout of [uopt, v_traj] through the conditioned model
    A_m, B_m, C_m = c["A_pl_model"], c["B_pl_model"], c["C_pl_model"]

    def mstep(x, inp):
        uk, vk = inp
        y = C_m @ x
        x = A_m @ x + B_m @ jnp.concatenate([uk, vk])
        return x, y

    _, ys = jax.lax.scan(mstep, jnp.zeros(A_m.shape[0], dtype), (uopt, v_traj))
    return ys, uopt


_open_loop = partial(jax.jit, static_argnums=tuple(range(8, 18)))(open_loop_core)

open_loop_batch = partial(jax.jit, static_argnums=tuple(range(8, 18)))(
    jax.vmap(open_loop_core,
             in_axes=(None, 0, None, None, 0, 0, 0, 0) + (None,) * 10)
)


def closed_loop_batch_sim_fused(c, r_b, v, N_b, Nu_b, delta_b, lam_b,
                                p_max, m_max, ny, nu, with_y, rho,
                                qp_iters, block_lanes: int = 512):
    """EXPERIMENTAL whole-sim engine ('admm_sim_fused'): the entire
    nit-step closed loop runs inside ONE Pallas kernel per lane block
    (ops/pallas_kernels.closed_sim_admm_lanes) — Kalman update, f/h
    assembly, warm equilibrated ADMM, and plant step all stay in VMEM
    across steps, eliminating the per-step op overhead that the round-5
    roofline measured at 57% of the headline wall (PERF.md).  Tracking
    cases only (with_y=False); same algorithm/constants as the
    'admm_fused' scan path.  Returns (Y (B, nit, ny), U (B, nit, nu))."""
    assert not with_y, "whole-sim kernel covers tracking cases only"
    from mpc_tuning_tpu.ops.pallas_kernels import closed_sim_admm_lanes

    # The WHOLE body (not just the kernel call) must trace under 'highest'
    # matmul precision: assemble_candidate builds H = Theta'QTheta and
    # admm_precompute builds GtG and INVERTS M from them — at the TPU's
    # default bf16-pass precision those tables carry ~2.5e-3 relative
    # error (scripts/probe_kernel_precision_tpu.py), which a single
    # 40-iteration warm solve turns into ~1e-2 du error on large-N
    # candidates (scripts/diag_sim_fused_step_tpu.py: dU 9.7e-3 at
    # N=48 — the entire 0.07 trajectory deviation and all 6 WB decision
    # flips of checkpoints/sim_fused_qualification.json came from this
    # one missing context, not from in-kernel arithmetic: every in-kernel
    # assembly op probes bitwise-identical to XLA-f32,
    # scripts/probe_sim_fused_ops_tpu.py).
    with jax.default_matmul_precision("highest"):
        return _closed_sim_fused_body(c, r_b, v, N_b, Nu_b, delta_b, lam_b,
                                      p_max, m_max, ny, nu, rho, qp_iters,
                                      block_lanes, closed_sim_admm_lanes)


def _closed_sim_fused_body(c, r_b, v, N_b, Nu_b, delta_b, lam_b, p_max,
                           m_max, ny, nu, rho, qp_iters, block_lanes,
                           closed_sim_admm_lanes):
    dtype = r_b.dtype
    B = r_b.shape[0]
    nit = r_b.shape[1]
    n = m_max * nu + 1
    mc = 4 * m_max * nu + 1
    n_pad = max(8, -(-n // 8) * 8)
    mcp = max(8, -(-mc // 8) * 8)

    cand = jax.vmap(
        assemble_candidate,
        in_axes=(None, 0, 0, 0, 0) + (None,) * 6,
    )(c, N_b, Nu_b, delta_b, lam_b, p_max, m_max, ny, nu, rho, False)

    # per-lane constants, lane-major (rows, B)
    def lanes(x, pad_to=None, fill=0.0):
        x = x.T
        if pad_to is not None and x.shape[0] < pad_to:
            x = jnp.concatenate(
                [x, jnp.full((pad_to - x.shape[0], B), fill, dtype)], axis=0)
        return x.astype(dtype)

    pre = cand["admm"]
    Dinv_m = pre["Dinv"] * cand["cmask_z"]          # masked-var fs/du scale
    Minv_t = jnp.zeros((n_pad, n_pad, B), dtype)
    Minv_t = Minv_t.at[jnp.arange(n_pad), jnp.arange(n_pad), :].set(1.0)
    Minv_t = Minv_t.at[:n, :n, :].set(pre["Minv"].transpose(1, 2, 0))

    # OV weight diag (row-masked), (pny, B)
    i_idx = jnp.arange(1, p_max + 1)
    row_mask = (i_idx[None, :] <= N_b[:, None]).astype(dtype)  # (B, p)
    q_b = (jnp.abs(delta_b[:, None, :]) ** 2 * row_mask[:, :, None]).reshape(
        B, p_max * ny)

    ones_m = np.ones(m_max)
    kr = lambda vec: jnp.kron(jnp.asarray(ones_m, dtype), jnp.asarray(vec, dtype))
    h1 = cand["en_du_hi"] * kr(c["dumax"]) + (1.0 - cand["en_du_hi"])
    h2 = -cand["en_du_lo"] * kr(c["dumin"]) + (1.0 - cand["en_du_lo"])
    h3 = cand["en_u_hi"] * kr(c["umax"]) + (1.0 - cand["en_u_hi"])
    h4 = -cand["en_u_lo"] * kr(c["umin"]) + (1.0 - cand["en_u_lo"])
    zero1 = jnp.zeros((B, 1), dtype)
    hbase = jnp.concatenate([h1, h2, h3, h4, zero1], axis=1)  # (B, mc)
    su = jnp.concatenate([jnp.zeros_like(h1), jnp.zeros_like(h2),
                          -cand["en_u_hi"], cand["en_u_lo"], zero1], axis=1)

    lane_consts = {
        "q": lanes(q_b),
        "hbase": lanes(hbase, mcp, 1.0),
        "su": lanes(su, mcp),
        "arow": lanes(pre["e"] * cand["rmask"], mcp),
        "acol": lanes(pre["Dinv"] * cand["cmask_z"], n_pad),
        "Dinv": lanes(Dinv_m, n_pad),
        "e": lanes(pre["e"], mcp, 1.0),
        "par": jnp.concatenate(
            [jnp.broadcast_to(pre["rho"].astype(dtype)[None, :], (1, B)),
             jnp.broadcast_to((1.0 / pre["rho"]).astype(dtype)[None, :],
                              (1, B)),
             jnp.ones((6, B), dtype)], axis=0),
        "sfy": jnp.broadcast_to(jnp.asarray(c["sf_y"], dtype)[:, None],
                                (ny, B)),
        "sfu": jnp.broadcast_to(jnp.asarray(c["sf_u"], dtype)[:, None],
                                (nu, B)),
    }

    # shared tables
    pny = p_max * ny
    SxF = jnp.asarray(c["Sx"], dtype).reshape(pny, -1)
    SstF = jnp.asarray(c["Sstep"], dtype)[1:].reshape(pny, nu)
    nd = c["Bv"].shape[1] if c["Bv"].ndim == 2 else 0
    v_t = jnp.asarray(v, dtype)
    sf_v = jnp.asarray(c["sf_v"], dtype)
    v_s = v_t / sf_v if v_t.shape[1] else v_t
    SvF = jnp.asarray(c["Sv"], dtype).reshape(pny, -1)
    nxa = c["A"].shape[0]
    nxp = c["A_pl"].shape[0]
    # packed v-dependent per-step columns, (nv, nit)
    Dvv = (jnp.asarray(c["Dv"], dtype) @ v_s.T if v_t.shape[1]
           else jnp.zeros((ny, nit), dtype))
    Bvv = (jnp.asarray(c["Bv"], dtype) @ v_s.T if v_t.shape[1]
           else jnp.zeros((nxa, nit), dtype))
    Bplv = (jnp.asarray(c["B_pl"], dtype)[:, nu:] @ v_t.T if v_t.shape[1]
            else jnp.zeros((nxp, nit), dtype))
    Svv = (SvF @ v_s.T if v_t.shape[1] else jnp.zeros((pny, nit), dtype))
    Vt = jnp.concatenate([Dvv, Bvv, Bplv, Svv], axis=0)

    ThT = jnp.zeros((n_pad, pny), dtype)
    ThT = ThT.at[:m_max * nu, :].set(jnp.asarray(c["Theta"], dtype).T)
    G0p = jnp.zeros((mcp, n_pad), dtype).at[:mc, :n].set(
        jnp.asarray(c["G0"], dtype)[:mc])

    tables = {
        "Cpl": jnp.asarray(c["C_pl"], dtype),
        "Apl": jnp.asarray(c["A_pl"], dtype),
        "Bplu": jnp.asarray(c["B_pl"], dtype)[:, :nu],
        "C": jnp.asarray(c["C"], dtype),
        "Mk": jnp.asarray(c["M"], dtype),
        "A": jnp.asarray(c["A"], dtype),
        "Bu": jnp.asarray(c["Bu"], dtype),
        "SxF": SxF, "SstF": SstF, "ThT": ThT,
        "G0": G0p, "G0T": jnp.transpose(G0p), "Vt": Vt,
    }

    r_l = (jnp.asarray(r_b, dtype)
           / jnp.asarray(c["sf_y"], dtype)[None, None, :]).transpose(1, 2, 0)

    with jax.default_matmul_precision("highest"):
        Y, U = closed_sim_admm_lanes(
            tables, lane_consts, Minv_t, r_l, nit=nit, iters=qp_iters,
            sigma=1e-6, over_relax=1.6,
            dims=dict(ny=ny, nu=nu, n=n, mc=mc, m_max=m_max),
            block_lanes=block_lanes)
    return Y.transpose(2, 0, 1), U.transpose(2, 0, 1)


_closed_sim_fused_jit = partial(
    jax.jit, static_argnums=tuple(range(7, 15)))(closed_loop_batch_sim_fused)


def closed_loop_batch_sim_pdip(c, r_b, v, N_b, Nu_b, delta_b, lam_b,
                               p_max, m_max, ny, nu, with_y, rho,
                               qp_iters, block_lanes: int = 128):
    """Whole-sim PDIP engine ('pdip_sim_fused'): the entire nit-step
    closed loop — Kalman update, f/h assembly, WARM-STARTED masked PDIP,
    plant step — in ONE Pallas kernel per lane block
    (ops/pallas_kernels.closed_sim_pdip_lanes).  The GAM-stage analogue
    of 'admm_sim_fused' (GAM cannot run ADMM — CMA-trajectory
    disqualification, PERF.md); algorithm-identical to the
    'pdip_ws_fused' scan path.  Returns (Y (B, nit, ny), U (B, nit, nu)).
    """
    assert not with_y, "whole-sim kernels cover tracking cases only"
    from mpc_tuning_tpu.ops.pallas_kernels import closed_sim_pdip_lanes

    # trace the candidate tables under 'highest' — see
    # closed_loop_batch_sim_fused (the bf16-pass H/Minv tables were the
    # whole-sim ADMM kernel's entire round-5 deviation)
    with jax.default_matmul_precision("highest"):
        dtype = r_b.dtype
        B = r_b.shape[0]
        nit = r_b.shape[1]
        n = m_max * nu + 1
        mc = 4 * m_max * nu + 1
        n_pad = max(8, -(-n // 8) * 8)
        mcp = max(8, -(-mc // 8) * 8)

        cand = jax.vmap(
            assemble_candidate,
            in_axes=(None, 0, 0, 0, 0) + (None,) * 6,
        )(c, N_b, Nu_b, delta_b, lam_b, p_max, m_max, ny, nu, rho, False)

        def lanes(x, pad_to=None, fill=0.0):
            x = x.T
            if pad_to is not None and x.shape[0] < pad_to:
                x = jnp.concatenate(
                    [x, jnp.full((pad_to - x.shape[0], B), fill, dtype)],
                    axis=0)
            return x.astype(dtype)

        Hp_t = jnp.zeros((n_pad, n_pad, B), dtype)
        Hp_t = Hp_t.at[jnp.arange(n_pad), jnp.arange(n_pad), :].set(1.0)
        Hp_t = Hp_t.at[:n, :n, :].set(cand["H"].transpose(1, 2, 0))

        i_idx = jnp.arange(1, p_max + 1)
        row_mask = (i_idx[None, :] <= N_b[:, None]).astype(dtype)
        q_b = (jnp.abs(delta_b[:, None, :]) ** 2
               * row_mask[:, :, None]).reshape(B, p_max * ny)

        ones_m = np.ones(m_max)
        kr = lambda vec: jnp.kron(jnp.asarray(ones_m, dtype),
                                  jnp.asarray(vec, dtype))
        h1 = cand["en_du_hi"] * kr(c["dumax"]) + (1.0 - cand["en_du_hi"])
        h2 = -cand["en_du_lo"] * kr(c["dumin"]) + (1.0 - cand["en_du_lo"])
        h3 = cand["en_u_hi"] * kr(c["umax"]) + (1.0 - cand["en_u_hi"])
        h4 = -cand["en_u_lo"] * kr(c["umin"]) + (1.0 - cand["en_u_lo"])
        zero1 = jnp.zeros((B, 1), dtype)
        hbase = jnp.concatenate([h1, h2, h3, h4, zero1], axis=1)
        su = jnp.concatenate([jnp.zeros_like(h1), jnp.zeros_like(h2),
                              -cand["en_u_hi"], cand["en_u_lo"], zero1],
                             axis=1)

        lane_consts = {
            "q": lanes(q_b),
            "hbase": lanes(hbase, mcp, 1.0),
            "su": lanes(su, mcp),
            "rmask": lanes(cand["rmask"], mcp),
            "cmask": lanes(cand["cmask_z"], n_pad),
            "sfy": jnp.broadcast_to(jnp.asarray(c["sf_y"], dtype)[:, None],
                                    (ny, B)),
            "sfu": jnp.broadcast_to(jnp.asarray(c["sf_u"], dtype)[:, None],
                                    (nu, B)),
        }

        pny = p_max * ny
        SxF = jnp.asarray(c["Sx"], dtype).reshape(pny, -1)
        SstF = jnp.asarray(c["Sstep"], dtype)[1:].reshape(pny, nu)
        v_t = jnp.asarray(v, dtype)
        sf_v = jnp.asarray(c["sf_v"], dtype)
        v_s = v_t / sf_v if v_t.shape[1] else v_t
        SvF = jnp.asarray(c["Sv"], dtype).reshape(pny, -1)
        nxa = c["A"].shape[0]
        nxp = c["A_pl"].shape[0]
        Dvv = (jnp.asarray(c["Dv"], dtype) @ v_s.T if v_t.shape[1]
               else jnp.zeros((ny, nit), dtype))
        Bvv = (jnp.asarray(c["Bv"], dtype) @ v_s.T if v_t.shape[1]
               else jnp.zeros((nxa, nit), dtype))
        Bplv = (jnp.asarray(c["B_pl"], dtype)[:, nu:] @ v_t.T
                if v_t.shape[1] else jnp.zeros((nxp, nit), dtype))
        Svv = (SvF @ v_s.T if v_t.shape[1]
               else jnp.zeros((pny, nit), dtype))
        Vt = jnp.concatenate([Dvv, Bvv, Bplv, Svv], axis=0)

        ThT = jnp.zeros((n_pad, pny), dtype)
        ThT = ThT.at[:m_max * nu, :].set(jnp.asarray(c["Theta"], dtype).T)
        G0p = jnp.zeros((mcp, n_pad), dtype).at[:mc, :n].set(
            jnp.asarray(c["G0"], dtype)[:mc])
        T2p = jnp.zeros((mcp, n_pad, n_pad), dtype)
        T2p = T2p.at[:mc, :n, :n].set(
            jnp.asarray(c["T2"], dtype)[:mc].reshape(mc, n, n))
        T2T = T2p.reshape(mcp, n_pad * n_pad).T

        tables = {
            "Cpl": jnp.asarray(c["C_pl"], dtype),
            "Apl": jnp.asarray(c["A_pl"], dtype),
            "Bplu": jnp.asarray(c["B_pl"], dtype)[:, :nu],
            "C": jnp.asarray(c["C"], dtype),
            "Mk": jnp.asarray(c["M"], dtype),
            "A": jnp.asarray(c["A"], dtype),
            "Bu": jnp.asarray(c["Bu"], dtype),
            "SxF": SxF, "SstF": SstF, "ThT": ThT,
            "G0": G0p, "G0T": jnp.transpose(G0p), "T2T": T2T, "Vt": Vt,
        }

        r_l = (jnp.asarray(r_b, dtype)
               / jnp.asarray(c["sf_y"], dtype)[None, None, :]
               ).transpose(1, 2, 0)

        Y, U = closed_sim_pdip_lanes(
            tables, lane_consts, Hp_t, r_l, nit=nit, iters=qp_iters,
            dims=dict(ny=ny, nu=nu, n=n, mc=mc, m_max=m_max),
            block_lanes=block_lanes)
    return Y.transpose(2, 0, 1), U.transpose(2, 0, 1)


_closed_sim_pdip_jit = partial(
    jax.jit, static_argnums=tuple(range(7, 15)))(closed_loop_batch_sim_pdip)


def closed_loop_batch_sim_band(c, r_b, v, N_b, Nu_b, delta_b, lam_b,
                               p_max, m_max, ny, nu, with_y, rho,
                               qp_lp, qp_split, block_lanes: int = 128):
    """Whole-sim BAND engine ('pdip_sim_fused+lpN+splitM' with with_y):
    the entire nit-step band-control closed loop — Kalman update, f/h
    assembly incl. the free-response-dependent soft band rows, slack
    seeding, stage-0 slack LP, slack-frozen stage-2 PDIP, plant step —
    in ONE Pallas kernel per lane block
    (ops/pallas_kernels.closed_sim_band_lanes).  Algorithm-identical to
    the '+lp+split' scan branch of closed_loop_core.  f32 rows are
    screening-grade only (band decisions stay f64, PARITY.md)."""
    assert with_y, "band whole-sim kernel requires y-constrained cases"
    from mpc_tuning_tpu.ops.pallas_kernels import closed_sim_band_lanes

    with jax.default_matmul_precision("highest"):
        dtype = r_b.dtype
        B = r_b.shape[0]
        nit = r_b.shape[1]
        pny = p_max * ny
        n = m_max * nu + 1
        mc = 4 * m_max * nu + 1 + 2 * pny
        n_pad = max(8, -(-n // 8) * 8)
        mcp = max(8, -(-mc // 8) * 8)

        cand = jax.vmap(
            assemble_candidate,
            in_axes=(None, 0, 0, 0, 0) + (None,) * 6,
        )(c, N_b, Nu_b, delta_b, lam_b, p_max, m_max, ny, nu, rho, True)

        def lanes(x, pad_to=None, fill=0.0):
            x = x.T
            if pad_to is not None and x.shape[0] < pad_to:
                x = jnp.concatenate(
                    [x, jnp.full((pad_to - x.shape[0], B), fill, dtype)],
                    axis=0)
            return x.astype(dtype)

        Hp_t = jnp.zeros((n_pad, n_pad, B), dtype)
        Hp_t = Hp_t.at[jnp.arange(n_pad), jnp.arange(n_pad), :].set(1.0)
        Hp_t = Hp_t.at[:n, :n, :].set(cand["H"].transpose(1, 2, 0))
        lpd = jnp.diagonal(cand["H_lp"], axis1=-2, axis2=-1)   # (B, n)

        i_idx = jnp.arange(1, p_max + 1)
        row_mask = (i_idx[None, :] <= N_b[:, None]).astype(dtype)  # (B, p)
        q_b = (jnp.abs(delta_b[:, None, :]) ** 2
               * row_mask[:, :, None]).reshape(B, pny)
        rm_rep = jnp.repeat(row_mask, ny, axis=1)              # (B, pny)
        rmyh = rm_rep * jnp.tile(jnp.asarray(c["en_y_hi"], dtype), p_max)
        rmyl = rm_rep * jnp.tile(jnp.asarray(c["en_y_lo"], dtype), p_max)
        ymax_f = jnp.tile(jnp.asarray(c["ymax"], dtype), p_max)
        ymin_f = jnp.tile(jnp.asarray(c["ymin"], dtype), p_max)
        hbyh = rmyh * ymax_f[None, :] + (1.0 - rmyh)
        hbyl = -rmyl * ymin_f[None, :] + (1.0 - rmyl)

        ones_m = np.ones(m_max)
        kr = lambda vec: jnp.kron(jnp.asarray(ones_m, dtype),
                                  jnp.asarray(vec, dtype))
        h1 = cand["en_du_hi"] * kr(c["dumax"]) + (1.0 - cand["en_du_hi"])
        h2 = -cand["en_du_lo"] * kr(c["dumin"]) + (1.0 - cand["en_du_lo"])
        h3 = cand["en_u_hi"] * kr(c["umax"]) + (1.0 - cand["en_u_hi"])
        h4 = -cand["en_u_lo"] * kr(c["umin"]) + (1.0 - cand["en_u_lo"])
        hbu = jnp.concatenate([h1, h2, h3, h4], axis=1)   # (B, 4*m*nu)
        su = jnp.concatenate([jnp.zeros_like(h1), jnp.zeros_like(h2),
                              -cand["en_u_hi"], cand["en_u_lo"]], axis=1)

        cmask2 = cand["cmask_z"].at[:, -1].set(0.0)
        lane_consts = {
            "q": lanes(q_b),
            "hbu": lanes(hbu),
            "su": lanes(su),
            "hbyh": lanes(hbyh),
            "rmyh": lanes(rmyh),
            "hbyl": lanes(hbyl),
            "rmyl": lanes(rmyl),
            "rmask": lanes(cand["rmask"], mcp),
            "cmask": lanes(cand["cmask_z"], n_pad),
            "cmask2": lanes(cmask2, n_pad),
            "lpd": lanes(lpd, n_pad, 1.0),
            "sfy": jnp.broadcast_to(jnp.asarray(c["sf_y"], dtype)[:, None],
                                    (ny, B)),
            "sfu": jnp.broadcast_to(jnp.asarray(c["sf_u"], dtype)[:, None],
                                    (nu, B)),
        }

        SxF = jnp.asarray(c["Sx"], dtype).reshape(pny, -1)
        SstF = jnp.asarray(c["Sstep"], dtype)[1:].reshape(pny, nu)
        v_t = jnp.asarray(v, dtype)
        sf_v = jnp.asarray(c["sf_v"], dtype)
        v_s = v_t / sf_v if v_t.shape[1] else v_t
        SvF = jnp.asarray(c["Sv"], dtype).reshape(pny, -1)
        nxa = c["A"].shape[0]
        nxp = c["A_pl"].shape[0]
        Dvv = (jnp.asarray(c["Dv"], dtype) @ v_s.T if v_t.shape[1]
               else jnp.zeros((ny, nit), dtype))
        Bvv = (jnp.asarray(c["Bv"], dtype) @ v_s.T if v_t.shape[1]
               else jnp.zeros((nxa, nit), dtype))
        Bplv = (jnp.asarray(c["B_pl"], dtype)[:, nu:] @ v_t.T
                if v_t.shape[1] else jnp.zeros((nxp, nit), dtype))
        Svv = (SvF @ v_s.T if v_t.shape[1]
               else jnp.zeros((pny, nit), dtype))
        Vt = jnp.concatenate([Dvv, Bvv, Bplv, Svv], axis=0)

        ThT = jnp.zeros((n_pad, pny), dtype)
        ThT = ThT.at[:m_max * nu, :].set(jnp.asarray(c["Theta"], dtype).T)
        G0p = jnp.zeros((mcp, n_pad), dtype).at[:mc, :n].set(
            jnp.asarray(c["G0"], dtype)[:mc])
        T2p = jnp.zeros((mcp, n_pad, n_pad), dtype)
        T2p = T2p.at[:mc, :n, :n].set(
            jnp.asarray(c["T2"], dtype)[:mc].reshape(mc, n, n))
        T2T = T2p.reshape(mcp, n_pad * n_pad).T

        tables = {
            "Cpl": jnp.asarray(c["C_pl"], dtype),
            "Apl": jnp.asarray(c["A_pl"], dtype),
            "Bplu": jnp.asarray(c["B_pl"], dtype)[:, :nu],
            "C": jnp.asarray(c["C"], dtype),
            "Mk": jnp.asarray(c["M"], dtype),
            "A": jnp.asarray(c["A"], dtype),
            "Bu": jnp.asarray(c["Bu"], dtype),
            "SxF": SxF, "SstF": SstF, "ThT": ThT,
            "G0": G0p, "G0T": jnp.transpose(G0p), "T2T": T2T, "Vt": Vt,
        }

        r_l = (jnp.asarray(r_b, dtype)
               / jnp.asarray(c["sf_y"], dtype)[None, None, :]
               ).transpose(1, 2, 0)

        Y, U = closed_sim_band_lanes(
            tables, lane_consts, Hp_t, r_l, nit=nit, lp_iters=qp_lp,
            s2_iters=qp_split,
            dims=dict(ny=ny, nu=nu, n=n, mc=mc, m_max=m_max),
            block_lanes=block_lanes)
    return Y.transpose(2, 0, 1), U.transpose(2, 0, 1)


_closed_sim_band_jit = partial(
    jax.jit, static_argnums=tuple(range(7, 16)))(closed_loop_batch_sim_band)
