"""Tuning objectives evaluated as batched closed-loop simulations.

GAM objective (GAM_fun.m:79-117): per-output SSE of the closed loop against
the desired reference trajectory Yref, with the candidate weights.

VNS objective (VNS2.m:148-195): per candidate (N, Nu),
  j21 — closed loop vs single-shot open-loop playback mismatch,
  j22 — closed loop vs Yref,
  Jnu — squared ratio of the first open-loop control move to subsequent
        increments (horizon-parsimony penalty, NaN/Inf -> 0),
  F = sum(j21 + j22) + N + sum(Jnu),
with the square-system per-output setpoint-selector protocol
(unit steps at inK=10 on one output at a time, VNS2.m:58-65,148-165) and the
single-sim protocol with the case setpoints for non-square systems.

Every candidate (and every selector) is one lane of a vmapped scan — the
whole neighborhood/population evaluates in one device call.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax.numpy as jnp

from mpc_tuning_tpu.sim.mpc_loop import MPCLoop  # noqa: F401 (typing/docs)

__all__ = ["TuningProblem", "gam_sse_batch", "vns_objective_batch",
           "resolve_qp_method"]


def resolve_qp_method(method: str, band: bool = False,
                      stage: str = "gam", dims: dict | None = None,
                      f64: bool = False) -> str:
    """'auto' -> the fastest ACCURACY-QUALIFIED engine for the active
    backend and tuning stage; explicit names pass through.

    Qualification evidence (checkpoints/qp_engine_qualification.json,
    scripts/qualify_engines.py):
      * VNS stage, tracking cases: warm 40-iter ADMM preserves the argmin
        and flips pairwise orderings only at near-tie gaps on the WB and
        Shell3x3 candidate grids -> the fused whole-ADMM Pallas kernel
        ('admm_fused@512', 14,070 sims/s vs fused PDIP's 1,690 on one
        v5e chip, checkpoints/bench_ablate.jsonl) is the TPU VNS engine;
        block lanes clamp to the padded batch for small neighborhoods.
      * GAM stage: ADMM rank-flips at large gaps on extreme weight
        vectors -> stays on the fused PDIP.
      * Band cases (zero OV weights, Shell7x5): ADMM stalls on the ECR
        band QP (tests/test_production_qp.py) -> always PDIP.
      * Reduced-iteration warm PDIP: DISQUALIFIED (pdip_ws12 explodes
        ~1e6 relative on a Shell3x3 grid candidate).
    CPU keeps the lane-major jnp engine everywhere (f64 evaluation grade —
    the parity/cross-eval frame).  ``f64=True`` requests the same
    evaluation-grade engine on ANY backend: on TPU the lanes engine runs
    in XLA's true-53-bit emulated float64 with the unrolled jnp
    factor/solve (ops/qp._factor_lanes_unrolled) — the decision-grade
    band path (Pallas kernels are f32-only; callers pass
    use_pallas=False, which TuningProblem does automatically when its
    dtype is float64)."""
    if method != "auto":
        return method
    import jax

    shape = None
    if dims is not None:
        shape = (dims["p_max"], dims["m_max"], dims["ny"], dims["nu"],
                 dims["with_y"])
    if jax.default_backend() == "cpu" or f64:
        return "pdip_ws_lanes+lp20+split12" if band else "pdip_ws_lanes"
    if band:
        # band cases: PDIP with the slack-LP eps-split (joint interior
        # points stall ~5e-2 from the exact optimum where a large ECR
        # slack coexists with tiny move curvature — sim/mpc_loop
        # parse_qp_method); fused on TPU, lanes-jnp on CPU.
        # Round 5: stage 1's 60-iteration joint slack pin is replaced by
        # a 20-iteration stage-0 slack LP (no rho/lambda scale spread;
        # slack-seeded warm start; dual-based crossover refinement) —
        # certified against the exact LP arbiter on EVERY step
        # (tests/test_band_oracle.py, ops/band_cert.py) where the old
        # split15 pin erred up to ~0.4 in du on degenerate steps.
        base = "pdip_ws_fused"
        if shape is not None:
            from mpc_tuning_tpu.ops.qp import fused_pdip_viable

            if not fused_pdip_viable(*shape):
                base = "pdip_ws_lanes"
            elif shape[4]:
                # whole-sim band kernel (round 5): seeding + slack LP +
                # slack-frozen stage 2 per step, the entire loop in ONE
                # Pallas call — +15% over the step-fused scan split at
                # the bench band shape, f64-algorithm-identical to it
                # (2.6e-10, tests/test_round5_engines.py); f32 rows stay
                # screening-grade (band decisions finalize at f64 via
                # the lanes path, which the f64 branch above returns).
                # closed_batch falls back to the scan engine outside the
                # kernel envelope.
                base = "pdip_sim_fused"
        return base + "+lp20+split12"
    if stage == "vns" and not band:
        if shape is not None:
            from mpc_tuning_tpu.ops.qp import admm_fused_max_lanes

            lanes = admm_fused_max_lanes(*shape)
            if lanes:
                # whole-SIM fused ADMM (the entire nit-step closed loop in
                # ONE Pallas kernel per lane block): +33% over the
                # step-fused scan engine at the headline shape (PERF.md
                # round-5).  Decision-qualified after the round-5 fix of
                # its candidate-table precision (the tables traced at
                # default bf16 matmul precision; sim/mpc_loop
                # closed_loop_batch_sim_fused docstring) — zero pairwise
                # flips vs the CPU f64 truth on the WB/Shell3x3 VNS
                # grids (checkpoints/sim_fused_qualification.json).
                # MPCLoop.closed_batch falls back to admm_fused@lanes
                # whenever the whole-sim kernel's envelope doesn't apply
                # (mesh sharding, y-constrained cases, VMEM-infeasible
                # (nit, shape) blocks).
                return f"admm_sim_fused@{min(lanes, 512)}"
            return "pdip_ws_lanes"
        # no shape information: the fused-ADMM VMEM-viability guard cannot
        # run, and an mc-heavy shape (any with_y case) would compile-OOM the
        # fused kernel — return the always-viable lanes engine instead
        return "pdip_ws_lanes"
    # GAM stage / band cases: fused whole-PDIP where the shared T2T table
    # fits the real ~96 MB VMEM budget (every tuning shape does, incl.
    # Shell7x5's 18 MB table at full shape — and the production path caps
    # shapes far below that, sim/mpc_loop.capped); the guard still covers
    # engineered shapes past the budget
    if shape is not None:
        from mpc_tuning_tpu.ops.qp import fused_pdip_viable

        if not fused_pdip_viable(*shape):
            return "pdip_ws_lanes"
    if shape is not None and not shape[4]:
        # tracking GAM: the whole-SIM PDIP kernel — qualified on the CMA
        # weight-trajectory distribution at the incumbent's own flip
        # noise (4/528 vs 3/528 pairwise, argmin preserved every
        # generation, checkpoints/sim_pdip_qualification.json); +3% at
        # the B=2048 bench shape and the big win at the REAL tuner's
        # popsize-12 latency-bound batches (whole loop = ONE kernel
        # launch vs 400 dispatched steps).  closed_batch falls back to
        # pdip_ws_fused outside the kernel envelope (mesh / with_y /
        # VMEM-infeasible nit).
        return "pdip_sim_fused@128"
    return "pdip_ws_fused"


@dataclasses.dataclass
class TuningProblem:
    """Everything the tuner needs about one case (conditioned units)."""

    loop: MPCLoop
    r: np.ndarray  # (nit, ny) case setpoints (conditioned)
    v: np.ndarray  # (nit, nd) measured disturbance (conditioned)
    Yref: np.ndarray  # (nit, ny) desired response (conditioned)
    nit: int
    w: np.ndarray  # (my,) pareto weights
    band_mask: np.ndarray  # (my,) True where user OV weight == 0 (band control)
    dmin: np.ndarray  # (my,) per-output minimum delay (samples)
    nbp: int
    nbc: int
    inK: int = 10
    goal: float = 0.001
    dtype: object = jnp.float64
    qp_iters: int = 30
    # 'auto' picks the fastest ACCURACY-QUALIFIED engine per backend and
    # tuning stage — see resolve_qp_method for the full policy + evidence
    # (GAM: fused whole-PDIP Pallas kernel on TPU / lane-major jnp on CPU;
    # VNS tracking on TPU: fused whole-ADMM kernel).
    qp_method: str = "auto"
    # VNS-stage engine override; 'auto' = the stage-qualified pick of
    # resolve_qp_method (tracking cases on TPU: the fused whole-ADMM
    # kernel; everything else: the GAM engine)
    vns_qp_method: str = "auto"
    admm_iters: int = 40  # warm ADMM iterations when an admm engine runs
    linear: bool = True  # False => NMPC loop, nonlinear VNS protocol
    mesh: object = None  # jax.sharding.Mesh -> candidate axis sharded over it

    @property
    def my(self) -> int:
        if hasattr(self.loop, "ctl"):
            return self.loop.ctl.spec.model.ny
        return self.loop.spec.ny

    @property
    def nu(self) -> int:
        if hasattr(self.loop, "ctl"):
            return self.loop.ctl.spec.n_mv
        return self.loop.spec.nu

    @property
    def square(self) -> bool:
        return self.my == self.nu

    def _maybe_shard(self, *batched):
        """Pad the candidate axis to the mesh size and shard axis 0."""
        if self.mesh is None:
            return batched, None
        from mpc_tuning_tpu.parallel.sweep import pad_to_multiple, shard_candidates

        nd = self.mesh.devices.size
        padded = []
        B = None
        for a in batched:
            a = np.asarray(a)
            p, B = pad_to_multiple(a, nd)
            padded.append(p)
        return shard_candidates(self.mesh, *padded), B

    def _caps(self, N_b, Nu_b):
        """Capacity bucket for this batch, decided on host BEFORE sharding
        (multi-host shards are not host-readable) — see
        sim/mpc_loop.horizon_caps."""
        from mpc_tuning_tpu.sim.mpc_loop import horizon_caps

        s = self.loop.ctl.spec if hasattr(self.loop, "ctl") else self.loop.spec
        return horizon_caps(s.p_max, s.m_max, N_b, Nu_b)

    def closed_batch(self, r_b, N_b, Nu_b, delta_b, lam_b, stage="gam"):
        caps = self._caps(N_b, Nu_b)
        (r_b, N_b, Nu_b, delta_b, lam_b), B = self._maybe_shard(
            np.asarray(r_b, dtype=np.float64), N_b, Nu_b, delta_b, lam_b
        )
        kw = {}
        iters = self.qp_iters
        f64 = self.dtype == jnp.float64
        if hasattr(self.loop, "ctl"):  # linear engine supports qp_method
            raw = self.vns_qp_method if stage == "vns" else self.qp_method
            # engine viability (VMEM guards, lane widths) is judged at the
            # CAPPED shape the batch will actually run at
            m = resolve_qp_method(raw, band=bool(np.any(self.band_mask)),
                                  stage=stage,
                                  dims=self.loop.capped(*caps).dims,
                                  f64=f64)
            kw["qp_method"] = m
            if f64:
                # decision-grade f64 on TPU: XLA-emulated float64 through
                # the jnp lanes path (Pallas kernels are f32-only)
                kw["use_pallas"] = False
            if m.split("@")[0].split("/")[0] in ("admm", "admm_fused",
                                                 "admm_sim_fused",
                                                 "hybrid", "hybrid_fused"):
                iters = self.admm_iters  # = the ADMM(-prefix) iteration count
        with self._f64_device(caps, f64):
            Y, U = self.loop.closed_batch(
                jnp.asarray(r_b, self.dtype), self.v, N_b, Nu_b, delta_b,
                lam_b, self.nit, self.dtype, iters, mesh=self.mesh,
                caps=caps, **kw,
            )
        if B is not None:
            Y, U = self._gather(Y, B), self._gather(U, B)
        return Y, U

    def _f64_device(self, caps, f64):
        """Decision-grade f64 bucket routing: on the TPU backend the
        unrolled lane factor/solve handles every decision bucket
        (n_pad <= 32); the rare big-m EXPLORATION buckets (full-m VNS
        neighborhoods) would fall to XLA's near-scalar batched-linalg
        f64 path on TPU, where host LAPACK wins — route those batches to
        the CPU device instead (same engine, same f64 arithmetic
        family)."""
        import contextlib

        import jax

        if not f64 or jax.default_backend() == "cpu":
            return contextlib.nullcontext()
        nu = self.loop.ctl.spec.n_mv if hasattr(self.loop, "ctl") else 0
        n_pad = max(8, -(-(caps[1] * nu + 1) // 8) * 8)
        if n_pad <= 32:
            return contextlib.nullcontext()
        return jax.default_device(jax.devices("cpu")[0])

    def _gather(self, a, B):
        """Candidate-sharded device output -> full host array (all-gather
        on multi-host meshes; plain fetch when every shard is local)."""
        if not a.is_fully_addressable:
            from mpc_tuning_tpu.parallel.sweep import replicate_to_host

            return replicate_to_host(self.mesh, a)[:B]
        return np.asarray(a)[:B]

    def open_batch(self, rfin_b, N_b, Nu_b, delta_b, lam_b):
        caps = self._caps(N_b, Nu_b)
        (rfin_b, N_b, Nu_b, delta_b, lam_b), B = self._maybe_shard(
            np.asarray(rfin_b, dtype=np.float64), N_b, Nu_b, delta_b, lam_b
        )
        kw = {}
        if hasattr(self.loop, "ctl"):
            # mirror the closed-loop engine's band policy (split / slack-LP
            # stage) so the open leg of j21 never runs the stalling joint
            # solve on band cases (sim/mpc_loop.parse_qp_method)
            from mpc_tuning_tpu.sim.mpc_loop import parse_qp_method

            band = bool(np.any(self.band_mask))
            f64 = self.dtype == jnp.float64
            m = resolve_qp_method(self.qp_method, band=band, stage="gam",
                                  dims=self.loop.capped(*caps).dims,
                                  f64=f64)
            _, _, _, split, lp = parse_qp_method(m)
            kw["qp_split"] = band and split != 0
            kw["qp_lp"] = lp if band else 0
            if f64:
                kw["use_pallas"] = False
        else:
            f64 = self.dtype == jnp.float64
        with self._f64_device(caps, f64):
            Y, U = self.loop.open_batch(
                jnp.asarray(rfin_b, self.dtype), self.v, N_b, Nu_b, delta_b,
                lam_b, self.nit, self.dtype, self.qp_iters, mesh=self.mesh,
                caps=caps, **kw,
            )
        if B is not None:
            Y, U = self._gather(Y, B), self._gather(U, B)
        return Y, U


def _apply_band(delta: np.ndarray, band_mask: np.ndarray) -> np.ndarray:
    """Zero user OV weight => band control: delta forced to 0
    (GAM_fun.m:58-72, MPC_TFob.m:83-93)."""
    return np.where(band_mask, 0.0, delta)


def gam_sse_batch(problem: TuningProblem, N: int, Nu: int, X: np.ndarray) -> np.ndarray:
    """Evaluate the GAM objective for a batch of weight vectors.

    X: (B, my+nu) decision vectors [delta, lambda] (abs is applied, as in
    GAM_fun.m:55-76).  Returns (B, my) per-output SSE vs Yref.
    """
    B = X.shape[0]
    my, nu = problem.my, problem.nu
    delta = _apply_band(np.abs(X[:, :my]), problem.band_mask[None, :])
    lam = np.abs(X[:, my:])
    r_b = np.broadcast_to(problem.r[: problem.nit], (B, problem.nit, my))
    N_b = np.full(B, N, dtype=np.int64)
    Nu_b = np.full(B, Nu, dtype=np.int64)
    Y, _ = problem.closed_batch(r_b, N_b, Nu_b, delta, lam)
    err = np.asarray(Y) - problem.Yref[None, : problem.nit, :]
    return np.sum(err * err, axis=1)  # (B, my)


def vns_objective_batch(
    problem: TuningProblem,
    N_b: np.ndarray,  # (B,) shared prediction horizon per candidate
    Nu_b: np.ndarray,  # (B,) max control horizon per candidate
    delta: np.ndarray,  # (my,) current weights
    lam: np.ndarray,  # (nu,)
    return_parts: bool = False,
) -> np.ndarray:
    """VNS cost F for each candidate (VNS2.m:171-195).  Returns (B,), or
    (F, {"j21", "j22", "Jnu"}) when ``return_parts`` (each (B,)) — used by
    the parity cross-evaluation and the band-objective audit."""
    B = len(N_b)
    my, nu, nit, inK = problem.my, problem.nu, problem.nit, problem.inK
    # weights may be shared (my,)/(nu,) — the VNS neighborhood case — or
    # per-candidate (B, my)/(B, nu): the weight-search decision path
    # scores a LAMBDA grid in one batched device call instead of B
    # latency-bound B=1 calls (the TPU f64 decision engine is ~10x
    # slower than CPU at B=1 and ~5-10x faster batched)
    delta = np.abs(np.asarray(delta, dtype=np.float64))
    lam = np.abs(np.asarray(lam, dtype=np.float64))
    if delta.ndim == 1:
        delta = np.broadcast_to(delta, (B, my))
    if lam.ndim == 1:
        lam = np.broadcast_to(lam, (B, nu))
    delta = _apply_band(delta, problem.band_mask[None, :])

    if problem.square:
        if problem.linear:
            # unit-step setpoint selectors: lane (cand, output i) simulates
            # with r = step at inK on output i only (VNS2.m:58-65)
            steps = np.zeros((my, nit, my))
            for i in range(my):
                steps[i, inK - 1 :, i] = 1.0
        else:
            # nonlinear VNS keeps the case setpoints, zeroed outside the
            # selected output (VNS2.m:68-73,155: Xsp .* sel)
            steps = np.zeros((my, nit, my))
            for i in range(my):
                steps[i, :, i] = problem.r[:nit, i]
        rfin = steps[:, -1, :]  # (my, my): final setpoint per selector lane
        rfin_b = np.broadcast_to(rfin[None], (B, my, my)).reshape(B * my, my)
        r_b = np.broadcast_to(steps[None], (B, my, nit, my)).reshape(B * my, nit, my)
        N_l = np.repeat(N_b, my)
        Nu_l = np.repeat(Nu_b, my)
        d_l = np.repeat(delta, my, axis=0)
        l_l = np.repeat(lam, my, axis=0)
        Yc, Uc = problem.closed_batch(r_b, N_l, Nu_l, d_l, l_l, stage="vns")
        Yo, Uo = problem.open_batch(rfin_b, N_l, Nu_l, d_l, l_l)
        Yc = np.asarray(Yc).reshape(B, my, nit, my)
        Yo = np.asarray(Yo).reshape(B, my, nit, my)
        Uo = np.asarray(Uo).reshape(B, my, nit, nu)
        # take row i from lane i (VNS2.m:156-160)
        idx = np.arange(my)
        Xy = Yc[:, idx, :, idx].transpose(1, 0, 2)  # (B, my, nit)
        Xyma = Yo[:, idx, :, idx].transpose(1, 0, 2)
        Xuma = Uo[:, idx, :, idx].transpose(1, 0, 2)  # (B, ny, nit), square
    else:
        r_b = np.broadcast_to(problem.r[:nit], (B, nit, my))
        rfin_b = np.broadcast_to(problem.r[nit - 1], (B, my))
        d_b = delta
        l_b = lam
        Yc, Uc = problem.closed_batch(r_b, N_b, Nu_b, d_b, l_b, stage="vns")
        Yo, Uo = problem.open_batch(rfin_b, N_b, Nu_b, d_b, l_b)
        Xy = np.asarray(Yc).transpose(0, 2, 1)  # (B, my, nit)
        Xyma = np.asarray(Yo).transpose(0, 2, 1)
        Xuma = np.asarray(Uo).transpose(0, 2, 1)  # (B, nu, nit)

    k0 = inK - 1  # MATLAB inK 1-indexed
    e2 = Xy[:, :, k0:] - Xyma[:, :, k0:]
    eref = Xy[:, :, k0:] - problem.Yref[:nit].T[None, :, k0:]
    j21 = np.sum(e2 * e2, axis=(1, 2))
    j22 = np.sum(eref * eref, axis=(1, 2))

    # Jnu: "was there a SIGNIFICANT change relative to the previous control
    # increment" (VNS2.m:181-191).  The reference guards only exact 0/NaN
    # increments (MATLAB f64 zero-pads Uopt past the control horizon, so
    # held moves divide 0 exactly); any fixed-precision engine instead
    # produces denormal-tiny increments whose squared ratios explode by
    # 1e20+ and whose value flips between f32 and f64.  A relative
    # threshold — increments below 1e-6 of the first move are "no change",
    # contributing 0 exactly like the reference's Inf/NaN guard — makes the
    # objective precision-stable while preserving its meaning.
    dff = np.abs(np.diff(Xuma, axis=2))
    u1 = np.abs(Xuma[:, :, :1])
    sig = dff > 1e-6 * (u1 + 1e-12)
    with np.errstate(divide="ignore", invalid="ignore"):
        Xnu = np.where(sig, u1 / dff, 0.0)
    Xnu[~np.isfinite(Xnu)] = 0.0
    Jnu = np.sum(Xnu * Xnu, axis=(1, 2))

    F = j21 + j22 + N_b.astype(np.float64) + Jnu
    if return_parts:
        return F, {"j21": j21, "j22": j22, "Jnu": Jnu}
    return F
