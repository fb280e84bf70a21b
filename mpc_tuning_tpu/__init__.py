"""mpc_tuning_tpu — TPU-native (JAX/XLA/Pallas) GPC/MPC engine + hybrid tuning framework.

A from-scratch re-design of the capabilities of the MATLAB reference
``sergioacg/Model-Predictive-Control-Tuning`` (hybrid (N)MPC auto-tuning,
MIMO DTC-GPC with dead-time compensation, direct single-shooting NMPC, and
the Wood-Berry / Shell 3x3 / Shell 7x5 / Van de Vusse benchmark suite),
built TPU-first:

* setup-time math (polynomial algebra, ZOH discretization, Diophantine
  recursions, Riccati solves) runs in float64 NumPy on the host;
* every per-candidate hot path (closed-loop simulation = observer update +
  QP solve + plant step) is a pure, shape-static ``lax.scan`` that is
  ``vmap``-able over tuning candidates and shardable over a device mesh;
* integer horizon candidates are evaluated at max bit-width shapes with
  masking, so whole VNS neighborhoods batch onto the MXU.

Layer map (mirrors SURVEY.md section 1):
  models/   L1  plant & model representation (LTI + ODE)
  ops/      L2  controller math (prediction, QP, filters, conditioning)
  sim/      L3  closed-loop simulation engines
  tuning/   L4  hybrid GAM <-> VNS auto-tuning
  cases/    L5  benchmark case studies
  parallel/     device-mesh sharded tuning sweeps
  utils/        config, checkpointing, profiling
"""

__version__ = "0.1.0"
