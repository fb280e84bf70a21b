"""L4 — hybrid auto-tuning: goal-attainment (continuous weights) alternated
with Variable Neighborhood Search (integer horizons), per Giraldo, Melo,
Secchi, "Tuning of Model Predictive Controllers Based on Hybrid
Optimization", Processes 10(2):351, 2022 (the reference's core algorithm,
/root/reference/MPC-Tuning/MPC_Tuning/MPCTuning.m)."""

from mpc_tuning_tpu.tuning.api import mpc_tuning, TuningResult  # noqa: F401
