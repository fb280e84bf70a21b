"""Device-mesh parallelism for tuning sweeps.

The reference is strictly single-process ('UseParallel', false —
MPCTuning.m:89); the TPU-native design's central parallel axis is the
CANDIDATE batch: every tuning candidate (N, Nu, delta, lambda — and each
per-output selector lane) is an independent closed-loop simulation, sharded
over chips with `jax.sharding` and reduced with XLA collectives.
"""

from mpc_tuning_tpu.parallel.sweep import (  # noqa: F401
    candidate_mesh,
    shard_candidates,
    sharded_argmin_sweep,
)
