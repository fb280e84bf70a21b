"""L5 — benchmark case studies with the reference's exact configurations.

Each module exposes ``make_case()`` returning a tuning-ready description
and a ``run()`` driver with the reference's flag conventions
(tuning / rest / caso / nominal — WoodBerry.m:22-29)."""

from mpc_tuning_tpu.cases import woodberry, shell3x3, shell7x5  # noqa: F401
