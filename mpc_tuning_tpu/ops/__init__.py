"""L2 — controller math.

CARIMA/GPC prediction machinery, robustness filters, conditioning,
observers, and the batched QP solver.
"""
