"""L3 — closed-loop simulation engines (the tuning objective evaluators)."""
