"""CLI entry point: end-to-end tiny tuning run through run_main, including
the --resume plumbing (the reference's script-top-flags convention,
WoodBerry.m:22-29, exposed as mpc-tuning-run)."""

import json

import numpy as np


def test_cli_run_woodberry_tiny(tmp_path, capsys, monkeypatch):
    from mpc_tuning_tpu.cli import run_main

    ckpt = str(tmp_path)
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    run_main(["woodberry", "--nit", "40", "--nbp", "4", "--nbc", "2",
              "--budget", "small", "--checkpoint-dir", ckpt, "--cpu"])
    out = capsys.readouterr().out
    payload = json.loads(out[out.index("{"):])
    assert payload["case"] == "woodberry"
    assert payload["N"] > max(payload["Nu"])  # PreCon validity
    assert np.isfinite(payload["Fvns"])
    assert (tmp_path / "woodberry_tuning_state.json").exists()

    # --resume from the completed state: must terminate quickly and
    # reproduce the same tuned point (the stop rule already fired or the
    # alternation budget is exhausted in the saved state)
    run_main(["woodberry", "--nit", "40", "--nbp", "4", "--nbc", "2",
              "--budget", "small", "--checkpoint-dir", ckpt, "--cpu",
              "--resume"])
    out2 = capsys.readouterr().out
    payload2 = json.loads(out2[out2.index("{"):])
    assert payload2["N"] == payload["N"]
    assert payload2["Nu"] == payload["Nu"]
