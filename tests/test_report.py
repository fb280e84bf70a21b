"""Report generator (mpc_tuning_tpu/report.py): the reference drivers'
figure sets render to HTML/PNG from plain trajectories."""

import os

import numpy as np

from mpc_tuning_tpu.report import generate_report


def _fake_case(ny=7, nu=3, nit=60):
    rng = np.random.default_rng(0)
    t = np.arange(nit) * 4.0
    Y = np.cumsum(rng.normal(0, 0.02, (nit, ny)), axis=0)
    U = np.clip(np.cumsum(rng.normal(0, 0.05, (nit, nu)), axis=0), -0.5, 0.5)
    r = np.zeros((nit, ny))
    Yref = 0.9 * Y + 0.01
    ymin = np.full(ny, -0.5)
    ymax = np.full(ny, 0.5)
    ymin[-1] = -np.inf  # one-sided / unbounded entries must not break
    hist = [dict(it=0, Fgam=120.0, Fvns=900.0),
            dict(it=1, Fgam=80.0, Fvns=350.0),
            dict(it="polish", Fvns=340.0)]
    return t, Y, U, r, Yref, ymin, ymax, hist


def test_html_report(tmp_path):
    t, Y, U, r, Yref, ymin, ymax, hist = _fake_case()
    out = str(tmp_path / "rep.html")
    p = generate_report(out, "Shell7x5", t, Y, U, r=r, Yref=Yref,
                        ymin=ymin, ymax=ymax, Yc=Y, Yo=Yref,
                        history=hist, summary=dict(N=27, Nu=[2, 2, 2]))
    assert p == out and os.path.getsize(p) > 50_000
    html = open(p).read()
    assert html.count("data:image/png;base64,") == 3  # closed/verify/history
    assert "Shell7x5" in html and "<table>" in html


def test_png_report(tmp_path):
    t, Y, U, r, Yref, ymin, ymax, hist = _fake_case(ny=2, nu=2)
    out = str(tmp_path / "rep.png")
    p = generate_report(out, "WoodBerry", t, Y, U, r=r, Yref=Yref,
                        history=hist)
    assert os.path.exists(p)
    stem = str(tmp_path / "rep")
    assert os.path.exists(stem + "_closed.png")
    assert os.path.exists(stem + "_history.png")
