"""Smoke tests for the spectra plotting CLI (tools/plot_spectra.py) — the
counterpart of the reference notebook's plotting cells
(ref notebooks/lm_eigvals.ipynb cells 26, 28, 29-30)."""

import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_cli(art_dir, *extra):
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "plot_spectra.py"),
         str(art_dir), *extra],
        capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    return r.stdout


def test_plot_attention_artifacts(tmp_path):
    rng = np.random.default_rng(0)
    bins, B, H, L = 7, 4, 2, 3
    pct = rng.uniform(0, 100, (bins, B, H, L))
    np.save(tmp_path / "percentage.npy", pct)
    np.save(tmp_path / "percentage_init.npy", rng.uniform(0, 100, (bins, B, H, L)))
    np.save(tmp_path / "percentage_phase.npy", rng.uniform(0, 100, (6, B, H, L)))
    np.save(tmp_path / "percentage_phase_init.npy", rng.uniform(0, 100, (6, B, H, L)))
    _run_cli(tmp_path)
    for f in ("radius_bins_per_layer.png", "radius_bins_layers_heads.png",
              "radius_bins_by_head.png"):
        assert (tmp_path / f).stat().st_size > 0
    # phase mode reuses the same figure set from the phase arrays
    _run_cli(tmp_path, "--phase")


def test_plot_ssm_artifacts(tmp_path):
    rng = np.random.default_rng(1)
    bins, L, N = 7, 2, 16
    np.save(tmp_path / "percentage.npy", rng.uniform(0, 100, (bins, L)))
    np.save(tmp_path / "percentage_init.npy", rng.uniform(0, 100, (bins, L)))
    lam = (rng.normal(size=(N, L)) + 1j * rng.normal(size=(N, L))).astype(np.complex64)
    np.save(tmp_path / "eig.npy", lam)
    np.save(tmp_path / "eig_init.npy", 0.9 * lam)
    out = tmp_path / "figs"
    _run_cli(tmp_path, "--out", str(out))
    assert (out / "radius_bins_per_layer.png").stat().st_size > 0
    assert (out / "spectrum_unit_circle.png").stat().st_size > 0
