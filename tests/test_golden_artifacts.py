"""Integrity of the committed OMEGA regression goldens.

bench.py compares every TPU run's grids against
``artifacts/omega_golden.npz`` (trace) and ``artifacts/cbet_golden.npz``
(converged CBET) — the portable analog of the reference's bitwise
``cmp edep_100 truth_100`` golden test (/root/reference/Makefile:14-17).
A corrupt, truncated, or config-mismatched artifact would make that
comparison silently vacuous (bench skips on shape mismatch), so CI
validates the artifacts themselves: they load, carry the OMEGA config
identifiers, and their stored f64 totals match the stored f32 grids to
f32-summation accuracy.
"""

import json
import os

import numpy as np
import pytest

ART = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "artifacts")

CASES = [
    ("omega_golden", 1.5510306647974894e18),
    ("cbet_golden", 1.6515210646281257e18),
]


@pytest.mark.parametrize("name,total", CASES, ids=[c[0] for c in CASES])
def test_golden_artifact_integrity(name, total):
    npz_path = os.path.join(ART, f"{name}.npz")
    jsn_path = os.path.join(ART, f"{name}.json")
    if not os.path.exists(npz_path):
        pytest.skip(f"{name}.npz not recorded yet (TPU-only recording)")
    g = np.load(npz_path)
    edep = g["edep"]
    # OMEGA default config: 100^3 grid -> (nx+2)^3 output
    assert edep.shape == (102, 102, 102)
    assert edep.dtype == np.float32
    assert int(g["nx"]) == 100 and int(g["nt"]) == 400
    assert int(g["rays_per_zone"]) == 4
    assert np.isfinite(edep).all() and (edep >= 0).all()
    # the stored f64 total is the on-chip f64 sum; the f32 grid must
    # reproduce it to f32-summation accuracy (and match this test's
    # committed constant — the round-over-round drift anchor)
    stored = float(g["edep_total"])
    assert abs(stored - total) / total < 1e-12
    assert abs(float(edep.astype(np.float64).sum()) - stored) / stored < 1e-6

    with open(jsn_path) as f:
        rec = json.load(f)
    assert rec["grid_shape"] == [102, 102, 102]
    assert abs(rec["edep_total"] - stored) / stored < 1e-12
    for key in ("canonical_dump_sha256", "block8_sums_sha256"):
        assert len(rec[key]) == 64
