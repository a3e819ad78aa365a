"""OMEGA golden regression artifact (scripts/record_omega_golden.py) —
well-formedness of the committed artifact bench.py checks against.
Reference analog: the `cmp edep_100 truth_100` golden test
(/root/reference/Makefile:14-17; truth_100 absent from the snapshot)."""

import json
import os

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
NPZ = os.path.join(REPO, "artifacts", "omega_golden.npz")
JSN = os.path.join(REPO, "artifacts", "omega_golden.json")


@pytest.mark.skipif(not os.path.exists(NPZ),
                    reason="golden not recorded yet (TPU-recorded artifact)")
def test_omega_golden_artifact_well_formed():
    gold = np.load(NPZ)
    edep = gold["edep"]
    assert edep.dtype == np.float32
    assert edep.ndim == 3 and min(edep.shape) >= 3
    assert np.isfinite(edep).all() and float(edep.sum()) > 0
    # the f64 total must match the stored f32 grid to f32 rounding
    total = float(gold["edep_total"])
    np.testing.assert_allclose(edep.astype(np.float64).sum(), total,
                               rtol=1e-5)
    with open(JSN) as f:
        rec = json.load(f)
    assert rec["grid_shape"] == list(edep.shape)
    np.testing.assert_allclose(rec["edep_total"], total, rtol=0)
    assert len(rec["canonical_dump_sha256"]) == 64
    assert len(rec["block8_sums_sha256"]) == 64
