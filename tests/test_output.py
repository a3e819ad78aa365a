"""Output writer tests: PRINT-format dump (main.cu:6-22), 27-node box average
and HDF5 schema (main.cu:37-94, 334-349), npz round trip, phase timers."""

import os

import numpy as np
import pytest

from cbet_raytracing_3d_tpu.config import Config
from cbet_raytracing_3d_tpu.utils.output import (HAVE_H5PY, coordinate_meshes,
                                                 dump_canonical,
                                                 dump_print_format,
                                                 edep_box_average, save_hdf5,
                                                 save_npz)
from cbet_raytracing_3d_tpu.utils.timers import PhaseTimers

CFG = Config(nx=6, ny=5, nz=4)


def _fake_edep(rng):
    return rng.uniform(0, 10, size=CFG.edep_shape)


def test_print_format_matches_reference_printer(rng):
    """Nested [a,b,...] lists, ']' + newline at every level — the exact
    boost multi_array printer output shape (main.cu:6-22)."""
    arr = np.arange(6.0).reshape(1, 2, 3)
    out = dump_print_format(arr)
    assert out == "[[[0,1,2]\n,[3,4,5]\n]\n]\n"


def test_canonical_dump_roundtrip(rng):
    edep = _fake_edep(rng)
    text = dump_canonical(edep)
    back = np.fromstring(text, sep="\n") if False else np.array(
        [float(v) for v in text.split()])
    np.testing.assert_array_equal(back.reshape(edep.shape), edep)


def test_box_average_matches_literal_27_stencil(rng):
    edep = _fake_edep(rng)
    got = edep_box_average(CFG, edep)
    # literal transcription of main.cu:334-349
    i, j, l = 2, 3, 1
    want = sum(edep[i + a, j + b, l + c]
               for a in range(3) for b in range(3) for c in range(3)) / 27
    np.testing.assert_allclose(got[i, j, l], want, rtol=1e-14)


def test_coordinate_meshes():
    x, y, z = coordinate_meshes(CFG)
    assert x.shape == (CFG.nx, CFG.ny, CFG.nz)
    np.testing.assert_allclose(x[0, 0, 0], CFG.xmin)
    np.testing.assert_allclose(x[-1, 0, 0], CFG.xmax)
    np.testing.assert_allclose(z[0, 0, -1], CFG.zmax)


def test_npz_roundtrip(tmp_path, rng):
    edep = _fake_edep(rng)
    path = os.path.join(tmp_path, "edep.npz")
    save_npz(path, CFG, edep, {"rays_launched": 7})
    data = np.load(path)
    np.testing.assert_array_equal(data["edep"], edep)
    assert data["stat_rays_launched"] == 7
    np.testing.assert_allclose(data["edepavg"], edep_box_average(CFG, edep))


@pytest.mark.skipif(not HAVE_H5PY, reason="h5py unavailable")
def test_hdf5_schema(tmp_path, rng):
    """Reference schema: /Coordinate_x,y,z + /Edepavg, little-endian f64
    (main.cu:37-94)."""
    import h5py
    edep = _fake_edep(rng)
    path = os.path.join(tmp_path, "edep.hdf5")
    save_hdf5(path, CFG, edep)
    with h5py.File(path, "r") as f:
        assert set(f.keys()) == {"Coordinate_x", "Coordinate_y",
                                 "Coordinate_z", "Edepavg"}
        assert f["Edepavg"].shape == (CFG.nx, CFG.ny, CFG.nz)
        assert f["Edepavg"].dtype == np.dtype("<f8")
        np.testing.assert_allclose(f["Edepavg"][()],
                                   edep_box_average(CFG, edep))


def test_phase_timers_report():
    t = PhaseTimers()
    with t.phase("Init"):
        pass
    with t.phase("Tracing"):
        pass
    rep = t.report()
    assert "rt: Init" in rep and "Tracing" in rep and "Total" in rep
    d = t.as_dict()
    assert set(d) >= {"Init", "Tracing", "Total"}
