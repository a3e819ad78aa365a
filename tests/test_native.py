"""Native C++ IO runtime tests (csrc/cbet_io.cpp via utils/native.py):
byte-identical PRINT dump, profile parsing, 27-node box average — with
NumPy-fallback parity."""

import numpy as np
import pytest

from cbet_raytracing_3d_tpu.config import Config
from cbet_raytracing_3d_tpu.profiles import DEFAULT_NE_FILE, load_profiles
from cbet_raytracing_3d_tpu.utils import native
from cbet_raytracing_3d_tpu.utils.output import (dump_print_format,
                                                 edep_box_average)

pytestmark = pytest.mark.skipif(not native.have_native(),
                                reason="native library unavailable "
                                       "(no C++ toolchain)")


def test_parse_profile_matches_loadtxt(profiles):
    r, ne = native.parse_profile(DEFAULT_NE_FILE, 443)
    np.testing.assert_array_equal(r, profiles.r)
    np.testing.assert_array_equal(ne, profiles.ne)


def test_print_dump_byte_identical(tmp_path, rng):
    e = rng.uniform(0, 1e14, size=(6, 5, 4))
    path = str(tmp_path / "dump.txt")
    native.write_print_dump(path, e)
    assert open(path).read() == dump_print_format(e)


def test_box_average_matches_numpy(rng):
    cfg = Config(nx=9, ny=8, nz=7)
    e = rng.uniform(size=cfg.edep_shape)
    np.testing.assert_allclose(native.box_average27(e),
                               edep_box_average(cfg, e), rtol=1e-14)
