"""Precomputed node-field tests: the fields must bit-match on-demand
interpolation at node radii (the exactness argument in fields.py)."""

import numpy as np

from cbet_raytracing_3d_tpu import constants as k
from cbet_raytracing_3d_tpu.config import Config
from cbet_raytracing_3d_tpu.fields import build_fields, node_radii
from cbet_raytracing_3d_tpu.oracle import interp_binary_search


def test_eden_matches_binary_search(profiles):
    cfg = Config(nx=20, ny=20, nz=20)
    f = build_fields(cfg, profiles)
    r = node_radii(cfg)
    rng = np.random.default_rng(0)
    for _ in range(60):
        i, j, l = rng.integers(0, 20, size=3)
        want = interp_binary_search(profiles.ne, profiles.r, r[i, j, l])
        assert f.eden[i, j, l] == want


def test_gradient_edge_stencils(profiles):
    """The reference clamps the gradient stencil at walls
    (launch_ray_XZ.cu:218-238): i=0 -> (0,2), i=nx-1 -> (nx-3,nx-1)."""
    cfg = Config(nx=16, ny=16, nz=16)
    f = build_fields(cfg, profiles)
    e = f.eden
    c = cfg.dedx_const
    np.testing.assert_allclose(f.fgrad[0, 5, 5, 0], c * (e[2, 5, 5] - e[0, 5, 5]))
    np.testing.assert_allclose(f.fgrad[15, 5, 5, 0],
                               c * (e[15, 5, 5] - e[13, 5, 5]))
    np.testing.assert_allclose(f.fgrad[7, 5, 5, 0], c * (e[8, 5, 5] - e[6, 5, 5]))


def test_absorb_formula(profiles):
    """absorb = ed/ncrit * nuei * dt with the reference's hard-coded 10.0
    (launch_ray_XZ.cu:299-305)."""
    cfg = Config(nx=12, ny=12, nz=12)
    f = build_fields(cfg, profiles)
    i, j, l = 3, 7, 9
    ed, te = f.eden[i, j, l], f.etemp[i, j, l]
    eta = 5.2e-5 * 10.0 / (te * np.sqrt(te))
    nuei = (1e6 * ed * k.EC ** 2 / k.ME_KG) * eta
    np.testing.assert_allclose(f.absorb[i, j, l], ed / k.NCRIT * nuei * cfg.dt,
                               rtol=1e-14)


def test_fields_positive_and_finite(profiles):
    cfg = Config(nx=25, ny=25, nz=25)
    f = build_fields(cfg, profiles)
    for arr in (f.eden, f.etemp, f.absorb, f.wsq_term):
        assert np.all(np.isfinite(arr))
    assert np.all(f.eden >= 0)
    assert np.all(f.etemp > 0)
    assert np.all(f.absorb >= 0)
    assert np.all(np.isfinite(f.fgrad))
