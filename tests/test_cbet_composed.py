"""Composed (resumable, host-dispatched) CBET solve tests
(models/cbet_composed.py — the BASELINE config-4-scale CBET path).

The composed solve must reproduce the monolithic ``cbet_solve`` (same
model: lookup gain, segmented gain-proof plan), survive interruption with
bit-identical resume, and group beams serially without changing values.
"""

import os

import numpy as np
import pytest

from cbet_raytracing_3d_tpu.config import Config
from cbet_raytracing_3d_tpu.models import raytracer as rt
from cbet_raytracing_3d_tpu.models.cbet import cbet_solve
from cbet_raytracing_3d_tpu.models.cbet_composed import cbet_solve_composed

pytestmark = pytest.mark.slow  # full lane only: every test here is a mesh/solve run


@pytest.fixture(scope="module")
def comp_cfg():
    # 4 beams so beam_groups in {1, 2, 4} divide; chunk_steps=8 divides
    # nt=160 and carries the 4-step deposit window exactly
    return Config(nbeams=4, rays_per_zone=1, nx=40, ny=40, nz=40,
                  cbet_max_iters=8, cbet_tol=1e-3, dtype="float32",
                  tiles_per_block=1, chunk_steps=8, deposit_batch_steps=4,
                  cbet_segmented=True, cbet_plan_headroom=0.0)


@pytest.fixture(scope="module")
def comp_ctx(comp_cfg, profiles):
    return rt.prepare(comp_cfg, profiles)


def test_composed_matches_monolithic(comp_cfg, comp_ctx, tmp_path):
    """The composed solve (host-dispatched chunks, pairwise edep master,
    G=1) must reproduce the monolithic segmented lookup solve: same
    fixed-point trajectory, same intensity, edep equal to accumulation-
    reassociation tolerance."""
    mono = cbet_solve(comp_cfg, comp_ctx, backend="pallas_interpret",
                      cache_dir=str(tmp_path))
    comp = cbet_solve_composed(comp_cfg, comp_ctx,
                               backend="pallas_interpret", beam_groups=1,
                               cache_dir=str(tmp_path), verbose=False)
    assert comp.converged == mono.converged
    assert comp.iterations == mono.iterations
    np.testing.assert_allclose(comp.history, mono.history, rtol=1e-5)
    ri = (np.linalg.norm(comp.intensity - mono.intensity)
          / np.linalg.norm(mono.intensity))
    assert ri < 1e-6, ri
    rel = (np.linalg.norm(comp.edep - mono.edep)
           / np.linalg.norm(mono.edep))
    assert rel < 1e-6, rel
    assert comp.stats["rays_launched"] == mono.stats["rays_launched"]
    assert comp.stats["rays_terminated"] == mono.stats["rays_terminated"]


def test_composed_beam_groups_identical(comp_cfg, comp_ctx, tmp_path):
    """Serial beam groups change data movement, not the model: G=2 must
    reproduce G=1 to f32-reassociation tolerance.  (NOT bit-identical by
    construction: G=1 pushes per-chunk edep deltas covering all beams
    while G=2 pushes one group's at a time, so the pairwise fold's
    addition tree differs; per-beam intensity/gain arithmetic is the same
    row-for-row.)"""
    g1 = cbet_solve_composed(comp_cfg, comp_ctx,
                             backend="pallas_interpret", beam_groups=1,
                             cache_dir=str(tmp_path), verbose=False)
    g2 = cbet_solve_composed(comp_cfg, comp_ctx,
                             backend="pallas_interpret", beam_groups=2,
                             cache_dir=str(tmp_path), verbose=False)
    assert g2.iterations == g1.iterations
    np.testing.assert_allclose(g2.history, g1.history, rtol=1e-5)
    ri = (np.linalg.norm(g2.intensity - g1.intensity)
          / np.linalg.norm(g1.intensity))
    assert ri < 1e-6, ri
    rel = np.linalg.norm(g2.edep - g1.edep) / np.linalg.norm(g1.edep)
    assert rel < 1e-6, rel
    assert g2.stats["beam_groups"] == 2


def test_composed_hbm_backend(profiles, tmp_path):
    """The config-4 kernel set (pallas_hbm window-DMA edep, which needs
    nz+2 > the VMEM z-lanes, + VMEM grouped intensity on the coarsened
    CBET grid) through the composed path: values match the monolithic
    scatter-backend solve of the same model."""
    cfg = Config(nbeams=2, rays_per_zone=1, nx=32, ny=32, nz=130,
                 dtype="float32", tiles_per_block=2, courant_mult=1.0,
                 deposit_box_x=16, deposit_box_y=16, deposit_box_z=56,
                 cbet_grid_downsample=2, chunk_steps=10,
                 deposit_batch_steps=5, cbet_max_iters=2, cbet_tol=1e-3)
    assert cfg.nz + 2 > 128                  # edep takes the HBM path
    assert cfg.cbet_grid_shape[2] + 2 <= 128  # coarse grid fits VMEM
    ctx = rt.prepare(cfg, profiles)
    hbm = cbet_solve_composed(cfg, ctx, backend="pallas_hbm_interpret",
                              beam_groups=2, cache_dir=str(tmp_path),
                              verbose=False)
    mono = cbet_solve(cfg, ctx, backend="scatter")
    assert hbm.iterations == mono.iterations
    assert np.isfinite(hbm.edep).all() and hbm.edep.sum() > 0
    ri = (np.linalg.norm(hbm.intensity - mono.intensity)
          / np.linalg.norm(mono.intensity))
    assert ri < 2e-3, ri                     # bf16 kernel weights
    rel = np.linalg.norm(hbm.edep - mono.edep) / np.linalg.norm(mono.edep)
    assert rel < 2e-3, rel


def test_composed_resume_bit_identical(comp_cfg, comp_ctx, tmp_path):
    """Interrupt the composed solve after 2 iterations (checkpoint saved),
    resume, and get a BIT-identical result: the fixed-point state is
    exactly the checkpointed intensity, so the remaining iterations are
    the same arithmetic (VERDICT r04 #4)."""
    full = cbet_solve_composed(comp_cfg, comp_ctx,
                               backend="pallas_interpret", beam_groups=2,
                               cache_dir=str(tmp_path), verbose=False)
    ckpt = str(tmp_path / "cbet_ck.npz")
    out = cbet_solve_composed(comp_cfg, comp_ctx,
                              backend="pallas_interpret", beam_groups=2,
                              cache_dir=str(tmp_path), verbose=False,
                              checkpoint_path=ckpt, stop_after_iterations=2)
    assert out is None and os.path.exists(ckpt)
    res = cbet_solve_composed(comp_cfg, comp_ctx,
                              backend="pallas_interpret", beam_groups=2,
                              cache_dir=str(tmp_path), verbose=False,
                              checkpoint_path=ckpt, resume=True)
    assert res.converged == full.converged
    assert res.iterations == full.iterations
    assert res.history == full.history
    np.testing.assert_array_equal(res.intensity, full.intensity)
    np.testing.assert_array_equal(res.edep, full.edep)
    # a resume that lands ON the converged iteration rebuilds the result
    # from the checkpoint's edep levels without re-tracing
    res2 = cbet_solve_composed(comp_cfg, comp_ctx,
                               backend="pallas_interpret", beam_groups=2,
                               cache_dir=str(tmp_path), verbose=False,
                               checkpoint_path=ckpt, resume=True)
    np.testing.assert_array_equal(res2.edep, full.edep)
    assert res2.converged


def test_composed_resume_after_raising_max_iters(comp_cfg, comp_ctx,
                                                 tmp_path):
    """The recovery path the module's own non-convergence error instructs:
    a solve that hits cbet_max_iters without converging must be resumable
    with a RAISED cbet_max_iters (the fingerprint normalizes the outer-loop
    bounds), and the continuation must be bit-identical to an uninterrupted
    full solve (r05 review finding)."""
    full = cbet_solve_composed(comp_cfg, comp_ctx,
                               backend="pallas_interpret", beam_groups=2,
                               cache_dir=str(tmp_path), verbose=False)
    assert full.converged and full.iterations > 1
    ckpt = str(tmp_path / "cbet_ck3.npz")
    short = cbet_solve_composed(comp_cfg.replace(cbet_max_iters=1),
                                comp_ctx, backend="pallas_interpret",
                                beam_groups=2, cache_dir=str(tmp_path),
                                verbose=False, checkpoint_path=ckpt)
    assert not short.converged and short.iterations == 1
    res = cbet_solve_composed(comp_cfg, comp_ctx,   # max_iters back to 8
                              backend="pallas_interpret", beam_groups=2,
                              cache_dir=str(tmp_path), verbose=False,
                              checkpoint_path=ckpt, resume=True)
    assert res.converged
    assert res.iterations == full.iterations
    assert res.history == full.history
    np.testing.assert_array_equal(res.intensity, full.intensity)
    np.testing.assert_array_equal(res.edep, full.edep)


def test_composed_rejects_unsupported_modes(comp_cfg, comp_ctx):
    """Configs requesting solver paths the composed solve does not
    implement must be rejected loudly, not silently substituted."""
    with pytest.raises(ValueError, match="lookup"):
        cbet_solve_composed(comp_cfg.replace(cbet_gain_mode="kernel_cell"),
                            comp_ctx, backend="pallas_interpret",
                            verbose=False)
    with pytest.raises(ValueError, match="relaxed iteration"):
        cbet_solve_composed(comp_cfg.replace(cbet_accel="anderson"),
                            comp_ctx, backend="pallas_interpret",
                            verbose=False)
    with pytest.raises(ValueError, match="light_iterations"):
        cbet_solve_composed(
            comp_cfg.replace(cbet_light_iterations=True), comp_ctx,
            backend="pallas_interpret", verbose=False)
    with pytest.raises(ValueError, match="gain_stride"):
        cbet_solve_composed(
            comp_cfg.replace(cbet_gain_stride=2, deposit_batch_steps=2),
            comp_ctx, backend="pallas_interpret", verbose=False)


def test_composed_checkpoint_rejects_different_run(comp_cfg, comp_ctx,
                                                   tmp_path):
    """A CBET checkpoint must not resume a structurally different solve."""
    ckpt = str(tmp_path / "cbet_ck2.npz")
    cbet_solve_composed(comp_cfg, comp_ctx, backend="pallas_interpret",
                        beam_groups=2, cache_dir=str(tmp_path),
                        verbose=False, checkpoint_path=ckpt,
                        stop_after_iterations=1)
    with pytest.raises(ValueError, match="fingerprint"):
        cbet_solve_composed(comp_cfg.replace(intensity=2e14), comp_ctx,
                            backend="pallas_interpret", beam_groups=2,
                            cache_dir=str(tmp_path), verbose=False,
                            checkpoint_path=ckpt, resume=True)


def test_cli_run_composed_cbet(tmp_path):
    """`run --composed --cbet` routes the CBET stage through the resumable
    composed solve and writes the coupled outputs (--cbet-only skips the
    uncoupled composed trace)."""
    import json
    import subprocess
    import sys

    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH="/root/repo")
    ckpt = str(tmp_path / "cbet_ck.npz")
    out = subprocess.run(
        [sys.executable, "-m", "cbet_raytracing_3d_tpu.cli", "run",
         "--nbeams", "2", "--rays-per-zone", "1", "--nx", "24", "--ny", "24",
         "--nz", "24", "--tiles-per-block", "1", "--chunk-steps", "8",
         "--deposit-batch-steps", "4", "--cbet-max-iters", "2",
         "--deposit-backend", "pallas_interpret",
         "--composed", "--cbet", "--cbet-only",
         "--cbet-checkpoint", ckpt,
         "--out-dir", str(tmp_path), "--formats", "npz,json",
         "--cache-dir", str(tmp_path / "cache"), "--quiet"],
        capture_output=True, text=True, timeout=600, env=env,
        cwd="/root/repo")
    assert out.returncode == 0, out.stderr[-3000:]
    assert os.path.exists(os.path.join(tmp_path, "edep.npz"))
    assert os.path.exists(ckpt)
    data = np.load(os.path.join(tmp_path, "edep.npz"))
    assert "cbet_edep" in data and "cbet_intensity" in data
    meta = json.load(open(os.path.join(tmp_path, "edep.json")))
    assert "cbet" in meta
