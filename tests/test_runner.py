"""End-to-end runner + CLI smoke tests on a small scene (CPU)."""

import json
import os
import subprocess
import sys

import numpy as np

from cbet_raytracing_3d_tpu.config import Config
from cbet_raytracing_3d_tpu.runner import run, write_outputs

SMALL = dict(nbeams=2, rays_per_zone=1, nx=32, ny=32, nz=32)


def test_run_end_to_end(tmp_path):
    cfg = Config(**SMALL)
    res = run(cfg, verbose=False)
    assert res.stats["rays_launched"] > 0
    assert res.stats["rays_terminated"] > 0
    np.testing.assert_allclose(res.stats["edep_total"],
                               res.stats["energy_absorbed"], rtol=1e-6)
    assert set(res.timings) >= {"Init", "Tracing", "Combining", "Total"}

    paths = write_outputs(res, str(tmp_path), ("npz", "json", "txt"))
    assert all(os.path.exists(p) for p in paths)
    meta = json.load(open(os.path.join(tmp_path, "edep.json")))
    assert meta["stats"]["rays_launched"] == res.stats["rays_launched"]


def test_cli_run(tmp_path):
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PYTHONPATH="/root/repo")
    out = subprocess.run(
        [sys.executable, "-m", "cbet_raytracing_3d_tpu.cli", "run",
         "--nbeams", "1", "--rays-per-zone", "1", "--nx", "24", "--ny", "24",
         "--nz", "24", "--out-dir", str(tmp_path), "--formats", "npz,json",
         "--quiet"],
        capture_output=True, text=True, timeout=600, env=env, cwd="/root/repo")
    assert out.returncode == 0, out.stderr[-2000:]
    assert os.path.exists(os.path.join(tmp_path, "edep.npz"))
