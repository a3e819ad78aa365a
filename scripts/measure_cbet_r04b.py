"""Round-4 CBET follow-up: can the exact kernel_cell solve reach <=25 s?

measure_cbet_r04 measured kernel_cell (Pallas one-hot in-kernel gain,
IDENTICAL model to the per-step lookup) at 28.1 s vs lookup's 32.5 s.
With the gain pole out of the scan, the intensity deposit binds — and its
per-window fixed costs halve with a 10-step deposit window.  kernel_cell
is exact for ANY window size (per-step entry-cell sampling + in-kernel
termination; test_cbet_gain_kernel_cell_exact_batch10), so batch=10 is a
zero-model-cost lever here, unlike the plain trace where batch=10 was a
~1% wash (artifacts/floor_r03.json).

Variants (all segmented + plan_headroom 0.5, the bench config):
  cell_b5   — kernel_cell, deposit_batch_steps=5 (the r04a 28.1 s anchor)
  cell_b10  — kernel_cell, deposit_batch_steps=10, chunk_steps=20
  lookup_b10 — per-step lookup at batch 10 (attributes the batch effect)

Writes artifacts/cbet_r04b.json.
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from cbet_raytracing_3d_tpu.utils.compile_cache import (  # noqa: E402
    enable_persistent_cache)

enable_persistent_cache()

import jax  # noqa: E402,F401

from cbet_raytracing_3d_tpu import Config                     # noqa: E402
from cbet_raytracing_3d_tpu.models import raytracer as rt     # noqa: E402
from cbet_raytracing_3d_tpu.models.cbet import cbet_solve     # noqa: E402

CACHE = os.path.join(REPO, ".cbet_cache")
OUT = {}


def solve(label, cfg, ctx):
    t0 = time.perf_counter()
    cbet_solve(cfg.replace(cbet_max_iters=1), ctx, cache_dir=CACHE)
    warm = time.perf_counter() - t0
    t0 = time.perf_counter()
    res = cbet_solve(cfg, ctx, cache_dir=CACHE, verbose=True)
    wall = time.perf_counter() - t0
    fetch = res.stats.get("result_fetch_seconds", 0.0)
    OUT[label] = {
        "warmup_seconds": round(warm, 1),
        "wallclock_seconds": round(wall - fetch, 1),
        "fetch_seconds": round(fetch, 1),
        "iterations": res.iterations,
        "converged": bool(res.converged),
        "edep_total": float(res.edep.sum()),
        "history": [round(h, 5) for h in res.history],
    }
    print(label, json.dumps(OUT[label]), flush=True)
    return res


def main() -> int:
    base = Config(cbet_segmented=True, cbet_plan_headroom=0.5)
    t0 = time.perf_counter()
    ctx = rt.prepare_device(base)
    jax.device_get(ctx.state0.uray[0])
    OUT["init_seconds"] = round(time.perf_counter() - t0, 1)
    print("init", OUT["init_seconds"], flush=True)

    res_a = solve("cell_b5", base.replace(cbet_gain_mode="kernel_cell"), ctx)
    b10 = base.replace(deposit_batch_steps=10, chunk_steps=20)
    res_b = solve("cell_b10", b10.replace(cbet_gain_mode="kernel_cell"), ctx)
    solve("lookup_b10", b10, ctx)

    rel = (np.linalg.norm(res_b.edep - res_a.edep)
           / np.linalg.norm(res_a.edep))
    OUT["cell_b10_vs_b5_rel_l2"] = float(rel)
    print("cell b10 vs b5 rel-L2:", rel, flush=True)

    with open(os.path.join(REPO, "artifacts", "cbet_r04b.json"), "w") as f:
        json.dump(OUT, f, indent=2)
    print(json.dumps(OUT))
    return 0


if __name__ == "__main__":
    sys.exit(main())
