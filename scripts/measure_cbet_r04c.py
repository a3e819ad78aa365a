"""Round-4 CBET: kernel_cell + LIGHT iterations (the <=25 s attempt).

kernel_cell (exact in-kernel gain) measured 28.1-28.6 s; the remaining
dead work is the edep deposit inside intermediate iterations — each
iteration overwrites edep, only the final one is the answer.  Light
iterations run the gamma/uout-only kernel (no M-build, no deposit matmul,
no grid RMW) and one full trace afterwards reproduces edep bit-equal
(test_cbet_light_iterations_identical).

Variants (segmented + plan_headroom 0.5):
  cell_light   — kernel_cell + light iterations (the candidate metric)
  cell_full    — kernel_cell, cbet_light_iterations=False (the 28.1 anchor)

Writes artifacts/cbet_r04c.json.
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
        "light": bool(res.stats.get("light_iterations")),
        "edep_total": float(res.edep.sum()),
        "history": [round(h, 5) for h in res.history],
    }
    print(label, json.dumps(OUT[label]), flush=True)
    return res


def main() -> int:
    base = Config(cbet_segmented=True, cbet_plan_headroom=0.5,
                  cbet_gain_mode="kernel_cell")
    t0 = time.perf_counter()
    ctx = rt.prepare_device(base)
    jax.device_get(ctx.state0.uray[0])
    OUT["init_seconds"] = round(time.perf_counter() - t0, 1)
    print("init", OUT["init_seconds"], flush=True)

    res_l = solve("cell_light", base, ctx)
    res_f = solve("cell_full", base.replace(cbet_light_iterations=False),
                  ctx)

    rel = (np.linalg.norm(res_l.edep - res_f.edep)
           / np.linalg.norm(res_f.edep))
    OUT["light_vs_full_rel_l2"] = float(rel)   # expected EXACTLY 0 on chip
    print("light vs full rel-L2:", rel, flush=True)

    with open(os.path.join(REPO, "artifacts", "cbet_r04c.json"), "w") as f:
        json.dump(OUT, f, indent=2)
    print(json.dumps(OUT))
    return 0


if __name__ == "__main__":
    sys.exit(main())
