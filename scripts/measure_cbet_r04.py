"""Round-4 on-chip CBET measurement (VERDICT r3 ask #2): the exact-model
solve under the new levers, 60-beam OMEGA, tol 5e-3.

Variants (all segmented + plan_headroom 0.5, the bench config):
  lookup        — exact per-step lookup, 2-wide sliced gain rows (new
                  default: 1-wide gather rows measured 1.6x slower)
  lookup_rows1  — same with cbet_gain_rows2=False (the round-3 baseline)
  kernel_cell   — the Pallas one-hot entry-cell window contraction with
                  the exact in-kernel termination rule: IDENTICAL model to
                  lookup (f64-tested), zero per-step gain gathers

Records wall clocks (fetch-separated), iterations, edep totals, and the
kernel_cell-vs-lookup on-chip rel-L2 (expected at f32 chip-noise level).
Writes artifacts/cbet_r04.json.
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

    res_l = solve("lookup", base, ctx)
    solve("lookup_rows1", base.replace(cbet_gain_rows2=False), ctx)
    res_c = solve("kernel_cell", base.replace(cbet_gain_mode="kernel_cell"),
                  ctx)

    rel = (np.linalg.norm(res_c.edep - res_l.edep)
           / np.linalg.norm(res_l.edep))
    OUT["kernel_cell_vs_lookup_rel_l2"] = float(rel)
    print("kernel_cell vs lookup rel-L2:", rel, flush=True)

    with open(os.path.join(REPO, "artifacts", "cbet_r04.json"), "w") as f:
        json.dump(OUT, f, indent=2)
    print(json.dumps(OUT))
    return 0


if __name__ == "__main__":
    sys.exit(main())
