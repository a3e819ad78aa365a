"""Round-3 follow-up: re-measure the 60-beam CBET walls with the solver
cache (cbet._get_solver) in place.

The on-chip per-iteration decomposition (DESIGN_NOTES "CBET solver
cache") showed the 127 s sliced-exact wall held only ~66 s of iterations;
the warm-up solve now absorbs the rebuild, so these walls should approach
iterations + initial trace + result fetch.  Updates artifacts/cbet_r03.json
in place (keys 60beam_lookup_exact_fast / 60beam_kernel).

Also prints an ANCHOR trace first (plain segmented OMEGA trace, expect
~2.2 s) — per CLAUDE.md, no timing is trusted without it.
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import dataclasses as dc  # noqa: E402

import jax  # noqa: E402

from cbet_raytracing_3d_tpu import Config  # noqa: E402
from cbet_raytracing_3d_tpu.models import cbet, raytracer as rt  # noqa: E402
from cbet_raytracing_3d_tpu.models import tileplan as tp  # noqa: E402
from cbet_raytracing_3d_tpu.parallel import sharding as sh  # noqa: E402

CACHE = os.path.join(REPO, ".cbet_cache")
ART = os.path.join(REPO, "artifacts", "cbet_r03.json")


def anchor(cfg, ctx):
    state0 = sh.put_state(sh.pad_rays(
        rt.select_rays(ctx.state0, ctx.live_slots),
        ctx.layout.rays_per_tile * cfg.tiles_per_block))
    plan = tp.get_or_measure_plan(cfg, ctx, state0, CACHE)
    segments = tp.build_segments(plan, cfg, cfg.nt)
    fn = jax.jit(rt.make_segmented_trace_fn(
        cfg, ctx.layout.rays_per_tile, segments))
    out = fn(ctx.field4, state0)
    jax.device_get(out[2])
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(ctx.field4, state0)
        jax.device_get(out[2])
        ts.append(time.perf_counter() - t0)
    t = min(ts)
    print(f"ANCHOR segmented trace {t:.3f}s (expect ~2.2; degraded-tunnel "
          f"readings are ~2x)", flush=True)
    return t


def solve(tag, cfg, ctx, out):
    t0 = time.perf_counter()
    cbet.cbet_solve(dc.replace(cfg, cbet_max_iters=1), ctx,
                    cache_dir=CACHE)
    warm = time.perf_counter() - t0
    t0 = time.perf_counter()
    res = cbet.cbet_solve(cfg, ctx, verbose=True, cache_dir=CACHE)
    t = time.perf_counter() - t0
    print(f"[{tag}] iters={res.iterations} conv={res.converged} "
          f"wall={t:.1f}s warm={warm:.1f}s edep={res.edep.sum():.8e}",
          flush=True)
    out[tag] = {"wall_seconds": round(t, 1), "warm_seconds": round(warm, 1),
                "iterations": res.iterations,
                "converged": bool(res.converged),
                "edep_total": float(res.edep.sum())}
    return res


def main():
    with open(ART) as f:
        out = json.load(f)
    cfg = Config()
    ctx = rt.prepare(cfg, host_state=True, cache_dir=CACHE)
    t_anchor = anchor(cfg, ctx)
    out["anchor_trace_seconds"] = round(t_anchor, 3)

    r60f = solve("60beam_lookup_exact_fast",
                 cfg.replace(cbet_segmented=True), ctx, out)
    prev_total = out.get("60beam_lookup_exact", {}).get("edep_total")
    if prev_total is not None:
        drift = abs(float(r60f.edep.sum()) - prev_total) / abs(prev_total)
        print(f"exact-fast total vs recorded plain exact: rel {drift:.3e}",
              flush=True)
        out["60beam_exact_fast_total_rel_drift"] = drift
    solve("60beam_kernel",
          cfg.replace(cbet_gain_mode="kernel", cbet_segmented=True), ctx,
          out)

    with open(ART, "w") as f:
        json.dump(out, f, indent=2)
    print("DONE", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
