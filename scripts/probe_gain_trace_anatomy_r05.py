"""Round-5 gain-trace anatomy probe: decompose the exact CBET iteration's
~4.5 s segmented trace (vs the 2.2 s plain anchor) into its two poles:

  (a) PLAN LIVENESS — the CBET plan is measured with a scaled stop rule
      (stop_fraction * cbet_plan_headroom, models/cbet.py:1301-1307) so it
      stays valid when gain keeps rays alive longer; those extra live
      tile-steps are PHYSICAL work any exact solver pays, and
  (b) GAIN MACHINERY + INTENSITY — the in-kernel one-hot gain contraction,
      per-step ds/uray updates, and the grouped intensity deposit.

Isolation: run the PLAIN segmented tracer (zero gain machinery) on the
CBET plan's segments.  Then
    pole (a) = plain_on_cbet_plan - plain_on_prod_plan
    pole (b) = solve_iteration    - plain_on_cbet_plan
Host-side, the plans' padded tile-step sums predict pole (a)'s ratio.

The round-4/5 probes attacked pole (b)'s intensity share (1.14 s,
artifacts/cbet_intensity_probe_r05.json) but never separated (a) from the
gain machinery — this closes that attribution.  All traces segmented,
OMEGA 60 beams, scalar-fenced, min of 3.

Writes artifacts/gain_trace_anatomy_r05.json.
"""

import dataclasses
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

import jax  # noqa: E402

from cbet_raytracing_3d_tpu import Config                     # noqa: E402
from cbet_raytracing_3d_tpu.models import raytracer as rt     # noqa: E402
from cbet_raytracing_3d_tpu.models import tileplan as tp      # noqa: E402
from cbet_raytracing_3d_tpu.models.cbet import cbet_solve     # noqa: E402
from cbet_raytracing_3d_tpu.parallel import sharding as sh    # noqa: E402

OUT = {}


def padded_tile_steps(segments) -> int:
    """Executed tile-step work of a segment schedule: each segment runs
    ALL its (block-padded) tiles for all its chunk steps."""
    return int(sum(len(s.tiles) * sum(s.chunk_lengths) for s in segments))


def timed_plain(label, segments, cfg, ctx, state0, n=3):
    fn = jax.jit(rt.make_segmented_trace_fn(
        cfg, ctx.layout.rays_per_tile, segments))
    out = fn(ctx.field4, state0)
    jax.device_get(out[2])                  # compile + warm
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(ctx.field4, state0)
        jax.device_get(out[2])              # scalar fence (overflow)
        ts.append(time.perf_counter() - t0)
    OUT[label] = round(min(ts), 3)
    print(label, OUT[label], flush=True)


def main(cfg=None, out_name="gain_trace_anatomy_r05.json"):
    cfg = cfg or Config()
    ctx = (rt.prepare_device(cfg) if jax.default_backend() != "cpu"
           else rt.prepare(cfg, host_state=False))
    rpt = ctx.layout.rays_per_tile
    state0 = sh.pad_rays(ctx.state0, rpt * cfg.tiles_per_block)

    # production (termination-aware) plan — the 2.2 s anchor
    plan_prod = tp.get_or_measure_plan(cfg, ctx, state0, ".cbet_cache")
    segs_prod = tp.build_segments(plan_prod, cfg, cfg.nt)

    # the CBET solve's plan: scaled stop rule (headroom 0.5, the bench
    # setting) and the unconditional gain-proof plan (stop_fraction=0)
    cfg_hr = cfg.replace(stop_fraction=cfg.stop_fraction * 0.5)
    plan_hr = tp.get_or_measure_plan(cfg_hr, ctx, state0, ".cbet_cache")
    segs_hr = tp.build_segments(plan_hr, cfg, cfg.nt)
    cfg_gp = cfg.replace(stop_fraction=0.0)
    plan_gp = tp.get_or_measure_plan(cfg_gp, ctx, state0, ".cbet_cache")
    segs_gp = tp.build_segments(plan_gp, cfg, cfg.nt)

    OUT["tile_steps_prod_plan"] = padded_tile_steps(segs_prod)
    OUT["tile_steps_headroom_plan"] = padded_tile_steps(segs_hr)
    OUT["tile_steps_gainproof_plan"] = padded_tile_steps(segs_gp)
    OUT["plan_work_ratio_headroom"] = round(
        OUT["tile_steps_headroom_plan"] / OUT["tile_steps_prod_plan"], 3)
    OUT["plan_work_ratio_gainproof"] = round(
        OUT["tile_steps_gainproof_plan"] / OUT["tile_steps_prod_plan"], 3)
    print("plan work ratios:", OUT["plan_work_ratio_headroom"],
          OUT["plan_work_ratio_gainproof"], flush=True)

    timed_plain("plain_on_prod_plan", segs_prod, cfg, ctx, state0)
    timed_plain("plain_on_headroom_plan", segs_hr, cfg, ctx, state0)
    timed_plain("plain_on_gainproof_plan", segs_gp, cfg, ctx, state0)

    # the solve's own per-iteration wall (kernel_cell, segmented, headroom
    # 0.5 — the bench path): warm once, then take the min steady iteration
    cfg_s = dataclasses.replace(cfg, cbet_segmented=True,
                                cbet_plan_headroom=0.5,
                                cbet_gain_mode="kernel_cell")
    cbet_solve(dataclasses.replace(cfg_s, cbet_max_iters=1), ctx,
               cache_dir=".cbet_cache")
    res = cbet_solve(cfg_s, ctx, cache_dir=".cbet_cache")
    iters = res.stats.get("iter_seconds", [])
    OUT["solve_iter_seconds"] = iters
    OUT["solve_iter_min"] = round(min(iters), 3) if iters else None

    if iters:
        OUT["anatomy"] = {
            "pole_plan_liveness": round(
                OUT["plain_on_headroom_plan"] - OUT["plain_on_prod_plan"],
                3),
            "pole_gain_machinery_plus_intensity": round(
                OUT["solve_iter_min"] - OUT["plain_on_headroom_plan"], 3),
            "intensity_share_prior": 1.14,   # cbet_intensity_probe_r05
        }
    with open(os.path.join(REPO, "artifacts", out_name), "w") as f:
        json.dump(OUT, f, indent=1)
    print(json.dumps(OUT))


if __name__ == "__main__":
    main()
