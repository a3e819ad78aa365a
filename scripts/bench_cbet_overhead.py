"""Round-3 CBET-trace structural-overhead attribution (on the TPU).

The exact CBET iteration traces at ~6.2 s while the base segmented trace
runs ~2.2 s.  Measured components (prior session): intensity deposit
~1.1 s, gain lookup ~0.2 s — leaving ~2.5-3 s structurally unexplained.
This job measures, back-to-back in ONE session (tunnel health varies 2x
across sessions — every number here shares the same anchor):

  anchor   base segmented trace (plain integrator)
  full     gain-aware CBET trace (segmented, sliced)
  no_gain            - gain application/lookup
  no_intensity       - intensity deposit (incl. contrib compute)
  no_both            - both (the structural floor of the CBET harness)

Each timed scalar-fenced, min of 3.  Prints one JSON line.
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from cbet_raytracing_3d_tpu import Config  # noqa: E402
from cbet_raytracing_3d_tpu.models import (cbet, raytracer as rt,  # noqa: E402
                                           tileplan as tp)
from cbet_raytracing_3d_tpu.parallel import sharding as sh  # noqa: E402

CACHE = os.path.join(REPO, ".cbet_cache")


def timed(fn, *args, fence, reps=3):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.device_get(fence(out))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    cfg = Config()
    ctx = rt.prepare(cfg, host_state=True, cache_dir=CACHE)
    out = {}

    # --- anchor: base segmented trace ---
    state_b = sh.put_state(sh.pad_rays(
        rt.select_rays(ctx.state0, ctx.live_slots),
        ctx.layout.rays_per_tile * cfg.tiles_per_block))
    plan = tp.get_or_measure_plan(cfg, ctx, state_b, CACHE)
    segs = tp.build_segments(plan, cfg, cfg.nt)
    base = jax.jit(rt.make_segmented_trace_fn(
        cfg, ctx.layout.rays_per_tile, segs))
    base(ctx.field4, state_b)
    out["anchor_base_trace"] = timed(base, ctx.field4, state_b,
                                     fence=lambda o: o[2])
    print(f"anchor {out['anchor_base_trace']:.3f}s", flush=True)

    # --- CBET traces (segmented + sliced, zero gain field) ---
    ccfg = cfg.replace(cbet_segmented=True)
    slots = cbet.live_tile_slots(ccfg, ctx)
    rpt = ctx.layout.rays_per_tile
    state0 = sh.put_state(sh.pad_rays(rt.select_rays(ctx.state0, slots),
                                      rpt * ccfg.tiles_per_block))
    tpg = (len(slots) // rpt) // ccfg.nbeams
    bid_np = np.maximum(np.asarray(ctx.beam_id)[slots], 0).astype(np.int32)
    bid = jnp.asarray(np.pad(bid_np, (0, state0.n - bid_np.shape[0])))
    plan_cfg = ccfg.replace(stop_fraction=0.0)
    plan_c = tp.get_or_measure_plan(plan_cfg, ctx, state0, CACHE)
    segments, seg_tpgs = tp.build_beam_segments(plan_c, ccfg, ccfg.nt,
                                                ccfg.nbeams)
    gain = jnp.zeros((ccfg.nbeams, ccfg.nx * ccfg.ny * ccfg.nz), jnp.float32)

    for tag, ablate in [("full", ""), ("no_gain", "no_gain"),
                        ("no_intensity", "no_intensity"),
                        ("no_both", "no_gain,no_intensity")]:
        tr = jax.jit(cbet.make_cbet_trace_fn(
            ccfg, ctx, tiles_per_group=tpg, segments=segments,
            seg_tpgs=seg_tpgs, _ablate=ablate)())
        tr(ctx.field4, gain, bid, state0)
        out[tag] = timed(tr, ctx.field4, gain, bid, state0,
                         fence=lambda o: o[3])
        print(f"{tag} {out[tag]:.3f}s", flush=True)

    out = {k: round(v, 3) for k, v in out.items()}
    print(json.dumps(out), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
