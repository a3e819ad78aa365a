"""CBET per-iteration cost, round 3c: pin the residual gap and measure
cbet_plan_headroom on the chip.

From artifacts/cbet_decomp_r03b.json: full 6.285 s, gain ~0.20 s,
intensity ~1.09 s, plain segmented trace 2.208 s — leaving ~5.0 s of
"trace-shaped" work, while the tile-step work ratio is only 1.44x
(scripts/analyze_cbet_plan_work.py: superset plan 1.44 -> 1.27 of it,
per-beam padding the rest).  This run measures (a) the combined
no_gain,no_intensity ablation (additivity check), (b) headroom plans
0.25/0.5 with exact-parity checks (same model, tighter segments; the
dropped-alive hard error guards correctness).

Run on the TPU:
    PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_cbet_decomp_r03c.py
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from cbet_raytracing_3d_tpu.utils.compile_cache import (  # noqa: E402
    enable_persistent_cache,
)

enable_persistent_cache()

import jax                                                    # noqa: E402
import jax.numpy as jnp                                       # noqa: E402

from cbet_raytracing_3d_tpu import Config                     # noqa: E402
from cbet_raytracing_3d_tpu.models import cbet, raytracer as rt  # noqa: E402
from cbet_raytracing_3d_tpu.models import tileplan as tp      # noqa: E402
from cbet_raytracing_3d_tpu.parallel import sharding as sh    # noqa: E402

CACHE = ".cbet_cache"


def timed(fn, args, reps=3):
    out = fn(*args)
    jax.device_get(out[3])
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.device_get(out[3])
        best = min(best, time.perf_counter() - t0)
    return best, out


def build(cfg, ctx, _ablate=""):
    """Mirror _build_solver's single-device segmented setup (incl. the
    cbet_plan_headroom-scaled plan)."""
    rpt = ctx.layout.rays_per_tile
    state0 = sh.put_state(sh.pad_rays(ctx.state0,
                                      rpt * cfg.tiles_per_block))
    bid_np = np.maximum(np.asarray(ctx.beam_id), 0).astype(np.int32)
    bid = jnp.asarray(np.pad(bid_np, (0, state0.n - bid_np.shape[0])))
    tpg = (ctx.state0.n // rpt) // cfg.nbeams
    segments = seg_tpgs = None
    if cfg.cbet_segmented:
        plan_cfg = cfg.replace(
            stop_fraction=cfg.stop_fraction * cfg.cbet_plan_headroom)
        plan = tp.get_or_measure_plan(plan_cfg, ctx, state0, CACHE)
        segments, seg_tpgs = tp.build_beam_segments(plan, cfg, cfg.nt,
                                                    cfg.nbeams)
    fn = jax.jit(cbet.make_cbet_trace_fn(
        cfg, ctx, tiles_per_group=tpg, segments=segments,
        seg_tpgs=seg_tpgs, _ablate=_ablate)())
    work = (sum(int(s.tiles.shape[0]) * sum(int(c) for c in s.chunk_lengths)
                for s in segments) if segments else None)
    return fn, state0, bid, work


@jax.jit
def relerr(a, b):
    a = a.astype(jnp.float32) if a.dtype != b.dtype else a
    return (jnp.sqrt(jnp.sum((a - b) ** 2))
            / jnp.maximum(jnp.sqrt(jnp.sum(b ** 2)), 1e-300))


def main():
    rec = {}
    t0 = time.perf_counter()
    jax.device_get(jnp.zeros(8))
    print(f"backend up {time.perf_counter() - t0:.1f}s", flush=True)

    cfg = Config(cbet_segmented=True)
    t0 = time.perf_counter()
    ctx = rt.prepare_device(cfg)
    jax.device_get(ctx.state0.uray[0])
    print(f"prepare_device {time.perf_counter() - t0:.1f}s", flush=True)
    field4 = ctx.field4

    rng = np.random.default_rng(0)
    P = cfg.nx * cfg.ny * cfg.nz
    gain = jnp.asarray(rng.normal(0, 1e-4,
                                  (cfg.nbeams, P)).astype(np.float32))

    # tunnel-health anchor
    plan0 = tp.get_or_measure_plan(cfg, ctx,
                                   sh.pad_rays(ctx.state0,
                                               ctx.layout.rays_per_tile
                                               * cfg.tiles_per_block), CACHE)
    seg0 = tp.build_segments(plan0, cfg, cfg.nt)
    plain = jax.jit(rt.make_segmented_trace_fn(cfg, ctx.layout.rays_per_tile,
                                               seg0))
    st_pad = sh.put_state(sh.pad_rays(ctx.state0, ctx.layout.rays_per_tile
                                      * cfg.tiles_per_block))
    o = plain(field4, st_pad)
    jax.device_get(o[2])
    t0 = time.perf_counter()
    o = plain(field4, st_pad)
    jax.device_get(o[2])
    rec["anchor_plain_trace_s"] = round(time.perf_counter() - t0, 3)
    print(f"anchor plain segmented trace {rec['anchor_plain_trace_s']:.3f} s",
          flush=True)

    out_ref = None
    for label, h, abl in (("h0_full", 0.0, ""),
                          ("h0_bare", 0.0, "no_gain,no_intensity"),
                          ("h25_full", 0.25, ""),
                          ("h50_full", 0.5, "")):
        c = cfg.replace(cbet_plan_headroom=h)
        fn, state0, bid, work = build(c, ctx, _ablate=abl)
        t, out = timed(fn, (field4, gain, bid, state0))
        dropped = int(jax.device_get(out[4])) if len(out) > 4 else -1
        rec[f"cbet_{label}_s"] = round(t, 3)
        rec[f"cbet_{label}_work"] = work
        print(f"cbet {label:<9} {t:7.3f} s (work {work}, "
              f"oflow {int(jax.device_get(out[3]))}, dropped {dropped})",
              flush=True)
        if dropped:
            print(f"  !! dropped {dropped} live rays — headroom {h} invalid",
                  flush=True)
        if label == "h0_full":
            out_ref = out
        elif abl == "" and out_ref is not None:
            for i, what in ((0, "edep"), (1, "intensity")):
                r = float(jax.device_get(relerr(out[i], out_ref[i])))
                rec[f"{label}_vs_h0_{what}_rel_l2"] = r
                print(f"  {label} vs h0 {what} rel_l2 {r:.3e}", flush=True)

    with open("artifacts/cbet_decomp_r03c.json", "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
