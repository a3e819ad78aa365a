"""Decompose the PRODUCTION CBET iteration cost (segmented + sliced) on the
real chip, and trial deposit_batch_steps=10 (value-identical: stride=1 keeps
per-step gain lookups; batching only defers the deposits, which never feed
back into trajectories).

Per-iteration wall on the current fast exact path is ~6 s (smoke log); the
candidates for the next cut are the per-step gain gather (latency-bound,
sliced small-table) and the grouped intensity deposit (HBM RMW traffic —
batch=10 halves the window count and with it the per-window box RMW).

Run on the TPU:
    PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_cbet_decomp_r03b.py
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
    """min-of-reps wall; fences on the scalar overflow output (index 3)."""
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
    """Mirror _build_solver's single-device segmented setup."""
    rpt = ctx.layout.rays_per_tile
    state0 = sh.put_state(sh.pad_rays(ctx.state0,
                                      rpt * cfg.tiles_per_block))
    bid_np = np.maximum(np.asarray(ctx.beam_id), 0).astype(np.int32)
    bid = jnp.asarray(np.pad(bid_np, (0, state0.n - bid_np.shape[0])))
    tpg = (ctx.state0.n // rpt) // cfg.nbeams
    segments = seg_tpgs = None
    if cfg.cbet_segmented:
        plan = tp.get_or_measure_plan(cfg.replace(stop_fraction=0.0), ctx,
                                      state0, CACHE)
        segments, seg_tpgs = tp.build_beam_segments(plan, cfg, cfg.nt,
                                                    cfg.nbeams)
    fn = jax.jit(cbet.make_cbet_trace_fn(
        cfg, ctx, tiles_per_group=tpg, segments=segments,
        seg_tpgs=seg_tpgs, _ablate=_ablate)())
    return fn, state0, bid


def main():
    rec = {}
    t0 = time.perf_counter()
    jax.device_get(jnp.zeros(8))
    print(f"backend up {time.perf_counter() - t0:.1f}s", flush=True)

    cfg = Config(cbet_segmented=True)
    t0 = time.perf_counter()
    ctx = rt.prepare_device(cfg)
    jax.device_get(ctx.state0.uray[0])
    print(f"prepare_device {time.perf_counter() - t0:.1f}s "
          f"slots={ctx.state0.n}", flush=True)
    field4 = ctx.field4

    rng = np.random.default_rng(0)
    P = cfg.nx * cfg.ny * cfg.nz
    gain = jnp.asarray(rng.normal(0, 1e-4, (cfg.nbeams, P)).astype(np.float32))

    # anchor: plain no-CBET segmented trace (tunnel-health reference)
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

    # 1. production segmented CBET trace + ablations
    for abl in ("", "no_gain", "no_intensity"):
        fn, state0, bid = build(cfg, ctx, _ablate=abl)
        t, out = timed(fn, (field4, gain, bid, state0))
        name = abl or "full"
        rec[f"cbet_seg_{name}_s"] = round(t, 3)
        print(f"cbet seg {name:<13} {t:7.3f} s "
              f"(oflow {int(jax.device_get(out[3]))})", flush=True)
    # rebuild the full variant for the value anchor
    fn5, state0, bid = build(cfg, ctx)
    _, out5 = timed(fn5, (field4, gain, bid, state0), reps=1)

    # 2. batch=10 / chunk=20 variant (exact model; value parity checked)
    cfg10 = cfg.replace(deposit_batch_steps=10, chunk_steps=20)
    t0 = time.perf_counter()
    fn10, state10, bid10 = build(cfg10, ctx)
    t, out10 = timed(fn10, (field4, gain, bid10, state10))
    rec["cbet_seg_full_b10_s"] = round(t, 3)
    print(f"cbet seg b10/c20    {t:7.3f} s "
          f"(build+compile {time.perf_counter() - t0 - 3 * t:.0f}s, "
          f"oflow {int(jax.device_get(out10[3]))})", flush=True)

    # value parity (scalar fetches only; the grids stay on device)
    @jax.jit
    def relerr(a, b):
        a = a.astype(jnp.float64) if a.dtype != jnp.float64 else a
        return (jnp.sqrt(jnp.sum((a - b) ** 2))
                / jnp.maximum(jnp.sqrt(jnp.sum(b ** 2)), 1e-300))

    for i, label in ((0, "edep"), (1, "intensity")):
        r = float(jax.device_get(relerr(out10[i], out5[i])))
        rec[f"b10_vs_b5_{label}_rel_l2"] = r
        print(f"b10 vs b5 {label} rel_l2 {r:.3e}", flush=True)

    with open("artifacts/cbet_decomp_r03b.json", "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
