"""Round-3 trace-floor sweep (VERDICT r2 item 4): close the gap between the
2.165 s segmented OMEGA trace and the ~1.6-1.8 s measured algorithmic floor.

Levers swept (each timed scalar-fenced, min of 3):
  1. segmentation ``shrink`` (when to start a new, smaller segment),
  2. deposit_batch_steps=10 (with chunk_steps=20 so the batch divides),
  3. the hi/lo-split bf16 field-table probe — an ADVERSARIAL re-check of
     the "bf16 rows cost 0.54x" lever: the split needs 8 bf16 lanes = the
     same 16 BYTES per row as 4xf32, and gather cost tracks bytes, so the
     prediction is NO win; the probe measures it to kill (or resurrect)
     the lever with a number.

Writes artifacts/floor_r03.json.
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax                      # noqa: E402
import jax.numpy as jnp         # noqa: E402

from cbet_raytracing_3d_tpu import Config                     # noqa: E402
from cbet_raytracing_3d_tpu.models import (raytracer as rt,   # noqa: E402
                                           tileplan as tp)
from cbet_raytracing_3d_tpu.parallel import sharding as sh    # noqa: E402

CACHE = os.path.join(REPO, ".cbet_cache")
OUT = {}


def timed(fn, *args, reps=3):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.device_get(out[2])          # scalar overflow fence
        ts.append(time.perf_counter() - t0)
    return min(ts), out


def segmented_trace_time(cfg, ctx, state0, shrink):
    plan = tp.get_or_measure_plan(cfg, ctx, state0, CACHE)
    segments = tp.build_segments(plan, cfg, cfg.nt, shrink=shrink)
    fn = jax.jit(rt.make_segmented_trace_fn(
        cfg, ctx.layout.rays_per_tile, segments))
    t_first0 = time.perf_counter()
    out = fn(ctx.field4, state0)
    jax.device_get(out[2])
    t_first = time.perf_counter() - t_first0
    t, out = timed(fn, ctx.field4, state0)
    assert int(jax.device_get(out[2])) == 0
    return t, t_first, len(segments)


def main() -> int:
    cfg = Config()
    t0 = time.perf_counter()
    ctx = rt.prepare_device(cfg)
    jax.device_get(ctx.state0.uray[0])
    OUT["init_device_seconds"] = round(time.perf_counter() - t0, 1)
    print("on-device init:", OUT["init_device_seconds"], "s", flush=True)
    state0 = sh.pad_rays(ctx.state0, ctx.layout.rays_per_tile
                         * cfg.tiles_per_block)

    # 1. shrink sweep
    for shrink in (0.95, 0.9, 0.8, 0.7):
        t, t_first, nseg = segmented_trace_time(cfg, ctx, state0, shrink)
        OUT[f"trace_shrink_{shrink}"] = {
            "seconds": round(t, 3), "segments": nseg,
            "compile_seconds": round(t_first - t, 1)}
        print(f"shrink={shrink}: {t:.3f}s ({nseg} segments)", flush=True)

    # 2. batch=10 (chunk 20 divides it; re-plans under the new chunking)
    cfg10 = cfg.replace(deposit_batch_steps=10, chunk_steps=20)
    ctx10 = rt.prepare_device(cfg10)
    s10 = sh.pad_rays(ctx10.state0, ctx10.layout.rays_per_tile
                      * cfg10.tiles_per_block)
    t, t_first, nseg = segmented_trace_time(cfg10, ctx10, s10, 0.9)
    OUT["trace_batch10_chunk20"] = {
        "seconds": round(t, 3), "segments": nseg,
        "compile_seconds": round(t_first - t, 1)}
    print(f"batch=10 chunk=20: {t:.3f}s", flush=True)
    # and batch=5 at chunk 20, to separate the chunking change from batching
    cfg5c20 = cfg.replace(chunk_steps=20)
    ctx5 = rt.prepare_device(cfg5c20)
    s5 = sh.pad_rays(ctx5.state0, ctx5.layout.rays_per_tile
                     * cfg5c20.tiles_per_block)
    t, t_first, nseg = segmented_trace_time(cfg5c20, ctx5, s5, 0.9)
    OUT["trace_batch5_chunk20"] = {
        "seconds": round(t, 3), "segments": nseg,
        "compile_seconds": round(t_first - t, 1)}
    print(f"batch=5 chunk=20: {t:.3f}s", flush=True)

    # 3. gather byte-cost probe: 4xf32 rows vs 8xbf16 (hi/lo split) rows
    P = cfg.nx * cfg.ny * cfg.nz
    N = 1_200_000
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, P, N, dtype=np.int32))
    tab32 = jnp.asarray(rng.random((P, 4), np.float32))
    tab16 = jnp.asarray(
        np.repeat(rng.random((P, 4)).astype(np.float32), 2, 1)
    ).astype(jnp.bfloat16)                     # (P, 8) bf16 = same 16 B/row

    @jax.jit
    def g32(t, ix):
        def body(c, _):
            rows = jnp.take(t, ix, axis=0)
            return c + rows[:, 0].sum(), None
        return jax.lax.scan(body, jnp.float32(0), None, length=100)[0]

    @jax.jit
    def g16(t, ix):
        def body(c, _):
            rows = jnp.take(t, ix, axis=0)
            return (c + (rows[:, 0].astype(jnp.float32)
                         + rows[:, 1].astype(jnp.float32)).sum()), None
        return jax.lax.scan(body, jnp.float32(0), None, length=100)[0]

    for name, fn, tab in (("f32x4", g32, tab32), ("bf16x8_hilo", g16, tab16)):
        jax.device_get(fn(tab, idx))           # compile
        t0 = time.perf_counter()
        jax.device_get(fn(tab, idx))
        dt = (time.perf_counter() - t0) / 100
        OUT[f"gather_{name}_ms_per_step"] = round(dt * 1e3, 3)
        print(f"gather {name}: {dt * 1e3:.3f} ms / {N} rows", flush=True)

    os.makedirs(os.path.join(REPO, "artifacts"), exist_ok=True)
    with open(os.path.join(REPO, "artifacts", "floor_r03.json"), "w") as f:
        json.dump(OUT, f, indent=2)
    print("DONE", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
