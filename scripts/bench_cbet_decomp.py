"""Decompose the CBET iteration cost on the real chip.

A CBET fixed-point iteration = one gain-aware trace (models/cbet.py).  Per
step it adds, on top of the base integrator step (field row-gather + state
arithmetic + edep deposit):

  (a) the gain lookup   — 1-wide gather from the (B*P,) gain table,
  (b) the path element  — ds = |v| * dt arithmetic + exp,
  (c) the intensity deposit — grouped Pallas kernel over nbeams grids.

This script times the full CBET trace and ablated variants to attribute
wall-clock to each component, mirroring the trace-side decomposition in
DESIGN_NOTES.md.  Run on the TPU:

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_cbet_decomp.py
"""

import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax                                                    # noqa: E402
import jax.numpy as jnp                                       # noqa: E402

from cbet_raytracing_3d_tpu import Config                     # noqa: E402
from cbet_raytracing_3d_tpu.models import cbet, raytracer as rt  # noqa: E402
from cbet_raytracing_3d_tpu.parallel import sharding as sh    # noqa: E402


def timed(fn, *args, reps=3):
    out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0])
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.device_get(jax.tree_util.tree_leaves(out)[0])
        best = min(best, time.perf_counter() - t0)
    return best, out


def main():
    cfg = Config()
    t0 = time.perf_counter()
    ctx = rt.prepare(cfg, host_state=True, cache_dir=".cbet_cache")
    print(f"prepare {time.perf_counter() - t0:.1f}s", flush=True)

    slots = cbet.live_tile_slots(cfg, ctx)
    state0 = sh.put_state(sh.pad_rays(
        rt.select_rays(ctx.state0, slots),
        ctx.layout.rays_per_tile * cfg.tiles_per_block))
    tpg = (len(slots) // ctx.layout.rays_per_tile) // cfg.nbeams
    bid_np = np.maximum(np.asarray(ctx.beam_id)[slots], 0).astype(np.int32)
    bid = jnp.asarray(np.pad(bid_np, (0, state0.n - bid_np.shape[0])))
    field4 = jnp.asarray(ctx.field4)
    P = cfg.nx * cfg.ny * cfg.nz
    nb = cfg.nbeams
    # a realistic non-zero gain field (random smooth-ish values at gain scale)
    rng = np.random.default_rng(0)
    gain = jnp.asarray(rng.normal(0, 1e-4, size=(nb, P)).astype(np.float32))

    print(f"slots traced: {state0.n}", flush=True)

    # 1. plain trace (no CBET machinery at all)
    plain = jax.jit(rt.make_trace_fn(cfg, ctx.layout.rays_per_tile))
    t_plain, _ = timed(plain, field4, state0)
    print(f"plain trace           {t_plain:7.3f} s", flush=True)

    # 2. full CBET trace (gain lookup + intensity grouped kernel)
    full = jax.jit(cbet.make_cbet_trace_fn(cfg, ctx, tiles_per_group=tpg)())
    t_full, out = timed(full, field4, gain, bid, state0)
    print(f"cbet full             {t_full:7.3f} s  "
          f"(oflow {int(jax.device_get(out[3]))})", flush=True)

    # 3. ablated variants isolate the two CBET-specific per-step costs
    for abl in ("no_gain", "no_intensity"):
        fn = jax.jit(cbet.make_cbet_trace_fn(cfg, ctx, tiles_per_group=tpg,
                                             _ablate=abl)())
        t, _ = timed(fn, field4, gain, bid, state0)
        print(f"cbet {abl:<16} {t:7.3f} s", flush=True)

    return 0


if __name__ == "__main__":
    sys.exit(main())
