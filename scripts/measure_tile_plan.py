"""Measure per-tile whole-trace deposit bounding boxes and per-chunk
tile-alive occupancy on the real scene, for tile_zones=4 and 2.

The deposit for a ray alive at step start touches padded-grid nodes
[c, c+2] per axis at its NEW cell, so the required box edge per tile is
extent(c) + 3.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from cbet_raytracing_3d_tpu import Config
from cbet_raytracing_3d_tpu.models import raytracer as rt
from cbet_raytracing_3d_tpu.parallel.sharding import pad_rays


def plan(cfg):
    ctx = rt.prepare(cfg)
    rpt = ctx.layout.rays_per_tile
    state0 = pad_rays(rt.select_rays(ctx.state0, ctx.live_slots),
                      rpt * cfg.tiles_per_block)
    T = state0.n // rpt
    dstep = rt.make_deferred_step_fn(cfg)
    big = jnp.int32(10**6)

    @jax.jit
    def run(field4, st):
        mins = jnp.full((3, T), big)
        maxs = jnp.full((3, T), -big)

        def body(carry, _):
            st, mins, maxs = carry
            st, (cell, frac, inc) = dstep(st, field4)
            live = (inc > 0).reshape(T, rpt)
            any_live = live.any(axis=1)
            newmins, newmaxs = [], []
            for ax in range(3):
                c = cell[ax].reshape(T, rpt)
                newmins.append(jnp.minimum(
                    mins[ax], jnp.where(live, c, big).min(axis=1)))
                newmaxs.append(jnp.maximum(
                    maxs[ax], jnp.where(live, c, -big).max(axis=1)))
            return (st, jnp.stack(newmins), jnp.stack(newmaxs)), any_live

        (st, mins, maxs), alive_steps = jax.lax.scan(
            body, (state0, mins, maxs), None, length=cfg.nt)
        return mins, maxs, alive_steps

    t0 = time.perf_counter()
    mins, maxs, alive_steps = run(ctx.field4, state0)
    mins = np.asarray(jax.device_get(mins))
    maxs = np.asarray(jax.device_get(maxs))
    alive = np.asarray(jax.device_get(alive_steps))      # (nt, T)
    print(f"  plan run {time.perf_counter()-t0:.1f}s  tiles={T} rpt={rpt}")

    ever = maxs[0] >= 0
    ext = np.where(ever[None, :], maxs - mins + 1, 0)    # (3, T)
    need = ext + 2                                        # +2: node span c..c+2
    print(f"  tiles ever-live: {ever.sum()}/{T}")
    for ax, nm in enumerate("xyz"):
        e = need[ax][ever]
        print(f"  box_{nm} needed: max={e.max()} p99={np.percentile(e,99):.0f} "
              f"p90={np.percentile(e,90):.0f} median={np.median(e):.0f}")
    # per-chunk tile-alive fraction
    ch = cfg.chunk_steps
    nch = -(-cfg.nt // ch)
    fr = [alive[i*ch:(i+1)*ch].any(axis=0).mean() for i in range(nch)]
    print("  per-chunk live-tile fraction:",
          " ".join(f"{f:.2f}" for f in fr))
    return mins, maxs, alive


if __name__ == "__main__":
    for tz in ([int(a) for a in sys.argv[1:]] or [4, 2]):
        print(f"tile_zones={tz}")
        plan(Config(tile_zones=tz))
