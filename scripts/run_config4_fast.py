"""BASELINE config 4 with the fast machinery composed (round-3):

* on-device init (prepare_device — the 64M-ray state is born on-chip),
* host-orchestrated SEGMENTED tile compaction on a cached tile plan
  (single multi-minute executions are killed by the tunneled worker, so
  segments dispatch chunk-by-chunk with jitted tile-row gathers between),
* float64-equivalent master accumulation: per-chunk f32 deposit grids
  combined by a binary-counter pairwise reducer (log2(n_chunks) addition
  depth ~= 5, vs 32 serial f32 adds).

Writes a summary to stdout; compare edep_total against the round-2
recorded run (BASELINE.md)."""
import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np

import os
import sys
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from cbet_raytracing_3d_tpu.utils.compile_cache import enable_persistent_cache  # noqa: E402
enable_persistent_cache()   # Mosaic AOT segment compiles dominate the cold wall
from cbet_raytracing_3d_tpu import Config                       # noqa: E402
from cbet_raytracing_3d_tpu.models import (raytracer as rt,     # noqa: E402
                                           tileplan as tp)
from cbet_raytracing_3d_tpu.ops.pallas_deposit import finalize_edep  # noqa: E402

CACHE = os.path.join(REPO, ".cbet_cache")

# deposit_batch_steps=1: batch=5's deposit-stream buffers (the ~3 copies of
# (batch, 7, N) modeled in runner.estimate_hbm_bytes) are 22.8 GB at
# N=54.4M slots — measured compile-time OOM (program 15.0 G + args 3.0 G vs
# 15.75 G HBM).  batch=2 fits (~9 GB) but measured EQUAL to batch=1
# (~25 s/chunk at 60480 tiles, identical edep_total) — the hypothesized
# window-DMA halving is cancelled by the stream-buffer traffic, so the
# simplest setting stands.  The composed win here is the segmented
# compaction (306 s steady vs round-2's 535 s uncompacted).
cfg = Config(nx=200, ny=200, nz=200, rays_per_zone=15, tile_zones=2,
             deposit_box_x=24, deposit_box_y=24, deposit_box_z=24,
             deposit_batch_steps=1)
BACKEND = "pallas_hbm"

t0 = time.perf_counter()
ctx = rt.prepare_device(cfg)
rpt = ctx.layout.rays_per_tile
s0 = ctx.state0
jax.device_get(s0.uray[0])
t_init = time.perf_counter() - t0
print(f"init {t_init:.0f}s rays={cfg.total_rays} live_slots={s0.n} "
      f"tiles={s0.n // rpt} nt={cfg.nt}", flush=True)

t0 = time.perf_counter()
plan = tp.get_or_measure_plan(cfg, ctx, s0, CACHE, hosted=True)
# min_tiles: each extra segment costs one ~2-3 min Mosaic recompile through
# the tunneled AOT helper; the <18000-tile tail segments save <1 min compute
segments = tp.build_segments(plan, cfg, cfg.nt, min_tiles=18000)
t_plan = time.perf_counter() - t0
fr = plan.chunk_live.mean(axis=1)
print(f"plan {t_plan:.0f}s live fractions: "
      + " ".join(f"{f:.2f}" for f in fr), flush=True)
print("segments:", [(len(s.chunk_lengths), len(s.tiles)) for s in segments],
      flush=True)

chunk_fn = jax.jit(rt.make_chunk_delta_fn(cfg, rpt, BACKEND),
                   donate_argnums=(1, 2))
add = jax.jit(lambda a, b: a + b, donate_argnums=(0, 1))

# final-state write-back (device-side) for complete stats
n0 = len(segments[0].tiles) * rpt


def origin_slots(seg):
    from cbet_raytracing_3d_tpu.models.tileplan import origin_slots as _os
    return jnp.asarray(_os(seg.tiles, seg.valid, rpt, n0))


wb = jax.jit(lambda uf, af, u, a, ix: (uf.at[ix].set(u, mode="drop"),
                                       af.at[ix].set(a, mode="drop")),
             donate_argnums=(0, 1))

uray_init_h = np.asarray(jax.device_get(s0.uray_init))
alive0_h = np.asarray(jax.device_get(s0.alive))
# the final-state accounting arrays must NOT alias s0: chunk_fn donates its
# state argument, so s0's buffers die with the first chunk call
_copy = jax.jit(lambda a: a.copy())
uray_full, alive_full = _copy(s0.uray), _copy(s0.alive)
state = s0
oflow = jnp.int32(0)
slots_acc = {}


def acc_push(delta):
    lvl = 0
    while lvl in slots_acc:
        delta = add(slots_acc.pop(lvl), delta)
        lvl += 1
    slots_acc[lvl] = delta


t0 = time.perf_counter()
ci_total = 0
for si, seg in enumerate(segments):
    if si > 0:
        prev = segments[si - 1]
        uray_full, alive_full = wb(uray_full, alive_full, state.uray,
                                   state.alive, origin_slots(prev))
        pos = tp.segment_gather_rows(prev, seg,
                                     int(prev.tiles.max()) + 1)
        t_prev = len(prev.tiles)
        pos_j = jnp.asarray(pos)
        val_j = jnp.asarray(np.repeat(seg.valid, rpt))

        @jax.jit
        def gath(st, pos_j=pos_j, val_j=val_j, t_prev=t_prev):
            st = jax.tree_util.tree_map(
                lambda a: a.reshape(t_prev, rpt)[pos_j].reshape(-1), st)
            return dataclasses.replace(st, alive=st.alive & val_j)

        state = gath(state)
        print(f"  segment {si}: tiles {t_prev} -> {len(seg.tiles)}",
              flush=True)
    for steps in seg.chunk_lengths:
        state, delta, oflow = chunk_fn(ctx.field4, state, oflow,
                                       jnp.int32(steps))
        acc_push(delta)
        jax.device_get(oflow)
        ci_total += 1
        print(f"  chunk {ci_total} t={time.perf_counter() - t0:.0f}s",
              flush=True)

uray_full, alive_full = wb(uray_full, alive_full, state.uray, state.alive,
                           origin_slots(segments[-1]))
master = None
for g in slots_acc.values():
    master = g if master is None else add(master, g)
t_trace = time.perf_counter() - t0
of = int(jax.device_get(oflow))
edep = np.asarray(jax.device_get(finalize_edep(master, cfg.ny, cfg.nz)),
                  np.float64)
uray_h = np.asarray(jax.device_get(uray_full), np.float64)
alive_h = np.asarray(jax.device_get(alive_full))
absorbed = float(np.sum((uray_init_h - uray_h)[alive0_h]))
print(f"trace {t_trace:.0f}s oflow={of} edep_total={edep.sum():.8e}",
      flush=True)
print(f"launched={int(alive0_h.sum())} alive_at_end={int(alive_h.sum())}",
      flush=True)
print("energy conservation rel err:",
      abs(edep.sum() - absorbed) / edep.sum(), flush=True)
print("nominal ray-steps/s:", cfg.total_rays * cfg.nt / t_trace, flush=True)
