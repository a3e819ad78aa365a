"""BASELINE config 4 with the fast machinery composed (round-3) — now a
thin wrapper over ``runner.run_composed`` (round-4), which owns the loop:

* on-device init (prepare_device — the 64M-ray state is born on-chip),
* host-orchestrated SEGMENTED tile compaction on a cached tile plan
  (single multi-minute executions are killed by the tunneled worker, so
  segments dispatch chunk-by-chunk with jitted tile-row gathers between),
* float64-equivalent master accumulation: per-chunk f32 deposit grids
  combined by a binary-counter pairwise reducer (log2(n_chunks) addition
  depth ~= 5, vs 32 serial f32 adds),
* segment-boundary CHECKPOINTING (out/config4.ckpt.npz): pass ``resume``
  as argv[1] to continue an interrupted run — the restored pairwise
  accumulator levels make the resumed master bit-identical.

Writes a summary to stdout; compare edep_total against the round-2/3
recorded runs (BASELINE.md: 6.08271083e18).
"""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from cbet_raytracing_3d_tpu.utils.compile_cache import enable_persistent_cache  # noqa: E402
enable_persistent_cache()   # Mosaic AOT segment compiles dominate the cold wall
from cbet_raytracing_3d_tpu import Config                       # noqa: E402
from cbet_raytracing_3d_tpu.runner import run_composed          # noqa: E402

CACHE = os.path.join(REPO, ".cbet_cache")
CKPT = os.path.join(REPO, "out", "config4.ckpt.npz")

# deposit_batch_steps=1: batch=5's deposit-stream buffers are 22.8 GB at
# N=54.4M slots (measured compile-time OOM); batch=2 fits but measured
# EQUAL to batch=1 (~25 s/chunk at 60480 tiles).  The composed win is the
# segmented compaction (306 s steady vs round-2's 535 s uncompacted).
cfg = Config(nx=200, ny=200, nz=200, rays_per_zone=15, tile_zones=2,
             deposit_box_x=24, deposit_box_y=24, deposit_box_z=24,
             deposit_batch_steps=1)

resume = "resume" in sys.argv[1:]
# checkpointing is OPT-IN here: each segment-boundary checkpoint fetches
# the ~3 GB state through the ~22 MB/s debug tunnel (minutes) — on local
# PCIe hardware it would be seconds and always-on would be the right call
ckpt = CKPT if (resume or "checkpoint" in sys.argv[1:]) else None
os.makedirs(os.path.dirname(CKPT), exist_ok=True)
t0 = time.perf_counter()
res = run_composed(cfg, min_tiles=18000, backend="pallas_hbm",
                   cache_dir=CACHE, checkpoint_path=ckpt, resume=resume)
wall = time.perf_counter() - t0
print(f"wall {wall:.0f}s trace {res.timings['Tracing']:.0f}s "
      f"init {res.timings['Init']:.0f}s", flush=True)
print(f"edep_total={res.stats['edep_total']:.8e} "
      f"launched={res.stats['rays_launched']} "
      f"alive_at_end={res.stats['rays_alive_at_end']}", flush=True)
ec = abs(res.stats["edep_total"] - res.stats["energy_absorbed"]) / max(
    res.stats["edep_total"], 1e-300)
print("energy conservation rel err:", ec, flush=True)
print("nominal ray-steps/s:",
      cfg.total_rays * cfg.nt / res.timings["Tracing"], flush=True)
