"""BASELINE config-4 CBET demonstration (VERDICT r04 #4): the full-scale
coupled solve — 200^3 grid, rays_per_zone=15 (64.3M rays), nt=800 — through
the RESUMABLE composed CBET path (models/cbet_composed.py): host-dispatched
chunked traces on the gain-proof segmented plan, serial beam groups for HBM
control, iteration-boundary intensity checkpoints.

Run:    python scripts/run_config4_cbet_r05.py
Resume: python scripts/run_config4_cbet_r05.py resume

Writes artifacts/config4_cbet_r05.json on completion.  Reference contract:
the CBET capacities the reference scaffolds (/root/reference/def.cuh:94-114)
at the deposition-stress scale of BASELINE config 4.
"""
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from cbet_raytracing_3d_tpu.utils.compile_cache import (  # noqa: E402
    enable_persistent_cache)

enable_persistent_cache()

import jax  # noqa: E402
import numpy as np  # noqa: E402

from cbet_raytracing_3d_tpu import Config                      # noqa: E402
from cbet_raytracing_3d_tpu.models import raytracer as rt      # noqa: E402
from cbet_raytracing_3d_tpu.models.cbet_composed import (      # noqa: E402
    cbet_solve_composed)

CFG = Config(nx=200, ny=200, nz=200, rays_per_zone=15, tile_zones=2,
             deposit_box_x=24, deposit_box_y=24, deposit_box_z=24,
             # batch=1: the batched path's 3-copy deposit streams cost
             # ~11 GB at 27M group rows (runner.estimate_hbm_bytes);
             # batching measured a wash at config-4 density anyway
             # (BASELINE.md round 3)
             deposit_batch_steps=1,
             # CBET fields on the 100^3-class coarse grid (fits the VMEM
             # grouped intensity kernel; the per-step gain lookup stays
             # full-resolution via the once-per-iteration upsample)
             cbet_grid_downsample=2)
GROUPS = 4          # 15 beams/group: full-res gain-row block 0.48 GB
CKPT = os.path.join(REPO, "out", "config4_cbet_ck.npz")


def main():
    resume = len(sys.argv) > 1 and sys.argv[1] == "resume"
    t0 = time.perf_counter()
    ctx = rt.prepare_device(CFG)
    jax.device_get(ctx.state0.uray[0])
    t_init = time.perf_counter() - t0
    print(f"init {t_init:.0f}s rays={CFG.total_rays} "
          f"live_slots={ctx.state0.n} nt={CFG.nt}", flush=True)

    t0 = time.perf_counter()
    res = cbet_solve_composed(CFG, ctx, beam_groups=GROUPS,
                              cache_dir=os.path.join(REPO, ".cbet_cache"),
                              checkpoint_path=CKPT, resume=resume,
                              verbose=True)
    t_solve = time.perf_counter() - t0
    mem = jax.devices()[0].memory_stats() or {}
    rec = {
        "scene": "BASELINE config 4 (200^3, 64.3M rays, nt=800) + CBET",
        "resumed": resume,
        "init_seconds": round(t_init, 1),
        "solve_wall_seconds_this_invocation": round(t_solve, 1),
        "iterations": res.iterations,
        "converged": bool(res.converged),
        "history": [round(h, 6) for h in res.history],
        "iter_seconds": res.stats["iter_seconds"],
        "beam_groups": res.stats["beam_groups"],
        "segments": res.stats["segments"],
        "chunks_per_iteration": res.stats["chunks_per_iteration"],
        "edep_total": res.stats["edep_total"],
        "rays_launched": res.stats.get("rays_launched"),
        "rays_terminated": res.stats.get("rays_terminated"),
        "energy_launched": res.stats.get("energy_launched"),
        "energy_absorbed": res.stats.get("energy_absorbed"),
        "hbm_peak_gib": round(mem.get("peak_bytes_in_use", 0) / 2 ** 30, 2),
        "intensity_total": float(res.intensity.sum()),
        "intensity_finite": bool(np.isfinite(res.intensity).all()),
        "edep_finite": bool(np.isfinite(res.edep).all()),
    }
    with open(os.path.join(REPO, "artifacts", "config4_cbet_r05.json"),
              "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec), flush=True)
    # the coupled grid itself, for any later regression comparison
    np.savez_compressed(os.path.join(REPO, "out", "config4_cbet_edep.npz"),
                        edep=res.edep.astype(np.float32),
                        intensity_total=res.intensity.sum())


if __name__ == "__main__":
    main()
