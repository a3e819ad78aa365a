"""Round-3 high-resolution CBET demonstration (VERDICT r2 missing #2).

A 2x-grid (200^3, BASELINE config-4 resolution) CBET solve on the real
TPU: the edep path runs the HBM-grid kernel while the grouped per-beam
VMEM kernel carries the intensity fields on the coarsened
(cbet_grid_downsample=2 -> 100^3-class) CBET grid — the combination that
previously fell silently to the ~16x-slower scatter
(cbet.py make_cbet_trace_fn; reference contract: grid-size-independent
deposits, launch_ray_XZ.cu:319-348).

Reduced-ray (rays_per_zone=4, 2 beams ~152k rays, nt=800) per VERDICT's
"even reduced-ray" bar.  Records:
  * converged pallas_hbm solve: wall, iterations, overflow (must be 0),
  * accuracy bound: 2-iteration solves on pallas_hbm vs the scatter
    backend (value-reference at this scale), edep + intensity rel-L2.

Writes artifacts/cbet_highres_r03.json.
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from cbet_raytracing_3d_tpu.utils.compile_cache import enable_persistent_cache  # noqa: E402
enable_persistent_cache()   # Mosaic AOT segment compiles dominate the cold wall
import dataclasses as dc  # noqa: E402

from cbet_raytracing_3d_tpu import Config  # noqa: E402
from cbet_raytracing_3d_tpu.models import cbet, raytracer as rt  # noqa: E402

CACHE = os.path.join(REPO, ".cbet_cache")
OUT = {}

cfg = Config(nbeams=2, nx=200, ny=200, nz=200, rays_per_zone=4,
             tile_zones=2, deposit_box_x=24, deposit_box_y=24,
             deposit_box_z=24, cbet_grid_downsample=2)


def solve(tag, c, ctx, backend=None):
    t0 = time.perf_counter()
    res = cbet.cbet_solve(c, ctx, backend=backend, verbose=True,
                          cache_dir=CACHE)
    t = time.perf_counter() - t0
    print(f"[{tag}] iters={res.iterations} conv={res.converged} "
          f"wall={t:.1f}s edep={res.edep.sum():.8e}", flush=True)
    OUT[tag] = {"wall_seconds": round(t, 1), "iterations": res.iterations,
                "converged": bool(res.converged),
                "edep_total": float(res.edep.sum())}
    return res


def main():
    ctx = rt.prepare(cfg, host_state=True, cache_dir=CACHE)
    print(f"rays={cfg.total_rays} nt={cfg.nt} "
          f"grid={cfg.nx}^3 cbet_grid={cfg.cbet_grid_shape}", flush=True)
    # warm (compiles: HBM edep kernel + grouped VMEM intensity kernel)
    t0 = time.perf_counter()
    cbet.cbet_solve(cfg.replace(cbet_max_iters=1), ctx, cache_dir=CACHE)
    OUT["warm_seconds"] = round(time.perf_counter() - t0, 1)
    print(f"warm {OUT['warm_seconds']}s", flush=True)

    res = solve("hbm_converged", cfg, ctx)

    # accuracy bound: 2-iteration solves, HBM+grouped-VMEM vs scatter
    c2 = cfg.replace(cbet_max_iters=2)
    r_h = solve("hbm_2it", c2, ctx)
    r_s = solve("scatter_2it", c2, ctx, backend="scatter")
    rel_e = float(np.linalg.norm(r_h.edep - r_s.edep)
                  / np.linalg.norm(r_s.edep))
    rel_i = float(np.linalg.norm(r_h.intensity - r_s.intensity)
                  / np.linalg.norm(r_s.intensity))
    OUT["hbm_vs_scatter_edep_rel_l2"] = rel_e
    OUT["hbm_vs_scatter_intensity_rel_l2"] = rel_i
    print(f"accuracy bound (2 iters): edep rel-L2 {rel_e:.3e}, "
          f"intensity rel-L2 {rel_i:.3e}", flush=True)
    del res

    os.makedirs(os.path.join(REPO, "artifacts"), exist_ok=True)
    with open(os.path.join(REPO, "artifacts",
                           "cbet_highres_r03.json"), "w") as f:
        json.dump(OUT, f, indent=2)
    print("DONE", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
