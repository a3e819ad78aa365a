"""One-shot CBET measurement job (run on the TPU, e.g. under tmux):

1. two-beam production-resolution solve, s=1 vs s=2: accuracy of the
   coarse CBET grid at real grid resolution,
2. full 60-beam solve at s=2: the new wall-clock,
3. full 60-beam solve at s=1: the exact-grid wall-clock + the honest
   coarse-vs-exact delta on the production scene.

Writes artifacts/cbet_r02.json.
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from cbet_raytracing_3d_tpu import Config                      # noqa: E402
from cbet_raytracing_3d_tpu.models import cbet, raytracer as rt  # noqa: E402

OUT = {}


def solve(tag, cfg):
    t0 = time.perf_counter()
    ctx = rt.prepare(cfg, host_state=True, cache_dir=".cbet_cache")
    t_prep = time.perf_counter() - t0
    t0 = time.perf_counter()
    res = cbet.cbet_solve(cfg, ctx, verbose=True)
    t = time.perf_counter() - t0
    print(f"[{tag}] iters={res.iterations} conv={res.converged} "
          f"wall={t:.1f}s prep={t_prep:.1f}s edep={res.edep.sum():.8e}",
          flush=True)
    OUT[tag] = {"wall_seconds": round(t, 1), "iterations": res.iterations,
                "converged": bool(res.converged),
                "edep_total": float(res.edep.sum()),
                "history": [float(h) for h in res.history]}
    return res


def main():
    # 1. two-beam production resolution
    r1 = solve("2beam_s1", Config(nbeams=2))
    r2 = solve("2beam_s2", Config(nbeams=2, cbet_grid_downsample=2))
    rel = float(np.linalg.norm(r2.edep - r1.edep)
                / np.linalg.norm(r1.edep))
    from cbet_raytracing_3d_tpu.parallel import sharding as sh
    ctx0 = rt.prepare(Config(nbeams=2), host_state=True,
                      cache_dir=".cbet_cache")
    edep0, _ = sh.run_sharded(ctx0)
    effect = float(np.linalg.norm(r1.edep - edep0) / np.linalg.norm(edep0))
    OUT["2beam_coarse_vs_exact_rel_l2"] = rel
    OUT["2beam_cbet_effect_rel_l2"] = effect
    print(f"2-beam 100^3: coarse-vs-exact {rel:.3e}, effect {effect:.3e}, "
          f"ratio {rel / effect:.3f}", flush=True)

    # 2+3. full 60-beam
    r60c = solve("60beam_s2", Config(cbet_grid_downsample=2))
    r60 = solve("60beam_s1", Config())
    rel60 = float(np.linalg.norm(r60c.edep - r60.edep)
                  / np.linalg.norm(r60.edep))
    OUT["60beam_coarse_vs_exact_rel_l2"] = rel60
    print(f"60-beam: coarse-vs-exact rel-L2 {rel60:.3e}", flush=True)

    os.makedirs(os.path.join(REPO, "artifacts"), exist_ok=True)
    with open(os.path.join(REPO, "artifacts", "cbet_r02.json"), "w") as f:
        json.dump(OUT, f, indent=2)
    print("DONE", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
