"""Round-3: 60-beam CBET under-relaxation sweep on chip.

The CPU toy experiment (DESIGN_NOTES "CBET fixed-point relaxation") showed
the CBET fixed-point map is strongly contractive: the default relax=0.5
under-relaxation — not the map itself — sets the iteration count, and
raising relax cut toy iterations 5 -> 3 with the same converged answer
(the fixed point is relax-independent).  This sweep measures the
production 60-beam solve at several relax values: iterations to
convergence, wall, and converged-edep agreement vs the relax=0.5 answer.

One cached solver (cbet._get_solver normalizes cbet_relax out of the key)
serves every setting, so per-relax cost is just the iterations.

Writes artifacts/cbet_relax_r03.json.
"""

import dataclasses as dc
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402

from cbet_raytracing_3d_tpu import Config  # noqa: E402
from cbet_raytracing_3d_tpu.models import cbet, raytracer as rt  # noqa: E402
from cbet_raytracing_3d_tpu.models import tileplan as tp  # noqa: E402
from cbet_raytracing_3d_tpu.parallel import sharding as sh  # noqa: E402

CACHE = os.path.join(REPO, ".cbet_cache")
ART = os.path.join(REPO, "artifacts", "cbet_relax_r03.json")

RELAXES = [0.5, 0.7, 0.8, 0.9, 1.0]


def anchor(cfg, ctx):
    state0 = sh.put_state(sh.pad_rays(
        rt.select_rays(ctx.state0, ctx.live_slots),
        ctx.layout.rays_per_tile * cfg.tiles_per_block))
    plan = tp.get_or_measure_plan(cfg, ctx, state0, CACHE)
    segments = tp.build_segments(plan, cfg, cfg.nt)
    fn = jax.jit(rt.make_segmented_trace_fn(
        cfg, ctx.layout.rays_per_tile, segments))
    out = fn(ctx.field4, state0)
    jax.device_get(out[2])
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(ctx.field4, state0)
        jax.device_get(out[2])
        ts.append(time.perf_counter() - t0)
    t = min(ts)
    print(f"ANCHOR segmented trace {t:.3f}s (expect ~2.2; degraded-tunnel "
          f"readings are ~2x)", flush=True)
    return t


def main():
    out = {}
    cfg = Config().replace(cbet_segmented=True)
    ctx = rt.prepare(cfg, host_state=True, cache_dir=CACHE)
    out["anchor_trace_seconds"] = round(anchor(cfg, ctx), 3)

    # warm-up solve pays the solver build + compiles once for every relax
    t0 = time.perf_counter()
    cbet.cbet_solve(dc.replace(cfg, cbet_max_iters=1), ctx, cache_dir=CACHE)
    out["warm_seconds"] = round(time.perf_counter() - t0, 1)
    print(f"warm {out['warm_seconds']}s", flush=True)

    base_edep = None
    for relax in RELAXES:
        c = cfg.replace(cbet_relax=relax)
        t0 = time.perf_counter()
        res = cbet.cbet_solve(c, ctx, verbose=True, cache_dir=CACHE)
        wall = time.perf_counter() - t0
        edep = np.asarray(res.edep, dtype=np.float64)
        rec = {"wall_seconds": round(wall, 1),
               "iterations": res.iterations,
               "converged": bool(res.converged),
               "edep_total": float(edep.sum())}
        if relax == 0.5:
            base_edep = edep
        elif base_edep is not None:
            rel = float(np.linalg.norm(edep - base_edep)
                        / np.linalg.norm(base_edep))
            rec["edep_vs_relax0.5_rel_l2"] = rel
        out[f"relax_{relax}"] = rec
        print(f"[relax {relax}] iters={res.iterations} wall={wall:.1f}s "
              f"conv={res.converged} total={edep.sum():.8e} "
              + (f"relL2={rec.get('edep_vs_relax0.5_rel_l2', 0):.3e}"
                 if relax != 0.5 else ""), flush=True)
        with open(ART, "w") as f:
            json.dump(out, f, indent=2)
    print("DONE", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
