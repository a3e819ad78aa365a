"""Round-5: Anderson(m=1) CBET fixed-point acceleration, measured on chip.

DESIGN_NOTES records the scalar-rho extrapolation as measured-dead (16 vs
9 iterations on the toy); the field-level least-squares secant
(Config.cbet_accel="anderson") behaves differently: on the two-beam CPU
problem it converges in 4 vs 5 iterations at tol 1e-5 to the same fixed
point (rel-L2 8.6e-8).  This probe measures the production 60-beam OMEGA
solve (kernel_cell, segmented, relax 0.9, tol 5e-3): iterations, wall,
per-iteration anatomy, and the converged-edep agreement vs the plain
path.  One cached solver serves both (the key normalizes cbet_accel).

Writes artifacts/cbet_accel_r05.json.
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
from cbet_raytracing_3d_tpu.utils import compile_cache  # noqa: E402

CACHE = os.path.join(REPO, ".cbet_cache")
ART = os.path.join(REPO, "artifacts", "cbet_accel_r05.json")


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
    compile_cache.enable_persistent_cache()
    out = {}
    cfg = Config().replace(cbet_segmented=True, cbet_gain_mode="kernel_cell",
                           cbet_plan_headroom=0.5)
    ctx = rt.prepare(cfg, host_state=True, cache_dir=CACHE)
    out["anchor_trace_seconds"] = round(anchor(cfg, ctx), 3)

    # warm-up solve pays the solver build + compiles + the seed trace once
    t0 = time.perf_counter()
    cbet.cbet_solve(dc.replace(cfg, cbet_max_iters=1), ctx, cache_dir=CACHE)
    out["warm_seconds"] = round(time.perf_counter() - t0, 1)
    print(f"warm {out['warm_seconds']}s", flush=True)

    base_edep = None
    for accel in ("none", "anderson", "none_again"):
        c = cfg.replace(cbet_accel=accel.replace("_again", ""))
        t0 = time.perf_counter()
        res = cbet.cbet_solve(c, ctx, verbose=True, cache_dir=CACHE)
        wall = time.perf_counter() - t0
        edep = np.asarray(res.edep, dtype=np.float64)
        rec = {"wall_seconds": round(wall, 1),
               "iterations": res.iterations,
               "converged": bool(res.converged),
               "history": [round(h, 6) for h in res.history],
               "iter_seconds": res.stats["iter_seconds"],
               "edep_total": float(edep.sum())}
        if accel == "none":
            base_edep = edep
        else:
            rec["edep_vs_plain_rel_l2"] = float(
                np.linalg.norm(edep - base_edep) / np.linalg.norm(base_edep))
        out[f"accel_{accel}"] = rec
        print(f"[accel {accel}] iters={res.iterations} wall={wall:.1f}s "
              f"conv={res.converged} total={edep.sum():.8e} "
              + (f"relL2={rec.get('edep_vs_plain_rel_l2', 0):.3e}"
                 if accel != "none" else ""), flush=True)
        with open(ART, "w") as f:
            json.dump(out, f, indent=2)
    out["anchor_after_seconds"] = round(anchor(cfg, ctx), 3)
    with open(ART, "w") as f:
        json.dump(out, f, indent=2)
    print("DONE", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
