"""Warm-start feasibility measurement (round 3): can a quarter-ray
(rays_per_zone=2) CBET pre-solve replace most of the full-ray exact
solve's iterations?

The fixed-point state is the (B, P) per-beam intensity field; fields
from a rays_per_zone=2 trace have the same scale (uray_mult carries
1/rays_per_zone^2 while the ray count carries rays_per_zone^2 —
def.cuh:92's normalization) so the quarter-ray fixed point is directly
usable as the full-ray solve's initial iterate.  Pure measurement — no
framework changes; part C replicates ``cbet._cbet_solve_once``'s
iteration body through the cached solver internals, skipping the
zero-gain bootstrap trace.

Parts (all on the TPU, production config = bench.py's cfg_exact):
  A. baseline: exact full-ray solve from zero gain (wall, iters)
  B. quarter-ray solve from zero gain (wall, iters, per-iter anatomy)
  C. full-ray iterations warm-started from B's converged intensity:
     iterations to tol, wall, and fixed-point agreement vs A

Verdict arithmetic: warm path = B.wall + C.wall vs A.wall, with B's
one-time compiles excluded the same way A's are (each part runs after
a 1-iteration warm solve).

Writes artifacts/cbet_warmstart_r03.json.
"""

import dataclasses as dc
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from cbet_raytracing_3d_tpu import Config  # noqa: E402
from cbet_raytracing_3d_tpu.utils.compile_cache import (  # noqa: E402
    enable_persistent_cache)

enable_persistent_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from cbet_raytracing_3d_tpu.models import cbet, raytracer as rt  # noqa: E402

CACHE = ".cbet_cache"
OUT = {}


def timed_solve(tag, cfg, ctx, verbose=False):
    t0 = time.perf_counter()
    cbet.cbet_solve(dc.replace(cfg, cbet_max_iters=1), ctx, cache_dir=CACHE)
    warm = time.perf_counter() - t0
    t0 = time.perf_counter()
    res = cbet.cbet_solve(cfg, ctx, verbose=verbose, cache_dir=CACHE)
    wall = time.perf_counter() - t0
    fetch = res.stats.get("result_fetch_seconds", 0.0)
    print(f"[{tag}] iters={res.iterations} conv={res.converged} "
          f"wall={wall:.1f}s (fetch {fetch:.1f}s) warm={warm:.1f}s "
          f"edep={res.edep.sum():.8e}", flush=True)
    OUT[tag] = {"warm_seconds": round(warm, 1),
                "wall_seconds": round(wall - fetch, 1),
                "fetch_seconds": round(fetch, 1),
                "iterations": res.iterations,
                "converged": bool(res.converged),
                "edep_total": float(res.edep.sum())}
    return res


def main():
    cfg_full = Config().replace(cbet_segmented=True, cbet_plan_headroom=0.5)
    cfg_q = cfg_full.replace(rays_per_zone=2)

    t0 = time.perf_counter()
    ctx_full = rt.prepare_device(cfg_full)
    jax.device_get(ctx_full.state0.uray[0])
    print(f"prepare_device full {time.perf_counter() - t0:.1f}s "
          f"slots={ctx_full.state0.n}", flush=True)
    t0 = time.perf_counter()
    ctx_q = rt.prepare_device(cfg_q)
    jax.device_get(ctx_q.state0.uray[0])
    print(f"prepare_device quarter {time.perf_counter() - t0:.1f}s "
          f"slots={ctx_q.state0.n}", flush=True)

    # A: the production baseline (anchor: healthy window reads ~33-36 s)
    res_a = timed_solve("A_full_from_zero", cfg_full, ctx_full)
    # B: quarter-ray pre-solve
    res_b = timed_solve("B_quarter_from_zero", cfg_q, ctx_q, verbose=True)

    # C: full-ray iterations warm-started from B's converged intensity.
    # Replicates _cbet_solve_once's loop body (gain -> trace -> update)
    # minus the zero-gain bootstrap trace; the solver is warm from A.
    solver = cbet._get_solver(cfg_full, ctx_full, None, None, CACHE)
    gain_dtype = jnp.dtype(cfg_full.dtype)
    intensity = jnp.asarray(
        res_b.intensity.reshape(cfg_full.nbeams, -1), jnp.float32)
    t0 = time.perf_counter()
    history = []
    converged = False
    edep = None
    it = 0
    for it in range(1, cfg_full.cbet_max_iters + 1):
        gain = solver.upsample(
            solver.gain_fn(intensity.astype(jnp.float32))).astype(gain_dtype)
        edep, i_new, _state = solver.trace(
            ctx_full.field4, gain, solver.bid, solver.state0)
        d_dev, s_dev, blended = solver.step_update(
            i_new, intensity, float(cfg_full.cbet_relax))
        delta = float(d_dev) / max(float(s_dev), 1e-300)
        history.append(delta)
        print(f"warm iter {it}: rel delta {delta:.3e}", flush=True)
        if delta < cfg_full.cbet_tol:
            converged = True
            break
        intensity = blended
    wall_c = time.perf_counter() - t0
    t0 = time.perf_counter()
    edep_c = np.asarray(jax.device_get(edep), np.float64)
    fetch_c = time.perf_counter() - t0
    rel = float(np.linalg.norm(edep_c - res_a.edep)
                / np.linalg.norm(res_a.edep))
    print(f"[C_full_warmstarted] iters={it} conv={converged} "
          f"wall={wall_c:.1f}s (fetch {fetch_c:.1f}s) "
          f"edep={edep_c.sum():.8e} vs A rel-L2 {rel:.3e}", flush=True)
    OUT["C_full_warmstarted"] = {
        "wall_seconds": round(wall_c, 1), "fetch_seconds": round(fetch_c, 1),
        "iterations": it, "converged": bool(converged),
        "history": [round(h, 6) for h in history],
        "edep_total": float(edep_c.sum()), "edep_vs_A_rel_l2": rel}
    OUT["warm_path_vs_baseline"] = {
        "baseline_seconds": OUT["A_full_from_zero"]["wall_seconds"],
        "warm_path_seconds": round(
            OUT["B_quarter_from_zero"]["wall_seconds"] + wall_c, 1)}

    path = os.path.join(REPO, "artifacts", "cbet_warmstart_r03.json")
    with open(path, "w") as f:
        json.dump(OUT, f, indent=1)
    print("wrote", path, flush=True)


if __name__ == "__main__":
    main()
