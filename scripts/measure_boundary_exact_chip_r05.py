"""On-chip cost of the exact-boundary deposit weights (round-5 review).

Times the production segmented OMEGA trace with
``deposit_boundary_exact`` False (the default hat build — this is the
bench anchor) and True (exact two-one-hot blend, ~2x M-build VPU passes
on paper — but Mosaic pass counts are measured-unpredictable:
small_hats had FEWER ops and ran 3x slower, field_kernel_probe_r04).

Writes artifacts/boundary_kernel_chip_r05.json.  Decision rule: if the
exact build costs <2% of trace wall, flip the default and re-record the
goldens; otherwise it stays opt-in with the deviation documented
(~1.6e-5 rel-L2 boundary-heavy, ~7e-7 of OMEGA energy —
artifacts/boundary_deposit_r05.json).
"""

import dataclasses
import json
import sys
import time

import jax
import numpy as np

sys.path.insert(0, "/root/repo")

from cbet_raytracing_3d_tpu.config import Config  # noqa: E402
from cbet_raytracing_3d_tpu.models import raytracer as rt  # noqa: E402
from cbet_raytracing_3d_tpu.models import tileplan as tp  # noqa: E402
from cbet_raytracing_3d_tpu.parallel import sharding as sh  # noqa: E402
from cbet_raytracing_3d_tpu.utils.compile_cache import (  # noqa: E402
    enable_persistent_cache)

enable_persistent_cache()
out = {}


def run(tag, cfg):
    ctx = rt.prepare_device(cfg)
    state0 = ctx.state0
    plan = tp.get_or_measure_plan(cfg, ctx, state0, ".cbet_cache")
    segments = tp.build_segments(plan, cfg, cfg.nt)
    fn = jax.jit(rt.make_segmented_trace_fn(
        cfg, ctx.layout.rays_per_tile, segments))
    t0 = time.perf_counter()
    edep, state, oflow = fn(ctx.field4, state0)
    oflow_v = int(jax.device_get(oflow))
    t_first = time.perf_counter() - t0
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        edep, state, oflow = fn(ctx.field4, state0)
        jax.device_get(oflow)
        times.append(time.perf_counter() - t0)
    edep_h = np.asarray(jax.device_get(edep), np.float64)
    rec = {"first_seconds": round(t_first, 3),
           "trace_seconds_min5": round(min(times), 3),
           "times": [round(t, 3) for t in times],
           "oflow": oflow_v,
           "edep_total": float(edep_h.sum())}
    out[tag] = rec
    print(tag, json.dumps(rec), flush=True)
    return edep_h


cfg = Config()
e_hat = run("hat_default", cfg)                       # anchor (warm cache)
cfg_x = dataclasses.replace(cfg, deposit_boundary_exact=True)
e_exact = run("exact_boundary", cfg_x)
out["edep_rel_l2_exact_vs_hat"] = float(
    np.linalg.norm(e_exact - e_hat) / np.linalg.norm(e_hat))
out["edep_total_rel_err"] = float(
    abs(e_exact.sum() - e_hat.sum()) / e_hat.sum())
print("rel_l2 exact vs hat:", out["edep_rel_l2_exact_vs_hat"], flush=True)

with open("artifacts/boundary_kernel_chip_r05.json", "w") as f:
    json.dump(out, f, indent=1)
print("written artifacts/boundary_kernel_chip_r05.json")
