"""Drive the composed (resumable) CBET solve on the real TPU at OMEGA scale:
interrupt after 2 iterations, resume to convergence, and compare the final
grid against the monolithic solver's committed CBET golden.  Evidence for
VERDICT r05: the composed machinery works on real hardware, not just the
CPU interpret tests."""
import json
import time

from cbet_raytracing_3d_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()

import numpy as np

from cbet_raytracing_3d_tpu.config import Config
from cbet_raytracing_3d_tpu.models import raytracer as rt
from cbet_raytracing_3d_tpu.models.cbet_composed import cbet_solve_composed

cfg = Config(cbet_segmented=True)
t0 = time.perf_counter()
ctx = rt.prepare_device(cfg)
t_init = time.perf_counter() - t0

ckpt = "out/omega_cbet_composed_ck.npz"
t0 = time.perf_counter()
out = cbet_solve_composed(cfg, ctx, cache_dir=".cbet_cache",
                          checkpoint_path=ckpt, stop_after_iterations=2)
t_part = time.perf_counter() - t0
assert out is None
t0 = time.perf_counter()
res = cbet_solve_composed(cfg, ctx, cache_dir=".cbet_cache",
                          checkpoint_path=ckpt, resume=True)
t_rest = time.perf_counter() - t0

rec = {
    "scene": "OMEGA 60 beams full rays",
    "init_seconds": round(t_init, 1),
    "first_2_iterations_seconds": round(t_part, 1),
    "resumed_to_convergence_seconds": round(t_rest, 1),
    "iterations": res.iterations,
    "converged": bool(res.converged),
    "history": [round(h, 6) for h in res.history],
    "iter_seconds_resumed": res.stats["iter_seconds"],
    "beam_groups": res.stats["beam_groups"],
    "chunks_per_iteration": res.stats["chunks_per_iteration"],
    "edep_total": float(res.edep.sum()),
    "rays_launched": res.stats.get("rays_launched"),
    "rays_terminated": res.stats.get("rays_terminated"),
}
gold = np.load("artifacts/cbet_golden.npz")["edep"].astype(np.float64)
if gold.shape == res.edep.shape:
    rec["vs_monolithic_cbet_golden_rel_l2"] = float(
        np.linalg.norm(res.edep - gold) / np.linalg.norm(gold))
with open("artifacts/omega_cbet_composed_r05.json", "w") as f:
    json.dump(rec, f, indent=1)
print(json.dumps(rec))
