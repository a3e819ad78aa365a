"""Round-3 CBET measurement job (run on the TPU):

1. 2-beam production-resolution solves, lookup vs kernel gain mode —
   on-chip wall clocks + accuracy vs the CPU float64 references
   (scripts/make_cbet_cpu_ref.py) — the bf16 window-gain kernel's
   hardware deviation.
2. Full 60-beam solves: exact lookup (stride=1), then the window-kernel
   mode — the round-3 headline wall clocks.

Writes artifacts/cbet_r03.json.  Each solve is warmed with a 1-iteration
run first (Mosaic compiles through the tunnel cost minutes and would be
attributed to the solve otherwise).
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import dataclasses as dc  # noqa: E402

from cbet_raytracing_3d_tpu import Config  # noqa: E402
from cbet_raytracing_3d_tpu.models import cbet, raytracer as rt  # noqa: E402

OUT = {}


def solve(tag, cfg, ctx):
    t0 = time.perf_counter()
    cbet.cbet_solve(dc.replace(cfg, cbet_max_iters=1), ctx,
                    cache_dir=".cbet_cache")
    warm = time.perf_counter() - t0
    t0 = time.perf_counter()
    res = cbet.cbet_solve(cfg, ctx, verbose=True, cache_dir=".cbet_cache")
    t = time.perf_counter() - t0
    print(f"[{tag}] iters={res.iterations} conv={res.converged} "
          f"wall={t:.1f}s warm={warm:.1f}s edep={res.edep.sum():.8e}",
          flush=True)
    OUT[tag] = {"wall_seconds": round(t, 1), "warm_seconds": round(warm, 1),
                "iterations": res.iterations,
                "converged": bool(res.converged),
                "edep_total": float(res.edep.sum())}
    return res


def main():
    # --- 2-beam: wall clocks + accuracy vs CPU float64 references ---
    cfg2 = Config(nbeams=2)
    ctx2 = rt.prepare(cfg2, host_state=True, cache_dir=".cbet_cache")
    r2l = solve("2beam_lookup", cfg2, ctx2)
    r2k = solve("2beam_kernel", cfg2.replace(cbet_gain_mode="kernel"), ctx2)

    ref_path = os.path.join(REPO, ".cbet_cache", "cbet_cpu_ref_2beam.npz")
    if os.path.exists(ref_path):
        with np.load(ref_path) as z:
            for tag, res, key in (("lookup", r2l, "edep_lookup"),
                                  ("kernel", r2k, "edep_kernel")):
                ref = z[key]
                rel = float(np.linalg.norm(res.edep - ref)
                            / np.linalg.norm(ref))
                OUT[f"2beam_{tag}_vs_cpu_f64_rel_l2"] = rel
                print(f"2beam {tag} on-chip vs CPU f64: rel-L2 {rel:.3e}",
                      flush=True)
            base = z["edep_base"]
            effect = float(np.linalg.norm(z["edep_lookup"] - base)
                           / np.linalg.norm(base))
            dev = float(np.linalg.norm(z["edep_kernel"] - z["edep_lookup"])
                        / np.linalg.norm(z["edep_lookup"]))
            OUT["2beam_cbet_effect_rel_l2"] = effect
            OUT["2beam_kernel_vs_lookup_rel_l2"] = dev
            print(f"model deviation (CPU f64): {dev:.3e} of effect "
                  f"{effect:.3e} = {dev / effect:.3f}", flush=True)

    # --- 60-beam headline wall clocks ---
    cfg = Config()
    ctx = rt.prepare(cfg, host_state=True, cache_dir=".cbet_cache")
    r60 = solve("60beam_lookup_exact", cfg, ctx)
    # the round-3 exact-model fast path: compaction + sliced gathers
    # (both value-identical to the plain exact solve — tested)
    r60f = solve("60beam_lookup_exact_fast",
                 cfg.replace(cbet_segmented=True, cbet_gain_sliced=True),
                 ctx)
    rel_id = float(np.linalg.norm(r60f.edep - r60.edep)
                   / np.linalg.norm(r60.edep))
    OUT["60beam_exact_fast_vs_plain_rel_l2"] = rel_id
    print(f"60-beam exact fast-vs-plain rel-L2 {rel_id:.3e} "
          "(must be ~0)", flush=True)
    # the window-kernel model, plain and compacted
    r60k = solve("60beam_kernel",
                 cfg.replace(cbet_gain_mode="kernel", cbet_segmented=True),
                 ctx)
    rel60 = float(np.linalg.norm(r60k.edep - r60.edep)
                  / np.linalg.norm(r60.edep))
    OUT["60beam_kernel_vs_lookup_rel_l2"] = rel60
    print(f"60-beam: kernel-vs-lookup rel-L2 {rel60:.3e}", flush=True)

    os.makedirs(os.path.join(REPO, "artifacts"), exist_ok=True)
    with open(os.path.join(REPO, "artifacts", "cbet_r03.json"), "w") as f:
        json.dump(OUT, f, indent=2)
    print("DONE", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
