"""Round-3 end-of-session TPU batch: run everything that needs the chip,
in priority order, so a returning tunnel is used immediately.

1. verify drive (the SKILL.md recipe: full OMEGA trace via run_sharded),
2. bench-path smoke (prepare_device + segmented sliced CBET, 2 iterations),
3. the full bench (twice — the driver-contract JSON).

Every stage runs in its OWN subprocess, strictly sequentially: the parent
never imports jax, so at no point do two live TPU clients exist (remote
compiles serialize across processes and both jobs look hung — the
two-TPU-processes rule in CLAUDE.md).  Each stage is wall-clock-bounded
and failures don't stop later stages.  Writes progress to stdout (pipe to
a log)."""

import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.chdir(REPO)


def stage(name):
    print(f"\n=== {name} [{time.strftime('%H:%M:%S')}] ===", flush=True)


def drive():
    """Anchor + verify drive (runs in its own subprocess via --drive)."""
    from cbet_raytracing_3d_tpu.utils.compile_cache import (
        enable_persistent_cache)
    enable_persistent_cache()
    import jax
    import numpy as np

    t0 = time.perf_counter()
    jax.device_get(jax.numpy.zeros(8))
    print(f"anchor ok {time.perf_counter() - t0:.1f}s", flush=True)

    from cbet_raytracing_3d_tpu import Config
    from cbet_raytracing_3d_tpu.models import raytracer as rt
    from cbet_raytracing_3d_tpu.parallel import sharding as sh
    cfg = Config()
    t0 = time.perf_counter()
    ctx = rt.prepare_device(cfg)
    edep, state = sh.run_sharded(ctx)
    edep = np.asarray(jax.device_get(edep))
    # state0 for accounting must share the traced (padded) layout
    st = rt.trace_stats(ctx, state, sh.pad_rays(
        ctx.state0,
        ctx.layout.rays_per_tile * cfg.tiles_per_block))
    print(f"edep sum {edep.sum():.8e} finite={np.isfinite(edep).all()} "
          f"launched={st['rays_launched']} "
          f"terminated={st['rays_terminated']} "
          f"energy_absorbed={st['energy_absorbed']:.8e} "
          f"wall {time.perf_counter() - t0:.1f}s", flush=True)
    rel = abs(edep.sum() - st["energy_absorbed"]) / edep.sum()
    print(f"edep-vs-absorbed rel diff {rel:.2e}", flush=True)
    # bf16 kernel weights conserve energy to ~2-3e-6 (BASELINE.md,
    # round 1 "Energy conservation"); 1e-5 separates that from real
    # breakage without false alarms.
    print("VERIFY DRIVE OK" if rel < 1e-5 else "VERIFY DRIVE MISMATCH",
          flush=True)
    return 0


def main():
    stage("verify drive (full OMEGA trace, run_sharded)")
    r = subprocess.run([sys.executable, os.path.abspath(__file__),
                        "--drive"], timeout=3000)
    print(f"drive rc={r.returncode}", flush=True)

    stage("bench-path CBET smoke (compact + segmented, 2 iters)")
    r = subprocess.run([sys.executable,
                        "scripts/smoke_bench_cbet_compact.py"],
                       timeout=3000)
    print(f"smoke rc={r.returncode}", flush=True)

    for i in (1, 2):
        stage(f"full bench run {i}")
        r = subprocess.run([sys.executable, "bench.py"], timeout=3000)
        print(f"bench rc={r.returncode}", flush=True)

    print("\nQUEUE DONE", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(drive() if "--drive" in sys.argv[1:] else main())
