"""Smoke-test the production bench CBET path on the TPU before the driver
runs it: prepare_device (compact on-chip init) + segmented, sliced exact
CBET solve (2 iterations).  Exercises the compact-layout plan reuse, the
per-beam-sliced gathers on the compact slot layout, and the dropped-alive
hard-error guard — the exact combination bench.py measures."""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from cbet_raytracing_3d_tpu import Config  # noqa: E402
from cbet_raytracing_3d_tpu.models import cbet, raytracer as rt  # noqa: E402

CACHE = os.path.join(REPO, ".cbet_cache")


def main():
    cfg = Config(cbet_segmented=True, cbet_max_iters=2)
    t0 = time.perf_counter()
    ctx = rt.prepare_device(cfg)
    print(f"prepare_device {time.perf_counter() - t0:.1f}s "
          f"slots={ctx.state0.n}", flush=True)
    t0 = time.perf_counter()
    res = cbet.cbet_solve(cfg, ctx, verbose=True, cache_dir=CACHE)
    print(f"solve(2it) {time.perf_counter() - t0:.1f}s "
          f"edep={res.edep.sum():.8e} "
          f"fetch={res.stats.get('result_fetch_seconds')}s", flush=True)
    print("SMOKE OK", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
