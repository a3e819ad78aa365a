"""Round-4 probe (VERDICT r3 Weak #2): what does a FRESH process with a
warm persistent compile cache actually recompile before a CBET solve?

Round 3 measured cbet_warmup_seconds at 37.3 vs 76.6 s across two fresh
processes with the same warm disk cache — a 2x spread nobody could
attribute (tunnel variance vs un-cached recompiles).  This probe runs the
bench CBET config's warmup in one fresh process with jax_log_compiles on,
records every compile event (name + wall), and phases the warmup:

  prepare_device / plan load / solver build+1-iter solve (the warmup) /
  a second 1-iter solve (cached solver — the pure per-iteration cost).

Run it twice (two fresh processes) to see the spread with attribution.
Appends a record to artifacts/cbet_warmup_probe_r04.json (list).
"""

import json
import logging
import os
import re
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from cbet_raytracing_3d_tpu.utils.compile_cache import (  # noqa: E402
    enable_persistent_cache)

enable_persistent_cache()

import jax  # noqa: E402

jax.config.update("jax_log_compiles", True)

from cbet_raytracing_3d_tpu import Config                     # noqa: E402
from cbet_raytracing_3d_tpu.models import raytracer as rt     # noqa: E402
from cbet_raytracing_3d_tpu.models.cbet import cbet_solve     # noqa: E402

CACHE = os.path.join(REPO, ".cbet_cache")
ART = os.path.join(REPO, "artifacts", "cbet_warmup_probe_r04.json")

compiles: list[dict] = []


class _CompileCapture(logging.Handler):
    """Capture 'Finished XLA compilation of <name> in <t> sec' events."""

    RE = re.compile(r"Finished XLA compilation of (\S+) in ([0-9.]+) sec")

    def emit(self, record):
        m = self.RE.search(record.getMessage())
        if m:
            compiles.append({"name": m.group(1)[:80],
                             "seconds": round(float(m.group(2)), 2)})


logging.getLogger("jax._src.interpreters.pxla").addHandler(_CompileCapture())
logging.getLogger("jax._src.dispatch").addHandler(_CompileCapture())


def main() -> int:
    rec = {"argv_tag": sys.argv[1] if len(sys.argv) > 1 else "",
           "cache_dir_present": os.path.isdir(
               os.environ.get("CBET_TPU_COMPILE_CACHE_DIR",
                              os.path.expanduser("~/.cache/cbet_tpu_xla")))}
    cfg = Config(cbet_segmented=True, cbet_plan_headroom=0.5,
                 cbet_gain_mode="kernel_cell")

    t0 = time.perf_counter()
    jax.device_get(jax.numpy.zeros(8))
    rec["backend_init_seconds"] = round(time.perf_counter() - t0, 1)

    t0 = time.perf_counter()
    ctx = rt.prepare_device(cfg)
    jax.device_get(ctx.state0.uray[0])
    rec["init_seconds"] = round(time.perf_counter() - t0, 1)
    n0 = len(compiles)

    t0 = time.perf_counter()
    cbet_solve(cfg.replace(cbet_max_iters=1), ctx, cache_dir=CACHE)
    rec["warmup_seconds"] = round(time.perf_counter() - t0, 1)
    rec["warmup_compiles"] = compiles[n0:]
    n1 = len(compiles)

    t0 = time.perf_counter()
    cbet_solve(cfg.replace(cbet_max_iters=1), ctx, cache_dir=CACHE)
    rec["warm_1iter_seconds"] = round(time.perf_counter() - t0, 1)
    rec["warm_compiles"] = compiles[n1:]
    rec["init_compiles_seconds"] = round(
        sum(c["seconds"] for c in compiles[:n0]), 1)
    rec["warmup_compiles_seconds"] = round(
        sum(c["seconds"] for c in rec["warmup_compiles"]), 1)

    hist = []
    if os.path.exists(ART):
        with open(ART) as f:
            hist = json.load(f)
    hist.append(rec)
    with open(ART, "w") as f:
        json.dump(hist, f, indent=2)
    print(json.dumps(rec))
    return 0


if __name__ == "__main__":
    sys.exit(main())
