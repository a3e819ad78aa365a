"""Generate the CPU float64 reference solutions for the round-3 CBET
accuracy artifact: 2-beam production-resolution solves under both gain
models, saved for the on-chip run to compare against.

Run with the test-style CPU forcing (the axon plugin must not claim the
platform):  python scripts/make_cbet_cpu_ref.py
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
import jax._src.xla_bridge as _xb  # noqa: E402

for _n in list(_xb._backend_factories):
    if _n not in ("cpu", "tpu"):
        _xb._backend_factories.pop(_n, None)
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402

from cbet_raytracing_3d_tpu import Config  # noqa: E402
from cbet_raytracing_3d_tpu.models import cbet, raytracer as rt  # noqa: E402


def main():
    cfg = Config(nbeams=2, dtype="float64")
    ctx = rt.prepare(cfg)
    out = {}
    for mode in ("lookup", "kernel"):
        c = cfg.replace(cbet_gain_mode=mode)
        res = cbet.cbet_solve(c, ctx, backend="scatter")
        out[f"edep_{mode}"] = res.edep
        out[f"iters_{mode}"] = np.int64(res.iterations)
        print(mode, "iters", res.iterations, "edep", res.edep.sum(),
              flush=True)
    base, _ = rt.trace(ctx, backend="scatter")
    out["edep_base"] = base
    path = os.path.join(REPO, ".cbet_cache", "cbet_cpu_ref_2beam.npz")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    np.savez_compressed(path, **out)
    print("saved", path, flush=True)


if __name__ == "__main__":
    main()
