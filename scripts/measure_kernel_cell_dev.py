"""Measure the model deviation of cbet_gain_mode="kernel_cell" (the
window-gain contraction with the lookup mode's exact single-node
entry-cell sampling) at production resolution: 2 beams on the full 100^3
grid, float64, scatter backend (the oracle-semantics path).

Verified property (tests/test_cbet.py::test_cbet_gain_kernel_cell_*):
at stop_fraction=0 kernel_cell is BIT-EXACT vs the per-step lookup
(rel ~2e-16) — its ONLY deviation is in-window termination checks seeing
the un-gained energy.  This run quantifies that residual at the
production stop rule, next to the trilinear "kernel" mode's measured
2.55e-3 (14.2% of the 1.80e-2 effect, BASELINE.md).

Run:  python scripts/measure_kernel_cell_dev.py   (forces CPU, ~hours)
"""

import json
import os
import sys
import time

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
    res = {}
    for mode in ("lookup", "kernel_cell"):
        t0 = time.perf_counter()
        r = cbet.cbet_solve(cfg.replace(cbet_gain_mode=mode), ctx,
                            backend="scatter")
        res[mode] = r
        out[f"{mode}_iters"] = r.iterations
        out[f"{mode}_seconds"] = round(time.perf_counter() - t0, 1)
        out[f"{mode}_edep_total"] = float(r.edep.sum())
        print(mode, out[f"{mode}_iters"], "iters",
              out[f"{mode}_seconds"], "s", flush=True)
    base, _ = rt.trace(ctx, backend="scatter")
    base = np.asarray(base, np.float64)
    eff = np.linalg.norm(res["lookup"].edep - base)
    dev = np.linalg.norm(res["kernel_cell"].edep - res["lookup"].edep)
    out["effect_rel_l2"] = float(eff / np.linalg.norm(base))
    out["kernel_cell_vs_lookup_rel_l2"] = float(
        dev / np.linalg.norm(res["lookup"].edep))
    out["kernel_cell_dev_over_effect"] = float(dev / eff)
    out["intensity_rel_l2"] = float(
        np.linalg.norm(res["kernel_cell"].intensity - res["lookup"].intensity)
        / np.linalg.norm(res["lookup"].intensity))
    path = os.path.join(REPO, "artifacts", "cbet_kernel_cell_dev_r03.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
