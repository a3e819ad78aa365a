"""Accuracy experiment: can field4 (the per-step gathered kick/absorb table)
be stored in 16 bits?

The TPU row-gather cost is linear in bytes per row (DESIGN_NOTES.md: bf16
rows cost 0.54x of f32), and the gather is ~45% of the trace — a 16-bit
field table would cut ~20% of the whole trace IF the accuracy bar (rel-L2
< 1e-4 on edep, BASELINE.md) survives the per-step kick quantization
(bf16: ~4e-3 relative; f16: ~5e-4 relative) accumulated over <=400 steps.

CPU, f32 compute, scatter backend; reduced scene (8 beams, 1 ray/zone,
full 100^3 grid, nt=400).  Compares edep for f32/f16/bf16 field tables.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ["PYTHONPATH"] = REPO    # drop the axon plugin for CPU runs

import jax                                                    # noqa: E402
import jax.numpy as jnp                                       # noqa: E402
import numpy as np                                            # noqa: E402

from cbet_raytracing_3d_tpu import Config                     # noqa: E402
from cbet_raytracing_3d_tpu.models import raytracer as rt    # noqa: E402
from cbet_raytracing_3d_tpu.parallel import sharding as sh   # noqa: E402


def main():
    cfg = Config(nbeams=8, rays_per_zone=1, deposit_backend="scatter")
    ctx = rt.prepare(cfg)
    state0 = sh.pad_rays(rt.select_rays(ctx.state0, ctx.live_slots),
                         ctx.layout.rays_per_tile * cfg.tiles_per_block)
    fn = jax.jit(rt.make_trace_fn(cfg, ctx.layout.rays_per_tile, "scatter"))
    f4 = np.asarray(ctx.field4, np.float32)

    results = {}
    for name, table in [
        ("f32", f4),
        ("f16", f4.astype(np.float16).astype(np.float32)),
        ("bf16", np.asarray(jnp.asarray(f4, jnp.bfloat16), np.float32)),
    ]:
        edep, state, oflow = fn(jnp.asarray(table), state0)
        edep = np.asarray(jax.device_get(edep), np.float64)
        results[name] = edep
        print(f"{name}: edep total {edep.sum():.6e}", flush=True)

    ref = results["f32"]
    for name in ("f16", "bf16"):
        d = results[name] - ref
        print(f"{name} vs f32: rel-L2 {np.linalg.norm(d)/np.linalg.norm(ref):.3e}"
              f"  rel-Linf {np.abs(d).max()/np.abs(ref).max():.3e}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
