"""Probe: does JAX's persistent compilation cache work through the axon
tunnel?  If executables round-trip the client-side disk cache, every
cross-process recompile cost disappears — notably the ~610 s of per-segment
Mosaic AOT recompiles in a cold config-4 run (DESIGN_NOTES "Config-4
composition") and bench.py's cbet_warmup/compile_seconds.

Run TWICE in fresh processes; the second run's compile times tell the story:

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_compile_cache.py

Measures (a) a Mosaic/Pallas deposit-kernel program, (b) a plain-XLA
segmented-trace-like scan program — both representative of the real
compile costs.
"""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import jax.numpy as jnp  # noqa: E402


def main() -> int:
    jax.device_get(jnp.zeros(8))  # tunnel up

    from cbet_raytracing_3d_tpu import Config
    from cbet_raytracing_3d_tpu.models import raytracer as rt
    from cbet_raytracing_3d_tpu.parallel import sharding as sh

    cfg = Config(nbeams=2)
    t0 = time.perf_counter()
    ctx = rt.prepare_device(cfg)
    state0 = sh.pad_rays(ctx.state0,
                         ctx.layout.rays_per_tile * cfg.tiles_per_block)
    jax.device_get(state0.uray[0])
    t_init = time.perf_counter() - t0
    print(f"init(+compile): {t_init:.1f} s", flush=True)

    # (a) Pallas/Mosaic path: the production deposit kernel
    fn = jax.jit(rt.make_trace_fn(cfg, ctx.layout.rays_per_tile,
                                  backend="pallas"))
    t0 = time.perf_counter()
    edep, state, oflow = fn(ctx.field4, state0)
    jax.device_get(oflow)
    t_mosaic = time.perf_counter() - t0
    t0 = time.perf_counter()
    edep, state, oflow = fn(ctx.field4, state0)
    jax.device_get(oflow)
    t_steady = time.perf_counter() - t0
    print(f"pallas trace first-call: {t_mosaic:.1f} s "
          f"(steady {t_steady:.2f} s -> compile ~{t_mosaic - t_steady:.1f} s)",
          flush=True)

    # (b) plain-XLA path: scatter-backend trace (no Mosaic)
    fn2 = jax.jit(rt.make_trace_fn(cfg, ctx.layout.rays_per_tile,
                                   backend="scatter"))
    t0 = time.perf_counter()
    e2, s2, o2 = fn2(ctx.field4, state0)
    jax.device_get(o2)
    t_xla = time.perf_counter() - t0
    t0 = time.perf_counter()
    e2, s2, o2 = fn2(ctx.field4, state0)
    jax.device_get(o2)
    t_xla_steady = time.perf_counter() - t0
    print(f"xla trace first-call: {t_xla:.1f} s "
          f"(steady {t_xla_steady:.2f} s -> compile ~"
          f"{t_xla - t_xla_steady:.1f} s)", flush=True)

    cache = os.path.join(REPO, ".jax_cache")
    n = sum(len(fs) for _, _, fs in os.walk(cache)) if os.path.isdir(cache) else 0
    print(f"cache entries on disk: {n}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
