"""BASELINE config 4 demonstration run: 2x grid (200^3), 1.07e6 rays/beam
(rays_per_zone=15), 60 beams = 64.3M rays, nt=800 — deposition-bound stress
of the HBM-grid Pallas kernel.  Chunked dispatch (the tunneled worker kills
single executions lasting many minutes)."""
import time, jax, jax.numpy as jnp, numpy as np
from cbet_raytracing_3d_tpu import Config
from cbet_raytracing_3d_tpu.models import raytracer as rt
from cbet_raytracing_3d_tpu.models.raytracer import make_chunk_fn, trace_shapes
from cbet_raytracing_3d_tpu.parallel.sharding import pad_rays

cfg = Config(nx=200, ny=200, nz=200, rays_per_zone=15, tile_zones=2,
             deposit_box_x=24, deposit_box_y=24, deposit_box_z=24,
             deposit_batch_steps=1)
t0 = time.perf_counter()
# on-device ray init (reference parity: launch_ray_XZ.cu:65-115 runs on
# the GPU): host work is O(grid + nrays); the 64M-ray state is born on
# the chip already live-tile compacted — replaces the 9-21 min
# single-core NumPy prepare + GB-scale uploads of the first recorded run
ctx = rt.prepare_device(cfg)
rpt = ctx.layout.rays_per_tile
s0 = ctx.state0
jax.device_get(s0.uray[0])
import dataclasses
ctx = dataclasses.replace(ctx, state0=None)
t_init = time.perf_counter() - t0
print(f"init {t_init:.0f}s rays={cfg.total_rays} live_slots={s0.n} tiles={s0.n//rpt} nt={cfg.nt}", flush=True)

chunk = 25; n_chunks = cfg.nt // chunk
fn = jax.jit(make_chunk_fn(cfg, rpt, chunk, "pallas_hbm"),
             donate_argnums=(1, 2, 3))   # state/master/oflow update in place
mshape, finalize = trace_shapes(cfg, "pallas_hbm")
master = jnp.zeros(mshape, jnp.float32)
state0_for_stats = rt.RayState(
    frac=tuple(np.asarray(a) for a in s0.frac),
    vel=tuple(np.asarray(a) for a in s0.vel),
    kick=tuple(np.asarray(a) for a in s0.kick),
    uray=np.asarray(s0.uray), uray_init=np.asarray(s0.uray_init),
    cell=tuple(np.asarray(a) for a in s0.cell), alive=np.asarray(s0.alive))
state = s0; oflow = jnp.int32(0)
t0 = time.perf_counter()
for ci in range(n_chunks):
    state, master, oflow = fn(ctx.field4, state, master, oflow)
    jax.device_get(oflow)
    if ci == 0:
        stats = jax.devices()[0].memory_stats() or {}
        print("  memory_stats peak:", stats.get("peak_bytes_in_use", 0)/2**30,
              "GiB of", stats.get("bytes_limit", 0)/2**30, flush=True)
    print(f"  chunk {ci} t={time.perf_counter()-t0:.0f}s", flush=True)
t_trace = time.perf_counter() - t0
edep = np.asarray(jax.device_get(finalize(master)), np.float64)
of = int(jax.device_get(oflow))
st = rt.trace_stats(ctx, state, state0_for_stats)
print(f"trace {t_trace:.0f}s oflow={of} edep_total={edep.sum():.8e}", flush=True)
print("stats:", st, flush=True)
print("energy conservation rel err:",
      abs(edep.sum() - st["energy_absorbed"]) / edep.sum(), flush=True)
print("nominal ray-steps/s:", cfg.total_rays * cfg.nt / t_trace, flush=True)
