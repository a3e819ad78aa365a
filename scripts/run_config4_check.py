"""Config-4 accuracy cross-check: 2x grid, reduced rays, hbm vs scatter."""
import time, jax, jax.numpy as jnp, numpy as np
from cbet_raytracing_3d_tpu import Config
from cbet_raytracing_3d_tpu.models import raytracer as rt
from cbet_raytracing_3d_tpu.models.raytracer import make_chunk_fn, trace_shapes
from cbet_raytracing_3d_tpu.parallel.sharding import pad_rays

cfg = Config(nx=200, ny=200, nz=200, rays_per_zone=4, tile_zones=2,
             deposit_box_x=24, deposit_box_y=24, deposit_box_z=24,
             deposit_batch_steps=1)
ctx = rt.prepare(cfg)
rpt = ctx.layout.rays_per_tile
s0 = pad_rays(rt.select_rays(ctx.state0, ctx.live_slots), rpt*cfg.tiles_per_block)
print("rays:", cfg.total_rays, "tiles:", s0.n//rpt, "nt:", cfg.nt, flush=True)

def chunked_trace(backend):
    chunk = 25; n_chunks = cfg.nt // chunk
    fn = jax.jit(make_chunk_fn(cfg, rpt, chunk, backend))
    mshape, finalize = trace_shapes(cfg, backend)
    master = jnp.zeros(mshape, jnp.float64)
    state = s0; oflow = jnp.int32(0)
    t0 = time.perf_counter()
    for ci in range(n_chunks):
        state, master, oflow = fn(ctx.field4, state, master, oflow)
        if ci % 8 == 0:
            jax.device_get(oflow)
            print(f"  {backend} chunk {ci} t={time.perf_counter()-t0:.0f}s", flush=True)
    edep = np.asarray(jax.device_get(finalize(master)), np.float64)
    of = int(jax.device_get(oflow))
    return edep, of, time.perf_counter() - t0

eh, of, th = chunked_trace("pallas_hbm")
print(f"hbm chunked: {th:.1f}s oflow={of} sum={eh.sum():.8e}", flush=True)
es, _, ts = chunked_trace("scatter")
print(f"scatter chunked: {ts:.1f}s sum={es.sum():.8e}", flush=True)
print("rel_l2:", np.linalg.norm(eh-es)/np.linalg.norm(es))
