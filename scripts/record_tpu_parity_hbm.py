"""Record the round's Mosaic-vs-interpret parity artifacts for the kernels
CI cannot compile (tests run interpret-only on CPU): the HBM-grid deposit
kernel (VERDICT r2 weak #6 — its on-chip parity evidence previously lived
only in a run log) and the CBET window-gain kernel (new in round 3).

Each check runs a small-but-kernel-exercising scene on the real TPU
(compiled Mosaic) and on CPU in a clean subprocess (interpret mode), and
records rel-L2 into ``artifacts/tpu_parity_hbm_r{N}.json``.

Usage: python scripts/record_tpu_parity_hbm.py [round_tag]
"""

import json
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# anisotropic fine-z grid: nz+2 > 128 forces the HBM-grid kernel at a
# CPU-affordable scene size (same shape as tests/test_deposit.py's)
HBM_SCENE = dict(nbeams=1, rays_per_zone=1, nx=32, ny=32, nz=130,
                 dtype="float32", tiles_per_block=2, courant_mult=1.0,
                 deposit_box_x=16, deposit_box_y=16, deposit_box_z=56)
GAIN_SCENE = dict(nbeams=2, rays_per_zone=2, nx=48, ny=48, nz=48,
                  dtype="float32", tiles_per_block=8, chunk_steps=16,
                  deposit_batch_steps=4, cbet_gain_mode="kernel")


def hbm_trace(backend: str) -> np.ndarray:
    import jax
    import jax.numpy as jnp

    from cbet_raytracing_3d_tpu.config import Config
    from cbet_raytracing_3d_tpu.models import raytracer as rt
    from cbet_raytracing_3d_tpu.parallel import sharding as sh

    cfg = Config(**HBM_SCENE)
    ctx = rt.prepare(cfg, host_state=True)
    state0 = sh.put_state(sh.pad_rays(
        rt.select_rays(ctx.state0, ctx.live_slots),
        ctx.layout.rays_per_tile * cfg.tiles_per_block))
    fn = jax.jit(rt.make_trace_fn(cfg, ctx.layout.rays_per_tile, backend))
    edep, _, oflow = fn(jnp.asarray(ctx.field4), state0)
    assert int(jax.device_get(oflow)) == 0
    return np.asarray(jax.device_get(edep), np.float64)


def gain_trace(backend: str) -> np.ndarray:
    """One CBET window-gain trace (fixed synthetic gain field); returns the
    coupled edep concatenated with the per-beam intensity fields."""
    import jax
    import jax.numpy as jnp

    from cbet_raytracing_3d_tpu.config import Config
    from cbet_raytracing_3d_tpu.models import raytracer as rt
    from cbet_raytracing_3d_tpu.models.cbet import make_cbet_trace_fn
    from cbet_raytracing_3d_tpu.parallel import sharding as sh

    cfg = Config(**GAIN_SCENE)
    ctx = rt.prepare(cfg, host_state=True)
    from cbet_raytracing_3d_tpu.models.cbet import live_tile_slots
    slots = live_tile_slots(cfg, ctx)
    state0 = sh.put_state(sh.pad_rays(
        rt.select_rays(ctx.state0, slots),
        ctx.layout.rays_per_tile * cfg.tiles_per_block))
    tpg = (len(slots) // ctx.layout.rays_per_tile) // cfg.nbeams
    bid_np = np.maximum(np.asarray(ctx.beam_id)[slots], 0).astype(np.int32)
    bid = jnp.asarray(np.pad(bid_np, (0, state0.n - bid_np.shape[0])))
    P = cfg.nx * cfg.ny * cfg.nz
    rng = np.random.default_rng(7)
    gain = jnp.asarray(rng.normal(0, 1.0, (cfg.nbeams, P)).astype(np.float32))
    tr = jax.jit(make_cbet_trace_fn(cfg, ctx, backend=backend,
                                    tiles_per_group=tpg)())
    edep, inten, _, of = tr(jnp.asarray(ctx.field4), gain, bid, state0)
    assert int(jax.device_get(of)) == 0
    return np.concatenate([
        np.asarray(jax.device_get(edep), np.float64).reshape(-1),
        np.asarray(jax.device_get(inten), np.float64).reshape(-1)])


def in_subprocess(fn_name: str, backend: str, out_name: str) -> np.ndarray:
    out = os.path.join(REPO, ".cbet_cache", out_name)
    os.makedirs(os.path.dirname(out), exist_ok=True)
    code = (
        "import sys; sys.path.insert(0, %r)\n"
        "import numpy as np\n"
        "from scripts.record_tpu_parity_hbm import %s\n"
        "np.save(%r, %s(%r))\n" % (REPO, fn_name, out, fn_name, backend)
    )
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO   # drop the axon sitecustomize dir
    subprocess.run([sys.executable, "-c", code], env=env, check=True,
                   cwd=REPO, timeout=1800)
    return np.load(out)


def main() -> int:
    tag = sys.argv[1] if len(sys.argv) > 1 else "dev"
    import jax
    backend = jax.default_backend()
    if backend == "cpu":
        print("no accelerator — refusing to record a parity artifact")
        return 1

    record = {"round": tag, "backend": backend,
              "hbm_scene": {k: v for k, v in HBM_SCENE.items()},
              "gain_scene": {k: v for k, v in GAIN_SCENE.items()}}

    tpu = hbm_trace("pallas_hbm")
    ref = in_subprocess("hbm_trace", "pallas_hbm_interpret",
                        "parity_hbm_interpret.npy")
    rel = float(np.linalg.norm(tpu - ref) / np.linalg.norm(ref))
    record["hbm_rel_l2_mosaic_vs_interpret"] = rel
    record["hbm_edep_total_mosaic"] = float(tpu.sum())
    print("hbm kernel rel-L2:", rel, flush=True)

    tpu_g = gain_trace("pallas")
    ref_g = in_subprocess("gain_trace", "pallas_interpret",
                          "parity_gain_interpret.npy")
    rel_g = float(np.linalg.norm(tpu_g - ref_g) / np.linalg.norm(ref_g))
    record["gain_kernel_rel_l2_mosaic_vs_interpret"] = rel_g
    print("window-gain kernel rel-L2:", rel_g, flush=True)

    os.makedirs(os.path.join(REPO, "artifacts"), exist_ok=True)
    path = os.path.join(REPO, "artifacts", f"tpu_parity_hbm_{tag}.json")
    with open(path, "w") as f:
        json.dump(record, f, indent=2)
    print(json.dumps(record))
    print(f"wrote {path}")
    # Mosaic lowering must agree with the interpreter to f32/bf16 rounding
    # noise, far under the 1e-4 product accuracy bar
    assert rel < 1e-4, rel
    assert rel_g < 1e-3, rel_g   # bf16 gain contraction vs interpret-bf16
    return 0


if __name__ == "__main__":
    sys.exit(main())
