"""Microbenchmark the Pallas deposit kernel in isolation on the real chip.

Synthesizes tile-coherent inputs at full-OMEGA scale (4384 live tiles,
batch*256 rays per tile) and times K kernel calls inside one jit (scan) to
amortize the ~45 ms tunnel dispatch overhead.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_deposit_kernel.py [variant ...]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from cbet_raytracing_3d_tpu.ops.pallas_deposit import (
    ZLANES, edep_zpad_shape, make_tile_deposit)

import os

NX = NY = NZ = 100
N_TILES = int(os.environ.get("BD_TILES", 4384))
BATCH = int(os.environ.get("BD_BATCH", 5))
RPT = int(os.environ.get("BD_RPT", 256))
R = BATCH * RPT
TB = int(os.environ.get("BD_TB", 8))
BOX = tuple(int(v) for v in os.environ.get("BD_BOX", "32,24,32").split(","))
K_CALLS = 10


def synth_inputs(seed=0):
    rng = np.random.default_rng(seed)
    # per-tile box centers, rays within a 24-cell extent (the measured
    # whole-trace coherence), batch steps drift by <1 cell
    spread = min(BOX) - 3
    c0 = rng.integers(4, 96 - spread, size=(N_TILES, 3))
    off = rng.integers(0, spread, size=(N_TILES, R, 3))
    cells = (c0[:, None, :] + off).astype(np.int32)          # (T, R, 3)
    frac = rng.random((N_TILES, R, 3), dtype=np.float32)
    inc = (rng.random((N_TILES, R), dtype=np.float32) + 0.1) * 3e12
    args = []
    for ax in range(3):
        args.append(jnp.asarray(cells[..., ax].reshape(-1)))
    for ax in range(3):
        args.append(jnp.asarray(frac[..., ax].reshape(-1)))
    args.append(jnp.asarray(inc.reshape(-1)))
    return args


def run(label, deposit, args):
    edep0 = jnp.zeros(edep_zpad_shape(NX, NY, NZ), jnp.float32)

    @jax.jit
    def many(edep, a):
        def body(carry, _):
            e, of = carry
            e, o = deposit(e, *a)
            return (e, of + o), None
        (e, of), _ = jax.lax.scan(body, (edep, jnp.int32(0)), None,
                                  length=K_CALLS)
        return e, of

    t0 = time.perf_counter()
    e, of = many(edep0, args)
    jax.device_get(of)
    compile_s = time.perf_counter() - t0
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        e, of = many(edep0, args)
        jax.device_get(of)
        times.append(time.perf_counter() - t0)
    per_call = min(times) / K_CALLS
    print(f"{label:28s} {per_call*1e3:8.2f} ms/call "
          f"({per_call/BATCH*1e3:6.2f} ms/step-equiv, "
          f"{per_call/N_TILES*1e6:5.2f} us/tile) "
          f"oflow={int(jax.device_get(of))} compile={compile_s:.0f}s")
    return per_call


def main():
    variants = sys.argv[1:] or ["current"]
    args = synth_inputs()
    print(f"tiles={N_TILES} R={R} tb={TB} box={BOX} "
          f"backend={jax.default_backend()}")
    for v in variants:
        if v == "current":
            dep = make_tile_deposit(NX, NY, NZ, R, box=BOX,
                                    tiles_per_block=TB)
            run("current(batch=5)", dep, args)
        elif v == "no_lo":
            dep = make_tile_deposit(NX, NY, NZ, R, box=BOX,
                                    tiles_per_block=TB, _ablate="no_lo")
            run("single matmul (no lo)", dep, args)
        elif v == "no_mm":
            dep = make_tile_deposit(NX, NY, NZ, R, box=BOX,
                                    tiles_per_block=TB, _ablate="no_mm")
            run("no matmuls (M-build+moves)", dep, args)
        elif v == "no_mbuild":
            dep = make_tile_deposit(NX, NY, NZ, R, box=BOX,
                                    tiles_per_block=TB, _ablate="no_mbuild")
            run("const mb (no M-build)", dep, args)
        elif v in ("small_hats", "outer_reshape"):
            dep = make_tile_deposit(NX, NY, NZ, R, box=BOX,
                                    tiles_per_block=TB, _ablate=v)
            run(f"mb via {v}", dep, args)
        elif v == "bf16_hats":
            dep = make_tile_deposit(NX, NY, NZ, R, box=BOX,
                                    tiles_per_block=TB, _ablate="bf16_hats")
            run("bf16 hat chain", dep, args)
        elif v == "box26":
            dep = make_tile_deposit(NX, NY, NZ, R, box=(26, 24, 28),
                                    tiles_per_block=TB)
            run("box=(26,24,28)", dep, args)
        else:
            print(f"unknown variant {v}")


if __name__ == "__main__":
    main()
