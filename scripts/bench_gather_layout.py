"""Gather cost vs index locality and field-table layout.

Production indices are tile-coherent: each 256-ray group reads rows within a
small spatial box. Compare the row-major (x*ny+y)*nz+z layout against a
4x4x4-cell-blocked layout on synthetic indices with production-like
clustering.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

NX = NY = NZ = 100
P = NX * NY * NZ
N_TILES = 4384
RPT = 256
N = N_TILES * RPT
K = 50


def timeit(label, fn, *args):
    out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0])
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.device_get(jax.tree_util.tree_leaves(out)[0])
        times.append(time.perf_counter() - t0)
    print(f"{label:52s} {min(times)/K*1e3:7.3f} ms/step")


def make_cells(rng, spread):
    c0 = rng.integers(2, 96 - spread, size=(N_TILES, 3))
    off = rng.integers(0, spread, size=(N_TILES, RPT, 3))
    return (c0[:, None, :] + off).reshape(N, 3).astype(np.int32)


def main():
    rng = np.random.default_rng(0)
    field4 = jnp.asarray(rng.random((P, 4), np.float32))
    # blocked layout: 4x4x4 cell bricks, 64 consecutive rows per brick
    B = 4
    nbx, nby, nbz = NX // B, NY // B, NZ // B

    def flat_rowmajor(c):
        return (c[:, 0] * NY + c[:, 1]) * NZ + c[:, 2]

    cells5 = make_cells(rng, 6)     # per-step spread ~6 cells (tight)
    cells26 = make_cells(rng, 26)   # whole-box spread (loose)

    @jax.jit
    def gather_rows(f4, idx):
        def body(ix, _):
            rows = jnp.take(f4, ix, axis=0)
            ix = ix + (rows[:, 0] > 2.0).astype(jnp.int32)  # keep deps, no-op
            return ix, None
        ix, _ = jax.lax.scan(body, idx, None, length=K)
        return ix

    @jax.jit
    def gather_rows_blocked(f4, cx, cy, cz):
        def body(c, _):
            cx, cy, cz = c
            bidx = ((cx // B) * nby + (cy // B)) * nbz + (cz // B)
            lidx = ((cx % B) * B + (cy % B)) * B + (cz % B)
            rows = jnp.take(f4, bidx * (B * B * B) + lidx, axis=0)
            cx = cx + (rows[:, 0] > 2.0).astype(jnp.int32)
            return (cx, cy, cz), None
        c, _ = jax.lax.scan(body, (cx, cy, cz), None, length=K)
        return c

    print(f"N={N} backend={jax.default_backend()}")
    for label, cells in (("spread6", cells5), ("spread26", cells26)):
        idx = jnp.asarray(flat_rowmajor(cells))
        timeit(f"row-major gather, {label}", gather_rows, field4, idx)
        cx = jnp.asarray(cells[:, 0]); cy = jnp.asarray(cells[:, 1])
        cz = jnp.asarray(cells[:, 2])
        timeit(f"blocked-4 gather (incl index math), {label}",
               gather_rows_blocked, field4, cx, cy, cz)
    # bf16 variant on the tight clustering
    f4b = field4.astype(jnp.bfloat16)
    idx = jnp.asarray(flat_rowmajor(cells5))
    timeit("row-major gather bf16, spread6", gather_rows, f4b, idx)


if __name__ == "__main__":
    main()
