"""Round-4 probe #2: can the per-step field gather beat 4.5 ns/row?

probe_field_r04 established: the segmented trace is SERIAL (gather chain
1.047 s + kernel ~1.15 s = 2.20 s anchor, zero overlap on the one
TensorCore), and the in-scan gather costs ~4.5 ns/row INDEPENDENT of row
width (16/12/8 B identical; 4 B rows are ~1.6x WORSE).  The one unexplored
lever from the round-2 hardware facts: "duplicate-heavy indices are 2x
SLOWER" — and the production indices are maximally duplicate-heavy
(launch-tile-mates share cells).  If the penalty is same-address
serialization, an EXACT k-way interleaved replication of the table
(tab_k[i*k + j] = tab[i], idx' = idx*k + slot%k) spreads the duplicates
and may recover toward the unique-index rate.

Also probes the CBET gain-lookup rate (1-wide rows measured 1.6x worse
than 2-wide: padding the gain table to 2-wide rows may cut the dominant
CBET lookup cost ~40%).

Writes artifacts/gather_dedup_r04.json.
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from cbet_raytracing_3d_tpu.utils.compile_cache import (  # noqa: E402
    enable_persistent_cache)

enable_persistent_cache()

import jax                      # noqa: E402
import jax.numpy as jnp         # noqa: E402

from cbet_raytracing_3d_tpu import Config                     # noqa: E402
from cbet_raytracing_3d_tpu.models import raytracer as rt     # noqa: E402

OUT = {}


def scan_gather_ms(tab, ix, reps=3, length=100):
    @jax.jit
    def g(t, i):
        def body(c, j):
            rows = jnp.take(t, i + (j & 1), axis=0)
            return c + rows[:, 0].astype(jnp.float32).sum(), None
        return jax.lax.scan(body, jnp.float32(0),
                            jnp.arange(length, dtype=jnp.int32))[0]

    jax.device_get(g(tab, ix))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.device_get(g(tab, ix))
        ts.append(time.perf_counter() - t0)
    return min(ts) / length * 1000


def main() -> int:
    cfg = Config()
    ctx = rt.prepare_device(cfg)
    cell = [np.asarray(jax.device_get(c)) for c in ctx.state0.cell]
    flat = ((cell[0].astype(np.int64) * cfg.ny + cell[1]) * cfg.nz
            + cell[2]).astype(np.int64)
    N = flat.shape[0]
    P = cfg.nx * cfg.ny * cfg.nz
    rng = np.random.default_rng(0)
    OUT["rows"] = int(N)
    base = rng.random((P, 4)).astype(np.float32)

    # duplicate statistics of the real index stream
    _, counts = np.unique(flat, return_counts=True)
    OUT["real_unique_cells"] = int(counts.size)
    OUT["real_max_dup"] = int(counts.max())
    OUT["real_mean_dup"] = round(float(counts.mean()), 2)

    # 1. real (duplicate-heavy) vs uniform-random indices, plain table
    ix_real = jnp.asarray(flat.astype(np.int32))
    ix_rand = jnp.asarray(rng.integers(0, P, N, dtype=np.int32))
    tab = jnp.asarray(base)
    OUT["real_f32x4_ms"] = round(scan_gather_ms(tab, ix_real), 3)
    OUT["rand_f32x4_ms"] = round(scan_gather_ms(tab, ix_rand), 3)
    print("real", OUT["real_f32x4_ms"], "rand", OUT["rand_f32x4_ms"],
          flush=True)

    # 2. k-way interleaved replication, real indices (EXACT: same values)
    slot = np.arange(N, dtype=np.int64)
    for kk in (2, 4, 8):
        tab_k = jnp.asarray(np.repeat(base, kk, axis=0))   # (kk*P, 4)
        ix_k = jnp.asarray((flat * kk + (slot % kk)).astype(np.int32))
        OUT[f"real_interleave{kk}_ms"] = round(
            scan_gather_ms(tab_k, ix_k), 3)
        print(f"interleave{kk}", OUT[f"real_interleave{kk}_ms"], flush=True)
        del tab_k, ix_k

    # 3. CBET gain-lookup shapes: per-beam-sliced 4 MB row, 1- vs 2-wide
    gain_row = rng.random((P, 1)).astype(np.float32)
    OUT["gain_f32x1_ms"] = round(
        scan_gather_ms(jnp.asarray(gain_row), ix_real), 3)
    OUT["gain_f32x2_ms"] = round(
        scan_gather_ms(jnp.asarray(np.repeat(gain_row, 2, 1)), ix_real), 3)
    # and interleaved 2-wide (both levers)
    g2 = np.repeat(gain_row, 2, 1)
    for kk in (8,):
        tab_k = jnp.asarray(np.repeat(g2, kk, axis=0))
        ix_k = jnp.asarray((flat * kk + (slot % kk)).astype(np.int32))
        OUT[f"gain_f32x2_interleave{kk}_ms"] = round(
            scan_gather_ms(tab_k, ix_k), 3)
    print("gain x1", OUT["gain_f32x1_ms"], "x2", OUT["gain_f32x2_ms"],
          "x2 il8", OUT["gain_f32x2_interleave8_ms"], flush=True)

    with open(os.path.join(REPO, "artifacts", "gather_dedup_r04.json"),
              "w") as f:
        json.dump(OUT, f, indent=2)
    print(json.dumps(OUT))
    return 0


if __name__ == "__main__":
    sys.exit(main())
