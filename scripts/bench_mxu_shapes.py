"""Raw Mosaic MXU throughput for the matmul shapes the deposit/lookup
kernels would use. Decides design B go/no-go (in-kernel field lookup).

Each kernel grid step does `reps` dot_generals over VMEM-resident operands
(no DMA in the loop), so this isolates MXU+layout cost.
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GRID = 512


def make_mm_kernel(m, k, n, reps, transpose_lhs=False):
    def kern(a_ref, b_ref, out_ref):
        acc = jnp.zeros_like(out_ref)
        a = a_ref[...]
        b = b_ref[...]
        if transpose_lhs:
            dn = (((0,), (0,)), ((), ()))
        else:
            dn = (((1,), (0,)), ((), ()))
        for i in range(reps):
            acc = acc + jax.lax.dot_general(
                a, b, dimension_numbers=dn,
                preferred_element_type=jnp.float32)
        out_ref[...] = acc

    ashape = (k, m) if transpose_lhs else (m, k)

    @jax.jit
    def run(a, b):
        return pl.pallas_call(
            kern,
            grid=(GRID,),
            in_specs=[pl.BlockSpec(ashape, lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((k, n), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((m, n), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        )(a, b)

    return run, ashape


def bench(label, m, k, n, reps=8, transpose_lhs=False, dtype=jnp.bfloat16):
    run, ashape = make_mm_kernel(m, k, n, reps, transpose_lhs)
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.random(ashape, np.float32), dtype)
    b = jnp.asarray(rng.random((k, n), np.float32), dtype)
    out = run(a, b)
    jax.device_get(out[0, 0])
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = run(a, b)
        jax.device_get(out[0, 0])
        ts.append(time.perf_counter() - t0)
    per_mm = min(ts) / (GRID * reps)
    flops = 2 * m * k * n
    eff = flops / per_mm / 197e12
    print(f"{label:42s} {per_mm*1e6:7.2f} us/mm  {flops/1e6:6.1f} MF "
          f"-> {eff*100:5.1f}% of bf16 peak")


def main():
    print(f"backend={jax.default_backend()}")
    # deposit-shaped: contract over rays (transposed lhs), batch=5 tiles
    bench("deposit (1280,896)^T@(1280,128)", 896, 1280, 128, transpose_lhs=True)
    bench("deposit small (320,480)^T@(320,128)", 480, 320, 128, transpose_lhs=True)
    # lookup-shaped: rows=rays, contract over box area
    bench("lookup (256,896)@(896,128)", 256, 896, 128)
    bench("lookup (256,432)@(432,128)", 256, 432, 128)
    bench("lookup (64,432)@(432,128)", 64, 432, 128)
    bench("lookup (256,432)@(432,256)", 256, 432, 256)


if __name__ == "__main__":
    main()
