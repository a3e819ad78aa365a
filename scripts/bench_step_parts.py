"""Measure the XLA-side per-step costs in isolation: row-gather and state
arithmetic, at full-OMEGA live scale (1.12M ray slots).

Each measurement scans K steps inside one jit and fences with device_get.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

N = 4384 * 256          # live slots at full OMEGA
P = 100 * 100 * 100
K = 100


def timeit(label, fn, *args):
    t0 = time.perf_counter()
    out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0])
    compile_s = time.perf_counter() - t0
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.device_get(jax.tree_util.tree_leaves(out)[0])
        times.append(time.perf_counter() - t0)
    per = min(times) / K
    print(f"{label:44s} {per*1e3:7.3f} ms/step  (compile {compile_s:.0f}s)")
    return per


def main():
    rng = np.random.default_rng(0)
    field4 = jnp.asarray(rng.random((P, 4), np.float32))
    field4_bf = field4.astype(jnp.bfloat16)
    table = jnp.asarray(rng.random((444,), np.float32))
    idx0 = jnp.asarray(rng.integers(0, P - 1, N).astype(np.int32))

    @jax.jit
    def row_gather(f4, idx):
        def body(ix, _):
            rows = jnp.take(f4, ix, axis=0)
            ix = (ix + rows[:, 0].astype(jnp.int32) % 3) % (P - 1)
            return ix, None
        ix, _ = jax.lax.scan(body, idx, None, length=K)
        return ix

    @jax.jit
    def small_gather(tab, idx):
        def body(ix, _):
            v = jnp.take(tab, ix % 444)
            ix = (ix + v.astype(jnp.int32) % 3 + 1) % (P - 1)
            return ix, None
        ix, _ = jax.lax.scan(body, idx, None, length=K)
        return ix

    @jax.jit
    def small_gather8(tab, idx):
        # 8 independent small-table lookups per step (the on-the-fly
        # radial-field recompute would need ~8)
        def body(ix, _):
            acc = ix
            for s in range(8):
                v = jnp.take(tab, (ix + s) % 444)
                acc = acc + v.astype(jnp.int32)
            ix = (acc % 3 + ix + 1) % (P - 1)
            return ix, None
        ix, _ = jax.lax.scan(body, idx, None, length=K)
        return ix

    # state-arithmetic-only step: same op mix as make_deferred_step_fn minus
    # the gather and deposit
    fr = tuple(jnp.asarray(rng.random(N, np.float32)) for _ in range(3))
    vl = tuple(jnp.asarray(rng.random(N, np.float32) * 0.1) for _ in range(3))
    kk = tuple(jnp.asarray(rng.random(N, np.float32) * 0.01) for _ in range(3))
    ur = jnp.asarray(rng.random(N, np.float32))
    ui = jnp.asarray(rng.random(N, np.float32) + 1.0)
    cl = tuple(jnp.asarray(rng.integers(1, 98, N).astype(np.int32)) for _ in range(3))
    al = jnp.asarray(rng.random(N) > 0.3)

    @jax.jit
    def state_only(fr, vl, kk, ur, ui, cl, al):
        def body(carry, _):
            fr, vl, kk, ur, ui, cl, al = carry
            vel = tuple(vl[a] - kk[a] for a in range(3))
            frac = tuple(fr[a] + vel[a] for a in range(3))
            dsel = []
            for a in range(3):
                d = jnp.zeros_like(cl[a])
                for dlt in (1, 0, -1):
                    ok = jnp.abs(jnp.float32(dlt) - frac[a]) < 0.5001
                    d = jnp.where(ok, jnp.full_like(d, dlt), d)
                dsel.append(d)
            cell = tuple(jnp.clip(cl[a] + dsel[a], 0, 99) for a in range(3))
            frac = tuple(frac[a] - dsel[a].astype(jnp.float32) for a in range(3))
            inc = ur * 0.001
            ur2 = ur - inc
            out = jnp.zeros_like(al)
            for a in range(3):
                t = cell[a].astype(jnp.float32) + frac[a]
                out |= (t < -0.5) | (t > 99.5)
            dead = (ur2 <= 0.05 * ui) | out
            alive = al & ~dead
            keep = al
            fr = tuple(jnp.where(keep, frac[a], fr[a]) for a in range(3))
            vl = tuple(jnp.where(keep, vel[a], vl[a]) for a in range(3))
            ur = jnp.where(keep, ur2, ur)
            cl = tuple(jnp.where(keep, cell[a], cl[a]) for a in range(3))
            return (fr, vl, kk, ur, ui, cl, alive), None
        carry, _ = jax.lax.scan(body, (fr, vl, kk, ur, ui, cl, al), None,
                                length=K)
        return carry

    print(f"N={N} P={P} K={K} backend={jax.default_backend()}")
    timeit("row-gather (P,4) f32", row_gather, field4, idx0)
    timeit("row-gather (P,4) bf16", row_gather, field4_bf, idx0)
    timeit("scalar gather (444,) x1", small_gather, table, idx0)
    timeit("scalar gather (444,) x8", small_gather8, table, idx0)
    timeit("state arithmetic only", state_only, fr, vl, kk, ur, ui, cl, al)


if __name__ == "__main__":
    main()
