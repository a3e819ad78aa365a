"""Round-4 probe: overlap anatomy of the segmented OMEGA trace + in-scan
gather byte-scaling (VERDICT r3 Missing #1 / Next #1).

Decides between three designs for removing the per-step field row-gather
from the trace critical path:
  (a) the judge-proposed in-kernel one-hot field lookup (mega-window kernel),
  (b) the exact "absorb-move": absorption lookup + energy rule folded into
      the deposit kernel as a batched one-hot contraction (the CBET
      window-gain pattern — absorption is multiplicative), shrinking the
      in-scan gather to kick-only 12-byte rows,
  (c) neither (commit this artifact as the measured kill).

Measured variants (all on the production segmented plan, scalar-fenced,
min of 3):
  anchor      — the production segmented trace (expect ~2.2 s)
  nodep       — deposit kernel replaced by a no-op: the gather+state scan
                chain alone (critical path if the kernel overlaps)
  nodep12     — nodep with a 12-byte (P, 3) kick-only gather (absorb row
                replaced by a constant): the absorb-move's scan chain
  nodep8      — nodep with an 8-byte (P, 2) gather (scaling point only —
                NOT an exact design)
  nogather    — gather replaced by constant rows (dependent on flat2 so XLA
                cannot fold it): state arithmetic + deposit kernel exposed.
                Trajectories are distorted (straight rays), so this is an
                UPPER-bound-ish kernel-side number, noted as such.
  stateonly   — nodep + nogather combined: the bare scan chain
  gather_scan — isolated in-scan jnp.take at row widths 16/12/8/4 B f32 and
                8 B bf16x4, with per-step-VARYING indices (the round-3
                floor probe used loop-invariant indices, which XLA hoists —
                its 0.37 ms/step is the hoisted artifact, 14x below the
                in-trace 5.26 ms/step attribution), on the REAL initial
                cell distribution (duplicate-heavy, the measured 2x case).

Writes artifacts/field_probe_r04.json.
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
from cbet_raytracing_3d_tpu.models import (raytracer as rt,   # noqa: E402
                                           tileplan as tp)
from cbet_raytracing_3d_tpu.models.raytracer import (         # noqa: E402
    RayState, _reindex_axis)
from cbet_raytracing_3d_tpu.parallel import sharding as sh    # noqa: E402

CACHE = os.path.join(REPO, ".cbet_cache")
OUT = {}


def fence(out):
    # oflow may constant-fold in ablated builds; uray[0] is a real dependency
    jax.device_get(out[1].uray[0])


def timed(fn, *args, reps=3):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        fence(out)
        ts.append(time.perf_counter() - t0)
    return min(ts)


def build_and_time(cfg, ctx, state0, segments, label):
    fn = jax.jit(rt.make_segmented_trace_fn(
        cfg, ctx.layout.rays_per_tile, segments))
    t0 = time.perf_counter()
    out = fn(ctx.field4, state0)
    fence(out)
    t_first = time.perf_counter() - t0
    t = timed(fn, ctx.field4, state0)
    OUT[label] = {"seconds": round(t, 3),
                  "compile_seconds": round(t_first - t, 1)}
    print(f"{label}: {t:.3f}s (compile {t_first - t:.1f}s)", flush=True)
    return t


def make_ablated_step_fn(cfg, gather_width):
    """make_deferred_step_fn with the gather ablated/narrowed.

    gather_width: 0 = no gather (constant rows, flat2-dependent so XLA
    cannot hoist/fold them); 2/3 = gather that many f32 columns from a
    narrowed table and synthesize the rest as constants."""
    nx, ny, nz = cfg.nx, cfg.ny, cfg.nz
    tol = cfg.cell_tol
    stop_frac = cfg.stop_fraction
    nvec = (nx, ny, nz)

    def step(state: RayState, field4: jnp.ndarray):
        dtype = state.uray.dtype
        vel = tuple(state.vel[ax] - state.kick[ax] for ax in range(3))
        frac = tuple(state.frac[ax] + vel[ax] for ax in range(3))
        dsel = tuple(_reindex_axis(state.cell[ax], frac[ax], nvec[ax], tol)
                     for ax in range(3))
        cell = tuple(state.cell[ax] + dsel[ax] for ax in range(3))
        frac = tuple(frac[ax] - dsel[ax].astype(dtype) for ax in range(3))
        flat2 = (cell[0] * ny + cell[1]) * nz + cell[2]
        eps = jnp.asarray(1e-30, dtype)
        dep = eps * flat2.astype(dtype)        # defeats folding/hoisting
        if gather_width == 0:
            kick = tuple(dep for _ in range(3))
            absorb = jnp.asarray(1e-4, dtype) + dep
        else:
            rows = jnp.take(field4[:, :gather_width], flat2, axis=0)
            kick = tuple(rows[:, min(ax, gather_width - 1)]
                         for ax in range(3))
            absorb = (rows[:, gather_width - 1] if gather_width >= 3
                      else jnp.asarray(1e-4, dtype) + dep)
        increment = absorb * state.uray
        uray = state.uray - increment
        inc_masked = jnp.where(state.alive, increment, jnp.asarray(0, dtype))
        out = jnp.zeros_like(state.alive)
        for ax in range(3):
            t = cell[ax].astype(dtype) + frac[ax]
            out |= (t < -0.5) | (t > nvec[ax] - 0.5)
        dead = (uray <= stop_frac * state.uray_init) | out
        alive = state.alive & jnp.logical_not(dead)
        keep = state.alive
        new_state = RayState(
            frac=tuple(jnp.where(keep, frac[ax], state.frac[ax])
                       for ax in range(3)),
            vel=tuple(jnp.where(keep, vel[ax], state.vel[ax])
                      for ax in range(3)),
            kick=tuple(jnp.where(keep, kick[ax], state.kick[ax])
                       for ax in range(3)),
            uray=jnp.where(keep, uray, state.uray),
            uray_init=state.uray_init,
            cell=tuple(jnp.where(keep, cell[ax], state.cell[ax])
                       for ax in range(3)),
            alive=alive,
        )
        return new_state, (cell, frac, inc_masked)

    return step


def main() -> int:
    cfg = Config()
    t0 = time.perf_counter()
    ctx = rt.prepare_device(cfg)
    jax.device_get(ctx.state0.uray[0])
    OUT["init_device_seconds"] = round(time.perf_counter() - t0, 1)
    print("init:", OUT["init_device_seconds"], "s", flush=True)
    state0 = sh.pad_rays(ctx.state0, ctx.layout.rays_per_tile
                         * cfg.tiles_per_block)
    plan = tp.get_or_measure_plan(cfg, ctx, state0, CACHE)
    segments = tp.build_segments(plan, cfg, cfg.nt)

    orig_deposit = rt._make_deposit_fn
    orig_dstep = rt.make_deferred_step_fn

    def noop_deposit(cfg_, rows, backend):
        def dep(edep, *args):
            return edep, jnp.int32(0)
        return dep

    try:
        # 1. anchor
        build_and_time(cfg, ctx, state0, segments, "anchor")

        # 2. nodep: gather+state chain only
        rt._make_deposit_fn = noop_deposit
        build_and_time(cfg, ctx, state0, segments, "nodep")

        # 3/4. nodep12 / nodep8: narrowed gather chains
        for width, label in ((3, "nodep12"), (2, "nodep8")):
            rt.make_deferred_step_fn = (
                lambda c, w=width: make_ablated_step_fn(c, w))
            build_and_time(cfg, ctx, state0, segments, label)

        # 5. stateonly
        rt.make_deferred_step_fn = lambda c: make_ablated_step_fn(c, 0)
        build_and_time(cfg, ctx, state0, segments, "stateonly")

        # 6. nogather (kernel exposed; distorted straight-ray trajectories —
        # kernel-side work is near-dense, an upper bound on the real mix)
        rt._make_deposit_fn = orig_deposit
        build_and_time(cfg, ctx, state0, segments, "nogather")
    finally:
        rt._make_deposit_fn = orig_deposit
        rt.make_deferred_step_fn = orig_dstep

    # 7. isolated in-scan gather byte-scaling on the real cell distribution
    P = cfg.nx * cfg.ny * cfg.nz
    cell = [np.asarray(jax.device_get(c)) for c in ctx.state0.cell]
    flat = ((cell[0].astype(np.int64) * cfg.ny + cell[1]) * cfg.nz
            + cell[2]).astype(np.int32)
    N = flat.shape[0]
    ix0 = jnp.asarray(flat)
    rng = np.random.default_rng(0)
    OUT["gather_scan_rows"] = int(N)
    for width, dt, label in ((4, np.float32, "f32x4"),
                             (3, np.float32, "f32x3"),
                             (2, np.float32, "f32x2"),
                             (1, np.float32, "f32x1"),
                             (4, "bf16", "bf16x4")):
        if dt == "bf16":
            tab = jnp.asarray(rng.random((P, width), np.float32)
                              ).astype(jnp.bfloat16)
        else:
            tab = jnp.asarray(rng.random((P, width), dt))

        @jax.jit
        def g(t, ix):
            def body(c, j):
                rows = jnp.take(t, ix + (j & 1), axis=0)
                return c + rows[:, 0].astype(jnp.float32).sum(), None
            return jax.lax.scan(body, jnp.float32(0),
                                jnp.arange(100, dtype=jnp.int32))[0]

        jax.device_get(g(tab, ix0))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            jax.device_get(g(tab, ix0))
            ts.append(time.perf_counter() - t0)
        ms = min(ts) / 100 * 1000
        OUT[f"gather_scan_{label}_ms_per_step"] = round(ms, 3)
        print(f"gather {label}: {ms:.3f} ms/step", flush=True)

    os.makedirs(os.path.join(REPO, "artifacts"), exist_ok=True)
    with open(os.path.join(REPO, "artifacts", "field_probe_r04.json"),
              "w") as f:
        json.dump(OUT, f, indent=2)
    print(json.dumps(OUT))
    return 0


if __name__ == "__main__":
    sys.exit(main())
