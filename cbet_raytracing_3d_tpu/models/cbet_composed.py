"""COMPOSED (host-orchestrated, resumable) CBET solve — the BASELINE
config-4-scale variant of ``models.cbet.cbet_solve`` (VERDICT r04 #4).

Why it exists: the monolithic solver executes each fixed-point iteration's
gain-coupled trace as ONE jitted call; at config-4 scale that is a single
multi-minute device execution, which the tunneled worker environment kills,
and a tunnel outage (recorded 1–6.5 h here) erases the whole solve.  This
module composes the CBET fixed point with ``runner.run_composed``'s
machinery instead: host-dispatched per-chunk calls on the gain-proof
segmented tile plan, a pairwise-f32 (float64-equivalent) edep master, and
an ITERATION-BOUNDARY checkpoint of the fixed-point state — which is just
the (B, Ph) intensity, since every iteration re-traces from the same launch
state.  A resumed solve continues from the saved intensity bit-identically
(the iteration map is a pure function of it).

Memory at scale is controlled by SERIAL BEAM GROUPS: the 60 beams split
into G groups traced one after another on the one chip (the beam-sharded
mesh decomposition of ``models.cbet``, applied serially).  Each group's
trace needs only its own beams' full-resolution gain rows (the (B, P)
full-res table is 1.9 GB at config 4 — the single biggest CBET-only HBM
term) and its own per-beam intensity grids; per-group results are exact
row blocks of the global ones, so grouping changes data movement, not
values.

Model parity: the per-step physics is ``raytracer.make_deferred_step_fn``
(the ONE copy of the step), the gain application is the lookup mode's
(entry-cell sampling, ``GAIN_CLIP``, multiplicative ``exp(g*ds)`` —
``models.cbet`` apply_gain), and the intensity contribution is the same
``uray * |v| dt / (c dt s^3)`` quadrature.  ``tests/test_cbet_composed.py``
pins composed-vs-monolithic equality so the two implementations cannot
drift.

Reference contract: the CBET stage the reference scaffolds
(/root/reference/def.cuh:94-114) at the capacity scale of def.cuh:94-96.
"""

from __future__ import annotations

import dataclasses
import sys
import time
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants as k
from ..config import Config
from ..utils.accum import PairwiseAccumulator
from . import raytracer as rt
from .cbet import (GAIN_CLIP, CbetResult, _grouped_intensity_ok,
                   _step_update, live_tile_slots, make_gain_fn,
                   make_gain_upsampler)


def make_cbet_chunk_fn(cfg: Config, rays_per_tile: int, backend: str,
                       n_group_beams: int, tiles_per_group: int,
                       chunk: int, last_chunk: int):
    """Host-dispatchable per-chunk gain-coupled trace step:

    ``(field4, gain_rows, state, imaster, oflow, steps) ->
      (state, edep_delta, imaster, oflow)``

    * ``gain_rows``: (n_group_beams, P) FULL-resolution gain rows of this
      beam group (the lookup table rows its rays read — entry-cell
      sampling, identical to the monolithic lookup mode).
    * ``state``: the group's beam-contiguous segment state
      (n_group_beams * tiles_per_group * rays_per_tile rows).
    * ``edep_delta``: this chunk's fresh f32 deposit grid (z-padded kernel
      shape) for the caller's pairwise master accumulation.
    * ``imaster``: the group's (n_group_beams, ...) z-padded per-beam
      intensity grids, accumulated ACROSS chunks (donated in, returned) —
      the same sequential chunk order as the monolithic solver's
      ``imaster + ib32``.

    Jit with ``donate_argnums=(2, 3)`` (state, imaster)."""
    if backend not in rt.PALLAS_BACKENDS:
        raise ValueError(
            f"the composed CBET chunk runs on Pallas backends only "
            f"(got {backend!r}); the scatter path has no composed need")
    if not _grouped_intensity_ok(cfg, backend):
        raise ValueError(
            f"backend {backend!r} cannot carry the grouped intensity "
            f"grids for CBET grid shape {cfg.cbet_grid_shape} (hz+2 must "
            "fit the kernel's z-lanes) — raise cbet_grid_downsample")
    from ..ops.pallas_deposit import edep_zpad_shape, make_tile_deposit

    nx, ny, nz = cfg.nx, cfg.ny, cfg.nz
    s = cfg.cbet_grid_downsample
    hx, hy, hz = cfg.cbet_grid_shape
    rpt = rays_per_tile
    nb_g = n_group_beams
    tpg = tiles_per_group
    W = tpg * rpt
    d = np.array([cfg.dx, cfg.dy, cfg.dz])
    interpret = backend.endswith("_interpret")

    batch = cfg.deposit_batch_steps
    if batch > 1 and (chunk % batch or last_chunk % batch):
        batch = 1              # same fallback rule as the chunk machinery
    batch = max(1, batch)
    dstep = rt.make_deferred_step_fn(cfg)
    edeposit = rt._make_deposit_fn(cfg, rpt * batch, backend)
    ibox = (cfg.deposit_box if s == 1
            else tuple(-(-b // s) + 4 for b in cfg.deposit_box))
    ideposit = make_tile_deposit(
        hx, hy, hz, rpt * batch, box=ibox,
        tiles_per_block=cfg.tiles_per_block, n_groups=nb_g,
        tiles_per_group=tpg, interpret=interpret,
        exact_boundary=cfg.deposit_boundary_exact)
    shape3, _ = rt.trace_shapes(cfg, backend)
    ishape = (nb_g,) + edep_zpad_shape(hx, hy, hz)

    def to_coarse(cell, frac):
        if s == 1:
            return tuple(cell), tuple(frac)
        ch = tuple(c // s for c in cell)
        fh = tuple(((cell[a] - ch[a] * s).astype(frac[a].dtype) + frac[a])
                   * (1.0 / s) for a in range(3))
        return ch, fh

    def chunk_fn(field4, gain_rows, state, imaster, oflow, steps):
        dtype = state.uray.dtype
        dvec = jnp.asarray(d, dtype)
        inv_cdt = jnp.asarray(1.0 / (k.C_CMS * cfg.dt * s ** 3), dtype)

        def lookup_g(st):
            # per-beam-sliced lookups at the step-entry cell: each beam's
            # contiguous slot block reads its own static gain row — the
            # monolithic lookup mode's fast path (models/cbet.py lookup_g)
            cx, cy, cz = st.cell
            flat = (cx * ny + cy) * nz + cz
            return jnp.concatenate(
                [jnp.take(gain_rows[b], flat[b * W:(b + 1) * W], axis=0)
                 for b in range(nb_g)])

        def apply_gain(st):
            ds = jnp.sqrt((st.vel[0] * dvec[0]) ** 2
                          + (st.vel[1] * dvec[1]) ** 2
                          + (st.vel[2] * dvec[2]) ** 2)
            g = lookup_g(st)
            factor = jnp.exp(jnp.clip(g * ds, -GAIN_CLIP, GAIN_CLIP))
            uray = jnp.where(st.alive, st.uray * factor, st.uray)
            return dataclasses.replace(st, uray=uray), ds

        def step_batched(carry, _):
            st, edep, ibeams, of = carry

            def mini(st2, _):
                st2, ds = apply_gain(st2)
                st2, (cell, frac, inc) = dstep(st2, field4)
                contrib = jnp.where(st2.alive, st2.uray * (ds * inv_cdt),
                                    jnp.asarray(0.0, dtype))
                return st2, (*cell, *frac, inc, contrib)

            st, ys = jax.lax.scan(mini, st, None, length=batch)

            def rearrange(a):            # (batch, N) -> tile-major
                return (a.reshape(batch, -1, rpt)
                        .transpose(1, 0, 2).reshape(-1))

            args = [rearrange(a) for a in ys]
            edep, of_e = edeposit(edep, *args[:7])
            icell, ifrac = to_coarse(args[:3], args[3:6])
            ibeams, of_i = ideposit(ibeams, *icell, *ifrac, args[7])
            return (st, edep, ibeams, of + of_e + of_i), None

        def step_one(carry, _):
            st, edep, ibeams, of = carry
            st, ds = apply_gain(st)
            st, (cell, frac, inc) = dstep(st, field4)
            edep, of_e = edeposit(edep, *cell, *frac, inc)
            contrib = jnp.where(st.alive, st.uray * (ds * inv_cdt),
                                jnp.asarray(0.0, dtype))
            icell, ifrac = to_coarse(cell, frac)
            ibeams, of_i = ideposit(ibeams, *icell, *ifrac, contrib)
            return (st, edep, ibeams, of + of_e + of_i), None

        edep0 = jnp.zeros(shape3, jnp.float32)
        ib0 = jnp.zeros(ishape, jnp.float32)

        def run_inner(n_steps):
            body = step_batched if batch > 1 else step_one
            return jax.lax.scan(body, (state, edep0, ib0, oflow), None,
                                length=n_steps // batch)[0]

        def run_chunk():
            if last_chunk == chunk:
                return run_inner(chunk)
            return jax.lax.cond(steps == chunk,
                                lambda: run_inner(chunk),
                                lambda: run_inner(last_chunk))

        # all-dead early exit (the CUDA break analog, chunk granularity)
        state2, edep32, ib32, of2 = jax.lax.cond(
            jnp.any(state.alive), run_chunk,
            lambda: (state, edep0, ib0, oflow))
        return state2, edep32, imaster + ib32, of2

    return chunk_fn


def _fingerprint(cfg: Config, segments, groups: int, backend: str) -> str:
    """Everything that shapes the iteration map and state layouts.

    ``cbet_max_iters`` and ``cbet_tol`` are normalized OUT: they only bound
    and stop the OUTER loop, never the per-iteration arithmetic — and this
    module's own non-convergence error instructs the user to raise
    cbet_max_iters and resume, which must not invalidate the checkpoint
    (a config-4-scale checkpoint costs hours to rebuild)."""
    from . import tileplan as tp
    from ..utils.checkpoint import config_fingerprint
    cfg_n = cfg.replace(cbet_max_iters=1, cbet_tol=0.0)
    return (f"cbet-{config_fingerprint(cfg_n)}-g{groups}-{backend}-"
            f"{tp.segments_fingerprint(segments)}")


def default_beam_groups(cfg: Config, backend: str) -> int:
    """Smallest divisor of nbeams whose full-resolution gain-row block
    stays under ~1 GiB — the term that decides whether config-4 CBET fits
    next to the trace's ~11 GiB (BASELINE.md HBM accounting)."""
    P = cfg.nx * cfg.ny * cfg.nz
    for g in range(1, cfg.nbeams + 1):
        if cfg.nbeams % g:
            continue
        if (cfg.nbeams // g) * P * 4 <= 2 ** 30:
            return g
    return cfg.nbeams


def cbet_solve_composed(cfg: Config, ctx: rt.TraceContext, *,
                        backend: str | None = None,
                        beam_groups: int | None = None,
                        cache_dir: str | None = None,
                        checkpoint_path: str | None = None,
                        resume: bool = False,
                        verbose: bool = True,
                        stop_after_iterations: int | None = None
                        ) -> CbetResult | None:
    """Resumable fixed-point CBET solve with host-dispatched chunked traces
    (see module docstring).  Plan liveness is GAIN-PROOF (measured at
    stop_fraction=0) unconditionally: at this scale a violated-headroom
    retry would cost hours, so the ~17% extra tile-step work is the right
    trade (Config.cbet_plan_headroom is ignored here, by design).

    ``checkpoint_path`` + ``resume``: the solve checkpoints the blended
    intensity after every fixed-point iteration; a resumed solve continues
    from the saved iteration with identical subsequent arithmetic.  On the
    CONVERGED iteration the checkpoint also carries the edep accumulator
    levels, so a resume that lands there rebuilds the result without
    re-tracing.

    ``stop_after_iterations`` (tests/drills): checkpoint and return
    ``None`` after that many iterations have executed in THIS invocation —
    the deterministic interruption the resume tests drive.

    Solver-knob scope: this path implements the LOOKUP gain model and the
    plain relaxed update only; configs requesting other modes are rejected
    loudly below rather than silently substituted.  ``cbet_seed_zero_gain``
    does not apply here — there is no already-paid plain trace to reuse, so
    iteration 0 (the zero-gain trace) always executes explicitly, which is
    the same trajectory the seeded monolithic solve takes."""
    from . import tileplan as tp
    from ..ops.pallas_deposit import finalize_edep
    from ..parallel.sharding import pad_rays, put_state
    from ..utils.checkpoint import (load_cbet_checkpoint,
                                    save_cbet_checkpoint)

    if cfg.cbet_gain_mode != "lookup":
        raise ValueError(
            f"cbet_solve_composed applies gain in the lookup model only; "
            f"cbet_gain_mode={cfg.cbet_gain_mode!r} would be silently "
            "substituted — set cbet_gain_mode='lookup' or use cbet_solve")
    if cfg.cbet_accel != "none":
        raise ValueError(
            f"cbet_solve_composed runs the plain relaxed iteration only; "
            f"cbet_accel={cfg.cbet_accel!r} is not supported here — use "
            "cbet_solve for accelerated mixing")
    if cfg.cbet_light_iterations:
        raise ValueError(
            "cbet_light_iterations is not supported by the composed path "
            "(every chunk's deposit feeds the pairwise edep master)")
    if cfg.cbet_gain_stride != 1:
        raise ValueError(
            f"cbet_solve_composed samples gain at every step (the exact "
            f"lookup model); cbet_gain_stride={cfg.cbet_gain_stride} is the "
            "monolithic solver's window-strided approximation — use "
            "cbet_solve")
    if backend is None:
        backend = rt.resolve_deposit_backend(cfg)
        if backend not in rt.PALLAS_BACKENDS:
            # non-TPU auto resolves to "scatter", but the composed chunk is
            # a Pallas-grid program: run the interpreted kernels (the same
            # fallback the CPU test mesh uses)
            backend = "pallas_interpret"
    nb = cfg.nbeams
    s = cfg.cbet_grid_downsample
    hx, hy, hz = cfg.cbet_grid_shape
    Ph = hx * hy * hz
    rpt = ctx.layout.rays_per_tile
    G = beam_groups or default_beam_groups(cfg, backend)
    if nb % G:
        raise ValueError(f"beam_groups={G} does not divide nbeams={nb}")
    nb_gl = nb // G

    # beam-contiguous block-padded state (the grouped kernels' layout
    # contract — same construction as the monolithic solver's)
    if ctx.compact:
        state_raw = ctx.state0
        tpg0 = (ctx.state0.n // rpt) // nb
    else:
        slots = live_tile_slots(cfg, ctx)
        state_raw = rt.select_rays(ctx.state0, slots)
        tpg0 = (len(slots) // rpt) // nb
    state0 = pad_rays(state_raw, nb * tpg0 * rpt)
    if not ctx.compact:
        state0 = put_state(state0)

    # gain-proof segmented plan (stop_fraction=0 liveness superset)
    plan_cfg = cfg.replace(stop_fraction=0.0)
    plan = tp.get_or_measure_plan(plan_cfg, ctx, state0, cache_dir,
                                  hosted=backend.startswith("pallas_hbm"))
    segments, seg_tpgs = tp.build_beam_segments(plan, cfg, cfg.nt, nb)
    origins, gathers = tp.split_beam_segments(segments, seg_tpgs, nb, G, rpt)
    chunk = plan.chunk_steps
    n_chunks = -(-cfg.nt // chunk)
    last_chunk = cfg.nt - (n_chunks - 1) * chunk
    fingerprint = _fingerprint(cfg, segments, G, backend)

    # one jitted chunk program per segment, SHARED by all groups (uniform
    # per-beam widths make every group the same shapes)
    chunk_fns = [jax.jit(make_cbet_chunk_fn(cfg, rpt, backend, nb_gl, w,
                                            chunk, last_chunk),
                         donate_argnums=(2, 3))
                 for w in seg_tpgs]
    add = jax.jit(lambda a, b: a + b, donate_argnums=(0, 1))
    # group-row slice of the (full-slot) state: groups are contiguous row
    # blocks of the beam-contiguous layout
    rows_gl0 = nb_gl * seg_tpgs[0] * rpt

    @jax.jit
    def slice_group(st, g):
        return jax.tree_util.tree_map(
            lambda a: jax.lax.dynamic_slice_in_dim(a, g * rows_gl0,
                                                   rows_gl0), st)

    # per-segment gather jit (pos/valid ride as arguments — one program per
    # transition, shared by all groups)
    def make_gather(si):
        t_prev = nb_gl * seg_tpgs[si - 1]

        def gath(st, pos, val):
            st = jax.tree_util.tree_map(
                lambda a: a.reshape(t_prev, rpt)[pos].reshape(-1), st)
            return dataclasses.replace(st, alive=st.alive & val)

        return jax.jit(gath)

    gather_fns = [None] + [make_gather(si) for si in range(1, len(segments))]
    wb = jax.jit(lambda uf, af, u, a, ix: (
        uf.at[ix].set(u, mode="drop"), af.at[ix].set(a, mode="drop")),
        donate_argnums=(0, 1))
    _, efinalize = rt.trace_shapes(cfg, backend)

    gain_fn = make_gain_fn(cfg, ctx)
    upsample = make_gain_upsampler(cfg) if s > 1 else (lambda g: g)

    @jax.jit
    def crop_intensity(ib):          # grouped zpad grids -> (nb_gl, Ph)
        ibf = finalize_edep(ib, hy, hz)
        return ibf[:, 1:-1, 1:-1, 1:hz + 1].reshape(nb_gl, Ph)

    from ..ops.pallas_deposit import edep_zpad_shape
    izshape = (nb_gl,) + edep_zpad_shape(hx, hy, hz)
    # one cached copy program (a fresh jax.jit(lambda ...) per call would
    # recompile every group x iteration); state0 is never donated, but each
    # group's uray/alive ride through donating chunk fns, so the write-back
    # targets must be copies
    copy_arr = jax.jit(lambda a: a.copy())

    def run_iteration(gain_h):
        """One full gain-coupled trace over all groups: returns
        (intensity (B, Ph) device, edep_levels dict, accounting).  The
        accounting is per-group DEVICE arrays — fetched only once, after
        the fixed point settles (at config-4 scale a per-iteration fetch
        of the full uray would cost ~10 s of tunnel D2H per iteration)."""
        acc = PairwiseAccumulator(add)
        inten_rows = []
        oflow_total = 0
        dropped_total = 0
        uray_parts: list = []
        alive_parts: list = []
        for g in range(G):
            gain_rows = upsample(
                jax.lax.dynamic_slice_in_dim(gain_h, g * nb_gl, nb_gl)
            ).astype(jnp.dtype(cfg.dtype))
            state = slice_group(state0, jnp.int32(g))
            imaster = jnp.zeros(izshape, jnp.float32)
            oflow = jnp.int32(0)
            uray_full = copy_arr(state.uray)
            alive_full = copy_arr(state.alive)
            for si, seg in enumerate(segments):
                if si > 0:
                    uray_full, alive_full = wb(
                        uray_full, alive_full, state.uray, state.alive,
                        jnp.asarray(origins[si - 1][g]))
                    alive_before = int(jax.device_get(
                        jnp.sum(state.alive.astype(jnp.int32))))
                    pos, val = gathers[si - 1]
                    state = gather_fns[si](state, jnp.asarray(pos[g]),
                                           jnp.asarray(val[g]))
                    alive_after = int(jax.device_get(
                        jnp.sum(state.alive.astype(jnp.int32))))
                    dropped_total += alive_before - alive_after
                for steps in seg.chunk_lengths:
                    state, edelta, imaster, oflow = chunk_fns[si](
                        ctx.field4, gain_rows, state, imaster, oflow,
                        jnp.int32(steps))
                    acc.push(edelta)
                    jax.device_get(oflow)          # chunked-dispatch fence
            uray_full, alive_full = wb(uray_full, alive_full, state.uray,
                                       state.alive,
                                       jnp.asarray(origins[-1][g]))
            oflow_total += int(jax.device_get(oflow))
            inten_rows.append(crop_intensity(imaster))
            uray_parts.append(uray_full)
            alive_parts.append(alive_full)
        if dropped_total:
            raise RuntimeError(
                f"composed CBET trace dropped {dropped_total} still-alive "
                "rays on a gain-proof plan — stale plan cache; clear "
                f"{cache_dir!r}")
        rt.check_overflow(oflow_total, cfg)
        intensity = jnp.concatenate(inten_rows, axis=0)      # (B, Ph) f32
        return intensity, acc.levels, (uray_parts, alive_parts)

    def fold_edep(levels):
        master = PairwiseAccumulator(add, levels=levels).fold()
        return np.asarray(jax.device_get(efinalize(master)), np.float64)

    # ---- fixed point -----------------------------------------------------
    history: list = []
    start_it = 0
    intensity = None
    levels = acct = None
    if resume:
        if not checkpoint_path:
            raise ValueError("resume requires checkpoint_path")
        start_it, inten_saved, history, levels_saved = load_cbet_checkpoint(
            checkpoint_path, fingerprint)
        intensity = inten_saved
        if verbose:
            print(f"cbet composed: resumed after iteration {start_it}",
                  file=sys.stderr)

    zero_gain = jnp.zeros((nb, Ph), jnp.float32)
    converged = False
    it = start_it
    executed = 0
    t_all0 = time.perf_counter()
    iter_seconds = []
    if intensity is None:             # fresh run (a resume at iteration 0
        t0 = time.perf_counter()      # reuses the checkpointed intensity)
        intensity, levels, acct = run_iteration(zero_gain)
        iter_seconds.append(round(time.perf_counter() - t0, 3))
        executed += 1
        if verbose:
            print(f"cbet composed iter 0 (zero gain): "
                  f"{iter_seconds[-1]:.1f}s", file=sys.stderr)
        if checkpoint_path:
            save_cbet_checkpoint(checkpoint_path, fingerprint, 0, intensity,
                                 history)
        if stop_after_iterations and executed >= stop_after_iterations:
            return None
    elif resume and levels_saved is not None:
        # resume landed on the converged iteration: result restorable
        # without re-tracing (acct is not in the checkpoint, so the final
        # accounting below re-derives only cheap host stats)
        converged = True
        levels = levels_saved

    while not converged and it < cfg.cbet_max_iters:
        it += 1
        t0 = time.perf_counter()
        gain_h = gain_fn(intensity.astype(jnp.float32))
        acct = None          # release the prior iteration's device parts
        i_new, levels, acct = run_iteration(gain_h)
        d_dev, s_dev, blended = _step_update(i_new, intensity,
                                             float(cfg.cbet_relax))
        delta = float(d_dev) / max(float(s_dev), 1e-300)
        history.append(delta)
        iter_seconds.append(round(time.perf_counter() - t0, 3))
        if verbose:
            print(f"cbet composed iter {it}: rel delta {delta:.3e} "
                  f"[{iter_seconds[-1]:.1f}s]", file=sys.stderr)
        if delta < cfg.cbet_tol:
            intensity = i_new
            converged = True
            if checkpoint_path:
                save_cbet_checkpoint(checkpoint_path, fingerprint, it,
                                     intensity, history, edep_levels=levels)
            break
        intensity = blended
        executed += 1
        if checkpoint_path:
            save_cbet_checkpoint(checkpoint_path, fingerprint, it, intensity,
                                 history)
        if stop_after_iterations and executed >= stop_after_iterations:
            return None

    if levels is None:
        # resumed past max_iters without convergence: the last iteration's
        # edep is not in an iteration checkpoint (only the CONVERGED one
        # carries levels) and cannot be reconstructed without re-tracing
        raise RuntimeError(
            f"resumed at iteration {start_it} >= cbet_max_iters="
            f"{cfg.cbet_max_iters} without convergence — raise "
            "cbet_max_iters to continue the fixed point")
    edep = fold_edep(levels)
    inten_h = np.asarray(jax.device_get(intensity), np.float64).reshape(
        nb, hx, hy, hz)
    stats: dict[str, Any] = {
        "intensity_mode": "grouped_composed",
        "gain_mode": "lookup",
        "segmented": True,
        "beam_groups": G,
        "edep_total": float(edep.sum()),
        "iter_seconds": iter_seconds,
        "wall_seconds": round(time.perf_counter() - t_all0, 1),
        "segments": len(segments),
        "chunks_per_iteration": int(n_chunks * G),
    }
    if acct is not None:
        # the single accounting fetch of the run (see run_iteration)
        uray_parts, alive_parts = acct
        uray_out = np.concatenate([
            np.asarray(jax.device_get(u), np.float64) for u in uray_parts])
        alive_out = np.concatenate([
            np.asarray(jax.device_get(a)) for a in alive_parts])
        uray_init_h = np.asarray(jax.device_get(state0.uray_init),
                                 np.float64)
        alive0_h = np.asarray(jax.device_get(state0.alive))
        launched = int(alive0_h.sum())
        stats.update({
            "rays_launched": launched,
            "rays_alive_at_end": int(alive_out.sum()),
            "rays_terminated": launched - int(alive_out.sum()),
            "energy_launched": float(uray_init_h[alive0_h].sum()),
            # NOTE: with CBET gain, edep_total != energy_absorbed by the
            # net pairwise transfer; both are reported for the caller's
            # conservation accounting
            "energy_absorbed": float(
                (uray_init_h - uray_out)[alive0_h].sum()),
        })
    return CbetResult(edep=edep, intensity=inten_h, iterations=it,
                      converged=converged, history=history, stats=stats)
