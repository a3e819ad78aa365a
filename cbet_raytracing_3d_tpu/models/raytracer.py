"""The TPU-native ray-trace integrator.

Replaces the reference's one-CUDA-thread-per-ray time loop
(``launch_ray_XZ.cu:117-359``) with a batched functional design:

* all rays of all beams form one flat batch axis (vmap-free — written batched),
* the 400-step time loop is a ``lax.scan`` in chunks,
* the 8 per-step radial interpolations become 2 gathers from precomputed node
  fields (see ``fields.py``),
* deposition is a vectorized scatter-add (see ``ops/deposit.py``),
* early ray termination (the CUDA ``break``, launch_ray_XZ.cu:351-356) becomes
  an ``alive`` mask with frozen state.

Numerics: positions are carried *cell-relative* in grid units
(``cell + frac`` with ``frac = (pos - min)/d - cell``) so that float32
rounding error is ~1e-7 of a cell per step instead of ~1e-5 when carrying
absolute coordinates; per-step deposits accumulate into a float32
grid for ``chunk_steps`` steps, then promote into a float64 master grid,
bounding summation error far below the 1e-4 accuracy bar (BASELINE.md).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants as k
from ..beams import RayInit, init_rays, load_beam_norms, power_table
from ..config import Config
from ..fields import Fields, build_fields
from ..ops.deposit import corner_indices_weights, deposit
from ..profiles import RadialProfiles, load_profiles


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class RayState:
    """Per-ray integrator state, all shape (N, ...).

    Positions are stored cell-relative (``cell`` + ``frac``) so float32
    rounding stays at the scale of one cell (~1e-7) rather than of the whole
    grid (~1e-5) — see the module docstring."""

    frac: jnp.ndarray     # (N, 3) position relative to the cell node, grid units
    vel: jnp.ndarray      # (N, 3) displacement per step, grid units
    uray: jnp.ndarray     # (N,) ray energy
    uray_init: jnp.ndarray  # (N,) launch energy (for the 5% stop rule)
    cell: jnp.ndarray     # (N, 3) int32 current cell
    alive: jnp.ndarray    # (N,) bool — still stepping


def initial_cell(cfg: Config, t: np.ndarray) -> np.ndarray:
    """Closed form of the reference's linear first-match cell scan
    (launch_ray_XZ.cu:162-183): the smallest node index within
    ``0.5001`` cells of the position; 0 if none matches."""
    n = np.array([cfg.nx, cfg.ny, cfg.nz])
    tol = cfg.cell_tol
    # first integer in [t - tol, t + tol] is ceil(t - tol); the +1 candidate
    # covers the float-rounding case where ceil lands one below the window
    c0 = np.ceil(t - tol).astype(np.int64)
    out = np.zeros_like(c0)
    for cand in (c0 + 1, c0):           # later write (c0) wins: first match
        ok = (cand >= 0) & (cand <= n - 1) & (np.abs(cand - t) <= tol)
        out = np.where(ok, cand, out)
    return out.astype(np.int32)


@dataclasses.dataclass(frozen=True)
class TraceContext:
    """Everything needed to run a trace: static config + device-ready arrays."""

    cfg: Config
    prof: RadialProfiles
    beam_norm: np.ndarray        # (nbeams, 3) float64
    fields: Fields               # float64 node fields
    rays: RayInit                # float64 launch state (nbeams, nrays, ...)
    field4: jnp.ndarray          # (nx*ny*nz, 4) compute dtype: grad kicks + absorb
    state0: RayState             # flattened (nbeams*nrays,) initial state
    beam_id: np.ndarray          # (N,) int32 beam of each ray


def prepare(cfg: Config, prof: RadialProfiles | None = None,
            beam_norm: np.ndarray | None = None) -> TraceContext:
    """Host-side setup ("Init" phase): profiles, fields, rays, initial state."""
    if prof is None:
        prof = load_profiles(nr=cfg.nr)
    if beam_norm is None:
        beam_norm = load_beam_norms(nbeams=cfg.nbeams)
    fields = build_fields(cfg, prof)
    pow_r = power_table(cfg)
    rays = init_rays(cfg, beam_norm, pow_r)

    dtype = jnp.dtype(cfg.dtype)
    d = np.array([cfg.dx, cfg.dy, cfg.dz])
    origin = np.array([cfg.xmin, cfg.ymin, cfg.zmin])

    # Pack the hot fields: per-axis displacement kick per step (already in
    # grid units: fgrad [cm/s] * dt / d) and the absorption coefficient.
    kick = fields.fgrad * cfg.dt / d          # (nx,ny,nz,3)
    field4 = np.concatenate([kick, fields.absorb[..., None]], axis=-1)
    field4 = jnp.asarray(field4.reshape(-1, 4), dtype=dtype)

    # --- initial ray state (float64 on host, cast once) ---
    nbm, nr_ = cfg.nbeams, cfg.nrays
    pos = rays.pos.reshape(-1, 3)                     # (N,3) absolute cm
    t0 = (pos - origin) / d                           # grid units
    cell0 = initial_cell(cfg, t0)

    # dispersion relation at the launch cell node (launch_ray_XZ.cu:186-204)
    flat0 = (cell0[:, 0] * cfg.ny + cell0[:, 1]) * cfg.nz + cell0[:, 2]
    wsq = fields.wsq_term.reshape(-1)[flat0]
    w = np.sqrt((k.OMEGA ** 2 - wsq) / k.C_CMS ** 2)
    bn = beam_norm / np.linalg.norm(beam_norm, axis=1, keepdims=True)
    beam_id = np.repeat(np.arange(nbm, dtype=np.int32), nr_)
    v = -(k.C_CMS ** 2) * bn[beam_id] * (w / k.OMEGA)[:, None]   # cm/s
    vel0 = v * cfg.dt / d                                        # grid units/step

    state0 = RayState(
        frac=jnp.asarray(t0 - cell0, dtype),
        vel=jnp.asarray(vel0, dtype),
        uray=jnp.asarray(rays.uray.reshape(-1), dtype),
        uray_init=jnp.asarray(rays.uray.reshape(-1), dtype),
        cell=jnp.asarray(cell0, jnp.int32),
        alive=jnp.asarray(rays.mask.reshape(-1)),
    )
    return TraceContext(cfg=cfg, prof=prof, beam_norm=beam_norm, fields=fields,
                        rays=rays, field4=field4, state0=state0, beam_id=beam_id)


def select_rays(state: RayState, indices: np.ndarray) -> RayState:
    """Subset the ray batch (tests, diagnostics, incremental runs)."""
    idx = jnp.asarray(indices)
    return RayState(
        frac=state.frac[idx], vel=state.vel[idx], uray=state.uray[idx],
        uray_init=state.uray_init[idx], cell=state.cell[idx],
        alive=state.alive[idx],
    )


def _reindex_axis(cell, frac, n: int, tol: float):
    """Countdown cell re-index (launch_ray_XZ.cu:282-292): of the candidates
    {cell-1, cell, cell+1} clipped to [0, n-1], the *smallest* within ``tol``
    of the position wins (the countdown loop's last write); else unchanged.

    Operates cell-relative: candidate offset d matches iff ``|d - frac| < tol``.
    Returns the chosen offset (int32 in {-1, 0, +1}).  No-match leaves the
    cell unchanged, which coincides with offset 0."""
    dsel = jnp.zeros_like(cell)
    for dlt in (1, 0, -1):
        ok = jnp.abs(jnp.asarray(dlt, frac.dtype) - frac) < tol
        if dlt == 1:
            ok &= cell + 1 <= n - 1
        elif dlt == -1:
            ok &= cell - 1 >= 0
        dsel = jnp.where(ok, jnp.full_like(cell, dlt), dsel)
    return dsel


def make_step_fn(cfg: Config):
    """Build the pure per-step function  (state, edep_flat) -> (state, edep_flat).

    Transcribes one iteration of the reference time loop
    (launch_ray_XZ.cu:207-357) over the whole ray batch."""
    nx, ny, nz = cfg.nx, cfg.ny, cfg.nz
    tol = cfg.cell_tol
    stop_frac = cfg.stop_fraction
    absorption = cfg.absorption
    nvec = (nx, ny, nz)

    def step(state: RayState, edep_flat: jnp.ndarray, field4: jnp.ndarray):
        dtype = state.frac.dtype
        flat = (state.cell[:, 0] * ny + state.cell[:, 1]) * nz + state.cell[:, 2]
        g = field4[flat]                                  # (N,4) gather

        vel = state.vel - g[:, :3]                        # gradient kick
        frac = state.frac + vel                           # position update (grid units)

        dsel = jnp.stack(
            [_reindex_axis(state.cell[:, i], frac[:, i], nvec[i], tol) for i in range(3)],
            axis=1,
        )
        cell = state.cell + dsel
        frac = frac - dsel.astype(dtype)

        # absorption at the *new* cell's node (launch_ray_XZ.cu:296-311)
        flat2 = (cell[:, 0] * ny + cell[:, 1]) * nz + cell[:, 2]
        coeff = field4[flat2, 3]
        if absorption:
            increment = coeff * state.uray
            uray = state.uray - increment
        else:
            increment = state.uray
            uray = state.uray

        idx8, w8 = corner_indices_weights(cell, frac, nvec)
        inc_masked = jnp.where(state.alive, increment, jnp.asarray(0, dtype))
        edep_flat = deposit(edep_flat, idx8, w8, inc_masked)

        # termination (launch_ray_XZ.cu:351-356); box bound in grid units is
        # +-0.5 cells beyond the node extent
        t = cell.astype(dtype) + frac                     # global grid coords
        out = ((t[:, 0] < -0.5) | (t[:, 0] > nx - 0.5)
               | (t[:, 1] < -0.5) | (t[:, 1] > ny - 0.5)
               | (t[:, 2] < -0.5) | (t[:, 2] > nz - 0.5))
        dead = (uray <= stop_frac * state.uray_init) | out
        alive = state.alive & jnp.logical_not(dead)

        # freeze dead rays
        keep = state.alive
        k3 = keep[:, None]
        new_state = RayState(
            frac=jnp.where(k3, frac, state.frac),
            vel=jnp.where(k3, vel, state.vel),
            uray=jnp.where(keep, uray, state.uray),
            uray_init=state.uray_init,
            cell=jnp.where(k3, cell, state.cell),
            alive=alive,
        )
        return new_state, edep_flat

    return step


def make_trace_fn(cfg: Config):
    """Build the jittable full-trace function
    ``(field4, state0) -> (edep_padded, final_state)``.

    Runs ``nt`` steps as an outer scan over chunks of ``chunk_steps``; each
    chunk accumulates deposits in the compute dtype and promotes into an
    ``edep_dtype`` master grid between chunks (summation-error control)."""
    step = make_step_fn(cfg)
    n_padded = (cfg.nx + 2) * (cfg.ny + 2) * (cfg.nz + 2)
    chunk = max(1, min(cfg.chunk_steps, cfg.nt))
    n_chunks = -(-cfg.nt // chunk)          # ceil
    last_chunk = cfg.nt - (n_chunks - 1) * chunk

    def trace(field4: jnp.ndarray, state0: RayState):
        compute_dtype = state0.frac.dtype
        master = jnp.zeros((n_padded,), jnp.dtype(cfg.edep_dtype))

        def chunk_body(carry, steps_in_chunk):
            state, master = carry

            def inner(carry2, _):
                state2, edep32 = carry2
                state2, edep32 = step(state2, edep32, field4)
                return (state2, edep32), None

            edep32 = jnp.zeros((n_padded,), compute_dtype)

            def run_inner(n_steps):
                return jax.lax.scan(inner, (state, edep32), None, length=n_steps)[0]

            if last_chunk == chunk:
                state, edep32 = run_inner(chunk)
            else:
                # all chunks are `chunk` long except the final short one
                state, edep32 = jax.lax.cond(
                    steps_in_chunk == chunk,
                    lambda s_e: run_inner(chunk),
                    lambda s_e: run_inner(last_chunk),
                    (state, edep32),
                )
            master = master + edep32.astype(master.dtype)
            return (state, master), None

        steps_per_chunk = jnp.asarray(
            [chunk] * (n_chunks - 1) + [last_chunk], jnp.int32)
        (state, master), _ = jax.lax.scan(
            chunk_body, (state0, master), steps_per_chunk)
        edep = master.reshape(cfg.nx + 2, cfg.ny + 2, cfg.nz + 2)
        return edep, state

    return trace


def trace(ctx: TraceContext):
    """Convenience single-device full trace.  Returns (edep [np.f64 padded],
    final RayState)."""
    fn = jax.jit(make_trace_fn(ctx.cfg))
    edep, state = fn(ctx.field4, ctx.state0)
    return np.asarray(jax.device_get(edep), dtype=np.float64), state


def trace_stats(ctx: TraceContext, state: RayState) -> dict[str, Any]:
    """Run metrics the reference lacks (SURVEY.md §5.5): launch/termination
    accounting and energy bookkeeping."""
    launched = int(np.sum(ctx.rays.mask))
    alive_end = int(jnp.sum(state.alive))
    uray = np.asarray(state.uray, np.float64)
    uinit = np.asarray(state.uray_init, np.float64)
    mask = np.asarray(ctx.rays.mask.reshape(-1))
    absorbed = float(np.sum((uinit - uray)[mask]))
    return {
        "rays_total": int(ctx.cfg.total_rays),
        "rays_launched": launched,
        "rays_alive_at_end": alive_end,
        "rays_terminated": launched - alive_end,
        "energy_launched": float(np.sum(uinit[mask])),
        "energy_absorbed": absorbed,
    }
