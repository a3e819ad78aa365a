"""Cross-beam energy transfer (CBET) — the stage the reference scaffolds but
does not implement (def.cuh:94-114: ``constant1``, ``iaw``, ``cs``, ``mach``,
``numstored``/``ncrossings`` capacities; SURVEY.md §2.15).

Model (standard ray-based CBET, honoring the reference's constants contract):

* Each beam ``b`` carries a node intensity field ``I_b`` built from its rays'
  per-step deposits of ``uray * |v| / c`` — the discrete analog of the
  per-cell crossing records the reference reserves capacity for
  (``numstored``, def.cuh:94).  The |v|/c weight converts the bookkeeping sum
  (which over-counts each cell by the ~c/(|v|*courant) steps a ray spends in
  it) into the local beam intensity in W/cm^2: a full-power beam crossing a
  cell yields I ~ ``intensity`` (1e14), growing toward the focus as the
  spherical geometry converges — the scale at which ``constant1`` gives
  physical gains of order 0.1-1 over the path.
* Between two beams with unit propagation directions k̂_b, k̂_b' (equal
  frequencies — all OMEGA beams are 3ω), the ion-acoustic resonance parameter
  at a cell with radial flow û = r̂ is

      eta = -((k̂_b' - k̂_b) · û) * machnum * cs / (|k̂_b' - k̂_b| cs)
          = -machnum * (unit(k̂_b' - k̂_b) · r̂)

  (def.cuh:99 ``mach = -sqrt(2)`` is "the Mach number for max resonance":
  |unit(Δk̂)·r̂| <= 1 and two beams at 90° give |Δk̂|=sqrt(2), so eta reaches
  1 exactly at resonance).
* The resonance response ``P(eta) = iaw^2 eta / ((eta^2-1)^2 + iaw^2 eta^2)``
  (odd in eta: pairwise exchange is antisymmetric), and the per-length gain
  on a ray of beam b:

      g_b(cell) = constant1 * (ne/ncrit)/sqrt(1-ne/ncrit)
                  * sum_{b'} P(eta_{b,b'}) * I_b'(cell)

  with ``constant1`` exactly def.cuh:111.  Ray energies update per step as
  ``uray *= exp(g_b * ds)`` with path element ``ds = |v| dt``.
* Fixed point: trace -> intensity fields -> gains -> retrace, with
  under-relaxation of the intensity update, until the relative field change
  drops below ``cbet_tol`` (a batched fixed-point iteration over beams, not
  the reference's absent serial loop).

Recompute-over-store: each iteration re-traces rays instead of storing
``ncrossings``-bounded per-ray crossing lists — the TPU-native tradeoff
(trajectories are cheap to recompute, HBM is better spent on fields).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants as k
from ..config import Config
from . import raytracer as rt

# Stability clamp on the per-step gain exponent (only engages at transient
# resonance hotspots during early fixed-point iterations; physical per-step
# gains are O(1e-3..3e-2)).  THE single value for all three gain paths —
# the lookup-mode apply_gain, the XLA window branch, and the Pallas
# gain-window kernel — which must stay identical or the modes silently
# compute different models and break their rel-L2 cross-validation.
GAIN_CLIP = 0.1


class DroppedAliveRaysError(RuntimeError):
    """The segmented CBET trace's compaction dropped a still-alive ray.

    At ``cbet_plan_headroom > 0`` this means the headroom's liveness
    assumption was violated (a ray was amplified past its planned-death
    threshold) — ``cbet_solve`` catches exactly this type and retries with
    a gain-proof (headroom-0) plan.  At headroom 0 it means a stale plan
    cache and propagates.  A dedicated type, not a message match: generic
    RuntimeErrors from the runtime (device/tunnel failures) must never
    trigger the expensive re-plan-and-re-solve path."""


@dataclasses.dataclass
class CbetResult:
    edep: np.ndarray          # ghost-padded deposition with CBET-coupled rays
                              # (always full-resolution)
    intensity: np.ndarray     # (nbeams, *cfg.cbet_grid_shape) final node
                              # intensity fields (coarsened when
                              # cbet_grid_downsample > 1)
    iterations: int
    converged: bool
    history: list             # per-iteration relative field change
    stats: dict[str, Any]


def pair_couplings(beam_norm: np.ndarray, machnum: float) -> np.ndarray:
    """Per-beam-pair unit difference vectors scaled for eta:
    ``eta[b,b',cell] = pair_u[b,b'] . r_hat(cell)``; zero on the diagonal so
    self-coupling vanishes through P(0)=0."""
    khat = -beam_norm / np.linalg.norm(beam_norm, axis=1, keepdims=True)
    dk = khat[None, :, :] - khat[:, None, :]           # (B, B, 3)
    norm = np.linalg.norm(dk, axis=-1, keepdims=True)
    unit = np.where(norm > 1e-12, dk / np.where(norm == 0, 1, norm), 0.0)
    return -machnum * unit                             # (B, B, 3)


# intensity (W/cm^2) -> squared-field CGS units entering the CGS gain
# prefactor constant1 (def.cuh:111): I[W/cm^2] * 1e7 -> erg/s/cm^2, * 8pi/c
# -> statvolt^2/cm^2
I_TO_FIELD_SQ = 8.0 * np.pi * 1.0e7 / k.C_CMS


def gain_prefactor_field(cfg: Config, fields) -> np.ndarray:
    """A(cell) = constant1 * (ne/ncrit)/sqrt(1-ne/ncrit) * (8pi 1e7/c).

    ne/ncrit is capped at 0.95: the 1/sqrt(1-ne/nc) ion-acoustic response
    diverges at the critical surface where the ray model breaks down anyway
    (rays turn and absorb before nc); the cap keeps hotspot gains finite."""
    frac = np.clip(fields.eden / k.NCRIT, 0.0, 0.95)
    return k.CONSTANT1 * I_TO_FIELD_SQ * frac / np.sqrt(1.0 - frac)


def resonance(eta: jnp.ndarray, iaw: float = k.IAW) -> jnp.ndarray:
    e2 = eta * eta
    return (iaw * iaw) * eta / ((e2 - 1.0) ** 2 + (iaw * iaw) * e2)


def make_gain_fn(cfg: Config, ctx: rt.TraceContext,
                 backend: str | None = None):
    """Jitted ``I (B, P) -> G (B, P)`` on the (possibly coarsened, see
    Config.cbet_grid_downsample) unpadded CBET node grid.

    The reduction must never materialize its (B, B, P) intermediate (14 GB
    at OMEGA scale); the Pallas kernel (ops/pallas_gain.py) guarantees
    VMEM-blocked evaluation — 46 ms/call at OMEGA scale (measured
    scalar-fenced; see the kernel docstring for the transfer-artifact
    caveat on earlier numbers).  ``backend``: "pallas" (TPU),
    "pallas_interpret" (kernel on CPU, tests), "xla" (plain reduce — the
    reference semantics oracle-checkable on CPU); None resolves by
    platform."""
    s = cfg.cbet_grid_downsample
    ph = cfg.cbet_grid_shape
    P = ph[0] * ph[1] * ph[2]
    rhat = _node_rhat(cfg, s)                           # (3, P) f32
    pre = gain_prefactor_field(cfg, ctx.fields)[::s, ::s, ::s].reshape(-1)
    pair_u = pair_couplings(ctx.beam_norm, cfg.machnum)  # (B, B, 3)
    B = cfg.nbeams

    pair_j = jnp.asarray(pair_u, jnp.float32)
    if backend is None:
        backend = "xla" if jax.default_backend() == "cpu" else "pallas"

    if backend.startswith("pallas"):
        from ..ops.pallas_gain import make_gain_kernel
        rp = np.concatenate([rhat, pre[None, :]], axis=0).astype(np.float32)
        rp_j = jnp.asarray(rp)                          # (4, P)
        kfn = make_gain_kernel(B, P, k.IAW,
                               interpret=backend == "pallas_interpret")

        @jax.jit
        def gain(intensity):                            # (B, P)
            return kfn(pair_j, rp_j, intensity)

        return gain

    rhat_j = jnp.asarray(rhat, jnp.float32)
    pre_j = jnp.asarray(pre, jnp.float32)

    def gain(intensity):                                # (B, P)
        # accumulate partner beams in (B, P): a (B, B, P) broadcast-then-
        # reduce would rely on XLA fusing a ~14 GB intermediate away at
        # OMEGA scale, and a whole-array materialization was observed in at
        # least one formulation (ops/pallas_gain.py docstring).  This is the
        # oracle-semantics path — it must be safe at any size on any
        # backend, not fast.
        def body(bp, acc):
            eta = (jax.lax.dynamic_slice_in_dim(pair_j[:, :, 0], bp, 1, 1)
                   * rhat_j[0][None, :]
                   + jax.lax.dynamic_slice_in_dim(pair_j[:, :, 1], bp, 1, 1)
                   * rhat_j[1][None, :]
                   + jax.lax.dynamic_slice_in_dim(pair_j[:, :, 2], bp, 1, 1)
                   * rhat_j[2][None, :])                 # (B, P)
            ib = jax.lax.dynamic_slice_in_dim(intensity, bp, 1, 0)  # (1, P)
            return acc + resonance(eta) * ib

        g = jax.lax.fori_loop(0, B, body, jnp.zeros_like(intensity))
        return g * pre_j[None, :]

    return jax.jit(gain)


def _make_sharded_gain_fn(cfg: Config, ctx: rt.TraceContext, mesh,
                          nb_pad: int, n_local: int,
                          backend: str | None = None):
    """Beam-sharded gain reduction (Config.cbet_gain_sharded): jitted
    ``I (nb_pad, Ph) beam-sharded -> G (nb_pad, Ph) beam-sharded``.

    Each shard all-gathers the intensity once over ICI (the gain coupling
    is all-to-all over beams) and computes ONLY its own ``n_local`` beams'
    gain rows — 1/D of the reduction per chip, and the (B, P) gain table
    never exists replicated.  Per-row arithmetic is identical to the
    replicated forms (same partner order, same f32 ops; phantom padding
    beams carry zero pair couplings and zero intensity, contributing exact
    zeros), so results are bit-equal to the replicated solve's.

    ``backend``: "pallas" (TPU row-restricted kernel), anything else (CPU
    default) uses the XLA fori-loop form — the same arithmetic as
    make_gain_fn's "xla" path, restricted to the shard's output rows."""
    from ..parallel.sharding import AXIS
    from jax.sharding import PartitionSpec as Pspec
    s = cfg.cbet_grid_downsample
    ph = cfg.cbet_grid_shape
    Ph = ph[0] * ph[1] * ph[2]
    rhat = _node_rhat(cfg, s)                            # (3, Ph)
    pre = gain_prefactor_field(cfg, ctx.fields)[::s, ::s, ::s].reshape(-1)
    # pair couplings padded to the phantom-inclusive beam axis: zero rows/
    # cols give eta = 0 -> R(0) = 0 exactly (and phantom intensity rows
    # are zero anyway)
    pu = np.zeros((nb_pad, nb_pad, 3), np.float32)
    pu[:cfg.nbeams, :cfg.nbeams] = pair_couplings(ctx.beam_norm, cfg.machnum)
    pair_j = jnp.asarray(pu)
    if backend is None:
        backend = "xla" if jax.default_backend() == "cpu" else "pallas"

    if backend.startswith("pallas"):
        from ..ops.pallas_gain import make_gain_kernel
        rp = np.concatenate([rhat, pre[None, :]], axis=0).astype(np.float32)
        rp_j = jnp.asarray(rp)
        kfn = make_gain_kernel(nb_pad, Ph, k.IAW, b_out=n_local,
                               interpret=backend == "pallas_interpret")

        def local_gain(ii):                              # (n_local, Ph)
            full = jax.lax.all_gather(ii, AXIS, axis=0, tiled=True)
            b0 = jax.lax.axis_index(AXIS) * n_local
            pu_l = jax.lax.dynamic_slice_in_dim(pair_j, b0, n_local, 0)
            return kfn(pu_l, rp_j, full)
    else:
        rhat_j = jnp.asarray(rhat, jnp.float32)
        pre_j = jnp.asarray(pre, jnp.float32)

        def local_gain(ii):                              # (n_local, Ph)
            full = jax.lax.all_gather(ii, AXIS, axis=0, tiled=True)
            b0 = jax.lax.axis_index(AXIS) * n_local
            pu_l = jax.lax.dynamic_slice_in_dim(pair_j, b0, n_local, 0)

            def body(bp, acc):
                eta = (jax.lax.dynamic_slice_in_dim(pu_l[:, :, 0], bp, 1, 1)
                       * rhat_j[0][None, :]
                       + jax.lax.dynamic_slice_in_dim(pu_l[:, :, 1], bp, 1, 1)
                       * rhat_j[1][None, :]
                       + jax.lax.dynamic_slice_in_dim(pu_l[:, :, 2], bp, 1, 1)
                       * rhat_j[2][None, :])             # (n_local, Ph)
                ib = jax.lax.dynamic_slice_in_dim(full, bp, 1, 0)  # (1, Ph)
                return acc + resonance(eta) * ib

            g = jax.lax.fori_loop(0, nb_pad, body,
                                  jnp.zeros((n_local, Ph), jnp.float32))
            return g * pre_j[None, :]

    return jax.jit(jax.shard_map(
        local_gain, mesh=mesh, in_specs=Pspec(AXIS), out_specs=Pspec(AXIS),
        check_vma=False))


def _node_rhat(cfg: Config, s: int = 1) -> np.ndarray:
    """Unit radial vectors at the CBET-grid nodes (full-grid indices
    0, s, 2s, ...)."""
    x = np.arange(0, cfg.nx, s) * cfg.dx + cfg.xmin
    y = np.arange(0, cfg.ny, s) * cfg.dy + cfg.ymin
    z = np.arange(0, cfg.nz, s) * cfg.dz + cfg.zmin
    gx, gy, gz = np.meshgrid(x, y, z, indexing="ij")
    r = np.sqrt(gx ** 2 + gy ** 2 + gz ** 2)
    r = np.where(r > 1e-12, r, 1.0)
    return np.stack([(gx / r).reshape(-1), (gy / r).reshape(-1),
                     (gz / r).reshape(-1)])


def _interp_matrix(n_full: int, nh: int, s: int) -> np.ndarray:
    """(n_full, nh) linear-interpolation matrix from coarse nodes (full
    indices 0, s, 2s, ...), clamped at the upper edge.  Two nonzeros per
    row, used as a dense MXU matmul operand."""
    t = np.arange(n_full) / s
    lo = np.minimum(np.floor(t).astype(int), nh - 1)
    hi = np.minimum(lo + 1, nh - 1)
    w = t - lo
    m = np.zeros((n_full, nh), np.float32)
    m[np.arange(n_full), lo] += 1.0 - w
    m[np.arange(n_full), hi] += w
    return m


def make_gain_upsampler(cfg: Config):
    """Jitted trilinear upsample of a coarse (B, Ph) gain field to the full
    (B, P) node grid — one call per fixed-point iteration when
    ``cbet_grid_downsample > 1`` (the per-step gain lookup stays
    full-resolution; see make_cbet_trace_fn).

    Three small dense matmuls (separable per-axis interpolation matrices on
    the MXU).  Gather- and repeat-free: ``jnp.take`` along small axes was
    measured at ~10 s/axis on a v5e (duplicate-heavy gathers) and
    ``jnp.repeat`` at ~11 s total; the einsum form is milliseconds."""
    s = cfg.cbet_grid_downsample
    hx, hy, hz = cfg.cbet_grid_shape
    wx = jnp.asarray(_interp_matrix(cfg.nx, hx, s))
    wy = jnp.asarray(_interp_matrix(cfg.ny, hy, s))
    wz = jnp.asarray(_interp_matrix(cfg.nz, hz, s))

    @jax.jit
    def upsample(gain_h):                      # (B, Ph); B may carry
        g = gain_h.reshape(-1, hx, hy, hz)     # phantom padding rows
        g = jnp.einsum("bxyz,Zz->bxyZ", g, wz)
        g = jnp.einsum("bxyZ,Yy->bxYZ", g, wy)
        g = jnp.einsum("bxYZ,Xx->bXYZ", g, wx)
        return g.reshape(g.shape[0], cfg.nx * cfg.ny * cfg.nz)

    return upsample


def live_tile_slots(cfg: Config, ctx: rt.TraceContext) -> np.ndarray:
    """Per-beam live-tile slot selection for CBET traces.

    Like ``ctx.live_slots`` (launched-tile compaction, ~24% fewer slots on
    the OMEGA scene) but with each beam's live tile count padded to a
    ``tiles_per_block`` multiple using that beam's own dead tiles, so the
    grouped per-beam intensity kernel keeps a uniform, block-aligned
    ``tiles_per_group``.  The pupil mask is beam-independent (it applies in
    the pre-rotation lattice frame, launch_ray_XZ.cu:94,114), so every beam
    has the same live count — asserted."""
    rpt = ctx.layout.rays_per_tile
    tpb = ctx.layout.tiles_per_beam
    mask = np.asarray(ctx.state0.alive)
    tile_live = mask.reshape(-1, rpt).any(axis=1).reshape(cfg.nbeams, tpb)
    counts = tile_live.sum(axis=1)
    # RuntimeError, not assert: a violation silently corrupts the grouped
    # kernel's positional beam attribution, and asserts vanish under -O
    if not (counts == counts[0]).all():
        raise RuntimeError(
            f"per-beam live-tile counts differ ({counts.tolist()}) — the "
            "beam-independent pupil assumption this layout relies on does "
            "not hold for this scene")
    n_pad = -int(counts[0]) % cfg.tiles_per_block
    tiles = []
    for b in range(cfg.nbeams):
        live = np.nonzero(tile_live[b])[0]
        dead = np.nonzero(~tile_live[b])[0]
        if len(dead) < n_pad:
            raise RuntimeError(
                f"beam {b} has {len(dead)} dead tiles, fewer than the "
                f"{n_pad} needed to block-pad its group")
        tiles.append(b * tpb + np.concatenate([live, dead[:n_pad]]))
    tiles = np.concatenate(tiles)
    return (tiles[:, None] * rpt + np.arange(rpt)[None, :]).reshape(-1)


def _grouped_intensity_ok(cfg: Config, backend: str) -> bool:
    """Whether the grouped Pallas intensity kernel can carry this config's
    (possibly coarsened) CBET grid on this backend: any Pallas backend,
    except that under the HBM-grid edep kernel the intensity grid must
    itself fit a VMEM block (hz+2 z-lanes).  THE single predicate for
    grouped capability — make_cbet_trace_fn, the beam-shard decision, and
    the intensity_mode label must all use it so they cannot drift."""
    from ..ops.pallas_deposit import ZLANES
    hz = cfg.cbet_grid_shape[2]
    return (backend in rt.PALLAS_BACKENDS
            and (not backend.startswith("pallas_hbm") or hz + 2 <= ZLANES))


def make_cbet_trace_fn(cfg: Config, ctx: rt.TraceContext,
                       backend: str | None = None,
                       intensity_scatter: bool = False,
                       tiles_per_group: int | None = None,
                       kernel_precise: bool = False,
                       segments=None, seg_tpgs=None,
                       n_local_beams: int | None = None,
                       gain_local: bool = False,
                       edep_skip: bool = False,
                       _ablate: str = ""):
    """Gain-aware trace builder; ``make()`` returns
    ``(field4, gain (B,P), bid (N,), state0) -> (edep, intensity (B,P),
    state, overflow)`` (``bid`` = per-slot beam ids, sharded alongside the
    rays in multi-device solves).

    Extends the base integrator step with the multiplicative CBET gain and
    per-beam intensity accumulation (trilinear deposit of ``uray*|v|/c`` —
    the crossing-record analog) via the grouped Pallas kernel (one grid per
    beam) or an offset scatter.

    ``n_local_beams`` builds the BEAM-SHARDED variant for use inside a
    ``shard_map`` shard that owns that many whole contiguous beams (the
    beam-contiguous slot layout shards into whole beams whenever the device
    count divides ``nbeams`` — see ``_build_solver``): the grouped Pallas
    intensity kernel runs per shard with ``n_local_beams`` groups and the
    returned intensity has ``n_local_beams`` rows (globally: the (B, P)
    fields sharded along the beam axis, each beam's field computed wholly
    on its own device — no psum).  Gain lookups stay global: ``bid``
    carries global beam ids into the replicated (B, P) gain table.  This
    is what keeps multi-chip CBET on the fast grouped kernel instead of
    the ~16x-slower per-shard offset scatter (the reference's multi-GPU
    analog splits beams across devices the same way, main.cu:133-210).

    ``segments``/``seg_tpgs`` (from tileplan.build_beam_segments) enable
    static mid-trace tile compaction: the ray state, beam ids, and the
    per-beam group width are gathered down at segment boundaries.  The
    trace then returns a FIFTH output ``dropped`` — the count of
    still-alive rays compaction discarded, which callers must hard-error
    on (a plan measured with stop_fraction=0 guarantees 0 for any gain;
    the counter is the enforcement) — and the returned ``state`` is the
    full state0-aligned final state (write-back at boundaries).
    Combined with ``n_local_beams`` (segments + beam sharding) the trace
    takes a FIFTH argument ``seg_args`` — the per-shard
    ``tileplan.split_beam_segments`` index arrays as sharded (1, ...)
    blocks — and compaction runs per shard on its own whole beams with
    the same static segment schedule on every device."""
    nx, ny, nz = cfg.nx, cfg.ny, cfg.nz
    if backend is None:
        backend = rt.resolve_deposit_backend(cfg)
    base_step = rt.make_step_fn(cfg, ctx.layout.rays_per_tile, backend)
    # the CBET intensity/gain grid may be coarser than the trace grid
    # (Config.cbet_grid_downsample); all CBET-side indexing below is in
    # coarse-node units, the edep path stays full-resolution
    s = cfg.cbet_grid_downsample
    hx, hy, hz = cfg.cbet_grid_shape
    P = nx * ny * nz              # per-step gain lookups are full-resolution
    nb = cfg.nbeams
    d = np.array([cfg.dx, cfg.dy, cfg.dz])

    pallas = backend in rt.PALLAS_BACKENDS
    from ..ops.pallas_deposit import (edep_zpad_shape, finalize_edep,
                                      make_tile_deposit)

    # grouped Pallas intensity deposit requires beam-contiguous tile indices
    # within the shard.  Single device always has them; a mesh shard has
    # them iff it owns whole beams (n_local_beams — see docstring), else the
    # solve falls back to the beam-offset scatter.  Under the HBM-grid
    # (high-res) edep backend, the grouped VMEM kernel still carries the
    # INTENSITY fields whenever the (possibly coarsened) CBET grid fits a
    # VMEM block (hz+2 <= 128 lanes): at BASELINE config 4,
    # cbet_grid_downsample=2 puts intensity back on a 100^3-class grid —
    # without this, high-res CBET silently fell to the ~16x-slower scatter.
    grouped_pallas = (not intensity_scatter
                      and _grouped_intensity_ok(cfg, backend))
    # beams this trace owns (and rows of its intensity output): nbeams,
    # or the per-shard count in the beam-sharded variant
    nb_g = nb if n_local_beams is None else n_local_beams
    if n_local_beams is not None:
        if intensity_scatter:
            raise ValueError("n_local_beams is the grouped-kernel beam "
                             "sharding; it contradicts intensity_scatter")
        if not grouped_pallas:
            raise ValueError(
                "n_local_beams (beam-sharded intensity) requires the "
                f"grouped Pallas intensity path; backend={backend!r} with "
                f"CBET grid z extent {hz + 2} lanes does not support it")
        if cfg.cbet_gain_mode == "kernel":
            raise ValueError("cbet_gain_mode='kernel' (the deviating "
                             "trilinear window model) is single-device "
                             "only; use 'kernel_cell' or 'lookup' on a "
                             "mesh")
        if cfg.cbet_gain_mode == "kernel_cell" and not gain_local:
            # the in-kernel gain table on a shard must hold exactly the
            # shard's beams' rows — that IS the beam-sharded gain table
            # (Config.cbet_gain_sharded); a replicated table would need a
            # per-shard dynamic row slice the VMEM grouped-input block
            # cannot express
            raise ValueError("cbet_gain_mode='kernel_cell' on a mesh "
                             "requires the beam-sharded gain table "
                             "(cbet_gain_sharded)")
    if gain_local:
        # the trace's gain argument is the shard's LOCAL (n_local_beams, P)
        # block of the beam-sharded gain table (Config.cbet_gain_sharded):
        # the sliced lookups (lookup mode) read static local rows instead
        # of dynamic global ones; the kernel_cell gain table is built from
        # exactly these rows
        if n_local_beams is None:
            raise ValueError("gain_local requires the beam-sharded layout "
                             "(n_local_beams)")
        if cfg.cbet_gain_mode == "lookup" and not cfg.cbet_gain_sliced:
            raise ValueError("gain_local requires cbet_gain_sliced (the "
                             "flat bid-offset fallback indexes the global "
                             "table)")
    tpg = (tiles_per_group if tiles_per_group is not None
           else ctx.layout.tiles_per_beam)
    rpt = ctx.layout.rays_per_tile

    chunk = max(1, min(cfg.chunk_steps, cfg.nt))
    n_chunks = -(-cfg.nt // chunk)
    last_chunk = cfg.nt - (n_chunks - 1) * chunk

    # batched deposition (see raytracer._make_chunk_machinery): advance
    # `batch` steps deferred, then one kernel call per grid with the
    # contraction over batch*rays_per_tile rows — amortizes the fixed
    # per-grid-step and per-matmul kernel costs that dominate at rows=256
    kernel_gain = cfg.cbet_gain_mode in ("kernel", "kernel_cell")
    kernel_cell = cfg.cbet_gain_mode == "kernel_cell"
    batch = cfg.deposit_batch_steps
    batch_fits = batch > 1 and not (chunk % batch or last_chunk % batch)
    if not batch_fits or not (grouped_pallas or (kernel_gain and not pallas)):
        batch = 1
    # fail loud rather than silently compute a different model: the
    # window-strided gain lookup only exists on the batched grouped path,
    # and its window IS the deposit batch
    if cfg.cbet_gain_stride not in (1, cfg.deposit_batch_steps):
        raise ValueError(
            f"cbet_gain_stride must be 1 or deposit_batch_steps "
            f"(={cfg.deposit_batch_steps}), got {cfg.cbet_gain_stride}")
    if cfg.cbet_gain_stride > 1 and batch <= 1:
        raise ValueError(
            "cbet_gain_stride > 1 requires the batched grouped deposit "
            "path (Pallas backend; single device or whole-beams-per-shard "
            "mesh; deposit_batch_steps dividing the chunk lengths) — this "
            "configuration would silently run the exact per-step model "
            "instead")
    if kernel_gain:
        # the window-gain contraction's window IS the deposit batch
        if cfg.cbet_gain_stride != 1:
            raise ValueError(
                "cbet_gain_mode='kernel' subsumes gain striding — set "
                "cbet_gain_stride=1")
        if not batch_fits or batch <= 1:
            raise ValueError(
                "cbet_gain_mode='kernel' requires deposit_batch_steps > 1 "
                "dividing the chunk lengths (the window model is defined "
                "per deposit window)")
        if pallas and (backend.startswith("pallas_hbm")
                       or intensity_scatter):
            raise ValueError(
                "cbet_gain_mode='kernel'/'kernel_cell' on a Pallas backend "
                "needs a VMEM grid and beam-contiguous tile groups "
                "(single device, or whole-beams-per-shard meshes with the "
                "beam-sharded gain table); use 'lookup' for pallas_hbm or "
                "beam-straddling scatter layouts")
    if edep_skip and batch <= 1:
        raise ValueError(
            "edep_skip (light CBET iterations) requires a batched deposit "
            "path — a kernel gain mode, or deposit_batch_steps > 1 dividing "
            "the chunk lengths with the grouped Pallas intensity")
    if batch > 1:
        dstep = rt.make_deferred_step_fn(cfg)
    if kernel_gain:
        # the window mini-scan advances WITHOUT the energy stop rule:
        # trajectories are energy-independent, and the exact rule is
        # applied by the window-gain machinery itself (which knows the
        # true gained energy u_nogain * gcum per step) — deposits are
        # masked past each ray's true death step and uray/alive are
        # restored exactly at the window boundary.  Only positions/vel of
        # mid-window energy-dead rays differ from the per-step lookup
        # (frozen at window end instead of the death step) — no
        # parity-bearing output depends on them.
        dstep_win = rt.make_deferred_step_fn(cfg.replace(stop_fraction=0.0))
        stop_frac_w = cfg.stop_fraction
    # the intensity deposit box shrinks with the grid (a tile's 5-step
    # window spans ~1/s as many coarse nodes); +4 margin, and the overflow
    # counter still hard-errors if it ever falls short
    ibox = (cfg.deposit_box if s == 1
            else tuple(-(-b // s) + 4 for b in cfg.deposit_box))

    def _deposit_set(tpg_s):
        """The tpg-dependent deposit functions (the grouped intensity
        kernel's beam-group width, and the window-gain edep kernel's gain-
        block width) — built once unsegmented, per segment when
        compacted.  scatter + kernel_gain builds neither: the XLA window
        path scatters each step's corrected deposits itself."""
        ideposit_s = edeposit_s = None
        if batch > 1:
            if kernel_gain and pallas:
                # edep_skip: the gamma/uout-only kernel — same signature,
                # edep passed through untouched (light iterations).
                # nb_g beams: the global count single-device, the shard's
                # local count on beam-sharded meshes (the kernel's group
                # mapping is positional and its gain table holds exactly
                # the local rows — gain_local)
                edeposit_s = make_tile_deposit(
                    nx, ny, nz, rpt * batch, box=cfg.deposit_box,
                    tiles_per_block=cfg.tiles_per_block,
                    gain_window=(nb_g, tpg_s, batch, GAIN_CLIP,
                                 "cell" if kernel_cell else "tri",
                                 cfg.stop_fraction),
                    gain_only=edep_skip,
                    interpret=backend.endswith("_interpret"),
                    precise=kernel_precise,
                    exact_boundary=cfg.deposit_boundary_exact)
            elif pallas and edep_skip:
                edeposit_s = None        # light lookup: no edep deposit
            elif pallas:
                edeposit_s = rt._make_deposit_fn(cfg, rpt * batch, backend)
        if grouped_pallas:
            ideposit_s = make_tile_deposit(
                hx, hy, hz, rpt * batch, box=ibox,
                tiles_per_block=cfg.tiles_per_block, n_groups=nb_g,
                tiles_per_group=tpg_s,
                interpret=backend.endswith("_interpret"),
                precise=kernel_precise,
                exact_boundary=cfg.deposit_boundary_exact)
        return ideposit_s, edeposit_s

    if segments is None:
        dep_sets = [_deposit_set(tpg)]
        gathers = origins = None
    else:
        if intensity_scatter:
            raise ValueError("segmented CBET traces require the grouped "
                             "intensity path (beam-contiguous tile groups)")
        if len(seg_tpgs) != len(segments):
            raise ValueError(
                f"segments/seg_tpgs length mismatch: {len(segments)} vs "
                f"{len(seg_tpgs)}")
        seg_chunks = sum(len(s.chunk_lengths) for s in segments)
        if seg_chunks != n_chunks:
            raise ValueError(
                f"segment plan covers {seg_chunks} chunks but this config "
                f"traces {n_chunks} (stale plan for a different nt/"
                "chunk_steps?)")
        dep_sets = [_deposit_set(t) for t in seg_tpgs]
        if n_local_beams is None:
            from .tileplan import origin_slots, segment_gather_rows
            T_all = int(segments[0].tiles.max()) + 1
            gathers = []
            for prev, seg in zip(segments[:-1], segments[1:]):
                pos = segment_gather_rows(prev, seg, T_all)
                gathers.append((len(prev.tiles), jnp.asarray(pos),
                                jnp.asarray(np.repeat(seg.valid, rpt))))
            # per-segment slot origins in segment-0 slot space for the
            # final-state write-back (invalid rows land past the end ->
            # dropped)
            n0 = len(segments[0].tiles) * rpt
            origins = [jnp.asarray(origin_slots(seg.tiles, seg.valid,
                                                rpt, n0))
                       for seg in segments]
        else:
            # BEAM-SHARDED segmented trace: the per-shard gather/write-back
            # index arrays differ per device and ride in as sharded
            # arguments (trace's 5th arg, built by _build_solver via
            # split_beam_segments) — only the STATIC structure (widths,
            # chunk lengths) is closed over, so shard_map traces one
            # program for all devices (same pattern as
            # sharding.make_sharded_segmented_trace_fn)
            gathers = origins = None

    def to_coarse(cell, frac):
        """Full-grid (cell, frac) -> coarse-grid (cell, frac): the position
        t = cell + frac in full node units equals s * (ch + fh)."""
        if s == 1:
            return tuple(cell), tuple(frac)
        ch = tuple(c // s for c in cell)
        fh = tuple(((cell[a] - ch[a] * s).astype(frac[a].dtype) + frac[a])
                   * (1.0 / s) for a in range(3))
        return ch, fh

    def make():
        shape3 = (edep_zpad_shape(cfg.nx, cfg.ny, cfg.nz) if pallas
                  else cfg.edep_shape)
        ishape = ((nb_g,) + edep_zpad_shape(hx, hy, hz) if grouped_pallas
                  else (nb, hx + 2, hy + 2, hz + 2))

        # bid is a (sharded) argument: per-slot beam ids travel with the
        # rays.  seg_args (beam-sharded segmented traces only) carries the
        # per-shard (origins, gathers) index arrays — (1, ...) blocks
        # inside shard_map
        def trace(field4, gain, bid, state0: rt.RayState, seg_args=None):
            dtype = state0.uray.dtype
            dvec = jnp.asarray(d, dtype)
            # intensity is deposited per coarse-node *density*: a coarse node
            # collects s^3 more ray-step weight than a full-grid node, so the
            # per-step contribution carries a 1/s^3 normalization
            inv_cdt = jnp.asarray(1.0 / (k.C_CMS * cfg.dt * s ** 3), dtype)
            # flat 1-D gain lookup with a precomputed per-slot beam offset:
            # 2-D advanced indexing gain[bid, flat] lowers to a measured
            # ~4x-slower gather path (21 ms/step vs ~5 for the 4-wide field
            # row gather); the 1-D take rides the fast row-gather path
            gain_flat = gain.reshape(-1)
            # 2-wide sliced gain rows (Config.cbet_gain_rows2): 1-wide
            # gather rows pay a measured 1.6x penalty, so the sliced
            # lookups gather from a value-duplicated (B, P, 2) table when
            # it fits.  Built once per trace call (outside the step scans).
            rows2 = cfg.cbet_gain_rows2
            if rows2 is None:
                rows2 = int(gain.size) * gain.dtype.itemsize * 2 <= 1.5e9
            gain_src = (jnp.stack([gain, gain], axis=-1)
                        if rows2 and cfg.cbet_gain_sliced
                        and not intensity_scatter else gain)

            if kernel_gain:
                # per-beam gain tables in the grid's own ghost-padded
                # layout (ghost nodes = zero gain); built once per trace
                # call — one cheap pad vs ~nt big-table gathers.  The XLA
                # kernel_cell branch samples single un-padded nodes and
                # uses gain_flat directly; the Pallas kernels need the
                # padded table in both modes.  gain_local: the shard's
                # gain block holds exactly its nb_g local beams' rows.
                g3 = gain.reshape(nb_g if gain_local else nb, nx, ny, nz)
                if pallas:
                    _, yp_pad, zp_pad = edep_zpad_shape(nx, ny, nz)
                    gain_tab = jnp.pad(
                        g3.astype(jnp.float32),
                        ((0, 0), (1, 1), (1, yp_pad - ny - 1),
                         (1, zp_pad - nz - 1)))
                elif not kernel_cell:
                    gpad_flat = jnp.pad(
                        g3, ((0, 0), (1, 1), (1, 1), (1, 1))).reshape(-1)
                    grid_pad = (nx + 2) * (ny + 2) * (nz + 2)

            def mini_nogain(st, _):
                # window model: advance WITHOUT gain and WITHOUT the energy
                # stop rule (gain and absorption are both multiplicative on
                # uray, so the window's cumulative gain factors apply
                # exactly afterwards; the exact termination rule is applied
                # by the window machinery from the true gained energy); ds
                # is the step-entry path element — the SAME quadrature as
                # the lookup mode's apply_gain, so the g->0 limit of the
                # two modes is identical — and zero on dead rays so their
                # window factor is exactly 1.  Emits the gain-free
                # post-step energy and the launch energy so the exact
                # death rule (u_nogain * gcum <= stop * uinit) can be
                # evaluated per step downstream.
                ds = jnp.sqrt((st.vel[0] * dvec[0]) ** 2
                              + (st.vel[1] * dvec[1]) ** 2
                              + (st.vel[2] * dvec[2]) ** 2)
                ds = jnp.where(st.alive, ds, jnp.asarray(0, dtype))
                st, (cell, frac, inc) = dstep_win(st, field4)
                contrib0 = jnp.where(st.alive, st.uray * (ds * inv_cdt),
                                     jnp.asarray(0.0, dtype))
                return st, (*cell, *frac, inc, ds, contrib0,
                            st.uray, st.uray_init)

            def make_chunk_body(dep, bid_l, tpg_s):
                """The per-chunk scan body, bound to one segment's deposit
                set, (gathered) per-slot beam ids, and beam-group width."""
                ideposit, edeposit = dep
                bid_off = bid_l.astype(jnp.int32) * jnp.int32(P)
                if kernel_gain and not kernel_cell and not pallas:
                    bid_off_pad = (bid_l.astype(jnp.int32)
                                   * jnp.int32(grid_pad))

                def lookup_g(state, flat=None):
                    # the lookup table is ALWAYS full-resolution (coarsened
                    # gain fields are trilinearly upsampled once per fixed-
                    # point iteration, cbet_solve) — nearest-coarse-node
                    # lookups were measured to distort the coupled edep by
                    # >half the CBET effect on the two-beam validation scene.
                    # ``flat`` (precomputed flat cell indices) lets the
                    # kernel_cell window branch reuse the sliced fast path.
                    if flat is None:
                        cx, cy, cz = state.cell
                        flat = (cx * ny + cy) * nz + cz
                    if cfg.cbet_gain_sliced and not intensity_scatter:
                        # per-beam-sliced gathers (identical values): each
                        # beam's contiguous slot block reads its own 4 MB
                        # gain row — big-table latency is the dominant
                        # lookup cost (Config.cbet_gain_sliced).  Measured
                        # on chip: exact 60-beam solve 181.3 -> 131.8 s.
                        # Beam-sharded (n_local_beams): the shard's local
                        # block b holds GLOBAL beam axis_index*n_local + b
                        # — a dynamic row slice keeps the small-table rate.
                        W = tpg_s * rpt
                        if nb_g * W != flat.shape[0]:
                            raise ValueError(
                                f"cbet_gain_sliced needs a beam-contiguous "
                                f"layout of exactly beams*tiles_per_group*"
                                f"rays_per_tile slots (= {nb_g}*{tpg_s}*"
                                f"{rpt} = {nb_g * W}), got {flat.shape[0]}"
                                " — pass the matching tiles_per_group or "
                                "disable slicing")
                        if n_local_beams is None or gain_local:
                            # single device, or a beam-sharded gain table
                            # (gain_local: the block's rows ARE this
                            # shard's beams, phantoms included) — static
                            # local row slices
                            rows = [gain_src[b] for b in range(nb_g)]
                        else:
                            from ..parallel.sharding import AXIS as _AX
                            b0 = jax.lax.axis_index(_AX) * n_local_beams
                            # phantom beams index past the (B, P) table and
                            # clamp to the last row — harmless: all their
                            # slots are dead, apply_gain masks them out
                            rows = [jax.lax.dynamic_index_in_dim(
                                        gain_src, b0 + b, 0, keepdims=False)
                                    for b in range(nb_g)]
                        taken = [
                            jnp.take(row, flat[b * W:(b + 1) * W], axis=0)
                            for b, row in enumerate(rows)]
                        if gain_src.ndim == 3:    # 2-wide rows: keep col 0
                            taken = [t[:, 0] for t in taken]
                        return jnp.concatenate(taken)
                    return jnp.take(gain_flat, bid_off + flat, axis=0)

                def apply_gain(state, g=None):
                    # CBET gain along the path element of this step, looked
                    # up at the step-entry cell (or reused across a deposit
                    # window — cbet_gain_stride); the stability clamp on the
                    # per-step exponent only engages at transient resonance
                    # hotspots during early fixed-point iterations (physical
                    # per-step gains are O(1e-3..3e-2))
                    ds = jnp.sqrt((state.vel[0] * dvec[0]) ** 2
                                  + (state.vel[1] * dvec[1]) ** 2
                                  + (state.vel[2] * dvec[2]) ** 2)
                    if "no_gain" in _ablate:       # cost attribution only
                        return state, ds
                    if g is None:
                        g = lookup_g(state)
                    factor = jnp.exp(jnp.clip(g * ds, -GAIN_CLIP, GAIN_CLIP))
                    uray = jnp.where(state.alive, state.uray * factor,
                                     state.uray)
                    return dataclasses.replace(state, uray=uray), ds

                def step_window(carry, _):
                    # cbet_gain_mode="kernel": trilinear gain at every
                    # step's deposit position, contracted inside the deposit
                    # kernel (Pallas) or via 8-corner gathers (XLA scatter
                    # backend — identical model, the oracle-validation path).
                    # "kernel_cell": the lookup mode's exact sampling
                    # (single node at each step's ENTRY cell) applied in
                    # window form — entry cell j = post-step cell j-1, the
                    # window-entry cell for j=0.  Both modes apply the
                    # EXACT termination rule from the true gained energy
                    # (see mini_nogain): kernel_cell is therefore
                    # IDENTICAL to the per-step lookup model.
                    state, edep, ibeams, oflow = carry
                    cells0 = state.cell
                    state, ys = jax.lax.scan(mini_nogain, state, None,
                                             length=batch)
                    if pallas:
                        def rearrange(a):    # (batch, N) -> tile-major
                            return (a.reshape(batch, -1, rpt)
                                    .transpose(1, 0, 2).reshape(-1))

                        args = [rearrange(a) for a in ys]
                        dep_args = args[:8] + [args[9], args[10]]
                        if kernel_cell:
                            lag = tuple(
                                jnp.concatenate([c0[None], cs[:-1]], axis=0)
                                for c0, cs in zip(cells0, ys[0:3]))
                            dep_args += [rearrange(a) for a in lag]
                        edep, of_e, gamma, uout = edeposit(
                            edep, *dep_args, gain_tab)
                        of_i = jnp.int32(0)
                        if "no_intensity" not in _ablate:
                            contrib = args[8] * gamma.reshape(-1).astype(
                                dtype)
                            icell, ifrac = to_coarse(args[:3], args[3:6])
                            ibeams, of_i = ideposit(ibeams, *icell, *ifrac,
                                                    contrib)
                        uout_f = uout.reshape(-1).astype(dtype)
                        state = dataclasses.replace(
                            state, uray=uout_f,
                            alive=state.alive & (
                                uout_f > stop_frac_w * state.uray_init))
                        return (state, edep, ibeams,
                                oflow + of_e + of_i), None
                    # XLA form: same window model on the scatter backend
                    cell, frac = ys[0:3], ys[3:6]      # (batch, N) each
                    inc, dsb, contrib0 = ys[6], ys[7], ys[8]
                    u_ng, uinit_b = ys[9], ys[10]
                    if kernel_cell:
                        # exact sampling: g_j at the single node of step
                        # j's entry cell
                        gs, prev = [], cells0
                        for j in range(batch):
                            fl = (prev[0] * ny + prev[1]) * nz + prev[2]
                            # route through lookup_g so the per-beam-sliced
                            # small-table fast path applies here too (it
                            # only needs the flat cell index)
                            gs.append(lookup_g(None, flat=fl))
                            prev = tuple(c[j] for c in cell)
                        g = jnp.stack(gs)               # (batch, N)
                    else:
                        ones = jnp.ones_like(dsb[0])
                        gs = []
                        for j in range(batch):
                            cj = tuple(c[j] for c in cell)
                            fj = tuple(f[j] for f in frac)
                            idx, w = rt._scatter_corner_parts(cfg, cj, fj,
                                                              ones)
                            vals = jnp.take(
                                gpad_flat,
                                jnp.tile(bid_off_pad, 8) + idx) * w
                            gs.append(vals.reshape(8, -1).sum(axis=0))
                        g = jnp.stack(gs)               # (batch, N)
                    gam = jnp.exp(jnp.clip(g * dsb, -GAIN_CLIP, GAIN_CLIP))
                    gcum = jnp.cumprod(gam, axis=0)
                    # exact termination: died_j = true gained energy at or
                    # below the stop threshold; deposits masked from the
                    # step AFTER the first death (the killing step still
                    # deposits — the lookup order), intensity masked FROM
                    # the killing step (the lookup's post-step alive mask)
                    u_true = u_ng * gcum                # (batch, N)
                    thr = stop_frac_w * uinit_b
                    died = (u_true <= thr).astype(dtype)
                    anydied = jax.lax.cummax(died, axis=0)
                    prev_any = jnp.concatenate(
                        [jnp.zeros_like(anydied[:1]), anydied[:-1]])
                    medep = 1.0 - prev_any
                    mint = 1.0 - anydied
                    inc_c = inc * gcum * medep
                    grid_elems = (hx + 2) * (hy + 2) * (hz + 2)
                    for j in range(batch):
                        cj = tuple(c[j] for c in cell)
                        fj = tuple(f[j] for f in frac)
                        if not edep_skip:
                            idx, val = rt._scatter_corner_parts(cfg, cj, fj,
                                                                inc_c[j])
                            edep = edep.reshape(-1).at[idx].add(val).reshape(
                                edep.shape)
                        if "no_intensity" not in _ablate:
                            icell, ifrac = to_coarse(cj, fj)
                            idx2, val2 = rt._scatter_corner_parts(
                                cfg, icell, ifrac,
                                contrib0[j] * gcum[j] * mint[j],
                                dims=(hx, hy, hz))
                            off = jnp.concatenate([bid_l * grid_elems] * 8)
                            ibeams = ibeams.reshape(-1).at[idx2 + off].add(
                                val2).reshape(ibeams.shape)
                    # frozen true energy: at the first death step, else the
                    # window end
                    uout = ((u_true * died * medep).sum(axis=0)
                            + u_true[-1] * (1.0 - anydied[-1]))
                    state = dataclasses.replace(
                        state, uray=uout,
                        alive=state.alive & (
                            uout > stop_frac_w * state.uray_init))
                    return (state, edep, ibeams, oflow), None

                def step(carry, _):
                    state, edep, ibeams, oflow = carry
                    state, ds = apply_gain(state)
                    state, edep, of = base_step(state, edep, field4)
                    # per-beam local-intensity deposit (trilinear, same
                    # corner scheme as edep): uray * v/c -> W/cm^2 fields
                    contrib = jnp.where(state.alive,
                                        state.uray * (ds * inv_cdt),
                                        jnp.asarray(0.0, dtype))
                    icell, ifrac = to_coarse(state.cell, state.frac)
                    if "no_intensity" in _ablate:
                        pass
                    elif grouped_pallas:
                        ibeams, of_i = ideposit(ibeams, *icell, *ifrac,
                                                contrib)
                        of = of + of_i
                    else:
                        # one scatter into per-beam grids via beam offsets
                        idx, val = rt._scatter_corner_parts(
                            cfg, icell, ifrac, contrib, dims=(hx, hy, hz))
                        grid_elems = (hx + 2) * (hy + 2) * (hz + 2)
                        off = jnp.concatenate([bid_l * grid_elems] * 8)
                        flat_i = ibeams.reshape(-1).at[idx + off].add(val)
                        ibeams = flat_i.reshape(ibeams.shape)
                    return (state, edep, ibeams, oflow + of), None

                def step_batched(carry, _):
                    # advance `batch` steps deferred, then one kernel call
                    # per grid with batch*rays_per_tile contraction rows
                    state, edep, ibeams, oflow = carry
                    # window-strided gain: one lookup at the window-entry
                    # cell, reused for all `batch` steps
                    # (Config.cbet_gain_stride) — cuts the dominant per-
                    # iteration gather 5x at a measured-small model
                    # perturbation (the gain field is smooth; rays travel
                    # ~0.5 cells/step)
                    g_win = (lookup_g(state)
                             if cfg.cbet_gain_stride > 1
                             and "no_gain" not in _ablate else None)

                    def mini(st, _):
                        st, ds = apply_gain(st, g_win)
                        st, (cell, frac, inc) = dstep(st, field4)
                        contrib = jnp.where(st.alive,
                                            st.uray * (ds * inv_cdt),
                                            jnp.asarray(0.0, dtype))
                        return st, (*cell, *frac, inc, contrib)

                    state, ys = jax.lax.scan(mini, state, None, length=batch)

                    def rearrange(a):    # (batch, N) -> tile-major
                        return (a.reshape(batch, -1, rpt)
                                .transpose(1, 0, 2).reshape(-1))

                    args = [rearrange(a) for a in ys]
                    if edeposit is None:           # light lookup iteration
                        of_e = jnp.int32(0)
                    else:
                        edep, of_e = edeposit(edep, *args[:7])
                    if "no_intensity" in _ablate:
                        of_i = jnp.int32(0)
                    else:
                        icell, ifrac = to_coarse(args[:3], args[3:6])
                        ibeams, of_i = ideposit(ibeams, *icell, *ifrac,
                                                args[7])
                    return (state, edep, ibeams, oflow + of_e + of_i), None

                def chunk_body(carry, steps_in_chunk):
                    state, edep_master, imaster, oflow = carry
                    edep0 = jnp.zeros(shape3, dtype)
                    ib0 = jnp.zeros(ishape, igrid_dtype)

                    def run_inner(n_steps):
                        if batch > 1:
                            body = (step_window if kernel_gain
                                    else step_batched)
                            return jax.lax.scan(body,
                                                (state, edep0, ib0, oflow),
                                                None,
                                                length=n_steps // batch)[0]
                        return jax.lax.scan(step, (state, edep0, ib0, oflow),
                                            None, length=n_steps)[0]

                    def run_chunk():
                        if last_chunk == chunk:
                            return run_inner(chunk)
                        return jax.lax.cond(steps_in_chunk == chunk,
                                            lambda: run_inner(chunk),
                                            lambda: run_inner(last_chunk))

                    state2, edep32, ib32, oflow = jax.lax.cond(
                        jnp.any(state.alive), run_chunk,
                        lambda: (state, edep0, ib0, oflow))
                    return (state2,
                            edep_master + edep32.astype(edep_master.dtype),
                            imaster + ib32, oflow), None

                return chunk_body

            # chunked accumulation (see raytracer.make_trace_fn): per-chunk
            # float32 grids promote into wider masters, and fully-dead chunks
            # are skipped
            edep_master = jnp.zeros(
                shape3, jax.dtypes.canonicalize_dtype(jnp.dtype(cfg.edep_dtype)))
            # the Pallas kernel accumulates in f32; the scatter path keeps the
            # compute dtype (float64 on CPU validation runs)
            igrid_dtype = jnp.float32 if grouped_pallas else dtype
            imaster = jnp.zeros(ishape, igrid_dtype)

            if segments is None:
                steps_per_chunk = jnp.asarray(
                    [chunk] * (n_chunks - 1) + [last_chunk], jnp.int32)
                (state, edep, ibeams, oflow), _ = jax.lax.scan(
                    make_chunk_body(dep_sets[0], bid, tpg),
                    (state0, edep_master, imaster, jnp.int32(0)),
                    steps_per_chunk)
                dropped = None
            else:
                # static mid-trace tile compaction (tile-row gathers at
                # segment boundaries) with final-state write-back and the
                # dropped-alive-ray hard-error counter
                if n_local_beams is None:
                    origins_l, gathers_l = origins, gathers
                else:
                    # per-shard index arrays from seg_args ((1, ...) blocks
                    # inside shard_map); the prev-segment tile width is
                    # static: n_local beams x that segment's tiles-per-beam
                    if seg_args is None:
                        raise ValueError(
                            "beam-sharded segmented CBET trace requires "
                            "seg_args (the per-shard split_beam_segments "
                            "index arrays)")
                    og, gt = seg_args
                    origins_l = [o[0] for o in og]
                    gathers_l = [(nb_g * seg_tpgs[i], gt[i][0][0],
                                  gt[i][1][0]) for i in range(len(gt))]
                state, bid_l = state0, bid
                edep, ibeams = edep_master, imaster
                oflow = jnp.int32(0)
                dropped = jnp.int32(0)
                uray_full, alive_full = state0.uray, state0.alive

                def write_back(uf, af, si, state):
                    ix = origins_l[si]
                    return (uf.at[ix].set(state.uray, mode="drop"),
                            af.at[ix].set(state.alive, mode="drop"))

                for si, seg in enumerate(segments):
                    if si > 0:
                        uray_full, alive_full = write_back(
                            uray_full, alive_full, si - 1, state)
                        alive_before = jnp.sum(
                            state.alive.astype(jnp.int32))
                        t_prev, pos, val = gathers_l[si - 1]

                        def take(a, t_prev=t_prev, pos=pos):
                            return a.reshape(t_prev, rpt)[pos].reshape(-1)

                        state = jax.tree_util.tree_map(take, state)
                        state = dataclasses.replace(
                            state, alive=state.alive & val)
                        bid_l = take(bid_l)
                        dropped += alive_before - jnp.sum(
                            state.alive.astype(jnp.int32))
                    steps = jnp.asarray(seg.chunk_lengths, jnp.int32)
                    (state, edep, ibeams, oflow), _ = jax.lax.scan(
                        make_chunk_body(dep_sets[si], bid_l, seg_tpgs[si]),
                        (state, edep, ibeams, oflow), steps)
                uray_full, alive_full = write_back(
                    uray_full, alive_full, len(segments) - 1, state)
                state = dataclasses.replace(state0, uray=uray_full,
                                            alive=alive_full)

            if pallas:
                edep = finalize_edep(edep, cfg.ny, cfg.nz)
            if grouped_pallas:
                ibeams = finalize_edep(ibeams, hy, hz)
            # crop ghosts -> per-beam node fields (B, Ph) on the CBET grid
            inodes = ibeams[:, 1:-1, 1:-1, 1:hz + 1].reshape(nb_g,
                                                             hx * hy * hz)
            if segments is not None:
                return edep, inodes, state, oflow, dropped
            return edep, inodes, state, oflow

        return trace

    return make





@dataclasses.dataclass
class _CbetSolver:
    """Everything a fixed-point CBET iteration reuses across ``cbet_solve``
    calls: the jitted gain/trace/update functions, the (device-resident,
    possibly sharded) padded ray state and beam ids, and the segment plan.

    Building this costs tens of seconds per call at OMEGA scale (trace-fn
    construction with its M matrices, jit re-tracing/lowering of the
    segmented 400-step program, and a ~50 MB state upload through the
    tunnel) — none of which depends on the iteration-control fields
    (``cbet_max_iters``/``cbet_tol``), so warm-up and measured solves share
    one instance via ``_solver_cache``."""

    gain_fn: Any
    upsample: Any
    trace: Any                 # (field4, gain, bid, state0) -> checked outputs
    # edep-skipping variant for intermediate iterations (None when the
    # path can't skip): identical state/intensity evolution, edep untouched
    trace_light: Any
    step_update: Any
    state0: rt.RayState
    bid: jnp.ndarray
    make_zero_gain: Any        # () -> (B, P) zeros; factory, not pinned HBM
    # how per-beam intensity is accumulated: "grouped" (single-device
    # grouped Pallas kernel), "beam_sharded" (grouped kernel per shard,
    # whole beams per device), or "scatter" (beam-offset scatter fallback)
    intensity_mode: str = "grouped"
    segmented: bool = False    # compacted per-iteration traces (any device
    #                            count) — False when a mesh layout forced
    #                            the unsegmented fallback
    # beam-sharded gain table (Config.cbet_gain_sharded): intensity/gain
    # keep their phantom rows through the iteration; crop_intensity is the
    # real beam count to crop the final result to (None = no crop needed)
    crop_intensity: int | None = None
    gain_sharded: bool = False
    # memoized zero-gain (iteration-0) intensity (Config.cbet_seed_zero_gain):
    # a pure function of (solver, state0) — the same device array iteration 0
    # recomputes on every solve.  Populated on first compute, reused after.
    seed_intensity: Any = None
    # Anderson(m=1) updates (Config.cbet_accel) — jit is lazy, so carrying
    # them costs nothing unless the accelerated path runs
    accel_first: Any = None
    accel_next: Any = None


# One fused dispatch per iteration for the convergence scalars + the
# under-relaxed update (each bare jnp op costs a ~40-50 ms tunnel dispatch
# round-trip).  relax rides as an argument so one cached program serves
# every cbet_relax setting (the solver key normalizes it).  Module-level:
# shared by the monolithic solver and models.cbet_composed — the update
# arithmetic must stay one copy or the two paths drift.
@jax.jit
def _step_update(i_new, i_old, relax):
    delta = jnp.max(jnp.abs(i_new - i_old))
    scale = jnp.max(jnp.abs(i_old))
    blended = relax * i_new + (1.0 - relax) * i_old
    return delta, scale, blended


_SOLVER_CACHE: dict = {}
_SOLVER_CACHE_MAX = 3


def _get_solver(cfg: Config, ctx: rt.TraceContext, mesh,
                backend: str | None, cache_dir: str | None) -> _CbetSolver:
    # mesh keyed by CONTENT (device ids + topology), not id(): a dead
    # mesh's id can be reused by a different one, silently resurrecting a
    # solver jitted over the wrong placement
    mesh_key = None if mesh is None else (
        mesh.axis_names, mesh.devices.shape,
        tuple(d.id for d in mesh.devices.flat))
    key = (cfg.replace(cbet_max_iters=1, cbet_tol=0.0, cbet_relax=0.5,
                       cbet_seed_zero_gain=True, cbet_accel="none"),
           backend, cache_dir, mesh_key)
    # LRU on the insertion-ordered dict: pop-and-reinsert on hit refreshes
    # recency, and a same-key rebuild (new ctx) never evicts a different
    # entry — a rebuilt solver costs tens of seconds, so evicting the
    # most-recently-used one by FIFO would be expensive
    hit = _SOLVER_CACHE.pop(key, None)
    if hit is not None and hit[0] is ctx:
        _SOLVER_CACHE[key] = hit
        return hit[1]
    solver = _build_solver(cfg, ctx, mesh, backend, cache_dir)
    while len(_SOLVER_CACHE) >= _SOLVER_CACHE_MAX:
        _SOLVER_CACHE.pop(next(iter(_SOLVER_CACHE)))
    _SOLVER_CACHE[key] = (ctx, solver)
    return solver


def _build_solver(cfg: Config, ctx: rt.TraceContext, mesh,
                  backend: str | None,
                  cache_dir: str | None) -> _CbetSolver:
    import math as _math

    rpt = ctx.layout.rays_per_tile
    from ..parallel.sharding import AXIS, pad_rays, put_state
    n_dev = 1 if mesh is None else int(_math.prod(mesh.devices.shape))
    # resolved ONCE: the beam-shard decision and the intensity_mode label
    # below must see the same backend make_cbet_trace_fn will resolve
    rb = backend if backend is not None else rt.resolve_deposit_backend(cfg)
    if ctx.compact:
        # prepare_device contexts are born in exactly the per-beam
        # block-padded live-tile layout this solve needs — no reselection
        state_raw = ctx.state0
        bid_raw = np.maximum(np.asarray(ctx.beam_id), 0).astype(np.int32)
        tpg = (ctx.state0.n // rpt) // cfg.nbeams
    else:
        # trace only launched tiles (~24% fewer slots on the OMEGA scene),
        # per-beam block-padded so the grouped intensity kernel keeps
        # uniform beam groups
        slots = live_tile_slots(cfg, ctx)
        state_raw = rt.select_rays(ctx.state0, slots)
        tpg = (len(slots) // rpt) // cfg.nbeams
        # per-slot beam ids (padding slots get 0 but are permanently dead)
        bid_raw = np.maximum(np.asarray(ctx.beam_id)[slots],
                             0).astype(np.int32)

    # Beam-sharded grouped intensity on a mesh: when every shard owns whole
    # contiguous beams, the grouped Pallas kernel runs per shard (the
    # ~16x-slower offset-scatter fallback is only needed when beams
    # straddle shards).  The uniform beam-contiguous layout
    # (nbeams x tpg x rpt) shards into whole beams whenever the device
    # count divides the beam count — and when it does NOT (OMEGA's 60
    # beams on an 8-chip slice), PHANTOM beams (all-dead slot blocks,
    # bid 0, deposit nothing) pad the beam axis up to the next multiple:
    # a few percent of dead rows instead of the 16x scatter fallback.
    # The trace wrapper crops the phantom rows off the intensity output.
    n_local = None
    nb_pad = cfg.nbeams
    if n_dev > 1 and cfg.cbet_gain_mode != "kernel":
        grouped_ok = _grouped_intensity_ok(cfg, rb)
        beam_aligned = (tpg % cfg.tiles_per_block == 0
                        and state_raw.n == cfg.nbeams * tpg * rpt
                        and bid_raw.shape[0] == state_raw.n)
        if beam_aligned:
            # each beam's block must hold only its own slots, except pad
            # slots whose -1 beam id maps to 0 (bid_raw is host NumPy —
            # no device fetch; pad slots are permanently dead, and a live
            # bid-0 slot cannot sit outside beam 0's block by the layout
            # construction both branches above guarantee)
            bid_b = bid_raw.reshape(cfg.nbeams, tpg * rpt)
            expect = np.arange(cfg.nbeams, dtype=bid_b.dtype)[:, None]
            beam_aligned = bool(((bid_b == expect) | (bid_b == 0)).all())
        if grouped_ok and beam_aligned:
            cand = cfg.nbeams + (-cfg.nbeams) % n_dev
            # phantom blocks sit at the END of the beam axis, so their
            # cost is LOAD IMBALANCE, not extra flops: the trailing
            # shard(s) own them (a fully-phantom shard idles through the
            # all-dead chunk skip) and the busiest shard carries
            # nb_pad/nbeams of the ideal split.  25% admits the
            # production shapes (OMEGA 60 -> 64 on an 8/16/32-chip slice
            # = 6.7%) and rejects degenerate ones (2 -> 4 beams = 100%).
            if (cand - cfg.nbeams) / cfg.nbeams <= 0.25:
                nb_pad = cand
                n_local = nb_pad // n_dev

    # Beam-sharded GAIN TABLE (Config.cbet_gain_sharded): on the whole-
    # beams-per-shard layout, shard the (nb_pad, P) gain/intensity fields
    # along the beam axis for the whole iteration — the trace reads only
    # local rows (sliced lookups), the gain reduction all-gathers the
    # intensity once and computes 1/D of the rows per chip, and the
    # replicated per-iteration gain broadcast disappears (BASELINE.md
    # multi-chip model).  Values are identical (tested).
    gain_sharded = cfg.cbet_gain_sharded
    can_shard_gain = (n_local is not None
                      and ((cfg.cbet_gain_mode == "lookup"
                            and cfg.cbet_gain_sliced)
                           # kernel_cell builds its VMEM gain table from
                           # exactly the shard's local rows — the sharded
                           # table is not just allowed but REQUIRED there
                           # (make_cbet_trace_fn enforces it)
                           or cfg.cbet_gain_mode == "kernel_cell"))
    if gain_sharded is None:
        gain_sharded = can_shard_gain
    elif gain_sharded and not can_shard_gain:
        raise ValueError(
            "cbet_gain_sharded=True requires the beam-sharded mesh layout "
            "(whole beams per shard) with cbet_gain_sliced + "
            "cbet_gain_mode='lookup', or cbet_gain_mode='kernel_cell'; "
            f"this solve resolved n_local={n_local}, "
            f"sliced={cfg.cbet_gain_sliced}, "
            f"gain_mode={cfg.cbet_gain_mode!r}")
    if gain_sharded:
        gain_fn = _make_sharded_gain_fn(cfg, ctx, mesh, nb_pad, n_local)
    else:
        gain_fn = make_gain_fn(cfg, ctx)

    if n_local is not None:
        # exact per-beam layout (+ whole phantom-beam blocks if needed);
        # already a multiple of n_dev*rpt*tiles_per_block by construction
        state0 = pad_rays(state_raw, nb_pad * tpg * rpt)
    else:
        state0 = pad_rays(state_raw, n_dev * rpt * cfg.tiles_per_block)
    bid = np.pad(bid_raw, (0, state0.n - bid_raw.shape[0]))
    # segment plan first, on the still-host padded state (the plan measure
    # is a plain jit trace; it does not need — or want — the mesh layout)
    segments = seg_tpgs = seg_args = None
    if cfg.cbet_segmented and n_dev > 1 and n_local is None:
        # the segmented CBET trace needs beam-contiguous shards (grouped
        # intensity); on the scatter-fallback mesh layout say so instead of
        # silently running every mesh iteration uncompacted
        import sys
        print("warning: cbet_segmented requested but this mesh solve is on "
              "the beam-straddling scatter layout — falling back to the "
              "unsegmented sharded CBET trace", file=sys.stderr)
    elif cfg.cbet_segmented:
        from . import tileplan as tp
        # gain-proof plan at headroom 0: stop_fraction=0 makes liveness a
        # superset of any gained trace's (gain never alters trajectories);
        # headroom>0 plans with a scaled stop rule (Config.cbet_plan_headroom)
        # — the segmented trace's dropped-alive counter enforces it below
        plan_cfg = cfg.replace(
            stop_fraction=cfg.stop_fraction * cfg.cbet_plan_headroom)
        plan = tp.get_or_measure_plan(plan_cfg, ctx, state0, cache_dir)
        # nb_pad: phantom padding beams segment like any other (all-dead
        # from chunk 0, so they cost one carried tile per segment)
        segments, seg_tpgs = tp.build_beam_segments(plan, cfg, cfg.nt,
                                                    nb_pad)
        if n_local is not None:
            seg_args = tp.split_beam_segments(segments, seg_tpgs, nb_pad,
                                              n_dev, rpt)
    # commit the per-ray arrays ONCE, in the layout the per-iteration jitted
    # trace consumes: single-device -> resident on the default device; mesh
    # -> sharded along the ray axis so every fixed-point iteration reuses
    # the resident shards instead of re-distributing ~a dozen (N,) arrays
    if n_dev > 1:
        from jax.sharding import NamedSharding, PartitionSpec as _P
        sharding = NamedSharding(mesh, _P(AXIS))
        state0 = jax.tree_util.tree_map(
            lambda a: jax.device_put(jnp.asarray(a), sharding), state0)
        bid = jax.device_put(jnp.asarray(bid), sharding)
        if seg_args is not None:
            # per-device index arrays, committed sharded on their leading
            # (device) axis so per-iteration calls reuse resident shards
            seg_args = jax.tree_util.tree_map(
                lambda a: jax.device_put(jnp.asarray(a), sharding), seg_args)
    else:
        state0 = put_state(state0)
        bid = jnp.asarray(bid)
    trace_maker = make_cbet_trace_fn(cfg, ctx, backend,
                                     intensity_scatter=(n_dev > 1
                                                        and n_local is None),
                                     tiles_per_group=tpg,
                                     segments=segments, seg_tpgs=seg_tpgs,
                                     n_local_beams=n_local,
                                     gain_local=gain_sharded)
    local = trace_maker()
    if n_dev > 1 and segments is not None:
        from jax.sharding import PartitionSpec as Pspec

        # beam-sharded segmented trace: per-shard index arrays ride in as
        # sharded arguments, edep/overflow/dropped psum over ICI, the
        # intensity comes back beam-sharded (n_local is not None here)
        def sharded_seg(field4, gain, bid_, st, seg_a):
            edep, inodes, st2, of, dropped = local(field4, gain, bid_, st,
                                                   seg_a)
            return (jax.lax.psum(edep, AXIS), inodes, st2,
                    jax.lax.psum(of, AXIS), jax.lax.psum(dropped, AXIS))

        trace_seg_j = jax.jit(jax.shard_map(
            sharded_seg, mesh=mesh,
            in_specs=(Pspec(),
                      Pspec(AXIS) if gain_sharded else Pspec(),
                      Pspec(AXIS), Pspec(AXIS), Pspec(AXIS)),
            out_specs=(Pspec(), Pspec(AXIS), Pspec(AXIS), Pspec(), Pspec()),
            check_vma=False))
        def trace_j(field4, gain, bid_, st, _fn=trace_seg_j, _sa=seg_args):
            return _fn(field4, gain, bid_, st, _sa)
    elif n_dev > 1:
        from jax.sharding import PartitionSpec as Pspec

        def sharded(field4, gain, bid_, st):
            edep, inodes, st2, of = local(field4, gain, bid_, st)
            if n_local is None:
                # per-shard full-(B,P) scatter grids -> sum over shards
                inodes = jax.lax.psum(inodes, AXIS)
            # else: each shard computed its own beams' whole fields; the
            # (B, P) output is simply beam-sharded (out_specs below)
            return (jax.lax.psum(edep, AXIS), inodes,
                    st2, jax.lax.psum(of, AXIS))

        trace_j = jax.jit(jax.shard_map(
            sharded, mesh=mesh,
            in_specs=(Pspec(),
                      Pspec(AXIS) if gain_sharded else Pspec(),
                      Pspec(AXIS), Pspec(AXIS)),
            out_specs=(Pspec(),
                       Pspec() if n_local is None else Pspec(AXIS),
                       Pspec(AXIS), Pspec()),
            check_vma=False))
    else:
        trace_j = jax.jit(local)

    def _checked(trace_j):
        def trace(field4, gain, bid_, st):
            """One gain-coupled trace + the hard-error checks, fenced with
            a single scalar fetch."""
            out = trace_j(field4, gain, bid_, st)
            if segments is not None:
                edep, inodes, st2, of, dropped = out
                of, nd = (int(x) for x in jax.device_get((of, dropped)))
                if nd:
                    if cfg.cbet_plan_headroom > 0.0:
                        raise DroppedAliveRaysError(
                            f"CBET compaction dropped {nd} still-alive rays "
                            "— the cbet_plan_headroom="
                            f"{cfg.cbet_plan_headroom} liveness assumption "
                            "was violated (a ray was amplified past its "
                            "planned-death threshold)")
                    raise DroppedAliveRaysError(
                        f"CBET compaction dropped {nd} still-alive rays — "
                        "the gain-proof tile plan was violated (stale plan "
                        "cache?); clear the plan cache or set "
                        "cbet_segmented=False")
            else:
                edep, inodes, st2, of = out
                of = int(jax.device_get(of))
            rt.check_overflow(of, cfg)
            if nb_pad != cfg.nbeams and not gain_sharded:
                # crop the phantom (all-dead padding) beams' zero rows off
                # the beam-sharded intensity; edep/state are beam-agnostic.
                # When the gain table is beam-sharded (gain_sharded), the
                # phantom rows stay through the whole iteration (they carry
                # exact zeros and keep the beam axis evenly sharded); the
                # final result crops them once (_cbet_solve_once)
                inodes = inodes[:cfg.nbeams]
            return edep, inodes, st2
        return trace

    trace = _checked(trace_j)

    # LIGHT iteration trace (Config.cbet_light_iterations): same trace
    # with the edep deposit skipped — intermediate fixed-point iterations
    # discard edep, so the final full trace (same gain) reproduces it
    # identically (tested bit-equal).  OPT-IN ONLY: measured SLOWER on chip
    # at OMEGA scale (artifacts/cbet_r04c.json — light 50.5 s vs full
    # 28.2 s; the gamma/uout-only kernel's per-iteration trace is 5.5 s vs
    # the full kernel's 4.45 s), so auto (None) means OFF.  Single-device.
    trace_light = None
    if cfg.cbet_light_iterations:
        if n_dev > 1:
            raise ValueError(
                "cbet_light_iterations=True is single-device only (mesh "
                "solves run full iterations)")
        local_light = make_cbet_trace_fn(
            cfg, ctx, backend, intensity_scatter=False,
            tiles_per_group=tpg, segments=segments, seg_tpgs=seg_tpgs,
            n_local_beams=n_local, gain_local=gain_sharded,
            edep_skip=True)()
        trace_light = _checked(jax.jit(local_light))

    # the per-step lookup table is always full-resolution; coarse gain
    # fields (cbet_grid_downsample > 1) are trilinearly upsampled once per
    # iteration (cheap) rather than sampled at coarse nodes per step
    # (measured to distort the coupled edep by >half the CBET effect).
    # zero_gain is a FACTORY: the (B, P) zeros (1.9 GB at config 4) are
    # used once per solve (iteration 0) — pinning them in every cached
    # solver would hold up to _SOLVER_CACHE_MAX copies of pure zeros in HBM
    def make_zero_gain():
        if gain_sharded:
            # the beam-sharded table: phantom-inclusive beam axis, sharded
            # over the mesh so iteration 0's trace sees the same layout
            # every later iteration's gain_fn output has
            from jax.sharding import NamedSharding, PartitionSpec as _P
            return jax.device_put(
                jnp.zeros((nb_pad, cfg.nx * cfg.ny * cfg.nz),
                          jnp.dtype(cfg.dtype)),
                NamedSharding(mesh, _P(AXIS)))
        return jnp.zeros((cfg.nbeams, cfg.nx * cfg.ny * cfg.nz),
                         jnp.dtype(cfg.dtype))

    upsample = (make_gain_upsampler(cfg) if cfg.cbet_grid_downsample > 1
                else (lambda g: g))

    # Anderson(m=1) mixing (Config.cbet_accel="anderson") — same one-fused-
    # dispatch rule as _step_update.  _accel_first IS the plain relaxed
    # step (bit-identical update), returned with the residual f_k to seed
    # the secant history; _accel_next subtracts the least-squares secant
    # correction gamma*(dx + relax*df).  The dot products run on the
    # SCALE-NORMALIZED residuals (gamma is invariant under the common
    # scaling, and raw intensity residuals squared overflow f32 at
    # config-4 magnitudes); gamma is safeguarded: 0 on a degenerate
    # secant, clipped to [-2, 2] (an uncorrected step is always the
    # fallback — the plain damped iteration is known-convergent).
    @jax.jit
    def _accel_first(i_new, i_old, relax):
        f = i_new - i_old
        delta = jnp.max(jnp.abs(f))
        scale = jnp.max(jnp.abs(i_old))
        return delta, scale, i_old + relax * f, f

    @jax.jit
    def _accel_next(i_new, i_old, prev_x, prev_f, relax):
        f = i_new - i_old
        delta = jnp.max(jnp.abs(f))
        scale = jnp.max(jnp.abs(i_old))
        s = jnp.maximum(scale, jnp.finfo(f.dtype).tiny)
        fs = (f / s).ravel()
        dfs = ((f - prev_f) / s).ravel()
        den = jnp.vdot(dfs, dfs)
        gamma = jnp.where(den > 0,
                          jnp.vdot(fs, dfs) / jnp.maximum(den, jnp.finfo(
                              f.dtype).tiny), 0.0)
        gamma = jnp.clip(gamma, -2.0, 2.0).astype(f.dtype)
        x_next = (i_old + relax * f) - gamma * ((i_old - prev_x)
                                                + relax * (f - prev_f))
        return delta, scale, x_next, f

    if n_dev == 1:
        imode = ("grouped" if _grouped_intensity_ok(cfg, rb)
                 else "scatter")
    else:
        imode = "beam_sharded" if n_local is not None else "scatter"
    return _CbetSolver(gain_fn=gain_fn, upsample=upsample, trace=trace,
                       trace_light=trace_light,
                       step_update=_step_update, state0=state0, bid=bid,
                       make_zero_gain=make_zero_gain, intensity_mode=imode,
                       segmented=segments is not None,
                       crop_intensity=(cfg.nbeams if gain_sharded
                                       and nb_pad != cfg.nbeams else None),
                       gain_sharded=gain_sharded,
                       accel_first=_accel_first, accel_next=_accel_next)


def cbet_solve(cfg: Config, ctx: rt.TraceContext, mesh=None,
               backend: str | None = None, verbose: bool = False,
               cache_dir: str | None = None) -> CbetResult:
    """Fixed-point CBET solve (batched over beam pairs) — see
    ``_cbet_solve_once`` for the solve itself.

    ``cfg.cbet_plan_headroom > 0`` is SAFE BY RETRY here: if the tighter
    segmented-trace plan ever drops a still-alive ray (its liveness
    assumption violated by amplification), the solve re-plans gain-proof
    (headroom 0 — a strict liveness superset under any gain) and re-solves
    from scratch, with a warning.  At headroom 0 the dropped-alive error
    still raises: there it means a stale plan cache, not a model
    assumption."""
    try:
        return _cbet_solve_once(cfg, ctx, mesh, backend, verbose, cache_dir)
    except DroppedAliveRaysError as e:
        if cfg.cbet_plan_headroom <= 0.0:
            raise
        import sys
        print(f"warning: {e} — re-planning gain-proof (headroom 0) and "
              "re-solving", file=sys.stderr)
        return _cbet_solve_once(cfg.replace(cbet_plan_headroom=0.0), ctx,
                                mesh, backend, verbose, cache_dir)


def _cbet_solve_once(cfg: Config, ctx: rt.TraceContext, mesh=None,
                     backend: str | None = None, verbose: bool = False,
                     cache_dir: str | None = None) -> CbetResult:
    """Fixed-point CBET solve (batched over beam pairs).

    With a multi-device ``mesh``, each iteration's trace is shard_mapped over
    the ray axis with a psum-reduced deposition grid (BASELINE config 5
    structure).  Per-beam intensity stays on the fast grouped Pallas kernel
    whenever every shard owns whole beams (device count divides ``nbeams``
    in the uniform beam-contiguous layout): each shard computes its own
    beams' complete fields and the (B, P) intensity comes back sharded
    along the beam axis — no psum, and the all-to-all beam coupling happens
    once per iteration in the gain reduction instead.  Otherwise the
    per-shard beam-offset scatter fallback is used (grouped grids can't see
    beams that straddle shards).

    ``cfg.cbet_segmented``: each iteration's trace runs statically
    compacted on a gain-proof tile plan (measured with stop_fraction=0 —
    or the ``cbet_plan_headroom``-scaled stop rule, see Config).  On a
    mesh this rides the beam-sharded layout (whole beams per shard,
    phantom padding included): every device runs the same segment
    schedule with its own per-shard gather/write-back index arrays as
    sharded arguments.  A beam-straddling (scatter-layout) mesh falls
    back to the unsegmented trace with a warning.  ``cache_dir``
    disk-caches the plan like the base trace's.

    The built solver (jitted trace, device-resident state, segment plan) is
    cached across calls on everything but the iteration-control fields, so a
    1-iteration warm-up solve absorbs the build/compile cost and a
    subsequent measured solve starts iterating immediately."""
    solver = _get_solver(cfg, ctx, mesh, backend, cache_dir)
    trace, state0, bid = solver.trace, solver.state0, solver.bid
    hx, hy, hz = cfg.cbet_grid_shape
    nb = cfg.nbeams

    gain_dtype = jnp.dtype(cfg.dtype)
    # light iterations (solver.trace_light): every fixed-point iteration
    # skips the edep deposit it would discard; ONE full trace with the
    # final iteration's gain reproduces edep identically afterwards
    import time as _time
    tr_it = solver.trace_light or solver.trace
    gain_last = solver.make_zero_gain()
    # iteration 0 (zero gain) is a pure function of (solver, state0):
    # reuse the memoized intensity when the flag allows (bit-identical to
    # recomputing — Config.cbet_seed_zero_gain).  edep/state placeholders
    # are overwritten by the first loop iteration (max_iters >= 1 there).
    seed_ok = cfg.cbet_seed_zero_gain and cfg.cbet_max_iters >= 1
    seeded = seed_ok and solver.seed_intensity is not None
    _t0 = _time.perf_counter()
    if seeded:
        intensity = solver.seed_intensity
        edep = state = None
    else:
        edep, intensity, state = tr_it(ctx.field4, gain_last, bid, state0)
        if seed_ok:
            solver.seed_intensity = intensity
    iter0_seconds = _time.perf_counter() - _t0
    history = []
    iter_seconds = []          # per-iteration wall (fenced by the float()
    #                            materialization of the convergence scalar)
    converged = False
    it = 0

    # NOTE: scalar-rho vector extrapolation was tried here and measured
    # *slower* than plain under-relaxation (16 vs 9 iterations on the
    # two-beam problem) — the damped iteration is already near-optimal.
    # The FIELD-LEVEL least-squares form (Anderson m=1,
    # Config.cbet_accel="anderson") was then built and MEASURED: same 5
    # iterations at the production tol 5e-3 (artifacts/
    # cbet_accel_r05.json); it wins only at tight tolerances (4 vs 5 at
    # 1e-5 on the two-beam problem), so it stays opt-in.
    accel = cfg.cbet_accel == "anderson"
    prev_x = prev_f = None
    for it in range(1, cfg.cbet_max_iters + 1):
        _t0 = _time.perf_counter()
        gain = solver.upsample(solver.gain_fn(intensity.astype(jnp.float32))
                               ).astype(gain_dtype)
        if verbose:
            # fence: dispatch is async and block_until_ready is a no-op on
            # the tunneled backend — without a fetch, the gain bucket below
            # would time only dispatch and the gain kernel's compute would
            # land in the trace bucket (the repeated measurement landmine)
            jax.device_get(gain[0, 0])
        _t1 = _time.perf_counter()
        gain_last = gain
        edep, i_new, state = tr_it(ctx.field4, gain, bid, state0)
        _t2 = _time.perf_counter()
        if not accel:
            d_dev, s_dev, blended = solver.step_update(
                i_new, intensity, float(cfg.cbet_relax))
        elif prev_f is None:
            d_dev, s_dev, blended, f_cur = solver.accel_first(
                i_new, intensity, float(cfg.cbet_relax))
        else:
            d_dev, s_dev, blended, f_cur = solver.accel_next(
                i_new, intensity, prev_x, prev_f, float(cfg.cbet_relax))
        delta = float(d_dev) / max(float(s_dev), 1e-300)
        _t3 = _time.perf_counter()
        history.append(delta)
        iter_seconds.append(round(_t3 - _t0, 3))
        if verbose:
            print(f"cbet iter {it}: rel delta {delta:.3e} "
                  f"[gain {_t1 - _t0:.2f}s trace {_t2 - _t1:.2f}s "
                  f"update {_t3 - _t2:.2f}s]", flush=True)
        if delta < cfg.cbet_tol:
            intensity = i_new
            converged = True
            break
        if accel:
            # the secant history: x_k (the pre-update iterate) and its
            # residual — python references, no device copies
            prev_x, prev_f = intensity, f_cur
        intensity = blended

    if solver.trace_light is not None:
        # the final full trace: same gain as the last executed iteration ->
        # identical edep/state/intensity to the non-light solve (pure
        # dead-work elimination; tested bit-equal)
        _t0 = _time.perf_counter()
        edep, _, state = solver.trace(ctx.field4, gain_last, bid, state0)
        if verbose:
            print(f"cbet final edep trace {_time.perf_counter() - _t0:.2f}s",
                  flush=True)

    # result materialization: the converged fields + final ray state leave
    # the device here (~250 MB at OMEGA scale).  Timed separately in stats:
    # through the debug tunnel this D2H runs at ~22 MB/s (~12 s) while on
    # local hardware it is milliseconds of PCIe — the same accounting
    # bench.py applies to the trace's edep fetch
    _tf = _time.perf_counter()
    stats = rt.trace_stats(ctx, state, state0)
    if solver.crop_intensity is not None:
        # beam-sharded gain table: phantom beam rows (exact zeros) rode
        # through the iteration to keep the beam axis evenly sharded —
        # crop them once here, device-side, before the fetch
        intensity = intensity[:solver.crop_intensity]
    edep_h = np.asarray(jax.device_get(edep), np.float64)
    inten_h = np.asarray(jax.device_get(intensity), np.float64).reshape(
        nb, hx, hy, hz)
    stats["result_fetch_seconds"] = round(_time.perf_counter() - _tf, 3)
    stats["intensity_mode"] = solver.intensity_mode
    stats["segmented"] = solver.segmented
    stats["gain_sharded"] = solver.gain_sharded
    stats["light_iterations"] = solver.trace_light is not None
    stats["gain_mode"] = cfg.cbet_gain_mode
    stats["gain_rows2"] = cfg.cbet_gain_rows2
    stats["relax"] = cfg.cbet_relax
    stats["accel"] = cfg.cbet_accel
    stats["plan_headroom"] = cfg.cbet_plan_headroom
    # per-iteration wall clocks: each is fenced by the host materialization
    # of the convergence scalar, so iteration 1 also absorbs iteration 0's
    # async-dispatched compute (iter0_seconds is dispatch-only unless
    # seeded).  The self-diagnostics bench.py uses to attribute tunnel
    # stalls (VERDICT r04 #1).
    stats["iter_seconds"] = iter_seconds
    stats["iter0_seconds"] = round(iter0_seconds, 3)
    stats["seeded_zero_gain"] = bool(seeded)
    return CbetResult(
        edep=edep_h, intensity=inten_h,
        iterations=it, converged=converged, history=history, stats=stats)
