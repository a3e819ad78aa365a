"""Runtime configuration for the TPU CBET ray tracer.

Everything the reference fixes at compile time through the preprocessor
(``/root/reference/def.cuh:25-131``) is a runtime field here, with identical
derived-quantity formulas.  A frozen dataclass keeps configs hashable so they
can be closed over by ``jax.jit``-compiled functions.

Two behavioral modes:

* ``parity="clean"`` (default): all ``nrays`` rays per beam are traced.
* ``parity="reference"``: reproduces the reference's silent truncation of
  rays — the CUDA launch grid uses ``threads_per_beam // threads_per_block``
  blocks, dropping ``nrays % 256`` (=144) rays per beam
  (``main.cu:161``, ``def.cuh:127-129``).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Literal

from . import constants as k


@dataclasses.dataclass(frozen=True)
class Config:
    # --- grid (def.cuh:33-53) ---
    nx: int = 100
    ny: int = 100
    nz: int = 100
    xmin: float = -0.13
    xmax: float = 0.13
    ymin: float = -0.13
    ymax: float = 0.13
    zmin: float = -0.13
    zmax: float = 0.13
    nr: int = 443                     # radial profile table length (def.cuh:33)

    # --- beams / rays (def.cuh:55-58, 71-78, 89-92, 119) ---
    nbeams: int = 60
    beam_min_x: float = -450.0e-4
    beam_max_x: float = 450.0e-4
    rays_per_zone: int = 4
    sigma: float = 0.0375             # super-Gaussian width of beam power
    intensity: float = 1.0e14         # beam intensity [W/cm^2]
    focal_length: float = 0.1
    offset: float = 0.5e-4            # unused by the reference kernel; kept for parity

    # --- time stepping (def.cuh:80-87) ---
    courant_mult: float = 0.5

    # --- physics toggles (def.cuh:118; launch_ray_XZ.cu:299-311) ---
    absorption: bool = True
    # The reference hard-codes 10.0 in eta instead of Z=3.1
    # (launch_ray_XZ.cu:299 vs def.cuh:100); override here if desired.
    eta_z_factor: float = k.ETA_Z_FACTOR
    # termination threshold: ray stops below this fraction of initial energy
    # (launch_ray_XZ.cu:351)
    stop_fraction: float = 0.05
    # cell-search tolerance "half" (launch_ray_XZ.cu:132, 164)
    cell_tol: float = 0.5001

    # --- power-profile table (main.cu:102-110) ---
    pow_table_len: int = 2001
    pow_table_max: float = 0.1

    # --- CBET stage (def.cuh:94-114; not implemented by the reference) ---
    cbet_max_iters: int = 30
    # convergence: max relative intensity-field change between iterations.
    # 5e-3 is the recorded full-60-beam production setting (BASELINE.md:
    # 9 iterations; the field change is already ~100x below the physical
    # 0.3-0.5 first-iteration redistribution); tighten for studies.
    cbet_tol: float = 5e-3
    # Under-relaxation of the intensity-field update.  The fixed point is
    # relax-independent (tests/test_cbet.py::test_cbet_relax_invariant_
    # fixed_point); the coupling map is strongly contractive at OMEGA
    # intensities, so damping only adds iterations: the 60-beam on-chip
    # sweep (artifacts/cbet_relax_r03.json) measured 9 iters at 0.5 vs 5
    # at 0.9/1.0, deltas monotone even at 1.0, cross-relax converged edep
    # within tolerance truncation (~1e-3 at tol 5e-3).  0.9 keeps a
    # damping margin for stronger-coupling scenes; oscillation shows up
    # as non-monotone res.history / converged=False, never silently.
    cbet_relax: float = 0.9
    # Fixed-point acceleration of the intensity update.  "anderson" is
    # Anderson mixing with depth 1 (a field-level secant step on the
    # residual f_k = G(x_k) - x_k, mixing parameter = cbet_relax): the
    # first update is exactly the plain relaxed step, later updates
    # subtract gamma*(dx_k + relax*df_k) with gamma the least-squares
    # coefficient <f_k, df_k>/<df_k, df_k>, safeguarded (gamma -> 0 on a
    # degenerate secant, clipped to [-2, 2]).  Same map, same fixed
    # point — the converged field is within the cbet_tol truncation of
    # the plain iteration's (test_cbet_accel_anderson_fixed_point); the
    # earlier SCALAR-rho extrapolation measured slower (models/cbet.py
    # solve-loop note) — this is the field-level least-squares form.
    # Costs 2 extra intensity-field buffers of HBM.  MEASURED on chip
    # (artifacts/cbet_accel_r05.json): at the production tol 5e-3 the
    # 60-beam solve converges in the SAME 5 iterations (the pre-
    # asymptotic iterations dominate and the m=1 secant buys nothing);
    # the win appears only in the asymptotic regime — 4 vs 5 iterations
    # at tol 1e-5 on the two-beam problem.  Stays opt-in for
    # tight-tolerance studies; the committed CBET regression golden is
    # recorded on the plain path.
    cbet_accel: Literal["none", "anderson"] = "none"
    machnum: float = k.MACH           # flow Mach number (def.cuh:99; machnum undefined there)
    ncrossings_mult: int = 3          # ncrossings = mult*nx (def.cuh:96)
    # CBET gain-lookup stride: 1 samples the gain field at every step's
    # cell (the oracle-validated model); when equal to deposit_batch_steps
    # the lookup happens once per deposit window (at the window-entry cell,
    # applied per step along the window's path) — rays travel ~0.5 cells
    # per step, so a 5-step window samples the smooth gain field ~2.5 cells
    # apart instead of ~0.5.  Cuts the dominant per-iteration gather cost
    # ~5x; measured accuracy impact recorded in BASELINE.md.
    cbet_gain_stride: int = 1
    # CBET gain application model:
    # * "lookup": per-step nearest-node gain-table lookup at the ray's cell
    #   (one 1-wide gather per step from the (B, P) table — measured
    #   latency-bound at ~15-21 ms/step, the dominant CBET cost), optionally
    #   strided per deposit window (cbet_gain_stride).
    # * "kernel": the tile-window gain contraction — TRILINEAR gain at every
    #   step's deposit position, computed INSIDE the deposit kernel as the
    #   transpose of the deposit contraction (reuses the same hat/M
    #   matrices; ~+50% MXU, zero gathers).  The window's per-step factors
    #   are cumulative-multiplied and applied to deposits in-kernel and to
    #   the intensity contributions/ray energies after it — exact by
    #   multiplicative separability of gain and absorption, with the EXACT
    #   termination rule applied in-kernel from the true gained energy.
    #   The trilinear sampling position (vs the lookup's entry-cell node)
    #   is the mode's only model deviation (measured in BASELINE.md).
    #   Requires the batched deposit path (deposit_batch_steps dividing
    #   the chunk lengths); single-device VMEM-grid Pallas or the XLA
    #   scatter backend (tests/CPU).
    # * "kernel_cell": the window contraction with the LOOKUP mode's exact
    #   sampling — single-node gain at each step's ENTRY cell (= the
    #   previous step's post-step cell; the window-entry cell for step 0),
    #   selected in-kernel by one-hot rows against the beam's gain window.
    #   With the exact in-kernel termination rule this mode is IDENTICAL
    #   to the per-step lookup on every parity-bearing output (edep,
    #   intensity, uray, alive — tested to ~1e-12 in f64); only the
    #   positions/velocities of mid-window energy-dead rays differ (frozen
    #   at the window end instead of the death step), which no output
    #   depends on.  Same path requirements as "kernel"; it removes the
    #   dominant per-step gain gathers from the CBET iteration at zero
    #   model cost.  NOTE: kernel_cell gain lookups bypass the
    #   cbet_gain_sliced per-beam fast path only on the Pallas form (the
    #   XLA form routes through it).
    cbet_gain_mode: Literal["lookup", "kernel", "kernel_cell"] = "lookup"
    # Per-beam-sliced gain-table gathers in "lookup" mode: the CBET ray
    # layout is beam-contiguous (uniform tiles_per_group), so each beam's
    # slots can gather from its OWN (P,) 4 MB gain row instead of the full
    # (B, P) table — gather rows from a 4 MB table measured 7.7 ns vs 13.8
    # from the 245 MB table (DESIGN_NOTES).  Values are identical (same
    # elements, sliced); runs single-device and on beam-sharded meshes
    # (per-shard dynamic row slices); only the beam-straddling scatter
    # mesh layout falls back to the beam-offset gather.  Measured on chip:
    # the exact 60-beam solve 181.3 -> 131.8 s (-27%) with bit-identical
    # results — default on.
    cbet_gain_sliced: bool = True
    # Pad the sliced per-beam gain rows to 2-wide (value duplicated):
    # 1-wide (4 B) gather rows measured 1.6x SLOWER than 2-wide (9.1 vs
    # 5.6 ms/step at 1.23M rows — artifacts/gather_dedup_r04.json), so the
    # duplicated table buys ~40% on the dominant CBET gain-gather cost for
    # 2x its HBM footprint.  None = auto: enabled when the duplicated
    # table stays under ~1.5 GB (ON at OMEGA's 480 MB, OFF at config-4's
    # 3.9 GB full-res lookup table).  Values are identical either way.
    cbet_gain_rows2: bool | None = None
    # Shard the (B, P) gain table along the BEAM axis on beam-sharded
    # meshes (whole beams per shard, "lookup" mode with sliced gathers):
    # each shard holds only its own beams' gain rows — the per-iteration
    # replicated (B, P) gain broadcast (~240 MB at OMEGA scale on EVERY
    # chip) disappears, each chip computes only its 1/D share of the
    # gain-field reduction (from one all-gather of the beam-sharded
    # intensity), and the per-chip gain HBM footprint drops D-fold.
    # Values are identical: the row-restricted gain kernel runs the same
    # partner loop in the same order (phantom partners contribute exact
    # zeros), and the trace's sliced lookups read the same rows locally.
    # None = auto (ON whenever the mesh layout supports it); True errors
    # if the layout doesn't (beam-straddling scatter meshes, kernel gain
    # modes); False forces the replicated table.
    cbet_gain_sharded: bool | None = None
    # LIGHT fixed-point iterations: intermediate CBET iterations discard
    # their edep grid (each iteration's trace overwrites it; only the
    # final one is the answer), so they can skip the edep deposit — the
    # gain-window kernel runs in a gamma/uout-only mode (no M-build, no
    # deposit matmul, no grid RMW) and the batched lookup path skips the
    # edeposit call.  After convergence, ONE extra full trace with the
    # same gain the final iteration used produces edep — the results are
    # IDENTICAL to the non-light solve (same gain -> same trace; tested
    # bit-equal), this is pure dead-work elimination, not a model change.
    # OPT-IN ONLY (measured SLOWER on chip at OMEGA scale: the
    # gamma/uout-only kernel traces at 5.5 s/iter vs the full kernel's
    # 4.45 s — artifacts/cbet_r04c.json — so skipping the deposit LOSES;
    # kept as a tested capability for shapes where deposits dominate).
    # None/False = off; True requires a supporting single-device path
    # (kernel gain modes, or the batched grouped lookup) and errors loud
    # otherwise.
    cbet_light_iterations: bool | None = None
    # Iteration-0 reuse: the fixed-point solve's first trace runs at zero
    # gain, so its intensity output is a pure function of (solver, state0)
    # — identical bits on every solve of the same cached solver.  With this
    # flag the solver memoizes that zero-gain intensity on first compute
    # and every later solve starts the iteration from the memo, skipping
    # one full trace (~4.5 s of the ~28 s OMEGA solve).  EXACT, not an
    # approximation: the seed is the same device array iteration 0 would
    # produce (fixed-point start invariance is not even needed — the start
    # is unchanged).  A fresh process / fresh solver pays the trace once
    # as before; bench.py's warm-up solve is the payer there, stated in
    # BASELINE.md.  Costs one resident (B, P_coarse) f32 intensity per
    # cached solver (~240 MB at OMEGA scale, counted by the HBM preflight).
    cbet_seed_zero_gain: bool = True
    # Static mid-trace tile compaction inside the CBET fixed-point traces:
    # the tile plan is measured with stop_fraction=0 — rays then live until
    # box exit, a strict superset of liveness under ANY gain (gain never
    # alters trajectories) — and the segmented trace additionally counts
    # any still-alive ray compaction drops (hard error / headroom retry).
    # On a mesh this composes with the beam-sharded grouped-intensity
    # layout (whole beams per shard, incl. phantom padding): one segment
    # schedule, per-shard index arrays as sharded arguments
    # (tileplan.split_beam_segments).  Beam-straddling scatter-layout
    # meshes fall back to the unsegmented sharded trace with a warning.
    cbet_segmented: bool = False
    # Liveness headroom of the CBET segmented-trace plan: the plan is
    # measured with stop_fraction * cbet_plan_headroom.  0.0 (gain-proof)
    # keeps every ray "live" until box exit — a strict superset of liveness
    # under ANY gain, but ~17% extra tile-step work on the OMEGA scene
    # (scripts/analyze_cbet_plan_work.py).  h>0 assumes no ray's energy is
    # amplified above (1/h) x its planned-death threshold — e.g. 0.25
    # tolerates 4x amplification where the measured OMEGA redistribution
    # peaks at ~1.3x.  SAFE BY RETRY: the segmented CBET trace counts any
    # dropped still-alive ray, and cbet_solve responds by re-planning
    # gain-proof (headroom 0) and re-solving from scratch, with a warning —
    # a violated assumption costs one wasted partial solve, never a wrong
    # result.
    cbet_plan_headroom: float = 0.0
    # CBET intensity/gain grid coarsening: 1 evaluates the per-beam intensity
    # fields and gain on the full node grid; s>1 uses an s-times-coarser node
    # grid (nodes at full-grid indices 0, s, 2s, ...).  The gain fields are
    # smooth (ion-acoustic response x beam envelopes), so coarsening trades
    # a measured-small model perturbation for s^3-fold cheaper per-iteration
    # gain evaluation, intensity deposition, and gain-table lookups (the
    # three dominant CBET costs — DESIGN_NOTES.md).  The coupled edep stays
    # full-resolution either way.
    cbet_grid_downsample: int = 1

    # --- execution ---
    parity: Literal["clean", "reference"] = "clean"
    dtype: Literal["float32", "float64"] = "float32"
    edep_dtype: Literal["float32", "float64"] = "float64"
    chunk_steps: int = 25             # scan-chunk length for f32->f64 promotion
    # deposition backend: "pallas" (TPU tile-box kernel, VMEM-resident
    # grid), "pallas_hbm" (high-res variant: grid in HBM with per-tile
    # window DMA — required when nz+2 > 128 lanes / the grid exceeds VMEM),
    # "scatter" (XLA scatter-add), "*_interpret" (kernels in interpreter
    # mode, for CPU tests), or "auto" (pick by accelerator + grid size)
    deposit_backend: Literal["auto", "pallas", "scatter", "pallas_interpret",
                             "pallas_hbm", "pallas_hbm_interpret"] = "auto"
    # Launch-tile edge in zones.  4 (-> 256 rays/tile) is the measured sweet
    # spot: 2-zone tiles would halve the kernel's per-ray box area (their
    # rays stay within 19 cells per 5-step window vs 31 for 4-zone), but the
    # ~0.5-0.7us fixed cost per Mosaic dot_general across 3.6x more tiles
    # eats the entire win (measured; batched dot_general is no faster).
    # Whole-trace tile extents are ~92 cells — tiles wander across the whole
    # grid — so the kernel uses dynamic per-window box origins, not static
    # per-tile ones.
    tile_zones: int = 4
    # Pallas deposit box edges (x, y, z): must cover any tile's deposit-node
    # span within one kernel window (deposit_batch_steps steps).  Measured
    # needs on the reference scene (5-step windows, 4-zone tiles): max 31
    # per axis.  The y box is widened +8 internally for sublane alignment
    # (y origin aligns down; 24+8 has covered every observed window).  Box
    # violations are *counted* and raise — never silently dropped.
    deposit_box_x: int = 32
    deposit_box_y: int = 32     # 24 would fit every window but not the up-to-7
                                # sublane-alignment loss (overflowed in round 1)
    deposit_box_z: int = 32
    # exact extrapolated deposit weights on boundary exit steps: the
    # reference's literal corner scheme (launch_ray_XZ.cu:319-348) leaves
    # one NEGATIVE weight when a ray's final step crosses a grid face
    # (deposit precedes the out-of-box break); the default hat build
    # places those rows' weights on the wrong neighbor — conserved but
    # misplaced, quantified at ~1.6e-5 rel-L2 on a boundary-heavy scene
    # and ~7e-7 of total energy at OMEGA geometry
    # (artifacts/boundary_deposit_r05.json), under the 1e-4 accuracy bar.
    # True builds the exact two-one-hot weights (~2x M-build VPU passes).
    deposit_boundary_exact: bool = False
    tiles_per_block: int = 16         # tiles per Pallas grid step (overhead amortization)
    # batch this many steps' deposits into one kernel call (contraction over
    # batch*rays_per_tile rows, one box RMW and one grid pass per batch);
    # silently falls back to 1 when it doesn't divide the chunk lengths.
    # Larger batches grow the kernel's M matrix (batch*rays_per_tile x
    # V_box_xy) — 25 OOMs VMEM, 5 measured ~4% faster than 1
    deposit_batch_steps: int = 5

    @property
    def deposit_box(self) -> tuple:
        return (self.deposit_box_x, self.deposit_box_y, self.deposit_box_z)

    # ===== derived quantities (formulas identical to def.cuh) =====
    @property
    def dx(self) -> float:
        return (self.xmax - self.xmin) / (self.nx - 1)

    @property
    def dy(self) -> float:
        return (self.ymax - self.ymin) / (self.ny - 1)

    @property
    def dz(self) -> float:
        return (self.zmax - self.zmin) / (self.nz - 1)

    @property
    def nrays_x(self) -> int:
        # def.cuh:75
        return int(self.rays_per_zone * math.ceil((self.beam_max_x - self.beam_min_x) / self.dx))

    @property
    def nrays_y(self) -> int:
        # def.cuh:76
        return int(self.rays_per_zone * math.ceil((self.beam_max_x - self.beam_min_x) / self.dy))

    @property
    def nrays(self) -> int:
        return self.nrays_x * self.nrays_y

    @property
    def zones_spanned(self) -> int:
        # launch_ray_XZ.cu:69
        return int(math.ceil((self.beam_max_x - self.beam_min_x) / self.dx))

    @property
    def dt(self) -> float:
        # def.cuh:81
        return self.courant_mult * min(self.dx, self.dz) / k.C_CMS

    @property
    def nt(self) -> int:
        # def.cuh:83-87
        return int((1.0 / self.courant_mult) * max(self.nx, self.nz) * 2.0)

    @property
    def uray_mult(self) -> float:
        # def.cuh:92
        return self.intensity * self.courant_mult / float(self.rays_per_zone ** 2)

    @property
    def ncrossings(self) -> int:
        # def.cuh:96
        return self.ncrossings_mult * self.nx

    @property
    def numstored(self) -> int:
        # per-cell crossing capacity contract (def.cuh:94)
        return 5 * self.rays_per_zone

    @property
    def traced_rays_per_beam(self) -> int:
        """Rays actually traced per beam.

        ``parity="reference"`` reproduces the launch-grid truncation: only
        ``(nrays // 256) * 256`` threads are launched per beam
        (main.cu:161, def.cuh:127-129).
        """
        if self.parity == "reference":
            return (self.nrays // 256) * 256
        return self.nrays

    @property
    def grad_const(self) -> float:
        # main.cu:156
        return (k.C_CMS ** 2) / (2.0 * k.NCRIT) * self.dt * 0.5

    @property
    def dedx_const(self) -> float:
        return self.grad_const / self.dx

    @property
    def dedy_const(self) -> float:
        return self.grad_const / self.dy

    @property
    def dedz_const(self) -> float:
        return self.grad_const / self.dz

    @property
    def cbet_grid_shape(self) -> tuple:
        """Node counts of the (possibly coarsened) CBET intensity/gain grid:
        ceil(n/s) nodes cover full-grid node indices 0, s, ..., exactly the
        stride-``s`` subsample of the full node grid."""
        s = self.cbet_grid_downsample
        return (-(-self.nx // s), -(-self.ny // s), -(-self.nz // s))

    @property
    def edep_shape(self) -> tuple:
        # node-centered grid with one ghost layer per side (def.cuh:131)
        return (self.nx + 2, self.ny + 2, self.nz + 2)

    @property
    def total_rays(self) -> int:
        return self.nbeams * self.nrays

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)


def small_test_config(**kw) -> Config:
    """A shrunken config for fast tests: one beam, few rays, coarse grid."""
    defaults = dict(nbeams=1, rays_per_zone=1, nx=40, ny=40, nz=40, dtype="float64")
    defaults.update(kw)
    return Config(**defaults)
