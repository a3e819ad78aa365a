"""Pallas TPU deposition kernel: tile-boxed separable one-hot matmul binning.

The reference deposits with per-thread ``atomicAdd`` (launch_ray_XZ.cu:341-348).
TPUs have no atomics, and XLA's scatter-add serializes (~8.5 ns/update measured
on v5e — ~80 ms/step for the full OMEGA scene).  This kernel exploits two
structural facts instead:

1. **Separability** — the 8 trilinear corner weights are an outer product of
   per-axis 2-point weights, so one ray-step's deposit is a rank-1 tensor
   ``u * px ⊗ py ⊗ pz`` with 2 nonzeros per axis factor.
2. **Spatial coherence** — rays are ordered into *launch tiles* (a patch of
   adjacent lattice sites in one beam); a tile's live rays stay within a
   measured ~26-cell bounding box for the entire trace, so a 32-cell box
   contains every deposit on every axis.

Per tile the kernel builds per-axis 2-point hat-function weight matrices
(``relu(1 - |(idx - base) - s*d|)`` — exact zeros outside the two target
nodes, so dead/zero-increment rays contribute nothing) directly on a
collapsed x*BYK+y index against constant index planes (Mosaic cannot reshape
non-minor dims into lanes), and contracts rays on the MXU against the z hat:
``E = M^T @ (Wz * inc)`` in bf16 with an hi/lo value split.  The z axis is *boxed* to BZ lanes (3x fewer MACs
than a dense-z contraction) and placed at its dynamic lane offset with a
circular ``pltpu.roll`` over a 128-lane z dimension — so the deposition grid
is carried as (nx+2, ny+2, 128) with z-lanes [nz+2:128] as always-zero pad.
The y origin is aligned down to the 8-sublane boundary (box widened by 8) so
the dynamic update slice stays sublane-aligned; x is a plain outer dimension.

Fixed per-grid-step costs (measured ~5us) are amortized by processing
``tiles_per_block`` tiles per grid step from two packed inputs (int and
float planes) instead of 7 scalar-stream DMAs.

Outputs: the accumulated grid and an overflow counter — live deposits that
missed a box.  Always 0 in valid configurations (tested); nonzero means
``Config.deposit_box`` must be raised.

Optionally the grid output is *grouped* (shape (n_groups, ...)): contiguous
runs of ``tiles_per_group`` tiles accumulate into separate grids — used for
per-beam intensity fields in the CBET stage.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ZLANES = 128


def _kernel(ints_ref, flts_ref, xyidx_ref, *rest, bx, byk, bz, nxp, nyp,
            tb, tiles_per_group, ablate="", gain_cfg=None,
            precise=False, exact_boundary=False):
    # ungrouped: rest = (edep_out_ref, oflow_ref) — the kernel produces this
    # call's deposits on a zeroed grid and the caller adds them to the master
    # (saves a 5.3 MB VMEM input block -> frees room for tiles_per_block=16).
    # grouped: rest = (edep_in_ref, edep_out_ref, oflow_ref) — per-group
    # grids are carried through the aliased in/out pair because an XLA-level
    # add of all group grids per call would cost nbeams x grid of HBM
    # traffic per step.
    # gain-window mode (gain_cfg != None): rest = (gain_tab_ref,
    # edep_out_ref, oflow_ref, gamma_ref) — see _tile_ebox.
    if gain_cfg is not None and len(rest) == 4:
        # gain-only (light-iteration) mode: gamma/uout computed, NO edep
        # deposit — intermediate CBET fixed-point iterations discard edep,
        # so the M-build + deposit matmul + grid RMW are skipped entirely
        gain_tab_ref, oflow_ref, gamma_ref, uout_ref = rest
        edep_in_ref = edep_out_ref = None
    elif gain_cfg is not None:
        gain_tab_ref, edep_out_ref, oflow_ref, gamma_ref, uout_ref = rest
        edep_in_ref = None
    elif len(rest) == 2:
        edep_in_ref, (edep_out_ref, oflow_ref) = None, rest
    else:
        edep_in_ref, edep_out_ref, oflow_ref = rest
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init_oflow():
        oflow_ref[0, 0] = jnp.int32(0)

    if edep_out_ref is not None:
        @pl.when((i * tb) % tiles_per_group == 0)
        def _init_grid():
            if edep_in_ref is None:
                edep_out_ref[...] = jnp.zeros_like(edep_out_ref)
            else:
                edep_out_ref[...] = edep_in_ref[...]

    if gain_cfg is not None:
        # a skipped (no-deposit) tile must still report identity gains and
        # its rays' unchanged (frozen) energies — skipped tiles have
        # inc == 0 everywhere, which implies zero absorption AND zero gain
        # (both vanish with ne), so u is exactly frozen across the window
        batch_g = gain_cfg[0]
        rpt_g = gamma_ref.shape[1] // batch_g
        gamma_ref[...] = jnp.ones_like(gamma_ref)
        uout_ref[...] = flts_ref[:, 5, (batch_g - 1) * rpt_g:].astype(
            jnp.float32)

    nflt = 7 if gain_cfg is not None else 4
    cell_mode = gain_cfg is not None and gain_cfg[2] == "cell"

    def tile_body(t, _):
        cx = ints_ref[t, 0, :]
        inc = flts_ref[t, 3, :]
        live = inc > 0.0
        big = jnp.int32(10000)
        ox = jnp.min(jnp.where(live, cx, big))

        @pl.when(ox < big)
        def _deposit():
            gain = None
            if gain_cfg is not None:
                lag = ([ints_ref[t, 3 + a, :] for a in range(3)]
                       if cell_mode else None)
                gain = (gain_tab_ref.at[0],
                        (flts_ref[t, 4, :], flts_ref[t, 5, :],
                         flts_ref[t, 6, :], lag), gain_cfg)
            out = _tile_ebox(
                [ints_ref[t, a, :] for a in range(3)],
                [flts_ref[t, a, :] for a in range(min(nflt, 4))],
                xyidx_ref, zframe0=0, zmax=ZLANES, bx=bx, byk=byk, bz=bz,
                nxp=nxp, nyp=nyp, ablate=ablate, gain=gain, precise=precise,
                deposit=edep_out_ref is not None,
                exact_boundary=exact_boundary)
            box, x0, y0, bad = out[:4]
            oflow_ref[0, 0] += bad
            if edep_out_ref is not None:
                cur = edep_out_ref[pl.ds(x0, bx), pl.ds(y0, byk), :]
                edep_out_ref[pl.ds(x0, bx), pl.ds(y0, byk), :] = cur + box
            if gain_cfg is not None:
                gamma_ref[t, :] = out[4]
                uout_ref[t, :] = out[5]

        return 0

    jax.lax.fori_loop(0, tb, tile_body, 0)


def _tile_ebox(ints_t, flts_t, xyidx_ref, *, zframe0, zmax, bx, byk, bz,
               nxp, nyp, frame=ZLANES, ablate="", gain=None, precise=False,
               deposit=True, exact_boundary=False):
    """One tile's deposit box: per-axis hat weights contracted over rays on
    the MXU.  Takes the tile's loaded (R,) cell/frac/inc vectors (loaded, not
    ref slices — Mosaic memref slicing needs 128-aligned lane dims).
    Returns ``(box (bx, byk, 128) f32, x0, y0, bad_count)`` where the z box
    sits at lanes ``[z0 - zframe0, ...)`` of the 128-lane frame whose global
    z origin is ``zframe0`` (0 for the VMEM-resident grid; the DMA window
    origin for the HBM-grid kernel).  ``zmax`` bounds the global z origin
    (ZLANES resp. the padded z size).

    ``gain`` enables the CBET tile-window gain contraction (the transpose of
    the deposit, reusing the SAME hat matrices — DESIGN_NOTES "CBET gain
    lookup as a tile-window kernel contraction"): a triple ``(g_ref, ds,
    (batch, clip))`` where ``g_ref`` is this tile's beam's gain field in the
    grid's own padded layout (nxp, nyp_pad, frame) and ``ds`` the (R,) per-
    row path elements (zero on dead rows).  Per row the trilinear gain at
    the deposit position is ``g_r = sum_A mb[r,A] * (hz @ G_box^T)[r,A]``
    (~+50% MXU over the deposit matmul, zero extra M-build); the per-step
    factors ``exp(clip(g_r*ds_r))`` are cumulative-multiplied over the
    window's ``batch`` steps (separable from absorption — both are
    multiplicative) and applied to the deposit increments in-kernel.  A
    fifth return gives the (R, 1) cumulative factors for the caller's
    intensity-contribution and uray corrections.

    ``precise`` skips the bf16 casts (and the hi/lo value split) so
    interpret-mode runs validate against float64 oracles at ~1e-8 — the
    on-chip bf16 deviation is then measured separately (BASELINE.md)."""
    cx, cy, cz = ints_t
    fx, fy, fz, inc = flts_t[:4]
    live = inc > 0.0

    big = jnp.int32(10000)
    ox = jnp.min(jnp.where(live, cx, big))
    oy = jnp.min(jnp.where(live, cy, big))
    oz = jnp.min(jnp.where(live, cz, big))

    # box origins: x free (outer dim); y aligned down to the sublane
    # boundary; z clipped so the BZ-lane box always covers [oz, nzp)
    # within its 128-lane frame
    x0 = jnp.clip(ox, 0, nxp - bx)
    y0 = jnp.clip((oy // 8) * 8, 0, nyp - byk)
    z0 = jnp.clip(oz, 0, zmax - bz)

    r = cx.shape[0]

    def axis_weights(c, frac, origin):
        # per-axis 2-point weights (launch_ray_XZ.cu:319-339): base
        # node cell+1 gets (1-d), signed neighbor cell+1+s gets d,
        # with p = frac - 0.5, d = 1 - |p|
        p = frac - 0.5
        d = 1.0 - jnp.abs(p)
        s = jnp.where(p < 0, -1, 1).astype(jnp.int32)
        base = c + 1 - origin
        return base, base + s, d

    xb, xn, dx_w = axis_weights(cx, fx, x0)
    yb, yn, dy_w = axis_weights(cy, fy, y0)
    zb, zn, dz_w = axis_weights(cz, fz, z0)

    def inside(b, nb, width):
        return (b >= 0) & (b < width) & (nb >= 0) & (nb < width)

    bad = live & ~(inside(xb, xn, bx) & inside(yb, yn, byk)
                   & inside(zb, zn, bz))
    bad_count = jnp.sum(bad.astype(jnp.int32))

    # Per-axis 2-point weights as a hat function: the scheme puts
    # weight (1-d)=|p| at `base` and d at `base+s`, which equals
    # relu(1 - |idx - (base + s*d)|) — zero outside the two target
    # nodes by construction; base+s*d folds to one per-ray constant.
    # Hats are computed in f32; only the final MXU operand is cast
    # to bf16 (one rounding per weight, ~2^-9 random sign -> ~3e-5
    # per node over a full-density run, under the 1e-4 bar; f32 MXU
    # would cost ~4x).
    def peak_col(c, frac, origin):
        # base + s*d as one (R,1) f32 column
        p = frac - 0.5
        d = 1.0 - jnp.abs(p)
        s = jnp.where(p < 0, -1.0, 1.0)
        return ((c + 1 - origin).astype(jnp.float32) + s * d)[:, None]

    qx = peak_col(cx, fx, x0)
    qy = peak_col(cy, fy, y0)
    qz = peak_col(cz, fz, z0)

    def hat(idx_plane, q):
        return jnp.maximum(1.0 - jnp.abs(idx_plane - q), 0.0)

    # M[s, x*BYK+y] = hat_x * hat_y on the collapsed index against
    # constant x/y index planes (Mosaic cannot reshape non-minor
    # dims into lanes).  Computing the y hat on a small (R, BYK) plane
    # and lane-tiling it with pltpu.repeat was measured SLOWER (2.30 ->
    # 2.90 s full trace) — the repeat lowers to per-copy passes that cost
    # more than the 4 hat ops it saves.
    cdt = jnp.float32 if precise else jnp.bfloat16
    xx_of = xyidx_ref[0:1, :].astype(jnp.float32)    # (1, BX*BYK)
    yy_of = xyidx_ref[1:2, :].astype(jnp.float32)
    # gain-only (no-deposit) calls skip the M-build and z-hat entirely
    # unless the "tri" gain mode needs them as its selection rows — the
    # whole point of the light-iteration kernel (intermediate CBET
    # iterations discard edep; see _make_tile_deposit_gain)
    need_mb = deposit or (gain is not None and gain[2][2] == "tri")
    if not need_mb:
        mb = hz = None
    elif ablate == "no_mbuild":
        mb = jnp.full((r, bx * byk), 0.01, cdt)
    elif ablate == "small_hats":
        # candidate build (identical values): per-axis hats on SMALL
        # (R, bx)/(R, byk) planes, combined by bx broadcast-multiplies on
        # the lane dim — ~2-3 VPU passes over (R, A) instead of ~9
        iota_x = jax.lax.broadcasted_iota(
            jnp.int32, (r, bx), 1).astype(jnp.float32)
        iota_y = jax.lax.broadcasted_iota(
            jnp.int32, (r, byk), 1).astype(jnp.float32)
        hx = hat(iota_x, qx)
        hy = hat(iota_y, qy)
        mb = jnp.concatenate([hx[:, x:x + 1] * hy for x in range(bx)],
                             axis=1).astype(cdt)
    elif ablate == "outer_reshape":
        # candidate build: one 3-D outer product collapsed to lanes (works
        # only if Mosaic can merge the two minor dims cheaply)
        iota_x = jax.lax.broadcasted_iota(
            jnp.int32, (r, bx), 1).astype(jnp.float32)
        iota_y = jax.lax.broadcasted_iota(
            jnp.int32, (r, byk), 1).astype(jnp.float32)
        hx = hat(iota_x, qx)
        hy = hat(iota_y, qy)
        mb = (hx[:, :, None] * hy[:, None, :]).reshape(
            r, bx * byk).astype(cdt)
    elif exact_boundary:
        # EXACT 2-point weights for every d, including boundary exit
        # steps where d < 0 and one weight is NEGATIVE — the reference's
        # literal extrapolation into the ghost layer
        # (launch_ray_XZ.cu:319-348; deposit precedes the out-of-box
        # break).  The single hat at base + s*d misplaces those rows'
        # weights (conserved but on the wrong neighbor —
        # artifacts/boundary_deposit_r05.json quantifies the default
        # mode's deviation at ~1.6e-5 rel-L2 on a boundary-heavy scene,
        # well under the 1e-4 bar).  Here the two target nodes are
        # INTEGER-peak hats (exact one-hots) blended with (1-d, d):
        # exact for all d <= 1, at ~2x the M-build VPU passes.
        dxc = dx_w[:, None].astype(jnp.float32)
        dyc = dy_w[:, None].astype(jnp.float32)
        wx = ((1.0 - dxc) * hat(xx_of, xb[:, None].astype(jnp.float32))
              + dxc * hat(xx_of, xn[:, None].astype(jnp.float32)))
        wy = ((1.0 - dyc) * hat(yy_of, yb[:, None].astype(jnp.float32))
              + dyc * hat(yy_of, yn[:, None].astype(jnp.float32)))
        mb = (wx * wy).astype(cdt)
    else:
        # (bf16 hat arithmetic measured SLOWER — the VPU has no 2x
        # bf16 rate and the casts add passes)
        mb = (hat(xx_of, qx) * hat(yy_of, qy)).astype(cdt)
    if need_mb:
        iota_z = jax.lax.broadcasted_iota(
            jnp.int32, (r, bz), 1).astype(jnp.float32)
        if exact_boundary:
            dzc = dz_w[:, None].astype(jnp.float32)
            hz = ((1.0 - dzc) * hat(iota_z, zb[:, None].astype(jnp.float32))
                  + dzc * hat(iota_z, zn[:, None].astype(jnp.float32)))
        else:
            hz = hat(iota_z, qz)

    gam_cum = None
    gain_extra = None
    if gain is not None:
        # CBET tile-window gain contraction (see docstring).  Two sampling
        # modes:
        #   "tri"  — trilinear gain at every row's deposit position = the
        #            TRANSPOSE of the deposit contraction, on the same hat
        #            matrices.  Rows outside the deposit box have all-zero
        #            hats -> g_r = 0 -> unit gain (such rows carry zero
        #            absorption increment, and gain ~ ne is zero wherever
        #            absorption is — edge-of-plasma corner effects excepted).
        #   "cell" — the per-step-lookup model's EXACT sampling: the single
        #            node of each step's entry cell (lag cells ride in as
        #            extra int rows), selected by one-hot rows against the
        #            gain window.  The gain window gets its OWN box origin
        #            (an entry cell can sit one cell outside the deposit
        #            box); live rows falling outside it count as overflow.
        # Both modes apply the EXACT termination rule in-kernel: the mini
        # scan advances without the energy stop (trajectories are energy-
        # independent), and the kernel — which knows the true per-step
        # energy u_true_j = u_nogain_j * gcum_j — masks deposits/intensity
        # past each ray's true death step and returns the frozen true
        # energy per ray (uout), making the window model IDENTICAL to the
        # per-step lookup on every parity-bearing output.
        g_ref, (ds, u_ng, uinit, lag), (batch, clip, mode,
                                        stop_frac) = gain
        if mode == "cell":
            lcx, lcy, lcz = lag
            gox = jnp.min(jnp.where(live, lcx, big))
            goy = jnp.min(jnp.where(live, lcy, big))
            goz = jnp.min(jnp.where(live, lcz, big))
            gx0 = jnp.clip(gox, 0, nxp - bx)
            gy0 = jnp.clip((goy // 8) * 8, 0, nyp - byk)
            gz0 = jnp.clip(goz, 0, zmax - bz)
            lbx = lcx + 1 - gx0
            lby = lcy + 1 - gy0
            lbz = lcz + 1 - gz0
            bad_g = live & ~((lbx >= 0) & (lbx < bx) & (lby >= 0)
                             & (lby < byk) & (lbz >= 0) & (lbz < bz))
            gain_extra = jnp.sum(bad_g.astype(jnp.int32))
            # one-hot selection: a single compare on the collapsed index
            # (a == x*BYK + y <=> x match AND y match), and on the z iota
            tgt = (lbx * byk + lby).astype(jnp.float32)[:, None]
            iota_a = (xyidx_ref[0:1, :] * byk
                      + xyidx_ref[1:2, :]).astype(jnp.float32)
            oh_xy = (iota_a == tgt).astype(jnp.float32)   # (R, A)
            iota_zi = jax.lax.broadcasted_iota(jnp.int32, (r, bz), 1)
            oh_z = (iota_zi == lbz[:, None]).astype(jnp.float32)
            sel_a, sel_z, gz_origin = oh_xy, oh_z, gz0
            gsx, gsy = gx0, gy0
        else:
            sel_a, sel_z, gz_origin = mb.astype(jnp.float32), hz, z0
            gsx, gsy = x0, y0
        gs = g_ref[pl.ds(gsx, bx), pl.ds(gsy, byk), :]    # (bx, byk, F)
        ga = gs.reshape(bx * byk, gs.shape[-1])
        # inverse of the deposit's placement roll: bring lanes
        # [gz0-zframe0, gz0-zframe0+bz) to [0, bz)
        ga = pltpu.roll(ga, zframe0 - gz_origin, 1)[:, :bz]   # (A, BZ)
        if mode == "cell" and not precise:
            # the cell mode is the EXACT model: keep the gain values at
            # f32 precision through the bf16 MXU via an hi/lo lane split
            # (the selector rows are one-hot — exact in bf16 — so this
            # contraction is then exact-f32; K merely doubles 32 -> 64
            # inside one MXU pass)
            ga32 = ga.astype(jnp.float32)
            ga_hi = ga32.astype(cdt)
            ga_lo = (ga32 - ga_hi.astype(jnp.float32)).astype(cdt)
            ga_c = jnp.concatenate([ga_hi, ga_lo], axis=1)    # (A, 2BZ)
            sel_c = jnp.concatenate([sel_z, sel_z], axis=1)   # (R, 2BZ)
        else:
            ga_c, sel_c = ga, sel_z
        t1 = jax.lax.dot_general(
            sel_c.astype(cdt), ga_c.astype(cdt),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)           # (R, A)
        g_r = jnp.sum(sel_a * t1, axis=1, keepdims=True)  # (R, 1)
        gam = jnp.exp(jnp.clip(g_r * ds[:, None].astype(jnp.float32),
                               -clip, clip))
        # cumulative product over the window's steps (rows are step-major
        # within the tile: row j*rpt + ray) — separable from absorption —
        # plus the exact termination machinery: died_j = (u_true_j <= thr),
        # deposits masked from the step AFTER the first death (the killing
        # step still deposits, matching the lookup order), intensity masked
        # FROM the killing step (the lookup's post-step alive mask), and
        # uout = the frozen true energy at death (or the window end).
        rpt_ = r // batch
        thr = (jnp.float32(stop_frac)
               * uinit[:rpt_].astype(jnp.float32)[:, None])   # (rpt, 1)
        parts = [gam[j * rpt_:(j + 1) * rpt_] for j in range(batch)]
        for j in range(1, batch):
            parts[j] = parts[j] * parts[j - 1]
        u_parts = [u_ng[j * rpt_:(j + 1) * rpt_].astype(jnp.float32)[:, None]
                   for j in range(batch)]
        anydied_prev = jnp.zeros((rpt_, 1), jnp.float32)
        medep, mint = [], []
        uout = jnp.zeros((rpt_, 1), jnp.float32)
        for j in range(batch):
            u_true = u_parts[j] * parts[j]
            died = (u_true <= thr).astype(jnp.float32)
            anydied = jnp.maximum(anydied_prev, died)
            medep.append(1.0 - anydied_prev)
            mint.append(1.0 - anydied)
            uout = uout + u_true * died * (1.0 - anydied_prev)
            anydied_prev = anydied
        uout = uout + u_parts[batch - 1] * parts[batch - 1] * (
            1.0 - anydied_prev)
        gam_cum = jnp.concatenate(
            [parts[j] * mint[j] for j in range(batch)], axis=0)   # (R, 1)
        inc_mask = jnp.concatenate(
            [parts[j] * medep[j] for j in range(batch)], axis=0)
        inc = inc * inc_mask[:, 0].astype(inc.dtype)
        gain_extra = (gain_extra if gain_extra is not None
                      else jnp.int32(0)), uout[:, 0]

    if not deposit:
        # gain-only: no deposit box (the caller stores nothing); the
        # deposit-box bounds check above still ran so the overflow
        # semantics match the full kernel's exactly
        out = (None, x0, y0, bad_count)
        if gain is not None:
            bad_gain, uout_rows = gain_extra
            out = (None, x0, y0, bad_count + bad_gain,
                   gam_cum[:, 0], uout_rows)
        return out

    # wi carries the (large) increment: split hi/lo so its value
    # keeps ~16 mantissa bits; hi and lo ride side-by-side in the
    # lane dim so ONE matmul covers both (the MXU pads lanes to 128
    # either way — two bz-lane matmuls would each pay full price)
    wi = hz * inc[:, None]                           # (R, BZ) f32
    wi_hi = wi.astype(cdt)
    wi_lo = (wi - wi_hi.astype(jnp.float32)).astype(cdt)
    dn_ = (((0,), (0,)), ((), ()))
    if precise:
        e = jax.lax.dot_general(mb, wi.astype(jnp.float32),
                                dimension_numbers=dn_,
                                preferred_element_type=jnp.float32)
    elif ablate == "no_mm":
        e = (jnp.zeros((bx * byk, bz), jnp.float32)
             + mb[0:1, 0:bz].astype(jnp.float32)
             + wi_hi[0:1, 0:bz].astype(jnp.float32))
    elif ablate == "no_lo":
        e = jax.lax.dot_general(mb, wi_hi, dimension_numbers=dn_,
                                preferred_element_type=jnp.float32)
    elif ablate == "two_mm":
        e = (jax.lax.dot_general(mb, wi_hi, dimension_numbers=dn_,
                                 preferred_element_type=jnp.float32)
             + jax.lax.dot_general(mb, wi_lo, dimension_numbers=dn_,
                                   preferred_element_type=jnp.float32))
    else:
        wz = jnp.concatenate([wi_hi, wi_lo], axis=1)  # (R, 2BZ)
        e2 = jax.lax.dot_general(mb, wz, dimension_numbers=dn_,
                                 preferred_element_type=jnp.float32)
        e = e2[:, :bz] + e2[:, bz:]
    # place the z-box at its lane offset within the frame: pad, roll
    ef = jnp.pad(e, ((0, 0), (0, frame - bz)))
    ef = pltpu.roll(ef, z0 - zframe0, 1)
    out = (ef.reshape(bx, byk, frame), x0, y0, bad_count)
    if gain is not None:
        bad_gain, uout_rows = gain_extra
        out = (out[0], x0, y0, bad_count + bad_gain,
               gam_cum[:, 0], uout_rows)
    return out


def _kernel_hbm(ints_ref, flts_ref, xyidx_ref, edep_hbm_ref, oflow_ref,
                slab_ref, sem_in, sem_out, *, bx, byk, bz, nxp, nyp, zp,
                tb, exact_boundary=False):
    """High-resolution variant: the deposition grid lives in HBM (it exceeds
    VMEM at 2x grid resolution) and each tile's (bx, byk, 256) window is
    DMA'd in, updated, and DMA'd back.  The z window is two 128-lane frames
    at a 128-aligned origin (DMA minor-dim slices must be provably
    128-aligned), so a bz<=64 box straddling a frame boundary always fits.
    Tiles run sequentially on the one core, so overlapping windows are
    ordered by construction (each out-DMA completes before the next in-DMA
    starts)."""
    i = pl.program_id(0)
    zwin = 2 * ZLANES

    @pl.when(i == 0)
    def _init_oflow():
        oflow_ref[0, 0] = jnp.int32(0)

    def tile_body(t, _):
        cx = ints_ref[t, 0, :]
        cz = ints_ref[t, 2, :]
        inc = flts_ref[t, 3, :]
        live = inc > 0.0
        big = jnp.int32(10000)
        ox = jnp.min(jnp.where(live, cx, big))

        @pl.when(ox < big)
        def _deposit():
            oz = jnp.min(jnp.where(live, cz, big))
            z0 = jnp.clip(oz, 0, zp - bz)
            zw = jnp.clip((z0 // ZLANES) * ZLANES, 0, zp - zwin)
            zw = pl.multiple_of(zw, ZLANES)
            box, x0, y0, bad = _tile_ebox(
                [ints_ref[t, a, :] for a in range(3)],
                [flts_ref[t, a, :] for a in range(4)],
                xyidx_ref, zframe0=zw, zmax=zp, bx=bx, byk=byk, bz=bz,
                nxp=nxp, nyp=nyp, frame=zwin,
                exact_boundary=exact_boundary)
            y0 = pl.multiple_of(y0, 8)
            oflow_ref[0, 0] += bad
            window = edep_hbm_ref.at[pl.ds(x0, bx), pl.ds(y0, byk),
                                     pl.ds(zw, zwin)]
            cp_in = pltpu.make_async_copy(window, slab_ref, sem_in)
            cp_in.start()
            cp_in.wait()
            slab_ref[...] += box
            cp_out = pltpu.make_async_copy(slab_ref, window, sem_out)
            cp_out.start()
            cp_out.wait()

        return 0

    jax.lax.fori_loop(0, tb, tile_body, 0)


def make_tile_deposit(nx: int, ny: int, nz: int, rays_per_tile: int,
                      box: tuple[int, int, int] | int = (28, 24, 32),
                      tiles_per_block: int = 8,
                      n_groups: int = 1, tiles_per_group: int | None = None,
                      interpret: bool = False, _ablate: str = "",
                      gain_window: tuple | None = None,
                      gain_only: bool = False,
                      precise: bool = False,
                      exact_boundary: bool = False):
    """Build the deposit function
    ``(edep, cx, cy, cz, fx, fy, fz, inc) -> (edep, overflow)``.

    Per-ray inputs are flat (n_tiles*rays_per_tile,) int32/float32 arrays in
    tile order; ``inc`` must already be zero for dead/masked rays.  ``edep``
    is the y/z-padded grid of :func:`edep_zpad_shape` — with a leading
    (n_groups,) dim when grouped — float32; use :func:`finalize_edep` to
    unpad.

    ``gain_window=(n_beams, tiles_per_group_gain, batch, clip, mode,
    stop_fraction)`` builds the CBET window-gain variant instead
    (ungrouped only; ``mode`` is "tri" — trilinear sampling at deposit
    positions — or "cell" — the per-step-lookup model's exact entry-cell
    single-node sampling): see :func:`_make_tile_deposit_gain` for the
    signature and the exact in-kernel termination contract.
    ``gain_tab`` is the (n_beams, nx+2, yp, zp) per-beam gain field in the
    grid's padded layout (tiles must be beam-contiguous,
    ``tiles_per_group_gain`` per beam).  ``rays_per_tile`` here counts
    contraction ROWS (rays x batch).  ``precise`` disables bf16
    (validation builds)."""
    nxp, nyp, nzp = nx + 2, ny + 2, nz + 2
    if nzp > ZLANES:
        raise NotImplementedError(
            f"VMEM tile deposit kernel requires nz+2 <= {ZLANES} lanes, got "
            f"{nzp}; use make_tile_deposit_hbm (deposit_backend='pallas_hbm')")
    if isinstance(box, int):
        box = (box, box, box)
    yp = edep_zpad_shape(nx, ny, nz)[1]
    bx = min(box[0], nxp)
    # +8: the y origin is aligned down to the sublane boundary; byk itself is
    # kept a multiple of 8 so the origin's upper clip (yp - byk) stays
    # 8-aligned
    byk = min(-(-(box[1] + 8) // 8) * 8, yp)
    bz = min(box[2], ZLANES)
    r = rays_per_tile
    tb = tiles_per_block
    if gain_window is not None:
        assert n_groups == 1, "gain-window mode is ungrouped-only"
        return _make_tile_deposit_gain(
            nxp=nxp, nzp=nzp, yp=yp, bx=bx, byk=byk, bz=bz, r=r, tb=tb,
            gain_window=gain_window, interpret=interpret, precise=precise,
            gain_only=gain_only, exact_boundary=exact_boundary)
    if gain_only:
        raise ValueError("gain_only requires gain_window")

    def deposit(edep, cx, cy, cz, fx, fy, fz, inc):
        n_tiles = cx.shape[0] // r
        assert n_tiles % tb == 0, (n_tiles, tb)
        # grouping is signalled by tiles_per_group (a beam-sharded caller
        # legitimately has n_groups == 1: one whole beam per shard)
        grouped = tiles_per_group is not None
        tpg = tiles_per_group if grouped else n_tiles
        assert tpg % tb == 0, (tpg, tb)
        if grouped and n_tiles > n_groups * tpg:
            # raise, not assert: the group block index map clamps, so the
            # overflowing tiles' deposits would silently pour into the
            # LAST group's grid (and re-fire the grid init) — corrupt
            # per-beam fields with overflow still 0.  FEWER tiles is
            # legitimate (trailing groups are never visited and pass
            # through via the in/out aliasing — e.g. a single group
            # spanning all tiles with the remaining beam grids untouched).
            raise ValueError(
                f"grouped deposit called with {n_tiles} tiles > "
                f"n_groups*tiles_per_group = {n_groups}*{tpg}")
        gshape = ((n_groups, nxp, yp, ZLANES) if grouped
                  else (nxp, yp, ZLANES))
        assert edep.shape == gshape, (edep.shape, gshape)

        kern = functools.partial(_kernel, bx=bx, byk=byk, bz=bz, nxp=nxp,
                                 nyp=yp, tb=tb, tiles_per_group=tpg,
                                 ablate=_ablate, precise=precise,
                                 exact_boundary=exact_boundary)
        if grouped:
            # single-buffer the group grids: default double buffering holds
            # 2x(in+out) ~21 MB of VMEM and OOMs; the block changes only every
            # tiles_per_group/tb grid steps so pipelining it buys nothing
            gspec = pl.BlockSpec((1, nxp, yp, ZLANES),
                                 lambda i: (i * tb // tpg, 0, 0, 0),
                                 memory_space=pltpu.VMEM,
                                 pipeline_mode=pl.Buffered(buffer_count=1))
        else:
            gspec = pl.BlockSpec((nxp, yp, ZLANES), lambda i: (0, 0, 0),
                                 memory_space=pltpu.VMEM)
        in_specs = [
            pl.BlockSpec((tb, 3, r), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, 4, r), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, bx * byk), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
        if grouped:
            in_specs.append(gspec)
        grid_spec = pl.GridSpec(
            grid=(n_tiles // tb,),
            in_specs=in_specs,
            out_specs=[
                gspec,
                pl.BlockSpec((1, 1), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
            ],
        )
        ints = jnp.stack([a.reshape(n_tiles, r) for a in (cx, cy, cz)],
                         axis=1)
        flts = jnp.stack([a.reshape(n_tiles, r) for a in (fx, fy, fz, inc)],
                         axis=1)
        jxy = jnp.arange(bx * byk, dtype=jnp.int32)
        xyidx = jnp.stack([jxy // byk, jxy % byk])

        if grouped:
            # grouped grids arrive with a leading block dim of 1
            def kernel_fn(i_ref, f_ref, xy_ref, gin, gout, of):  # noqa: ANN001
                kern(i_ref, f_ref, xy_ref, gin.at[0], gout.at[0], of)

            edep_out, oflow = pl.pallas_call(
                kernel_fn,
                grid_spec=grid_spec,
                out_shape=[
                    jax.ShapeDtypeStruct(gshape, jnp.float32),
                    jax.ShapeDtypeStruct((1, 1), jnp.int32),
                ],
                input_output_aliases={3: 0},
                # the aliased in+out group grids plus the batched hat/M
                # temporaries exceed the 16 MB default scoped-vmem budget by
                # <1 MB at deposit_batch_steps=5; v5e has 128 MiB physical
                # VMEM, so raise the cap rather than shrink the batch
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=32 * 1024 * 1024),
                interpret=interpret,
            )(ints, flts, xyidx, edep)
        else:
            delta, oflow = pl.pallas_call(
                kern,
                grid_spec=grid_spec,
                out_shape=[
                    jax.ShapeDtypeStruct(gshape, jnp.float32),
                    jax.ShapeDtypeStruct((1, 1), jnp.int32),
                ],
                # the default 16 MB scoped-vmem cap binds before physical
                # VMEM does (128 MiB on v5e): the batched M/hat temporaries
                # scale with deposit_batch_steps (batch 10 needs ~28 MB)
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=64 * 1024 * 1024),
                interpret=interpret,
            )(ints, flts, xyidx)
            edep_out = edep + delta
        return edep_out, oflow[0, 0]

    return deposit


def _make_tile_deposit_gain(*, nxp, nzp, yp, bx, byk, bz, r, tb,
                            gain_window, interpret, precise,
                            gain_only=False, exact_boundary=False):
    """The CBET window-gain deposit builder (see make_tile_deposit).

    The per-beam gain table rides as a grouped VMEM input block (one 128-
    lane-padded beam grid at a time, single-buffered like the grouped
    intensity grids — the block changes only at beam boundaries), so the
    kernel's window access is a plain dynamic VMEM slice, not a manual
    DMA.

    Signature of the returned function (``mode="cell"`` adds the three
    ``lc*`` lag-cell streams — each step's ENTRY cell):
    ``(edep, cx, cy, cz, fx, fy, fz, inc, ds, u, uinit, [lcx, lcy, lcz,]
    gain_tab) -> (edep, overflow, gamma, uout)`` where ``u`` is the
    gain-free POST-step energy per row, ``uinit`` the launch energy,
    ``gamma`` the (n_tiles, r) cumulative gain factors masked by the exact
    post-step aliveness (multiply the gain-free intensity contributions),
    and ``uout`` the (n_tiles, rays_per_tile) exact frozen true energy per
    ray at the window end (callers update ``uray`` and re-derive ``alive``
    as ``uout > stop_fraction * uray_init``).

    ``gain_only`` (light CBET iterations, Config.cbet_light_iterations):
    gamma/uout only — ``edep`` is passed through UNTOUCHED and the
    M-build, deposit matmul, and grid read-modify-write are skipped
    entirely (intermediate fixed-point iterations discard edep; only the
    final trace needs it).  Overflow semantics are identical to the full
    kernel's (the deposit-box bounds check still counts)."""
    n_beams, tpg_gain, batch, clip, mode, stop_frac = gain_window
    assert mode in ("tri", "cell"), mode
    assert tpg_gain % tb == 0, (tpg_gain, tb)
    assert r % batch == 0, (r, batch)
    rpt = r // batch
    if not interpret and (tb % 8 or r % 128 or rpt % 128):
        # the gamma/uout output blocks are (tiles_per_block, rows|rays);
        # Mosaic requires the last two block dims divisible by (8, 128)
        # (interpret mode does not enforce this — fail loud instead of at
        # lowering)
        raise ValueError(
            f"gain-window kernel on real TPU needs tiles_per_block % 8 == 0 "
            f"and rays_per_tile (*batch) % 128 == 0 (got {tb}, {r})")
    n_ints = 6 if mode == "cell" else 3

    def deposit(edep, cx, cy, cz, fx, fy, fz, inc, ds, u, uinit, *rest):
        if mode == "cell":
            lcx, lcy, lcz, gain_tab = rest
            int_streams = (cx, cy, cz, lcx, lcy, lcz)
        else:
            (gain_tab,) = rest
            int_streams = (cx, cy, cz)
        n_tiles = cx.shape[0] // r
        assert n_tiles % tb == 0, (n_tiles, tb)
        assert n_tiles == n_beams * tpg_gain, (n_tiles, n_beams, tpg_gain)
        assert edep.shape == (nxp, yp, ZLANES), edep.shape
        assert gain_tab.shape == (n_beams, nxp, yp, ZLANES), gain_tab.shape

        kern = functools.partial(
            _kernel, bx=bx, byk=byk, bz=bz, nxp=nxp, nyp=yp,
            tb=tb, tiles_per_group=n_tiles,
            gain_cfg=(batch, float(clip), mode, float(stop_frac)),
            precise=precise, exact_boundary=exact_boundary)

        if gain_only:
            def kernel_fn(i_ref, f_ref, xy_ref, g_ref, of, gam, uo):
                kern(i_ref, f_ref, xy_ref, g_ref, of, gam, uo)
        else:
            def kernel_fn(i_ref, f_ref, xy_ref, g_ref, eout, of, gam, uo):
                kern(i_ref, f_ref, xy_ref, g_ref, eout, of, gam, uo)

        out_specs = [
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((tb, r), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, rpt), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ]
        out_shape = [
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
            jax.ShapeDtypeStruct((n_tiles, r), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, rpt), jnp.float32),
        ]
        if not gain_only:
            out_specs.insert(0, pl.BlockSpec((nxp, yp, ZLANES),
                                             lambda i: (0, 0, 0),
                                             memory_space=pltpu.VMEM))
            out_shape.insert(0,
                             jax.ShapeDtypeStruct((nxp, yp, ZLANES),
                                                  jnp.float32))
        grid_spec = pl.GridSpec(
            grid=(n_tiles // tb,),
            in_specs=[
                pl.BlockSpec((tb, n_ints, r), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tb, 7, r), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((2, bx * byk), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, nxp, yp, ZLANES),
                             lambda i: (i * tb // tpg_gain, 0, 0, 0),
                             memory_space=pltpu.VMEM,
                             pipeline_mode=pl.Buffered(buffer_count=1)),
            ],
            out_specs=out_specs,
        )
        ints = jnp.stack([a.reshape(n_tiles, r) for a in int_streams],
                         axis=1)
        flts = jnp.stack(
            [a.reshape(n_tiles, r)
             for a in (fx, fy, fz, inc, ds, u, uinit)], axis=1)
        jxy = jnp.arange(bx * byk, dtype=jnp.int32)
        xyidx = jnp.stack([jxy // byk, jxy % byk])

        outs = pl.pallas_call(
            kernel_fn,
            grid_spec=grid_spec,
            out_shape=out_shape,
            # the beam-gain input block (5.3 MB at 100^3) + the batched
            # hat/M/t1 temporaries exceed the 16 MB default scoped budget;
            # v5e has 128 MiB physical VMEM
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024),
            interpret=interpret,
        )(ints, flts, xyidx, gain_tab)
        if gain_only:
            oflow, gamma, uout = outs
            return edep, oflow[0, 0], gamma, uout
        delta, oflow, gamma, uout = outs
        return edep + delta, oflow[0, 0], gamma, uout

    return deposit


def make_tile_deposit_hbm(nx: int, ny: int, nz: int, rays_per_tile: int,
                          box: tuple[int, int, int] | int = (32, 32, 32),
                          tiles_per_block: int = 16,
                          interpret: bool = False,
                          exact_boundary: bool = False):
    """High-resolution deposit builder: same contract as
    :func:`make_tile_deposit` (ungrouped), but the grid may have any z size
    (the :func:`edep_zpad_shape` y/z-padded shape) and lives in HBM —
    required when the grid exceeds VMEM (BASELINE config 4: 2x resolution).
    The returned function updates the grid IN PLACE (aliased), unlike the
    ungrouped VMEM kernel which returns deposits to be added by the
    caller."""
    nxp, nyp, nzp = nx + 2, ny + 2, nz + 2
    _, yp, zp = edep_zpad_shape(nx, ny, nz)
    if zp < 2 * ZLANES:
        raise ValueError(
            f"HBM deposit kernel needs a >=2-frame z dim (nz+2 > {ZLANES}); "
            "use make_tile_deposit (VMEM grid) for this size")
    if isinstance(box, int):
        box = (box, box, box)
    bx = min(box[0], nxp)
    # byk a multiple of 8 keeps the y window origin provably 8-aligned
    # through its upper clip (yp - byk) — the window DMA requires the proof
    byk = min(-(-(box[1] + 8) // 8) * 8, yp)
    bz = min(box[2], 64)        # hi/lo lane packing needs 2*bz <= 128
    r = rays_per_tile
    tb = tiles_per_block

    def deposit(edep, cx, cy, cz, fx, fy, fz, inc):
        n_tiles = cx.shape[0] // r
        assert n_tiles % tb == 0, (n_tiles, tb)
        assert edep.shape == (nxp, yp, zp), (edep.shape, (nxp, yp, zp))

        kern = functools.partial(_kernel_hbm_entry, bx=bx, byk=byk, bz=bz,
                                 nxp=nxp, nyp=yp, zp=zp, tb=tb,
                                 exact_boundary=exact_boundary)
        ints = jnp.stack([a.reshape(n_tiles, r) for a in (cx, cy, cz)],
                         axis=1)
        flts = jnp.stack([a.reshape(n_tiles, r) for a in (fx, fy, fz, inc)],
                         axis=1)
        jxy = jnp.arange(bx * byk, dtype=jnp.int32)
        xyidx = jnp.stack([jxy // byk, jxy % byk])

        edep_out, oflow = pl.pallas_call(
            kern,
            grid=(n_tiles // tb,),
            in_specs=[
                pl.BlockSpec((tb, 3, r), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tb, 4, r), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((2, bx * byk), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((1, 1), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((nxp, yp, zp), jnp.float32),
                jax.ShapeDtypeStruct((1, 1), jnp.int32),
            ],
            scratch_shapes=[
                pltpu.VMEM((bx, byk, 2 * ZLANES), jnp.float32),
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
            ],
            input_output_aliases={3: 0},
            # the batched (deposit_batch_steps>1) entry's scoped set exceeds
            # the 16 MB default at config-4 boxes (measured 21.6 MB); the
            # limit is a compiler knob, v5e has 128 MiB physical VMEM
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024),
            interpret=interpret,
        )(ints, flts, xyidx, edep)
        return edep_out, oflow[0, 0]

    return deposit


def _kernel_hbm_entry(ints_ref, flts_ref, xyidx_ref, edep_in_ref,
                      edep_out_ref, oflow_ref, slab_ref, sem_in, sem_out,
                      **kw):
    # edep_in_ref aliases edep_out_ref (same HBM buffer); only out is used
    del edep_in_ref
    _kernel_hbm(ints_ref, flts_ref, xyidx_ref, edep_out_ref, oflow_ref,
                slab_ref, sem_in, sem_out, **kw)


def edep_zpad_shape(nx: int, ny: int, nz: int) -> tuple[int, int, int]:
    """Grid carried by the Pallas kernels: y padded to a sublane multiple
    (8) so the dynamic y window origin stays provably 8-aligned after its
    upper clip (the HBM kernel's window DMA requires the proof; the VMEM
    kernel gets it for free), z lane-padded to a multiple of 128."""
    yp = -(-(ny + 2) // 8) * 8
    zp = -(-(nz + 2) // ZLANES) * ZLANES
    return (nx + 2, yp, zp)


def finalize_edep(edep_zpad, ny: int, nz: int):
    """Strip the y/z padding back to the ghost-padded physical grid."""
    return edep_zpad[..., : ny + 2, : nz + 2]
