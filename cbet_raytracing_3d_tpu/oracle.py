"""NumPy float64 oracle: a literal, obviously-correct transcription of the
reference ray-trace math, used as ground truth by the test suite.

This deliberately follows the reference's *control flow* ray by ray and step
by step (per-ray Python loops, repeated-addition launch positions, linear
initial cell scans with first-match break, countdown cell re-index) rather
than the vectorized closed forms used by the production JAX path — so that
bugs in the production code cannot correlate with bugs here.

Reference call stack transcribed:
  init            launch_ray_XZ.cu:65-115
  initial cell    launch_ray_XZ.cu:162-183
  dispersion      launch_ray_XZ.cu:186-204
  time loop       launch_ray_XZ.cu:207-357
The golden ``truth_100`` blob is absent from the reference snapshot
(.MISSING_LARGE_BLOBS), so this oracle *is* the accuracy bar (BASELINE.md).
"""

from __future__ import annotations

import math

import numpy as np

from . import constants as k
from .beams import load_beam_norms, power_table
from .config import Config
from .profiles import RadialProfiles


def interp_binary_search(y, x, xp):
    """Literal transcription of interp_cuda (launch_ray_XZ.cu:16-63)."""
    n = len(x)
    if x[0] <= x[n - 1]:
        if xp <= x[0]:
            return y[0]
        if xp >= x[n - 1]:
            return y[n - 1]
        low, high = 0, n - 1
        mid = (low + high) >> 1
        while low < high - 1:
            if x[mid] >= xp:
                high = mid
            else:
                low = mid
            mid = (low + high) >> 1
        return y[mid] + (y[mid + 1] - y[mid]) / (x[mid + 1] - x[mid]) * (xp - x[mid])
    else:
        if xp >= x[0]:
            return y[0]
        if xp <= x[n - 1]:
            return y[n - 1]
        low, high = 0, n - 1
        mid = (low + high) >> 1
        while low < high - 1:
            # NOTE: latent reference bug, transcribed faithfully: for a
            # decreasing abscissa this comparison is inverted (should be
            # ``x[mid] >= xp``), so the search picks a wrong segment and
            # extrapolates (violating the commented-out assert at
            # launch_ray_XZ.cu:59).  Harmless in practice: every table the
            # reference ever interpolates (r_data, phase_r) is increasing.
            # The production ``ops/interp.py`` implements the correct
            # documented (Yorick-style) semantics instead.
            if x[mid] <= xp:
                low = mid
            else:
                high = mid
            mid = (low + high) >> 1
        return y[mid] + (y[mid + 1] - y[mid]) / (x[mid + 1] - x[mid]) * (xp - x[mid])


def oracle_init(cfg: Config, beam: int, pre_raynum: int, beam_norm, pow_r, phase_r):
    """init() transcription (launch_ray_XZ.cu:65-115).

    Returns (accepted, x, y, z, uray)."""
    rpz = cfg.rays_per_zone
    zones_spanned = int(math.ceil((cfg.beam_max_x - cfg.beam_min_x) / cfg.dx))
    b1 = pre_raynum // (rpz * rpz)
    b2 = pre_raynum % (rpz * rpz)
    ry = (b1 // zones_spanned) * rpz + b2 // rpz
    rx = (b1 % zones_spanned) * rpz + b2 % rpz
    raynum = ry * cfg.nrays_x + rx

    x_init = cfg.beam_min_x
    for _ in range(raynum % cfg.nrays_x):
        x_init += (cfg.beam_max_x - cfg.beam_min_x) / (cfg.nrays_x - 1)
    x_init += cfg.dx / 2

    y_init = cfg.beam_min_x
    for _ in range(raynum // cfg.nrays_x):
        y_init += (cfg.beam_max_x - cfg.beam_min_x) / (cfg.nrays_y - 1)
    y_init += cfg.dy / 2

    ref = math.sqrt(x_init * x_init + y_init * y_init)
    z_init = cfg.focal_length - cfg.dz / 2

    theta1 = math.acos(beam_norm[beam, 2])
    theta2 = math.atan2(beam_norm[beam, 1] * cfg.focal_length,
                        cfg.focal_length * beam_norm[beam, 0])
    tmp_x = x_init
    x_init = x_init * math.cos(theta1) + z_init * math.sin(theta1)
    z_init = z_init * math.cos(theta1) - tmp_x * math.sin(theta1)
    tmp_x0 = x_init
    x_init = x_init * math.cos(theta2) - y_init * math.sin(theta2)
    y_init = y_init * math.cos(theta2) + tmp_x0 * math.sin(theta2)

    uray = cfg.uray_mult * interp_binary_search(pow_r, phase_r, ref)
    return ref <= cfg.beam_max_x, x_init, y_init, z_init, uray


def trace_ray(cfg: Config, prof: RadialProfiles, beam_norm, pow_r, phase_r,
              beam: int, pre_raynum: int, edep: np.ndarray,
              record_path: bool = False):
    """Trace one ray, accumulating into the ghost-padded ``edep``.

    Transcribes launch_ray_XZ.cu:155-357.  Optionally records the per-step
    (cell, position, uray) path for diagnostics/CBET tests."""
    ne_data, r_data, te_data = prof.ne, prof.r, prof.te
    nx, ny, nz = cfg.nx, cfg.ny, cfg.nz
    dx, dy, dz = cfg.dx, cfg.dy, cfg.dz
    xmin, ymin, zmin = cfg.xmin, cfg.ymin, cfg.zmin
    half = cfg.cell_tol
    dt = cfg.dt
    xconst, yconst, zconst = cfg.dedx_const, cfg.dedy_const, cfg.dedz_const

    ok, myx, myy, myz, uray = oracle_init(cfg, beam, pre_raynum, beam_norm, pow_r, phase_r)
    uray_init = uray
    path = []
    if not ok:
        return path

    thisx = thisy = thisz = 0
    for xx in range(nx):
        if abs(xx * dx + xmin - myx) <= 0.5001 * dx:
            thisx = xx
            break
    for yy in range(ny):
        if abs(yy * dy + ymin - myy) <= 0.5001 * dy:
            thisy = yy
            break
    for zz in range(nz):
        if abs(zz * dz + zmin - myz) <= 0.5001 * dz:
            thisz = zz
            break

    wtmp = math.sqrt((thisx * dx + xmin) ** 2 + (thisy * dy + ymin) ** 2 + (thisz * dz + zmin) ** 2)
    wtmp = interp_binary_search(ne_data, r_data, wtmp)
    w = math.sqrt((k.OMEGA ** 2 - wtmp * 1e6 * k.EC ** 2 / (k.ME_KG * k.E0)) / k.C_CMS ** 2)

    myvx = -1.0 * beam_norm[beam, 0]
    myvy = -1.0 * beam_norm[beam, 1]
    myvz = -1.0 * beam_norm[beam, 2]
    knorm = math.sqrt(myvx ** 2 + myvy ** 2 + myvz ** 2)
    myvx = k.C_CMS ** 2 * ((myvx / knorm) * w) / k.OMEGA
    myvy = k.C_CMS ** 2 * ((myvy / knorm) * w) / k.OMEGA
    myvz = k.C_CMS ** 2 * ((myvz / knorm) * w) / k.OMEGA

    for _tt in range(cfg.nt):
        # clamped gradient stencil (launch_ray_XZ.cu:212-238)
        thisx_m, thisx_p = thisx - 1, thisx + 1
        thisy_m, thisy_p = thisy - 1, thisy + 1
        thisz_m, thisz_p = thisz - 1, thisz + 1
        if thisx == 0:
            thisx_p, thisx_m = 2, 0
        elif thisx == nx - 1:
            thisx_p, thisx_m = nx - 1, nx - 3
        if thisy == 0:
            thisy_p, thisy_m = 2, 0
        elif thisy == ny - 1:
            thisy_p, thisy_m = ny - 1, ny - 3
        if thisz == 0:
            thisz_p, thisz_m = 2, 0
        elif thisz == nz - 1:
            thisz_p, thisz_m = nz - 1, nz - 3

        txp, txm, txd = thisx_p * dx + xmin, thisx_m * dx + xmin, thisx * dx + xmin
        typ, tym, tyd = thisy_p * dy + ymin, thisy_m * dy + ymin, thisy * dy + ymin
        tzp, tzm, tzd = thisz_p * dz + zmin, thisz_m * dz + zmin, thisz * dz + zmin

        eden_x_p = interp_binary_search(ne_data, r_data, math.sqrt(txp * txp + tyd * tyd + tzd * tzd))
        eden_x_m = interp_binary_search(ne_data, r_data, math.sqrt(txm * txm + tyd * tyd + tzd * tzd))
        eden_y_p = interp_binary_search(ne_data, r_data, math.sqrt(txd * txd + typ * typ + tzd * tzd))
        eden_y_m = interp_binary_search(ne_data, r_data, math.sqrt(txd * txd + tym * tym + tzd * tzd))
        eden_z_p = interp_binary_search(ne_data, r_data, math.sqrt(txd * txd + tyd * tyd + tzp * tzp))
        eden_z_m = interp_binary_search(ne_data, r_data, math.sqrt(txd * txd + tyd * tyd + tzm * tzm))

        myvx -= xconst * (eden_x_p - eden_x_m)
        myvy -= yconst * (eden_y_p - eden_y_m)
        myvz -= zconst * (eden_z_p - eden_z_m)
        myx += myvx * dt
        myy += myvy * dt
        myz += myvz * dt

        xtemp = (myx - xmin) / dx
        ytemp = (myy - ymin) / dy
        ztemp = (myz - zmin) / dz

        # countdown re-index (launch_ray_XZ.cu:282-292)
        for xx in range(min(nx - 1, thisx + 1), max(0, thisx - 1) - 1, -1):
            if abs(xx - xtemp) < half:
                thisx = xx
        for yy in range(min(ny - 1, thisy + 1), max(0, thisy - 1) - 1, -1):
            if abs(yy - ytemp) < half:
                thisy = yy
        for zz in range(min(nz - 1, thisz + 1), max(0, thisz - 1) - 1, -1):
            if abs(zz - ztemp) < half:
                thisz = zz

        # absorption (launch_ray_XZ.cu:296-311)
        tmp = math.sqrt((thisx * dx + xmin) ** 2 + (thisy * dy + ymin) ** 2 + (thisz * dz + zmin) ** 2)
        ed = interp_binary_search(ne_data, r_data, tmp)
        etemp = interp_binary_search(te_data, r_data, tmp)
        eta = k.ETA_COEF * cfg.eta_z_factor / (etemp * math.sqrt(etemp))
        nuei = (1e6 * ed * k.EC ** 2 / k.ME_KG) * eta
        if cfg.absorption:
            increment = ed / k.NCRIT * nuei * dt * uray
            uray -= increment
        else:
            increment = uray

        # trilinear area-weighted deposition (launch_ray_XZ.cu:319-348)
        xp_ = xtemp - thisx - 0.5
        yp_ = ytemp - thisy - 0.5
        zp_ = ztemp - thisz - 0.5
        dm = 1.0 - abs(xp_)
        dn = 1.0 - abs(yp_)
        dl = 1.0 - abs(zp_)
        a1 = (1.0 - dl) * (1.0 - dn) * (1.0 - dm)
        a2 = (1.0 - dl) * (1.0 - dn) * dm
        a3 = dl * (1.0 - dn) * (1.0 - dm)
        a4 = dl * (1.0 - dn) * dm
        a5 = (1.0 - dl) * dn * (1.0 - dm)
        a6 = (1.0 - dl) * dn * dm
        a7 = dl * dn * (1.0 - dm)
        a8 = dl * dn * dm
        sx = -1 if xp_ < 0 else 1
        sy = -1 if yp_ < 0 else 1
        sz = -1 if zp_ < 0 else 1

        edep[thisx + 1, thisy + 1, thisz + 1] += a1 * increment
        edep[thisx + 1 + sx, thisy + 1, thisz + 1] += a2 * increment
        edep[thisx + 1, thisy + 1, thisz + 1 + sz] += a3 * increment
        edep[thisx + 1 + sx, thisy + 1, thisz + 1 + sz] += a4 * increment
        edep[thisx + 1, thisy + 1 + sy, thisz + 1] += a5 * increment
        edep[thisx + 1 + sx, thisy + 1 + sy, thisz + 1] += a6 * increment
        edep[thisx + 1, thisy + 1 + sy, thisz + 1 + sz] += a7 * increment
        edep[thisx + 1 + sx, thisy + 1 + sy, thisz + 1 + sz] += a8 * increment

        if record_path:
            path.append((thisx, thisy, thisz, myx, myy, myz, uray))

        if (uray <= cfg.stop_fraction * uray_init
                or myx < (cfg.xmin - dx / 2.0) or myx > (cfg.xmax + dx / 2.0)
                or myy < (cfg.ymin - dy / 2.0) or myy > (cfg.ymax + dy / 2.0)
                or myz < (cfg.zmin - dz / 2.0) or myz > (cfg.zmax + dz / 2.0)):
            break
    return path


def oracle_edep(cfg: Config, prof: RadialProfiles,
                beams=None, rays=None, beam_norm=None) -> np.ndarray:
    """Full oracle run over the given beams/ray-ids (defaults: all).

    Returns the ghost-padded (nx+2, ny+2, nz+2) float64 deposition grid."""
    if beam_norm is None:
        beam_norm = load_beam_norms(nbeams=cfg.nbeams)
    pow_r = power_table(cfg)
    phase_r = np.linspace(0.0, cfg.pow_table_max, cfg.pow_table_len)
    if beams is None:
        beams = range(cfg.nbeams)
    if rays is None:
        rays = range(cfg.traced_rays_per_beam)
    edep = np.zeros(cfg.edep_shape, dtype=np.float64)
    for b in beams:
        for rr in rays:
            if cfg.parity == "reference" and rr >= cfg.traced_rays_per_beam:
                continue
            trace_ray(cfg, prof, beam_norm, pow_r, phase_r, b, rr, edep)
    return edep


# ---------------------------------------------------------------------------
# CBET oracle: literal float64 transcription of one gain-coupled iteration.
#
# The reference only scaffolds CBET (def.cuh:94-114), so there is no CUDA
# code to transcribe; this is instead an independent per-ray Python-loop
# implementation of the gain model documented in models/cbet.py (the
# ion-acoustic resonance contract of def.cuh:99-114), used to validate the
# production VALUES — intensity fields, gain fields, and the coupled
# deposition — not just qualitative properties.
# ---------------------------------------------------------------------------


def trace_ray_cbet(cfg: Config, prof: RadialProfiles, beam_norm, pow_r,
                   phase_r, beam: int, pre_raynum: int, edep: np.ndarray,
                   ibeam: np.ndarray, gain_b: np.ndarray | None,
                   window: int = 0):
    """Trace one ray with the CBET gain applied along its path.

    ``window=0`` mirrors the production "lookup" mode's step ordering
    exactly (models/cbet.py): per step, the gain is looked up at the
    step-entry cell and applied to uray with the path element ds = |v| dt
    (pre-kick velocity), the base integrator step runs (kick, move,
    re-index, absorb, edep deposit), and the local-intensity contribution
    ``uray * ds / (c dt)`` is deposited at the new cell — unless the ray
    terminated this step.

    ``window=batch`` mirrors the "kernel" (tile-window contraction) model:
    the ray advances WITHOUT gain; per step the TRILINEAR gain at the
    deposit position (``gain_b`` must then be the ghost-padded
    (nx+2, ny+2, nz+2) field, ghosts zero) gives a factor
    ``exp(clip(g*ds))`` that is cumulative-multiplied over the window and
    applied to the step's edep/intensity deposits; the ray energy is
    corrected by the cumulative factor at window boundaries (and at
    termination).  Termination checks see the TRUE gained energy
    (uray * gcum), so the window machinery is exact — the trilinear
    sampling position is the "kernel" model's only remaining deviation
    from per-step lookup (the "kernel_cell" mode removes that too and
    is identical to lookup, tested directly against it)."""
    ne_data, r_data, te_data = prof.ne, prof.r, prof.te
    nx, ny, nz = cfg.nx, cfg.ny, cfg.nz
    dx, dy, dz = cfg.dx, cfg.dy, cfg.dz
    xmin, ymin, zmin = cfg.xmin, cfg.ymin, cfg.zmin
    half = cfg.cell_tol
    dt = cfg.dt
    xconst, yconst, zconst = cfg.dedx_const, cfg.dedy_const, cfg.dedz_const

    ok, myx, myy, myz, uray = oracle_init(cfg, beam, pre_raynum, beam_norm,
                                          pow_r, phase_r)
    uray_init = uray
    if not ok:
        return

    thisx = thisy = thisz = 0
    for xx in range(nx):
        if abs(xx * dx + xmin - myx) <= 0.5001 * dx:
            thisx = xx
            break
    for yy in range(ny):
        if abs(yy * dy + ymin - myy) <= 0.5001 * dy:
            thisy = yy
            break
    for zz in range(nz):
        if abs(zz * dz + zmin - myz) <= 0.5001 * dz:
            thisz = zz
            break

    wtmp = math.sqrt((thisx * dx + xmin) ** 2 + (thisy * dy + ymin) ** 2
                     + (thisz * dz + zmin) ** 2)
    wtmp = interp_binary_search(ne_data, r_data, wtmp)
    w = math.sqrt((k.OMEGA ** 2 - wtmp * 1e6 * k.EC ** 2 / (k.ME_KG * k.E0))
                  / k.C_CMS ** 2)
    myvx = -1.0 * beam_norm[beam, 0]
    myvy = -1.0 * beam_norm[beam, 1]
    myvz = -1.0 * beam_norm[beam, 2]
    knorm = math.sqrt(myvx ** 2 + myvy ** 2 + myvz ** 2)
    myvx = k.C_CMS ** 2 * ((myvx / knorm) * w) / k.OMEGA
    myvy = k.C_CMS ** 2 * ((myvy / knorm) * w) / k.OMEGA
    myvz = k.C_CMS ** 2 * ((myvz / knorm) * w) / k.OMEGA

    gcum = 1.0
    for _tt in range(cfg.nt):
        # CBET gain along this step's path element (entry cell, pre-kick v)
        ds = math.sqrt(myvx ** 2 + myvy ** 2 + myvz ** 2) * dt
        if gain_b is not None and window == 0:
            g = gain_b[thisx, thisy, thisz]
            uray *= math.exp(min(max(g * ds, -0.1), 0.1))

        thisx_m, thisx_p = thisx - 1, thisx + 1
        thisy_m, thisy_p = thisy - 1, thisy + 1
        thisz_m, thisz_p = thisz - 1, thisz + 1
        if thisx == 0:
            thisx_p, thisx_m = 2, 0
        elif thisx == nx - 1:
            thisx_p, thisx_m = nx - 1, nx - 3
        if thisy == 0:
            thisy_p, thisy_m = 2, 0
        elif thisy == ny - 1:
            thisy_p, thisy_m = ny - 1, ny - 3
        if thisz == 0:
            thisz_p, thisz_m = 2, 0
        elif thisz == nz - 1:
            thisz_p, thisz_m = nz - 1, nz - 3

        txp, txm, txd = thisx_p * dx + xmin, thisx_m * dx + xmin, thisx * dx + xmin
        typ, tym, tyd = thisy_p * dy + ymin, thisy_m * dy + ymin, thisy * dy + ymin
        tzp, tzm, tzd = thisz_p * dz + zmin, thisz_m * dz + zmin, thisz * dz + zmin

        eden_x_p = interp_binary_search(ne_data, r_data, math.sqrt(txp * txp + tyd * tyd + tzd * tzd))
        eden_x_m = interp_binary_search(ne_data, r_data, math.sqrt(txm * txm + tyd * tyd + tzd * tzd))
        eden_y_p = interp_binary_search(ne_data, r_data, math.sqrt(txd * txd + typ * typ + tzd * tzd))
        eden_y_m = interp_binary_search(ne_data, r_data, math.sqrt(txd * txd + tym * tym + tzd * tzd))
        eden_z_p = interp_binary_search(ne_data, r_data, math.sqrt(txd * txd + tyd * tyd + tzp * tzp))
        eden_z_m = interp_binary_search(ne_data, r_data, math.sqrt(txd * txd + tyd * tyd + tzm * tzm))

        myvx -= xconst * (eden_x_p - eden_x_m)
        myvy -= yconst * (eden_y_p - eden_y_m)
        myvz -= zconst * (eden_z_p - eden_z_m)
        myx += myvx * dt
        myy += myvy * dt
        myz += myvz * dt

        xtemp = (myx - xmin) / dx
        ytemp = (myy - ymin) / dy
        ztemp = (myz - zmin) / dz
        for xx in range(min(nx - 1, thisx + 1), max(0, thisx - 1) - 1, -1):
            if abs(xx - xtemp) < half:
                thisx = xx
        for yy in range(min(ny - 1, thisy + 1), max(0, thisy - 1) - 1, -1):
            if abs(yy - ytemp) < half:
                thisy = yy
        for zz in range(min(nz - 1, thisz + 1), max(0, thisz - 1) - 1, -1):
            if abs(zz - ztemp) < half:
                thisz = zz

        tmp = math.sqrt((thisx * dx + xmin) ** 2 + (thisy * dy + ymin) ** 2
                        + (thisz * dz + zmin) ** 2)
        ed = interp_binary_search(ne_data, r_data, tmp)
        etemp = interp_binary_search(te_data, r_data, tmp)
        eta = k.ETA_COEF * cfg.eta_z_factor / (etemp * math.sqrt(etemp))
        nuei = (1e6 * ed * k.EC ** 2 / k.ME_KG) * eta
        if cfg.absorption:
            increment = ed / k.NCRIT * nuei * dt * uray
            uray -= increment
        else:
            increment = uray

        xp_ = xtemp - thisx - 0.5
        yp_ = ytemp - thisy - 0.5
        zp_ = ztemp - thisz - 0.5
        dm, dn, dl = 1.0 - abs(xp_), 1.0 - abs(yp_), 1.0 - abs(zp_)
        sx = -1 if xp_ < 0 else 1
        sy = -1 if yp_ < 0 else 1
        sz = -1 if zp_ < 0 else 1

        def _deposit(grid, amount):
            grid[thisx + 1, thisy + 1, thisz + 1] += (1 - dl) * (1 - dn) * (1 - dm) * amount
            grid[thisx + 1 + sx, thisy + 1, thisz + 1] += (1 - dl) * (1 - dn) * dm * amount
            grid[thisx + 1, thisy + 1, thisz + 1 + sz] += dl * (1 - dn) * (1 - dm) * amount
            grid[thisx + 1 + sx, thisy + 1, thisz + 1 + sz] += dl * (1 - dn) * dm * amount
            grid[thisx + 1, thisy + 1 + sy, thisz + 1] += (1 - dl) * dn * (1 - dm) * amount
            grid[thisx + 1 + sx, thisy + 1 + sy, thisz + 1] += (1 - dl) * dn * dm * amount
            grid[thisx + 1, thisy + 1 + sy, thisz + 1 + sz] += dl * dn * (1 - dm) * amount
            grid[thisx + 1 + sx, thisy + 1 + sy, thisz + 1 + sz] += dl * dn * dm * amount

        if gain_b is not None and window > 0:
            # trilinear gain at the deposit position from the ghost-padded
            # field (same corner weights as the deposit), folded into the
            # window's cumulative factor
            gp = gain_b
            ix, iy, iz = thisx + 1, thisy + 1, thisz + 1
            g = ((1 - dl) * (1 - dn) * (1 - dm) * gp[ix, iy, iz]
                 + (1 - dl) * (1 - dn) * dm * gp[ix + sx, iy, iz]
                 + dl * (1 - dn) * (1 - dm) * gp[ix, iy, iz + sz]
                 + dl * (1 - dn) * dm * gp[ix + sx, iy, iz + sz]
                 + (1 - dl) * dn * (1 - dm) * gp[ix, iy + sy, iz]
                 + (1 - dl) * dn * dm * gp[ix + sx, iy + sy, iz]
                 + dl * dn * (1 - dm) * gp[ix, iy + sy, iz + sz]
                 + dl * dn * dm * gp[ix + sx, iy + sy, iz + sz])
            gcum *= math.exp(min(max(g * ds, -0.1), 0.1))

        _deposit(edep, increment * gcum if window > 0 else increment)

        # exact termination: the energy check sees the TRUE gained energy
        # (uray * gcum; gcum stays 1.0 in window=0 mode where uray already
        # carries the gain) — the window model is then identical to the
        # per-step lookup on every parity-bearing output
        if (uray * gcum <= cfg.stop_fraction * uray_init
                or myx < (cfg.xmin - dx / 2.0) or myx > (cfg.xmax + dx / 2.0)
                or myy < (cfg.ymin - dy / 2.0) or myy > (cfg.ymax + dy / 2.0)
                or myz < (cfg.zmin - dz / 2.0) or myz > (cfg.zmax + dz / 2.0)):
            if window > 0:
                uray *= gcum     # energy correction up to the death step
            break            # terminated: no intensity contribution this step

        _deposit(ibeam, uray * ds * gcum / (k.C_CMS * dt) if window > 0
                 else uray * ds / (k.C_CMS * dt))
        if window > 0 and (_tt + 1) % window == 0:
            uray *= gcum
            gcum = 1.0


def oracle_cbet_gain(cfg: Config, prof: RadialProfiles, beam_norm,
                     intensity: np.ndarray) -> np.ndarray:
    """Gain fields from intensity fields, literal float64 (models/cbet.py
    docstring model; constants contract def.cuh:99-114).

    ``intensity``: (B, nx, ny, nz) node fields in W/cm^2-scale units.
    Returns (B, nx, ny, nz)."""
    B = cfg.nbeams
    nx, ny, nz = cfg.nx, cfg.ny, cfg.nz
    # khat and per-pair resonance direction
    khat = -beam_norm / np.linalg.norm(beam_norm, axis=1, keepdims=True)
    # node radial unit vectors and ne/ncrit prefactor
    x = np.arange(nx) * cfg.dx + cfg.xmin
    y = np.arange(ny) * cfg.dy + cfg.ymin
    z = np.arange(nz) * cfg.dz + cfg.zmin
    gx, gy, gz = np.meshgrid(x, y, z, indexing="ij")
    r = np.sqrt(gx ** 2 + gy ** 2 + gz ** 2)
    rs = np.where(r > 1e-12, r, 1.0)
    rhat = np.stack([gx / rs, gy / rs, gz / rs])
    ne = np.empty((nx, ny, nz))
    for i in range(nx):
        for j in range(ny):
            for kk_ in range(nz):
                ne[i, j, kk_] = interp_binary_search(prof.ne, prof.r, r[i, j, kk_])
    frac = np.clip(ne / k.NCRIT, 0.0, 0.95)
    pre = (k.CONSTANT1 * (8.0 * np.pi * 1.0e7 / k.C_CMS)
           * frac / np.sqrt(1.0 - frac))

    gain = np.zeros((B, nx, ny, nz))
    for b in range(B):
        for bp in range(B):
            if bp == b:
                continue
            dk = khat[bp] - khat[b]
            nrm = np.linalg.norm(dk)
            if nrm <= 1e-12:
                continue
            u = -cfg.machnum * dk / nrm
            eta = u[0] * rhat[0] + u[1] * rhat[1] + u[2] * rhat[2]
            p = (k.IAW ** 2) * eta / ((eta ** 2 - 1.0) ** 2
                                      + (k.IAW ** 2) * eta ** 2)
            gain[b] += p * intensity[bp]
    return gain * pre[None]


def oracle_cbet_iteration(cfg: Config, prof: RadialProfiles, beam_norm=None,
                          window: int = 0):
    """One literal CBET iteration: uncoupled trace -> intensity fields I0 ->
    gain(I0) -> gain-coupled retrace -> (I0, gain, edep1, I1).

    All float64, per-ray Python loops — the independent check for the
    production fixed point's first iteration values.  ``window`` selects
    the gain-application model (see trace_ray_cbet): 0 = per-step lookup,
    batch = the tile-window (cbet_gain_mode="kernel") model."""
    if beam_norm is None:
        beam_norm = load_beam_norms(nbeams=cfg.nbeams)
    pow_r = power_table(cfg)
    phase_r = np.linspace(0.0, cfg.pow_table_max, cfg.pow_table_len)
    shape_p = cfg.edep_shape

    def full_trace(gain):
        edep = np.zeros(shape_p)
        ibeams = np.zeros((cfg.nbeams,) + shape_p)
        for b in range(cfg.nbeams):
            gb = None if gain is None else gain[b]
            if gb is not None and window > 0:
                gb = np.pad(gb, 1)       # ghost-padded for trilinear sampling
            for rr in range(cfg.traced_rays_per_beam):
                trace_ray_cbet(cfg, prof, beam_norm, pow_r, phase_r, b, rr,
                               edep, ibeams[b], gb, window=window)
        inten = ibeams[:, 1:-1, 1:-1, 1:-1]          # ghost-crop to nodes
        return edep, inten

    _, i0 = full_trace(None)
    gain = oracle_cbet_gain(cfg, prof, beam_norm, i0)
    edep1, i1 = full_trace(gain)
    return i0, gain, edep1, i1
