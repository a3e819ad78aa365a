"""Quantify the boundary exit-step deposit deviation (round-5 review).

The Pallas deposit kernels build per-axis 2-point weights as the hat
``relu(1 - |idx - (base + s*d)|)`` — exact for d in [0, 1], but a ray's
FINAL step can leave d < 0 (re-index clamps the cell at a grid face while
the position moves past it; the reference then deposits with the literal
extrapolated weights (1-d, d), one of them negative, into the ghost layer
— launch_ray_XZ.cu:319-348, deposit precedes the out-of-box break at
:351-356).  For d < 0 the hat places nonnegative weights on the WRONG
neighbor: conserved (weights still sum to 1) but misplaced.

This probe measures, on real traces (CPU, float64):

1. scene-level accounting at OMEGA geometry (reduced rays): what fraction
   of the total deposited energy rides on out-of-range steps, and the
   L1 bound on the misplaced mass;
2. the exact scheme deviation: the full deposit stream of a small scene
   with face exits, deposited once with the literal reference weights and
   once with a float64 NumPy emulation of the kernel's hat weights —
   isolating the scheme (no bf16, no Pallas).

Writes artifacts/boundary_deposit_r05.json.
"""

import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)

sys.path.insert(0, "/root/repo")

from cbet_raytracing_3d_tpu.config import Config  # noqa: E402
from cbet_raytracing_3d_tpu.models import raytracer as rt  # noqa: E402

out = {}

# ---- 1. OMEGA-geometry accounting (reduced rays for CPU wall) ----------
cfg = Config(rays_per_zone=2, dtype="float32")
ctx = rt.prepare(cfg)
state = rt.select_rays(ctx.state0, ctx.live_slots)
dstep = rt.make_deferred_step_fn(cfg)


def body(st, _):
    st, (cell, frac, inc) = dstep(st, ctx.field4)
    oor = jnp.zeros_like(inc, jnp.bool_)
    dmin = jnp.ones_like(inc)
    for ax in range(3):
        p = frac[ax] - 0.5
        d = 1.0 - jnp.abs(p)
        oor |= d < 0
        dmin = jnp.minimum(dmin, d)
    mis = jnp.where(oor, inc * 4.0 * jnp.maximum(-dmin, 0.0), 0.0)
    return st, (jnp.sum(inc, dtype=jnp.float64),
                jnp.sum(jnp.where(oor, inc, 0.0), dtype=jnp.float64),
                jnp.sum(mis, dtype=jnp.float64),
                jnp.sum(oor, dtype=jnp.int64),
                jnp.min(dmin))


_, (tot_s, oor_s, mis_s, noor, dmin_hist) = jax.lax.scan(
    body, state, None, length=cfg.nt)
tot, oor_inc, mis = float(tot_s.sum()), float(oor_s.sum()), float(mis_s.sum())
out["omega_rpz2"] = {
    "rays": int(state.n),
    "nt": int(cfg.nt),
    "total_deposited": tot,
    "out_of_range_deposited": oor_inc,
    "out_of_range_steps": int(noor.sum()),
    "misplaced_L1_bound": mis,
    "oor_fraction_of_total": oor_inc / tot,
    "misplaced_fraction_of_total": mis / tot,
    "min_d_seen": float(dmin_hist.min()),
}
print(json.dumps(out["omega_rpz2"], indent=1))

# ---- 2. exact scheme deviation on a real deposit stream ----------------
cfg2 = Config(nbeams=2, rays_per_zone=1, nx=40, ny=40, nz=40,
              dtype="float32", courant_mult=1.0)
ctx2 = rt.prepare(cfg2)
s2 = rt.select_rays(ctx2.state0, ctx2.live_slots)
dstep2 = rt.make_deferred_step_fn(cfg2)
_, ys = jax.lax.scan(lambda st, _: dstep2(st, ctx2.field4), s2, None,
                     length=cfg2.nt)
cells = [np.asarray(c).reshape(-1) for c in ys[0]]
fracs = [np.asarray(f, np.float64).reshape(-1) for f in ys[1]]
inc = np.asarray(ys[2], np.float64).reshape(-1)
keep = inc > 0
cells = [c[keep] for c in cells]
fracs = [f[keep] for f in fracs]
inc = inc[keep]
shape3 = cfg2.edep_shape


def axis_weights_reference(frac):
    p = frac - 0.5
    d = 1.0 - np.abs(p)
    s = np.where(p < 0, -1, 1)
    return d, s          # weight (1-d) at base=c+1, d at base+s


def deposit_reference(cells, fracs, inc):
    edep = np.zeros(shape3)
    dw = [axis_weights_reference(f) for f in fracs]
    for ix, wx in ((0, 1 - dw[0][0]), (dw[0][1], dw[0][0])):
        for iy, wy in ((0, 1 - dw[1][0]), (dw[1][1], dw[1][0])):
            for iz, wz in ((0, 1 - dw[2][0]), (dw[2][1], dw[2][0])):
                np.add.at(edep,
                          (cells[0] + 1 + ix, cells[1] + 1 + iy,
                           cells[2] + 1 + iz), wx * wy * wz * inc)
    return edep


def deposit_hat(cells, fracs, inc):
    """f64 emulation of the kernel's hat weights: per axis the peak sits at
    q = base + s*d and the hat spreads (1-t, t) over (floor(q), floor(q)+1)
    with t = q - floor(q) — identical to the reference for d in [0,1]."""
    edep = np.zeros(shape3)
    qs, i0s, ts = [], [], []
    for a in range(3):
        d, s = axis_weights_reference(fracs[a])
        q = (cells[a] + 1) + s * d
        i0 = np.floor(q).astype(np.int64)
        qs.append(q), i0s.append(i0), ts.append(q - i0)
    for ix, wx in ((0, 1 - ts[0]), (1, ts[0])):
        for iy, wy in ((0, 1 - ts[1]), (1, ts[1])):
            for iz, wz in ((0, 1 - ts[2]), (1, ts[2])):
                np.add.at(edep,
                          (i0s[0] + ix, i0s[1] + iy, i0s[2] + iz),
                          wx * wy * wz * inc)
    return edep


ref = deposit_reference(cells, fracs, inc)
hat = deposit_hat(cells, fracs, inc)
diff = hat - ref
oor_steps = 0
for a in range(3):
    d, _ = axis_weights_reference(fracs[a])
    oor_steps += int((d < 0).sum())
out["small_scene_scheme_deviation_f64"] = {
    "config": "nbeams=2 rpz=1 40^3 courant=1 (face exits present)",
    "deposit_rows": int(inc.size),
    "oor_axis_rows": oor_steps,
    "edep_total_ref": float(ref.sum()),
    "edep_total_hat": float(hat.sum()),
    "total_rel_err": float(abs(hat.sum() - ref.sum()) / ref.sum()),
    "rel_l2": float(np.linalg.norm(diff) / np.linalg.norm(ref)),
    "max_abs_node_diff_over_max_node": float(
        np.abs(diff).max() / ref.max()),
    "ghost_rel_l2_vs_global": float(
        np.linalg.norm(np.concatenate([
            diff[[0, -1], :, :].ravel(), diff[1:-1, [0, -1], :].ravel(),
            diff[1:-1, 1:-1, [0, -1]].ravel()]))
        / np.linalg.norm(ref)),
}
print(json.dumps(out["small_scene_scheme_deviation_f64"], indent=1))

with open("artifacts/boundary_deposit_r05.json", "w") as f:
    json.dump(out, f, indent=1)
print("written artifacts/boundary_deposit_r05.json")
