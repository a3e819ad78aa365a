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
            nzp, tb, tiles_per_group, ablate=""):
    # ungrouped: rest = (edep_out_ref, oflow_ref) — the kernel produces this
    # call's deposits on a zeroed grid and the caller adds them to the master
    # (saves a 5.3 MB VMEM input block -> frees room for tiles_per_block=16).
    # grouped: rest = (edep_in_ref, edep_out_ref, oflow_ref) — per-group
    # grids are carried through the aliased in/out pair because an XLA-level
    # add of all group grids per call would cost nbeams x grid of HBM
    # traffic per step.
    if len(rest) == 2:
        edep_in_ref, (edep_out_ref, oflow_ref) = None, rest
    else:
        edep_in_ref, edep_out_ref, oflow_ref = rest
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init_oflow():
        oflow_ref[0, 0] = jnp.int32(0)

    @pl.when((i * tb) % tiles_per_group == 0)
    def _init_grid():
        if edep_in_ref is None:
            edep_out_ref[...] = jnp.zeros_like(edep_out_ref)
        else:
            edep_out_ref[...] = edep_in_ref[...]

    def tile_body(t, _):
        cx = ints_ref[t, 0, :]
        cy = ints_ref[t, 1, :]
        cz = ints_ref[t, 2, :]
        fx = flts_ref[t, 0, :]
        fy = flts_ref[t, 1, :]
        fz = flts_ref[t, 2, :]
        inc = flts_ref[t, 3, :]
        live = inc > 0.0

        big = jnp.int32(10000)
        ox = jnp.min(jnp.where(live, cx, big))
        oy = jnp.min(jnp.where(live, cy, big))
        oz = jnp.min(jnp.where(live, cz, big))

        @pl.when(ox < big)
        def _deposit():
            # box origins: x free (outer dim); y aligned down to the sublane
            # boundary; z clipped so the BZ-lane box always covers [oz, nzp)
            # within the 128-lane frame after the roll
            x0 = jnp.clip(ox, 0, nxp - bx)
            y0 = jnp.clip((oy // 8) * 8, 0, nyp - byk)
            z0 = jnp.clip(oz, 0, ZLANES - bz)

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

            xb, xn, dx_ = axis_weights(cx, fx, x0)
            yb, yn, dy_ = axis_weights(cy, fy, y0)
            zb, zn, dz_ = axis_weights(cz, fz, z0)

            def inside(b, nb, width):
                return (b >= 0) & (b < width) & (nb >= 0) & (nb < width)

            bad = live & ~(inside(xb, xn, bx) & inside(yb, yn, byk)
                           & inside(zb, zn, bz))
            oflow_ref[0, 0] += jnp.sum(bad.astype(jnp.int32))

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
            # dims into lanes)
            xx_of = xyidx_ref[0:1, :].astype(jnp.float32)    # (1, BX*BYK)
            yy_of = xyidx_ref[1:2, :].astype(jnp.float32)
            if ablate == "no_mbuild":
                mb = jnp.full((r, bx * byk), 0.01, jnp.bfloat16)
            else:
                # (bf16 hat arithmetic measured SLOWER — the VPU has no 2x
                # bf16 rate and the casts add passes)
                mb = (hat(xx_of, qx) * hat(yy_of, qy)).astype(jnp.bfloat16)
            iota_z = jax.lax.broadcasted_iota(
                jnp.int32, (r, bz), 1).astype(jnp.float32)
            hz = hat(iota_z, qz)
            # wi carries the (large) increment: split hi/lo so its value
            # keeps ~16 mantissa bits; hi and lo ride side-by-side in the
            # lane dim so ONE matmul covers both (the MXU pads lanes to 128
            # either way — two bz-lane matmuls would each pay full price)
            wi = hz * inc[:, None]                           # (R, BZ) f32
            wi_hi = wi.astype(jnp.bfloat16)
            wi_lo = (wi - wi_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            dn_ = (((0,), (0,)), ((), ()))
            if ablate == "no_mm":
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
            # place the z-box at its lane offset: pad to 128 lanes, roll
            e128 = jnp.pad(e, ((0, 0), (0, ZLANES - bz)))
            e128 = pltpu.roll(e128, z0, 1)
            box = e128.reshape(bx, byk, ZLANES)
            cur = edep_out_ref[pl.ds(x0, bx), pl.ds(y0, byk), :]
            edep_out_ref[pl.ds(x0, bx), pl.ds(y0, byk), :] = cur + box

        return 0

    jax.lax.fori_loop(0, tb, tile_body, 0)


def make_tile_deposit(nx: int, ny: int, nz: int, rays_per_tile: int,
                      box: tuple[int, int, int] | int = (28, 24, 32),
                      tiles_per_block: int = 8,
                      n_groups: int = 1, tiles_per_group: int | None = None,
                      interpret: bool = False, _ablate: str = ""):
    """Build the deposit function
    ``(edep, cx, cy, cz, fx, fy, fz, inc) -> (edep, overflow)``.

    Per-ray inputs are flat (n_tiles*rays_per_tile,) int32/float32 arrays in
    tile order; ``inc`` must already be zero for dead/masked rays.  ``edep``
    is the z-lane-padded grid, shape (nx+2, ny+2, 128) — or
    (n_groups, nx+2, ny+2, 128) when grouped — float32; use
    :func:`edep_shape`/:func:`finalize_edep` for allocation and unpadding.
    """
    nxp, nyp, nzp = nx + 2, ny + 2, nz + 2
    if nzp > ZLANES:
        raise NotImplementedError(
            f"tile deposit kernel requires nz+2 <= {ZLANES} lanes, got {nzp}; "
            "use deposit_backend='scatter'")
    if isinstance(box, int):
        box = (box, box, box)
    bx = min(box[0], nxp)
    byk = min(box[1] + 8, nyp)  # +8: y origin is aligned down to the sublane
    bz = min(box[2], ZLANES)
    r = rays_per_tile
    tb = tiles_per_block

    def deposit(edep, cx, cy, cz, fx, fy, fz, inc):
        n_tiles = cx.shape[0] // r
        assert n_tiles % tb == 0, (n_tiles, tb)
        tpg = tiles_per_group if n_groups > 1 else n_tiles
        assert tpg % tb == 0, (tpg, tb)
        grouped = n_groups > 1
        gshape = ((n_groups, nxp, nyp, ZLANES) if grouped
                  else (nxp, nyp, ZLANES))
        assert edep.shape == gshape, (edep.shape, gshape)

        kern = functools.partial(_kernel, bx=bx, byk=byk, bz=bz, nxp=nxp,
                                 nyp=nyp, nzp=nzp, tb=tb, tiles_per_group=tpg,
                                 ablate=_ablate)
        if grouped:
            # single-buffer the group grids: default double buffering holds
            # 2x(in+out) ~21 MB of VMEM and OOMs; the block changes only every
            # tiles_per_group/tb grid steps so pipelining it buys nothing
            gspec = pl.BlockSpec((1, nxp, nyp, ZLANES),
                                 lambda i: (i * tb // tpg, 0, 0, 0),
                                 memory_space=pltpu.VMEM,
                                 pipeline_mode=pl.Buffered(buffer_count=1))
        else:
            gspec = pl.BlockSpec((nxp, nyp, ZLANES), lambda i: (0, 0, 0),
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
                interpret=interpret,
            )(ints, flts, xyidx)
            edep_out = edep + delta
        return edep_out, oflow[0, 0]

    return deposit


def edep_zpad_shape(nx: int, ny: int, nz: int) -> tuple[int, int, int]:
    return (nx + 2, ny + 2, ZLANES)


def finalize_edep(edep_zpad, nz: int):
    """Strip the z-lane padding back to the ghost-padded physical grid."""
    return edep_zpad[..., : nz + 2]
