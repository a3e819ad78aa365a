"""Pallas TPU kernel for the CBET gain-field reduction.

Computes, for every beam b and grid node p,

    g[b, p] = pre[p] * sum_{b'} R(eta[b, b', p]) * I[b', p],
    eta[b, b', p] = pair_u[b, b', :] . rhat[:, p],
    R(eta) = iaw^2 eta / ((eta^2 - 1)^2 + iaw^2 eta^2)

— the ion-acoustic coupling of models/cbet.py (constants contract
def.cuh:99-114).  The (B, B, P) intermediate must never exist (14 GB at
OMEGA scale).  This kernel keeps each P-block's (B, L) working set in
VMEM and loops partner beams unrolled; measured 46 ms/call at OMEGA
scale (scalar-fenced — fetching the 240 MB result through the tunneled
backend costs ~11 s and initially masked the real cost), vs 53 ms for
the best XLA broadcast+reduce form under the same fence.  The kernel is
kept as the production path: its VMEM residency is guaranteed by
construction, where the XLA form's fusion behavior depends on the
consumer context (a whole-array materialization was observed in at
least one formulation).

Layout: intensity (B, P) and the output (B, P) are blocked along P
(lane dim); rhat and the gain prefactor ride together as one (4, P)
input; the (B, B) pair-coupling component matrices are replicated whole
(they are KB-sized).  B is the sublane dim (padded to 8 internally by
Mosaic).  The partner-beam loop is a static Python unroll: per-iteration
row/column slices are then static, which Mosaic lowers without dynamic-
slice overhead.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

LANE_BLOCK = 1024


def _gain_kernel(px_ref, py_ref, pz_ref, rp_ref, i_ref, g_ref, *, B, iaw2):
    rp = rp_ref[...]
    rx, ry, rz, pre = rp[0:1, :], rp[1:2, :], rp[2:3, :], rp[3:4, :]
    px, py, pz = px_ref[...], py_ref[...], pz_ref[...]
    ii = i_ref[...]
    acc = jnp.zeros(g_ref.shape, jnp.float32)
    for bp in range(B):                       # static unroll (see docstring)
        ux = px[:, bp:bp + 1]                 # (B_out, 1)
        uy = py[:, bp:bp + 1]
        uz = pz[:, bp:bp + 1]
        eta = ux * rx + uy * ry + uz * rz     # (B_out, L)
        e2 = eta * eta
        resp = (iaw2 * eta) / ((e2 - 1.0) ** 2 + iaw2 * e2)
        acc = acc + resp * ii[bp:bp + 1, :]
    g_ref[...] = acc * pre


def make_gain_kernel(B: int, P: int, iaw: float,
                     interpret: bool = False, block: int = LANE_BLOCK,
                     b_out: int | None = None):
    """Build ``gain(pair_u (B,B,3) f32, rhat_pre (4,P) f32, I (B,P) f32)
    -> (B,P) f32``.  ``rhat_pre`` rows are [rhat_x, rhat_y, rhat_z, pre];
    zero ``pre`` in any padding makes padded columns exact zeros.

    ``b_out`` restricts the OUTPUT to that many beam rows: ``pair_u`` then
    has shape (b_out, B, 3) — the pair-coupling rows of the requested
    output beams — while the partner sum still runs over all ``B``
    intensity rows.  This is the beam-sharded form (Config.
    cbet_gain_sharded): each shard computes only its own beams' gain rows
    from the all-gathered intensity, with per-row arithmetic identical to
    the full kernel's (same partner order, same f32 ops)."""
    # the (B, L)/(4, L) BlockSpecs put L on the lane dim: round any
    # caller-supplied block up to a 128-lane multiple or Mosaic rejects
    # the block shape on real TPU (interpret mode would hide it)
    block = max(128, -(-block // 128) * 128)
    L = min(block, -(-P // 128) * 128)
    Pp = -(-P // L) * L
    Bo = B if b_out is None else b_out
    kern = functools.partial(_gain_kernel, B=B, iaw2=float(iaw) ** 2)

    def gain(pair_u, rhat_pre, intensity):
        assert intensity.shape == (B, P), intensity.shape
        assert rhat_pre.shape == (4, P), rhat_pre.shape
        # (B_out, B, 3) with dk axis order as pair_couplings builds it — a
        # transposed pair_u would flip eta's sign and reverse the CBET
        # transfer direction while every BlockSpec still matches
        assert pair_u.shape == (Bo, B, 3), pair_u.shape
        pad = Pp - P
        ip = jnp.pad(intensity, ((0, 0), (0, pad)))
        rp = jnp.pad(rhat_pre, ((0, 0), (0, pad)))
        px = pair_u[:, :, 0]
        py = pair_u[:, :, 1]
        pz = pair_u[:, :, 2]
        g = pl.pallas_call(
            kern,
            grid=(Pp // L,),
            in_specs=[
                pl.BlockSpec((Bo, B), lambda i: (0, 0)),
                pl.BlockSpec((Bo, B), lambda i: (0, 0)),
                pl.BlockSpec((Bo, B), lambda i: (0, 0)),
                pl.BlockSpec((4, L), lambda i: (0, i)),
                pl.BlockSpec((B, L), lambda i: (0, i)),
            ],
            out_specs=pl.BlockSpec((Bo, L), lambda i: (0, i)),
            out_shape=jax.ShapeDtypeStruct((Bo, Pp), jnp.float32),
            interpret=interpret,
        )(px, py, pz, rp, ip)
        return g[:, :P]

    return gain
