"""Trilinear 8-corner energy deposition (scatter-add).

Replaces the reference's per-thread ``atomicAdd`` loop
(``launch_ray_XZ.cu:319-348``) with a vectorized XLA scatter-add over all rays
at once.  The weighting formula is transcribed exactly, including the
reference's half-cell-shifted convention: ``xp = xtemp - thisx - 0.5`` lies in
``(-1, 0)`` for in-cell rays, so the "signed neighbor" node is (almost) always
``thisx - 1`` and a ray sitting exactly on node ``thisx`` splits its energy
50/50 between nodes ``thisx`` and ``thisx-1``.  This is a documented quirk of
the reference deposition scheme, reproduced for output parity.

Weights are separable per axis and always sum to 1, so energy is conserved
exactly (tested in tests/test_deposit.py).
"""

from __future__ import annotations

import jax.numpy as jnp


def corner_indices_weights(cell: jnp.ndarray, frac: jnp.ndarray,
                           grid_shape: tuple[int, int, int]):
    """Compute the 8 ghost-padded flat deposit indices and weights.

    Args:
      cell: (N, 3) int32 current cell index per ray.
      frac: (N, 3) position relative to the cell node, in grid units
            (``(pos - min)/d - cell``, ~[-0.5, 0.5] for in-cell rays).
      grid_shape: (nx, ny, nz) — unpadded node counts.

    Returns:
      idx8: (N, 8) int32 flat indices into the (nx+2)*(ny+2)*(nz+2) grid.
      w8:   (N, 8) weights (product of per-axis linear weights).
    """
    nx, ny, nz = grid_shape
    p = frac - 0.5                              # (N,3), in (-1, 0) for in-cell rays
    d3 = 1.0 - jnp.abs(p)                        # (dm, dn, dl)
    s = jnp.where(p < 0, -1, 1).astype(jnp.int32)

    base = cell + 1                              # ghost-padded node index of the cell
    nbr = base + s                               # signed neighbor per axis

    # per-axis (index, weight) pairs: axis value 0 -> base node with weight
    # (1 - d), axis value 1 -> neighbor with weight d   (launch_ray_XZ.cu:329-348)
    ix = jnp.stack([base[:, 0], nbr[:, 0]], axis=1)      # (N,2)
    iy = jnp.stack([base[:, 1], nbr[:, 1]], axis=1)
    iz = jnp.stack([base[:, 2], nbr[:, 2]], axis=1)
    wx = jnp.stack([1.0 - d3[:, 0], d3[:, 0]], axis=1)   # (N,2)
    wy = jnp.stack([1.0 - d3[:, 1], d3[:, 1]], axis=1)
    wz = jnp.stack([1.0 - d3[:, 2], d3[:, 2]], axis=1)

    sy = nz + 2
    sx = (ny + 2) * (nz + 2)
    # combine axes: (N,2,1,1)+(N,1,2,1)+(N,1,1,2) -> (N,2,2,2) -> (N,8)
    idx8 = (ix[:, :, None, None] * sx + iy[:, None, :, None] * sy
            + iz[:, None, None, :]).reshape(-1, 8)
    w8 = (wx[:, :, None, None] * wy[:, None, :, None]
          * wz[:, None, None, :]).reshape(-1, 8)
    return idx8, w8


def deposit(edep_flat: jnp.ndarray, idx8: jnp.ndarray, w8: jnp.ndarray,
            increment: jnp.ndarray) -> jnp.ndarray:
    """Scatter-add each ray's 8 weighted corner contributions.

    ``increment`` must already be masked to zero for dead rays."""
    vals = (w8 * increment[:, None]).astype(edep_flat.dtype)
    return edep_flat.at[idx8.reshape(-1)].add(vals.reshape(-1))
