"""Deposition property tests (ops/deposit.py): weight positivity and
sum-to-one for in-cell rays, exact energy conservation of the scatter-add,
and exact index/weight agreement with the reference formula
(launch_ray_XZ.cu:319-348)."""

import jax.numpy as jnp
import numpy as np

from cbet_raytracing_3d_tpu.ops.deposit import corner_indices_weights, deposit

GRID = (10, 11, 12)


def _random_in_cell(rng, n):
    cell = np.stack([rng.integers(0, g, size=n) for g in GRID], axis=1).astype(np.int32)
    frac = rng.uniform(-0.4999, 0.4999, size=(n, 3))
    return cell, frac


def test_weights_sum_to_one_and_positive(rng):
    cell, frac = _random_in_cell(rng, 500)
    idx8, w8 = corner_indices_weights(jnp.asarray(cell), jnp.asarray(frac), GRID)
    w8 = np.asarray(w8)
    assert np.all(w8 >= 0)
    np.testing.assert_allclose(w8.sum(axis=1), 1.0, rtol=1e-12)


def test_indices_in_padded_range(rng):
    cell, frac = _random_in_cell(rng, 500)
    idx8, _ = corner_indices_weights(jnp.asarray(cell), jnp.asarray(frac), GRID)
    total = (GRID[0] + 2) * (GRID[1] + 2) * (GRID[2] + 2)
    assert np.asarray(idx8).min() >= 0
    assert np.asarray(idx8).max() < total


def test_energy_conservation(rng):
    cell, frac = _random_in_cell(rng, 300)
    inc = rng.uniform(0.5, 2.0, size=300)
    idx8, w8 = corner_indices_weights(jnp.asarray(cell), jnp.asarray(frac), GRID)
    total = (GRID[0] + 2) * (GRID[1] + 2) * (GRID[2] + 2)
    edep = deposit(jnp.zeros(total), idx8, w8, jnp.asarray(inc))
    np.testing.assert_allclose(float(edep.sum()), inc.sum(), rtol=1e-12)


def test_matches_reference_formula(rng):
    """Exact transcription check of the a1..a8 / sign-offset scheme."""
    nx, ny, nz = GRID
    cell, frac = _random_in_cell(rng, 100)
    inc = rng.uniform(0.5, 2.0, size=100)
    idx8, w8 = corner_indices_weights(jnp.asarray(cell), jnp.asarray(frac), GRID)
    total = (nx + 2) * (ny + 2) * (nz + 2)
    got = np.asarray(deposit(jnp.zeros(total), idx8, w8, jnp.asarray(inc)))

    want = np.zeros((nx + 2, ny + 2, nz + 2))
    for (cx, cy, cz), (fx, fy, fz), u in zip(cell, frac, inc):
        xp, yp, zp = fx - 0.5, fy - 0.5, fz - 0.5
        dm, dn, dl = 1 - abs(xp), 1 - abs(yp), 1 - abs(zp)
        sx, sy, sz = (-1 if xp < 0 else 1), (-1 if yp < 0 else 1), (-1 if zp < 0 else 1)
        want[cx + 1, cy + 1, cz + 1] += (1 - dl) * (1 - dn) * (1 - dm) * u
        want[cx + 1 + sx, cy + 1, cz + 1] += (1 - dl) * (1 - dn) * dm * u
        want[cx + 1, cy + 1, cz + 1 + sz] += dl * (1 - dn) * (1 - dm) * u
        want[cx + 1 + sx, cy + 1, cz + 1 + sz] += dl * (1 - dn) * dm * u
        want[cx + 1, cy + 1 + sy, cz + 1] += (1 - dl) * dn * (1 - dm) * u
        want[cx + 1 + sx, cy + 1 + sy, cz + 1] += (1 - dl) * dn * dm * u
        want[cx + 1, cy + 1 + sy, cz + 1 + sz] += dl * dn * (1 - dm) * u
        want[cx + 1 + sx, cy + 1 + sy, cz + 1 + sz] += dl * dn * dm * u
    np.testing.assert_allclose(got.reshape(want.shape), want, rtol=1e-12, atol=1e-12)
