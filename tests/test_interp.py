"""Unit tests for piecewise-linear interpolation (ops/interp.py) against the
literal binary-search transcription (oracle.interp_binary_search) of
launch_ray_XZ.cu:16-63."""

import jax.numpy as jnp
import numpy as np

from cbet_raytracing_3d_tpu.oracle import interp_binary_search
from cbet_raytracing_3d_tpu.ops.interp import interp, uniform_interp


def _check_table(rng, x, y, lo, hi):
    xp = rng.uniform(lo, hi, size=500)
    # include exact knots and out-of-range clamping points
    xp = np.concatenate([xp, x, [lo - 1.0, hi + 1.0]])
    got = np.asarray(interp(jnp.asarray(y), jnp.asarray(x), jnp.asarray(xp)))
    want = np.array([interp_binary_search(y, x, p) for p in xp])
    # identical interpolant; tolerance covers operation-order roundoff between
    # jnp.interp and the literal binary-search formula
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-13)


def _random_knots(rng, n, lo, hi):
    # strictly increasing with a minimum gap: near-duplicate knots make the
    # segment choice (and hence the comparison) ill-conditioned
    gaps = rng.uniform(0.2, 1.0, size=n)
    x = np.cumsum(gaps)
    return lo + (x - x[0]) / (x[-1] - x[0]) * (hi - lo)


def test_increasing_random_table(rng):
    x = _random_knots(rng, 97, -3, 7)
    y = rng.normal(size=97)
    _check_table(rng, x, y, -4, 8)


def test_decreasing_random_table(rng):
    """The reference's decreasing-abscissa binary search is buggy (inverted
    comparison at launch_ray_XZ.cu:52 — see the note in oracle.py), and that
    branch never executes on reference data.  Our interp implements the
    *correct* decreasing semantics: identical to interpolating the flipped
    (increasing) table."""
    x = _random_knots(rng, 64, -3, 7)
    y = rng.normal(size=64)
    xp = rng.uniform(-4, 8, size=300)
    got = np.asarray(interp(jnp.asarray(y[::-1].copy()), jnp.asarray(x[::-1].copy()),
                            jnp.asarray(xp)))
    want = np.array([interp_binary_search(y, x, p) for p in xp])
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-13)


def test_real_profile_table(rng, profiles):
    _check_table(rng, profiles.r, profiles.ne, -0.05, 0.35)
    _check_table(rng, profiles.r, profiles.te, -0.05, 0.35)


def test_uniform_interp_matches_general(rng):
    n = 201
    x0, dx = 0.0, 0.05
    x = x0 + dx * np.arange(n)
    y = rng.normal(size=n)
    xp = rng.uniform(-0.5, x[-1] + 0.5, size=300)
    got = np.asarray(uniform_interp(jnp.asarray(y), x0, dx, jnp.asarray(xp)))
    want = np.array([interp_binary_search(y, x, p) for p in xp])
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)
