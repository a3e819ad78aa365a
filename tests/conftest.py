"""Test configuration: run on a virtual 8-device CPU mesh with x64 enabled.

This is the TPU-world "fake backend" the reference lacks (SURVEY.md §4):
multi-device semantics are exercised on CPU via
``--xla_force_host_platform_device_count``, and float64 lets tests compare
against the float64 oracle at tight tolerances.
"""

import os

# force CPU for the test suite (override any session platform, e.g. a live
# TPU tunnel) unless the user explicitly opts into on-device tests
if not os.environ.get("CBET_TEST_ON_DEVICE"):
    os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

if not os.environ.get("CBET_TEST_ON_DEVICE"):
    # The env var may have been read before this conftest ran (e.g. another
    # pytest plugin importing jax first) — force the config too.
    jax.config.update("jax_platforms", "cpu")
    # Deregister any tunneled-accelerator PJRT plugins (e.g. a remote TPU
    # relay registered via sitecustomize): their discovery RPCs can stall the
    # CPU-only suite for minutes.
    import jax._src.xla_bridge as _xb  # noqa: E402

    for _name in list(_xb._backend_factories):
        if _name not in ("cpu", "tpu"):
            _xb._backend_factories.pop(_name, None)

jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from cbet_raytracing_3d_tpu.config import Config  # noqa: E402
from cbet_raytracing_3d_tpu.profiles import load_profiles  # noqa: E402


@pytest.fixture(scope="session")
def profiles():
    return load_profiles()


@pytest.fixture(scope="session")
def full_cfg():
    return Config(dtype="float64")


@pytest.fixture()
def rng(request):
    # fresh, per-test deterministic stream (independent of test order)
    seed = abs(hash(request.node.name)) % (2**31)
    return np.random.default_rng(seed)
