"""The driver-independent multi-chip dry run on a 16-device virtual mesh.

The suite's default mesh is 8 virtual CPU devices (conftest); this runs the
full production-path dry run — device-balanced segmented trace, scatter- and
beam-sharded CBET mini-solves (including the beam-sharded gain table and
segmented per-shard index arrays) — at 16 devices to shake out shape/layout
assumptions that only appear on wider meshes (phantom-pad arithmetic,
per-device tile balance at thinner shards).  ``dryrun_multichip``
self-provisions a clean 16-device CPU subprocess, so this works from the
8-device test process.  Reference analog: the nGPUs decomposition scaled
past its hard-coded 2 (/root/reference/main.cu:133-210, def.cuh:116).
"""

import os
import sys

import pytest

pytestmark = pytest.mark.slow  # full lane only: 16-device subprocess dry run

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_dryrun_multichip_16_devices():
    import __graft_entry__ as g

    g.dryrun_multichip(16)
