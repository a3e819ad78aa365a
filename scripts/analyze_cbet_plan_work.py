"""Where does the CBET trace's extra 2.8 s/iter go?  (CPU analysis)

artifacts/cbet_decomp_r03b.json: CBET segmented trace sans gain+intensity
~5.0 s vs plain segmented trace 2.208 s.  Candidates: (a) the gain-proof
stop_fraction=0 superset plan keeps absorption-dead rays "live" to box
exit; (b) build_beam_segments pads every beam to the max beam's live
width.  Compare tile-step work integrals from the cached plans.
"""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np                                            # noqa: E402

from cbet_raytracing_3d_tpu import Config                     # noqa: E402
from cbet_raytracing_3d_tpu.models import raytracer as rt     # noqa: E402
from cbet_raytracing_3d_tpu.models import tileplan as tp      # noqa: E402
from cbet_raytracing_3d_tpu.parallel import sharding as sh    # noqa: E402

CACHE = ".cbet_cache"


def seg_work(segments):
    return sum(int(s.tiles.shape[0]) * sum(int(c) for c in s.chunk_lengths)
               for s in segments)


def main():
    cfg = Config(cbet_segmented=True)
    # the compact per-beam block-padded layout the CBET solver plans on
    ctx = rt.prepare_device(cfg)
    state0 = sh.pad_rays(ctx.state0,
                         ctx.layout.rays_per_tile * cfg.tiles_per_block)

    plans = {}
    for label, pcfg in (("normal", cfg),
                        ("stop0", cfg.replace(stop_fraction=0.0))):
        plans[label] = tp.get_or_measure_plan(pcfg, ctx, state0, CACHE)

    chunk = plans["normal"].chunk_steps
    n_chunks = -(-cfg.nt // chunk)
    print(f"chunks: {n_chunks} x {chunk} steps")
    for label, plan in plans.items():
        live = np.flip(np.logical_or.accumulate(
            np.flip(plan.chunk_live, 0), 0), 0)
        print(f"plan {label}: live tile-chunks {int(live.sum())} "
              f"(fraction {live.mean():.3f})")

    rows = {}
    segs = tp.build_segments(plans["normal"], cfg, cfg.nt)
    rows["plain build_segments(normal)"] = seg_work(segs)
    for label, plan in plans.items():
        bs, _tpgs = tp.build_beam_segments(plan, cfg, cfg.nt, cfg.nbeams)
        rows[f"beam_segments({label})"] = seg_work(bs)
        # also: how much of the padding is the per-beam max (vs global sort)
        segs_g = tp.build_segments(plan, cfg, cfg.nt)
        rows[f"plain build_segments({label})"] = seg_work(segs_g)

    base = rows["plain build_segments(normal)"]
    for k, v in rows.items():
        print(f"{k:38s} {v:12d} tile-steps  ({v / base:5.2f}x)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
