"""Static tile-liveness plan + segmented (mid-trace-compacted) trace:
the compacted trace must reproduce the plain trace exactly — compaction is
a pure work-skipping transformation (models/tileplan.py)."""

import jax
import numpy as np

from cbet_raytracing_3d_tpu.config import Config
from cbet_raytracing_3d_tpu.models import raytracer as rt
from cbet_raytracing_3d_tpu.models import tileplan as tp
from cbet_raytracing_3d_tpu.parallel.sharding import pad_rays


def _setup(profiles, **kw):
    cfg = Config(nbeams=2, rays_per_zone=1, nx=40, ny=40, nz=40,
                 dtype="float64", tiles_per_block=2, **kw)
    ctx = rt.prepare(cfg, profiles)
    rpt = ctx.layout.rays_per_tile
    state0 = pad_rays(rt.select_rays(ctx.state0, ctx.live_slots),
                      rpt * cfg.tiles_per_block)
    return cfg, ctx, rpt, state0


def test_plan_is_monotone_and_tiles_die(profiles):
    cfg, ctx, rpt, state0 = _setup(profiles)
    plan = tp.measure_plan(cfg, ctx, state0)
    live = plan.chunk_live
    # monotone: once dead, a tile stays dead
    assert not (np.diff(live.astype(int), axis=0) > 0).any()
    # the scene actually loses tiles mid-trace (what compaction exploits)
    assert live[-1].sum() < live[0].sum()


def test_segmented_trace_matches_plain(profiles):
    cfg, ctx, rpt, state0 = _setup(profiles)
    plan = tp.measure_plan(cfg, ctx, state0)
    segments = tp.build_segments(plan, cfg, cfg.nt)
    assert len(segments) > 1, "scene produced no compaction opportunity"

    plain = jax.jit(rt.make_trace_fn(cfg, rpt, backend="scatter"))
    edep_p, state_p, of_p = plain(ctx.field4, state0)
    seg = jax.jit(rt.make_segmented_trace_fn(cfg, rpt, segments,
                                             backend="scatter"))
    edep_s, state_s, of_s = seg(ctx.field4, state0)

    assert int(of_p) == int(of_s) == 0
    np.testing.assert_allclose(np.asarray(edep_s), np.asarray(edep_p),
                               rtol=1e-12,
                               atol=1e-12 * float(np.asarray(edep_p).max()))
    # final-state slots map back to original slots with identical uray
    origins = rt.segment_slot_origins(segments, rpt)
    valid = origins >= 0
    up = np.asarray(state_p.uray)[origins[valid]]
    us = np.asarray(state_s.uray)[valid]
    np.testing.assert_allclose(us, up, rtol=0, atol=0)


def test_plan_cache_roundtrip(tmp_path, profiles):
    cfg, ctx, rpt, state0 = _setup(profiles)
    plan = tp.get_or_measure_plan(cfg, ctx, state0, str(tmp_path))
    # the cache key includes the traced slot layout (tile count): a plan
    # measured for a different device-count/padding layout must not load
    fp = (f"{tp.scene_fingerprint(ctx)}"
          f"_t{state0.n // ctx.layout.rays_per_tile}")
    loaded = tp.load_plan(tp.plan_path(str(tmp_path), fp), fp)
    assert loaded is not None
    np.testing.assert_array_equal(loaded.chunk_live, plan.chunk_live)
    # wrong fingerprint -> rejected
    assert tp.load_plan(tp.plan_path(str(tmp_path), fp), "deadbeef") is None


def test_plan_cache_invariant_to_deposit_knobs(tmp_path, profiles):
    """Deposit-stage / CBET-solver knobs cannot change the no-deposit
    liveness pre-trace, so they are normalized out of the plan cache key
    (tileplan._PLAN_FREE_FIELDS) — flipping them must HIT the cache (at
    config-4 scale a spurious re-measure costs ~9 minutes).  Physics knobs
    (stop_fraction) must still MISS."""
    cfg, ctx, rpt, state0 = _setup(profiles)
    tp.get_or_measure_plan(cfg, ctx, state0, str(tmp_path))

    import dataclasses as _dc
    knob = _dc.replace(ctx, cfg=cfg.replace(
        deposit_batch_steps=2, deposit_backend="scatter", cbet_relax=0.5))
    fp_base = f"{tp.scene_fingerprint(ctx)}"
    assert tp.scene_fingerprint(knob) == fp_base

    physics = _dc.replace(ctx, cfg=cfg.replace(stop_fraction=0.0))
    assert tp.scene_fingerprint(physics) != fp_base
