"""Mega-batch driver tests (BASELINE configs[3] machinery on small sizes):
batching conserves power, matches a single-shot trace, and resumes from a
checkpoint without double counting."""

import numpy as np
import pytest

import lightpycl_tpu as L
from lightpycl_tpu.sources import CollimatedSource
from lightpycl_tpu.tracer.config import TraceConfig
from lightpycl_tpu.tracer.engine import Tracer

oe = L.optical_elements(n_segments=24, n_radial=8)


def els():
    return [oe.parabolic_mirror(0.5, 2.0, reflectivity=0.9),
            oe.hemisphere(10.0, name="dome")]


def test_batched_conserves_and_measures():
    src = CollimatedSource(center=(0, 0, 3), direction=(0, 0, -1),
                           diameter=1.5, ray_count=512)
    tr = Tracer(TraceConfig(trace_iterations=4))
    res = tr.trace_batched(src, total_rays=2048, batch_size=512, elements=els())
    led = res.ledger
    acc = led["measured"] + led["absorbed"] + led["escaped"] + led["culled"]
    assert acc == pytest.approx(led["emitted"], rel=1e-5)
    # collimated beam onto a 0.9-reflectivity dish -> ~90% measured
    assert led["measured"] == pytest.approx(0.9, abs=0.02)
    assert res.hist.sum() == pytest.approx(led["measured"], rel=1e-4)


def test_checkpoint_resume_no_double_count(tmp_path):
    src = CollimatedSource(center=(0, 0, 3), direction=(0, 0, -1),
                           diameter=1.5, ray_count=256)
    ck = str(tmp_path / "run.npz")

    # full run, checkpointing each batch
    tr = Tracer(TraceConfig(trace_iterations=4))
    res_full = tr.trace_batched(src, total_rays=1024, batch_size=256,
                                elements=els(), checkpoint_path=None, seed=5)

    # interrupted run: stop after 2 of 4 batches, then resume from checkpoint
    tr2 = Tracer(TraceConfig(trace_iterations=4))
    tr2.trace_batched(src, total_rays=1024, batch_size=256, elements=els(),
                      checkpoint_path=ck, seed=5, max_batches=2)
    res_resumed = tr2.trace_batched(src, total_rays=1024, batch_size=256,
                                    elements=els(), checkpoint_path=ck, seed=5)
    assert res_resumed.ledger["measured"] == pytest.approx(
        res_full.ledger["measured"], rel=1e-5)
    assert res_resumed.ledger["emitted"] == pytest.approx(
        res_full.ledger["emitted"], rel=1e-5)


def test_batched_mesh2d_matches_device(tmp_path):
    """trace_batched(mode='mesh2d'): the over-HBM-mesh x mega-ray corner
    (BASELINE configs 4 AND 5 at once). 4 batches on a 2x4 (tris x rays)
    mesh must reproduce the single-device batched run, checkpoint-resume
    included (with a refractive element so splitting/compaction is live)."""
    from lightpycl_tpu.parallel.mesh2d import make_mesh2d

    els2 = els() + [oe.biconvex_lens(1.0, 0.6, 0.1, ior=1.5,
                                     center=(0, 0, 1.0))]
    src = CollimatedSource(center=(0, 0, 3), direction=(0, 0, -1),
                           diameter=1.5, ray_count=256)
    tr1 = Tracer(TraceConfig(trace_iterations=4))
    res1 = tr1.trace_batched(src, total_rays=1024, batch_size=256,
                             elements=els2, seed=5)
    mesh = make_mesh2d(2, 4)
    tr2 = Tracer(TraceConfig(trace_iterations=4))
    res2 = tr2.trace_batched(src, total_rays=1024, batch_size=256,
                             elements=els2, seed=5, mode="mesh2d",
                             mesh=mesh)
    assert res2.ledger["emitted"] == pytest.approx(res1.ledger["emitted"],
                                                   rel=1e-6)
    assert res2.ledger["measured"] == pytest.approx(res1.ledger["measured"],
                                                    rel=1e-4)
    np.testing.assert_allclose(res2.hist, res1.hist, atol=1e-5)
    acc2 = sum(res2.ledger[key] for key in
               ("measured", "absorbed", "escaped", "culled"))
    assert acc2 == pytest.approx(res2.ledger["emitted"], rel=1e-5)

    # checkpoint-resume through the mesh2d driver: no double counting
    ck = str(tmp_path / "run2d.npz")
    tr3 = Tracer(TraceConfig(trace_iterations=4))
    tr3.trace_batched(src, total_rays=1024, batch_size=256, elements=els2,
                      checkpoint_path=ck, seed=5, max_batches=2,
                      mode="mesh2d", mesh=mesh)
    res3 = tr3.trace_batched(src, total_rays=1024, batch_size=256,
                             elements=els2, checkpoint_path=ck, seed=5,
                             mode="mesh2d", mesh=mesh)
    assert res3.ledger["measured"] == pytest.approx(
        res2.ledger["measured"], rel=1e-5)
    assert res3.ledger["emitted"] == pytest.approx(
        res2.ledger["emitted"], rel=1e-5)


def test_batched_multichip_matches_device():
    """trace_batched(mode='multichip') shards each mega-batch over the
    virtual 8-device mesh; detector/ledger aggregates must match the
    single-device batched run (same on-device ray generation keys)."""
    src = CollimatedSource(center=(0, 0, 3), direction=(0, 0, -1),
                           diameter=1.5, ray_count=256)
    tr1 = Tracer(TraceConfig(trace_iterations=4))
    res1 = tr1.trace_batched(src, total_rays=1024, batch_size=256,
                             elements=els(), seed=5)
    tr8 = Tracer(TraceConfig(trace_iterations=4))
    res8 = tr8.trace_batched(src, total_rays=1024, batch_size=256,
                             elements=els(), seed=5, mode="multichip")
    assert res8.ledger["emitted"] == pytest.approx(res1.ledger["emitted"],
                                                   rel=1e-6)
    assert res8.ledger["measured"] == pytest.approx(res1.ledger["measured"],
                                                    rel=1e-4)
    np.testing.assert_allclose(res8.hist, res1.hist, atol=1e-5)
    np.testing.assert_allclose(res8.per_detector, res1.per_detector,
                               atol=1e-5)
    # conservation: emitted == accounted (leftover live is culled per batch)
    acc8 = sum(res8.ledger[key] for key in
               ("measured", "absorbed", "escaped", "culled"))
    assert acc8 == pytest.approx(res8.ledger["emitted"], rel=1e-5)
