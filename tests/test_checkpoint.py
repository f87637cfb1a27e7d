"""Checkpoint/resume tests (SURVEY.md §5.4): snapshot ray SoA + detector
bins + ledger mid-trace and resume batch-exactly."""

import numpy as np
import pytest

import lightpycl_tpu as L
from lightpycl_tpu.io.checkpoint import load_state, save_state
from lightpycl_tpu.sources import CollimatedSource
from lightpycl_tpu.tracer.config import TraceConfig
from lightpycl_tpu.tracer.rays import DetectorState, Ledger, RayBatch
from lightpycl_tpu.tracer.step import trace_step

oe = L.optical_elements(n_segments=24, n_radial=8)


def test_roundtrip_identity(tmp_path):
    src = CollimatedSource(diameter=1.0, ray_count=256, seed=1)
    o, d, p = src.sample()
    rays = RayBatch.from_arrays(o, d, p)
    det = DetectorState.zeros(8, 4, 2)
    led = Ledger.start(1.0)
    path = str(tmp_path / "state.npz")
    save_state(path, rays, det, led, cursor=7)
    st = load_state(path)
    for f in RayBatch._fields:
        assert np.array_equal(np.asarray(getattr(st["rays"], f)),
                              np.asarray(getattr(rays, f)))
    assert st["extra"]["cursor"] == 7
    assert float(st["ledger"].emitted) == 1.0


def test_resume_mid_trace_matches_uninterrupted(tmp_path):
    els = [oe.parabolic_mirror(0.5, 2.0, reflectivity=0.9),
           oe.hemisphere(10.0, name="dome")]
    scene, _ = L.build_scene(els)
    cfg = TraceConfig()
    src = CollimatedSource(center=(0, 0, 3), direction=(0, 0, -1),
                           diameter=1.5, ray_count=512, seed=2)
    o, d, p = src.sample()

    def fresh():
        return (RayBatch.from_arrays(o, d, p), DetectorState.zeros(8, 4, 1),
                Ledger.start(float(p.sum())))

    # uninterrupted: 4 steps
    rays, det, led = fresh()
    for _ in range(4):
        rays, det, led, _ = trace_step(scene, rays, det, led, cfg)

    # interrupted: 2 steps, checkpoint, reload, 2 more
    r2, d2, l2 = fresh()
    for _ in range(2):
        r2, d2, l2, _ = trace_step(scene, r2, d2, l2, cfg)
    path = str(tmp_path / "mid.npz")
    save_state(path, r2, d2, l2)
    st = load_state(path)
    r2, d2, l2 = st["rays"], st["detector"], st["ledger"]
    for _ in range(2):
        r2, d2, l2, _ = trace_step(scene, r2, d2, l2, cfg)

    for a, b in zip(led, l2):
        assert float(a) == pytest.approx(float(b), rel=1e-6, abs=1e-7)
    assert np.allclose(np.asarray(det.hist), np.asarray(d2.hist), atol=1e-6)


def test_bare_path_resume(tmp_path):
    """save_state writes '<path>.npz' when the suffix is missing; resume
    (engine + load_state) must find that file from the bare path."""
    import os

    from lightpycl_tpu.tracer.engine import Tracer

    src = CollimatedSource(center=(0, 0, 3), direction=(0, 0, -1),
                           diameter=1.5, ray_count=256)
    elements = [oe.parabolic_mirror(0.5, 2.0, reflectivity=0.9),
                oe.hemisphere(10.0, name="dome")]
    bare = str(tmp_path / "run")  # no .npz

    tr = Tracer(TraceConfig(trace_iterations=4))
    res_full = tr.trace_batched(src, total_rays=1024, batch_size=256,
                                elements=elements, seed=5)
    tr2 = Tracer(TraceConfig(trace_iterations=4))
    tr2.trace_batched(src, total_rays=1024, batch_size=256,
                      elements=elements, checkpoint_path=bare, seed=5,
                      max_batches=2)
    assert os.path.exists(bare + ".npz")
    res_resumed = tr2.trace_batched(src, total_rays=1024, batch_size=256,
                                    elements=elements, checkpoint_path=bare,
                                    seed=5)
    assert res_resumed.ledger["measured"] == pytest.approx(
        res_full.ledger["measured"], rel=1e-5)
    # direct load_state from the bare path works too
    assert load_state(bare)["extra"]["next_batch"] == 4


def test_old_checkpoint_forward_fills_valid_basis(tmp_path):
    """A v1 checkpoint (no `basis`/Stokes fields) resumed into a
    polarization=True run must get a VALID perpendicular frame, not zeros."""
    src = CollimatedSource(diameter=1.0, ray_count=64, seed=1,
                           direction=(0, 1, 1))
    o, d, p = src.sample()
    rays = RayBatch.from_arrays(o, d, p)
    path = str(tmp_path / "old.npz")
    save_state(path, rays)
    # strip the fields a v1 build did not have
    z = dict(np.load(path))
    for f in ("rays_basis", "rays_s1", "rays_s2", "rays_s3",
              "extra_schema_version"):
        z.pop(f)
    np.savez_compressed(path, **z)

    st = load_state(path)
    b = np.asarray(st["rays"].basis, np.float64)
    dn = np.asarray(st["rays"].d, np.float64)
    np.testing.assert_allclose(np.linalg.norm(b, axis=1), 1.0, atol=1e-5)
    np.testing.assert_allclose((b * dn).sum(1), 0.0, atol=1e-5)


def test_newer_schema_refused(tmp_path):
    path = str(tmp_path / "future.npz")
    save_state(path, cursor=1)
    z = dict(np.load(path))
    z["extra_schema_version"] = np.asarray(99)
    np.savez_compressed(path, **z)
    with pytest.raises(ValueError, match="schema version"):
        load_state(path)
