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
