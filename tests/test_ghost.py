"""Ghost / stray-light path tracking (TraceConfig.track_paths): every
measured ray carries a base-(2E+1) signature of its (element, R/T) chain;
analysis.ghost_paths decodes and ranks. Anchors: exact Fresnel powers of
the direct beam and the first internal-reflection ghost of a glass window
at normal incidence. Extension over the reference (kernels record only hit
power, no provenance)."""

import numpy as np
import pytest

import lightpycl_tpu as L
from lightpycl_tpu import analysis
from lightpycl_tpu.sources import CollimatedSource
from lightpycl_tpu.tracer.engine import Tracer

N_GLASS = 1.5
R0 = ((N_GLASS - 1) / (N_GLASS + 1)) ** 2  # 0.04


def window_scene():
    oe = L.optical_elements(n_segments=16, n_radial=6)
    window = oe.cube(0.8, material="refractive", ior=N_GLASS)
    window.name = "window"
    det = oe.disc(radius=1.2, center=(0, 0, 2.0), material="measure",
                  name="sensor")
    return [window, det]


def run(n=512, iters=8):
    src = CollimatedSource(center=(0, 0, -2.0), direction=(0, 0, 1),
                           diameter=0.5, power=1.0, ray_count=n, seed=4)
    # generous slot headroom (the faint R^4 ghost family must survive
    # top-k compaction next to the much brighter low-order children) and
    # no dissipation early-exit (the 2.4e-6 ghost arrives at bounce 7)
    return Tracer().trace(src, window_scene(), trace_iterations=iters,
                          capacity=32 * n, track_paths=True,
                          dissipation_target=1.0)


def test_window_ghost_powers_exact():
    res = run()
    report = analysis.ghost_paths(res, elements=window_scene(), top=5)
    assert report[0]["path"] == [(0, "T"), (0, "T")]
    # direct beam through two surfaces: (1-R)^2
    assert report[0]["power"] == pytest.approx((1 - R0) ** 2, rel=1e-5)
    assert report[0]["label"] == "window:T -> window:T"
    # first ghost: T, internal R at the exit face, internal R at the entry
    # face, T out: R^2 (1-R)^2
    ghost = report[1]
    assert ghost["path"] == [(0, "T"), (0, "R"), (0, "R"), (0, "T")]
    assert ghost["power"] == pytest.approx(R0 ** 2 * (1 - R0) ** 2,
                                           rel=1e-4)
    # second ghost: two more internal bounces -> R^4 (1-R)^2
    assert report[2]["path"] == [(0, "T")] + [(0, "R")] * 4 + [(0, "T")]
    assert report[2]["power"] == pytest.approx(R0 ** 4 * (1 - R0) ** 2,
                                               rel=1e-2)
    # count bookkeeping: every source ray contributes one direct hit
    assert report[0]["count"] == 512
    assert res.power_conservation_error() < 1e-4


def test_signature_roundtrip():
    # decode inverts the trace-side base-(2E+1) encoding
    chain = [(0, "T"), (3, "R"), (1, "T"), (2, "R")]
    base = 2 * 4 + 1
    sig = 0
    for e, b in chain:
        sig = sig * base + (1 + 2 * e + (1 if b == "T" else 0))
    assert analysis.decode_path(float(sig), 4) == chain


def test_detector_filter_and_fraction():
    res = run()
    rep = analysis.ghost_paths(res, elements=window_scene(),
                               detector="sensor")
    total = sum(r["power"] for r in rep)
    assert total == pytest.approx(res.detector_power("sensor"), rel=1e-4)
    assert rep[0]["fraction"] == pytest.approx(rep[0]["power"] / total,
                                               rel=1e-6)


def test_tracking_off_by_default():
    src = CollimatedSource(center=(0, 0, -2.0), direction=(0, 0, 1),
                           diameter=0.5, power=1.0, ray_count=64, seed=4)
    res = Tracer().trace(src, window_scene(), trace_iterations=4,
                         capacity=512)
    assert (res.measured_path == 0).all()
    with pytest.raises(ValueError, match="track_paths"):
        analysis.ghost_paths(
            type(res)(**{**res.__dict__,
                         "measured_path": np.zeros((0,), np.float32)}),
            elements=window_scene())


def test_track_paths_requires_host_mode():
    src = CollimatedSource(center=(0, 0, -2.0), direction=(0, 0, 1),
                           diameter=0.5, power=1.0, ray_count=64, seed=4)
    with pytest.raises(ValueError, match="host"):
        Tracer().trace(src, window_scene(), trace_iterations=4,
                       track_paths=True, mode="device")


def test_physics_identical_with_tracking():
    # signatures are bookkeeping only: ledger and detector totals match a
    # tracking-off run bit-for-bit at the f32 level
    src = CollimatedSource(center=(0, 0, -2.0), direction=(0, 0, 1),
                           diameter=0.5, power=1.0, ray_count=256, seed=4)
    els = window_scene()
    r_on = Tracer().trace(src, els, trace_iterations=6, capacity=2048,
                          track_paths=True)
    r_off = Tracer().trace(src, els, trace_iterations=6, capacity=2048)
    for k in ("emitted", "measured", "absorbed", "escaped", "culled"):
        assert r_on.ledger[k] == r_off.ledger[k], k
    np.testing.assert_array_equal(r_on.hist, r_off.hist)
