"""Compaction strategy tests: topk vs stream vs no-split fast path must
agree on physics (ledger/histogram); no-split must be rejected for
refractive scenes."""

import numpy as np
import pytest

import lightpycl_tpu as L
from lightpycl_tpu.sources import CollimatedSource
from lightpycl_tpu.tracer.config import TraceConfig
from lightpycl_tpu.tracer.engine import Tracer

oe = L.optical_elements(n_segments=24, n_radial=8)


def mirror_scene():
    return [oe.parabolic_mirror(0.5, 2.0, reflectivity=0.9),
            oe.hemisphere(10.0, name="dome")]


def lens_scene():
    return [oe.biconvex_lens(1.0, 0.8, 0.2, ior=1.5),
            oe.sphere(radius=6.0, material="measure", name="enclosure")]


SRC = dict(center=(0, 0, 3), direction=(0, 0, -1), diameter=1.5,
           ray_count=512, power=1.0, seed=3)


class TestStrategies:
    def test_no_split_fast_path_matches(self):
        src = CollimatedSource(**SRC)
        # engine auto-disables splitting for the mirror-only scene
        res_auto = Tracer().trace(src, mirror_scene(), trace_iterations=4,
                                  mode="device")
        # force the generic 2C path via a dummy refractive element far away
        far_lens = oe.cube(0.1, center=(100, 100, 100), material="refractive")
        res_generic = Tracer().trace(src, mirror_scene() + [far_lens],
                                     trace_iterations=4, mode="device")
        for k in ("measured", "absorbed", "escaped"):
            assert res_auto.ledger[k] == pytest.approx(
                res_generic.ledger[k], rel=1e-5, abs=1e-7)
        assert np.allclose(res_auto.hist, res_generic.hist, atol=1e-5)

    def test_stream_matches_topk_without_overflow(self):
        src = CollimatedSource(**SRC)
        r_topk = Tracer().trace(src, lens_scene(), trace_iterations=5,
                                capacity=4096, compaction="topk")
        r_stream = Tracer().trace(src, lens_scene(), trace_iterations=5,
                                  capacity=4096, compaction="stream")
        for k in ("measured", "absorbed", "escaped", "culled"):
            assert r_stream.ledger[k] == pytest.approx(
                r_topk.ledger[k], rel=1e-4, abs=1e-6)

    def test_stream_overflow_conserves(self):
        # narrow beam -> every ray hits the lens -> 512 parents produce
        # 1024 live children against capacity 700: guaranteed overflow
        src = CollimatedSource(**{**SRC, "diameter": 0.6})
        res = Tracer().trace(src, lens_scene(), trace_iterations=6,
                             capacity=700, compaction="stream")
        assert res.power_conservation_error() < 1e-4
        assert res.ledger["culled"] > 0  # overflow actually happened

    def test_no_split_with_refractive_raises(self):
        src = CollimatedSource(**SRC)
        with pytest.raises(ValueError, match="refracted branch"):
            Tracer().trace(src, lens_scene(), trace_iterations=2,
                           allow_splitting=False)


class TestNoSplitStepLevelLedger:
    def test_policy_dropped_keeps_ledger_exact(self):
        # direct step-level use of allow_splitting=False on a refractive
        # scene: the dropped refracted power must be accounted (culled)
        import jax.numpy as jnp

        from lightpycl_tpu.tracer.rays import DetectorState, Ledger, RayBatch
        from lightpycl_tpu.tracer.step import trace_step

        scene, _ = L.build_scene(lens_scene())
        cfg = TraceConfig(allow_splitting=False)
        rays = RayBatch.from_arrays(
            np.tile([0, 0, -1.0], (64, 1)), np.tile([0, 0, 1.0], (64, 1)),
            np.full(64, 1.0 / 64))
        det = DetectorState.zeros(4, 4, 1)
        led = Ledger.start(1.0)
        for _ in range(4):
            rays, det, led, _ = trace_step(scene, rays, det, led, cfg)
        live = float(np.asarray(jnp.sum(jnp.where(rays.alive, rays.power, 0.0))))
        acc = float(np.asarray(led.accounted()))
        assert acc + live == pytest.approx(1.0, rel=1e-5)
        assert float(np.asarray(led.culled)) > 0.01  # refracted power dropped
