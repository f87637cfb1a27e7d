"""Multi-chip tests on the virtual 8-device CPU mesh (BASELINE configs[4]):
rays sharded, mesh replicated, psum'd detector bins; results must match the
single-device trace exactly.
"""

import jax
import numpy as np
import pytest

import lightpycl_tpu as L
from lightpycl_tpu.parallel.sharding import make_ray_mesh, shard_rays, trace_multichip
from lightpycl_tpu.sources import CollimatedSource
from lightpycl_tpu.tracer.config import TraceConfig
from lightpycl_tpu.tracer.engine import Tracer
from lightpycl_tpu.tracer.rays import RayBatch

oe = L.optical_elements(n_segments=24, n_radial=8)


def scene_els():
    return [
        oe.parabolic_mirror(0.5, 2.0, reflectivity=0.9),
        oe.hemisphere(10.0, name="dome"),
        oe.biconvex_lens(1.0, 0.6, 0.1, ior=1.5, center=(0, 0, 1.0)),
    ]


class TestMultichip:
    def test_eight_devices_available(self):
        assert len(jax.devices()) == 8

    def test_matches_single_device(self):
        els = scene_els()
        src = CollimatedSource(center=(0, 0, 3), direction=(0, 0, -1),
                               diameter=1.5, ray_count=2048, power=1.0, seed=3)
        cfg = TraceConfig(hist_azimuth_bins=16, hist_polar_bins=8)
        origins, dirs, powers = src.sample()
        rays = RayBatch.from_arrays(origins, dirs, powers)

        # single device reference
        tr = Tracer(cfg)
        res1 = tr.trace(src, els, trace_iterations=5, mode="device",
                        rays=rays, capacity=2048)

        # 8-way sharded
        mesh = make_ray_mesh(8)
        rays8 = shard_rays(RayBatch.from_arrays(origins, dirs, powers), mesh)
        scene, _ = L.build_scene(els)
        _, det, led = trace_multichip(scene, rays8, cfg, 5, mesh)

        assert float(led.emitted) == pytest.approx(res1.ledger["emitted"], rel=1e-6)
        assert float(led.measured) == pytest.approx(res1.ledger["measured"], rel=1e-4)
        assert float(led.absorbed) == pytest.approx(res1.ledger["absorbed"], rel=1e-4)
        assert np.allclose(np.asarray(det.hist), res1.hist, atol=1e-5)

    def test_conservation_under_sharding(self):
        els = scene_els()
        src = CollimatedSource(center=(0, 0, 3), direction=(0, 0, -1),
                               diameter=1.5, ray_count=1024, power=2.0, seed=4)
        cfg = TraceConfig()
        mesh = make_ray_mesh(8)
        origins, dirs, powers = src.sample()
        rays = shard_rays(RayBatch.from_arrays(origins, dirs, powers), mesh)
        scene, _ = L.build_scene(els)
        rays_out, det, led = trace_multichip(scene, rays, cfg, 6, mesh)
        live = float(np.asarray(
            (rays_out.power * rays_out.alive).sum()
        ))
        acc = float(led.measured + led.absorbed + led.escaped + led.culled)
        assert acc + live == pytest.approx(2.0, rel=1e-5)

    def test_sharded_rays_layout(self):
        mesh = make_ray_mesh(8)
        rays = RayBatch.from_arrays(
            np.zeros((800, 3)), np.tile([0, 0, 1.0], (800, 1)), np.ones(800)
        )
        sharded = shard_rays(rays, mesh)
        assert len(sharded.o.sharding.device_set) == 8


def many_detector_els(n_det=10):
    """n_det unit-width measure rectangles side by side at z=0 plus a
    catch-all terminator floor below."""
    from lightpycl_tpu.materials import Material

    els = [
        oe.rectangle(1.0, 4.0, center=(x - (n_det - 1) / 2.0, 0, 0),
                     material=Material.MEASURE, name=f"panel{x}")
        for x in range(n_det)
    ]
    els.append(oe.rectangle(40.0, 40.0, center=(0, 0, -1.0),
                            material=Material.TERMINATOR))
    return els


class TestEngineMultichip:
    def test_engine_mode_matches_device_mode(self):
        els = scene_els()
        src = CollimatedSource(center=(0, 0, 3), direction=(0, 0, -1),
                               diameter=1.5, ray_count=2048, power=1.0, seed=3)
        cfg = TraceConfig(hist_azimuth_bins=16, hist_polar_bins=8)
        tr = Tracer(cfg)
        res1 = tr.trace(src, els, trace_iterations=5, mode="device")
        res8 = tr.trace(src, els, trace_iterations=5, mode="multichip")
        assert res8.ledger["emitted"] == pytest.approx(
            res1.ledger["emitted"], rel=1e-6)
        assert res8.ledger["measured"] == pytest.approx(
            res1.ledger["measured"], rel=1e-4)
        assert np.allclose(res8.hist, res1.hist, atol=1e-5)
        assert np.allclose(res8.per_detector, res1.per_detector, atol=1e-5)
        assert res8.per_detector.shape == res1.per_detector.shape
        assert res8.detector_names == res1.detector_names

    def test_engine_mode_pads_capacity(self):
        # 1000 rays does not divide 8; the engine must pad, not crash,
        # and padding must not change the physics
        els = scene_els()
        src = CollimatedSource(center=(0, 0, 3), direction=(0, 0, -1),
                               diameter=1.5, ray_count=1000, power=1.0, seed=5)
        tr = Tracer(TraceConfig())
        res1 = tr.trace(src, els, trace_iterations=5, mode="device")
        res8 = tr.trace(src, els, trace_iterations=5, mode="multichip")
        assert res8.ledger["measured"] == pytest.approx(
            res1.ledger["measured"], rel=1e-4)

    def test_nine_plus_detectors(self):
        # regression: the sharded paths used to hard-code 8 detector slots,
        # silently folding detectors >= 8 into bin 7
        n_det = 10
        els = many_detector_els(n_det)
        src = CollimatedSource(center=(0, 0, 3), direction=(0, 0, -1),
                               diameter=9.0, ray_count=4096, power=1.0, seed=6)
        tr = Tracer(TraceConfig())
        res1 = tr.trace(src, els, trace_iterations=2, mode="device")
        res8 = tr.trace(src, els, trace_iterations=2, mode="multichip")
        assert len(res8.detector_names) == n_det
        assert res8.per_detector.shape == (n_det,)
        # every panel (including ids 8 and 9) collects some power and the
        # sharded result matches the single-device one detector-by-detector
        assert (res1.per_detector > 0).all()
        np.testing.assert_allclose(res8.per_detector, res1.per_detector,
                                   atol=1e-5)

    def test_roulette_multichip_conserves(self):
        els = scene_els()
        src = CollimatedSource(center=(0, 0, 3), direction=(0, 0, -1),
                               diameter=1.5, ray_count=1024, power=1.0, seed=7)
        cfg = TraceConfig(roulette_threshold=5e-3)
        tr = Tracer(cfg)
        res = tr.trace(src, els, trace_iterations=6, mode="multichip")
        assert res.power_conservation_error() < 1e-5
        assert res.ledger["measured"] > 0.5

    def test_roulette_requires_key_at_api_boundary(self):
        els = scene_els()
        src = CollimatedSource(center=(0, 0, 3), direction=(0, 0, -1),
                               diameter=1.5, ray_count=512, power=1.0, seed=8)
        cfg = TraceConfig(roulette_threshold=5e-3)
        scene, _ = L.build_scene(els)
        o, d, p = src.sample()
        mesh = make_ray_mesh(8)
        rays = shard_rays(RayBatch.from_arrays(o, d, p), mesh)
        with pytest.raises(ValueError, match="PRNG key"):
            trace_multichip(scene, rays, cfg, 4, mesh)


def coated_window_els():
    """Split-heavy scene (the spectral suite's coated window): every ray
    splits at both window faces, so per-shard compaction headroom matters."""
    win = oe.cube(size=(1.0, 1.0, 0.25), material="refractive", ior=1.52,
                  coat_ior=1.38, coat_thickness=0.55 / (4 * 1.38), name="win")
    fwd = oe.disc(radius=1.5, center=(0, 0, 2.0), material="measure",
                  name="fwd")
    back = oe.disc(radius=1.5, center=(0, 0, -2.0), material="measure",
                   name="back")
    shell = oe.sphere(radius=8.0, material="terminator")
    return [win, fwd, back, shell]


class TestShardInterleave:
    """Regression for the silent-power-cull bug class: contiguous
    block-sharding of a front-packed RayBatch piles every live ray onto
    the first shards, overflows per-shard compaction at the first Fresnel
    split, and silently culls ~0.6% of power (6x the parity budget) even
    though the GLOBAL capacity has 4x headroom. shard_rays round-robin
    interleaves slots across shards, making the sharded trace exactly
    match the single-device one (modulo f32 psum order)."""

    def _realistic_load(self):
        els = coated_window_els()
        src = CollimatedSource(center=(0, 0, -1.0), direction=(0, 0, 1),
                               diameter=0.5, ray_count=1024, power=1.0,
                               seed=4)
        o, d, p = src.sample()
        return els, src, o, d, p

    def test_multichip_headroom_zero_cull(self):
        els, src, o, d, p = self._realistic_load()
        res1 = Tracer(TraceConfig()).trace(
            src, els, trace_iterations=8, mode="device",
            rays=RayBatch.from_arrays(o, d, p, capacity=4096),
            dissipation_target=1.0)
        res8 = Tracer(TraceConfig()).trace(
            src, els, trace_iterations=8, mode="multichip",
            rays=RayBatch.from_arrays(o, d, p, capacity=4096))
        assert abs(res1.ledger["culled"]) < 1e-6
        assert abs(res8.ledger["culled"]) < 1e-6
        # 1e-4 abs: f32 psum/scatter order noise at 8 shards x 8 bounces
        # (~3e-5 observed); the block-sharding bug this guards against is
        # ~6e-3 — two orders larger
        for k in ("emitted", "measured", "absorbed", "escaped"):
            assert res8.ledger[k] == pytest.approx(res1.ledger[k],
                                                   abs=1e-4), k
        np.testing.assert_allclose(res8.per_detector, res1.per_detector,
                                   atol=1e-4)

    def test_mesh2d_headroom_zero_cull(self):
        from lightpycl_tpu.parallel.mesh2d import make_mesh2d

        els, src, o, d, p = self._realistic_load()
        res1 = Tracer(TraceConfig()).trace(
            src, els, trace_iterations=8, mode="device",
            rays=RayBatch.from_arrays(o, d, p, capacity=4096),
            dissipation_target=1.0)
        res2 = Tracer(TraceConfig()).trace(
            src, els, trace_iterations=8, mode="mesh2d",
            mesh=make_mesh2d(2, 4),
            rays=RayBatch.from_arrays(o, d, p, capacity=4096))
        assert abs(res2.ledger["culled"]) < 1e-6
        for k in ("emitted", "measured", "absorbed", "escaped"):
            assert res2.ledger[k] == pytest.approx(res1.ledger[k],
                                                   abs=1e-4), k
        np.testing.assert_allclose(res2.per_detector, res1.per_detector,
                                   atol=1e-4)

    def test_interleave_roundtrip(self):
        from lightpycl_tpu.parallel.sharding import (
            deinterleave_rays, interleave_rays,
        )

        rng = np.random.default_rng(0)
        rays = RayBatch.from_arrays(
            rng.normal(size=(64, 3)), np.tile([0, 0, 1.0], (64, 1)),
            rng.uniform(0.1, 1.0, 64), capacity=256)
        perm = interleave_rays(rays, 8)
        # each shard block holds every 8th original slot
        assert np.allclose(np.asarray(perm.power)[: 256 // 8],
                           np.asarray(rays.power)[::8])
        back = deinterleave_rays(perm, 8)
        for a, b in zip(back, rays):
            assert np.array_equal(np.asarray(a), np.asarray(b))
        with pytest.raises(ValueError, match="divisible"):
            interleave_rays(rays, 7)


class TestCullUnderSharding:
    def test_cull_multichip_matches_brute(self):
        """cfg.cull inside the sharded path (per-shard Morton reorder +
        reachability mask) must not change the physics."""
        els = scene_els()
        src = CollimatedSource(center=(0, 0, 3), direction=(0, 0, -1),
                               diameter=1.5, ray_count=2048, power=1.0,
                               seed=9)
        res_b = Tracer(TraceConfig()).trace(src, els, trace_iterations=5,
                                            mode="multichip")
        res_c = Tracer(TraceConfig(cull=True)).trace(
            src, els, trace_iterations=5, mode="multichip")
        assert res_c.ledger["measured"] == pytest.approx(
            res_b.ledger["measured"], rel=1e-5)
        np.testing.assert_allclose(res_c.hist, res_b.hist, atol=1e-5)
        assert res_c.power_conservation_error() < 1e-5
