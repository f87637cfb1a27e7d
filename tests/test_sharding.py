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
