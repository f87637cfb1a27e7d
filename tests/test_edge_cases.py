"""Edge-case robustness: degenerate triangles, coincident surfaces, grazing
incidence, empty-ish scenes, capacity-1 batches."""

import numpy as np
import pytest

import lightpycl_tpu as L
from lightpycl_tpu.geometry.mesh import GeoObject
from lightpycl_tpu.sources import CollimatedSource
from lightpycl_tpu.tracer.config import TraceConfig
from lightpycl_tpu.tracer.engine import Tracer
from lightpycl_tpu.tracer.scene import build_scene
from lightpycl_tpu.tracer.step import intersect_jnp

import jax.numpy as jnp

oe = L.optical_elements(n_segments=16, n_radial=6)
CFG = TraceConfig()


class TestDegenerateGeometry:
    def test_zero_area_triangle_never_hit(self):
        # collinear vertices -> degenerate; must not produce hits or NaNs
        bad = GeoObject(
            np.array([[0, 0, 0], [1, 0, 0], [2, 0, 0.0]]),
            np.array([[0, 1, 2]]),
        )
        good = oe.rectangle(2, 2, center=(0, 0, 1))
        scene, _ = build_scene([bad, good])
        t, i = intersect_jnp(
            scene, jnp.asarray([[0.1, 0.1, -1.0]], jnp.float32),
            jnp.asarray([[0, 0, 1.0]], jnp.float32), CFG)
        assert int(i[0]) >= 1  # the rectangle, never the degenerate tri
        assert np.isfinite(float(t[0]))

    def test_duplicate_coincident_surfaces(self):
        # two identical measure rectangles stacked exactly: nearest-hit must
        # pick exactly one (lowest index) and count power once
        r1 = oe.rectangle(2, 2, center=(0, 0, 1), material="measure")
        r2 = oe.rectangle(2, 2, center=(0, 0, 1), material="measure")
        src = CollimatedSource(direction=(0, 0, 1), diameter=0.5, ray_count=200)
        res = Tracer().trace(src, [r1, r2], trace_iterations=2)
        assert res.ledger["measured"] == pytest.approx(1.0, rel=1e-5)

    def test_grazing_incidence_conserves(self):
        # rays nearly parallel to a surface
        wall = oe.rectangle(4, 4, center=(0, 0, 1), material="refractive")
        wall.material = L.Material.REFRACTIVE
        wall.ior = 1.5
        dome = oe.sphere(10.0, material="measure")
        d = np.tile([np.sin(1.56), 0.0, np.cos(1.56)], (100, 1))
        o = np.tile([0.0, 0.0, 0.0], (100, 1))
        p = np.full(100, 0.01)
        res = Tracer().trace(
            None, [wall, dome], trace_iterations=6, capacity=1024,
            rays=L.RayBatch.from_arrays(o, d, p, capacity=1024))
        assert res.power_conservation_error() < 1e-4

    def test_single_ray(self):
        det = oe.rectangle(2, 2, center=(0, 0, 1), material="measure")
        res = Tracer().trace(
            None, [det], trace_iterations=1,
            rays=L.RayBatch.from_arrays(
                np.zeros((1, 3)), np.array([[0, 0, 1.0]]), np.ones(1)))
        assert res.ledger["measured"] == pytest.approx(1.0)

    def test_ray_starting_on_surface(self):
        # origin exactly on the detector plane: eps guard skips the self
        # hit; ray flies to the far wall
        near = oe.rectangle(2, 2, center=(0, 0, 0), material="measure")
        far = oe.rectangle(2, 2, center=(0, 0, 1), material="terminator")
        res = Tracer().trace(
            None, [near, far], trace_iterations=1,
            rays=L.RayBatch.from_arrays(
                np.zeros((1, 3)), np.array([[0, 0, 1.0]]), np.ones(1)))
        assert res.ledger["absorbed"] == pytest.approx(1.0)

    def test_all_rays_dead_input(self):
        det = oe.rectangle(2, 2, center=(0, 0, 1), material="measure")
        rays = L.RayBatch.from_arrays(
            np.zeros((4, 3)), np.tile([0, 0, 1.0], (4, 1)), np.zeros(4))
        res = Tracer().trace(None, [det], trace_iterations=2, rays=rays)
        assert res.ledger["emitted"] == 0.0
        assert res.ledger["measured"] == 0.0
