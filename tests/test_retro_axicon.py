"""Axicon (conical lens) and corner-cube retroreflector primitives
(extension beyond the reference's factory — SURVEY.md §3 'Primitive mesh
factory'). Anchors are exact geometric optics: the axicon's wedge
deviation asin(n sin a) - a and the corner cube's exact direction
reversal for any arrival orientation."""

import numpy as np
import pytest

import lightpycl_tpu as L
from lightpycl_tpu.sources import CollimatedSource
from lightpycl_tpu.tracer.engine import Tracer


class TestAxicon:
    def test_exact_wedge_deviation(self):
        """A paraxial-offset ray exits deflected toward the axis by
        exactly asin(n sin a) - a (flat entry, conical exit)."""
        n_g, alpha = 1.5, np.deg2rad(10.0)
        oe = L.optical_elements(n_segments=96, n_radial=24)
        ax = oe.axicon(diameter=1.0, cone_angle=alpha, thickness=0.1,
                       ior=n_g, center=(0, 0, 0.5))
        world = oe.sphere(radius=20.0, material="measure", name="world")
        src = CollimatedSource(center=(0.3, 0, 0), direction=(0, 0, 1),
                               diameter=1e-6, power=1.0, ray_count=1)
        res = Tracer().trace(src, [ax, world], trace_iterations=6,
                             capacity=64)
        assert res.power_conservation_error() < 1e-4
        d = res.measured_dir[res.measured_power.argmax()]
        delta = np.arcsin(n_g * np.sin(alpha)) - alpha
        # exact wedge deviation toward the axis; the small azimuthal
        # component is the 96-gon facet quantization of the cone (the
        # facet normal tilts azimuthally between meridians)
        assert np.arccos(np.clip(d[2], -1, 1)) == pytest.approx(delta,
                                                                abs=1e-4)
        assert d[0] < -0.9 * np.sin(delta)
        assert abs(d[1]) < 5e-3

    def test_line_focus_scales_with_radius(self):
        """Rays at entry radius r cross the axis at z ~ r / tan(delta):
        the axicon's extended line focus (not a point)."""
        n_g, alpha = 1.5, np.deg2rad(10.0)
        oe = L.optical_elements(n_segments=96, n_radial=24)
        ax = oe.axicon(diameter=1.0, cone_angle=alpha, thickness=0.1,
                       ior=n_g, center=(0, 0, 0.5))
        world = oe.sphere(radius=20.0, material="measure", name="world")
        delta = np.arcsin(n_g * np.sin(alpha)) - alpha

        def cross_z(r0):
            src = CollimatedSource(center=(r0, 0, 0), direction=(0, 0, 1),
                                   diameter=1e-6, power=1.0, ray_count=1)
            res = Tracer().trace(src, [ax, world], trace_iterations=6,
                                 capacity=64)
            j = res.measured_power.argmax()
            p, d = res.measured_pos[j], res.measured_dir[j]
            t = -p[0] / d[0]               # x = 0 crossing
            return p[2] + t * d[2]

        z1, z2 = cross_z(0.15), cross_z(0.30)
        assert (z2 - z1) == pytest.approx(0.15 / np.tan(delta), rel=0.02)


class TestCornerCube:
    @pytest.mark.parametrize("seed", [1, 2, 3])
    def test_exact_retroreflection(self, seed):
        """Any ray striking all three faces exits anti-parallel to its
        arrival, for arbitrary cube orientation."""
        rng = np.random.default_rng(seed)
        oe = L.optical_elements()
        cc = oe.corner_cube(size=1.0).rotate(
            rng.normal(size=3) + 1e-3, rng.uniform(0, np.pi))
        world = oe.sphere(radius=25.0, material="measure", name="world")
        # shoot INTO the open corner: direction roughly along the
        # cube's opening axis (the rotated (1,1,1)), randomly tilted
        centroid = cc.vertices.mean(axis=0) + 1e-3
        open_axis = (cc.vertices[2] + cc.vertices[6] + cc.vertices[10]
                     - 3.0 * cc.vertices[0])
        open_axis /= np.linalg.norm(open_axis)
        # keep the tilt inside the retro acceptance cone (a steep
        # arrival legitimately misses one face and exits un-reversed)
        tilt = 0.15 * rng.normal(size=3)
        d_in = -(open_axis + tilt)
        d_in /= np.linalg.norm(d_in)
        origin = centroid - 5.0 * d_in
        src = CollimatedSource(center=tuple(origin), direction=tuple(d_in),
                               diameter=1e-6, power=1.0, ray_count=1)
        res = Tracer().trace(src, [cc, world], trace_iterations=8,
                             capacity=64)
        assert res.power_conservation_error() < 1e-4
        d_out = res.measured_dir[res.measured_power.argmax()]
        assert d_out @ d_in < -(1.0 - 2e-6), (d_out, d_in)

    def test_power_after_three_bounces(self):
        """reflectivity^3 survives (three mirror hits)."""
        oe = L.optical_elements()
        cc = oe.corner_cube(size=1.0, reflectivity=0.9)
        world = oe.sphere(radius=25.0, material="measure", name="world")
        d_in = -np.array([1.0, 1.1, 0.9])
        d_in /= np.linalg.norm(d_in)
        src = CollimatedSource(center=tuple(np.array([0.35, 0.35, 0.35])
                                            - 5.0 * d_in),
                               direction=tuple(d_in), diameter=1e-6,
                               power=1.0, ray_count=1)
        res = Tracer().trace(src, [cc, world], trace_iterations=8,
                             capacity=64)
        assert res.measured_power.max() == pytest.approx(0.9**3, abs=1e-4)
