"""Geometry layer tests: primitives, winding/normals, transforms.

SURVEY.md §7 Stage 0: mesh normals/winding, transform correctness.
"""

import numpy as np
import pytest

from lightpycl_tpu.geometry.mesh import GeoObject, merge, rotation_matrix
from lightpycl_tpu.geometry.primitives import OpticalElements
from lightpycl_tpu.materials import Material

oe = OpticalElements(n_segments=48, n_radial=24)


def outwardness(obj, center=(0, 0, 0)):
    """Mean sign of dot(face normal, centroid - center): +1 = all outward."""
    tv = obj.triangle_vertices()
    centroids = tv.mean(axis=1) - np.asarray(center, float)
    n = obj.face_normals()
    d = np.einsum("ij,ij->i", n, centroids)
    return np.sign(d[np.abs(d) > 1e-12]).mean()


def is_watertight(obj):
    """Every edge shared by exactly two triangles (opposite orientation)."""
    t = obj.triangles
    edges = np.concatenate([t[:, [0, 1]], t[:, [1, 2]], t[:, [2, 0]]])
    und = np.sort(edges, axis=1)
    _, counts = np.unique(und, axis=0, return_counts=True)
    return bool((counts == 2).all())


class TestPrimitives:
    def test_sphere_area_and_normals(self):
        s = oe.sphere(radius=2.0)
        assert s.area() == pytest.approx(4 * np.pi * 4, rel=0.01)
        assert outwardness(s) == pytest.approx(1.0)
        assert is_watertight(s)

    def test_cube(self):
        c = oe.cube(size=2.0, center=(1, 2, 3))
        assert c.area() == pytest.approx(24.0)
        assert outwardness(c, center=(1, 2, 3)) == pytest.approx(1.0)
        assert is_watertight(c)

    def test_cylinder_watertight(self):
        c = oe.cylinder(radius=1.0, height=2.0)
        side = 2 * np.pi * 1.0 * 2.0
        caps = 2 * np.pi
        assert c.area() == pytest.approx(side + caps, rel=0.01)
        assert outwardness(c) == pytest.approx(1.0)
        assert is_watertight(c)

    def test_hemisphere_dome(self):
        h = oe.hemisphere(radius=3.0)
        assert h.material == Material.MEASURE
        assert h.area() == pytest.approx(2 * np.pi * 9, rel=0.01)
        assert (h.vertices[:, 2] >= -1e-9).all()
        # dome normals point away from the center
        assert outwardness(h) == pytest.approx(1.0)

    def test_parabolic_mirror_shape(self):
        f = 0.7
        m = oe.parabolic_mirror(focus=f, diameter=2.0)
        r2 = m.vertices[:, 0] ** 2 + m.vertices[:, 1] ** 2
        assert np.allclose(m.vertices[:, 2], r2 / (4 * f), atol=1e-9)
        assert m.material == Material.MIRROR

    def test_biconvex_lens_closed(self):
        lens = oe.biconvex_lens(r=2.0, aperture=1.0, thickness=0.2, ior=1.7)
        assert lens.ior == 1.7
        assert lens.material == Material.REFRACTIVE
        assert is_watertight(lens)
        assert outwardness(lens, center=(0, 0, 0.1)) == pytest.approx(1.0)
        lo, hi = lens.bounds()
        assert lo[2] == pytest.approx(0.0, abs=1e-9)
        assert hi[2] == pytest.approx(0.2, abs=1e-9)

    def test_plano_convex_flat_front(self):
        lens = oe.plano_convex_lens(r=0.5, aperture=0.6, thickness=0.1)
        assert is_watertight(lens)
        front = lens.vertices[np.abs(lens.vertices[:, 2]) < 1e-12]
        assert len(front) > 3  # flat front disc at z=0

    def test_lens_surfaces_intersect_raises(self):
        with pytest.raises(ValueError):
            oe.biconvex_lens(r=0.5, aperture=0.9, thickness=0.01)

    def test_prism(self):
        p = oe.prism(width=1.0, height=1.0, length=2.0)
        assert is_watertight(p)
        assert outwardness(p, center=(0, 0.4, 0)) == pytest.approx(1.0)

    def test_disc_normal_up(self):
        d = oe.disc(radius=1.0)
        n = d.face_normals()
        assert (n[:, 2] > 0.99).all()
        assert d.area() == pytest.approx(np.pi, rel=0.01)


class TestTransforms:
    def test_translate_rotate_scale(self):
        c = oe.cube(1.0)
        c.translate((1, 0, 0)).rotate((0, 0, 1), np.pi / 2).scale(2.0)
        # cube center moved to (0, 2, 0) after rotate about z then scale
        assert np.allclose(c.vertices.mean(axis=0), (0, 2, 0), atol=1e-9)
        assert is_watertight(c)
        assert outwardness(c, center=(0, 2, 0)) == pytest.approx(1.0)

    def test_rotation_matrix_orthonormal(self, rng):
        for _ in range(5):
            R = rotation_matrix(rng.normal(size=3), rng.uniform(0, np.pi))
            assert np.allclose(R @ R.T, np.eye(3), atol=1e-12)
            assert np.linalg.det(R) == pytest.approx(1.0)

    def test_rotate_about_pivot(self):
        s = oe.sphere(1.0, center=(2, 0, 0))
        s.rotate((0, 0, 1), np.pi, pivot=(1, 0, 0))
        assert np.allclose(s.vertices.mean(axis=0), (0, 0, 0), atol=1e-9)

    def test_mirror_scale_flips_winding(self):
        c = oe.cube(1.0)
        c.scale((-1, 1, 1))
        assert outwardness(c) == pytest.approx(1.0)  # normals still outward

    def test_transformed_pure(self):
        c = oe.cube(1.0)
        v0 = c.vertices.copy()
        c2 = c.transformed(rotation_matrix((0, 0, 1), 0.3), offset=(5, 0, 0))
        assert np.allclose(c.vertices, v0)  # original untouched
        assert np.allclose(c2.vertices.mean(axis=0), (5, 0, 0), atol=1e-9)

    def test_merge(self):
        m = merge([oe.cube(1.0), oe.cube(1.0, center=(3, 0, 0))])
        assert m.num_triangles == 24
        assert is_watertight(m)


class TestCylindricalLens:
    """Plano-convex cylindrical lens: line focus in x only (extension)."""

    def test_line_focus_at_thick_lens_bfd(self):
        import lightpycl_tpu as L
        from lightpycl_tpu.analysis import spot_diagram
        from lightpycl_tpu.sources import CollimatedSource
        from lightpycl_tpu.tracer.engine import Tracer

        n, R, t = 1.5, 0.6, 0.2
        oe = L.optical_elements(n_segments=32, n_radial=64)
        lens = oe.cylindrical_lens(R, aperture=0.8, thickness=t,
                                   length=1.2, ior=n)
        dome = oe.sphere(radius=8.0, material="measure", name="dome")
        src = CollimatedSource(center=(0, 0, -0.5), direction=(0, 0, 1),
                               diameter=0.16, power=1.0, ray_count=2000,
                               seed=3)
        res = Tracer().trace(src, [lens, dome], trace_iterations=5,
                             capacity=8000)
        assert res.power_conservation_error() < 1e-5
        sel = res.measured_power > 0.5 * res.measured_power.max()
        pos, dirs = res.measured_pos[sel], res.measured_dir[sel]
        # flat-entrance plano-convex: rear principal plane sits AT the
        # curved exit vertex, so the paraxial line focus is at
        # z = t + R/(n-1) exactly
        z_th = t + R / (n - 1.0)
        zs = np.linspace(z_th - 0.4, z_th + 0.4, 41)
        sx = [spot_diagram(pos, dirs, z)["xy"][:, 0].std() for z in zs]
        z_best = zs[int(np.argmin(sx))]
        assert z_best == pytest.approx(z_th, abs=0.05)
        # a LINE: x collapses, y stays the beam's extent
        xy = spot_diagram(pos, dirs, z_best)["xy"]
        assert xy[:, 1].std() > 8.0 * xy[:, 0].std()
        assert xy[:, 1].std() == pytest.approx(0.16 / 4.0, rel=0.15)

    def test_parameter_validation(self):
        import lightpycl_tpu as L

        oe = L.optical_elements()
        with pytest.raises(ValueError, match="aperture"):
            oe.cylindrical_lens(0.3, aperture=0.8)
        with pytest.raises(ValueError, match="edge thickness"):
            oe.cylindrical_lens(0.42, aperture=0.8, thickness=0.05)

    def test_cross_section_mirror_symmetric(self):
        # regression: the +x rim used to be replaced by a slanted chamfer
        # one radial step wide (arc[0] dropped from the cross-section) while
        # the -x rim was square — full-chord rays then hit a spurious facet.
        # The vertex set must be exactly mirror-symmetric under x -> -x.
        import lightpycl_tpu as L

        oe = L.optical_elements(n_segments=16, n_radial=9)  # odd: no x=0 luck
        lens = oe.cylindrical_lens(0.6, aperture=0.8, thickness=0.2,
                                   length=1.0)
        v = np.asarray(lens.vertices)[:, :3]
        flipped = v * np.array([-1.0, 1.0, 1.0])
        # every flipped vertex must coincide with some original vertex
        d2 = ((flipped[:, None, :] - v[None, :, :]) ** 2).sum(-1)
        assert d2.min(axis=1).max() < 1e-12
        # both rims present at full aperture: vertices at x = +-a, z = rim
        a, rim_z = 0.4, 0.2 - (0.6 - np.sqrt(0.6**2 - 0.4**2))
        for sx in (+a, -a):
            sel = np.isclose(v[:, 0], sx, atol=1e-9)
            assert np.isclose(v[sel][:, 2].max(), rim_z, atol=1e-9)


class TestCopyPreservesAllFields:
    def test_copy_and_transformed_keep_extension_fields(self):
        # regression: copy() used a positional constructor call frozen at
        # the round-1 field list, silently resetting every later field
        # (ne, scattering, fluorescence, roughness, ...) — so
        # transformed()/instances() of an r2/r3-tier element lost its
        # physics
        import dataclasses

        import lightpycl_tpu as L
        from lightpycl_tpu.geometry.mesh import GeoObject

        oe = L.optical_elements()
        el = oe.cube(1.0, material="refractive", ior=1.4, scattering=2.0,
                     scatter_g=0.3, absorption=0.1, fluorescence=1.5,
                     fluor_emission=(0.6, 0.05), fluor_yield=0.7,
                     fluor_edge=0.5)
        for out in (el.copy(),
                    el.transformed(np.eye(3), offset=(1.0, 0.0, 0.0))):
            for f in dataclasses.fields(GeoObject):
                if f.name in ("vertices", "triangles"):
                    continue
                assert getattr(out, f.name) == getattr(el, f.name), f.name
        rough = oe.cube(1.0, material="mirror", roughness=0.05,
                        roughness_lobe=0.4).copy()
        assert rough.roughness == 0.05 and rough.roughness_lobe == 0.4
