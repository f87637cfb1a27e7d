"""Aspheric surfaces (even-asphere sag) + spot-diagram/focus analysis.

Physics anchor: a plano-convex singlet with the flat side toward a
collimated beam and a hyperbolic exit surface with conic constant
k = -n^2 is stigmatic — it focuses to a point at z = thickness + R/(n-1)
(Cartesian-oval result). The spherical version of the same lens suffers
spherical aberration; the asphere must beat it by a large factor.
"""

import numpy as np
import pytest

import lightpycl_tpu as L
from lightpycl_tpu.analysis import best_focus, encircled_energy, spot_diagram
from lightpycl_tpu.sources import CollimatedSource
from lightpycl_tpu.tracer.config import TraceConfig
from lightpycl_tpu.tracer.engine import Tracer


class TestSag:
    def test_k0_reduces_to_sphere(self):
        oe = L.optical_elements(n_segments=32, n_radial=12)
        sph = oe.spherical_lens(0.8, -0.6, 0.5, 0.15, ior=1.5)
        asp = oe.aspheric_lens(0.8, -0.6, 0.5, 0.15, ior=1.5, k1=0.0, k2=0.0)
        np.testing.assert_allclose(asp.vertices, sph.vertices, atol=1e-12)
        np.testing.assert_array_equal(asp.triangles, sph.triangles)

    def test_k_minus_one_is_paraboloid(self):
        from lightpycl_tpu.geometry.primitives import _asphere_sag

        r = np.linspace(0, 0.9, 50)
        R = 1.7
        np.testing.assert_allclose(_asphere_sag(r, R, k=-1.0),
                                   r * r / (2 * R), atol=1e-12)

    def test_polynomial_terms(self):
        from lightpycl_tpu.geometry.primitives import _asphere_sag

        r = np.linspace(0, 0.5, 20)
        z = _asphere_sag(r, None, coeffs=(0.1, -0.02))
        np.testing.assert_allclose(z, 0.1 * r**4 - 0.02 * r**6, atol=1e-14)

    def test_rim_domain_error(self):
        from lightpycl_tpu.geometry.primitives import _asphere_sag

        with pytest.raises(ValueError, match="rim"):
            _asphere_sag(np.array([0.99]), 1.0, k=0.5)


def _trace_singlet(k2):
    n = 1.5
    R = 0.5
    thick = 0.15
    oe = L.optical_elements(n_segments=192, n_radial=96)
    lens = oe.aspheric_lens(None, -R, aperture=0.5, thickness=thick,
                            ior=n, k2=k2)
    sphere = oe.sphere(radius=10.0, material="measure", name="wall")
    src = CollimatedSource(center=(0, 0, -0.5), direction=(0, 0, 1),
                           diameter=0.4, power=1.0, ray_count=2048, seed=4)
    res = Tracer(TraceConfig()).trace(src, [lens, sphere],
                                      trace_iterations=3, capacity=8192)
    # keep only the forward (direct transmitted) bundle; the front-surface
    # Fresnel reflection travels -z and is excluded
    fwd = res.measured_dir[:, 2] > 0.5
    return (res.measured_pos[fwd], res.measured_dir[fwd],
            res.measured_power[fwd], thick + R / (n - 1.0))


class TestStigmaticSinglet:
    def test_hyperbolic_beats_spherical_and_focus_position(self):
        pos_h, dir_h, pw_h, z_theory = _trace_singlet(k2=-1.5**2)
        pos_s, dir_s, pw_s, _ = _trace_singlet(k2=0.0)
        zr = (z_theory - 0.5, z_theory + 0.5)
        z_h, rms_h = best_focus(pos_h, dir_h, pw_h, z_range=zr)
        z_s, rms_s = best_focus(pos_s, dir_s, pw_s, z_range=zr)
        # the hyperbola is stigmatic: residual is tessellation noise only
        # (measured ~4.8x better than spherical at this tessellation)
        assert rms_h < rms_s / 3.0, (rms_h, rms_s)
        assert z_h == pytest.approx(z_theory, abs=0.05)
        # spherical aberration pulls the spherical lens's best focus short
        assert z_s < z_theory

    def test_spot_diagram_and_encircled_energy(self):
        pos, dirs, pw, z_theory = _trace_singlet(k2=-1.5**2)
        spot = spot_diagram(pos, dirs, z_theory, pw)
        assert np.linalg.norm(spot["centroid"]) < 1e-3
        assert spot["rms_radius"] < 5e-3
        # propagate ray intercepts at the focal plane; encircled energy is
        # monotone and complete
        xyz = np.concatenate([spot["xy"], np.full((len(spot["xy"]), 1),
                                                  z_theory)], axis=1)
        ok = np.abs(dirs[:, 2]) > 1e-12
        radii, frac = encircled_energy(xyz, pw[ok])
        assert (np.diff(frac) >= -1e-12).all()
        assert frac[-1] == pytest.approx(1.0)
        # nearly all power inside 10x the RMS radius
        radii2, frac2 = encircled_energy(
            xyz, pw[ok], radii=[10 * max(spot["rms_radius"], 1e-6)])
        assert frac2[0] > 0.95
