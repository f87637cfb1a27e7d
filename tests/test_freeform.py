"""Freeform (Zernike-sag) surfaces: zernike_mirror / zernike_plate
(extension beyond the reference's rotationally-symmetric factory —
SURVEY.md §3 'Primitive mesh factory').

The factories share Noll indexing/normalization with analysis.zernike_value
/ zernike_fit, so the design -> trace -> measure loop closes exactly:
  * a pure-tilt mirror deflects like the analytic tilted plane,
  * a pure-defocus mirror IS a paraboloid: focus at f = a^2/(8 sqrt(3) c4),
  * a thin freeform plate imprints W = (n-1) sag, recovered by zernike_fit,
  * device/oracle parity holds for a freeform mirror mesh.
"""

import numpy as np
import pytest

import lightpycl_tpu as L
from lightpycl_tpu.analysis import best_focus, zernike_fit
from lightpycl_tpu.sources import CollimatedSource
from lightpycl_tpu.tracer.engine import Tracer
from lightpycl_tpu.tracer.oracle import trace_oracle


class TestZernikeMirror:
    def test_pure_tilt_deflects_like_a_plane(self):
        """{2: c} is the plane z = 2 c x / a: the reflected direction of a
        normally-incident axial ray must match d - 2 (d.n) n exactly."""
        a, c2 = 0.5, 4e-3
        oe = L.optical_elements(n_segments=96, n_radial=24)
        mirror = oe.zernike_mirror(aperture=2 * a, coeffs={2: c2})
        dome = oe.sphere(radius=10.0, material="measure", name="dome")
        src = CollimatedSource(center=(0, 0, 1.0), direction=(0, 0, -1),
                               diameter=1e-6, power=1.0, ray_count=1)
        res = Tracer().trace(src, [mirror, dome], trace_iterations=4,
                             capacity=64)
        got = res.measured_dir[res.measured_power.argmax()]
        s = 2.0 * c2 / a                       # dz/dx of the plane
        n = np.array([-s, 0.0, 1.0]) / np.hypot(s, 1.0)
        d = np.array([0.0, 0.0, -1.0])
        want = d - 2.0 * (d @ n) * n
        assert got @ want > 1.0 - 1e-8
        assert abs(np.arccos(np.clip(got @ -d, -1, 1))
                   - 2.0 * np.arctan(s)) < 5e-5  # deflection = 2 alpha
        #                                  (f32 direction roundoff floor)

    def test_pure_defocus_focuses_at_predicted_f(self):
        """{4: c} is EXACTLY the paraboloid z = (2 sqrt(3) c / a^2) r^2
        (plus piston): collimated light focuses stigmatically at
        f = a^2 / (8 sqrt(3) c)."""
        a, f_want = 0.5, 2.0
        c4 = a * a / (8.0 * np.sqrt(3.0) * f_want)
        oe = L.optical_elements(n_segments=96, n_radial=24)
        mirror = oe.zernike_mirror(aperture=2 * a, coeffs={4: c4})
        dome = oe.sphere(radius=10.0, material="measure", name="dome")
        src = CollimatedSource(center=(0, 0, 1.0), direction=(0, 0, -1),
                               diameter=0.6, power=1.0, ray_count=512,
                               seed=1)
        res = Tracer().trace(src, [mirror, dome], trace_iterations=4,
                             capacity=2048)
        up = res.measured_dir[:, 2] > 0.2      # the reflected bundle
        z, rms = best_focus(res.measured_pos[up], res.measured_dir[up],
                            res.measured_power[up], z_range=(0.5, 4.0))
        # piston shifts the vertex by -sqrt(3) c4; the focus rides along
        z_want = f_want - np.sqrt(3.0) * c4
        assert z == pytest.approx(z_want, rel=0.02)
        # facet quantization (n_radial=24 mesh) sets the blur floor —
        # still a 40x contraction of the 0.3 beam radius
        assert rms < 8e-3

    def test_oracle_parity_freeform_mesh(self):
        """The freeform mesh is ordinary geometry to the tracer: f64
        oracle parity on a coma+astigmatism mirror."""
        oe = L.optical_elements(n_segments=48, n_radial=12)
        mirror = oe.zernike_mirror(
            aperture=1.0, coeffs={2: 2e-3, 6: 1.5e-3, 7: -1e-3, 11: 5e-4})
        dome = oe.sphere(radius=8.0, material="measure", name="dome")
        src = CollimatedSource(center=(0, 0, 1.0), direction=(0, 0, -1),
                               diameter=0.8, power=1.0, ray_count=256,
                               seed=3)
        o, d, p = src.sample()
        res = Tracer().trace(src, [mirror, dome], trace_iterations=4,
                             capacity=1024)
        ora = trace_oracle([mirror, dome], o, d, p, trace_iterations=4)
        assert res.ledger["measured"] == pytest.approx(ora["measured"],
                                                       rel=1e-3)
        assert res.power_conservation_error() < 1e-4


class TestZernikePlate:
    def test_wavefront_roundtrip_recovers_coeffs(self):
        """Design -> trace -> measure closes: a thin plate with Noll
        coefficients c_j imprints W = (n - 1) sag on a collimated beam,
        and zernike_fit of the traced OPL (same Noll convention) returns
        (n - 1) c_j term by term."""
        a, t, n_g = 0.5, 0.05, 1.5
        coeffs = {6: 1.2e-4, 7: 2.0e-4, 11: -1.5e-4}
        oe = L.optical_elements(n_segments=96, n_radial=24)
        plate = oe.zernike_plate(aperture=2 * a, thickness=t,
                                 coeffs=coeffs, ior=n_g)
        screen = oe.rectangle(width=4.0, depth=4.0, center=(0, 0, t + 0.02),
                              material="measure", name="screen")
        src = CollimatedSource(center=(0, 0, -0.05), direction=(0, 0, 1),
                               diameter=1.9 * a, power=1.0, ray_count=4096,
                               seed=5)
        res = Tracer().trace(src, [plate, screen], trace_iterations=6,
                             capacity=16384)
        opl, pw = res.measured_opl, res.measured_power
        # direct bundle only: internal double-bounce ghosts carry >= 2 n t
        # extra path (ghosts outnumber direct rays; they don't outweigh
        # them — filter from the shortest path, not the median)
        direct = opl < opl.min() + 0.5 * n_g * t
        xy = res.measured_pos[direct][:, :2]
        fit = zernike_fit(xy, opl[direct], n_terms=11,
                          powers=pw[direct], radius=a)
        for j, c in coeffs.items():
            assert fit["coeffs"][j - 1] == pytest.approx(
                (n_g - 1.0) * c, rel=0.05), j
        # terms not in the design stay near zero (no cross-talk)
        for j in (5, 8, 9, 10):
            assert abs(fit["coeffs"][j - 1]) < 1e-5, j

    def test_null_corrector_iteration_converges(self):
        """Schmidt-style closed loop (compact version of
        examples/example_schmidt.py): fit a fast singlet's traced
        wavefront, subtract it from a corrector plate's sag, iterate.
        Three Newton steps must cut the high-order RMS >= 4x even
        though pupil distortion makes each single shot land only
        ~60-90%. Mesh density matters here: at n_radial=32 the plate's
        rho^6 (secondary-spherical) sag aliases into rho^4 and the
        Newton loop oscillates — 48 rings resolve it."""
        D, n_g = 0.5, 1.5
        oe = L.optical_elements(n_segments=96, n_radial=48)
        lens = oe.plano_convex_lens(r=0.5, aperture=0.6, thickness=0.1,
                                    ior=n_g)
        screen = oe.disc(radius=0.3, center=(0, 0, 0.25),
                         material="measure", name="screen")
        src = CollimatedSource(center=(0, 0, -1.0), direction=(0, 0, 1),
                               diameter=D, power=1.0, ray_count=800,
                               seed=4)
        state = {"radius": None}

        def fit_w(els):
            res = Tracer().trace(src, els, trace_iterations=8,
                                 capacity=12800)
            opl, pw = res.measured_opl, res.measured_power
            direct = opl < opl.min() + 0.05
            xy = res.measured_pos[direct][:, :2]
            if state["radius"] is None:
                state["radius"] = float(np.hypot(xy[:, 0], xy[:, 1]).max())
            return zernike_fit(xy, opl[direct], n_terms=22,
                               powers=pw[direct],
                               radius=state["radius"])["coeffs"]

        c = fit_w([lens, screen])
        rms0 = float(np.hypot.reduce(c[4:]))
        assert rms0 > 5e-5              # the singlet really is aberrated
        sag = {j: 0.0 for j in range(5, 23)}
        for _ in range(3):
            for j in sag:
                sag[j] -= float(c[j - 1]) / (n_g - 1.0)
            corr = oe.zernike_plate(aperture=D, thickness=0.03,
                                    coeffs=sag, ior=n_g,
                                    center=(0, 0, -0.4))
            c = fit_w([corr, lens, screen])
        assert float(np.hypot.reduce(c[4:])) < rms0 / 4.0

    def test_rim_dip_validation(self):
        oe = L.optical_elements()
        with pytest.raises(ValueError, match="rim"):
            oe.zernike_plate(aperture=1.0, thickness=1e-4,
                             coeffs={2: 0.05})

    def test_coeffs_validation(self):
        oe = L.optical_elements()
        with pytest.raises(ValueError, match="noll"):
            oe.zernike_mirror(aperture=1.0, coeffs={0: 1.0})
