"""Single-mode fiber coupling: analysis.fiber_coupling overlap integral
(extension over the reference, which has no wavefront/coupling
analysis). Pure-function anchors are the classical Gaussian-overlap
closed forms; the end-to-end test couples a traced Gaussian beam (the
coherent image accumulator) into a mismatched mode."""

import numpy as np
import pytest

import lightpycl_tpu as L
from lightpycl_tpu.analysis import fiber_coupling
from lightpycl_tpu.sources import CollimatedSource
from lightpycl_tpu.tracer.config import TraceConfig
from lightpycl_tpu.tracer.engine import Tracer


def _gauss_field(B, halfwidth, w, center=(0.0, 0.0), tilt=0.0, wl=0.6328e-3):
    xs = (np.arange(B) + 0.5) / B * 2.0 * halfwidth - halfwidth
    X, Y = np.meshgrid(xs, xs, indexing="xy")
    f = np.exp(-((X - center[0]) ** 2 + (Y - center[1]) ** 2) / w**2)
    if tilt:
        f = f * np.exp(1j * (2 * np.pi / wl) * tilt * X)
    return f


class TestOverlapClosedForms:
    B, HW, W = 256, 0.5, 0.1

    def test_matched_mode_unity(self):
        U = _gauss_field(self.B, self.HW, self.W)
        assert fiber_coupling(U, self.HW, self.W) == pytest.approx(1.0,
                                                                   abs=1e-9)

    def test_lateral_offset(self):
        for dx in (0.02, 0.05, 0.1):
            U = _gauss_field(self.B, self.HW, self.W, center=(dx, 0.0))
            want = np.exp(-(dx / self.W) ** 2)
            assert fiber_coupling(U, self.HW, self.W) == pytest.approx(
                want, rel=1e-6), dx
            # equivalently: offset the MODE instead of the beam
            U0 = _gauss_field(self.B, self.HW, self.W)
            assert fiber_coupling(U0, self.HW, self.W,
                                  center=(dx, 0.0)) == pytest.approx(
                want, rel=1e-6)

    def test_waist_mismatch(self):
        for wb in (0.06, 0.08, 0.15):
            U = _gauss_field(self.B, self.HW, wb)
            want = (2 * wb * self.W / (wb**2 + self.W**2)) ** 2
            assert fiber_coupling(U, self.HW, self.W) == pytest.approx(
                want, rel=1e-6), wb

    def test_tilt(self):
        wl = 0.6328e-3
        for th in (1e-3, 3e-3):
            U = _gauss_field(self.B, self.HW, self.W, tilt=th, wl=wl)
            want = np.exp(-(np.pi * self.W * th / wl) ** 2)
            assert fiber_coupling(U, self.HW, self.W) == pytest.approx(
                want, rel=1e-5), th
            # or express the tilt on the mode side
            U0 = _gauss_field(self.B, self.HW, self.W)
            assert fiber_coupling(U0, self.HW, self.W, tilt=(th, 0.0),
                                  wavelength=wl) == pytest.approx(
                want, rel=1e-5)

    def test_tilt_needs_wavelength(self):
        U = _gauss_field(self.B, self.HW, self.W)
        with pytest.raises(ValueError, match="wavelength"):
            fiber_coupling(U, self.HW, self.W, tilt=(1e-3, 0.0))


class TestTracedBeamCoupling:
    def test_traced_gaussian_beam_couples_by_mismatch_formula(self):
        """A hexapolar Gaussian-profile beam (uniform ray density, the
        profile in the powers — so the binned coherent amplitude is
        proportional to E) butt-couples into offset/mismatched modes by
        the closed forms, through the ACTUAL trace + image accumulator."""
        w_b = 0.25
        src = CollimatedSource(center=(0, 0, -0.2), direction=(0, 0, 1),
                               diameter=1.2, power=1.0, ray_count=8192,
                               sampling="hexapolar", profile="gaussian",
                               waist=w_b)
        oe = L.optical_elements()
        screen = oe.rectangle(width=3.0, depth=3.0, center=(0, 0, 0.0),
                              material="measure", name="fiber")
        # >= ~10 rays per occupied pixel: the binned amplitude is
        # count x sqrt(p), so sparse occupancy inflates <U, U> by
        # E[c^2]/E[c]^2 and biases eta LOW (0.83 at ~1 ray/pixel)
        cfg = TraceConfig(coherent=True, image_bins=32,
                          image_center=(0, 0, 0), image_halfwidth=0.6)
        res = Tracer(cfg).trace(src, [screen], trace_iterations=2,
                                capacity=8192)
        U = res.image_complex
        eta_match = fiber_coupling(U, 0.6, w_b)
        assert eta_match > 0.97                  # matched mode
        for wm in (0.18, 0.35):
            want = (2 * w_b * wm / (w_b**2 + wm**2)) ** 2
            got = fiber_coupling(U, 0.6, wm)
            assert got == pytest.approx(want, rel=0.04), wm
        dx = 0.12
        want = np.exp(-(dx / w_b) ** 2) * eta_match
        got = fiber_coupling(U, 0.6, w_b, center=(dx, 0.0))
        assert got == pytest.approx(want, rel=0.05)
