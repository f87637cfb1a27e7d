"""Polarizer + waveplate materials (Stokes-bench extensions).

Analytic anchors:
  * Malus's law: unpolarized -> P1 transmits 1/2; P2 at angle theta
    transmits cos^2(theta) of that.
  * Quarter-wave plate at 45 deg converts linear to circular light.
  * Half-wave plate at 45 deg rotates x-polarization to y, defeating a
    crossed analyzer.
"""

import numpy as np
import pytest

import lightpycl_tpu as L
from lightpycl_tpu.materials import Material
from lightpycl_tpu.sources import CollimatedSource
from lightpycl_tpu.tracer.config import TraceConfig
from lightpycl_tpu.tracer.engine import Tracer

oe = L.optical_elements(n_segments=16, n_radial=6)


def polarizer(z, axis, **kw):
    return oe.rectangle(3.0, 3.0, center=(0, 0, z), material="polarizer",
                        axis=axis, **kw)


def waveplate(z, axis, retardance):
    return oe.rectangle(3.0, 3.0, center=(0, 0, z), material="waveplate",
                        axis=axis, retardance=retardance)


def detector(z=3.0):
    return oe.rectangle(4.0, 4.0, center=(0, 0, z), material="measure",
                        name="out")


def beam(stokes=None, n=128):
    return CollimatedSource(center=(0, 0, -1.0), direction=(0, 0, 1),
                            diameter=0.5, power=1.0, ray_count=n, seed=1,
                            stokes=stokes)


def run(els, src, iters=6):
    return Tracer(TraceConfig(polarization=True)).trace(
        src, els, trace_iterations=iters, capacity=1024)


class TestMalus:
    @pytest.mark.parametrize("theta_deg", [0.0, 30.0, 45.0, 60.0, 90.0])
    def test_two_polarizers(self, theta_deg):
        th = np.radians(theta_deg)
        els = [polarizer(0.5, (1, 0, 0)),
               polarizer(1.5, (np.cos(th), np.sin(th), 0)),
               detector()]
        res = run(els, beam())
        expect = 0.5 * np.cos(th) ** 2
        assert res.detector_power("out") == pytest.approx(expect, abs=1e-5)
        assert res.power_conservation_error() < 1e-5

    def test_output_fully_polarized_along_axis(self):
        res = run([polarizer(0.5, (1, 0, 0)), detector()], beam())
        # arriving rays: DOP = 1, s1 = +1 in the polarizer's frame
        s = res.measured_stokes
        assert np.allclose(np.abs(s[:, 0]), 1.0, atol=1e-5)
        assert np.allclose(s[:, 1:], 0.0, atol=1e-5)


class TestWaveplates:
    def test_quarter_wave_makes_circular(self):
        # linear at 45 deg to the fast axis: basis for d=+z is +y (s1=1
        # means y-polarized); fast axis at (1,1,0)/sqrt(2) sits 45 deg away
        els = [waveplate(0.5, (1, 1, 0), np.pi / 2), detector()]
        res = run(els, beam(stokes=(1.0, 0.0, 0.0)))
        s = res.measured_stokes
        assert np.allclose(np.abs(s[:, 2]), 1.0, atol=1e-4)  # |S3| = 1
        assert np.allclose(s[:, 0], 0.0, atol=1e-4)
        # lossless
        assert res.detector_power("out") == pytest.approx(1.0, abs=1e-5)

    def test_half_wave_defeats_crossed_analyzer(self):
        # P1 along x, analyzer along y: crossed -> 0. A half-wave plate at
        # 45 deg between them rotates the polarization by 90 -> full pass.
        crossed = [polarizer(0.5, (1, 0, 0)), polarizer(1.5, (0, 1, 0)),
                   detector()]
        res0 = run(crossed, beam())
        assert res0.detector_power("out") == pytest.approx(0.0, abs=1e-6)
        with_hwp = [polarizer(0.5, (1, 0, 0)),
                    waveplate(1.0, (1, 1, 0), np.pi),
                    polarizer(1.5, (0, 1, 0)), detector()]
        res1 = run(with_hwp, beam())
        assert res1.detector_power("out") == pytest.approx(0.5, abs=1e-5)
        assert res1.power_conservation_error() < 1e-5


class TestPlumbing:
    def test_axis_rotates_with_element(self):
        p = polarizer(0.0, (1, 0, 0)).rotate((0, 0, 1), np.pi / 2)
        np.testing.assert_allclose(p.axis, [0, 1, 0], atol=1e-12)

    def test_axis_required(self):
        with pytest.raises(ValueError, match="axis"):
            oe.rectangle(1.0, 1.0, material="polarizer")

    def test_engine_requires_polarization_mode(self):
        els = [polarizer(0.5, (1, 0, 0)), detector()]
        with pytest.raises(ValueError, match="polarization=True"):
            Tracer(TraceConfig()).trace(beam(), els, trace_iterations=2)

    def test_oracle_refuses_polarizer_scenes(self):
        from lightpycl_tpu.tracer.oracle import trace_oracle

        src = beam()
        o, d, p = src.sample()
        with pytest.raises(ValueError, match="unpolarized"):
            trace_oracle([polarizer(0.5, (1, 0, 0)), detector()], o, d, p)

    def test_string_aliases(self):
        assert Material.from_any("polarizer") == Material.POLARIZER
        assert Material.from_any("waveplate") == Material.WAVEPLATE
        assert Material.from_any("retarder") == Material.WAVEPLATE
