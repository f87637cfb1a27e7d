"""Fluorescence / phosphor wavelength conversion (extension over the
reference, which has no spectral physics at all — SURVEY.md §1).

Volume conversion events: free paths ~ Exp(mu_f) below the band edge,
isotropic re-emission at an inverse-CDF-sampled wavelength, power factor
QY x (lambda_abs / lambda_em), remainder absorbed. Anchors are exact
photon-bookkeeping identities, not a numeric oracle (the process is
stochastic, like volume scattering):

  * ballistic pump extinction e^{-mu_f L} (conversion extinguishes the
    coherent beam exactly like scattering);
  * per-realization energy identity: with delta emission and no
    re-absorption, converted measured power == (emitted - surviving pump)
    x QY x (lambda_abs / lambda_em) EXACTLY;
  * band edge: pumps above fluor_edge do not convert at all;
  * emission spectrum: photon-weighted moments match the Gaussian band;
  * exact conservation ledger through conversion chains, glass Fresnel,
    elastic scattering, and re-absorption;
  * determinism per seed; engine refusals for the undefined combinations.
"""

import jax
import numpy as np
import pytest

import lightpycl_tpu as L
from lightpycl_tpu.sources import CollimatedSource
from lightpycl_tpu.tracer.config import TraceConfig
from lightpycl_tpu.tracer.engine import Tracer
from lightpycl_tpu.tracer.oracle import trace_oracle

PUMP = 0.45          # pump wavelength [um]
EDGE = 0.50          # absorption band edge


def _phosphor_scene(mu_f, qy=1.0, emission=0.60, mu_s=0.0, mu_a=0.0,
                    ior=1.0, thickness=1.0, edge=EDGE):
    oe = L.optical_elements()
    slab = oe.cube((6.0, 6.0, thickness),
                   center=(0, 0, 1.0 + thickness / 2.0),
                   material="refractive", ior=ior,
                   fluorescence=mu_f, fluor_yield=qy,
                   fluor_emission=emission, fluor_edge=edge,
                   scattering=mu_s, absorption=mu_a)
    world = oe.sphere(radius=30.0, material="measure", name="world")
    return [slab, world]


def _pump_source(n=8000, power=1.0):
    return CollimatedSource(center=(0, 0, 0), direction=(0, 0, 1),
                            diameter=0.4, power=power, ray_count=n,
                            wavelength=PUMP)


def _split_bands(res, cut=0.50):
    wl = res.measured_wavelength
    pw = res.measured_power
    return pw[wl < cut].sum(), pw[wl >= cut].sum()


class TestConversionPhysics:
    def test_pump_extinction_beer_lambert(self):
        """The surviving (unconverted) pump through thickness L is
        e^{-mu_f L}: conversion extinguishes the ballistic beam exactly
        like scattering would."""
        mu_f, L_th = 1.5, 1.0
        res = Tracer().trace(_pump_source(40_000),
                             _phosphor_scene(mu_f, emission=0.60),
                             trace_iterations=12, capacity=160_000)
        assert res.power_conservation_error() < 1e-4
        blue, _ = _split_bands(res)
        want = np.exp(-mu_f * L_th)
        assert blue == pytest.approx(want, rel=0.05)

    @pytest.mark.parametrize("qy", [1.0, 0.7])
    def test_energy_identity_exact_per_realization(self, qy):
        """Delta emission at 0.60 um (> edge, so exactly one conversion
        per converted photon): converted measured power must equal
        (emitted - surviving pump) x QY x (PUMP / 0.60) exactly —
        a per-realization identity, independent of the MC split."""
        res = Tracer().trace(_pump_source(8000),
                             _phosphor_scene(2.0, qy=qy, emission=0.60),
                             trace_iterations=16, capacity=32_000)
        assert res.power_conservation_error() < 1e-4
        blue, conv = _split_bands(res)
        want = (1.0 - blue) * qy * (PUMP / 0.60)
        assert conv == pytest.approx(want, abs=2e-4)
        # ... and the Stokes + yield deficit is what's absorbed
        assert res.ledger["absorbed"] == pytest.approx(
            (1.0 - blue) * (1.0 - qy * PUMP / 0.60), abs=2e-4)

    def test_band_edge_blocks_conversion(self):
        """A pump ABOVE the band edge must sail through unconverted."""
        oe = L.optical_elements()
        els = _phosphor_scene(5.0, emission=0.70, edge=0.50)
        src = CollimatedSource(center=(0, 0, 0), direction=(0, 0, 1),
                               diameter=0.4, power=1.0, ray_count=2000,
                               wavelength=0.55)  # above the 0.50 edge
        res = Tracer().trace(src, els, trace_iterations=8, capacity=8000)
        assert res.power_conservation_error() < 1e-4
        wl = res.measured_wavelength
        np.testing.assert_allclose(wl, 0.55, atol=1e-6)

    def test_emission_spectrum_moments(self):
        """Gaussian emission band (mean 0.58, fwhm 0.08): the
        photon-count-weighted wavelength distribution of converted light
        must reproduce the band's mean and width (photon count ~ P x
        lambda, undoing the Stokes power factor)."""
        res = Tracer().trace(
            _pump_source(30_000),
            _phosphor_scene(3.0, emission=(0.58, 0.08), edge=0.50),
            trace_iterations=12, capacity=120_000)
        assert res.power_conservation_error() < 1e-4
        wl = res.measured_wavelength
        pw = res.measured_power
        conv = wl >= 0.50
        photons = pw[conv] * wl[conv]
        mean = (wl[conv] * photons).sum() / photons.sum()
        var = ((wl[conv] - mean) ** 2 * photons).sum() / photons.sum()
        sigma = 0.08 / 2.35482
        assert mean == pytest.approx(0.58, abs=0.002)
        # icdf tail truncation at 0.5%/99.5% narrows sigma slightly
        assert np.sqrt(var) == pytest.approx(sigma, rel=0.12)

    def test_composes_with_scattering_and_absorption(self):
        """Full extinction stack (mu_s + mu_f + mu_a) in real glass:
        Fresnel splits, elastic HG redraws, conversions, Beer-Lambert —
        the ledger must still close exactly."""
        res = Tracer().trace(
            _pump_source(6000),
            _phosphor_scene(1.0, qy=0.8, emission=(0.58, 0.06),
                            mu_s=1.0, mu_a=0.2, ior=1.5),
            trace_iterations=24, capacity=48_000)
        assert res.power_conservation_error() < 1e-4
        assert res.ledger["absorbed"] > 0.1
        assert res.hist.sum() == pytest.approx(res.ledger["measured"],
                                               abs=1e-4)

    def test_reabsorption_books_stay_closed(self):
        """Band edge ABOVE the emission minimum: some emitted light is
        re-absorbed and re-emitted (multiple conversions). Power books
        must stay closed (the factor is capped at 1, so anti-Stokes draws
        cannot create energy)."""
        res = Tracer().trace(
            _pump_source(4000),
            _phosphor_scene(3.0, emission=(0.55, 0.12), edge=0.60),
            trace_iterations=30, capacity=16_000)
        assert res.power_conservation_error() < 1e-4


class TestPlumbing:
    def test_deterministic_per_seed(self):
        els = _phosphor_scene(2.0, emission=(0.58, 0.06))
        src = _pump_source(2048)
        r1 = Tracer(TraceConfig(seed=5)).trace(src, els,
                                               trace_iterations=10,
                                               capacity=8192)
        r2 = Tracer(TraceConfig(seed=5)).trace(src, els,
                                               trace_iterations=10,
                                               capacity=8192)
        r3 = Tracer(TraceConfig(seed=9)).trace(src, els,
                                               trace_iterations=10,
                                               capacity=8192)
        assert r1.ledger == r2.ledger
        assert r1.ledger["measured"] != r3.ledger["measured"]

    def test_multichip_ledger_closes(self):
        res = Tracer().trace(_pump_source(2048),
                             _phosphor_scene(2.0, emission=0.6),
                             trace_iterations=10, capacity=8192,
                             mode="multichip")
        assert res.power_conservation_error() < 1e-4

    def test_mesh_validation(self):
        oe = L.optical_elements()
        with pytest.raises(ValueError, match="REFRACTIVE"):
            oe.cube(1.0, material="mirror", fluorescence=1.0,
                    fluor_emission=0.6)
        with pytest.raises(ValueError, match="fluor_emission"):
            oe.cube(1.0, material="refractive", fluorescence=1.0)
        with pytest.raises(ValueError, match="quantum yield"):
            oe.cube(1.0, material="refractive", fluorescence=1.0,
                    fluor_emission=0.6, fluor_yield=-0.1)
        with pytest.raises(ValueError, match="ascending"):
            oe.cube(1.0, material="refractive", fluorescence=1.0,
                    fluor_emission=[0.7, 0.6, 0.5])

    def test_engine_refuses_mesh2d(self):
        from lightpycl_tpu.parallel.mesh2d import make_mesh2d

        els = _phosphor_scene(1.0)
        with pytest.raises(ValueError, match="replicated"):
            Tracer().trace(_pump_source(512), els, trace_iterations=4,
                           capacity=2048, mode="mesh2d",
                           mesh=make_mesh2d(2, 4))

    def test_engine_refuses_coherent(self):
        els = _phosphor_scene(1.0)
        with pytest.raises(ValueError, match="incoherent"):
            Tracer(TraceConfig(coherent=True, image_bins=32)).trace(
                _pump_source(512), els, trace_iterations=4, capacity=2048)

    def test_spectral_refuses_fluorescence(self):
        els = _phosphor_scene(1.0)
        with pytest.raises(ValueError, match="conserved"):
            Tracer().trace_spectral(_pump_source(512), [0.45, 0.55],
                                    elements=els, trace_iterations=4,
                                    capacity=2048)

    def test_oracle_refuses_fluorescence(self):
        with pytest.raises(ValueError, match="deterministic"):
            trace_oracle(_phosphor_scene(1.0), np.zeros((4, 3)),
                         np.tile([0.0, 0.0, 1.0], (4, 1)),
                         np.full(4, 0.25))

    def test_clear_scene_unaffected(self):
        """A non-fluorescent scene traces bit-identically whether or not
        the fluorescence machinery exists (engine gates it off)."""
        oe = L.optical_elements()
        els = [oe.cube((4, 4, 1), center=(0, 0, 1.5),
                       material="refractive", ior=1.5),
               oe.sphere(radius=20.0, material="measure", name="world")]
        src = _pump_source(1024)
        r_off = Tracer().trace(src, els, trace_iterations=8, capacity=4096)
        r_on = Tracer(TraceConfig(has_fluorescence=True)).trace(
            src, els, trace_iterations=8, capacity=4096)
        assert r_off.ledger == r_on.ledger


class TestWhiteLED:
    def test_blue_plus_yellow_is_white(self):
        """The classic phosphor-converted white LED: a blue pump partially
        converted by a YAG-like yellow band lands in the white region of
        the chromaticity diagram — and a thicker phosphor shifts the
        chromaticity toward yellow (warmer)."""
        from lightpycl_tpu import analysis as A

        def chroma(mu_f):
            res = Tracer().trace(
                _pump_source(12_000),
                _phosphor_scene(mu_f, emission=(0.57, 0.10), edge=0.50),
                trace_iterations=14, capacity=48_000)
            assert res.power_conservation_error() < 1e-4
            return A.chromaticity(res.measured_wavelength,
                                  res.measured_power)
        x_thin, y_thin = chroma(0.8)
        x_thick, y_thick = chroma(2.5)
        # both land in the broadly-white region between the blue locus
        # (0.15, 0.03) and the yellow band locus (~0.48, 0.5)
        assert 0.15 < x_thin < 0.45 and 0.05 < y_thin < 0.5
        # thicker phosphor converts more pump -> moves toward yellow
        assert x_thick > x_thin + 0.03
        assert y_thick > y_thin + 0.03
