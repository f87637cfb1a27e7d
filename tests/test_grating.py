"""Reflection diffraction grating (extension): fixed-order tangential
wavevector shift, validated against the grating equation
sin(theta_out) = sin(theta_in) + m * lambda / period."""

import numpy as np
import pytest

import lightpycl_tpu as L
from lightpycl_tpu.materials import Material
from lightpycl_tpu.sources import CollimatedSource
from lightpycl_tpu.tracer.config import TraceConfig
from lightpycl_tpu.tracer.engine import Tracer
from lightpycl_tpu.tracer.oracle import trace_oracle
from lightpycl_tpu.tracer.rays import DetectorState, Ledger, RayBatch
from lightpycl_tpu.tracer.step import trace_step

oe = L.optical_elements(n_segments=16, n_radial=6)


def grating_el(period, order=1, reflectivity=1.0):
    """Plane grating in z=0 (normal +z), grooves along y (dispersion
    direction = +x)."""
    return oe.rectangle(4.0, 4.0, material="grating", axis=(1, 0, 0),
                        grating_period=period, grating_order=order,
                        reflectivity=reflectivity)


def one_step(els, d_in, wl, n=8, cfg=None, capacity=None):
    scene, _ = L.build_scene(els)
    cfg = cfg or TraceConfig(allow_splitting=False)
    rays = RayBatch.from_arrays(
        np.tile([0.0, 0.0, 2.0], (n, 1)), np.tile(d_in, (n, 1)),
        np.full(n, 1.0 / n), wavelengths=np.full(n, wl),
        capacity=capacity)
    det = DetectorState.zeros(4, 4, 1)
    led = Ledger.start(1.0)
    return trace_step(scene, rays, det, led, cfg)


class TestGratingEquation:
    def test_normal_incidence_first_order(self):
        wl, period = 0.5876, 1.0
        r, det, led, _ = one_step([grating_el(period)], [0, 0, -1.0], wl)
        alive = np.asarray(r.alive)
        d = np.asarray(r.d)[alive]
        s = wl / period
        np.testing.assert_allclose(d[:, 0], s, atol=1e-6)
        np.testing.assert_allclose(d[:, 2], np.sqrt(1 - s * s), atol=1e-6)
        np.testing.assert_allclose(np.asarray(r.power)[alive].sum(), 1.0,
                                   atol=1e-6)

    def test_oblique_incidence(self):
        wl, period = 0.5, 1.2
        th_in = np.radians(20.0)
        d_in = [np.sin(th_in), 0.0, -np.cos(th_in)]
        r, det, led, _ = one_step([grating_el(period)], d_in, wl)
        alive = np.asarray(r.alive)
        d = np.asarray(r.d)[alive]
        # t_in has +x component sin(th_in); shift adds m lambda / period
        s_out = np.sin(th_in) + wl / period
        np.testing.assert_allclose(d[:, 0], s_out, atol=1e-6)

    def test_order_zero_is_mirror(self):
        r, _, _, _ = one_step([grating_el(1.0, order=0)], [0, 0, -1.0], 0.55)
        alive = np.asarray(r.alive)
        d = np.asarray(r.d)[alive]
        np.testing.assert_allclose(d, np.tile([0.0, 0.0, 1.0], (len(d), 1)),
                                   atol=1e-6)

    def test_negative_order(self):
        wl, period = 0.5, 1.0
        r, _, _, _ = one_step([grating_el(period, order=-1)], [0, 0, -1.0], wl)
        alive = np.asarray(r.alive)
        np.testing.assert_allclose(np.asarray(r.d)[alive][:, 0],
                                   -wl / period, atol=1e-6)

    def test_evanescent_order_absorbed(self):
        # lambda > period: |sin| > 1, no propagating first order
        r, det, led, _ = one_step([grating_el(0.4)], [0, 0, -1.0], 0.6)
        assert not np.asarray(r.alive).any()
        assert float(led.absorbed) == pytest.approx(1.0, abs=1e-6)

    def test_efficiency_accounted(self):
        r, det, led, _ = one_step([grating_el(1.0, reflectivity=0.7)],
                                  [0, 0, -1.0], 0.5)
        alive = np.asarray(r.alive)
        assert np.asarray(r.power)[alive].sum() == pytest.approx(0.7, 1e-6)
        assert float(led.absorbed) == pytest.approx(0.3, abs=1e-6)


class TestSpectrometer:
    def test_two_lines_resolved_and_oracle_parity(self):
        """Two spectral lines diffract to distinct detector spots; engine
        matches the f64 oracle on measured power."""
        els = [grating_el(1.2),
               oe.sphere(radius=5.0, material="measure", name="dome")]
        n = 256
        rng = np.random.default_rng(3)
        o = np.tile([0.0, 0.0, 2.0], (n, 1))
        d = np.tile([0.0, 0.0, -1.0], (n, 1))
        p = np.full(n, 1.0 / n)
        wl = np.where(rng.uniform(size=n) < 0.5, 0.45, 0.65)
        res = Tracer(TraceConfig()).trace(
            None, els, trace_iterations=3,
            rays=RayBatch.from_arrays(o, d, p, wavelengths=wl))
        # measured positions: x/|r| = sin(theta) = lambda / period per line
        pos = res.measured_pos
        wls = res.measured_wavelength
        for line in (0.45, 0.65):
            sel = np.isclose(wls, line, atol=1e-3)
            assert sel.any()
            sin_th = pos[sel, 0] / np.linalg.norm(pos[sel], axis=1)
            np.testing.assert_allclose(sin_th, line / 1.2, atol=1e-4)
        ora = trace_oracle(els, o, d, p, trace_iterations=3, wavelengths=wl)
        assert res.ledger["measured"] == pytest.approx(ora["measured"],
                                                       rel=1e-5)
        assert res.power_conservation_error() < 1e-5


class TestDualOrder:
    """order0_fraction > 0: the specular (0th) leak is traced as a second
    child alongside order m — real gratings are never 100% efficient."""

    def test_power_split_between_orders(self):
        wl, period = 0.5, 1.0
        el = grating_el(period, reflectivity=0.8)
        el.order0_fraction = 0.3
        r, det, led, _ = one_step([el], [0, 0, -1.0], wl,
                                  cfg=TraceConfig(), capacity=32)
        alive = np.asarray(r.alive)
        d = np.asarray(r.d)[alive]
        p = np.asarray(r.power)[alive]
        s = wl / period
        m_order = np.isclose(d[:, 0], s, atol=1e-6)
        zeroth = np.isclose(d[:, 0], 0.0, atol=1e-6) & (d[:, 2] > 0.99)
        assert m_order.sum() and zeroth.sum()
        assert p[m_order].sum() == pytest.approx(0.8 * 0.7, abs=1e-6)
        assert p[zeroth].sum() == pytest.approx(0.8 * 0.3, abs=1e-6)
        assert float(led.absorbed) == pytest.approx(0.2, abs=1e-6)

    def test_g0_zero_is_single_order(self):
        wl, period = 0.5, 1.0
        r, _, led, _ = one_step([grating_el(period)], [0, 0, -1.0], wl,
                                cfg=TraceConfig())
        alive = np.asarray(r.alive)
        d = np.asarray(r.d)[alive]
        np.testing.assert_allclose(d[:, 0], wl / period, atol=1e-6)
        assert np.asarray(r.power)[alive].sum() == pytest.approx(1.0, 1e-6)

    def test_evanescent_order_keeps_zeroth(self):
        # lambda > period: order m evanescent (its share absorbed), the
        # specular leak still propagates
        el = grating_el(0.4)
        el.order0_fraction = 0.3
        r, _, led, _ = one_step([el], [0, 0, -1.0], 0.6, cfg=TraceConfig(),
                                capacity=32)
        alive = np.asarray(r.alive)
        d = np.asarray(r.d)[alive]
        p = np.asarray(r.power)[alive]
        assert np.all(d[:, 2] > 0.99)
        assert p.sum() == pytest.approx(0.3, abs=1e-6)
        assert float(led.absorbed) == pytest.approx(0.7, abs=1e-6)

    def test_no_split_mode_accounts_dropped_leak(self):
        el = grating_el(1.0)
        el.order0_fraction = 0.25
        r, _, led, _ = one_step([el], [0, 0, -1.0], 0.5,
                                cfg=TraceConfig(allow_splitting=False))
        alive = np.asarray(r.alive)
        assert np.asarray(r.power)[alive].sum() == pytest.approx(0.75, 1e-5)
        # the dropped 0th order lands in 'culled' so the ledger balances
        assert float(led.culled) == pytest.approx(0.25, abs=1e-6)

    def test_engine_trace_and_oracle_parity(self):
        el = grating_el(1.2, reflectivity=0.9)
        el.order0_fraction = 0.25
        els = [el, oe.sphere(radius=5.0, material="measure", name="dome")]
        n = 200
        o = np.tile([0.0, 0.0, 2.0], (n, 1))
        d = np.tile([0.0, 0.0, -1.0], (n, 1))
        p = np.full(n, 1.0 / n)
        wl = np.full(n, 0.6)
        res = Tracer(TraceConfig()).trace(
            None, els, trace_iterations=3,
            rays=RayBatch.from_arrays(o, d, p, wavelengths=wl,
                                      capacity=4 * n))
        # two spots: order 1 at sin = wl/period, 0th order straight back up
        pos = res.measured_pos
        sin_th = pos[:, 0] / np.linalg.norm(pos, axis=1)
        pw = res.measured_power
        first = np.isclose(sin_th, 0.6 / 1.2, atol=1e-3)
        zeroth = np.abs(sin_th) < 1e-3
        assert pw[first].sum() == pytest.approx(0.9 * 0.75, abs=1e-4)
        assert pw[zeroth].sum() == pytest.approx(0.9 * 0.25, abs=1e-4)
        ora = trace_oracle(els, o, d, p, trace_iterations=3, wavelengths=wl)
        assert res.ledger["measured"] == pytest.approx(ora["measured"],
                                                       rel=1e-5)
        assert res.power_conservation_error() < 1e-5


class TestPlumbing:
    def test_requires_axis_and_period(self):
        with pytest.raises(ValueError, match="axis"):
            oe.rectangle(1.0, 1.0, material="grating", grating_period=1.0)
        with pytest.raises(ValueError, match="grating_period"):
            oe.rectangle(1.0, 1.0, material="grating", axis=(1, 0, 0))

    def test_string_alias(self):
        assert Material.from_any("grating") == Material.GRATING


class TestImmersedGrating:
    def test_medium_index_scales_the_shift(self):
        """An immersed grating sees the medium wavelength lambda0/n:
        sin(theta_out) = m lambda0 / (n period) at normal incidence."""
        wl, period, n_med = 0.6, 1.0, 1.33
        cfg = TraceConfig(allow_splitting=False, ior_env=n_med)
        scene, _ = L.build_scene([grating_el(period)])
        m = 8
        rays = RayBatch.from_arrays(
            np.tile([0.0, 0.0, 2.0], (m, 1)), np.tile([0, 0, -1.0], (m, 1)),
            np.full(m, 1.0 / m), ior_env=n_med,
            wavelengths=np.full(m, wl))
        det = DetectorState.zeros(4, 4, 1)
        led = Ledger.start(1.0)
        r, det, led, _ = trace_step(scene, rays, det, led, cfg)
        alive = np.asarray(r.alive)
        np.testing.assert_allclose(np.asarray(r.d)[alive][:, 0],
                                   wl / (n_med * period), atol=1e-6)

    def test_axis_parallel_to_normal_rejected(self):
        with pytest.raises(ValueError, match="tangential"):
            oe.rectangle(1.0, 1.0, material="grating", axis=(0, 0, 1),
                         grating_period=1.0)
