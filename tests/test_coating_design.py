"""Differentiable thin-film coating DESIGN tests (diff.band_reflectance /
diff.design_coating — extension over the reference, which has no film
model at all; SURVEY.md §8.5).

Anchors are analytic: the free-(n, h) single-layer AR optimum on a bare
substrate is n* = sqrt(n_inc n_sub), h* = lambda / (4 n*) with R = 0
exactly; a two-layer V-coat with catalog indices also admits an exact
null; and the band objective at h = 0 collapses to the bare Fresnel
reflectance. The designed stack is then handed to GeoObject(coating=...)
and traced end-to-end — design and simulation share the same Airy film
math on device, so a designed null must survive the tracer bit-for-bit
within f32.
"""

import numpy as np
import pytest

import lightpycl_tpu as L
from lightpycl_tpu.diff import band_reflectance, design_coating
from lightpycl_tpu.sources import CollimatedSource
from lightpycl_tpu.tracer.engine import Tracer

N_SUB = 1.52
WL = 0.55
R_BARE = ((1.0 - N_SUB) / (1.0 + N_SUB)) ** 2


class TestBandReflectance:
    def test_zero_thickness_reduces_to_bare_fresnel(self):
        r = float(band_reflectance([1.38], [0.0], n_sub=N_SUB,
                                   wavelengths=[WL]))
        assert r == pytest.approx(R_BARE, abs=1e-6)

    def test_quarter_wave_analytic(self):
        nf = 1.38
        r = float(band_reflectance([nf], [WL / (4 * nf)], n_sub=N_SUB,
                                   wavelengths=[WL]))
        r_qw = ((N_SUB - nf * nf) / (N_SUB + nf * nf)) ** 2
        assert r == pytest.approx(r_qw, abs=1e-6)

    def test_band_average_is_mean_over_grid(self):
        wls = np.linspace(0.45, 0.65, 5)
        cosines = np.cos(np.radians([0.0, 20.0, 40.0]))
        r_grid = float(band_reflectance([1.38, 2.1], [0.1, 0.06],
                                        n_sub=N_SUB, wavelengths=wls,
                                        cos_i=cosines))
        singles = [
            float(band_reflectance([1.38, 2.1], [0.1, 0.06], n_sub=N_SUB,
                                   wavelengths=[w], cos_i=float(c)))
            for c in cosines for w in wls
        ]
        assert r_grid == pytest.approx(np.mean(singles), abs=1e-6)

    def test_delta_weights_select_one_wavelength(self):
        wls = np.array([0.45, 0.55, 0.65])
        w = np.array([0.0, 1.0, 0.0])
        r = float(band_reflectance([1.38], [0.1], n_sub=N_SUB,
                                   wavelengths=wls, weights=w))
        r_mid = float(band_reflectance([1.38], [0.1], n_sub=N_SUB,
                                       wavelengths=[0.55]))
        assert r == pytest.approx(r_mid, abs=1e-6)

    def test_gradient_matches_finite_difference(self):
        import jax

        wls = np.linspace(0.45, 0.65, 7)

        def f(h):
            return band_reflectance([1.38, 2.1], [h[0], h[1]],
                                    n_sub=N_SUB, wavelengths=wls)

        h0 = np.array([0.09, 0.055], np.float64)
        g = np.asarray(jax.grad(lambda h: f(h))(h0.astype(np.float32)))
        eps = 1e-3
        for k in range(2):
            hp, hm = h0.copy(), h0.copy()
            hp[k] += eps
            hm[k] -= eps
            fd = (float(f(hp.astype(np.float32)))
                  - float(f(hm.astype(np.float32)))) / (2 * eps)
            assert g[k] == pytest.approx(fd, rel=2e-2, abs=1e-4)


class TestDesign:
    def test_single_layer_recovers_analytic_ar(self):
        """Free (n, h) single layer at one wavelength: the descent must
        find n* = sqrt(n_sub), h* = lambda/(4 n*) with an exact null."""
        n, h, r = design_coating(1, n_sub=N_SUB, wavelengths=[WL],
                                 steps=1200, lr=0.02)
        n_star = np.sqrt(N_SUB)
        assert n[0] == pytest.approx(n_star, abs=2e-3)
        assert h[0] == pytest.approx(WL / (4 * n_star), abs=2e-3)
        assert r < 1e-8

    def test_vcoat_fixed_catalog_indices_nulls(self):
        """MgF2/ZrO2 thickness-only V-coat on BK7: an exact null exists
        and the descent must find it."""
        n, h, r = design_coating(2, n_sub=N_SUB, wavelengths=[WL],
                                 fixed_n=[1.38, 2.10], steps=1500, lr=0.02)
        assert np.allclose(n, [1.38, 2.10])
        assert (h > 0).all()
        assert r < 1e-8

    def test_broadband_beats_single_layer_quarter_wave(self):
        wls = np.linspace(0.42, 0.68, 14)
        r_single = float(band_reflectance([1.38], [WL / (4 * 1.38)],
                                          n_sub=N_SUB, wavelengths=wls))
        _, h, r4 = design_coating(4, n_sub=N_SUB, wavelengths=wls,
                                  fixed_n=[1.38, 2.10, 1.38, 2.10],
                                  steps=1200, lr=0.02)
        assert r4 < 0.6 * r_single
        assert (h > 0).all()

    def test_designed_vcoat_survives_the_tracer(self):
        """End-to-end: hand the designed stack to GeoObject(coating=...)
        and trace a coated window — the transmitted power must match the
        two-surface multi-bounce series of the designed R and beat the
        bare window."""
        _, h, r = design_coating(2, n_sub=N_SUB, wavelengths=[WL],
                                 fixed_n=[1.38, 2.10], steps=1500, lr=0.02)
        stack = [(1.38, float(h[0])), (2.10, float(h[1]))]

        oe = L.optical_elements(n_segments=24, n_radial=8)

        def scene(coating):
            kw = dict(coating=coating) if coating else {}
            win = oe.cube(size=(0.8, 0.8, 0.2), material="refractive",
                          ior=N_SUB, name="window", **kw)
            fwd = oe.disc(radius=1.2, center=(0, 0, 2.0),
                          material="measure", name="fwd")
            shell = oe.sphere(radius=6.0, material="terminator")
            return [win, fwd, shell]

        src = CollimatedSource(center=(0, 0, -1.0), direction=(0, 0, 1),
                               diameter=0.3, ray_count=256, power=1.0,
                               seed=3, wavelength=WL)
        t_coat = Tracer().trace(src, scene(stack), trace_iterations=10,
                                capacity=1024).detector_power("fwd")
        t_bare = Tracer().trace(src, scene(None), trace_iterations=10,
                                capacity=1024).detector_power("fwd")
        # designed R ~ 0: the full multi-bounce series T^2/(1-R^2) -> 1
        assert t_coat > 0.999
        t_pred_bare = (1 - R_BARE) ** 2 / (1 - R_BARE ** 2)
        assert t_bare == pytest.approx(t_pred_bare, abs=2e-4)
        assert t_coat > t_bare + 0.07
