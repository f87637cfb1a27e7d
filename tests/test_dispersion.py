"""Chromatic dispersion tests (extension over the reference; default-off:
dispersion_b = 0 reproduces the reference's constant-IOR physics exactly).
"""

import numpy as np
import pytest

import lightpycl_tpu as L
from lightpycl_tpu.materials import C_LINE, D_LINE, F_LINE, glass
from lightpycl_tpu.sources import CollimatedSource
from lightpycl_tpu.tracer.engine import Tracer
from lightpycl_tpu.tracer.oracle import trace_oracle
from lightpycl_tpu.tracer.rays import RayBatch

oe = L.optical_elements(n_segments=32, n_radial=12)


class TestGlassModel:
    def test_abbe_identity(self):
        n_d, V = 1.5168, 64.17
        a, b = glass(n_d, V)
        n = lambda wl: a + b / wl**2
        assert n(D_LINE) == pytest.approx(n_d, abs=1e-12)
        assert (n_d - 1) / (n(F_LINE) - n(C_LINE)) == pytest.approx(V, rel=1e-9)
        assert n(0.45) > n(0.65)  # normal dispersion: blue slower


class TestSellmeierCatalog:
    """Real catalog glasses: exact Sellmeier curves, published d-line
    index / Abbe anchors, and the extended-Cauchy (lambda^-4) fit the
    tracer consumes (GeoObject.dispersion_c)."""

    def test_catalog_dline_and_abbe_anchors(self):
        # every catalog glass must carry a published (n_d, V_d) anchor
        # (materials.PUBLISHED_ND_VD) and reproduce it from its Sellmeier
        # coefficients — a transcription typo in either table fails here
        from lightpycl_tpu.materials import (PUBLISHED_ND_VD, SELLMEIER,
                                             sellmeier_index)

        assert set(PUBLISHED_ND_VD) == set(SELLMEIER)
        for g in SELLMEIER:
            n_d = sellmeier_index(D_LINE, g)
            v_d = (n_d - 1.0) / (sellmeier_index(F_LINE, g)
                                 - sellmeier_index(C_LINE, g))
            nd_pub, vd_pub = PUBLISHED_ND_VD[g]
            assert n_d == pytest.approx(nd_pub, abs=2e-4), g
            assert v_d == pytest.approx(vd_pub, rel=5e-3), g

    def test_extended_cauchy_fit_quality(self):
        from lightpycl_tpu.materials import (SELLMEIER, glass_from_sellmeier,
                                             sellmeier_index)

        wl = np.linspace(0.4, 0.7, 301)
        wlc = np.linspace(0.48, 0.66, 181)
        for g in SELLMEIER:
            fit = glass_from_sellmeier(g)
            n = (fit["ior"] + fit["dispersion_b"] / wl**2
                 + fit["dispersion_c"] / wl**4)
            assert np.abs(n - sellmeier_index(wl, g)).max() < 4.5e-4, g
            fitc = glass_from_sellmeier(g, band=(0.48, 0.66))
            nc = (fitc["ior"] + fitc["dispersion_b"] / wlc**2
                  + fitc["dispersion_c"] / wlc**4)
            assert np.abs(nc - sellmeier_index(wlc, g)).max() < 5e-5, g

    def test_lambda4_term_beats_two_term_fit(self):
        """The dispersion_c column must earn its keep: for a dense flint
        the three-term fit is several times closer than the best
        two-term (A, B) fit over the same band."""
        from lightpycl_tpu.materials import glass_from_sellmeier, sellmeier_index

        wl = np.linspace(0.4, 0.7, 301)
        n_true = sellmeier_index(wl, "N-SF11")
        fit3 = glass_from_sellmeier("N-SF11")
        err3 = np.abs(fit3["ior"] + fit3["dispersion_b"] / wl**2
                      + fit3["dispersion_c"] / wl**4 - n_true).max()
        X2 = np.stack([np.ones_like(wl), wl**-2.0], axis=1)
        coef2, *_ = np.linalg.lstsq(X2, n_true, rcond=None)
        err2 = np.abs(X2 @ coef2 - n_true).max()
        assert err3 < err2 / 4.0, (err3, err2)

    def test_band_guard_raises(self):
        from lightpycl_tpu.materials import glass_from_sellmeier

        with pytest.raises(ValueError, match="residual"):
            glass_from_sellmeier("N-SF11", band=(0.37, 1.6))

    def test_device_oracle_parity_with_dispersion_c(self):
        """dispersion_c threads through the device gather AND the f64
        oracle identically (prism, tri-wavelength source)."""
        from lightpycl_tpu.materials import glass_from_sellmeier

        fit = glass_from_sellmeier("N-SF11")
        prism = oe.prism(width=1.04, height=0.3, length=1.0, **fit)
        assert prism.dispersion_c != 0.0
        dome = L.optical_elements(24, 8).sphere(8.0, material="measure")
        src = CollimatedSource(center=(0.3, -0.5, 0), direction=(0, 1, 0),
                               diameter=0.05, ray_count=256, power=1.0,
                               seed=8, wavelength=([0.43, 0.55, 0.68],
                                                   [1, 2, 1]))
        o, d, p = src.sample()
        wl = src.sample_wavelengths()
        res = Tracer().trace(src, [prism, dome], trace_iterations=6,
                             rays=RayBatch.from_arrays(
                                 o, d, p, wavelengths=wl, capacity=4096))
        ora = trace_oracle([prism, dome], o, d, p, trace_iterations=6,
                           wavelengths=wl)
        assert res.ledger["measured"] == pytest.approx(ora["measured"],
                                                       rel=1e-3)
        assert res.power_conservation_error() < 1e-4

    def test_lambda4_term_steers_the_trace(self):
        """Teeth: zeroing dispersion_c on the same (A, B) visibly moves
        the blue prism deviation — the term reaches the actual Snell
        computation, not just the catalog math."""
        from lightpycl_tpu.materials import glass_from_sellmeier

        fit = glass_from_sellmeier("N-SF11")
        dn = fit["dispersion_c"] / 0.43**4   # index shift at 0.43 um
        assert abs(dn) > 5e-3

        def top_dir(with_c):
            f = dict(fit) if with_c else dict(fit, dispersion_c=0.0)
            prism = oe.prism(width=1.04, height=0.3, length=1.0, **f)
            dome = L.optical_elements(24, 8).sphere(8.0, material="measure")
            src = CollimatedSource(center=(0.3, -0.5, 0),
                                   direction=(0, 1, 0), diameter=0.05,
                                   ray_count=64, power=1.0, seed=9,
                                   wavelength=0.43)
            res = Tracer().trace(src, [prism, dome], trace_iterations=6,
                                 capacity=1024)
            return res.measured_dir[res.measured_power.argmax()]

        ang = np.arccos(np.clip(top_dir(True) @ top_dir(False), -1, 1))
        assert ang > 2e-3  # milliradians-scale steering, well resolved


def _trace_prism(wavelength, backend="jnp"):
    """Narrow beam entering the prism base at normal incidence, exiting
    through the inclined face; returns the power-weighted mean direction of
    rays reaching the enclosure."""
    a, b = glass(1.52, 45.0)
    prism = oe.prism(width=1.04, height=0.3, length=1.0, ior=a)
    prism.dispersion_b = b
    dome = L.optical_elements(24, 8).sphere(10.0, material="measure")
    src = CollimatedSource(center=(0.3, -0.5, 0), direction=(0, 1, 0),
                           diameter=0.05, ray_count=128, power=1.0, seed=7,
                           wavelength=wavelength)
    tr = Tracer()
    res = tr.trace(src, [prism, dome], trace_iterations=6, capacity=2048)
    from lightpycl_tpu import analysis

    # only the straight-through (refracted-refracted) bundle: dominant power
    stats = analysis.beam_statistics(res.measured_dir, res.measured_power)
    return res, stats["mean_direction"]


class TestPrismDispersion:
    def test_blue_deviates_more_than_red(self):
        _, d_blue = _trace_prism(0.45)
        _, d_red = _trace_prism(0.65)
        # deviation from the original +y direction
        dev_blue = np.arccos(np.clip(d_blue[1], -1, 1))
        dev_red = np.arccos(np.clip(d_red[1], -1, 1))
        assert dev_blue > dev_red + 0.005  # clearly separated

    def test_matches_snell_prediction(self):
        a, b = glass(1.52, 45.0)
        for wl in (0.45, 0.5876, 0.65):
            res, d_mean = _trace_prism(wl)
            n = a + b / wl**2
            # geometry: inclined face from (w/2,0) to (0,h); incidence angle
            # of the +y internal ray on that face:
            w_, h_ = 1.04, 0.3
            nf = np.array([h_, w_ / 2.0, 0.0])
            nf /= np.linalg.norm(nf)
            cos_i = nf @ [0, 1, 0]
            th_i = np.arccos(cos_i)
            th_t = np.arcsin(np.clip(n * np.sin(th_i), -1, 1))
            # exit direction: rotate the outward face normal by th_t in the
            # plane spanned by (normal, internal direction)
            tang = np.array([0, 1, 0]) - cos_i * nf
            tang /= np.linalg.norm(tang)
            d_pred = np.cos(th_t) * nf + np.sin(th_t) * tang
            # the highest-power measured ray is from the transmitted bundle
            # (Fresnel ghosts carry ~25x less power)
            top = res.measured_dir[res.measured_power.argmax()]
            assert top @ d_pred > 0.9999

    def test_parity_with_oracle_under_dispersion(self):
        a, b = glass(1.6, 30.0)
        prism = oe.prism(width=1.04, height=0.3, length=1.0, ior=a)
        prism.dispersion_b = b
        dome = L.optical_elements(24, 8).sphere(8.0, material="measure")
        src = CollimatedSource(center=(0.3, -0.5, 0), direction=(0, 1, 0),
                               diameter=0.05, ray_count=256, power=1.0, seed=8,
                               wavelength=([0.45, 0.55, 0.65], [1, 2, 1]))
        o, d, p = src.sample()
        wl = src.sample_wavelengths()
        res = Tracer().trace(src, [prism, dome], trace_iterations=6,
                             rays=RayBatch.from_arrays(o, d, p, wavelengths=wl,
                                                       capacity=4096))
        ora = trace_oracle([prism, dome], o, d, p, trace_iterations=6,
                           wavelengths=wl)
        assert res.ledger["measured"] == pytest.approx(ora["measured"], rel=1e-3)

    def test_measured_wavelengths_harvested(self):
        res, _ = _trace_prism(([0.45, 0.65], [1, 1]))
        wls = np.unique(np.round(res.measured_wavelength.astype(np.float64), 4))
        assert set(wls.tolist()) == {0.45, 0.65}


class TestChromaticAberration:
    def test_blue_focuses_shorter(self):
        a, b = glass(1.5168, 64.17)  # BK7
        lens = oe.plano_convex_lens(r=0.5, aperture=0.6, thickness=0.1, ior=a)
        lens.dispersion_b = b

        def waist_z(wl):
            src = CollimatedSource(center=(0, 0, -0.5), direction=(0, 0, 1),
                                   diameter=0.2, ray_count=400, seed=3,
                                   wavelength=wl)
            best = None
            for z in np.linspace(0.8, 1.2, 9):
                det = oe.disc(radius=0.5, center=(0, 0, 0.1 + z), material="measure")
                res = Tracer().trace(src, [lens, det], trace_iterations=4)
                rr = np.linalg.norm(res.measured_pos[:, :2], axis=1)
                rms = np.sqrt((res.measured_power * rr**2).sum()
                              / res.measured_power.sum())
                if best is None or rms < best[1]:
                    best = (z, rms)
            return best[0]

        assert waist_z(0.45) < waist_z(0.65)


class TestAchromaticDoublet:
    def test_doublet_cancels_chromatic_shift(self):
        """Classic crown+flint achromat: powers chosen so
        phi1/V1 + phi2/V2 = 0 brings the F- and C-line foci together;
        the equivalent singlet's foci are ~f/V apart. Uses best_focus on
        the exit bundle (analysis.py), so no detector scanning."""
        from lightpycl_tpu.analysis import best_focus
        from lightpycl_tpu.materials import BK7, F2

        (nA, bA), (nB, bB) = BK7, F2
        # d-line indices and Abbe numbers recovered from the Cauchy fits
        def nd(a, b):
            return a + b / D_LINE**2

        def abbe(a, b):
            return (nd(a, b) - 1) / ((a + b / F_LINE**2) - (a + b / C_LINE**2))

        V1, V2 = abbe(nA, bA), abbe(nB, bB)
        f = 1.0
        f1 = f * (V1 - V2) / V1
        f2 = -f * (V1 - V2) / V2
        R1 = 2.0 * (nd(nA, bA) - 1.0) * f1       # equiconvex crown
        R2 = 2.0 * (nd(nB, bB) - 1.0) * f2       # equiconcave flint (<0)
        crown = oe.biconvex_lens(R1, 0.3, 0.06, ior=nA)
        crown.dispersion_b = bA
        flint = oe.spherical_lens(R2, -R2, 0.3, 0.02, ior=nB,
                                  center=(0, 0, 0.08))
        flint.dispersion_b = bB
        singlet = oe.biconvex_lens(2.0 * (nd(nA, bA) - 1.0) * f, 0.3, 0.06,
                                   ior=nA)
        singlet.dispersion_b = bA
        wall = oe.sphere(radius=8.0, material="measure", name="wall")

        def focus_z(els, wl):
            src = CollimatedSource(center=(0, 0, -0.5), direction=(0, 0, 1),
                                   diameter=0.15, ray_count=512, seed=2,
                                   wavelength=wl)
            res = Tracer().trace(src, els + [wall], trace_iterations=5,
                                 capacity=8192)
            fwd = res.measured_dir[:, 2] > 0.5
            z, _ = best_focus(res.measured_pos[fwd], res.measured_dir[fwd],
                              res.measured_power[fwd], z_range=(0.2, 2.5))
            return z

        shift_singlet = abs(focus_z([singlet], F_LINE)
                            - focus_z([singlet], C_LINE))
        shift_doublet = abs(focus_z([crown, flint], F_LINE)
                            - focus_z([crown, flint], C_LINE))
        # singlet: ~f/V ~ 0.016 (measured 0.0164); the thin-lens achromat
        # with real thickness + a small air gap cuts it ~3.3x (measured
        # 0.0050) — the residual is the thick-lens/separation term, not
        # secondary spectrum
        assert shift_singlet > 0.008
        assert shift_doublet < shift_singlet / 2.5, (shift_doublet,
                                                     shift_singlet)
        assert shift_doublet < 0.007
