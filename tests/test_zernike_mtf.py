"""Zernike wavefront decomposition + geometric MTF tests (extensions over
the reference, which has no wavefront analysis — SURVEY.md §3 lists only
directivity binning/plots).

Synthetic anchors are exact (least squares on noiseless data); the
end-to-end anchor is the known aberration structure of a plano-convex
singlet: flat-side-toward-collimated-beam orientation has several times the
primary spherical aberration (Noll Z11) of the curved-side orientation.
"""

import numpy as np
import pytest

import lightpycl_tpu as L
from lightpycl_tpu import analysis
from lightpycl_tpu.analysis import (geometric_mtf, noll_to_nm,
                                    opd_on_reference_sphere, zernike_fit,
                                    zernike_value)
from lightpycl_tpu.sources import CollimatedSource
from lightpycl_tpu.tracer.engine import Tracer


class TestNollIndexing:
    def test_table(self):
        expected = {1: (0, 0), 2: (1, 1), 3: (1, -1), 4: (2, 0),
                    5: (2, -2), 6: (2, 2), 7: (3, -1), 8: (3, 1),
                    9: (3, -3), 10: (3, 3), 11: (4, 0), 12: (4, 2),
                    13: (4, -2), 14: (4, 4), 15: (4, -4), 16: (5, 1),
                    22: (6, 0), 37: (8, 0)}
        for j, nm in expected.items():
            assert noll_to_nm(j) == nm, j

    def test_orthonormality_on_disc(self):
        # Noll normalization: <Z_i Z_j> over the unit disc = delta_ij.
        # Monte-Carlo integral with uniform disc sampling.
        rng = np.random.default_rng(0)
        N = 200_000
        rho = np.sqrt(rng.uniform(0, 1, N))
        th = rng.uniform(0, 2 * np.pi, N)
        Z = np.stack([zernike_value(j, rho, th) for j in range(1, 12)])
        G = (Z @ Z.T) / N
        np.testing.assert_allclose(G, np.eye(11), atol=0.02)


class TestZernikeFit:
    def test_exact_recovery(self):
        rng = np.random.default_rng(1)
        N = 3000
        rho = np.sqrt(rng.uniform(0, 1, N))
        th = rng.uniform(0, 2 * np.pi, N)
        xy = np.stack([rho * np.cos(th), rho * np.sin(th)], axis=1)
        true = np.zeros(11)
        true[[3, 5, 7, 10]] = [0.5, -0.2, 0.1, 0.3]  # defocus/astig/coma/sph
        opd = sum(c * zernike_value(j + 1, rho, th)
                  for j, c in enumerate(true) if c)
        fit = zernike_fit(xy, opd, n_terms=11, radius=1.0)
        np.testing.assert_allclose(fit["coeffs"], true, atol=1e-10)
        assert fit["residual_rms"] < 1e-10
        assert fit["names"][3] == "defocus" and fit["names"][10] == "spherical"

    def test_weighted_fit_ignores_zero_power_rays(self):
        rng = np.random.default_rng(2)
        N = 2000
        rho = np.sqrt(rng.uniform(0, 1, N))
        th = rng.uniform(0, 2 * np.pi, N)
        xy = np.stack([rho * np.cos(th), rho * np.sin(th)], axis=1)
        opd = 0.4 * zernike_value(4, rho, th)
        opd_corrupt = opd.copy()
        opd_corrupt[:100] += 100.0           # garbage rays ...
        p = np.ones(N)
        p[:100] = 0.0                        # ... carry zero power
        fit = zernike_fit(xy, opd_corrupt, n_terms=6, powers=p, radius=1.0)
        assert fit["coeffs"][3] == pytest.approx(0.4, abs=1e-8)

    def test_needs_enough_rays(self):
        with pytest.raises(ValueError, match="rays"):
            zernike_fit(np.zeros((5, 2)), np.zeros(5), n_terms=11)


class TestReferenceSphere:
    def test_stigmatic_bundle_has_zero_opd(self):
        # rays through a perfect focus: launch from random pupil points
        # toward one focus; OPL from a common wavefront plane
        rng = np.random.default_rng(3)
        N = 500
        pupil = np.c_[rng.uniform(-1, 1, (N, 2)), np.zeros(N)]
        focus = np.array([0.0, 0.0, 5.0])
        d = focus - pupil
        L_ = np.linalg.norm(d, axis=1)
        d = d / L_[:, None]
        # detector plane past focus at z=6: positions + total path there
        t_det = (6.0 - pupil[:, 2]) / d[:, 2]
        pos = pupil + t_det[:, None] * d
        opl = t_det  # n=1; common start plane z=0 is NOT a wavefront for a
        # converging bundle — but the sphere centered at the focus is:
        # opl to focus = L_, so subtract to emulate equal-phase emission
        opl = t_det - L_ + L_.mean()
        opd, _ = opd_on_reference_sphere(pos, d, opl, focus, radius=0.5)
        assert np.abs(opd).max() < 1e-9

    def test_defocus_shows_up_as_z4(self):
        # same stigmatic bundle, but reference sphere centered 0.2 BEHIND
        # the true focus: OPD picks up a predominantly rho^2 (defocus) term
        rng = np.random.default_rng(4)
        N = 2000
        r = np.sqrt(rng.uniform(0, 1, N)) * 0.8
        th = rng.uniform(0, 2 * np.pi, N)
        pupil = np.stack([r * np.cos(th), r * np.sin(th), np.zeros(N)], 1)
        focus = np.array([0.0, 0.0, 5.0])
        d = focus - pupil
        L_ = np.linalg.norm(d, axis=1)
        d = d / L_[:, None]
        t_det = (6.0 - pupil[:, 2]) / d[:, 2]
        pos = pupil + t_det[:, None] * d
        opl = t_det - L_ + L_.mean()
        opd, _ = opd_on_reference_sphere(pos, d, opl,
                                         focus + [0, 0, 0.2], radius=1.0)
        fit = zernike_fit(pupil[:, :2], opd, n_terms=11, radius=0.8)
        c = np.abs(fit["coeffs"])
        assert c[3] > 10 * c[[1, 2, 4, 5, 6, 7, 8, 9, 10]].max()


class TestLensWavefront:
    def _trace(self, flat_first: bool):
        n, r, thickness = 1.5, 0.5, 0.1
        oe = L.optical_elements(n_segments=64, n_radial=24)
        if flat_first:
            lens = oe.spherical_lens(None, -r, 0.5, thickness, ior=n)
        else:
            lens = oe.spherical_lens(r, None, 0.5, thickness, ior=n)
        det = oe.disc(radius=2.0, center=(0, 0, 3.0), material="measure",
                      name="det")
        shell = oe.sphere(radius=12.0, material="terminator")
        src = CollimatedSource(center=(0, 0, -0.4), direction=(0, 0, 1),
                               diameter=0.4, ray_count=1500, seed=6)
        res = Tracer().trace(src, [lens, det, shell], trace_iterations=4,
                             capacity=8192)
        # dominant forward bundle only (Fresnel ghosts are ~25x weaker)
        keep = (res.measured_dir[:, 2] > 0.9) & (
            res.measured_power > 0.5 * res.measured_power.max())
        pos = res.measured_pos[keep]
        dirs = res.measured_dir[keep]
        opl = res.measured_opl[keep]
        pw = res.measured_power[keep]
        zf, _ = analysis.best_focus(pos, dirs, pw, z_range=(0.5, 3.0))
        sp = analysis.spot_diagram(pos, dirs, zf, pw)
        focus = np.array([sp["centroid"][0], sp["centroid"][1], zf])
        opd, _ = opd_on_reference_sphere(pos, dirs, opl, focus)
        pupil = analysis.spot_diagram(pos, dirs, 0.11, pw)["xy"]
        return zernike_fit(pupil, opd, n_terms=11, powers=pw)

    def test_flat_first_has_more_spherical_aberration(self):
        sa_flat = abs(self._trace(flat_first=True)["coeffs"][10])
        sa_curved = abs(self._trace(flat_first=False)["coeffs"][10])
        # classic singlet orientation rule-of-thumb: ~4x less SA with the
        # curved side toward the collimated beam
        assert sa_flat > 2.0 * sa_curved
        assert sa_flat > 1e-4  # and it is actually measurable


class TestGeometricMTF:
    def test_uniform_disc_matches_jinc(self):
        from scipy.special import j1  # scipy is available via jax deps

        rng = np.random.default_rng(5)
        N = 200_000
        a = 0.05
        r = a * np.sqrt(rng.uniform(0, 1, N))
        th = rng.uniform(0, 2 * np.pi, N)
        xy = np.stack([r * np.cos(th), r * np.sin(th)], axis=1)
        freqs = np.linspace(0.0, 12.0, 25)
        f, mtf = geometric_mtf(xy, freqs=freqs)
        x = 2 * np.pi * freqs * a
        ref = np.where(x > 1e-12, 2 * j1(x) / np.maximum(x, 1e-12), 1.0)
        np.testing.assert_allclose(mtf, np.abs(ref), atol=0.01)

    def test_sharper_spot_has_higher_mtf(self):
        rng = np.random.default_rng(6)
        tight = rng.normal(scale=0.01, size=(5000, 2))
        blurry = rng.normal(scale=0.05, size=(5000, 2))
        freqs = np.array([5.0, 10.0])
        _, m_tight = geometric_mtf(tight, freqs=freqs)
        _, m_blur = geometric_mtf(blurry, freqs=freqs)
        assert (m_tight > m_blur + 0.1).all()
