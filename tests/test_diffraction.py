"""Physical-optics PSF / Strehl / MTF from wavefront data (analysis.py).

Synthetic-pupil anchors (exact classical results):
  * uniform circular pupil, zero OPD -> Airy pattern: Strehl 1, first dark
    ring at 1.22 lambda f / D, MTF = (2/pi)(acos v - v sqrt(1 - v^2));
  * small defocus -> Marechal approximation S ~ exp(-(2 pi sigma/lambda)^2);
  * wavefront tilt -> PSF peak displaced by tilt * focal length.
Plus one traced integration anchor: the stigmatic hyperbolic singlet from
the asphere suite must come out near-diffraction-limited (Strehl ~ 1).
"""

import numpy as np
import pytest

from lightpycl_tpu.analysis import (diffraction_mtf, diffraction_psf,
                                    zernike_value)

WL = 0.55        # um
R_PUP = 2000.0   # um pupil radius (D = 4 mm)
F = 20000.0      # um focal length (f/5)


def _disc_points(n_grid=64):
    """One point per pupil-grid cell center, inside the unit disc — a
    pixel-exact uniform circular aperture."""
    c = (np.arange(n_grid) + 0.5) / n_grid * 2.0 - 1.0
    X, Y = np.meshgrid(c, c, indexing="ij")
    m = X**2 + Y**2 <= (1.0 - 0.5 / n_grid) ** 2
    return np.stack([X[m], Y[m]], axis=1) * R_PUP


class TestAiry:
    def test_strehl_one_and_first_dark_ring(self):
        xy = _disc_points()
        out = diffraction_psf(xy, np.zeros(len(xy)), WL, n_grid=64, pad=8,
                              focal_length=F, radius=R_PUP)
        assert out["strehl"] == pytest.approx(1.0, abs=1e-9)
        assert out["psf"].max() == pytest.approx(1.0, abs=1e-9)
        N = out["psf"].shape[0]
        prof = out["psf"][N // 2, N // 2:]
        # first local minimum of the central row = first Airy dark ring
        k = 1
        while prof[k + 1] < prof[k]:
            k += 1
        r_zero = out["x"][N // 2 + k]
        airy = 1.22 * WL * F / (2 * R_PUP)
        assert r_zero == pytest.approx(airy, rel=0.15)

    def test_mtf_matches_circular_aperture_formula(self):
        xy = _disc_points()
        freqs, mtf = diffraction_mtf(xy, np.zeros(len(xy)), WL, n_grid=64,
                                     pad=8, focal_length=F, radius=R_PUP)
        cutoff = 2 * R_PUP / (WL * F)
        assert freqs[-1] == pytest.approx(cutoff)
        v = freqs / cutoff
        ref = np.where(v < 1.0,
                       (2 / np.pi) * (np.arccos(np.clip(v, 0, 1))
                                      - v * np.sqrt(np.clip(1 - v**2, 0, 1))),
                       0.0)
        sel = v <= 0.85
        assert np.max(np.abs(mtf[sel] - ref[sel])) < 0.03

    def test_marechal_small_aberration(self):
        xy = _disc_points()
        rho = np.linalg.norm(xy, axis=1) / R_PUP
        theta = np.arctan2(xy[:, 1], xy[:, 0])
        for sigma_waves in (1.0 / 30.0, 1.0 / 14.0):
            # Noll-normalized Z4: coefficient == RMS contribution
            opd = sigma_waves * WL * zernike_value(4, rho, theta)
            out = diffraction_psf(xy, opd, WL, n_grid=64, pad=4,
                                  focal_length=F, radius=R_PUP)
            marechal = np.exp(-(2 * np.pi * sigma_waves) ** 2)
            assert out["strehl"] == pytest.approx(marechal, abs=0.02)
            assert out["strehl"] < 1.0

    def test_tilt_shifts_psf_peak(self):
        xy = _disc_points()
        tilt = 2e-4                      # rad
        opd = tilt * xy[:, 0]
        out = diffraction_psf(xy, opd, WL, n_grid=64, pad=8,
                              focal_length=F, radius=R_PUP)
        N = out["psf"].shape[0]
        i, j = np.unravel_index(np.argmax(out["psf"]), out["psf"].shape)
        # tilt W = s*x advances the wavefront along +x -> peak moves by
        # s*f in x (sign depends on the FFT convention; displacement
        # magnitude is the anchor) and stays centered in y
        assert abs(out["x"][i]) == pytest.approx(tilt * F, rel=0.1)
        assert j == N // 2
        # peak INTENSITY stays ~ideal (slightly under 1: the shifted Airy
        # peak falls between FFT grid samples)
        assert out["psf"].max() == pytest.approx(1.0, abs=0.02)


class TestTracedStrehl:
    def test_stigmatic_asphere_is_diffraction_limited(self):
        # hyperbolic plano-convex singlet (k = -n^2) is stigmatic on axis:
        # traced OPD on the reference sphere ~ 0 -> Strehl ~ 1 even at a
        # physically large aperture (blur is tessellation only)
        import lightpycl_tpu as L
        from lightpycl_tpu.analysis import opd_on_reference_sphere
        from lightpycl_tpu.sources import CollimatedSource
        from lightpycl_tpu.tracer.engine import Tracer

        n, R, thick = 1.5, 0.5, 0.15
        oe = L.optical_elements(n_segments=128, n_radial=64)
        lens = oe.aspheric_lens(None, -R, aperture=0.5, thickness=thick,
                                ior=n, k2=-n * n)
        dome = oe.sphere(radius=6.0, material="measure", name="dome")
        src = CollimatedSource(center=(0, 0, -0.5), direction=(0, 0, 1),
                               diameter=0.4, power=1.0, ray_count=4000,
                               seed=2)
        res = Tracer().trace(src, [lens, dome], trace_iterations=6,
                             capacity=16000)
        z_focus = thick + R / (n - 1.0)
        sel = (res.measured_dir[:, 2] > 0.5) & (
            res.measured_power > 0.5 * res.measured_power.max()
        )   # forward MAIN bundle (power filter drops Fresnel ghosts,
            # whose different OPL would read as hundreds of waves)
        pos, dirs = res.measured_pos[sel], res.measured_dir[sel]
        opd, _ = opd_on_reference_sphere(pos, dirs, res.measured_opl[sel],
                                         focus=(0, 0, z_focus))
        # pupil coords: trace back to the z=0 entrance plane
        t_back = (0.0 - pos[:, 2]) / dirs[:, 2]
        pupil = pos[:, :2] + t_back[:, None] * dirs[:, :2]
        # units: lengths here are in the scene's units; express the
        # wavelength in the same units assuming mm scale (0.55 um)
        wl_mm = 0.55e-3
        out = diffraction_psf(pupil, opd, wl_mm, powers=res.measured_power[sel],
                              n_grid=32, focal_length=z_focus)
        assert out["strehl"] > 0.8
