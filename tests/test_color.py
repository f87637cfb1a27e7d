"""Colorimetry analysis (analysis.cie_xyz / chromaticity / cct / srgb):
CIE 1931 anchors for the Wyman-fit color-matching functions (extension
over the reference, which has no spectral analysis at all — SURVEY.md §3
L5 is directivity/intensity only).

Anchors are textbook CIE facts: the ybar peak at 555 nm, the equal-energy
point at (1/3, 1/3), tabulated spectral-locus coordinates in the
well-conditioned mid-band, Planckian CCT recovery via McCamy, and sRGB
primaries behaving like primaries.
"""

import numpy as np
import pytest

from lightpycl_tpu import analysis as A


class TestCMF:
    def test_ybar_peaks_at_555(self):
        lam = np.linspace(0.38, 0.78, 4001)
        yb = A.cie_xyz_cmf(lam)[:, 1]
        assert abs(lam[yb.argmax()] - 0.555) < 0.003
        assert yb.max() == pytest.approx(1.0, abs=0.01)

    def test_tabulated_values_mid_band(self):
        # CIE 1931 table: (lambda nm, xbar, ybar, zbar); fit error bound
        # is ~1% of peak (peaks: 1.056 / 1.0 / 1.78)
        table = [(450, 0.3362, 0.0380, 1.7721),
                 (500, 0.0049, 0.3230, 0.2720),
                 (550, 0.4334, 0.9950, 0.0087),
                 (600, 1.0622, 0.6310, 0.0008)]
        for nm, xb, yb, zb in table:
            got = A.cie_xyz_cmf([nm * 1e-3])[0]
            assert got[0] == pytest.approx(xb, abs=0.03), nm
            assert got[1] == pytest.approx(yb, abs=0.03), nm
            assert got[2] == pytest.approx(zb, abs=0.06), nm

    def test_nonnegative_outside_visible(self):
        cmf = A.cie_xyz_cmf(np.array([0.2, 0.35, 0.8, 1.5]))
        assert (cmf < 0.01).all()  # fades out, no wild extrapolation


class TestChromaticity:
    def test_equal_energy_point(self):
        lam = np.linspace(0.38, 0.78, 2001)
        x, y = A.chromaticity(lam, np.ones_like(lam))
        assert x == pytest.approx(1.0 / 3.0, abs=0.005)
        assert y == pytest.approx(1.0 / 3.0, abs=0.005)

    @pytest.mark.parametrize("nm,want", [(480, (0.0913, 0.1327)),
                                         (510, (0.0139, 0.7502)),
                                         (546.1, (0.2738, 0.7174)),
                                         (580, (0.5125, 0.4866))])
    def test_spectral_locus_mid_band(self, nm, want):
        x, y = A.chromaticity([nm * 1e-3], [1.0])
        assert x == pytest.approx(want[0], abs=0.02)
        assert y == pytest.approx(want[1], abs=0.02)

    def test_zero_power_is_safe(self):
        assert A.chromaticity([0.55], [0.0]) == (0.0, 0.0)

    def test_power_weighting(self):
        # doubling every power leaves chromaticity unchanged; skewing
        # power toward blue moves y down and x down
        lam = np.array([0.45, 0.60])
        x1, y1 = A.chromaticity(lam, [1.0, 1.0])
        x2, y2 = A.chromaticity(lam, [2.0, 2.0])
        assert (x1, y1) == pytest.approx((x2, y2), abs=1e-12)
        xb, yb = A.chromaticity(lam, [5.0, 1.0])
        assert xb < x1 and yb < y1


class TestPhotometry:
    def test_555nm_peak_efficacy(self):
        # the photopic maximum: 683 lm/W at 555 nm, by definition
        assert A.luminous_efficacy([0.555], [1.0]) == pytest.approx(
            683.0, rel=0.02)

    def test_infrared_is_dark(self):
        assert A.luminous_flux([0.9], [100.0]) < 0.1

    def test_flux_scales_linearly(self):
        lam = np.linspace(0.4, 0.7, 301)
        p = np.ones_like(lam)
        assert A.luminous_flux(lam, 3 * p) == pytest.approx(
            3 * A.luminous_flux(lam, p), rel=1e-9)

    def test_white_led_efficacy_physics(self):
        """Blue line + yellow band (the example_white_led mix): the LER
        must sit well below the 683 lm/W photopic ceiling, above a flat
        equal-energy spectrum's (whose off-peak tails drag it down), and
        broadening the yellow band into the red must LOWER it (exactly
        why real broad phosphors land at ~300 lm/W)."""
        lam = np.linspace(0.40, 0.75, 701)
        blue = np.exp(-0.5 * ((lam - 0.45) / 0.01) ** 2)
        narrow = blue + np.exp(-0.5 * ((lam - 0.57) / 0.0425) ** 2)
        broad = blue + 0.71 * np.exp(-0.5 * ((lam - 0.57) / 0.06) ** 2)
        ler_n = A.luminous_efficacy(lam, narrow)
        ler_b = A.luminous_efficacy(lam, broad)
        ler_flat = A.luminous_efficacy(lam, np.ones_like(lam))
        assert 250 < ler_b < ler_n < 500
        assert ler_flat < ler_b


class TestCCT:
    @pytest.mark.parametrize("T", [3000.0, 4500.0, 6500.0, 9000.0])
    def test_planckian_recovery(self, T):
        """A Planck blackbody spectrum must come back from McCamy within
        ~2% over the formula's validity range."""
        lam = np.linspace(0.38, 0.78, 2001)
        l_m = lam * 1e-6
        h, c, kB = 6.62607e-34, 2.99792e8, 1.38065e-23
        p = 1.0 / l_m**5 / (np.exp(h * c / (l_m * kB * T)) - 1.0)
        x, y = A.chromaticity(lam, p)
        assert A.cct(x, y) == pytest.approx(T, rel=0.02)

    def test_d65_white(self):
        # (x, y) = (0.3127, 0.3290) is defined as 6504 K
        assert A.cct(0.3127, 0.3290) == pytest.approx(6504, abs=60)


class TestSRGB:
    def test_blue_line_is_blue(self):
        r, g, b = A.srgb([0.45], [1.0])
        assert b == pytest.approx(1.0) and g < 0.2

    def test_green_line_is_green(self):
        r, g, b = A.srgb([0.53], [1.0])
        assert g == pytest.approx(1.0) and g > r and g > b

    def test_flat_spectrum_is_near_neutral(self):
        lam = np.linspace(0.38, 0.78, 2001)
        r, g, b = A.srgb(lam, np.ones_like(lam))
        assert max(r, g, b) - min(r, g, b) < 0.15

    def test_gamma_encoding_monotone(self):
        lam = np.linspace(0.38, 0.78, 2001)
        p = np.ones_like(lam)
        bright = A.srgb(lam, p, normalize=False)
        dim = A.srgb(lam, 1e-3 * p, normalize=False)
        assert all(d <= b_ for d, b_ in zip(dim, bright))
