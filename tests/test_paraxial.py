"""Paraxial / ABCD-matrix utilities (`lightpycl_tpu.paraxial`).

Anchors are the independent textbook formulas (Gerrard & Burch):

  thick lens    1/f = (n-1) [1/r1 - 1/r2 + (n-1) t / (n r1 r2)]
  back focus    BFD = f [1 - (n-1) t / (n r1)]
  front focus   FFD = f [1 + (n-1) t / (n r2)]
  GRIN rod      pitch P = 2 pi / g,  quarter pitch collimates<->focuses
  mirror        f = |R| / 2

plus a closed-loop check: the mesh tracer's best-focus position on a
real `spherical_lens` must land at thickness + BFD predicted by the
ABCD model for a paraxial beam.
"""

import numpy as np
import pytest

import lightpycl_tpu as L
from lightpycl_tpu import paraxial as px


N, R1, R2, T = 1.5, 0.8, -0.6, 0.2


def lensmaker_thick(n, r1, r2, t):
    return 1.0 / ((n - 1.0) * (1.0 / r1 - 1.0 / r2
                               + (n - 1.0) * t / (n * r1 * r2)))


class TestMatrices:
    def test_unit_determinant(self):
        for M in (px.propagation(0.7, 1.33), px.refraction(0.5, 1.0, 1.7),
                  px.thin_lens(2.0), px.mirror(3.0),
                  px.grin_rod(0.4, 1.6, 0.25),
                  px.grin_rod(0.4, 1.6, -0.25),
                  px.thick_lens(R1, R2, T, N)):
            assert np.linalg.det(M) == pytest.approx(1.0, abs=1e-12)

    def test_compose_order(self):
        # light meets lens first, then propagates: M = P @ L
        M = px.compose(px.thin_lens(1.0), px.propagation(1.0))
        y, u = px.trace_ray(M, 0.3, 0.0)
        assert y == pytest.approx(0.0, abs=1e-14)  # collimated -> focus at f

    def test_flat_refraction_preserves_reduced_slope(self):
        # paraxial Snell: n1 theta1 = n2 theta2  <=>  u is continuous
        M = px.refraction(None, 1.0, 1.7)
        y, u = px.trace_ray(M, 0.1, 0.02, n_in=1.0)
        assert y == pytest.approx(0.1)
        assert u == pytest.approx(1.0 * 0.02)  # reduced slope unchanged


class TestThickLens:
    def test_efl_matches_lensmaker(self):
        M = px.thick_lens(R1, R2, T, N)
        props = px.system_properties(M)
        assert props["efl"] == pytest.approx(lensmaker_thick(N, R1, R2, T),
                                             rel=1e-12)

    def test_bfd_ffd_formulas(self):
        M = px.thick_lens(R1, R2, T, N)
        props = px.system_properties(M)
        f = lensmaker_thick(N, R1, R2, T)
        assert props["bfd"] == pytest.approx(
            f * (1.0 - (N - 1.0) * T / (N * R1)), rel=1e-12)
        assert props["ffd"] == pytest.approx(
            f * (1.0 + (N - 1.0) * T / (N * R2)), rel=1e-12)

    def test_zero_thickness_is_thin_lens(self):
        f = 1.0 / ((N - 1.0) * (1.0 / R1 - 1.0 / R2))
        M = px.thick_lens(R1, R2, 0.0, N)
        np.testing.assert_allclose(M, px.thin_lens(f), atol=1e-12)

    def test_principal_planes_symmetric_biconvex(self):
        # equiconvex lens in air: principal planes symmetric about center
        M = px.thick_lens(0.7, -0.7, T, N)
        p = px.system_properties(M)
        assert p["pp1"] == pytest.approx(-(p["pp2"]) , rel=1e-9)
        assert 0.0 < p["pp1"] < T  # inside the glass

    def test_imaging_conjugates(self):
        # thin lens f: object at 2f -> image at 2f, magnification -1
        f = 1.5
        M = px.compose(px.propagation(2 * f), px.thin_lens(f),
                       px.propagation(2 * f))
        # B == 0 at an imaging conjugate; A is the magnification
        assert M[0, 1] == pytest.approx(0.0, abs=1e-12)
        assert M[0, 0] == pytest.approx(-1.0, rel=1e-12)


class TestMirrorAndGrin:
    def test_mirror_focal_length(self):
        # collimated ray at height y crosses the axis R/2 after the fold
        R = 3.0
        M = px.compose(px.mirror(R), px.propagation(R / 2))
        y, _ = px.trace_ray(M, 0.4, 0.0)
        assert y == pytest.approx(0.0, abs=1e-14)

    def test_flat_mirror_is_identity(self):
        np.testing.assert_array_equal(px.mirror(None), np.eye(2))

    def test_convex_mirror_diverges(self):
        # signed radius (ADVICE r3): R < 0 = convex must DIVERGE — a
        # collimated ray appears to come from the virtual focus |R|/2
        # behind the mirror, so the folded slope is positive (away from
        # axis) with u = y / (R/2)
        R = -3.0
        _, u = px.trace_ray(px.mirror(R), 0.4, 0.0)
        assert u == pytest.approx(0.4 * (-2.0 / R), rel=1e-12)
        assert u > 0.0

    def test_grin_quarter_pitch_focuses(self):
        n0, a = 1.6, 0.3
        g = np.sqrt(a)
        L_qp = (np.pi / 2) / g
        y, u = px.trace_ray(px.grin_rod(L_qp, n0, a), 0.05, 0.0)
        assert y == pytest.approx(0.0, abs=1e-12)
        # and the exit reduced slope is -y0 n0 g
        assert u == pytest.approx(-0.05 * n0 * g, rel=1e-12)

    def test_grin_half_pitch_inverts(self):
        n0, a = 1.6, 0.3
        L_hp = np.pi / np.sqrt(a)
        y, u = px.trace_ray(px.grin_rod(L_hp, n0, a), 0.05, 0.01, n_in=n0)
        assert y == pytest.approx(-0.05, rel=1e-12)
        assert u == pytest.approx(-0.01 * n0, rel=1e-12)

    def test_grin_sinusoid_matches_trace_anchor(self):
        # same closed form tests/test_grin.py anchors the tracer to:
        # parallel entry at r0 exits at r0 cos(g L)
        n0, a, r0, length = 1.6, 0.25, 0.08, 0.9
        y, _ = px.trace_ray(px.grin_rod(length, n0, a), r0, 0.0)
        assert y == pytest.approx(r0 * np.cos(np.sqrt(a) * length), rel=1e-12)

    def test_defocusing_grin(self):
        # a < 0: index grows with rho -> rays curve AWAY from the axis
        y, _ = px.trace_ray(px.grin_rod(0.5, 1.6, -0.25), 0.05, 0.0)
        assert y > 0.05

    def test_afocal_raises(self):
        with pytest.raises(ValueError, match="afocal"):
            px.system_properties(px.propagation(1.0))


class TestSeidel:
    """Third-order sums against convention-free textbook anchors
    (Welford ch. 8) plus an exact-trace closed loop."""

    PHI, Y, UBAR = 1.0 / 100.0, 5.0, 0.02

    def thin(self, q, n=1.5):
        # shape factor q = (c1 + c2)/(c1 - c2) at fixed power
        dc = self.PHI / (n - 1.0)
        c1, c2 = dc * (q + 1) / 2.0, dc * (q - 1) / 2.0
        return px.seidel([c1, c2], [1e-9], [1.0, n, 1.0],
                         y=self.Y, u=0.0, ybar=0.0, ubar=self.UBAR)

    def test_lagrange_invariant(self):
        r = self.thin(0.3)
        assert r["H"] == pytest.approx(self.UBAR * self.Y, rel=1e-12)

    def test_thin_lens_petzval(self):
        # S4 = H^2 phi / n, independent of bending
        for q in (-1.0, 0.0, 0.7):
            r = self.thin(q)
            assert r["S4"] == pytest.approx(
                r["H"] ** 2 * self.PHI / 1.5, rel=1e-9)

    def test_thin_lens_astigmatism_stop_at_lens(self):
        # S3 = H^2 phi, independent of bending (stop in contact)
        for q in (-0.5, 0.9):
            r = self.thin(q)
            assert r["S3"] == pytest.approx(r["H"] ** 2 * self.PHI,
                                            rel=1e-6)

    def test_thin_lens_zero_distortion_stop_at_lens(self):
        assert self.thin(0.5)["S5"] == pytest.approx(0.0, abs=1e-12)

    def test_thin_lens_spherical_closed_form(self):
        # Welford's bending/conjugate form, object at infinity (p = 1 in
        # this sign convention; verified against the exact trace below)
        n, q = 1.5, 0.5
        p = 1.0
        expected = self.Y ** 4 * self.PHI ** 3 / 4.0 * (
            (n / (n - 1.0)) ** 2
            + (n + 2.0) / (n * (n - 1.0) ** 2) * q * q
            - 4.0 * (n + 1.0) / (n * (n - 1.0)) * q * p
            + (3.0 * n + 2.0) / n * p * p)
        assert self.thin(q, n)["S1"] == pytest.approx(expected, rel=1e-6)

    def test_best_form_shape_factor(self):
        # argmin_q S1 = 2 (n^2 - 1)/(n + 2) = 0.714286 for n = 1.5 —
        # the same q* the exact-surface traced scan brackets in
        # tests/test_diff_analytic.py (Coddington best form)
        qs = np.linspace(0.0, 1.5, 1501)
        s1 = np.array([self.thin(q)["S1"] for q in qs])
        assert (s1 > 0).all()  # singlet can't correct spherical
        assert qs[np.argmin(s1)] == pytest.approx(
            2.0 * (1.5 ** 2 - 1.0) / (1.5 + 2.0), abs=2e-3)

    def test_aplanatic_surface(self):
        # object at the aplanatic conjugate of a single sphere:
        # u = -y n c/(n + n') makes d(u/n) = 0 -> S1 = S2 = S3 = 0
        c, n1, n2, y = 1.0 / 50.0, 1.0, 1.5, 5.0
        r = px.seidel([c], [], [n1, n2], y=y, u=-y * n1 * c / (n1 + n2),
                      ybar=0.0, ubar=self.UBAR)
        for key in ("S1", "S2", "S3"):
            assert r[key] == pytest.approx(0.0, abs=1e-15)

    def test_normal_incidence_surface(self):
        # marginal ray through the center of curvature: A = 0 ->
        # S1 = S2 = 0 (but astigmatism survives)
        c, n1, n2, y = 1.0 / 50.0, 1.0, 1.5, 5.0
        r = px.seidel([c], [], [n1, n2], y=y, u=-y * c,
                      ybar=0.0, ubar=self.UBAR)
        assert r["S1"] == pytest.approx(0.0, abs=1e-15)
        assert r["S2"] == pytest.approx(0.0, abs=1e-15)
        assert abs(r["S3"]) > 0

    @staticmethod
    def _exact_focus(h, r1, r2, t, n):
        """Exact f64 meridional trace of a spherical singlet: axis
        crossing z of a ray entering parallel at height h (independent
        2-D check, no framework code)."""
        p = np.array([h, -10.0])
        d = np.array([0.0, 1.0])

        def hit(p, d, zc, R):
            oc = p - np.array([0.0, zc])
            b = oc @ d
            sq = np.sqrt(b * b - (oc @ oc - R * R))
            zv = zc - np.sign(R) * abs(R)
            cand = [tt for tt in (-b - sq, -b + sq) if tt > 1e-12]
            tt = min(cand, key=lambda s: abs((p + s * d)[1] - zv))
            return p + tt * d

        def refract(d, nrm, na, nb):
            if nrm @ d > 0:
                nrm = -nrm
            ci = -(d @ nrm)
            ct = np.sqrt(1.0 - (na / nb) ** 2 * (1.0 - ci * ci))
            out = (na / nb) * d + (na / nb * ci - ct) * nrm
            return out / np.linalg.norm(out)

        p = hit(p, d, r1, r1)
        d = refract(d, (p - np.array([0.0, r1])) / abs(r1), 1.0, n)
        p = hit(p, d, t + r2, r2)
        d = refract(d, (p - np.array([0.0, t + r2])) / abs(r2), n, 1.0)
        return p[1] - p[0] / d[0] * d[1]

    def test_lsa_matches_exact_trace(self):
        # longitudinal spherical LSA = -S1 / (2 n' u'^2) vs the exact
        # trace, converging as h -> 0 (third-order theory)
        r1, r2, t, n = 60.0, -60.0, 5.0, 1.5
        z_par = self._exact_focus(1e-6, r1, r2, t, n)
        for h, tol in ((2.0, 0.005), (4.0, 0.02)):
            lsa_exact = self._exact_focus(h, r1, r2, t, n) - z_par
            r = px.seidel([1 / r1, 1 / r2], [t], [1.0, n, 1.0],
                          y=h, u=0.0, ybar=0.0, ubar=0.01)
            lsa = -r["S1"] / (2.0 * r["n_out"] * r["u_out"] ** 2)
            assert lsa < 0  # undercorrected: marginal focus short
            assert lsa == pytest.approx(lsa_exact, rel=tol)

    def test_exit_state_matches_abcd(self):
        # seidel()'s internal paraxial trace agrees with the ABCD module
        r1, r2, t, n = 60.0, -60.0, 5.0, 1.5
        r = px.seidel([1 / r1, 1 / r2], [t], [1.0, n, 1.0],
                      y=3.0, u=0.0, ybar=0.0, ubar=0.01)
        y2, u2_reduced = px.trace_ray(px.thick_lens(r1, r2, t, n), 3.0, 0.0)
        assert r["y_out"] == pytest.approx(y2, rel=1e-12)
        assert r["u_out"] == pytest.approx(u2_reduced, rel=1e-12)  # n_out=1

    def test_singlet_helper(self):
        r = px.seidel_singlet(60.0, -60.0, 5.0, 1.5, y=3.0, ubar=0.01)
        full = px.seidel([1 / 60.0, -1 / 60.0], [5.0], [1.0, 1.5, 1.0],
                         y=3.0, u=0.0, ybar=0.0, ubar=0.01)
        for key in ("S1", "S2", "S3", "S4", "S5"):
            assert r[key] == pytest.approx(full[key], rel=1e-12)

    def test_validation_errors(self):
        with pytest.raises(ValueError, match="indices"):
            px.seidel([0.1], [], [1.0], y=1, u=0, ybar=0, ubar=0.01)
        with pytest.raises(ValueError, match="spacings"):
            px.seidel([0.1, 0.2], [], [1.0, 1.5, 1.0],
                      y=1, u=0, ybar=0, ubar=0.01)


class TestSeidelMirror:
    """Reflecting surfaces via the folded n' = -n convention."""

    R, Y, UBAR = 10.0, 0.5, 0.02

    def _mirror(self, ybar, ubar):
        return px.seidel([1.0 / self.R], [], [1.0, -1.0], y=self.Y,
                         u=0.0, ybar=ybar, ubar=ubar)

    def test_spherical_mirror_lsa(self):
        # exact marginal focus R - R/(2 cos t) -> LSA = -y^2/(4R) + O(y^4)
        r = self._mirror(0.0, self.UBAR)
        lsa = -r["S1"] / (2.0 * r["n_out"] * r["u_out"] ** 2)
        t = np.arcsin(self.Y / self.R)
        exact = (self.R - self.R / (2.0 * np.cos(t))) - self.R / 2.0
        assert lsa == pytest.approx(-self.Y ** 2 / (4.0 * self.R),
                                    rel=1e-12)
        assert lsa == pytest.approx(exact, rel=3e-3)  # third order

    def test_mirror_petzval(self):
        # Petzval sum of a mirror: S4 = -H^2 c (1/n' - 1/n) = 2 H^2 / R
        r = self._mirror(0.0, self.UBAR)
        assert r["S4"] == pytest.approx(2.0 * r["H"] ** 2 / self.R,
                                        rel=1e-12)

    def test_stop_at_center_of_curvature(self):
        # chief ray through the center of curvature strikes the mirror
        # normally (Abar = 0): coma, astigmatism, and distortion vanish
        # exactly and only the Petzval curvature remains — the symmetry
        # the Schmidt camera exploits (examples/example_schmidt.py).
        r = self._mirror(-self.UBAR * self.R, self.UBAR)
        for key in ("S2", "S3", "S5"):
            assert r[key] == pytest.approx(0.0, abs=1e-18)
        assert r["S4"] == pytest.approx(2.0 * r["H"] ** 2 / self.R,
                                        rel=1e-12)
        assert abs(self._mirror(0.0, self.UBAR)["S3"]) > 0  # stop matters


class TestFieldCurvature:
    """Closed loop for S3/S4 against the EXACT-surface tracer: the
    tangential and sagittal line foci of a tilted collimated bundle
    through an analytic (quadric) singlet sit at the Coddington
    field-curvature positions

        dz_t = -(3 S3 + S4) / (2 n' u'^2)
        dz_s = -(S3 + S4)  / (2 n' u'^2)

    relative to the on-axis focus (stop at the lens: the bundle is
    aimed at the front vertex). Analytic surfaces make this exact up to
    fifth-order terms, so the residual must shrink with field angle."""

    R1, R2, T, N = 0.8, -0.8, 0.2, 1.5

    @classmethod
    def _line_foci(cls, theta):
        from lightpycl_tpu.sources import CollimatedSource
        from lightpycl_tpu.tracer.engine import Tracer

        lens = L.analytic_lens(cls.R1, cls.R2, aperture=0.3,
                               thickness=cls.T, ior=cls.N)
        wall = L.analytic_sphere(10.0, material="measure", name="wall")
        d = np.array([0.0, np.sin(theta), np.cos(theta)])
        src = CollimatedSource(center=tuple(-0.4 * d), direction=tuple(d),
                               diameter=0.06, power=1.0, ray_count=1024,
                               seed=3)
        res = Tracer().trace(src, lens + wall, trace_iterations=3,
                             capacity=4096)
        fwd = np.asarray(res.measured_dir[:, 2] > 0.5)
        assert fwd.sum() > 600
        p = np.asarray(res.measured_pos[fwd], float)
        dd = np.asarray(res.measured_dir[fwd], float)
        w = np.asarray(res.measured_power[fwd], float)
        sl = dd[:, :2] / dd[:, 2:3]          # lateral slopes vs z
        c0 = p[:, :2] - sl * p[:, 2:3]       # lateral position at z = 0
        W = w / w.sum()
        foci = []
        for ax in (0, 1):                    # x -> sagittal, y -> tangential
            a, b = c0[:, ax], sl[:, ax]
            am, bm = (W * a).sum(), (W * b).sum()
            cov = (W * (a - am) * (b - bm)).sum()
            var = (W * (b - bm) ** 2).sum()
            foci.append(-cov / var)          # z minimizing lateral variance
        return foci[1], foci[0]              # (z_tangential, z_sagittal)

    def test_coddington_field_curves(self):
        z_t0, z_s0 = self._line_foci(0.0)
        assert z_t0 == pytest.approx(z_s0, abs=1e-3)  # no on-axis astig
        errs = []
        for theta, tol in ((0.1, 0.03), (0.2, 0.08)):
            z_t, z_s = self._line_foci(theta)
            r = px.seidel([1 / self.R1, 1 / self.R2], [self.T],
                          [1.0, self.N, 1.0], y=0.03, u=0.0,
                          ybar=0.0, ubar=np.tan(theta))
            scale = 2.0 * r["n_out"] * r["u_out"] ** 2
            pred_t = -(3.0 * r["S3"] + r["S4"]) / scale
            pred_s = -(r["S3"] + r["S4"]) / scale
            assert z_t - z_t0 == pytest.approx(pred_t, rel=tol)
            assert z_s - z_s0 == pytest.approx(pred_s, rel=tol)
            # astigmatic separation z_t - z_s = -S3 / (n' u'^2)
            astig = -r["S3"] / (r["n_out"] * r["u_out"] ** 2)
            assert z_t - z_s == pytest.approx(astig, rel=tol)
            errs.append(abs((z_t - z_t0) - pred_t) / abs(pred_t))
        assert errs[0] < errs[1]  # third-order residual grows with field


class TestChromatic:
    """First-order chromatic sums CL/CT (axial and lateral color)."""

    PHI, Y = 1.0 / 100.0, 5.0

    def test_thin_lens_axial_color(self):
        # CL = y^2 phi / V, independent of bending
        n_d, V = 1.5168, 64.17
        dn = (n_d - 1.0) / V
        dc = self.PHI / (n_d - 1.0)
        for q in (-0.5, 0.0, 0.75):
            c1, c2 = dc * (q + 1) / 2.0, dc * (q - 1) / 2.0
            r = px.seidel([c1, c2], [1e-9], [1.0, n_d, 1.0], y=self.Y,
                          u=0.0, ybar=0.0, ubar=0.02,
                          delta_n=[0.0, dn, 0.0])
            assert r["CL"] == pytest.approx(self.Y ** 2 * self.PHI / V,
                                            rel=1e-6)
            # stop in contact: no lateral color
            assert r["CT"] == pytest.approx(0.0, abs=1e-12)

    def test_remote_stop_lateral_color(self):
        n_d, V = 1.5168, 64.17
        dc = self.PHI / (n_d - 1.0)
        r = px.seidel([dc * 0.75, -dc * 0.25], [1e-9], [1.0, n_d, 1.0],
                      y=self.Y, u=0.0, ybar=2.0, ubar=0.02,
                      delta_n=[0.0, (n_d - 1.0) / V, 0.0])
        assert abs(r["CT"]) > 1e-4

    def test_thick_lens_focus_shift_matches_abcd(self):
        # dz(F - C) = -CL / (n' u'^2) vs the exact paraxial BFD change
        from lightpycl_tpu import materials as mats

        n_d, V = 1.5168, 64.17
        a, b = mats.glass(n_d, V)
        nF = a + b / mats.F_LINE ** 2
        nC = a + b / mats.C_LINE ** 2
        r1, r2, t = 60.0, -60.0, 5.0
        shift = (px.system_properties(px.thick_lens(r1, r2, t, nF))["bfd"]
                 - px.system_properties(px.thick_lens(r1, r2, t, nC))["bfd"])
        r = px.seidel([1 / r1, 1 / r2], [t], [1.0, n_d, 1.0], y=3.0,
                      u=0.0, ybar=0.0, ubar=0.01,
                      delta_n=[0.0, nF - nC, 0.0])
        pred = -r["CL"] / (r["n_out"] * r["u_out"] ** 2)
        assert pred < 0  # blue focuses shorter (normal dispersion)
        assert pred == pytest.approx(shift, rel=0.01)

    def test_achromatic_doublet(self):
        # phi1/V1 + phi2/V2 = 0 (BK7 crown + F2 flint): CL vanishes
        # while each element alone contributes ~y^2 |phi_i| / V_i
        nd1, V1 = 1.5168, 64.17
        nd2, V2 = 1.6200, 36.37
        phi1 = self.PHI * V1 / (V1 - V2)
        phi2 = -self.PHI * V2 / (V1 - V2)
        dc1, dc2 = phi1 / (nd1 - 1.0), phi2 / (nd2 - 1.0)
        r = px.seidel([dc1 / 2, -dc1 / 2, dc2 / 2, -dc2 / 2], [1e-9] * 3,
                      [1.0, nd1, 1.0, nd2, 1.0], y=self.Y, u=0.0,
                      ybar=0.0, ubar=0.02,
                      delta_n=[0.0, (nd1 - 1.0) / V1, 0.0,
                               (nd2 - 1.0) / V2, 0.0])
        element_scale = self.Y ** 2 * abs(phi1) / V1
        assert abs(r["CL"]) < 1e-6 * element_scale

    def test_delta_n_validation(self):
        with pytest.raises(ValueError, match="delta_n"):
            px.seidel([0.1], [], [1.0, 1.5], y=1, u=0, ybar=0, ubar=0.01,
                      delta_n=[0.0])

    def test_traced_chromatic_focal_shift(self):
        """Closed loop vs the real dispersive tracer: best focus of an
        SF10 singlet at the F vs C line shifts by -CL/(n' u'^2)."""
        from lightpycl_tpu import materials as mats
        from lightpycl_tpu.analysis import best_focus
        from lightpycl_tpu.sources import CollimatedSource
        from lightpycl_tpu.tracer.config import TraceConfig
        from lightpycl_tpu.tracer.engine import Tracer

        n_d, V = 1.7280, 28.53  # SF10: strong dispersion
        a, b = mats.glass(n_d, V)
        r1, r2, t = 0.8, -0.8, 0.2

        oe = L.optical_elements(n_segments=128, n_radial=64)
        lens = oe.spherical_lens(r1, r2, aperture=0.4, thickness=t, ior=a)
        lens.dispersion_b = b
        wall = oe.sphere(radius=10.0, material="measure", name="wall")
        tracer = Tracer(TraceConfig())

        def focus_at(wl):
            src = CollimatedSource(center=(0, 0, -0.4), direction=(0, 0, 1),
                                   diameter=0.1, power=1.0, ray_count=512,
                                   seed=7, wavelength=wl)
            res = tracer.trace(src, [lens, wall], trace_iterations=3,
                               capacity=2048)
            fwd = res.measured_dir[:, 2] > 0.5
            assert fwd.sum() > 300
            return best_focus(res.measured_pos[fwd], res.measured_dir[fwd],
                              res.measured_power[fwd],
                              z_range=(0.3, 1.4))[0]

        shift = focus_at(mats.F_LINE) - focus_at(mats.C_LINE)
        nF = a + b / mats.F_LINE ** 2
        nC = a + b / mats.C_LINE ** 2
        r = px.seidel([1 / r1, 1 / r2], [t], [1.0, n_d, 1.0], y=0.05,
                      u=0.0, ybar=0.0, ubar=0.01,
                      delta_n=[0.0, nF - nC, 0.0])
        pred = -r["CL"] / (r["n_out"] * r["u_out"] ** 2)
        assert pred < 0 and shift < 0
        assert shift == pytest.approx(pred, rel=0.10)


class TestTracerCrossCheck:
    def test_traced_focus_matches_abcd_bfd(self):
        """Mesh-trace a paraxial collimated beam through spherical_lens
        and require best-focus z == thickness + BFD(ABCD) to ~1%."""
        from lightpycl_tpu.analysis import best_focus
        from lightpycl_tpu.sources import CollimatedSource
        from lightpycl_tpu.tracer.config import TraceConfig
        from lightpycl_tpu.tracer.engine import Tracer

        props = px.system_properties(px.thick_lens(R1, R2, T, N))
        z_pred = T + props["bfd"]

        oe = L.optical_elements(n_segments=128, n_radial=64)
        lens = oe.spherical_lens(R1, R2, aperture=0.5, thickness=T, ior=N)
        wall = oe.sphere(radius=10.0, material="measure", name="wall")
        src = CollimatedSource(center=(0, 0, -0.4), direction=(0, 0, 1),
                               diameter=0.12, power=1.0, ray_count=512,
                               seed=7)
        res = Tracer(TraceConfig()).trace(src, [lens, wall],
                                          trace_iterations=3, capacity=2048)
        fwd = res.measured_dir[:, 2] > 0.5
        assert fwd.sum() > 300
        z_star, rms = best_focus(res.measured_pos[fwd], res.measured_dir[fwd],
                                 res.measured_power[fwd],
                                 z_range=(0.3, 1.6))[:2]
        assert z_star == pytest.approx(z_pred, rel=0.01)
