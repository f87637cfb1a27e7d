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
