"""Analytic (exact quadric) surfaces: geometry/analytic.py + ops/quadric.py.

Extension over the reference (SURVEY.md's upstream is triangle-mesh only):
conic caps / cylinder walls intersect EXACTLY on device, removing facet-cone
blur. Anchors: exact-paraboloid collimation, spherical-mirror longitudinal
aberration (closed form), lensmaker focal length, f64-oracle parity, and the
usual conservation ledger + multichip exactness.
"""

import numpy as np
import pytest

import lightpycl_tpu as L
from lightpycl_tpu import analysis
from lightpycl_tpu.sources import CollimatedSource, light_source
from lightpycl_tpu.tracer.engine import Tracer
from lightpycl_tpu.tracer.oracle import trace_oracle

oe = L.optical_elements(48, 12)


def _cons(res):
    assert res.power_conservation_error() < 1e-5


class TestExactSurfaces:
    def test_paraboloid_collimates_exactly(self):
        """k=-1 conic with r=2f is the exact paraboloid: a point source at
        the focus collimates to f32 noise — 100x below the mesh primitive's
        facet-limited divergence (test_tracer.py asserts < 0.05 there)."""
        m = L.analytic_mirror(1.0, 2.0, k=-1.0, reflectivity=0.9)
        dome = oe.hemisphere(radius=20.0, name="dome")
        ls = light_source(center=(0, 0, 0.5), direction=(0, 0, -1),
                          power=1.0, ray_count=4000, seed=5)
        res = Tracer().trace(ls, [m, dome], trace_iterations=4)
        _cons(res)
        assert res.ledger["measured"] == pytest.approx(0.9, abs=0.02)
        st = analysis.beam_statistics(res.measured_dir, res.measured_power)
        assert st["mean_direction"][2] > 0.99999
        assert st["rms_divergence"] < 1e-3

    def test_spherical_mirror_longitudinal_aberration(self):
        """Marginal ray at height h on a sphere of radius R crosses the axis
        at z = R - R / (2 cos theta), sin theta = h / R — the classic
        closed-form spherical aberration. Only an EXACT sphere reproduces
        it; a tessellated one smears the crossing over the facet cone."""
        R, h = 2.0, 0.4
        m = L.analytic_mirror(R, 1.6, k=0.0, reflectivity=1.0)
        det = L.analytic_disc(3.0, vertex=(0, 0, 1.4), name="det")
        ang = np.linspace(0.0, 2 * np.pi, 64, endpoint=False)
        o = np.stack([h * np.cos(ang), h * np.sin(ang),
                      np.full_like(ang, 1.3)], axis=1)
        d = np.tile([0.0, 0.0, -1.0], (64, 1))
        p = np.full(64, 1.0 / 64)
        res = Tracer().trace(
            None, [m, det], trace_iterations=3,
            rays=L.RayBatch.from_arrays(o, d, p, capacity=64))
        _cons(res)
        assert res.ledger["measured"] == pytest.approx(1.0, abs=1e-5)
        mp = np.asarray(res.measured_pos, np.float64)
        md = np.asarray(res.measured_dir, np.float64)
        tt = -(mp[:, 0] * md[:, 0] + mp[:, 1] * md[:, 1]) / (
            md[:, 0] ** 2 + md[:, 1] ** 2)
        z_cross = mp[:, 2] + tt * md[:, 2]
        theta = np.arcsin(h / R)
        z_exact = R - R / (2.0 * np.cos(theta))
        assert np.abs(z_cross - z_exact).max() < 2e-3

    def test_plano_convex_focal_length(self):
        """Paraxial beam through the analytic plano-convex singlet focuses
        at f = R / (n - 1) behind the curved (rear principal) surface."""
        lens = L.analytic_plano_convex_lens(0.5, 0.4, 0.05, ior=1.5)
        det = L.analytic_disc(3.0, vertex=(0, 0, 2.5), name="det")
        src = CollimatedSource(center=(0, 0, -0.5), direction=(0, 0, 1),
                               diameter=0.08, power=1.0, ray_count=512,
                               seed=3, sampling="hexapolar")
        res = Tracer().trace(src, [*lens, det], trace_iterations=8,
                             capacity=4096)
        _cons(res)
        # keep the primary transmitted beam: double-bounce Fresnel ghosts
        # carry 0.15% of the power but land ~0.5 off-axis and would drag
        # the power-weighted focus metric
        mw = np.asarray(res.measured_power)
        main = mw > 0.5 * mw.max()
        z_f, rms = analysis.best_focus(res.measured_pos[main],
                                       res.measured_dir[main], mw[main],
                                       z_range=(0.3, 2.5))[:2]
        assert z_f == pytest.approx(0.05 + 0.5 / 0.5, rel=0.02)
        assert rms < 1e-3

    def test_analytic_disc_measures_all(self):
        det = L.analytic_disc(5.0, vertex=(0, 0, 4.0), name="adet")
        src = CollimatedSource(center=(0, 0, 0), direction=(0, 0, 1),
                               diameter=0.6, power=1.0, ray_count=500,
                               seed=7)
        res = Tracer().trace(src, [det], trace_iterations=3)
        _cons(res)
        assert res.ledger["measured"] == pytest.approx(1.0, abs=1e-5)

    def test_annulus_aperture_stop(self):
        """r_min blocks the outer 3/4 of a uniform disc beam (area ratio
        (r_min/r_beam)^2 = 1/4 passes through the hole)."""
        stop = L.analytic_annulus(0.2, 1.0, vertex=(0, 0, 1.0))
        det = L.analytic_disc(5.0, vertex=(0, 0, 2.0), name="det")
        src = CollimatedSource(center=(0, 0, 0), direction=(0, 0, 1),
                               diameter=0.8, power=1.0, ray_count=8000,
                               seed=11)
        res = Tracer().trace(src, [stop, det], trace_iterations=3)
        _cons(res)
        assert res.ledger["measured"] == pytest.approx(0.25, abs=0.02)
        assert res.ledger["absorbed"] == pytest.approx(0.75, abs=0.02)

    def test_sphere_dome_catches_everything(self):
        dome = L.analytic_sphere(5.0, material="measure")
        ls = light_source(center=(0, 0, 0), direction=(0, 0, 1),
                          power=1.0, ray_count=2000, seed=1,
                          polar_max=np.pi)
        res = Tracer().trace(ls, dome, trace_iterations=3)
        _cons(res)
        assert res.ledger["measured"] == pytest.approx(1.0, abs=1e-4)


class TestOracleParity:
    def test_biconvex_lens_parity(self):
        """Full Fresnel-splitting trace through the 3-surface analytic
        singlet vs the independent f64 quadric oracle."""
        lens = L.analytic_biconvex_lens(1.0, 0.8, 0.2, ior=1.5)
        det = oe.disc(radius=5.0, center=(0, 0, 4.0), material="measure",
                      name="det")
        src = CollimatedSource(center=(0, 0, -1.0), direction=(0, 0, 1),
                               diameter=0.6, power=1.0, ray_count=2000,
                               seed=7)
        o, d, p = src.sample()
        res = Tracer().trace(
            src, [*lens, det], trace_iterations=8, capacity=16000,
            rays=L.RayBatch.from_arrays(o, d, p, capacity=16000))
        _cons(res)
        orc = trace_oracle([*lens, det], o, d, p, trace_iterations=8)
        assert res.ledger["measured"] == pytest.approx(
            orc["measured"], rel=1.5e-3)
        for k in ("absorbed", "escaped"):
            assert res.ledger[k] == pytest.approx(orc[k], abs=2e-3)
        # spot size (rms radius on the detector) agrees too
        mp, mw = np.asarray(res.measured_pos), np.asarray(res.measured_power)
        r_dev = np.sqrt((mw * (mp[:, 0] ** 2 + mp[:, 1] ** 2)).sum()
                        / mw.sum())
        op, ow = orc["measured_pos"], orc["measured_power"]
        r_orc = np.sqrt((ow * (op[:, 0] ** 2 + op[:, 1] ** 2)).sum()
                        / ow.sum())
        assert r_dev == pytest.approx(r_orc, rel=5e-3)

    def test_mixed_mesh_and_analytic_parity(self):
        """Mesh lens + analytic detector in ONE scene: the triangle and
        quadric passes merge per-ray; oracle agrees."""
        lens = oe.spherical_lens(1.0, -1.0, 0.8, 0.2, ior=1.5)
        det = L.analytic_disc(5.0, vertex=(0, 0, 4.0), name="det")
        src = CollimatedSource(center=(0, 0, -1.0), direction=(0, 0, 1),
                               diameter=0.6, power=1.0, ray_count=1500,
                               seed=13)
        o, d, p = src.sample()
        res = Tracer().trace(
            src, [lens, det], trace_iterations=8, capacity=12000,
            rays=L.RayBatch.from_arrays(o, d, p, capacity=12000))
        _cons(res)
        orc = trace_oracle([lens, det], o, d, p, trace_iterations=8)
        assert res.ledger["measured"] == pytest.approx(
            orc["measured"], rel=1.5e-3)


class TestTransformsAndExport:
    def test_translate_matches_direct_construction(self):
        a = L.analytic_disc(2.0, vertex=(0, 0, 3.0), name="d")
        b = L.analytic_disc(2.0, vertex=(0, 0, 0), name="d").translate(
            (0, 0, 3.0))
        np.testing.assert_allclose(a.quad_vertex, b.quad_vertex)
        np.testing.assert_allclose(a.quad_frame, b.quad_frame)
        np.testing.assert_allclose(a.quad_abgd, b.quad_abgd)

    def test_rotate_matches_direct_axis(self):
        a = L.conic_surface(0.5, -1.0, r_max=1.0, axis=(1, 0, 0))
        b = L.conic_surface(0.5, -1.0, r_max=1.0, axis=(0, 0, 1)).rotate(
            (0, 1, 0), np.pi / 2)
        # same implicit surface: z_local axis (frame row 2) must agree
        np.testing.assert_allclose(a.quad_frame[2], b.quad_frame[2],
                                   atol=1e-12)
        np.testing.assert_allclose(a.quad_abgd, b.quad_abgd)
        np.testing.assert_allclose(a.quad_vertex, b.quad_vertex, atol=1e-12)

    def test_uniform_scale_scales_curvature(self):
        s = L.conic_surface(1.0, 0.0, r_max=0.5).scale(2.0)
        np.testing.assert_allclose(s.quad_abgd, [0.5, 0.5, -2.0, 0.0])
        np.testing.assert_allclose(s.quad_rlim, [0.0, 1.0])
        with pytest.raises(ValueError):
            L.conic_surface(1.0, 0.0, r_max=0.5).scale((1.0, 2.0, 1.0))

    def test_to_mesh_matches_sag(self):
        surf = L.conic_surface(0.8, -0.5, r_max=0.9, vertex=(1, 2, 3),
                               axis=(0, 1, 0))
        mesh = surf.to_mesh(n_segments=32, n_radial=16)
        v_local = (np.asarray(mesh.vertices) - surf.quad_vertex) \
            @ surf.quad_frame.T
        r = np.hypot(v_local[:, 0], v_local[:, 1])
        c, k = 0.8, -0.5
        sag = c * r**2 / (1 + np.sqrt(1 - (1 + k) * c**2 * r**2))
        np.testing.assert_allclose(v_local[:, 2], sag, atol=1e-9)


class TestEngineIntegration:
    def _scene(self):
        lens = L.analytic_biconvex_lens(1.0, 0.8, 0.2, ior=1.5)
        det = L.analytic_disc(5.0, vertex=(0, 0, 4.0), name="det")
        src = CollimatedSource(center=(0, 0, -1.0), direction=(0, 0, 1),
                               diameter=0.6, power=1.0, ray_count=512,
                               seed=7)
        return [*lens, det], src

    def test_multichip_matches_device(self):
        els, src = self._scene()
        tr = Tracer()
        r_d = tr.trace(src, els, trace_iterations=6, mode="device",
                       capacity=4096)
        r_m = tr.trace(src, els, trace_iterations=6, mode="multichip",
                       capacity=4096)
        for k in ("measured", "absorbed", "escaped", "culled"):
            assert r_m.ledger[k] == pytest.approx(r_d.ledger[k], rel=1e-5,
                                                  abs=1e-6)

    def test_mesh2d_refused(self):
        els, src = self._scene()
        with pytest.raises(ValueError, match="analytic"):
            Tracer().trace(src, els, trace_iterations=4, mode="mesh2d")

    def test_recompile_across_quad_counts(self):
        """Regression: a Q=1 host trace followed by a Q=3 host trace in the
        same process used to die with 'Execution supplied N buffers but
        compiled program expected N+3' — module-level jnp constants
        (ops/quadric._INF) were lifted into the jaxpr as captured-constant
        executable inputs that the donation fastpath mis-bound."""
        src = CollimatedSource(center=(0, 0, -1.0), direction=(0, 0, 1),
                               diameter=0.6, power=1.0, ray_count=256,
                               seed=7)
        tr = Tracer()
        adet = L.analytic_disc(5.0, vertex=(0, 0, 4.0), name="adet")
        r1 = tr.trace(src, [adet], trace_iterations=3, mode="host")
        assert r1.ledger["measured"] == pytest.approx(1.0, abs=1e-5)
        lens = L.analytic_biconvex_lens(1.0, 0.8, 0.2, ior=1.5)
        r2 = tr.trace(src, [*lens, adet.copy()], trace_iterations=6,
                      mode="host", capacity=2048)
        _cons(r2)
        assert r2.ledger["measured"] > 0.8
