"""Zemax .zmx sequential-prescription import (io/zmx.py).

Anchors:
- parser round trip: save_zmx -> load_zmx preserves every field read;
  the UTF-16 encoding OpticStudio emits decodes identically to ASCII.
- paraxial fold: zmx_paraxial of a thick singlet matches
  paraxial.thick_lens + system_properties exactly (independent compose).
- traced scene: a collimated beam through an imported biconvex BK7
  singlet focuses at the prescription's paraxial BFD (image plane
  placed there from the .zmx thicknesses alone).
- cemented doublets build as two elements with the documented air gap.
"""

import math

import numpy as np
import pytest

import lightpycl_tpu as L
from lightpycl_tpu import materials, paraxial
from lightpycl_tpu.analysis import best_focus
from lightpycl_tpu.io import (load_zmx, save_zmx, zmx_paraxial, zmx_to_scene)
from lightpycl_tpu.io.zmx import ZmxPrescription, ZmxSurface
from lightpycl_tpu.sources import CollimatedSource
from lightpycl_tpu.tracer.config import TraceConfig
from lightpycl_tpu.tracer.engine import Tracer

WL = materials.D_LINE
N_BK7 = float(materials.sellmeier_index(WL, "N-BK7"))

SINGLET = """\
VERS 130711 25 06800
MODE SEQ
NAME biconvex test singlet
UNIT MM X W X CM MR CPMM
ENPD 10
WAVM 1 0.5876 1
PWAV 1
SURF 0
  TYPE STANDARD
  CURV 0.0
  DISZ INFINITY
SURF 1
  TYPE STANDARD
  COMM front
  CURV {c1}
  DISZ 5
  GLAS N-BK7 0 0 1.5168 64.17
  DIAM 8 1 0 0 1 ""
SURF 2
  TYPE STANDARD
  CURV {c2}
  DISZ {bfd}
  DIAM 8 1 0 0 1 ""
SURF 3
  TYPE STANDARD
  CURV 0.0
  DISZ 0
  DIAM 3 1 0 0 1 ""
"""


def _singlet_text(r1=30.0, r2=-30.0, thick=5.0):
    M = paraxial.thick_lens(r1, r2, thick, N_BK7)
    bfd = paraxial.system_properties(M)["bfd"]
    return SINGLET.format(c1=1.0 / r1, c2=1.0 / r2, bfd=bfd), bfd


class TestParse:
    def test_fields(self, tmp_path):
        text, bfd = _singlet_text()
        p = tmp_path / "singlet.zmx"
        p.write_text(text)
        presc = load_zmx(p)
        assert presc.name == "biconvex test singlet"
        assert presc.unit == "MM"
        assert presc.enpd == 10
        assert presc.wavelengths_um == [0.5876]
        assert presc.primary_wavelength_um == 0.5876
        assert len(presc.surfaces) == 4
        s1, s2 = presc.surfaces[1], presc.surfaces[2]
        assert s1.glass == "N-BK7" and s1.nd == 1.5168 and s1.vd == 64.17
        assert s1.radius == pytest.approx(30.0)
        assert s1.disz == 5 and s1.semi_diam == 8 and s1.comment == "front"
        assert s2.glass is None
        assert s2.radius == pytest.approx(-30.0)
        assert s2.disz == pytest.approx(bfd)
        assert math.isinf(presc.surfaces[0].disz)

    def test_utf16(self, tmp_path):
        text, _ = _singlet_text()
        p = tmp_path / "singlet_utf16.zmx"
        p.write_bytes(text.encode("utf-16"))  # emits the BOM
        presc = load_zmx(p)
        assert presc.surfaces[1].glass == "N-BK7"
        assert presc.surfaces[1].radius == pytest.approx(30.0)

    def test_nonseq_raises(self, tmp_path):
        p = tmp_path / "nsc.zmx"
        p.write_text("MODE NSC\nSURF 0\n  DISZ 0\n")
        with pytest.raises(ValueError, match="sequential"):
            load_zmx(p)

    def test_unsupported_type_raises(self, tmp_path):
        text, _ = _singlet_text()
        p = tmp_path / "grid.zmx"
        p.write_text(text.replace("TYPE STANDARD", "TYPE GRID_SAG", 2))
        with pytest.raises(ValueError, match="GRID_SAG"):
            load_zmx(p)

    def test_roundtrip(self, tmp_path):
        text, _ = _singlet_text()
        p = tmp_path / "a.zmx"
        p.write_text(text)
        presc = load_zmx(p)
        q = tmp_path / "b.zmx"
        save_zmx(q, presc)
        again = load_zmx(q)
        assert again.name == presc.name
        assert again.enpd == presc.enpd
        assert again.wavelengths_um == presc.wavelengths_um
        for a, b in zip(presc.surfaces, again.surfaces):
            assert (a.curv, a.disz, a.glass, a.semi_diam, a.conic,
                    a.is_stop, a.parm) == \
                   (b.curv, b.disz, b.glass, b.semi_diam, b.conic,
                    b.is_stop, b.parm)


class TestParaxial:
    def test_singlet_matches_thick_lens(self, tmp_path):
        text, bfd = _singlet_text()
        p = tmp_path / "s.zmx"
        p.write_text(text)
        props = zmx_paraxial(load_zmx(p))
        M = paraxial.thick_lens(30.0, -30.0, 5.0, N_BK7)
        ref = paraxial.system_properties(M)
        assert props["efl"] == pytest.approx(ref["efl"], rel=1e-12)
        assert props["bfd"] == pytest.approx(bfd, rel=1e-12)

    def test_inline_nd_vd_fallback(self, tmp_path):
        # unknown glass name but (n_d, V_d) on the GLAS line: Cauchy model
        text, _ = _singlet_text()
        p = tmp_path / "s.zmx"
        p.write_text(text.replace("GLAS N-BK7 0 0", "GLAS MYGLASS 0 0"))
        props = zmx_paraxial(load_zmx(p))
        a, b = materials.glass(1.5168, 64.17)
        n = a + b / WL**2
        ref = paraxial.system_properties(
            paraxial.thick_lens(30.0, -30.0, 5.0, n))
        assert props["efl"] == pytest.approx(ref["efl"], rel=1e-12)

    def test_unknown_glass_raises(self, tmp_path):
        text, _ = _singlet_text()
        p = tmp_path / "s.zmx"
        p.write_text(text.replace("GLAS N-BK7 0 0 1.5168 64.17",
                                  "GLAS UNOBTAINIUM"))
        with pytest.raises(ValueError, match="UNOBTAINIUM"):
            zmx_paraxial(load_zmx(p))

    def test_override(self, tmp_path):
        text, _ = _singlet_text()
        p = tmp_path / "s.zmx"
        p.write_text(text.replace("GLAS N-BK7 0 0 1.5168 64.17",
                                  "GLAS UNOBTAINIUM"))
        props = zmx_paraxial(load_zmx(p),
                             glass_overrides={"UNOBTAINIUM": 1.7})
        ref = paraxial.system_properties(
            paraxial.thick_lens(30.0, -30.0, 5.0, 1.7))
        assert props["efl"] == pytest.approx(ref["efl"], rel=1e-12)


class TestScene:
    def test_elements_and_positions(self, tmp_path):
        text, bfd = _singlet_text()
        p = tmp_path / "s.zmx"
        p.write_text(text)
        elements, info = zmx_to_scene(p)
        names = [e.name for e in elements]
        assert names == ["front", "image"]
        lens, image = elements
        assert lens.material == L.Material.REFRACTIVE
        # n(wl) must be the exact Sellmeier index at the primary wavelength
        n_traced = (lens.ior + lens.dispersion_b / WL**2
                    + lens.dispersion_c / WL**4)
        assert n_traced == pytest.approx(N_BK7, abs=1e-9)
        assert lens.dispersion_b > 0  # catalog dispersion attached
        assert info["z_image"] == pytest.approx(5.0 + bfd)
        assert dict(info["positions"])["image"] == info["z_image"]
        assert image.material == L.Material.MEASURE

    def test_traced_focus_matches_paraxial_bfd(self, tmp_path):
        text, bfd = _singlet_text()
        p = tmp_path / "s.zmx"
        p.write_text(text)
        elements, info = zmx_to_scene(p, n_segments=128, n_radial=64,
                                      detector_scale=2.0)
        src = CollimatedSource(center=(0, 0, -5.0), direction=(0, 0, 1),
                               diameter=5.0, power=1.0, ray_count=2048,
                               seed=7)
        res = Tracer(TraceConfig()).trace(src, elements, trace_iterations=4,
                                          capacity=8192)
        fwd = res.measured_dir[:, 2] > 0.5
        assert res.measured_power[fwd].sum() > 0.85  # two Fresnel surfaces
        z_best, rms = best_focus(res.measured_pos[fwd],
                                 res.measured_dir[fwd],
                                 res.measured_power[fwd],
                                 z_range=(info["z_image"] - 10,
                                          info["z_image"] + 10))
        # spherical aberration pulls best focus slightly short of paraxial
        assert z_best == pytest.approx(info["z_image"], abs=1.0)
        assert rms < 0.15

    def test_stop_becomes_annulus(self, tmp_path):
        text, bfd = _singlet_text()
        stop = ("SURF 1\n  TYPE STANDARD\n  STOP\n  CURV 0.0\n  DISZ 2\n"
                "  DIAM 4 1 0 0 1 \"\"\n")
        text = text.replace("SURF 1\n", stop + "SURF 9\n").replace(
            "SURF 9", "SURF 2", 1)
        p = tmp_path / "s.zmx"
        p.write_text(text)
        elements, info = zmx_to_scene(p)
        assert elements[0].name.startswith("stop")
        assert elements[0].material == L.Material.TERMINATOR
        # lens front vertex moved back by the stop's DISZ
        assert dict(info["positions"])["front"] == pytest.approx(2.0)

    def test_cemented_doublet_gap_and_warning(self, tmp_path):
        r1, r2, r3 = 20.0, -15.0, -60.0
        t1, t2 = 4.0, 2.0
        text = "\n".join([
            "MODE SEQ", "UNIT MM X W X CM MR CPMM", "WAVM 1 0.5876 1",
            "SURF 0", "  TYPE STANDARD", "  DISZ INFINITY",
            "SURF 1", "  TYPE STANDARD", f"  CURV {1/r1}", f"  DISZ {t1}",
            "  GLAS N-BK7", "  DIAM 6 1 0 0 1 \"\"",
            "SURF 2", "  TYPE STANDARD", f"  CURV {1/r2}", f"  DISZ {t2}",
            "  GLAS F2", "  DIAM 6 1 0 0 1 \"\"",
            "SURF 3", "  TYPE STANDARD", f"  CURV {1/r3}", "  DISZ 30",
            "  DIAM 6 1 0 0 1 \"\"",
            "SURF 4", "  TYPE STANDARD", "  DISZ 0", "  DIAM 3 1 0 0 1 \"\"",
        ])
        p = tmp_path / "doublet.zmx"
        p.write_text(text)
        elements, info = zmx_to_scene(p, cement_gap=0.01)
        names = [e.name for e in elements]
        assert names == ["lens_s1", "lens_s2", "image"]
        pos = dict(info["positions"])
        assert pos["lens_s2"] == pytest.approx(t1 + 0.01)
        assert info["z_image"] == pytest.approx(t1 + 0.01 + t2 + 30)
        assert len(info["warnings"]) == 1
        assert "cemented" in info["warnings"][0]
        # the flint carries F2 dispersion, distinct from the crown's
        assert elements[1].dispersion_b > elements[0].dispersion_b

    def test_cemented_doublet_traces_to_paraxial_focus(self, tmp_path):
        """r5 regression: the DEFAULT cement gap must exceed the
        tracer's eps self-intersection guard. A thinner gap makes the
        ray exiting the crown find the flint's front surface at
        t < eps, the refraction is silently skipped, and the bundle
        focuses at a completely wrong plane (caught live: best focus
        19.8 instead of 44.5 on the CODE V achromat example)."""
        r1, r2, r3 = 20.0, -15.0, -60.0
        t1, t2 = 4.0, 2.0
        n1 = N_BK7
        n2 = float(materials.sellmeier_index(WL, "F2"))
        M = paraxial.compose(
            paraxial.refraction(r1, 1.0, n1),
            paraxial.propagation(t1, n1),
            paraxial.refraction(r2, n1, n2),
            paraxial.propagation(t2, n2),
            paraxial.refraction(r3, n2, 1.0))
        bfd = paraxial.system_properties(M)["bfd"]
        text = "\n".join([
            "MODE SEQ", "UNIT MM X W X CM MR CPMM", "WAVM 1 0.5876 1",
            "SURF 0", "  TYPE STANDARD", "  DISZ INFINITY",
            "SURF 1", "  TYPE STANDARD", f"  CURV {1/r1}", f"  DISZ {t1}",
            "  GLAS N-BK7", "  DIAM 6 1 0 0 1 \"\"",
            "SURF 2", "  TYPE STANDARD", f"  CURV {1/r2}", f"  DISZ {t2}",
            "  GLAS F2", "  DIAM 6 1 0 0 1 \"\"",
            "SURF 3", "  TYPE STANDARD", f"  CURV {1/r3}",
            f"  DISZ {bfd:.9g}", "  DIAM 6 1 0 0 1 \"\"",
            "SURF 4", "  TYPE STANDARD", "  DISZ 0", "  DIAM 3 1 0 0 1 \"\"",
        ])
        p = tmp_path / "doublet.zmx"
        p.write_text(text)
        elements, info = zmx_to_scene(p, n_segments=96, n_radial=48,
                                      detector_scale=3.0)
        from lightpycl_tpu.io.zmx import ZmxSurface  # noqa: F401
        # default gap: above the eps guard, still metrologically tiny
        gap = dict(info["positions"])["lens_s2"] - t1
        assert 1e-4 < gap < 1e-2
        src = CollimatedSource(center=(0, 0, -5.0), direction=(0, 0, 1),
                               diameter=4.0, power=1.0, ray_count=2048,
                               seed=4, sampling="halton")
        res = Tracer(TraceConfig()).trace(src, elements,
                                          trace_iterations=6, capacity=8192)
        fwd = res.measured_dir[:, 2] > 0.5
        w = res.measured_power[fwd]
        # two glass-air pairs (~0.957^2 BK7, ~0.945^2 F2 at these n's)
        assert w.sum() > 0.75
        z_best, rms = best_focus(res.measured_pos[fwd],
                                 res.measured_dir[fwd], w,
                                 z_range=(info["z_image"] - 10,
                                          info["z_image"] + 10))
        assert z_best == pytest.approx(info["z_image"], abs=1.0)
        assert rms < 0.2

    def test_even_asphere(self, tmp_path):
        text = "\n".join([
            "MODE SEQ", "WAVM 1 0.5876 1",
            "SURF 0", "  TYPE STANDARD", "  DISZ INFINITY",
            "SURF 1", "  TYPE EVENASPH", "  CURV 0", "  DISZ 3",
            "  GLAS N-BK7", "  DIAM 5 1 0 0 1 \"\"",
            "SURF 2", "  TYPE EVENASPH", "  CURV -0.05", "  CONI -2.25",
            "  PARM 2 1e-5", "  PARM 3 -2e-7", "  DISZ 40",
            "  DIAM 5 1 0 0 1 \"\"",
            "SURF 3", "  TYPE STANDARD", "  DISZ 0", "  DIAM 3 1 0 0 1 \"\"",
        ])
        p = tmp_path / "asph.zmx"
        p.write_text(text)
        presc = load_zmx(p)
        assert presc.surfaces[2].conic == -2.25
        assert presc.surfaces[2].parm == {2: 1e-5, 3: -2e-7}
        elements, _ = zmx_to_scene(p)
        # built through aspheric_lens: identical to calling it directly
        oe = L.optical_elements()
        direct = oe.aspheric_lens(None, -20.0, aperture=10.0, thickness=3.0,
                                  ior=elements[0].ior, k2=-2.25,
                                  coeffs2=(1e-5, -2e-7))
        np.testing.assert_allclose(elements[0].vertices, direct.vertices,
                                   atol=1e-12)

    def test_parm1_raises(self, tmp_path):
        text = "\n".join([
            "MODE SEQ",
            "SURF 0", "  TYPE STANDARD", "  DISZ INFINITY",
            "SURF 1", "  TYPE EVENASPH", "  CURV 0.02", "  PARM 1 1e-3",
            "  DISZ 3", "  GLAS N-BK7", "  DIAM 5 1 0 0 1 \"\"",
            "SURF 2", "  TYPE STANDARD", "  DISZ 40", "  DIAM 5 1 0 0 1 \"\"",
            "SURF 3", "  TYPE STANDARD", "  DISZ 0", "  DIAM 3 1 0 0 1 \"\"",
        ])
        p = tmp_path / "p1.zmx"
        p.write_text(text)
        with pytest.raises(ValueError, match="PARM 1"):
            zmx_to_scene(p)

    def test_mirror_element(self, tmp_path):
        text = "\n".join([
            "MODE SEQ", "WAVM 1 0.5876 1",
            "SURF 0", "  TYPE STANDARD", "  DISZ INFINITY",
            "SURF 1", "  TYPE STANDARD", "  CURV 0.01", "  DISZ -50",
            "  GLAS MIRROR", "  DIAM 12 1 0 0 1 \"\"",
            "SURF 2", "  TYPE STANDARD", "  DISZ 0", "  DIAM 5 1 0 0 1 \"\"",
        ])
        p = tmp_path / "mirror.zmx"
        p.write_text(text)
        presc = load_zmx(p)
        assert presc.surfaces[1].is_mirror
        elements, info = zmx_to_scene(p, detector=False)
        assert elements[0].material == L.Material.MIRROR
        assert elements[0].name == "mirror_s1"
        # CURV 0.01 -> R=+100 in Zemax coords: center of curvature past
        # the vertex, convex toward the incoming +z light -> f = -R/2
        props = zmx_paraxial(presc)
        assert props["efl"] == pytest.approx(-50.0)

    def test_glass_into_image_raises(self, tmp_path):
        text = "\n".join([
            "MODE SEQ",
            "SURF 0", "  TYPE STANDARD", "  DISZ INFINITY",
            "SURF 1", "  TYPE STANDARD", "  CURV 0.02", "  DISZ 3",
            "  GLAS N-BK7", "  DIAM 5 1 0 0 1 \"\"",
            "SURF 2", "  TYPE STANDARD", "  DISZ 0", "  DIAM 3 1 0 0 1 \"\"",
        ])
        p = tmp_path / "bad.zmx"
        p.write_text(text)
        with pytest.raises(ValueError, match="image"):
            zmx_to_scene(p)


NEWTONIAN = "\n".join([
    "MODE SEQ", "NAME newtonian f/5 prime focus",
    "UNIT MM X W X CM MR CPMM", "WAVM 1 0.5876 1", "PWAV 1",
    "SURF 0", "  TYPE STANDARD", "  DISZ INFINITY",
    # parabolic primary, f = 1000 (R = -2000, k = -1), light returns 1000
    "SURF 1", "  TYPE STANDARD", "  COMM primary", "  CURV -0.0005",
    "  CONI -1", "  DISZ -1000", "  GLAS MIRROR", "  DIAM 100 1 0 0 1 \"\"",
    "SURF 2", "  TYPE STANDARD", "  DISZ 0", "  DIAM 2 1 0 0 1 \"\"",
])

# classical Cassegrain: f1=100 parabolic primary, hyperbolic secondary
# 60 before it (m = 3): EFL = 300, back focus (secondary->image) = 120,
# image 60 behind the primary vertex. f2 = s s'/(s - s') with s = 40,
# s' = 120 -> f2 = -60, R2 = -120; k2 = -((m+1)/(m-1))^2 = -4.
CASSEGRAIN = "\n".join([
    "MODE SEQ", "NAME classical cassegrain m=3",
    "UNIT MM X W X CM MR CPMM", "WAVM 1 0.5876 1", "PWAV 1",
    "SURF 0", "  TYPE STANDARD", "  DISZ INFINITY",
    "SURF 1", "  TYPE STANDARD", "  COMM primary", "  CURV -0.005",
    "  CONI -1", "  DISZ -60", "  GLAS MIRROR",
    "  DIAM 25 1 0 0 1 \"\"", "  OBSC 0 9",
    "SURF 2", "  TYPE STANDARD", "  COMM secondary",
    f"  CURV {-1.0 / 120.0:.17g}", "  CONI -4",
    "  DISZ 120", "  GLAS MIRROR", "  DIAM 11 1 0 0 1 \"\"",
    "SURF 3", "  TYPE STANDARD", "  DISZ 0", "  DIAM 2 1 0 0 1 \"\"",
])


class TestCatadioptric:
    """Telescope prescriptions: mirror fold in the paraxial layer and
    conic mirrors (with the primary's hole) in the traced scene."""

    def test_newtonian_paraxial(self, tmp_path):
        p = tmp_path / "newt.zmx"
        p.write_text(NEWTONIAN)
        props = zmx_paraxial(load_zmx(p))
        assert props["efl"] == pytest.approx(1000.0)
        assert props["bfd"] == pytest.approx(1000.0)  # along the path

    def test_newtonian_traces_to_focus(self, tmp_path):
        p = tmp_path / "newt.zmx"
        p.write_text(NEWTONIAN)
        elements, info = zmx_to_scene(p, n_segments=128, n_radial=64,
                                      detector_scale=3.0)
        assert info["z_image"] == pytest.approx(-1000.0)  # lab frame
        src = CollimatedSource(center=(0, 0, -1500.0), direction=(0, 0, 1),
                               diameter=150.0, power=1.0, ray_count=4096,
                               seed=11, sampling="halton")
        res = Tracer(TraceConfig()).trace(src, elements, trace_iterations=3,
                                          capacity=8192)
        back = res.measured_dir[:, 2] < -0.5  # focused return beam only
        w = res.measured_power[back]
        # losses: 0.98 reflectivity, (6/75)^2 detector shadow
        assert w.sum() > 0.96 * 0.98
        z_best, rms = best_focus(res.measured_pos[back],
                                 res.measured_dir[back], w,
                                 z_range=(-1010.0, -990.0))
        assert z_best == pytest.approx(-1000.0, abs=1.0)
        assert rms < 1.0  # parabola: residual is tessellation blur only

    def test_cassegrain_paraxial(self, tmp_path):
        p = tmp_path / "cass.zmx"
        p.write_text(CASSEGRAIN)
        props = zmx_paraxial(load_zmx(p))
        assert props["efl"] == pytest.approx(300.0)
        assert props["bfd"] == pytest.approx(120.0)  # secondary -> image

    def test_cassegrain_traces_to_focus(self, tmp_path):
        p = tmp_path / "cass.zmx"
        p.write_text(CASSEGRAIN)
        presc = load_zmx(p)
        assert presc.surfaces[1].obsc == 9.0
        elements, info = zmx_to_scene(p, n_segments=256, n_radial=96,
                                      detector_scale=5.0)
        assert any("central hole" in s for s in info["warnings"])
        assert info["z_image"] == pytest.approx(60.0)  # behind the primary
        src = CollimatedSource(center=(0, 0, -150.0), direction=(0, 0, 1),
                               diameter=50.0, power=1.0, ray_count=2048,
                               seed=13, sampling="halton")
        res = Tracer(TraceConfig()).trace(src, elements, trace_iterations=4,
                                          capacity=8192)
        fwd = res.measured_dir[:, 2] > 0.5  # through the hole to the image
        w = res.measured_power[fwd]
        # annulus 11..25 of the 25-semi beam, two 0.98 reflections
        frac = 1.0 - (11.0 / 25.0) ** 2
        assert w.sum() == pytest.approx(frac * 0.98**2, rel=0.05)
        z_best, rms = best_focus(res.measured_pos[fwd],
                                 res.measured_dir[fwd], w,
                                 z_range=(40.0, 80.0))
        # residual is the primary's facet slope error magnified m=3
        assert z_best == pytest.approx(60.0, abs=2.0)
        assert rms < 1.0

    def test_hole_override_kwarg(self, tmp_path):
        p = tmp_path / "cass.zmx"
        p.write_text(CASSEGRAIN)
        elements, info = zmx_to_scene(p, holes={1: 7.0}, detector=False)
        primary = elements[0]
        r = np.linalg.norm(primary.vertices[:, :2], axis=1)
        assert r.min() == pytest.approx(7.0, abs=1e-6)
        assert not any("OBSC" in s for s in info["warnings"])


class TestParserRobustness:
    def test_malformed_numeric_names_line(self, tmp_path):
        text = "\n".join([
            "MODE SEQ",
            "SURF 0", "  TYPE STANDARD", "  DISZ INFINITY",
            "SURF 1", "  TYPE STANDARD", "  CURV oops", "  DISZ 3",
            "SURF 2", "  TYPE STANDARD", "  DISZ 0",
        ])
        p = tmp_path / "bad.zmx"
        p.write_text(text)
        with pytest.raises(ValueError, match=r"bad\.zmx:7.*CURV"):
            load_zmx(p)

    def test_empty_enpd_raises(self, tmp_path):
        text = "MODE SEQ\nENPD\nSURF 0\n  DISZ INFINITY\n"
        p = tmp_path / "bad.zmx"
        p.write_text(text)
        with pytest.raises(ValueError, match="ENPD"):
            load_zmx(p)

    def test_wavm_placeholder_slots_trimmed(self, tmp_path):
        lines = ["MODE SEQ",
                 "WAVM 1 0.486 1", "WAVM 2 0.588 1", "WAVM 3 0.656 1"]
        lines += [f"WAVM {k} 0.55 0" for k in range(4, 25)]
        lines += ["PWAV 2",
                  "SURF 0", "  TYPE STANDARD", "  DISZ INFINITY",
                  "SURF 1", "  TYPE STANDARD", "  DISZ 3",
                  "SURF 2", "  TYPE STANDARD", "  DISZ 0"]
        p = tmp_path / "w.zmx"
        p.write_text("\n".join(lines))
        presc = load_zmx(p)
        assert presc.wavelengths_um == [0.486, 0.588, 0.656]
        assert presc.primary_wavelength_um == 0.588

    def test_legacy_wavl_parsed(self, tmp_path):
        text = "\n".join([
            "MODE SEQ", "WAVL 0.486 0.588 0.656", "WWGT 1 1 1", "PWAV 3",
            "SURF 0", "  TYPE STANDARD", "  DISZ INFINITY",
            "SURF 1", "  TYPE STANDARD", "  DISZ 3",
            "SURF 2", "  TYPE STANDARD", "  DISZ 0",
        ])
        p = tmp_path / "w.zmx"
        p.write_text(text)
        presc = load_zmx(p)
        assert presc.wavelengths_um == [0.486, 0.588, 0.656]
        assert presc.primary_wavelength_um == 0.656


class TestManginGuard:
    def test_mangin_refused_loudly(self, tmp_path):
        """A glass run ending on a MIRROR surface (Mangin) would build
        the reflecting surface coincident with the lens back face — eps
        makes the trace order undefined, so the builder refuses (r5)."""
        # full sequential Mangin: in, silvered back, return pass out
        text = "\n".join([
            "MODE SEQ", "WAVM 1 0.5876 1",
            "SURF 0", "  TYPE STANDARD", "  DISZ INFINITY",
            "SURF 1", "  TYPE STANDARD", "  CURV 0.02", "  DISZ 3",
            "  GLAS N-BK7", "  DIAM 6 1 0 0 1 \"\"",
            "SURF 2", "  TYPE STANDARD", "  CURV 0.01", "  DISZ -3",
            "  GLAS MIRROR", "  DIAM 6 1 0 0 1 \"\"",
            "SURF 3", "  TYPE STANDARD", "  CURV 0.02", "  DISZ -20",
            "  DIAM 6 1 0 0 1 \"\"",
            "SURF 4", "  TYPE STANDARD", "  DISZ 0", "  DIAM 3 1 0 0 1 \"\"",
        ])
        p = tmp_path / "mangin.zmx"
        p.write_text(text)
        with pytest.raises(ValueError, match="Mangin"):
            zmx_to_scene(p)
        # the paraxial fold handles it fine (P = 2n/R at the mirror;
        # the return refraction through surface 3 closes back to air)
        props = zmx_paraxial(load_zmx(p))
        assert np.isfinite(props["efl"])
