"""CODE V .seq sequence-file import (io/seq.py).

Anchors (same physics chain as tests/test_zmx.py — the .seq loader maps
onto the shared ZmxPrescription, so the paraxial fold and scene build
are the already-anchored zmx layers):
- a BK7 singlet sequence folds to exactly paraxial.thick_lens and
  traces to its BFD;
- a cemented doublet builds two elements with the documented air gap;
- REFL surfaces become mirrors (paraxial fold included);
- CODE V conventions honored: wavelengths in nm, radius 0/INF = flat,
  NBK7_SCHOTT-style glass names, A..D asphere letters -> r^4..r^10.
"""

import numpy as np
import pytest

import lightpycl_tpu as L
from lightpycl_tpu import materials, paraxial
from lightpycl_tpu.analysis import best_focus
from lightpycl_tpu.io import load_seq, seq_paraxial, seq_to_scene
from lightpycl_tpu.sources import CollimatedSource
from lightpycl_tpu.tracer.config import TraceConfig
from lightpycl_tpu.tracer.engine import Tracer

WL = materials.D_LINE
N_BK7 = float(materials.sellmeier_index(WL, "N-BK7"))


def _singlet_seq(r1=30.0, r2=-30.0, thick=5.0):
    M = paraxial.thick_lens(r1, r2, thick, N_BK7)
    bfd = paraxial.system_properties(M)["bfd"]
    text = "\n".join([
        "LEN",
        "TITLE 'codev biconvex singlet'",
        "DIM M",
        "EPD 10",
        "WL 587.6",
        "SO 0 INFINITY",
        f"S {r1} {thick} NBK7_SCHOTT",
        "  STO; CIR 8",
        f"S {r2} {bfd:.12g}",
        "  CIR 8",
        "SI 0 0",
        "  CIR 3",
        "GO",
    ])
    return text, bfd


class TestParse:
    def test_fields(self, tmp_path):
        text, bfd = _singlet_seq()
        p = tmp_path / "singlet.seq"
        p.write_text(text)
        presc = load_seq(p)
        assert presc.name == "codev biconvex singlet"
        assert presc.unit == "MM"
        assert presc.enpd == 10
        assert presc.wavelengths_um == [0.5876]  # nm -> um
        assert len(presc.surfaces) == 4
        s1, s2 = presc.surfaces[1], presc.surfaces[2]
        assert s1.glass == "N-BK7"  # NBK7_SCHOTT normalized
        assert s1.radius == pytest.approx(30.0)
        assert s1.is_stop and s1.semi_diam == 8
        assert s2.glass is None
        assert s2.disz == pytest.approx(bfd)
        assert presc.surfaces[0].curv == 0.0  # radius 0 = flat

    def test_comments_and_unknown_command(self, tmp_path):
        p = tmp_path / "bad.seq"
        p.write_text("LEN\n! a comment line\nFROBNICATE 3\nGO\n")
        with pytest.raises(ValueError, match="FROBNICATE"):
            load_seq(p)

    def test_bad_radius_names_line(self, tmp_path):
        p = tmp_path / "bad.seq"
        p.write_text("LEN\nSO 0 INF\nS oops 5\nSI 0 0\n")
        with pytest.raises(ValueError, match=r"bad\.seq:3"):
            load_seq(p)

    def test_asphere_letters_map_to_even_terms(self, tmp_path):
        text = "\n".join([
            "LEN", "WL 587.6",
            "SO 0 INF",
            "S 30 5 NBK7_SCHOTT", "  K -0.5; A 1e-5; B -2e-8",
            "S -30 40", "SI 0 0",
        ])
        p = tmp_path / "a.seq"
        p.write_text(text)
        s = load_seq(p).surfaces[1]
        assert s.conic == -0.5
        assert s.type == "EVENASPH"
        assert s.parm == {2: 1e-5, 3: -2e-8}  # r^4, r^6


class TestParaxialAndTrace:
    def test_singlet_matches_thick_lens(self, tmp_path):
        text, bfd = _singlet_seq()
        p = tmp_path / "s.seq"
        p.write_text(text)
        props = seq_paraxial(p)
        assert props["efl"] == pytest.approx(
            paraxial.system_properties(
                paraxial.thick_lens(30.0, -30.0, 5.0, N_BK7))["efl"],
            rel=1e-12)
        assert props["bfd"] == pytest.approx(bfd, rel=1e-12)

    def test_traced_focus_matches_bfd(self, tmp_path):
        text, bfd = _singlet_seq()
        p = tmp_path / "s.seq"
        p.write_text(text)
        elements, info = seq_to_scene(p, n_segments=96, n_radial=48,
                                      detector_scale=2.0,
                                      include_stop=False)
        assert info["z_image"] == pytest.approx(5.0 + bfd)
        src = CollimatedSource(center=(0, 0, -5.0), direction=(0, 0, 1),
                               diameter=5.0, power=1.0, ray_count=2048,
                               seed=7)
        res = Tracer(TraceConfig()).trace(src, elements,
                                          trace_iterations=4, capacity=8192)
        fwd = res.measured_dir[:, 2] > 0.5
        assert res.measured_power[fwd].sum() > 0.85
        z_best, rms = best_focus(res.measured_pos[fwd],
                                 res.measured_dir[fwd],
                                 res.measured_power[fwd],
                                 z_range=(info["z_image"] - 10,
                                          info["z_image"] + 10))
        assert z_best == pytest.approx(info["z_image"], abs=1.0)

    def test_cemented_doublet_two_elements(self, tmp_path):
        text = "\n".join([
            "LEN", "TITLE 'achromat'", "WL 587.6",
            "SO 0 INF",
            "S 20 4 NBK7_SCHOTT", "  CIR 6",
            "S -15 2 SF10_SCHOTT", "  CIR 6",
            "S -60 30", "  CIR 6",
            "SI 0 0", "  CIR 3",
        ])
        p = tmp_path / "d.seq"
        p.write_text(text)
        elements, info = seq_to_scene(p, detector=False)
        refr = [e for e in elements
                if e.material == L.Material.REFRACTIVE]
        assert len(refr) == 2
        assert any("cemented" in w for w in info["warnings"])

    def test_mirror_refl_folds(self, tmp_path):
        # f=1000 parabolic primary, prime focus: EFL = 1000
        text = "\n".join([
            "LEN", "WL 587.6",
            "SO 0 INF",
            "S -2000 -1000 REFL", "  K -1; CIR 100",
            "SI 0 0", "  CIR 2",
        ])
        p = tmp_path / "m.seq"
        p.write_text(text)
        presc = load_seq(p)
        assert presc.surfaces[1].is_mirror
        props = seq_paraxial(presc)
        assert props["efl"] == pytest.approx(1000.0)
        elements, info = seq_to_scene(p, detector=False)
        assert elements[0].material == L.Material.MIRROR
