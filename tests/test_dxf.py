"""DXF import robustness (SURVEY.md §8.5 / ROADMAP item 7): POLYLINE mesh
entities, $INSUNITS unit handling, layer -> material mapping."""

import numpy as np
import pytest

import lightpycl_tpu as L
from lightpycl_tpu.io.dxf import (DXFWriter, load_dxf_mesh, load_dxf_scene,
                                  save_traced_scene)
from lightpycl_tpu.sources import CollimatedSource
from lightpycl_tpu.tracer.config import TraceConfig
from lightpycl_tpu.tracer.engine import Tracer

oe = L.optical_elements(n_segments=24, n_radial=8)


def _header(insunits):
    return ("0\nSECTION\n2\nHEADER\n9\n$INSUNITS\n70\n"
            f"{insunits}\n0\nENDSEC\n")


class TestPolyface:
    def test_polyface_roundtrip_traces_identically(self, tmp_path):
        """Write a parabolic mirror as a POLYLINE polyface mesh, read it
        back, and check the traced physics matches the native geometry."""
        mirror = oe.parabolic_mirror(0.5, 2.0, reflectivity=0.95)
        dome = oe.hemisphere(10.0, name="dome")
        p = str(tmp_path / "mirror.dxf")
        w = DXFWriter()
        w.add_polyface(mirror.vertices, mirror.triangles, layer="mirror")
        w.save(p)

        back = load_dxf_mesh(p, material="mirror")
        back.reflectivity = 0.95
        assert back.num_triangles == mirror.num_triangles
        # shared-vertex polyface preserves the vertex count too
        assert len(back.vertices) == len(mirror.vertices)

        src = CollimatedSource(center=(0, 0, 3), direction=(0, 0, -1),
                               diameter=1.5, ray_count=2048, power=1.0, seed=1)
        res_native = Tracer().trace(src, [mirror, dome], trace_iterations=3)
        res_dxf = Tracer().trace(src, [back, dome], trace_iterations=3)
        assert res_dxf.ledger["measured"] == pytest.approx(
            res_native.ledger["measured"], rel=1e-6)
        np.testing.assert_allclose(res_dxf.hist, res_native.hist, atol=1e-6)

    def test_polyface_quad_faces_triangulated(self, tmp_path):
        # hand-written polyface with one quad face record (codes 71-74)
        body = (
            "0\nSECTION\n2\nENTITIES\n"
            "0\nPOLYLINE\n8\nquad\n66\n1\n70\n64\n71\n4\n72\n1\n"
            "0\nVERTEX\n8\nquad\n10\n0\n20\n0\n30\n0\n70\n192\n"
            "0\nVERTEX\n8\nquad\n10\n1\n20\n0\n30\n0\n70\n192\n"
            "0\nVERTEX\n8\nquad\n10\n1\n20\n1\n30\n0\n70\n192\n"
            "0\nVERTEX\n8\nquad\n10\n0\n20\n1\n30\n0\n70\n192\n"
            "0\nVERTEX\n8\nquad\n10\n0\n20\n0\n30\n0\n70\n128\n"
            "71\n1\n72\n2\n73\n3\n74\n4\n"
            "0\nSEQEND\n"
            "0\nENDSEC\n0\nEOF\n")
        p = str(tmp_path / "quad.dxf")
        open(p, "w").write(body)
        g = load_dxf_mesh(p)
        assert g.num_triangles == 2
        assert len(g.vertices) == 4

    def test_grid_polygon_mesh(self, tmp_path):
        # 2x3 open polygon mesh (flag 16): (2-1)*(3-1)*2 = 4 triangles
        verts = [(m, n, 0.0) for m in range(2) for n in range(3)]
        vtx = "".join(
            f"0\nVERTEX\n8\ngrid\n10\n{x}\n20\n{y}\n30\n{z}\n70\n64\n"
            for x, y, z in verts)
        body = ("0\nSECTION\n2\nENTITIES\n"
                "0\nPOLYLINE\n8\ngrid\n66\n1\n70\n16\n71\n2\n72\n3\n"
                + vtx + "0\nSEQEND\n0\nENDSEC\n0\nEOF\n")
        p = str(tmp_path / "grid.dxf")
        open(p, "w").write(body)
        g = load_dxf_mesh(p)
        assert g.num_triangles == 4
        assert len(g.vertices) == 6


class TestUnits:
    def test_insunits_mm_to_m(self, tmp_path):
        w = DXFWriter()
        w.add_3dface((0, 0, 0), (1000, 0, 0), (0, 1000, 0))
        p = str(tmp_path / "mm.dxf")
        open(p, "w").write(_header(4) + w.tostring())
        g = load_dxf_mesh(p, units="m")
        assert np.abs(g.vertices).max() == pytest.approx(1.0)
        # without a target unit, coordinates pass through unchanged
        g2 = load_dxf_mesh(p)
        assert np.abs(g2.vertices).max() == pytest.approx(1000.0)

    def test_unitless_file_passthrough(self, tmp_path):
        w = DXFWriter()
        w.add_3dface((0, 0, 0), (2, 0, 0), (0, 2, 0))
        p = str(tmp_path / "plain.dxf")
        w.save(p)
        g = load_dxf_mesh(p, units="mm")
        assert np.abs(g.vertices).max() == pytest.approx(2.0)


class TestLayerMapping:
    def test_layer_map_to_materials(self, tmp_path):
        mirror = oe.parabolic_mirror(0.5, 2.0)
        dome = oe.hemisphere(10.0)
        w = DXFWriter()
        w.add_polyface(mirror.vertices, mirror.triangles, layer="mirror")
        w.add_polyface(dome.vertices, dome.triangles, layer="dome")
        p = str(tmp_path / "scene.dxf")
        w.save(p)

        els = load_dxf_scene(p, {
            "mirror": dict(material="mirror", reflectivity=0.95),
            "dome": dict(material="measure"),
        })
        by_name = {e.name: e for e in els}
        assert set(by_name) == {"mirror", "dome"}
        assert by_name["mirror"].material == L.Material.MIRROR
        assert by_name["dome"].material == L.Material.MEASURE

        src = CollimatedSource(center=(0, 0, 3), direction=(0, 0, -1),
                               diameter=1.5, ray_count=1024, power=1.0, seed=2)
        res = Tracer().trace(src, [by_name["mirror"], by_name["dome"]],
                             trace_iterations=3)
        assert res.detector_power("dome") == pytest.approx(0.95, abs=0.01)

    def test_unmapped_layer_skipped_or_defaulted(self, tmp_path):
        w = DXFWriter()
        w.add_3dface((0, 0, 0), (1, 0, 0), (0, 1, 0), layer="a")
        w.add_3dface((0, 0, 1), (1, 0, 1), (0, 1, 1), layer="b")
        p = str(tmp_path / "two.dxf")
        w.save(p)
        els = load_dxf_scene(p, {"a": dict(material="mirror")})
        assert [e.name for e in els] == ["a"]
        els2 = load_dxf_scene(p, {"a": dict(material="mirror")},
                              default_material="terminator")
        assert {e.name for e in els2} == {"a", "b"}

    def test_save_traced_scene_still_loads(self, tmp_path):
        # regression: the rewritten parser must keep reading writer output
        mirror = oe.parabolic_mirror(0.5, 2.0)
        p = str(tmp_path / "rt.dxf")
        save_traced_scene(p, [mirror])
        g = load_dxf_mesh(p)
        assert g.num_triangles == mirror.num_triangles
