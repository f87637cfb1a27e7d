"""Wavefront OBJ / Stanford PLY IO (io/obj.py): round trips, polygon fan
triangulation, group -> material mapping, format-error rejection, and a
traced end-to-end import.

Extension over the reference (DXF export only — SURVEY.md §3); these pin
the interchange semantics: geometry round-trips exactly, OBJ indices
(1-based, negative, v/vt/vn) parse correctly, and imported elements carry
their optical properties into the tracer."""

import numpy as np
import pytest

import lightpycl_tpu as L
from lightpycl_tpu.io.obj import (load_obj, load_obj_scene, load_ply,
                                  save_obj, save_ply)
from lightpycl_tpu.sources import CollimatedSource
from lightpycl_tpu.tracer.config import TraceConfig
from lightpycl_tpu.tracer.engine import Tracer

oe = L.optical_elements(n_segments=16, n_radial=6)


def _tri_set(obj):
    """Order-independent set of triangles as sorted vertex-coordinate
    tuples (compaction may renumber vertices)."""
    tv = np.asarray(obj.triangle_vertices(), np.float32)
    return {tuple(sorted(map(tuple, np.round(t, 5)))) for t in tv}


class TestOBJ:
    def test_round_trip(self, tmp_path):
        cube = oe.cube(1.0, material="mirror")
        path = tmp_path / "cube.obj"
        save_obj(path, cube)
        back = load_obj(path, material="mirror")
        assert _tri_set(back) == _tri_set(cube)

    def test_quad_fan_triangulation(self, tmp_path):
        path = tmp_path / "quad.obj"
        path.write_text("v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\nf 1 2 3 4\n")
        obj = load_obj(path)
        assert obj.triangles.shape == (2, 3)
        # fan around vertex 0: (0,1,2) and (0,2,3) — total area 1
        areas = 0.5 * np.linalg.norm(np.cross(
            obj.triangle_vertices()[:, 1] - obj.triangle_vertices()[:, 0],
            obj.triangle_vertices()[:, 2] - obj.triangle_vertices()[:, 0]),
            axis=1)
        assert areas.sum() == pytest.approx(1.0)

    def test_slash_forms_and_negative_indices(self, tmp_path):
        path = tmp_path / "forms.obj"
        path.write_text(
            "v 0 0 0\nv 1 0 0\nv 0 1 0\n"
            "f 1/5 2/6/7 3//8\n"     # v/vt, v/vt/vn, v//vn
            "f -3 -2 -1\n")          # negative = from the end
        obj = load_obj(path)
        assert obj.triangles.shape == (2, 3)
        assert _tri_set(obj) == {_tri_set(obj).pop()}  # both faces identical

    def test_group_material_mapping(self, tmp_path):
        path = tmp_path / "scene.obj"
        path.write_text(
            "v 0 0 0\nv 1 0 0\nv 0 1 0\nv 0 0 1\n"
            "g lens\nf 1 2 3\n"
            "usemtl detector\nf 1 2 4\n"
            "g ignored\nf 2 3 4\n")
        els = load_obj_scene(path, {
            "lens": dict(material="refractive", ior=1.7),
            "detector": dict(material="measure", name="det"),
        })
        assert len(els) == 2
        lens = next(e for e in els if e.name == "lens")
        det = next(e for e in els if e.name == "det")
        assert float(lens.ior) == pytest.approx(1.7)
        assert lens.triangles.shape == (1, 3)
        assert det.material == L.materials.Material.MEASURE
        # unmapped group skipped without default_material
        els2 = load_obj_scene(path, {"lens": dict(material="mirror")},
                              default_material="terminator")
        assert len(els2) == 3

    def test_no_match_raises(self, tmp_path):
        path = tmp_path / "s.obj"
        path.write_text("v 0 0 0\nv 1 0 0\nv 0 1 0\ng a\nf 1 2 3\n")
        with pytest.raises(ValueError, match="no group matched"):
            load_obj_scene(path, {"b": dict(material="mirror")})

    def test_bad_files_rejected(self, tmp_path):
        empty = tmp_path / "e.obj"
        empty.write_text("# nothing\n")
        with pytest.raises(ValueError, match="no vertices"):
            load_obj(empty)
        oor = tmp_path / "o.obj"
        oor.write_text("v 0 0 0\nv 1 0 0\nv 0 1 0\nf 1 2 9\n")
        with pytest.raises(ValueError, match="out of range"):
            load_obj(oor)

    def test_multi_object_export(self, tmp_path):
        a = oe.cube(1.0, material="mirror")
        b = oe.cube(0.5, material="mirror").translate((3, 0, 0))
        path = tmp_path / "two.obj"
        save_obj(path, [a, b])
        merged = load_obj(path)
        assert _tri_set(merged) == _tri_set(a) | _tri_set(b)


class TestPLY:
    def test_binary_round_trip(self, tmp_path):
        dome = oe.hemisphere(2.0)
        path = tmp_path / "dome.ply"
        save_ply(path, dome)
        back = load_ply(path)
        assert _tri_set(back) == _tri_set(dome)

    def test_ascii_load(self, tmp_path):
        path = tmp_path / "a.ply"
        path.write_text(
            "ply\nformat ascii 1.0\ncomment hand-written\n"
            "element vertex 4\n"
            "property float x\nproperty float y\nproperty float z\n"
            "element face 1\n"
            "property list uchar int vertex_indices\n"
            "end_header\n"
            "0 0 0\n1 0 0\n1 1 0\n0 1 0\n"
            "4 0 1 2 3\n")
        obj = load_ply(path)
        assert obj.vertices.shape[0] >= 4 - 0  # compaction not applied here
        assert obj.triangles.shape == (2, 3)

    def test_bad_magic(self, tmp_path):
        path = tmp_path / "x.ply"
        path.write_bytes(b"not a ply\n")
        with pytest.raises(ValueError, match="magic"):
            load_ply(path)

    def test_truncated_binary(self, tmp_path):
        dome = oe.hemisphere(2.0)
        path = tmp_path / "t.ply"
        save_ply(path, dome)
        blob = path.read_bytes()
        head_end = blob.index(b"end_header\n") + len(b"end_header\n")
        path.write_bytes(blob[:head_end + 11])
        with pytest.raises(ValueError, match="truncated"):
            load_ply(path)


class TestTracedImport:
    def test_obj_scene_traces(self, tmp_path):
        # export a mirror dish + detector dome, re-import via OBJ with the
        # group map, and check the traced physics carries over
        els = [oe.parabolic_mirror(0.5, 2.0, reflectivity=0.9),
               oe.hemisphere(10.0, name="dome")]
        path = tmp_path / "bench.obj"
        save_obj(path, els)
        els2 = load_obj_scene(path, {
            els[0].name or "element_0": dict(material="mirror",
                                             reflectivity=0.9),
            "dome": dict(material="measure", name="dome"),
        })
        src = CollimatedSource(center=(0, 0, 3), direction=(0, 0, -1),
                               diameter=1.5, ray_count=512)
        tr = Tracer(TraceConfig(trace_iterations=4))
        res = tr.trace(src, elements=els2, mode="host")
        assert res.ledger["measured"] == pytest.approx(0.9, abs=0.02)
        acc = sum(res.ledger[k] for k in
                  ("measured", "absorbed", "escaped", "culled"))
        assert acc == pytest.approx(res.ledger["emitted"], rel=1e-5)
