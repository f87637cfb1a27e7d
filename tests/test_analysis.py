"""Analysis & IO unit tests: directivity binning, beam stats, intensity
maps, DXF emission (SURVEY.md §3 L5)."""

import numpy as np
import pytest

from lightpycl_tpu import analysis
from lightpycl_tpu.geometry.primitives import OpticalElements
from lightpycl_tpu.io.dxf import DXFWriter, save_traced_scene


class TestDirectivity:
    def test_histogram_conserves_power(self, rng):
        v = rng.normal(size=(1000, 3))
        p = rng.uniform(0, 1, 1000)
        h, _, _ = analysis.directivity_histogram(v, p)
        assert h.sum() == pytest.approx(p.sum())

    def test_solid_angle_normalization_isotropic(self, rng):
        # isotropic directions -> constant intensity over all bins
        n = 400000
        v = rng.normal(size=(n, 3))
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        p = np.full(n, 1.0 / n)
        h, _, _ = analysis.directivity_histogram(v, p, 18, 9,
                                                 solid_angle_normalize=True)
        expected = 1.0 / (4 * np.pi)
        assert np.allclose(h, expected, rtol=0.15)

    def test_polar_directivity_peak(self):
        v = np.tile([0, 0, 1.0], (100, 1))
        inten, centers = analysis.polar_directivity(v, np.ones(100), n_polar=18)
        assert inten.argmax() == 0

    def test_beam_statistics(self):
        d = np.tile([0, 0, 1.0], (50, 1))
        s = analysis.beam_statistics(d, np.ones(50))
        assert np.allclose(s["mean_direction"], [0, 0, 1])
        assert s["rms_divergence"] == pytest.approx(0.0, abs=1e-7)
        assert s["total_power"] == 50

    def test_intensity_map(self, rng):
        pos = np.zeros((200, 3))
        pos[:, :2] = rng.normal(scale=0.1, size=(200, 2))
        img, xe, ye = analysis.intensity_map(pos, np.ones(200), half_extent=1.0, bins=16)
        assert img.sum() == pytest.approx(200.0)
        # power concentrated in the center bins
        assert img[7:9, 7:9].sum() > 0.5 * img.sum()


class TestDXF:
    def test_writer_structure(self, tmp_path):
        w = DXFWriter()
        w.add_3dface((0, 0, 0), (1, 0, 0), (0, 1, 0))
        w.add_line((0, 0, 0), (1, 1, 1))
        s = w.tostring()
        assert s.startswith("0\nSECTION")
        assert s.count("3DFACE") == 1 and s.count("LINE") == 1
        assert s.rstrip().endswith("EOF")
        lines = s.split("\n")
        # 3DFACE corner group codes: corner i at x=10+i, y=20+i, z=30+i
        fi = lines.index("3DFACE")
        face_codes = lines[fi + 3:fi + 3 + 24:2]
        assert face_codes == [str(10 + i + 10 * a) for i in range(4) for a in range(3)]
        # vertex 1 of the face is (1, 0, 0)
        v1 = {lines[fi + 3 + 2 * k]: lines[fi + 4 + 2 * k] for k in range(12)}
        assert (v1["11"], v1["21"], v1["31"]) == ("1", "0", "0")
        p = tmp_path / "t.dxf"
        w.save(str(p))
        assert p.read_text() == s

    def test_dxf_roundtrip(self, tmp_path):
        from lightpycl_tpu.io.dxf import load_dxf_mesh

        oe = OpticalElements(12, 4)
        cube = oe.cube(2.0, center=(1, 2, 3))
        p = str(tmp_path / "rt.dxf")
        save_traced_scene(p, [cube])
        back = load_dxf_mesh(p, material="terminator")
        assert back.num_triangles == cube.num_triangles
        assert back.area() == pytest.approx(cube.area(), rel=1e-6)
        lo1, hi1 = cube.bounds()
        lo2, hi2 = back.bounds()
        assert np.allclose(lo1, lo2) and np.allclose(hi1, hi2)

    def test_save_traced_scene(self, tmp_path):
        oe = OpticalElements(8, 3)
        els = [oe.cube(1.0), oe.disc(1.0)]
        segs = [(np.zeros((5, 3)), np.ones((5, 3)), np.array([1, 1, 0, 1, 0], bool))]
        p = str(tmp_path / "scene.dxf")
        save_traced_scene(p, els, segs)
        txt = open(p).read()
        n_tris = sum(e.num_triangles for e in els)
        assert txt.count("3DFACE") == n_tris
        assert txt.count("\nLINE") == 3  # only alive segments


class TestSpectral:
    def test_spectral_power_bands(self):
        from lightpycl_tpu.analysis import spectral_power

        wl = np.array([0.45, 0.45, 0.55, 0.65])
        p = np.array([1.0, 2.0, 4.0, 8.0])
        hist, centers = spectral_power(wl, p, [0.4, 0.5, 0.6, 0.7])
        assert np.allclose(hist, [3.0, 4.0, 8.0])
        assert np.allclose(centers, [0.45, 0.55, 0.65])


class TestProfiler:
    def test_profile_logdir_writes_trace(self, tmp_path):
        import lightpycl_tpu as L
        from lightpycl_tpu.geometry.primitives import OpticalElements
        from lightpycl_tpu.sources import CollimatedSource
        from lightpycl_tpu.tracer.engine import Tracer

        oe = OpticalElements(8, 3)
        src = CollimatedSource(diameter=1.0, ray_count=64)
        det = oe.rectangle(2, 2, center=(0, 0, 1))
        det.material = L.Material.MEASURE
        logdir = str(tmp_path / "prof")
        Tracer().trace(src, [det], trace_iterations=1, mode="device",
                       profile_logdir=logdir)
        import os

        found = []
        for root, _, files in os.walk(logdir):
            found += files
        assert found  # xplane/trace artifacts written


class TestDOP:
    def test_degree_of_polarization(self):
        from lightpycl_tpu.analysis import degree_of_polarization

        # fully polarized, same state -> 1
        s = np.tile([1.0, 0, 0], (10, 1))
        assert degree_of_polarization(s) == pytest.approx(1.0)
        # equal mix of orthogonal states -> 0
        s = np.array([[1.0, 0, 0], [-1.0, 0, 0]])
        assert degree_of_polarization(s) == pytest.approx(0.0)
        # power weighting
        s = np.array([[1.0, 0, 0], [-1.0, 0, 0]])
        assert degree_of_polarization(s, [3.0, 1.0]) == pytest.approx(0.5)
        assert degree_of_polarization(np.zeros((0, 3))) == 0.0


class TestSTL:
    def test_stl_roundtrip(self, tmp_path):
        from lightpycl_tpu.io.stl import load_stl, save_stl

        oe = OpticalElements(12, 4)
        cube = oe.cube(2.0, center=(1, 2, 3))
        p = str(tmp_path / "cube.stl")
        save_stl(p, cube)
        back = load_stl(p, material="mirror")
        assert back.num_triangles == cube.num_triangles
        assert back.area() == pytest.approx(cube.area(), rel=1e-5)
        lo1, hi1 = cube.bounds()
        lo2, hi2 = back.bounds()
        assert np.allclose(lo1, lo2, atol=1e-5) and np.allclose(hi1, hi2, atol=1e-5)

    def test_ascii_stl(self, tmp_path):
        from lightpycl_tpu.io.stl import load_stl

        p = tmp_path / "tri.stl"
        p.write_text(
            "solid t\n facet normal 0 0 1\n  outer loop\n"
            "   vertex 0 0 0\n   vertex 1 0 0\n   vertex 0 1 0\n"
            "  endloop\n endfacet\nendsolid t\n")
        obj = load_stl(str(p))
        assert obj.num_triangles == 1
        assert obj.area() == pytest.approx(0.5)
