"""Reference-API compatibility: the CL_Tracer script flow of SURVEY.md §4
must work one-to-one (BASELINE.json: 'example scripts port one-to-one').
"""

import os

import numpy as np
import pytest

from lightpycl_tpu.compat import CL_Tracer, light_source, optical_elements


class TestReferenceFlow:
    def test_full_reference_script(self, tmp_path):
        # the reference's canonical example, written reference-style
        oe = optical_elements(n_segments=32, n_radial=12)
        mirror = oe.parabolic_mirror(focus=0.5, diameter=2.0, reflectivity=0.98)
        dome = oe.hemisphere(radius=10.0)
        ls = light_source(center=(0, 0, 0.5), direction=(0, 0, -1),
                          directivity=lambda az, pol: np.cos(pol),
                          power=1.0, ray_count=1000)
        tracer = CL_Tracer(platform_name="NVIDIA", device_type="GPU")
        res = tracer.iterative_tracer(ls, [mirror, dome], trace_iterations=8,
                                      max_ray_len=1e3, ior_env=1.0)

        pos, dirs, powers = tracer.get_measured_rays()
        assert len(powers) > 0
        assert powers.sum() == pytest.approx(0.98, abs=0.01)

        inten, centers = tracer.get_measured_directivity(n_polar=30)
        assert inten.argmax() == 0  # collimated: peak at polar ~ 0

        stats = tracer.get_beam_statistics()
        assert stats["mean_direction"][2] > 0.99

        perf = tracer.get_trace_performance()
        assert perf["intersection_tests_per_second"] > 0

        # DXF export with ray paths
        path = str(tmp_path / "scene.dxf")
        tracer.save_traced_scene(path)
        txt = open(path).read()
        assert "3DFACE" in txt and "LINE" in txt and txt.rstrip().endswith("EOF")

    def test_plots(self, tmp_path):
        pytest.importorskip("matplotlib")
        import matplotlib

        matplotlib.use("Agg")
        oe = optical_elements(16, 6)
        tracer = CL_Tracer()
        ls = light_source(power=1.0, ray_count=200)
        tracer.iterative_tracer(ls, [oe.hemisphere(2.0)], trace_iterations=2)
        p1 = str(tmp_path / "directivity.png")
        tracer.plot_measured_directivity(path=p1)
        assert os.path.getsize(p1) > 0
        p2 = str(tmp_path / "scene.png")
        tracer.plot_elements_and_rays(path=p2)
        assert os.path.getsize(p2) > 0
        p3 = str(tmp_path / "directivity3d.png")
        tracer.plot_measured_directivity_3d(path=p3)
        assert os.path.getsize(p3) > 0

    def test_reference_module_names(self):
        # upstream scripts port by changing only the import root
        from lightpycl_tpu.geo_optical_elements import optical_elements as oe_f
        from lightpycl_tpu.iterative_tracer import CL_Tracer as Tr
        from lightpycl_tpu.light_source import light_source as ls_f

        oe = oe_f(16, 6)
        tr = Tr("AMD", "CPU")
        res = tr.iterative_tracer(ls_f(power=1.0, ray_count=100),
                                  [oe.hemisphere(2.0)], trace_iterations=2)
        assert res.ledger["measured"] == pytest.approx(1.0, rel=1e-5)

    def test_material_string_compat(self):
        from lightpycl_tpu.materials import Material

        assert Material.from_any("mirror") == Material.MIRROR
        assert Material.from_any("refractive") == Material.REFRACTIVE
        assert Material.from_any("dielectric") == Material.REFRACTIVE
        assert Material.from_any("terminator") == Material.TERMINATOR
        assert Material.from_any("measure") == Material.MEASURE
        assert Material.from_any(2) == Material.TERMINATOR
        with pytest.raises(ValueError):
            Material.from_any("unobtainium")


def test_iterative_tracer_multichip_mode():
    """The reference-shaped entry point scales to the device mesh with one
    kwarg: iterative_tracer(..., mode='multichip')."""
    oe = optical_elements(n_segments=24, n_radial=8)
    els = [oe.parabolic_mirror(0.5, 2.0, reflectivity=0.9),
           oe.hemisphere(10.0, name="dome")]
    ls = light_source(center=(0, 0, 0.4), direction=(0, 0, -1),
                      power=1.0, ray_count=1024, seed=2)
    t1 = CL_Tracer()
    r1 = t1.iterative_tracer(ls, els, trace_iterations=4, mode="device")
    t8 = CL_Tracer()
    r8 = t8.iterative_tracer(ls, els, trace_iterations=4, mode="multichip")
    assert r8.ledger["measured"] == pytest.approx(r1.ledger["measured"],
                                                  rel=1e-4)
    assert t8.get_trace_performance()["iterations"] == 4
