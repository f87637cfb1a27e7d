"""Full-fidelity scene serialization (io/scene.py).

Anchors:
- every GeoObject dataclass field survives a save_scene/load_scene round
  trip — checked GENERICALLY over dataclasses.fields, so a field added
  in a future round is covered automatically (or _encode raises);
- constructor validation re-runs on load (a corrupted file fails loudly);
- traced detected power is identical before/after the round trip.
"""

import dataclasses

import numpy as np
import pytest

import lightpycl_tpu as L
from lightpycl_tpu.io import load_scene, save_scene
from lightpycl_tpu.sources import CollimatedSource
from lightpycl_tpu.tracer.config import TraceConfig
from lightpycl_tpu.tracer.engine import Tracer


def _exotic_scene():
    """One element per hard-to-serialize feature family."""
    oe = L.optical_elements(n_segments=16, n_radial=6)
    lens = oe.spherical_lens(0.8, -0.8, 0.5, 0.1, ior=1.52, name="lens")
    lens.dispersion_b = 0.0042
    lens.dispersion_c = 1.1e-4
    lens.absorption = 0.02
    coated = oe.plano_convex_lens(0.9, 0.4, 0.08, ior=1.5, name="coated")
    coated.coating = [(1.38, 0.1), (2.35, 0.06)]
    grating = oe.disc(0.5, center=(0, 0, 1.0), material="grating",
                      name="grating", axis=(0, 1, 0), grating_period=1.2,
                      grating_order=-1, order0_fraction=0.15)
    rough = oe.disc(0.6, center=(0, 0, -0.5), material="mirror",
                    name="rough")
    rough.roughness = 0.02
    rough.roughness_lobe = 0.85
    rough.metal_n, rough.metal_k = L.materials.ALUMINUM
    phosphor = oe.cube(0.3, center=(1, 0, 0), material="refractive",
                       ior=1.4, name="phosphor")
    phosphor.fluorescence = 2.0
    phosphor.fluor_yield = 0.9
    phosphor.fluor_emission = (0.55, 0.05)
    phosphor.fluor_edge = 0.5
    grin = oe.cylinder(0.1, 0.5, center=(0, 1, 0), material="refractive",
                       ior=1.6, name="grin", axis=(0, 0, 1))
    grin.grin_a = 0.8
    grin.grin_center = np.array([0.0, 1.0, 0.0])
    biref = oe.cube(0.2, center=(-1, 0, 0), material="birefringent",
                    ior=1.658, name="biref", axis=(1, 0, 0), ne=1.486)
    det = oe.sphere(5.0, material="measure", name="wall")
    return [lens, coated, grating, rough, phosphor, grin, biref, det]


class TestRoundTrip:
    def test_every_field_survives(self, tmp_path):
        scene = _exotic_scene()
        p = tmp_path / "scene.npz"
        save_scene(p, scene)
        back = load_scene(p)
        assert len(back) == len(scene)
        for a, b in zip(scene, back):
            for f in dataclasses.fields(L.GeoObject):
                va, vb = getattr(a, f.name), getattr(b, f.name)
                if isinstance(va, np.ndarray):
                    np.testing.assert_array_equal(va, vb, err_msg=f.name)
                    assert va.dtype == vb.dtype, f.name
                elif isinstance(va, (list, tuple)):
                    assert type(va) is type(vb), f.name
                    np.testing.assert_allclose(
                        np.asarray(va, float), np.asarray(vb, float),
                        err_msg=f.name)
                else:
                    assert va == vb, (f.name, va, vb)

    def test_traced_power_identical(self, tmp_path):
        oe = L.optical_elements(n_segments=32, n_radial=12)
        lens = oe.biconvex_lens(0.8, 0.5, 0.12, ior=1.52, name="lens")
        wall = oe.sphere(5.0, material="measure", name="wall")
        p = tmp_path / "s.npz"
        save_scene(p, [lens, wall])
        src = CollimatedSource(center=(0, 0, -1), direction=(0, 0, 1),
                               diameter=0.4, power=1.0, ray_count=512,
                               seed=3)

        def run(elements):
            res = Tracer(TraceConfig()).trace(src, elements,
                                              trace_iterations=3,
                                              capacity=2048)
            return float(res.measured_power.sum())

        assert run(load_scene(p)) == run([lens, wall])

    def test_validation_reruns_on_load(self, tmp_path):
        import json

        oe = L.optical_elements(n_segments=8, n_radial=4)
        el = oe.disc(0.5, material="grating", name="g", axis=(0, 1, 0),
                     grating_period=1.0)
        p = tmp_path / "s.npz"
        save_scene(p, [el])
        # corrupt: drop the axis a GRATING element requires
        with np.load(p) as z:
            data = {k: z[k] for k in z.files}
        header = json.loads(bytes(data["__meta__"].tobytes()).decode())
        header["elements"][0]["axis"] = None
        data["__meta__"] = np.frombuffer(
            json.dumps(header).encode(), dtype=np.uint8)
        np.savez(p, **data)
        with pytest.raises(ValueError, match="axis"):
            load_scene(p)

    def test_unknown_field_rejected(self, tmp_path):
        import json

        oe = L.optical_elements(n_segments=8, n_radial=4)
        p = tmp_path / "s.npz"
        save_scene(p, [oe.disc(0.5, name="d")])
        with np.load(p) as z:
            data = {k: z[k] for k in z.files}
        header = json.loads(bytes(data["__meta__"].tobytes()).decode())
        header["elements"][0]["hyperdrive"] = 42
        data["__meta__"] = np.frombuffer(
            json.dumps(header).encode(), dtype=np.uint8)
        np.savez(p, **data)
        with pytest.raises(ValueError, match="hyperdrive"):
            load_scene(p)

    def test_not_a_scene_file(self, tmp_path):
        p = tmp_path / "x.npz"
        np.savez(p, a=np.zeros(3))
        with pytest.raises(ValueError, match="__meta__"):
            load_scene(p)
