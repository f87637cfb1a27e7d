"""Beamsplitter material (extension): angle-independent R/T coating split.

Physics anchor: a Michelson bench — 50/50 splitter at 45 deg, perfect
mirrors in both arms — delivers exactly half the source power to the
output port (0.25 from each arm) and returns the other half toward the
source (ray optics adds arm powers; no interference).
"""

import numpy as np
import pytest

import lightpycl_tpu as L
from lightpycl_tpu.materials import Material
from lightpycl_tpu.sources import CollimatedSource
from lightpycl_tpu.tracer.config import TraceConfig
from lightpycl_tpu.tracer.engine import Tracer
from lightpycl_tpu.tracer.oracle import trace_oracle
from lightpycl_tpu.tracer.rays import RayBatch

oe = L.optical_elements(n_segments=16, n_radial=6)


def michelson(reflectivity=0.5):
    bs = oe.rectangle(2.0, 2.0, material="beamsplitter",
                      reflectivity=reflectivity).rotate((0, 1, 0),
                                                        np.pi / 4)
    m1 = oe.rectangle(2.0, 2.0, material="mirror").rotate(
        (0, 1, 0), np.pi / 2).translate((-1.5, 0, 0))
    m2 = oe.rectangle(2.0, 2.0, material="mirror").rotate(
        (0, 1, 0), np.pi).translate((0, 0, 1.5))
    out = oe.rectangle(2.0, 2.0, material="measure", name="output").rotate(
        (0, 1, 0), -np.pi / 2).translate((1.5, 0, 0))
    return [bs, m1, m2, out]


def source():
    return CollimatedSource(center=(0, 0, -2.0), direction=(0, 0, 1),
                            diameter=0.5, power=1.0, ray_count=256, seed=1)


class TestMichelson:
    def test_half_power_reaches_output(self):
        res = Tracer(TraceConfig()).trace(source(), michelson(0.5),
                                          trace_iterations=6, capacity=4096)
        assert res.detector_power("output") == pytest.approx(0.5, abs=1e-5)
        assert res.ledger["escaped"] == pytest.approx(0.5, abs=1e-5)
        assert res.power_conservation_error() < 1e-5

    def test_unbalanced_splitter(self):
        # R=0.3: output gets R*T + T*R = 2*0.3*0.7 = 0.42
        res = Tracer(TraceConfig()).trace(source(), michelson(0.3),
                                          trace_iterations=6, capacity=4096)
        assert res.detector_power("output") == pytest.approx(0.42, abs=1e-5)
        assert res.power_conservation_error() < 1e-5

    def test_matches_oracle(self):
        els = michelson(0.5)
        src = source()
        o, d, p = src.sample()
        res = Tracer(TraceConfig()).trace(
            src, els, trace_iterations=6,
            rays=RayBatch.from_arrays(o, d, p, capacity=4096))
        ora = trace_oracle(els, o, d, p, trace_iterations=6)
        assert res.ledger["measured"] == pytest.approx(ora["measured"],
                                                       rel=1e-5)
        assert res.ledger["escaped"] == pytest.approx(ora["escaped"],
                                                      rel=1e-5)

    def test_string_alias_and_splitting_guard(self):
        assert Material.from_any("beamsplitter") == Material.BEAMSPLITTER
        # a beamsplitter scene with allow_splitting=False must be refused
        with pytest.raises(ValueError, match="splitting"):
            Tracer(TraceConfig(allow_splitting=False)).trace(
                source(), michelson(0.5), trace_iterations=2)

    def test_polarized_handedness(self):
        # circular input: reflected arm flips S3 (like a mirror), the
        # transmitted arm preserves it
        bs = oe.rectangle(4.0, 4.0, material="beamsplitter",
                          reflectivity=0.5).rotate((0, 1, 0), np.pi / 4)
        from lightpycl_tpu.tracer.rays import DetectorState, Ledger
        from lightpycl_tpu.tracer.step import trace_step

        scene, _ = L.build_scene([bs])
        cfg = TraceConfig(polarization=True)
        n = 8
        rays = RayBatch.from_arrays(
            np.tile([0, 0, -2.0], (n, 1)), np.tile([0, 0, 1.0], (n, 1)),
            np.full(n, 1.0 / n), capacity=2 * n, stokes=(0.0, 0.0, 1.0))
        det = DetectorState.zeros(4, 4, 1)
        led = Ledger.start(1.0)
        r, det, led, _ = trace_step(scene, rays, det, led, cfg)
        alive = np.asarray(r.alive)
        dx = np.asarray(r.d[:, 0])
        refl = alive & (dx < -0.5)
        tran = alive & (dx >= -0.5)
        assert refl.any() and tran.any()
        np.testing.assert_allclose(np.asarray(r.s3)[refl], -1.0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(r.s3)[tran], 1.0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(r.power)[alive], 0.5 / n,
                                   atol=1e-6)
