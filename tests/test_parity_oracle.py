"""Detected-power parity vs the float64 oracle: BASELINE.md headline metric
(<= 0.1% on detected power), on the BASELINE config scene family.
"""

import numpy as np
import pytest

import lightpycl_tpu as L
from lightpycl_tpu.sources import CollimatedSource, light_source
from lightpycl_tpu.tracer.engine import Tracer
from lightpycl_tpu.tracer.oracle import trace_oracle

oe = L.optical_elements(n_segments=32, n_radial=12)

PARITY = 1e-3  # 0.1 %


def run_both(els, src, iters, capacity=None, power_cutoff=0.0):
    origins, dirs, powers = src.sample()
    tr = Tracer()
    res = tr.trace(
        src, els, trace_iterations=iters, capacity=capacity,
        power_cutoff=power_cutoff,
        rays=L.RayBatch.from_arrays(origins, dirs, powers, capacity=capacity),
    )
    ora = trace_oracle(
        els, origins, dirs, powers, trace_iterations=iters,
        power_cutoff=power_cutoff,
    )
    return res, ora


class TestParity:
    def test_config1_parabolic_collimator(self):
        els = [
            oe.parabolic_mirror(focus=0.5, diameter=2.0, reflectivity=0.92),
            oe.hemisphere(radius=15.0, name="dome"),
        ]
        src = light_source(center=(0, 0, 0.5), direction=(0, 0, -1),
                           power=1.0, ray_count=3000, seed=21)
        res, ora = run_both(els, src, iters=4)
        assert res.ledger["measured"] == pytest.approx(ora["measured"], rel=PARITY)
        assert res.ledger["absorbed"] == pytest.approx(ora["absorbed"], rel=PARITY, abs=1e-6)

    def test_config2_plano_convex(self):
        els = [
            oe.plano_convex_lens(r=0.5, aperture=0.6, thickness=0.1, ior=1.5),
            oe.disc(radius=1.0, center=(0, 0, 1.1), material="measure"),
            oe.sphere(radius=8.0, material="terminator", name="enclosure"),
        ]
        src = CollimatedSource(center=(0, 0, -0.5), direction=(0, 0, 1),
                               diameter=0.3, ray_count=2000, power=1.0, seed=22)
        res, ora = run_both(els, src, iters=5, capacity=16384)
        assert res.ledger["measured"] == pytest.approx(ora["measured"], rel=PARITY)
        assert res.ledger["escaped"] == pytest.approx(ora["escaped"], rel=5e-3, abs=1e-5)

    def test_config3_lens_stack_with_splitting(self):
        els = [
            oe.biconvex_lens(1.0, 0.8, 0.2, ior=1.5),
            oe.biconvex_lens(1.5, 0.8, 0.15, ior=1.7).translate((0, 0, 0.5)),
            oe.sphere(radius=6.0, material="measure", name="enclosure"),
        ]
        src = CollimatedSource(center=(0, 0, -0.5), direction=(0, 0, 1),
                               diameter=0.5, ray_count=1000, power=1.0, seed=23)
        res, ora = run_both(els, src, iters=5, capacity=32768)
        assert res.ledger["measured"] == pytest.approx(ora["measured"], rel=PARITY)
        # per-detector totals agree too
        assert res.per_detector[0] == pytest.approx(ora["measured"], rel=PARITY)

    def test_measured_ray_positions_match(self):
        # single bounce scene: the actual measured hit points must agree
        els = [oe.rectangle(4, 4, center=(0, 0, 2), material="measure")]
        src = CollimatedSource(center=(0, 0, 0), direction=(0, 0, 1),
                               diameter=1.0, ray_count=500, seed=24)
        res, ora = run_both(els, src, iters=1)
        a = res.measured_pos[np.lexsort(res.measured_pos.T)]
        b = ora["measured_pos"][np.lexsort(ora["measured_pos"].T)]
        assert np.allclose(a, b, atol=1e-5)
