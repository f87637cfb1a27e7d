"""Beer-Lambert bulk absorption in dielectrics (extension over the
reference; absorption = 0 default reproduces reference physics exactly)."""

import numpy as np
import pytest

import lightpycl_tpu as L
from lightpycl_tpu.sources import CollimatedSource
from lightpycl_tpu.tracer.engine import Tracer
from lightpycl_tpu.tracer.oracle import trace_oracle
from lightpycl_tpu.tracer.rays import RayBatch

oe = L.optical_elements(n_segments=24, n_radial=8)


def slab_scene(thickness, k):
    slab = oe.cube((2.0, 2.0, thickness), center=(0, 0, thickness / 2),
                   material="refractive", ior=1.5)
    slab.absorption = k
    det = oe.rectangle(4, 4, center=(0, 0, 5.0), material="measure")
    back = oe.rectangle(4, 4, center=(0, 0, -5.0), material="terminator")
    return [slab, det, back]


def run(thickness, k, iters=6):
    src = CollimatedSource(center=(0, 0, -1), direction=(0, 0, 1),
                           diameter=0.5, ray_count=400, power=1.0, seed=4)
    return Tracer().trace(src, slab_scene(thickness, k),
                          trace_iterations=iters, capacity=4096)


class TestBeerLambert:
    def test_transmission_decays_exponentially(self):
        n = 1.5
        R0 = ((n - 1) / (n + 1)) ** 2
        k = 2.0
        for L_th in (0.1, 0.3, 0.6):
            res = run(L_th, k)
            # direct transmitted bundle: (1-R)^2 e^{-kL}; higher-order terms
            # (double internal reflections) add ~R^2 e^{-3kL}
            direct = (1 - R0) ** 2 * np.exp(-k * L_th)
            assert res.ledger["measured"] == pytest.approx(direct, rel=0.02)
            assert res.power_conservation_error() < 1e-4

    def test_zero_absorption_unchanged(self):
        res0 = run(0.3, 0.0)
        n = 1.5
        R0 = ((n - 1) / (n + 1)) ** 2
        assert res0.ledger["measured"] > (1 - R0) ** 2 - 0.01

    def test_parity_with_oracle(self):
        els = slab_scene(0.4, 1.5)
        src = CollimatedSource(center=(0, 0, -1), direction=(0, 0, 1),
                               diameter=0.5, ray_count=300, power=1.0, seed=5)
        o, d, p = src.sample()
        res = Tracer().trace(src, els, trace_iterations=6,
                             rays=RayBatch.from_arrays(o, d, p, capacity=4096))
        ora = trace_oracle(els, o, d, p, trace_iterations=6)
        assert res.ledger["measured"] == pytest.approx(ora["measured"], rel=1e-3)
        assert res.ledger["absorbed"] == pytest.approx(ora["absorbed"], rel=1e-3)
