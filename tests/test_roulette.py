"""Russian-roulette termination (opt-in, unbiased alternative to the
reference's power-cutoff cull)."""

import numpy as np
import pytest

import lightpycl_tpu as L
from lightpycl_tpu.sources import CollimatedSource
from lightpycl_tpu.tracer.engine import Tracer

oe = L.optical_elements(n_segments=24, n_radial=8)


def lens_scene():
    return [oe.biconvex_lens(1.0, 0.8, 0.2, ior=1.5),
            oe.sphere(radius=6.0, material="measure", name="enclosure")]


SRC = dict(center=(0, 0, 3), direction=(0, 0, -1), diameter=0.6,
           ray_count=2048, power=1.0)


class TestRoulette:
    def test_conservation_exact(self):
        src = CollimatedSource(**SRC, seed=1)
        res = Tracer().trace(src, lens_scene(), trace_iterations=10,
                             capacity=8192, roulette_threshold=1e-3, seed=3)
        assert res.power_conservation_error() < 1e-4

    def test_unbiased_vs_deep_reference(self):
        # reference answer: deep trace, no cutoff, ample capacity
        src = CollimatedSource(**SRC, seed=1)
        ref = Tracer().trace(src, lens_scene(), trace_iterations=16,
                             capacity=16384)
        # roulette with an aggressive threshold agrees within Monte-Carlo
        # noise (measured 12-seed stats: bias 0.002 +- 0.0014, sigma ~5e-3
        # per run -> 3-sigma bound); net roulette delta ('culled') hovers
        # near zero
        rr = Tracer().trace(src, lens_scene(), trace_iterations=16,
                            capacity=16384, roulette_threshold=2e-4, seed=8)
        assert rr.ledger["measured"] == pytest.approx(
            ref.ledger["measured"], abs=0.015)
        assert abs(rr.ledger["culled"]) < 0.02
        # ...while a plain power cutoff at the same level biases LOW by ~8%
        cut = Tracer().trace(src, lens_scene(), trace_iterations=16,
                             capacity=16384, power_cutoff=2e-4)
        assert cut.ledger["measured"] < rr.ledger["measured"] - 0.05
        assert cut.ledger["culled"] > 0.05

    def test_requires_key(self):
        import jax.numpy as jnp

        from lightpycl_tpu.tracer.config import TraceConfig
        from lightpycl_tpu.tracer.rays import DetectorState, Ledger, RayBatch
        from lightpycl_tpu.tracer.step import trace_step

        scene, _ = L.build_scene(lens_scene())
        rays = RayBatch.from_arrays(np.zeros((4, 3)), np.tile([0, 0, 1.0], (4, 1)),
                                    np.ones(4))
        with pytest.raises(ValueError, match="PRNG key"):
            trace_step(scene, rays, DetectorState.zeros(4, 4, 1),
                       Ledger.start(4.0),
                       TraceConfig(roulette_threshold=1e-3))
