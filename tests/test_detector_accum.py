"""Detector-accumulation formulations (TraceConfig.detector_accum).

The MXU path reformulates every small-bin weighted bincount as chunked
one-hot matmuls (step.bincount_mxu) — measured 10.7x faster than XLA's
sort-based scatter at 4M rays x 648 bins on v5e AND closer to the f64 sum
(benchmarks/detector_bench.py -> results/detector_epilogue_v5e_r4.jsonl).
Physics must be identical to the scatter path up to f32 reassociation;
these tests pin that equivalence on CPU (where 'auto' picks scatter, so
'mxu' is forced explicitly).
"""

import jax.numpy as jnp
import numpy as np
import pytest

import lightpycl_tpu as L
from lightpycl_tpu.sources import CollimatedSource, light_source
from lightpycl_tpu.tracer import step as step_mod
from lightpycl_tpu.tracer.config import TraceConfig
from lightpycl_tpu.tracer.engine import Tracer

oe = L.optical_elements(n_segments=32, n_radial=12)


class TestBincountMXU:
    def test_matches_f64_bincount(self):
        rng = np.random.default_rng(0)
        C, B, K = 10_000, 648, 3
        idx = rng.integers(0, B, C).astype(np.int32)
        w = rng.uniform(0, 1e-4, (K, C)).astype(np.float32)
        got = np.asarray(step_mod.bincount_mxu(jnp.asarray(idx),
                                               jnp.asarray(w), B))
        assert got.shape == (K, B)
        for k in range(K):
            ref = np.bincount(idx, weights=w[k].astype(np.float64),
                              minlength=B)
            np.testing.assert_allclose(got[k], ref, rtol=1e-5, atol=1e-12)

    def test_padding_chunk_boundaries(self):
        # C deliberately NOT a multiple of the chunk: exercises the
        # zero-weight pad rows (which must not perturb bin 0)
        rng = np.random.default_rng(1)
        B = 4096  # chunk = (1<<24)//4096//128*128 = 3968 < C
        C = 3968 * 2 + 77
        idx = rng.integers(0, B, C).astype(np.int32)
        w = rng.uniform(0.5, 1.0, (1, C)).astype(np.float32)
        got = np.asarray(step_mod.bincount_mxu(jnp.asarray(idx),
                                               jnp.asarray(w), B))[0]
        ref = np.bincount(idx, weights=w[0].astype(np.float64), minlength=B)
        np.testing.assert_allclose(got, ref, rtol=1e-5)
        assert got.sum() == pytest.approx(w.sum(), rel=1e-6)


class TestAccumModeDispatch:
    def test_auto_is_scatter_on_cpu(self):
        # the suite runs on CPU jax, where auto must resolve to scatter
        assert step_mod._accum_mode(TraceConfig(), 648, 1 << 20) == "scatter"

    def test_explicit_override(self):
        cfg = TraceConfig(detector_accum="mxu")
        assert step_mod._accum_mode(cfg, 648, 16) == "mxu"
        cfg = TraceConfig(detector_accum="scatter")
        assert step_mod._accum_mode(cfg, 648, 1 << 20) == "scatter"


def _trace_both(els, src, iters, **cfg_kw):
    out = {}
    for mode in ("scatter", "mxu"):
        tr = Tracer()
        out[mode] = tr.trace(src, els, trace_iterations=iters,
                             mode="device", detector_accum=mode, **cfg_kw)
    return out["scatter"], out["mxu"]


class TestTraceEquivalence:
    def test_hist_and_ledger(self):
        els = [oe.parabolic_mirror(0.5, 2.0, reflectivity=0.98),
               oe.hemisphere(30.0, name="dome")]
        src = light_source(center=(0, 0, 0.5), direction=(0, 0, -1),
                           power=1.0, ray_count=4096, seed=3)
        r_sc, r_mx = _trace_both(els, src, 6)
        for k in r_sc.ledger:
            assert r_mx.ledger[k] == pytest.approx(r_sc.ledger[k],
                                                   rel=1e-6, abs=1e-9)
        np.testing.assert_allclose(r_mx.hist, r_sc.hist, rtol=1e-4,
                                   atol=1e-10)
        np.testing.assert_allclose(r_mx.per_detector, r_sc.per_detector,
                                   rtol=1e-6)

    def test_image_and_time_bins(self):
        lens = oe.plano_convex_lens(r=0.5, aperture=0.6, thickness=0.1,
                                    ior=1.5)
        det = oe.disc(radius=0.5, center=(0, 0, 1.1), material="measure",
                      name="focal")
        src = CollimatedSource(center=(0, 0, -0.5), direction=(0, 0, 1),
                               diameter=0.3, ray_count=2048, power=1.0,
                               seed=4)
        kw = dict(image_bins=16, image_center=(0, 0, 1.1),
                  image_normal=(0, 0, 1), image_halfwidth=0.1,
                  time_bins=8, opl_min=0.0, opl_max=4.0)
        r_sc, r_mx = _trace_both([lens, det], src, 4, **kw)
        np.testing.assert_allclose(r_mx.image, r_sc.image, rtol=1e-4,
                                   atol=1e-10)
        np.testing.assert_allclose(r_mx.time_hist, r_sc.time_hist,
                                   rtol=1e-4, atol=1e-10)
        assert r_mx.image.sum() == pytest.approx(r_sc.image.sum(), rel=1e-6)

    def test_coherent_amplitudes_shared_onehot(self):
        # the coherent re/im rows ride the same one-hot as the power row;
        # the lens varies OPL across the aperture so phases are nontrivial
        lens = oe.plano_convex_lens(r=0.5, aperture=0.6, thickness=0.1,
                                    ior=1.5)
        det = oe.disc(radius=0.5, center=(0, 0, 1.1), material="measure",
                      name="focal")
        src = CollimatedSource(center=(0, 0, -0.5), direction=(0, 0, 1),
                               diameter=0.3, ray_count=1024, power=1.0,
                               seed=5)
        kw = dict(image_bins=12, image_center=(0, 0, 1.1),
                  image_normal=(0, 0, 1), image_halfwidth=0.1,
                  coherent=True)
        r_sc, r_mx = _trace_both([lens, det], src, 4, **kw)
        assert r_sc.image_amp is not None and r_mx.image_amp is not None
        np.testing.assert_allclose(r_mx.image_amp, r_sc.image_amp,
                                   rtol=1e-4, atol=1e-8)
