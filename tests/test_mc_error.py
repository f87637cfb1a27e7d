"""Monte-Carlo error estimation: trace_batched records per-batch
per-detector totals; detector_stderr() turns their spread into a standard
error on the detected power (batches are independent replicas).
"""

import numpy as np
import pytest

import lightpycl_tpu as L
from lightpycl_tpu.materials import Material
from lightpycl_tpu.sources import light_source
from lightpycl_tpu.tracer.config import TraceConfig
from lightpycl_tpu.tracer.engine import Tracer

oe = L.optical_elements(n_segments=24, n_radial=8)


def _cap_detector():
    """Hemispherical measure cap plus an absorbing floor: an isotropic
    source at the center sends a known fraction of its power to the cap
    (binomial per ray -> analytic Monte-Carlo variance)."""
    dome = oe.hemisphere(radius=5.0, name="cap")
    floor = oe.disc(radius=6.0, center=(0, 0, -1e-3),
                    material=Material.TERMINATOR)
    return [dome, floor]


class TestDetectorStderr:
    def test_matches_binomial_prediction(self):
        """Isotropic full-sphere source under a hemisphere cap: each ray
        is a Bernoulli(p=1/2) trial of weight P/N. The batch-spread SE
        must agree with the analytic binomial SE within MC slack."""
        B, N_batch = 16, 512
        N = B * N_batch
        tr = Tracer(TraceConfig(trace_iterations=3))
        src = light_source(center=(0, 0, 0), direction=(0, 0, 1),
                           power=1.0, ray_count=N_batch, seed=0,
                           polar_max=np.pi)
        res = tr.trace_batched(src, total_rays=N, batch_size=N_batch,
                               elements=_cap_detector(), seed=1)
        assert res.per_batch_detector is not None
        assert res.per_batch_detector.shape == (B, 1)
        # sanity: the batches reassemble the total
        np.testing.assert_allclose(res.per_batch_detector.sum(),
                                   res.detector_power("cap"), rtol=1e-9)
        p_hat = res.detector_power("cap")
        assert abs(p_hat - 0.5) < 0.05
        se = res.detector_stderr("cap")
        se_analytic = np.sqrt(0.5 * 0.5 / N)  # weight P/N per ray, N trials
        # chi^2_{15} spread of a 16-sample variance: ~2x slack is generous
        assert se_analytic / 2.5 < se < se_analytic * 2.5

    def test_stderr_shrinks_with_more_rays(self):
        tr = Tracer(TraceConfig(trace_iterations=3))

        def run(n_batch):
            src = light_source(center=(0, 0, 0), direction=(0, 0, 1),
                               power=1.0, ray_count=n_batch, seed=0,
                               polar_max=np.pi)
            return tr.trace_batched(src, total_rays=8 * n_batch,
                                    batch_size=n_batch,
                                    elements=_cap_detector(), seed=2)

        se_small = run(128).detector_stderr("cap")
        se_big = run(2048).detector_stderr("cap")
        # 16x the rays -> ~4x smaller SE; allow wide MC slack
        assert se_big < se_small / 1.5

    def test_resume_preserves_batch_history(self, tmp_path):
        src = light_source(center=(0, 0, 0), direction=(0, 0, 1),
                           power=1.0, ray_count=256, seed=3,
                           polar_max=np.pi)
        els = _cap_detector()
        tr = Tracer(TraceConfig(trace_iterations=3))
        full = tr.trace_batched(src, total_rays=2048, batch_size=256,
                                elements=els, seed=4)
        ck = str(tmp_path / "mc_ck")
        tr2 = Tracer(TraceConfig(trace_iterations=3))
        tr2.trace_batched(src, total_rays=2048, batch_size=256,
                          elements=els, seed=4, checkpoint_path=ck,
                          max_batches=3)
        resumed = tr2.trace_batched(src, total_rays=2048, batch_size=256,
                                    elements=els, seed=4,
                                    checkpoint_path=ck)
        np.testing.assert_allclose(resumed.per_batch_detector,
                                   full.per_batch_detector, rtol=1e-12)
        np.testing.assert_allclose(resumed.detector_stderr("cap"),
                                   full.detector_stderr("cap"), rtol=1e-9)

    def test_single_trace_has_no_stderr(self):
        tr = Tracer(TraceConfig(trace_iterations=3))
        src = light_source(center=(0, 0, 0), direction=(0, 0, 1),
                           power=1.0, ray_count=256, seed=5,
                           polar_max=np.pi)
        res = tr.trace(src, elements=_cap_detector(), mode="device")
        assert res.per_batch_detector is None
        with pytest.raises(ValueError, match="per-batch"):
            res.detector_stderr("cap")

    def test_one_batch_refused(self):
        tr = Tracer(TraceConfig(trace_iterations=3))
        src = light_source(center=(0, 0, 0), direction=(0, 0, 1),
                           power=1.0, ray_count=256, seed=6,
                           polar_max=np.pi)
        res = tr.trace_batched(src, total_rays=256, batch_size=256,
                               elements=_cap_detector(), seed=7)
        with pytest.raises(ValueError, match=">= 2 batches"):
            res.detector_stderr("cap")
