"""Optical path length tracking (extension): OPL = sum of n * length per
segment, harvested per measured ray; enables OPD / wavefront-error maps.

Anchors:
  * free flight: OPL == geometric distance
  * glass slab at normal incidence: OPL = n * t_glass + air paths (exact)
  * Fermat: a stigmatic lens sampled on a focus-centered sphere has ~zero
    OPD spread; the spherical equivalent shows real aberration OPD
"""

import numpy as np
import pytest

import lightpycl_tpu as L
from lightpycl_tpu.analysis import wavefront_error
from lightpycl_tpu.sources import CollimatedSource
from lightpycl_tpu.tracer.config import TraceConfig
from lightpycl_tpu.tracer.engine import Tracer
from lightpycl_tpu.tracer.oracle import trace_oracle
from lightpycl_tpu.tracer.rays import RayBatch

oe = L.optical_elements(n_segments=24, n_radial=8)


class TestOPLAccounting:
    def test_free_flight_distance(self):
        det = oe.rectangle(4.0, 4.0, center=(0, 0, 2.5), material="measure",
                           name="out")
        src = CollimatedSource(center=(0, 0, 0), direction=(0, 0, 1),
                               diameter=0.5, ray_count=64, seed=1)
        res = Tracer(TraceConfig()).trace(src, [det], trace_iterations=2)
        np.testing.assert_allclose(res.measured_opl, 2.5, atol=1e-5)

    def test_glass_slab_adds_n_times_thickness(self):
        n_glass, t_glass = 1.5, 0.2
        slab = oe.cube((3, 3, t_glass), center=(0, 0, 1.0 + t_glass / 2),
                       material="refractive", ior=n_glass)
        det = oe.rectangle(4.0, 4.0, center=(0, 0, 2.0), material="measure",
                           name="out")
        src = CollimatedSource(center=(0, 0, 0), direction=(0, 0, 1),
                               diameter=0.5, ray_count=64, seed=1)
        res = Tracer(TraceConfig()).trace(src, [slab, det],
                                          trace_iterations=4, capacity=1024)
        # direct transmitted bundle: strongest measured rays
        main = res.measured_power > 0.5 * res.measured_power.max()
        expect = (2.0 - t_glass) * 1.0 + t_glass * n_glass
        np.testing.assert_allclose(res.measured_opl[main], expect, atol=1e-4)

    def test_matches_oracle(self):
        els = [oe.parabolic_mirror(0.5, 2.0, reflectivity=0.95),
               oe.hemisphere(10.0, name="dome")]
        src = CollimatedSource(center=(0, 0, 3), direction=(0, 0, -1),
                               diameter=1.5, ray_count=256, power=1.0, seed=2)
        o, d, p = src.sample()
        res = Tracer(TraceConfig()).trace(
            None, els, trace_iterations=3,
            rays=RayBatch.from_arrays(o, d, p))
        ora = trace_oracle(els, o, d, p, trace_iterations=3)
        # same total measured power and same power-weighted mean OPL
        assert res.ledger["measured"] == pytest.approx(ora["measured"],
                                                       rel=1e-5)
        mean_dev = (res.measured_opl * res.measured_power).sum() / \
            res.measured_power.sum()
        mean_ora = (ora["measured_opl"] * ora["measured_power"]).sum() / \
            ora["measured_power"].sum()
        assert mean_dev == pytest.approx(mean_ora, rel=1e-5)


class TestFermat:
    def test_stigmatic_singlet_has_flat_wavefront(self):
        """Fermat's principle: every ray through a stigmatic lens has equal
        OPL to the focus, so OPD on a focus-centered sphere ~ 0; the
        spherical singlet's spherical aberration shows as real OPD."""
        n, R, thick = 1.5, 0.5, 0.15
        z_focus = thick + R / (n - 1.0)
        oe2 = L.optical_elements(n_segments=192, n_radial=96)

        def rms_opd(k2):
            lens = oe2.aspheric_lens(None, -R, aperture=0.5, thickness=thick,
                                     ior=n, k2=k2)
            ball = oe2.sphere(radius=0.3, material="measure", name="ball",
                              center=(0, 0, z_focus))
            src = CollimatedSource(center=(0, 0, -0.5), direction=(0, 0, 1),
                                   diameter=0.4, ray_count=1024, seed=4)
            res = Tracer(TraceConfig()).trace(src, [lens, ball],
                                              trace_iterations=3,
                                              capacity=4096)
            fwd = res.measured_dir[:, 2] > 0.5
            return wavefront_error(res.measured_opl[fwd],
                                   res.measured_power[fwd])["rms"]

        rms_hyper = rms_opd(-n * n)
        rms_sphere = rms_opd(0.0)
        assert rms_hyper < rms_sphere / 5.0, (rms_hyper, rms_sphere)
        # tessellation-limited residual only
        assert rms_hyper < 2e-4
