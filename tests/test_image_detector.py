"""On-device planar intensity-image detector (TraceConfig.image_bins):
focal-plane maps at mega-ray scale without harvesting rays."""

import numpy as np
import pytest

import lightpycl_tpu as L
from lightpycl_tpu.sources import CollimatedSource
from lightpycl_tpu.tracer.config import TraceConfig
from lightpycl_tpu.tracer.engine import Tracer

oe = L.optical_elements(n_segments=32, n_radial=12)


def focal_setup():
    n, r = 1.5, 0.5
    lens = oe.plano_convex_lens(r=r, aperture=0.6, thickness=0.1, ior=n)
    det = oe.disc(radius=0.5, center=(0, 0, 1.1), material="measure",
                  name="focal")
    src = CollimatedSource(center=(0, 0, -0.5), direction=(0, 0, 1),
                           diameter=0.3, ray_count=2000, power=1.0, seed=2)
    return [lens, det], src


class TestImageDetector:
    def test_device_image_matches_host_intensity_map(self):
        els, src = focal_setup()
        cfg = dict(image_bins=32, image_center=(0, 0, 1.1),
                   image_normal=(0, 0, 1), image_halfwidth=0.1)
        tr = Tracer()
        res = tr.trace(src, els, trace_iterations=4, mode="device", **cfg)
        assert res.image.shape == (32, 32)
        # nearly all measured power lands inside the window at the focus
        assert res.image.sum() == pytest.approx(res.ledger["measured"], rel=0.02)
        # focused: the central 8x8 block (+-0.025 of a +-0.1 window)
        # dominates despite spherical aberration
        c = res.image[12:20, 12:20].sum()
        assert c > 0.7 * res.image.sum()

        # host-mode harvest + analysis.intensity_map must agree
        res_h = tr.trace(src, els, trace_iterations=4, mode="host", **cfg)
        from lightpycl_tpu import analysis

        img, _, _ = analysis.intensity_map(
            res_h.measured_pos, res_h.measured_power,
            plane_point=(0, 0, 1.1), half_extent=0.1, bins=32)
        assert np.allclose(res_h.image, img, atol=1e-5)

    def test_disabled_by_default(self):
        els, src = focal_setup()
        res = Tracer().trace(src, els, trace_iterations=3, mode="device")
        assert res.image.shape == (1, 1)
        assert res.image.sum() == 0.0

    def test_out_of_window_power_dropped_not_binned(self):
        els, src = focal_setup()
        # tiny window far from the focus: most power lands outside
        res = Tracer().trace(src, els, trace_iterations=4, mode="device",
                             image_bins=8, image_center=(0.3, 0.3, 1.1),
                             image_halfwidth=0.01)
        assert res.image.sum() < 0.1 * res.ledger["measured"]


class TestAnnulus:
    def test_aperture_stop_blocks_ring(self):
        stop = oe.aperture_stop(r_open=0.2, r_outer=2.0, center=(0, 0, 0.5))
        det = oe.disc(radius=2.0, center=(0, 0, 1.0), material="measure")
        src = CollimatedSource(center=(0, 0, 0), direction=(0, 0, 1),
                               diameter=1.0, ray_count=4000, power=1.0, seed=1)
        res = Tracer().trace(src, [stop, det], trace_iterations=2)
        # transmitted fraction = (r_open / beam_radius)^2
        assert res.ledger["measured"] == pytest.approx((0.2 / 0.5) ** 2, abs=0.02)
        assert res.ledger["absorbed"] == pytest.approx(1 - (0.2 / 0.5) ** 2, abs=0.02)
        r_hit = np.linalg.norm(res.measured_pos[:, :2], axis=1)
        assert (r_hit <= 0.2 + 1e-3).all()


class TestImageEdges:
    def test_points_outside_left_edge_not_binned(self):
        # a beam JUST outside the left edge, within one pixel width
        # (x in [-1.09, -1.01], pixel = 0.125): int-truncation used to
        # alias exactly this band into column 0
        det = oe.rectangle(4, 4, center=(0, 0, 1), material="measure")
        src = CollimatedSource(center=(-1.05, 0, 0), direction=(0, 0, 1),
                               diameter=0.08, ray_count=500)
        res = Tracer().trace(src, [det], trace_iterations=1, mode="device",
                             image_bins=16, image_center=(0, 0, 1),
                             image_halfwidth=1.0)
        assert res.ledger["measured"] == pytest.approx(1.0, rel=1e-4)
        assert res.image.sum() < 1e-6  # all hits outside the window
