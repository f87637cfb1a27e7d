"""End-to-end tracer tests: the BASELINE scene family, energy conservation,
ray splitting, compaction, host vs device mode (SURVEY.md §7 Stages 1-2).
"""

import numpy as np
import pytest

import lightpycl_tpu as L
from lightpycl_tpu.materials import Material
from lightpycl_tpu.sources import CollimatedSource, light_source
from lightpycl_tpu.tracer.config import TraceConfig
from lightpycl_tpu.tracer.engine import Tracer

oe = L.optical_elements(n_segments=64, n_radial=24)


def conservation_error(res):
    return res.power_conservation_error()


class TestParabolicCollimator:
    """BASELINE configs[0]: point source at focus + parabolic mirror +
    hemisphere detector."""

    def setup_method(self):
        self.mirror = oe.parabolic_mirror(focus=0.5, diameter=2.0, reflectivity=0.9)
        self.dome = L.geometry.primitives.OpticalElements(48, 12).hemisphere(
            radius=20.0, name="dome"
        )
        self.ls = light_source(center=(0, 0, 0.5), direction=(0, 0, -1),
                               power=1.0, ray_count=4000, seed=5)

    def test_collimation_and_power(self):
        tr = Tracer()
        res = tr.trace(self.ls, [self.mirror, self.dome], trace_iterations=4)
        # all emitted power hits the mirror (dish subtends the full downward
        # hemisphere from the focus? not exactly - wide dish, focus inside)
        # measured = reflectivity * fraction reaching mirror
        assert conservation_error(res) < 1e-5
        assert res.ledger["measured"] == pytest.approx(0.9, abs=0.02)
        # beam collimated along +z
        from lightpycl_tpu import analysis
        stats = analysis.beam_statistics(res.measured_dir, res.measured_power)
        assert stats["mean_direction"][2] > 0.999
        assert stats["rms_divergence"] < 0.05  # limited by facet tessellation

    def test_device_mode_matches_host(self):
        tr = Tracer()
        res_h = tr.trace(self.ls, [self.mirror, self.dome], trace_iterations=4, mode="host")
        res_d = tr.trace(self.ls, [self.mirror, self.dome], trace_iterations=4, mode="device")
        for k in ("measured", "absorbed", "escaped"):
            assert res_d.ledger[k] == pytest.approx(res_h.ledger[k], rel=1e-5, abs=1e-7)
        assert np.allclose(res_d.hist, res_h.hist, atol=1e-5)

    def test_histogram_total_equals_measured(self):
        tr = Tracer()
        res = tr.trace(self.ls, [self.mirror, self.dome], trace_iterations=4)
        assert res.hist.sum() == pytest.approx(res.ledger["measured"], rel=1e-4)
        assert res.per_detector[0] == pytest.approx(res.ledger["measured"], rel=1e-4)
        # collimated beam: all histogram power in the lowest polar bins
        pol_profile = res.hist.sum(axis=0)
        assert pol_profile[:2].sum() == pytest.approx(res.hist.sum(), rel=1e-3)


class TestPlanoConvexLens:
    """BASELINE configs[1]: plano-convex lens focuses a collimated beam;
    Fresnel losses; focal length vs lensmaker prediction."""

    def test_focus_and_fresnel_loss(self):
        n, r = 1.5, 0.5
        f_lensmaker = r / (n - 1)  # 1.0 (flat front, convex back r2=-r)
        lens = oe.plano_convex_lens(r=r, aperture=0.6, thickness=0.1, ior=n)
        # small detector disc at the expected focal plane (principal plane
        # at the curved surface for plano-convex, + thickness)
        det = oe.disc(radius=0.3, center=(0, 0, 0.1 + f_lensmaker),
                      material="measure", name="focal")
        src = CollimatedSource(center=(0, 0, -0.5), direction=(0, 0, 1),
                               diameter=0.3, ray_count=3000, power=1.0, seed=2)
        tr = Tracer()
        res = tr.trace(src, [lens, det], trace_iterations=4)
        assert conservation_error(res) < 1e-5
        # two air-glass surfaces at ~normal incidence: T ~ (1 - 0.04)^2
        R0 = ((n - 1) / (n + 1)) ** 2
        assert res.ledger["measured"] == pytest.approx((1 - R0) ** 2, abs=0.01)
        # focal spot: power-weighted RMS radius well below the beam radius
        r_hit = np.linalg.norm(res.measured_pos[:, :2], axis=1)
        rms = np.sqrt((res.measured_power * r_hit**2).sum() / res.measured_power.sum())
        assert rms < 0.03  # spherical aberration + f32; beam was 0.15

    def test_focal_length_scan(self):
        # locate the beam waist along z and compare with lensmaker
        n, r = 1.5, 0.5
        lens = oe.plano_convex_lens(r=r, aperture=0.6, thickness=0.1, ior=n)
        src = CollimatedSource(center=(0, 0, -0.5), direction=(0, 0, 1),
                               diameter=0.2, ray_count=500, power=1.0, seed=3)
        best = None
        for z in np.linspace(0.7, 1.4, 8):
            det = oe.disc(radius=0.5, center=(0, 0, 0.1 + z), material="measure")
            res = Tracer().trace(src, [lens, det], trace_iterations=4)
            rr = np.linalg.norm(res.measured_pos[:, :2], axis=1)
            rms = np.sqrt((res.measured_power * rr**2).sum() / res.measured_power.sum())
            if best is None or rms < best[1]:
                best = (z, rms)
        assert best[0] == pytest.approx(r / (n - 1), abs=0.15)


class TestRaySplittingStack:
    """BASELINE configs[2]: two-element dielectric stack, reflect+refract
    splitting, compaction between bounces."""

    def make(self):
        l1 = oe.biconvex_lens(1.0, 0.8, 0.2, ior=1.5, center=(0, 0, 0))
        l2 = oe.biconvex_lens(1.5, 0.8, 0.15, ior=1.7).translate((0, 0, 0.5))
        box = oe.sphere(radius=6.0, material="measure", name="enclosure")
        src = CollimatedSource(center=(0, 0, -0.5), direction=(0, 0, 1),
                               diameter=0.5, ray_count=800, power=1.0, seed=9)
        return [l1, l2, box], src

    def test_splitting_multiplies_rays(self):
        els, src = self.make()
        tr = Tracer()
        res = tr.trace(src, els, trace_iterations=5, capacity=4096)
        # measured ray count exceeds emitted count => splitting happened and
        # multiple generations reached the enclosure
        assert len(res.measured_power) > 800
        assert conservation_error(res) < 1e-4
        # most power accounted after 5 bounces (the rest is still rattling
        # around inside the lenses — split children decay geometrically)
        accounted = sum(res.ledger[k] for k in ("measured", "absorbed", "escaped", "culled"))
        assert accounted > 0.85
        # deeper tracing drains it below 2%
        res9 = tr.trace(src, els, trace_iterations=12, capacity=4096)
        acc9 = sum(res9.ledger[k] for k in ("measured", "absorbed", "escaped", "culled"))
        assert acc9 > 0.98

    def test_capacity_overflow_is_culled_not_lost(self):
        els, src = self.make()
        tr = Tracer()
        # tiny capacity forces compaction overflow; ledger must still balance
        res = tr.trace(src, els, trace_iterations=5, capacity=1024)
        assert conservation_error(res) < 1e-4

    def test_power_cutoff_culls(self):
        els, src = self.make()
        res = Tracer().trace(src, els, trace_iterations=6, capacity=4096,
                             power_cutoff=1e-4)
        assert conservation_error(res) < 1e-4


class TestMaterialsBehavior:
    def test_terminator_absorbs_all(self):
        wall = oe.rectangle(4, 4, center=(0, 0, 1), material="terminator")
        src = CollimatedSource(direction=(0, 0, 1), diameter=1.0, ray_count=100)
        res = Tracer().trace(src, [wall], trace_iterations=2)
        assert res.ledger["absorbed"] == pytest.approx(1.0, rel=1e-5)

    def test_miss_escapes(self):
        wall = oe.rectangle(0.1, 0.1, center=(5, 5, 1), material="terminator")
        src = CollimatedSource(direction=(0, 0, 1), diameter=1.0, ray_count=100)
        res = Tracer().trace(src, [wall], trace_iterations=2)
        assert res.ledger["escaped"] == pytest.approx(1.0, rel=1e-5)

    def test_mirror_reflectivity_loss(self):
        mirror = oe.rectangle(4, 4, center=(0, 0, 2), material="mirror")
        mirror.material = Material.MIRROR
        mirror.reflectivity = 0.75
        det = oe.rectangle(4, 4, center=(0, 0, -2))  # behind the source
        det.material = Material.MEASURE
        src = CollimatedSource(center=(0, 0, 0), direction=(0, 0, 1),
                               diameter=1.0, ray_count=200)
        res = Tracer().trace(src, [mirror, det], trace_iterations=3)
        assert res.ledger["measured"] == pytest.approx(0.75, rel=1e-4)
        assert res.ledger["absorbed"] == pytest.approx(0.25, rel=1e-4)

    def test_tir_in_prism(self):
        # 45-45-90 prism: beam entering the hypotenuse face vertically
        # undergoes TIR (glass-air at 45 deg > critical 41.8 deg)
        prism = oe.prism(width=2.0, height=1.0, length=1.0, ior=1.5)
        dome = L.geometry.primitives.OpticalElements(32, 8).sphere(
            radius=10.0, material="measure", name="enclosure")
        src = CollimatedSource(center=(-0.5, -0.5, 0), direction=(0, 1, 0),
                               diameter=0.1, ray_count=64, power=1.0, seed=11)
        res = Tracer().trace(src, [prism, dome], trace_iterations=8,
                             capacity=2048)
        assert conservation_error(res) < 1e-4
        assert res.ledger["measured"] > 0.95


class TestDissipationEarlyExit:
    def test_host_loop_stops_early(self):
        wall = oe.rectangle(4, 4, center=(0, 0, 1), material="terminator")
        src = CollimatedSource(direction=(0, 0, 1), diameter=1.0, ray_count=100)
        res = Tracer().trace(src, [wall], trace_iterations=50)
        assert res.iterations_run == 1  # everything absorbed on bounce 1


class TestHistModes:
    def test_direction_mode_matches_position_for_collimated(self):
        # collimated beam onto a dome: arrival direction == hit-position
        # direction, so both binning modes put all power in the same bins
        oe2 = L.optical_elements(n_segments=24, n_radial=8)
        els = [oe2.hemisphere(10.0, name="dome")]
        src = CollimatedSource(center=(0, 0, 0), direction=(0, 0, 1),
                               diameter=0.5, ray_count=500)
        r_pos = Tracer().trace(src, els, trace_iterations=2,
                               hist_mode="position")
        r_dir = Tracer().trace(src, els, trace_iterations=2,
                               hist_mode="direction")
        assert r_pos.hist.sum() == pytest.approx(1.0, rel=1e-4)
        # direction mode puts everything in azimuth bin 0 (exact +z); the
        # azimuth-integrated polar profiles must agree
        assert np.allclose(r_pos.hist.sum(axis=0), r_dir.hist.sum(axis=0),
                           atol=1e-5)

    def test_hist_center_recenters_off_origin_dome(self):
        # the same scene translated off-origin, binned about hist_center,
        # must reproduce the origin-centered histogram bin for bin
        oe2 = L.optical_elements(n_segments=24, n_radial=8)
        src0 = CollimatedSource(center=(0, 0, 0), direction=(0, 0, 1),
                                diameter=0.5, ray_count=500, seed=7)
        r0 = Tracer().trace(src0, [oe2.hemisphere(10.0, name="dome")],
                            trace_iterations=2, hist_mode="position")
        shift = (3.0, -2.0, 5.0)
        dome = oe2.hemisphere(10.0, name="dome").translate(shift)
        src1 = CollimatedSource(center=shift, direction=(0, 0, 1),
                                diameter=0.5, ray_count=500, seed=7)
        r1 = Tracer().trace(src1, [dome], trace_iterations=2,
                            hist_mode="position", hist_center=shift)
        assert np.allclose(r1.hist, r0.hist, atol=1e-5)


class TestPolarizedDeviceMode:
    def test_device_loop_carries_stokes(self):
        slab = oe.cube((2, 2, 0.3), center=(0, 0, 0.15),
                       material="refractive", ior=1.5).rotate((0, 1, 0), 0.6)
        dome = L.optical_elements(16, 6).sphere(8.0, material="measure")
        src = CollimatedSource(center=(0, 0, -1), direction=(0, 0, 1),
                               diameter=0.5, ray_count=256, power=1.0, seed=6,
                               stokes=(0.5, 0.0, 0.0))
        r_d = Tracer().trace(src, [slab, dome], trace_iterations=8,
                             capacity=2048, polarization=True, mode="device")
        r_h = Tracer().trace(src, [slab, dome], trace_iterations=8,
                             capacity=2048, polarization=True, mode="host")
        for k in ("measured", "escaped", "culled"):
            assert r_d.ledger[k] == pytest.approx(r_h.ledger[k], rel=1e-4,
                                                  abs=1e-6)


class TestDetectorByName:
    def test_detector_power_lookup(self):
        oe2 = L.optical_elements(16, 6)
        d1 = oe2.rectangle(2, 2, center=(0, 0, 1), material="measure")
        d1.name = "front"
        src = CollimatedSource(direction=(0, 0, 1), diameter=0.5, ray_count=100)
        res = Tracer().trace(src, [d1], trace_iterations=1)
        assert res.detector_power("front") == pytest.approx(1.0, rel=1e-4)
        with pytest.raises(KeyError):
            res.detector_power("nope")


class TestMeasuredRaysFor:
    def test_per_detector_harvest_filter(self):
        oe2 = L.optical_elements(16, 6)
        d1 = oe2.rectangle(1, 1, center=(0.8, 0, 1), material="measure")
        d1.name = "right"
        d2 = oe2.rectangle(1, 1, center=(-0.8, 0, 1), material="measure")
        d2.name = "left"
        src = CollimatedSource(center=(0.8, 0, 0), direction=(0, 0, 1),
                               diameter=0.4, ray_count=200)
        res = Tracer().trace(src, [d1, d2], trace_iterations=1)
        pos, dirs, pw = res.measured_rays_for("right")
        assert pw.sum() == pytest.approx(1.0, rel=1e-4)
        assert (pos[:, 0] > 0).all()
        _, _, pw_left = res.measured_rays_for("left")
        assert pw_left.sum() == 0.0


class TestDeterminism:
    def test_identical_runs_bit_identical(self):
        """SURVEY.md §5.2: the one race surface is the detector scatter-add;
        XLA's scatter is deterministic — assert it (same inputs -> identical
        histogram, image, ledger bits)."""
        oe2 = L.optical_elements(24, 8)
        els = [oe2.parabolic_mirror(0.5, 2.0, reflectivity=0.9),
               oe2.hemisphere(10.0, name="dome"),
               oe2.biconvex_lens(1.0, 0.6, 0.1, ior=1.5, center=(0, 0, 1.0))]
        src = CollimatedSource(center=(0, 0, 3), direction=(0, 0, -1),
                               diameter=1.5, ray_count=1024, power=1.0, seed=3)

        def run():
            return Tracer().trace(src, els, trace_iterations=5, mode="device",
                                  image_bins=16, image_halfwidth=2.0)

        a, b = run(), run()
        assert np.array_equal(a.hist, b.hist)
        assert np.array_equal(a.image, b.image)
        assert a.ledger == b.ledger
