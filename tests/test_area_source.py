"""Extended (area) sources: Lambertian disc/rectangle emitters.

Anchors:
  * cosine law: for Lambertian emission E[cos(theta)] = 2/3 (isotropic:
    1/2), and the angular power histogram tracks I(theta) ~ cos(theta);
  * radiative view factor: the power fraction a coaxial disc receives
    from a Lambertian disc emitter equals the closed-form disc-to-disc
    view factor F12 = (S - sqrt(S^2 - 4 (r2/r1)^2 (1/..)))/2 — the
    classic radiative-transfer result, here produced by actual tracing.
"""

import numpy as np
import pytest

import lightpycl_tpu as L
from lightpycl_tpu.sources import AreaSource
from lightpycl_tpu.tracer.engine import Tracer

oe = L.optical_elements(n_segments=48, n_radial=16)


class TestSampling:
    def test_origins_on_disc_and_total_power(self):
        src = AreaSource(center=(1, 2, 3), direction=(0, 0, 1), radius=0.7,
                         power=2.5, ray_count=4000, seed=1)
        o, d, p = src.sample()
        r = np.hypot(o[:, 0] - 1, o[:, 1] - 2)
        assert np.all(r <= 0.7 + 1e-12)
        assert np.allclose(o[:, 2], 3.0)
        assert p.sum() == pytest.approx(2.5, rel=1e-12)
        assert np.all(d[:, 2] > 0)

    def test_rectangle_bounds(self):
        from lightpycl_tpu.sources import _frame

        src = AreaSource(center=(0, 0, 0), width=(0.4, 0.2),
                         ray_count=2000, seed=2)
        o, _, _ = src.sample()
        u, v, w = _frame((0, 0, 1))       # width axes are the frame's u, v
        assert np.all(np.abs(o @ u) <= 0.2 + 1e-12)
        assert np.all(np.abs(o @ v) <= 0.1 + 1e-12)
        assert np.allclose(o @ w, 0.0, atol=1e-12)

    def test_cosine_law_mean(self):
        lam = AreaSource(radius=0.5, ray_count=20000, seed=3)
        iso = AreaSource(radius=0.5, ray_count=20000, seed=3,
                         emission="isotropic")
        _, dl, _ = lam.sample()
        _, di, _ = iso.sample()
        assert dl[:, 2].mean() == pytest.approx(2.0 / 3.0, abs=0.01)
        assert di[:, 2].mean() == pytest.approx(0.5, abs=0.01)

    def test_tilted_frame(self):
        src = AreaSource(direction=(1, 0, 0), radius=0.3, ray_count=1000,
                         seed=4)
        o, d, _ = src.sample()
        assert np.allclose(o[:, 0], 0.0, atol=1e-12)   # disc plane _|_ x
        assert np.all(d[:, 0] > 0)

    def test_device_host_statistical_match(self):
        import jax

        src = AreaSource(radius=0.6, power=1.0, ray_count=30000, seed=5)
        oh, dh, ph = src.sample()
        od, dd, pd = src.rays_on_device(jax.random.key(5))
        assert float(np.asarray(pd).sum()) == pytest.approx(1.0, rel=1e-5)
        # same spatial second moment and angular mean
        assert float(np.asarray(od[:, 0] ** 2).mean()) == pytest.approx(
            (oh[:, 0] ** 2).mean(), rel=0.05)
        assert float(np.asarray(dd[:, 2]).mean()) == pytest.approx(
            dh[:, 2].mean(), abs=0.01)


class TestViewFactor:
    def test_traced_flux_matches_disc_to_disc_view_factor(self):
        # Lambertian disc r1 at z=0, coaxial measure disc r2 at z=h:
        # F12 = (S - sqrt(S^2 - 4 (R2/R1)^2)) / 2,
        # R_i = r_i / h, S = 1 + (1 + R2^2) / R1^2   (Modest, eq. 4.41)
        r1, r2, h = 0.5, 1.0, 1.0
        R1, R2 = r1 / h, r2 / h
        S = 1.0 + (1.0 + R2 * R2) / (R1 * R1)
        F12 = 0.5 * (S - np.sqrt(S * S - 4.0 * (R2 / R1) ** 2))

        src = AreaSource(center=(0, 0, 0), direction=(0, 0, 1), radius=r1,
                         power=1.0, ray_count=40000, seed=7)
        det = oe.disc(radius=r2, center=(0, 0, h), material="measure",
                      name="det")
        shell = oe.sphere(radius=6.0, material="terminator")
        res = Tracer().trace(src, [det, shell], trace_iterations=2,
                             mode="device")
        got = res.detector_power("det")
        assert got == pytest.approx(F12, abs=0.01)
        assert res.power_conservation_error() < 1e-5
