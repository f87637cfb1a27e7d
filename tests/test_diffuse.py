"""Lambertian diffuse-scatter tests (extension over the reference — the
reference has specular surfaces only; SURVEY.md §8.5 lists no scattering).

The f64 oracle cannot cover randomized physics, so validation is analytic:
the cosine law fixes every moment of the scattered distribution
(E[cos theta] = 2/3, E[cos^2 theta] = 1/2 under the pdf 2 cos sin), albedo
fixes the absorbed fraction exactly, and fixed seeds fix determinism.
"""

import numpy as np
import pytest

import lightpycl_tpu as L
from lightpycl_tpu.sources import CollimatedSource
from lightpycl_tpu.tracer.engine import Tracer

oe = L.optical_elements(n_segments=32, n_radial=12)

ALBEDO = 0.7


def _scene():
    plate = oe.disc(radius=0.5, material="diffuse", reflectivity=ALBEDO,
                    name="plate")
    dome = oe.hemisphere(radius=6.0, name="dome")  # measure
    floor = oe.disc(radius=6.0, center=(0, 0, -0.01),
                    material="terminator")  # catches downward leaks (none)
    return [plate, dome, floor]


def _trace(seed=0, n_rays=4000, **kw):
    src = CollimatedSource(center=(0, 0, 1.0), direction=(0, 0, -1),
                           diameter=0.5, ray_count=n_rays, power=1.0,
                           seed=seed)
    return Tracer().trace(src, _scene(), trace_iterations=4,
                          hist_mode="direction", seed=seed, **kw)


class TestLambertian:
    def test_albedo_energy_split(self):
        res = _trace()
        # bounce 1: all power hits the plate; (1 - albedo) absorbed there,
        # the scattered remainder lands on the measuring dome
        assert res.ledger["absorbed"] == pytest.approx(1.0 - ALBEDO, abs=1e-5)
        assert res.ledger["measured"] == pytest.approx(ALBEDO, abs=1e-5)
        assert res.power_conservation_error() < 1e-5

    def test_cosine_law_moments(self):
        res = _trace(n_rays=20000)
        mu = res.measured_dir[:, 2]          # cos(theta) of scattered dirs
        w = res.measured_power
        assert (mu > 0).all()                # all into the upper hemisphere
        m1 = float((w * mu).sum() / w.sum())
        m2 = float((w * mu**2).sum() / w.sum())
        # cosine-weighted pdf: E[mu] = 2/3, E[mu^2] = 1/2
        assert m1 == pytest.approx(2.0 / 3.0, abs=0.01)
        assert m2 == pytest.approx(0.5, abs=0.01)

    def test_azimuthal_uniformity(self):
        res = _trace(n_rays=20000)
        phi = np.arctan2(res.measured_dir[:, 1], res.measured_dir[:, 0])
        hist, _ = np.histogram(phi, bins=8, weights=res.measured_power)
        assert hist.std() / hist.mean() < 0.05

    def test_deterministic_given_seed(self):
        r1 = _trace(seed=3)
        r2 = _trace(seed=3)
        np.testing.assert_array_equal(r1.measured_dir, r2.measured_dir)
        assert r1.ledger == r2.ledger
        r3 = _trace(seed=4)
        assert not np.array_equal(r1.measured_dir, r3.measured_dir)

    def test_device_mode_conserves(self):
        res = _trace(mode="device")
        assert res.ledger["measured"] == pytest.approx(ALBEDO, abs=1e-5)
        assert res.power_conservation_error() < 1e-5

    def test_multichip_conserves(self):
        res = _trace(mode="multichip", n_rays=4096)
        assert res.ledger["measured"] == pytest.approx(ALBEDO, abs=1e-5)
        assert res.power_conservation_error() < 1e-5

    def test_polarized_scatter_depolarizes(self):
        src = CollimatedSource(center=(0, 0, 1.0), direction=(0, 0, -1),
                               diameter=0.5, ray_count=512, power=1.0,
                               seed=1, stokes=(1.0, 0.0, 0.0))  # linear in
        res = Tracer().trace(src, _scene(), trace_iterations=3,
                             polarization=True)
        dop = np.linalg.norm(res.measured_stokes, axis=1)
        assert dop.max() < 1e-6
        assert res.power_conservation_error() < 1e-5

    def test_direct_step_requires_key(self):
        from lightpycl_tpu.tracer.config import TraceConfig
        from lightpycl_tpu.tracer.rays import DetectorState, Ledger, RayBatch
        from lightpycl_tpu.tracer.step import trace_step

        scene, names = L.build_scene(_scene())
        src = CollimatedSource(center=(0, 0, 1.0), direction=(0, 0, -1),
                               diameter=0.5, ray_count=64, seed=0)
        o, d, p = src.sample()
        rays = RayBatch.from_arrays(o, d, p)
        cfg = TraceConfig(has_diffuse=True, allow_splitting=False)
        det = DetectorState.zeros(8, 8, max(len(names), 1), 0)
        led = Ledger.start(1.0)
        with pytest.raises(ValueError, match="PRNG key"):
            trace_step(scene, rays, det, led, cfg)

    def test_orthonormal_basis_valid_everywhere(self):
        import jax.numpy as jnp

        from lightpycl_tpu.physics import orthonormal_basis

        rng = np.random.default_rng(0)
        n = rng.normal(size=(500, 3))
        n /= np.linalg.norm(n, axis=1, keepdims=True)
        # include the poles and near-poles
        n = np.vstack([n, [[0, 0, 1], [0, 0, -1], [1e-8, 0, 1]],
                       [[0, 1e-8, -1]]])
        n[-1] /= np.linalg.norm(n[-1])
        t1, t2 = orthonormal_basis(jnp.asarray(n, jnp.float32))
        t1, t2 = np.asarray(t1, np.float64), np.asarray(t2, np.float64)
        assert np.abs((t1 * n).sum(1)).max() < 1e-6
        assert np.abs((t2 * n).sum(1)).max() < 1e-6
        assert np.abs((t1 * t2).sum(1)).max() < 1e-6
        assert np.abs(np.linalg.norm(t1, axis=1) - 1).max() < 1e-6
        assert np.abs(np.linalg.norm(t2, axis=1) - 1).max() < 1e-6
        # right-handed: t1 x t2 == n
        np.testing.assert_allclose(np.cross(t1, t2), n, atol=1e-6)
