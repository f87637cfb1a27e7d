"""Opt-in Stokes-Mueller polarization (extension; polarization=False keeps
the reference's unpolarized model — checked by the rest of the suite)."""

import jax.numpy as jnp
import numpy as np
import pytest

import lightpycl_tpu as L
from lightpycl_tpu import physics
from lightpycl_tpu.sources import CollimatedSource
from lightpycl_tpu.tracer.config import TraceConfig
from lightpycl_tpu.tracer.engine import Tracer
from lightpycl_tpu.tracer.rays import DetectorState, Ledger, RayBatch
from lightpycl_tpu.tracer.step import trace_step

oe = L.optical_elements(n_segments=16, n_radial=6)


class TestMuellerUnits:
    def test_split_conserves_energy(self, rng):
        n1 = jnp.full((64,), 1.0)
        n2 = jnp.full((64,), 1.5)
        cos_i = jnp.asarray(rng.uniform(0.05, 1.0, 64), jnp.float32)
        sin_t = jnp.sqrt(1 - cos_i**2) * (n1 / n2)
        cos_t = jnp.sqrt(1 - sin_t**2)
        tir = jnp.zeros(64, bool)
        s0 = jnp.asarray(rng.uniform(0.1, 1.0, 64), jnp.float32)
        s1 = s0 * jnp.asarray(rng.uniform(-1, 1, 64), jnp.float32)
        s2 = jnp.sqrt(jnp.maximum(s0**2 - s1**2, 0.0)) * 0.5
        r, t = physics.polarized_split(s0, s1, s2, jnp.zeros(64), cos_i,
                                       cos_t, n1, n2, tir)
        assert np.allclose(np.asarray(r[0] + t[0]), np.asarray(s0), atol=1e-6)
        # physicality: |S_vec| <= S0 for both children
        for S in (r, t):
            mag = np.sqrt(sum(np.asarray(S[k]) ** 2 for k in (1, 2, 3)))
            assert (mag <= np.asarray(S[0]) + 1e-6).all()

    def test_unpolarized_reduces_to_scalar_model(self, rng):
        n1 = jnp.full((32,), 1.0)
        n2 = jnp.full((32,), 1.5)
        cos_i = jnp.asarray(rng.uniform(0.05, 1.0, 32), jnp.float32)
        cos_t = jnp.sqrt(1 - (1 - cos_i**2) * (n1 / n2) ** 2)
        z = jnp.zeros(32)
        r, t = physics.polarized_split(jnp.ones(32), z, z, z, cos_i, cos_t,
                                       n1, n2, jnp.zeros(32, bool))
        R_unpol = physics.fresnel_unpolarized(cos_i, cos_t, n1, n2,
                                              jnp.zeros(32, bool))
        assert np.allclose(np.asarray(r[0]), np.asarray(R_unpol), atol=1e-6)

    def test_fresnel_rhomb_angle(self):
        # the classic Fresnel rhomb: n = 1.51, one TIR at 54.62 deg gives a
        # 45 deg s-p retardation (published value)
        th = np.radians(54.62)
        delta = float(physics.tir_phase_shift(jnp.cos(th), 1.0 / 1.51))
        assert np.degrees(abs(delta)) == pytest.approx(45.0, abs=0.6)

    def test_rotate_stokes_round_trip(self, rng):
        s1 = jnp.asarray(rng.uniform(-1, 1, 16), jnp.float32)
        s2 = jnp.asarray(rng.uniform(-1, 1, 16), jnp.float32)
        phi = 0.7
        a1, a2 = physics.rotate_stokes(s1, s2, jnp.cos(phi), jnp.sin(phi))
        b1, b2 = physics.rotate_stokes(a1, a2, jnp.cos(-phi), jnp.sin(-phi))
        assert np.allclose(np.asarray(b1), np.asarray(s1), atol=1e-6)
        assert np.allclose(np.asarray(b2), np.asarray(s2), atol=1e-6)
        # 90-degree frame rotation flips S1
        c1, _ = physics.rotate_stokes(s1, s2, jnp.cos(np.pi / 2),
                                      jnp.sin(np.pi / 2))
        assert np.allclose(np.asarray(c1), -np.asarray(s1), atol=1e-6)


def _one_bounce(theta_deg, stokes):
    """One trace step: beam +z hits a glass slab tilted about y by theta."""
    slab = oe.cube((4, 4, 0.2), center=(0, 0, 0.1)).rotate((0, 1, 0),
                                                           np.radians(theta_deg))
    slab.material = L.Material.REFRACTIVE
    slab.ior = 1.5
    scene, _ = L.build_scene([slab])
    cfg = TraceConfig(polarization=True)
    n = 16
    rays = RayBatch.from_arrays(
        np.tile([0, 0, -2.0], (n, 1)), np.tile([0, 0, 1.0], (n, 1)),
        np.full(n, 1.0 / n), capacity=2 * n, stokes=stokes)
    det = DetectorState.zeros(4, 4, 1)
    led = Ledger.start(1.0)
    new_rays, det, led, _ = trace_step(scene, rays, det, led, cfg)
    r = new_rays
    # classify children by deflection: the mirror-reflected bundle leaves at
    # dx = -sin(2 theta) (strongly deflected); the refracted one bends only
    # by (theta - theta_t)
    dx = np.asarray(r.d[:, 0])
    pw = np.asarray(r.power)
    refl = (dx < -0.7) & (pw > 0)
    tran = (dx >= -0.7) & (pw > 0)
    return r, refl, tran, led


class TestPolarizedTrace:
    def test_brewster_reflection_fully_s_polarized(self):
        thb = np.degrees(np.arctan(1.5))  # 56.31 deg
        r, refl, tran, _ = _one_bounce(thb, stokes=None)
        s1 = np.asarray(r.s1)
        assert refl.any()
        assert np.allclose(s1[refl], 1.0, atol=1e-3)  # pure s
        # reflected power fraction = Rs(thb)/2 per unpolarized input
        ci = np.cos(np.radians(thb))
        ct = np.cos(np.arcsin(np.sin(np.radians(thb)) / 1.5))
        rs = ((ci - 1.5 * ct) / (ci + 1.5 * ct)) ** 2
        assert np.asarray(r.power)[refl].sum() == pytest.approx(rs / 2, rel=1e-3)

    def test_s_polarized_input_reflects_Rs(self):
        theta = 50.0
        r, refl, tran, _ = _one_bounce(theta, stokes=(1.0, 0.0, 0.0))
        ci = np.cos(np.radians(theta))
        ct = np.cos(np.arcsin(np.sin(np.radians(theta)) / 1.5))
        rs = ((ci - 1.5 * ct) / (ci + 1.5 * ct)) ** 2
        # NOTE: the auto basis for d=+z is y-hat; tilting about y makes the
        # incidence s-direction also +-y -> stokes=(1,0,0) is pure s
        assert np.asarray(r.power)[refl].sum() == pytest.approx(rs, rel=1e-3)
        rp = ((1.5 * ci - ct) / (1.5 * ci + ct)) ** 2
        assert abs(np.asarray(r.power)[refl].sum() - 0.5 * (rs + rp)) > 0.01

    def test_energy_conservation_polarized_trace(self):
        slab = oe.cube((2, 2, 0.3), center=(0, 0, 0.15),
                       material="refractive", ior=1.5).rotate((0, 1, 0), 0.6)
        dome = oe.sphere(8.0, material="measure")
        src = CollimatedSource(center=(0, 0, -1), direction=(0, 0, 1),
                               diameter=0.5, ray_count=256, power=1.0, seed=6,
                               stokes=(0.3, 0.4, 0.0))
        res = Tracer().trace(src, [slab, dome], trace_iterations=8,
                             capacity=4096, polarization=True)
        assert res.power_conservation_error() < 1e-4
        assert res.ledger["measured"] > 0.95

    def test_polarization_changes_multibounce_vs_scalar(self):
        # after the first oblique surface the light is partially polarized;
        # the scalar model ignores this and differs at the second surface
        slab = oe.cube((2, 2, 0.3), center=(0, 0, 0.15),
                       material="refractive", ior=1.5).rotate((0, 1, 0), 0.9)
        dome = oe.sphere(8.0, material="measure")
        src = CollimatedSource(center=(0, 0, -1), direction=(0, 0, 1),
                               diameter=0.5, ray_count=256, power=1.0, seed=6)
        r_pol = Tracer().trace(src, [slab, dome], trace_iterations=8,
                               capacity=4096, polarization=True)
        r_sca = Tracer().trace(src, [slab, dome], trace_iterations=8,
                               capacity=4096)
        # both conserve, but the detected split differs measurably
        assert r_pol.power_conservation_error() < 1e-4
        assert abs(r_pol.ledger["measured"] - r_sca.ledger["measured"]) > 1e-4


class TestMirrorHandedness:
    def test_mirror_flips_s3_and_s2(self):
        """An ideal mirror imposes rs = 1, rp = -1 (Mueller
        diag(1, 1, -1, -1)): circular polarization inverts handedness and
        S2 flips sign; S1 is preserved."""
        mirror = oe.rectangle(4.0, 4.0, material="mirror",
                              reflectivity=1.0).rotate((0, 1, 0),
                                                       np.radians(45.0))
        scene, _ = L.build_scene([mirror])
        cfg = TraceConfig(polarization=True, allow_splitting=False)
        n = 8
        for stokes, expect in [
            ((0.0, 0.0, 1.0), (0.0, 0.0, -1.0)),
            ((0.0, 0.6, 0.0), (0.0, -0.6, 0.0)),
            ((0.8, 0.0, 0.0), (0.8, 0.0, 0.0)),
        ]:
            rays = RayBatch.from_arrays(
                np.tile([0, 0, -2.0], (n, 1)), np.tile([0, 0, 1.0], (n, 1)),
                np.full(n, 1.0 / n), stokes=stokes)
            det = DetectorState.zeros(4, 4, 1)
            led = Ledger.start(1.0)
            r, det, led, _ = trace_step(scene, rays, det, led, cfg)
            alive = np.asarray(r.alive)
            assert alive.any()
            # the auto basis for d=+z is the incidence s-direction here
            # (tilt about y), so no frame rotation muddies the comparison
            np.testing.assert_allclose(np.asarray(r.s1)[alive], expect[0],
                                       atol=1e-5)
            np.testing.assert_allclose(np.asarray(r.s2)[alive], expect[1],
                                       atol=1e-5)
            np.testing.assert_allclose(np.asarray(r.s3)[alive], expect[2],
                                       atol=1e-5)


def test_no_split_polarized_ledger_balances():
    """Step-level allow_splitting=False with polarization=True: the dropped
    refracted power must be the POLARIZED transmitted power (regression:
    it used the unpolarized Fresnel split, off by (R_pol - R_unpol))."""
    slab = oe.cube((4, 4, 0.2), center=(0, 0, 0.1)).rotate(
        (0, 1, 0), np.radians(60.0))
    slab.material = L.Material.REFRACTIVE
    slab.ior = 1.5
    scene, _ = L.build_scene([slab])
    cfg = TraceConfig(polarization=True, allow_splitting=False)
    n = 16
    rays = RayBatch.from_arrays(
        np.tile([0, 0, -2.0], (n, 1)), np.tile([0, 0, 1.0], (n, 1)),
        np.full(n, 1.0 / n), stokes=(1.0, 0.0, 0.0))  # pure s
    det = DetectorState.zeros(4, 4, 1)
    led = Ledger.start(1.0)
    r, det, led, _ = trace_step(scene, rays, det, led, cfg)
    live = float(np.asarray((r.power * r.alive).sum()))
    acc = float(np.asarray(led.measured + led.absorbed + led.escaped
                           + led.culled))
    assert acc + live == pytest.approx(1.0, abs=1e-5)
