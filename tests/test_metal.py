"""Complex-index (metal) mirrors: angle/polarization-dependent reflectance
and metallic retardation (extension; metal_n = 0 reproduces the reference's
ideal mirror exactly).

Anchors: normal-incidence closed form R = ((n-n1)^2+k^2)/((n+n1)^2+k^2);
k = 0 reduces to the bare dielectric Fresnel amplitudes; traced detected/
absorbed power equals metal_reflectance at the incidence angle and matches
the f64 oracle; the polarized path reproduces |rs|^2 / |rp|^2 per
polarization and turns oblique linear 45-degree input elliptical (s3 != 0,
impossible for an ideal mirror) with exact conservation.
"""

import numpy as np
import pytest

import lightpycl_tpu as L
from lightpycl_tpu.sources import CollimatedSource
from lightpycl_tpu.tracer.config import TraceConfig
from lightpycl_tpu.tracer.engine import Tracer
from lightpycl_tpu.tracer.oracle import trace_oracle
from lightpycl_tpu.tracer.rays import DetectorState, Ledger, RayBatch
from lightpycl_tpu.tracer.step import trace_step

oe = L.optical_elements(n_segments=24, n_radial=8)

AL_N, AL_K = 0.96, 6.69         # aluminum at ~550 nm


def _arr(x):
    import jax.numpy as jnp

    return jnp.atleast_1d(jnp.asarray(x, jnp.float32))


class TestMetalFresnel:
    def test_normal_incidence_closed_form(self):
        from lightpycl_tpu.physics import metal_reflectance

        for n, k in [(AL_N, AL_K), (0.27, 3.24), (2.0, 1.0)]:
            R = float(metal_reflectance(_arr(1.0), _arr(1.0), _arr(n),
                                        _arr(k))[0])
            Rt = ((n - 1) ** 2 + k**2) / ((n + 1) ** 2 + k**2)
            assert R == pytest.approx(Rt, abs=1e-6)

    def test_k_zero_reduces_to_dielectric(self):
        import jax.numpy as jnp

        from lightpycl_tpu.physics import fresnel_amplitudes, metal_rs_rp

        for deg in (0.0, 30.0, 60.0, 80.0):
            ci = np.cos(np.radians(deg))
            ct = np.sqrt(1 - (1 / 1.5) ** 2 * (1 - ci * ci))
            rs, rp = metal_rs_rp(_arr(ci), _arr(1.0), _arr(1.5), _arr(0.0))
            rs2, rp2, _, _ = fresnel_amplitudes(_arr(ci), _arr(ct),
                                                _arr(1.0), _arr(1.5))
            assert float(jnp.real(rs)[0]) == pytest.approx(float(rs2[0]),
                                                           abs=1e-5)
            assert float(jnp.real(rp)[0]) == pytest.approx(float(rp2[0]),
                                                           abs=1e-5)

    def test_grazing_reflectance_approaches_one(self):
        from lightpycl_tpu.physics import metal_reflectance

        R = float(metal_reflectance(_arr(np.cos(np.radians(89.9))),
                                    _arr(1.0), _arr(AL_N), _arr(AL_K))[0])
        assert R > 0.99


class TestTracedMetalMirror:
    def _scene(self, deg):
        mirror = oe.rectangle(4.0, 4.0, material="mirror",
                              metal_n=AL_N, metal_k=AL_K)
        mirror.rotate((0, 1, 0), np.radians(deg))
        dome = oe.sphere(radius=6.0, material="measure", name="dome")
        return [mirror, dome]

    def test_detected_power_is_metal_reflectance(self):
        from lightpycl_tpu.physics import metal_reflectance

        for deg in (0.0, 45.0, 70.0):
            els = self._scene(deg)
            n = 128
            o = np.tile([0.0, 0.0, 2.0], (n, 1))
            d = np.tile([0.0, 0.0, -1.0], (n, 1))
            p = np.full(n, 1.0 / n)
            res = Tracer().trace(None, els, trace_iterations=3,
                                 rays=RayBatch.from_arrays(o, d, p),
                                 mode="device")
            R = float(metal_reflectance(_arr(np.cos(np.radians(deg))),
                                        _arr(1.0), _arr(AL_N),
                                        _arr(AL_K))[0])
            assert res.detector_power("dome") == pytest.approx(R, abs=2e-5)
            assert res.ledger["absorbed"] == pytest.approx(1.0 - R,
                                                           abs=2e-5)
            assert res.power_conservation_error() < 1e-5
            # f64 oracle runs the same metallic Fresnel in float64
            ora = trace_oracle(els, o, d, p, trace_iterations=3)
            assert res.ledger["measured"] == pytest.approx(ora["measured"],
                                                           rel=1e-5)

    def test_ideal_mirror_unchanged(self):
        # metal_n = 0 (default): fixed reflectivity, angle-independent
        mirror = oe.rectangle(4.0, 4.0, material="mirror",
                              reflectivity=0.9)
        mirror.rotate((0, 1, 0), np.radians(50.0))
        dome = oe.sphere(radius=6.0, material="measure", name="dome")
        n = 64
        res = Tracer().trace(
            None, [mirror, dome], trace_iterations=3,
            rays=RayBatch.from_arrays(np.tile([0.0, 0.0, 2.0], (n, 1)),
                                      np.tile([0.0, 0.0, -1.0], (n, 1)),
                                      np.full(n, 1.0 / n)),
            mode="device")
        assert res.detector_power("dome") == pytest.approx(0.9, abs=1e-6)

    def test_metal_on_non_mirror_rejected(self):
        with pytest.raises(ValueError, match="MIRROR"):
            oe.cube(material="refractive", ior=1.5, metal_n=1.0,
                    metal_k=2.0)


class TestPolarizedMetal:
    def _one_bounce(self, deg, stokes):
        scene, _ = L.build_scene([oe.rectangle(
            4.0, 4.0, material="mirror", metal_n=AL_N, metal_k=AL_K
        ).rotate((0, 1, 0), np.radians(deg))])
        cfg = TraceConfig(polarization=True, allow_splitting=False)
        n = 8
        rays = RayBatch.from_arrays(
            np.tile([0.0, 0.0, 2.0], (n, 1)),
            np.tile([0.0, 0.0, -1.0], (n, 1)),
            np.full(n, 1.0 / n), stokes=stokes)
        det = DetectorState.zeros(4, 4, 1)
        led = Ledger.start(1.0)
        r, det, led, _ = trace_step(scene, rays, det, led, cfg)
        alive = np.asarray(r.alive)
        pw = float(np.asarray(r.power)[alive].sum())
        s = (np.asarray(r.s1)[alive].mean(), np.asarray(r.s2)[alive].mean(),
             np.asarray(r.s3)[alive].mean())
        return pw, s, float(led.absorbed)

    def test_s_and_p_reflectances(self):
        import jax.numpy as jnp

        from lightpycl_tpu.physics import metal_rs_rp

        deg = 60.0
        rs, rp = metal_rs_rp(_arr(np.cos(np.radians(deg))), _arr(1.0),
                             _arr(AL_N), _arr(AL_K))
        Rs = float(jnp.abs(rs)[0]) ** 2
        Rp = float(jnp.abs(rp)[0]) ** 2
        # beam along -z onto a y-tilted mirror: auto basis is the s axis
        pw_s, _, ab_s = self._one_bounce(deg, (1.0, 0.0, 0.0))
        pw_p, _, ab_p = self._one_bounce(deg, (-1.0, 0.0, 0.0))
        assert pw_s == pytest.approx(Rs, abs=2e-5)
        assert pw_p == pytest.approx(Rp, abs=2e-5)
        assert ab_s == pytest.approx(1.0 - Rs, abs=2e-5)
        assert ab_p == pytest.approx(1.0 - Rp, abs=2e-5)

    def test_metallic_retardation_elliptizes_linear_input(self):
        # 45-degree linear input (s2 = 1): an ideal mirror returns linear
        # light (s3 just flips sign); aluminum's rs-rp phase difference
        # produces a genuinely elliptical state (|s3| >> 0)
        _, (s1, s2, s3), _ = self._one_bounce(60.0, (0.0, 1.0, 0.0))
        assert abs(s3) > 0.3
        # degree of polarization stays 1 (coherent, lossy but pure)
        assert s1 * s1 + s2 * s2 + s3 * s3 == pytest.approx(1.0, abs=1e-4)

    def test_unpolarized_input_matches_scalar_path(self):
        mirror = oe.rectangle(4.0, 4.0, material="mirror",
                              metal_n=AL_N, metal_k=AL_K)
        mirror.rotate((0, 1, 0), np.radians(40.0))
        dome = oe.sphere(radius=6.0, material="measure", name="dome")
        n = 128
        rays_kw = dict(
            rays=RayBatch.from_arrays(np.tile([0.0, 0.0, 2.0], (n, 1)),
                                      np.tile([0.0, 0.0, -1.0], (n, 1)),
                                      np.full(n, 1.0 / n)),
            mode="device", trace_iterations=3)
        res_u = Tracer().trace(None, [mirror, dome], **rays_kw)
        rays_kw["rays"] = RayBatch.from_arrays(
            np.tile([0.0, 0.0, 2.0], (n, 1)),
            np.tile([0.0, 0.0, -1.0], (n, 1)), np.full(n, 1.0 / n))
        res_p = Tracer().trace(None, [mirror, dome], polarization=True,
                               **rays_kw)
        assert res_p.detector_power("dome") == pytest.approx(
            res_u.detector_power("dome"), rel=1e-5)
        assert res_p.power_conservation_error() < 1e-5
