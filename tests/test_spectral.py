"""Wavelength-parallel tracing (lightpycl_tpu.spectral).

Anchor: a spectral trace with W wavelength columns must reproduce, column
by column, W independent scalar traces of the same scene at those
wavelengths (same geometry, same seeds) — and conserve power per column.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import lightpycl_tpu as L
from lightpycl_tpu import optical_elements, spectral
from lightpycl_tpu.sources import CollimatedSource
from lightpycl_tpu.tracer.config import TraceConfig
from lightpycl_tpu.tracer.engine import Tracer
from lightpycl_tpu.tracer.rays import RayBatch

oe = optical_elements(n_segments=32, n_radial=12)
N_GLASS = 1.52
N_FILM = 1.38
WLS = [0.45, 0.50, 0.55, 0.60, 0.65]


def _beam(n=256, seed=3, wavelength=0.55):
    return CollimatedSource(center=(0, 0, -1.0), direction=(0, 0, 1),
                            diameter=0.5, ray_count=n, power=1.0,
                            seed=seed, wavelength=wavelength)


def _scene_coated_window():
    win = oe.cube(size=(1.0, 1.0, 0.25), material="refractive", ior=N_GLASS,
                  coat_ior=N_FILM, coat_thickness=0.55 / (4 * N_FILM),
                  name="win")
    fwd = oe.disc(radius=1.5, center=(0, 0, 2.0), material="measure",
                  name="fwd")
    back = oe.disc(radius=1.5, center=(0, 0, -2.0), material="measure",
                   name="back")   # measure surfaces are double-sided
    shell = oe.sphere(radius=8.0, material="terminator")
    return [win, fwd, back, shell]


class TestSpectralParity:
    def test_matches_per_wavelength_scalar_traces(self):
        els = _scene_coated_window()
        src = _beam()
        o, d, p = src.sample()
        # capacity ample enough that the 2C -> C compaction never
        # overflows: the spectral path ranks children by row TOTAL while a
        # scalar trace ranks by per-wavelength power, so overflow culling
        # is the one place the two may legitimately differ
        rays = RayBatch.from_arrays(o, d, p, capacity=4096)
        per_det, led, names, _ = spectral.trace_spectral(
            els, rays, WLS, iterations=8)
        assert float(np.abs(np.asarray(led.culled)).max()) < 1e-7
        per_det = np.asarray(per_det)
        assert per_det.shape == (2, len(WLS))

        for k, wl in enumerate(WLS):
            rays_k = RayBatch.from_arrays(o, d, p, capacity=4096,
                                          wavelengths=wl)
            # dissipation_target=1.0: disable the scalar device-loop's
            # 99.9% early exit so both paths run all 8 bounces
            res = Tracer().trace(_beam(wavelength=wl), els,
                                 trace_iterations=8, rays=rays_k,
                                 mode="device", dissipation_target=1.0)
            for j, name in enumerate(names):
                scalar = res.detector_power(name)
                # spectral column k carries 1/W of the power
                assert per_det[j, k] * len(WLS) == pytest.approx(
                    scalar, rel=2e-4, abs=1e-6), (wl, name)

    def test_per_wavelength_conservation_exact(self):
        els = _scene_coated_window()
        src = _beam(n=200, seed=9)
        o, d, p = src.sample()
        rays = RayBatch.from_arrays(o, d, p, capacity=800)
        _, led, _, sr = spectral.trace_spectral(els, rays, WLS, iterations=8)
        live = np.asarray(jnp.sum(
            jnp.where(sr.alive[:, None], sr.P, 0.0), axis=0))
        emitted = np.asarray(led.emitted)
        acc = np.asarray(led.accounted())
        np.testing.assert_allclose(emitted, acc + live, atol=2e-6)

    def test_ar_coating_spectral_shape(self):
        els = _scene_coated_window()
        src = _beam(n=400, seed=5)
        o, d, p = src.sample()
        rays = RayBatch.from_arrays(o, d, p, capacity=1600)
        per_det, led, names, _ = spectral.trace_spectral(
            els, rays, WLS, iterations=8)
        fwd = np.asarray(per_det)[names.index("fwd")]
        back = np.asarray(per_det)[names.index("back")]
        # quarter-wave AR designed at 0.55 um: transmission peaks at the
        # design wavelength, residual reflection rises toward band edges
        assert fwd.argmax() == WLS.index(0.55)
        assert back.argmin() == WLS.index(0.55)
        assert back[0] > back[2] and back[-1] > back[2]

    def test_rejects_dispersive_and_unsupported(self):
        src = _beam(n=16)
        o, d, p = src.sample()
        rays = RayBatch.from_arrays(o, d, p)
        disp = oe.cube(material="refractive", ior=N_GLASS)
        disp.dispersion_b = 0.005
        with pytest.raises(ValueError, match="achromatic"):
            spectral.trace_spectral([disp], rays, WLS)
        pol = oe.disc(radius=1.0, material="polarizer", axis=(1, 0, 0))
        with pytest.raises(ValueError, match="POLARIZER"):
            spectral.trace_spectral([pol], rays, WLS)

    def test_mirror_lens_scene_uncoated(self):
        # uncoated achromatic scene: all columns identical (R is
        # wavelength-independent) and equal to the scalar trace
        lens = oe.plano_convex_lens(0.8, 0.5, 0.12, ior=N_GLASS)
        mirror = oe.parabolic_mirror(focus=0.5, diameter=2.0,
                                     reflectivity=0.9)
        mirror.translate((0, 0, 2.5)).rotate((1, 0, 0), np.pi,
                                             pivot=(0, 0, 2.5))
        dome = oe.sphere(radius=9.0, material="measure", name="dome")
        els = [lens, mirror, dome]
        src = _beam(n=300, seed=11)
        o, d, p = src.sample()
        rays = RayBatch.from_arrays(o, d, p, capacity=1200)
        per_det, led, names, _ = spectral.trace_spectral(
            els, rays, [0.45, 0.55, 0.65], iterations=6)
        per_det = np.asarray(per_det)
        assert np.allclose(per_det[:, 0], per_det[:, 1], rtol=1e-6)
        assert np.allclose(per_det[:, 1], per_det[:, 2], rtol=1e-6)
        res = Tracer().trace(src, els, trace_iterations=6,
                             rays=RayBatch.from_arrays(o, d, p,
                                                       capacity=1200),
                             mode="device", dissipation_target=1.0)
        assert per_det[0].sum() == pytest.approx(
            res.detector_power("dome"), rel=2e-4)


class TestSpectralMultichip:
    def test_sharded_matches_single_device(self):
        # REALISTIC load: 1024 live rays at the standard 4x split
        # headroom, spanning ALL 8 shards (the round-robin interleave
        # gives each shard 128 live rays + its share of the headroom —
        # without it, shards 0-1 would hold every live ray, overflow at
        # the first Fresnel split, and cull ~0.6% of real power)
        from lightpycl_tpu.parallel.sharding import make_ray_mesh
        from lightpycl_tpu.spectral import trace_spectral_multichip

        els = _scene_coated_window()
        src = _beam(n=1024, seed=4)
        o, d, p = src.sample()
        rays = RayBatch.from_arrays(o, d, p, capacity=4096)
        pd1, led1, names, _ = spectral.trace_spectral(els, rays, WLS,
                                                      iterations=8)
        rays2 = RayBatch.from_arrays(o, d, p, capacity=4096)
        mesh = make_ray_mesh(8)
        pd8, led8, names8, _ = trace_spectral_multichip(
            els, rays2, WLS, iterations=8, mesh=mesh)
        assert names == names8
        # nothing culled on either path; spectra and ledgers agree to f32
        # summation-order noise (8-way psum + interleaved accumulation
        # order; ~5e-6 at 1024 rays)
        assert float(np.abs(np.asarray(led8.culled)).max()) < 1e-6
        np.testing.assert_allclose(np.asarray(pd8), np.asarray(pd1),
                                   atol=2e-5)
        for k in ("emitted", "measured", "absorbed", "escaped", "culled"):
            np.testing.assert_allclose(np.asarray(getattr(led8, k)),
                                       np.asarray(getattr(led1, k)),
                                       atol=2e-5, err_msg=k)
