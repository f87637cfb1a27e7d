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
        per_det, led, names, _, _ = spectral.trace_spectral(
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
        _, led, _, sr, _ = spectral.trace_spectral(els, rays, WLS, iterations=8)
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
        per_det, led, names, _, _ = spectral.trace_spectral(
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
        per_det, led, names, _, _ = spectral.trace_spectral(
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


class TestEngineSpectral:
    """Tracer.trace_spectral: the wavelength-parallel path as a first-class
    engine citizen — same L5 analysis surface (angular histogram, planar
    image, per-detector totals, ledger) as a scalar trace, checked against
    W independent scalar traces."""

    def test_hist_image_match_scalar_traces(self):
        els = _scene_coated_window()
        src = _beam(n=400, seed=5)
        o, d, p = src.sample()
        wls = [0.45, 0.55, 0.65]
        cfg = dict(hist_azimuth_bins=12, hist_polar_bins=10, image_bins=16,
                   image_center=(0, 0, 2.0), image_halfwidth=1.5)
        tr = Tracer()
        res_sp = tr.trace_spectral(
            src, wls, elements=els, trace_iterations=8,
            rays=RayBatch.from_arrays(o, d, p, capacity=1600), **cfg)
        assert res_sp.per_detector_spectrum.shape == (2, 3)
        np.testing.assert_allclose(res_sp.per_detector,
                                   res_sp.per_detector_spectrum.sum(axis=1),
                                   atol=1e-6)
        # spectral hist/image == mean over wavelengths of the scalar runs
        # (each column carries 1/W of the power)
        hists, images, per_det = [], [], []
        for wl in wls:
            res = Tracer().trace(
                src, els, trace_iterations=8, mode="device",
                rays=RayBatch.from_arrays(o, d, p, capacity=1600,
                                          wavelengths=wl),
                dissipation_target=1.0, **cfg)
            hists.append(res.hist)
            images.append(res.image)
            per_det.append(res.per_detector)
        np.testing.assert_allclose(res_sp.hist, np.mean(hists, axis=0),
                                   atol=2e-5)
        np.testing.assert_allclose(res_sp.image, np.mean(images, axis=0),
                                   atol=2e-5)
        np.testing.assert_allclose(res_sp.per_detector,
                                   np.mean(per_det, axis=0), atol=2e-5)
        assert res_sp.image.sum() > 0.1  # forward disc sits in the image

    def test_engine_spectral_conservation_and_ledger(self):
        els = _scene_coated_window()
        src = _beam(n=200, seed=9)
        res = Tracer().trace_spectral(src, WLS, elements=els,
                                      trace_iterations=8, capacity=800)
        # scalar ledger = per-lambda ledger summed; conservation holds
        acc = sum(res.ledger[k] for k in
                  ("measured", "absorbed", "escaped", "culled"))
        assert acc + res.final_live_power == pytest.approx(
            res.ledger["emitted"], rel=1e-5)
        for k, v in res.spectral_ledger.items():
            assert v.shape == (len(WLS),)
            assert res.ledger[k] == pytest.approx(float(v.sum()), abs=1e-6)
        assert res.wavelengths.shape == (len(WLS),)
        with pytest.raises(KeyError):
            res.detector_spectrum("nope")

    def test_engine_spectral_multichip_matches_device(self):
        els = _scene_coated_window()
        src = _beam(n=512, seed=12)
        o, d, p = src.sample()
        r_dev = Tracer().trace_spectral(
            src, WLS, elements=els, trace_iterations=8,
            rays=RayBatch.from_arrays(o, d, p, capacity=2048))
        r_mc = Tracer().trace_spectral(
            src, WLS, elements=els, trace_iterations=8, mode="multichip",
            rays=RayBatch.from_arrays(o, d, p, capacity=2048))
        np.testing.assert_allclose(r_mc.per_detector_spectrum,
                                   r_dev.per_detector_spectrum, atol=2e-5)
        np.testing.assert_allclose(r_mc.hist, r_dev.hist, atol=2e-5)

    def test_compat_one_kwarg_spectral(self):
        from lightpycl_tpu.compat import CL_Tracer

        els = _scene_coated_window()
        src = _beam(n=200, seed=3)
        tracer = CL_Tracer()
        res = tracer.iterative_tracer(src, els, trace_iterations=8,
                                      wavelengths=WLS, capacity=800)
        assert res.per_detector_spectrum.shape == (2, len(WLS))
        # the quarter-wave AR signature comes through the compat surface
        back = res.detector_spectrum("back")
        assert back.argmin() == WLS.index(0.55)
        # scalar getters still work on the spectral result
        assert tracer.get_power_ledger()["measured"] > 0.9


class TestDispersiveSpectral:
    """Wavelength-BATCHED tracing (trace_spectral_dispersive) for the
    scenes the shared-geometry model rejects: the lambda axis flattens
    into the ray axis and one trace runs the full scalar physics. Anchor:
    column k must reproduce an independent scalar trace at wavelength k."""

    def _prism_scene(self):
        from lightpycl_tpu.materials import SF10

        a, b = SF10
        oe_p = optical_elements(n_segments=24, n_radial=8)
        prism = oe_p.prism(width=1.04, height=0.3, length=1.0, ior=a)
        prism.dispersion_b = b
        dome = oe_p.sphere(10.0, material="measure", name="dome")
        return [prism, dome]

    def _prism_beam(self, n=128):
        return CollimatedSource(center=(0.3, -0.5, 0), direction=(0, 1, 0),
                                diameter=0.04, ray_count=n, power=1.0,
                                seed=2)

    def test_prism_matches_sequential_scalar_traces(self):
        els = self._prism_scene()
        wls3 = [0.40, 0.55, 0.70]
        src = self._prism_beam()
        o, d, p = src.sample()
        rays = RayBatch.from_arrays(o, d, p, capacity=512)
        per_dw, led, names, rays_out, det, led_w, _ = \
            spectral.trace_spectral_dispersive(els, rays, wls3,
                                               iterations=6)
        per_dw = np.asarray(per_dw)
        assert per_dw.shape == (1, 3)
        # per-wavelength ledger: every column conserves (live binned by
        # the surviving rays' carried wavelengths)
        wl_arr = np.asarray([0.40, 0.55, 0.70], np.float32)
        r_wl = np.asarray(rays_out.wavelength)
        r_live = np.where(np.asarray(rays_out.alive),
                          np.asarray(rays_out.power), 0.0)
        live_w = np.zeros(3)
        np.add.at(live_w, np.abs(r_wl[:, None] - wl_arr).argmin(1), r_live)
        acc_w = sum(np.asarray(getattr(led_w, k)) for k in
                    ("measured", "absorbed", "escaped", "culled"))
        np.testing.assert_allclose(acc_w + live_w,
                                   np.asarray(led_w.emitted), atol=2e-6)
        # column sums == the scalar ledger
        for k in ("emitted", "measured", "absorbed", "escaped", "culled"):
            assert float(np.asarray(getattr(led_w, k)).sum()) == \
                pytest.approx(float(np.asarray(getattr(led, k))),
                              abs=2e-6), k
        # the measured column is the detector-summed spectrum (atol covers
        # the differing f32 accumulation orders of the two scatters)
        np.testing.assert_allclose(np.asarray(led_w.measured),
                                   per_dw.sum(axis=0), atol=5e-6)
        for k, wl in enumerate(wls3):
            res = Tracer().trace(
                src, els, trace_iterations=6, mode="device",
                rays=RayBatch.from_arrays(o, d, p, capacity=512,
                                          wavelengths=wl),
                dissipation_target=1.0)
            assert per_dw[0, k] * 3 == pytest.approx(
                res.detector_power("dome"), rel=5e-4, abs=1e-6), wl
        # total-power conservation on the flattened batch
        live = float(np.asarray(jnp.sum(jnp.where(
            rays_out.alive, rays_out.power, 0.0))))
        acc = float(np.asarray(led.accounted()))
        assert acc + live == pytest.approx(1.0, rel=1e-5)
        # the detector state rode along: hist total == measured total
        assert float(np.asarray(det.hist).sum()) == pytest.approx(
            float(np.asarray(led.measured)), abs=1e-5)

    def test_grating_scene_matches_scalar(self):
        gr = oe.rectangle(4.0, 4.0, material="grating", axis=(1, 0, 0),
                          grating_period=1.2, grating_order=1,
                          reflectivity=0.9)
        gr.order0_fraction = 0.25
        els = [gr, oe.sphere(radius=5.0, material="measure", name="dome")]
        n = 64
        o = np.tile([0.0, 0.0, 2.0], (n, 1))
        d = np.tile([0.0, 0.0, -1.0], (n, 1))
        p = np.full(n, 1.0 / n)
        wls3 = [0.45, 0.60, 0.75]
        rays = RayBatch.from_arrays(o, d, p, capacity=8 * n)
        per_dw, led, names, _, _, _, _ = spectral.trace_spectral_dispersive(
            els, rays, wls3, iterations=3)
        per_dw = np.asarray(per_dw)
        for k, wl in enumerate(wls3):
            res = Tracer().trace(
                None, els, trace_iterations=3, mode="device",
                rays=RayBatch.from_arrays(o, d, p, capacity=8 * n,
                                          wavelengths=wl),
                dissipation_target=1.0)
            assert per_dw[0, k] * 3 == pytest.approx(
                res.detector_power("dome"), rel=5e-4, abs=1e-6), wl

    def test_engine_auto_dispatch(self):
        # dispersive scene -> 'batched'; achromatic scene -> 'shared'.
        # Same call both ways; both carry a per-lambda spectral_ledger.
        els = self._prism_scene()
        src = self._prism_beam(n=64)
        res = Tracer().trace_spectral(src, [0.45, 0.55, 0.65],
                                      elements=els, trace_iterations=5,
                                      capacity=256)
        assert res.spectral_ledger is not None
        assert all(v.shape == (3,) for v in res.spectral_ledger.values())
        for k in ("emitted", "measured", "absorbed", "escaped", "culled"):
            assert res.spectral_ledger[k].sum() == pytest.approx(
                res.ledger[k], abs=2e-6), k
        assert res.per_detector_spectrum.shape == (1, 3)
        assert res.detector_spectrum("dome").sum() > 0.3
        acc = sum(res.ledger[k] for k in
                  ("measured", "absorbed", "escaped", "culled"))
        assert acc + res.final_live_power == pytest.approx(
            res.ledger["emitted"], rel=1e-5)
        # geometry-pass accounting is W-fold for the batched method
        assert res.rays_traced == 3 * 256 * 5

        res2 = Tracer().trace_spectral(_beam(n=64), WLS,
                                       elements=_scene_coated_window(),
                                       trace_iterations=4, capacity=256)
        assert res2.spectral_ledger is not None
        assert res2.rays_traced == 256 * 4

    def test_spread_rays_lanes(self):
        from lightpycl_tpu.spectral import spread_rays_over_wavelengths

        o = np.random.default_rng(0).normal(size=(8, 3))
        rays = RayBatch.from_arrays(o, np.tile([0, 0, 1.0], (8, 1)),
                                    np.ones(8))
        big = spread_rays_over_wavelengths(
            rays, [0.4, 0.6], jnp.asarray([0.25, 0.75]))
        assert big.capacity == 16
        assert np.allclose(np.asarray(big.wavelength[:8]), 0.4)
        assert np.allclose(np.asarray(big.wavelength[8:]), 0.6)
        assert np.allclose(np.asarray(big.power[:8]), 0.25)
        assert np.allclose(np.asarray(big.power[8:]), 0.75)
        assert np.allclose(np.asarray(big.o[8:]), np.asarray(rays.o[:8]))


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
        pd1, led1, names, _, _ = spectral.trace_spectral(els, rays, WLS,
                                                      iterations=8)
        rays2 = RayBatch.from_arrays(o, d, p, capacity=4096)
        mesh = make_ray_mesh(8)
        pd8, led8, names8, _, _ = trace_spectral_multichip(
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

    def test_dispersive_sharded_matches_single_device(self):
        # the wavelength-BATCHED (dispersive) path sharded over 8 chips:
        # 3 wavelengths x 256 live rays at 4x headroom -> 3072-slot
        # flattened batch, round-robin interleaved so every shard holds
        # live rays from every wavelength lane. Spectra + ledger must
        # match the single-device dispersive trace with zero culling.
        from lightpycl_tpu.materials import SF10
        from lightpycl_tpu.parallel.sharding import make_ray_mesh

        a, b = SF10
        oe_p = optical_elements(n_segments=24, n_radial=8)
        prism = oe_p.prism(width=1.04, height=0.3, length=1.0, ior=a)
        prism.dispersion_b = b
        els = [prism, oe_p.sphere(10.0, material="measure", name="dome")]
        src = CollimatedSource(center=(0.3, -0.5, 0), direction=(0, 1, 0),
                               diameter=0.04, ray_count=256, power=1.0,
                               seed=7)
        o, d, p = src.sample()
        wls3 = [0.40, 0.55, 0.70]
        pd1, led1, names, _, det1, lw1, _ = spectral.trace_spectral_dispersive(
            els, RayBatch.from_arrays(o, d, p, capacity=1024), wls3,
            iterations=6)
        pd8, led8, names8, rays8, det8, lw8, _ = \
            spectral.trace_spectral_dispersive(
                els, RayBatch.from_arrays(o, d, p, capacity=1024), wls3,
                iterations=6, mesh=make_ray_mesh(8))
        assert names == names8
        assert float(np.asarray(led8.culled)) < 1e-6
        np.testing.assert_allclose(np.asarray(pd8), np.asarray(pd1),
                                   atol=2e-5)
        for k in ("emitted", "measured", "absorbed", "escaped", "culled"):
            assert float(np.asarray(getattr(led8, k))) == pytest.approx(
                float(np.asarray(getattr(led1, k))), abs=2e-5), k
            # per-wavelength ledger psum'd once: columns match per column
            np.testing.assert_allclose(np.asarray(getattr(lw8, k)),
                                       np.asarray(getattr(lw1, k)),
                                       atol=2e-5, err_msg=k)
        # detector state psum'd exactly once: angular hist totals agree
        np.testing.assert_allclose(np.asarray(det8.hist).sum(),
                                   np.asarray(det1.hist).sum(), atol=2e-5)
        # deinterleaved rays_out conserves the live remainder
        live8 = float(np.asarray(jnp.sum(jnp.where(
            rays8.alive, rays8.power, 0.0))))
        acc8 = float(np.asarray(led8.accounted()))
        assert acc8 + live8 == pytest.approx(1.0, rel=1e-5)

    def test_engine_batched_multichip(self):
        # engine-level: one kwarg turns the dispersive spectrometer
        # multichip; result must match the device-mode engine run
        from lightpycl_tpu.materials import SF10

        a, b = SF10
        oe_p = optical_elements(n_segments=24, n_radial=8)
        prism = oe_p.prism(width=1.04, height=0.3, length=1.0, ior=a)
        prism.dispersion_b = b
        els = [prism, oe_p.sphere(10.0, material="measure", name="dome")]
        src = CollimatedSource(center=(0.3, -0.5, 0), direction=(0, 1, 0),
                               diameter=0.04, ray_count=128, power=1.0,
                               seed=5)
        wls3 = [0.45, 0.55, 0.65]
        r1 = Tracer().trace_spectral(src, wls3, elements=els,
                                     trace_iterations=5, capacity=512)
        r8 = Tracer().trace_spectral(src, wls3, elements=els,
                                     trace_iterations=5, capacity=512,
                                     mode="multichip")
        assert r1.spectral_ledger is not None
        assert r8.spectral_ledger is not None
        for k in ("emitted", "measured", "absorbed", "escaped", "culled"):
            np.testing.assert_allclose(r8.spectral_ledger[k],
                                       r1.spectral_ledger[k],
                                       atol=2e-5, err_msg=k)
        np.testing.assert_allclose(r8.per_detector_spectrum,
                                   r1.per_detector_spectrum, atol=2e-5)
        for k in ("emitted", "measured", "absorbed", "escaped", "culled"):
            assert r8.ledger[k] == pytest.approx(r1.ledger[k],
                                                 abs=2e-5), k


class TestSpectralAnalytic:
    """Exact quadric surfaces in spectral traces (ADVICE r3: analytic
    elements used to be silently invisible to BOTH spectral loops —
    rays sailed through their zero-area placeholder triangles with the
    ledger still closing). Anchors: column-exact parity vs scalar traces
    (which exercise the same merge_analytic in trace_step) and a
    focal-disc power level only a really-refracting lens can produce."""

    WL3 = [0.45, 0.55, 0.65]

    def _scene(self):
        # f = R/(n-1) = 1.0 behind the curved vertex at z ~ 0.05; the
        # 0.02-radius focal disc catches ~all of a focused paraxial beam
        # but only (0.02/0.04)^2 = 25% of a straight-through one
        lens = L.analytic_plano_convex_lens(0.5, 0.4, 0.05, ior=1.5)
        det = oe.disc(radius=0.02, center=(0, 0, 1.05), material="measure",
                      name="focal")
        return [*lens, det]

    def _src(self):
        return CollimatedSource(center=(0, 0, -0.5), direction=(0, 0, 1),
                                diameter=0.08, power=1.0, ray_count=256,
                                seed=3, sampling="hexapolar")

    def _scalar_focal_power(self, els, o, d, p):
        rays_k = RayBatch.from_arrays(o, d, p, capacity=2048,
                                      wavelengths=0.55)
        res = Tracer().trace(self._src(), els, trace_iterations=8,
                             rays=rays_k, mode="device",
                             dissipation_target=1.0)
        scalar = res.detector_power("focal")
        assert scalar > 0.8  # the lens really focuses (not pass-through)
        return scalar

    def test_shared_path_matches_scalar(self):
        els = self._scene()
        o, d, p = self._src().sample()
        rays = RayBatch.from_arrays(o, d, p, capacity=2048)
        per_det, led, names, sr, _ = spectral.trace_spectral(
            els, rays, self.WL3, iterations=8)
        per_det = np.asarray(per_det)
        scalar = self._scalar_focal_power(els, o, d, p)
        j = names.index("focal")
        for k in range(len(self.WL3)):
            assert per_det[j, k] * len(self.WL3) == pytest.approx(
                scalar, rel=2e-4, abs=1e-6), k
        # per-column conservation still closes with the quadric merge
        live = np.asarray(jnp.sum(
            jnp.where(sr.alive[:, None], sr.P, 0.0), axis=0))
        acc = sum(np.asarray(getattr(led, f)) for f in
                  ("measured", "absorbed", "escaped", "culled"))
        np.testing.assert_allclose(np.asarray(led.emitted), acc + live,
                                   atol=1e-5)

    def test_dispersive_path_matches_scalar(self):
        els = self._scene()
        o, d, p = self._src().sample()
        rays = RayBatch.from_arrays(o, d, p, capacity=2048)
        per_dw, led, names, rays_out, det, led_w, _ = \
            spectral.trace_spectral_dispersive(els, rays, self.WL3,
                                               iterations=8)
        per_dw = np.asarray(per_dw)
        scalar = self._scalar_focal_power(els, o, d, p)
        j = names.index("focal")
        for k in range(len(self.WL3)):
            assert per_dw[j, k] * len(self.WL3) == pytest.approx(
                scalar, rel=2e-4, abs=1e-6), k
        r_live = float(np.where(np.asarray(rays_out.alive),
                                np.asarray(rays_out.power), 0.0).sum())
        acc = sum(np.asarray(getattr(led_w, f)) for f in
                  ("measured", "absorbed", "escaped", "culled"))
        assert float(np.asarray(led_w.emitted).sum()) == pytest.approx(
            float(acc.sum()) + r_live, abs=1e-5)

    def test_engine_routes_analytic_spectral(self):
        # engine-level: method='auto' + an analytic scene must trace the
        # lens (it used to silently pass through)
        els = self._scene()
        res = Tracer().trace_spectral(self._src(), self.WL3, elements=els,
                                      trace_iterations=8, capacity=2048)
        assert res.detector_power("focal") > 0.8
