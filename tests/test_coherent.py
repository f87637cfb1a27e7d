"""Coherent imaging (TraceConfig.coherent): complex field accumulation on
the image plane. Extension over the reference (pure incoherent ray power);
anchors are analytic two-beam interference, the Michelson fringe law, and
multichip/batched-driver parity."""

import numpy as np
import pytest

import jax.numpy as jnp

from lightpycl_tpu import optical_elements
from lightpycl_tpu.sources import CollimatedSource
from lightpycl_tpu.tracer.config import TraceConfig
from lightpycl_tpu.tracer.engine import Tracer
from lightpycl_tpu.tracer.rays import DetectorState, RayBatch

WL = 0.5  # interpreted in scene units (only OPL / lambda enters the phase)

oe = optical_elements(n_segments=16, n_radial=6)


def michelson(arm_offset=0.0):
    """50/50 beamsplitter Michelson; offsetting the -x arm mirror by d
    adds exactly 2 d of OPL to that arm for EVERY ray, so the total
    coherent intensity scales by |1 + e^{i 2 pi 2d/wl}|^2 / 4 — an exact
    anchor independent of the per-ray common phases."""
    return [
        oe.rectangle(2.0, 2.0, material="beamsplitter",
                     reflectivity=0.5).rotate((0, 1, 0), np.pi / 4),
        oe.rectangle(2.0, 2.0, material="mirror").rotate(
            (0, 1, 0), np.pi / 2).translate((-1.5 - arm_offset, 0, 0)),
        oe.rectangle(2.0, 2.0, material="mirror").rotate(
            (0, 1, 0), np.pi).translate((0, 0, 1.5)),
        oe.rectangle(2.0, 2.0, material="measure", name="output").rotate(
            (0, 1, 0), -np.pi / 2).translate((1.5, 0, 0)),
    ]


def run_michelson(arm_offset, n=256, bins=16):
    src = CollimatedSource(center=(0, 0, -2.0), direction=(0, 0, 1),
                           diameter=0.5, power=1.0, ray_count=n, seed=1)
    o, d, p = src.sample()
    rays = RayBatch.from_arrays(o, d, p, capacity=8 * n, wavelengths=WL)
    return Tracer().trace(
        None, michelson(arm_offset), trace_iterations=6, rays=rays,
        coherent=True, image_bins=bins, image_center=(1.5, 0.0, 0.0),
        image_normal=(1.0, 0.0, 0.0), image_halfwidth=1.0)


def test_two_beam_pixel_interference_exact():
    # two measured rays into the same pixel with a controlled OPL delta:
    # I = P1 + P2 + 2 sqrt(P1 P2) cos(2 pi delta / wl), exactly
    cfg = TraceConfig(coherent=True, image_bins=4, image_halfwidth=1.0)
    from lightpycl_tpu.tracer.step import accumulate_detector_arrays

    p1, p2, base = 0.8, 0.3, 7.25
    for delta in (0.0, WL / 8, WL / 4, WL / 2, 0.77 * WL):
        det = DetectorState.zeros(4, 4, 1, cfg.image_bins, coherent=True)
        hit = jnp.asarray([[0.1, 0.1, 0.0], [0.1, 0.1, 0.0]], jnp.float32)
        dirs = jnp.asarray([[0, 0, 1.0], [0, 0, 1.0]], jnp.float32)
        det = accumulate_detector_arrays(
            det, hit, dirs, jnp.asarray([p1, p2], jnp.float32),
            jnp.zeros(2, jnp.int32), cfg,
            opl=jnp.asarray([base, base + delta], jnp.float32),
            wavelength=jnp.full(2, WL, jnp.float32))
        amp = np.asarray(det.image_amp)
        intensity = (amp[0] ** 2 + amp[1] ** 2).sum()
        want = p1 + p2 + 2 * np.sqrt(p1 * p2) * np.cos(
            2 * np.pi * delta / WL)
        assert intensity == pytest.approx(want, abs=1e-4), delta
        # the incoherent image is untouched by phases
        assert np.asarray(det.image).sum() == pytest.approx(p1 + p2,
                                                            abs=1e-6)


def test_michelson_fringe_law():
    # per ray, both arm children share their pre-split phase, so the
    # pixel amplitude factorizes A(d) = (1 + e^{i 2 pi 2d/wl}) A(0)/2 and
    # the TOTAL intensity ratio is the two-beam law exactly — independent
    # of the (x-varying) common phases that mix rays within a pixel
    base = run_michelson(0.0)
    i0 = base.image_coherent.sum()
    assert i0 > 0
    for d, want in ((WL / 8, 0.5), (WL / 4, 0.0), (3 * WL / 8, 0.5),
                    (WL / 2, 1.0)):
        res = run_michelson(d)
        ratio = res.image_coherent.sum() / i0
        assert ratio == pytest.approx(
            (1 + np.cos(4 * np.pi * d / WL)) / 2, abs=2e-3), d
        # incoherent physics is oblivious to the offset
        assert res.image.sum() == pytest.approx(base.image.sum(), rel=1e-5)
        assert res.detector_power("output") == pytest.approx(
            base.detector_power("output"), rel=1e-5)


def test_multichip_coherent_matches_device():
    src = CollimatedSource(center=(0, 0, -2.0), direction=(0, 0, 1),
                           diameter=0.5, power=1.0, ray_count=256, seed=3)
    o, d, p = src.sample()
    kw = dict(trace_iterations=6, coherent=True, image_bins=8,
              image_center=(1.5, 0.0, 0.0), image_normal=(1.0, 0.0, 0.0),
              image_halfwidth=1.0)
    els = michelson(WL / 8)
    r1 = Tracer().trace(None, els, rays=RayBatch.from_arrays(
        o, d, p, capacity=2048, wavelengths=WL), **kw)
    r8 = Tracer().trace(None, els, rays=RayBatch.from_arrays(
        o, d, p, capacity=2048, wavelengths=WL), mode="multichip", **kw)
    np.testing.assert_allclose(r8.image_amp, r1.image_amp, atol=1e-5)
    np.testing.assert_allclose(r8.image_coherent, r1.image_coherent,
                               atol=1e-5)


def test_batched_driver_carries_coherent(tmp_path):
    # trace_batched sums amplitudes across batches (linear superposition
    # only holds for deterministic per-batch ray sets, which the batched
    # driver's seeded generation provides) and checkpoint-resume must not
    # double-count
    els = michelson(0.0)
    src = CollimatedSource(center=(0, 0, -2.0), direction=(0, 0, 1),
                           diameter=0.5, power=1.0, ray_count=128,
                           wavelength=WL)
    kw = dict(source=src, total_rays=512, batch_size=128, elements=els,
              seed=9, capacity=512)
    tr = Tracer(TraceConfig(trace_iterations=6, coherent=True, image_bins=8,
                            image_center=(1.5, 0.0, 0.0),
                            image_normal=(1.0, 0.0, 0.0),
                            image_halfwidth=1.0))
    full = tr.trace_batched(**kw)
    assert full.image_amp is not None
    assert full.image_coherent.sum() > 0
    ck = str(tmp_path / "coh.npz")
    tr2 = Tracer(tr.cfg)
    tr2.trace_batched(**kw, checkpoint_path=ck, max_batches=2)
    resumed = tr2.trace_batched(**kw, checkpoint_path=ck)
    np.testing.assert_allclose(resumed.image_amp, full.image_amp,
                               atol=1e-5)


def test_validation_errors():
    els = michelson(0.0)
    src = CollimatedSource(center=(0, 0, -2.0), direction=(0, 0, 1),
                           diameter=0.5, power=1.0, ray_count=16)
    with pytest.raises(ValueError, match="image_bins"):
        Tracer().trace(src, els, coherent=True)
    with pytest.raises(ValueError, match="image"):
        Tracer().trace_spectral(src, [0.4, 0.6], elements=els,
                                coherent=True)


def test_incoherent_runs_unchanged():
    # coherent off: image_amp stays (2, 1, 1) zeros and TraceResult
    # exposes None
    src = CollimatedSource(center=(0, 0, -2.0), direction=(0, 0, 1),
                           diameter=0.5, power=1.0, ray_count=64, seed=2)
    res = Tracer().trace(src, michelson(0.0), trace_iterations=4,
                         image_bins=8, image_center=(1.5, 0, 0),
                         image_normal=(1, 0, 0))
    assert res.image_amp is None
    with pytest.raises(ValueError, match="coherent"):
        _ = res.image_complex


class TestWhiteLight:
    """Spectral coherent imaging: per-wavelength field planes; wavelengths
    are mutually incoherent, so the white-light pattern is the sum of the
    per-lambda intensities — with the physical coherence envelope."""

    WLS = [0.46, 0.50, 0.54, 0.58]

    def run(self, arm_d, n=128):
        src = CollimatedSource(center=(0, 0, -2.0), direction=(0, 0, 1),
                               diameter=0.5, power=1.0, ray_count=n,
                               seed=1)
        return Tracer().trace_spectral(
            src, self.WLS, elements=michelson(arm_d), trace_iterations=6,
            capacity=8 * n, coherent=True, image_bins=16,
            image_center=(1.5, 0.0, 0.0), image_normal=(1.0, 0.0, 0.0),
            image_halfwidth=1.0)

    def test_white_light_fringe_superposition(self):
        base = self.run(0.0)
        amp0 = base.image_amp_spectral
        assert amp0.shape == (4, 2, 16, 16)
        i_w0 = (amp0[:, 0] ** 2 + amp0[:, 1] ** 2).sum(axis=(1, 2))  # (W,)
        assert (i_w0 > 0).all()
        assert base.image_coherent.sum() == pytest.approx(i_w0.sum(),
                                                          rel=1e-6)
        # every arm offset scales EACH wavelength plane by its own
        # two-beam factor; the total is their incoherent sum — exact
        for d in (0.1, 0.25, 0.6, 1.1):
            res = self.run(d)
            want = sum(
                iw * (1 + np.cos(4 * np.pi * d / wl)) / 2
                for iw, wl in zip(i_w0, self.WLS))
            assert res.image_coherent.sum() == pytest.approx(
                want, rel=5e-3), d

    def test_coherence_envelope_washout(self):
        # balanced arms: full contrast. Arm offset far beyond the
        # coherence length lc ~ lambda^2 / dlambda: fringes wash out and
        # the total tends to half the balanced (fully constructive) sum
        base = self.run(0.0).image_coherent.sum()
        far = self.run(13.07).image_coherent.sum()  # ~50 waves, spread phases
        assert far < 0.75 * base

    def test_single_wavelength_matches_scalar_coherent(self):
        # W=1 spectral coherent == the scalar coherent trace, field-exact
        src = CollimatedSource(center=(0, 0, -2.0), direction=(0, 0, 1),
                               diameter=0.5, power=1.0, ray_count=64,
                               seed=2)
        o, d, p = src.sample()
        kw = dict(image_bins=8, image_center=(1.5, 0.0, 0.0),
                  image_normal=(1.0, 0.0, 0.0), image_halfwidth=1.0)
        els = michelson(WL / 8)
        r_sp = Tracer().trace_spectral(
            None, [WL], elements=els, trace_iterations=6, coherent=True,
            rays=RayBatch.from_arrays(o, d, p, capacity=512), **kw)
        r_sc = Tracer().trace(
            None, els, trace_iterations=6, coherent=True,
            rays=RayBatch.from_arrays(o, d, p, capacity=512,
                                      wavelengths=WL), **kw)
        np.testing.assert_allclose(r_sp.image_amp_spectral[0],
                                   r_sc.image_amp, atol=1e-5)
        np.testing.assert_allclose(r_sp.image_coherent, r_sc.image_coherent,
                                   atol=1e-5)

    def test_shared_method_refused(self):
        src = CollimatedSource(center=(0, 0, -2.0), direction=(0, 0, 1),
                               diameter=0.5, power=1.0, ray_count=16)
        with pytest.raises(ValueError, match="batched"):
            Tracer().trace_spectral(src, [0.5, 0.6],
                                    elements=michelson(0.0),
                                    method="shared", coherent=True,
                                    image_bins=8)
