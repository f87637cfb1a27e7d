"""Binary ray-file IO (io/rayfile.py): LPR1 round trip, measured-ray
export, replay/resampling source semantics, rigid placement, per-ray
wavelength/Stokes coherence, and the device batch path.

The reference has no ray-file IO (SURVEY.md §3 — measured rays live in
host lists); these tests pin the additive extension: a ray set written by
one trace re-emits as a source with exact power bookkeeping (replay) or as
an unbiased power-proportional resampling."""

import numpy as np
import pytest

import lightpycl_tpu as L
from lightpycl_tpu.io.rayfile import (RayFileData, RayFileSource,
                                      load_rayfile, save_measured_rayfile,
                                      save_rayfile)
from lightpycl_tpu.sources import CollimatedSource
from lightpycl_tpu.tracer.config import TraceConfig
from lightpycl_tpu.tracer.engine import Tracer

oe = L.optical_elements(n_segments=24, n_radial=8)


def _rays(n, seed=0):
    rng = np.random.default_rng(seed)
    o = rng.normal(size=(n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    p = rng.uniform(0.1, 2.0, n).astype(np.float32)
    return o, d.astype(np.float32), p


class TestFormat:
    def test_round_trip_minimal(self, tmp_path):
        o, d, p = _rays(37)
        path = tmp_path / "a.lpr"
        assert save_rayfile(path, o, d, p) == 37
        back = load_rayfile(path)
        np.testing.assert_array_equal(back.origins, o)
        np.testing.assert_array_equal(back.directions, d)
        np.testing.assert_array_equal(back.powers, p)
        assert back.wavelengths is None and back.stokes is None
        assert back.opl is None
        assert back.total_power == pytest.approx(float(p.sum()), rel=1e-6)

    def test_round_trip_all_blocks(self, tmp_path):
        o, d, p = _rays(21, seed=1)
        wl = np.linspace(0.4, 0.7, 21).astype(np.float32)
        st = np.random.default_rng(2).uniform(-1, 1, (21, 3)).astype(np.float32)
        opl = np.arange(21, dtype=np.float32)
        path = tmp_path / "b.lpr"
        save_rayfile(path, o, d, p, wavelengths=wl, stokes=st, opl=opl)
        back = load_rayfile(path)
        np.testing.assert_array_equal(back.wavelengths, wl)
        np.testing.assert_array_equal(back.stokes, st)
        np.testing.assert_array_equal(back.opl, opl)

    def test_scalar_stokes_broadcasts(self, tmp_path):
        o, d, p = _rays(5)
        path = tmp_path / "c.lpr"
        save_rayfile(path, o, d, p, stokes=np.array([1.0, 0.0, 0.0]))
        back = load_rayfile(path)
        assert back.stokes.shape == (5, 3)
        np.testing.assert_array_equal(back.stokes[:, 0], np.ones(5))

    def test_bad_magic_rejected(self, tmp_path):
        path = tmp_path / "junk.lpr"
        path.write_bytes(b"NOPE" + b"\x00" * 64)
        with pytest.raises(ValueError, match="magic"):
            load_rayfile(path)

    def test_truncation_rejected(self, tmp_path):
        o, d, p = _rays(10)
        path = tmp_path / "t.lpr"
        save_rayfile(path, o, d, p)
        blob = path.read_bytes()
        path.write_bytes(blob[:-8])
        with pytest.raises(ValueError, match="truncated"):
            load_rayfile(path)

    def test_shape_mismatch_rejected(self, tmp_path):
        o, d, p = _rays(4)
        with pytest.raises(ValueError, match="shape"):
            save_rayfile(tmp_path / "x.lpr", o, d[:3], p)


class TestSource:
    def test_replay_is_exact(self):
        o, d, p = _rays(50, seed=3)
        src = RayFileSource(RayFileData(o, d, p))
        oo, dd, pp = src.sample()
        np.testing.assert_allclose(oo, o, rtol=1e-6)
        np.testing.assert_allclose(dd, d, rtol=1e-6)
        np.testing.assert_allclose(pp, p, rtol=1e-6)
        assert pp.sum() == pytest.approx(p.sum(), rel=1e-6)

    def test_power_rescale(self):
        o, d, p = _rays(50, seed=3)
        src = RayFileSource(RayFileData(o, d, p), power=2.5)
        _, _, pp = src.sample()
        assert pp.sum() == pytest.approx(2.5, rel=1e-6)

    def test_resampling_unbiased_and_equal_power(self):
        # resampled rays carry equal power summing to the file total, and
        # the power-weighted mean direction is preserved (unbiased draw)
        o, d, p = _rays(200, seed=4)
        data = RayFileData(o, d, p)
        src = RayFileSource(data, ray_count=40_000, seed=7)
        oo, dd, pp = src.sample()
        assert oo.shape == (40_000, 3)
        assert np.allclose(pp, pp[0])
        assert pp.sum() == pytest.approx(float(np.sum(p, dtype=np.float64)),
                                         rel=1e-6)
        want = (p[:, None] * d).sum(0) / p.sum()
        got = dd.mean(0)
        np.testing.assert_allclose(got, want, atol=0.02)

    def test_rigid_placement(self):
        o = np.zeros((3, 3), np.float32)
        o[:, 0] = [1.0, 2.0, 3.0]
        d = np.tile(np.array([[1.0, 0, 0]], np.float32), (3, 1))
        p = np.ones(3, np.float32)
        # rotate +x into +y about z, then translate by (0, 0, 5)
        src = RayFileSource(RayFileData(o, d, p), translate=(0, 0, 5),
                            rotate=((0, 0, 1), np.pi / 2))
        oo, dd, _ = src.sample()
        np.testing.assert_allclose(dd, [[0, 1, 0]] * 3, atol=1e-6)
        np.testing.assert_allclose(oo[:, 1], [1, 2, 3], atol=1e-6)
        np.testing.assert_allclose(oo[:, 2], [5, 5, 5], atol=1e-6)

    def test_wavelength_stokes_index_coherent(self):
        # wavelength and Stokes rows must follow the SAME resampled indices
        # as the geometry: encode the ray index in all of dir-x, wavelength,
        # and s1, then check the columns agree row-by-row after resampling
        n = 64
        idx = np.arange(n, dtype=np.float32)
        o = np.zeros((n, 3), np.float32)
        d = np.stack([idx, np.zeros(n), np.ones(n)], axis=1).astype(np.float32)
        wl = 0.4 + 0.001 * idx
        st = np.stack([idx, np.zeros(n), np.zeros(n)], axis=1)
        data = RayFileData(o, d, np.ones(n, np.float32),
                           wavelengths=wl.astype(np.float32),
                           stokes=st.astype(np.float32))
        src = RayFileSource(data, ray_count=500, seed=1)
        _, dd, _ = src.sample()
        got_wl = src.sample_wavelengths()
        s1, s2, s3 = src.stokes
        np.testing.assert_allclose(got_wl, 0.4 + 0.001 * dd[:, 0], rtol=1e-5)
        np.testing.assert_allclose(s1, dd[:, 0], rtol=1e-5)

    def test_empty_and_zero_power_rejected(self):
        with pytest.raises(ValueError, match="zero rays"):
            RayFileSource(RayFileData(np.zeros((0, 3), np.float32),
                                      np.zeros((0, 3), np.float32),
                                      np.zeros(0, np.float32)))
        o, d, _ = _rays(4)
        with pytest.raises(ValueError, match="zero total power"):
            RayFileSource(RayFileData(o, d, np.zeros(4, np.float32)))


class TestSplitSimulation:
    """The workflow the format exists for: trace to an intermediate
    measure surface once, re-emit the recorded rays downstream."""

    def _first_stage(self, tmp_path):
        # collimated beam onto a 0.9-reflectivity dish, measured on a dome
        els = [oe.parabolic_mirror(0.5, 2.0, reflectivity=0.9),
               oe.hemisphere(10.0, name="dome")]
        src = CollimatedSource(center=(0, 0, 3), direction=(0, 0, -1),
                               diameter=1.5, ray_count=512)
        tr = Tracer(TraceConfig(trace_iterations=4))
        res = tr.trace(src, elements=els, mode="host")
        path = tmp_path / "dome.lpr"
        n = save_measured_rayfile(path, res, detector="dome", flip=True)
        assert n == res.measured_pos.shape[0]
        return res, path

    def test_export_then_replay_conserves_power(self, tmp_path):
        res, path = self._first_stage(tmp_path)
        src2 = RayFileSource(path)
        o, d, p = src2.sample()
        assert p.sum() == pytest.approx(res.ledger["measured"], rel=1e-5)
        # flipped rays point back INTO the dome (toward the axis region)
        r = np.linalg.norm(o, axis=1)
        assert np.all(r > 1.0)  # they sit on the dome
        inward = np.einsum("ij,ij->i", d, -o / r[:, None])
        assert np.mean(inward > 0) > 0.95

    def test_second_stage_trace(self, tmp_path):
        res, path = self._first_stage(tmp_path)
        # re-emit inside a fresh absorbing box and catch on a small disc:
        # everything the ray file carries must be accounted for again
        src2 = RayFileSource(path)
        els2 = [oe.hemisphere(12.0, name="outer")]
        tr2 = Tracer(TraceConfig(trace_iterations=3))
        res2 = tr2.trace(src2, elements=els2, mode="host")
        led = res2.ledger
        acc = (led["measured"] + led["absorbed"] + led["escaped"]
               + led["culled"])
        assert acc == pytest.approx(led["emitted"], rel=1e-5)
        assert led["emitted"] == pytest.approx(res.ledger["measured"],
                                               rel=1e-5)
        # flipped dome rays re-converge through the dome interior and out
        # the open equator plane or onto the outer dome
        assert led["measured"] + led["escaped"] == pytest.approx(
            led["emitted"], rel=1e-3)

    def test_batched_device_path(self, tmp_path):
        res, path = self._first_stage(tmp_path)
        src2 = RayFileSource(path, seed=3)
        els2 = [oe.hemisphere(12.0, name="outer")]
        tr2 = Tracer(TraceConfig(trace_iterations=3))
        res2 = tr2.trace_batched(src2, total_rays=1024, batch_size=256,
                                 elements=els2)
        led = res2.ledger
        acc = (led["measured"] + led["absorbed"] + led["escaped"]
               + led["culled"])
        assert acc == pytest.approx(led["emitted"], rel=1e-5)
        assert led["emitted"] == pytest.approx(res.ledger["measured"],
                                               rel=1e-3)

    def test_unpolarized_trace_skips_stokes_block(self, tmp_path):
        _, path = self._first_stage(tmp_path)
        assert load_rayfile(path).stokes is None
