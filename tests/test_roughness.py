"""Rough-mirror surface scatter (extension over the reference's ideal
mirrors — SURVEY.md §3 Materials): Rayleigh-Rice total integrated
scatter, TIS = 1 - exp(-(4 pi sigma cos(theta_i) n / lambda)^2), split
DETERMINISTICALLY into a specular child x (1 - TIS) and an HG-lobe
scattered child x TIS.

Because the split is deterministic (only the lobe direction is random),
the TIS anchors are EXACT per realization, not MC estimates.
"""

import numpy as np
import pytest

import lightpycl_tpu as L
from lightpycl_tpu.sources import CollimatedSource
from lightpycl_tpu.tracer.config import TraceConfig
from lightpycl_tpu.tracer.engine import Tracer

WL = 0.5876  # d-line default [um]


def _scene(sigma, lobe=0.7, refl=0.9, metal=None, tilt=0.0):
    oe = L.optical_elements()
    kw = dict(material="mirror", reflectivity=refl,
              roughness=sigma, roughness_lobe=lobe)
    if metal:
        kw.update(metal_n=metal[0], metal_k=metal[1])
    mirror = oe.rectangle(6.0, 6.0, center=(0, 0, 0), **kw)
    if tilt:
        mirror.rotate((1.0, 0.0, 0.0), tilt)
    mirror.translate((0, 0, 2.0))
    world = L.optical_elements().sphere(radius=30.0, material="measure",
                                        name="world")
    return [mirror, world]


def _beam(n=4000, wavelength=None):
    return CollimatedSource(center=(0, 0, 0), direction=(0, 0, 1),
                            diameter=0.4, power=1.0, ray_count=n,
                            **({"wavelength": wavelength} if wavelength
                               else {}))


def _spec_scat(res, spec_dir):
    """Split measured power into exactly-specular vs scattered."""
    cosd = res.measured_dir @ np.asarray(spec_dir, np.float64)
    pw = res.measured_power
    sel = cosd > 1.0 - 1e-5
    return pw[sel].sum(), pw[~sel].sum()


def tis_theory(sigma, wl=WL, cos_i=1.0, n=1.0):
    return 1.0 - np.exp(-(4.0 * np.pi * sigma * cos_i * n / wl) ** 2)


class TestTIS:
    @pytest.mark.parametrize("sigma", [0.005, 0.02, 0.06])
    def test_normal_incidence_exact(self, sigma):
        """The specular/scattered split IS the Rayleigh-Rice TIS — exact,
        because the split is deterministic."""
        res = Tracer().trace(_beam(), _scene(sigma), trace_iterations=4,
                             capacity=16_000)
        assert res.power_conservation_error() < 1e-4
        spec, scat = _spec_scat(res, (0, 0, -1))
        tis = tis_theory(sigma)
        assert spec == pytest.approx(0.9 * (1.0 - tis), abs=2e-4)
        assert scat == pytest.approx(0.9 * tis, abs=2e-4)
        # the reflectivity deficit is absorbed exactly as for a smooth
        # mirror
        assert res.ledger["absorbed"] == pytest.approx(0.1, abs=2e-4)

    def test_wavelength_scaling(self):
        """sigma/lambda scaling: blue scatters more than red off the SAME
        surface — each exactly per formula."""
        sigma = 0.02
        for wl in (0.45, 0.65):
            res = Tracer().trace(_beam(wavelength=wl), _scene(sigma),
                                 trace_iterations=4, capacity=16_000)
            spec, scat = _spec_scat(res, (0, 0, -1))
            assert scat == pytest.approx(0.9 * tis_theory(sigma, wl=wl),
                                         abs=2e-4), wl

    def test_grazing_incidence_scatters_less(self):
        """TIS carries cos(theta_i): a 60-degree tilt (cos = 0.5) must
        reproduce the halved-argument TIS exactly — why grazing-incidence
        X-ray mirrors work at all."""
        sigma = 0.04
        res = Tracer().trace(_beam(), _scene(sigma, tilt=np.pi / 6),
                             trace_iterations=4, capacity=16_000)
        assert res.power_conservation_error() < 1e-4
        # mirror tilted 30 deg about x: normal (0, sin30, -cos30), beam +z
        # -> cos(theta_i) = cos(30 deg)... compute from geometry instead:
        nrm = np.array([0.0, np.sin(np.pi / 6), -np.cos(np.pi / 6)])
        cos_i = abs(nrm @ np.array([0.0, 0.0, 1.0]))
        d_spec = np.array([0.0, 0.0, 1.0]) - 2 * cos_i * (-nrm)
        d_spec /= np.linalg.norm(d_spec)
        spec, scat = _spec_scat(res, d_spec)
        assert scat == pytest.approx(
            0.9 * tis_theory(sigma, cos_i=cos_i), abs=3e-4)

    def test_lobe_anisotropy_concentrates_forward(self):
        """Higher roughness_lobe keeps scattered power closer to the
        specular direction. The unfolded HG first moment is g; folding
        below-horizon draws back above the surface can only RAISE the
        mean cosine (strongly for small g, negligibly for g -> 1 where
        almost nothing draws backward)."""
        def mean_cos(lobe):
            res = Tracer().trace(_beam(20_000),
                                 _scene(0.2, lobe=lobe, refl=1.0),
                                 trace_iterations=4, capacity=80_000)
            cosd = res.measured_dir @ np.array([0.0, 0.0, -1.0])
            pw = res.measured_power
            sel = cosd <= 1.0 - 1e-5  # scattered only
            return (cosd[sel] * pw[sel]).sum() / pw[sel].sum()
        m3, m6, m9 = mean_cos(0.3), mean_cos(0.6), mean_cos(0.9)
        assert m3 < m6 < m9
        assert m3 > 0.3 and m6 > 0.6       # fold only raises
        assert m9 == pytest.approx(0.9, abs=0.03)  # fold negligible

    def test_scattered_stays_above_surface(self):
        """Below-horizon lobe draws are folded back: nothing may scatter
        THROUGH the mirror (all measured hits in the upper hemisphere,
        modulo the numerically-parallel rim)."""
        res = Tracer().trace(_beam(20_000), _scene(0.1, lobe=0.0),
                             trace_iterations=4, capacity=80_000)
        # mirror plane z = 2; all hits must be at or below... the beam
        # comes from -z, mirror faces -z, so everything returns to z < 2
        assert (res.measured_pos[:, 2] < 2.0 + 1e-3).all()


class TestComposition:
    def test_metal_rough_mirror(self):
        """Roughness composes with complex-index metal reflectance: both
        children scale by R_metal(theta), ledger exact."""
        res = Tracer().trace(
            _beam(), _scene(0.03, refl=1.0, metal=(0.9, 6.3)),  # ~aluminum
            trace_iterations=4, capacity=16_000)
        assert res.power_conservation_error() < 1e-4
        spec, scat = _spec_scat(res, (0, 0, -1))
        tis = tis_theory(0.03)
        # specular/scattered ratio is unaffected by the metal R factor
        assert spec / (spec + scat) == pytest.approx(1.0 - tis, abs=1e-3)
        assert res.ledger["absorbed"] > 0.05  # metal absorption real

    def test_polarized_scattered_depolarizes(self):
        """Under polarization=True the scattered child is depolarized
        while the specular child keeps the mirror Mueller state; ledger
        exact."""
        from lightpycl_tpu import analysis as A

        src = CollimatedSource(center=(0, 0, 0), direction=(0, 0, 1),
                               diameter=0.4, power=1.0, ray_count=8000,
                               stokes=(1.0, 0.0, 0.0))
        res = Tracer(TraceConfig(polarization=True)).trace(
            src, _scene(0.05, refl=1.0), trace_iterations=4,
            capacity=32_000)
        assert res.power_conservation_error() < 1e-4
        cosd = res.measured_dir @ np.array([0.0, 0.0, -1.0])
        spec = cosd > 1.0 - 1e-5
        dop_spec = A.degree_of_polarization(res.measured_stokes[spec],
                                            res.measured_power[spec])
        dop_scat = A.degree_of_polarization(res.measured_stokes[~spec],
                                            res.measured_power[~spec])
        assert dop_spec > 0.99
        assert dop_scat < 0.05

    def test_ghost_provenance_separates_the_halo(self):
        """track_paths assigns the specular child digit (1 + 2e) and the
        scattered child digit (2 + 2e): ghost analysis must rank exactly
        two paths off one rough mirror, with powers in the TIS ratio."""
        from lightpycl_tpu import analysis as A

        sigma = 0.03
        res = Tracer(TraceConfig(track_paths=True)).trace(
            _beam(), _scene(sigma, refl=1.0), trace_iterations=4,
            capacity=16_000, mode="host")
        paths = A.ghost_paths(res, top=5)
        assert len(paths) == 2
        tis = tis_theory(sigma)
        powers = sorted((p["power"] for p in paths), reverse=True)
        assert powers[0] == pytest.approx(1.0 - tis, abs=1e-3)
        assert powers[1] == pytest.approx(tis, abs=1e-3)

    def test_multichip_and_mesh2d_ledgers_close(self):
        """Rough scatter works under BOTH sharded modes (per-triangle
        columns gather collectively under mesh2d)."""
        from lightpycl_tpu.parallel.mesh2d import make_mesh2d

        els = _scene(0.04)
        src = _beam(2048)
        r1 = Tracer().trace(src, els, trace_iterations=4, capacity=8192,
                            mode="multichip")
        assert r1.power_conservation_error() < 1e-4
        r2 = Tracer().trace(src, els, trace_iterations=4, capacity=8192,
                            mode="mesh2d", mesh=make_mesh2d(2, 4))
        assert r2.power_conservation_error() < 1e-4


class TestPlumbing:
    def test_smooth_limit_identical(self):
        """sigma = 0 -> the engine gates the machinery off and the trace
        is bit-identical to a plain mirror scene."""
        oe = L.optical_elements()
        def run(**kw):
            m = oe.rectangle(6.0, 6.0, center=(0, 0, 2.0),
                             material="mirror", reflectivity=0.9, **kw)
            w = oe.sphere(radius=30.0, material="measure", name="world")
            return Tracer().trace(_beam(1024), [m, w],
                                  trace_iterations=4, capacity=4096)
        assert run().ledger == run(roughness=0.0).ledger

    def test_deterministic_per_seed(self):
        els = _scene(0.05, lobe=0.4)
        src = _beam(2048)
        r1 = Tracer(TraceConfig(seed=3)).trace(src, els,
                                               trace_iterations=4,
                                               capacity=8192)
        r2 = Tracer(TraceConfig(seed=3)).trace(src, els,
                                               trace_iterations=4,
                                               capacity=8192)
        assert r1.ledger == r2.ledger
        np.testing.assert_array_equal(r1.hist, r2.hist)

    def test_validation(self):
        oe = L.optical_elements()
        with pytest.raises(ValueError, match="MIRROR"):
            oe.cube(1.0, material="refractive", roughness=0.1)
        with pytest.raises(ValueError, match=">= 0"):
            oe.cube(1.0, material="mirror", roughness=-0.1)
        with pytest.raises(ValueError, match="roughness_lobe"):
            oe.cube(1.0, material="mirror", roughness=0.1,
                    roughness_lobe=1.0)
