"""Volume (participating-media) scattering: turbid dielectric bulk with
free paths ~ Exp(mu_s) and Henyey-Greenstein direction redraw (extension
over the reference, which has no volumetric physics — SURVEY.md §1 scalar
surface optics only).

Anchors are analytic radiative-transfer facts, not a numeric oracle (the
process is stochastic, like Material.DIFFUSE):
  * ballistic (unscattered) extinction e^{-(mu_s + mu_a) L} — the
    Beer-Lambert law for the coherent beam,
  * Henyey-Greenstein first moment <cos theta> = g,
  * exact power-conservation ledger through arbitrary scatter chains,
  * determinism per seed.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import lightpycl_tpu as L
from lightpycl_tpu import physics
from lightpycl_tpu.sources import CollimatedSource
from lightpycl_tpu.tracer.config import TraceConfig
from lightpycl_tpu.tracer.engine import Tracer
from lightpycl_tpu.tracer.oracle import trace_oracle


class TestHGSampler:
    def _moments(self, g, n=120_000, seed=0):
        d = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32), (n, 1))
        gv = jnp.full((n,), g, jnp.float32)
        out = physics.sample_henyey_greenstein(jax.random.key(seed), d, gv)
        out = np.asarray(out)
        norms = np.linalg.norm(out, axis=1)
        np.testing.assert_allclose(norms, 1.0, atol=1e-5)
        cos = out[:, 2]
        return cos.mean(), cos.var()

    @pytest.mark.parametrize("g", [0.0, 0.3, 0.7, 0.95, -0.4])
    def test_mean_cosine_is_g(self, g):
        # <cos> = g is THE defining property of the HG phase function
        mean, _ = self._moments(g)
        # MC tolerance: std(cos) <= 1/sqrt(3) -> sem ~ 0.0017 at 120k
        assert abs(mean - g) < 0.01, (mean, g)

    def test_isotropic_limit(self):
        # g = 0: cos uniform on [-1, 1] -> var = 1/3; azimuth uniform
        mean, var = self._moments(0.0)
        assert abs(mean) < 0.01
        assert abs(var - 1.0 / 3.0) < 0.01

    def test_second_moment_matches_independent_inversion(self):
        # cross-check the jax sampler's first two moments against a
        # direct float64 numpy inversion of the HG CDF (independent code
        # path, independent RNG)
        g = 0.6
        rng = np.random.default_rng(7)
        u = rng.uniform(size=200_000)
        frac = (1.0 - g * g) / (1.0 + g - 2.0 * g * u)
        cos_ref = (1.0 + g * g - frac * frac) / (2.0 * g)
        _, var = self._moments(g)
        mean, _ = self._moments(g)
        assert abs(mean - cos_ref.mean()) < 0.01
        assert abs((var + mean**2) - (cos_ref**2).mean()) < 0.01


def _slab_scene(mu_s, mu_a=0.0, g=0.0, ior=1.0, thickness=2.0):
    """Index-matched (or glass) turbid slab + far screen + enclosure."""
    oe = L.optical_elements()
    slab = oe.cube((6.0, 6.0, thickness),
                   center=(0, 0, 1.0 + thickness / 2.0),
                   material="refractive", ior=ior,
                   scattering=mu_s, scatter_g=g, absorption=mu_a)
    screen = oe.rectangle(width=30.0, depth=30.0, center=(0, 0, 10.0),
                          material="measure", name="screen")
    sphere = L.optical_elements().sphere(radius=40.0, material="measure",
                                         name="enclosure")
    return [slab, screen, sphere]


def _ballistic_power(res, beam_radius):
    """Power arriving on the screen undeviated: original +z direction AND
    within the original beam footprint."""
    on_screen = res.measured_det == 0
    dz = res.measured_dir[:, 2]
    r = np.linalg.norm(res.measured_pos[:, :2], axis=1)
    sel = on_screen & (dz > 0.99999) & (r < beam_radius + 1e-3)
    return res.measured_power[sel].sum()


class TestBallisticExtinction:
    @pytest.mark.parametrize("mu_s,mu_a", [(1.0, 0.0), (0.5, 0.5),
                                           (0.25, 0.0)])
    def test_beer_lambert_coherent_beam(self, mu_s, mu_a):
        """The unscattered fraction through thickness L is
        e^{-(mu_s + mu_a) L} exactly (Beer-Lambert extinction of the
        ballistic beam) — scattering and absorption extinguish it
        identically even though the scattered power survives."""
        thickness = 2.0
        els = _slab_scene(mu_s, mu_a=mu_a, thickness=thickness)
        n = 40_000
        src = CollimatedSource(center=(0, 0, 0), direction=(0, 0, 1),
                               diameter=0.4, power=1.0, ray_count=n)
        res = Tracer().trace(src, els, trace_iterations=30,
                             capacity=4 * n)
        assert res.power_conservation_error() < 1e-4
        got = _ballistic_power(res, beam_radius=0.2)
        want = np.exp(-(mu_s + mu_a) * thickness)
        # MC error ~ sqrt((1-p)/(p n)): <= 1.8% at p = e^-2, n = 40k
        assert got == pytest.approx(want, rel=0.05), (got, want)

    def test_forward_anisotropy_raises_forward_flux(self):
        """g = 0.9 keeps scattered power forward vs g = 0 (same mu_s):
        the screen-side flux must rise and the back-hemisphere flux drop."""
        n = 20_000
        src = CollimatedSource(center=(0, 0, 0), direction=(0, 0, 1),
                               diameter=0.4, power=1.0, ray_count=n)

        def forward_backward(g, seed):
            els = _slab_scene(2.0, g=g)
            res = Tracer(TraceConfig(seed=seed)).trace(
                src, els, trace_iterations=40, capacity=4 * n)
            assert res.power_conservation_error() < 1e-4
            enc = res.measured_det == 1
            fz = res.measured_pos[enc, 2] > 0.0
            fwd = (res.measured_power[enc][fz].sum()
                   + res.measured_power[res.measured_det == 0].sum())
            bwd = res.measured_power[enc][~fz].sum()
            return fwd, bwd

        f0, b0 = forward_backward(0.0, seed=1)
        f9, b9 = forward_backward(0.9, seed=1)
        assert f9 > f0 + 0.05
        assert b9 < b0 - 0.05


class TestConservationAndPlumbing:
    def test_turbid_glass_fresnel_ledger(self):
        """Scattering inside REAL glass (n = 1.5): Fresnel splitting at
        the faces, multiple internal scatter/TIR chains — the ledger must
        still close exactly."""
        els = _slab_scene(1.5, mu_a=0.3, g=0.5, ior=1.5)
        n = 8_000
        src = CollimatedSource(center=(0, 0, 0), direction=(0, 0, 1),
                               diameter=0.4, power=1.0, ray_count=n)
        res = Tracer().trace(src, els, trace_iterations=30,
                             capacity=8 * n)
        assert res.power_conservation_error() < 1e-4
        assert res.ledger["absorbed"] > 0.1  # mu_a really acting
        assert res.hist.sum() == pytest.approx(res.ledger["measured"],
                                               abs=1e-4)

    def test_deterministic_per_seed(self):
        els = _slab_scene(1.0, g=0.3)
        src = CollimatedSource(center=(0, 0, 0), direction=(0, 0, 1),
                               diameter=0.4, power=1.0, ray_count=2048)
        r1 = Tracer(TraceConfig(seed=5)).trace(src, els,
                                               trace_iterations=12,
                                               capacity=8192)
        r2 = Tracer(TraceConfig(seed=5)).trace(src, els,
                                               trace_iterations=12,
                                               capacity=8192)
        r3 = Tracer(TraceConfig(seed=6)).trace(src, els,
                                               trace_iterations=12,
                                               capacity=8192)
        assert r1.ledger == r2.ledger
        assert r1.ledger["measured"] != r3.ledger["measured"]

    def test_multichip_ledger_closes(self):
        """Sharded trace of a turbid scene: per-shard RNG streams differ
        from the single-device draw (documented, like roulette), but the
        psum'd ledger must close exactly."""
        els = _slab_scene(1.0, g=0.2)
        src = CollimatedSource(center=(0, 0, 0), direction=(0, 0, 1),
                               diameter=0.4, power=1.0, ray_count=2048)
        res = Tracer().trace(src, els, trace_iterations=12,
                             capacity=8192, mode="multichip")
        assert res.power_conservation_error() < 1e-4

    def test_mesh_validation(self):
        oe = L.optical_elements()
        with pytest.raises(ValueError, match="REFRACTIVE"):
            oe.cube(1.0, material="mirror", scattering=1.0)
        with pytest.raises(ValueError, match="scatter_g"):
            oe.cube(1.0, material="refractive", scattering=1.0,
                    scatter_g=1.0)
        with pytest.raises(ValueError, match=">= 0"):
            oe.cube(1.0, material="refractive", scattering=-0.5)

    def test_oracle_refuses_turbid_scenes(self):
        els = _slab_scene(1.0)
        with pytest.raises(ValueError, match="deterministic"):
            trace_oracle(els, np.zeros((4, 3)),
                         np.tile([0.0, 0.0, 1.0], (4, 1)),
                         np.full(4, 0.25))

    def test_spectral_shared_refuses_turbid(self):
        els = _slab_scene(1.0)
        src = CollimatedSource(center=(0, 0, 0), direction=(0, 0, 1),
                               diameter=0.4, power=1.0, ray_count=512)
        with pytest.raises(ValueError, match="batched"):
            Tracer().trace_spectral(src, [0.45, 0.55], elements=els,
                                    trace_iterations=4, capacity=2048,
                                    method="shared")

    def test_spectral_batched_traces_turbid(self):
        """method='auto' must fall through to the wavelength-batched path
        and close every per-lambda ledger column."""
        els = _slab_scene(1.0)
        src = CollimatedSource(center=(0, 0, 0), direction=(0, 0, 1),
                               diameter=0.4, power=1.0, ray_count=512)
        res = Tracer().trace_spectral(src, [0.45, 0.55], elements=els,
                                      trace_iterations=10, capacity=4096)
        lw = res.spectral_ledger
        assert lw is not None
        open_w = lw["emitted"] - (lw["measured"] + lw["absorbed"]
                                  + lw["escaped"] + lw["culled"])
        assert (np.abs(open_w) < 2e-4 + res.final_live_power).all()

    def test_clear_scene_bit_identical_with_flag_off(self):
        """A scene with NO turbid elements must trace bit-identically
        whether or not the has_scattering machinery exists (the engine
        gates it off; columns are inert zeros)."""
        oe = L.optical_elements()
        els = [oe.cube((4, 4, 1), center=(0, 0, 1.5), material="refractive",
                       ior=1.5),
               oe.rectangle(width=20.0, depth=20.0, center=(0, 0, 6.0),
                            material="measure", name="screen")]
        src = CollimatedSource(center=(0, 0, 0), direction=(0, 0, 1),
                               diameter=0.4, power=1.0, ray_count=1024)
        r_off = Tracer().trace(src, els, trace_iterations=8, capacity=4096)
        r_on = Tracer(TraceConfig(has_scattering=True, seed=0)).trace(
            src, els, trace_iterations=8, capacity=4096)
        # engine turns the flag back off (no turbid elements) -> identical
        assert r_off.ledger == r_on.ledger
