"""Single-layer thin-film coating tests (extension over the reference,
which has bare Fresnel surfaces only; coat_thickness = 0 reproduces the
reference physics exactly).

Anchors: quarter-wave AR minimum R = ((n1 n2 - nf^2)/(n1 n2 + nf^2))^2 at
normal incidence, half-wave "absentee" layer R = bare Fresnel, TIR through
a coated interface (R = 1), and device-vs-oracle parity — the device path
uses complex Airy summation (physics.thin_film_rs_rp) while the f64 oracle
uses the characteristic-matrix method, so agreement is two independent
derivations of the same film.
"""

import numpy as np
import pytest

import lightpycl_tpu as L
from lightpycl_tpu.geometry.mesh import GeoObject
from lightpycl_tpu.materials import Material
from lightpycl_tpu.sources import CollimatedSource
from lightpycl_tpu.tracer.engine import Tracer
from lightpycl_tpu.tracer.oracle import trace_oracle
from lightpycl_tpu.tracer.rays import RayBatch

oe = L.optical_elements(n_segments=32, n_radial=12)

N_GLASS = 1.52
N_FILM = 1.38     # MgF2-ish
WL = 0.55         # design wavelength [um]
H_QW = WL / (4.0 * N_FILM)

R_BARE = ((1.0 - N_GLASS) / (1.0 + N_GLASS)) ** 2
R_QW = ((1.0 * N_GLASS - N_FILM**2) / (1.0 * N_GLASS + N_FILM**2)) ** 2


def _film_R(cos_i, n1, nf, n2, h, wl):
    import jax.numpy as jnp

    from lightpycl_tpu.physics import thin_film_reflectance

    arr = lambda x: jnp.atleast_1d(jnp.asarray(x, jnp.float32))
    return float(thin_film_reflectance(arr(cos_i), arr(n1), arr(nf),
                                       arr(n2), arr(h), arr(wl))[0])


class TestFilmFormula:
    def test_quarter_wave_minimum(self):
        assert _film_R(1.0, 1.0, N_FILM, N_GLASS, H_QW, WL) == pytest.approx(
            R_QW, abs=1e-6)
        assert R_QW < R_BARE / 3  # it is actually antireflective

    def test_half_wave_absentee(self):
        assert _film_R(1.0, 1.0, N_FILM, N_GLASS, WL / (2 * N_FILM), WL) == \
            pytest.approx(R_BARE, abs=1e-6)

    def test_zero_thickness_is_bare_fresnel(self):
        for deg in (0.0, 30.0, 60.0):
            ci = np.cos(np.radians(deg))
            ct = np.sqrt(1 - (1 / N_GLASS) ** 2 * (1 - ci * ci))
            rs = ((ci - N_GLASS * ct) / (ci + N_GLASS * ct)) ** 2
            rp = ((ct - N_GLASS * ci) / (ct + N_GLASS * ci)) ** 2
            assert _film_R(ci, 1.0, N_FILM, N_GLASS, 0.0, WL) == pytest.approx(
                0.5 * (rs + rp), abs=1e-6)

    def test_tir_through_coated_interface(self):
        # glass -> air beyond the 41.8 deg critical angle: film or not, all
        # power reflects
        ci = np.cos(np.radians(60.0))
        assert _film_R(ci, N_GLASS, N_FILM, 1.0, H_QW, WL) == pytest.approx(
            1.0, abs=1e-6)

    def test_spectral_selectivity(self):
        # the quarter-wave AR designed for 0.55 um reflects more in the blue
        # and red than at design
        r_design = _film_R(1.0, 1.0, N_FILM, N_GLASS, H_QW, WL)
        assert _film_R(1.0, 1.0, N_FILM, N_GLASS, H_QW, 0.40) > 1.5 * r_design
        assert _film_R(1.0, 1.0, N_FILM, N_GLASS, H_QW, 0.80) > 1.2 * r_design

    def test_oracle_matrix_matches_device_airy(self):
        from lightpycl_tpu.tracer.oracle import _film_reflectance_matrix

        rng = np.random.default_rng(0)
        for _ in range(50):
            deg = rng.uniform(0, 88)
            n1, nf, n2 = rng.uniform(1.0, 1.8, 3)
            h = rng.uniform(0.0, 0.5)
            wl = rng.uniform(0.4, 0.8)
            ci = np.cos(np.radians(deg))
            dev = _film_R(ci, n1, nf, n2, h, wl)
            ora = float(_film_reflectance_matrix(
                np.array([ci]), np.array([n1]), np.array([[nf]]),
                np.array([[h]]), np.array([n2]), np.array([wl]))[0])
            assert dev == pytest.approx(ora, abs=2e-5), (deg, n1, nf, n2, h)


def _window_scene(coated: bool):
    """Plane-parallel glass window normal to the beam, disc detectors fore
    and aft, absorbing enclosure."""
    win = oe.cube(size=(0.8, 0.8, 0.2), center=(0, 0, 0.0),
                  material="refractive", ior=N_GLASS, name="window",
                  **(dict(coat_ior=N_FILM, coat_thickness=H_QW) if coated
                     else {}))
    fwd = oe.disc(radius=1.2, center=(0, 0, 2.0), material="measure",
                  name="fwd")
    back = oe.disc(radius=1.2, material="measure",
                   name="back").rotate((1, 0, 0), np.pi).translate((0, 0, -2.0))
    shell = oe.sphere(radius=6.0, material="terminator")
    return [win, fwd, back, shell]


def _trace_window(coated, wavelength=WL, n_rays=256):
    src = CollimatedSource(center=(0, 0, -1.0), direction=(0, 0, 1),
                           diameter=0.3, ray_count=n_rays, power=1.0,
                           seed=11, wavelength=wavelength)
    return Tracer().trace(src, _window_scene(coated), trace_iterations=10,
                          capacity=4 * n_rays)


class TestCoatedWindowTrace:
    def test_normal_incidence_transmission_series(self):
        """Two coated surfaces at normal incidence: the multi-bounce
        transmitted sum is T^2 / (1 - R^2) with R the quarter-wave value
        (the exit pass sees the reversed lossless stack: same R)."""
        res = _trace_window(coated=True)
        R = R_QW
        T_pred = (1 - R) ** 2 / (1 - R * R)
        assert res.detector_power("fwd") == pytest.approx(T_pred, abs=2e-4)
        # reflected series back out the front
        R_pred = R + (1 - R) ** 2 * R / (1 - R * R)
        assert res.detector_power("back") == pytest.approx(R_pred, abs=2e-4)
        assert res.power_conservation_error() < 1e-5

    def test_ar_coating_beats_bare_window(self):
        t_bare = _trace_window(coated=False).detector_power("fwd")
        t_coat = _trace_window(coated=True).detector_power("fwd")
        # bare: T^2/(1-R^2) with R ~ 4.3% -> ~0.918; coated ~ 0.975
        assert t_coat > t_bare + 0.04
        R = R_BARE
        assert t_bare == pytest.approx((1 - R) ** 2 / (1 - R * R), abs=2e-4)

    def test_off_design_wavelength_transmits_less(self):
        t_design = _trace_window(True, wavelength=WL).detector_power("fwd")
        t_blue = _trace_window(True, wavelength=0.40).detector_power("fwd")
        assert t_blue < t_design - 0.005


class TestCoatedParity:
    def test_coated_lens_matches_oracle(self):
        lens = oe.biconvex_lens(0.8, 0.5, 0.1, ior=N_GLASS,
                                coat_ior=N_FILM, coat_thickness=H_QW)
        dome = L.optical_elements(24, 8).sphere(8.0, material="measure",
                                                name="dome")
        src = CollimatedSource(center=(0, 0, -0.6), direction=(0, 0, 1),
                               diameter=0.4, ray_count=512, power=1.0,
                               seed=5, wavelength=([0.45, 0.55, 0.65],
                                                   [1, 2, 1]))
        o, d, p = src.sample()
        wl = src.sample_wavelengths()
        res = Tracer().trace(src, [lens, dome], trace_iterations=7,
                             rays=RayBatch.from_arrays(o, d, p,
                                                       wavelengths=wl,
                                                       capacity=8192))
        ora = trace_oracle([lens, dome], o, d, p, trace_iterations=7,
                           wavelengths=wl)
        assert res.ledger["measured"] == pytest.approx(ora["measured"],
                                                       rel=1e-3)
        assert res.ledger["absorbed"] == pytest.approx(ora["absorbed"],
                                                       rel=1e-3, abs=1e-6)
        assert res.power_conservation_error() < 1e-5


N_HI, N_LO = 2.35, 1.46      # TiO2 / SiO2-ish


def _qw(n):
    return WL / (4.0 * n)


class TestMultilayer:
    """Multilayer stacks: device = bottom-up Airy recursion, oracle =
    characteristic-matrix product — two independent formulations."""

    def _R(self, layers, n1=1.0, ns=N_GLASS, cos_i=1.0, wl=WL):
        import jax.numpy as jnp

        from lightpycl_tpu.physics import multilayer_reflectance

        arr = lambda x: jnp.atleast_1d(jnp.asarray(x, jnp.float32))
        return float(multilayer_reflectance(
            arr(cos_i), arr(n1), [arr(n) for n, _ in layers],
            [arr(h) for _, h in layers], arr(ns), arr(wl))[0])

    def test_two_layer_v_coat_nulls_reflection(self):
        # quarter-quarter stack: R = ((n0 n2^2 - ns n1^2)/(...+...))^2
        layers = [(N_FILM, _qw(N_FILM)), (1.7, _qw(1.7))]
        pred = ((1.0 * 1.7**2 - N_GLASS * N_FILM**2)
                / (1.0 * 1.7**2 + N_GLASS * N_FILM**2)) ** 2
        assert self._R(layers) == pytest.approx(pred, abs=1e-6)
        assert self._R(layers) < 1e-5  # ~perfect AR at design

    def test_hr_quarter_stack_admittance_ladder(self):
        # (HL)^N quarter stack: Y = (nH/nL)^(2N) ns -> R = ((1-Y)/(1+Y))^2
        for N in (2, 4):
            layers = [(N_HI, _qw(N_HI)), (N_LO, _qw(N_LO))] * N
            Y = (N_HI / N_LO) ** (2 * N) * N_GLASS
            pred = ((1 - Y) / (1 + Y)) ** 2
            assert self._R(layers) == pytest.approx(pred, abs=2e-4), N

    def test_zero_thickness_layers_inert(self):
        base = self._R([(N_FILM, H_QW)])
        padded = self._R([(N_FILM, H_QW), (1.0, 0.0), (3.2, 0.0)])
        assert padded == pytest.approx(base, abs=1e-6)

    def test_lossless_reciprocity(self):
        # same |R| from either side of a lossless stack (swapped bounding
        # media, reversed layer order, Snell-matched angles)
        ci = np.cos(np.radians(35.0))
        layers = [(1.38, 0.1), (2.0, 0.07)]
        Rf = self._R(layers, n1=1.0, ns=N_GLASS, cos_i=ci, wl=0.6)
        ct = np.sqrt(1 - (1.0 / N_GLASS) ** 2 * (1 - ci * ci))
        Rb = self._R(layers[::-1], n1=N_GLASS, ns=1.0, cos_i=ct, wl=0.6)
        assert Rf == pytest.approx(Rb, abs=1e-6)

    def test_device_recursion_matches_oracle_matrix(self):
        from lightpycl_tpu.tracer.oracle import _film_reflectance_matrix

        rng = np.random.default_rng(7)
        for _ in range(30):
            Lk = rng.integers(1, 5)
            ns_ = rng.uniform(1.2, 2.4, Lk)
            hs_ = rng.uniform(0.0, 0.4, Lk)
            n1, n2 = rng.uniform(1.0, 1.8, 2)
            ci = np.cos(np.radians(rng.uniform(0, 85)))
            wl = rng.uniform(0.4, 0.8)
            dev = self._R(list(zip(ns_, hs_)), n1=n1, ns=n2, cos_i=ci, wl=wl)
            ora = float(_film_reflectance_matrix(
                np.array([ci]), np.array([n1]), ns_[None, :], hs_[None, :],
                np.array([n2]), np.array([wl]))[0])
            assert dev == pytest.approx(ora, abs=3e-5), (Lk, n1, n2, ci)

    def test_v_coated_window_trace_transmits_fully(self):
        win = oe.cube(size=(0.8, 0.8, 0.2), material="refractive",
                      ior=N_GLASS, name="window",
                      coating=[(N_FILM, _qw(N_FILM)), (1.7, _qw(1.7))])
        fwd = oe.disc(radius=1.2, center=(0, 0, 2.0), material="measure",
                      name="fwd")
        shell = oe.sphere(radius=6.0, material="terminator")
        src = CollimatedSource(center=(0, 0, -1.0), direction=(0, 0, 1),
                               diameter=0.3, ray_count=128, power=1.0,
                               seed=2, wavelength=WL)
        res = Tracer().trace(src, [win, fwd, shell], trace_iterations=8)
        assert res.detector_power("fwd") == pytest.approx(1.0, abs=1e-4)
        assert res.power_conservation_error() < 1e-5

    def test_hr_coated_lens_parity_with_oracle(self):
        layers = [(N_HI, _qw(N_HI)), (N_LO, _qw(N_LO))] * 2
        lens = oe.biconvex_lens(0.8, 0.5, 0.1, ior=N_GLASS, coating=layers)
        dome = L.optical_elements(24, 8).sphere(8.0, material="measure")
        src = CollimatedSource(center=(0, 0, -0.6), direction=(0, 0, 1),
                               diameter=0.4, ray_count=256, power=1.0,
                               seed=8, wavelength=([0.5, 0.55, 0.62],
                                                   [1, 1, 1]))
        o, d, p = src.sample()
        wl = src.sample_wavelengths()
        res = Tracer().trace(src, [lens, dome], trace_iterations=7,
                             rays=RayBatch.from_arrays(o, d, p,
                                                       wavelengths=wl,
                                                       capacity=8192))
        ora = trace_oracle([lens, dome], o, d, p, trace_iterations=7,
                           wavelengths=wl)
        assert res.ledger["measured"] == pytest.approx(ora["measured"],
                                                       rel=1e-3)
        assert res.power_conservation_error() < 1e-5

    def test_mixed_stack_depths_in_one_scene(self):
        # a 1-layer element and a 3-layer element share the scene: the
        # shallow stack rides padded h=0 rows, which must be exactly inert
        win1 = oe.cube(size=(0.5, 0.5, 0.1), center=(-0.6, 0, 0),
                       material="refractive", ior=N_GLASS,
                       coat_ior=N_FILM, coat_thickness=H_QW, name="w1")
        win3 = oe.cube(size=(0.5, 0.5, 0.1), center=(0.6, 0, 0),
                       material="refractive", ior=N_GLASS, name="w3",
                       coating=[(N_HI, _qw(N_HI)), (N_LO, _qw(N_LO)),
                                (N_HI, _qw(N_HI))])
        d1 = oe.disc(radius=0.3, center=(-0.6, 0, 1.5), material="measure",
                     name="d1")
        d3 = oe.disc(radius=0.3, center=(0.6, 0, 1.5), material="measure",
                     name="d3")
        shell = oe.sphere(radius=6.0, material="terminator")
        both = [win1, win3, d1, d3, shell]

        def beam(x):
            return CollimatedSource(center=(x, 0, -1.0), direction=(0, 0, 1),
                                    diameter=0.2, ray_count=128, power=1.0,
                                    seed=3, wavelength=WL)

        res1 = Tracer().trace(beam(-0.6), both, trace_iterations=8)
        # reference run: the 1-layer window alone (scene L = 1)
        solo = [win1, d1, oe.sphere(radius=6.0, material="terminator")]
        res_solo = Tracer().trace(beam(-0.6), solo, trace_iterations=8)
        assert res1.detector_power("d1") == pytest.approx(
            res_solo.detector_power("d1"), abs=1e-6)

    def test_shorthand_plus_list_rejected(self):
        with pytest.raises(ValueError, match="not both"):
            oe.cube(material="refractive", coat_ior=N_FILM,
                    coat_thickness=H_QW, coating=[(1.7, 0.1)])


class TestCoatingValidation:
    def test_coating_on_mirror_rejected(self):
        with pytest.raises(ValueError, match="REFRACTIVE"):
            oe.disc(radius=1.0, material="mirror", coat_ior=N_FILM,
                    coat_thickness=H_QW)

    def test_coating_needs_film_index(self):
        with pytest.raises(ValueError, match="coat_ior"):
            oe.cube(material="refractive", coat_thickness=H_QW)

    def test_polarization_plus_coating_supported(self):
        # round-2+ removed the old refusal: coated scenes trace under
        # polarization=True via physics.polarized_film_split (full
        # coverage in TestPolarizedCoating)
        win = oe.cube(size=0.4, material="refractive", ior=N_GLASS,
                      coat_ior=N_FILM, coat_thickness=H_QW)
        shell = oe.sphere(radius=4.0, material="terminator")
        src = CollimatedSource(center=(0, 0, -1.0), direction=(0, 0, 1),
                               diameter=0.2, ray_count=16, seed=0)
        res = Tracer().trace(src, [win, shell], trace_iterations=4,
                             polarization=True)
        assert res.power_conservation_error() < 1e-5

    def test_uncoated_scene_bit_identical_to_before(self):
        """has_coatings gating: an uncoated trace must not change at all."""
        lens = oe.biconvex_lens(0.8, 0.5, 0.1, ior=N_GLASS)
        dome = L.optical_elements(24, 8).sphere(8.0, material="measure")
        src = CollimatedSource(center=(0, 0, -0.6), direction=(0, 0, 1),
                               diameter=0.4, ray_count=128, seed=5)
        r1 = Tracer().trace(src, [lens, dome], trace_iterations=5)
        r2 = Tracer().trace(src, [lens, dome], trace_iterations=5)
        np.testing.assert_array_equal(r1.hist, r2.hist)
        assert r1.ledger == r2.ledger


class TestPolarizedCoating:
    """Coatings under TraceConfig(polarization=True): the bare Fresnel
    Mueller split is replaced by the stack's characteristic-matrix split
    (physics.polarized_film_split) on coated lanes."""

    @staticmethod
    def _arr(x):
        import jax.numpy as jnp

        return jnp.atleast_1d(jnp.asarray(x, jnp.float32))

    def test_zero_thickness_reduces_to_bare_polarized_split(self):
        # includes the TIR retardation block: the complex conj(rs) rp
        # cross term must reproduce polarized_split's rotation exactly
        from lightpycl_tpu import physics as P

        arr = self._arr
        for n1, n2 in [(1.0, 1.52), (1.52, 1.0)]:
            for deg in (0.0, 20.0, 42.0, 56.3, 70.0, 85.0):
                ci = np.cos(np.radians(deg))
                eta = n1 / n2
                sin2t = eta * eta * (1 - ci * ci)
                tir = sin2t > 1
                ct = np.sqrt(max(1 - sin2t, 0.0))
                s = (1.0, 0.3, 0.5, -0.2)
                ref = P.polarized_split(*(arr(x) for x in s), arr(ci),
                                        arr(ct), arr(n1), arr(n2), arr(tir))
                film = P.polarized_film_split(
                    *(arr(x) for x in s), arr(ci), arr(n1),
                    [arr(1.3)], [arr(0.0)], arr(n2), arr(WL))
                for which in (0, 1):
                    for i in range(4):
                        assert float(film[which][i][0]) == pytest.approx(
                            float(ref[which][i][0]), abs=3e-5), (n1, deg,
                                                                 which, i)

    def test_single_bounce_s_and_p_powers_match_matrix_theory(self):
        # tilted coated window, one bounce: reflected/transmitted child
        # powers for pure-s and pure-p inputs equal |rs|^2 / Ts / |rp|^2 /
        # Tp from multilayer_amplitudes at the incidence angle
        import jax.numpy as jnp

        from lightpycl_tpu import build_scene
        from lightpycl_tpu.physics import multilayer_amplitudes
        from lightpycl_tpu.tracer.config import TraceConfig
        from lightpycl_tpu.tracer.rays import DetectorState, Ledger
        from lightpycl_tpu.tracer.step import trace_step

        theta = np.radians(35.0)
        win = oe.rectangle(4.0, 4.0, material="refractive", ior=N_GLASS,
                           coat_ior=N_FILM, coat_thickness=H_QW)
        win.rotate((0, 1, 0), theta)     # plane of incidence = x-z
        scene, _ = build_scene([win])
        cfg = TraceConfig(polarization=True)

        rs, rp, Ts, Tp, _ = multilayer_amplitudes(
            self._arr(np.cos(theta)), self._arr(1.0),
            [self._arr(N_FILM)], [self._arr(H_QW)],
            self._arr(N_GLASS), self._arr(WL))
        theory = {"s": (float(jnp.abs(rs)[0]) ** 2, float(Ts[0])),
                  "p": (float(jnp.abs(rp)[0]) ** 2, float(Tp[0]))}

        for pol, s1 in (("s", 1.0), ("p", -1.0)):
            # beam along +z: auto basis = +y = the s direction for a
            # window tilted about y; s1=+1 -> pure s, s1=-1 -> pure p
            # beam travels -z so it hits the window's FRONT face (outward
            # normal tilts toward +z after the rotation)
            n = 8
            rays = RayBatch.from_arrays(
                np.tile([0.0, 0.0, 2.0], (n, 1)),
                np.tile([0.0, 0.0, -1.0], (n, 1)),
                np.full(n, 1.0 / n), capacity=2 * n,
                wavelengths=np.full(n, WL), stokes=(s1, 0.0, 0.0))
            det = DetectorState.zeros(4, 4, 1)
            led = Ledger.start(1.0)
            r, det, led, _ = trace_step(scene, rays, det, led, cfg)
            alive = np.asarray(r.alive)
            pw = np.asarray(r.power)[alive]
            ior = np.asarray(r.ior)[alive]
            R_traced = pw[ior < 1.1].sum()
            T_traced = pw[ior > 1.1].sum()
            R_th, T_th = theory[pol]
            assert R_traced == pytest.approx(R_th, abs=2e-5), pol
            assert T_traced == pytest.approx(T_th, abs=2e-5), pol

    def test_engine_unpolarized_input_matches_scalar_trace(self):
        # with an unpolarized source, the polarized coated trace must give
        # the scalar path's detected power: r0 with s1=0 is (Rs+Rp)/2 = R
        win = oe.cube(size=(1.0, 1.0, 0.25), material="refractive",
                      ior=N_GLASS, coat_ior=N_FILM, coat_thickness=H_QW,
                      name="win")
        fwd = oe.disc(radius=1.5, center=(0, 0, 2.0), material="measure",
                      name="fwd")
        shell = oe.sphere(radius=8.0, material="terminator")
        els = [win, fwd, shell]
        src = CollimatedSource(center=(0, 0, -1.0), direction=(0, 0, 1),
                               diameter=0.5, ray_count=256, power=1.0,
                               seed=3, wavelength=WL)
        res_u = Tracer().trace(src, els, trace_iterations=8, mode="device",
                               dissipation_target=1.0)
        res_p = Tracer().trace(src, els, trace_iterations=8, mode="device",
                               dissipation_target=1.0, polarization=True)
        assert res_p.detector_power("fwd") == pytest.approx(
            res_u.detector_power("fwd"), rel=1e-5)
        assert res_p.power_conservation_error() < 1e-5

    def test_polarized_coated_lens_conserves(self):
        layers = [(2.35, WL / (4 * 2.35)), (1.46, WL / (4 * 1.46))] * 2
        lens = oe.biconvex_lens(0.8, 0.5, 0.1, ior=N_GLASS, coating=layers)
        dome = oe.sphere(radius=8.0, material="measure", name="dome")
        src = CollimatedSource(center=(0, 0, -0.6), direction=(0, 0, 1),
                               diameter=0.4, ray_count=256, power=1.0,
                               seed=8, wavelength=WL)
        res = Tracer().trace(src, [lens, dome], trace_iterations=7,
                             polarization=True, capacity=4096)
        assert res.power_conservation_error() < 1e-5
        assert res.detector_power("dome") > 0.5

    def test_airy_and_matrix_device_formulations_agree(self):
        # the scalar path (Airy/Moebius recursion, multilayer_rs_rp) and
        # the polarized path (characteristic-matrix, multilayer_amplitudes)
        # are two on-device implementations of the same stack; pin them to
        # each other so a guard/fix applied to one cannot silently skew
        # the unpolarized-vs-polarized parity
        import jax.numpy as jnp

        from lightpycl_tpu.physics import (multilayer_amplitudes,
                                           multilayer_rs_rp)

        arr = self._arr
        rng = np.random.default_rng(17)
        for _ in range(25):
            Lk = int(rng.integers(1, 5))
            ns_ = rng.uniform(1.2, 2.4, Lk)
            hs_ = rng.uniform(0.0, 0.4, Lk)
            n1, n2 = rng.uniform(1.0, 1.8, 2)
            ci = np.cos(np.radians(rng.uniform(0.0, 89.0)))
            wl = rng.uniform(0.4, 0.8)
            rsA, rpA = multilayer_rs_rp(
                arr(ci), arr(n1), [arr(x) for x in ns_],
                [arr(x) for x in hs_], arr(n2), arr(wl))
            rsM, rpM, _, _, _ = multilayer_amplitudes(
                arr(ci), arr(n1), [arr(x) for x in ns_],
                [arr(x) for x in hs_], arr(n2), arr(wl))
            assert float(jnp.abs(rsA)[0]) == pytest.approx(
                float(jnp.abs(rsM)[0]), abs=3e-5)
            assert float(jnp.abs(rpA)[0]) == pytest.approx(
                float(jnp.abs(rpM)[0]), abs=3e-5)
