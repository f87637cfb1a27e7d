"""Gradient-index (GRIN) media: curved-ray propagation through the
radial-parabolic SELFOC profile n(rho)^2 = n0^2 (1 - A rho^2)
(extension over the reference, whose rays are straight between surfaces
— SURVEY.md §1).

Anchors are classic SELFOC rod optics (meridional paraxial rays follow
r(z) = r0 cos(sqrt(A) z), pitch P = 2 pi / sqrt(A)):
  * quarter-pitch rods focus a collimated beam onto the axis,
  * half-pitch rods invert the ray (r0 -> -r0),
  * on-axis OPL is exactly n0 L,
  * entry Fresnel uses the LOCAL index n(rho), not the on-axis n0,
  * the profile follows the element through rotations/translations,
  * exact power conservation; deterministic (no RNG).
"""

import numpy as np
import pytest

import lightpycl_tpu as L
from lightpycl_tpu.sources import CollimatedSource
from lightpycl_tpu.tracer.config import TraceConfig
from lightpycl_tpu.tracer.engine import Tracer
from lightpycl_tpu.tracer.oracle import trace_oracle

N0, A = 1.6, 4.0
PITCH = 2.0 * np.pi / np.sqrt(A)


def _rod(length, z0=1.0, size=1.2):
    oe = L.optical_elements()
    return oe.cube((size, size, length), center=(0, 0, z0 + length / 2),
                   material="refractive", ior=N0, grin_a=A,
                   axis=(0, 0, 1), grin_center=(0, 0, z0))


GAP = 5e-3  # screen sits just past the exit face (> cfg.eps self-hit guard)


def _scene(length, z0=1.0):
    oe = L.optical_elements()
    screen = oe.rectangle(width=10.0, depth=10.0,
                          center=(0, 0, z0 + length + GAP),
                          material="measure", name="exit")
    world = oe.sphere(radius=20.0, material="measure", name="world")
    return [_rod(length, z0), screen, world]


def _single_ray(r0, length, iterations=40):
    src = CollimatedSource(center=(r0, 0, 0), direction=(0, 0, 1),
                           diameter=1e-6, power=1.0, ray_count=1)
    res = Tracer().trace(src, _scene(length), trace_iterations=iterations,
                         capacity=64)
    assert res.power_conservation_error() < 1e-4
    sel = res.measured_det == 0
    pw = res.measured_power[sel]
    j = int(np.argmax(pw))  # the direct (highest-power) exit ray
    return res.measured_pos[sel][j], res.measured_dir[sel][j], res


class TestSelfocTrajectories:
    @pytest.mark.parametrize("frac", [0.125, 0.25, 0.5])
    def test_paraxial_sinusoid(self, frac):
        """A paraxial ray entering parallel at offset r0 exits a rod of
        length z at offset r0 cos(sqrt(A) z) — the SELFOC textbook law."""
        r0, length = 0.03, frac * PITCH
        pos, _, _ = _single_ray(r0, length)
        want = r0 * np.cos(np.sqrt(A) * length)
        assert pos[0] == pytest.approx(want, abs=1.5e-3), frac
        assert abs(pos[1]) < 1e-5

    def test_half_pitch_inverts(self):
        """L = P/2: the ray exits at -r0 moving parallel again."""
        r0 = 0.05
        pos, d, _ = _single_ray(r0, PITCH / 2.0, iterations=50)
        assert pos[0] == pytest.approx(-r0, abs=2e-3)
        # parallel again: transverse direction ~ 0
        assert abs(d[0]) < 0.02 and d[2] > 0.999

    def test_quarter_pitch_focuses_collimated_beam(self):
        """L = P/4 turns a collimated paraxial bundle into a focus on the
        axis at the exit face."""
        length = PITCH / 4.0
        src = CollimatedSource(center=(0, 0, 0), direction=(0, 0, 1),
                               diameter=0.1, power=1.0, ray_count=512)
        res = Tracer().trace(src, _scene(length), trace_iterations=40,
                             capacity=2048)
        assert res.power_conservation_error() < 1e-4
        sel = res.measured_det == 0
        pos, pw = res.measured_pos[sel], res.measured_power[sel]
        r = np.linalg.norm(pos[:, :2], axis=1)
        # direct beam dominates; power-weighted spot far below the
        # 0.05 input radius
        assert (r * pw).sum() / pw.sum() < 0.004

    def test_on_axis_opl_exact(self):
        """The axial ray is straight and sees n0 everywhere: its OPL
        through (1 in air) + (L in rod) + (epsilon to screen) must be
        1 + n0 L."""
        length = PITCH / 4.0
        pos, _, res = _single_ray(0.0, length)
        sel = res.measured_det == 0
        j = int(np.argmax(res.measured_power[sel]))
        opl = res.measured_opl[sel][j]
        assert opl == pytest.approx(1.0 + N0 * length + GAP, abs=2e-3)

    def test_entry_fresnel_uses_local_index(self):
        """Normal-incidence entry reflectance is ((1-n)/(1+n))^2 with the
        LOCAL n(rho): an off-axis ray (lower n) must reflect less than
        the axial ray. The entry reflection is isolated from exit-face
        ghosts by OPL (entry reflection: 1 to the rod + ~21 back to the
        enclosure = ~22; every ghost carries >= 2 n0 L ~ 2.5 more)."""
        def entry_reflection(r0):
            _, _, res = _single_ray(r0, PITCH / 4.0, iterations=50)
            enc = res.measured_det == 1
            sel = (res.measured_pos[enc][:, 2] < 1.0) \
                & (res.measured_opl[enc] < 23.0)
            return res.measured_power[enc][sel].sum()

        def r_local(r0):
            n = N0 * np.sqrt(1.0 - A * r0 * r0)
            return ((1.0 - n) / (1.0 + n)) ** 2

        for r0 in (0.0, 0.25):
            assert entry_reflection(r0) == pytest.approx(r_local(r0),
                                                         abs=1e-3), r0
        assert r_local(0.0) - r_local(0.25) > 0.02  # the anchor has teeth

    def test_diverging_profile_cosh(self):
        """A < 0 diverges: the transverse motion is hyperbolic, so a
        paraxial parallel ray exits a rod of length L at
        r0 cosh(sqrt(|A|) L) — the analytic propagator's other branch."""
        a_div, length, r0 = -1.0, 0.5, 0.05
        oe = L.optical_elements()
        rod = oe.cube((1.2, 1.2, length), center=(0, 0, 1.0 + length / 2),
                      material="refractive", ior=N0, grin_a=a_div,
                      axis=(0, 0, 1), grin_center=(0, 0, 1.0))
        screen = oe.rectangle(width=10.0, depth=10.0,
                              center=(0, 0, 1.0 + length + GAP),
                              material="measure", name="exit")
        world = oe.sphere(radius=20.0, material="measure", name="world")
        src = CollimatedSource(center=(r0, 0, 0), direction=(0, 0, 1),
                               diameter=1e-6, power=1.0, ray_count=1)
        res = Tracer().trace(src, [rod, screen, world],
                             trace_iterations=40, capacity=64)
        assert res.power_conservation_error() < 1e-4
        sel = res.measured_det == 0
        j = int(np.argmax(res.measured_power[sel]))
        pos = res.measured_pos[sel][j]
        want = r0 * np.cosh(np.sqrt(-a_div) * length)
        assert pos[0] == pytest.approx(want, abs=1e-3)
        assert want - r0 > 0.005  # the anchor has teeth

    def test_transformed_rod_same_physics(self):
        """Rotating + translating the rod carries grin_center and the
        profile axis: the sinusoid happens in the element frame. A
        quarter-pitch rod rotated to lie along +x and shifted off-origin
        must still steer an off-axis-parallel ray onto its axis with the
        paraxial exit slope r0 sqrt(A) n0 (exit refraction included)."""
        r0, length = 0.04, PITCH / 4.0
        # rod axis now the line {y = 0, z = -0.5}, x in [1.5, 1.5 + L]
        rod = _rod(length).rotate((0, 1, 0), np.pi / 2).translate(
            (0.5, 0.0, -0.5))
        world = L.optical_elements().sphere(radius=20.0,
                                            material="measure",
                                            name="world")
        src = CollimatedSource(center=(-2.0, 0.0, -0.5 + r0),
                               direction=(1, 0, 0), diameter=1e-6,
                               power=1.0, ray_count=1)
        res = Tracer().trace(src, [rod, world], trace_iterations=50,
                             capacity=64)
        assert res.power_conservation_error() < 1e-4
        j = int(np.argmax(res.measured_power))
        dirn = res.measured_dir[j]
        assert dirn[0] > 0.9
        want_slope = -r0 * np.sqrt(A) * N0
        assert dirn[2] / dirn[0] == pytest.approx(want_slope, rel=0.05)


class TestAnalyticPropagator:
    """physics.grin_selfoc_step is the EXACT closed-form solution of the
    sigma-parameterized ray equation (d sigma = ds / n); pin it against
    two independent formulations: an f64 numpy RK4 integrator of the
    sigma-domain ODE (same flow, independent code + precision) and the
    package's own arc-length RK4 (different parameterization, so only
    O(h^2) agreement is expected)."""

    def _random_states(self, rng, n, sign=+1.0, spread=0.3):
        import jax.numpy as jnp
        r0 = np.asarray(rng.uniform(-spread, spread, (n, 3)))
        d0 = np.asarray(rng.normal(size=(n, 3)))
        d0 /= np.linalg.norm(d0, axis=1, keepdims=True)
        center = np.tile([0.1, -0.2, 0.3], (n, 1))
        axis = np.tile(np.array([1.0, 2.0, 2.0]) / 3.0, (n, 1))
        n0 = np.full(n, N0)
        a = np.full(n, sign * A)
        return (jnp.asarray(r0, jnp.float32), jnp.asarray(d0, jnp.float32),
                jnp.asarray(center, jnp.float32), jnp.asarray(axis, jnp.float32),
                jnp.asarray(n0, jnp.float32), jnp.asarray(a, jnp.float32),
                r0, d0, center, axis, n0, a)

    def _sigma_rk4_f64(self, r0, d0, h, center, axis, n0, a, nsub=256):
        """f64 numpy RK4 of dr/dsigma = v, dv/dsigma = -n0^2 a rho_vec
        over sigma_total = h / n(r0) — the same flow grin_selfoc_step
        solves in closed form. Returns (r, d, n, opl)."""
        def n_of(r):
            rel = r - center
            rho = rel - (rel * axis).sum(1, keepdims=True) * axis
            n2 = n0**2 * (1.0 - a * (rho * rho).sum(1))
            return np.sqrt(np.maximum(n2, 2.5e-3 * n0**2))

        def acc(r):
            rel = r - center
            rho = rel - (rel * axis).sum(1, keepdims=True) * axis
            return -(n0**2 * a)[:, None] * rho

        n_start = n_of(r0)
        sig = h / n_start
        dsig = (sig / nsub)[:, None]
        r, v = r0.copy(), n_start[:, None] * d0
        opl = np.zeros(len(r0))
        for _ in range(nsub):
            # OPL rides the RK4 stages as an extra state:
            # d(opl)/dsigma = |v|^2 (4th-order accurate)
            k1r, k1v = v, acc(r)
            k1w = (v * v).sum(1)
            v2 = v + 0.5 * dsig * k1v
            k2r, k2v = v2, acc(r + 0.5 * dsig * k1r)
            k2w = (v2 * v2).sum(1)
            v3 = v + 0.5 * dsig * k2v
            k3r, k3v = v3, acc(r + 0.5 * dsig * k2r)
            k3w = (v3 * v3).sum(1)
            v4 = v + dsig * k3v
            k4r, k4v = v4, acc(r + dsig * k3r)
            k4w = (v4 * v4).sum(1)
            r = r + (dsig / 6.0) * (k1r + 2 * k2r + 2 * k3r + k4r)
            v = v + (dsig / 6.0) * (k1v + 2 * k2v + 2 * k3v + k4v)
            opl += (dsig[:, 0] / 6.0) * (k1w + 2 * k2w + 2 * k3w + k4w)
        return (r, v / np.linalg.norm(v, axis=1, keepdims=True),
                n_of(r), opl)

    @pytest.mark.parametrize("sign", [+1.0, -1.0])
    def test_matches_f64_sigma_integrator(self, sign):
        """Focusing (trig) and diverging (hyperbolic) profiles both match
        the independent f64 sigma-domain integrator to f32 roundoff."""
        from lightpycl_tpu.physics import grin_selfoc_step

        rng = np.random.default_rng(7)
        (jr, jd, jc, jx, jn, ja,
         r0, d0, center, axis, n0, a) = self._random_states(rng, 64, sign)
        h = 0.11
        r1, d1, n1, opl = (np.asarray(x) for x in
                           grin_selfoc_step(jr, jd, h, jc, jx, jn, ja))
        r_64, d_64, n_64, opl_64 = self._sigma_rk4_f64(
            r0, d0, h, center, axis, n0, a)
        np.testing.assert_allclose(r1, r_64, atol=3e-6)
        np.testing.assert_allclose(d1, d_64, atol=3e-5)
        np.testing.assert_allclose(n1, n_64, atol=3e-5)
        np.testing.assert_allclose(opl, opl_64, rtol=3e-5)

    def test_energy_conservation_exact(self):
        """|v(sigma)| = n(r(sigma)) is built into the closed form: the
        direction-weighted momentum norm equals the local index."""
        from lightpycl_tpu import physics
        from lightpycl_tpu.physics import grin_selfoc_step

        rng = np.random.default_rng(11)
        jr, jd, jc, jx, jn, ja = self._random_states(rng, 64)[:6]
        r1, d1, n1, _ = grin_selfoc_step(jr, jd, 0.15, jc, jx, jn, ja)
        n_at = physics.grin_index(r1, jc, jx, jn, ja)
        np.testing.assert_allclose(np.asarray(n1), np.asarray(n_at),
                                   atol=1e-6)

    def test_on_axis_opl_is_n0_h(self):
        """The axial ray is straight with n = n0 everywhere: the step's
        OPL must be EXACTLY n0 h (no quadrature error at all)."""
        import jax.numpy as jnp

        from lightpycl_tpu.physics import grin_selfoc_step

        one3 = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
        r0 = jnp.asarray([[0.0, 0.0, 0.4]], jnp.float32)
        _, d1, _, opl = grin_selfoc_step(
            r0, one3, 0.37, jnp.zeros((1, 3), jnp.float32), one3,
            jnp.asarray([N0], jnp.float32), jnp.asarray([A], jnp.float32))
        assert float(opl[0]) == pytest.approx(N0 * 0.37, rel=1e-6)
        np.testing.assert_allclose(np.asarray(d1), np.asarray(one3),
                                   atol=1e-7)

    def test_zero_a_reduces_to_straight_ray(self):
        """a == 0 lanes (non-GRIN media sharing the batch) must be the
        exact straight ray with OPL = n h."""
        import jax.numpy as jnp

        from lightpycl_tpu.physics import grin_selfoc_step

        rng = np.random.default_rng(3)
        jr, jd, jc, jx, jn, _ = self._random_states(rng, 16)[:6]
        za = jnp.zeros(16, jnp.float32)
        r1, d1, n1, opl = grin_selfoc_step(jr, jd, 0.2, jc, jx, jn, za)
        np.testing.assert_allclose(np.asarray(r1),
                                   np.asarray(jr + 0.2 * jd), atol=1e-6)
        np.testing.assert_allclose(np.asarray(d1), np.asarray(jd),
                                   atol=1e-7)
        np.testing.assert_allclose(np.asarray(opl), N0 * 0.2, rtol=1e-6)

    def test_rk4_cross_check_same_h(self):
        """The arc-length RK4 formulation agrees to its O(h^2)
        parameterization difference — the two implementations are
        genuinely independent (different variables, different math)."""
        import jax.numpy as jnp

        from lightpycl_tpu.physics import grin_rk4_step, grin_selfoc_step

        rng = np.random.default_rng(5)
        # physical region only (n^2 > 0 with margin): inside the index
        # clamp zone the two parameterizations legitimately diverge
        jr, jd, jc, jx, jn, ja = self._random_states(
            rng, 64, spread=0.12)[:6]
        jr = jr + jnp.asarray([[0.1, -0.2, 0.3]], jnp.float32)
        h = 0.03
        ra, da, na, opa = grin_selfoc_step(jr, jd, h, jc, jx, jn, ja)
        rb, db, nb, opb = grin_rk4_step(jr, jd, h, jc, jx, jn, ja)
        np.testing.assert_allclose(np.asarray(ra), np.asarray(rb),
                                   atol=5e-4)
        np.testing.assert_allclose(np.asarray(da), np.asarray(db),
                                   atol=2e-3)
        # OPL carries the full arc-length mismatch n * ds ~ |grad n| h^2
        # / 2 (~8e-3 relative here); the f64 sigma-domain test above is
        # the tight anchor
        np.testing.assert_allclose(np.asarray(opa), np.asarray(opb),
                                   rtol=2e-2)


class TestPolarizedGrin:
    """Polarization through curved GRIN rays: the s-direction frame is
    Levi-Civita (minimal-rotation) parallel-transported along each step
    (physics.parallel_transport). Anchors: transport algebra, energy
    conservation, and the geometric (Rytov) rotation of a skew helical
    ray — polarization rotates by the solid angle 2 pi (1 - cos alpha)
    swept by the direction cone per helix turn, the classic GRIN-fiber
    effect."""

    def test_transport_algebra(self):
        import jax.numpy as jnp

        from lightpycl_tpu.physics import parallel_transport

        rng = np.random.default_rng(2)
        d0 = rng.normal(size=(64, 3))
        d0 /= np.linalg.norm(d0, axis=1, keepdims=True)
        # small random turns (like GRIN steps)
        d1 = d0 + 0.05 * rng.normal(size=(64, 3))
        d1 /= np.linalg.norm(d1, axis=1, keepdims=True)
        v = np.cross(d0, rng.normal(size=(64, 3)))
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        j = lambda x: jnp.asarray(x, jnp.float32)
        out = np.asarray(parallel_transport(j(v), j(d0), j(d1)))
        # maps the tangent onto the new tangent; preserves norm and
        # perpendicularity
        d_map = np.asarray(parallel_transport(j(d0), j(d0), j(d1)))
        np.testing.assert_allclose(d_map, d1, atol=1e-6)
        np.testing.assert_allclose(np.linalg.norm(out, axis=1), 1.0,
                                   atol=1e-5)
        np.testing.assert_allclose((out * d1).sum(1), 0.0, atol=1e-5)

    def test_planar_curve_zero_holonomy(self):
        """Transport around a closed PLANAR direction loop returns the
        frame unchanged (zero enclosed solid angle) — the property that
        keeps meridional-ray polarization fixed."""
        import jax.numpy as jnp

        from lightpycl_tpu.physics import parallel_transport

        th = np.linspace(0.0, 2.0 * np.pi, 181)
        v = jnp.asarray([[0.0, 1.0, 0.0]], jnp.float32)  # out of plane
        w = jnp.asarray([[1.0, 0.0, 0.0]], jnp.float32)  # in plane
        for i in range(len(th) - 1):
            d0 = jnp.asarray([[np.sin(th[i]), 0.0, np.cos(th[i])]],
                             jnp.float32)
            d1 = jnp.asarray([[np.sin(th[i + 1]), 0.0, np.cos(th[i + 1])]],
                             jnp.float32)
            v = parallel_transport(v, d0, d1)
            w = parallel_transport(w, d0, d1)
        np.testing.assert_allclose(np.asarray(v), [[0.0, 1.0, 0.0]],
                                   atol=2e-4)
        np.testing.assert_allclose(np.asarray(w), [[1.0, 0.0, 0.0]],
                                   atol=2e-4)

    @staticmethod
    def _helix_trace(n_turns, alpha, stokes):
        """Launch one external ray that refracts into an exact SELFOC
        helix of cone angle `alpha`, through a rod of exactly n_turns
        helix pitches; measure on a screen past the exit face."""
        s, c = np.sin(alpha), np.cos(alpha)
        n_loc = N0 / np.sqrt(1.0 + s * s)     # helix: n^2 (1+s^2) = n0^2
        rho0 = s / (np.sqrt(A) * np.sqrt(1.0 + s * s))
        vz = n_loc * c
        length = n_turns * 2.0 * np.pi * vz / (N0 * np.sqrt(A))
        sin_ext = n_loc * s                   # entry Snell at the flat face
        cos_ext = np.sqrt(1.0 - sin_ext**2)
        z0 = 1.0
        origin = (rho0, -z0 * sin_ext / cos_ext, 0.0)
        oe = L.optical_elements()
        rod = oe.cube((1.2, 1.2, length), center=(0, 0, z0 + length / 2),
                      material="refractive", ior=N0, grin_a=A,
                      axis=(0, 0, 1), grin_center=(0, 0, z0))
        screen = oe.rectangle(width=10.0, depth=10.0,
                              center=(0, 0, z0 + length + GAP),
                              material="measure", name="exit")
        world = oe.sphere(radius=30.0, material="measure", name="world")
        src = CollimatedSource(center=origin, direction=(0, sin_ext, cos_ext),
                               diameter=1e-6, power=1.0, ray_count=1,
                               stokes=stokes)
        iters = int(length / (np.pi / np.sqrt(A) / 50.0)) + 20
        res = Tracer(TraceConfig(polarization=True)).trace(
            src, [rod, screen, world], trace_iterations=iters, capacity=64)
        assert res.power_conservation_error() < 1e-4
        sel = res.measured_det == 0
        k = int(np.argmax(res.measured_power[sel]))
        return (res.measured_dir[sel][k], res.measured_stokes[sel][k],
                res.measured_pos[sel][k])

    def test_rytov_rotation_on_skew_helix(self):
        """One extra helix turn rotates the linear-polarization axis by
        the solid angle 2 pi (1 - cos alpha) of the direction cone. The
        exit geometry (position, direction, s-frame) is identical for 1
        and 2 turns, so the angle DIFFERENCE isolates the geometric
        rotation from entry/exit Fresnel effects."""
        alpha = np.deg2rad(25.0)
        d1, st1, p1 = self._helix_trace(1, alpha, (1.0, 0.0, 0.0))
        d2, st2, p2 = self._helix_trace(2, alpha, (1.0, 0.0, 0.0))
        # identical exit geometry (full turns return to the entry azimuth)
        np.testing.assert_allclose(d1, d2, atol=2e-3)
        np.testing.assert_allclose(p1[:2], p2[:2], atol=2e-3)
        th1 = 0.5 * np.arctan2(st1[1], st1[0])
        th2 = 0.5 * np.arctan2(st2[1], st2[0])
        dth = (th2 - th1 + np.pi / 2) % np.pi - np.pi / 2
        want = 2.0 * np.pi * (1.0 - np.cos(alpha))
        assert abs(abs(dth) - want) < 0.05 * want, (dth, want)

    def test_meridional_polarization_preserved(self):
        """A meridional (planar-curve) path carries zero geometric
        rotation: 1 vs 2 half-pitch meridional bounces leave the linear
        axis unchanged (the control experiment for the helix)."""
        d1, st1, _ = self._helix_trace(1, np.deg2rad(25.0), (0.0, 1.0, 0.0))
        # 45-degree linear input on the SAME helix: the rotation must be
        # input-angle-independent (geometric, not diattenuation)
        d2, st2, _ = self._helix_trace(2, np.deg2rad(25.0), (0.0, 1.0, 0.0))
        th1 = 0.5 * np.arctan2(st1[1], st1[0])
        th2 = 0.5 * np.arctan2(st2[1], st2[0])
        dth = (th2 - th1 + np.pi / 2) % np.pi - np.pi / 2
        want = 2.0 * np.pi * (1.0 - np.cos(np.deg2rad(25.0)))
        assert abs(abs(dth) - want) < 0.07 * want, (dth, want)


class TestPlumbing:
    def test_deterministic_no_rng(self):
        cfg = TraceConfig()
        els = _scene(PITCH / 4.0)
        src = CollimatedSource(center=(0, 0, 0), direction=(0, 0, 1),
                               diameter=0.1, power=1.0, ray_count=256)
        r1 = Tracer(cfg).trace(src, els, trace_iterations=30, capacity=1024)
        r2 = Tracer(cfg).trace(src, els, trace_iterations=30, capacity=1024)
        assert r1.ledger == r2.ledger
        np.testing.assert_array_equal(r1.hist, r2.hist)

    def test_multichip_ledger_closes(self):
        src = CollimatedSource(center=(0, 0, 0), direction=(0, 0, 1),
                               diameter=0.1, power=1.0, ray_count=512)
        res = Tracer().trace(src, _scene(PITCH / 4.0),
                             trace_iterations=30, capacity=2048,
                             mode="multichip")
        assert res.power_conservation_error() < 1e-4

    def test_validation(self):
        oe = L.optical_elements()
        with pytest.raises(ValueError, match="REFRACTIVE"):
            oe.cube(1.0, material="mirror", grin_a=1.0, axis=(0, 0, 1),
                    grin_center=(0, 0, 0))
        with pytest.raises(ValueError, match="axis"):
            oe.cube(1.0, material="refractive", grin_a=1.0,
                    grin_center=(0, 0, 0))
        with pytest.raises(ValueError, match="grin_center"):
            oe.cube(1.0, material="refractive", grin_a=1.0, axis=(0, 0, 1))
        with pytest.raises(ValueError, match="one bulk model"):
            oe.cube(1.0, material="refractive", grin_a=1.0, axis=(0, 0, 1),
                    grin_center=(0, 0, 0), scattering=1.0)
        with pytest.raises(ValueError, match="UNIFORM"):
            _rod(1.0).scale((1.0, 2.0, 1.0))

    def test_engine_refusals(self):
        from lightpycl_tpu.parallel.mesh2d import make_mesh2d

        els = _scene(PITCH / 4.0)
        src = CollimatedSource(center=(0, 0, 0), direction=(0, 0, 1),
                               diameter=0.1, power=1.0, ray_count=64)
        with pytest.raises(ValueError, match="replicated"):
            Tracer().trace(src, els, trace_iterations=4, capacity=256,
                           mode="mesh2d", mesh=make_mesh2d(2, 4))
        # polarization=True composes with GRIN (round 3): smoke-check
        # the polarized path conserves through curved steps
        resp = Tracer(TraceConfig(polarization=True)).trace(
            src, els, trace_iterations=20, capacity=256)
        assert resp.power_conservation_error() < 1e-4

    def test_oracle_refuses(self):
        with pytest.raises(ValueError, match="straight"):
            trace_oracle(_scene(1.0), np.zeros((4, 3)),
                         np.tile([0.0, 0.0, 1.0], (4, 1)),
                         np.full(4, 0.25))

    def test_spectral_shared_refuses(self):
        src = CollimatedSource(center=(0, 0, 0), direction=(0, 0, 1),
                               diameter=0.1, power=1.0, ray_count=64)
        with pytest.raises(ValueError, match="curved"):
            Tracer().trace_spectral(src, [0.5, 0.6],
                                    elements=_scene(PITCH / 4.0),
                                    trace_iterations=4, capacity=512,
                                    method="shared")

    def test_clear_scene_unaffected(self):
        """Scenes without GRIN elements trace bit-identically whether or
        not the machinery exists."""
        oe = L.optical_elements()
        els = [oe.cube((1, 1, 0.5), center=(0, 0, 1.0),
                       material="refractive", ior=1.5),
               oe.sphere(radius=10.0, material="measure", name="world")]
        src = CollimatedSource(center=(0, 0, 0), direction=(0, 0, 1),
                               diameter=0.3, power=1.0, ray_count=512)
        r_off = Tracer().trace(src, els, trace_iterations=6, capacity=2048)
        r_on = Tracer(TraceConfig(has_grin=True, grin_step=0.1)).trace(
            src, els, trace_iterations=6, capacity=2048)
        assert r_off.ledger == r_on.ledger


class TestMultiSubstep:
    """TraceConfig.grin_substeps: k curved sub-steps per trace iteration,
    re-intersecting only the GRIN elements' own surfaces between steps
    (scene.grin_wu compact set). Must reproduce the one-step-per-iteration
    trajectories exactly — same propagator, same step length, same hit
    predicate — while needing ~k x fewer full-scene intersects."""

    def _trace(self, substeps, iterations, length=PITCH / 4, r0=0.2,
               absorption=0.0, polarization=False):
        oe = L.optical_elements()
        rod = _rod(length)
        rod.absorption = absorption
        screen = oe.rectangle(width=10.0, depth=10.0,
                              center=(0, 0, 1.0 + length + GAP),
                              material="measure", name="exit")
        world = oe.sphere(radius=20.0, material="measure", name="world")
        src = CollimatedSource(center=(0, 0, 0), direction=(0, 0, 1),
                               diameter=2 * r0, power=1.0, ray_count=256,
                               seed=11)
        cfg = TraceConfig(grin_substeps=substeps,
                          polarization=polarization)
        res = Tracer(cfg).trace(src, [rod, screen, world],
                                trace_iterations=iterations, capacity=2048)
        assert res.power_conservation_error() < 1e-4
        return res

    def test_matches_single_step(self):
        """Same physics, ~4x fewer iterations: detected power, ledger and
        exit-ray positions agree with the one-step-per-iteration trace."""
        ref = self._trace(substeps=1, iterations=60)
        fast = self._trace(substeps=4, iterations=18)
        assert abs(fast.detector_power("exit")
                   - ref.detector_power("exit")) < 1e-5
        for k in ("measured", "absorbed", "escaped"):
            assert abs(fast.ledger[k] - ref.ledger[k]) < 2e-5
        # exit-spot centroids agree (the quarter-pitch rod focuses the
        # beam near the axis)
        sel_r = ref.measured_det == 0
        sel_f = fast.measured_det == 0
        c_ref = np.average(ref.measured_pos[sel_r][:, :2], axis=0,
                           weights=ref.measured_power[sel_r])
        c_fast = np.average(fast.measured_pos[sel_f][:, :2], axis=0,
                            weights=fast.measured_power[sel_f])
        np.testing.assert_allclose(c_fast, c_ref, atol=1e-5)
        rms_ref = float(np.sqrt(np.average(
            np.sum(ref.measured_pos[sel_r][:, :2] ** 2, axis=1),
            weights=ref.measured_power[sel_r])))
        rms_fast = float(np.sqrt(np.average(
            np.sum(fast.measured_pos[sel_f][:, :2] ** 2, axis=1),
            weights=fast.measured_power[sel_f])))
        assert abs(rms_fast - rms_ref) < 1e-5

    def test_beer_lambert_uses_total_arc(self):
        """The absorption segment length must be the TOTAL arc of all
        sub-steps, not just the first one (mu = 0.8 over a quarter-pitch
        rod absorbs ~47% of what enters)."""
        ref = self._trace(substeps=1, iterations=60, absorption=0.8)
        fast = self._trace(substeps=8, iterations=12, absorption=0.8)
        assert ref.ledger["absorbed"] > 0.3  # the anchor has teeth
        assert abs(fast.ledger["absorbed"] - ref.ledger["absorbed"]) < 2e-4
        assert abs(fast.detector_power("exit")
                   - ref.detector_power("exit")) < 2e-4

    def test_polarized_frame_transport_matches(self):
        ref = self._trace(substeps=1, iterations=60, polarization=True)
        fast = self._trace(substeps=4, iterations=18, polarization=True)
        assert abs(fast.detector_power("exit")
                   - ref.detector_power("exit")) < 1e-5
        sel_r = ref.measured_det == 0
        sel_f = fast.measured_det == 0
        s_ref = np.average(ref.measured_stokes[sel_r], axis=0,
                           weights=ref.measured_power[sel_r])
        s_fast = np.average(fast.measured_stokes[sel_f], axis=0,
                            weights=fast.measured_power[sel_f])
        np.testing.assert_allclose(s_fast, s_ref, atol=1e-5)
