"""Analytic physics invariants (SURVEY.md §6 parity oracle list):
Snell angles, TIR at the critical angle, Fresnel at normal incidence,
Brewster's angle, energy split R + T = 1.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from lightpycl_tpu import physics


def V(*xs):
    return jnp.asarray([xs], jnp.float32)


class TestReflect:
    def test_mirror_normal_incidence(self):
        r = physics.reflect(V(0, 0, -1), V(0, 0, 1))
        assert np.allclose(r, [[0, 0, 1]], atol=1e-7)

    def test_angle_preserved(self, rng):
        for _ in range(10):
            d = rng.normal(size=3)
            d /= np.linalg.norm(d)
            n = np.array([0.0, 0.0, 1.0])
            if d[2] > 0:
                d = -d
            r = np.asarray(physics.reflect(V(*d), V(*n)))[0]
            assert np.dot(r, n) == pytest.approx(-np.dot(d, n), abs=1e-6)
            assert np.linalg.norm(r) == pytest.approx(1.0, abs=1e-6)


class TestRefract:
    def test_snell_angle(self):
        n1, n2 = 1.0, 1.5
        for theta_i in [0.1, 0.4, 0.8, 1.2]:
            d = V(np.sin(theta_i), 0, -np.cos(theta_i))
            t, tir = physics.refract(d, V(0, 0, 1), jnp.float32(n1 / n2))
            assert not bool(tir[0])
            sin_t = float(jnp.linalg.norm(t[0, :2]))
            assert sin_t == pytest.approx(n1 * np.sin(theta_i) / n2, abs=1e-6)

    def test_tir_beyond_critical(self):
        n1, n2 = 1.5, 1.0
        crit = np.arcsin(n2 / n1)
        d = V(np.sin(crit + 0.01), 0, -np.cos(crit + 0.01))
        _, tir = physics.refract(d, V(0, 0, 1), jnp.float32(n1 / n2))
        assert bool(tir[0])
        d = V(np.sin(crit - 0.01), 0, -np.cos(crit - 0.01))
        _, tir = physics.refract(d, V(0, 0, 1), jnp.float32(n1 / n2))
        assert not bool(tir[0])


class TestFresnel:
    def _R(self, theta_i, n1, n2):
        d = V(np.sin(theta_i), 0, -np.cos(theta_i))
        out = physics.snell_interaction(
            d, V(0, 0, 1), jnp.asarray([n1], jnp.float32),
            jnp.asarray([n2], jnp.float32), n2 if n1 == 1.0 else 1.0,
        )
        return float(out["R"][0])

    def test_normal_incidence(self):
        # R = ((n1 - n2) / (n1 + n2))^2
        assert self._R(0.0, 1.0, 1.5) == pytest.approx((0.5 / 2.5) ** 2, abs=1e-6)
        assert self._R(0.0, 1.0, 2.0) == pytest.approx((1 / 3) ** 2, abs=1e-6)

    def test_brewster(self):
        # at Brewster's angle Rp = 0 -> R = Rs / 2
        n1, n2 = 1.0, 1.5
        thb = np.arctan(n2 / n1)
        cos_t = np.cos(np.arcsin(n1 * np.sin(thb) / n2))
        rs = ((n1 * np.cos(thb) - n2 * cos_t) / (n1 * np.cos(thb) + n2 * cos_t)) ** 2
        assert self._R(thb, n1, n2) == pytest.approx(rs / 2, abs=1e-6)

    def test_grazing_R_approaches_one(self):
        # compare against the exact f64 Fresnel value near grazing
        n1, n2, th = 1.0, 1.5, np.pi / 2 - 1e-3
        cos_i = np.cos(th)
        cos_t = np.cos(np.arcsin(n1 * np.sin(th) / n2))
        rs = ((n1 * cos_i - n2 * cos_t) / (n1 * cos_i + n2 * cos_t)) ** 2
        rp = ((n1 * cos_t - n2 * cos_i) / (n1 * cos_t + n2 * cos_i)) ** 2
        exact = 0.5 * (rs + rp)
        assert self._R(th, n1, n2) == pytest.approx(exact, abs=1e-3)
        assert self._R(th, n1, n2) > 0.99

    def test_tir_R_is_one(self):
        n1, n2 = 1.5, 1.0
        crit = np.arcsin(n2 / n1)
        assert self._R(crit + 0.05, n1, n2) == 1.0

    def test_reciprocity(self):
        # R(theta_i; n1 -> n2) == R(theta_t; n2 -> n1)
        n1, n2, th = 1.0, 1.5, 0.6
        tht = np.arcsin(n1 * np.sin(th) / n2)
        assert self._R(th, n1, n2) == pytest.approx(self._R(tht, n2, n1), abs=1e-6)


class TestSnellInteraction:
    def test_energy_split(self, rng):
        d = rng.normal(size=(32, 3))
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        d[:, 2] = -np.abs(d[:, 2])
        out = physics.snell_interaction(
            jnp.asarray(d, jnp.float32),
            jnp.broadcast_to(jnp.asarray([0, 0, 1.0], jnp.float32), (32, 3)),
            jnp.full((32,), 1.0, jnp.float32),
            jnp.full((32,), 1.5, jnp.float32),
            1.0,
        )
        R = np.asarray(out["R"])
        assert ((0 <= R) & (R <= 1)).all()
        # refracted dir is unit where not TIR
        tl = np.linalg.norm(np.asarray(out["refr_dir"]), axis=1)
        assert np.allclose(tl[~np.asarray(out["tir"])], 1.0, atol=1e-5)

    def test_exit_medium_bookkeeping(self):
        # ray inside glass exiting into air: new_ior = env
        d = V(0, 0, 1)  # moving +z, hitting surface with outward normal +z from inside
        out = physics.snell_interaction(
            d, V(0, 0, 1), jnp.asarray([1.5], jnp.float32),
            jnp.asarray([1.5], jnp.float32), 1.0,
        )
        assert not bool(out["entering"][0])
        assert float(out["new_ior"][0]) == pytest.approx(1.0)
