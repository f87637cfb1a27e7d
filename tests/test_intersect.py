"""Intersection tests: jnp path vs Pallas kernel (interpret mode) vs the
float64 Möller–Trumbore oracle; epsilon guards; misses.
(SURVEY.md §7 Stage 1 + Stage 3 correctness cross-check.)
"""

import jax.numpy as jnp
import numpy as np
import pytest

from lightpycl_tpu.geometry.mesh import GeoObject
from lightpycl_tpu.geometry.primitives import OpticalElements
from lightpycl_tpu.ops.intersect_pallas import intersect_pallas
from lightpycl_tpu.tracer.config import TraceConfig
from lightpycl_tpu.tracer.oracle import _mt_nearest_hit
from lightpycl_tpu.tracer.scene import build_scene
from lightpycl_tpu.tracer.step import intersect_jnp

oe = OpticalElements(n_segments=16, n_radial=6)
CFG = TraceConfig()


def random_rays(rng, n, span=1.5):
    o = rng.uniform(-span, span, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return o, d.astype(np.float32)


def scene_and_soup():
    els = [
        oe.parabolic_mirror(0.5, 2.0),
        oe.hemisphere(4.0),
        oe.cube(0.4, center=(0.6, 0.1, 0.8), material="refractive", ior=1.5),
        oe.biconvex_lens(1.0, 0.8, 0.2, center=(-0.5, 0, 1.0)),
    ]
    scene, _ = build_scene(els)
    tv = np.concatenate([e.triangle_vertices() for e in els])
    return scene, tv


class TestSingleTriangle:
    def setup_method(self):
        tri = GeoObject(
            np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0.0]]),
            np.array([[0, 1, 2]]),
        )
        self.scene, _ = build_scene([tri])

    def _hit(self, o, d):
        t, i = intersect_jnp(
            self.scene, jnp.asarray([o], jnp.float32), jnp.asarray([d], jnp.float32), CFG
        )
        return float(t[0]), int(i[0])

    def test_direct_hit(self):
        t, i = self._hit([0.2, 0.2, 1.0], [0, 0, -1])
        assert i == 0 and t == pytest.approx(1.0, abs=1e-6)

    def test_miss_outside(self):
        t, i = self._hit([0.9, 0.9, 1.0], [0, 0, -1])
        assert i == -1 and np.isinf(t)

    def test_parallel_miss(self):
        t, i = self._hit([0.2, 0.2, 1.0], [1, 0, 0])
        assert i == -1

    def test_behind_miss(self):
        t, i = self._hit([0.2, 0.2, -1.0], [0, 0, -1])
        assert i == -1

    def test_eps_guard_self_hit(self):
        # origin ON the triangle: t ~ 0 must be rejected
        t, i = self._hit([0.2, 0.2, 0.0], [0, 0, -1])
        assert i == -1

    def test_beyond_max_len(self):
        cfg = CFG.replace(max_ray_len=0.5)
        t, i = intersect_jnp(
            self.scene, jnp.asarray([[0.2, 0.2, 1.0]], jnp.float32),
            jnp.asarray([[0, 0, -1.0]], jnp.float32), cfg
        )
        assert int(i[0]) == -1


class TestCrossImplementation:
    def test_jnp_matches_oracle(self, rng):
        scene, tv = scene_and_soup()
        o, d = random_rays(rng, 500)
        t1, i1 = map(np.asarray, intersect_jnp(scene, jnp.asarray(o), jnp.asarray(d), CFG))
        t3, i3 = _mt_nearest_hit(
            o.astype(np.float64), d.astype(np.float64),
            tv[:, 0], tv[:, 1] - tv[:, 0], tv[:, 2] - tv[:, 0],
            CFG.eps, CFG.eps_bary, CFG.max_ray_len,
        )
        assert ((i1 >= 0) == (i3 >= 0)).mean() > 0.998  # grazing-edge ties allowed
        both = (i1 >= 0) & (i3 >= 0)
        assert np.abs(t1[both] - t3[both]).max() < 1e-4

    def test_pallas_interpret_matches_jnp(self, rng):
        scene, _ = scene_and_soup()
        o, d = random_rays(rng, 300)
        t1, i1 = map(np.asarray, intersect_jnp(scene, jnp.asarray(o), jnp.asarray(d), CFG))
        t2, i2 = map(
            np.asarray,
            intersect_pallas(scene, jnp.asarray(o), jnp.asarray(d), CFG,
                             ray_block=128, tri_tile=256, interpret=True),
        )
        assert (i1 == i2).all()
        both = np.isfinite(t1)
        assert np.allclose(t1[both], t2[both], atol=1e-5)

    def test_pallas_odd_sizes(self, rng):
        # non-multiple ray counts and tile sizes vs triangle count
        scene, _ = scene_and_soup()
        o, d = random_rays(rng, 77)
        t1, i1 = map(np.asarray, intersect_jnp(scene, jnp.asarray(o), jnp.asarray(d), CFG))
        t2, i2 = map(
            np.asarray,
            intersect_pallas(scene, jnp.asarray(o), jnp.asarray(d), CFG,
                             ray_block=256, tri_tile=128, interpret=True),
        )
        assert (i1 == i2).all()

    def test_nearest_of_two(self):
        # two stacked parallel squares: must report the nearer one
        near = oe.rectangle(1, 1, center=(0, 0, 1))
        far = oe.rectangle(1, 1, center=(0, 0, 2))
        scene, _ = build_scene([near, far])
        t, i = intersect_jnp(
            scene, jnp.asarray([[0.1, 0.1, 0.0]], jnp.float32),
            jnp.asarray([[0, 0, 1.0]], jnp.float32), CFG
        )
        assert float(t[0]) == pytest.approx(1.0, abs=1e-6)
        assert int(i[0]) < near.num_triangles
