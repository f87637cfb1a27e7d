"""Triangle-sharded intersection tests (SURVEY.md §5.7): scene sharded over
8 virtual devices must reproduce the single-device nearest hit exactly."""

import jax.numpy as jnp
import numpy as np
import pytest

import lightpycl_tpu as L
from lightpycl_tpu.parallel.tri_sharding import (
    _gather_hit_attributes,
    intersect_tri_sharded,
    make_tri_mesh,
    shard_scene,
)
from lightpycl_tpu.tracer.config import TraceConfig
from lightpycl_tpu.tracer.step import intersect_jnp

oe = L.optical_elements(n_segments=32, n_radial=12)
CFG = TraceConfig()


@pytest.fixture(scope="module")
def setup():
    els = [
        oe.parabolic_mirror(0.5, 2.0),
        oe.hemisphere(5.0, name="dome"),
        oe.cube(0.4, center=(0.5, 0, 0.8), material="refractive", ior=1.5),
    ]
    scene, _ = L.build_scene(els)
    assert scene.num_triangles_padded % 8 == 0
    rng = np.random.default_rng(3)
    o = rng.uniform(-1, 1, (512, 3)).astype(np.float32)
    o[:, 2] += 1.0
    d = rng.normal(size=(512, 3))
    d = (d / np.linalg.norm(d, axis=1, keepdims=True)).astype(np.float32)
    return scene, jnp.asarray(o), jnp.asarray(d)


def test_matches_unsharded(setup):
    scene, o, d = setup
    t1, i1 = map(np.asarray, intersect_jnp(scene, o, d, CFG))
    mesh = make_tri_mesh(8)
    sharded = shard_scene(scene, mesh)
    t2, i2 = map(np.asarray, intersect_tri_sharded(sharded, o, d, CFG, mesh))
    assert (i1 == i2).all()
    both = np.isfinite(t1)
    assert np.allclose(t1[both], t2[both], atol=1e-6)


def test_gather_hit_attributes(setup):
    scene, o, d = setup
    mesh = make_tri_mesh(8)
    sharded = shard_scene(scene, mesh)
    _, tri = intersect_tri_sharded(sharded, o, d, CFG, mesh)
    mat, normal, ior, refl, det = _gather_hit_attributes(sharded, tri, mesh)
    tri_np = np.asarray(tri)
    hit = tri_np >= 0
    safe = np.maximum(tri_np, 0)
    assert np.array_equal(np.asarray(mat)[hit], np.asarray(scene.mat)[safe][hit])
    assert np.allclose(np.asarray(normal)[hit], np.asarray(scene.normal)[safe][hit],
                       atol=1e-6)
    assert np.array_equal(np.asarray(det)[hit],
                          np.asarray(scene.detector_id)[safe][hit])
    assert (np.asarray(det)[~hit] == -1).all()
