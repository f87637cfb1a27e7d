"""Triangle-sharded intersection: scale the TRIANGLE axis across chips.

Reference parity: none — the reference holds the whole scene on one device
(SURVEY.md §5.7). This is the survey's 'sequence-parallel analogue' for
meshes too large to replicate per chip: the triangle soup shards over the
`"tris"` mesh axis, every chip intersects the (replicated) ray batch
against its shard, and the global nearest hit reduces across chips:

  1. local nearest hit (t_local, i_local+offset) on each shard
  2. global t_min = pmin(t_local) over the axis
  3. winner shard contributes the hit data; a psum combines (exactly one
     shard wins per ray; ties broken by lowest global triangle index).

No ppermute ring needed: the reduction is two collectives over ICI.
Shading needs per-hit triangle attributes, which are gathered the same way
(winner contributes, psum).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from lightpycl_tpu.tracer.config import TraceConfig
from lightpycl_tpu.tracer.scene import Scene
from lightpycl_tpu.tracer.step import intersect

TRI_AXIS = "tris"

_INF = float(np.inf)


def make_tri_mesh(n_devices=None) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (TRI_AXIS,))


def shard_scene(scene: Scene, mesh: Mesh) -> Scene:
    """Place Scene arrays sharded along the triangle axis. The padded
    triangle count must divide the mesh size (build_scene pads to 256)."""
    sh = NamedSharding(mesh, P(TRI_AXIS))
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), scene)


@functools.partial(jax.jit, static_argnames=("cfg", "mesh"))
def intersect_tri_sharded(scene: Scene, o, d, cfg: TraceConfig, mesh: Mesh):
    """Global nearest hit with the scene sharded over mesh axis "tris".

    o, d are replicated (C, 3). Returns (t (C,), global tri index (C,),
    both replicated). Semantics identical to step.intersect on the
    unsharded scene (ties -> lowest global triangle index).
    """
    n_shards = mesh.shape[TRI_AXIS]
    Tp = scene.num_triangles_padded
    assert Tp % n_shards == 0
    shard_size = Tp // n_shards

    def local(scene_shard, o, d):
        idx = jax.lax.axis_index(TRI_AXIS)
        t_loc, i_loc = intersect(scene_shard, o, d, cfg)
        i_glob = jnp.where(i_loc >= 0, i_loc + idx * shard_size, jnp.int32(2**30))
        t_min = jax.lax.pmin(t_loc, TRI_AXIS)
        # among shards achieving t_min, lowest global index wins
        cand = jnp.where(t_loc == t_min, i_glob, jnp.int32(2**30))
        i_min = jax.lax.pmin(cand, TRI_AXIS)
        i_out = jnp.where(jnp.isfinite(t_min), i_min, -1)
        return t_min, i_out

    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(TRI_AXIS), P(), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )(scene, o, d)


@functools.partial(jax.jit, static_argnames=("mesh",))
def _gather_hit_attributes(scene: Scene, tri: jnp.ndarray, mesh: Mesh):
    """PRIVATE (test anchor only): fetch the CORE per-hit triangle
    attributes (mat, normal, ior, reflectivity, detector_id) from the
    owning shard: the winner contributes, psum combines. tri is the GLOBAL
    index from intersect_tri_sharded (-1 miss).

    This is the minimal building-block demonstration of the
    winner-contributes pattern and carries only 5 of the 17 attribute
    columns; the production triangle-sharded trace (parallel/mesh2d.py)
    mirrors step.gather_hit_attrs' FULL column set (dispersion, optics,
    coatings, metals) — use and extend that, not this.
    """
    n_shards = mesh.shape[TRI_AXIS]
    shard_size = scene.num_triangles_padded // n_shards

    def local(scene_shard, tri):
        idx = jax.lax.axis_index(TRI_AXIS)
        local_i = tri - idx * shard_size
        mine = (tri >= 0) & (local_i >= 0) & (local_i < shard_size)
        li = jnp.clip(local_i, 0, shard_size - 1)
        mask_f = mine.astype(jnp.float32)
        mat = jax.lax.psum(scene_shard.mat[li] * mine.astype(jnp.int32), TRI_AXIS)
        normal = jax.lax.psum(scene_shard.normal[li] * mask_f[:, None], TRI_AXIS)
        ior = jax.lax.psum(scene_shard.ior[li] * mask_f, TRI_AXIS)
        refl = jax.lax.psum(scene_shard.reflectivity[li] * mask_f, TRI_AXIS)
        # detector_id is -1 for non-measure triangles; offset by +1 so the
        # masked psum composes, then shift back (misses end at -1)
        det = jax.lax.psum(
            (scene_shard.detector_id[li] + 1) * mine.astype(jnp.int32), TRI_AXIS
        ) - 1
        return mat, normal, ior, refl, det

    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(TRI_AXIS), P()),
        out_specs=(P(), P(), P(), P(), P()),
        check_vma=False,
    )(scene, tri)
