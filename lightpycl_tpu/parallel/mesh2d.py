"""2-D mesh decomposition: rays sharded on one axis, TRIANGLES on the other.

Reference parity: none (the reference is single-device). This is the
production layout for scenes too large to replicate per chip AND ray
batches too large for one chip: a ("tris", "rays") device mesh where

  * the ray batch shards over the "rays" axis (as in parallel/sharding.py)
    and replicates over "tris";
  * the triangle soup (Scene) shards over "tris" and replicates over "rays";
  * each step: local nearest-hit, `pmin` over "tris" for the global winner,
    winner-contributes + `psum` gather of the hit attributes, then shade /
    detector / compaction computed identically on every "tris" rank (the
    inputs are replicated, so the results are too — ledger and detector
    increments are gated to "tris" rank 0 and `psum`-combined at the end).

No point-to-point traffic: two collectives per bounce over ICI.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from lightpycl_tpu.tracer.config import TraceConfig
from lightpycl_tpu.tracer.rays import DetectorState, Ledger, RayBatch
from lightpycl_tpu.tracer.scene import Scene
from lightpycl_tpu.tracer import step as step_mod

TRI_AXIS = "tris"
RAY_AXIS = "rays"


def make_mesh2d(n_tris: int, n_rays: int) -> Mesh:
    devs = np.array(jax.devices()[: n_tris * n_rays])
    return Mesh(devs.reshape(n_tris, n_rays), (TRI_AXIS, RAY_AXIS))


def place_scene(scene: Scene, mesh: Mesh) -> Scene:
    """Shard the scene's triangle soup over the "tris" axis (replicated
    over "rays")."""
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P(TRI_AXIS))), scene)


def place_rays(rays: RayBatch, mesh: Mesh,
               interleave: bool = True) -> RayBatch:
    """Shard the ray batch over the "rays" axis (replicated over "tris").
    Ray slots are round-robin-interleaved across the ray shards first
    (same reasoning as sharding.interleave_rays: block-sharding a
    front-packed batch piles live rays onto the first shards and
    overflows per-shard compaction)."""
    from lightpycl_tpu.parallel.sharding import interleave_rays

    if interleave:
        rays = interleave_rays(rays, mesh.shape[RAY_AXIS])
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P(RAY_AXIS))), rays)


def place(scene: Scene, rays: RayBatch, mesh: Mesh, interleave: bool = True):
    """Shard the scene over "tris" and the rays over "rays" (see
    place_scene / place_rays)."""
    return place_scene(scene, mesh), place_rays(rays, mesh, interleave)


@functools.partial(jax.jit,
                   static_argnames=("cfg", "iterations", "mesh", "n_detectors"))
def trace_mesh2d(scene: Scene, rays: RayBatch, cfg: TraceConfig,
                 iterations: int, mesh: Mesh, n_detectors: int = 8,
                 key=None):
    """Fixed-depth trace over the 2-D mesh. Returns (rays sharded over
    "rays", DetectorState global, Ledger global).

    `n_detectors` must cover every measure surface in the scene. RNG
    consumers (cfg.needs_rng: roulette and/or Lambertian scattering) need
    `key`; the per-step key folds in the RAY axis index only —
    shade/compact run replicated across the TRI axis, so the draws must
    be identical on every triangle rank."""
    n_tris = mesh.shape[TRI_AXIS]
    Tp = scene.num_triangles_padded
    assert Tp % n_tris == 0
    shard_size = Tp // n_tris
    if cfg.needs_rng and key is None:
        raise ValueError(
            "cfg.needs_rng (roulette / diffuse) requires a PRNG key "
            "(pass key=jax.random.key(seed) to trace_mesh2d)")

    def local(scene_shard, rays, key):
        my_tri = jax.lax.axis_index(TRI_AXIS)
        is_rank0 = (my_tri == 0).astype(jnp.float32)
        det = DetectorState.zeros(cfg.hist_azimuth_bins, cfg.hist_polar_bins,
                                  n_detectors, cfg.image_bins,
                                  coherent=cfg.coherent)
        led = Ledger.start(
            jnp.sum(jnp.where(rays.alive, rays.power, 0.0)) * is_rank0)
        if cfg.needs_rng:
            shard_key = jax.random.fold_in(
                key, jax.lax.axis_index(RAY_AXIS))
        if cfg.cull:
            # Morton quantization box must be identical on every TRI rank
            # (rays are replicated across it; a per-shard box would
            # desynchronize the permutation): pmin/pmax the local shard's
            # valid-triangle bounds into the global scene AABB.
            valid = jnp.any(scene_shard.ww != 0.0, axis=1)[:, None]
            box_lo = jax.lax.pmin(jnp.min(
                jnp.where(valid, scene_shard.v0, jnp.float32(3.4e38)),
                axis=0), TRI_AXIS)
            box_hi = jax.lax.pmax(jnp.max(
                jnp.where(valid, scene_shard.v0, jnp.float32(-3.4e38)),
                axis=0), TRI_AXIS)

        def body(i, st):
            rays, det, led = st
            if cfg.cull:
                # per-bounce Morton resort (ray order is free; identical
                # across TRI ranks by the global box) makes each ray
                # block a coherent patch, so the PER-SHARD cull masks —
                # each shard's contiguous slice of the spatially-sorted
                # tile stream has its own AABBs — actually bite. The
                # fixed-depth loop has no early exit, so once the batch
                # dies the 2M-slot argsort would run for nothing every
                # remaining bounce (measured: the dead-tail overhead ate
                # the whole live-phase win at depth 4) — cond it away.
                def _resort(r):
                    order = step_mod.morton_order(r.o, r.alive,
                                                  box_lo, box_hi)
                    return jax.tree_util.tree_map(lambda a: a[order], r)

                rays = jax.lax.cond(jnp.any(rays.alive), _resort,
                                    lambda r: r, rays)
            # 1. local nearest hit + global reduction over the triangle axis
            t_loc, i_loc = step_mod.intersect(
                scene_shard, rays.o, rays.d, cfg,
                alive=rays.alive if cfg.cull else None)
            i_glob = jnp.where(i_loc >= 0, i_loc + my_tri * shard_size,
                               jnp.int32(2**30))
            t_min = jax.lax.pmin(t_loc, TRI_AXIS)
            cand = jnp.where(t_loc == t_min, i_glob, jnp.int32(2**30))
            i_min = jax.lax.pmin(cand, TRI_AXIS)
            tri = jnp.where(jnp.isfinite(t_min), i_min, -1)

            # 2. winner-contributes gather of per-hit attributes
            local_i = tri - my_tri * shard_size
            mine = (tri >= 0) & (local_i >= 0) & (local_i < shard_size)
            li = jnp.clip(local_i, 0, shard_size - 1)
            a = step_mod.gather_hit_attrs(scene_shard, li)
            mf = mine.astype(jnp.float32)
            attrs = {
                "mat": jax.lax.psum(a["mat"] * mine.astype(jnp.int32), TRI_AXIS),
                "normal": jax.lax.psum(a["normal"] * mf[:, None], TRI_AXIS),
                "ior": jax.lax.psum(a["ior"] * mf, TRI_AXIS),
                "ior_b": jax.lax.psum(a["ior_b"] * mf, TRI_AXIS),
                "reflectivity": jax.lax.psum(a["reflectivity"] * mf, TRI_AXIS),
                "detector_id": jax.lax.psum(
                    (a["detector_id"] + 1) * mine.astype(jnp.int32), TRI_AXIS) - 1,
                "absorb": jax.lax.psum(a["absorb"] * mf, TRI_AXIS),
                "metal_n": jax.lax.psum(a["metal_n"] * mf, TRI_AXIS),
                "metal_k": jax.lax.psum(a["metal_k"] * mf, TRI_AXIS),
                "axis": jax.lax.psum(a["axis"] * mf[:, None], TRI_AXIS),
                "retardance": jax.lax.psum(a["retardance"] * mf, TRI_AXIS),
                "grating_mlp": jax.lax.psum(a["grating_mlp"] * mf, TRI_AXIS),
                "grating_g0": jax.lax.psum(a["grating_g0"] * mf, TRI_AXIS),
                "coat_ior": jax.lax.psum(a["coat_ior"] * mf[:, None],
                                         TRI_AXIS),
                "coat_thickness": jax.lax.psum(
                    a["coat_thickness"] * mf[:, None], TRI_AXIS),
            }
            if "ior_c" in a:
                attrs["ior_c"] = jax.lax.psum(a["ior_c"] * mf, TRI_AXIS)
            if "bire_ne" in a:
                attrs["bire_ne"] = jax.lax.psum(a["bire_ne"] * mf, TRI_AXIS)
            if "scat_mu" in a:
                attrs["scat_mu"] = jax.lax.psum(a["scat_mu"] * mf, TRI_AXIS)
                attrs["scat_g"] = jax.lax.psum(a["scat_g"] * mf, TRI_AXIS)
            if "rough_sigma" in a:
                attrs["rough_sigma"] = jax.lax.psum(a["rough_sigma"] * mf,
                                                    TRI_AXIS)
                attrs["rough_g"] = jax.lax.psum(a["rough_g"] * mf, TRI_AXIS)
            # misses have no winner: psum of zeros -> ior 0; force sane values
            miss = tri < 0
            attrs["ior"] = jnp.where(miss, 1.0, attrs["ior"])
            attrs["mat"] = jnp.where(miss, jnp.int32(2), attrs["mat"])

            # 3. replicated shade/measure/compact (inputs identical across
            # the tris axis); ledger/detector increments gated to rank 0
            k_step = (jax.random.fold_in(shard_key, i)
                      if cfg.needs_rng else None)
            sh = step_mod.shade(scene_shard, rays, t_min, tri, cfg,
                                attrs=attrs, key=k_step)
            sh0 = sh._replace(
                measured_power=sh.measured_power * is_rank0,
                absorbed=sh.absorbed * is_rank0,
                escaped=sh.escaped * is_rank0,
            )
            det = step_mod.accumulate_detector(det, sh0, rays, cfg)
            rr_delta = jnp.float32(0.0)
            if cfg.roulette_threshold > 0.0:
                # identical across the TRI axis (sh is replicated there)
                sh, rr_delta = step_mod.roulette(sh, cfg, k_step)
            new_rays, culled = step_mod.compact(sh, rays.capacity, cfg)
            led = Ledger(
                emitted=led.emitted,
                measured=led.measured + jnp.sum(sh0.measured_power),
                absorbed=led.absorbed + sh0.absorbed,
                escaped=led.escaped + sh0.escaped,
                culled=led.culled
                + (culled + rr_delta + sh.policy_dropped) * is_rank0,
            )
            return new_rays, det, led

        rays, det, led = jax.lax.fori_loop(0, iterations, body,
                                           (rays, det, led))
        det = DetectorState(*(jax.lax.psum(jax.lax.psum(x, TRI_AXIS),
                                           RAY_AXIS) for x in det))
        led = Ledger(*(jax.lax.psum(jax.lax.psum(x, TRI_AXIS), RAY_AXIS)
                       for x in led))
        return rays, det, led

    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(TRI_AXIS), P(RAY_AXIS), P()),
        out_specs=(P(RAY_AXIS), P(), P()),
        check_vma=False,
    )(scene, rays, key)
