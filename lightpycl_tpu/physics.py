"""Scalar (unpolarized) ray-optics primitives as pure jnp functions.

Reference parity: the device functions `reflect()`, `refract()`, `fresnel()`
of kernel_reflect_refract_intersect.cl (SURVEY.md §3 "Reflect/refract
kernel" [recalled]). All functions are branchless (mask math, no lax.cond)
so they vectorize on the VPU and fuse under jit.

Conventions:
  * direction vectors are unit length, shape (..., 3)
  * `normal` is the geometric unit normal oriented AGAINST the incoming ray
    (i.e. dot(d, n) <= 0); `orient_normal` produces it
  * n1 = IOR of the medium the ray travels in, n2 = IOR beyond the surface
"""

from __future__ import annotations

import jax.numpy as jnp

# Guard value used to keep rsqrt/sqrt/div grads and values finite on the
# masked-out lanes; results on those lanes are discarded by the caller.
_TINY = 1e-20


def dot(a, b):
    """Batched 3-vector dot product over the last axis, keepdims=False."""
    return jnp.sum(a * b, axis=-1)


def normalize(v):
    """Unit vector along v (safe for ~zero vectors on masked lanes)."""
    n2 = jnp.sum(v * v, axis=-1, keepdims=True)
    return v * jnp.where(n2 > _TINY, 1.0, 0.0) / jnp.sqrt(jnp.maximum(n2, _TINY))


def orient_normal(d, n_geom):
    """Flip the geometric normal so it faces the incoming ray.

    Returns (n_oriented, entering) where `entering` is True when the ray hits
    the front face (dot(d, n_geom) < 0) — i.e. it is entering the volume the
    geometric normal points out of.
    """
    cosraw = dot(d, n_geom)
    entering = cosraw < 0.0
    n = jnp.where(entering[..., None], n_geom, -n_geom)
    return n, entering


def reflect(d, n):
    """Specular reflection of unit direction d about unit normal n."""
    return d - 2.0 * dot(d, n)[..., None] * n


def refract(d, n, eta):
    """Snell refraction of unit direction d at a surface with normal n.

    eta = n1 / n2. Returns (t_dir, tir) where t_dir is the refracted unit
    direction (garbage-but-finite where tir) and tir flags total internal
    reflection.
    """
    cos_i = -dot(d, n)  # >= 0 since n faces the ray
    sin2_t = eta * eta * jnp.maximum(0.0, 1.0 - cos_i * cos_i)
    tir = sin2_t > 1.0
    cos_t = jnp.sqrt(jnp.maximum(1.0 - sin2_t, 0.0))
    t = eta[..., None] * d + (eta * cos_i - cos_t)[..., None] * n
    return normalize(t), tir


def fresnel_unpolarized(cos_i, cos_t, n1, n2, tir):
    """Unpolarized Fresnel power reflectance R = (Rs + Rp) / 2.

    cos_i, cos_t >= 0. Where `tir`, returns 1.0 exactly.
    """
    rs_num = n1 * cos_i - n2 * cos_t
    rs_den = n1 * cos_i + n2 * cos_t
    rp_num = n1 * cos_t - n2 * cos_i
    rp_den = n1 * cos_t + n2 * cos_i
    rs = (rs_num / jnp.where(jnp.abs(rs_den) > _TINY, rs_den, 1.0)) ** 2
    rp = (rp_num / jnp.where(jnp.abs(rp_den) > _TINY, rp_den, 1.0)) ** 2
    r = 0.5 * (rs + rp)
    return jnp.where(tir, 1.0, jnp.clip(r, 0.0, 1.0))


def snell_interaction(d, n_geom, ray_ior, tri_ior, env_ior):
    """Full dielectric interaction at a surface.

    Args:
      d:        (..., 3) incoming unit direction
      n_geom:   (..., 3) geometric unit normal (outward of the element volume)
      ray_ior:  (...,) IOR of the medium the ray currently travels in
      tri_ior:  (...,) IOR inside the element the triangle bounds
      env_ior:  scalar or (...,) ambient IOR

    Returns dict with:
      refl_dir:  (..., 3) reflected unit direction
      refr_dir:  (..., 3) refracted unit direction (valid where not tir)
      R:         (...,) Fresnel power reflectance (1.0 where TIR)
      new_ior:   (...,) IOR of the medium the REFRACTED child travels in
      entering:  (...,) bool, front-face hit

    Medium bookkeeping follows the reference's per-ray current-IOR model
    (SURVEY.md §3 "Ray-state layout"): entering a dielectric sets the
    refracted child's IOR to the element's; exiting returns it to env_ior.
    """
    n, entering = orient_normal(d, n_geom)
    n1 = ray_ior
    n2 = jnp.where(entering, tri_ior, jnp.broadcast_to(env_ior, ray_ior.shape))
    eta = n1 / jnp.maximum(n2, _TINY)

    cos_i = -dot(d, n)
    refr_dir, tir = refract(d, n, eta)
    cos_t = jnp.sqrt(
        jnp.maximum(0.0, 1.0 - eta * eta * jnp.maximum(0.0, 1.0 - cos_i * cos_i))
    )
    R = fresnel_unpolarized(cos_i, cos_t, n1, n2, tir)
    refl_dir = reflect(d, n)
    # Where TIR, the "refracted" branch carries zero power (R=1); keep its
    # medium unchanged so downstream math stays finite.
    new_ior = jnp.where(tir, n1, n2)
    return {
        "refl_dir": refl_dir,
        "refr_dir": refr_dir,
        "R": R,
        "new_ior": new_ior,
        "entering": entering,
        "tir": tir,
    }
