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


def refract_full(d, n, eta):
    """Snell refraction of unit direction d at a surface with normal n.

    eta = n1 / n2. Returns (t_dir, tir, cos_t): refracted unit direction
    (garbage-but-finite where tir), the TIR flag, and cos of the
    transmission angle (0 where tir)."""
    cos_i = -dot(d, n)  # >= 0 since n faces the ray
    sin2_t = eta * eta * jnp.maximum(0.0, 1.0 - cos_i * cos_i)
    tir = sin2_t > 1.0
    # double-where, not sqrt(max(x, 0)): sqrt'(0) = inf, and reverse-mode
    # multiplies it by the (zero) cotangent of masked TIR/garbage lanes —
    # 0 * inf = nan poisons every gradient (lightpycl_tpu.diff). Forward
    # value is identical.
    pos = 1.0 - sin2_t
    cos_t = jnp.where(pos > 0.0, jnp.sqrt(jnp.where(pos > 0.0, pos, 1.0)),
                      0.0)
    t = eta[..., None] * d + (eta * cos_i - cos_t)[..., None] * n
    return normalize(t), tir, jnp.where(tir, 0.0, cos_t)


def refract(d, n, eta):
    """Snell refraction; returns (t_dir, tir). See refract_full."""
    t, tir, _ = refract_full(d, n, eta)
    return t, tir


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


def fresnel_amplitudes(cos_i, cos_t, n1, n2):
    """Signed Fresnel amplitude coefficients (rs, rp, ts, tp); cos_i/cos_t
    >= 0. Conventions: rp sign per the Verdet convention so that
    rs == rp at normal incidence has opposite sign (rp = (n2 ci - n1 ct)/..)."""
    den_s = n1 * cos_i + n2 * cos_t
    den_p = n2 * cos_i + n1 * cos_t
    den_s = jnp.where(jnp.abs(den_s) > _TINY, den_s, 1.0)
    den_p = jnp.where(jnp.abs(den_p) > _TINY, den_p, 1.0)
    rs = (n1 * cos_i - n2 * cos_t) / den_s
    rp = (n2 * cos_i - n1 * cos_t) / den_p
    ts = 2.0 * n1 * cos_i / den_s
    tp = 2.0 * n1 * cos_i / den_p
    return rs, rp, ts, tp


def tir_phase_shift(cos_i, n_rel):
    """Relative s-p phase shift delta = delta_p - delta_s under total
    internal reflection; n_rel = n2/n1 (< 1 in the TIR regime).
    tan(d_s/2) = sqrt(sin^2 - n^2)/cos, tan(d_p/2) = same / n^2."""
    sin2 = jnp.maximum(0.0, 1.0 - cos_i * cos_i)
    root = jnp.sqrt(jnp.maximum(sin2 - n_rel * n_rel, 0.0))
    d_s = 2.0 * jnp.arctan2(root, jnp.maximum(cos_i, _TINY))
    d_p = 2.0 * jnp.arctan2(root, jnp.maximum(n_rel * n_rel * cos_i, _TINY))
    return d_p - d_s


def rotate_stokes(s1, s2, cos_phi, sin_phi):
    """Rotate the polarization reference frame by phi about the ray
    direction: (S1, S2) rotate by 2*phi (S3 invariant)."""
    c2 = cos_phi * cos_phi - sin_phi * sin_phi
    s2r = 2.0 * cos_phi * sin_phi
    return s1 * c2 + s2 * s2r, -s1 * s2r + s2 * c2


def polarized_split(s0, s1, s2, s3, cos_i, cos_t, n1, n2, tir):
    """Mueller-calculus Fresnel split of a Stokes vector (UNnormalized,
    s0 = power) expressed in the incidence (s, p) frame.

    Returns (refl Stokes 4-tuple, trans Stokes 4-tuple). Under TIR the
    reflection applies the s-p retardation (linear -> elliptical, the
    Fresnel-rhomb effect) and transmission carries zero power.
    Energy: s0_r + s0_t == s0 exactly (per-component Rs+Ts = Rp+Tp = 1).
    """
    rs, rp, ts, tp = fresnel_amplitudes(cos_i, cos_t, n1, n2)
    Rs, Rp = rs * rs, rp * rp
    cross_r = rs * rp                       # signed: encodes 0/pi phase
    f = (n2 * cos_t) / jnp.maximum(n1 * cos_i, _TINY)
    Ts, Tp = f * ts * ts, f * tp * tp
    cross_t = f * ts * tp

    # non-TIR reflection
    r0 = 0.5 * (Rs + Rp) * s0 + 0.5 * (Rs - Rp) * s1
    r1 = 0.5 * (Rs - Rp) * s0 + 0.5 * (Rs + Rp) * s1
    r2 = cross_r * s2
    r3 = cross_r * s3
    # TIR reflection: unit reflectance + retardation delta between s and p
    delta = tir_phase_shift(cos_i, n2 / jnp.maximum(n1, _TINY))
    cd, sd = jnp.cos(delta), jnp.sin(delta)
    r0 = jnp.where(tir, s0, r0)
    r1 = jnp.where(tir, s1, r1)
    r2 = jnp.where(tir, cd * s2 + sd * s3, r2)
    r3 = jnp.where(tir, -sd * s2 + cd * s3, r3)

    t0 = 0.5 * (Ts + Tp) * s0 + 0.5 * (Ts - Tp) * s1
    t1 = 0.5 * (Ts - Tp) * s0 + 0.5 * (Ts + Tp) * s1
    t2 = cross_t * s2
    t3 = cross_t * s3
    zero = jnp.zeros_like(s0)
    t0 = jnp.where(tir, zero, t0)
    t1 = jnp.where(tir, zero, t1)
    t2 = jnp.where(tir, zero, t2)
    t3 = jnp.where(tir, zero, t3)
    return (r0, r1, r2, r3), (t0, t1, t2, t3)


def _branch_safe_sqrt(z):
    """Complex sqrt with a double-where guard around the branch point:
    lanes sitting EXACTLY at z = 0 (e.g. dead grazing children at the
    critical angle) make sqrt's 1/(2 sqrt z) VJP infinite, and 0 * inf =
    nan poisons every gradient (lightpycl_tpu.diff). sqrt(0) = 0 is kept
    (the exact physics: cos_t = 0, R = 1 at the critical angle)."""
    zsafe = _abs2(z) > 1e-12
    return jnp.where(zsafe, jnp.sqrt(jnp.where(zsafe, z, jnp.complex64(1.0))),
                     jnp.complex64(0.0))


def metal_rs_rp(cos_i, n1, n_metal, k_metal):
    """Complex Fresnel reflection amplitudes (rs, rp) at a bare METAL
    surface: incident dielectric n1 | absorbing medium n_metal - i k_metal
    (optics sign convention: absorption = NEGATIVE imaginary part with the
    e^{-i omega t} phase convention used throughout).

    Complex Snell: cos_t = sqrt(1 - (n1/ñ)^2 sin^2), principal branch;
    rs = (n1 ci - ñ ct)/(n1 ci + ñ ct), rp Verdet-signed like
    fresnel_amplitudes: rp = (ñ ci - n1 ct)/(ñ ci + n1 ct). k = 0 reduces
    to the bare dielectric amplitudes exactly. |rs|^2, |rp|^2 are the
    polarized power reflectances; 1 - R is ABSORBED in the metal (nothing
    transmits). The relative phase arg(rs) - arg(rp) is the metallic
    retardation that turns linear input elliptical on oblique reflection.
    """
    one = jnp.complex64(1.0)
    ci = jnp.maximum(cos_i, 1e-6).astype(jnp.complex64)
    nc = (jnp.asarray(n_metal, jnp.float32)
          - 1j * jnp.asarray(k_metal, jnp.float32)).astype(jnp.complex64)
    nc = jnp.where(jnp.abs(nc) > _TINY, nc, one)
    n1c = jnp.asarray(n1, jnp.float32).astype(jnp.complex64)
    sin2 = (one - ci * ci) * (n1c / nc) ** 2
    ct = _branch_safe_sqrt(one - sin2)
    # principal-branch sqrt can land on the wrong sheet for absorbing
    # media; the physical branch has Re(ñ ct) >= 0 (decay into the metal)
    ct = jnp.where(jnp.real(nc * ct) < 0, -ct, ct)

    def _r(a, b):
        den = a + b
        den = jnp.where(jnp.abs(den) > _TINY, den, one)
        return (a - b) / den

    rs = _r(n1c * ci, nc * ct)
    rp = _r(nc * ci, n1c * ct)
    return rs, rp


def _abs2(z):
    """|z|^2 via real^2 + imag^2 — NOT jnp.abs(z)**2: abs has a nan VJP
    at exactly z = 0, and masked lanes (e.g. metal_n = 0 rays in shade's
    branchless metal branch, where rs == 0 identically) would poison every
    gradient through the trace (lightpycl_tpu.diff)."""
    return jnp.real(z) ** 2 + jnp.imag(z) ** 2


def metal_reflectance(cos_i, n1, n_metal, k_metal):
    """Unpolarized power reflectance of a bare metal surface,
    R = (|rs|^2 + |rp|^2) / 2 (see metal_rs_rp). Clipped to [0, 1]."""
    rs, rp = metal_rs_rp(cos_i, n1, n_metal, k_metal)
    r = 0.5 * (_abs2(rs) + _abs2(rp))
    return jnp.clip(r.astype(jnp.float32), 0.0, 1.0)


def mueller_reflect(s0, s1, s2, s3, rs, rp):
    """Reflection Mueller block for arbitrary complex amplitudes (rs, rp)
    in the incidence (s, p) frame — the same algebra polarized_film_split
    uses: cross term X = conj(rs) rp carries the retardation in the
    package's Stokes sign convention."""
    Rs = _abs2(rs)
    Rp = _abs2(rp)
    X = jnp.conj(rs) * rp
    r0 = 0.5 * (Rs + Rp) * s0 + 0.5 * (Rs - Rp) * s1
    r1 = 0.5 * (Rs - Rp) * s0 + 0.5 * (Rs + Rp) * s1
    r2 = jnp.real(X) * s2 - jnp.imag(X) * s3
    r3 = jnp.imag(X) * s2 + jnp.real(X) * s3
    return r0, r1, r2, r3


def orthonormal_basis(n):
    """Branchless orthonormal tangents (t1, t2) for unit normals n (..., 3)
    (Duff et al., "Building an Orthonormal Basis, Revisited" — sign trick
    avoids the near-pole branch, so it vectorizes on the VPU)."""
    nx, ny, nz = n[..., 0], n[..., 1], n[..., 2]
    s = jnp.where(nz >= 0.0, 1.0, -1.0)
    a = -1.0 / (s + nz)
    b = nx * ny * a
    t1 = jnp.stack([1.0 + s * nx * nx * a, s * b, -s * nx], axis=-1)
    t2 = jnp.stack([b, s + ny * ny * a, -ny], axis=-1)
    return t1, t2


def sample_lambertian(key, n):
    """Cosine-weighted hemisphere directions about unit normals n (C, 3):
    pdf(theta) = cos(theta) / pi — the Lambertian scatter law. Standard
    concentric construction: radius sqrt(u1), height sqrt(1 - u1)."""
    import jax

    C = n.shape[0]
    u = jax.random.uniform(key, (C, 2))
    r = jnp.sqrt(u[:, 0])
    phi = (2.0 * jnp.pi) * u[:, 1]
    t1, t2 = orthonormal_basis(n)
    return (r * jnp.cos(phi))[:, None] * t1 \
        + (r * jnp.sin(phi))[:, None] * t2 \
        + jnp.sqrt(jnp.maximum(1.0 - u[:, 0], 0.0))[:, None] * n


def sample_henyey_greenstein(key, d, g):
    """Henyey-Greenstein phase-function directions about unit incident
    directions d (C, 3) with per-ray anisotropy g (C,) in (-1, 1):
    pdf(cos) = (1 - g^2) / (2 (1 + g^2 - 2 g cos)^{3/2}), mean cosine = g.
    g = 0 reduces exactly to isotropic scattering (branchless: the g -> 0
    limit of the sampling formula is 1 - 2u, taken via jnp.where to avoid
    0/0). Azimuth uniform about d."""
    import jax

    C = d.shape[0]
    u = jax.random.uniform(key, (C, 2))
    small = jnp.abs(g) < 1e-4
    g_safe = jnp.where(small, 0.5, g)
    frac = (1.0 - g_safe * g_safe) / (1.0 + g_safe - 2.0 * g_safe * u[:, 0])
    cos_t = jnp.where(
        small, 1.0 - 2.0 * u[:, 0],
        (1.0 + g_safe * g_safe - frac * frac) / (2.0 * g_safe))
    cos_t = jnp.clip(cos_t, -1.0, 1.0)
    sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))
    phi = (2.0 * jnp.pi) * u[:, 1]
    t1, t2 = orthonormal_basis(d)
    return (sin_t * jnp.cos(phi))[:, None] * t1 \
        + (sin_t * jnp.sin(phi))[:, None] * t2 \
        + cos_t[:, None] * d


def grin_index(r, center, axis, n0, a):
    """Local index of the radial-parabolic (SELFOC) GRIN profile at
    points r (C, 3): n(rho)^2 = n0^2 (1 - a rho^2), rho = distance from
    the profile axis (unit `axis` through `center`). All of center/axis/
    n0/a are per-ray (C, ...) so mixed-element batches work. Clamped at
    n >= 0.05 n0 so steep profiles cannot produce imaginary indices."""
    rel = r - center
    rho = rel - jnp.sum(rel * axis, axis=1, keepdims=True) * axis
    rho2 = jnp.sum(rho * rho, axis=1)
    n2 = n0 * n0 * (1.0 - a * rho2)
    return jnp.sqrt(jnp.maximum(n2, 2.5e-3 * n0 * n0))


def _grin_grad(r, center, axis, n0, a):
    """grad n of the parabolic profile: -n0^2 a rho_vec / n, (C, 3)."""
    rel = r - center
    rho = rel - jnp.sum(rel * axis, axis=1, keepdims=True) * axis
    n = grin_index(r, center, axis, n0, a)
    return -(n0 * n0 * a / n)[:, None] * rho


def grin_rk4_step(r0, d0, h, center, axis, n0, a):
    """One classic RK4 step of the ray equation through a GRIN medium,
    arc-length parameterized via the optical momentum v = n * t_hat:

        dr/ds = v / |v|,   dv/ds = grad n(r)

    Args are per-ray: positions r0 (C, 3), unit directions d0 (C, 3),
    step length h (scalar or (C,)), profile params (C,)/(C, 3).
    Returns (r1, d1 unit, n1 local index, opl_inc Simpson-weighted
    integral of n ds over the step)."""
    h = jnp.broadcast_to(jnp.asarray(h, jnp.float32), r0.shape[:1])
    hc = h[:, None]

    def f(r, v):
        vn = v / jnp.maximum(
            jnp.linalg.norm(v, axis=1, keepdims=True), 1e-20)
        return vn, _grin_grad(r, center, axis, n0, a)

    n_start = grin_index(r0, center, axis, n0, a)
    v0 = n_start[:, None] * d0
    k1r, k1v = f(r0, v0)
    k2r, k2v = f(r0 + 0.5 * hc * k1r, v0 + 0.5 * hc * k1v)
    k3r, k3v = f(r0 + 0.5 * hc * k2r, v0 + 0.5 * hc * k2v)
    k4r, k4v = f(r0 + hc * k3r, v0 + hc * k3v)
    r1 = r0 + (hc / 6.0) * (k1r + 2.0 * k2r + 2.0 * k3r + k4r)
    v1 = v0 + (hc / 6.0) * (k1v + 2.0 * k2v + 2.0 * k3v + k4v)
    d1 = v1 / jnp.maximum(jnp.linalg.norm(v1, axis=1, keepdims=True), 1e-20)
    n_end = grin_index(r1, center, axis, n0, a)
    n_mid = grin_index(r0 + 0.5 * hc * k2r, center, axis, n0, a)
    opl_inc = h * (n_start + 4.0 * n_mid + n_end) / 6.0
    return r1, d1, n_end, opl_inc


def grin_selfoc_step(r0, d0, h, center, axis, n0, a):
    """EXACT closed-form propagator through the radial-parabolic SELFOC
    profile (no numerical integration). Re-parameterizing the ray
    equation by d sigma = ds / n (optical momentum v = n t_hat):

        dr/dsigma = v,   dv/dsigma = grad(n^2) / 2 = -n0^2 a rho_vec

    so for the parabolic profile the transverse motion is EXACTLY a
    harmonic oscillator with k = n0^2 a (trigonometric for a > 0,
    hyperbolic for a < 0) while the axial coordinate advances linearly.
    The step advances sigma = h / n(r0) (arc length ~= h to first
    order; the parameterization difference vs an arc-length step is
    O(h^2) and vanishes as the engine's step control shrinks h near
    surfaces). The optical path is also closed-form:
    OPL = int n ds = int |v|^2 dsigma, elementary trig/hyperbolic
    integrals of the same motion, and |v(sigma)| = n(r(sigma)) holds
    exactly by energy conservation. grin_rk4_step stays as the
    independent numerical formulation (tests/test_grin.py pins the two
    against each other plus an f64 sigma-domain integrator).
    Same signature and returns as grin_rk4_step; lanes with a == 0
    reduce exactly to the straight ray r0 + h d0, OPL = n h."""
    h = jnp.broadcast_to(jnp.asarray(h, jnp.float32), r0.shape[:1])
    n_start = grin_index(r0, center, axis, n0, a)
    sig = h / n_start

    rel = r0 - center
    z0 = jnp.sum(rel * axis, axis=1)
    u0 = rel - z0[:, None] * axis
    v0 = n_start[:, None] * d0
    vz = jnp.sum(v0 * axis, axis=1)
    vu0 = v0 - vz[:, None] * axis

    k = n0 * n0 * a
    w = jnp.sqrt(jnp.abs(k))
    small = w * sig < 1e-6  # k -> 0 limit: C -> 1, S -> sigma
    ws = jnp.where(small, 1.0, w)
    t = w * sig
    trig = k > 0
    # C, S solve x'' = -k x with (C, C')(0) = (1, 0), (S, S')(0) = (0, 1)
    C = jnp.where(small, 1.0, jnp.where(trig, jnp.cos(t), jnp.cosh(t)))
    S = jnp.where(small, sig,
                  jnp.where(trig, jnp.sin(t), jnp.sinh(t)) / ws)
    u1 = u0 * C[:, None] + vu0 * S[:, None]
    vu1 = vu0 * C[:, None] - (k * S)[:, None] * u0
    r1 = center + (z0 + vz * sig)[:, None] * axis + u1
    v1 = vz[:, None] * axis + vu1
    d1 = v1 / jnp.maximum(jnp.linalg.norm(v1, axis=1, keepdims=True), 1e-20)
    n_end = grin_index(r1, center, axis, n0, a)

    # OPL = vz^2 sigma + |vu0|^2 Icc + k^2 |u0|^2 Iss - 2 k (u0.vu0) Ics
    # with Icc = sig/2 + s2w, k^2 Iss = k (sig/2 - s2w), and the cross
    # term collapsing to -(u0.vu0) sin^2(t) [trig] / +(u0.vu0) sinh^2(t)
    # [hyperbolic]; s2w = sin(2t)/(4w) resp. sinh(2t)/(4w)
    A2 = jnp.sum(vu0 * vu0, axis=1)
    B2 = jnp.sum(u0 * u0, axis=1)
    p = jnp.sum(u0 * vu0, axis=1)
    s2w = jnp.where(small, 0.5 * sig,
                    jnp.where(trig, jnp.sin(2.0 * t),
                              jnp.sinh(2.0 * t)) / (4.0 * ws))
    cross = jnp.where(trig, jnp.sin(t) ** 2, -jnp.sinh(t) ** 2)
    opl_inc = (vz * vz * sig + A2 * (0.5 * sig + s2w)
               + B2 * k * (0.5 * sig - s2w) - p * cross)
    return r1, d1, n_end, opl_inc


def parallel_transport(v, d0, d1):
    """Levi-Civita (minimal-rotation) transport of a frame vector along a
    direction change d0 -> d1 (all (C, 3), directions unit): applies the
    rotation about d0 x d1 that maps d0 onto d1, in the trig-free
    double-reflection form

        v' = v - (v.(d0+d1) / (1 + d0.d1)) (d0+d1) + 2 (v.d0) d1.

    For v perpendicular to d0 this is the parallel transport of the
    polarization frame along a curved ray (no rotation about the ray
    axis); composing steps along a skew path accumulates the geometric
    (Rytov) rotation, which tests/test_grin.py pins against the
    2 pi (1 - cos alpha) solid-angle law on a SELFOC helix. Guarded
    against the antiparallel singularity (unreachable for the small
    per-step turning angles the engine produces)."""
    s = d0 + d1
    den = jnp.maximum(1.0 + dot(d0, d1), 1e-6)
    return (v - (dot(v, s) / den)[:, None] * s
            + 2.0 * dot(v, d0)[:, None] * d1)


def _fresnel_interface_c(eta_a, eta_b):
    """Complex interface amplitude (eta_a - eta_b) / (eta_a + eta_b)."""
    one = jnp.complex64(1.0)
    den = eta_a + eta_b
    den = jnp.where(jnp.abs(den) > _TINY, den, one)
    return (eta_a - eta_b) / den


def multilayer_rs_rp(cos_i, n1, layers_n, layers_h, n_sub, wl):
    """Complex reflection amplitudes (rs, rp) of a LOSSLESS dielectric
    stack: incident medium n1 | layers (n_k, h_k) k = 0..L-1 (layer 0
    adjacent to the incident medium) | substrate n_sub.

    Bottom-up Airy recursion (Möbius composition of interface
    reflections),
        r_k = (rho_k + r_{k+1} e^{2i delta_k}) /
              (1 + rho_k r_{k+1} e^{2i delta_k}),
    evaluated in complex64: principal-branch complex sqrt makes the phase
    factor DECAY for evanescent layer waves and |r| = 1 exactly under
    substrate TIR. A zero-thickness layer drops out EXACTLY (the Möbius
    composition of adjacent interface coefficients telescopes), so stacks
    padded with (n, h=0) entries are unchanged — build_scene relies on
    this to give every triangle the same static layer count.

    layers_n / layers_h: sequences of per-ray arrays (or scalars), length
    L >= 1. Extension over the reference (uncoated surfaces only); the f64
    oracle implements the same stack via the characteristic-matrix method
    (a deliberately different formulation — tracer/oracle.py).

    NOTE: multilayer_amplitudes (the polarized path) implements the SAME
    stack via the characteristic-matrix method in f32 on device. Keeping
    both formulations is deliberate (three independent implementations of
    this physics: Airy here, f32 matrix there, f64 matrix in the oracle);
    tests/test_coating.py pins the two device paths to each other so a
    fix applied to one cannot silently skew the unpolarized-vs-polarized
    parity. Mirror any numeric-guard change (e.g. the grazing clamp).
    """
    one = jnp.complex64(1.0)
    cos_i = jnp.maximum(cos_i, 1e-6)   # grazing guard, mirrors
    #                                    multilayer_amplitudes
    sin2 = jnp.maximum(0.0, 1.0 - cos_i * cos_i)
    n1s2 = (n1 * n1) * sin2  # invariant n^2 sin^2 across the stack

    def cos_in(n):
        n = jnp.maximum(n, _TINY)
        return _branch_safe_sqrt(
            one - (n1s2 / (n * n)).astype(jnp.complex64))

    def etas(n, c):
        return n * c, n / jnp.where(jnp.abs(c) > _TINY, c, one)

    c1 = cos_i.astype(jnp.complex64)
    e1s, e1p = n1 * c1, n1 / jnp.where(jnp.abs(c1) > _TINY, c1, one)
    cs = cos_in(n_sub)
    ess, esp = etas(n_sub, cs)

    layers_n = list(layers_n)
    layers_h = list(layers_h)
    if not layers_n or len(layers_n) != len(layers_h):
        raise ValueError("need >= 1 layer and len(layers_n) == len(layers_h)")

    # walk from the substrate interface upward; after processing layer k,
    # `phase` holds its round-trip factor, consumed by the interface above
    prev_s, prev_p = ess, esp
    r_s = r_p = phase = None
    for nk, hk in zip(reversed(layers_n), reversed(layers_h)):
        ck = cos_in(nk)
        eks, ekp = etas(nk, ck)
        rho_s = _fresnel_interface_c(eks, prev_s)
        rho_p = _fresnel_interface_c(ekp, prev_p)
        if r_s is None:
            r_s, r_p = rho_s, rho_p
        else:
            r_s = _moebius(rho_s, r_s, phase)
            r_p = _moebius(rho_p, r_p, phase)
        phase = jnp.exp(
            2.0j * (2.0 * jnp.pi * nk * hk / jnp.maximum(wl, _TINY))
            .astype(jnp.complex64) * ck)
        prev_s, prev_p = eks, ekp
    r_s = _moebius(_fresnel_interface_c(e1s, prev_s), r_s, phase)
    r_p = _moebius(_fresnel_interface_c(e1p, prev_p), r_p, phase)
    return r_s, r_p


def _moebius(rho, r_below, phase):
    """One Airy recursion step: combine the interface coefficient rho with
    the composite reflection r_below seen across a layer of round-trip
    phase factor `phase`."""
    one = jnp.complex64(1.0)
    num = rho + r_below * phase
    den = one + rho * r_below * phase
    den = jnp.where(jnp.abs(den) > _TINY, den, one)
    return num / den


def thin_film_rs_rp(cos_i, n1, nf, n2, h, wl):
    """Single-film shorthand for multilayer_rs_rp (see there). h = 0
    reduces to the bare n1 -> n2 Fresnel amplitudes exactly."""
    return multilayer_rs_rp(cos_i, n1, [nf], [h], n2, wl)


def multilayer_amplitudes(cos_i, n1, layers_n, layers_h, n_sub, wl):
    """Polarized complex response of a lossless dielectric stack via the
    characteristic-matrix method (Abeles/Macleod), complex64.

    Returns (rs, rp, Ts, Tp, Xt):
      rs, rp : complex reflection amplitudes in the VERDET sign convention
               (matching fresnel_amplitudes; the admittance-form rp is
               negated) — |r|^2 are the power reflectances, the relative
               phase arg(rs) - arg(rp) carries film/TIR retardation;
      Ts, Tp : real power transmittances, T = 4 eta_1 Re(eta_sub) /
               |eta_1 B + C|^2 — EXACTLY 1 - |r|^2 for a lossless stack,
               and exactly 0 under substrate TIR (Re(eta_sub) = 0);
      Xt     : complex transmission cross term sqrt(Ts Tp)
               e^{i (arg tp - arg ts)} — i.e. Xt = conj(ts) tp up to real
               positive factors, matching the reflection cross-term
               convention Xr = conj(rs) rp — for the Mueller s2/s3 block (the
               E- vs H-field p-amplitude conventions differ only by real
               positive factors, so the PHASE is convention-free).

    h = 0 layers are exactly inert (M = I); an all-zero stack reduces to
    the bare n1 -> n_sub polarized Fresnel interface, including the TIR
    phase shift (anchored in tests against polarized_split).

    NOTE: the scalar path implements the same stack via the Airy/Moebius
    recursion (multilayer_rs_rp) — see the note there on why both device
    formulations are kept and how tests pin them together.
    """
    one = jnp.complex64(1.0)
    n1 = jnp.asarray(n1, jnp.float32)
    n_sub = jnp.asarray(n_sub, jnp.float32)
    wl = jnp.asarray(wl, jnp.float32)
    ci = jnp.maximum(jnp.asarray(cos_i, jnp.float32), 1e-6)  # grazing guard
    sin2 = jnp.maximum(0.0, 1.0 - ci * ci)
    n1s2 = (n1 * n1) * sin2

    def cos_in(n):
        n = jnp.maximum(n, _TINY)
        return _branch_safe_sqrt(
            one - (n1s2 / (n * n)).astype(jnp.complex64))

    def tilt(n, c, pol):
        n = n.astype(jnp.complex64) if hasattr(n, "astype") else n * one
        if pol == "s":
            return n * c
        return n / jnp.where(jnp.abs(c) > _TINY, c, one)

    cs = cos_in(n_sub)
    layers = [(jnp.asarray(n, jnp.float32), jnp.asarray(h, jnp.float32))
              for n, h in zip(layers_n, layers_h)]

    def one_pol(pol):
        e1 = tilt(n1, ci.astype(jnp.complex64), pol)
        em = tilt(n_sub, cs, pol)
        B = jnp.ones_like(em)
        C = em
        for nk, hk in reversed(layers):
            ck = cos_in(nk)
            ek = tilt(nk, ck, pol)
            d = (2.0 * jnp.pi * nk * hk / jnp.maximum(wl, _TINY)
                 ).astype(jnp.complex64) * ck
            cd, sd = jnp.cos(d), jnp.sin(d)
            ek_safe = jnp.where(jnp.abs(ek) > _TINY, ek, one)
            B, C = cd * B + 1j * sd / ek_safe * C, 1j * ek * sd * B + cd * C
        den = e1 * B + C
        den = jnp.where(jnp.abs(den) > _TINY, den, one)
        r = (e1 * B - C) / den
        T = (4.0 * jnp.real(e1) * jnp.real(em)
             / jnp.maximum(jnp.abs(den) ** 2, 1e-30))
        return r, jnp.clip(T, 0.0, 1.0), den

    rs, Ts, den_s = one_pol("s")
    rp_adm, Tp, den_p = one_pol("p")
    rp = -rp_adm           # admittance -> Verdet sign convention
    # ts ~ 1/den_s, tp ~ 1/den_p with real positive prefactors
    # ts ~ 1/den_s, tp ~ 1/den_p: arg(tp) - arg(ts) = arg(den_s) - arg(den_p)
    dphi = jnp.angle(den_s) - jnp.angle(den_p)
    Xt = jnp.sqrt(jnp.maximum(Ts * Tp, 0.0)) * jnp.exp(
        1j * dphi.astype(jnp.complex64))
    return rs, rp, Ts, Tp, Xt


def polarized_film_split(s0, s1, s2, s3, cos_i, n1, layers_n, layers_h,
                         n_sub, wl):
    """Mueller split of a Stokes vector at a COATED dielectric interface
    (incidence-frame (s, p) basis, same contract as polarized_split).

    The complex cross terms X_r = conj(rs) rp and X_t unify the bare
    interface's real cross products AND retardation (film or TIR): with
    |rs| = |rp| = 1 and delta = arg(rp) - arg(rs) this reduces exactly to
    polarized_split's TIR rotation block. Energy: r0 + t0 == s0 (lossless
    stack unitarity, float-exact to ~1e-6).
    """
    rs, rp, Ts, Tp, Xt = multilayer_amplitudes(
        cos_i, n1, layers_n, layers_h, n_sub, wl)
    Rs = _abs2(rs)
    Rp = _abs2(rp)
    # cross term in the package's Stokes sign convention (fixed by
    # polarized_split's TIR block / the Fresnel-rhomb tests): conj(rs) rp,
    # NOT rs conj(rp) — the two differ by the retardation SENSE
    Xr = jnp.conj(rs) * rp
    r0 = 0.5 * (Rs + Rp) * s0 + 0.5 * (Rs - Rp) * s1
    r1 = 0.5 * (Rs - Rp) * s0 + 0.5 * (Rs + Rp) * s1
    r2 = jnp.real(Xr) * s2 - jnp.imag(Xr) * s3
    r3 = jnp.imag(Xr) * s2 + jnp.real(Xr) * s3
    t0 = 0.5 * (Ts + Tp) * s0 + 0.5 * (Ts - Tp) * s1
    t1 = 0.5 * (Ts - Tp) * s0 + 0.5 * (Ts + Tp) * s1
    t2 = jnp.real(Xt) * s2 - jnp.imag(Xt) * s3
    t3 = jnp.imag(Xt) * s2 + jnp.real(Xt) * s3
    return (r0, r1, r2, r3), (t0, t1, t2, t3)


def thin_film_reflectance(cos_i, n1, nf, n2, h, wl):
    """Unpolarized power reflectance R = (|rs|^2 + |rp|^2) / 2 of a single
    lossless film (see multilayer_rs_rp). Clipped to [0, 1]."""
    return multilayer_reflectance(cos_i, n1, [nf], [h], n2, wl)


def multilayer_reflectance(cos_i, n1, layers_n, layers_h, n_sub, wl):
    """Unpolarized power reflectance of a lossless dielectric stack
    (see multilayer_rs_rp). Clipped to [0, 1]."""
    rs, rp = multilayer_rs_rp(cos_i, n1, layers_n, layers_h, n_sub, wl)
    r = 0.5 * (jnp.abs(rs) ** 2 + jnp.abs(rp) ** 2)
    return jnp.clip(r.astype(jnp.float32), 0.0, 1.0)


# --------------------------------------------------------------------------
# Uniaxial birefringence (extension over the reference's isotropic optics)
# --------------------------------------------------------------------------

def uniaxial_index(cos_k, n_o, n_e):
    """Extraordinary-wave phase index n(theta_k) of a uniaxial crystal:
    1/n^2 = cos^2(theta)/n_o^2 + sin^2(theta)/n_e^2, with cos_k the cosine
    of the angle between the WAVE normal and the optic axis. theta = 0
    gives n_o (degenerate with the ordinary wave), theta = 90deg gives
    n_e."""
    c2 = jnp.clip(cos_k * cos_k, 0.0, 1.0)
    inv2 = c2 / jnp.maximum(n_o * n_o, _TINY) \
        + (1.0 - c2) / jnp.maximum(n_e * n_e, _TINY)
    return 1.0 / jnp.sqrt(jnp.maximum(inv2, _TINY))


def uniaxial_refract_wave(kt, into, c_axis, n_o, n_e):
    """Refract a tangential wavevector into the EXTRAORDINARY branch of a
    uniaxial crystal (wave-vector tangential matching on the e-wave normal
    surface).

    Args:
      kt:     (..., 3) tangential wavevector in vacuum-k0 units
              (n1 * (d - (d.n)n) for a unit incident direction d)
      into:   (..., 3) unit normal pointing INTO the crystal
      c_axis: (..., 3) unit optic axis (headless — sign irrelevant)
      n_o, n_e: (...,) principal indices

    Returns (K, prop): the full wave vector K = kt + q*into with |K| =
    n(theta_k) solving the e-wave dispersion relation
        (K.c)^2/n_o^2 + (|K|^2 - (K.c)^2)/n_e^2 = 1
    (quadratic in q, forward root), and `prop` False where no forward
    propagating solution exists (evanescent / total reflection). n_e = n_o
    reduces exactly to isotropic Snell refraction."""
    f = 1.0 / jnp.maximum(n_o * n_o, _TINY) \
        - 1.0 / jnp.maximum(n_e * n_e, _TINY)
    ie = 1.0 / jnp.maximum(n_e * n_e, _TINY)
    a_c = dot(into, c_axis)
    b_c = dot(kt, c_axis)
    kt2 = dot(kt, kt)
    A = a_c * a_c * f + ie          # > 0 always (a weighted index average)
    B = 2.0 * a_c * b_c * f
    Cq = b_c * b_c * f + kt2 * ie - 1.0
    disc = B * B - 4.0 * A * Cq
    ok = disc > 0.0
    root = jnp.where(ok, jnp.sqrt(jnp.where(ok, disc, 1.0)), 0.0)
    q = (-B + root) / (2.0 * A)     # forward (into-crystal) branch
    K = kt + q[..., None] * into
    return K, ok & (q > 0.0)


def uniaxial_ray_direction(K, c_axis, n_o, n_e):
    """Poynting (ray) direction and OPL-effective ray index of an
    extraordinary wave with wave vector K (|K| = n(theta_k)).

    The ray direction tilts from the wave normal toward/away from the
    optic axis (walk-off): S ~ (K - (K.c)c)/n_e^2 + ((K.c)/n_o^2) c.
    Returns (S_unit, n_ray) where n_ray = K . S_unit = n(theta_k) cos(rho)
    — the index that makes OPL = n_ray * geometric_ray_length equal the
    true accumulated phase (phase fronts advance along K at c/n(theta_k);
    the ray covers extra ground by 1/cos(rho))."""
    Kc = dot(K, c_axis)
    S = (K - Kc[..., None] * c_axis) / jnp.maximum(n_e * n_e, _TINY)[..., None] \
        + (Kc / jnp.maximum(n_o * n_o, _TINY))[..., None] * c_axis
    S = normalize(S)
    return S, dot(K, S)


def uniaxial_wave_from_ray(S, c_axis, n_o, n_e):
    """Recover the e-wave normal and phase index from a RAY direction.

    Inverse of uniaxial_ray_direction: with theta_S / theta_k the ray /
    wave angles to the optic axis, tan(theta_k) = (n_e^2/n_o^2)
    tan(theta_S). Parameterized through the unnormalized vector
    n_o^2 cos(theta_S) c + n_e^2 sin(theta_S) p_hat so theta_S = 90deg is
    regular. Returns (k_hat, n_wave)."""
    cs = dot(S, c_axis)
    csn = jnp.where(cs[..., None] < 0.0, -c_axis, c_axis)  # headless axis
    cs = jnp.abs(cs)
    p = S - cs[..., None] * csn
    sin_s = jnp.sqrt(jnp.maximum(dot(p, p), 0.0))
    p_hat = normalize(p)
    u = (n_o * n_o * cs)[..., None] * csn + (n_e * n_e * sin_s)[..., None] * p_hat
    k_hat = normalize(u)
    # degenerate S || c: p == 0 -> u = n_o^2 cs * c, k_hat = c (exact)
    n_wave = uniaxial_index(dot(k_hat, csn), n_o, n_e)
    return k_hat, n_wave


def incidence_s_direction(d, n, fallback_basis):
    """Unit s-direction (perpendicular to the incidence plane): d x n
    normalized; at ~normal incidence (plane undefined) fall back to the
    ray's current basis re-orthogonalized against d."""
    c = jnp.cross(d, n)
    c2 = jnp.sum(c * c, axis=-1, keepdims=True)
    fb = fallback_basis - dot(fallback_basis, d)[..., None] * d
    fb = normalize(fb)
    use_c = c2 > 1e-12
    return jnp.where(use_c, c / jnp.sqrt(jnp.maximum(c2, _TINY)), fb)


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
    refr_dir, tir, cos_t = refract_full(d, n, eta)
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
        # extras for the polarized (Stokes-Mueller) path
        "n": n,
        "n1": n1,
        "n2": n2,
        "cos_i": cos_i,
        "cos_t": cos_t,
    }
